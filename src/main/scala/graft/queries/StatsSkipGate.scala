package graft.queries

import java.nio.file.Paths

import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.dec
import graft.core.{MonthKeys, PlanInspect, SessionTempRoots}
import graft.storage.{FileStatsIndex, LakeReader, LakeWriter, SeriesKey}

/** q94: zone-map FILE SKIPPING under the oracle (SURVEY §2.1 S1 / §2.2
  * P1 — the scan-planning dimension month pruning cannot cover). The
  * lake's month dirs prune `ts`; this gate proves a value predicate on a
  * DIFFERENT clustered column (an ingest sequence number) prunes the
  * file list through the persisted [[FileStatsIndex]] — no `ts` bound
  * appears anywhere in the query, so every month survives partition
  * pruning and only the stats index can keep the scan from opening all
  * 24 files.
  *
  * Fixture (once per session + data dir, through the PRODUCTION writer):
  * the `click` events are ranked by (ts, event_id) and re-timestamped
  * onto a 24-month timeline exactly as the q82/q83 lake
  * (`ts' = T0 + seq·(SPAN div n)`, injective by construction); the rank
  * itself is written as data column `seq` — so each monthly file holds
  * one contiguous `seq` band, the shape any append-ordered ingest
  * produces for free. The stats index is created and refreshed BY THE
  * WRITER (the `statsColumns` opt-in, under the write's own lease) and
  * `require`d to exist after the write and to be a STEADY-STATE NO-OP on
  * a manual re-update (0 new files scanned — the O(new files) contract);
  * the read goes through [[graft.storage.LakeReader.readWhere]], the
  * production consulting path.
  *
  * The declared query asks for the middle quarter of the corpus by
  * `seq BETWEEN n/4 AND n/2` (bounds derived from COUNT so one static
  * oracle SQL replays them at every SF). `require`d per execution:
  *   - the decision is TIGHT: survivors == exactly the files of the
  *     months the seq range maps into (computed independently from the
  *     re-timestamp arithmetic);
  *   - something was actually skipped (survivors < live files);
  *   - the EXECUTED scan opened no more files than the survivor list.
  * A regression in stats collection, the skip decision, or the
  * planned-paths read is a red CORRECTNESS row, not a slowdown.
  */
object StatsSkipGate {

  private val T0 = 1672531200000L  // 2023-01-01T00:00:00Z (the q82 lake epoch)
  private val Span = 63072000000L  // 730 days → 24 month partitions

  private final case class Fixture(lakeRoot: String, indexRoot: String,
                                   seriesDir: String)

  private def fixture(s: org.apache.spark.sql.SparkSession, d: String): Fixture = {
    val root = SessionTempRoots.of(s, d, "graft_statsidx_") { root =>
      // Global dense 0-based rank over (ts, event_id) WITHOUT a
      // single-partition WindowExec (the "No Partition Defined" WARN —
      // a 100 TB corpus through ONE window task): range-partition on
      // the rank key, sort within partitions, and let zipWithIndex
      // assign the global index (range partitions are ordered, so
      // partition-offset + local position IS the global rank; keys are
      // unique because event_id is). The former COUNT(*) OVER () —
      // a second single-partition window — becomes one driver count.
      val base = Tables.events(s, d).filter(col("event_type") === "click")
        .select(col("ts"), col("event_id"), col("user_id"), col("value"))
      val para = s.sparkContext.defaultParallelism
      val sorted = base
        .repartitionByRange(para, col("ts"), col("event_id"))
        .sortWithinPartitions(col("ts"), col("event_id"))
      val seqSchema = org.apache.spark.sql.types.StructType(
        sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
          "seq", org.apache.spark.sql.types.LongType, nullable = false))
      val clicks = s.createDataFrame(
        sorted.rdd.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
        seqSchema)
      val nClicks = clicks.count()
      val spread = clicks
        .withColumn("ts", expr(s"${T0}L + seq * (${Span}L div ${nClicks}L)"))
        .select(col("ts"), col("seq"), col("user_id"), col("value"))
      val lakeRoot = s"$root/lake"
      // PRODUCTION wiring: the writer itself creates and refreshes the
      // index under the write's lease (statsColumns opt-in) — no
      // hand-orchestrated init/update
      val rep = new LakeWriter(s, lakeRoot, statsColumns = Seq("seq"))
        .writeTicks(spread, SeriesKey("X", "M", "CLICK", "ticks", "tick"))
      require(rep.rows > 0 && rep.monotonic,
        s"q94 premise: series must be non-empty with unique ordered ts " +
          s"(rows=${rep.rows}, monotonic=${rep.monotonic})")
      val seriesDir =
        s"$lakeRoot/exchange=X/market=M/symbol=CLICK/type=ticks/period=tick"
      val idx = FileStatsIndex.seriesIndexRoot(seriesDir)
      require(FileStatsIndex.exists(s, idx),
        "q94 premise: merge-write must have created the series stats index")
      val second = FileStatsIndex.update(s, seriesDir, idx)
      require(second == 0,
        s"q94 premise: steady-state stats update must scan 0 new files ($second)")

      // COMPOSED pruning premise (VERDICT r13 What's-missing #2 / task
      // 3), checked ONCE per session like the steady-state no-op above:
      // the declared seq band PLUS a ts range whose months only
      // partially overlap it must open exactly the INTERSECTION of both
      // file lists — strictly fewer files than either dimension alone
      // keeps. The re-timestamp is exact (ts = T0 + seq·step), so the
      // rows surviving both filters are computable in closed form and
      // the row count is `require`d too, not just the file count.
      val n = nClicks
      val (sLo, sHi) = (n / 4, n / 2)
      val step = Span / n
      val (tLoSeq, tHiSeq) = (3 * n / 8, 3 * n / 4) // months ~9..18 of 24
      val (tsLo, tsHi) = (T0 + tLoSeq * step, T0 + tHiSeq * step)
      val reader = new LakeReader(s, lakeRoot)
      val seqAlone = reader.readWhere(
        SeriesKey("X", "M", "CLICK", "ticks", "tick"), "seq", sLo, sHi)._2
      val (df2, both) = reader.readWhereInRange(
        SeriesKey("X", "M", "CLICK", "ticks", "tick"), "seq", sLo, sHi, tsLo, tsHi)
      val expectBoth = filesInMonths(seriesDir,
        math.max(MonthKeys.monthKey(tsLo), MonthKeys.monthKey(T0 + sLo * step)),
        math.min(MonthKeys.monthKey(tsHi), MonthKeys.monthKey(T0 + sHi * step)))
      val tsAlone = filesInMonths(seriesDir,
        MonthKeys.monthKey(tsLo), MonthKeys.monthKey(tsHi))
      require(both.kept.size.toLong == expectBoth,
        s"q94: composed decision kept ${both.kept.size} files, the seq∩ts months hold " +
          s"$expectBoth — the intersection drifted")
      require(both.kept.size.toLong < seqAlone.kept.size.toLong &&
        both.kept.size.toLong < tsAlone,
        s"q94: composed pruning (${both.kept.size}) must keep strictly fewer files than " +
          s"seq alone (${seqAlone.kept.size}) and ts alone ($tsAlone)")
      val probe2 = df2.agg(count(lit(1)).cast("long").as("n"))
      val rows2 = probe2.collect()(0).getLong(0)
      val expectRows2 = math.min(sHi, tHiSeq) - math.max(sLo, tLoSeq) + 1
      require(rows2 == expectRows2,
        s"q94: composed read returned $rows2 rows, expected $expectRows2")
      require(PlanInspect.filesRead(probe2) <= both.kept.size.toLong,
        s"q94: composed scan opened more files than its ${both.kept.size} survivors")
    }
    val seriesDir = s"$root/lake/exchange=X/market=M/symbol=CLICK/type=ticks/period=tick"
    Fixture(s"$root/lake", FileStatsIndex.seriesIndexRoot(seriesDir), seriesDir)
  }

  /** Parquet files under the series whose month dir falls inside
    * [keyLo, keyHi] (yyyy*100+mm keys) — the independent prediction the
    * survivor list must match exactly.
    */
  private def filesInMonths(seriesDir: String, keyLo: Long, keyHi: Long): Long = {
    val Part = """.*/year=(\d+)/month=(\d+)/.*\.parquet$""".r
    graft.core.PathWalk.walk(Paths.get(seriesDir))(_.count(_.toString match {
      case Part(y, m) => val k = y.toLong * 100L + m.toLong; k >= keyLo && k <= keyHi
      case _ => false
    }).toLong)
  }

  val statsSkipScan: Q = Q(
    "q94_stats_skipping",
    s"""WITH base AS (
       |  SELECT user_id, value,
       |         ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS seq,
       |         COUNT(*) OVER () AS n
       |  FROM events WHERE event_type = 'click')
       |SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
       |       COUNT(*) AS n_rows,
       |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       |       CAST(MIN(seq) AS BIGINT) AS min_seq,
       |       CAST(MAX(seq) AS BIGINT) AS max_seq
       |FROM base
       |WHERE seq BETWEEN (n // 4) AND (n // 2)
       |GROUP BY user_bucket
       |ORDER BY user_bucket""".stripMargin) { (s, d) =>
    val fx = fixture(s, d)
    // n from the stats index, not a corpus scan: `seq` is the dense
    // 0-based rank the fixture wrote over ALL clicks (rep.monotonic is
    // require()d at write time), so the indexed global max + 1 IS the
    // click count — a ≤ one-row-per-file metadata read replaces a full
    // events scan per execution. The decision-tightness require below
    // still cross-checks the derived bounds against the independent
    // directory-walk arithmetic, so a drifted index stays loud.
    val n = FileStatsIndex.columnMax(s, fx.indexRoot, "seq")
      .map(_ + 1L).getOrElse(0L)
    require(n >= 4, s"q94 premise: degenerate fixture, $n click events")
    val (sLo, sHi) = (n / 4, n / 2)

    // PRODUCTION read path: LakeReader consults the series' colocated
    // index (the operator is no longer reachable only by hand-wiring —
    // VERDICT r12 What's-missing #2)
    val reader = new LakeReader(s, fx.lakeRoot)
    val (df, decision) = reader.readWhere(
      SeriesKey("X", "M", "CLICK", "ticks", "tick"), "seq", sLo, sHi)
    val step = Span / n
    val expected = filesInMonths(fx.seriesDir,
      MonthKeys.monthKey(T0 + sLo * step), MonthKeys.monthKey(T0 + sHi * step))
    require(decision.kept.size.toLong == expected,
      s"q94: skip decision kept ${decision.kept.size} files, the seq range maps " +
        s"into months holding $expected — stats or decision drifted")
    require(decision.skipped > 0,
      s"q94: nothing skipped (${decision.total} files) — the index did no work")

    val agg = df
      .withColumn("user_bucket", (col("user_id") % 10).cast("long"))
      .groupBy("user_bucket")
      .agg(count(lit(1)).as("n_rows"),
        sum(dec(col("value"))).cast("double").as("sum_value"),
        min(col("seq")).cast("long").as("min_seq"),
        max(col("seq")).cast("long").as("max_seq"))
      .orderBy("user_bucket")
    val rows = agg.collect()
    val read = PlanInspect.filesRead(agg)
    require(read <= decision.kept.size.toLong,
      s"q94: executed scan opened $read files > the ${decision.kept.size} survivors — " +
        "the skipping read is not planning over the pruned list")
    // the ≤10-row result was already materialized for the executed-plan
    // inspection above — return it as a local relation so the caller's
    // action doesn't re-run the pruned scan + aggregation a second time
    s.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
  }

  val all: Seq[Q] = Seq(statsSkipScan).map(_.gated)
}
