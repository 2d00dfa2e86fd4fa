package graft.queries

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.storage.{LakeMaintenance, SeriesKey}

/** q84: compaction racing a LIVE writer, under the oracle (the r10
  * verdict's top remaining concurrency hole). q81 proved writer-vs-
  * writer on disjoint series; this is the interleaving a 100 TB
  * deployment runs DAILY — auto-compaction (`LakeMaintenance
  * .compactSeries`, the reference's empty `daily_offload_flow`
  * placeholder done for real, `flows.py:127-130`) against an ACTIVE
  * ingest loop on the SAME series.
  *
  * The race that loses data without serialization: the compactor
  * snapshots a month, the writer's flush merge-writes new rows into
  * that month, the compactor then dynamic-overwrites the directory
  * from its stale snapshot — the flush is erased (or, mirrored, the
  * writer's merge-read crashes on the compactor's half-swapped files).
  * Both sections now hold the per-series [[graft.storage.SeriesLease]];
  * this gate forces the interleaving for real: a forked writer JVM
  * (complete engine session — `MultiWriterChild`, the q81 machinery)
  * runs the full T1/T2 download loop while the parent process loops
  * `compactSeries(maxFiles = 0)` (forced full-rewrite mode — maximal
  * conflict surface) on the same series until the writer exits.
  *
  * The declared query reads the finished lake through the pruned range
  * scan and cross-checks the catalog; the oracle predicts every value
  * arithmetically from `events` — a row lost to a compaction overwrite,
  * a resurrected superseded row, or a lost catalog commit all
  * hash-mismatch. `require`d premises: writer ingested its whole feed
  * in ≥2 flushes, ≥1 compaction pass rewrote partitions WHILE the
  * writer was alive (the race actually happened), gapless commit
  * accounting, and the final lake is compact (one file per month).
  *
  * Fixture capped (event_id < 20000) and built once per (session, data
  * dir) — same principle as q81/q70/q76.
  */
object MaintenanceGate {

  /** 2024-01-01 UTC, epoch-ms; 1m grid by event id. */
  private val T0 = 1704067200000L
  private val CAP = 20000L
  private def tsOf(i: Long): Long = T0 + i * 60000L

  private def raceLakeRoot(s: SparkSession, d: String): String =
    graft.core.SessionTempRoots.of(s, d, "graft_mrace_") { root =>
      val ids = Tables.events(s, d).select(col("event_id"))
        .filter(col("event_id") < CAP)
        .distinct().collect().map(_.getLong(0)).sorted
      require(ids.nonEmpty, "q84 premise: events table must be non-empty")
      def line(i: Long): String =
        s"${tsOf(i)},${i % 997},${i % 997 + 2},${i % 997 - 1},${i * 7 % 997},${i % 101}"
      val feed = Files.createDirectories(Paths.get(root, "feed")).toString
      Files.write(Paths.get(feed, "MWC.csv"),
        ids.map(line).mkString("\n").getBytes("UTF-8"))
      val lake = Files.createDirectories(Paths.get(root, "lake")).toString

      // many small flushes -> many month overwrites for the compactor
      // to interleave with (each flush is one merge-write job)
      val flush = math.max(1, ids.length / 8)
      val page = math.max(1, flush / 2)
      val report = s"$root/report"
      val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
      val cmd = Seq(javaBin) ++ MultiWriterChild.jdk17AddOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", sys.props("java.class.path"), "graft.queries.MultiWriterChild",
        lake, feed, "MWC", tsOf(ids.last).toString, report,
        page.toString, flush.toString)
      import scala.jdk.CollectionConverters._
      val p = new ProcessBuilder(cmd.asJava)
        .redirectOutput(Paths.get(root, "MWC.out").toFile)
        .redirectErrorStream(true)
        .start()

      // the compaction loop IS the race: forced full rewrites of every
      // month the series has so far, as fast as the lease admits them,
      // until the writer exits
      val key = SeriesKey("mwfeed", "spot", "MWC", "raw", "1m")
      val maint = new LakeMaintenance(s, lake)
      var racePasses = 0L
      var rewrites = 0L
      while (p.isAlive) {
        val n = maint.compactSeries(key, maxFiles = 0)
        if (n > 0) { racePasses += 1; rewrites += n }
        Thread.sleep(100)
      }
      val ok = p.waitFor(300, TimeUnit.SECONDS)
      if (!ok) p.destroyForcibly()
      require(ok && p.exitValue() == 0,
        s"q84 premise: writer process must succeed " +
          s"(${if (ok) p.exitValue() else "timeout"})")
      val Array(f, r) = new String(Files.readAllBytes(Paths.get(report)), "UTF-8").split(",")
      require(r.toLong == ids.length,
        s"q84 premise: writer must ingest its full feed ($r/${ids.length})")
      if (ids.length >= 2)
        require(f.toLong >= 2,
          s"q84 premise: writer must flush in chunks (${f.toLong})")
      require(racePasses >= 1,
        s"q84 premise: at least one compaction pass must rewrite partitions " +
          s"while the writer is live (passes=$racePasses) — the race never happened")
      // gapless commit accounting: compaction commits nothing, so the
      // catalog must carry exactly one commit per writer flush
      val seq = new graft.catalog.ManifestCatalog(s, lake).currentSeq()
      require(seq == f.toLong,
        s"q84 premise: catalog must carry one commit per flush (seq=$seq, flushes=$f)")
      // settle to the canonical compact state and pin it: one ts-sorted
      // file per month directory (a half-committed compaction swap or
      // debris-file leak would break this count)
      maint.compactSeries(key, maxFiles = 1)
      // scope the count to the series tree — the catalog's own log
      // segments under _manifest/ are parquet too and are not data
      val months = graft.core.PathWalk.walk(Paths.get(lake))(_.count { pth =>
        pth.toString.contains("symbol=MWC") && Files.isDirectory(pth) &&
          pth.getFileName.toString.startsWith("month=")
      }.toLong)
      val files = graft.core.PathWalk.walk(Paths.get(lake))(_.count { pth =>
        pth.toString.contains("symbol=MWC") && pth.toString.endsWith(".parquet")
      }.toLong)
      require(months >= 1 && files == months,
        s"q84 premise: final lake must be compact ($files files over $months months)")
    }

  val compactionRace: Q = Q(
    "q84_compaction_race",
    """WITH c AS (
      |  SELECT 1704067200000 + event_id * 60000 AS ts,
      |         event_id % 997 AS o,
      |         (event_id * 7) % 997 AS cl,
      |         event_id % 101 AS v
      |  FROM events WHERE event_id < 20000)
      |SELECT 'MWC' AS symbol,
      |       COUNT(*) AS n,
      |       CAST(SUM(o) AS BIGINT) AS sum_open,
      |       CAST(SUM(cl) AS BIGINT) AS sum_close,
      |       CAST(SUM(v) AS BIGINT) AS sum_vol,
      |       CAST(MIN(ts) AS BIGINT) AS min_ts,
      |       CAST(MAX(ts) AS BIGINT) AS max_ts,
      |       CAST(1 AS BIGINT) AS cat_entries,
      |       CAST(MIN(ts) AS BIGINT) AS cat_from,
      |       CAST(MAX(ts) AS BIGINT) AS cat_to
      |FROM c""".stripMargin) { (s, d) =>
    val lake = s"${raceLakeRoot(s, d)}/lake"
    val data = new graft.storage.LakeReader(s, lake)
      .readRange("mwfeed", "MWC", "raw", 0L, Long.MaxValue,
        market = Some("spot"), period = Some("1m"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"),
        sum(col("open")).cast("long").as("sum_open"),
        sum(col("close")).cast("long").as("sum_close"),
        sum(col("volume")).cast("long").as("sum_vol"),
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"))
    val cat = new graft.catalog.ManifestCatalog(s, lake).snapshot()
      .filter(col("exchange") === "MWFEED" && col("type") === "raw")
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("cat_entries"),
        min(col("time_from")).as("cat_from"),
        max(col("time_to")).as("cat_to"))
    data.join(cat, Seq("symbol"))
  }

  val all: Seq[Q] = Seq(compactionRace).map(_.gated)
}
