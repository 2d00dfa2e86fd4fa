package graft.queries

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.ingest.{Connector, CsvReplayConnector, IncrementalLoader, RateLimitedException}
import graft.model.Candle
import graft.ops.{JobRegistry, JobStatus}

/** q90: the bulk download fan-out under the oracle (T6 — the reference
  * DownloadManager's thread pool + task registry,
  * `UI/backend/routers/ingest.py:33-202`; the last T-surface that was
  * spec-only). q81 proved two forked WRITER JVMs can share one lake;
  * q87 proved one loop survives its venue's fault paths. This gate
  * proves the production fan-out path: `downloadBulk` drives THREE
  * symbol loops from a bounded pool against ONE throttling venue, with
  * the REGISTRY (maxPerGroup=2) — not the pool — bounding concurrent
  * loops, all three writing one shared lake + catalog in-process.
  *
  * Premises `require`d at fixture build (all deterministic):
  *   - all three registry jobs end Completed with progress == that
  *     symbol's full row count (progress tracked through the fan-out);
  *   - observed venue concurrency never exceeded maxPerGroup=2 — the
  *     registry really is the admission gate (the third loop parked
  *     Pending and resumed on promoteNext);
  *   - the venue threw ≥2 synthetic 429s (each loop inherits the q87
  *     backoff-retry path);
  *   - every symbol flushed ≥2 times and the shared catalog's commit
  *     seq equals the SUM of all flushes — three interleaved writers,
  *     zero lost/duplicated commits (the CAS publish under in-process
  *     contention);
  *   - the whole feed ingested (Σ rows == fixture ids).
  *
  * The declared query reads all three series back through the pruned
  * range scan and aggregates per symbol; the oracle rebuilds each
  * symbol's rows arithmetically from `events` (symbol = id mod 3) — a
  * row crossed between symbols, double-ingested after a 429 retry, or
  * lost to a racing merge-write hash-mismatches.
  *
  * Fixture capped (event_id < CAP) and built once per (session, dir);
  * symbols write DISJOINT series (disjoint leases — the q81 model), so
  * the loops contend only where the design says they may: the venue,
  * the registry, and the catalog's commit CAS.
  */
object BulkIngestGate {

  private val T0 = 1704067200000L // 2024-01-01 UTC
  private val CAP = 9000L
  private val Symbols3 = Seq("BK0", "BK1", "BK2")

  /** Thread-safe throttling venue: downloadBulk calls it from pool
    * threads, so counters are atomics. Throttles every 5th call
    * globally; tracks peak concurrent in-flight fetches (the registry-
    * enforcement witness).
    */
  private final class ThrottledBulkVenue(inner: Connector, throttleEvery: Int)
    extends Connector {
    override val name: String = inner.name
    val throttled = new AtomicLong(0)
    val maxLive = new AtomicInteger(0)
    private val live = new AtomicInteger(0)
    private val calls = new AtomicLong(0)

    override def fetchOhlcv(symbol: String, timeframe: String,
                            sinceMs: Long, limit: Int): Seq[Candle] = {
      val n = live.incrementAndGet()
      maxLive.getAndUpdate(m => math.max(m, n))
      try {
        if (calls.incrementAndGet() % throttleEvery == 0) {
          throttled.incrementAndGet()
          throw new RateLimitedException(s"$name: synthetic 429")
        }
        inner.fetchOhlcv(symbol, timeframe, sinceMs, limit)
      } finally live.decrementAndGet(): Unit
    }
    override def earliestTs(symbol: String, timeframe: String): Option[Long] =
      inner.earliestTs(symbol, timeframe)
  }

  private def bulkLakeRoot(s: SparkSession, d: String): String =
    graft.core.SessionTempRoots.of(s, d, "graft_bulk_") { root =>
      val ids = Tables.events(s, d).select(col("event_id"))
        .filter(col("event_id") < CAP)
        .distinct().collect().map(_.getLong(0)).sorted // bounded: < CAP
      val bySym = ids.groupBy(i => s"BK${i % 3}")
      require(Symbols3.forall(sym => bySym.get(sym).exists(_.length >= 2)),
        s"q90 premise: every symbol needs ≥2 rows (${bySym.view.mapValues(_.length).toMap})")

      def tsOf(i: Long): Long = T0 + i * 60000L
      def line(i: Long): String =
        s"${tsOf(i)},${i % 997},${i % 997 + 2},${i % 997 - 1},${i * 7 % 997},${i % 101}"
      val feed = Files.createDirectories(Paths.get(root, "feed")).toString
      Symbols3.foreach { sym =>
        Files.write(Paths.get(feed, s"$sym.csv"),
          bySym(sym).map(line).mkString("\n").getBytes("UTF-8"))
      }
      val lake = Files.createDirectories(Paths.get(root, "lake")).toString

      val venue = new ThrottledBulkVenue(
        new CsvReplayConnector(feed, "bulkvenue"), throttleEvery = 5)
      val perSym = ids.length / 3
      val flush = math.max(1, perSym / 3) // ≥2 flushes per symbol
      val registry = new JobRegistry(maxPerGroup = 2)
      val cat = new graft.catalog.ManifestCatalog(s, lake)
      val loader = new IncrementalLoader(s,
        new graft.storage.LakeWriter(s, lake), cat,
        pageSize = math.max(1, flush / 2), flushRows = flush,
        sleeper = _ => (), registry = registry)

      val reps = loader.downloadBulk(venue, "spot", Symbols3, "1m",
        endMs = tsOf(ids.last), parallelism = 3)

      require(reps.keySet == Symbols3.toSet &&
        reps.values.map(_.rows).sum == ids.length,
        s"q90 premise: whole feed across all symbols " +
          s"(${reps.view.mapValues(_.rows).toMap} vs ${ids.length})")
      Symbols3.foreach { sym =>
        require(reps(sym).flushes >= 2,
          s"q90 premise: $sym must flush in chunks (${reps(sym).flushes})")
        val job = registry.get(s"bulkvenue/spot/$sym/1m")
        require(job.exists(j => j.state == JobStatus.Completed &&
          j.progress == bySym(sym).length.toLong),
          s"q90 premise: $sym registry job Completed with full progress ($job)")
      }
      require(venue.throttled.get() >= 2,
        s"q90 premise: the venue must have throttled ≥2 fetches (${venue.throttled.get()})")
      require(venue.maxLive.get() <= 2,
        s"q90 premise: registry maxPerGroup=2 must bound live loops " +
          s"(observed ${venue.maxLive.get()})")
      val seq = cat.currentSeq()
      val flushes = reps.values.map(_.flushes.toLong).sum
      require(seq == flushes,
        s"q90 premise: one catalog commit per flush across all three " +
          s"interleaved writers (seq=$seq, flushes=$flushes)")
    }

  val bulkRegistryIngest: Q = Q(
    "q90_bulk_registry_ingest",
    s"""WITH ids AS (
       |  SELECT event_id FROM events WHERE event_id < $CAP),
       |c AS (
       |  SELECT 'BK' || (event_id % 3) AS symbol,
       |         $T0 + event_id * 60000 AS ts,
       |         event_id % 997 AS o,
       |         (event_id * 7) % 997 AS cl,
       |         event_id % 101 AS v
       |  FROM ids)
       |SELECT symbol,
       |       COUNT(*) AS n,
       |       CAST(SUM(o) AS BIGINT) AS sum_open,
       |       CAST(SUM(cl) AS BIGINT) AS sum_close,
       |       CAST(SUM(v) AS BIGINT) AS sum_vol,
       |       CAST(MIN(ts) AS BIGINT) AS min_ts,
       |       CAST(MAX(ts) AS BIGINT) AS max_ts
       |FROM c GROUP BY symbol ORDER BY symbol""".stripMargin) { (s, d) =>
    val lake = s"${bulkLakeRoot(s, d)}/lake"
    val reader = new graft.storage.LakeReader(s, lake)
    Symbols3.map { sym =>
      reader.readRange("bulkvenue", sym, "raw", 0L, Long.MaxValue,
          market = Some("spot"), period = Some("1m"))
        .withColumn("symbol", lit(sym))
    }.reduce(_.unionByName(_))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"),
        sum(col("open")).cast("long").as("sum_open"),
        sum(col("close")).cast("long").as("sum_close"),
        sum(col("volume")).cast("long").as("sum_vol"),
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"))
      .orderBy("symbol")
  }

  val all: Seq[Q] = Seq(bulkRegistryIngest).map(_.gated)
}
