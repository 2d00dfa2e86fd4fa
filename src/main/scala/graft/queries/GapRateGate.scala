package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.ingest.{Connector, CsvReplayConnector, IncrementalLoader, RateLimitedException}
import graft.model.Candle

/** q87: the download loop's FAULT paths under the oracle — T4 gap-jump
  * and T5 rate-limit backoff (`exchange_connector.py:141-210`: ccxt
  * RateLimitExceeded → sleep-and-retry; empty page inside the requested
  * range → jump the cursor by a page width). q76 gates the happy path
  * (watermark resume + chunked flush); this gate makes the loader
  * ingest a feed it can only complete by surviving BOTH faults:
  *
  *  - the venue is WINDOWED: a fetch returns only candles in
  *    `[since, since + limit·tf)` — the venue class that motivates
  *    gap-jump to exist (a ranged query over a trading halt returns
  *    empty even though later data exists; a `ts >= since` venue like
  *    plain CsvReplay never does). The feed has a 30-day hole mid-
  *    stream, so the loop sees genuinely empty mid-stream pages and
  *    must jump them without losing the far side;
  *  - every 4th fetch throws [[RateLimitedException]] — the loop must
  *    back off (no-op sleeper: deterministic, untimed) and retry until
  *    the page lands.
  *
  * Premises `require`d at fixture build: ≥2 throttled calls actually
  * thrown, ≥2 empty MID-stream pages served (the gap was really
  * jumped, not absorbed by paging), the full feed ingested in ≥2
  * flushes, and gapless catalog accounting (one commit per flush). The
  * declared query reads the lake back through the pruned range scan;
  * the oracle rebuilds every row arithmetically from `events` — a row
  * lost on either side of the hole, a double-fetch after a retry, or a
  * flush dropped mid-backoff all hash-mismatch.
  *
  * Fixture capped (event_id < 12000) and built once per (session, data
  * dir): the connector loop is driver-side paging by design (q76's
  * scale note), each flush a distributed merge-write.
  */
object GapRateGate {

  private val T0 = 1704067200000L // 2024-01-01 UTC
  private val CAP = 12000L
  private val GapMs = 2592000000L // 30 days — spans month dirs

  /** Venue that answers ranged queries only: candles in
    * `[since, since + limit·tf)`. Counts throttles thrown and empty
    * responses served strictly before the feed's end (the premise
    * counters — DownloadReport's own emptyJumps/retries reset on the
    * next success, so they can't witness mid-stream faults).
    * `feedEndTs` is fixture knowledge (the last candle's timestamp,
    * known at build time) so classifying an empty window as mid-stream
    * costs no extra probe — fetchOhlcv stays one-call-per-page, the
    * call pattern a real windowed venue would see.
    */
  private final class WindowedThrottledVenue(inner: Connector, throttleEvery: Int,
                                             feedEndTs: Long)
    extends Connector {
    override val name: String = inner.name
    var throttled = 0L
    var emptyMid = 0L
    private var calls = 0L

    override def fetchOhlcv(symbol: String, timeframe: String,
                            sinceMs: Long, limit: Int): Seq[Candle] = {
      calls += 1
      if (calls % throttleEvery == 0) {
        throttled += 1
        throw new RateLimitedException(s"$name: synthetic 429 (call $calls)")
      }
      val tfMs = graft.core.Timeframes.toMillis(timeframe)
      val page = inner.fetchOhlcv(symbol, timeframe, sinceMs, limit)
        .filter(_.ts < sinceMs + limit.toLong * tfMs)
      if (page.isEmpty && sinceMs <= feedEndTs)
        emptyMid += 1 // data exists beyond the window: a true gap page
      page
    }
    override def earliestTs(symbol: String, timeframe: String): Option[Long] =
      inner.earliestTs(symbol, timeframe)
  }

  private def gapLakeRoot(s: SparkSession, d: String): String =
    graft.core.SessionTempRoots.of(s, d, "graft_gaprate_") { root =>
      val ids = Tables.events(s, d).select(col("event_id"))
        .filter(col("event_id") < CAP)
        .distinct().collect().map(_.getLong(0)).sorted
      require(ids.nonEmpty, "q87 premise: events table must be non-empty")
      val boundary = ids.last * 3 / 5 // replayed by the oracle: MAX(id)*3//5
      require(ids.exists(_ <= boundary) && ids.exists(_ > boundary),
        s"q87 premise: the gap must split the feed (boundary=$boundary)")
      def tsOf(i: Long): Long =
        T0 + i * 60000L + (if (i > boundary) GapMs else 0L)
      def line(i: Long): String =
        s"${tsOf(i)},${i % 997},${i % 997 + 2},${i % 997 - 1},${i * 7 % 997},${i % 101}"
      val feed = Files.createDirectories(Paths.get(root, "feed")).toString
      Files.write(Paths.get(feed, "GAP.csv"),
        ids.map(line).mkString("\n").getBytes("UTF-8"))
      val lake = Files.createDirectories(Paths.get(root, "lake")).toString

      val venue = new WindowedThrottledVenue(
        new CsvReplayConnector(feed, "gapfeed"), throttleEvery = 4,
        feedEndTs = tsOf(ids.last))
      val flush = math.max(1, ids.length / 3) // ≥2 flushes for any ≥2-row feed
      val page = math.max(1, flush / 2)
      val cat = new graft.catalog.ManifestCatalog(s, lake)
      val loader = new IncrementalLoader(s,
        new graft.storage.LakeWriter(s, lake), cat,
        pageSize = page, flushRows = flush,
        // the hole is a CONSTANT 30 days (the oracle replays it) while
        // the jump stride page·tf scales with the fixture, so the jump
        // COUNT varies — bound it by distance, not a small max
        maxEmptyJumps = 200000,
        sleeper = _ => ())
      val rep = loader.download(venue, "spot", "GAP", "1m", endMs = tsOf(ids.last))

      require(venue.throttled >= 2,
        s"q87 premise: the venue must have throttled ≥2 fetches (${venue.throttled})")
      require(venue.emptyMid >= 2,
        s"q87 premise: the gap must force ≥2 empty mid-stream pages (${venue.emptyMid})")
      require(rep.rows == ids.length,
        s"q87 premise: the loop must ingest the WHOLE feed across the gap " +
          s"(${rep.rows}/${ids.length})")
      if (ids.length >= 2) require(rep.flushes >= 2,
        s"q87 premise: ingest must flush in chunks (${rep.flushes})")
      val seq = cat.currentSeq()
      require(seq == rep.flushes.toLong,
        s"q87 premise: one catalog commit per flush (seq=$seq, flushes=${rep.flushes})")
    }

  val gapRateIngest: Q = Q(
    "q87_gap_rate_ingest",
    s"""WITH ids AS (
       |  SELECT event_id FROM events WHERE event_id < $CAP),
       |b AS (SELECT MAX(event_id) * 3 // 5 AS boundary FROM ids),
       |c AS (
       |  SELECT $T0 + event_id * 60000 +
       |           CASE WHEN event_id > (SELECT boundary FROM b)
       |                THEN $GapMs ELSE 0 END AS ts,
       |         event_id % 997 AS o,
       |         (event_id * 7) % 997 AS cl,
       |         event_id % 101 AS v
       |  FROM ids)
       |SELECT CAST((ts - $T0) // 86400000 AS BIGINT) AS day,
       |       COUNT(*) AS n,
       |       CAST(SUM(o) AS BIGINT) AS sum_open,
       |       CAST(SUM(cl) AS BIGINT) AS sum_close,
       |       CAST(SUM(v) AS BIGINT) AS sum_vol,
       |       CAST(MIN(ts) AS BIGINT) AS min_ts,
       |       CAST(MAX(ts) AS BIGINT) AS max_ts
       |FROM c GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
    val lake = s"${gapLakeRoot(s, d)}/lake"
    new graft.storage.LakeReader(s, lake)
      .readRange("gapfeed", "GAP", "raw", 0L, Long.MaxValue,
        market = Some("spot"), period = Some("1m"))
      .withColumn("day", expr(s"(ts - ${T0}L) div 86400000"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("open")).cast("long").as("sum_open"),
        sum(col("close")).cast("long").as("sum_close"),
        sum(col("volume")).cast("long").as("sum_vol"),
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"))
      .orderBy("day")
  }

  val all: Seq[Q] = Seq(gapRateIngest).map(_.gated)
}
