package graft.ingest

import org.apache.spark.sql.SparkSession
import graft.catalog.ManifestCatalog
import graft.model.{Candle, ManifestEntry}
import graft.storage.{LakeWriter, SeriesKey}
import graft.core.Timeframes

/** Pluggable market-data connector (SURVEY §7.1 #5) — the engine-side
  * abstraction of the reference's CCXT surface
  * (`dl-datalake/src/dl_datalake/ingest/exchange_connector.py`): tests
  * mock this trait exactly as the reference mocks ccxt.
  */
trait Connector {
  def name: String
  /** Page of candles starting at `sinceMs`, at most `limit` rows. */
  def fetchOhlcv(symbol: String, timeframe: String, sinceMs: Long, limit: Int): Seq[Candle]
  /** Earliest available candle ts, if the venue exposes it. */
  def earliestTs(symbol: String, timeframe: String): Option[Long]
  /** Funding-rate history page (perp venues) — `(ts, rate, infoJson)`,
    * the reference's list-of-dicts shape
    * (`exchange_connector.py:401-446`). Optional capability.
    */
  def fetchFundingRates(symbol: String, sinceMs: Long, limit: Int): Seq[(Long, Double, String)] =
    throw new UnsupportedOperationException(s"$name does not serve funding rates")
  /** Active tradable symbols (P11 active-market filter applied). */
  def listSymbols(market: String): Seq[String] = Seq.empty
}

final case class DownloadReport(pages: Int, rows: Long, flushes: Int,
                                retries: Int, emptyJumps: Int,
                                timeFrom: Long, timeTo: Long)

/** Incremental download loop (T1-T5): resume from the catalog
  * watermark, page through the connector, flush in chunks, tolerate
  * rate limits and empty pages — the reference's `download_ohlcv`
  * (`exchange_connector.py:55-307`) with the same tuning constants
  * (page 1000, flush ≥5000, 30 s backoff ×5, ≤10 empty-page jumps).
  *
  * Connector I/O is inherently driver-side (a paging HTTP loop); each
  * flush is a distributed merge-write job. At scale, many symbol loops
  * run concurrently ([[downloadBulk]] — the reference's DownloadManager
  * thread pool, `ingest.py:33-202`), each writing disjoint partitions.
  *
  * Every download reports through the `registry` (T6 — the reference's
  * task registry semantics): submit at start (parking Pending when the
  * per-exchange or total running limit is hit, resuming when a
  * finishing job promotes it), progress after every flush, Completed /
  * Failed at the end. One registry can be shared across loaders so the
  * limits span all of a process's ingest loops.
  */
final class IncrementalLoader(spark: SparkSession, writer: LakeWriter,
                              catalog: ManifestCatalog,
                              pageSize: Int = 1000, flushRows: Int = 5000,
                              maxRetries: Int = 5, maxEmptyJumps: Int = 10,
                              backoffMs: Long = 30000L,
                              sleeper: Long => Unit = Thread.sleep,
                              val registry: graft.ops.JobRegistry = new graft.ops.JobRegistry()) {

  /** Admission through the registry: run now, or park Pending until a
    * finishing job's promoteNext (or freed capacity noticed by this
    * poll) flips us to Running. Driver-side orchestration — a 10 ms
    * poll is noise against a paging HTTP loop.
    */
  private def admit(jobId: String, group: String): Unit = {
    if (registry.submit(jobId, group)) return
    while (!registry.get(jobId).exists(_.state == graft.ops.JobStatus.Running)) {
      registry.promoteNext(group)
      if (!registry.get(jobId).exists(_.state == graft.ops.JobStatus.Running))
        Thread.sleep(10)
    }
  }

  def download(conn: Connector, market: String, symbol: String, timeframe: String,
               startMs: Option[Long] = None, endMs: Long = System.currentTimeMillis())
  : DownloadReport = {
    val jobId = s"${conn.name}/$market/$symbol/$timeframe"
    admit(jobId, conn.name)
    try {
      val rep = downloadAdmitted(conn, market, symbol, timeframe, startMs, endMs, jobId)
      registry.complete(jobId)
      rep
    } catch {
      case e: Throwable =>
        registry.fail(jobId, e.toString)
        throw e
    } finally registry.promoteNext(conn.name): Unit // wake the oldest parked job
  }

  private def downloadAdmitted(conn: Connector, market: String, symbol: String,
                               timeframe: String, startMs: Option[Long], endMs: Long,
                               jobId: String): DownloadReport = {
    val tfMs = Timeframes.toMillis(timeframe)
    val key = SeriesKey(conn.name, market, symbol, "raw", Timeframes.canonical(timeframe))

    // T1 watermark resolution: catalog max(time_to)+1 → user start → probe.
    // Scoped to (market, timeframe) — other series of the same symbol
    // must not shadow this one's resume point.
    var since = catalog.maxTimeTo(conn.name, symbol, "raw",
        market = Some(market), timeframe = Some(timeframe)).map(_ + 1L)
      .orElse(startMs)
      .orElse(conn.earliestTs(symbol, timeframe))
      .getOrElse(0L)

    val buf = scala.collection.mutable.ArrayBuffer.empty[Candle]
    var pages = 0; var flushes = 0; var retries = 0; var emptyJumps = 0
    var rows = 0L; var tFrom = Long.MaxValue; var tTo = Long.MinValue
    var done = false

    def flush(): Unit = if (buf.nonEmpty) {
      import spark.implicits._
      val rep = writer.writeOhlc(buf.toSeq.toDF(), key)
      // rep bounds are whole-series (post-merge) — exactly what the
      // catalog row should carry
      tFrom = math.min(tFrom, rep.timeFrom); tTo = math.max(tTo, rep.timeTo)
      rows += buf.size
      upsertCatalogEntry(conn, market, symbol, timeframe, key, rep.timeFrom, rep.timeTo)
      buf.clear(); flushes += 1
      registry.progress(jobId, rows) // progress-per-flush (ingest.py:137-160)
    }

    while (!done && since <= endMs) {
      val page =
        try { val p = conn.fetchOhlcv(symbol, timeframe, since, pageSize); retries = 0; p }
        catch {
          case e: RateLimitedException =>
            retries += 1
            if (retries > maxRetries) throw e
            sleeper(backoffMs)
            Seq.empty
        }
      if (page.nonEmpty) {
        pages += 1
        emptyJumps = 0
        buf ++= page.filter(_.ts <= endMs)
        // advance by +1, not +timeframe: off-grid candles (DST-shifted
        // bars, partial maintenance-window bars) must not be skipped —
        // the reference does the same (exchange_connector.py:262-269);
        // progress is guaranteed because fetch filters ts >= since
        since = page.last.ts + 1L
        if (buf.size >= flushRows) flush()
        if (page.size < pageSize && since > endMs) done = true
      } else if (retries == 0) {
        // T4 gap-jump on genuinely empty response
        emptyJumps += 1
        if (emptyJumps > maxEmptyJumps) done = true
        else since += pageSize.toLong * tfMs
      }
    }
    flush()
    DownloadReport(pages, rows, flushes, retries, emptyJumps,
      if (rows == 0) 0L else tFrom, if (rows == 0) 0L else tTo)
  }

  /** Bulk download (the reference DownloadManager's fan-out,
    * `ingest.py:163-202`): one loop per symbol on a bounded thread
    * pool, with the REGISTRY — not the pool — enforcing the
    * per-exchange running limit, so excess jobs park Pending and resume
    * in submission order as others finish. Symbols write disjoint
    * series (disjoint leases — the q81 model), so the loops never
    * contend on data. Returns per-symbol reports for the successes and
    * rethrows the first failure AFTER every loop has finished (partial
    * progress is durable: each flush committed lake + catalog, so a
    * re-run resumes every symbol from its watermark).
    */
  def downloadBulk(conn: Connector, market: String, symbols: Seq[String],
                   timeframe: String, startMs: Option[Long] = None,
                   endMs: Long = System.currentTimeMillis(),
                   parallelism: Int = 8): Map[String, DownloadReport] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, symbols.size)))
    val out = new java.util.concurrent.ConcurrentHashMap[String, DownloadReport]()
    val errs = new java.util.concurrent.ConcurrentHashMap[String, Throwable]()
    try {
      symbols.map { sym =>
        pool.submit(new Runnable {
          def run(): Unit =
            try out.put(sym, download(conn, market, sym, timeframe, startMs, endMs)): Unit
            catch { case e: Throwable => errs.put(sym, e): Unit }
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    if (!errs.isEmpty) throw errs.values.iterator.next()
    import scala.jdk.CollectionConverters._
    out.asScala.toMap
  }

  /** Funding-rate incremental download (S4/S8/alt data): rows
    * `(ts, rate, info_json)` land under type=alt/period=funding with the
    * same keep-last upsert and watermark resume as candles. The
    * reference partitions funding daily as a Polars workaround
    * (`exchange_connector.py:414-433`); here the uniform monthly layout
    * applies — pruning comes from year/month + parquet ts stats.
    */
  def downloadFunding(conn: Connector, market: String, symbol: String,
                      endMs: Long = System.currentTimeMillis()): DownloadReport = {
    import spark.implicits._
    val key = SeriesKey(conn.name, market, symbol, "alt", "funding")
    var since = catalog.maxTimeTo(conn.name, symbol, "alt",
      market = Some(market), timeframe = Some("funding")).map(_ + 1L).getOrElse(0L)
    var rows = 0L; var pages = 0; var flushes = 0
    var tFrom = Long.MaxValue; var tTo = Long.MinValue
    var done = false
    while (!done && since <= endMs) {
      val page = conn.fetchFundingRates(symbol, since, pageSize)
      if (page.isEmpty) done = true
      else {
        pages += 1
        val batch = page.filter(_._1 <= endMs)
        if (batch.nonEmpty) {
          val rep = writer.writeOhlc(
            batch.toDF("ts", "rate", "info_json"), key)
          tFrom = math.min(tFrom, rep.timeFrom); tTo = math.max(tTo, rep.timeTo)
          rows += batch.size; flushes += 1
          val k = key.sanitized
          catalog.addEntry(ManifestEntry(conn.name, market, symbol,
            s"exchange=${k.exchange}/market=${k.market}/symbol=${k.symbol}/type=alt/period=funding",
            "alt", rep.timeFrom, rep.timeTo, "1", "",
            System.currentTimeMillis(), "", """{"timeframe": "funding"}"""))
        }
        if (page.last._1 >= endMs) done = true else since = page.last._1 + 1L
      }
    }
    DownloadReport(pages, rows, flushes, 0, 0,
      if (rows == 0) 0L else tFrom, if (rows == 0) 0L else tTo)
  }

  private def upsertCatalogEntry(conn: Connector, market: String, symbol: String,
                                 timeframe: String, key: SeriesKey,
                                 timeFrom: Long, timeTo: Long): Unit = {
    val k = key.sanitized
    val path = s"exchange=${k.exchange}/market=${k.market}/symbol=${k.symbol}/type=raw/period=${k.period}"
    catalog.addEntry(ManifestEntry(
      conn.name, market, symbol, path, "raw", timeFrom, timeTo,
      version = "1", checksum = "", created_at = System.currentTimeMillis(),
      script_git_hash = "", metadata_json = s"""{"timeframe": "$timeframe"}"""))
  }
}

final class RateLimitedException(msg: String) extends RuntimeException(msg)
