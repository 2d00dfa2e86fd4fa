package graft.ingest

import graft.core.Symbols
import graft.model.Candle
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** File-backed [[Connector]]: replays CSV fixtures as if they were a
  * paging venue API — the repo's concrete connector for environments
  * without network egress, and the CLI's download backend
  * (cf. the reference's CCXT connector,
  * `dl-datalake/src/dl_datalake/ingest/exchange_connector.py:55-307`;
  * its tests replay canned pages the same way,
  * `tests/ingest/test_exchange_connector.py:30-192`).
  *
  * Layout: one `<SANITIZED_SYMBOL>.csv` per symbol under `fixtureDir`
  * (`ts,open,high,low,close,volume`, optional header), plus optional
  * `<SANITIZED_SYMBOL>.funding.csv` (`ts,rate,info_json`). Pages are
  * served sorted by ts, `ts >= sinceMs`, at most `limit` rows — exactly
  * the paging contract [[IncrementalLoader]] expects, so the full
  * T1–T5 loop (watermark resume, chunked flush, gap-jump) runs
  * unmodified over fixtures.
  *
  * Files are read once per symbol and cached on the driver: connector
  * I/O is inherently driver-side (a paging loop); each flush is still a
  * distributed merge-write job.
  */
final class CsvReplayConnector(fixtureDir: String,
                               override val name: String = "csvreplay") extends Connector {

  // ConcurrentHashMap, not mutable.Map: downloadBulk drives one shared
  // connector from a thread pool, and a racing getOrElseUpdate on a
  // plain HashMap can corrupt it mid-resize (worst case: an infinite
  // loop inside the bulk download). computeIfAbsent gives one load per
  // symbol with safe publication.
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Vector[Candle]]()

  private def path(symbol: String, suffix: String): Path =
    Paths.get(fixtureDir, s"${Symbols.sanitize(symbol)}$suffix")

  private def dataLines(p: Path): Vector[Array[String]] = {
    if (!Files.exists(p)) return Vector.empty
    Files.readAllLines(p).asScala.iterator
      .map(_.trim).filter(_.nonEmpty)
      .map(_.split(","))
      .filter(f => f.head.nonEmpty && f.head.forall(c => c.isDigit || c == '-')) // header/junk skip
      .toVector
  }

  private def load(symbol: String): Vector[Candle] =
    cache.computeIfAbsent(Symbols.sanitize(symbol), _ =>
      dataLines(path(symbol, ".csv")).map { f =>
        Candle(f(0).toLong, f(1).toDouble, f(2).toDouble,
          f(3).toDouble, f(4).toDouble, f(5).toDouble)
      }.sortBy(_.ts))

  override def fetchOhlcv(symbol: String, timeframe: String,
                          sinceMs: Long, limit: Int): Seq[Candle] =
    load(symbol).iterator.filter(_.ts >= sinceMs).take(limit).toSeq

  override def earliestTs(symbol: String, timeframe: String): Option[Long] =
    load(symbol).headOption.map(_.ts)

  /** Active symbols = fixture files present (P11: the venue only lists
    * what it currently trades; here, what the fixture dir contains).
    */
  override def listSymbols(market: String): Seq[String] = {
    val dir = Paths.get(fixtureDir)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val stream = Files.list(dir) // must close: directory handle leaks otherwise
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".csv") && !n.endsWith(".funding.csv"))
        .map(_.stripSuffix(".csv"))
        .toSeq.sorted
      finally stream.close()
    }
  }

  override def fetchFundingRates(symbol: String, sinceMs: Long,
                                 limit: Int): Seq[(Long, Double, String)] = {
    val p = path(symbol, ".funding.csv")
    if (!Files.exists(p))
      throw new UnsupportedOperationException(s"$name: no funding fixture for $symbol")
    dataLines(p).map { f =>
      (f(0).toLong, f(1).toDouble, if (f.length > 2) f.drop(2).mkString(",") else "{}")
    }.sortBy(_._1).iterator.filter(_._1 >= sinceMs).take(limit).toSeq
  }
}
