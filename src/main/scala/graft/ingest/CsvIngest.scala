package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.ManifestCatalog
import graft.model.{ManifestEntry, Schemas}
import graft.storage.{LakeWriter, SeriesKey, WriteReport}
import java.security.MessageDigest

/** CSV → lake ingest pipeline (SURVEY §7.1 #5; S2/S3 + F11 + catalog
  * commit) — the Spark form of
  * `dl-datalake/src/dl_datalake/ingest/pipeline.py:33-83`.
  */
final class CsvIngest(spark: SparkSession, writer: LakeWriter, catalog: ManifestCatalog) {

  /** Header fallback as the reference (`pipeline.py:52-65`): no `ts`
    * column + exactly 6 columns ⇒ canonical OHLCV names. Two sub-cases
    * the reference conflates (its header row is always consumed as a
    * header): a MISNAMED header ("timestamp,open,…") is renamed
    * positionally, keeping every data row; a truly HEADERLESS file
    * (first row parses as numbers) is re-read headerless so the first
    * row is data, not a swallowed pseudo-header.
    */
  def readCsv(path: String): DataFrame = {
    val headered = spark.read
      .option("header", "true").option("inferSchema", "true").csv(path)
    if (headered.columns.contains("ts")) headered
    else if (headered.columns.length == 6) {
      val headerless =
        headered.columns.forall(c => scala.util.Try(c.trim.toDouble).isSuccess)
      if (headerless)
        spark.read.schema(Schemas.candle).option("header", "false").csv(path)
      else headered.toDF(Schemas.candleColumns: _*)
    } else throw new IllegalArgumentException(
      s"CSV at $path has no 'ts' column and is not 6-column OHLCV")
  }

  /** Ingest one CSV file: read (header fallback) → merge-write → manifest
    * entry with SHA-256 file checksum (`pipeline.py:69-82`).
    */
  def ingestCsv(path: String, exchange: String, market: String, symbol: String,
                period: String = "1m", version: String = "1",
                scriptGitHash: String = ""): WriteReport = {
    val df = readCsv(path)
    val key = SeriesKey(exchange, market, symbol, "raw", period)
    val report = writer.writeOhlc(df, key)
    catalog.addEntry(ManifestEntry(
      exchange = exchange, market = market, symbol = symbol,
      path = seriesPath(key), `type` = "raw",
      time_from = report.timeFrom, time_to = report.timeTo,
      version = version, checksum = sha256File(path),
      created_at = System.currentTimeMillis(), script_git_hash = scriptGitHash,
      metadata_json = s"""{"timeframe": "$period", "source_file": "$path"}"""))
    report
  }

  /** Tick CSV ingest (`pipeline.py:85-136`): open schema, ts required. */
  def ingestTicksCsv(path: String, exchange: String, market: String, symbol: String,
                     version: String = "1"): WriteReport = {
    val df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    require(df.columns.contains("ts"), s"tick CSV at $path must contain 'ts'")
    val key = SeriesKey(exchange, market, symbol, "ticks", "tick")
    val report = writer.writeTicks(df, key)
    catalog.addEntry(ManifestEntry(
      exchange = exchange, market = market, symbol = symbol,
      path = seriesPath(key), `type` = "ticks",
      time_from = report.timeFrom, time_to = report.timeTo,
      version = version, checksum = sha256File(path),
      created_at = System.currentTimeMillis(), script_git_hash = "",
      metadata_json = """{"timeframe": "tick"}"""))
    report
  }

  private def seriesPath(k: SeriesKey): String = {
    val s = k.sanitized
    s"exchange=${s.exchange}/market=${s.market}/symbol=${s.symbol}/type=${s.`type`}/period=${s.period}"
  }

  /** Streaming SHA-256 of a file, 4 KiB blocks — `pipeline.py:26-31`.
    * Driver-side (ingest inputs are driver-local files, as in the
    * reference); the distributed form is `sha2(binaryFile.content, 256)`.
    */
  def sha256File(path: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path.takeWhile(_ != '/') match {
        case s if s.endsWith(":") => path
        case _ => s"file:$path"
      }), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    try {
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }
}
