package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas (SURVEY §1.1-1.2).
  *
  * OHLCV row: `ts, open, high, low, close, volume` with ts = int64
  * epoch-ms (`dl-datalake/src/dl_datalake/ingest/exchange_connector.py:323-327`).
  * Ticks are schema-on-read with `ts` required
  * (`dl-datalake/src/dl_datalake/storage/writer.py:190-232`).
  */
final case class Candle(ts: Long, open: Double, high: Double,
                        low: Double, close: Double, volume: Double)

/** One catalog row per physical file
  * (`dl-datalake/src/dl_datalake/metadata/manifest.py:22-39`).
  */
final case class ManifestEntry(
    exchange: String,
    market: String,
    symbol: String,
    path: String,
    `type`: String,          // raw | ticks | agg | alt | <feature-set-name>
    time_from: Long,          // epoch-ms
    time_to: Long,            // epoch-ms
    version: String,
    checksum: String,
    created_at: Long,         // epoch-ms
    script_git_hash: String,
    metadata_json: String)

object Schemas {
  val candle: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", DoubleType)))

  val candleColumns: Seq[String] = candle.fieldNames.toSeq

  /** Data-plane type dimension (manifest.py:13-19). Anything else = feature. */
  val builtinTypes: Set[String] = Set("raw", "ticks", "agg", "alt")
}
