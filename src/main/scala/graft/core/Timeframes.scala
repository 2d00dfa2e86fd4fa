package graft.core

/** Timeframe-string utilities (SURVEY §1.2 / F6).
  *
  * The reference parses `"1m"`-style timeframes to milliseconds through
  * CCXT (`dl-datalake/src/dl_datalake/ingest/exchange_connector.py:199`)
  * and remaps Prefect-style `"15min"` → `"15m"` for Polars
  * (`dl-datalake/src/dl_datalake/orchestration/flows.py:74`). One parser
  * here covers both spellings; plain Scala (plan-time constant — never a
  * per-row expression, so no UDF/Expression needed).
  */
object Timeframes {
  private val Pat = """(?i)^\s*(\d+)\s*(ms|s|sec|m|min|h|hr|d|w|mo|y)\s*$""".r

  private val unitMs: Map[String, Long] = Map(
    "ms" -> 1L, "s" -> 1000L, "sec" -> 1000L,
    "m" -> 60000L, "min" -> 60000L,
    "h" -> 3600000L, "hr" -> 3600000L,
    "d" -> 86400000L, "w" -> 604800000L,
    "mo" -> 2592000000L, // 30d, as CCXT does
    "y" -> 31536000000L) // 365d

  /** "15min" → 900000; throws IllegalArgumentException on junk. */
  def toMillis(tf: String): Long = tf match {
    case Pat(n, u) => n.toLong * unitMs(u.toLowerCase)
    case _ => throw new IllegalArgumentException(s"unparseable timeframe: '$tf'")
  }

  /** Spark SQL window-duration string for `window()` / `date_trunc`:
    * "15min" → "15 minutes".
    */
  def toSparkInterval(tf: String): String = tf match {
    case Pat(n, u) =>
      val unit = u.toLowerCase match {
        case "ms" => "milliseconds"
        case "s" | "sec" => "seconds"
        case "m" | "min" => "minutes"
        case "h" | "hr" => "hours"
        case "d" => "days"
        case "w" => "weeks"
        case "mo" => "30 days" // interval months are not fixed-width
        case "y" => "365 days"
      }
      if (unit.contains(" ")) s"${n.toLong * unit.split(" ")(0).toLong} days"
      else s"$n $unit"
    case _ => throw new IllegalArgumentException(s"unparseable timeframe: '$tf'")
  }

  /** Canonical short form: "15min" → "15m" (reference flows.py:74). */
  def canonical(tf: String): String = tf match {
    case Pat(n, u) =>
      val short = u.toLowerCase match {
        case "sec" => "s"
        case "min" => "m"
        case "hr" => "h"
        case other => other
      }
      s"$n$short"
    case _ => tf
  }
}

/** Symbol/path sanitization (SURVEY F8): the reference uppercases and maps
  * `/ : space → _` before using symbols in paths
  * (`dl-datalake/src/dl_datalake/storage/writer.py:31-33`).
  */
object Symbols {
  def sanitize(sym: String): String =
    sym.trim.toUpperCase.replaceAll("[/: ]", "_")
}
