package graft.core

/** Shared epoch-ms → yyyy*100+mm conversion used by BOTH the storage
  * reader's month-bound derivation (graft.storage.LakeReader) and the
  * optimizer rule (graft.plans.TsPartitionPruning) — one definition so
  * the two pruning paths can never disagree on month boundaries.
  *
  * Handles negative epochs correctly (year 1969 keys sort below 1970 —
  * the lake writes year=1969 partitions for pre-epoch ts, so clamping
  * negatives to 1970 would make those rows unreachable); clamps only
  * the extremes where java.time overflows (sentinel Long ranges).
  */
object MonthKeys {
  private val MinMs = -377705116800000L // ≈ year -9999
  private val MaxMs = 253402300799999L  // 9999-12-31T23:59:59.999Z

  def monthKey(ms: Long): Long = {
    val clamped = math.min(math.max(ms, MinMs), MaxMs)
    val ym = java.time.YearMonth.from(
      java.time.Instant.ofEpochMilli(clamped).atZone(java.time.ZoneOffset.UTC))
    ym.getYear.toLong * 100L + ym.getMonthValue
  }

  /** UTC calendar date of an epoch-ms Column, independent of
    * `spark.sql.session.timeZone` — unlike `year(timestamp_millis(ts))`,
    * which silently follows the session zone and would write partitions
    * offset from the UTC months both pruning paths assume. Epoch-day
    * floor-division is exactly the UTC date (same arithmetic as
    * [[monthKey]]'s java.time path); extremes are clamped identically.
    */
  def utcDate(tsMs: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val clamped = least(greatest(tsMs, lit(MinMs)), lit(MaxMs))
    date_from_unix_date(floor(clamped / lit(86400000.0d)).cast("int"))
  }
}
