package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass mergeable OHLCV candle aggregator (SURVEY §2.10): combines
  * first/max/min/last/sum into a single buffer instead of five separate
  * aggregate expressions. Deterministic under any partitioning — "first"
  * and "last" are defined by ts, not encounter order — and associative/
  * commutative in merge, so Catalyst plans partial+final (map-side
  * combine) automatically.
  *
  * Volume is accumulated in BigDecimal so the merged result is identical
  * regardless of merge tree shape (double addition is order-dependent).
  *
  * Input rows: (ts, open, high, low, close, volume).
  */
object CandleAggregator {

  final case class In(ts: Long, open: Double, high: Double, low: Double,
                      close: Double, volume: Double)

  final case class Buf(firstTs: Long, open: Double, high: Double, low: Double,
                       lastTs: Long, close: Double, volume: BigDecimal, n: Long)

  final case class Out(ts: Long, open: Double, high: Double, low: Double,
                       close: Double, volume: Double, n: Long)

  val empty: Buf = Buf(Long.MaxValue, 0.0, Double.NegativeInfinity,
    Double.PositiveInfinity, Long.MinValue, 0.0, BigDecimal(0), 0L)

  val agg: Aggregator[In, Buf, Out] = new Aggregator[In, Buf, Out] {
    def zero: Buf = empty

    // Duplicate-ts tie-break: min(open)/min(close) — arbitrary but
    // deterministic under any partitioning or merge-tree shape (a plain
    // first-seen-wins would be encounter-order-dependent), mirroring the
    // merge-write path's content-hash tie rule. Clean series have unique
    // ts per bucket and never hit it.
    def reduce(b: Buf, r: In): Buf = Buf(
      firstTs = math.min(b.firstTs, r.ts),
      open = if (r.ts < b.firstTs) r.open
             else if (r.ts == b.firstTs) math.min(r.open, b.open) else b.open,
      high = math.max(b.high, r.high),
      low = math.min(b.low, r.low),
      lastTs = math.max(b.lastTs, r.ts),
      close = if (r.ts > b.lastTs) r.close
              else if (r.ts == b.lastTs) math.min(r.close, b.close) else b.close,
      // NaN/Inf skipped, matching the resample path (decimal cast of
      // NaN → null → sum skips); BigDecimal(NaN) would throw
      volume = if (r.volume.isNaN || r.volume.isInfinite) b.volume
               else b.volume + BigDecimal(r.volume),
      n = b.n + 1)

    def merge(a: Buf, b: Buf): Buf = Buf(
      firstTs = math.min(a.firstTs, b.firstTs),
      open = if (b.firstTs < a.firstTs) b.open
             else if (b.firstTs == a.firstTs) math.min(a.open, b.open) else a.open,
      high = math.max(a.high, b.high),
      low = math.min(a.low, b.low),
      lastTs = math.max(a.lastTs, b.lastTs),
      close = if (b.lastTs > a.lastTs) b.close
              else if (b.lastTs == a.lastTs) math.min(a.close, b.close) else a.close,
      volume = a.volume + b.volume,
      n = a.n + b.n)

    def finish(b: Buf): Out =
      Out(b.firstTs, b.open, b.high, b.low, b.close, b.volume.toDouble, b.n)

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** Registered-UDAF form for untyped DataFrame use:
    * `df.groupBy(...).agg(CandleAggregator.udaf(struct cols...))`.
    */
  def udaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(agg, Encoders.product[In])
}
