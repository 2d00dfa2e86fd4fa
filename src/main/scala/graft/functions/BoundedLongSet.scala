package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Size-bounded collect for candidate generation over a skewed key
  * (SURVEY §2.10 aggregate ext; q35's df-capped exact Jaccard): collect
  * up to `max` values per group; the (max+1)-th value flips the buffer
  * to OVERFLOW, discarding the values, and the group finishes EMPTY —
  * so a corpus-stopword key shared by 10^9 documents costs a capped
  * buffer and a boolean, never a collected list. This folds the
  * hot-key-safe df pre-pass INTO the collect: one corpus-wide shuffle
  * of the exploded table instead of two (count-agg + semi-join +
  * collect), with the identical safety property.
  *
  * Output is SORTED, so downstream pair enumeration is deterministic
  * under any partitioning or merge-tree shape. Associative/commutative
  * merge ⇒ Catalyst plans partial+final (map-side combine) normally;
  * overflow is absorbing in both reduce and merge.
  *
  * Caller contract: values within a group are distinct (q35: the
  * shingle kernel dedups per document), so "overflow" is exactly
  * "group cardinality > max".
  */
object BoundedLongSet {

  final case class Buf(ids: Array[Long], overflow: Boolean)

  def agg(max: Int): Aggregator[Long, Buf, Array[Long]] = {
    require(max >= 1, s"BoundedLongSet needs max >= 1, got $max")
    new Aggregator[Long, Buf, Array[Long]] {
      def zero: Buf = Buf(Array.emptyLongArray, overflow = false)
      def reduce(b: Buf, v: Long): Buf =
        if (b.overflow) b
        else if (b.ids.length >= max) Buf(Array.emptyLongArray, overflow = true)
        else Buf(b.ids :+ v, overflow = false)
      def merge(a: Buf, b: Buf): Buf =
        if (a.overflow || b.overflow || a.ids.length + b.ids.length > max)
          Buf(Array.emptyLongArray, overflow = true)
        else Buf(a.ids ++ b.ids, overflow = false)
      // EMPTY on overflow (not null): every real group has >= 1 value,
      // so empty is unambiguous, and it keeps the output encoder on the
      // non-null fast path
      def finish(b: Buf): Array[Long] =
        if (b.overflow) Array.emptyLongArray else b.ids.sorted
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
  }

  /** Untyped-DataFrame form: `df.groupBy(k).agg(BoundedLongSet.udaf(64)(col))`. */
  def udaf(max: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(agg(max), Encoders.scalaLong)
}
