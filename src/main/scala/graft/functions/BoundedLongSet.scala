package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Size-bounded DISTINCT collect for candidate generation over a skewed
  * key (SURVEY §2.10 aggregate ext; q35's df-capped exact Jaccard):
  * collect up to `max` distinct values per group; the (max+1)-th
  * distinct value flips the buffer to OVERFLOW, discarding the values,
  * and the group finishes EMPTY — so a corpus-stopword key shared by
  * 10^9 documents costs a capped buffer and a boolean, never a
  * collected list. This folds the hot-key-safe df pre-pass INTO the
  * collect: one corpus-wide shuffle of the exploded table instead of
  * two (count-agg + semi-join + collect), with the identical safety
  * property.
  *
  * Output is SORTED, so downstream pair enumeration is deterministic
  * under any partitioning or merge-tree shape. Associative/commutative
  * merge ⇒ Catalyst plans partial+final (map-side combine) normally;
  * overflow is absorbing in both reduce and merge.
  *
  * Duplicates are deduplicated on insert (a linear scan over ≤ max
  * elements — max is small by design), so overflow means exactly
  * "group DISTINCT cardinality > max" regardless of whether the caller
  * pre-dedups. The buffer is a pre-sized mutable array + length field:
  * reduce is amortized O(max) worst-case (the contains scan) with ZERO
  * array reallocation — the r14 `ids :+ v` per-row copy (O(max²)
  * copying per group across millions of shingle groups) is gone.
  */
object BoundedLongSet {

  /** Mutable aggregation buffer. `ids` is pre-sized to `max` on first
    * insert and mutated in place (the Aggregator contract permits
    * reduce/merge to mutate and return their buffer); `len` tracks the
    * fill. Encoded only at shuffle boundaries, where the product
    * encoder reads the fields — a full `ids` array of size max crosses
    * the wire, which at max=64 is 512 bytes, cheaper than re-boxing.
    */
  final case class Buf(var ids: Array[Long], var len: Int, var overflow: Boolean)

  def agg(max: Int): Aggregator[Long, Buf, Array[Long]] = {
    require(max >= 1, s"BoundedLongSet needs max >= 1, got $max")
    new Aggregator[Long, Buf, Array[Long]] {
      def zero: Buf = Buf(Array.emptyLongArray, 0, overflow = false)

      private def insert(b: Buf, v: Long): Buf = {
        var i = 0
        while (i < b.len) { if (b.ids(i) == v) return b; i += 1 }
        if (b.len >= max) { b.ids = Array.emptyLongArray; b.len = 0; b.overflow = true; return b }
        if (b.ids.length == 0) b.ids = new Array[Long](max)
        b.ids(b.len) = v
        b.len += 1
        b
      }

      def reduce(b: Buf, v: Long): Buf = if (b.overflow) b else insert(b, v)

      def merge(a: Buf, b: Buf): Buf = {
        if (a.overflow) return a
        if (b.overflow) return b
        var i = 0
        var acc = a
        while (i < b.len && !acc.overflow) { acc = insert(acc, b.ids(i)); i += 1 }
        acc
      }

      // EMPTY on overflow (not null): every real group has >= 1 value,
      // so empty is unambiguous, and it keeps the output encoder on the
      // non-null fast path
      def finish(b: Buf): Array[Long] =
        if (b.overflow || b.len == 0) Array.emptyLongArray
        else java.util.Arrays.copyOf(b.ids, b.len).sorted
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
  }

  /** Untyped-DataFrame form: `df.groupBy(k).agg(BoundedLongSet.udaf(64)(col))`. */
  def udaf(max: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(agg(max), Encoders.scalaLong)
}
