package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Size-bounded collect (q35's single-shuffle df cap): exact band
  * semantics at the cap boundary, sorted deterministic output, and
  * overflow absorption across partition merges.
  */
class BoundedLongSetSpec extends SparkSpec {

  test("collects sorted up to max; exactly-max kept; max+1 overflows to empty — across many partitions") {
    import spark.implicits._
    // group g has g members (ids g*1000+i), g = 1..70, cap 64 —
    // repartition(13) forces partial buffers through merge()
    val rows = (1 to 70).flatMap(g => (0 until g).map(i => (g.toLong, g * 1000L + i)))
    val df = rows.toDF("g", "id").repartition(13)
    val got = df.groupBy("g")
      .agg(BoundedLongSet.udaf(64)(col("id")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    (1 to 64).foreach { g =>
      assert(got(g.toLong) == (0 until g).map(g * 1000L + _),
        s"group $g must collect all $g ids sorted")
    }
    (65 to 70).foreach { g =>
      assert(got(g.toLong).isEmpty, s"group $g (> cap) must finish empty, got ${got(g.toLong).size}")
    }
  }

  test("duplicate inputs dedup on insert: overflow keys on DISTINCT cardinality, not row count") {
    import spark.implicits._
    // group 1: 3 distinct values, each repeated 40x (120 rows >> cap 8) — must survive;
    // group 2: 9 distinct values (> cap 8), each repeated 2x — must overflow to empty
    val rows =
      (0 until 40).flatMap(_ => Seq(1L -> 10L, 1L -> 20L, 1L -> 30L)) ++
      (0 until 2).flatMap(_ => (0 until 9).map(i => 2L -> (100L + i)))
    val got = rows.toDF("g", "id").repartition(11)
      .groupBy("g").agg(BoundedLongSet.udaf(8)(col("id")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(10L, 20L, 30L), "duplicates must not trip the cap")
    assert(got(2L).isEmpty, "9 distinct > cap 8 must overflow even with duplicates")
  }

  test("q35 band semantics: bounded collect + size filter == count pre-pass + semi-join + collect") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 2000).map(_ => (rnd.nextInt(120).toLong, rnd.nextLong()))
      // caller contract: distinct values within a group
      .distinct
    val df = rows.toDF("k", "v").repartition(7)
    val max = 16
    val viaBounded = df.groupBy("k")
      .agg(BoundedLongSet.udaf(max)(col("v")).as("ids"))
      .filter(size(col("ids")).between(2, max))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val keep = df.groupBy("k").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, max)).select("k")
    val viaPrepass = df.join(keep, Seq("k"), "left_semi")
      .groupBy("k").agg(sort_array(collect_list(col("v"))).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaBounded == viaPrepass)
    assert(viaBounded.nonEmpty)
  }
}
