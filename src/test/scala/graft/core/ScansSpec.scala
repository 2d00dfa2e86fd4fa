package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the round-17 scan fan-out and the q35 pair-generation rewrite. */
class ScansSpec extends SparkSpec {

  test("fanOut floors a narrow scan to defaultParallelism and is identity past it") {
    val p = spark.sparkContext.defaultParallelism
    val narrow = spark.range(0, 1000).coalesce(1).toDF("id")
    assert(Scans.fanOut(narrow).rdd.getNumPartitions == p)
    // rows are redistributed, never lost or duplicated
    assert(Scans.fanOut(narrow).agg(count(lit(1)), sum("id")).head() ==
      narrow.agg(count(lit(1)), sum("id")).head())
    val wide = spark.range(0, 1000).repartition(p + 4).toDF("id")
    // identity: the SAME plan object, no exchange added
    assert(Scans.fanOut(wide) eq wide)
  }

  test("localizeSmall picks representation by measured bytes at the boundary") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val df = spark.range(0, 512).toDF("id")
    def isLocal(out: org.apache.spark.sql.DataFrame): Boolean =
      out.queryExecution.analyzed.isInstanceOf[LocalRelation]
    // generous budget → plan-embedded LocalRelation (zero-job collects)
    val small = Scans.localizeSmall(df, maxLocalBytes = 1L << 20)
    assert(isLocal(small))
    // budget below the measured payload → RDD-backed frame: lineage cut
    // and values identical, but the payload stays OUT of the plan
    val big = Scans.localizeSmall(df, maxLocalBytes = 16)
    assert(!isLocal(big))
    assert(big.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    assert(big.agg(count(lit(1)), sum("id")).head() ==
      df.agg(count(lit(1)), sum("id")).head())
    assert(small.agg(count(lit(1)), sum("id")).head() ==
      df.agg(count(lit(1)), sum("id")).head())
  }

  test("q35 double-explode pair rule == all unordered i<j pairs of a distinct id set") {
    import spark.implicits._
    // the rewrite replaced transform(sequence)/slice struct-building with
    // explode×2 + a value filter; over DISTINCT ids both enumerate each
    // unordered pair exactly once regardless of array order
    val ids = Seq(Seq(5L, 1L, 9L, 3L), Seq(2L, 7L), Seq(4L))
    val df = ids.toDF("ids")
    val got = df
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .as[(Long, Long)].collect().toSet
    val want = ids.flatMap { l =>
      for (a <- l; b <- l if a < b) yield (a, b)
    }.toSet
    assert(got == want)
    assert(got.size == ids.map(l => l.size * (l.size - 1) / 2).sum)
  }
}
