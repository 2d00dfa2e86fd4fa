package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q78/q79 gate queries: result parity vs a Spark-side replay of their
  * DuckDB oracles at sf0.001, plus the PLAN property that justifies
  * q78's existence — the bucketed join itself must not shuffle.
  */
class ScaleJoinGatesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q78: bucketed join matches the plain-join oracle; join side shuffle-free") {
    val got = ScaleJoinGates.bucketedJoin.run(spark, sf).collect().map(_.toSeq).toSeq
    val expected = Tables.orders(spark, sf).filter(col("o_orderkey") < 5000000L)
      .select(col("o_custkey").as("custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(Tables.customer(spark, sf).select(
        col("c_custkey").as("custkey"), col("c_nationkey")), "custkey")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).cast("long").as("sum_cents"))
      .orderBy("c_nationkey")
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == expected)

    // The scale property: with broadcast off, the join of the two
    // bucketed tables plans with NO exchange below the join — the agg
    // above it is the only shuffle in the query.
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = ScaleJoinGates.bucketedJoin.run(spark, sf)
        .queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(shuffles <= 1, s"expected only the post-join agg to shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
  }

  test("q79: salted skew join equals the plain join replay") {
    val got = ScaleJoinGates.saltedSkewJoin.run(spark, sf).collect().map(_.toSeq).toSeq
    val big = Tables.lineitem(spark, sf).select(
      when(col("l_orderkey") % 100 < 90, 1L)
        .otherwise(col("l_orderkey") % 1000).as("k"),
      col("l_quantity").cast("long").as("q"))
    val small = Tables.supplier(spark, sf)
      .select((col("s_suppkey") % 1000).as("k")).distinct()
      .withColumn("w", col("k") * 3 % 97)
    val expected = big.join(small, "k")
      .groupBy((col("k") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("w")).cast("long").as("sum_w"),
        sum(col("q")).cast("long").as("sum_qty"))
      .orderBy("bucket")
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == expected)

    // The gate must actually exercise the hot side: the hot key is 1
    // (exists in `small` at every SF — suppkeys start at 1), so ≥90% of
    // lineitem flows through bucket 1. If the hot key ever stops
    // matching, this catches it before the oracle silently passes on an
    // empty hot side.
    val total = Tables.lineitem(spark, sf).count()
    val hotN = got.find(_.head == 1L).map(_(1).asInstanceOf[Long]).getOrElse(0L)
    // ~90% by construction; orderkeys are sparse so the modulus isn't
    // exactly uniform at tiny SF — 80% still proves the hot side matches
    assert(hotN >= total * 8 / 10,
      s"hot bucket carries $hotN of $total rows — skew gate not discriminating")
  }
}
