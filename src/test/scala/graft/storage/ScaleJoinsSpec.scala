package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkSpec {

  test("bucketed join plans with no shuffle exchange on either side") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = (1 to 10000).map(i => (i.toLong % 500, s"l$i")).toDF("k", "lv")
      val right = (1 to 5000).map(i => (i.toLong % 500, s"r$i")).toDF("k", "rv")
      ScaleJoins.writeBucketed(left, "bkt_left", "k", 8)
      ScaleJoins.writeBucketed(right, "bkt_right", "k", 8)
      val joined = ScaleJoins.bucketedJoin(spark, "bkt_left", "bkt_right", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 10000L * 10) // 20 left x 10 right per key x 500 keys
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("salted join equals unsalted join on skewed data") {
    import spark.implicits._
    // 90% of big rows share one hot key
    val big = (1 to 20000).map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i))
      .toDF("k", "v")
    val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val expected = big.join(small, Seq("k")).groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = ScaleJoins.saltedJoin(big, small, "k").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }
}
