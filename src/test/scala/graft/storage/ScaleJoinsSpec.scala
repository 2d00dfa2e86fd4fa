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

  /** Per-partition row counts of `df` AS PARTITIONED BY ITS OWN PLAN
    * (spark_partition_id is evaluated before the groupBy re-shuffle).
    */
  private def partitionSpread(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    import org.apache.spark.sql.functions.spark_partition_id
    df.withColumn("__pid", spark_partition_id()).groupBy("__pid").count()
      .collect().map(_.getLong(1)).toSeq.sorted
  }

  test("salting tightens per-task input spread on a 100:1 skewed key") {
    import spark.implicits._
    // 100:1 skew: key 0 carries 100k rows; 100 cold keys carry 1k each.
    val big = spark.range(200000).select(
      when($"id" < 100000, 0L).otherwise($"id" % 100 + 1).as("k"),
      $"id".as("v"))
    val small = (0L to 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevShuf = spark.conf.get("spark.sql.shuffle.partitions")
    // AQE off: measure the RAW hash-partitioned layout, not AQE's rescue
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = partitionSpread(big.join(small, Seq("k")))
      val salted = partitionSpread(ScaleJoins.saltedJoin(big, small, "k", parts = 16))
      def maxOverMedian(s: Seq[Long]): Double =
        s.max.toDouble / math.max(1L, s(s.size / 2)).toDouble
      // Unsalted: one task owns the whole hot key (~50% of all rows).
      assert(plain.max >= 100000L, s"hot task should see the full hot key: $plain")
      // Salted: the hot key spreads over 16 (key,salt) reducers.
      assert(salted.max <= plain.max / 4,
        s"salting must spread the hot task >=4x: plain=${plain.max} salted=${salted.max}")
      assert(maxOverMedian(salted) < maxOverMedian(plain),
        s"max/median spread must tighten: plain=$plain salted=$salted")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevShuf)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("AQE splits the skewed partition: final plan shows skew=true") {
    import spark.implicits._
    val big = spark.range(300000).select(
      when($"id" < 200000, 0L).otherwise($"id" % 100 + 1).as("k"),
      concat(lit("payload_payload_payload_payload_"), $"id").as("v"))
    val small = (0L to 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ).map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = big.join(small, Seq("k"))
      // Execute THIS dataframe's physical plan (count() would plan a
      // separate aggregate query and leave `joined`'s AQE plan unexecuted,
      // so its toString would still show isFinalPlan=false pre-skew-split).
      val n = joined.queryExecution.toRdd.count()
      assert(n == 300000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must have split the hot partition (skew=true):\n$plan")
    } finally {
      prev.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
