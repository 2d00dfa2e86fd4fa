package graft.functions

import graft.SparkSpec
import graft.ops.SeriesOps
import org.apache.spark.sql.functions._

class CandleAggregatorSpec extends SparkSpec {

  test("one-pass aggregator matches the 5-agg resample exactly") {
    import spark.implicits._
    val data = genCandles(120)
    val df = candleDf(data)
      .withColumn("bucket", expr("ts div 900000")) // 15-minute buckets

    val viaAggregator = df
      .groupBy("bucket")
      .agg(CandleAggregator.udaf(
        col("ts"), col("open"), col("high"), col("low"), col("close"), col("volume"))
        .as("c"))
      .select(col("bucket"), col("c.open"), col("c.high"), col("c.low"),
        col("c.close"), col("c.volume"), col("c.n"))
      .orderBy("bucket").collect().map(_.toSeq).toSeq

    val viaResample = SeriesOps.resampleOhlcv(candleDf(data), "15min")
      .withColumn("bucket", expr("bucket_ts div 900000"))
      .withColumn("n", lit(15L))
      .select("bucket", "open", "high", "low", "close", "volume", "n")
      .orderBy("bucket").collect().map(_.toSeq).toSeq

    assert(viaAggregator.length == viaResample.length)
    viaAggregator.zip(viaResample).foreach { case (a, r) =>
      // o/h/l/c/bucket/n exact; volume within quantization tolerance
      // (resample sums in DECIMAL(28,10); the aggregator keeps the full
      // BigDecimal(double) precision — strictly more precise)
      assert(a.take(5) == r.take(5) && a(6) == r(6))
      assert(math.abs(a(5).asInstanceOf[Double] - r(5).asInstanceOf[Double]) < 1e-6)
    }
  }

  test("duplicate-ts open/close tie-break is partition-independent (min wins)") {
    import spark.implicits._
    // two rows at the bucket's first ts and two at its last ts
    val rows = Seq(
      (0L, 10.0, 11.0, 9.0, 10.5, 1.0), (0L, 20.0, 21.0, 19.0, 20.5, 1.0),
      (1L, 15.0, 16.0, 14.0, 15.5, 1.0),
      (2L, 30.0, 31.0, 29.0, 30.5, 1.0), (2L, 5.0, 6.0, 4.0, 5.5, 1.0))
    def run(shuffle: Int) = rows.toDF("ts", "open", "high", "low", "close", "volume")
      .repartition(shuffle)
      .groupBy(lit(0).as("bucket"))
      .agg(CandleAggregator.udaf(col("ts"), col("open"), col("high"), col("low"),
        col("close"), col("volume")).as("c"))
      .select("c.open", "c.close").head()
    val results = Seq(run(1), run(3), run(5))
    assert(results.distinct.size == 1, s"tie-break depends on partitioning: $results")
    assert(results.head.getDouble(0) == 10.0 && results.head.getDouble(1) == 5.5)
  }

  test("aggregator is deterministic under repartition (merge-order free)") {
    import spark.implicits._
    val df = candleDf(genCandles(200))
      .withColumn("bucket", expr("ts div 3600000"))
    def run(d: org.apache.spark.sql.DataFrame) = d
      .groupBy("bucket")
      .agg(CandleAggregator.udaf(col("ts"), col("open"), col("high"), col("low"),
        col("close"), col("volume")).as("c"))
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    assert(run(df) == run(df.repartition(13)))
  }
}
