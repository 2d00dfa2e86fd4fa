package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q82/q83 pruning gates: result parity vs a Spark-side flat replay of
  * their DuckDB oracles at sf0.001 (the in-query `require`s — executed
  * scan ≤ month's files, < full lake — run as part of each call, so a
  * pruning regression fails these tests too), plus the premise that
  * makes the fixture oracle-safe: the rank-based re-timestamp is
  * injective even when the source stream carries duplicate timestamps,
  * where a naive ms-truncating stretch collides (measured 43 same-ms
  * pairs at sf1) and the writer's keep-last merge would silently drop
  * rows the SQL oracle keeps.
  */
class LakeGatesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The flat-table replay of the shared fixture arithmetic. */
  private def spread = {
    val byType = Window.partitionBy(col("event_type"))
    Tables.events(spark, sf)
      .withColumn("rn", row_number().over(byType.orderBy(col("ts"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("st", expr("1672531200000L + CAST(rn - 1 AS BIGINT) * (63072000000L div n)"))
  }

  test("q82: pruned range scan equals the flat replay (and the file pin holds)") {
    val got = LakeGates.prunedRangeScan.run(spark, sf).collect().map(_.toSeq).toSeq
    val expected = spread
      .filter(col("event_type") === "click" &&
        col("st").between(1688169600000L, 1690847999999L))
      .withColumn("user_bucket", (col("user_id") % 10).cast("long"))
      .groupBy("user_bucket")
      .agg(count(lit(1)).as("n_rows"),
        sum(Tables.dec(col("value"))).cast("double").as("sum_value"),
        min(col("st")).as("min_ts"), max(col("st")).as("max_ts"))
      .orderBy("user_bucket")
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("q83: rule-pruned scan equals the flat replay across all series") {
    val got = LakeGates.rulePrunedScan.run(spark, sf).collect().map(_.toSeq).toSeq
    val expected = spread
      .filter(col("st").between(1690848000000L, 1693526399999L))
      .withColumn("symbol", upper(col("event_type")))
      .groupBy("symbol")
      .agg(count(lit(1)).as("n_rows"),
        sum(Tables.dec(col("value"))).cast("double").as("sum_value"),
        min(col("st")).as("min_ts"), max(col("st")).as("max_ts"))
      .orderBy("symbol")
      .collect().map(_.toSeq).toSeq
    assert(got.size == 5 && got == expected)
  }

  test("re-timestamp is injective even on duplicate source timestamps") {
    import spark.implicits._
    // 1000 rows, only 10 distinct source ts — a worst case no stretch
    // of the raw timeline survives; rank over (ts, event_id) must.
    val dup = (0 until 1000)
      .map(i => (i.toLong, (i % 10).toLong * 1000000L, "click"))
      .toDF("event_id", "ts", "event_type")
    val byType = Window.partitionBy(col("event_type"))
    val st = dup
      .withColumn("rn", row_number().over(byType.orderBy(col("ts"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("st", expr("1672531200000L + CAST(rn - 1 AS BIGINT) * (63072000000L div n)"))
    val agg = st.agg(count(lit(1)).as("n"), countDistinct(col("st")).as("nd"),
      min("st").as("lo"), max("st").as("hi")).head()
    assert(agg.getLong(0) == agg.getLong(1), "spread ts must be collision-free")
    assert(agg.getLong(2) >= 1672531200000L && agg.getLong(3) < 1672531200000L + 63072000000L,
      "spread must stay inside the 24-month window")
  }
}
