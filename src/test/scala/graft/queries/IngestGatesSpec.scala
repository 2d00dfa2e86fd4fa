package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q76/q77 gate queries verified against a Spark-side replay of their
  * DuckDB oracles on the driver's sf0.001 data (the driver re-checks
  * the same equivalences against real DuckDB at sf0.01).
  */
class IngestGatesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q76: chunked + resumed ingest reproduces the arithmetic oracle") {
    // Running the query also asserts the build-time premises: the first
    // download flushed in >=2 chunks (T2) and the second fetched ONLY
    // the tail past the catalog watermark (T1) — both are require()d.
    val got = IngestGates.incrementalResume.run(spark, sf)
      .collect().map(_.toSeq).toSeq
    val expected = Tables.events(spark, sf)
      .select(col("event_id").as("i")).filter(col("i") < 20000).distinct()
      .select(expr("1704067200000 + i * 60000").as("ts"),
        expr("i % 997").as("o"), expr("(i * 7) % 997").as("cl"),
        expr("i % 101").as("v"))
      .groupBy(expr("(ts - 1704067200000) div 86400000").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("o")).cast("long").as("sum_open"),
        sum(col("cl")).cast("long").as("sum_close"),
        sum(col("v")).cast("long").as("sum_vol"),
        max(col("ts")).as("max_ts"))
      .orderBy("day")
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("q77: mergeSchema read diagonal-concats month files; qty NULL only in January") {
    val got = IngestGates.schemaEvolution.run(spark, sf).collect()
    assert(got.nonEmpty)
    // January groups (mon=1) saw no qty column on disk: n_qty == 0 and
    // sum_qty == 0; February groups must count every row's qty.
    got.foreach { r =>
      val (mon, n, nQty, sumQty) =
        (r.getInt(0), r.getLong(2), r.getLong(3), r.getLong(5))
      if (mon == 1) assert(nQty == 0L && sumQty == 0L)
      else assert(nQty == n)
    }
    val expected = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k")).filter(col("k") < 20000).distinct()
      .select(col("k"),
        when(col("k") % 2 === 0, 1).otherwise(2).as("mon"),
        (col("k") % 500).as("price"),
        when(col("k") % 2 === 1, col("k") % 37).as("qty"))
      .groupBy(col("mon"), (col("k") % 7).as("bucket"))
      .agg(count(lit(1)).as("n"), count(col("qty")).as("n_qty"),
        sum(col("price")).cast("long").as("sum_price"),
        coalesce(sum(col("qty")), lit(0)).cast("long").as("sum_qty"))
      .orderBy("mon", "bucket")
      .collect().map(_.toSeq).toSeq
    assert(got.map(_.toSeq).toSeq == expected)
  }
}
