package graft.streaming

import graft.SparkSpec
import graft.queries.StreamingQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** q74 (driver-gated streaming window agg): the emitted append-mode
  * result must equal the batch aggregation restricted to windows the
  * final watermark closed — on BOTH physical ts encodings (ns long and
  * µs TIMESTAMP_NTZ), same bar as EventsTsEncodingSpec.
  */
class StreamGateSpec extends SparkSpec {

  // 3 users × 3 event types over ~5 hours; tail events inside the last
  // hour+lateness stay open and must NOT be emitted
  private def fixture(): DataFrame = {
    import spark.implicits._
    val h = 3600L * 1000 * 1000 * 1000 // 1 hour in ns
    val base = 1700000000000000000L / h * h // hour-aligned epoch ns
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      val ts = base + (rnd.nextDouble() * 5.2 * h).toLong
      (i.toLong, ts, (i % 3).toLong, Seq("click", "view", "purchase")(i % 3),
        math.rint(rnd.nextDouble() * 10000) / 100)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
  }

  private def expected(dir: String): Set[(Long, String, Long, Double)] = {
    val ev = graft.Tables.events(spark, dir)
      .withColumn("us", graft.Tables.nsToUs("ts"))
    val maxUs = ev.agg(max(col("us"))).head().getLong(0)
    val watermarkUs = (maxUs / 1000 - 600000L) * 1000
    ev.withColumn("bucket_us", expr("(us div 3600000000) * 3600000000"))
      .filter(col("bucket_us") + 3600000000L <= watermarkUs)
      .groupBy(expr("bucket_us div 1000").as("bucket_ms"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.Tables.dec(col("value"))).cast("double").as("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  private def emitted(dir: String): Set[(Long, String, Long, Double)] =
    StreamingQueries.streamWindowAgg.run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("streaming append result == batch agg + watermark cutoff (ns-long ts)") {
    val dir = tmpDir("q74ns")
    fixture().write.mode("overwrite").parquet(s"$dir/events.parquet")
    val exp = expected(dir)
    assert(exp.nonEmpty, "fixture must close at least one window")
    assert(emitted(dir) == exp)
  }

  test("open tail windows are withheld; µs TIMESTAMP_NTZ encoding agrees") {
    val dir = tmpDir("q74us")
    fixture()
      .withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    val exp = expected(dir)
    val got = emitted(dir)
    assert(got == exp)
    // the cutoff is doing real work: the batch agg WITHOUT it has more windows
    val allWindows = graft.Tables.events(spark, dir)
      .select(expr("(ts div 1000) div 3600000000").as("b"), col("event_type"))
      .distinct().count()
    assert(got.size < allWindows)
  }
}
