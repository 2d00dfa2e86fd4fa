package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, LongType}

/** Schema-on-read for `events.ts` (reference bar: dl-datalake
  * `storage/writer.py:162-164` — only the column's presence is guaranteed,
  * the physical encoding drifts with the writer). Round 8 broke all nine
  * time-series queries when the driver's testdata moved from parquet
  * TIMESTAMP(NANOS) (read as LONG epoch-ns via `nanosAsLong`) to
  * pandas-written TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). This spec pins
  * the fix: every ts-consuming declared query must produce IDENTICAL results
  * on the same logical data under all three encodings Spark can observe —
  * LONG epoch-ns, TIMESTAMP, and TIMESTAMP_NTZ.
  *
  * (Spark cannot itself write TIMESTAMP(NANOS) parquet; the LongType fixture
  * is byte-for-byte the DataFrame shape `nanosAsLong` yields from one, which
  * is what `Tables.normalizeTsNs` dispatches on.)
  */
class EventsTsEncodingSpec extends SparkSpec {

  // Queries from SparkEntry that read events.ts (the nine that broke in r8).
  private val tsQueries = Seq(
    "q20_resample_ohlcv", "q21_gap_detect", "q22_mode_interval",
    "q23_keep_last", "q25_sliding_window", "q26_time_functions",
    "q28_session_window", "q51_tick_bars", "q68_asof_join")

  /** Deterministic logical events rows, ts in epoch-ns (µs-aligned so the
    * µs encodings are lossless round-trips of the same instants).
    */
  private def logicalEvents: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val base = 1672574400000000L // 2023-01-01T12:00Z in epoch-µs
    val types = Seq("click", "purchase", "view")
    (1 to 500).map { i =>
      val tsNs = (base + rnd.nextInt(86400) * 1000000L + rnd.nextInt(1000)) * 1000L
      (i.toLong, tsNs, (i % 17).toLong, types(rnd.nextInt(3)),
        rnd.nextDouble() * 100, s"""{"k": ${rnd.nextInt(50)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def writeFixture(df: DataFrame, suffix: String): String = {
    val dir = tmpDir(s"events-enc-$suffix")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def collectSorted(name: String, dir: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(_.mkString("|")).sorted.toSeq

  test("all nine ts-consuming queries are identical across LONG-ns, TIMESTAMP and TIMESTAMP_NTZ encodings") {
    val ev = logicalEvents.cache()
    val nsDir = writeFixture(ev, "ns") // LongType ts (the nanosAsLong shape)
    val tzDir = writeFixture(
      ev.withColumn("ts", timestamp_micros(expr("ts div 1000"))), "tz")
    val ntzDir = writeFixture(
      ev.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType)), "ntz")
    // sanity: the three fixtures really do read back as three distinct types
    assert(spark.read.parquet(s"$nsDir/events.parquet").schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$ntzDir/events.parquet").schema("ts").dataType == TimestampNTZType)
    for (q <- tsQueries) {
      val expected = collectSorted(q, nsDir)
      assert(expected.nonEmpty, s"$q returned no rows on the ns fixture")
      assert(collectSorted(q, tzDir) == expected, s"$q: TIMESTAMP != LONG-ns")
      assert(collectSorted(q, ntzDir) == expected, s"$q: TIMESTAMP_NTZ != LONG-ns")
    }
    ev.unpersist()
  }

  test("normalizeTsNs rejects a non-time ts column instead of mis-computing") {
    import spark.implicits._
    val bad = Seq(("a", "2023-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Tables.normalizeTsNs(bad))
    assert(e.getMessage.contains("events.ts"))
  }
}
