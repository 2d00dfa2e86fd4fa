package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics + plan shape for the as-of join (q68): inclusive
  * at-or-before match, no-match drop, collision tiebreak, and the
  * single-shuffle no-join physical plan that makes it scale.
  */
class AsofJoinSpec extends SparkSpec {

  private def eventsDf(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    // (event_id, ts_ns, user_id, event_type, value) — matches the
    // events table shape the query reads (ts as epoch-ns long)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
  }

  private def runAsof(rows: Seq[(Long, Long, Long, String, Double)]): Seq[(Long, Long, Long, Double)] = {
    val dir = tmpDir("asof")
    eventsDf(rows).write.mode("overwrite").parquet(s"$dir/events.parquet")
    EventsOps.asofJoin.run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
  }

  private val us = 1000L // 1 µs in ns

  test("inclusive at-or-before match; clicks with no prior purchase drop") {
    val out = runAsof(Seq(
      (1L, 100L * us, 7L, "purchase", 10.0),
      (2L, 200L * us, 7L, "click", 0.0),     // matches ts=100 purchase
      (3L, 300L * us, 7L, "purchase", 20.0),
      (4L, 300L * us, 7L, "click", 0.0),     // equal ts: INCLUSIVE -> 20.0
      (5L, 50L * us, 9L, "click", 0.0),      // user 9 has no purchase at all
      (6L, 400L * us, 8L, "click", 0.0)))    // user 8 has none either
    assert(out.toSet == Set(
      (2L, 200L, 100L, 10.0),
      (4L, 300L, 300L, 20.0)))
  }

  test("µs-timestamp collision carries the max-event_id purchase (oracle's max_by)") {
    val out = runAsof(Seq(
      (11L, 100L * us, 7L, "purchase", 1.0),
      (12L, 100L * us, 7L, "purchase", 2.0), // same µs, larger event_id wins
      (13L, 150L * us, 7L, "click", 0.0)))
    assert(out == Seq((13L, 150L, 100L, 2.0)))
  }

  test("later purchases shadow earlier ones per user, not across users") {
    val out = runAsof(Seq(
      (21L, 100L * us, 1L, "purchase", 1.0),
      (22L, 200L * us, 1L, "purchase", 2.0),
      (23L, 250L * us, 1L, "click", 0.0),   // -> 2.0
      (24L, 150L * us, 2L, "purchase", 9.0),
      (25L, 260L * us, 2L, "click", 0.0)))  // -> 9.0 (not user 1's)
    assert(out.toSet == Set((23L, 250L, 200L, 2.0), (25L, 260L, 150L, 9.0)))
  }

  test("NULL-value purchase advances ts AND value together (no cross-row pair)") {
    // DuckDB ASOF returns the NEWEST at-or-before purchase even when its
    // value is NULL — ts and value must come from the same row, never a
    // newer ts paired with an older row's value.
    import spark.implicits._
    val dir = tmpDir("asofnull")
    Seq(
      (1L, 100L * us, 7L, "purchase", Some(10.0)),
      (2L, 200L * us, 7L, "purchase", Option.empty[Double]),
      (3L, 300L * us, 7L, "click", Some(0.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventsOps.asofJoin.run(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(3) == 200L, "must carry the newer purchase's ts")
    assert(r(0).isNullAt(4), "must carry the newer purchase's NULL value, not the older 10.0")
  }

  test("plan: one hash-partition shuffle, no join operator") {
    val dir = tmpDir("asofplan")
    eventsDf(Seq((1L, 1000L, 7L, "purchase", 1.0), (2L, 2000L, 7L, "click", 0.0)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = EventsOps.asofJoin.run(spark, dir)
    df.collect()
    // count only the final AQE plan, not the echoed "== Initial Plan =="
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashShuffles == 1, s"expected exactly one hash shuffle:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }
}
