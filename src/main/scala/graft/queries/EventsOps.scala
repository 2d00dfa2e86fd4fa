package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.Tables.dec

/** Time-series / lake operators over the `events` table — the Spark
  * re-expression of the reference's ingest-verify/resample/dedup surface
  * (SURVEY §2: A3 resample, A5/W2 keep-last, A6 mode, W1 lag-diff,
  * P8/P9 gap/overlap predicates, A9 conditional counts, T7 windows,
  * F10 JSON, F1-F4 time functions).
  *
  * `ts` is handled as LONG epoch-nanoseconds end-to-end (see Tables.events);
  * DuckDB oracle uses epoch_ns()/CAST(ts AS TIMESTAMP) equivalents. All
  * window orderings are tie-free (ts is unique in the testdata, and keys
  * include unique ids where it isn't guaranteed).
  */
object EventsOps {

  /** OHLCV-style resample: tumbling 1-hour event-time window per series key
    * (the reference's group_by_dynamic, SURVEY A3/T7). min_by/max_by give
    * deterministic open/close regardless of partitioning (SURVEY §7.4 #3).
    * One shuffle on (event_type, bucket); partial aggregation applies.
    */
  val resampleOhlcv: Q = Q(
    "q20_resample_ohlcv",
    """SELECT event_type,
      |  CAST(epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS bucket_ms,
      |  arg_min(value, ts) AS open,
      |  MAX(value) AS high,
      |  MIN(value) AS low,
      |  arg_max(value, ts) AS close,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY event_type, bucket_ms
      |ORDER BY event_type, bucket_ms""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("bucket_ms", unix_millis(date_trunc("hour", timestamp_micros(Tables.nsToUs("ts")))))
      .groupBy(col("event_type"), col("bucket_ms"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        sum(dec(col("value"))).cast("double").as("volume"),
        count(lit(1)).as("n"))
      .orderBy("event_type", "bucket_ms")
  }

  /** Gap/duplicate detection via lag-diff (W1/P8/P9/A9): per-user inter-event
    * interval; count gaps (> 6h) and overlaps (<= 0) — the reference's
    * verify_integrity report as one aggregation.
    */
  /** NOTE: all epoch arithmetic is done in MICROseconds on both sides —
    * DuckDB truncates parquet TIMESTAMP(NANOS) to µs on read, so the
    * canonical cross-engine epoch is `ts div 1000` == `epoch_us(ts)`.
    */
  val gapDetect: Q = Q(
    "q21_gap_detect",
    """WITH diffs AS (
      |  SELECT user_id,
      |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS diff
      |  FROM events)
      |SELECT user_id,
      |  COUNT(CASE WHEN diff > 21600000000 THEN 1 END) AS gap_count,
      |  COUNT(CASE WHEN diff <= 0 THEN 1 END) AS overlap_count,
      |  COUNT(diff) AS n_intervals
      |FROM diffs
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    Tables.events(s, d)
      .withColumn("ts_us", Tables.nsToUs("ts"))
      .withColumn("diff", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        count(when(col("diff") > 21600000000L, 1)).as("gap_count"),
        count(when(col("diff") <= 0, 1)).as("overlap_count"),
        count(col("diff")).as("n_intervals"))
      .orderBy("user_id")
  }

  /** Mode of the inter-event interval (A6) — bucketed to the minute so the
    * mode is meaningful — computed as groupBy+count+deterministic top-1
    * (count DESC, key ASC) in both engines, avoiding engine-specific
    * mode() tie-breaking.
    *
    * Scale shape: the lag window partitions by UTC day (day-boundary
    * intervals are excluded by construction on BOTH sides) so no global
    * single-partition sort exists anywhere in the plan — each day sorts
    * independently, then the mode is a hash agg + global top-1.
    */
  val modeInterval: Q = Q(
    "q22_mode_interval",
    """WITH diffs AS (
      |  SELECT (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
      |     PARTITION BY epoch_us(ts) // 86400000000 ORDER BY epoch_us(ts))) // 60000000 AS diff_min
      |  FROM events)
      |SELECT diff_min, COUNT(*) AS cnt FROM diffs
      |WHERE diff_min IS NOT NULL
      |GROUP BY diff_min
      |ORDER BY cnt DESC, diff_min
      |LIMIT 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("day")).orderBy(col("ts_us"))
    Tables.events(s, d)
      .withColumn("ts_us", Tables.nsToUs("ts"))
      .withColumn("day", expr("ts_us div 86400000000"))
      .select((col("ts_us") - lag(col("ts_us"), 1).over(w)).as("diff_us"))
      .filter(col("diff_us").isNotNull)
      .select(expr("diff_us div 60000000").as("diff_min"))
      .groupBy(col("diff_min"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("diff_min"))
      .limit(1)
  }

  /** Keep-last dedup per key (A5/W2/S6 upsert semantics): latest event per
    * (user_id, event_type). ts is unique per key in the data; arg_max /
    * max_by are the deterministic "last". At 100 TB this is one hash agg,
    * not a window sort.
    */
  val keepLast: Q = Q(
    "q23_keep_last",
    """SELECT user_id, event_type,
      |  CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_ts_us,
      |  arg_max(value, epoch_us(ts)) AS last_value,
      |  COUNT(*) AS n_superseded
      |FROM events
      |GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("ts_us", Tables.nsToUs("ts"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        max(col("ts_us")).as("last_ts_us"),
        max_by(col("value"), col("ts_us")).as("last_value"),
        count(lit(1)).as("n_superseded"))
      .orderBy("user_id", "event_type")
  }

  /** JSON metadata extraction (F10/P7: the reference's metadata_json filter). */
  val jsonExtract: Q = Q(
    "q24_json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |WHERE json_extract_string(props, '$.k') IS NOT NULL
      |GROUP BY k_bucket
      |ORDER BY k_bucket""".stripMargin) { (s, d) =>
    // Parse the JSON ONCE per row (a pre-agg filter on the parsed key
    // would be a separate Filter operator re-evaluating the extraction;
    // no cross-operator CSE) and with the fused jsonGet kernel, not
    // get_json_object — the built-in acquires a Jackson parser per row
    // through a ThreadLocal pool whose degradation made this query swing
    // 1.8 s ↔ 144 s at sf1 (see JsonGetExpr). Rows with an unparseable
    // key land in the null bucket and are dropped post-agg.
    Tables.events(s, d)
      .groupBy((graft.functions.JsonGetExpr.jsonGet(col("props"), "k")
        .cast("long") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .filter(col("k_bucket").isNotNull)
      .orderBy("k_bucket")
  }

  /** Sliding event-time window (T7 [EXT]): 2-hour window sliding by 1 hour,
    * per event_type — Spark window(); oracle = explicit 2-bucket union.
    */
  val slidingWindow: Q = Q(
    "q25_sliding_window",
    """WITH hours AS (
      |  SELECT event_type, epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS h, value FROM events)
      |SELECT event_type, CAST(win_start AS BIGINT) AS win_start_ms, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM (
      |  SELECT event_type, h AS win_start, value FROM hours
      |  UNION ALL
      |  SELECT event_type, h - 3600000 AS win_start, value FROM hours)
      |GROUP BY event_type, win_start
      |ORDER BY event_type, win_start""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("t", timestamp_micros(Tables.nsToUs("ts")))
      .groupBy(col("event_type"), window(col("t"), "2 hours", "1 hour").as("win"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total"))
      .select(col("event_type"), unix_millis(col("win.start")).as("win_start_ms"),
        col("n"), col("total"))
      .orderBy("event_type", "win_start_ms")
  }

  /** Time functions suite (F1-F4): epoch→timestamp→date/truncate/format. */
  val timeFunctions: Q = Q(
    "q26_time_functions",
    """SELECT CAST(strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS VARCHAR) AS day_str,
      |  CAST(epoch_ms(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT) AS day_ms,
      |  COUNT(*) AS n,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY day_str, day_ms
      |ORDER BY day_str""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("t", timestamp_micros(Tables.nsToUs("ts")))
      .groupBy(
        date_format(col("t"), "yyyyMMdd").as("day_str"),
        unix_millis(date_trunc("day", col("t"))).as("day_ms"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("day_str")
  }

  /** Batch-upsert merge (S6/J3/T3): two simulated ingest batches (overlapping
    * key ranges) merged with keep-last-by-batch semantics — explicit _batch
    * rank makes "last" well-defined under shuffling (SURVEY §7.4 #2).
    */
  val upsertMerge: Q = Q(
    "q27_upsert_merge",
    """WITH b1 AS (SELECT event_id, value, 1 AS _batch FROM events WHERE event_id < 6000),
      |b2 AS (SELECT event_id, value + 1000.0 AS value, 2 AS _batch FROM events WHERE event_id >= 4000 AND event_id < 8000),
      |merged AS (
      |  SELECT event_id, value, _batch,
      |    ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY _batch DESC) AS rn
      |  FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2))
      |SELECT event_id, value FROM merged WHERE rn = 1
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val b1 = ev.filter(col("event_id") < 6000)
      .select(col("event_id"), col("value"), lit(1).as("_batch"))
    val b2 = ev.filter(col("event_id") >= 4000 && col("event_id") < 8000)
      .select(col("event_id"), (col("value") + 1000.0).as("value"), lit(2).as("_batch"))
    val w = Window.partitionBy(col("event_id")).orderBy(col("_batch").desc)
    b1.unionByName(b2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "value")
      .orderBy("event_id")
  }

  /** Tick-bar aggregation (S3 [EXT]): events projected to an open tick
    * shape (ts, side, price, qty) — the same schema `ingestTicksCsv`
    * lands — rolled into hourly bars with VWAP. Exact DECIMAL notional;
    * vwap is one double division of identical exact operands on both
    * engines (hash-stable).
    */
  val tickBars: Q = Q(
    "q51_tick_bars",
    """WITH ticks AS (
      |  SELECT epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS bar_ms,
      |         event_type AS side, value AS price,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty
      |  FROM events)
      |SELECT bar_ms, side, COUNT(*) AS n_ticks,
      |  CAST(SUM(qty) AS BIGINT) AS qty_sum,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2)) * qty) AS DOUBLE) AS notional,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2)) * qty) AS DOUBLE)
      |    / CAST(SUM(qty) AS DOUBLE) AS vwap,
      |  MIN(price) AS low, MAX(price) AS high
      |FROM ticks
      |WHERE qty IS NOT NULL
      |GROUP BY bar_ms, side
      |ORDER BY bar_ms, side""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("t", timestamp_micros(Tables.nsToUs("ts")))
      .withColumn("qty",
        graft.functions.JsonGetExpr.jsonGet(col("props"), "k").cast("long"))
      .filter(col("qty").isNotNull)
      .groupBy(unix_millis(date_trunc("hour", col("t"))).as("bar_ms"),
        col("event_type").as("side"))
      .agg(count(lit(1)).as("n_ticks"),
        sum(col("qty")).as("qty_sum"),
        sum(dec(col("value")) * col("qty")).cast("double").as("notional"),
        // try_divide: an all-zero-qty bar yields NULL vwap, matching
        // DuckDB's divide-by-zero semantics (ANSI Spark would throw)
        try_divide(sum(dec(col("value")) * col("qty")).cast("double"),
          sum(col("qty")).cast("double")).as("vwap"),
        min(col("value")).as("low"), max(col("value")).as("high"))
      .orderBy("bar_ms", "side")
  }

  /** As-of join ([EXT], SURVEY §2.10 class): each click joined to the
    * most recent purchase of the same user at-or-before it — the
    * classic tick↔quote alignment the reference's OHLCV domain needs
    * and Spark has no native operator for.
    *
    * Scale path: ONE shuffle on user_id. Both streams are tagged and
    * unioned, then a running `last(_, ignoreNulls)` over
    * (user_id ORDER BY t, side) carries the latest purchase forward
    * into each click row. No range join, no per-key explosion: a user
    * with P purchases and C clicks costs P+C rows through one sort —
    * versus the O(P·C) pairs a naive range-join+argmax would shuffle.
    * Purchases sort before clicks at equal t (side 0 < 1) ⇒ inclusive
    * `p.ts <= c.ts`, matching DuckDB's ASOF JOIN, which is the oracle.
    * Ordering ends with event_id, so at a µs-timestamp collision the
    * max-event_id purchase is the one carried — deterministic, and the
    * same choice the oracle's max_by(value, event_id) dedup makes.
    */
  val asofJoin: Q = Q(
    "q68_asof_join",
    """WITH p AS (
      |  SELECT user_id, epoch_us(ts) AS pts, max_by(value, event_id) AS purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, epoch_us(ts)
      |), c AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS cts FROM events WHERE event_type = 'click'
      |)
      |SELECT c.event_id, c.user_id, c.cts AS click_ts_us,
      |       p.pts AS purchase_ts_us, p.purchase_value
      |FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.cts >= p.pts
      |ORDER BY c.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).withColumn("t_us", Tables.nsToUs("ts"))
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("t_us"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("side"),
        col("event_id"),
        when(col("event_type") === "purchase", col("value")).as("purchase_value"))
    val w = Window.partitionBy("user_id").orderBy("t_us", "side", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // (ts, value) carried as ONE struct: a purchase whose value is NULL
    // must still advance BOTH columns together (DuckDB ASOF returns the
    // newer ts with a NULL value). Two independent last(_, ignoreNulls)
    // windows would advance ts but keep an older row's value — a
    // cross-row frankenpair.
    ev
      .withColumn("p",
        last(when(col("side") === 0,
          struct(col("t_us"), col("purchase_value"))), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("p").isNotNull)
      .select(col("event_id"), col("user_id"), col("t_us").as("click_ts_us"),
        col("p.t_us").as("purchase_ts_us"), col("p.purchase_value"))
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(
    resampleOhlcv, gapDetect, modeInterval, keepLast, jsonExtract,
    slidingWindow, timeFunctions, upsertMerge, tickBars, asofJoin)
}
