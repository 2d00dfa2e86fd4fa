package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.Tables.dec

/** Relational operator coverage over the TPC-H-ish star schema
  * (SURVEY §2: J5 joins, A10 aggregations, W6 windows, O6 top-k,
  * U5 set ops, P* predicates, O* sorts).
  *
  * Scale notes (100 TB design): fact-side tables (`lineitem`, `orders`)
  * are only ever touched by scans with pushed-down predicates, hash
  * partial+final aggregation, or shuffles keyed on their join keys;
  * dimension tables (`nation`, `region`, `customer`, `supplier`, `part`)
  * are broadcast explicitly so fact tables never shuffle for a dim join.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: scan + filter pushdown + hash agg
    * (Catalyst plans partial+final automatically → map-side combine).
    */
  val pricingSummary: Q = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Pushed-down range predicate + narrow projection (P1/P2, O1): the scan
    * must read only 4 columns and skip row groups via parquet stats.
    */
  val filterProject: Q = Q(
    "q02_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '2000-04-01 00:00:00'
      |  AND l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("2000-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("2000-04-01 00:00:00").cast("timestamp") &&
        col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** 5-way star join: fact table shuffles only on l_orderkey/o_custkey;
    * nation/region broadcast (no shuffle for dim joins).
    */
  val revenueByNation: Q = Q(
    "q03_revenue_by_nation",
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      // customer is UNHINTED: it scales with SF (15 M rows at sf100 —
      // force-broadcasting it builds a driver-side hash of the whole
      // table); AQE broadcasts it at small SF from runtime stats and
      // correctly falls back to SMJ at scale. nation/region are
      // fixed-cardinality (25/5 rows) and safe to pin.
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Broadcast equi-join + agg by dimension attribute (J5/A10). */
  val segmentSummary: Q = Q(
    "q04_segment_summary",
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_orders,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      // unhinted for the same reason as q03: customer scales with SF
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy("c_mktsegment")
  }

  /** Left-semi join (EXISTS): parts that appear in any lineitem (J5). */
  val semiJoin: Q = Q(
    "q05_semi_join",
    """SELECT p_brand, COUNT(*) AS n_parts
      |FROM part
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 49)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 49),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy("p_brand")
  }

  /** Left-anti join (NOT EXISTS): customers with no orders in 2001+, per
    * nation — the same shape as the catalog audit reconciliation (SURVEY
    * J1/J2/U3).
    */
  val antiJoin: Q = Q(
    "q06_anti_join",
    """SELECT n_name, COUNT(*) AS n_customers_without_orders
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers_without_orders"))
      .orderBy("n_name")
  }

  /** ROLLUP grouping sets (A10). NULL grouping keys are coalesced to a
    * marker on both sides so row ordering/hashing never sees NULL keys.
    */
  val rollupStatus: Q = Q(
    "q07_rollup_status",
    """SELECT COALESCE(o_orderstatus, '(all)') AS status,
      |       COALESCE(o_orderpriority, '(all)') AS priority,
      |       COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy("status", "priority")
  }

  /** CUBE grouping sets (A10). */
  val cubeReturns: Q = Q(
    "q08_cube_returns",
    """SELECT COALESCE(l_returnflag, '(all)') AS rflag,
      |       COALESCE(l_linestatus, '(all)') AS lstatus,
      |       COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY rflag, lstatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).cast("double").as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("rflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("lstatus"),
        col("n"), col("qty"))
      .orderBy("rflag", "lstatus")
  }

  /** Ranking window, top-k per group, deterministic tiebreak by unique key
    * (W5/W6/O6: the reference's latest-version-per-feature-set shape).
    */
  val rankWindow: Q = Q(
    "q09_rank_per_nation",
    """SELECT n_name, c_custkey, c_acctbal, rnk FROM (
      |  SELECT n_name, c_custkey, c_acctbal,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
      |WHERE rnk <= 5
      |ORDER BY n_name, rnk""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("n_name")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select("n_name", "c_custkey", "c_acctbal", "rnk")
      .orderBy("n_name", "rnk")
  }

  /** Running-sum analytic frame within a natural key (W6 rowsBetween).
    *
    * The ROWS frame orders by (l_linenumber, l_quantity): l_linenumber
    * alone is NOT unique per order, and a ROWS frame over tied rows with
    * different quantities assigns engine-dependent running sums (caught
    * for real by the sf1 gate — sf0.01/sf0.1 just never drew an unlucky
    * tie). With quantity as the tie-break, remaining ties have EQUAL
    * increments, so the result multiset is deterministic.
    */
  val runningSum: Q = Q(
    "q10_running_sum",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
      |    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem
      |WHERE l_orderkey < 1000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"), col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 1000)
      .select(col("l_orderkey"), col("l_linenumber"),
        sum(dec(col("l_quantity"))).over(w).cast("double").as("running_qty"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Global top-k (Catalyst TakeOrderedAndProject — no full sort at scale). */
  val topKOrders: Q = Q(
    "q11_topk_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(10)
  }

  /** INTERSECT set op (U5): nations present among both customers and suppliers. */
  val intersectNations: Q = Q(
    "q12_intersect_nations",
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")
  }

  /** EXCEPT set op (U3): parts never shipped by any supplier from nation 0.
    *
    * Scale shape: the oracle SQL's part⋈lineitem join is REDUNDANT for the
    * EXCEPT (every l_partkey is a part key; keys outside `part` are no-ops
    * to subtract), so the Spark plan drops it — lineitem map-side
    * broadcast-joins the filtered supplier, partial-distincts the surviving
    * part keys, and only then shuffles. That removes the full
    * lineitem-by-partkey exchange (600 M rows at sf100) the literal form
    * pays; the EXCEPT itself is one anti-join on ~|distinct shipped keys|.
    */
  val exceptBrands: Q = Q(
    "q13_except_parts",
    """SELECT p_partkey FROM part
      |EXCEPT
      |SELECT p_partkey FROM part
      |  JOIN lineitem ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |WHERE s_nationkey = 0
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val shipped = Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d).filter(col("s_nationkey") === 0)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"))
      .distinct()
    // EXCEPT == Distinct(LeftAnti(...)): the Distinct re-shuffles every
    // surviving part key to dedup a side that is ALREADY unique
    // (p_partkey is the part table's primary key), so the anti-join
    // alone is set-identical — one exchange fewer at every scale, and
    // the oracle's EXCEPT hash-gates the equivalence per run.
    Tables.part(s, d).select("p_partkey")
      .join(shipped, Seq("p_partkey"), "left_anti")
      .orderBy("p_partkey")
  }

  /** Conditional counts (A9: the reference's gap/overlap verify report shape). */
  val conditionalAgg: Q = Q(
    "q14_conditional_agg",
    """SELECT l_returnflag,
      |  COUNT(CASE WHEN l_quantity > 40 THEN 1 END) AS n_large,
      |  COUNT(CASE WHEN l_quantity <= 10 THEN 1 END) AS n_small,
      |  COUNT(CASE WHEN l_discount = 0.0 THEN 1 END) AS n_nodisc
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(when(col("l_quantity") > 40, 1)).as("n_large"),
        count(when(col("l_quantity") <= 10, 1)).as("n_small"),
        count(when(col("l_discount") === 0.0, 1)).as("n_nodisc"))
      .orderBy("l_returnflag")
  }

  /** min/max/distinct bounds (A1/A2/A7: catalog time_from/time_to shape). */
  val bounds: Q = Q(
    "q15_bounds",
    """SELECT o_orderstatus,
      |  CAST(epoch_ms(MIN(o_orderdate)) AS BIGINT) AS first_order_ms,
      |  CAST(epoch_ms(MAX(o_orderdate)) AS BIGINT) AS last_order_ms,
      |  COUNT(DISTINCT o_orderpriority) AS n_priorities,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        // parquet TIMESTAMP(isAdjustedToUTC=false) loads as TIMESTAMP_NTZ;
        // session TZ is pinned UTC so the LTZ cast is identity
        unix_millis(min(col("o_orderdate")).cast("timestamp")).as("first_order_ms"),
        unix_millis(max(col("o_orderdate")).cast("timestamp")).as("last_order_ms"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** Theta/range join (J5): price-band join of orders against a banded
    * dimension derived from part sizes — banded equi-prefilter shape that
    * survives scale (band key join, not a cross product).
    */
  val rangeJoin: Q = Q(
    "q16_range_join_bands",
    """WITH bands AS (
      |  SELECT p_size AS band, CAST(p_size * 10000 AS DOUBLE) AS lo, CAST((p_size + 1) * 10000 AS DOUBLE) AS hi
      |  FROM part WHERE p_partkey <= 50
      |)
      |SELECT band, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS band_total
      |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band
      |ORDER BY band""".stripMargin) { (s, d) =>
    val bands = Tables.part(s, d).filter(col("p_partkey") <= 50)
      .select(col("p_size").as("band"),
        (col("p_size") * 10000).cast("double").as("lo"),
        ((col("p_size") + 1) * 10000).cast("double").as("hi"))
    Tables.orders(s, d)
      .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("band_total"))
      .orderBy("band")
  }

  /** Correlated-subquery coverage (SURVEY §2.3 J5 / §4 "subquery
    * decorrelation"): declared as SQL TEXT so Catalyst's
    * RewriteSubquery/decorrelation rules are actually exercised — the
    * DataFrame API (q05/q06) never produces a correlated subquery. The
    * SAME string is the DuckDB oracle, so Spark and oracle cannot
    * drift. At scale the EXISTS decorrelates to a left-semi hash join
    * on o_orderkey — the fact table shuffles once on its join key.
    */
  private val existsSql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Run SQL text that references bare table names: register temp views,
    * analyze, then drop the views. `spark.sql` analyzes EAGERLY, so the
    * returned DataFrame's plan no longer needs the views — dropping them
    * leaves no catalog residue, and the lock makes the register→analyze
    * window atomic (concurrent runs against different dirs would
    * otherwise silently resolve against each other's views).
    */
  private def sqlOverViews(s: SparkSession, sql: String,
                           views: Map[String, DataFrame]): DataFrame =
    Relational.synchronized {
      views.foreach { case (n, df) => df.createOrReplaceTempView(n) }
      try s.sql(sql)
      finally views.keys.foreach(s.catalog.dropTempView(_))
    }

  val existsSubquery: Q = Q("q63_exists_subquery", existsSql) { (s, d) =>
    sqlOverViews(s, existsSql, Map(
      "orders" -> Tables.orders(s, d), "lineitem" -> Tables.lineitem(s, d)))
  }

  /** Correlated SCALAR subqueries (TPC-H Q17 shape: small-quantity
    * orders vs the per-part average), decorrelated by Catalyst into an
    * aggregate + join on l_partkey per subquery. The avg comparison is
    * multiplied out (2·qty·cnt < sum) so no float division ever
    * decides a row — and the multiply runs in BIGINT "cents"
    * (ROUND(qty·100) is exact for 2-decimal quantities): the earlier
    * DECIMAL(38) form allocated several BigDecimals per joined row,
    * and at sf1 that 6M-row allocation burst drove G1 heap
    * grow/uncommit churn — 40–100 s wall on an unpinned local heap for
    * a 2 s query (real clusters pin executor heaps, Xms=Xmx, but the
    * long-only condition is strictly better everywhere). Two
    * subqueries ⇒ the fact table is scanned three times (outer + one
    * aggregate per subquery): Spark decorrelates per-subquery and
    * never merges correlated subqueries, and the folded
    * single-subquery form (sum − 2·qty·cnt in one aggregate) is
    * REJECTED by Spark — outer references are only allowed in
    * WHERE/HAVING inside a subquery — so this is the minimal supported
    * SQL-text shape. (A DataFrame user would write the groupBy+join
    * directly and pay two scans.)
    */
  private val scalarSql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |       COUNT(*) AS n_items
      |FROM lineitem l1
      |WHERE CAST(ROUND(l1.l_quantity * 100) AS BIGINT) * 2 *
      |      (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
      |    < (SELECT SUM(CAST(ROUND(l3.l_quantity * 100) AS BIGINT))
      |       FROM lineitem l3 WHERE l3.l_partkey = l1.l_partkey)""".stripMargin

  val scalarSubquery: Q = Q("q64_scalar_subquery", scalarSql) { (s, d) =>
    // The groupBy+join form of scalarSql (the oracle still runs the
    // SQL-text shape above): Spark decorrelates the two correlated
    // subqueries SEPARATELY — the executed plan scanned lineitem THREE
    // times and ran two per-partkey aggregates, each with its own
    // shuffle + broadcast. One aggregate computes (count, cents-sum)
    // per partkey in a single pass, halving the aggregate work and
    // cutting a full scan. Row-for-row equivalent: l_partkey never
    // joins on NULL on either form (a NULL key makes the correlated
    // predicate NULL → filtered; an inner equi-join drops it the same
    // way), every surviving partkey has count ≥ 1, and the predicate
    // mirrors the SQL's exact BIGINT-cents arithmetic and operator
    // order ((cents * 2) * cnt < sum).
    val li = Tables.lineitem(s, d)
    val cents = round(col("l_quantity") * 100).cast("long")
    val per = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("_cnt"), sum(cents).as("_sum_cents"))
    li.join(per, Seq("l_partkey"))
      .filter(cents * 2 * col("_cnt") < col("_sum_cents"))
      .agg(sum(dec(col("l_extendedprice"))).cast("double").as("total_price"),
        count(lit(1)).as("n_items"))
  }

  val all: Seq[Q] = Seq(
    pricingSummary, filterProject, revenueByNation, segmentSummary, semiJoin,
    antiJoin, rollupStatus, cubeReturns, rankWindow, runningSum, topKOrders,
    intersectNations, exceptBrands, conditionalAgg, bounds, rangeJoin,
    existsSubquery, scalarSubquery)
}
