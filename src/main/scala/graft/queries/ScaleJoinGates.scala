package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.storage.ScaleJoins

/** Driver-gated queries for the SCALE-JOIN techniques (SURVEY J5 /
  * build-prompt "Partitioning & shuffle") — until now spec-only:
  *
  *  - q78: bucketed co-located join. Both sides are written bucketed on
  *    the join key once per (session, data dir); the declared query
  *    joins the bucketed TABLES, which Spark plans with NO exchange on
  *    either join side (pinned by ScaleJoinGatesSpec). At 100 TB this
  *    is the nightly fact⋈dim join with both shuffles paid once at
  *    write time instead of per query.
  *  - q79: salted skew join. 90% of lineitem rows share ONE hot join
  *    key; [[ScaleJoins.saltedJoin]] spreads it over (key, salt)
  *    reducers and must produce the bit-identical result of the plain
  *    join, which the oracle replays directly.
  */
object ScaleJoinGates {

  /** Fact rows capped (o_orderkey < 5M) so the one-time bucketed write
    * stays bounded at any decade; parquet row-group stats prune the cap
    * filter at scan. 8 buckets ≈ local[32] scale; a real cluster sizes
    * buckets to cores the same way.
    */
  private val CAP = 5000000L

  private def bucketedTables(s: SparkSession, d: String): (String, String) = {
    // table identity must track the DATA DIR (sf0.001 spec runs and
    // sf0.01 verify runs share one JVM session) — a SHA-256 of the full
    // path, so two dirs can never alias the same table name and silently
    // repoint each other's buckets. A digest (rather than an injective
    // char escape) is deliberate: Spark SQL table identifiers resolve
    // case-INSENSITIVELY, so any escape that passes letters through
    // verbatim still collides /data/SF1 with /data/sf1; hex output is
    // case-stable and bounded-length for arbitrarily deep paths
    val suffix = java.security.MessageDigest.getInstance("SHA-256")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fact = s"graft_q78_fact_$suffix"
    val dim = s"graft_q78_dim_$suffix"
    graft.core.SessionTempRoots.of(s, d, "graft_bktjoin_") { root =>
      ScaleJoins.writeBucketedAt(
        Tables.orders(s, d).filter(col("o_orderkey") < CAP).select(
          col("o_custkey").as("custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
        fact, "custkey", 8, s"$root/fact")
      ScaleJoins.writeBucketedAt(
        Tables.customer(s, d).select(
          col("c_custkey").as("custkey"), col("c_nationkey")),
        dim, "custkey", 8, s"$root/dim")
    }
    (fact, dim)
  }

  /** Bucketed co-located join, driver-gated (J5 scale path). The oracle
    * replays the plain orders⋈customer aggregate — a bucket routing a
    * key to the wrong file, a bucket pruned at read, or a row lost in
    * the bucketed rewrite changes the per-nation counts/sums.
    */
  val bucketedJoin: Q = Q(
    "q78_bucketed_join",
    """WITH f AS (SELECT o_custkey AS custkey,
      |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |           FROM orders WHERE o_orderkey < 5000000)
      |SELECT c_nationkey, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
      |FROM f JOIN customer ON custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    val (fact, dim) = bucketedTables(s, d)
    s.table(fact).join(s.table(dim), "custkey")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).cast("long").as("sum_cents"))
      .orderBy("c_nationkey")
  }

  /** Salted skew join, driver-gated (J5 skew path). The hot key (90% of
    * lineitem) is spread over 32 (key, salt) reducers; the result must
    * equal the plain join bit-for-bit — any row duplicated by the
    * salt replication or lost by the salt match breaks n/sums.
    *
    * Hot key is 1, not 0: `small` is s_suppkey % 1000 and suppkeys start
    * at 1, so k=1 exists at EVERY scale factor (k=0 first appears at
    * s_suppkey=1000, i.e. sf0.1) — the gate must actually route the 90%
    * hot side through a matching build row to discriminate hot-key
    * replication/loss at the driver's sf0.01.
    */
  val saltedSkewJoin: Q = Q(
    "q79_salted_skew_join",
    """WITH big AS (SELECT CASE WHEN l_orderkey % 100 < 90 THEN 1
      |                         ELSE l_orderkey % 1000 END AS k,
      |                    CAST(l_quantity AS BIGINT) AS q
      |             FROM lineitem),
      |     small AS (SELECT DISTINCT s_suppkey % 1000 AS k,
      |                      (s_suppkey % 1000) * 3 % 97 AS w
      |               FROM supplier)
      |SELECT CAST(big.k % 10 AS BIGINT) AS bucket, COUNT(*) AS n,
      |       CAST(SUM(w) AS BIGINT) AS sum_w, CAST(SUM(q) AS BIGINT) AS sum_qty
      |FROM big JOIN small ON big.k = small.k
      |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d).select(
      when(col("l_orderkey") % 100 < 90, 1L)
        .otherwise(col("l_orderkey") % 1000).as("k"),
      col("l_quantity").cast("long").as("q"))
    val small = Tables.supplier(s, d)
      .select((col("s_suppkey") % 1000).as("k")).distinct()
      .withColumn("w", col("k") * 3 % 97)
    ScaleJoins.saltedJoin(big, small, "k", parts = 32)
      .groupBy((col("k") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("w")).cast("long").as("sum_w"),
        sum(col("q")).cast("long").as("sum_qty"))
      .orderBy("bucket")
  }

  val all: Seq[Q] = Seq(bucketedJoin, saltedSkewJoin)
}
