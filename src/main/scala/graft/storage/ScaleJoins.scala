package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-join techniques (SURVEY J5 / build-prompt "Partitioning &
  * shuffle"): bucketing for shuffle-free co-located joins, and salting
  * for skewed keys.
  */
object ScaleJoins {

  /** Write both sides bucketed by the join key into the session
    * warehouse. A later equi-join of the two tables on that key needs
    * NO exchange on either side (SortMergeJoin reads co-located
    * buckets) — at 100 TB this converts the nightly fact⋈fact join
    * from two full shuffles to zero.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** [[writeBucketed]] variant that pins the table DATA to an explicit
    * path (external table): callers that bucket into a reaped temp root
    * (q78's session fixture) don't leave files in the warehouse dir.
    */
  def writeBucketedAt(df: DataFrame, table: String, key: String,
                      buckets: Int, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for skewed keys: the big (skewed) side gets a
    * random salt in [0, parts); the small side is replicated `parts`
    * times with every salt value; the join key becomes (key, salt) so
    * one hot key spreads over `parts` reducers. Result is identical to
    * the unsalted join.
    *
    * (AQE's skewJoin handles this adaptively for sort-merge joins;
    * explicit salting remains the tool when AQE can't split — e.g.
    * aggregations after the join keyed on the hot key, or non-SMJ
    * plans.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 parts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", (rand(seed = 42) * parts).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(parts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
