package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's schema converter
  * rejects; `spark.sql.legacy.parquet.nanosAsLong` reads it as a LONG of
  * epoch-nanoseconds, which is also the most precise representation for
  * lag/gap arithmetic (SURVEY §2.5 W1). DuckDB oracle equivalents use
  * `epoch_ns(ts)`.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** events with `ts` as LONG epoch-nanoseconds. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
  }

  /** Exact money/measure arithmetic: cast to DECIMAL(18,2) before summing so
    * results are order-independent and hash-stable vs the DuckDB oracle.
    */
  def dec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DecimalType(18, 2))

  /** epoch-ns column → epoch-micros (integer `div`; plain `/` would go
    * through DOUBLE and lose precision above 2^53 ≈ 104 days of nanos).
    */
  def nsToUs(colName: String): org.apache.spark.sql.Column =
    expr(s"`$colName` div 1000")
}
