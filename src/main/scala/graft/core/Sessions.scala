package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's canonical configuration
  * (SURVEY §7.1 core): UTC session timezone (everything in the lake is
  * epoch-ms UTC), AQE on (runtime skew/coalesce handling at scale),
  * dynamic partition overwrite (merge-write rewrites only touched
  * partitions), nanos-as-long (TIMESTAMP(NANOS) parquet inputs).
  *
  * `shufflePartitions` defaults to the local core count; on a real
  * cluster callers pass ~2-3× total executor cores (AQE coalesces
  * down, so erring high is safe).
  */
object Sessions {
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            shufflePartitions: Option[Int] = None,
            appName: String = "graft"): SparkSession =
    configure(SparkSession.builder().master(s"local[$cores]").appName(appName),
      shufflePartitions.getOrElse(cores)).getOrCreate()

  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
