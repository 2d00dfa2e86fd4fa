package graft

import org.apache.spark.sql.SparkSession

/** Single-query profiler: run one SparkEntry query at a scale dir,
  * print cold + warm wall time and (optionally) the final executed
  * plan. The fast feedback loop for chasing a per-query scale
  * regression that Bench (all 67, warmup pass included) is too
  * coarse for.
  *
  * Usage: graft.RunOne <sfDir> <queryName> [--explain] [--runs N]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val explain = args.contains("--explain")
    val runs = args.sliding(2).collectFirst {
      case Array("--runs", n) => n.toInt }.getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", Bench.autoSplitBytes(sfDir))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    var lastDf: org.apache.spark.sql.DataFrame = null
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      lastDf = fn(spark, sfDir)
      val n = lastDf.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[runone] $name run $i: $dt%.2f s, $n rows")
      graft.core.Checkpoints.freeAll()
    }
    if (explain && lastDf != null) {
      // count() above executed a separate plan; execute THIS df so the
      // printed plan is the final AQE-re-planned one
      lastDf.queryExecution.toRdd.count()
      println(lastDf.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
