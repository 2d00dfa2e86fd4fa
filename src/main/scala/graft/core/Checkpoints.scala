package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for the engine's iterative/self-joining
  * pipelines (merge-write reads-then-overwrites, LSH index reuse, Lloyd
  * rounds, label propagation).
  *
  * Default is `localCheckpoint(eager)`: executor-memory/disk resident,
  * zero configuration, right for interactive and single-node use. For
  * long cluster jobs where executor loss must not kill the lineage, set
  * `spark.graft.checkpointDir` on the session — every call then becomes
  * a RELIABLE `checkpoint(eager)` persisted to that (HDFS/S3) path, the
  * durable form at real scale. One switch, no call-site changes.
  */
object Checkpoints {

  val DirConf = "spark.graft.checkpointDir"

  def stable(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf) match {
      case Some(dir) if dir.nonEmpty =>
        // idempotent: setCheckpointDir is cheap and the dir may change
        // between calls in tests
        spark.sparkContext.setCheckpointDir(dir)
        // a reliable checkpoint RECOMPUTES lineage for the write unless
        // the data is cached — persist first so each pipeline runs once,
        // then drop the cache (the checkpoint files are the truth).
        // Checkpoint dirs accumulate for the app lifetime unless
        // spark.cleaner.referenceTracking.cleanCheckpoints=true; long
        // jobs should set it alongside spark.graft.checkpointDir.
        val cached = df.persist()
        val out = cached.checkpoint(eager = true)
        cached.unpersist(blocking = false)
        out
      case _ => df.localCheckpoint(eager = true)
    }
  }
}
