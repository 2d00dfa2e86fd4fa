package graft.core

import org.apache.spark.rdd.RDD
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
  *
  * Block hygiene: a localCheckpoint's blocks stay resident in the block
  * manager until the RDD handle is GC'd and the ContextCleaner runs —
  * in a long-lived session executing many checkpoint-heavy pipelines
  * (a bench loop, a server) that pressure grows unboundedly and can
  * stall queries. Every localCheckpoint taken here is therefore
  * tracked; call [[freeAll]] at a point where prior results are fully
  * materialized to drop the blocks deterministically.
  */
object Checkpoints {

  val DirConf = "spark.graft.checkpointDir"

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[RDD[_]]()

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
      case _ =>
        val sc = spark.sparkContext
        val before = sc.getPersistentRDDs.keySet
        val out = df.localCheckpoint(eager = true)
        // the blocks belong to the internal RDD that localCheckpoint
        // persisted — diff the persistent-RDD registry to find it
        // (public API; avoids reaching into LogicalRDD internals)
        sc.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!before.contains(id)) tracked.add(rdd)
        }
        out
    }
  }

  /** Drop the executor blocks of every localCheckpoint taken since the
    * last call. A localCheckpoint has NO lineage to fall back on — a
    * freed checkpoint cannot be recomputed — so only call this at a
    * boundary where every DataFrame built on prior checkpoints is fully
    * materialized and dead (between queries in a bench loop, after a
    * merge-write commits). Unknown/already-freed RDDs are ignored.
    */
  def freeAll(blocking: Boolean = false): Unit = {
    var rdd = tracked.poll()
    while (rdd != null) {
      try rdd.unpersist(blocking) catch { case _: Throwable => () }
      rdd = tracked.poll()
    }
  }

  /** Number of tracked (not-yet-freed) checkpoint RDDs — test hook. */
  def trackedCount: Int = tracked.size()

  /** Checkpoint WITHOUT freeAll tracking — for memoized pipeline
    * results that must stay valid ACROSS queries in a session (e.g. the
    * shared LSH-cluster result q55/q59 both read). Pin only small final
    * results: pinned blocks live until the session ends.
    */
  def pinned(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf) match {
      case Some(dir) if dir.nonEmpty =>
        spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(eager = true)
    }
  }
}
