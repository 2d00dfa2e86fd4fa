package graft.core

import graft.SparkSpec
import graft.llm.Dedup
import java.nio.file.{Files, Paths}

class CheckpointsSpec extends SparkSpec {

  test("spark.graft.checkpointDir switches lineage truncation to reliable checkpoints") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    val expected = Dedup.minhashLsh(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val dir = tmpDir("ckpt")
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      val got = Dedup.minhashLsh(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, "results must not depend on checkpoint mode")
      // the reliable checkpoint actually landed on disk
      val persisted = Files.walk(Paths.get(dir)).iterator()
      var n = 0
      while (persisted.hasNext) { persisted.next(); n += 1 }
      assert(n > 1, s"no checkpoint files under $dir")
    } finally spark.conf.unset(Checkpoints.DirConf)
  }

  test("freeAll drops localCheckpoint blocks tracked across a pipeline") {
    import spark.implicits._
    Checkpoints.freeAll() // clean slate from other suites
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    Dedup.minhashLsh(df).count() // takes localCheckpoints internally
    assert(Checkpoints.trackedCount > 0, "checkpoints must be tracked")
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty, "localCheckpoint must persist blocks")
    Checkpoints.freeAll(blocking = true)
    assert(Checkpoints.trackedCount == 0)
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty,
      s"freeAll must unpersist every tracked checkpoint RDD, left: $after")
  }
}
