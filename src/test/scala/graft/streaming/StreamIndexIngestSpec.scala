package graft.streaming

import graft.SparkSpec
import graft.llm.{Dedup, SemanticIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming form of the persisted-index ingest loops (q69/q97/q98
  * as Structured Streaming): micro-batches commit through the
  * idempotent batch ingest, so the sink's at-least-once replay
  * semantics leave EXACTLY-ONCE index state. Proven the hard way: the
  * checkpoint is discarded after a full run (the worst failure — EVERY
  * batch re-delivers) and the stream re-runs end to end; the index must
  * not move.
  */
class StreamIndexIngestSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.001"
  private val Tau = 0.35

  private def decisionSet(df: DataFrame): Set[(Long, Int, Boolean)] =
    df.select(col("vec_id"), col("cluster").cast("int"), col("kept"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet

  test("streamed semantic ingest == batch ingest; a full checkpoint replay is absorbed") {
    val emb = graft.Tables.embeddings(spark, Dir).select(col("vec_id"), col("embedding"))
    val train = emb.filter(col("vec_id") % 4 =!= 0)

    // batch reference: one committing ingest of the whole corpus
    val ref = tmpDir("stream_sem_ref")
    SemanticIndex.init(spark, ref, train, Tau)
    SemanticIndex.ingest(emb, ref).count()
    val expected = decisionSet(SemanticIndex.decisions(spark, ref))
    assert(expected.exists(!_._3), "test premise: the corpus must contain semantic dups")

    // the stream source: three parquet chunks landing in a dir, drained
    // one file per micro-batch (maxFilesPerTrigger) so the per-batch
    // commit path actually runs three times
    val src = tmpDir("stream_sem_src")
    (0 until 3).foreach { i =>
      emb.filter(pmod(col("vec_id"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(src)
    }
    def stream() = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    val root = tmpDir("stream_sem_idx")
    SemanticIndex.init(spark, root, train, Tau)
    assert(StreamOps.semanticIndexStream(stream(), root, tmpDir("stream_sem_ck1"))
      .awaitTermination(300000), "the stream must drain within the timeout")
    assert(decisionSet(SemanticIndex.decisions(spark, root)) == expected,
      "streamed micro-batch ingest diverged from the monolithic batch ingest")
    val rows = SemanticIndex.indexRows(spark, root).count()

    // lose the checkpoint entirely: a fresh one re-delivers every file —
    // the strongest at-least-once abuse a restart can produce
    assert(StreamOps.semanticIndexStream(stream(), root, tmpDir("stream_sem_ck2"))
      .awaitTermination(300000), "the replay stream must drain within the timeout")
    assert(SemanticIndex.indexRows(spark, root).count() == rows,
      "the full replay must not add index rows")
    assert(decisionSet(SemanticIndex.decisions(spark, root)) == expected,
      "the full replay changed decisions")
  }

  test("streamed LSH ingest == batch ingest; a full checkpoint replay is absorbed") {
    val docs = graft.Tables.documents(spark, Dir).select(col("doc_id"), col("text"))

    // batch reference: one committing ingest of the whole corpus; the
    // witness is the dry-run probe any future batch would run
    val ref = tmpDir("stream_lsh_ref")
    Dedup.initLshIndex(spark, ref)
    Dedup.minhashLshIncremental(docs, ref).count()
    val probe = docs.filter(col("doc_id") % 7 === 0)
    def probeSet(root: String): Set[(Long, Long)] =
      Dedup.minhashLshIncremental(probe, root, append = false)
        .select(col("doc_a"), col("doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probeRef = probeSet(ref)
    assert(probeRef.nonEmpty, "test premise: the probe must find candidates")

    val src = tmpDir("stream_lsh_src")
    (0 until 3).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(src)
    }
    def stream() = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    val root = tmpDir("stream_lsh_idx")
    Dedup.initLshIndex(spark, root)
    assert(StreamOps.lshIndexStream(stream(), root, tmpDir("stream_lsh_ck1"))
      .awaitTermination(300000), "the stream must drain within the timeout")
    assert(probeSet(root) == probeRef,
      "the streamed index serves different candidates than the batch-built one")
    val hashRows = Dedup.lshIndexHashes(spark, root).count()

    assert(StreamOps.lshIndexStream(stream(), root, tmpDir("stream_lsh_ck2"))
      .awaitTermination(300000), "the replay stream must drain within the timeout")
    assert(Dedup.lshIndexHashes(spark, root).count() == hashRows,
      "the full replay must not append hash rows")
    assert(probeSet(root) == probeRef, "the full replay changed the persisted state")
  }
}
