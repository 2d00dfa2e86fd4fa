package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.core.Timeframes

/** Structured-Streaming forms of the engine's incremental behaviors
  * (SURVEY §2.9). The reference is batch-incremental (pull loops that
  * resume from a catalog watermark); these are the true streaming
  * equivalents: event-time windows + watermarks for resample, dedup
  * with bounded state for late/duplicate candles, and per-key
  * mapGroupsWithState for batch-continuity checks.
  */
object StreamOps {

  /** Streaming OHLCV resample: event-time tumbling window with a
    * watermark bounding state (T7). Input must carry `ts` (epoch-ms)
    * plus o/h/l/c/v columns; output one row per (window, keys) in
    * append mode once the watermark passes.
    *
    * min_by/max_by keep open/close deterministic exactly as the batch
    * path (graft.ops.SeriesOps.resampleOhlcv) — same semantics, same
    * aggregation shape, so batch and streaming results agree.
    */
  def resampleStream(input: DataFrame, timeframe: String,
                     lateness: String = "10 minutes",
                     keys: Seq[String] = Nil): DataFrame = {
    val interval = Timeframes.toSparkInterval(timeframe)
    // the SAME agg expressions as the batch path, by construction
    val aggs = graft.ops.SeriesOps.ohlcvAggs
    input
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", lateness)
      .groupBy(keys.map(col) :+ window(col("event_time"), interval).as("w"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket_ts", unix_millis(col("w.start")))
      .drop("w")
  }

  /** Streaming keep-first dedup on (keys, ts) with watermark-bounded
    * state (T3): re-delivered candles inside the lateness window are
    * dropped; revisions should instead flow through the batch upsert.
    */
  def dedupStream(input: DataFrame, lateness: String = "10 minutes",
                  keys: Seq[String] = Nil): DataFrame =
    input
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", lateness)
      .dropDuplicates(keys :+ "event_time")

  /** Streaming corpus curation: the incremental form of the LLM-pipeline
    * front door (new crawl shards land continuously). Exact dedup on the
    * sha256 content fingerprint with WATERMARK-BOUNDED state
    * (dropDuplicatesWithinWatermark — state for a fingerprint is freed
    * once the watermark passes its event time, so state size tracks the
    * lateness window, not corpus history), then the same quality-gate
    * and language-ID expressions as the batch path — identical semantics
    * by construction, so batch backfill and streaming ingest agree.
    *
    * Near-dup (MinHash) stays batch: its band self-join needs the full
    * corpus side; the streaming layer's job is to keep the incremental
    * exact-dedup + scoring state bounded, not to re-run LSH per batch.
    */
  def curateStream(docs: DataFrame, lateness: String = "1 hour",
                   tsCol: String = "ingest_ts", textCol: String = "text"): DataFrame = {
    val deduped = docs
      .withColumn("event_time", timestamp_millis(col(tsCol)))
      .withWatermark("event_time", lateness)
      .withColumn("fp", sha2(col(textCol), 256))
      .dropDuplicatesWithinWatermark("fp")
    graft.llm.TextAnalysis.qualityGate(deduped, textCol)
      .withColumn("lang", graft.llm.TextAnalysis.langId(col(textCol)))
  }

  /** Per-series continuity state for the W4 check (previous batch's last
    * ts vs next batch's first).
    */
  final case class SeriesState(lastTs: Long)
  final case class ContinuityEvent(key: String, firstTs: Long, lastTs: Long,
                                   gapFromPrev: Long)

  /** mapGroupsWithState continuity check (W4/T2): for each series key,
    * report the gap between the previous micro-batch's max(ts) and this
    * batch's min(ts). gapFromPrev = -1 on the first batch for a key.
    */
  def continuityCheck(input: DataFrame, keyCol: String)
                     (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    input.select(col(keyCol).cast("string").as("k"), col("ts").cast("long").as("ts"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[SeriesState]) =>
          val ts = rows.map(_._2).toSeq
          val first = ts.min; val last = ts.max
          val gap = state.getOption.map(s => first - s.lastTs).getOrElse(-1L)
          state.update(SeriesState(math.max(last, state.getOption.map(_.lastTs).getOrElse(Long.MinValue))))
          ContinuityEvent(key, first, last, gap)
      }
      .toDF()
  }

  /** File-source incremental pipeline (T1): stream new parquet files
    * appearing under `srcDir` into a sink via foreachBatch, processing
    * everything currently available then stopping (Trigger.AvailableNow)
    * — the Structured-Streaming form of the reference's resume loop,
    * with offsets tracked in the checkpoint instead of a manual
    * max(time_to) query.
    */
  def incrementalCopy(spark: SparkSession, srcDir: String, checkpoint: String)
                     (process: DataFrame => Unit): StreamingQuery = {
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    src.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => process(batch) }
      .start()
  }

  /** Streaming ingest into the persisted SEMANTIC index — the
    * Structured-Streaming form of the q97/q98 ingest loop: each
    * micro-batch commits through [[graft.llm.SemanticIndex.ingest]],
    * whose id-level idempotence upgrades the sink's at-least-once
    * replay semantics (foreachBatch re-delivers the in-flight batch
    * after a failure or a checkpoint restart) to EXACTLY-ONCE index
    * state — no marker files, no two-phase commit: a replayed id is
    * absorbed structurally, so the checkpoint and the index can never
    * disagree, even if the checkpoint is lost entirely and the whole
    * stream replays. Committing micro-batches serialize through the
    * index's dir lease like any other writer. `AvailableNow` by
    * default (drain everything present, then stop — the maintenance-
    * window cadence); pass a ProcessingTime trigger to tail
    * continuously. Input must carry (`vec_id`, `embedding`).
    */
  def semanticIndexStream(vectors: DataFrame, root: String, checkpoint: String,
                          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.llm.SemanticIndex.ingest(batch, root).count(): Unit
      }
      .start()

  /** Streaming ingest into the persisted MinHash-LSH band index — the
    * q69 incremental near-dup loop as a stream. Same exactly-once
    * construction as [[semanticIndexStream]]: per-micro-batch commits
    * through [[graft.llm.Dedup.minhashLshIncremental]], which absorbs
    * replayed doc ids, so at-least-once delivery leaves exactly-once
    * index state. Input must carry (`doc_id`, `text`).
    */
  def lshIndexStream(docs: DataFrame, root: String, checkpoint: String,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.llm.Dedup.minhashLshIncremental(batch, root).count(): Unit
      }
      .start()
}
