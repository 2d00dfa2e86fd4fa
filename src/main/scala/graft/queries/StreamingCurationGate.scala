package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.Tables

/** q86: streaming corpus curation under the oracle (SURVEY §2.9 T3/T7 +
  * the LLM-pipeline front door — `StreamOps.curateStream`, spec-only
  * until now). This is the shape a production training-data pipeline
  * runs 24/7: crawl shards land continuously, each batch is exact-
  * deduped against WATERMARK-BOUNDED state (dropDuplicatesWithinWatermark
  * — state per fingerprint is freed once the watermark passes, so state
  * tracks the lateness window, not corpus history), then quality-gated
  * and language-classified with the same expressions as the batch path.
  *
  * The gate runs a REAL multi-batch stream: two parquet shards — the
  * capped documents slice, then the SAME texts re-keyed as a full
  * duplicate re-crawl — fed one file per micro-batch
  * (maxFilesPerTrigger=1 under Trigger.AvailableNow), so the dedup that
  * matters happens ACROSS batches through the state store, not inside
  * one batch. Premises `require` ≥2 non-empty micro-batches and that
  * the sink holds exactly the distinct-text count (the whole duplicate
  * shard was dropped by state, none of it re-emitted).
  *
  * The oracle replays dedup + gates in static SQL over DISTINCT text:
  * ingest timestamps are packed into a 10-minute span (≪ the 1-hour
  * lateness), so no row is late and watermark-bounded dedup ==
  * global exact dedup BY CONSTRUCTION — which batch a surviving row
  * came from cannot matter because every output column derives from
  * `text` alone (the q74 replay pattern applied to stateful curation).
  * The aggregation happens on the SINK (batch, after the stream
  * completes); the streaming side emits curated rows in append mode.
  */
object StreamingCurationGate {

  private val T0 = 1704067200000L // 2024-01-01 UTC
  private val CAP = 5000L

  /** Fixture built once per (session, data dir): the two-shard feed is
    * staged, the REAL multi-batch stream runs against it, the cross-
    * batch-dedup premises are `require`d, and the curated sink is
    * persisted under `root/curated` — so the declared query reads the
    * stream's actual output without paying a stream start per
    * execution. Same per-session gate shape as q84/q87 (the forked
    * writer / download loop also run at fixture build): every
    * CORRECTNESS/Bench session re-runs the stream and its premises
    * exactly once; the timed pass measures the curated-read path.
    *
    * Shard 0 = the capped corpus slice, shard 1 = the same texts
    * re-keyed +500 ms (a duplicate re-crawl). Modification times force
    * shard order; maxFilesPerTrigger=1 makes each shard its own
    * micro-batch, so the dedup that matters crosses the state store.
    */
  private def curatedRoot(s: SparkSession, d: String): String =
    graft.core.SessionTempRoots.of(s, d, "graft_scur_") { root =>
      val feed = Files.createDirectories(Paths.get(root, "feed")).toString
      val base = Tables.documents(s, d).filter(col("doc_id") < CAP)
        .withColumn("ingest_ts", lit(T0) + (col("doc_id") % 600) * 1000)
      require(base.limit(1).count() > 0, "q86 premise: documents must be non-empty")
      val dup = base
        .withColumn("doc_id", col("doc_id") + 10000000L)
        .withColumn("ingest_ts", col("ingest_ts") + 500)
      Seq(base, dup).zipWithIndex.foreach { case (df, i) =>
        val tmp = s"$root/stage$i"
        df.coalesce(1).write.parquet(tmp)
        val part = graft.core.PathWalk.walk(Paths.get(tmp))(
          _.find(_.toString.endsWith(".parquet"))
            .getOrElse(throw new IllegalStateException(s"no part file in $tmp")))
        val dst = Paths.get(feed, f"shard$i%02d.parquet")
        Files.move(part, dst)
        Files.setLastModifiedTime(dst, // shard order = crawl order
          java.nio.file.attribute.FileTime.fromMillis(T0 + i * 60000L))
      }

      // session clone: 8 shuffle partitions size the dedup state store to
      // the workload (one store per partition, checkpointed per batch) —
      // same rationale and measurement as q74; caller session untouched
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val schema = ss.read.parquet(feed).schema
      val docs = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // one shard per micro-batch
        .parquet(feed)
      val curated = graft.streaming.StreamOps.curateStream(docs, lateness = "1 hour")
      val ckpt = Files.createTempDirectory("graft-q86-ckpt")
      val q = curated.writeStream
        .format("memory")
        .queryName("q86_stream_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally {
        q.stop()
        try graft.core.PathWalk.deleteRecursively(ckpt)
        catch { case _: Exception => () }
      }
      // premises: the dedup state actually worked ACROSS batches
      val batches = q.recentProgress.count(_.numInputRows > 0)
      require(batches >= 2,
        s"q86 premise: the duplicate shard must arrive in its own micro-batch " +
          s"(non-empty batches=$batches)")
      val sinkN = ss.table("q86_stream_sink").count()
      val expected = ss.read.parquet(feed)
        .filter(col("doc_id") < CAP).select("text").distinct().count()
      require(sinkN == expected,
        s"q86 premise: sink must hold exactly the distinct texts " +
          s"($sinkN vs $expected) — cross-batch dedup leaked or over-dropped")
      ss.table("q86_stream_sink")
        .select(col("lang"), col("keep"), col("n_tokens"))
        .write.parquet(s"$root/curated")
    }

  val streamCuration: Q = Q(
    "q86_stream_curation",
    s"""WITH t AS (
       |  SELECT DISTINCT text FROM documents WHERE doc_id < $CAP),
       |f AS (
       |  SELECT string_split_regex(lower(text), '\\s+') AS toks,
       |         len(string_split_regex(text, '\\s+')) AS n_tokens,
       |         length(regexp_replace(text, '\\s+', '', 'g')) * 1.0
       |           / greatest(len(string_split_regex(text, '\\s+')), 1) AS mean_token_len,
       |         (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g'))) * 1.0
       |           / greatest(length(text), 1) AS punct_ratio
       |  FROM t),
       |scored AS (
       |  SELECT n_tokens, mean_token_len, punct_ratio, ${DuckLang.scoreCols} FROM f),
       |labeled AS (
       |  SELECT ${DuckLang.predictedCase} AS predicted,
       |         (n_tokens >= 5 AND mean_token_len BETWEEN 2.0 AND 12.0
       |           AND punct_ratio <= 0.2) AS keep,
       |         n_tokens
       |  FROM scored)
       |SELECT predicted, keep, COUNT(*) AS n_docs,
       |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |FROM labeled
       |GROUP BY predicted, keep
       |ORDER BY predicted, keep""".stripMargin) { (s, d) =>
    s.read.parquet(s"${curatedRoot(s, d)}/curated")
      .select(col("lang").as("predicted"), col("keep"), col("n_tokens"))
      .groupBy("predicted", "keep")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"))
      .orderBy("predicted", "keep")
  }

  val all: Seq[Q] = Seq(streamCuration).map(_.gated)
}
