package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.Tables

/** q89: the W4 batch-continuity check under the oracle (SURVEY §2.5 W4
  * / §2.9 T2 — `StreamOps.continuityCheck`, the mapGroupsWithState
  * operator that reports, per series key, the gap between one
  * micro-batch's max(ts) and the next batch's min(ts); spec-only since
  * round 1). The q74/q86 replay pattern applied to custom state: a REAL
  * bounded multi-batch stream (one shard per micro-batch) whose gaps
  * the oracle re-derives arithmetically.
  *
  * Three keys, two shards, three continuity regimes by construction:
  * key 0 continues normally (small positive gap), key 1's second shard
  * jumps a 30-day hole (large gap — the planted GAP), key 2's second
  * shard starts a day BEFORE its first shard ended (negative gap — the
  * planted OVERLAP). The stream emits one (key, first_ts, last_ts,
  * gap) row per (key, micro-batch); gap = -1 on a key's first batch.
  * A state store that loses a key's watermark, merges batches, or
  * mis-orders shards changes first/last/gap and hash-mismatches.
  *
  * Fixture runs the stream once per session (premises: ≥2 non-empty
  * micro-batches, one row per key per batch) and persists the sink;
  * the declared query reads it back — the q86 gate shape. 100 TB note:
  * state is ONE long per live key (the previous max ts), the
  * bounded-state design the operator exists to prove.
  */
object ContinuityGate {

  private val T0 = 1704067200000L // 2024-01-01 UTC
  private val CAP = 4000L
  private val StepMs = 60000L
  private val GapMs = 2592000000L  // 30 days
  private val ShiftMs = 86400000L  // 1 day back-shift → overlap

  private def sinkRoot(s: SparkSession, d: String): String =
    graft.core.SessionTempRoots.of(s, d, "graft_cont_") { root =>
      val feed = Files.createDirectories(Paths.get(root, "feed")).toString
      val ids = Tables.events(s, d).select(col("event_id").as("i"))
        .filter(col("i") < CAP)
      val idStats = ids.agg(max(col("i")), count(lit(1))).collect()(0)
      require(idStats.getLong(1) >= 6, "q89 premise: need >= 6 ids")
      val boundary = idStats.getLong(0) / 2 // replayed by the oracle: MAX(i)//2

      val rows = ids.select(
        (col("i") % 3).cast("string").as("k"),
        when(col("i") > boundary, 1).otherwise(0).as("batch"),
        (lit(T0) + col("i") * StepMs
          + when(col("i") > boundary && col("i") % 3 === 1, GapMs).otherwise(0L)
          - when(col("i") > boundary && col("i") % 3 === 2, ShiftMs).otherwise(0L)
          ).as("ts"))
      Seq(0, 1).foreach { b =>
        val tmp = s"$root/stage$b"
        rows.filter(col("batch") === b).drop("batch").coalesce(1).write.parquet(tmp)
        val part = graft.core.PathWalk.walk(Paths.get(tmp))(
          _.find(_.toString.endsWith(".parquet"))
            .getOrElse(throw new IllegalStateException(s"no part file in $tmp")))
        val dst = Paths.get(feed, f"shard$b%02d.parquet")
        Files.move(part, dst)
        Files.setLastModifiedTime(dst, // shard order = batch order
          java.nio.file.attribute.FileTime.fromMillis(T0 + b * 60000L))
      }

      // session clone, small state-store count — same rationale as q74/q86
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val schema = ss.read.parquet(feed).schema
      val stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // one shard per micro-batch
        .parquet(feed)
      val events = graft.streaming.StreamOps.continuityCheck(stream, "k")(ss)
      val ckpt = Files.createTempDirectory("graft-q89-ckpt")
      val q = events.writeStream
        .format("memory")
        .queryName("q89_stream_sink")
        .outputMode("update") // mapGroupsWithState emits per-batch updates
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally {
        q.stop()
        try graft.core.PathWalk.deleteRecursively(ckpt)
        catch { case _: Exception => () }
      }
      val batches = q.recentProgress.count(_.numInputRows > 0)
      require(batches >= 2,
        s"q89 premise: the shards must arrive in separate micro-batches " +
          s"(non-empty batches=$batches)")
      val sink = ss.table("q89_stream_sink")
      require(sink.count() == 6,
        s"q89 premise: 3 keys x 2 batches must emit 6 rows (${sink.count()})")
      sink.write.parquet(s"$root/out")
    }

  val streamContinuity: Q = Q(
    "q89_stream_continuity",
    s"""WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < $CAP),
       |b AS (SELECT MAX(i) // 2 AS boundary FROM ids),
       |rows_ AS (
       |  SELECT CAST(i % 3 AS VARCHAR) AS key,
       |         CASE WHEN i > (SELECT boundary FROM b) THEN 1 ELSE 0 END AS batch,
       |         $T0 + i * $StepMs
       |           + CASE WHEN i > (SELECT boundary FROM b) AND i % 3 = 1
       |                  THEN $GapMs ELSE 0 END
       |           - CASE WHEN i > (SELECT boundary FROM b) AND i % 3 = 2
       |                  THEN $ShiftMs ELSE 0 END AS ts
       |  FROM ids),
       |per AS (
       |  SELECT key, batch, MIN(ts) AS first_ts, MAX(ts) AS last_ts
       |  FROM rows_ GROUP BY key, batch)
       |SELECT key,
       |       CAST(first_ts AS BIGINT) AS first_ts,
       |       CAST(last_ts AS BIGINT) AS last_ts,
       |       CAST(CASE WHEN batch = 0 THEN -1
       |                 ELSE first_ts - LAG(last_ts)
       |                        OVER (PARTITION BY key ORDER BY batch)
       |            END AS BIGINT) AS gap
       |FROM per
       |ORDER BY key, first_ts""".stripMargin) { (s, d) =>
    s.read.parquet(s"${sinkRoot(s, d)}/out")
      .select(col("key"), col("firstTs").as("first_ts"),
        col("lastTs").as("last_ts"), col("gapFromPrev").as("gap"))
      .orderBy("key", "first_ts")
  }

  val all: Seq[Q] = Seq(streamContinuity).map(_.gated)
}
