package graft.streaming

import graft.SparkSpec
import graft.ops.SeriesOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.Candle

class StreamOpsSpec extends SparkSpec {

  test("streaming resample agrees with batch resample (T7)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val data = genCandles(120)
    val stream = MemoryStream[Candle]
    val out = StreamOps.resampleStream(stream.toDF(), "15min")
    val q = out.writeStream.format("memory").queryName("resampled")
      .outputMode("append").start()
    stream.addData(data: _*)
    // a final late-watermark event closes all earlier windows
    stream.addData(Candle(data.last.ts + 3600000L, 0, 0, 0, 0, 0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("resampled")
      .filter(col("bucket_ts") <= data.last.ts)
      .select("bucket_ts", "open", "high", "low", "close", "volume")
      .collect().map(_.toSeq).toSet
    val batch = SeriesOps.resampleOhlcv(candleDf(data), "15min")
      .select("bucket_ts", "open", "high", "low", "close", "volume")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "streaming and batch resample must agree")
    assert(batch.size == 8)
  }

  test("streaming dedup drops re-delivered rows within the watermark (T3)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Candle]
    val out = StreamOps.dedupStream(stream.toDF())
    val q = out.writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    val c = genCandles(10)
    stream.addData(c: _*)
    stream.addData(c(3), c(4)) // duplicates
    q.processAllAvailable()
    q.stop()
    assert(spark.table("deduped").count() == 10)
  }

  test("continuity check reports inter-batch gaps per key (W4)") {
    implicit val s = spark
    import spark.implicits._
    // batch processing of two series: A continuous, B jumps
    val df = Seq(("A", 100L), ("A", 200L), ("B", 100L), ("B", 5000L)).toDF("sym", "ts")
    val out = StreamOps.continuityCheck(df, "sym").collect()
      .map(r => r.getAs[String]("key") -> r).toMap
    assert(out("A").getAs[Long]("firstTs") == 100L)
    assert(out("A").getAs[Long]("gapFromPrev") == -1L) // first batch
    assert(out("B").getAs[Long]("lastTs") == 5000L)
  }

  test("streaming corpus curation: cross-batch dup dropped, gate/lang match batch ops") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Long, String)]
    val out = StreamOps.curateStream(
      stream.toDF().toDF("doc_id", "ingest_ts", "text"))
    val q = out.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    val t0 = 1700000000000L
    stream.addData(
      (1L, t0, "the quick brown fox jumps over the lazy dog again"),
      (2L, t0 + 1000, "x"),
      (3L, t0 + 2000, "der die das und ist nicht ein eine zu den"))
    q.processAllAvailable()
    // batch 2 re-delivers doc 1's exact text within the watermark
    stream.addData((4L, t0 + 3000, "the quick brown fox jumps over the lazy dog again"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("curated").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.sameElements(Array(1L, 2L, 3L)),
      "duplicate content must be dropped across micro-batches")
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Boolean]("keep") && byId(1L).getAs[String]("lang") == "en")
    assert(!byId(2L).getAs[Boolean]("keep"), "one-token doc must fail the gate")
    assert(byId(3L).getAs[String]("lang") == "de",
      "language id must match the batch kernel")
  }

  test("incrementalCopy processes only new files across runs (T1)") {
    import spark.implicits._
    val src = tmpDir("src"); val ckpt = tmpDir("ckpt")
    var seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    genCandles(10).toDF().write.mode("append").parquet(src)
    val q1 = StreamOps.incrementalCopy(spark, src, ckpt) { b =>
      seen ++= b.select("ts").collect().map(_.getLong(0))
    }
    q1.awaitTermination()
    assert(seen.size == 10)
    // second batch of files → only the delta is processed
    genCandles(5, startMs = 2000000000000L).toDF().write.mode("append").parquet(src)
    val q2 = StreamOps.incrementalCopy(spark, src, ckpt) { b =>
      seen ++= b.select("ts").collect().map(_.getLong(0))
    }
    q2.awaitTermination()
    assert(seen.size == 15, s"expected 15 total, got ${seen.size} (reprocessed?)")
  }
}
