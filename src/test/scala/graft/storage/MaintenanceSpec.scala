package graft.storage

import graft.SparkSpec
import graft.ops.{JobRegistry, JobStatus}
import org.apache.spark.sql.functions._

class MaintenanceSpec extends SparkSpec {

  test("compaction merges fragmented month partitions, preserves content") {
    val root = tmpDir("lake")
    val key = SeriesKey("EX", "SPOT", "SYM", "raw", "1m")
    // fragment the month dir via 5 direct appends (external/parallel
    // writers — LakeWriter's own merge-write never fragments, it
    // rewrites whole months)
    val all = genCandles(100)
    all.grouped(20).foreach { chunk =>
      candleDf(chunk)
        .withColumn("exchange", lit("EX")).withColumn("market", lit("SPOT"))
        .withColumn("symbol", lit("SYM")).withColumn("type", lit("raw"))
        .withColumn("period", lit("1m"))
        .withColumn("year", year(timestamp_millis(col("ts"))))
        .withColumn("month", month(timestamp_millis(col("ts"))))
        .coalesce(1)
        .write.mode("append")
        .partitionBy("exchange", "market", "symbol", "type", "period", "year", "month")
        .parquet(root)
    }
    val before = spark.read.parquet(root)
      .select(input_file_name()).distinct().count()
    val rewritten = new LakeMaintenance(spark, root).compactSeries(key)
    assert(rewritten == 1L)
    val df = spark.read.parquet(root)
    assert(df.select(input_file_name()).distinct().count() == 1L)
    assert(df.count() == 100)
    assert(df.select("ts").collect().map(_.getLong(0)).sorted.toSeq == all.map(_.ts))
    assert(before > 1)
    // idempotent: nothing left to compact
    assert(new LakeMaintenance(spark, root).compactSeries(key) == 0L)
  }

  test("binaryFile source maps into the media schema") {
    val dir = tmpDir("media")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.bin"), "imagebytes".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.bin"), "morebytes".getBytes)
    val media = graft.llm.Multimodal.fromBinaryFiles(spark, s"$dir/*.bin", "image")
    val rows = media.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("modality") == "image"))
    val feat = graft.llm.Multimodal.featurize(media).collect()
    assert(feat.map(_.getAs[Long]("byte_len")).sorted.toSeq == Seq(9L, 10L))
  }

  test("job registry enforces per-group and total limits (T6)") {
    val reg = new JobRegistry(maxPerGroup = 2, maxTotal = 3)
    assert(reg.submit("j1", "binance"))
    assert(reg.submit("j2", "binance"))
    assert(!reg.submit("j3", "binance")) // group limit → pending
    assert(reg.submit("j4", "kraken"))
    assert(!reg.submit("j5", "kraken")) // total limit → pending
    assert(reg.get("j3").get.state == JobStatus.Pending)
    reg.complete("j1")
    assert(reg.promoteNext("binance").contains("j3"))
    assert(reg.get("j3").get.state == JobStatus.Running)
    reg.fail("j2", "boom")
    assert(reg.get("j2").get.state == JobStatus.Failed("boom"))
    assert(reg.all().size == 5)
  }
}
