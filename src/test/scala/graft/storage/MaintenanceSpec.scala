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

  test("compaction round-trips period=1d exactly (Java double-suffix inference trap)") {
    // "1d" parses as DOUBLE 1.0 under partition type inference (d is a
    // Java double-literal suffix) — before LakeIO pinned inference off,
    // compaction re-derived the directory as period=1.0/ and FORKED the
    // series. "1m" never trips it (m isn't a numeric suffix), which is
    // why the original spec missed it; q70's oracle caught it.
    val root = tmpDir("lake1d")
    val key = SeriesKey("EX", "SPOT", "SYM", "raw", "1d")
    val all = genCandles(60)
    all.grouped(20).foreach { chunk =>
      candleDf(chunk)
        .withColumn("exchange", lit("EX")).withColumn("market", lit("SPOT"))
        .withColumn("symbol", lit("SYM")).withColumn("type", lit("raw"))
        .withColumn("period", lit("1d"))
        .withColumn("year", year(timestamp_millis(col("ts"))))
        .withColumn("month", month(timestamp_millis(col("ts"))))
        .coalesce(1)
        .write.mode("append")
        .partitionBy("exchange", "market", "symbol", "type", "period", "year", "month")
        .parquet(root)
    }
    assert(new LakeMaintenance(spark, root).compactSeries(key) == 1L)
    val dirs = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val periodDirs = scala.jdk.CollectionConverters.IteratorHasAsScala(dirs).asScala
      .map(_.getFileName.toString).filter(_.startsWith("period=")).toSet
    assert(periodDirs == Set("period=1d"), s"series forked into $periodDirs")
    val back = LakeIO.read(spark, root)
    assert(back.count() == 60)
    assert(back.select("period").distinct().collect().map(_.getString(0)).toSeq == Seq("1d"))
    assert(back.select(input_file_name()).distinct().count() == 1L)
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

  test("concurrent writers to different symbols both land (test_06 analog)") {
    val root = tmpDir("lake")
    val cat = new graft.catalog.ManifestCatalog(spark, root)
    val writer = new LakeWriter(spark, root)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("AAA", "BBB", "CCC").map { sym =>
      new Thread(() => {
        try {
          val rep = writer.writeOhlc(candleDf(genCandles(40, seed = sym.hashCode)),
            SeriesKey("EX", "SPOT", sym, "raw", "1m"))
          cat.addEntry(graft.model.ManifestEntry("EX", "SPOT", sym, s"p-$sym", "raw",
            rep.timeFrom, rep.timeTo, "1", "", 1L, "", "{}"))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent write failed: ${Option(errs.peek()).map(_.getMessage)}")
    val df = spark.read.parquet(root)
    assert(df.count() == 120)
    assert(df.select("symbol").distinct().count() == 3)
    assert(cat.listEntries().count() == 3)
  }

  test("deleteSeries removes the physical directory") {
    val root = tmpDir("lake")
    val writer = new LakeWriter(spark, root)
    val key = SeriesKey("EX", "SPOT", "DOOMED", "raw", "1m")
    writer.writeOhlc(candleDf(genCandles(10)), key)
    writer.writeOhlc(candleDf(genCandles(10)), SeriesKey("EX", "SPOT", "KEEP", "raw", "1m"))
    val maint = new LakeMaintenance(spark, root)
    assert(maint.deleteSeries(key))
    assert(!maint.deleteSeries(key)) // already gone
    val left = spark.read.parquet(root)
    assert(left.select("symbol").distinct().collect().map(_.getString(0)).toSeq == Seq("KEEP"))
  }

  test("approx_count_distinct is within HLL error of exact (A10)") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val r = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx"),
      approx_count_distinct(col("user_id"), 0.01).as("approx_tight")).head()
    val exact = r.getLong(0).toDouble
    assert(math.abs(r.getLong(1) - exact) / exact <= 0.05)
    assert(math.abs(r.getLong(2) - exact) / exact <= 0.02)
  }
}
