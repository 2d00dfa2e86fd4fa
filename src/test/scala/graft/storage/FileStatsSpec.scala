package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Zone-map file-skipping index (q94's machinery): stats correctness,
  * the O(new files) incremental contract, and — the load-bearing part —
  * the ADVISORY safety contract: an unindexed or stale-indexed file is
  * always read, so the index can only ever skip work, never rows.
  */
class FileStatsSpec extends SparkSpec {

  private def writeLake(root: String, months: Int = 6): SeriesKey = {
    val key = SeriesKey("EX", "SPOT", "SYM", "ticks", "tick")
    import spark.implicits._
    // month m (Jan..) holds seq in [m*100, m*100+99], one file per month
    val rows = (0 until months).flatMap { m =>
      val t0 = java.time.YearMonth.of(2023, m + 1)
        .atDay(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
      (0 until 100).map(i => (t0 + i * 60000L, (m * 100 + i).toLong, i.toDouble))
    }
    new LakeWriter(spark, root).writeTicks(
      rows.toDF("ts", "seq", "v"), key)
    key
  }

  private def seriesDir(root: String): String =
    s"$root/exchange=EX/market=SPOT/symbol=SYM/type=ticks/period=tick"

  test("per-file stats match direct computation; update is incremental") {
    val root = tmpDir("fstats")
    writeLake(root, months = 6)
    val idx = tmpDir("fstatsidx")
    FileStatsIndex.init(spark, idx, Seq("seq"))
    assert(FileStatsIndex.update(spark, seriesDir(root), idx) == 6L)
    assert(FileStatsIndex.update(spark, seriesDir(root), idx) == 0L, "steady-state no-op")

    val stats = spark.read.parquet(s"$idx/stats")
    assert(stats.count() == 6)
    // every file's band is [m*100, m*100+99] with 100 rows, no nulls
    val bands = stats.select("min_v", "max_v", "n_rows", "n_nulls")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(bands.zipWithIndex.forall { case ((lo, hi, n, nn), m) =>
      lo == m * 100L && hi == m * 100L + 99L && n == 100L && nn == 0L
    }, bands.mkString(","))

    // a 7th month appears: only IT is indexed by the next update
    import spark.implicits._
    val t0 = java.time.YearMonth.of(2023, 7)
      .atDay(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    new LakeWriter(spark, root).writeTicks(
      (0 until 50).map(i => (t0 + i * 60000L, (600 + i).toLong, 0.0))
        .toDF("ts", "seq", "v"),
      SeriesKey("EX", "SPOT", "SYM", "ticks", "tick"))
    assert(FileStatsIndex.update(spark, seriesDir(root), idx) == 1L)
    assert(spark.read.parquet(s"$idx/stats").count() == 7)
  }

  test("skip decision: exact bands, parity with full scan, something skipped") {
    val root = tmpDir("fstats")
    writeLake(root, months = 6)
    val idx = tmpDir("fstatsidx")
    FileStatsIndex.init(spark, idx, Seq("seq"))
    FileStatsIndex.update(spark, seriesDir(root), idx)

    for ((lo, hi, files) <- Seq((150L, 340L, 3L), (0L, 99L, 1L), (599L, 999L, 1L),
      (700L, 900L, 0L), (0L, 599L, 6L))) {
      val d = FileStatsIndex.skipFiles(spark, seriesDir(root), idx, "seq", lo, hi)
      assert(d.kept.size.toLong == files && d.total == 6L,
        s"[$lo,$hi] kept ${d.kept.size}, want $files")
      val (df, _) = FileStatsIndex.readWhere(
        spark, seriesDir(root), root, idx, "seq", lo, hi)
      val full = spark.read.parquet(root).filter(col("seq").between(lo, hi))
      assert(df.select("seq").collect().map(_.getLong(0)).sorted.toSeq ==
        full.select("seq").collect().map(_.getLong(0)).sorted.toSeq)
    }
  }

  test("advisory safety: unindexed and stale-after-compaction files are always read") {
    val root = tmpDir("fstats")
    val key = writeLake(root, months = 3)
    val idx = tmpDir("fstatsidx")
    FileStatsIndex.init(spark, idx, Seq("seq"))
    FileStatsIndex.update(spark, seriesDir(root), idx)

    // a new month lands but the index is NOT refreshed: its rows must
    // still surface (unknown file ⇒ kept), even though its band lies
    // outside what a stale skipper would keep
    import spark.implicits._
    val t0 = java.time.YearMonth.of(2023, 4)
      .atDay(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    new LakeWriter(spark, root).writeTicks(
      (0 until 10).map(i => (t0 + i * 60000L, (300 + i).toLong, 0.0))
        .toDF("ts", "seq", "v"), key)
    val (df, d) = FileStatsIndex.readWhere(
      spark, seriesDir(root), root, idx, "seq", 300L, 309L)
    assert(df.count() == 10L, "unindexed file's rows lost")
    assert(d.kept.size >= 1)

    // compaction rewrites every file: the index now points at vanished
    // paths only — every LIVE file is unknown ⇒ kept ⇒ full correctness
    new LakeMaintenance(spark, root).compactSeries(key, maxFiles = 0)
    val (df2, d2) = FileStatsIndex.readWhere(
      spark, seriesDir(root), root, idx, "seq", 0L, 50L)
    assert(df2.count() == 51L, "stale index dropped rows after compaction")
    assert(d2.skipped == 0L, "stale index must not skip unknown files")
    // refresh: live files re-indexed, skipping resumes
    assert(FileStatsIndex.update(spark, seriesDir(root), idx) >= 1L)
    val d3 = FileStatsIndex.skipFiles(spark, seriesDir(root), idx, "seq", 0L, 50L)
    assert(d3.skipped > 0L, "refreshed index should skip non-overlapping files")
  }

  test("all-NULL column file is skippable; BETWEEN never selects nulls") {
    val root = tmpDir("fstats")
    import spark.implicits._
    val key = SeriesKey("EX", "SPOT", "NULLS", "ticks", "tick")
    new LakeWriter(spark, root).writeTicks(
      Seq((1672531200000L, Some(1L)), (1672531260000L, Some(2L)))
        .toDF("ts", "seq"), key)
    new LakeWriter(spark, root).writeTicks(
      Seq((1675209600000L, None: Option[Long]), (1675209660000L, None: Option[Long]))
        .toDF("ts", "seq"), key)
    val dir = s"$root/exchange=EX/market=SPOT/symbol=NULLS/type=ticks/period=tick"
    val idx = tmpDir("fstatsidx")
    FileStatsIndex.init(spark, idx, Seq("seq"))
    FileStatsIndex.update(spark, dir, idx)
    val d = FileStatsIndex.skipFiles(spark, dir, idx, "seq", 1L, 10L)
    assert(d.total == 2L && d.kept.size == 1L,
      s"all-null file should be skipped (kept=${d.kept.size})")
    val (df, _) = FileStatsIndex.readWhere(spark, dir, root, idx, "seq", 1L, 10L)
    assert(df.count() == 2L)
  }

  test("writer-integrated refresh: statsColumns creates + maintains the colocated index per write") {
    val root = tmpDir("fstats")
    import spark.implicits._
    val key = SeriesKey("EX", "SPOT", "SYM", "ticks", "tick")
    val w = new LakeWriter(spark, root, statsColumns = Seq("seq"))
    def monthRows(m: Int) = {
      val t0 = java.time.YearMonth.of(2023, m)
        .atDay(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
      (0 until 100).map(i => (t0 + i * 60000L, ((m - 1) * 100 + i).toLong, i.toDouble))
        .toDF("ts", "seq", "v")
    }
    w.writeTicks(monthRows(1).union(monthRows(2)), key)
    val idx = FileStatsIndex.seriesIndexRoot(seriesDir(root))
    assert(FileStatsIndex.exists(spark, idx), "writer must create the index")
    assert(FileStatsIndex.update(spark, seriesDir(root), idx) == 0L,
      "index must already be current after the write")
    assert(spark.read.parquet(s"$idx/stats").count() == 2)

    // second write touches month 2 (rewritten) and adds month 3: the
    // writer re-indexes the new files AND prunes the rewritten ones
    w.writeTicks(monthRows(2).union(monthRows(3)), key)
    val stats = spark.read.parquet(s"$idx/stats")
    assert(stats.count() == 3, "one live entry per live file, rewritten entries pruned")
    val d = FileStatsIndex.skipFiles(spark, seriesDir(root), idx, "seq", 210L, 220L)
    assert(d.total == 3L && d.kept.size == 1L, s"kept=${d.kept.size} of ${d.total}")

    // the colocated hidden index is invisible to data reads AND to its
    // own file listing (a stats file indexed as data would poison bands)
    assert(!spark.read.parquet(root).columns.contains("file"))
    assert(new LakeReader(spark, root).readWhere(key, "seq", 0L, 999L)._1.count() == 300L)
  }

  test("maintenance-integrated refresh: compaction re-indexes and prunes under its lease") {
    val root = tmpDir("fstats")
    import spark.implicits._
    val key = SeriesKey("EX", "SPOT", "SYM", "ticks", "tick")
    val w = new LakeWriter(spark, root, statsColumns = Seq("seq"))
    val t0 = java.time.YearMonth.of(2023, 1)
      .atDay(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    // two writes into the SAME month → fragmented dir (2 files after the
    // second write's merge rewrites... force fragmentation via distinct ts
    // batches is not guaranteed — merge-write rewrites the month as one
    // task's files; instead fragment across months then force full rewrite)
    w.writeTicks((0 until 50).map(i => (t0 + i * 60000L, i.toLong, 0.0)).toDF("ts", "seq", "v"), key)
    val t1 = java.time.YearMonth.of(2023, 2)
      .atDay(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    w.writeTicks((0 until 50).map(i => (t1 + i * 60000L, (100 + i).toLong, 0.0)).toDF("ts", "seq", "v"), key)
    val idx = FileStatsIndex.seriesIndexRoot(seriesDir(root))
    val before = spark.read.parquet(s"$idx/stats")
      .select("file").collect().map(_.getString(0)).toSet

    // maxFiles=0 forces every month's rewrite: all indexed paths die
    assert(new LakeMaintenance(spark, root).compactSeries(key, maxFiles = 0) == 2L)
    val after = spark.read.parquet(s"$idx/stats")
      .select("file").collect().map(_.getString(0)).toSet
    assert(after.intersect(before).isEmpty, "compaction must prune dead entries")
    assert(after.size == 2, s"rewritten files re-indexed, got ${after.size}")
    val d = FileStatsIndex.skipFiles(spark, seriesDir(root), idx, "seq", 0L, 49L)
    assert(d.skipped == 1L && d.kept.size == 1L,
      s"post-compaction skipping must work without a manual refresh (kept=${d.kept.size})")
    val (df, _) = new LakeReader(spark, root).readWhere(key, "seq", 100L, 149L)
    assert(df.count() == 50L)
  }

  test("readWhere without an index falls back to a full filtered scan (advisory)") {
    val root = tmpDir("fstats")
    val key = writeLake(root, months = 3) // plain writer: no statsColumns
    val (df, d) = new LakeReader(spark, root).readWhere(key, "seq", 0L, 99L)
    assert(df.count() == 100L)
    assert(d.total == 0L && d.skipped == 0L, "no index ⇒ no decision, never an error")
  }

  test("readWhereInRange: file list is the intersection of stats and month pruning; month-only fallback without an index") {
    def ms(month: Int, day: Int = 1): Long = java.time.LocalDate.of(2023, month, day)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    val key = SeriesKey("EX", "SPOT", "SYM", "ticks", "tick")
    import spark.implicits._
    def lake(statsCols: Seq[String]): String = {
      val root = tmpDir("fstats_range")
      val rows = (0 until 6).flatMap { m =>
        (0 until 100).map(i => (ms(m + 1) + i * 60000L, (m * 100 + i).toLong, i.toDouble))
      }
      new LakeWriter(spark, root, statsColumns = statsCols)
        .writeTicks(rows.toDF("ts", "seq", "v"), key)
      root
    }
    // seq ∈ [100,399] survives stats in Feb..Apr (3 files); ts ∈ Mar..Jun
    // keeps 4 month dirs alone; the intersection is Mar..Apr (2 files)
    val indexed = lake(Seq("seq"))
    val (df, d) = new LakeReader(spark, indexed).readWhereInRange(
      key, "seq", 100L, 399L, ms(3), ms(6, 30))
    assert(d.total == 6L && d.kept.size == 2, s"kept=${d.kept.size} of ${d.total}")
    assert(df.count() == 200L, "months Mar+Apr hold seq 200..399, all inside both ranges")

    // no index: month pruning + row filters only — same rows, advisory
    // empty decision, and the scan stays within the 4 ts months
    val plain = lake(Seq.empty)
    val (df2, d2) = new LakeReader(spark, plain).readWhereInRange(
      key, "seq", 100L, 399L, ms(3), ms(6, 30))
    assert(d2.total == 0L && d2.kept.isEmpty)
    val probe = df2.agg(org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("n"))
    assert(probe.collect()(0).getLong(0) == 200L)
    assert(graft.core.PlanInspect.filesRead(probe) <= 4L,
      "month-dir pruning must bound the fallback scan to the ts months")
  }

  test("relative dataDir under a hidden-named ancestor still lists, indexes, and skips (ADVICE r13)") {
    // the regression: the hidden-ancestor walk compared fully-qualified
    // listing paths against the RAW caller string by length, so an
    // unqualified/relative dataDir misaligned the cutoff, the walk
    // climbed into ancestors ABOVE the root, found the '_'-named one,
    // excluded EVERY data file — and readWhere returned a silently empty
    // frame over live data. Root cause fixed by qualifying the root and
    // walking by Path equality; this pins both spellings.
    import spark.implicits._
    val rel = s"target/fstats_rel_${System.nanoTime()}/_work/lake"
    val abs = new java.io.File(rel).getAbsolutePath
    try {
      (0L until 100L).map(i => (i, i.toDouble)).toDF("seq", "v")
        .coalesce(1).write.parquet(abs)
      for (dataDir <- Seq(rel, abs)) { // relative AND absolute-unqualified
        val idx = tmpDir(s"fstats_rel_idx")
        FileStatsIndex.init(spark, idx, Seq("seq"))
        assert(FileStatsIndex.update(spark, dataDir, idx) == 1L,
          s"dataDir=$dataDir: the data file under the '_'-named ancestor must be indexed")
        val d = FileStatsIndex.skipFiles(spark, dataDir, idx, "seq", 10L, 20L)
        assert(d.total == 1L && d.kept.size == 1,
          s"dataDir=$dataDir: live file wrongly excluded (total=${d.total}, kept=${d.kept.size})")
        assert(spark.read.parquet(d.kept: _*).filter(col("seq").between(10, 20)).count() == 11L)
      }
    } finally {
      graft.core.PathWalk.deleteRecursively(
        java.nio.file.Paths.get(new java.io.File(rel).getAbsolutePath).getParent.getParent)
    }
  }

  test("init is create-exclusive; non-integral columns rejected") {
    val idx = tmpDir("fstatsidx")
    FileStatsIndex.init(spark, idx, Seq("seq"))
    intercept[Exception] { FileStatsIndex.init(spark, idx, Seq("seq")) }

    val root = tmpDir("fstats")
    import spark.implicits._
    new LakeWriter(spark, root).writeTicks(
      Seq((1672531200000L, 1.5)).toDF("ts", "v"),
      SeriesKey("EX", "SPOT", "SYM", "ticks", "tick"))
    val idx2 = tmpDir("fstatsidx")
    FileStatsIndex.init(spark, idx2, Seq("v"))
    val e = intercept[IllegalArgumentException] {
      FileStatsIndex.update(spark, seriesDir(root), idx2)
    }
    assert(e.getMessage.contains("integral"))
  }
}
