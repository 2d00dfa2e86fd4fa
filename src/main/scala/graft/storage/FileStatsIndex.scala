package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Zone-map file skipping: a persisted per-file min/max index consulted
  * at SCAN PLANNING time, so a value predicate on a clustered data
  * column prunes the FILE LIST before a single parquet footer is opened.
  *
  * Why this exists when parquet already has row-group stats: row-group
  * pruning happens AFTER the scan has listed and opened every file's
  * footer. At 100 TB / millions of files the footer round-trips ARE the
  * bottleneck (the lake's month dirs only prune the `ts` dimension —
  * q82/q83). This index prunes any OTHER clustered column (ingest seq,
  * id ranges, per-file value bands) from one small parquet table read,
  * the same design as table-format file statistics (Delta/Iceberg
  * data-skipping min/max per file). The reference has no file-level
  * stats at all (`reader.py` reads every monthly file it lists).
  *
  * Contracts:
  *   - ADVISORY, never load-bearing for correctness: a live data file
  *     absent from the index is always kept (read). A stale index after
  *     compaction therefore stays correct — the rewritten file is
  *     unknown → kept; dead entries point at vanished files that the
  *     live listing no longer contains (spec: FileStatsSpec).
  *   - Integral columns only (ts, ids, sequence numbers — the columns a
  *     lake clusters by). Stats are stored as LONG, so skip decisions
  *     are exact; a DOUBLE variant would need rounding-widened bounds
  *     near 2^53 and no query here needs it.
  *   - Skipping a file requires knowing nothing in it matches:
  *     `BETWEEN lo AND hi` never selects NULL, so an indexed file whose
  *     column is all-NULL (min/max absent, n_rows present) is skippable.
  *   - Same single-writer-per-artifact contract as the LSH band index
  *     (`Dedup.minhashLshIncremental`): updates append parquet to
  *     stats/; serialize update cycles through a lease/registry like
  *     any other maintenance job. Readers are snapshot-isolated (the
  *     file list is enumerated before the plan is built).
  *
  * Scale shape: update cost is O(new files' bytes) — one distributed
  * pass over only the files the index has not seen, grouped by
  * `input_file_name()`. The skip decision is a join of the live listing
  * against the stats table (both file-count-sized, i.e. metadata-sized);
  * only the SURVIVING paths are collected to the driver — the same
  * driver-side cost class as Spark's own file-index planning.
  */
object FileStatsIndex {

  /** Outcome of a skip decision: the survivor paths (qualified, ready to
    * read) plus the counts the pruning gates pin.
    */
  final case class Decision(kept: Seq[String], total: Long, skipped: Long)

  private val statsSchema = StructType(Seq(
    StructField("file", StringType),
    StructField("column", StringType),
    StructField("min_v", LongType),
    StructField("max_v", LongType),
    StructField("n_rows", LongType),
    StructField("n_nulls", LongType)))

  private def hadoopFs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Scheme/slash-insensitive file identity: `input_file_name()` renders
    * the same file as `file:///x` while a Hadoop listing renders
    * `file:/x` — both sides of every comparison normalize through this
    * (EQUALITY only; survivors are read via their original qualified
    * listing path).
    */
  private val SchemePrefix = "^[a-zA-Z][a-zA-Z0-9+.-]*:/+"
  private def normDriver(s: String): String = s.replaceFirst(SchemePrefix, "/")
  private def normCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, SchemePrefix, "/")

  /** Create an empty index tracking `cols` (create-exclusive meta.json —
    * the `Dedup.initLshIndex` shape: racing initializers get exactly one
    * winner; tracked columns are immutable for the index's life).
    */
  def init(spark: SparkSession, indexRoot: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "file-stats index must track at least one column")
    val (fs, rootPath) = hadoopFs(spark, indexRoot)
    fs.mkdirs(rootPath)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$indexRoot/meta.json"), false)
    try out.write(
      s"""{"columns":[${cols.map(c => s""""$c"""").mkString(",")}]}""".getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, indexRoot: String): Seq[String] = {
    val (fs, _) = hadoopFs(spark, indexRoot)
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$indexRoot/meta.json"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    """"([^"]+)"""".r.findAllMatchIn(
      text.dropWhile(_ != '[')).map(_.group(1)).toSeq
  }

  /** Live data files under `dataDir` (recursive; `_`/`.`-prefixed names
    * excluded exactly as partition discovery excludes them — INCLUDING
    * files under a hidden ancestor directory, so an index colocated
    * inside the series tree ([[seriesIndexRoot]]) never indexes its own
    * stats files). Returns (qualifiedPath, normalizedIdentity) pairs.
    */
  private def listDataFiles(spark: SparkSession, dataDir: String): Seq[(String, String)] = {
    val (fs, p) = hadoopFs(spark, dataDir)
    if (!fs.exists(p)) Seq.empty
    else {
      // qualify the root so ancestor-walk comparisons are Path EQUALITY
      // against the same fully-qualified form the listing returns — a
      // raw-string length cutoff misaligns for relative/unqualified
      // dataDir and then inspects dataDir itself and ancestors ABOVE it,
      // excluding every file under a '_'-named ancestor (ADVICE r13)
      val root = fs.makeQualified(p)
      val it = fs.listFiles(root, true)
      val buf = Seq.newBuilder[(String, String)]
      while (it.hasNext) {
        val st = it.next()
        val f = st.getPath
        val name = f.getName
        val hiddenAncestor = Iterator.iterate(f.getParent)(_.getParent)
          .takeWhile(q => q != null && q != root)
          .exists(q => q.getName.startsWith("_") || q.getName.startsWith("."))
        if (st.isFile && name.endsWith(".parquet") &&
          !name.startsWith("_") && !name.startsWith(".") && !hiddenAncestor)
          buf += ((f.toString, normDriver(f.toUri.toString)))
      }
      buf.result()
    }
  }

  /** Conventional per-series index location: a HIDDEN directory inside
    * the series tree. Partition discovery skips `_`-prefixed dirs, so
    * data reads never see it; series deletion removes it for free; and
    * the series lease that already serializes writes/compaction
    * serializes index refreshes with them.
    */
  def seriesIndexRoot(seriesDir: String): String = s"$seriesDir/_stats"

  /** Does an index live at `indexRoot`? (meta.json is the existence
    * witness — it is written create-exclusively by [[init]].)
    */
  def exists(spark: SparkSession, indexRoot: String): Boolean = {
    val (fs, _) = hadoopFs(spark, indexRoot)
    fs.exists(new org.apache.hadoop.fs.Path(s"$indexRoot/meta.json"))
  }

  /** Idempotent init: create the index if absent; if present, require
    * the tracked column set matches (tracked columns are immutable for
    * the index's life — silently diverging writers would each index a
    * different column set and every skip decision would be garbage).
    */
  def ensure(spark: SparkSession, indexRoot: String, cols: Seq[String]): Unit =
    if (!exists(spark, indexRoot)) {
      try init(spark, indexRoot, cols)
      catch {
        // lost a create-exclusive race — the winner's meta is the truth,
        // verified below like any pre-existing index
        case _: java.io.IOException => ()
      }
      val got = readMeta(spark, indexRoot)
      require(got == cols,
        s"file-stats index at $indexRoot tracks ${got.mkString(",")}, caller wants ${cols.mkString(",")}")
    } else {
      val got = readMeta(spark, indexRoot)
      require(got == cols,
        s"file-stats index at $indexRoot tracks ${got.mkString(",")}, caller wants ${cols.mkString(",")}")
    }

  /** Drop stats entries whose file no longer exists — the hygiene pass
    * after a compaction rewrote the files the entries point at. Dead
    * entries are harmless for correctness (they reference paths the
    * live listing no longer contains) but accumulate forever without
    * this. Staged rewrite + swap: a concurrent reader sees either the
    * old stats or none (both advisory-safe — a missing snapshot just
    * keeps every file). Single-writer like [[update]]: callers hold the
    * series lease. Returns the number of dead entries dropped.
    */
  def prune(spark: SparkSession, dataDir: String, indexRoot: String): Long = {
    import spark.implicits._
    val snap = snapshot(spark, indexRoot)
    // metadata-sized JOIN on normalized file identity, mirroring
    // skipFiles — an isin(...) literal per live file would inflate the
    // plan into a million-term In expression at lake scale (ADVICE r13)
    val liveDf = listDataFiles(spark, dataDir).map(_._2).toDF("file")
    val total = snap.count()
    val live = snap.join(liveDf, Seq("file"), "left_semi")
    val dead = total - live.count()
    if (dead == 0L) return 0L
    val (fs, _) = hadoopFs(spark, indexRoot)
    val statsPath = new org.apache.hadoop.fs.Path(s"$indexRoot/stats")
    val tmpPath = new org.apache.hadoop.fs.Path(s"$indexRoot/.stats_rewrite")
    live.coalesce(1).write.mode("overwrite").parquet(tmpPath.toString)
    fs.delete(statsPath, true)
    fs.rename(tmpPath, statsPath)
    dead
  }

  private def snapshot(spark: SparkSession, indexRoot: String): DataFrame = {
    val dir = s"$indexRoot/stats"
    val (fs, p) = hadoopFs(spark, dir)
    val files =
      if (!fs.exists(p)) Array.empty[String]
      else fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], statsSchema)
    else spark.read.schema(statsSchema).parquet(files.toSeq: _*)
  }

  /** Incremental stats refresh: compute per-file min/max/null stats for
    * every live data file the index has not seen yet, in ONE distributed
    * pass over only those files, and append them. Returns how many new
    * files were indexed (0 ⇒ nothing scanned — the steady-state no-op).
    */
  def update(spark: SparkSession, dataDir: String, indexRoot: String): Long = {
    val cols = readMeta(spark, indexRoot)
    val live = listDataFiles(spark, dataDir)
    if (live.isEmpty) return 0L
    val known = snapshot(spark, indexRoot)
      .select("file").distinct().collect().map(_.getString(0)).toSet
    val fresh = live.filterNot { case (_, norm) => known(norm) }
    if (fresh.isEmpty) return 0L

    val df = spark.read.parquet(fresh.map(_._1): _*)
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
        s"file-stats column '$c' must be integral, got $dt (see scope note)")
    }
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      min(col(c)).cast(LongType).as(s"__min_$c"),
      max(col(c)).cast(LongType).as(s"__max_$c"),
      count(col(c)).as(s"__cnt_$c")))
    val wide = df.groupBy(normCol(input_file_name()).as("file"))
      .agg(aggs.head, aggs.tail: _*)
    val long = cols.map(c => wide.select(
      col("file"), lit(c).as("column"),
      col(s"__min_$c").as("min_v"), col(s"__max_$c").as("max_v"),
      col("n_rows"), (col("n_rows") - col(s"__cnt_$c")).as("n_nulls")))
      .reduce(_ unionByName _)
    long.write.mode("append").parquet(s"$indexRoot/stats")
    fresh.size.toLong
  }

  /** Global max of an indexed column across every stats entry — a pure
    * metadata read (≤ one row per indexed file), the zone-map answer to
    * "how far does this column run" that would otherwise cost a full
    * data scan. None when the index holds no non-null entry for the
    * column. Duplicate entries for one file (a crashed double-append)
    * are harmless: max over a superset of true per-file maxima is the
    * same max.
    */
  def columnMax(spark: SparkSession, indexRoot: String, column: String): Option[Long] = {
    val r = snapshot(spark, indexRoot)
      .filter(col("column") === column)
      .agg(max(col("max_v")).as("m")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  /** The skip decision for `column BETWEEN lo AND hi` over `dataDir`:
    * a file is dropped only when its stats PROVE no row matches —
    * max < lo, min > hi, or the column is all-NULL in it. Unindexed
    * files are kept unconditionally (the advisory contract). Duplicate
    * stats rows for one file (a crashed double-append) are unioned
    * conservatively (widest bounds win).
    */
  def skipFiles(spark: SparkSession, dataDir: String, indexRoot: String,
                column: String, lo: Long, hi: Long): Decision = {
    val live = listDataFiles(spark, dataDir)
    if (live.isEmpty) return Decision(Seq.empty, 0L, 0L)
    import spark.implicits._
    val liveDf = live.toDF("qualified", "file")
    val stats = snapshot(spark, indexRoot)
      .filter(col("column") === column)
      .groupBy(col("file"))
      .agg(min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"),
        max(col("n_rows")).as("n_rows"))
    val notIndexed = col("n_rows").isNull
    val mightMatch = col("min_v").isNotNull &&
      col("max_v") >= lo && col("min_v") <= hi
    val kept = liveDf.join(stats, Seq("file"), "left")
      .filter(notIndexed || mightMatch)
      .select("qualified").collect().map(_.getString(0)).toSeq
    Decision(kept, live.size.toLong, live.size.toLong - kept.size)
  }

  /** Skipping read: plan over ONLY the surviving files (partition columns
    * derived via `basePath`), with the row-level filter applied on top —
    * stats prune files, the pushed-down predicate prunes row groups and
    * rows within them, exactly the layered Delta/Iceberg read shape.
    */
  def readWhere(spark: SparkSession, dataDir: String, basePath: String,
                indexRoot: String, column: String, lo: Long, hi: Long): (DataFrame, Decision) = {
    val d = skipFiles(spark, dataDir, indexRoot, column, lo, hi)
    val df =
      if (d.kept.isEmpty)
        spark.read.option("basePath", basePath).parquet(dataDir).filter(lit(false))
      else
        spark.read.option("basePath", basePath).parquet(d.kept: _*)
          .filter(col(column).between(lo, hi))
    (df, d)
  }
}
