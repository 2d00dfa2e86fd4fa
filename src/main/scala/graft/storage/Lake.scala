package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Symbols
import scala.util.chaining._

/** Series coordinates — the reference's partition tuple
  * (`dl-datalake/src/dl_datalake/storage/writer.py:35-46`).
  */
final case class SeriesKey(exchange: String, market: String, symbol: String,
                           `type`: String, period: String) {
  def sanitized: SeriesKey = SeriesKey(
    Symbols.sanitize(exchange), Symbols.sanitize(market),
    Symbols.sanitize(symbol), `type`, period)
}

/** Post-write integrity report (`writer.py:108-132`). */
final case class WriteReport(rows: Long, timeFrom: Long, timeTo: Long,
                             monotonic: Boolean, partitions: Long)

/** Partitioned-Parquet lake storage (SURVEY §7.1 #4).
  *
  * Layout: Hive-style `exchange=/market=/symbol=/type=/period=/year=/month=`
  * under one root — the Spark-native form of the reference's
  * `{EX}/{MKT}/{SYM}/{type}/{period}/{YYYY}/{MM}/` monthly files
  * (`writer.py:21-46`); key=value dirs give Catalyst partition pruning on
  * every level for free.
  *
  * Scale notes:
  *  - merge-write reads ONLY the months touched by the incoming batch
  *    (month-list pushed into the scan) and dynamic partition overwrite
  *    rewrites only those directories — incremental cost is O(touched
  *    months), not O(table);
  *  - keep-last dedup is a window over (series, ts) ordered by an explicit
  *    `_batch` sequence — well-defined under shuffling (SURVEY §7.4 #2),
  *    where the reference relied on Polars concat order (`writer.py:86-92`);
  *  - data is sorted by ts within each written file so Parquet row-group
  *    min/max stats stay tight for ts-range pushdown (`writer.py:92`).
  */
/** The one sanctioned way to open the lake root: partition-column TYPE
  * INFERENCE DISABLED, then year/month explicitly cast back to int.
  *
  * Why: inference parses each partition value with the JVM numeric
  * parsers, and `Double.parseDouble("1d")` SUCCEEDS — `d` is a Java
  * double-literal suffix — so a lake holding only `period=1d` series
  * reads that column as DOUBLE 1.0. Every string comparison against
  * "1d" then silently misses, and a maintenance rewrite re-derives the
  * directory as `period=1.0/`, forking the series (caught by q70's
  * compaction-invariance oracle; `period=1m` specs never trip it
  * because `m` isn't a numeric suffix). With inference off every
  * partition value round-trips byte-identical; year/month are re-typed
  * deliberately (pure digits, exact) because both pruning paths compare
  * them as ints. Pruning survives the cast: partition filters are
  * evaluated against the partition spec, cast included.
  */
private[storage] object LakeIO {
  val InferenceConf = "spark.sql.sources.partitionColumnTypeInference.enabled"

  /** One dedicated lake-IO session per caller session (shared
    * SparkContext, own SQL conf) with partition-type inference disabled
    * PERMANENTLY. This replaces the old per-read set/restore window on
    * the caller's shared conf, which two concurrent lake reads on one
    * session could race — one read's restore landing mid-way through the
    * other's partition discovery would turn inference back ON and fork
    * `period=1d` to DOUBLE (the exact bug the conf exists to prevent).
    * A clone's conf is immutable-after-init here, so concurrent reads
    * are trivially safe; builder-level confs (shuffle partitions, split
    * sizes, timezone) live in the SparkConf and are inherited.
    *
    * Size bound: one clone per LIVE caller session — entries whose
    * SparkContext has stopped are reaped on every lookup, and a clone
    * is a conf holder on the shared context, not a second context, so
    * even a session-churning caller holds O(live sessions) small
    * objects, never accumulating JVM-lifetime state.
    */
  private val ioSessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  private def ioSession(spark: SparkSession): SparkSession = {
    ioSessions.forEach((k, _) => if (k.sparkContext.isStopped) ioSessions.remove(k): Unit)
    ioSessions.computeIfAbsent(spark, base => {
      val c = base.newSession()
      c.conf.set(InferenceConf, "false")
      c
    })
  }

  def read(spark: SparkSession, root: String, mergeSchema: Boolean = true): DataFrame = {
    val df = ioSession(spark).read
      .option("mergeSchema", mergeSchema.toString).parquet(root)
    df.withColumn("year", col("year").cast("int"))
      .withColumn("month", col("month").cast("int"))
  }

  /** Read an explicit list of lake leaf files (a stats-skipping
    * survivor list), partition columns derived via `basePath` — through
    * the same inference-off session as every other lake read, so
    * `period=1d` survives here too.
    */
  def readFiles(spark: SparkSession, root: String, paths: Seq[String],
                mergeSchema: Boolean = true): DataFrame = {
    val df = ioSession(spark).read
      .option("mergeSchema", mergeSchema.toString)
      .option("basePath", root).parquet(paths: _*)
    df.withColumn("year", col("year").cast("int"))
      .withColumn("month", col("month").cast("int"))
  }

  /** The Hive-style directory of one series under `root` (sanitized key). */
  def seriesDir(root: String, k: SeriesKey): String =
    s"$root/exchange=${k.exchange}/market=${k.market}/symbol=${k.symbol}" +
      s"/type=${k.`type`}/period=${k.period}"

  /** Does this tree hold any committed data file (non-hidden *.parquet)?
    * Distinguishes writer-crash debris (only `_temporary`/dot staging
    * files — safe to treat as an empty series) from a real series whose
    * read failed for a reason that must propagate.
    */
  private def hasDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                           dir: org.apache.hadoop.fs.Path): Boolean = {
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val f = it.next().getPath
      val name = f.getName
      // a file under a hidden (staging) directory is debris, not data
      val hiddenAncestor = Iterator.iterate(f.getParent)(_.getParent)
        .takeWhile(p => p != null && p.toString.length >= dir.toString.length)
        .exists(p => p.getName.startsWith("_") || p.getName.startsWith("."))
      if (!name.startsWith("_") && !name.startsWith(".") &&
        name.endsWith(".parquet") && !hiddenAncestor) return true
    }
    false
  }

  /** Open ONE series, scoped to its own directory tree: `basePath`
    * keeps the partition columns, but listing, schema inference
    * (mergeSchema footer reads) and scans never leave the series dir.
    *
    * Load-bearing twice over:
    *  - scale: a merge-write that opened the ROOT would run mergeSchema
    *    footer reads over the ENTIRE lake on every flush — O(lake
    *    files) per ingest chunk instead of O(series);
    *  - concurrency: a sibling writer process rewriting ANOTHER series'
    *    directories mid-listing/footer-read would throw
    *    FileNotFoundException into this writer's merge read (observed
    *    as a flaky q81 child failure). Disjoint series now never read
    *    each other's files, so concurrent per-series writers only
    *    contend on the catalog's create-exclusive commit, by design.
    *
    * Returns None if the series has no directory yet (first write).
    */
  def readSeriesScoped(spark: SparkSession, root: String, k: SeriesKey,
                       mergeSchema: Boolean = true): Option[DataFrame] = {
    val dir = seriesDir(root, k)
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) None
    else {
      try {
        val df = ioSession(spark).read
          .option("mergeSchema", mergeSchema.toString)
          .option("basePath", root)
          .parquet(dir)
        df.schema // force partition discovery NOW (fail fast, see catch)
        Some(df.withColumn("year", col("year").cast("int"))
          .withColumn("month", col("month").cast("int")))
      } catch {
        // a directory that EXISTS but holds no readable parquet footers
        // (a writer killed mid-flush leaving only staging/_temporary
        // debris — precisely the q81 forked-child crash shape) is an
        // empty series, not a permanently wedged one: schema inference
        // throws AnalysisException, and without this guard every later
        // merge-write on the series would fail until manual cleanup.
        // The catch is NARROW by data-file probe, not by exception type:
        // an irreconcilable mergeSchema conflict (incompatible column
        // types across months) is ALSO an AnalysisException, and mapping
        // it to "empty series" would let the next merge-write treat real
        // data as a first write — rethrow whenever data files exist
        case e: org.apache.spark.sql.AnalysisException =>
          if (hasDataFiles(fs, hPath)) throw e else None
      }
    }
  }
}

/** @param statsColumns when non-empty, every merge-write also refreshes
  *   the series' [[FileStatsIndex]] (at [[FileStatsIndex.seriesIndexRoot]])
  *   for these columns — created on first write, then O(new files) per
  *   flush, all under the series lease the write already holds. Readers
  *   opt in via [[LakeReader.readWhere]]; a lake written without stats
  *   simply never skips (the advisory contract).
  */
final class LakeWriter(spark: SparkSession, root: String,
                       statsColumns: Seq[String] = Nil) {

  private val partCols = Seq("exchange", "market", "symbol", "type", "period", "year", "month")

  private def withPartitionCols(df: DataFrame, key: SeriesKey): DataFrame = {
    val k = key.sanitized
    // UTC-arithmetic date, NOT year(timestamp_millis(ts)): the latter
    // follows spark.sql.session.timeZone, so a non-UTC session would
    // write partitions offset from the UTC months that BOTH pruning
    // paths (LakeReader.monthBounds, TsPartitionPruning) assume, and
    // pruned reads would silently miss month-boundary rows.
    val d = graft.core.MonthKeys.utcDate(col("ts").cast("long"))
    df.withColumn("ts", col("ts").cast("long")) // epoch-ms contract (§1.2)
      .withColumn("exchange", lit(k.exchange))
      .withColumn("market", lit(k.market))
      .withColumn("symbol", lit(k.symbol))
      .withColumn("type", lit(k.`type`))
      .withColumn("period", lit(k.period))
      .withColumn("year", year(d))
      .withColumn("month", month(d))
  }

  /** Merge-write (upsert) a batch into the series: last-wins on `ts`
    * vs rows already in the lake (S6/J3/A5/W2). Requires a `ts` column
    * (epoch-ms), as the reference does (`writer.py:162-164`).
    *
    * The whole read-merge-overwrite-verify section holds the series'
    * [[SeriesLease]]: a compactor (or a second writer on the SAME
    * series) rewriting the months between this write's existing-data
    * scan and its dynamic overwrite would silently lose whichever
    * side committed first (gated by q84). Writers on different series
    * never contend — disjoint lease files (the q81 model).
    */
  def writeOhlc(df: DataFrame, key: SeriesKey): WriteReport =
    SeriesLease.withLeaseHandle(root, key)(writeOhlcLocked(df, key, _))

  private def writeOhlcLocked(df: DataFrame, key: SeriesKey,
                              lease: SeriesLease.Handle): WriteReport = {
    require(df.columns.contains("ts"), "OHLCV dataframe must contain a 'ts' column")
    val k = key.sanitized
    val incoming = withPartitionCols(df, k).withColumn("_batch", lit(1))

    // Months touched by this batch — drives both the existing-data scan
    // and (via dynamic overwrite) which directories get rewritten.
    val touched = incoming.select(col("year"), col("month")).distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet

    val existing = readSeries(k) match {
      case Some(cur) =>
        val monthPred = touched.map { case (y, m) => col("year") === y && col("month") === m }
          .reduceOption(_ || _).getOrElse(lit(false))
        // Materialize the touched months (bounded: O(incoming batch span),
        // not O(table)) and truncate lineage — the write below overwrites
        // the very directories this scan reads, which Spark (correctly)
        // refuses inside one plan.
        Some(withPartitionCols(cur, k).filter(monthPred).withColumn("_batch", lit(0))
          .pipe(graft.core.Checkpoints.stable))
      case None => None
    }

    val unioned = existing match {
      case Some(e) => e.unionByName(incoming, allowMissingColumns = true)
      case None => incoming
    }

    val keyCols = Seq(col("exchange"), col("market"), col("symbol"),
      col("type"), col("period"), col("ts"))
    // "last" = highest batch; ties WITHIN a batch (same ts twice in one
    // ingest) break on row-content hash — arbitrary but deterministic
    // under any shuffling/rerun (a shuffled row_number tie is not)
    val dataCols = unioned.columns.filterNot(c => c == "_batch").map(col)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_batch").desc, xxhash64(dataCols: _*).desc)
    val merged = unioned
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_batch")

    // the merge scan above assumed exclusion — re-verify it still holds
    // before the overwrite that would lose the race if it doesn't
    lease.assertOwned()
    merged
      .repartition(partCols.map(col): _*)
      // partition cols lead the sort so FileFormatWriter's required
      // ordering is already satisfied — otherwise it inserts its own
      // sort on partCols only and the ts order inside files is lost
      .sortWithinPartitions(partCols.map(col) :+ col("ts"): _*)
      .write
      .mode(SaveMode.Overwrite)
      // per-write, not session-level: with the default (static) mode,
      // Overwrite+partitionBy would wipe the entire lake root
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "snappy")
      .partitionBy(partCols: _*)
      .parquet(root)

    // stats refresh rides the same lease as the write it describes: the
    // rewritten months' new files are indexed in one O(new files) pass,
    // and entries for the files the dynamic overwrite just replaced are
    // pruned so the index never accumulates the write history
    if (statsColumns.nonEmpty) {
      val dir = LakeIO.seriesDir(root, k)
      val idx = FileStatsIndex.seriesIndexRoot(dir)
      FileStatsIndex.ensure(spark, idx, statsColumns)
      FileStatsIndex.update(spark, dir, idx)
      FileStatsIndex.prune(spark, dir, idx)
    }

    verifySeries(k, touched)
  }

  /** Tick write path: identical semantics, open schema with required ts
    * (`writer.py:190-232`).
    */
  def writeTicks(df: DataFrame, key: SeriesKey): WriteReport =
    writeOhlc(df, key.copy(`type` = "ticks"))

  private def readSeries(k: SeriesKey): Option[DataFrame] =
    // scoped to the series' own directory tree — O(series) listing and
    // footer reads per merge-write, and immune to sibling writer
    // processes rewriting OTHER series concurrently (see
    // LakeIO.readSeriesScoped)
    LakeIO.readSeriesScoped(spark, root, k).map(_.drop(partCols: _*))

  /** Post-write verify (`writer.py:108-132`): series bounds + count via
    * one plain aggregation (no window, no global sort), plus strict
    * monotonicity = within-month ordering checked ONLY on the months
    * this write touched (each month sorts independently — O(touched),
    * not O(table)) + global ts uniqueness (count == distinct count;
    * unique ts + per-month order ⇒ strictly increasing read order).
    */
  private def verifySeries(k: SeriesKey, touched: Set[(Int, Int)]): WriteReport =
    readSeries(k) match {
      case None => WriteReport(0L, 0L, 0L, monotonic = true, 0L)
      case Some(df) =>
        val bounds = df.agg(count(lit(1)).as("n"), min("ts").as("from"),
          max("ts").as("to"), countDistinct(col("ts")).as("nd")).head()
        if (bounds.getLong(0) == 0L) WriteReport(0L, 0L, 0L, monotonic = true, 0L)
        else {
          // same UTC derivation as the writer — a tz-offset grouping here
          // would check monotonicity on a subtly different month subset
          val d = graft.core.MonthKeys.utcDate(col("ts"))
          val monthPred = touched.map { case (y, m) => year(d) === y && month(d) === m }
            .reduceOption(_ || _).getOrElse(lit(true))
          val w = Window.partitionBy(year(d), month(d)).orderBy(col("ts"))
          val nonmono = df.filter(monthPred)
            .select(col("ts"), lag(col("ts"), 1).over(w).as("prev"))
            .filter(col("prev").isNotNull && col("ts") <= col("prev"))
            .count()
          WriteReport(bounds.getLong(0), bounds.getLong(1), bounds.getLong(2),
            monotonic = nonmono == 0L && bounds.getLong(0) == bounds.getLong(3),
            touched.size.toLong)
        }
    }
}

/** Pruned reads over the lake (SURVEY §7.1 #4: S1/P1/O1, S10/O2, U2). */
final class LakeReader(spark: SparkSession, root: String) {

  private def base(mergeSchema: Boolean): DataFrame =
    LakeIO.read(spark, root, mergeSchema)

  /** Range scan: partition-pruned by series key AND by year/month bounds
    * derived from the ts range (exceeding the reference, which only
    * filters on ts — SURVEY §4 "partition pruning"), then ts row filter,
    * ordered by ts. Market is optional (wildcard market level, reader.py:44).
    */
  def readRange(exchange: String, symbol: String, `type`: String,
                startMs: Long, endMs: Long,
                market: Option[String] = None,
                period: Option[String] = None,
                mergeSchema: Boolean = false): DataFrame = {
    var df = base(mergeSchema)
      .filter(col("exchange") === Symbols.sanitize(exchange) &&
        col("symbol") === Symbols.sanitize(symbol) && col("type") === `type`)
    market.foreach(m => df = df.filter(col("market") === Symbols.sanitize(m)))
    period.foreach(p => df = df.filter(col("period") === p))
    df.filter(monthBounds(startMs, endMs) && col("ts").between(startMs, endMs))
      .orderBy("ts")
  }

  /** year/month partition predicate implied by a ts range: prunes month
    * directories before any file is opened. Key arithmetic is Long
    * (year*100 overflows Int for sentinel ranges like (0, Long.MaxValue))
    * and shared with the optimizer rule via [[graft.core.MonthKeys]].
    */
  private def monthBounds(startMs: Long, endMs: Long): Column =
    (col("year").cast("long") * 100L + col("month"))
      .between(graft.core.MonthKeys.monthKey(startMs),
        graft.core.MonthKeys.monthKey(endMs))

  /** Stats-skipping value scan (§2.1 S1 via [[FileStatsIndex]]): prune
    * the series' FILE LIST through the persisted per-file min/max index
    * before any footer is opened, for a predicate on a clustered data
    * column the month dirs cannot prune (ingest seq, id bands — `ts`
    * ranges should use [[readRange]], whose month pruning needs no
    * index). Falls back to a plain filtered series scan when the series
    * has no index (the advisory contract: no stats, no skipping, never
    * an error). Returns the frame plus the skip [[FileStatsIndex.Decision]]
    * so callers (and q94's gate) can audit what was pruned.
    */
  def readWhere(key: SeriesKey, column: String, lo: Long, hi: Long,
                mergeSchema: Boolean = true): (DataFrame, FileStatsIndex.Decision) = {
    val k = key.sanitized
    val dir = LakeIO.seriesDir(root, k)
    val idx = FileStatsIndex.seriesIndexRoot(dir)
    if (FileStatsIndex.exists(spark, idx)) {
      val d = FileStatsIndex.skipFiles(spark, dir, idx, column, lo, hi)
      val df =
        if (d.kept.isEmpty)
          // schema still needed: scoped series read filtered to nothing
          LakeIO.readSeriesScoped(spark, root, k, mergeSchema)
            .getOrElse(sys.error(s"readWhere: unknown series $k"))
            .filter(lit(false))
        else
          LakeIO.readFiles(spark, root, d.kept, mergeSchema)
            .filter(col(column).between(lo, hi))
      (df, d)
    } else {
      val df = LakeIO.readSeriesScoped(spark, root, k, mergeSchema)
        .getOrElse(sys.error(s"readWhere: unknown series $k"))
        .filter(col(column).between(lo, hi))
      (df, FileStatsIndex.Decision(Seq.empty, 0L, 0L))
    }
  }

  /** Composed pruning (VERDICT r13 What's-missing #2): ONE scan whose
    * file list is the INTERSECTION of both pruning dimensions — the
    * stats-index survivors for `column BETWEEN lo AND hi` AND the
    * year/month directories implied by `[startMs, endMs]` — so a query
    * carrying both a ts range and an indexed-column predicate opens
    * only files that pass BOTH, where [[readRange]] alone prunes just
    * months and [[readWhere]] alone prunes just stats. Advisory like
    * every file-pruning path: a survivor path whose month cannot be
    * parsed is kept (read), never dropped; without an index this
    * degrades to exactly [[readRange]]'s month pruning plus the value
    * row-filter. Row-level `ts BETWEEN` and `column BETWEEN` filters
    * apply on top either way (files prune, then row groups, then rows).
    */
  def readWhereInRange(key: SeriesKey, column: String, lo: Long, hi: Long,
                       startMs: Long, endMs: Long,
                       mergeSchema: Boolean = true): (DataFrame, FileStatsIndex.Decision) = {
    val k = key.sanitized
    val dir = LakeIO.seriesDir(root, k)
    val idx = FileStatsIndex.seriesIndexRoot(dir)
    val (keyLo, keyHi) = (graft.core.MonthKeys.monthKey(startMs),
      graft.core.MonthKeys.monthKey(endMs))
    if (FileStatsIndex.exists(spark, idx)) {
      val d = FileStatsIndex.skipFiles(spark, dir, idx, column, lo, hi)
      val MonthDirs = """.*/year=(\d+)/month=(\d+)/.*""".r
      val kept = d.kept.filter {
        case MonthDirs(y, m) =>
          val mk = y.toLong * 100L + m.toLong; mk >= keyLo && mk <= keyHi
        case _ => true // unparseable layout: advisory ⇒ keep
      }
      val both = FileStatsIndex.Decision(kept, d.total, d.total - kept.size)
      val df =
        if (kept.isEmpty)
          LakeIO.readSeriesScoped(spark, root, k, mergeSchema)
            .getOrElse(sys.error(s"readWhereInRange: unknown series $k"))
            .filter(lit(false))
        else
          LakeIO.readFiles(spark, root, kept, mergeSchema)
            .filter(col(column).between(lo, hi) && col("ts").between(startMs, endMs))
      (df, both)
    } else {
      val df = LakeIO.readSeriesScoped(spark, root, k, mergeSchema)
        .getOrElse(sys.error(s"readWhereInRange: unknown series $k"))
        .filter(monthBounds(startMs, endMs) &&
          col(column).between(lo, hi) && col("ts").between(startMs, endMs))
      (df, FileStatsIndex.Decision(Seq.empty, 0L, 0L))
    }
  }

  /** Stable pagination (S10/O2): global order by ts, offset/limit. */
  def page(df: DataFrame, offset: Int, limit: Int): DataFrame =
    df.orderBy("ts").offset(offset).limit(limit)

  /** Distinct symbols present in the lake (S13/A7/U4). */
  def listSymbols(): DataFrame =
    base(mergeSchema = false).select("symbol").distinct().orderBy("symbol")
}
