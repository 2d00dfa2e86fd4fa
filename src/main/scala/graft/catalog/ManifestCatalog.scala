package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.{ManifestEntry, Schemas}
import java.io.RandomAccessFile
import java.nio.channels.FileLock
import java.nio.file.{Files, Paths}

/** The lake's manifest catalog (SURVEY §7.1 #3) — one row per physical
  * data file, same columns as the reference's SQLite `manifest` table
  * (`dl-datalake/src/dl_datalake/metadata/manifest.py:22-39`) — as a
  * Spark-managed Parquet table.
  *
  * Storage model: an append-only log of parquet files under
  * `{root}/_manifest/log/`; each committed row carries a monotonically
  * increasing `_seq` and a `_deleted` tombstone flag. A snapshot is
  * keep-latest-`_seq` per `path` with tombstones dropped — the same
  * upsert-by-path semantics as the reference's `add_entry`
  * (`manifest.py:63-99`), including case normalization (upper exchange/
  * market/symbol, `manifest.py:77-83`). `compact()` rewrites the snapshot
  * as a single base segment so reads stay O(1 file) under many commits.
  *
  * Concurrency: the reference got serialized writers from SQLite's file
  * lock (30 s busy timeout, `manifest.py:52-55`); here a `FileLock` on
  * `_manifest/.lock` serializes commits (driver-side, one lake = one
  * writer at a time — SURVEY §7.4 #4). Readers never take the lock.
  *
  * At 100 TB the catalog is still tiny (1 row per file ⇒ millions of
  * rows, a few hundred MB) — a single-node commit path with distributed
  * reads is the right trade; swap in Delta/Iceberg later behind this API.
  */
object ManifestCatalog {
  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[catalog] def monitorFor(path: String): Object =
    monitors.computeIfAbsent(path, _ => new Object)
}

final class ManifestCatalog(spark: SparkSession, root: String) {
  import spark.implicits._

  private val dir = s"$root/_manifest"
  private val logDir = s"$dir/log"
  private val seqFile = Paths.get(s"$dir/.seq")
  private val lockFile = s"$dir/.lock"

  Files.createDirectories(Paths.get(logDir))

  /** Commit serialization is two-level: a JVM monitor per lock path
    * (FileLock throws OverlappingFileLockException for same-process
    * contention — it only serializes ACROSS processes), then the
    * advisory FileLock for other driver processes sharing the lake.
    */
  private def withLock[T](f: => T): T =
    ManifestCatalog.monitorFor(lockFile).synchronized {
      val raf = new RandomAccessFile(lockFile, "rw")
      var lock: FileLock = null
      try { lock = raf.getChannel.lock(); f }
      finally { if (lock != null) lock.release(); raf.close() }
    }

  private def nextSeq(): Long = {
    val cur = if (Files.exists(seqFile)) new String(Files.readAllBytes(seqFile)).trim.toLong else 0L
    Files.write(seqFile, (cur + 1).toString.getBytes)
    cur + 1
  }

  private def normalized(e: ManifestEntry): ManifestEntry = e.copy(
    exchange = e.exchange.toUpperCase,
    market = e.market.toUpperCase,
    symbol = e.symbol.toUpperCase)

  /** Upsert-by-path (last entry for a path wins at read time). Two
    * entries for one path WITHIN a batch would share `_seq` and make
    * snapshot()'s winner nondeterministic — so the batch is pre-reduced
    * to its last entry per path (caller order), the same last-wins the
    * log gives across batches.
    */
  def addEntries(entries: Seq[ManifestEntry]): Unit = withLock {
    val seq = nextSeq()
    val lastPerPath = entries.map(normalized).zipWithIndex
      .groupBy(_._1.path).valuesIterator.map(_.maxBy(_._2)._1).toSeq
    lastPerPath.toDF()
      .withColumn("_seq", lit(seq))
      .withColumn("_deleted", lit(false))
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(logDir)
  }

  def addEntry(e: ManifestEntry): Unit = addEntries(Seq(e))

  /** Tombstone every entry matching the filters (delete_entries shape,
    * `manifest.py:143-169`).
    */
  def deleteEntries(exchange: Option[String] = None, market: Option[String] = None,
                    symbol: Option[String] = None, `type`: Option[String] = None,
                    path: Option[String] = None): Long = withLock {
    val victims = filtered(snapshot(), exchange, market, symbol, `type`, path)
    val n = victims.count()
    if (n > 0) {
      val seq = nextSeq()
      victims
        .withColumn("_seq", lit(seq))
        .withColumn("_deleted", lit(true))
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(logDir)
    }
    n
  }

  private def rawLog(): DataFrame =
    spark.read.schema(logSchema).parquet(logDir)

  private lazy val logSchema = {
    import org.apache.spark.sql.types._
    org.apache.spark.sql.Encoders.product[ManifestEntry].schema
      .add(StructField("_seq", LongType))
      .add(StructField("_deleted", BooleanType))
  }

  /** Current catalog state: latest `_seq` per path, tombstones dropped. */
  def snapshot(): DataFrame = {
    val w = Window.partitionBy(col("path")).orderBy(col("_seq").desc)
    rawLog()
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("_deleted"))
      .drop("_rn", "_seq", "_deleted")
  }

  private def filtered(df: DataFrame, exchange: Option[String], market: Option[String],
                       symbol: Option[String], typ: Option[String],
                       path: Option[String] = None): DataFrame = {
    var out = df
    exchange.foreach(v => out = out.filter(upper(col("exchange")) === v.toUpperCase))
    market.foreach(v => out = out.filter(upper(col("market")) === v.toUpperCase))
    symbol.foreach(v => out = out.filter(upper(col("symbol")) === v.toUpperCase))
    typ.foreach(v => out = out.filter(col("type") === v))
    path.foreach(v => out = out.filter(col("path") === v))
    out
  }

  /** Catalog scan with optional equality filters (SURVEY S12/P5). */
  def listEntries(exchange: Option[String] = None, market: Option[String] = None,
                  symbol: Option[String] = None, `type`: Option[String] = None): DataFrame =
    filtered(snapshot(), exchange, market, symbol, `type`)
      .orderBy(col("created_at").desc, col("path"))

  /** Resume watermark: max(time_to) over matching entries (SURVEY A4/T1).
    * `timeframe` scopes the watermark to one series' metadata_json
    * timeframe — without it, a symbol's 1m and 1h (or spot and futures)
    * series would share one watermark and silently skip history.
    */
  def maxTimeTo(exchange: String, symbol: String, `type`: String,
                market: Option[String] = None,
                timeframe: Option[String] = None): Option[Long] = {
    var df = filtered(snapshot(), Some(exchange), market, Some(symbol), Some(`type`))
    timeframe.foreach(tf => df = df.filter(
      get_json_object(col("metadata_json"), "$.timeframe") === tf))
    val r = df.agg(max(col("time_to"))).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  /** Latest version string for a feature set, numeric-descending where
    * possible (SURVEY W5/O5; `manifest.py:101-111` casts to int).
    */
  def latestVersion(featureSet: String): Option[String] = {
    val r = snapshot().filter(col("type") === featureSet)
      .orderBy(expr("try_cast(version AS DOUBLE)").desc_nulls_last, col("version").desc)
      .select("version").limit(1).collect()
    r.headOption.map(_.getString(0))
  }

  /** Feature-set detection: any type outside the built-ins (SURVEY P6). */
  def featureEntries(): DataFrame =
    snapshot().filter(!col("type").isin(Schemas.builtinTypes.toSeq.map(lit): _*))

  /** Rewrite the log as one compacted base segment (small-file control —
    * the reference's aspirational `daily_offload_flow` done for real).
    *
    * Crash-safe by construction: the snapshot is APPENDED as new rows
    * carrying a fresh max `_seq` (keep-last-by-path semantics make them
    * win over — and equal — every older row), and only then are the
    * pre-existing log files deleted. A crash at any point leaves a log
    * whose snapshot() is unchanged; re-running compact() converges.
    */
  def compact(): Unit = withLock {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(logDir), spark.sparkContext.hadoopConfiguration)
    val logPath = new org.apache.hadoop.fs.Path(logDir)
    val oldFiles = fs.listStatus(logPath).map(_.getPath)
    val seq = nextSeq()
    snapshot()
      .withColumn("_seq", lit(seq))
      .withColumn("_deleted", lit(false))
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(logDir)
    oldFiles.foreach(p => fs.delete(p, false))
  }
}
