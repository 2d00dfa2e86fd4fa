package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.{ManifestEntry, Schemas}
import java.io.RandomAccessFile
import java.nio.channels.FileLock
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

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
  * lock (30 s busy timeout, `manifest.py:52-55`). Here the commit point
  * is an ATOMIC CREATE-EXCLUSIVE publish: the batch is staged as one
  * parquet file, then hard-linked into the log as `{seq}.parquet` —
  * link(2) fails with EEXIST if the seq is taken, and the loser retries
  * with the next seq. `_seq` is derived from the FILE NAME at read
  * time, so claim and data publish are a single atomic operation and
  * correctness never depends on an advisory flock (which is a no-op on
  * object stores — there, swap the link for an if-none-match PUT; the
  * Delta/Iceberg commit protocols are this same shape). Readers never
  * coordinate. Two concurrent writer PROCESSES therefore produce a
  * gapless, duplicate-free sequence (ConcurrentCommitSpec).
  *
  * compact() appends the snapshot as a base segment whose rows KEEP
  * their original `_seq` (an `_seq_override` column wins over the file
  * name), so a commit that lands concurrently with a compaction still
  * outranks the compacted copy of the same path — compaction can never
  * shadow a newer write. The only remaining serialized op is compact vs
  * compact (old-file deletion), guarded best-effort by monitor+flock.
  *
  * At 100 TB the catalog is still tiny (1 row per file ⇒ millions of
  * rows, a few hundred MB) — a single-node commit path with distributed
  * reads is the right trade; swap in Delta/Iceberg later behind this API.
  */
object ManifestCatalog {
  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[catalog] def monitorFor(path: String): Object =
    monitors.computeIfAbsent(path, _ => new Object)

  private val SeqName = """^(\d{20})\.parquet$""".r

  /** Highest seq currently published in `logDir` (0 for an empty log). */
  private[catalog] def maxFileSeq(logDir: String): Long = {
    val s = Files.list(Paths.get(logDir))
    try {
      s.iterator().asScala.map(_.getFileName.toString)
        .collect { case SeqName(d) => d.toLong }
        .foldLeft(0L)(math.max)
    } finally s.close()
  }

  /** The storage-specific atomic-publish primitive the commit protocol
    * builds on. INVARIANT the impl must provide: for a given target
    * name, when N writers race, exactly ONE tryPublish returns true and
    * the rest return false (never two winners, never zero) — the retry
    * loop in [[publishExclusive]] supplies everything else. Impls:
    *  - [[PosixLinkPublish]] (default): create-exclusive link(2);
    *    correct on any POSIX filesystem, exercised cross-process by
    *    ConcurrentCommitSpec's forked JVMs.
    *  - An object store has neither hard links nor flock: implement
    *    tryPublish as a conditional PUT (`If-None-Match: *` on S3/GCS)
    *    and maxSeq as a LIST of the log prefix — the same
    *    exactly-one-winner contract, which is also the shape of the
    *    Delta/Iceberg commit protocols.
    */
  trait PublishPrimitive {
    /** Atomically bind the staged file's content to `target`; false iff
      * `target` already exists (another writer won that name).
      */
    def tryPublish(staged: java.nio.file.Path, target: java.nio.file.Path): Boolean
    /** Highest seq currently published in `logDir` (0 for an empty log). */
    def maxSeq(logDir: String): Long
  }

  /** POSIX impl: link(2) fails EEXIST if the name is taken — atomic
    * create-exclusive, no locks, safe across processes.
    */
  object PosixLinkPublish extends PublishPrimitive {
    override def tryPublish(staged: java.nio.file.Path, target: java.nio.file.Path): Boolean =
      try { Files.createLink(target, staged); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    override def maxSeq(logDir: String): Long = maxFileSeq(logDir)
  }

  /** Second, link-free impl — proves the [[PublishPrimitive]] seam is
    * portable (HDFS and local filesystems without hard-link support):
    * the WINNER of a seq is decided by an atomic create-exclusive of a
    * hidden claim marker (`.{seq}.parquet.claim` — O_EXCL semantics, the
    * verdict's `Files.createFile` shape), and content then becomes
    * visible ATOMICALLY via copy-to-hidden-stage + fsync + ATOMIC_MOVE
    * onto the target name. The claim alone would leave readers exposed
    * to a partially-written log segment (link(2) and S3 conditional PUT
    * both bind complete content to the name in one step; a plain O_EXCL
    * create + write does not) — the rename closes that gap, at the cost
    * of one extra file copy per commit (irrelevant: commit batches are
    * KB-sized).
    *
    * The claim marker is PERMANENT — it is the winner record. Deleting
    * it after publishing re-opens the name: a lagging writer holding a
    * stale maxSeq would re-claim the seq and its ATOMIC_MOVE would
    * silently REPLACE the first winner's file (rename(2) overwrites) —
    * a measured 34%-lost-writes race in this spec's forked-JVM test.
    * One hidden empty file per commit is the cost; compact() clears
    * them with the old log segments, safely below the monotone maxSeq.
    * A writer crashing between claim and move leaves a claim that
    * permanently skips one seq — harmless: later writers retry past it
    * and the log's ranking only needs monotonicity, not density.
    */
  object ClaimRenamePublish extends PublishPrimitive {
    override def tryPublish(staged: java.nio.file.Path, target: java.nio.file.Path): Boolean = {
      val dir = target.getParent
      val claim = dir.resolve(s".${target.getFileName}.claim")
      try Files.createFile(claim)
      catch {
        case _: java.nio.file.FileAlreadyExistsException => return false
      }
      // sole owner of `target` from here on (hidden names are invisible
      // to Spark's file listing, so readers never see the stage)
      val stage = dir.resolve(s".${target.getFileName}.stage")
      Files.copy(staged, stage, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val ch = java.nio.channels.FileChannel.open(stage, java.nio.file.StandardOpenOption.WRITE)
      try ch.force(true) finally ch.close()
      Files.move(stage, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      true
    }
    override def maxSeq(logDir: String): Long = maxFileSeq(logDir)
  }

  /** The lock-free commit point: atomically publish `part` into the
    * log as `{seq}.parquet` at the next free seq via the storage
    * primitive. Exactly one writer wins each seq; losers retry one
    * higher (re-listing, so a burst of writers converges in O(burst)
    * attempts total, not per writer). The file's content never changes
    * during a claim retry, only its eventual name.
    */
  private[catalog] def publishExclusive(logDir: String, part: java.nio.file.Path,
                                        pub: PublishPrimitive = PosixLinkPublish): Long = {
    var seq = pub.maxSeq(logDir) + 1
    while (!pub.tryPublish(part, Paths.get(f"$logDir/$seq%020d.parquet")))
      seq = math.max(seq + 1, pub.maxSeq(logDir) + 1)
    seq
  }
}

final class ManifestCatalog(spark: SparkSession, root: String,
                            pub: ManifestCatalog.PublishPrimitive = ManifestCatalog.PosixLinkPublish) {
  import spark.implicits._

  private val dir = s"$root/_manifest"
  private val logDir = s"$dir/log"
  private val lockFile = s"$dir/.lock"

  Files.createDirectories(Paths.get(logDir))

  /** Best-effort serialization for compact-vs-compact ONLY (commit
    * correctness does not need it): a JVM monitor per lock path
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

  /** Stage `df` as one parquet file, then publish it at the next free
    * seq via [[ManifestCatalog.publishExclusive]]. Returns the claimed
    * seq. The file's data never changes during a claim retry, only its
    * eventual name, so a collision costs a link(2), not a rewrite.
    */
  private def commitBatch(df: DataFrame): Long = {
    val staging = Paths.get(s"$dir/tmp/${java.util.UUID.randomUUID}")
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val part = {
      val s = Files.list(staging)
      try s.iterator().asScala
        .find(p => p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file staged in $staging"))
      finally s.close()
    }
    val seq = ManifestCatalog.publishExclusive(logDir, part, pub)
    // scratch cleanup is non-critical: the link already published the data
    val s = Files.walk(staging)
    try s.iterator().asScala.toSeq.reverseIterator.foreach(p => Files.deleteIfExists(p))
    finally s.close()
    seq
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
  def addEntries(entries: Seq[ManifestEntry]): Unit = {
    val lastPerPath = entries.map(normalized).zipWithIndex
      .groupBy(_._1.path).valuesIterator.map(_.maxBy(_._2)._1).toSeq
    commitBatch(lastPerPath.toDF()
      .withColumn("_deleted", lit(false))
      .withColumn("_seq_override", lit(null).cast("long")))
    ()
  }

  def addEntry(e: ManifestEntry): Unit = addEntries(Seq(e))

  /** Tombstone every entry matching the filters (delete_entries shape,
    * `manifest.py:143-169`).
    */
  def deleteEntries(exchange: Option[String] = None, market: Option[String] = None,
                    symbol: Option[String] = None, `type`: Option[String] = None,
                    path: Option[String] = None): Long = {
    val victims = filtered(snapshot(), exchange, market, symbol, `type`, path)
    val n = victims.count()
    if (n > 0) {
      commitBatch(victims
        .withColumn("_deleted", lit(true))
        .withColumn("_seq_override", lit(null).cast("long")))
    }
    n
  }

  /** The log with `_seq` materialized: the publishing file's name, unless
    * the row carries an `_seq_override` (compacted rows keep the seq they
    * were ORIGINALLY committed under, so compaction cannot outrank a
    * concurrent new commit).
    */
  private def rawLog(): DataFrame =
    spark.read.schema(logSchema).parquet(logDir)
      .withColumn("_seq", coalesce(col("_seq_override"),
        regexp_extract(col("_metadata.file_name"), "^(\\d+)\\.parquet$", 1).cast("long")))
      .drop("_seq_override")

  private lazy val logSchema = {
    import org.apache.spark.sql.types._
    org.apache.spark.sql.Encoders.product[ManifestEntry].schema
      .add(StructField("_deleted", BooleanType))
      .add(StructField("_seq_override", LongType))
  }

  /** Current catalog state: latest `_seq` per path, tombstones dropped. */
  def snapshot(): DataFrame = asOf(Long.MaxValue)

  /** The catalog AS OF published sequence `seq` — time travel over the
    * append-only log (the reference's version-rollback surface,
    * `dl-datalake/tests/integration/test_11_versioning.py`; the
    * Delta/Iceberg snapshot-read shape). Because every commit is
    * totally ordered by [[ManifestCatalog.publishExclusive]] and rows
    * rank by their ORIGINAL `_seq` even after compaction, `asOf(s)` is
    * exactly the snapshot a reader would have seen the instant commit
    * `s` published: later appends are invisible, and a pinned seq gives
    * byte-identical reads while writers race (ManifestCatalogSpec).
    * Audits (J1/J2) run against `asOf(s)` simply by auditing this
    * DataFrame instead of [[snapshot]]. One caveat, shared with every
    * log-structured catalog: [[compact]] collapses history — it keeps
    * only each path's LATEST row, so `asOf` before a compaction point
    * no longer resurrects overwritten versions (Delta VACUUM semantics;
    * pin snapshots you need before compacting).
    */
  def asOf(seq: Long): DataFrame = {
    val w = Window.partitionBy(col("path")).orderBy(col("_seq").desc)
    rawLog()
      .filter(col("_seq") <= seq)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("_deleted"))
      .drop("_rn", "_seq", "_deleted")
  }

  /** Highest published sequence visible right now — the pin for
    * [[asOf]]. 0 for an empty log.
    */
  def currentSeq(): Long = pub.maxSeq(logDir)

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
    // keep-latest per path WITH each row's original _seq: the compacted
    // base claims a new file seq, but its rows rank as of when they were
    // first committed — a write landing mid-compaction still wins.
    val w = Window.partitionBy(col("path")).orderBy(col("_seq").desc)
    val base = rawLog()
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("_deleted"))
      .drop("_rn")
      .withColumn("_seq_override", col("_seq"))
      .drop("_seq")
      // the staged write re-reads the log while old files still exist;
      // localCheckpoint pins the rows so deletion below can't race reads
      .localCheckpoint(true)
    commitBatch(base)
    oldFiles.foreach(p => fs.delete(p, false))
  }
}
