package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.catalog.ManifestCatalog
import graft.model.ManifestEntry
import graft.ops.SeriesOps
import graft.storage.{LakeMaintenance, LakeWriter, SeriesKey}

/** q88: lake audit reconciliation END-TO-END under the oracle (SURVEY
  * §2.3 J1/J2 / §2.7 U3 — the reference's audit use-case,
  * `tests/integration/test_09_audit.py:6-54`: walk the REAL tree,
  * compare against the REAL manifest, report orphans — files on disk
  * the catalog doesn't know — and broken links — catalog rows whose
  * file is gone). Until now `SeriesOps.auditOrphans/auditBroken` were
  * proven only on hand-built in-memory frames; this gate reconciles an
  * actual lake built through the production `LakeWriter`.
  *
  * Fixture (once per session): derive an hourly series from `events`
  * (event_id < CAP — multi-month by construction), merge-write it
  * through `LakeWriter`, settle to the canonical compact layout (one
  * file per month — `require`d, which makes the clean-file count equal
  * the month count the oracle can derive arithmetically), register
  * every REAL data file in a `ManifestCatalog`, then plant the faults:
  * the 3 smallest ids name on-disk orphan files the catalog never
  * sees, the 3 largest ids name ghost catalog rows whose files never
  * exist. The DECLARED query re-walks the real tree (distributed
  * binaryFile listing — paths only, content pruned) against the real
  * manifest snapshot and reports (status, n, items) per class; a
  * missed orphan, a phantom broken link, or an audit that flags a
  * registered file all hash-mismatch.
  *
  * 100 TB note: both sides of the reconciliation are DataFrames — the
  * tree listing is a distributed scan and the anti-joins never collect
  * (`SeriesOps.auditOrphans` doc) — so the same query runs over a
  * billion-file lake with the manifest snapshot on the build side.
  */
object LakeAuditGate {

  private val T0 = 1704067200000L // 2024-01-01 UTC
  private val CAP = 6000L
  private val HourMs = 3600000L
  private val Faults = 3

  private def auditRoot(s: SparkSession, d: String): String =
    graft.core.SessionTempRoots.of(s, d, "graft_audit_") { root =>
      val lake = Files.createDirectories(Paths.get(root, "lake")).toString
      val ids = Tables.events(s, d).select(col("event_id"))
        .filter(col("event_id") < CAP).distinct()
      val idList = ids.collect().map(_.getLong(0)).sorted // bounded: < CAP
      require(idList.length >= 2 * Faults,
        s"q88 premise: need >= ${2 * Faults} ids for disjoint fault sets")

      val key = SeriesKey("EX", "SPOT", "AUD", "raw", "1h")
      val candles = ids.select(
        (lit(T0) + col("event_id") * HourMs).as("ts"),
        (col("event_id") % 97).cast("double").as("open"),
        (col("event_id") % 97 + 1).cast("double").as("high"),
        (col("event_id") % 97 - 1).cast("double").as("low"),
        ((col("event_id") * 7) % 97).cast("double").as("close"),
        (col("event_id") % 11).cast("double").as("volume"))
      new LakeWriter(s, lake).writeOhlc(candles, key)
      // canonical layout: exactly one file per month, so the clean-file
      // count the query reports equals the month count the oracle
      // derives from the ts span
      new LakeMaintenance(s, lake).compactSeries(key, maxFiles = 1)

      val dataFiles = diskListing(s, seriesDir(lake)).select("path")
        .collect().map(_.getString(0)).sorted // bounded: one per month
      val months = graft.core.PathWalk.walk(Paths.get(lake))(_.count { p =>
        p.toString.contains("symbol=AUD") && Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("month=")
      }.toLong)
      require(months >= 1 && dataFiles.length.toLong == months,
        s"q88 premise: compacted lake must hold 1 file/month " +
          s"(${dataFiles.length} files over $months months)")

      // register every real file — the lake the audit should call clean
      val cat = new ManifestCatalog(s, lake)
      cat.addEntries(dataFiles.map(p => entry(p)))

      // plant the faults the oracle predicts: orphans ON DISK (real
      // parquet bytes — the audit compares paths, but a tree walker
      // must not choke on them), ghosts IN CATALOG only
      val sdir = Paths.get(seriesDir(lake))
      idList.take(Faults).foreach { i =>
        val src = Paths.get(new java.net.URI(dataFiles.head))
        Files.copy(src, sdir.resolve(s"orphan_$i.parquet"))
      }
      cat.addEntries(idList.takeRight(Faults).map { i =>
        entry(s"${dataFiles.head.stripSuffix(dataFiles.head.split('/').last)}ghost_$i.parquet")
      })
    }

  private def seriesDir(lake: String): String =
    s"$lake/exchange=EX/market=SPOT/symbol=AUD/type=raw/period=1h"

  private def entry(path: String): ManifestEntry =
    ManifestEntry("EX", "SPOT", "AUD", path, "raw",
      time_from = T0, time_to = T0 + CAP * HourMs, version = "1",
      checksum = "", created_at = T0, script_git_hash = "", metadata_json = "{}")

  /** Distributed listing of the real tree: binaryFile with only `path`
    * selected prunes the content column, so this is a file-metadata
    * scan, not a data read — the shape that survives a billion files.
    */
  private def diskListing(s: SparkSession, dir: String): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"))

  val lakeAudit: Q = Q(
    "q88_lake_audit",
    s"""WITH ids AS (SELECT event_id FROM events WHERE event_id < $CAP),
       |lo AS (SELECT event_id AS i FROM ids ORDER BY event_id LIMIT $Faults),
       |hi AS (SELECT event_id AS i FROM ids ORDER BY event_id DESC LIMIT $Faults),
       |months AS (
       |  SELECT COUNT(DISTINCT date_trunc('month',
       |           make_timestamp(($T0 + event_id * $HourMs) * 1000))) AS nm
       |  FROM ids)
       |SELECT 'broken' AS status, CAST($Faults AS BIGINT) AS n,
       |       (SELECT string_agg('ghost_' || i || '.parquet', ','
       |                          ORDER BY 'ghost_' || i || '.parquet') FROM hi) AS items
       |UNION ALL
       |SELECT 'clean', CAST((SELECT nm FROM months) AS BIGINT), ''
       |UNION ALL
       |SELECT 'orphan', CAST($Faults AS BIGINT),
       |       (SELECT string_agg('orphan_' || i || '.parquet', ','
       |                          ORDER BY 'orphan_' || i || '.parquet') FROM lo)
       |ORDER BY status""".stripMargin) { (s, d) =>
    val lake = s"${auditRoot(s, d)}/lake"
    val disk = diskListing(s, seriesDir(lake))
    val man = new ManifestCatalog(s, lake).snapshot().select(col("path"))
    def base(c: org.apache.spark.sql.Column) = regexp_extract(c, "([^/]+)$", 1)
    val orphan = SeriesOps.auditOrphans(disk, man)
      .agg(count(lit(1)).as("n"),
        array_join(sort_array(collect_list(base(col("path")))), ",").as("items"))
      .select(lit("orphan").as("status"), col("n"), col("items"))
    val broken = SeriesOps.auditBroken(man, disk)
      .agg(count(lit(1)).as("n"),
        array_join(sort_array(collect_list(base(col("path")))), ",").as("items"))
      .select(lit("broken").as("status"), col("n"), col("items"))
    val clean = disk.join(man, Seq("path"))
      .agg(count(lit(1)).as("n"))
      .select(lit("clean").as("status"), col("n"), lit("").as("items"))
    broken.unionByName(clean).unionByName(orphan)
      .select(col("status"), col("n"), col("items"))
      .orderBy("status")
  }

  val all: Seq[Q] = Seq(lakeAudit).map(_.gated)
}
