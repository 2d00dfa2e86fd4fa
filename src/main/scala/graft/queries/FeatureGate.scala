package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.catalog.ManifestCatalog
import graft.features.FeatureStore

/** q85: the versioned feature-store lifecycle under the oracle (SURVEY
  * §2.1 S14 / §2.4 A8 / §2.5 W5 / §2.6 O5 — the reference's
  * `features/manager.py:23-82` and its integration tests
  * `test_04_features.py:6-68`, `test_11_versioning.py`). Until now this
  * was the one reference-core lifecycle proven only by spec
  * (FeatureStoreSpec); this gate drives upload → second version →
  * latest-resolution → checksum-verified download → rollback read of
  * v1, end-to-end, under the driver's hash-compare.
  *
  * Payloads are DERIVED FROM THE DATA (the sorted doc_id list of
  * `documents`, capped at doc_id < 1000 so the artifact stays bounded
  * at every decade), so the oracle can recompute both versions' exact
  * SHA-256 in static SQL — a checksum mangled at upload, a catalog row
  * lost, a version ordering bug in `latestVersion`, or a download that
  * silently returns the wrong version's bytes all hash-mismatch. The
  * declared query re-runs the DOWNLOAD path (checksum re-verify against
  * the catalog row + byte-level compare against the recomputed payload)
  * on every execution, so the read side stays under the gate too, not
  * just the fixture's one-time upload.
  */
object FeatureGate {

  private val SetName = "featgate"
  private val IdCap = 1000L

  /** The deterministic payload both engines can derive: version-tagged
    * comma-joined sorted doc_ids (bounded by IdCap — driver-side by
    * design, like every feature-store artifact: these are opaque FILES,
    * not distributed tables; `manager.py` streams them byte-wise).
    * The id list is memoized per (session, data dir) — every execution
    * needs it for the byte-compare on both versions, and re-collecting
    * an immutable slice 2× per run is pure fixed cost in the bench pair
    * (0.84 s at sf0.1, mostly this). Session-identity-keyed like
    * [[graft.core.SessionTempRoots]].
    */
  private val idsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, String)]()
  private def idsCsv(s: SparkSession, d: String): String = {
    def make(): (SparkSession, String) = {
      val ids = Tables.documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") < IdCap)
        .collect().map(_.getLong(0)).sorted
      require(ids.nonEmpty, "q85 premise: documents must be non-empty")
      (s, ids.mkString(","))
    }
    val key = System.identityHashCode(s) + "|" + d
    val cached = idsMemo.computeIfAbsent(key, _ => make())
    if (cached._1 eq s) cached._2
    else { val fresh = make(); idsMemo.put(key, fresh); fresh._2 }
  }

  private def payload(s: SparkSession, d: String, version: Int): Array[Byte] =
    s"graft-features-v$version:${idsCsv(s, d)}".getBytes("UTF-8")

  private def storeRoot(s: SparkSession, d: String): String =
    graft.core.SessionTempRoots.of(s, d, "graft_fstore_") { root =>
      val cat = new ManifestCatalog(s, root)
      val store = new FeatureStore(s, root, cat)
      (1 to 2).foreach { v =>
        val src = Paths.get(root, s"payload_v$v.bin")
        Files.write(src, payload(s, d, v))
        val entry = store.upload(src.toString, SetName, v.toString,
          exchange = "X", market = "M", symbol = "DOCS")
        require(entry.version == v.toString && entry.checksum.length == 64,
          s"q85 premise: upload v$v must register a sha-256 entry")
      }
      // version resolution: "2" must shadow "1" (numeric-descending,
      // manifest.py:101-111 casts to int)
      require(store.latestVersion(SetName).contains("2"),
        s"q85 premise: latest must resolve to v2, got ${store.latestVersion(SetName)}")
    }

  /** Download one version into a scratch file, re-hash, byte-compare. */
  private def roundtrip(s: SparkSession, root: String, d: String,
                        version: Int): (String, Boolean) = {
    val cat = new ManifestCatalog(s, root)
    val store = new FeatureStore(s, root, cat)
    val dst = Files.createTempFile("graft_q85_", ".bin")
    try {
      // download() itself re-verifies the stream hash against the
      // catalog row and throws on mismatch — reaching the compare below
      // already proves the integrity contract held
      val entry = store.download(SetName, dst.toString, Some(version.toString))
      val bytes = Files.readAllBytes(dst)
      val ok = java.util.Arrays.equals(bytes, payload(s, d, version))
      (entry.checksum, ok)
    } finally Files.deleteIfExists(dst): Unit
  }

  val featureLifecycle: Q = Q(
    "q85_feature_lifecycle",
    """WITH ids AS (
      |  SELECT string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS s
      |  FROM documents WHERE doc_id < 1000)
      |SELECT '1' AS version, sha256('graft-features-v1:' || s) AS checksum,
      |       FALSE AS is_latest, TRUE AS roundtrip_ok
      |FROM ids
      |UNION ALL
      |SELECT '2', sha256('graft-features-v2:' || s), TRUE, TRUE
      |FROM ids
      |ORDER BY version""".stripMargin) { (s, d) =>
    val root = storeRoot(s, d)
    val latest = new FeatureStore(s, root, new ManifestCatalog(s, root))
      .latestVersion(SetName)
    val rows = (1 to 2).map { v =>
      val (checksum, ok) = roundtrip(s, root, d, v)
      (v.toString, checksum, latest.contains(v.toString), ok)
    }
    import s.implicits._
    rows.toDF("version", "checksum", "is_latest", "roundtrip_ok")
      .orderBy("version")
  }

  val all: Seq[Q] = Seq(featureLifecycle).map(_.gated)
}
