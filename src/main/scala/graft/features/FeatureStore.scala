package graft.features

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.ManifestCatalog
import graft.model.ManifestEntry
import java.security.MessageDigest

/** Versioned feature store (SURVEY §7.1 #7) — the Spark form of
  * `dl-datalake/src/dl_datalake/features/manager.py:23-82`: arbitrary
  * files registered under `features/{set}/{version}/` with a SHA-256
  * checksum and a manifest row whose `type` is the set name (feature
  * detection = type NOT IN builtins, SURVEY P6).
  */
final class FeatureStore(spark: SparkSession, root: String, catalog: ManifestCatalog) {

  private def fs(uri: String) = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(uri), spark.sparkContext.hadoopConfiguration)

  /** Copy + register (`manager.py:28-82`). Hadoop-FS streaming copy with
    * an in-flight SHA-256 — one pass, constant memory, works for >2 GB.
    */
  def upload(srcPath: String, featureSet: String, version: String,
             exchange: String = "", market: String = "", symbol: String = "",
             metadataJson: String = "{}"): ManifestEntry = {
    val src = new org.apache.hadoop.fs.Path(
      if (srcPath.contains(":/")) srcPath else s"file:$srcPath")
    val dstDir = s"$root/features/$featureSet/$version"
    val dst = new org.apache.hadoop.fs.Path(s"$dstDir/${src.getName}")
    val sfs = fs(src.toString); val dfs = fs(dstDir)
    dfs.mkdirs(new org.apache.hadoop.fs.Path(dstDir))
    val md = MessageDigest.getInstance("SHA-256")
    val in = sfs.open(src)
    val out = dfs.create(dst, true)
    try {
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { md.update(buf, 0, n); out.write(buf, 0, n); n = in.read(buf) }
    } finally { in.close(); out.close() }
    val entry = ManifestEntry(
      exchange = exchange, market = market, symbol = symbol,
      path = dst.toString, `type` = featureSet,
      time_from = 0L, time_to = 0L, version = version,
      checksum = md.digest().map("%02x".format(_)).mkString,
      created_at = System.currentTimeMillis(), script_git_hash = "",
      metadata_json = metadataJson)
    catalog.addEntry(entry)
    entry
  }

  /** Feature-sets view (SURVEY A8, `api_server.py:150-208`): one row per
    * set with version list sorted descending.
    */
  def listSets(): DataFrame =
    catalog.featureEntries()
      .groupBy(col("type").as("feature_set"))
      .agg(
        first("exchange").as("exchange"),
        first("market").as("market"),
        first("symbol").as("symbol"),
        sort_array(collect_set(col("version")), asc = false).as("versions"),
        count(lit(1)).as("n_files"))
      .orderBy("feature_set")

  def latestVersion(featureSet: String): Option[String] =
    catalog.latestVersion(featureSet)

  /** Copy a registered feature file back out, re-computing SHA-256 in
    * flight and REJECTING the download (partial file removed, exception
    * thrown) if it does not match the checksum recorded at upload —
    * the read side of the reference's integrity contract
    * (`client/api_server.py:316-344`, `client/dl_client.py:73`).
    * Default version = latest. Returns the verified manifest entry.
    */
  def download(featureSet: String, dstPath: String,
               version: Option[String] = None): ManifestEntry = {
    val v = version.orElse(latestVersion(featureSet)).getOrElse(
      throw new NoSuchElementException(s"no versions of feature set '$featureSet'"))
    val row = catalog.featureEntries()
      .filter(col("type") === featureSet && col("version") === v)
      .collect().headOption.getOrElse(
        throw new NoSuchElementException(s"feature set '$featureSet' v$v not found"))
    val srcStr = row.getAs[String]("path")
    val expected = row.getAs[String]("checksum")
    val src = new org.apache.hadoop.fs.Path(srcStr)
    val dst = new org.apache.hadoop.fs.Path(
      if (dstPath.contains(":/")) dstPath else s"file:$dstPath")
    val sfs = fs(src.toString); val dfs = fs(dst.toString)
    val md = MessageDigest.getInstance("SHA-256")
    val in = sfs.open(src)
    // never leave a partial file behind: a copy that dies mid-stream
    // must clean up exactly like a checksum mismatch does
    var copied = false
    try {
      val out = dfs.create(dst, true)
      try {
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n > 0) { md.update(buf, 0, n); out.write(buf, 0, n); n = in.read(buf) }
        copied = true
      } finally {
        try out.close() finally { if (!copied) dfs.delete(dst, false) }
      }
    } finally in.close()
    val actual = md.digest().map("%02x".format(_)).mkString
    if (actual != expected) {
      dfs.delete(dst, false) // never leave a corrupt copy behind
      throw new java.io.IOException(
        s"checksum mismatch for $featureSet v$v: stored $expected, read $actual")
    }
    ManifestEntry(row.getAs[String]("exchange"), row.getAs[String]("market"),
      row.getAs[String]("symbol"), srcStr, featureSet,
      row.getAs[Long]("time_from"), row.getAs[Long]("time_to"), v, expected,
      row.getAs[Long]("created_at"), row.getAs[String]("script_git_hash"),
      row.getAs[String]("metadata_json"))
  }

  def delete(featureSet: String, version: Option[String] = None): Long = {
    val victims = catalog.featureEntries().filter(col("type") === featureSet)
    val scoped = version.map(v => victims.filter(col("version") === v)).getOrElse(victims)
    val paths = scoped.select("path").collect().map(_.getString(0))
    paths.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      fs(p).delete(hp, false)
    }
    paths.map(p => catalog.deleteEntries(path = Some(p))).sum
  }
}
