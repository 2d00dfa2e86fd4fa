package graft.features

import graft.SparkSpec
import graft.catalog.ManifestCatalog

/** Mirrors `dl-datalake/tests/integration/test_04_features.py` +
  * `test_11_versioning.py`.
  */
class FeatureStoreSpec extends SparkSpec {

  private def mk(): (FeatureStore, ManifestCatalog, String) = {
    val root = tmpDir("lake")
    val cat = new ManifestCatalog(spark, root)
    (new FeatureStore(spark, root, cat), cat, root)
  }

  private def tmpFile(content: String): String = {
    val f = java.nio.file.Files.createTempFile("feat", ".bin")
    java.nio.file.Files.write(f, content.getBytes)
    f.toString
  }

  test("upload copies, checksums, registers (manager.py:28-82)") {
    val (store, cat, root) = mk()
    val entry = store.upload(tmpFile("hello"), "alpha_set", "1")
    assert(entry.checksum ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
    assert(entry.path.contains("features/alpha_set/1/"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(entry.path), spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(entry.path)))
    assert(cat.featureEntries().count() == 1)
  }

  test("version listing sorts descending; latest wins (test_11)") {
    val (store, _, _) = mk()
    store.upload(tmpFile("v1"), "alpha_set", "1")
    store.upload(tmpFile("v2"), "alpha_set", "2")
    store.upload(tmpFile("v10"), "alpha_set", "10")
    assert(store.latestVersion("alpha_set").contains("10"))
    val sets = store.listSets().collect()
    assert(sets.length == 1)
    assert(sets(0).getAs[Long]("n_files") == 3L)
  }

  test("download re-verifies checksum; rollback via delete restores prior version") {
    val (store, _, _) = mk()
    store.upload(tmpFile("feature payload v1"), "alpha_set", "1")
    store.upload(tmpFile("feature payload v2 -- different bytes"), "alpha_set", "2")

    // rollback: drop v2, latest falls back to v1 (test_11_versioning)
    assert(store.delete("alpha_set", version = Some("2")) == 1)
    assert(store.latestVersion("alpha_set").contains("1"))

    // download (default = latest) is bit-identical to the original upload
    val dst = java.nio.file.Files.createTempFile("feat-dl", ".bin").toString
    val e = store.download("alpha_set", dst)
    assert(e.version == "1")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dst))) == "feature payload v1")

    // a corrupted stored file is rejected and no partial copy survives
    val stored = new org.apache.hadoop.fs.Path(e.path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(e.path), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(stored, true)
    out.write("tampered bytes".getBytes); out.close()
    val dst2 = java.nio.file.Files.createTempFile("feat-dl2", ".bin").toString
    val ex = intercept[java.io.IOException] { store.download("alpha_set", dst2) }
    assert(ex.getMessage.contains("checksum mismatch"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dst2)),
      "partial/corrupt download left behind")
  }

  test("delete removes files and tombstones entries") {
    val (store, cat, _) = mk()
    val e1 = store.upload(tmpFile("v1"), "alpha_set", "1")
    store.upload(tmpFile("v2"), "alpha_set", "2")
    assert(store.delete("alpha_set", version = Some("1")) == 1)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(e1.path), spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(e1.path)))
    assert(cat.featureEntries().count() == 1)
    assert(store.latestVersion("alpha_set").contains("2"))
  }
}
