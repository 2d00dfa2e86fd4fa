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
