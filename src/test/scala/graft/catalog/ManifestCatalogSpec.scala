package graft.catalog

import graft.SparkSpec
import graft.model.ManifestEntry

/** Mirrors `dl-datalake/tests/metadata/test_manifest.py` +
  * `tests/integration/test_03_metadata.py` semantics.
  */
class ManifestCatalogSpec extends SparkSpec {

  private def entry(path: String, sym: String = "BTCUSDT", typ: String = "raw",
                    from: Long = 1000L, to: Long = 2000L, version: String = "1",
                    created: Long = 1L): ManifestEntry =
    ManifestEntry("binance", "spot", sym, path, typ, from, to, version,
      "abc", created, "", "{}")

  test("add + list round-trip with case normalization (manifest.py:77-83)") {
    val cat = new ManifestCatalog(spark, tmpDir("cat"))
    cat.addEntry(entry("p1"))
    val rows = cat.listEntries().collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("exchange") == "BINANCE")
    assert(rows(0).getAs[String]("symbol") == "BTCUSDT")
    // filters are case-insensitive too
    assert(cat.listEntries(exchange = Some("Binance"), symbol = Some("btcusdt")).count() == 1)
    assert(cat.listEntries(exchange = Some("kraken")).count() == 0)
  }

  test("upsert-by-path: re-adding a path replaces the entry (manifest.py:63-99)") {
    val cat = new ManifestCatalog(spark, tmpDir("cat"))
    cat.addEntry(entry("p1", to = 2000L))
    cat.addEntry(entry("p1", to = 5000L))
    val rows = cat.listEntries().collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("time_to") == 5000L)
  }

  test("same path twice in ONE batch: deterministic last-wins (no _seq tie)") {
    val cat = new ManifestCatalog(spark, tmpDir("cat"))
    cat.addEntries(Seq(entry("p1", to = 2000L), entry("p2", to = 100L),
      entry("p1", to = 7000L)))
    val rows = cat.listEntries().collect()
    assert(rows.length == 2)
    assert(rows.find(_.getAs[String]("path") == "p1").get.getAs[Long]("time_to") == 7000L,
      "later batch entry for the same path must win deterministically")
  }

  test("maxTimeTo watermark (A4/T1)") {
    val cat = new ManifestCatalog(spark, tmpDir("cat"))
    cat.addEntries(Seq(entry("p1", to = 2000L), entry("p2", to = 9000L), entry("p3", to = 500L)))
    assert(cat.maxTimeTo("binance", "BTCUSDT", "raw").contains(9000L))
    assert(cat.maxTimeTo("binance", "ETHUSDT", "raw").isEmpty)
  }

  test("delete tombstones entries") {
    val cat = new ManifestCatalog(spark, tmpDir("cat"))
    cat.addEntries(Seq(entry("p1"), entry("p2", sym = "ETHUSDT")))
    assert(cat.deleteEntries(symbol = Some("btcusdt")) == 1)
    val left = cat.listEntries().collect()
    assert(left.length == 1 && left(0).getAs[String]("symbol") == "ETHUSDT")
  }

  test("latestVersion picks numeric-descending (manifest.py:101-111)") {
    val cat = new ManifestCatalog(spark, tmpDir("cat"))
    cat.addEntries(Seq(
      entry("f1", typ = "alpha_set", version = "2"),
      entry("f2", typ = "alpha_set", version = "10"),
      entry("f3", typ = "alpha_set", version = "9")))
    assert(cat.latestVersion("alpha_set").contains("10"))
    assert(cat.latestVersion("nope").isEmpty)
  }

  test("featureEntries excludes builtin types (P6)") {
    val cat = new ManifestCatalog(spark, tmpDir("cat"))
    cat.addEntries(Seq(entry("p1", typ = "raw"), entry("p2", typ = "agg"),
      entry("p3", typ = "my_features")))
    val feats = cat.featureEntries().collect()
    assert(feats.length == 1 && feats(0).getAs[String]("type") == "my_features")
  }

  test("compact preserves snapshot and shrinks the log") {
    val root = tmpDir("cat")
    val cat = new ManifestCatalog(spark, root)
    (1 to 10).foreach(i => cat.addEntry(entry(s"p$i", to = i * 100L)))
    cat.addEntry(entry("p1", to = 42L)) // upsert
    cat.deleteEntries(path = Some("p2"))
    val before = cat.listEntries().collect().map(r =>
      (r.getAs[String]("path"), r.getAs[Long]("time_to"))).toSet
    cat.compact()
    val after = cat.listEntries().collect().map(r =>
      (r.getAs[String]("path"), r.getAs[Long]("time_to"))).toSet
    assert(before == after)
    assert(before.size == 9 && before.contains(("p1", 42L)))
    // still writable after compaction
    cat.addEntry(entry("p99"))
    assert(cat.listEntries().count() == 10)
  }

  test("asOf time travel: every published seq replays the exact snapshot of its instant") {
    val cat = new ManifestCatalog(spark, tmpDir("cat"))
    cat.addEntry(entry("p1", version = "1")) // seq 1
    cat.addEntry(entry("p1", version = "2")) // seq 2 (upsert)
    cat.addEntry(entry("p2", version = "1")) // seq 3
    cat.deleteEntries(path = Some("p1"))     // seq 4 (tombstone)
    assert(cat.currentSeq() == 4L)
    def view(seq: Long) = cat.asOf(seq).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[String]("version")).toMap
    assert(view(1) == Map("p1" -> "1"))
    assert(view(2) == Map("p1" -> "2"))
    assert(view(3) == Map("p1" -> "2", "p2" -> "1"))
    assert(view(4) == Map("p2" -> "1"))
    // the current snapshot IS asOf(currentSeq)
    assert(cat.snapshot().collect().map(_.getAs[String]("path")).toSet ==
      cat.asOf(cat.currentSeq()).collect().map(_.getAs[String]("path")).toSet)
  }

  test("a pinned asOf read is stable while concurrent writers append") {
    val root = tmpDir("cat")
    val cat = new ManifestCatalog(spark, root)
    (1 to 5).foreach(i => cat.addEntry(entry(s"p$i", to = i * 100L)))
    val pin = cat.currentSeq()
    def pinnedView() = cat.asOf(pin).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("time_to"), r.getAs[String]("version")))
      .toSet
    val baseline = pinnedView()
    // a racing writer appends upserts OVER the pinned paths + new paths
    val writer = new Thread(() => (1 to 8).foreach { i =>
      new ManifestCatalog(spark, root).addEntry(entry(s"p${i % 5 + 1}", to = 9999L, version = "99"))
    })
    writer.start()
    // every read at the pin, mid-race and after it, is identical
    val midRace = (1 to 4).map(_ => pinnedView())
    writer.join()
    val afterRace = pinnedView()
    assert((midRace :+ afterRace).forall(_ == baseline),
      "pinned asOf read changed under concurrent appends")
    // the un-pinned snapshot DID move — the pin is what isolated us
    assert(cat.snapshot().filter(org.apache.spark.sql.functions.col("version") === "99").count() > 0)
    // an audit-style query runs at the pin: which catalog paths vanished since?
    val vanished = cat.asOf(pin).select("path").except(cat.snapshot().select("path")).count()
    assert(vanished == 0L) // appends only upserted — nothing vanished
  }
}
