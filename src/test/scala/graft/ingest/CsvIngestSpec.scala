package graft.ingest

import graft.SparkSpec
import graft.catalog.ManifestCatalog
import graft.storage.{LakeReader, LakeWriter}

/** Mirrors `dl-datalake/tests/integration/test_01_e2e_ingest.py` +
  * `test_08_idempotency.py` through the CSV path.
  */
class CsvIngestSpec extends SparkSpec {

  private def mk(): (CsvIngest, LakeReader, ManifestCatalog, String) = {
    val root = tmpDir("lake")
    val cat = new ManifestCatalog(spark, root)
    val ing = new CsvIngest(spark, new LakeWriter(spark, root), cat)
    (ing, new LakeReader(spark, root), cat, root)
  }

  test("headered CSV ingests end-to-end with catalog entry (test_01)") {
    val (ing, reader, cat, _) = mk()
    val data = genCandles(60)
    val rep = ing.ingestCsv(writeCsv(data, header = true), "binance", "spot", "BTCUSDT")
    assert(rep.rows == 60 && rep.monotonic)
    assert(reader.readRange("binance", "BTCUSDT", "raw", 0L, Long.MaxValue).count() == 60)
    val entries = cat.listEntries(symbol = Some("BTCUSDT")).collect()
    assert(entries.length == 1)
    assert(entries(0).getAs[Long]("time_from") == data.head.ts)
    assert(entries(0).getAs[Long]("time_to") == data.last.ts)
    assert(entries(0).getAs[String]("checksum").length == 64)
    assert(entries(0).getAs[String]("metadata_json").contains("\"timeframe\": \"1m\""))
  }

  test("tick CSV: open schema preserved, ts required, catalog type=ticks (pipeline.py:85-136)") {
    val (ing, reader, cat, root) = mk()
    // open tick schema: extra columns beyond any candle shape
    val f = java.nio.file.Files.createTempFile("ticks", ".csv")
    val rows = "ts,price,qty,side,venue" +: (0 until 50).map(i =>
      s"${1672531200000L + i * 250L},${100.0 + i},${1 + i % 5},${if (i % 2 == 0) "buy" else "sell"},fix")
    java.nio.file.Files.write(f, rows.mkString("\n").getBytes)
    val rep = ing.ingestTicksCsv(f.toString, "EX", "SPOT", "SYM")
    assert(rep.rows == 50 && rep.monotonic)

    val got = reader.readRange("EX", "SYM", "ticks", 0L, Long.MaxValue)
    assert(got.count() == 50)
    // every extra column round-trips through the lake
    assert(Seq("ts", "price", "qty", "side", "venue").forall(got.columns.contains))
    assert(got.filter(org.apache.spark.sql.functions.col("side") === "buy").count() == 25)

    val entries = cat.listEntries(symbol = Some("SYM")).collect()
    assert(entries.length == 1 && entries(0).getAs[String]("type") == "ticks")
    assert(entries(0).getAs[String]("metadata_json").contains("tick"))

    // ts is mandatory on the open schema
    val bad = java.nio.file.Files.createTempFile("bad", ".csv")
    java.nio.file.Files.write(bad, "time,price\n1,2".getBytes)
    intercept[IllegalArgumentException] {
      ing.ingestTicksCsv(bad.toString, "EX", "SPOT", "SYM2")
    }

    // and the CLI exposes the same path
    graft.cli.Main.run(spark, Array(root, "ingest-ticks", f.toString, "EX", "SPOT", "SYM3"))
    assert(reader.readRange("EX", "SYM3", "ticks", 0L, Long.MaxValue).count() == 50)
  }

  test("headerless 6-column CSV falls back to canonical names (pipeline.py:52-65)") {
    val (ing, reader, _, _) = mk()
    val rep = ing.ingestCsv(writeCsv(genCandles(10), header = false), "EX", "SPOT", "SYM")
    assert(rep.rows == 10)
    val cols = reader.readRange("EX", "SYM", "raw", 0L, Long.MaxValue).columns
    assert(Seq("ts", "open", "high", "low", "close", "volume").forall(cols.contains))
  }

  test("CSV without ts and wrong arity is rejected") {
    val f = java.nio.file.Files.createTempFile("bad", ".csv")
    java.nio.file.Files.write(f, "a,b\n1,2".getBytes)
    val (ing, _, _, _) = mk()
    intercept[IllegalArgumentException](ing.ingestCsv(f.toString, "EX", "S", "SYM"))
  }

  test("re-ingest of the same file is idempotent (test_08)") {
    val (ing, reader, cat, _) = mk()
    val csv = writeCsv(genCandles(30), header = true)
    ing.ingestCsv(csv, "EX", "SPOT", "SYM")
    ing.ingestCsv(csv, "EX", "SPOT", "SYM")
    assert(reader.readRange("EX", "SYM", "raw", 0L, Long.MaxValue).count() == 30)
    assert(cat.listEntries(symbol = Some("SYM")).count() == 1) // upsert-by-path
  }

  test("sha256 matches a known digest") {
    val f = java.nio.file.Files.createTempFile("h", ".txt")
    java.nio.file.Files.write(f, "hello".getBytes)
    val (ing, _, _, _) = mk()
    assert(ing.sha256File(f.toString) ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
  }

  test("misnamed 6-column header renames positionally without eating rows (regression)") {
    val data = genCandles(10)
    val f = java.nio.file.Files.createTempFile("misnamed", ".csv")
    val rows = "timestamp,o,h,l,c,vol" +:
      data.map(c => s"${c.ts},${c.open},${c.high},${c.low},${c.close},${c.volume}")
    java.nio.file.Files.write(f, rows.mkString("\n").getBytes)
    val (ing, reader, _, _) = mk()
    val rep = ing.ingestCsv(f.toString, "EX", "SPOT", "SYM")
    assert(rep.rows == 10, s"expected 10 rows, got ${rep.rows}")
    val got = reader.readRange("EX", "SYM", "raw", 0, Long.MaxValue)
    assert(got.filter(org.apache.spark.sql.functions.col("ts").isNull).count() == 0)
  }

  test("empty-after-header CSV yields a clean zero report, not a crash (regression)") {
    val f = java.nio.file.Files.createTempFile("empty", ".csv")
    java.nio.file.Files.write(f, "ts,open,high,low,close,volume".getBytes)
    val (ing, _, _, _) = mk()
    val rep = ing.ingestCsv(f.toString, "EX", "SPOT", "EMPTYSYM")
    assert(rep.rows == 0 && rep.monotonic)
  }
}
