package graft.cli

import graft.SparkSpec
import graft.catalog.ManifestCatalog
import graft.storage.LakeReader
import java.nio.file.{Files, Paths}

/** End-to-end CLI download path over the fixture connector, mirroring
  * the reference's connector integration tests
  * (`dl-datalake/tests/ingest/test_exchange_connector.py:30-192`) and
  * `cli.py:24-80` command semantics: CLI → IncrementalLoader → lake →
  * catalog → pruned read-back.
  */
class CliDownloadSpec extends SparkSpec {

  private def mkFixtures(candles: Seq[graft.model.Candle]): String = {
    val dir = tmpDir("fixtures")
    Files.copy(Paths.get(writeCsv(candles, header = true)),
      Paths.get(dir, "BTC_USDT.csv"))
    val funding = (0 until 10)
      .map(i => s"""${candles.head.ts + i * 28800000L},0.0001,{"venue":"fixture"}""")
    Files.write(Paths.get(dir, "BTC_USDT.funding.csv"),
      ("ts,rate,info_json" +: funding).mkString("\n").getBytes)
    dir
  }

  test("download-history: CLI → loader → lake → catalog → readRange round-trip") {
    val lake = tmpDir("clilake")
    // 2500 1m candles: forces multiple 1000-row pages through the loop
    val candles = genCandles(2500, startMs = 1672531200000L, periodMs = 60000L)
    val fixtures = mkFixtures(candles)

    Main.run(spark, Array(lake, "download-history", fixtures,
      "BTC/USDT", "spot", "1m", "all", "funding"))

    val reader = new LakeReader(spark, lake)
    val got = reader.readRange("csvreplay", "BTC/USDT", "raw", 0L, Long.MaxValue)
      .select("ts").collect().map(_.getLong(0))
    assert(got.length == 2500 && got.toSeq == candles.map(_.ts), "candle round-trip")
    assert(reader.readRange("csvreplay", "BTC/USDT", "alt", 0L, Long.MaxValue,
      mergeSchema = true).count() == 10, "funding rows under type=alt")

    // catalog watermark advanced to the last candle
    val catalog = new ManifestCatalog(spark, lake)
    assert(catalog.maxTimeTo("csvreplay", "BTC/USDT", "raw",
      market = Some("spot"), timeframe = Some("1m")).contains(candles.last.ts))

    // second run resumes from the watermark: no duplicates, same count
    Main.run(spark, Array(lake, "download-history", fixtures,
      "BTC/USDT", "spot", "1m", "all"))
    assert(reader.readRange("csvreplay", "BTC/USDT", "raw", 0L, Long.MaxValue)
      .count() == 2500, "watermark resume re-ingested rows")
  }

  test("download-history days-back start skips fixtures older than the window") {
    val lake = tmpDir("clilake")
    val fixtures = mkFixtures(genCandles(100, startMs = 1672531200000L))
    // 1-day window from "now" (2026): the 2023 fixture is out of range
    Main.run(spark, Array(lake, "download-history", fixtures,
      "BTC/USDT", "spot", "1m", "1"))
    assert(new ManifestCatalog(spark, lake).maxTimeTo("csvreplay", "BTC/USDT", "raw",
      market = Some("spot"), timeframe = Some("1m")).isEmpty, "nothing should ingest")
  }

  test("download-symbols lists fixture symbols") {
    val fixtures = mkFixtures(genCandles(10))
    val conn = new graft.ingest.CsvReplayConnector(fixtures)
    assert(conn.listSymbols("spot") == Seq("BTC_USDT")) // funding file excluded
    val lake = tmpDir("clilake")
    Main.run(spark, Array(lake, "download-symbols", fixtures)) // prints, must not throw
  }
}
