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

  test("registry tracks a real download: progress per flush, Completed, survived faults") {
    import graft.ingest._
    import graft.ops.{JobRegistry, JobStatus}
    val lake = tmpDir("reglake")
    val candles = genCandles(2500, startMs = 1672531200000L, periodMs = 60000L)
    val fixtures = mkFixtures(candles)
    // q87-style fault venue: a synthetic 429 every 3rd fetch — the loop
    // must back off and retry, and the registry must still end Completed
    val throttled = new java.util.concurrent.atomic.AtomicLong(0)
    val venue: Connector = new Connector {
      val inner = new CsvReplayConnector(fixtures)
      val name = inner.name
      private var calls = 0L
      def fetchOhlcv(s: String, tf: String, since: Long, limit: Int) = {
        calls += 1
        if (calls % 3 == 0) {
          throttled.incrementAndGet()
          throw new RateLimitedException("synthetic 429")
        }
        inner.fetchOhlcv(s, tf, since, limit)
      }
      def earliestTs(s: String, tf: String) = inner.earliestTs(s, tf)
    }
    val registry = new JobRegistry()
    val progressSeen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val loader = new IncrementalLoader(spark, new graft.storage.LakeWriter(spark, lake),
      new ManifestCatalog(spark, lake), pageSize = 500, flushRows = 1000,
      sleeper = _ => progressSeen ++= // snapshot progress at each backoff
        registry.get("csvreplay/spot/BTC_USDT/1m").map(_.progress),
      registry = registry)
    val rep = loader.download(venue, "spot", "BTC_USDT", "1m", endMs = candles.last.ts)

    assert(throttled.get() >= 2, "the fault path never fired")
    assert(rep.rows == 2500 && rep.flushes >= 2)
    val job = registry.get("csvreplay/spot/BTC_USDT/1m").get
    assert(job.state == JobStatus.Completed, s"state ${job.state}")
    assert(job.progress == 2500, s"final progress ${job.progress} != rows ingested")
    // progress was reported DURING the run (a mid-run snapshot below the
    // final count), not only at completion
    assert(progressSeen.exists(_ < 2500), s"no mid-run progress seen: $progressSeen")
  }

  test("registry marks an exhausted fault run Failed") {
    import graft.ingest._
    import graft.ops.{JobRegistry, JobStatus}
    val lake = tmpDir("faillake")
    val venue: Connector = new Connector {
      val name = "deadvenue"
      def fetchOhlcv(s: String, tf: String, since: Long, limit: Int) =
        throw new RateLimitedException("always 429")
      def earliestTs(s: String, tf: String) = Some(0L)
    }
    val registry = new JobRegistry()
    val loader = new IncrementalLoader(spark, new graft.storage.LakeWriter(spark, lake),
      new ManifestCatalog(spark, lake), maxRetries = 2, sleeper = _ => (),
      registry = registry)
    intercept[RateLimitedException] {
      loader.download(venue, "spot", "X", "1m", endMs = 1L)
    }
    val job = registry.get("deadvenue/spot/X/1m").get
    assert(job.state.isInstanceOf[JobStatus.Failed], s"state ${job.state}")
  }

  test("downloadBulk: the registry's per-exchange limit bounds live loops") {
    import graft.ingest._
    import graft.ops.{JobRegistry, JobStatus}
    val lake = tmpDir("bulklake")
    val candles = genCandles(300, startMs = 1672531200000L, periodMs = 60000L)
    val dir = tmpDir("bulkfix")
    Seq("AAA_USD", "BBB_USD", "CCC_USD").foreach { s =>
      Files.copy(Paths.get(writeCsv(candles, header = true)), Paths.get(dir, s"$s.csv"))
    }
    // observe true concurrency through the venue itself
    val live = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxLive = new java.util.concurrent.atomic.AtomicInteger(0)
    val venue: Connector = new Connector {
      val inner = new CsvReplayConnector(dir)
      val name = inner.name
      def fetchOhlcv(s: String, tf: String, since: Long, limit: Int) = {
        val n = live.incrementAndGet()
        maxLive.getAndUpdate(m => math.max(m, n))
        try { Thread.sleep(5); inner.fetchOhlcv(s, tf, since, limit) }
        finally live.decrementAndGet(): Unit
      }
      def earliestTs(s: String, tf: String) = inner.earliestTs(s, tf)
    }
    val registry = new JobRegistry(maxPerGroup = 1)
    val loader = new IncrementalLoader(spark, new graft.storage.LakeWriter(spark, lake),
      new ManifestCatalog(spark, lake), pageSize = 100, flushRows = 10000,
      registry = registry)
    val reps = loader.downloadBulk(venue, "spot",
      Seq("AAA_USD", "BBB_USD", "CCC_USD"), "1m",
      endMs = candles.last.ts, parallelism = 3)
    assert(reps.size == 3 && reps.values.forall(_.rows == 300))
    assert(maxLive.get() == 1,
      s"per-exchange limit 1 but ${maxLive.get()} loops ran concurrently")
    assert(registry.all().size == 3 &&
      registry.all().forall(_.state == JobStatus.Completed))
  }
}
