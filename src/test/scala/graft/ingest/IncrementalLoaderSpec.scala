package graft.ingest

import graft.SparkSpec
import graft.catalog.ManifestCatalog
import graft.model.Candle
import graft.storage.{LakeReader, LakeWriter}

/** Mock-connector tests mirroring
  * `dl-datalake/tests/ingest/test_exchange_connector.py` +
  * `test_rate_limiting.py`.
  */
class IncrementalLoaderSpec extends SparkSpec {

  private val tfMs = 60000L
  private val t0 = 1672574400000L

  /** Mock venue serving a fixed candle range, optionally rate-limiting. */
  private class MockConn(candles: Seq[Candle],
                         failFirst: Int = 0) extends Connector {
    val name = "mockex"
    var calls = 0
    def fetchOhlcv(symbol: String, tf: String, sinceMs: Long, limit: Int): Seq[Candle] = {
      calls += 1
      if (calls <= failFirst) throw new RateLimitedException("429")
      candles.filter(_.ts >= sinceMs).take(limit)
    }
    def earliestTs(symbol: String, tf: String): Option[Long] = candles.headOption.map(_.ts)
  }

  private def mk(pageSize: Int = 100, flushRows: Int = 250) = {
    val root = tmpDir("lake")
    val cat = new ManifestCatalog(spark, root)
    val writer = new LakeWriter(spark, root)
    val loader = new IncrementalLoader(spark, writer, cat,
      pageSize = pageSize, flushRows = flushRows, sleeper = _ => ())
    (loader, cat, new LakeReader(spark, root))
  }

  test("pages, chunks, flushes; full history lands (T2)") {
    val candles = genCandles(600, startMs = t0)
    val (loader, cat, reader) = mk()
    val rep = loader.download(new MockConn(candles), "spot", "BTCUSDT", "1m",
      endMs = candles.last.ts)
    assert(rep.rows == 600)
    assert(rep.pages == 6)
    assert(rep.flushes >= 2, "must flush in chunks, not one blob")
    assert(reader.readRange("mockex", "BTCUSDT", "raw", 0, Long.MaxValue).count() == 600)
    assert(cat.maxTimeTo("mockex", "BTCUSDT", "raw").contains(candles.last.ts))
  }

  test("resume from catalog watermark — no rows re-fetched from before it (T1)") {
    val candles = genCandles(400, startMs = t0)
    val (loader, cat, reader) = mk()
    val conn1 = new MockConn(candles.take(200))
    loader.download(conn1, "spot", "BTCUSDT", "1m", endMs = candles(199).ts)
    val conn2 = new MockConn(candles)
    loader.download(conn2, "spot", "BTCUSDT", "1m", endMs = candles.last.ts)
    assert(reader.readRange("mockex", "BTCUSDT", "raw", 0, Long.MaxValue).count() == 400)
    // the second run must have started at watermark+1, i.e. its first
    // fetch asked for ts > candles(199).ts
    assert(cat.maxTimeTo("mockex", "BTCUSDT", "raw").contains(candles.last.ts))
  }

  test("rate limit: retries with backoff then succeeds (T5)") {
    val candles = genCandles(100, startMs = t0)
    var sleeps = 0
    val root = tmpDir("lake")
    val cat = new ManifestCatalog(spark, root)
    val loader = new IncrementalLoader(spark, new LakeWriter(spark, root), cat,
      pageSize = 100, flushRows = 1000, sleeper = _ => sleeps += 1)
    val rep = loader.download(new MockConn(candles, failFirst = 3), "spot", "S", "1m",
      endMs = candles.last.ts)
    assert(rep.rows == 100)
    assert(sleeps == 3)
  }

  test("rate limit: gives up after maxRetries (T5)") {
    val candles = genCandles(10, startMs = t0)
    val root = tmpDir("lake")
    val loader = new IncrementalLoader(spark, new LakeWriter(spark, root),
      new ManifestCatalog(spark, root), maxRetries = 2, sleeper = _ => ())
    intercept[RateLimitedException] {
      loader.download(new MockConn(candles, failFirst = 10), "spot", "S", "1m",
        endMs = candles.last.ts)
    }
  }

  test("empty-page gap jump advances since (T4)") {
    // candles exist only in a later window; connector returns empty pages
    // until since reaches them
    val lateStart = t0 + 500L * tfMs
    val candles = genCandles(50, startMs = lateStart)
    val (loader, _, reader) = mk()
    val conn = new MockConn(candles) {
      override def earliestTs(s: String, tf: String): Option[Long] = Some(t0)
    }
    val rep = loader.download(conn, "spot", "S", "1m", endMs = candles.last.ts)
    assert(rep.rows == 50)
    assert(reader.readRange("mockex", "S", "raw", 0, Long.MaxValue).count() == 50)
  }

  test("funding-rate download lands under type=alt with watermark resume (S4/S8)") {
    val rates = (0 until 120).map(i => (t0 + i * 28800000L, 0.0001 * (i % 7), s"""{"i": $i}"""))
    val root = tmpDir("lake")
    val cat = new graft.catalog.ManifestCatalog(spark, root)
    val loader = new IncrementalLoader(spark, new LakeWriter(spark, root), cat,
      pageSize = 50, sleeper = _ => ())
    val conn = new Connector {
      val name = "mockex"
      def fetchOhlcv(s: String, tf: String, since: Long, limit: Int): Seq[graft.model.Candle] = Seq.empty
      def earliestTs(s: String, tf: String): Option[Long] = None
      override def fetchFundingRates(s: String, since: Long, limit: Int): Seq[(Long, Double, String)] =
        rates.filter(_._1 >= since).take(limit)
    }
    val rep = loader.downloadFunding(conn, "perp", "BTCUSDT", endMs = rates.last._1)
    assert(rep.rows == 120)
    val df = new LakeReader(spark, root).readRange("mockex", "BTCUSDT", "alt", 0, Long.MaxValue)
    assert(df.count() == 120)
    assert(df.columns.contains("rate") && df.columns.contains("info_json"))
    assert(cat.maxTimeTo("mockex", "BTCUSDT", "alt").contains(rates.last._1))
    // resume: nothing new -> no rows added
    val rep2 = loader.downloadFunding(conn, "perp", "BTCUSDT", endMs = rates.last._1)
    assert(rep2.rows == 0)
  }

  test("watermarks are scoped per timeframe — 1h history not skipped after 1m (regression)") {
    val candles1m = genCandles(100, startMs = t0, periodMs = 60000L)
    val candles1h = genCandles(50, startMs = t0, periodMs = 3600000L, seed = 9)
    val root = tmpDir("lake")
    val cat = new ManifestCatalog(spark, root)
    val loader = new IncrementalLoader(spark, new LakeWriter(spark, root), cat,
      pageSize = 200, sleeper = _ => ())
    loader.download(new MockConn(candles1m), "spot", "S", "1m", endMs = candles1m.last.ts)
    // the 1m watermark is far past the 1h series' start; 1h must still download fully
    val rep = loader.download(new MockConn(candles1h), "spot", "S", "1h",
      endMs = candles1h.last.ts)
    assert(rep.rows == 50, s"1h history was skipped: ${rep.rows} rows")
  }

  test("off-grid candles between grid points are not skipped (regression)") {
    // a candle at t0+90s sits between the 1m grid points
    val candles = genCandles(5, startMs = t0) :+
      graft.model.Candle(t0 + 90000L, 1, 2, 0, 1, 5.0)
    val sorted = candles.sortBy(_.ts)
    val (loader, _, reader) = mk(pageSize = 3)
    val rep = loader.download(new MockConn(sorted), "spot", "S", "1m",
      endMs = sorted.last.ts)
    assert(rep.rows == 6, s"off-grid candle skipped: ${rep.rows} rows")
    assert(reader.readRange("mockex", "S", "raw", 0, Long.MaxValue).count() == 6)
  }
}
