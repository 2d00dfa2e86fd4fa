package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors the reference's integration use cases 1/2/8
  * (`dl-datalake/tests/integration/test_01_e2e_ingest.py`,
  * `test_02_storage_integrity.py`, `test_08_idempotency.py`).
  */
class LakeSpec extends SparkSpec {

  test("write → readRange round-trips content, sorted and pruned") {
    val root = tmpDir("lake")
    val writer = new LakeWriter(spark, root)
    val reader = new LakeReader(spark, root)
    val data = genCandles(100)
    val rep = writer.writeOhlc(candleDf(data), SeriesKey("binance", "spot", "BTC/USDT", "raw", "1m"))
    assert(rep.rows == 100 && rep.monotonic)
    assert(rep.timeFrom == data.head.ts && rep.timeTo == data.last.ts)

    val got = reader.readRange("binance", "btc/usdt", "raw", data.head.ts, data.last.ts)
      .select("ts", "open", "high", "low", "close", "volume").collect()
    assert(got.length == 100)
    assert(got.map(_.getLong(0)).toSeq == data.map(_.ts)) // sorted
    assert(got.head.getDouble(1) == data.head.open)
  }

  test("non-UTC session still writes UTC-aligned partitions; boundary rows read back") {
    // Sydney is UTC+11 in January: for ts in [Jan 31 13:00Z, Feb 1 0:00Z)
    // the local calendar already says February, so a tz-sensitive
    // year()/month() derivation would file those rows under month=2 and
    // UTC month pruning would silently miss them.
    val sydney = spark.newSession()
    sydney.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
    val root = tmpDir("lake")
    // hourly candles Jan 31 2023 00:00Z .. Feb 1 2023 23:00Z (48 rows)
    val data = genCandles(48, startMs = 1675123200000L, periodMs = 3600000L)
    import sydney.implicits._
    new LakeWriter(sydney, root).writeOhlc(data.toDF(),
      SeriesKey("EX", "SPOT", "SYM", "raw", "1h"))

    // partition directories are UTC months: Jan holds exactly the 24
    // rows with ts < Feb 1 00:00Z, including the 11 Sydney-February ones
    val reader = new LakeReader(spark, root)
    val jan = spark.read.parquet(root).filter(col("month") === 1)
    assert(jan.count() == 24, "partitions not UTC-aligned")
    // boundary rows survive a pruned January read
    val janRead = reader.readRange("EX", "SYM", "raw",
      1675123200000L, 1675209599999L) // Jan 31 00:00Z .. 23:59:59.999Z
    assert(janRead.count() == 24)
    // and the full range round-trips every row
    assert(reader.readRange("EX", "SYM", "raw", data.head.ts, data.last.ts)
      .count() == 48)
  }

  test("ts range filter + month pruning narrows the scan") {
    val root = tmpDir("lake")
    val writer = new LakeWriter(spark, root)
    val reader = new LakeReader(spark, root)
    // 3 months of daily candles: Jan–Mar 2023
    val data = genCandles(90, startMs = 1672531200000L, periodMs = 86400000L)
    writer.writeOhlc(candleDf(data), SeriesKey("EX", "SPOT", "SYM", "raw", "1d"))

    val feb = reader.readRange("EX", "SYM", "raw",
      1675209600000L, 1677628799999L) // Feb 1 .. Feb 28 23:59:59.999
    assert(feb.count() == 28)
    // month-pruning predicate reaches the physical plan
    val plan = feb.queryExecution.executedPlan.toString
    assert(plan.contains("month"), s"no month predicate in plan:\n$plan")
  }

  test("upsert keeps last for overlapping ts (keep-last, writer.py:82-92)") {
    val root = tmpDir("lake")
    val writer = new LakeWriter(spark, root)
    val reader = new LakeReader(spark, root)
    val key = SeriesKey("EX", "SPOT", "SYM", "raw", "1m")
    val batch1 = genCandles(50)
    writer.writeOhlc(candleDf(batch1), key)
    // second batch overlaps last 10, revised values, and extends 10 more
    val batch2 = genCandles(20, startMs = batch1(40).ts, seed = 7)
      .map(c => c.copy(volume = 99999.0))
    val rep = writer.writeOhlc(candleDf(batch2), key)
    assert(rep.rows == 60, s"expected 50+20-10 overlapping = 60, got ${rep.rows}")
    val overlap = reader.readRange("EX", "SYM", "raw", batch1(40).ts, batch1(49).ts)
      .select("volume").collect().map(_.getDouble(0))
    assert(overlap.forall(_ == 99999.0), "revised rows must win")
  }

  test("idempotent re-ingest: same batch twice ⇒ no duplicate rows (test_08)") {
    val root = tmpDir("lake")
    val writer = new LakeWriter(spark, root)
    val key = SeriesKey("EX", "SPOT", "SYM", "raw", "1m")
    val data = candleDf(genCandles(30))
    val r1 = writer.writeOhlc(data, key)
    val r2 = writer.writeOhlc(data, key)
    assert(r1.rows == 30 && r2.rows == 30 && r2.monotonic)
  }

  test("month-boundary batch splits into two partitions (test_02 analog)") {
    val root = tmpDir("lake")
    val writer = new LakeWriter(spark, root)
    // 20 hourly candles from Jan 31 2023 14:00 → spans Jan 31/Feb 1
    val data = genCandles(20, startMs = 1675173600000L, periodMs = 3600000L)
    val rep = writer.writeOhlc(candleDf(data), SeriesKey("EX", "SPOT", "SYM", "raw", "1h"))
    assert(rep.partitions == 2, s"expected Jan+Feb partitions, got ${rep.partitions}")
    val df = spark.read.parquet(root)
    assert(df.select("month").distinct().count() == 2)
    assert(df.count() == 20)
  }

  test("schema evolution: new column unions as null on old rows (test_07)") {
    val root = tmpDir("lake")
    val writer = new LakeWriter(spark, root)
    val reader = new LakeReader(spark, root)
    val key = SeriesKey("EX", "SPOT", "SYM", "raw", "1m")
    writer.writeOhlc(candleDf(genCandles(10)), key)
    val extended = candleDf(genCandles(10, startMs = 1672574400000L + 10 * 60000L))
      .withColumn("trades", lit(7L))
    writer.writeOhlc(extended, key)
    val all = reader.readRange("EX", "SYM", "raw", 0L, Long.MaxValue, mergeSchema = true)
    assert(all.count() == 20)
    assert(all.columns.contains("trades"))
    assert(all.filter(col("trades").isNull).count() == 10)
  }

  test("pagination is stable (S10/O2)") {
    val root = tmpDir("lake")
    val writer = new LakeWriter(spark, root)
    val reader = new LakeReader(spark, root)
    val data = genCandles(50)
    writer.writeOhlc(candleDf(data), SeriesKey("EX", "SPOT", "SYM", "raw", "1m"))
    val base = reader.readRange("EX", "SYM", "raw", 0L, Long.MaxValue)
    val page2 = reader.page(base, 10, 10).select("ts").collect().map(_.getLong(0))
    assert(page2.toSeq == data.slice(10, 20).map(_.ts))
  }

  test("series dir holding only writer debris reads as first write, not a wedge") {
    // a writer killed mid-flush (the q81 forked-child crash shape)
    // leaves the series directory existing but without one readable
    // parquet footer; the next merge-write must treat that as an empty
    // series instead of failing on schema inference forever
    val root = tmpDir("lake-debris")
    val key = SeriesKey("EX", "M", "SYM", "raw", "1m")
    val debris = java.nio.file.Paths.get(
      LakeIO.seriesDir(root, key.sanitized), "year=2023", "month=1", "_temporary")
    java.nio.file.Files.createDirectories(debris)
    java.nio.file.Files.write(debris.resolve("task-0.snappy.parquet.staging"),
      Array[Byte](1, 2, 3))

    val data = genCandles(20)
    val rep = new LakeWriter(spark, root).writeOhlc(candleDf(data), key)
    assert(rep.rows == 20 && rep.monotonic, s"merge-write must recover: $rep")
    val got = new LakeReader(spark, root)
      .readRange("EX", "SYM", "raw", data.head.ts, data.last.ts).count()
    assert(got == 20)
  }
}
