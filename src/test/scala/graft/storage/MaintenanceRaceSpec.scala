package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction racing a live writer IN-PROCESS (the q84 gate forces the
  * cross-JVM form; this spec grinds many more interleavings cheaply):
  * one thread merge-writes disjoint batches into a series while another
  * loops `compactSeries(maxFiles = 0)` (forced full-rewrite — maximal
  * conflict). With the per-series lease every batch must survive every
  * interleaving; without it the compactor's stale-snapshot overwrite
  * erases concurrent flushes (the lost-update race).
  */
class MaintenanceRaceSpec extends SparkSpec {

  test("compactSeries racing concurrent merge-writes loses no rows") {
    val root = tmpDir("racelake")
    val key = SeriesKey("EX", "SPOT", "RACE", "raw", "1m")
    val writer = new LakeWriter(spark, root)
    val maint = new LakeMaintenance(spark, root)

    // 12 batches x 50 rows, spread over four months (Jan-Apr 2023) so
    // every compaction pass rewrites several directories
    val t0 = 1672531200000L
    val batches = (0 until 12).map { b =>
      genCandles(50, startMs = t0 + b.toLong * 50 * 7200000L, periodMs = 7200000L)
    }

    @volatile var writerErr: Option[Throwable] = None
    @volatile var compactErr: Option[Throwable] = None
    @volatile var writing = true
    var rewrites = 0L
    val w = new Thread(() => {
      try batches.foreach(b => writer.writeOhlc(candleDf(b), key))
      catch { case e: Throwable => writerErr = Some(e) }
      finally writing = false
    }, "race-writer")
    val c = new Thread(() => {
      try while (writing) { rewrites += maint.compactSeries(key, maxFiles = 0); Thread.sleep(20) }
      catch { case e: Throwable => compactErr = Some(e) }
    }, "race-compactor")
    w.start(); c.start()
    w.join(300000); c.join(300000)
    assert(writerErr.isEmpty, s"writer thread failed: $writerErr")
    assert(compactErr.isEmpty, s"compactor thread failed: $compactErr")
    assert(rewrites >= 1, "the race never happened — no compaction pass overlapped the writer")

    // every row of every batch survived, exactly once
    val got = LakeIO.readSeriesScoped(spark, root, key).get
      .select(col("ts"), col("close")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = batches.flatten.map(cn => cn.ts -> cn.close).toMap
    assert(got.size == want.size,
      s"row count ${got.size} != expected ${want.size} — the race lost or resurrected rows")
    assert(got == want, "row contents diverged under the race")

    // and the post-race compact state is canonical: one file per month
    maint.compactSeries(key, maxFiles = 1)
    val dataFiles = graft.core.PathWalk.walk(java.nio.file.Paths.get(root))(_.count { p =>
      p.toString.contains("symbol=RACE") && p.toString.endsWith(".parquet")
    }.toLong)
    val monthDirs = graft.core.PathWalk.walk(java.nio.file.Paths.get(root))(_.count { p =>
      p.toString.contains("symbol=RACE") && java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("month=")
    }.toLong)
    assert(monthDirs >= 2, s"fixture should span several months, got $monthDirs")
    assert(dataFiles == monthDirs, s"$dataFiles files over $monthDirs months after compaction")
  }

  test("series lease: exclusive, contended, stale-steal") {
    val root = tmpDir("leaselake")
    val key = SeriesKey("EX", "SPOT", "L", "raw", "1m")
    // exclusivity: a critical section under the lease never overlaps
    val overlaps = new java.util.concurrent.atomic.AtomicInteger(0)
    val inside = new java.util.concurrent.atomic.AtomicBoolean(false)
    val threads = (0 until 8).map(i => new Thread(() =>
      (0 until 25).foreach { _ =>
        SeriesLease.withLease(root, key) {
          if (!inside.compareAndSet(false, true)) overlaps.incrementAndGet()
          Thread.sleep(1)
          inside.set(false)
        }
      }, s"lease-$i"))
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(overlaps.get() == 0, s"${overlaps.get()} overlapping critical sections")

    // stale-steal: an orphaned lease older than staleMs is taken over
    val k = key.sanitized
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(LakeIO.seriesDir(root, k).getBytes("UTF-8")).map("%02x".format(_)).mkString
    val lease = java.nio.file.Paths.get(root, "_locks", s"$digest.lease")
    java.nio.file.Files.createDirectories(lease.getParent)
    java.nio.file.Files.write(lease, "pid=0\n".getBytes)
    java.nio.file.Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600000L))
    var ran = false
    SeriesLease.withLease(root, key, staleMs = 60000L, timeoutMs = 5000L) { ran = true }
    assert(ran, "stale lease was not stolen")
    assert(!java.nio.file.Files.exists(lease), "lease not released")
  }

  test("series lease: heartbeat keeps a slow LIVE holder protected") {
    val root = tmpDir("leasehb")
    val key = SeriesKey("EX", "SPOT", "HB", "raw", "1m")
    // holder's critical section (1 s) far exceeds staleMs (200 ms) —
    // before the heartbeat this is exactly the silent-steal window:
    // the contender would presume the holder dead and take the lease
    @volatile var contenderGotIn = false
    SeriesLease.withLease(root, key, staleMs = 200L, timeoutMs = 60000L) {
      val contender = new Thread(() =>
        try {
          SeriesLease.withLease(root, key, staleMs = 200L, timeoutMs = 700L) {
            contenderGotIn = true
          }
        } catch { case _: java.util.concurrent.TimeoutException => () })
      contender.start()
      Thread.sleep(1000) // outlive staleMs 5x while the heartbeat runs
      contender.join(5000)
    }
    assert(!contenderGotIn,
      "a live holder outliving staleMs lost its lease — heartbeat not refreshing")
  }

  test("series lease: a stolen lease is detected, never deleted out from under the thief") {
    val root = tmpDir("leasesteal")
    val key = SeriesKey("EX", "SPOT", "ST", "raw", "1m")
    val k = key.sanitized
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(LakeIO.seriesDir(root, k).getBytes("UTF-8")).map("%02x".format(_)).mkString
    val lease = java.nio.file.Paths.get(root, "_locks", s"$digest.lease")

    val usurperToken = "pid=999999;nonce=usurper\n"
    var detected = false
    try {
      SeriesLease.withLeaseHandle(root, key, staleMs = 60000L, timeoutMs = 5000L) { h =>
        h.assertOwned() // sanity: freshly acquired
        // simulate the steal a clock-skewed/operator-forced contender
        // performs: delete + re-create with ITS token
        java.nio.file.Files.write(lease, usurperToken.getBytes("UTF-8"))
        try { h.assertOwned(); fail("assertOwned must throw after a steal") }
        catch { case _: SeriesLease.StolenLeaseException => detected = true }
      }
    } catch { case _: SeriesLease.StolenLeaseException => () }
    assert(detected, "the holder never detected the steal")
    // ABA safety: release must NOT have deleted the usurper's lease
    assert(java.nio.file.Files.exists(lease),
      "release deleted the new owner's lease (lock-file ABA)")
    assert(new String(java.nio.file.Files.readAllBytes(lease), "UTF-8") == usurperToken,
      "release mangled the new owner's lease")
    java.nio.file.Files.delete(lease)
  }

  test("series lease: non-POSIX scheme is rejected, not mis-resolved") {
    val key = SeriesKey("EX", "SPOT", "S", "raw", "1m")
    intercept[UnsupportedOperationException] {
      SeriesLease.withLease("hdfs://nn:8020/lake", key) { () }
    }
  }
}
