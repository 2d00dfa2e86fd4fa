package graft.storage

import java.nio.file.{Files, Path, Paths}

/** Cross-process mutual exclusion for one series' read-merge-overwrite
  * critical sections (SURVEY §7.4: the maintenance-concurrency seam the
  * reference leaves to Prefect scheduling discipline —
  * `dl-datalake/src/dl_datalake/orchestration/flows.py:127-130` never
  * runs maintenance at all, so the reference cannot lose this race; an
  * engine that DOES compact under continuous ingest must serialize).
  *
  * Why a lease and not optimistic concurrency: both the merge-write
  * ([[LakeWriter.writeOhlc]]) and the compactor
  * ([[LakeMaintenance.compactSeries]]) are read-modify-OVERWRITE of the
  * same month directories, and dynamic partition overwrite has no
  * compare-and-swap — a validate-then-commit scheme would still leave
  * the commit window, and a failed validation can only retry the whole
  * (expensive) rewrite. A per-series lease makes the winner explicit
  * BEFORE the work happens; writers on different series never contend
  * (disjoint lease files — the q81 concurrency model is unchanged).
  *
  * Mechanics: one `<root>/_locks/<sha256(seriesDir)>.lease` file per
  * series, acquired by atomic create-exclusive (`Files.createFile`,
  * O_EXCL — the same primitive as the catalog's ClaimRenamePublish) and
  * released by delete. The `_locks` directory is underscore-prefixed,
  * so Spark's partition discovery never sees it. A lease whose mtime is
  * older than `staleMs` is presumed orphaned by a crashed holder and is
  * stolen (delete + re-create; two stealers race the create, exactly
  * one wins). `staleMs` must exceed any legitimate critical section —
  * default 10 min vs seconds-scale flushes/compactions.
  *
  * Scope: local/NFS/HDFS-style filesystems with atomic exclusive
  * create. An object-store deployment (S3 has no O_EXCL) would swap
  * this object for a conditional-put or external lock service behind
  * the same `withLease` seam.
  */
object SeriesLease {

  private def leaseFile(root: String, k: SeriesKey): Path = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(LakeIO.seriesDir(root, k).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Paths.get(stripScheme(root), "_locks", s"$digest.lease")
  }

  private def stripScheme(root: String): String =
    if (root.startsWith("file:")) root.stripPrefix("file:") else root

  /** Run `f` holding the series' lease. Blocks (50 ms poll) until the
    * lease is free, a stale one is stolen, or `timeoutMs` elapses.
    */
  def withLease[T](root: String, key: SeriesKey,
                   staleMs: Long = 600000L, timeoutMs: Long = 300000L)(f: => T): T = {
    val k = key.sanitized
    val lease = leaseFile(root, k)
    Files.createDirectories(lease.getParent)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var acquired = false
    while (!acquired) {
      try {
        Files.write(lease,
          s"pid=${ProcessHandle.current().pid()}\n".getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // stale-holder recovery: mtime is refreshed only at acquire,
          // so a holder alive longer than staleMs loses protection —
          // size staleMs to dominate the longest critical section
          val stale =
            try Files.getLastModifiedTime(lease).toMillis < System.currentTimeMillis() - staleMs
            catch { case _: java.io.IOException => false } // vanished: retry create
          if (stale) {
            try Files.deleteIfExists(lease)
            catch { case _: java.io.IOException => () } // loser of a steal race
          } else if (System.nanoTime() > deadline) {
            throw new java.util.concurrent.TimeoutException(
              s"series lease for ${k.exchange}/${k.market}/${k.symbol}/" +
                s"${k.`type`}/${k.period} not acquired within ${timeoutMs} ms ($lease)")
          } else Thread.sleep(50)
      }
    }
    try f
    finally {
      try Files.deleteIfExists(lease): Unit
      catch { case _: java.io.IOException => () }
    }
  }
}
