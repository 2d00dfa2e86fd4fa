package graft.catalog

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.model.ManifestEntry

/** The catalog at METADATA scale (r9-verdict task 7): after ~10^4
  * commits the append-only log is a 10^4-small-files scan — the same
  * disease `compact()` cures for the data lake, at the catalog layer.
  * This spec builds a 10,000-segment log (a prefix of real commits with
  * overwrites + tombstones for semantic variety, padded to 10^4 with
  * hard-linked single-entry upsert segments — each link IS a valid
  * commit of the pad path at its filename seq), then proves:
  *
  *  - `compact()` bounds the log at ONE base segment (file-count
  *    evidence, not a latency vibe);
  *  - `listEntries`/`asOf` read latency drops to the small-catalog
  *    regime after compaction (measured, both printed for BASELINE);
  *  - a pinned `asOf` replays IDENTICALLY across the compaction for
  *    pins whose history compaction preserves (every pre-pin path's
  *    LATEST row is ≤ pin — the documented Delta-VACUUM caveat:
  *    compaction keeps latest-per-path, not full history);
  *  - `snapshot()` is byte-identical before/after.
  */
class CatalogScaleSpec extends SparkSpec {

  private val Commits = 10000

  private def entry(path: String, version: String = "1",
                    to: Long = 2000L): ManifestEntry =
    ManifestEntry("ex", "spot", "S", path, "raw", 1000L, to, version,
      "c", 1L, "", "{}")

  private def sorted(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.mkString("|")).toSeq.sorted

  test(s"$Commits-commit log: compact() bounds files and keeps reads flat; pinned asOf survives") {
    val root = tmpDir("catscale")
    val cat = new ManifestCatalog(spark, root)
    val logDir = s"$root/_manifest/log"

    // -- phase 1: real commit prefix with overwrites + tombstones
    (1 to 20).foreach(i => cat.addEntry(entry(s"p$i")))
    (1 to 10).foreach(i => cat.addEntry(entry(s"p$i", version = "2", to = 3000L)))
    cat.deleteEntries(path = Some("p19"))
    cat.deleteEntries(path = Some("p20"))
    // every surviving path's LATEST row is now ≤ pin, so this pin's
    // replay is compaction-invariant by the documented contract
    val pin = cat.currentSeq()
    val pinnedBefore = sorted(cat.asOf(pin).collect())
    assert(pinnedBefore.size == 18, "p1..p18 live, p19/p20 tombstoned")

    // -- phase 2: pad to 10^4 segments with hard-linked upsert commits
    // of one pad path (content-identical single-entry batches; _seq is
    // filename-derived, so each link is a real later upsert of PAD)
    cat.addEntry(entry("PAD"))
    val template = Paths.get(logDir, f"${pin + 1}%020d.parquet")
    assert(Files.exists(template))
    ((pin + 2) to Commits.toLong).foreach { seq =>
      Files.createLink(Paths.get(logDir, f"$seq%020d.parquet"), template)
    }
    assert(graft.core.PathWalk.list(Paths.get(logDir))(_.size.toLong) == Commits)
    assert(cat.currentSeq() == Commits)

    def timed[T](f: => T): (T, Long) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1000000L)
    }

    val (snapBefore, tListBefore) = timed(sorted(cat.listEntries().collect()))
    val (_, tAsOfBefore) = timed(cat.asOf(pin).count())
    assert(snapBefore.size == 19, "p1..p18 + PAD")

    // -- phase 3: compact, then prove the three properties
    cat.compact()
    val filesAfter = {
      val s = Files.list(Paths.get(logDir))
      try s.count() finally s.close()
    }
    assert(filesAfter == 1L,
      s"compacted log must be ONE base segment, got $filesAfter files")

    val (snapAfter, tListAfter) = timed(sorted(cat.listEntries().collect()))
    val (_, tAsOfAfter) = timed(cat.asOf(pin).count())
    val pinnedAfter = sorted(cat.asOf(pin).collect())

    assert(snapAfter == snapBefore, "snapshot changed across compaction")
    assert(pinnedAfter == pinnedBefore, s"pinned asOf($pin) changed across compaction")

    // latency regime, not a microbenchmark: the 1-file read differs from
    // the 10^4-file read by ~an order of magnitude here, but these are
    // SINGLE-SAMPLE wall clocks — a GC pause or cold-JIT spike on the
    // post-compaction read must not flake the suite (filesAfter == 1
    // above is the hard structural gate), so demand only a generous 2x
    // bound instead of strict improvement
    info(s"listEntries: ${tListBefore}ms over $Commits files -> ${tListAfter}ms over 1")
    info(s"asOf(pin):   ${tAsOfBefore}ms over $Commits files -> ${tAsOfAfter}ms over 1")
    assert(tListAfter < math.max(tListBefore / 2, 250),
      s"compaction must keep listEntries flat ($tListAfter ms vs $tListBefore ms pre-compaction)")
    assert(tAsOfAfter < math.max(tAsOfBefore / 2, 250),
      s"compaction must keep asOf flat ($tAsOfAfter ms vs $tAsOfBefore ms pre-compaction)")

    // appends after compaction continue the same total order (the base
    // segment itself claimed seq Commits+1 at publish)
    cat.addEntry(entry("post"))
    assert(cat.currentSeq() == Commits + 2L)
    assert(cat.snapshot().count() == 20L)
  }
}
