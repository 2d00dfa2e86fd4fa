package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted-band-index contract: deduping a stream of batches
  * incrementally against the index must yield EXACTLY the pair set of a
  * whole-corpus rebuild — each pair discovered once, in the batch where
  * its second member arrives.
  */
class IncrementalLshSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  test("incremental batches over a partition of the corpus == full rebuild pair set") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val full = pairSet(Dedup.minhashLsh(docs))
    assert(full.nonEmpty, "test premise: the corpus must contain near-dups")

    val root = tmpDir("lsh_idx")
    Dedup.initLshIndex(spark, root)
    val incremental = (0 until 3).map { b =>
      pairSet(Dedup.minhashLshIncremental(docs.filter(col("doc_id") % 3 === b), root))
    }
    // no pair is discovered twice across batches...
    assert(incremental.map(_.size).sum == incremental.reduce(_ union _).size,
      "a pair was discovered in more than one batch")
    // ...and the union is exactly the full rebuild
    assert(incremental.reduce(_ union _) == full,
      s"incremental union ${incremental.map(_.size).sum} pairs != full ${full.size}")
  }

  test("append=false leaves the index untouched (declared-query idempotency)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val root = tmpDir("lsh_idx_ro")
    Dedup.initLshIndex(spark, root)
    Dedup.minhashLshIncremental(docs.filter(col("doc_id") < 30), root).count()
    def bandCount() = spark.read.parquet(s"$root/bands").count()
    val before = bandCount()
    val r1 = pairSet(Dedup.minhashLshIncremental(docs.filter(col("doc_id") >= 30), root, append = false))
    val r2 = pairSet(Dedup.minhashLshIncremental(docs.filter(col("doc_id") >= 30), root, append = false))
    assert(r1 == r2, "read-only incremental must be deterministic across calls")
    assert(bandCount() == before, "append=false must not grow the index")
  }

  test("initLshIndex is create-exclusive: band params are immutable per index") {
    val root = tmpDir("lsh_idx_excl")
    Dedup.initLshIndex(spark, root)
    intercept[Exception](Dedup.initLshIndex(spark, root, numPerms = 32))
  }

  test("compactLshIndex: bounded file count after 50 batches, dedup results invariant") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").cache()
    val root = tmpDir("lsh_idx_compact")
    Dedup.initLshIndex(spark, root)
    // 50 tiny appends: the realistic ingest cadence that fragments the index
    (0 until 50).foreach { b =>
      Dedup.minhashLshIncremental(docs.filter(col("doc_id") % 50 === b), root).count()
    }
    def files(sub: String): Long = {
      val d = new java.io.File(s"$root/$sub")
      d.listFiles().count(_.getName.endsWith(".parquet")).toLong
    }
    assert(files("bands") >= 50, "test premise: appends fragment the index")
    // the probe a NEXT batch would run, before vs after compaction
    val probe = docs.filter(col("doc_id") % 7 === 0)
    val before = pairSet(Dedup.minhashLshIncremental(probe, root, append = false))
    assert(before.nonEmpty, "test premise: the probe batch must hit the index")
    val (nBefore, nAfter) = Dedup.compactLshIndex(spark, root, targetFiles = 4)
    assert(nBefore >= 100 && nAfter <= 8, s"expected ≤4 files/subdir, got $nBefore -> $nAfter")
    assert(files("bands") <= 4 && files("hashes") <= 4)
    val after = pairSet(Dedup.minhashLshIncremental(probe, root, append = false))
    assert(after == before, "compaction must not change any future dedup result")
    // no stale swap dirs left behind
    assert(!new java.io.File(s"$root/bands.trash").exists())
    assert(!new java.io.File(s"$root/bands.compacting").exists())
    // a second compaction is a no-op
    val (n2b, n2a) = Dedup.compactLshIndex(spark, root, targetFiles = 4)
    assert(n2b == n2a)
    docs.unpersist()
  }

  test("at-least-once delivery: a replayed batch is absorbed; a mid-commit retry lands exactly once") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").cache()
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 === 1)
    val probe = docs.filter(col("doc_id") % 7 === 0)
    // reference: the same sequence, no crash, no replay
    val ref = tmpDir("lsh_idx_alref")
    Dedup.initLshIndex(spark, ref)
    Dedup.minhashLshIncremental(b1, ref).count()
    val p2 = pairSet(Dedup.minhashLshIncremental(b2, ref))
    assert(p2.nonEmpty, "test premise: batch 2 must find pairs")
    val probeRef = pairSet(Dedup.minhashLshIncremental(probe, ref, append = false))

    val root = tmpDir("lsh_idx_al")
    Dedup.initLshIndex(spark, root)
    Dedup.minhashLshIncremental(b1, root).count()
    def files(sub: String): Set[java.io.File] =
      Option(new java.io.File(s"$root/$sub").listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).toSet
    val hBefore = files("hashes")
    assert(pairSet(Dedup.minhashLshIncremental(b2, root)) == p2)

    // the replay of a fully committed batch: absorbed — no pairs, no rows
    val hAfter = files("hashes")
    val hashRows = spark.read.parquet(s"$root/hashes").count()
    assert(pairSet(Dedup.minhashLshIncremental(b2, root)).isEmpty,
      "a replayed committed batch must be absorbed")
    assert(spark.read.parquet(s"$root/hashes").count() == hashRows,
      "a replay must not append hash rows")

    // mid-commit crash: bands landed, hashes did not (the write order) —
    // the idempotence anti-join keys on hashes, so the retry re-derives
    // the batch; its duplicate band rows are absorbed by the candidate
    // dedup, never reaching results
    val added = hAfter -- hBefore
    assert(added.nonEmpty, "test premise: the batch must have appended hash files")
    added.foreach(f => assert(f.delete(), s"cannot delete $f"))
    assert(pairSet(Dedup.minhashLshIncremental(b2, root)) == p2,
      "the mid-commit retry must re-derive the batch's pairs exactly")
    assert(pairSet(Dedup.minhashLshIncremental(probe, root, append = false)) == probeRef,
      "the healed index must serve future probes identically to the no-crash reference")
    docs.unpersist()
  }

  test("mid-swap compaction crash: dry-runs read the parked copy; a committing append restores it") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").cache()
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 === 1)
    // reference: the same two batches, no crash
    val ref = tmpDir("lsh_idx_ref")
    Dedup.initLshIndex(spark, ref)
    val p1 = pairSet(Dedup.minhashLshIncremental(b1, ref))
    val p2ref = pairSet(Dedup.minhashLshIncremental(b2, ref))
    assert(p2ref.nonEmpty, "test premise: batch 2 must find cross pairs against batch 1")

    val root = tmpDir("lsh_idx_crash")
    Dedup.initLshIndex(spark, root)
    assert(pairSet(Dedup.minhashLshIncremental(b1, root)) == p1)
    // simulate compactLshIndex's exact crash window: bands parked at
    // bands.trash, the staged copy never swapped in — trash holds the
    // sub-index's ONLY copy
    val bands = new java.io.File(s"$root/bands")
    new java.io.File(s"$root/bands.compacting").mkdirs()
    assert(bands.renameTo(new java.io.File(s"$root/bands.trash")))

    // lease-free dry-run: the read fallback must see the parked bands —
    // the pre-fix behavior read an empty index, silently missing every
    // candidate against batch 1
    val dry = pairSet(Dedup.minhashLshIncremental(b2, root, append = false))
    assert(dry == p2ref, "a dry-run in the crash window missed the parked index")
    assert(new java.io.File(s"$root/bands.trash").isDirectory,
      "a dry-run must stay read-only")

    // committing append: must physically restore BEFORE appending, so
    // its cross pairs are complete and the healed tree holds both batches
    assert(pairSet(Dedup.minhashLshIncremental(b2, root)) == p2ref,
      "a committing append in the crash window lost the parked cross pairs")
    assert(bands.isDirectory && !new java.io.File(s"$root/bands.trash").exists() &&
      !new java.io.File(s"$root/bands.compacting").exists(),
      "the committing append must restore and reap the crash leftovers")
    docs.unpersist()
  }
}
