package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.storage.BloomJoin

/** Sketch-backed scale operators (SURVEY §2.10 / LLM-pipeline surface):
  * probabilistic structures that replace a non-broadcastable exact
  * key-set (bloom) or a full rescan (HLL) with a fixed-size, mergeable,
  * broadcastable artifact — the data structures a 100 TB crawl-ingest
  * loop actually runs on.
  *
  * Both queries gate the sketch machinery with `require`d premises and
  * return EXACT arithmetic the DuckDB oracle replays — a sketch with a
  * false negative, a blown fp bound, or a union that loses state is a
  * red CORRECTNESS row, not a quiet quality drift.
  */
object SketchOps {

  /** q91: bloom-pruned anti join — "which crawled docs are NOT in the
    * already-ingested corpus" without shuffling the full probe side.
    * The corpus here is the deterministic blocklist doc_id ≡ 0 (mod 37)
    * so the oracle is plain SQL. Premises, measured in ONE extra
    * aggregate pass:
    *   - zero false negatives: every member probes true (the contract
    *     that makes the anti-join bypass sound);
    *   - the filter really prunes: observed fp count within 4× the
    *     requested fpp (+ small-corpus slack) — a filter that answers
    *     "maybe" for everything would pass correctness but do no work.
    * The declared result is the exact anti join (the maybe-set pass
    * kills every false positive), aggregated per language.
    */
  val bloomPruneJoin: Q = Q(
    "q91_bloom_prune_join",
    """SELECT lang,
      |       COUNT(*) AS n,
      |       CAST(SUM(doc_id) AS BIGINT) AS sum_id,
      |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |WHERE doc_id % 37 <> 0
      |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val member = col("doc_id") % 37 === 0
    val blocklist = docs.filter(member).select(col("doc_id"))
    val fpp = 0.01
    val expected = math.max(64L, blocklist.count())
    val bloom = BloomJoin.buildBroadcast(blocklist, "doc_id", expected, fpp)

    val maybe = BloomJoin.mightContain(col("doc_id"), bloom)
    val p = docs.agg(
      count(lit(1)).as("total"),
      coalesce(sum(when(member, 1L)), lit(0L)).as("members"),
      coalesce(sum(when(member && !maybe, 1L)), lit(0L)).as("false_neg"),
      coalesce(sum(when(!member && maybe, 1L)), lit(0L)).as("false_pos")).head()
    val (total, members, falseNeg, falsePos) =
      (p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3))
    require(members >= 1, s"q91 premise: degenerate fixture, no members ($total rows)")
    require(falseNeg == 0L,
      s"q91 premise: bloom false negative — the anti-join bypass is unsound ($falseNeg)")
    require(falsePos <= (4 * fpp * (total - members)).toLong + 8,
      s"q91 premise: fp count $falsePos blows the ${fpp} bound over " +
        s"${total - members} non-members — the filter isn't pruning")

    BloomJoin.antiJoin(docs, blocklist, "doc_id", bloom)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("doc_id")).cast("long").as("sum_id"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** q92: mergeable HLL corpus cardinality — per-shard sketches built
    * independently (the per-ingest-batch artifact), merged with
    * `hll_union_agg` and compared against BOTH a direct whole-corpus
    * sketch and the exact distinct count. At 100 TB this is how "how
    * many unique documents do we have" stays O(shards · sketch bytes)
    * per refresh instead of a corpus rescan: each ingest writes its
    * shard's sketch; the union answers globally. Premises: the merged
    * estimate and the direct estimate each land within 5% of exact, and
    * within 2% of each other (a union that loses shard state diverges
    * from the direct sketch long before it leaves the 5% band).
    * Declared result is exact per-language arithmetic for the oracle.
    */
  val hllCorpusStats: Q = Q(
    "q92_hll_corpus_stats",
    """SELECT lang,
      |       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique,
      |       COUNT(*) AS n_docs
      |FROM documents
      |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val shardSketches = docs
      .groupBy((col("doc_id") % 8).as("shard"))
      .agg(hll_sketch_agg(col("text")).as("sk"))
    // all three premise numbers in ONE action: the merged-shard estimate
    // still flows through the full two-level union plan (the mergeability
    // machinery under test), the direct sketch and the exact distinct
    // share the second scan, and the two 1-row aggregates meet in a
    // cross join — one driver round-trip instead of three
    val p = shardSketches
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged"))
      .crossJoin(docs.agg(
        hll_sketch_estimate(hll_sketch_agg(col("text"))).as("direct"),
        count_distinct(col("text")).as("exact")))
      .head()
    val (merged, direct, exact) = (p.getLong(0), p.getLong(1), p.getLong(2))
    def within(a: Long, b: Long, tol: Double): Boolean =
      math.abs(a - b) <= math.max(1L, (tol * b).toLong)
    require(within(merged, exact, 0.05),
      s"q92 premise: merged-shard HLL estimate $merged off exact $exact by >5%")
    require(within(direct, exact, 0.05),
      s"q92 premise: direct HLL estimate $direct off exact $exact by >5%")
    require(within(merged, direct, 0.02),
      s"q92 premise: shard union $merged diverges from direct sketch $direct — lost state")

    docs.groupBy(col("lang"))
      .agg(count_distinct(col("text")).cast("long").as("n_unique"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("lang"))
  }

  /** q93: the PERSISTED incremental bloom — the crawl-dedup ingest loop
    * end-to-end. Three batches arrive (batch2 re-crawls a third of
    * batch1; batch3 is ALL re-crawl): each loads the latest published
    * `bloom.{seq}.bin`, bloom-anti-joins against the ingested corpus
    * (definite misses bypass; the maybe set takes the exact pass),
    * appends only the truly-new rows, unions its own filter into the
    * artifact and atomically publishes the next version. Premises:
    *   - batch2 ingests EXACTLY its genuinely-new rows (the overlap is
    *     fully dropped, nothing new is lost);
    *   - batch3 ingests ZERO rows (the unioned artifact remembers both
    *     prior batches — a union that loses bits re-ingests);
    *   - version seq advanced per publish and reloads round-trip.
    * Per-cycle cost is O(new batch) + one fixed-size artifact write;
    * the corpus is never rescanned to rebuild the filter. Declared
    * query reads the ingested corpus back with batch provenance; the
    * oracle rebuilds both batches arithmetically.
    */
  val incrementalBloomDedup: Q = Q(
    "q93_incremental_bloom_dedup",
    """SELECT CAST(doc_id % 3 < 2 AS INT) AS from_batch1,
      |       COUNT(*) AS n,
      |       CAST(SUM(doc_id) AS BIGINT) AS sum_id,
      |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val root = graft.core.SessionTempRoots.of(s, d, "graft_bloomidx_") { root =>
      val docs = Tables.documents(s, d)
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars").map(col)
      val bloomDir = s"$root/bloom"
      val corpusDir = s"$root/corpus"
      // geometry sized ONCE for the target corpus; every batch filter
      // reuses it so versions stay union-compatible
      val expected = math.max(64L, Tables.documents(s, d).count())
      val fpp = 0.01

      def corpus() = s.read.parquet(corpusDir)
      def ingest(batch: org.apache.spark.sql.DataFrame, tag: Int): Long = {
        val newRows = BloomJoin.loadLatest(s, bloomDir) match {
          case None => batch // first batch: empty corpus
          case Some((_, bloom)) =>
            BloomJoin.antiJoin(batch, corpus().select(col("doc_id")), "doc_id", bloom)
        }
        val staged = newRows.select(cols: _*).withColumn("ingest_batch", lit(tag))
        staged.write.mode("append").parquet(corpusDir)
        val n = corpus().filter(col("ingest_batch") === tag).count()
        // build over what this batch OFFERED (ids it has seen), not
        // just what was new — re-crawled ids must stay in the filter
        val bytes = BloomJoin.buildBytes(batch.select(col("doc_id")),
          "doc_id", expected, fpp)
        val batchBloom = BloomJoin.loadLatest(s, bloomDir) match {
          case None => bytes
          case Some((_, prev)) => BloomJoin.union(prev.value, bytes)
        }
        BloomJoin.saveVersion(bloomDir, batchBloom)
        n
      }

      val batch1 = docs.filter(col("doc_id") % 3 < 2)
      val batch2 = docs.filter(col("doc_id") % 3 >= 1) // overlap: %3 == 1
      val batch3 = docs.filter(col("doc_id") % 3 =!= 1) // ALL already ingested
      val (c1, c2, c3) = (docs.filter(col("doc_id") % 3 < 2).count(),
        docs.filter(col("doc_id") % 3 === 2).count(),
        0L)
      val n1 = ingest(batch1, 1)
      require(n1 == c1, s"q93 premise: batch1 must ingest all its rows ($n1 vs $c1)")
      val n2 = ingest(batch2, 2)
      require(n2 == c2,
        s"q93 premise: batch2 must ingest exactly its new rows ($n2 vs $c2) — " +
          "overlap dropped, nothing new lost")
      val n3 = ingest(batch3, 3)
      require(n3 == c3,
        s"q93 premise: batch3 is all re-crawl, must ingest zero rows ($n3)")
      val seq = BloomJoin.loadLatest(s, bloomDir).map(_._1).getOrElse(0L)
      require(seq == 3L, s"q93 premise: three publishes must yield seq 3 ($seq)")
    }
    s.read.parquet(s"$root/corpus")
      .groupBy((col("ingest_batch") === 1).cast("int").as("from_batch1"))
      .agg(count(lit(1)).as("n"),
        sum(col("doc_id")).cast("long").as("sum_id"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy(col("from_batch1"))
  }

  val all: Seq[Q] = Seq(bloomPruneJoin, hllCorpusStats) ++
    Seq(incrementalBloomDedup).map(_.gated)
}
