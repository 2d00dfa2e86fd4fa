package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Dedup, IvfSearch, SemanticDedup, SemanticIndex}

/** q95: semantic dedup (SemDeDup) under the oracle — the embedding-space
  * dedup pass a training pipeline runs AFTER n-gram dedup, catching
  * paraphrases and re-encodes that share no shingles. The whole pipeline
  * is deterministic composition of already-gated parts (q49's md5-seeded
  * integer-Lloyd k-means, q43's cosine arithmetic, q55's min-label
  * components), so ONE static SQL replays it end to end: a drifted
  * centroid, a lost pair, or a wrong keep-choice is a hash mismatch.
  *
  * "Duplicate group" is a TRUE connected component of the within-cluster
  * τ-similarity graph: the Spark side computes it in ONE shuffle — an
  * in-task union-find per IVF cluster ([[SemanticDedup.dedup]] via
  * [[graft.llm.Dedup.blockConfinedComponents]]; exact because the pair
  * join is keyed on the cluster, so no edge straddles two clusters) —
  * and the oracle replays full convergence with a recursive CTE
  * (min-reachable-id closure). No fixed round count exists on either
  * side, because none is scale-safe: the driver corpus at τ=0.35 sits
  * near the percolation threshold (avg degree ~1.2, long chains;
  * iterate-to-fixpoint propagation measured 12+ rounds at sf0.1 — the
  * r12 bench breach this plan removes). The recursive closure is the
  * ORACLE side only — O(component²) label pairs in the worst case, fine
  * at replay scale; the Spark side stays O(edges) with task memory
  * O(|cluster|).
  */
object SemanticOps {

  // Corpus-adaptive cluster count, the q80-adaptive-planes pattern: BOTH
  // engines derive K = max(8, ceil(n / 1024)) from COUNT(*), so the gate
  // replays in one static SQL at every SF while Σ|cluster|² stays ~n·1024
  // (linear) instead of n²/K. At the oracle-checked scales
  // (sf0.001/0.01/0.1, n ≤ 2000) this is exactly the former pinned K=8 —
  // results unchanged; at sf1+ the Spark side runs the production plan
  // (BASELINE.md round-13: 338 s pinned vs 26.7 s adaptive at sf10).
  private val TargetCluster = 1024
  private val KSql =
    s"(SELECT GREATEST(8, CAST(CEIL(COUNT(*) / $TargetCluster.0) AS BIGINT)) FROM embeddings)"
  private val Iters = 1
  private val Tau = 0.35

  private def duckNorm(e: String): String =
    s"sqrt(list_aggregate(list_transform($e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
  private def duckDot(a: String, b: String): String =
    s"list_aggregate(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"

  val semanticDedup: Q = Q(
    "q95_semantic_dedup",
    s"""WITH RECURSIVE ${IvfSearch.duckIndexCtesK(KSql, Iters)},
       |bn AS MATERIALIZED (
       |  SELECT vec_id, embedding, cluster, ${duckNorm("embedding")} AS nrm
       |  FROM idx),
       |edges AS MATERIALIZED (
       |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM bn a JOIN bn b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $Tau),
       |edgesu AS MATERIALIZED (
       |  SELECT doc_a AS x, doc_b AS y FROM edges
       |  UNION ALL SELECT doc_b AS x, doc_a AS y FROM edges),
       |lab(id, label) AS (
       |  SELECT DISTINCT x AS id, x AS label FROM edgesu
       |  UNION
       |  SELECT e.x AS id, l.label FROM lab l JOIN edgesu e ON e.y = l.id),
       |dropped AS (
       |  SELECT id FROM (SELECT id, MIN(label) AS label FROM lab GROUP BY id)
       |  WHERE id <> label)
       |SELECT CAST(i.cluster AS BIGINT) AS ivf_cluster,
       |       COUNT(*) AS n_members,
       |       CAST(COUNT(*) FILTER (WHERE d.id IS NULL) AS BIGINT) AS n_kept,
       |       CAST(SUM(CASE WHEN d.id IS NULL THEN i.vec_id END) AS BIGINT) AS sum_kept_ids
       |FROM idx i LEFT JOIN dropped d ON i.vec_id = d.id
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    // two actions traverse the annotated corpus (the premise probe and
    // the result agg) — checkpoint so the IVF + pair-join pipeline runs
    // exactly once
    val corpus = Tables.embeddings(s, d)
    val k = SemanticDedup.adaptiveK(corpus.count(), TargetCluster)
    val annotated = graft.core.Checkpoints.stable(
      SemanticDedup.dedup(corpus, k, Iters, Tau))
    val p = annotated.agg(count(lit(1)).as("total"),
      coalesce(sum(when(!col("kept"), 1L)), lit(0L)).as("dropped")).head()
    val (total, dropped) = (p.getLong(0), p.getLong(1))
    // how much is dropped depends on the corpus's similarity regime
    // (sparse chains on the driver data, dense blobs on Gaussian-cluster
    // synthetics) — the machinery premise is only that dedup DID work;
    // component convergence is guaranteed by the fixed-point iteration
    require(dropped >= 1 && dropped < total,
      s"q95 premise: semantic dedup dropped $dropped of $total — no work done")
    annotated
      .groupBy(col("ivf_cluster").cast("long").as("ivf_cluster"))
      .agg(count(lit(1)).as("n_members"),
        coalesce(sum(when(col("kept"), 1L)), lit(0L)).cast("long").as("n_kept"),
        sum(when(col("kept"), col("vec_id"))).cast("long").as("sum_kept_ids"))
      .orderBy("ivf_cluster")
  }

  /** q96: MULTI-PROBE semantic dedup — the boundary-recall fix for q95's
    * one approximation. Vanilla SemDeDup only considers within-cluster
    * pairs, so a duplicate pair straddling a Voronoi face is
    * structurally invisible (q95's spec pins that behavior). Here each
    * vector joins its 2 nearest clusters for pair generation (identical
    * ranking rule both engines: score DESC, cluster ASC), edges are
    * generated once each (canonical shared cluster), and components run
    * to full convergence via
    * [[graft.llm.Dedup.blockBridgedComponents]]: in-task union-find per
    * probe cluster (one shuffle — edges are cluster-confined by the
    * join key, map-side contracted to node-count rows), then the
    * cross-cluster quotient graph solved by a bounded driver union-find
    * (distributed fixed-point past the bound). The declared result adds `n_probe2` (how many
    * vectors chose this cluster second), pinning the probe ranking
    * itself into the hash. Premise per execution: at least one
    * candidate pair crosses rank-1 clusters — the pairs q95 cannot see,
    * i.e. the reason this query exists.
    */
  val semanticDedupMultiProbe: Q = Q(
    "q96_semantic_multiprobe",
    s"""WITH RECURSIVE ${IvfSearch.duckIndexCtesK(KSql, Iters)},
       |probes AS MATERIALIZED (
       |  SELECT vec_id, embedding, cluster, __rn AS probe_rank FROM (
       |    SELECT e.vec_id, e.embedding, c.cluster,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${duckDot("e.embedding", "c.centroid")} /
       |          (CASE WHEN ${duckNorm("c.centroid")} = 0 THEN 1.0
       |                ELSE ${duckNorm("c.centroid")} END) DESC,
       |        c.cluster ASC) AS __rn
       |    FROM embeddings e CROSS JOIN cent$Iters c)
       |  WHERE __rn <= 2),
       |bn AS MATERIALIZED (
       |  SELECT vec_id, embedding, cluster, ${duckNorm("embedding")} AS nrm
       |  FROM probes),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM bn a JOIN bn b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $Tau),
       |edgesu AS MATERIALIZED (
       |  SELECT doc_a AS x, doc_b AS y FROM edges
       |  UNION ALL SELECT doc_b AS x, doc_a AS y FROM edges),
       |lab(id, label) AS (
       |  SELECT DISTINCT x AS id, x AS label FROM edgesu
       |  UNION
       |  SELECT e.x AS id, l.label FROM lab l JOIN edgesu e ON e.y = l.id),
       |dropped AS (
       |  SELECT id FROM (SELECT id, MIN(label) AS label FROM lab GROUP BY id)
       |  WHERE id <> label),
       |p2 AS (
       |  SELECT cluster, COUNT(*) AS n_probe2 FROM probes
       |  WHERE probe_rank = 2 GROUP BY 1)
       |SELECT CAST(i.cluster AS BIGINT) AS ivf_cluster,
       |       COUNT(*) AS n_members,
       |       CAST(COUNT(*) FILTER (WHERE d.id IS NULL) AS BIGINT) AS n_kept,
       |       CAST(SUM(CASE WHEN d.id IS NULL THEN i.vec_id END) AS BIGINT) AS sum_kept_ids,
       |       CAST(COALESCE(MAX(p2.n_probe2), 0) AS BIGINT) AS n_probe2
       |FROM idx i LEFT JOIN dropped d ON i.vec_id = d.id
       |LEFT JOIN p2 ON p2.cluster = i.cluster
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val corpus = Tables.embeddings(s, d)
    val k = SemanticDedup.adaptiveK(corpus.count(), TargetCluster)
    val centroids = IvfSearch.trainCentroids(corpus, k, Iters)
    val multi = graft.core.Checkpoints.stable(IvfSearch.buildIndexMultiProbe(
      corpus.select(col("vec_id"), col("embedding")), centroids, "embedding", nProbe = 2))
    // cluster retained: every edge is probe-cluster-confined by the
    // pair join's key — the quotient component plan exploits exactly
    // that. The canonical rule (probesCol) emits each pair ONCE, in
    // MIN(probes_a ∩ probes_b), so no distinct and no duplicate dot
    // products; the oracle's DISTINCT sees the identical pair set.
    // NOT checkpointed: the τ-graph is edge-heavy in the dense regime
    // (536 M edges at sf10), so materializing it costs more than its
    // single streaming traversal below — map-side contraction inside
    // blockBridgedComponents collapses it to node-count rows in one pass
    val pairs = SemanticDedup.semanticPairs(multi, Tau, probesCol = Some("probes"))
      .select("cluster", "id_a", "id_b", "crosses")
    val rank1 = multi.filter(col("probe_rank") === 1).select(col("vec_id"), col("cluster"))

    // the value premise: a pair whose RANK-1 clusters differ is exactly
    // the candidate single-probe SemDeDup (q95) cannot generate. The
    // flag is computed at pair-generation time (probes are rank-ordered)
    // and the check is EXISTENCE — limit(1) scans partitions
    // incrementally, never the whole edge set
    val cross = pairs.filter(col("crosses")).limit(1).count()
    require(cross >= 1,
      s"q96 premise: no candidate pair crosses rank-1 clusters — " +
        "multi-probe found nothing beyond q95's reach")

    // one-shuffle union-find per probe cluster (map-side contracted to
    // node-count rows), then the quotient solve over ONLY the
    // cross-cluster links — never the corpus-sized edge set (VERDICT
    // r13 What's-wrong #1)
    val groups = Dedup.blockBridgedComponents(pairs, blockCol = "cluster",
      aCol = "id_a", bCol = "id_b")
    val annotated = rank1
      .join(groups.select(col("doc_id").as("vec_id"), col("is_canonical")), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("is_canonical"), lit(true)).as("kept"))
    val p = annotated.agg(count(lit(1)).as("total"),
      coalesce(sum(when(!col("kept"), 1L)), lit(0L)).as("dropped")).head()
    require(p.getLong(1) >= 1 && p.getLong(1) < p.getLong(0),
      s"q96 premise: dedup dropped ${p.getLong(1)} of ${p.getLong(0)} — no work done")

    val probe2 = multi.filter(col("probe_rank") === 2)
      .groupBy("cluster").agg(count(lit(1)).as("__np2"))
    annotated
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        coalesce(sum(when(col("kept"), 1L)), lit(0L)).cast("long").as("n_kept"),
        sum(when(col("kept"), col("vec_id"))).cast("long").as("sum_kept_ids"))
      .join(probe2, Seq("cluster"), "left")
      .select(col("cluster").cast("long").as("ivf_cluster"),
        col("n_members"), col("n_kept"), col("sum_kept_ids"),
        coalesce(col("__np2"), lit(0L)).cast("long").as("n_probe2"))
      .orderBy("ivf_cluster")
  }

  // Corpus-adaptive K for the INCREMENTAL index (q97): derived from the
  // TRAINING slice's count — the data that existed when the centroids
  // were frozen — on both engines
  private val KSqlTrain =
    s"(SELECT GREATEST(8, CAST(CEIL(COUNT(*) / $TargetCluster.0) AS BIGINT)) " +
      "FROM embeddings WHERE vec_id % 4 <> 0)"

  /** q97's persisted semantic index, built ONCE per (session, data dir):
    * [[SemanticIndex.init]] freezes centroids trained on the "existing
    * corpus" slice (vec_id % 4 != 0), then that slice is ingested in
    * THREE incremental appends (%8==1, %8==5, %4 in (2,3) — the q69
    * batch shape), so the persisted labels the gated read composes with
    * were themselves produced by the star-contracted incremental path,
    * never a full rebuild. Every later call — including every timed
    * bench pass — runs only the production ingest probe: assign the new
    * batch against the frozen centroids, pair-join it inside its
    * affected clusters, update those clusters' components. Temp roots
    * are reaped at JVM exit.
    *
    * After the appends the fixture forces a [[SemanticIndex.compact]]
    * park-and-swap, `require`d to actually rewrite (three appends leave
    * multi-file cluster partitions) — the q69 pattern: a compaction
    * that loses or duplicates index/label rows makes the downstream
    * hash gate a red CORRECTNESS row, so maintenance is oracle-covered,
    * not just spec-covered.
    */
  private def persistedSemRoot(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.core.SessionTempRoots.of(s, d, "graft_semidx_") { root =>
      val corpus = Tables.embeddings(s, d)
      SemanticIndex.init(s, root, corpus.filter(col("vec_id") % 4 =!= 0),
        Tau, TargetCluster.toLong, Iters)
      SemanticIndex.ingest(corpus.filter(col("vec_id") % 8 === 1), root).count()
      SemanticIndex.ingest(corpus.filter(col("vec_id") % 8 === 5), root).count()
      SemanticIndex.ingest(
        corpus.filter(col("vec_id") % 4 === 2 || col("vec_id") % 4 === 3), root).count()
      val (cb, ca) = SemanticIndex.compact(s, root)
      require(ca < cb, s"q97 fixture premise: compaction was a no-op ($cb -> $ca files)")
    }

  /** q97: INCREMENTAL semantic dedup against the persisted index — the
    * q69/q93 ingest pattern applied to embeddings, closing the last
    * full-corpus rescan on the LLM surface. The NEW batch (vec_id % 4
    * == 0) is assigned with the frozen-centroid broadcast kernel,
    * pair-joined ONLY inside its affected clusters against the
    * partition-pruned persisted index, and the affected clusters'
    * component labels are updated by star-contracted union-find —
    * O(|batch| + affected-cluster state) per cycle, never O(corpus).
    * The declared result is the FULL corpus's per-cluster dedup
    * aggregate (persisted decisions for unaffected clusters ∪ the
    * updated decisions), plus `n_new_kept` (kept batch vectors per
    * cluster) pinning the batch's own outcome — so the hash gate IS the
    * batches≡rebuild theorem: the oracle replays one monolithic
    * frozen-centroid rebuild (train Lloyd on the %4!=0 slice, assign
    * everything, all within-cluster τ-pairs, full recursive closure)
    * and any divergence anywhere in the incremental lineage (three
    * appends + the probe) is a red row. Centroid staleness contract:
    * see [[graft.llm.SemanticIndex]] — the batch here is
    * same-distribution, so the frozen quantizer is valid by
    * construction.
    */
  val semanticIncremental: Q = Q(
    "q97_semantic_incremental",
    s"""WITH RECURSIVE ${IvfSearch.duckIndexCtesTrainedK(KSqlTrain, Iters, "vec_id % 4 <> 0")},
       |bn AS MATERIALIZED (
       |  SELECT vec_id, embedding, cluster, ${duckNorm("embedding")} AS nrm
       |  FROM idx),
       |edges AS MATERIALIZED (
       |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM bn a JOIN bn b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $Tau),
       |edgesu AS MATERIALIZED (
       |  SELECT doc_a AS x, doc_b AS y FROM edges
       |  UNION ALL SELECT doc_b AS x, doc_a AS y FROM edges),
       |lab(id, label) AS (
       |  SELECT DISTINCT x AS id, x AS label FROM edgesu
       |  UNION
       |  SELECT e.x AS id, l.label FROM lab l JOIN edgesu e ON e.y = l.id),
       |dropped AS (
       |  SELECT id FROM (SELECT id, MIN(label) AS label FROM lab GROUP BY id)
       |  WHERE id <> label)
       |SELECT CAST(i.cluster AS BIGINT) AS ivf_cluster,
       |       COUNT(*) AS n_members,
       |       CAST(COUNT(*) FILTER (WHERE d.id IS NULL) AS BIGINT) AS n_kept,
       |       CAST(SUM(CASE WHEN d.id IS NULL THEN i.vec_id END) AS BIGINT) AS sum_kept_ids,
       |       CAST(COUNT(*) FILTER (WHERE i.vec_id % 4 = 0 AND d.id IS NULL) AS BIGINT) AS n_new_kept
       |FROM idx i LEFT JOIN dropped d ON i.vec_id = d.id
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val root = persistedSemRoot(s, d)
    val batch = Tables.embeddings(s, d).filter(col("vec_id") % 4 === 0)
    // append=false: the probe is a pure read of the ingest plan, so
    // warmup + timed + verify executions are idempotent; two actions
    // traverse it (premise + result agg) — checkpoint once
    val upd = graft.core.Checkpoints.stable(
      SemanticIndex.ingest(batch, root, append = false))
    val aff = upd.select("cluster").distinct()
    val full = graft.core.Checkpoints.stable(
      SemanticIndex.decisions(s, root)
        .join(aff, Seq("cluster"), "left_anti")
        .unionByName(upd))
    val p = full.agg(count(lit(1)).as("total"),
      coalesce(sum(when(!col("kept"), 1L)), lit(0L)).as("dropped"),
      coalesce(sum(when(col("vec_id") % 4 === 0, 1L)), lit(0L)).as("batch_n")).head()
    require(p.getLong(2) >= 1, "q97 premise: the new batch is empty")
    require(p.getLong(1) >= 1 && p.getLong(1) < p.getLong(0),
      s"q97 premise: dedup dropped ${p.getLong(1)} of ${p.getLong(0)} — no work done")
    full
      .groupBy(col("cluster").cast("long").as("ivf_cluster"))
      .agg(count(lit(1)).as("n_members"),
        coalesce(sum(when(col("kept"), 1L)), lit(0L)).cast("long").as("n_kept"),
        sum(when(col("kept"), col("vec_id"))).cast("long").as("sum_kept_ids"),
        coalesce(sum(when(col("kept") && col("vec_id") % 4 === 0, 1L)), lit(0L))
          .cast("long").as("n_new_kept"))
      .orderBy("ivf_cluster")
  }

  val all: Seq[Q] = Seq(semanticDedup, semanticDedupMultiProbe,
    semanticIncremental.gated)
}
