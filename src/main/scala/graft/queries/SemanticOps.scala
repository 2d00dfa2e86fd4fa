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
    // ONE traversal of the dedup pipeline: the GROUPED result (≤ k rows)
    // is checkpointed, the premise rides the same materialization as an
    // observed metric pair (exact integer counts — identical to the
    // former corpus-wide premise agg), and the declared orderBy runs
    // over the tiny checkpoint
    val corpus = Tables.embeddings(s, d)
    // corpus size from parquet footers (Tables.rowCount — exact, a
    // driver-side metadata read), not a count() action per execution
    val k = SemanticDedup.adaptiveK(Tables.rowCount(s, d, "embeddings"), TargetCluster)
    val obs = org.apache.spark.sql.Observation()
    val annotated = SemanticDedup.dedup(corpus, k, Iters, Tau)
      .observe(obs, count(lit(1)).as("total"),
        coalesce(sum(when(!col("kept"), 1L)), lit(0L)).as("dropped"))
    val grouped = graft.core.Checkpoints.stable(annotated
      .groupBy(col("ivf_cluster").cast("long").as("ivf_cluster"))
      .agg(count(lit(1)).as("n_members"),
        coalesce(sum(when(col("kept"), 1L)), lit(0L)).cast("long").as("n_kept"),
        sum(when(col("kept"), col("vec_id"))).cast("long").as("sum_kept_ids")))
    // plan-spec mode (checkpoint disabled) never materialized the
    // observation — fall back to the former explicit agg
    val (total, dropped) =
      if (graft.core.Checkpoints.isDisabled(s)) {
        val p = annotated.agg(count(lit(1)),
          coalesce(sum(when(!col("kept"), 1L)), lit(0L))).head(); (p.getLong(0), p.getLong(1))
      } else { val m = obs.get
        (m("total").asInstanceOf[Long], m("dropped").asInstanceOf[Long]) }
    // how much is dropped depends on the corpus's similarity regime
    // (sparse chains on the driver data, dense blobs on Gaussian-cluster
    // synthetics) — the machinery premise is only that dedup DID work;
    // component convergence is guaranteed by the fixed-point iteration
    require(dropped >= 1 && dropped < total,
      s"q95 premise: semantic dedup dropped $dropped of $total — no work done")
    grouped.orderBy("ivf_cluster")
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
    // footer-derived corpus size, as in q95
    val k = SemanticDedup.adaptiveK(Tables.rowCount(s, d, "embeddings"), TargetCluster)
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
    val crossObs = org.apache.spark.sql.Observation()
    val pairs = SemanticDedup.semanticPairs(multi, Tau, probesCol = Some("probes"))
      .select("cluster", "id_a", "id_b", "crosses")
      // the value premise rides the pair traversal as an observed metric
      // instead of a second (limit-1) execution of the pair join: a pair
      // whose RANK-1 clusters differ is exactly the candidate
      // single-probe SemDeDup (q95) cannot generate
      .observe(crossObs, coalesce(sum(when(col("crosses"), 1L)), lit(0L)).as("n_cross"))
    val rank1 = multi.filter(col("probe_rank") === 1).select(col("vec_id"), col("cluster"))

    // one-shuffle union-find per probe cluster (map-side contracted to
    // node-count rows), then the quotient solve over ONLY the
    // cross-cluster links — never the corpus-sized edge set (VERDICT
    // r13 What's-wrong #1). Building it materializes the pair pipeline
    // (its phase-1 labels are checkpointed inside), which fills crossObs.
    val groups = Dedup.blockBridgedComponents(pairs, blockCol = "cluster",
      aCol = "id_a", bCol = "id_b")
    val cross = if (graft.core.Checkpoints.isDisabled(s))
        pairs.filter(col("crosses")).limit(1).count() // plan-spec mode
      else crossObs.get("n_cross").asInstanceOf[Long]
    require(cross >= 1,
      s"q96 premise: no candidate pair crosses rank-1 clusters — " +
        "multi-probe found nothing beyond q95's reach")

    val obs = org.apache.spark.sql.Observation()
    val annotated = rank1
      .join(groups.select(col("doc_id").as("vec_id"), col("is_canonical")), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("is_canonical"), lit(true)).as("kept"))
      .observe(obs, count(lit(1)).as("total"),
        coalesce(sum(when(!col("kept"), 1L)), lit(0L)).as("dropped"))
    val grouped = graft.core.Checkpoints.stable(annotated
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        coalesce(sum(when(col("kept"), 1L)), lit(0L)).cast("long").as("n_kept"),
        sum(when(col("kept"), col("vec_id"))).cast("long").as("sum_kept_ids")))
    val (total, dropped) =
      if (graft.core.Checkpoints.isDisabled(s)) {
        val p = annotated.agg(count(lit(1)),
          coalesce(sum(when(!col("kept"), 1L)), lit(0L))).head(); (p.getLong(0), p.getLong(1))
      } else { val m = obs.get
        (m("total").asInstanceOf[Long], m("dropped").asInstanceOf[Long]) }
    require(dropped >= 1 && dropped < total,
      s"q96 premise: dedup dropped $dropped of $total — no work done")

    val probe2 = multi.filter(col("probe_rank") === 2)
      .groupBy("cluster").agg(count(lit(1)).as("__np2"))
    grouped
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
    * manifest-committed rewrite, `require`d to actually compact (three appends leave
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
    // warmup + timed + verify executions are idempotent — checkpoint once
    val upd = graft.core.Checkpoints.stable(
      SemanticIndex.ingest(batch, root, append = false))
    val aff = upd.select("cluster").distinct()
    val obs = org.apache.spark.sql.Observation()
    val full = SemanticIndex.decisions(s, root)
      .join(aff, Seq("cluster"), "left_anti")
      .unionByName(upd)
      // premises ride the ONE materialization of the composed corpus
      // (observed metrics on the grouped checkpoint below) — formerly a
      // separate corpus-wide agg action
      .observe(obs, count(lit(1)).as("total"),
        coalesce(sum(when(!col("kept"), 1L)), lit(0L)).as("dropped"),
        coalesce(sum(when(col("vec_id") % 4 === 0, 1L)), lit(0L)).as("batch_n"))
    val grouped = graft.core.Checkpoints.stable(full
      .groupBy(col("cluster").cast("long").as("ivf_cluster"))
      .agg(count(lit(1)).as("n_members"),
        coalesce(sum(when(col("kept"), 1L)), lit(0L)).cast("long").as("n_kept"),
        sum(when(col("kept"), col("vec_id"))).cast("long").as("sum_kept_ids"),
        coalesce(sum(when(col("kept") && col("vec_id") % 4 === 0, 1L)), lit(0L))
          .cast("long").as("n_new_kept")))
    val (total, dropped, batchN) =
      if (graft.core.Checkpoints.isDisabled(s)) { // plan-spec mode
        val p = full.agg(count(lit(1)),
          coalesce(sum(when(!col("kept"), 1L)), lit(0L)),
          coalesce(sum(when(col("vec_id") % 4 === 0, 1L)), lit(0L))).head()
        (p.getLong(0), p.getLong(1), p.getLong(2))
      } else { val m = obs.get
        (m("total").asInstanceOf[Long], m("dropped").asInstanceOf[Long],
          m("batch_n").asInstanceOf[Long]) }
    require(batchN >= 1, "q97 premise: the new batch is empty")
    require(dropped >= 1 && dropped < total,
      s"q97 premise: dedup dropped $dropped of $total — no work done")
    grouped.orderBy("ivf_cluster")
  }

  /** q98's persisted MULTI-PROBE semantic index (n_probe=2), built ONCE
    * per (session, data dir) — the q97 fixture shape with the q96
    * recall semantics: centroids frozen on the %4!=0 slice, the slice
    * ingested in the same three incremental appends, then a forced
    * manifest-committed compaction `require`d to rewrite. Every index row is
    * stored per probe and every label partition holds star-contracted
    * LOCAL components of the edges canonicalized to that cluster; the
    * cross-cluster quotient is read-time.
    */
  private def persistedSemMpRoot(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.core.SessionTempRoots.of(s, d, "graft_semidx_mp_") { root =>
      val corpus = Tables.embeddings(s, d)
      SemanticIndex.init(s, root, corpus.filter(col("vec_id") % 4 =!= 0),
        Tau, TargetCluster.toLong, Iters, nProbe = 2)
      SemanticIndex.ingest(corpus.filter(col("vec_id") % 8 === 1), root).count()
      SemanticIndex.ingest(corpus.filter(col("vec_id") % 8 === 5), root).count()
      SemanticIndex.ingest(
        corpus.filter(col("vec_id") % 4 === 2 || col("vec_id") % 4 === 3), root).count()
      val (cb, ca) = SemanticIndex.compact(s, root)
      require(ca < cb, s"q98 fixture premise: compaction was a no-op ($cb -> $ca files)")
    }

  /** q98: MULTI-PROBE incremental semantic dedup — q97's persisted-index
    * ingest with q96's boundary recall (VERDICT r15 top ask). The NEW
    * batch (vec_id % 4 == 0) joins its top-2 probe clusters for pair
    * generation against the per-probe-partitioned persisted index
    * (listing-time pruning to the batch's probed partitions), affected
    * clusters' LOCAL star labels are updated by the same per-cluster
    * union-find as q97, and kept-ness is composed at READ time by the
    * cross-cluster quotient solve ([[graft.llm.Dedup.bridgeLocalRoots]]
    * — q96's phase 2 over persisted phase-1 state). The oracle replays
    * one monolithic multi-probe rebuild (train on the %4!=0 slice,
    * probe ALL rows into their top-2 clusters, all shared-probe τ-pairs,
    * full recursive closure), so the hash gate IS the multi-probe
    * batches≡rebuild theorem — any divergence in the per-probe storage,
    * the canonical once-each pair rule, the incremental label
    * maintenance, or the quotient bridging is a red row. Premise per
    * execution: at least one doc holds label rows in TWO clusters — a
    * live bridge, the configuration rank-1 blocking (q97) can never
    * produce, i.e. the reason this query exists.
    */
  val semanticIncrementalMultiProbe: Q = Q(
    "q98_semantic_incremental_multiprobe",
    s"""WITH RECURSIVE ${IvfSearch.duckIndexCtesTrainedK(KSqlTrain, Iters, "vec_id % 4 <> 0")},
       |probes AS MATERIALIZED (
       |  SELECT vec_id, embedding, cluster FROM (
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
       |  WHERE id <> label)
       |SELECT CAST(i.cluster AS BIGINT) AS ivf_cluster,
       |       COUNT(*) AS n_members,
       |       CAST(COUNT(*) FILTER (WHERE d.id IS NULL) AS BIGINT) AS n_kept,
       |       CAST(SUM(CASE WHEN d.id IS NULL THEN i.vec_id END) AS BIGINT) AS sum_kept_ids,
       |       CAST(COUNT(*) FILTER (WHERE i.vec_id % 4 = 0 AND d.id IS NULL) AS BIGINT) AS n_new_kept
       |FROM idx i LEFT JOIN dropped d ON i.vec_id = d.id
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val root = persistedSemMpRoot(s, d)
    val batch = Tables.embeddings(s, d).filter(col("vec_id") % 4 === 0)
    // dry-run probe (the production ingest plan, idempotent across
    // warmup/timed/verify passes) returns the affected clusters'
    // updated LOCAL labels; the composed read replaces those partitions
    // and unions the batch's rank-1 assignments — never mutating state
    val dryLabels = graft.core.Checkpoints.stable(
      SemanticIndex.ingest(batch, root, append = false))
    val merged = SemanticIndex.localLabels(s, root)
      .join(dryLabels.select("cluster").distinct(), Seq("cluster"), "left_anti")
      .unionByName(dryLabels)
    // the value premise: a doc with label rows in TWO clusters is a
    // live bridge — rank-1 blocking confines every doc's labels to one
    // cluster, so this is exactly the structure q97 cannot represent.
    // Existence check only: limit(1) never materializes the group-by
    val bridges = merged.groupBy("doc_id")
      .agg(countDistinct("cluster").as("nc")).filter(col("nc") >= 2).limit(1).count()
    require(bridges >= 1,
      "q98 premise: no cross-cluster bridge in the label state — " +
        "multi-probe ingest found nothing beyond q97's reach")
    val obs = org.apache.spark.sql.Observation()
    val full = SemanticIndex.decisionsMerged(s, root, dryLabels, batch)
      // premises ride the ONE materialization (the grouped checkpoint)
      .observe(obs, count(lit(1)).as("total"),
        coalesce(sum(when(!col("kept"), 1L)), lit(0L)).as("dropped"),
        coalesce(sum(when(col("vec_id") % 4 === 0, 1L)), lit(0L)).as("batch_n"))
    val grouped = graft.core.Checkpoints.stable(full
      .groupBy(col("cluster").cast("long").as("ivf_cluster"))
      .agg(count(lit(1)).as("n_members"),
        coalesce(sum(when(col("kept"), 1L)), lit(0L)).cast("long").as("n_kept"),
        sum(when(col("kept"), col("vec_id"))).cast("long").as("sum_kept_ids"),
        coalesce(sum(when(col("kept") && col("vec_id") % 4 === 0, 1L)), lit(0L))
          .cast("long").as("n_new_kept")))
    val (total, dropped, batchN) =
      if (graft.core.Checkpoints.isDisabled(s)) { // plan-spec mode
        val p = full.agg(count(lit(1)),
          coalesce(sum(when(!col("kept"), 1L)), lit(0L)),
          coalesce(sum(when(col("vec_id") % 4 === 0, 1L)), lit(0L))).head()
        (p.getLong(0), p.getLong(1), p.getLong(2))
      } else { val m = obs.get
        (m("total").asInstanceOf[Long], m("dropped").asInstanceOf[Long],
          m("batch_n").asInstanceOf[Long]) }
    require(batchN >= 1, "q98 premise: the new batch is empty")
    require(dropped >= 1 && dropped < total,
      s"q98 premise: dedup dropped $dropped of $total — no work done")
    grouped.orderBy("ivf_cluster")
  }

  // Corpus-adaptive K for the RETRAINED index (q99): retrain defaults
  // its training corpus to the index's own vectors — the original slice
  // PLUS the drifted batch — so K re-derives from that full count
  private val KSql99 =
    s"(SELECT GREATEST(8, CAST(CEIL(COUNT(*) / $TargetCluster.0) AS BIGINT)) FROM corpus99)"

  // q99 fixture cap (the q81 convention): the retrain-LOOP mechanics are
  // scale-independent and the drifted regime is a mutual-duplicate
  // blob, so the fixture must not grow Σ|component|² with the data
  // decade; retrain COST at scale is measured separately (SemIndexScale)
  private val Cap99 = 2048L

  /** q99's retrained semantic index, built ONCE per (session, data dir)
    * — the EXECUTABLE staleness loop, oracle-gated (VERDICT r15 missing
    * #3: every other maintenance primitive was oracle-covered, retrain
    * was spec-only). Drift that is MAXIMAL by construction yet
    * oracle-replayable: the quantizer is frozen on the corpus padded
    * with a zero 65th dimension, and the drifted batch is the pure 65th
    * basis direction under shifted ids — an encoder-version upgrade
    * emitting a dimension the old quantizer never saw. Every frozen
    * centroid has EXACTLY zero mass there (means of zeros), so the
    * batch's assigned cosine is exactly 0.0 — no in-span transform can
    * do this (10 Gaussian blobs in 64-dim put a ~0.18 max-cosine floor
    * under ANY fixed direction, within 0.10 of init quality).
    * `isStale` must flag it (`require`d), the batch is ingested anyway
    * (the contract: never reject data), [[SemanticIndex.retrain]]
    * rebuilds against centroids trained on the index's OWN recovered
    * corpus — both regimes — and the same direction must then read
    * in-distribution (`require`d): the new regime owns a centroid, its
    * probe cosine is 1.0.
    */
  private def retrainedSemRoot(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.core.SessionTempRoots.of(s, d, "graft_semidx_rt_") { root =>
      val base = Tables.embeddings(s, d).filter(col("vec_id") < Cap99)
      val slice = base.filter(col("vec_id") % 4 =!= 0)
        .select(col("vec_id"),
          concat(col("embedding"), array(lit(0.0f))).as("embedding"))
      SemanticIndex.init(s, root, slice, Tau, TargetCluster.toLong, Iters)
      SemanticIndex.ingest(slice, root).count()
      val off = Tables.embeddings(s, d).agg(max("vec_id")).head().getLong(0) + 1L
      val ood = base.filter(col("vec_id") % 4 === 0)
        .select((col("vec_id") + off).as("vec_id"),
          concat(transform(col("embedding"), _ => lit(0.0f)), array(lit(1.0f)))
            .as("embedding"))
      require(SemanticIndex.isStale(ood, root),
        "q99 fixture premise: the new-dimension batch must flag stale pre-retrain")
      SemanticIndex.ingest(ood, root).count()
      SemanticIndex.retrain(s, root)
      require(!SemanticIndex.isStale(ood, root),
        "q99 fixture premise: post-retrain the drifted regime must read in-distribution")
    }

  /** q99: drift → `isStale` → ingest-anyway → `retrain` → re-read, hash
    * gated end to end. The declared result reads the RETRAINED index
    * (fresh centroids over both regimes, params inherited from the old
    * meta), so the oracle — one monolithic rebuild trained on the
    * derived corpus `corpus99` (original slice ∪ negated shifted batch)
    * at the re-derived K — hash-checks the WHOLE loop: the staleness
    * decision points are `require`d in the fixture, and a retrain that
    * loses rows, forgets to inherit params, trains on the wrong corpus,
    * or swaps in a stale copy is a red row. `n_ood_kept` pins the
    * drifted regime's own dedup outcome per cluster.
    */
  val semanticRetrainLoop: Q = Q(
    "q99_semantic_retrain_loop",
    s"""WITH RECURSIVE corpus99 AS MATERIALIZED (
       |  SELECT vec_id,
       |         list_append(embedding, CAST(0.0 AS REAL)) AS embedding
       |  FROM embeddings WHERE vec_id % 4 <> 0 AND vec_id < $Cap99
       |  UNION ALL
       |  SELECT vec_id + (SELECT 1 + MAX(vec_id) FROM embeddings) AS vec_id,
       |         list_append(list_transform(embedding, x -> CAST(0.0 AS REAL)),
       |                     CAST(1.0 AS REAL)) AS embedding
       |  FROM embeddings WHERE vec_id % 4 = 0 AND vec_id < $Cap99),
       |${IvfSearch.duckIndexCtesFrom(KSql99, Iters, "corpus99")},
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
       |       CAST(COUNT(*) FILTER (WHERE i.vec_id > (SELECT MAX(vec_id) FROM embeddings)
       |                             AND d.id IS NULL) AS BIGINT) AS n_ood_kept
       |FROM idx i LEFT JOIN dropped d ON i.vec_id = d.id
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val root = retrainedSemRoot(s, d)
    val off = Tables.embeddings(s, d).agg(max("vec_id")).head().getLong(0)
    val obs = org.apache.spark.sql.Observation()
    val full = SemanticIndex.decisions(s, root)
      .observe(obs, count(lit(1)).as("total"),
        coalesce(sum(when(!col("kept"), 1L)), lit(0L)).as("dropped"),
        coalesce(sum(when(col("vec_id") > off, 1L)), lit(0L)).as("ood_n"))
    val grouped = graft.core.Checkpoints.stable(full
      .groupBy(col("cluster").cast("long").as("ivf_cluster"))
      .agg(count(lit(1)).as("n_members"),
        coalesce(sum(when(col("kept"), 1L)), lit(0L)).cast("long").as("n_kept"),
        sum(when(col("kept"), col("vec_id"))).cast("long").as("sum_kept_ids"),
        coalesce(sum(when(col("kept") && col("vec_id") > off, 1L)), lit(0L))
          .cast("long").as("n_ood_kept")))
    val (total, dropped, oodN) =
      if (graft.core.Checkpoints.isDisabled(s)) { // plan-spec mode
        val p = full.agg(count(lit(1)),
          coalesce(sum(when(!col("kept"), 1L)), lit(0L)),
          coalesce(sum(when(col("vec_id") > off, 1L)), lit(0L))).head()
        (p.getLong(0), p.getLong(1), p.getLong(2))
      } else { val m = obs.get
        (m("total").asInstanceOf[Long], m("dropped").asInstanceOf[Long],
          m("ood_n").asInstanceOf[Long]) }
    require(oodN >= 1, "q99 premise: the drifted regime is absent from the index")
    require(dropped >= 1 && dropped < total,
      s"q99 premise: dedup dropped $dropped of $total — no work done")
    grouped.orderBy("ivf_cluster")
  }

  /** q100's STREAMED semantic index, built ONCE per (session, data dir):
    * the whole corpus lands as three parquet chunk files under a stream
    * source dir, and [[graft.streaming.StreamOps.semanticIndexStream]]
    * drains them one file per micro-batch (maxFilesPerTrigger=1) into a
    * rank-1 index whose centroids were frozen on the %4!=0 slice — the
    * q97 ingest loop driven by Structured Streaming instead of a caller
    * loop. Then the fixture simulates the WORST restart: the checkpoint
    * is discarded and the stream re-runs end to end, re-delivering
    * every file. Ingest's id-level idempotence must absorb the full
    * replay — `require`d on the index row count here, and hash-gated
    * downstream: a lost micro-batch, a double-committed replay, or a
    * divergence between the streamed and monolithic states is a red
    * CORRECTNESS row.
    */
  // q100/q101 fixture cap (the q81/q99 convention): the STREAM and
  // TIME-TRAVEL mechanics are scale-independent, so the fixtures must
  // not re-pay full-corpus index builds per suite run at sf100 (a 2 M-
  // vector streamed build + full replay stalled the sf100 driver's
  // heartbeats for >10 min); ingest/retrain COST at scale is measured
  // separately (SemIndexScale; the UNCAPPED q97/q98 gates). The cap
  // never binds at the oracle-checked driver scales (sf0.1 = 2 000
  // vectors), and both engines apply it identically.
  private val Cap100 = 100000L

  private def streamedSemRoot(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.core.SessionTempRoots.of(s, d, "graft_semidx_st_") { root =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") < Cap100)
      val idx = s"$root/idx"
      SemanticIndex.init(s, idx, emb.filter(col("vec_id") % 4 =!= 0),
        Tau, TargetCluster.toLong, Iters)
      val src = s"$root/src"
      (0 until 3).foreach { i =>
        emb.filter(pmod(col("vec_id"), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(src)
      }
      def stream() = s.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      require(graft.streaming.StreamOps
        .semanticIndexStream(stream(), idx, s"$root/ck1").awaitTermination(300000),
        "q100 fixture premise: the stream must drain")
      val rows = SemanticIndex.indexRows(s, idx).count()
      require(graft.streaming.StreamOps
        .semanticIndexStream(stream(), idx, s"$root/ck2").awaitTermination(300000),
        "q100 fixture premise: the replay stream must drain")
      require(SemanticIndex.indexRows(s, idx).count() == rows,
        "q100 fixture premise: the full checkpoint replay added index rows")
      // expected capped-corpus count, derived ONCE from the immutable
      // input parquet (the q101 pin.txt pattern): the per-execution
      // premise compares its OBSERVED total against this instead of
      // re-scanning the corpus on every timed pass
      java.nio.file.Files.write(java.nio.file.Paths.get(root, "expect.txt"),
        emb.count().toString.getBytes("UTF-8")): Unit
    }

  /** q100: STREAMING ingest into the persisted semantic index — q97's
    * incremental dedup loop as Structured Streaming, exactly-once under
    * at-least-once delivery (see [[streamedSemRoot]]: the fixture
    * replays the ENTIRE stream from a lost checkpoint). The declared
    * result is the full corpus's per-cluster dedup aggregate read from
    * the streamed index; the oracle replays one monolithic
    * frozen-centroid rebuild, so micro-batch boundaries, the commit
    * order, and replay absorption must all be invisible in the final
    * state — the q97 batches≡rebuild theorem extended to the streaming
    * surface.
    */
  private val KSql100 =
    s"(SELECT GREATEST(8, CAST(CEIL(COUNT(*) / $TargetCluster.0) AS BIGINT)) " +
      s"FROM corpus100 WHERE vec_id % 4 <> 0)"

  val semanticStreamIngest: Q = Q(
    "q100_semantic_stream_ingest",
    s"""WITH RECURSIVE corpus100 AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < $Cap100),
       |${IvfSearch.duckIndexCtesFrom(KSql100, Iters, "corpus100", "vec_id % 4 <> 0")},
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
    val root = streamedSemRoot(s, d)
    val obs = org.apache.spark.sql.Observation()
    val full = SemanticIndex.decisions(s, s"$root/idx")
      .observe(obs, count(lit(1)).as("total"),
        coalesce(sum(when(!col("kept"), 1L)), lit(0L)).as("dropped"))
    val grouped = graft.core.Checkpoints.stable(full
      .groupBy(col("cluster").cast("long").as("ivf_cluster"))
      .agg(count(lit(1)).as("n_members"),
        coalesce(sum(when(col("kept"), 1L)), lit(0L)).cast("long").as("n_kept"),
        sum(when(col("kept"), col("vec_id"))).cast("long").as("sum_kept_ids")))
    val (total, dropped) =
      if (graft.core.Checkpoints.isDisabled(s)) {
        val p = full.agg(count(lit(1)),
          coalesce(sum(when(!col("kept"), 1L)), lit(0L))).head(); (p.getLong(0), p.getLong(1))
      } else { val m = obs.get
        (m("total").asInstanceOf[Long], m("dropped").asInstanceOf[Long]) }
    // every vector exactly once: a lost micro-batch or a double-committed
    // replay is loud here before the hash gate even runs. The expected
    // count is the fixture-recorded capped-corpus count (expect.txt —
    // a pure function of the immutable input, derived once per session);
    // `total` is the per-execution OBSERVED total of the streamed index.
    val expectN = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "expect.txt")), "UTF-8").trim.toLong
    require(total == expectN,
      s"q100 premise: streamed index holds $total vectors, not the capped corpus ($expectN)")
    require(dropped >= 1 && dropped < total,
      s"q100 premise: dedup dropped $dropped of $total — no work done")
    grouped.orderBy("ivf_cluster")
  }

  /** q101's time-travel fixture, built ONCE per (session, data dir):
    * init on the %4!=0 slice, ingest that slice in two batches, PIN the
    * manifest seq, then mutate the index three ways a pinned reader
    * must never see — ingest the %4==0 batch, a forced compaction
    * (rewrites live files), and a full retrain (replaces every file,
    * the centroids, and the meta document). The pin and the index root
    * are both returned via the fixture dir.
    */
  private def timeTravelSemRoot(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.core.SessionTempRoots.of(s, d, "graft_semidx_tt_") { root =>
      val corpus = Tables.embeddings(s, d).filter(col("vec_id") < Cap100)
      val prefix = corpus.filter(col("vec_id") % 4 =!= 0)
      val idx = s"$root/idx"
      SemanticIndex.init(s, idx, prefix, Tau, TargetCluster.toLong, Iters)
      SemanticIndex.ingest(prefix.filter(col("vec_id") % 2 === 1), idx).count()
      SemanticIndex.ingest(prefix.filter(col("vec_id") % 2 === 0), idx).count()
      val pin = SemanticIndex.currentVersion(idx)
      // the future the pin must not see: an ingest, a compaction that
      // rewrites the pinned clusters' files, and a retrain that swaps
      // the whole index including its quantizer
      SemanticIndex.ingest(corpus.filter(col("vec_id") % 4 === 0), idx).count()
      val (cb, ca) = SemanticIndex.compact(s, idx)
      require(ca < cb, s"q101 fixture premise: compaction was a no-op ($cb -> $ca files)")
      SemanticIndex.retrain(s, idx)
      // expected premise counts, derived from the corpus ONCE here (they
      // are pure functions of the immutable input parquet): per-execution
      // requires compare MEASURED totals against these instead of
      // re-scanning the corpus on every timed pass
      java.nio.file.Files.write(java.nio.file.Paths.get(root, "pin.txt"),
        s"$pin ${prefix.count()} ${corpus.count()}".getBytes("UTF-8")): Unit
    }

  /** q101: INDEX TIME TRAVEL — the q71 catalog shape on the persisted
    * semantic index, possible only because every ingest/compact/retrain
    * is a versioned manifest commit (round 17's protocol change: no
    * rename ever moves a file a reader could hold, so a pinned seq
    * stays byte-readable until an explicit vacuum). The declared result
    * reads [[SemanticIndex.decisionsAsOf]] at a seq pinned BEFORE a
    * later ingest, a compaction that rewrote the pinned clusters'
    * files, and a full retrain; the oracle replays the monolithic
    * frozen-centroid rebuild of the PREFIX corpus only. Any leak of
    * post-pin state — the new batch's rows, the compacted rewrite, the
    * retrained quantizer or labels — is a red CORRECTNESS row.
    */
  val semanticTimeTravel: Q = Q(
    "q101_semantic_time_travel",
    s"""WITH RECURSIVE corpus101 AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id % 4 <> 0 AND vec_id < $Cap100),
       |${IvfSearch.duckIndexCtesFrom(
            s"(SELECT GREATEST(8, CAST(CEIL(COUNT(*) / $TargetCluster.0) AS BIGINT)) FROM corpus101)",
            Iters, "corpus101")},
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
    val root = timeTravelSemRoot(s, d)
    val Array(pin, prefixN, corpusN) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "pin.txt")), "UTF-8").trim
      .split(" ").map(_.toLong)
    val idx = s"$root/idx"
    val obs = org.apache.spark.sql.Observation()
    val pinned = SemanticIndex.decisionsAsOf(s, idx, pin)
      .observe(obs, count(lit(1)).as("total"),
        coalesce(sum(when(!col("kept"), 1L)), lit(0L)).as("dropped"))
    val grouped = graft.core.Checkpoints.stable(pinned
      .groupBy(col("cluster").cast("long").as("ivf_cluster"))
      .agg(count(lit(1)).as("n_members"),
        coalesce(sum(when(col("kept"), 1L)), lit(0L)).cast("long").as("n_kept"),
        sum(when(col("kept"), col("vec_id"))).cast("long").as("sum_kept_ids")))
    val (total, dropped) =
      if (graft.core.Checkpoints.isDisabled(s)) {
        val p = pinned.agg(count(lit(1)),
          coalesce(sum(when(!col("kept"), 1L)), lit(0L))).head(); (p.getLong(0), p.getLong(1))
      } else { val m = obs.get
        (m("total").asInstanceOf[Long], m("dropped").asInstanceOf[Long]) }
    // the premise IS the feature: the pinned view holds exactly the
    // prefix corpus while the LIVE index has since ingested the rest
    // and been retrained. Expected counts come from the fixture record
    // (pure functions of the immutable input, derived once per session
    // — the q94 metadata pattern); the MEASURED side of each compare
    // still runs per execution: `total` rides the result traversal as
    // an observed metric, and the live-index count is a real read of
    // the current manifest state.
    require(total == prefixN,
      s"q101 premise: pinned view holds $total vectors, not the prefix corpus ($prefixN)")
    require(SemanticIndex.decisions(s, idx).count() == corpusN,
      "q101 premise: the live index must have moved past the pin")
    require(dropped >= 1 && dropped < total,
      s"q101 premise: dedup dropped $dropped of $total — no work done")
    grouped.orderBy("ivf_cluster")
  }

  /** q102: ANN SERVING from the persisted incremental index — the
    * search half of the build-once/serve-forever contract q97's ingest
    * keeps current. [[SemanticIndex.searchTopK]] probes the query
    * batch's nProbe nearest frozen centroids and reads ONLY those
    * clusters' files (the read is manifest-pruned before any file
    * opens — a serving batch over a 2 B-vector index scans nProbe
    * cells per query, never the corpus). The oracle replays the whole
    * pipeline — frozen-centroid training on the %4≠0 slice, probe
    * selection, candidate join confined to the probed cells, exact
    * cosine rank — arithmetic-for-arithmetic (the q49 shape, but
    * against the INCREMENTALLY-BUILT index: three appends + a
    * compaction stand between init and this search, so any row they
    * lost, duplicated, or mis-assigned is a red rank here). Queries
    * vec_id<5 include %4==0 ids the index has never ingested: serving
    * must not require the query to be indexed.
    */
  val annServeIndex: Q = Q(
    "q102_ann_serve_index",
    s"""WITH ${IvfSearch.duckIndexCtesTrainedK(KSqlTrain, Iters, "vec_id % 4 <> 0")},
       |probes AS (
       |  SELECT q_id, q_emb, cluster FROM (
       |    SELECT e.vec_id AS q_id, e.embedding AS q_emb, c.cluster,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${duckDot("e.embedding", "c.centroid")} /
       |          (${duckNorm("e.embedding")} * ${duckNorm("c.centroid")}) DESC,
       |        c.cluster ASC) AS __rn
       |    FROM embeddings e CROSS JOIN cent$Iters c
       |    WHERE e.vec_id < 5)
       |  WHERE __rn <= 3),
       |cand AS (
       |  SELECT p.q_id, p.q_emb, i.vec_id AS n_id, i.embedding AS n_emb
       |  FROM probes p JOIN idx i USING (cluster)
       |  WHERE i.vec_id <> p.q_id AND i.vec_id % 4 <> 0)
       |SELECT q_id, n_id, rnk FROM (
       |  SELECT q_id, n_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
       |      ${duckDot("q_emb", "n_emb")} /
       |        (${duckNorm("q_emb")} * ${duckNorm("n_emb")}) DESC, n_id) AS BIGINT) AS rnk
       |  FROM cand)
       |WHERE rnk <= 3
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val root = persistedSemRoot(s, d)
    val obs = org.apache.spark.sql.Observation()
    val out = SemanticIndex.searchTopK(s, root,
      Tables.embeddings(s, d).filter(col("vec_id") < 5), k = 3, nProbe = 3)
      .select("q_id", "n_id", "rnk")
      .observe(obs, count(lit(1)).as("n"))
    val got = graft.core.Checkpoints.stable(out)
    val n = if (graft.core.Checkpoints.isDisabled(s)) got.count() // plan-spec mode
      else obs.get("n").asInstanceOf[Long]
    require(n >= 5,
      "q102 premise: every query must rank neighbors from the probed cells")
    got.orderBy("q_id", "rnk")
  }

  val all: Seq[Q] = Seq(semanticDedup, semanticDedupMultiProbe,
    semanticIncremental.gated, semanticIncrementalMultiProbe.gated,
    semanticRetrainLoop.gated, semanticStreamIngest.gated,
    semanticTimeTravel.gated, annServeIndex)
}
