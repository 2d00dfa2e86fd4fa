package graft.plans

import graft.SparkSpec

/** Physical-plan shape assertions for the round-3 operators — the
  * scale claims in their docstrings, checked against the real plans.
  */
class NewOpPlanSpec extends SparkSpec {

  private def plan(q: String): String =
    graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("q52 contamination: benchmark gram set broadcasts; corpus never shuffle-joined") {
    val p = plan("q52_contamination")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"), "corpus-side sort-merge join would shuffle the corpus")
  }

  test("q53 stratified sample: map-only filter, no join, map-side partial agg") {
    val p = plan("q53_stratified_sample")
    assert(!p.contains("Join"), "sampling must not join")
    assert(p.contains("partial"), "missing map-side partial aggregation")
  }

  test("q51 tick bars: no join, map-side partial agg") {
    val p = plan("q51_tick_bars")
    assert(!p.contains("Join"))
    assert(p.contains("partial"), "missing map-side partial aggregation")
  }

  test("no declared query plans a cartesian product (the textbook 100x scale-killer)") {
    // BroadcastNestedLoopJoin with a bounded broadcast side (q16 bands,
    // q41 query set) is fine at scale; CartesianProductExec never is.
    // NOTE: eager checkpoints truncate plans, so this covers the declared
    // plan surface; the checkpoint-heavy sub-pipelines are re-checked
    // un-truncated below.
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val p = fn(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n${p.take(2000)}")
    }
  }

  test("checkpoint-heavy pipelines are cartesian-free in their FULL un-truncated plans") {
    // spark.graft.checkpoint.disabled keeps stable()/pinned() from
    // truncating lineage, so the assertions see every join the pipeline
    // plans — a cross join hidden behind an eager checkpoint would pass
    // the declared-query test above but fail here
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    spark.conf.set(graft.core.Checkpoints.DisabledConf, "true")
    try {
      val pipelines = Map(
        "minhashLsh" -> graft.llm.Dedup.minhashLsh(docs),
        "nearDupClusters" -> graft.llm.Dedup.nearDupClusters(
          graft.llm.Dedup.minhashLsh(docs).filter(org.apache.spark.sql.functions.col("jaccard") >= 0.5)),
        "simhashPairs" -> graft.llm.Dedup.simhashPairs(docs),
        "ivfTrain" -> graft.llm.IvfSearch.trainCentroids(emb, k = 8, iters = 1))
      pipelines.foreach { case (name, df) =>
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("CartesianProduct"),
          s"$name hides a cartesian product behind its checkpoints:\n${p.take(2000)}")
        assert(!p.contains("Scan ExistingRDD"),
          s"$name: checkpoint disable hook did not take effect")
      }
    } finally spark.conf.unset(graft.core.Checkpoints.DisabledConf)
  }

  test("q43 production near-dup: LSH bucket equi-join, not a nested-loop pair scan") {
    val p = plan("q43_embedding_near_dup")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an equi-join on bucket:\n${p.take(2000)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "pair generation must be the bucket equi-join")
  }

  test("q35 jaccard: per-document sizes table is never hint-forced to broadcast") {
    // `sizes` is one row per document — a forced broadcast() hint would
    // OOM the driver at a 10^9-doc corpus. The plan must carry NO
    // broadcast hint for it; whether AQE then picks a broadcast join at
    // bench scale (where sizes IS small) is the optimizer's call, which
    // is exactly the point.
    val analyzed = graft.SparkEntry.queries("q35_jaccard_pairs")(
      spark, "/root/testdata/sf0.001").queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"q35 declares a broadcast hint:\n${analyzed.take(2000)}")
  }

  test("q63/q64 correlated subqueries decorrelate to joins — no per-row subplan survives") {
    for (q <- Seq("q63_exists_subquery", "q64_scalar_subquery")) {
      val exec = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution
      // optimizer must rewrite the correlation into a join
      val opt = exec.optimizedPlan.toString
      assert(opt.contains("Join"), s"$q: expected decorrelated join:\n${opt.take(2000)}")
      // and no correlated-subquery expression may remain in the physical plan
      val p = exec.executedPlan.toString
      assert(!p.toLowerCase.contains("correlated"),
        s"$q: correlated subquery survived to execution:\n${p.take(2000)}")
    }
  }
}
