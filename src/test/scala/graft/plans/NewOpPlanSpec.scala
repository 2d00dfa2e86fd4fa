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
}
