package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Scan-level proofs that filters and projections reach the parquet
  * reader: `PushedFilters` must carry the predicates and `ReadSchema`
  * must carry ONLY the referenced columns. At 100 TB these two lines in
  * the scan are the difference between reading gigabytes and reading
  * everything — so they are pinned here, not assumed.
  */
class PushdownSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Execute and return the FileSourceScanExec reading `table`,
    * descending through AQE wrappers (AdaptiveSparkPlanExec hides its
    * stages from collectLeaves).
    */
  private def scanOf(df: DataFrame, table: String): FileSourceScanExec = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).find(
      _.relation.location.rootPaths.exists(_.toString.contains(table)))
      .getOrElse(fail(s"no parquet scan of $table in the plan"))
  }

  test("q02: range + quantity predicates pushed to the lineitem scan; columns pruned") {
    val scan = scanOf(SparkEntry.queries("q02_filter_project")(spark, sf), "lineitem")
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      pushed.contains("LessThan(l_shipdate") &&
      pushed.contains("GreaterThan(l_quantity"),
      s"missing pushed predicates: $pushed")
    val readCols = scan.metadata("ReadSchema")
    assert(readCols.contains("l_orderkey") && !readCols.contains("l_comment"),
      s"projection not pruned at the scan: $readCols")
    // 4 projected + 2 filter columns, of lineitem's 16
    assert(scan.requiredSchema.fields.length <= 6,
      s"scan reads ${scan.requiredSchema.fields.length} columns, expected <= 6")
  }

  test("q54: doc_id slice predicate pushed to the documents scan") {
    val scan = scanOf(SparkEntry.queries("q54_repetition_stats")(spark, sf), "documents")
    assert(scan.metadata("PushedFilters").contains("LessThan(doc_id,200)"),
      s"slice not pushed: ${scan.metadata("PushedFilters")}")
    assert(!scan.metadata("ReadSchema").contains("source"),
      "unused source column must be pruned from the text scan")
  }

  test("q41: corpus scan of embeddings prunes to id + vector columns") {
    // other suites cache the embeddings table; a cached plan's leaf is an
    // InMemoryTableScan, not the parquet scan this test pins
    spark.catalog.clearCache()
    val scan = scanOf(SparkEntry.queries("q41_cosine_topk")(spark, sf), "embeddings")
    val n = scan.requiredSchema.fields.map(_.name).toSet
    assert(n.contains("vec_id") && n.contains("embedding"),
      s"scan must read the id and vector: $n")
  }
}
