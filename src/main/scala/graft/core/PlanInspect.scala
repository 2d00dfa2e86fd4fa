package graft.core

import org.apache.spark.sql.DataFrame

/** Executed-plan introspection shared by the pruning gates and the
  * partitioned-lake bench: how many files did the scan actually open?
  * Metrics are populated only after an action has run on the SAME
  * DataFrame instance (a fresh reference re-plans with zeroed metrics).
  */
object PlanInspect {

  /** Sum of `numFiles` across every FileSourceScan in the EXECUTED plan
    * (AQE stages unwrapped). This is the number the month-pruning
    * contract pins: a one-month ts window over a partitioned lake must
    * open only that month's files.
    */
  def filesRead(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }
}
