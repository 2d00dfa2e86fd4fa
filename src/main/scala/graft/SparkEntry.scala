package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is declared here as a named
  * query over the driver testdata, with (where SQL-expressible) the exact
  * DuckDB oracle SQL. Column names and value conventions are aligned on
  * both sides (see graft.queries.Q).
  */
object SparkEntry {

  private val allQueries: Seq[Q] =
    Relational.all ++ EventsOps.all ++ TextOps.all ++ Embeddings.all ++
      LlmOps.all ++ Extended.all ++ CurationOps.all ++ CorpusStatsOps.all ++
      MediaOps.all ++ StreamingQueries.all ++ IngestGates.all ++ ScaleJoinGates.all ++
      MultiWriterGate.all ++ LakeGates.all ++ MaintenanceGate.all ++
      FeatureGate.all ++ StreamingCurationGate.all ++ GapRateGate.all ++
      LakeAuditGate.all ++ ContinuityGate.all ++ BulkIngestGate.all ++
      SketchOps.all ++ StatsSkipGate.all ++ SemanticOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** Names of the fixture-gate queries (real lake/stream/forked-JVM work
    * per execution, oracle replays arithmetic) — Bench reports their
    * total separately from the declarative suite so the structural cost
    * asymmetry doesn't inflate the declarative headline.
    */
  def gateQueries: Set[String] = allQueries.filter(_.gate).map(_.name).toSet
}
