package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.derive.{EventsAdapter, ViolationDeriver}
import graft.queries.{BehaviorQueries, BloomQueries, CurationQueries, DedupQueries, EmbedQueries, FingerprintQueries, MiningQueries, MultimodalQueries, PipelineQueries, QualityQueries, QueryDef, Relational, StreamAnalyticsQueries, TextQueries, TokDeepQueries, TrainingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is exposed as a named query
  * over the shared test tables; queries with a DuckDB-expressible mirror
  * also appear in [[oracleSql]] for the hash-compare gate.
  */
object SparkEntry {

  /** All registered queries, grouped by module. */
  def allDefs: Seq[QueryDef] =
    Relational.all ++ PipelineQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ EmbedQueries.all ++ MultimodalQueries.all ++
      StreamAnalyticsQueries.all ++ CurationQueries.all ++
      FingerprintQueries.all ++ BloomQueries.all ++ QualityQueries.all ++
      TrainingQueries.all ++ MiningQueries.all ++ BehaviorQueries.all ++
      TokDeepQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core dataflow: telemetry → violation events
    * (SURVEY §3.1). */
  def entry(spark: SparkSession): DataFrame =
    ViolationDeriver(EventsAdapter.telemetryFromEvents(
      Tables.events(spark, "/root/testdata/sf0.001")))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
