package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AssocQueries, EventQueries, ExtraQueries, FeatureQueries, JoinQueries, MlQueries, MultimodalQueries, PipelineQueries, ProfileQueries, RelationalQueries, SimilarityQueries, SkewQueries, TextQueries, TimeSeriesQueries, TpchQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered queries, one per implemented operator (SURVEY.md §2). */
  private def registry: Vector[Q] =
    RelationalQueries.defs ++ WindowQueries.defs ++ JoinQueries.defs ++
      TimeSeriesQueries.defs ++ TextQueries.defs ++ SimilarityQueries.defs ++
      SkewQueries.defs ++ ExtraQueries.defs ++ TpchQueries.defs ++
      MlQueries.defs ++ PipelineQueries.defs ++ ProfileQueries.defs ++
      MultimodalQueries.defs ++ FeatureQueries.defs ++ EventQueries.defs ++
      AssocQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
