package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query Qnn from SURVEY.md §2 registers here with its DuckDB
  * oracle twin. Capabilities (C01–C14) that aren't SQL-expressible are
  * exercised in the ScalaTest suites instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.q13(spark, "/root/testdata/sf0.001")

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Scans.queries, Scans.oracles),
      (Filters.queries, Filters.oracles),
      (Joins.queries, Joins.oracles),
      (Aggregates.queries, Aggregates.oracles),
      (Windows.queries, Windows.oracles),
      (SortSet.queries, SortSet.oracles),
      (Scalars.queries, Scalars.oracles),
      (TextOps.queries, TextOps.oracles),
      (VectorOps.queries, VectorOps.oracles),
      (EventTime.queries, EventTime.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (NearDup.queries, NearDup.oracles),
      (Subqueries.queries, Subqueries.oracles),
      (PipelineOps.queries, PipelineOps.oracles),
      (Profiling.queries, Profiling.oracles),
      (Clustering.queries, Clustering.oracles),
      (Graphs.queries, Graphs.oracles),
      (Skyline.queries, Skyline.oracles),
      (Cdc.queries, Cdc.oracles),
      (Density.queries, Density.oracles),
      (Bpe.queries, Bpe.oracles),
      (Stats.queries, Stats.oracles),
      (TextRank.queries, TextRank.oracles),
      (Reshape.queries, Reshape.oracles),
      (Pii.queries, Pii.oracles),
      (Behavior.queries, Behavior.oracles),
      (Trend.queries, Trend.oracles),
      (Quality.queries, Quality.oracles),
      (TensorGates.queries, TensorGates.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
