package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog

/** Aggregation operators (SURVEY.md §2.4): hash aggregate with partial/final
  * phases, exact & approximate distinct, rollup/cube/grouping sets, HAVING.
  *
  * Scale notes: every groupBy here is a map-side-combinable hash aggregate
  * (HashAggregateExec partial → shuffle on group keys → final). Group-key
  * cardinality is tiny relative to input (flags, statuses, nations), so the
  * shuffle moves only partial aggregate buffers — the pattern that survives
  * a 100 TB scan.
  */
object Aggregates {

  /** Q13 — TPC-H Q1 shape: multi-measure hash aggregate over lineitem. */
  def q13(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val disc  = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = disc * (lit(1.0) + col("l_tax"))
    c.lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")).cast("double"), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")).cast("double"), 4).as("sum_base_price"),
        round(sum(disc).cast("double"), 4).as("sum_disc_price"),
        round(sum(charge).cast("double"), 4).as("sum_charge"),
        round(avg(col("l_quantity")).cast("double"), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")).cast("double"), 4).as("avg_price"),
        round(avg(col("l_discount")).cast("double"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  val q13Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(CAST(SUM(l_quantity) AS DOUBLE), 4) AS sum_qty,
      |  ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 4) AS sum_base_price,
      |  ROUND(CAST(SUM(l_extendedprice * (1.0 - l_discount)) AS DOUBLE), 4) AS sum_disc_price,
      |  ROUND(CAST(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) AS DOUBLE), 4) AS sum_charge,
      |  ROUND(CAST(AVG(l_quantity) AS DOUBLE), 4) AS avg_qty,
      |  ROUND(CAST(AVG(l_extendedprice) AS DOUBLE), 4) AS avg_price,
      |  ROUND(CAST(AVG(l_discount) AS DOUBLE), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("Q13" -> (q13 _))

  def oracles: Map[String, String] =
    Map("Q13" -> q13Oracle)
}
