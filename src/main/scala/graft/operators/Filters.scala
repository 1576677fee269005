package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog

/** Projection / filter / predicate operators (SURVEY.md §2.2).
  *
  * Scale notes: all predicates here are Catalyst-pushable — range predicates
  * on `l_shipdate`/`l_discount`/`l_quantity` reach the parquet reader as
  * row-group + page-level filters (`PushedFilters` in the formatted plan),
  * and the projection prunes the scan to the referenced columns only. At
  * 100 TB this is the difference between scanning 3 columns of a few
  * row-groups vs. the whole table.
  */
object Filters {

  /** Q02 — projection + range predicates on lineitem. */
  def q02(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.lineitem
      .filter(
        col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") <  to_timestamp(lit("1997-01-01")) &&
        col("l_discount").between(0.02, 0.09) &&
        col("l_quantity") < 25)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("net"))
      .orderBy(asc_nulls_first("l_orderkey"), asc_nulls_first("l_linenumber"))
  }

  val q02Oracle: String =
    """SELECT l_orderkey, l_linenumber,
      |  ROUND(l_extendedprice * (1.0 - l_discount), 4) AS net
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.09
      |  AND l_quantity < 25
      |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST""".stripMargin

  /** Q03 — compound boolean predicates over orders. */
  def q03(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.orders
      .filter(
        (col("o_orderstatus").isin("F", "P") && col("o_orderpriority").like("1-%")) ||
        (col("o_totalprice") > 200000 && !(col("o_orderstatus") === "O")))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"))
  }

  val q03Oracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total
      |FROM orders
      |WHERE (o_orderstatus IN ('F','P') AND o_orderpriority LIKE '1-%')
      |   OR (o_totalprice > 200000 AND NOT o_orderstatus = 'O')
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus NULLS FIRST""".stripMargin

  /** Q03b — three-valued logic: NULLIF / COALESCE / IS NULL. */
  def q03b(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.orders
      .filter(nullif(col("o_orderstatus"), lit("P")).isNull)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("o_orderstatus"))
  }

  val q03bOracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n
      |FROM orders
      |WHERE NULLIF(o_orderstatus, 'P') IS NULL
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("Q02" -> (q02 _), "Q03" -> (q03 _), "Q03b" -> (q03b _))

  def oracles: Map[String, String] =
    Map("Q02" -> q02Oracle, "Q03" -> q03Oracle, "Q03b" -> q03bOracle)
}
