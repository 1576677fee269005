package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog

/** Wide/long reshaping — the PIVOT / UNPIVOT surface (SQL-2016 PIVOT;
  * Spark's `RelationalGroupedDataset.pivot` and `Dataset.unpivot`).
  *
  * Scale notes: a pivot with an EXPLICIT value list is a single hash
  * aggregate whose measures are conditional — one scan, one shuffle on
  * the row key, output width bounded by |values|·|measures|. (Omitting
  * the value list triggers Spark's extra distinct-collect job AND makes
  * the schema data-dependent — never do that at 100 TB.) Unpivot is an
  * Expand: each row fans out to |measures| rows map-side, no shuffle of
  * its own; the melt is free and the aggregate after it is an ordinary
  * bounded groupBy.
  */
object Reshape {

  /** Q143 — pivot the orders table: order counts and rounded revenue per
    * priority (rows) × status (explicit columns F/O/P). Column names are
    * Spark's `<value>_<measure>` pivot convention, duplicated literally
    * in the oracle's conditional aggregates.
    */
  def q143(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.orders
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("rev"))
      .orderBy(asc_nulls_first("o_orderpriority"))
  }

  val q143Oracle: String =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F_n",
      |  ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2)
      |    AS "F_rev",
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O_n",
      |  ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2)
      |    AS "O_rev",
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P_n",
      |  ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2)
      |    AS "P_rev"
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority NULLS FIRST""".stripMargin

  /** Q144 — unpivot (melt) the lineitem measures to long form and
    * re-aggregate: per (returnflag, measure) the row count and rounded
    * measure total. Exercises Spark's native `Dataset.unpivot` (Expand
    * operator) rather than a stack() expression.
    */
  def q144(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.lineitem
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"),
        col("l_tax"))
      .unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        variableColumnName = "measure",
        valueColumnName = "val")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(count(lit(1)).as("n"), round(sum(col("val")), 4).as("total"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("measure"))
  }

  val q144Oracle: String =
    """WITH melted AS (
      |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val
      |  FROM lineitem
      |  UNION ALL
      |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      |  UNION ALL
      |  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
      |SELECT l_returnflag, measure, COUNT(*) AS n,
      |  ROUND(SUM(val), 4) AS total
      |FROM melted
      |GROUP BY 1, 2
      |ORDER BY l_returnflag NULLS FIRST, measure NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q143" -> (q143 _), "Q144" -> (q144 _))

  def oracles: Map[String, String] = Map(
    "Q143" -> q143Oracle, "Q144" -> q144Oracle)
}
