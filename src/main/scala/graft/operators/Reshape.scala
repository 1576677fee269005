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

  /** Q319 — contingency crosstab of l_returnflag × l_linestatus with
    * margins, expected counts, per-cell χ² contributions and Haberman
    * (1973) ADJUSTED standardized residuals z = (O − E) /
    * √(E(1 − R/N)(1 − C/N)) — the cell-level readout that says WHICH
    * cells drive a categorical association, not just whether one
    * exists. The categorical×categorical member of the dependence
    * family (numeric×numeric: Q137/Q161/Q312; numeric×categorical:
    * Q314); TPC-H's returnflag/linestatus are causally coupled through
    * shipdate, so the residual structure is real, not null.
    *
    * Determinism: all counts exact int64; the residual numerator
    * N·O − R·C and the χ² numerator (N·O − R·C)² are exact-int
    * assemblies (the square formed in double AFTER the exact int64
    * difference); expected, chi2_part and z_adj are fixed single
    * expressions rounded 4; the verdict reads the rounded z.
    *
    * Scale notes: ONE hash aggregate onto |flags|·|statuses| cells
    * (≤ 6 for TPC-H, value-domain-bounded always); margins come from
    * window sums over the bounded cell relation — no second corpus
    * scan, no join. N·O holds int64 to N ≈ 3·10⁹ rows.
    */
  def q319(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val cells = c.lineitem
      .groupBy(col("l_returnflag").as("returnflag"),
        col("l_linestatus").as("linestatus"))
      .agg(count(lit(1)).as("n_obs"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("returnflag"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("linestatus"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy()
    cells
      .withColumn("row_total", sum(col("n_obs")).over(wr))
      .withColumn("col_total", sum(col("n_obs")).over(wc))
      .withColumn("nn", sum(col("n_obs")).over(wAll))
      .select(col("returnflag"), col("linestatus"), col("n_obs"),
        col("row_total"), col("col_total"),
        expr("ROUND(CAST(row_total * col_total AS DOUBLE) / nn, 4)")
          .as("expected"),
        expr("ROUND(CAST(nn * n_obs - row_total * col_total AS DOUBLE) *" +
          " (nn * n_obs - row_total * col_total) /" +
          " (CAST(nn AS DOUBLE) * row_total * col_total), 4)")
          .as("chi2_part"),
        expr("CASE WHEN nn = row_total OR nn = col_total THEN NULL ELSE" +
          " ROUND(CAST(nn * n_obs - row_total * col_total AS DOUBLE) /" +
          " SQRT(CAST(row_total AS DOUBLE) * col_total *" +
          " (nn - row_total) * (nn - col_total) / nn), 4) END")
          .as("z_adj"))
      .withColumn("verdict", expr("CASE WHEN z_adj IS NULL " +
        "THEN 'degenerate' WHEN z_adj >= 1.96 THEN 'over' " +
        "WHEN z_adj <= -1.96 THEN 'under' ELSE 'expected' END"))
      .orderBy(asc_nulls_first("returnflag"), asc_nulls_first("linestatus"))
  }

  val q319Oracle: String =
    """WITH cells AS (
      |  SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
      |    CAST(COUNT(*) AS BIGINT) AS n_obs
      |  FROM lineitem GROUP BY 1, 2),
      |marg AS (
      |  SELECT returnflag, linestatus, n_obs,
      |    CAST(SUM(n_obs) OVER (PARTITION BY returnflag) AS BIGINT)
      |      AS row_total,
      |    CAST(SUM(n_obs) OVER (PARTITION BY linestatus) AS BIGINT)
      |      AS col_total,
      |    CAST(SUM(n_obs) OVER () AS BIGINT) AS nn
      |  FROM cells),
      |out AS (
      |  SELECT returnflag, linestatus, n_obs, row_total, col_total,
      |    ROUND(CAST(row_total * col_total AS DOUBLE) / nn, 4)
      |      AS expected,
      |    ROUND(CAST(nn * n_obs - row_total * col_total AS DOUBLE) *
      |      (nn * n_obs - row_total * col_total) /
      |      (CAST(nn AS DOUBLE) * row_total * col_total), 4) AS chi2_part,
      |    CASE WHEN nn = row_total OR nn = col_total THEN NULL ELSE
      |      ROUND(CAST(nn * n_obs - row_total * col_total AS DOUBLE) /
      |      SQRT(CAST(row_total AS DOUBLE) * col_total *
      |      (nn - row_total) * (nn - col_total) / nn), 4) END AS z_adj
      |  FROM marg)
      |SELECT returnflag, linestatus, n_obs, row_total, col_total,
      |  expected, chi2_part, z_adj,
      |  CASE WHEN z_adj IS NULL THEN 'degenerate'
      |    WHEN z_adj >= 1.96 THEN 'over'
      |    WHEN z_adj <= -1.96 THEN 'under'
      |    ELSE 'expected' END AS verdict
      |FROM out
      |ORDER BY returnflag NULLS FIRST, linestatus NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q143" -> (q143 _), "Q144" -> (q144 _), "Q319" -> (q319 _))

  def oracles: Map[String, String] = Map(
    "Q143" -> q143Oracle, "Q144" -> q144Oracle, "Q319" -> q319Oracle)
}
