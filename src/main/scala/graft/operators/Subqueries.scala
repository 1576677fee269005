package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Catalog

/** Subquery forms through the SQL entry point (SURVEY.md §3.2 E2, §4
  * decorrelation): correlated scalar subqueries and IN-subqueries run as
  * the SAME SQL text in Spark and DuckDB — Catalyst decorrelates the
  * scalar subquery into an aggregate+join (RewriteCorrelatedScalarSubquery)
  * and the IN into a left-semi join; neither executes per-row.
  */
object Subqueries {

  /** Q56 — correlated scalar subquery: customers above their own nation's
    * average balance, counted per nation.
    */
  val q56Sql: String =
    """SELECT c1.c_nationkey AS nationkey, COUNT(*) AS n_above
      |FROM customer c1
      |WHERE c1.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
      |                      WHERE c2.c_nationkey = c1.c_nationkey)
      |GROUP BY c1.c_nationkey
      |ORDER BY nationkey NULLS FIRST""".stripMargin

  def q56(spark: SparkSession, dir: String): DataFrame = {
    Catalog(spark, dir).register()
    spark.sql(q56Sql)
  }

  /** Q57 — IN-subquery (semi-join rewrite): suppliers in nations that have
    * a customer with balance > 9000, counted per nation.
    */
  val q57Sql: String =
    """SELECT s_nationkey, COUNT(*) AS n
      |FROM supplier
      |WHERE s_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9000)
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey NULLS FIRST""".stripMargin

  def q57(spark: SparkSession, dir: String): DataFrame = {
    Catalog(spark, dir).register()
    spark.sql(q57Sql)
  }

  /** Q95 — correlated LATERAL subquery (top-N-per-group as a join
    * operator): each nation's top-2 suppliers by balance, the lateral
    * derived table re-evaluated per outer row. Same SQL text both
    * engines. Catalyst plans the correlated lateral as a
    * LateralJoin → DomainJoin rewrite — a per-group limit pushed into
    * the join, not a per-row re-execution; the window-function Q18 shape
    * is the other spelling of the same semantics, covered separately.
    */
  val q95Sql: String =
    """SELECT n.n_name, t.s_name, ROUND(t.s_acctbal, 4) AS acctbal,
      |  CAST(t.rnk AS BIGINT) AS rnk
      |FROM nation n, LATERAL (
      |  SELECT s_name, s_acctbal,
      |    ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rnk
      |  FROM supplier WHERE s_nationkey = n.n_nationkey
      |  ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t
      |ORDER BY n_name NULLS FIRST, rnk NULLS FIRST""".stripMargin

  def q95(spark: SparkSession, dir: String): DataFrame = {
    Catalog(spark, dir).register()
    spark.sql(q95Sql)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q56" -> (q56 _), "Q57" -> (q57 _), "Q95" -> (q95 _))

  def oracles: Map[String, String] = Map(
    "Q56" -> q56Sql, "Q57" -> q57Sql, "Q95" -> q95Sql)
}
