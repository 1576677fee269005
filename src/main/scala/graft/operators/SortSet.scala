package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog

/** Sort / limit / top-k and set operations (SURVEY.md §2.6–§2.7).
  *
  * Scale notes: Q22 compiles to TakeOrderedAndProject — per-partition top-20
  * heaps merged on the driver, no global sort, no shuffle of the 100 TB
  * fact. Set ops (Q23–Q25) are Catalyst-rewritten to aggregates/semi/anti
  * joins on the (tiny, distinct) key domain.
  */
object SortSet {

  /** Q22 — global top-k without a full sort. */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.lineitem
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 4).as("price"))
      .orderBy(desc_nulls_last("price"), asc_nulls_first("l_orderkey"),
        asc_nulls_first("l_linenumber"))
      .limit(20)
  }

  val q22Oracle: String =
    """SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 4) AS price
      |FROM lineitem
      |ORDER BY price DESC NULLS LAST, l_orderkey NULLS FIRST, l_linenumber NULLS FIRST
      |LIMIT 20""".stripMargin

  /** Q23 — UNION ALL vs UNION(distinct) cardinalities. */
  def q23(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val u = c.customer.select(col("c_nationkey").as("k"))
      .unionAll(c.supplier.select(col("s_nationkey").as("k")))
    u.agg(lit("all").as("label"), count(lit(1)).as("n"))
      .unionAll(u.distinct().agg(lit("distinct").as("label"), count(lit(1)).as("n")))
      .orderBy(asc_nulls_first("label"))
  }

  val q23Oracle: String =
    """WITH u AS (
      |  SELECT c_nationkey AS k FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS k FROM supplier)
      |SELECT 'all' AS label, COUNT(*) AS n FROM u
      |UNION ALL
      |SELECT 'distinct' AS label, COUNT(DISTINCT k) AS n FROM u
      |ORDER BY label NULLS FIRST""".stripMargin

  /** Q24 — INTERSECT (distinct semantics both engines). */
  def q24(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.customer.select(col("c_nationkey").as("k"))
      .intersect(c.supplier.select(col("s_nationkey").as("k")))
      .orderBy(asc_nulls_first("k"))
  }

  val q24Oracle: String =
    """SELECT c_nationkey AS k FROM customer
      |INTERSECT
      |SELECT s_nationkey AS k FROM supplier
      |ORDER BY k NULLS FIRST""".stripMargin

  /** Q25 — EXCEPT: nations with customers but no suppliers. */
  def q25(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.customer.select(col("c_nationkey").as("k"))
      .except(c.supplier.select(col("s_nationkey").as("k")))
      .orderBy(asc_nulls_first("k"))
  }

  val q25Oracle: String =
    """SELECT c_nationkey AS k FROM customer
      |EXCEPT
      |SELECT s_nationkey AS k FROM supplier
      |ORDER BY k NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q22" -> (q22 _), "Q23" -> (q23 _), "Q24" -> (q24 _), "Q25" -> (q25 _))

  def oracles: Map[String, String] = Map(
    "Q22" -> q22Oracle, "Q23" -> q23Oracle, "Q24" -> q24Oracle,
    "Q25" -> q25Oracle)
}
