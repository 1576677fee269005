package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Catalog

/** Data-profiling and sequence-analysis operators — the validation layer a
  * pipeline runs before training on a new data drop.
  *
  * Scale: the profile is per-column aggregates over one scan each (null
  * count, distinct count, numeric range) — map-side combinable, bounded
  * output (one row per column). The transition matrix is one user-keyed
  * window pass + a bounded (type × type) aggregate.
  */
object Profiling {

  /** Generic column profile: for each requested column, null count,
    * distinct count, and (numeric columns only) rounded min/max. The
    * numeric range stays DOUBLE — casting min/max to string would hash
    * differently across engines' float formatting.
    */
  def profile(df: DataFrame, cols: Seq[(String, Boolean)]): DataFrame =
    cols.map { case (name, numeric) =>
      val (vmin, vmax): (Column, Column) =
        if (numeric)
          (round(min(col(name)).cast("double"), 4),
            round(max(col(name)).cast("double"), 4))
        else (lit(null).cast("double"), lit(null).cast("double"))
      df.agg(
        count(lit(1)).minus(count(col(name))).as("n_nulls"),
        countDistinct(col(name)).as("n_distinct"),
        vmin.as("vmin"), vmax.as("vmax"))
        .select(lit(name).as("col_name"), col("n_nulls"), col("n_distinct"),
          col("vmin"), col("vmax"))
    }.reduce(_ unionByName _)

  /** Q78 — profile of the orders table's analysis columns. */
  def q78(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    profile(c.orders, Seq(
      ("o_custkey", true), ("o_orderpriority", false),
      ("o_orderstatus", false), ("o_totalprice", true)))
      .orderBy(asc_nulls_first("col_name"))
  }

  val q78Oracle: String =
    """SELECT 'o_custkey' AS col_name,
      |  COUNT(*) - COUNT(o_custkey) AS n_nulls,
      |  COUNT(DISTINCT o_custkey) AS n_distinct,
      |  ROUND(CAST(MIN(o_custkey) AS DOUBLE), 4) AS vmin,
      |  ROUND(CAST(MAX(o_custkey) AS DOUBLE), 4) AS vmax
      |FROM orders
      |UNION ALL SELECT 'o_orderpriority',
      |  COUNT(*) - COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority),
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM orders
      |UNION ALL SELECT 'o_orderstatus',
      |  COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM orders
      |UNION ALL SELECT 'o_totalprice',
      |  COUNT(*) - COUNT(o_totalprice), COUNT(DISTINCT o_totalprice),
      |  ROUND(CAST(MIN(o_totalprice) AS DOUBLE), 4),
      |  ROUND(CAST(MAX(o_totalprice) AS DOUBLE), 4) FROM orders
      |ORDER BY col_name NULLS FIRST""".stripMargin

  /** Q79 — next-event transition matrix: per user, order events by
    * (time, event_id) and count (event_type → next event_type) pairs —
    * the first-order Markov behavior model. One user-partitioned window
    * (lead) + one bounded 5×5 aggregate.
    */
  def q79(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(asc("us"), asc("event_id"))
    c.events
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("next_type"))
  }

  val q79Oracle: String =
    """WITH seq AS (
      |  SELECT event_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS next_type
      |  FROM events)
      |SELECT event_type, next_type, COUNT(*) AS n
      |FROM seq
      |WHERE next_type IS NOT NULL
      |GROUP BY event_type, next_type
      |ORDER BY event_type NULLS FIRST, next_type NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q78" -> (q78 _), "Q79" -> (q79 _))

  def oracles: Map[String, String] = Map(
    "Q78" -> q78Oracle, "Q79" -> q79Oracle)
}
