package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Catalog

/** Change-data-capture / snapshot-diff operators (SURVEY.md §2.13 build
  * addendum; reference checkout is empty, SURVEY.md §0.1). The SCD
  * ("slowly changing dimension") maintenance primitive every warehouse
  * pipeline runs: reconstruct a keyed dimension's state AS OF two
  * points in time and classify every key as inserted / changed /
  * unchanged between them.
  *
  * Scale notes: each as-of state is one filter + one keyed window
  * (row_number over a UNIQUE (ts, event_id) order — deterministic under
  * ties) — shuffle keyed on the dimension key only, O(1) state per row.
  * The diff is a single full-outer join on the same key the states were
  * just partitioned by, so the exchange layout is reused. Nothing is
  * collected; the classification is a map-side CASE over the joined row.
  */
object Cdc {

  /** Latest (event_type, value) per user strictly before `cutoffUs`. */
  def stateAsOf(events: DataFrame, cutoffUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(desc("us"), desc("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
      .filter(col("us") < cutoffUs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"))
  }

  // 2024-01-11 / 2024-01-21 00:00 UTC in epoch-µs — mid-range cutoffs of
  // the fixture's 2024-01-01..30 event span, so all three change classes
  // are populated.
  private val CutoffA = 1704931200000000L
  private val CutoffB = 1705795200000000L

  /** Q112 — SCD snapshot diff: per-user "last event type" dimension as of
    * two cutoff dates, every key classified inserted / changed /
    * unchanged, counted per (class, old_type, new_type) transition cell.
    * (No deletes by construction — an append-only event source only ever
    * adds or rewrites keys.)
    */
  def q112(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events
    val a = stateAsOf(ev, CutoffA).withColumnRenamed("event_type", "old_type")
    val b = stateAsOf(ev, CutoffB).withColumnRenamed("event_type", "new_type")
    a.join(b, Seq("user_id"), "full_outer")
      .withColumn("change_type",
        when(col("old_type").isNull, lit("inserted"))
          .when(col("old_type") === col("new_type"), lit("unchanged"))
          .otherwise(lit("changed")))
      .groupBy(col("change_type"), col("old_type"), col("new_type"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(asc_nulls_first("change_type"), asc_nulls_first("old_type"),
        asc_nulls_first("new_type"))
  }

  val q112Oracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
       |a AS (
       |  SELECT user_id, event_type AS old_type FROM (
       |    SELECT user_id, event_type,
       |      ROW_NUMBER() OVER (PARTITION BY user_id
       |        ORDER BY us DESC, event_id DESC) AS rn
       |    FROM ev WHERE us < $CutoffA) WHERE rn = 1),
       |b AS (
       |  SELECT user_id, event_type AS new_type FROM (
       |    SELECT user_id, event_type,
       |      ROW_NUMBER() OVER (PARTITION BY user_id
       |        ORDER BY us DESC, event_id DESC) AS rn
       |    FROM ev WHERE us < $CutoffB) WHERE rn = 1)
       |SELECT
       |  CASE WHEN a.old_type IS NULL THEN 'inserted'
       |       WHEN a.old_type = b.new_type THEN 'unchanged'
       |       ELSE 'changed' END AS change_type,
       |  a.old_type, b.new_type, COUNT(*) AS n_users
       |FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
       |GROUP BY 1, 2, 3
       |ORDER BY change_type NULLS FIRST, old_type NULLS FIRST,
       |  new_type NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q112" -> (q112 _))

  def oracles: Map[String, String] = Map(
    "Q112" -> q112Oracle)
}
