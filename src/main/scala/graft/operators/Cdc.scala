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

  /** Q268 — SCD Type-2 history build (Kimball's type-2 dimension): the
    * WRITE side of the SCD story whose read side Q112 diffs. Per user,
    * the daily state is the last event type by the unique (ts,
    * event_id) order; consecutive same-state observation days collapse
    * into one VERSION row with [valid_from_day, valid_to_day] validity
    * (gaps-and-islands via change-flag running sum — Q136's identity),
    * valid_to = the day before the next version opens, NULL on the
    * current version. This is the dimension-history table every
    * warehouse maintains so point-in-time joins (Q217's discipline)
    * stay honest.
    *
    * Determinism: state selection rides the unique total order; days
    * are exact epoch-day ints; version numbering is a running sum of
    * exact change flags. No doubles anywhere.
    *
    * Scale notes: one (user, day) aggregate then two user-keyed windows
    * — the exchange is reused across both (same partition key). Output
    * is versions, bounded by observation days per key; nothing is
    * calendar-densified.
    */
  def q268(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val wPick = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(desc("us"), desc("event_id"))
    val obs = c.events
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
      .withColumn("day", expr("us DIV 86400000000"))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"), col("event_type").as("state"))
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val versioned = obs
      .withColumn("chg",
        when(lag(col("state"), 1).over(wSeq).isNull ||
          lag(col("state"), 1).over(wSeq) =!= col("state"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(wSeq).cast("long"))
    val vers = versioned.groupBy(col("user_id"), col("version"))
      .agg(min(col("state")).as("state"),
        min(col("day")).cast("long").as("valid_from_day"),
        count(lit(1)).cast("long").as("n_obs_days"))
    val wVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
    vers
      .withColumn("valid_to_day",
        (lead(col("valid_from_day"), 1).over(wVer) - 1).cast("long"))
      .withColumn("is_current",
        when(col("valid_to_day").isNull, 1L).otherwise(0L))
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from_day"), col("valid_to_day"), col("n_obs_days"),
        col("is_current"))
      .orderBy(asc_nulls_first("user_id"), asc("version"))
  }

  val q268Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |obs AS (
      |  SELECT user_id, day, event_type AS state FROM (
      |    SELECT user_id, day, event_type,
      |      ROW_NUMBER() OVER (PARTITION BY user_id, day
      |        ORDER BY us DESC, event_id DESC) AS rn
      |    FROM ev) r
      |  WHERE rn = 1),
      |flagged AS (
      |  SELECT user_id, day, state,
      |    CASE WHEN LAG(state) OVER w IS NULL
      |      OR LAG(state) OVER w <> state THEN 1 ELSE 0 END AS chg
      |  FROM obs
      |  WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      |versioned AS (
      |  SELECT user_id, day, state,
      |    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY day)
      |      AS BIGINT) AS version
      |  FROM flagged),
      |vers AS (
      |  SELECT user_id, version, MIN(state) AS state,
      |    CAST(MIN(day) AS BIGINT) AS valid_from_day,
      |    CAST(COUNT(*) AS BIGINT) AS n_obs_days
      |  FROM versioned GROUP BY 1, 2)
      |SELECT user_id, version, state, valid_from_day,
      |  CAST(LEAD(valid_from_day) OVER (PARTITION BY user_id
      |    ORDER BY version) - 1 AS BIGINT) AS valid_to_day,
      |  n_obs_days,
      |  CAST(CASE WHEN LEAD(valid_from_day) OVER (PARTITION BY user_id
      |    ORDER BY version) IS NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_current
      |FROM vers
      |ORDER BY user_id NULLS FIRST, version""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q112" -> (q112 _), "Q268" -> (q268 _))

  def oracles: Map[String, String] = Map(
    "Q112" -> q112Oracle, "Q268" -> q268Oracle)
}
