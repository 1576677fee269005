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
  def q268(spark: SparkSession, dir: String): DataFrame =
    scd2History(Catalog(spark, dir))
      .orderBy(asc_nulls_first("user_id"), asc("version"))

  /** The per-(user, observed day) last-state relation and the SCD2
    * version table built from it — Q268's construction, shared with
    * Q320's point-in-time audit. */
  private[operators] def lastStateObs(c: Catalog): DataFrame = {
    val wPick = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(desc("us"), desc("event_id"))
    c.events
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
      .withColumn("day", expr("us DIV 86400000000"))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"), col("event_type").as("state"))
  }

  private[operators] def scd2History(c: Catalog): DataFrame =
    scd2HistoryFrom(lastStateObs(c))

  /** SCD2 versioning from an already-built (user, day, state) relation —
    * so a caller that has checkpointed [[lastStateObs]] (Q320) can share
    * it instead of re-running the per-(user, day) window pick over the
    * full events table twice per execution. */
  private[operators] def scd2HistoryFrom(obs: DataFrame): DataFrame = {
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

  /** Q320 — point-in-time reconstruction audit of the SCD2 history: at
    * the three interior quartile days of the observed span, rebuild
    * every user's state (a) by interval lookup in the Q268 version
    * table (valid_from ≤ d AND (valid_to IS NULL OR valid_to ≥ d)) and
    * (b) directly from raw events (last state at or before d), and
    * count agreement per (as-of day, state). This is the TIME-TRAVEL
    * CONSISTENCY invariant every warehouse's type-2 dimension must
    * satisfy — the audit that catches interval-boundary bugs
    * (off-by-one valid_to, overlapping versions, a dropped current
    * row) that Q268's own hash can't see from the write side.
    *
    * Determinism: as-of days are exact int arithmetic on the observed
    * bounds (dmin + k·(dmax−dmin) DIV 4); every output is an exact
    * count; the verdict is integer equality.
    *
    * Scale notes: the history and the per-(user, day) obs relation are
    * each built once (user-keyed windows, the Q268 plan); the K = 3
    * as-of rows broadcast onto both sides; the reconciliation join is
    * user-keyed. Nothing calendar-densified, nothing quadratic.
    */
  def q320(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val obs = lastStateObs(c).localCheckpoint()
    val hist = scd2HistoryFrom(obs)
    val asof = obs.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .select(explode(array(Seq(1, 2, 3).map(k =>
        struct(lit(s"q$k").as("asof_label"),
          expr(s"dmin + (dmax - dmin) * $k DIV 4").cast("long")
            .as("asof_day"))): _*)).as("p"))
      .select(col("p.asof_label"), col("p.asof_day"))
    val scdAt = hist.crossJoin(broadcast(asof))
      .filter(col("valid_from_day") <= col("asof_day") &&
        (col("valid_to_day").isNull ||
          col("valid_to_day") >= col("asof_day")))
      .select(col("user_id"), col("asof_label"), col("asof_day"),
        col("state").as("state_scd"))
    val wLast = Window.partitionBy(col("user_id"), col("asof_label"))
      .orderBy(desc("day"))
    val directAt = obs.crossJoin(broadcast(asof))
      .filter(col("day") <= col("asof_day"))
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("asof_label"), col("asof_day"),
        col("state").as("state_direct"))
    scdAt.join(directAt, Seq("user_id", "asof_label", "asof_day"), "full")
      .groupBy(col("asof_label"), col("asof_day"),
        coalesce(col("state_scd"), col("state_direct")).as("state"))
      .agg(sum(when(col("state_scd").isNotNull, 1L).otherwise(0L))
          .as("n_scd"),
        sum(when(col("state_direct").isNotNull, 1L).otherwise(0L))
          .as("n_direct"),
        sum(when(col("state_scd") === col("state_direct"), 1L)
          .otherwise(0L)).as("n_match"))
      .withColumn("verdict", expr("CASE WHEN n_scd = n_direct " +
        "AND n_direct = n_match THEN 'consistent' " +
        "ELSE 'inconsistent' END"))
      .orderBy(asc_nulls_first("asof_label"), asc_nulls_first("state"))
  }

  val q320Oracle: String =
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
      |  FROM versioned GROUP BY 1, 2),
      |hist AS (
      |  SELECT user_id, version, state, valid_from_day,
      |    CAST(LEAD(valid_from_day) OVER (PARTITION BY user_id
      |      ORDER BY version) - 1 AS BIGINT) AS valid_to_day
      |  FROM vers),
      |bounds AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM obs),
      |marks AS (
      |  SELECT 'q' || CAST(k AS VARCHAR) AS asof_label,
      |    CAST(dmin + (dmax - dmin) * k // 4 AS BIGINT) AS asof_day
      |  FROM bounds, (SELECT UNNEST([1, 2, 3]) AS k) ks),
      |scd_at AS (
      |  SELECT h.user_id, a.asof_label, a.asof_day,
      |    h.state AS state_scd
      |  FROM hist h CROSS JOIN marks a
      |  WHERE h.valid_from_day <= a.asof_day
      |    AND (h.valid_to_day IS NULL OR h.valid_to_day >= a.asof_day)),
      |direct_at AS (
      |  SELECT user_id, asof_label, asof_day, state AS state_direct
      |  FROM (
      |    SELECT o.user_id, a.asof_label, a.asof_day, o.state,
      |      ROW_NUMBER() OVER (PARTITION BY o.user_id, a.asof_label
      |        ORDER BY o.day DESC) AS rn
      |    FROM obs o CROSS JOIN marks a
      |    WHERE o.day <= a.asof_day) d
      |  WHERE rn = 1),
      |joined AS (
      |  SELECT COALESCE(s.user_id, d.user_id) AS user_id,
      |    COALESCE(s.asof_label, d.asof_label) AS asof_label,
      |    COALESCE(s.asof_day, d.asof_day) AS asof_day,
      |    s.state_scd, d.state_direct
      |  FROM scd_at s
      |  FULL OUTER JOIN direct_at d
      |    ON d.user_id = s.user_id AND d.asof_label = s.asof_label
      |    AND d.asof_day = s.asof_day)
      |SELECT asof_label, asof_day,
      |  COALESCE(state_scd, state_direct) AS state,
      |  CAST(SUM(CASE WHEN state_scd IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_scd,
      |  CAST(SUM(CASE WHEN state_direct IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_direct,
      |  CAST(SUM(CASE WHEN state_scd = state_direct THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_match,
      |  CASE WHEN SUM(CASE WHEN state_scd IS NOT NULL THEN 1 ELSE 0 END)
      |      = SUM(CASE WHEN state_direct IS NOT NULL THEN 1 ELSE 0 END)
      |    AND SUM(CASE WHEN state_direct IS NOT NULL THEN 1 ELSE 0 END)
      |      = SUM(CASE WHEN state_scd = state_direct THEN 1 ELSE 0 END)
      |    THEN 'consistent' ELSE 'inconsistent' END AS verdict
      |FROM joined
      |GROUP BY 1, 2, 3
      |ORDER BY asof_label NULLS FIRST, state NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q112" -> (q112 _), "Q268" -> (q268 _), "Q320" -> (q320 _))

  def oracles: Map[String, String] = Map(
    "Q112" -> q112Oracle, "Q268" -> q268Oracle, "Q320" -> q320Oracle)
}
