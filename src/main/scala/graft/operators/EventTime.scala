package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Catalog

/** Event-time operators over the events stream table (SURVEY.md §2.10 batch
  * forms + §2.11 Q43): tumbling / sliding / session windows and the COO
  * tensor build. The streaming twins (readStream + window()/session_window())
  * live in graft.streaming and are asserted batch-equal in StreamingSpec.
  *
  * All event-time arithmetic is integer epoch-µs (`ts DIV 1000` ≡ DuckDB
  * `epoch_us(ts)`) — never raw ns (engines disagree), never float time.
  *
  * Scale notes: tumbling/sliding buckets are computed by integer division
  * before the aggregate, so the shuffle key is (bucket, type) — bounded
  * cardinality, map-side combined. The sliding form replicates each row
  * exactly windows-per-slide (4×) — the standard explode trick, linear cost.
  * Session windows need one shuffle+sort per user (gaps-and-islands); the
  * 100 TB form is the same plan, or mapGroupsWithState on a live stream.
  */
object EventTime {

  private val HourUs = 3600000000L
  private val SlideUs = 900000000L
  private val SessionGapUs = 1800000000L
  private val DayUs = 86400000000L

  /** Q40 — tumbling 1h window: count + sum(value) per (window, type). */
  def q40(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.events
      .select(expr("ts DIV 1000").as("us"), col("event_type"), col("value"))
      .withColumn("win_start", col("us") - (col("us") % HourUs))
      .groupBy(col("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .orderBy(asc_nulls_first("win_start"), asc_nulls_first("event_type"))
  }

  val q40Oracle: String =
    """SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS win_start,
      |  event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY win_start NULLS FIRST, event_type NULLS FIRST""".stripMargin

  /** Q41 — sliding 1h window every 15 min via the explode-by-offset trick. */
  def q41(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.events
      .select(expr("ts DIV 1000").as("us"), col("event_type"), col("value"))
      .withColumn("off", explode(sequence(lit(0), lit(3))))
      .withColumn("win_start", (expr("us DIV 900000000") - col("off")) * SlideUs)
      .filter(col("us") >= col("win_start") && col("us") < col("win_start") + HourUs)
      .groupBy(col("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .orderBy(asc_nulls_first("win_start"), asc_nulls_first("event_type"))
  }

  val q41Oracle: String =
    """WITH e AS (
      |  SELECT epoch_us(ts) AS us, event_type, value, UNNEST(range(4)) AS off
      |  FROM events),
      |w AS (
      |  SELECT (us // 900000000 - off) * 900000000 AS win_start, us, event_type, value
      |  FROM e)
      |SELECT win_start, event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      |FROM w
      |WHERE us >= win_start AND us < win_start + 3600000000
      |GROUP BY 1, 2
      |ORDER BY win_start NULLS FIRST, event_type NULLS FIRST""".stripMargin

  /** Q42 — session windows (30 min gap) in batch: gaps-and-islands with a
    * running session counter per user.
    */
  def q42(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val wOrd = Window.partitionBy(col("user_id")).orderBy(asc("us"), asc("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c.events
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(wOrd))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / 1000000.0).as("dur_s"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        round(avg(col("n_events")), 4).as("avg_events"),
        round(avg(col("dur_s")), 4).as("avg_dur_s"))
      .orderBy(asc_nulls_first("user_id"))
  }

  val q42Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    epoch_us(ts) - LAG(epoch_us(ts), 1)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM e),
      |sess AS (
      |  SELECT user_id, us,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM flagged),
      |per_sess AS (
      |  SELECT user_id, sess_id, COUNT(*) AS n_events,
      |    (MAX(us) - MIN(us)) / 1000000.0 AS dur_s
      |  FROM sess GROUP BY 1, 2)
      |SELECT user_id, COUNT(*) AS n_sessions,
      |  ROUND(AVG(n_events), 4) AS avg_events,
      |  ROUND(AVG(dur_s), 4) AS avg_dur_s
      |FROM per_sess
      |GROUP BY user_id
      |ORDER BY user_id NULLS FIRST""".stripMargin

  /** Q43 — 3-way COO tensor build from events: (user, event-type id,
    * day index) → Σ value. The bridge from the relational world to the
    * CP-ALS decomposition (graft.tensor).
    */
  def q43(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val e = c.events.select(
      col("user_id").as("i"),
      when(col("event_type") === "click", 0L)
        .when(col("event_type") === "error", 1L)
        .when(col("event_type") === "purchase", 2L)
        .when(col("event_type") === "signup", 3L)
        .when(col("event_type") === "view", 4L).as("j"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      col("value"))
    e.crossJoin(broadcast(e.agg(min(col("day")).as("min_day"))))
      .select(col("i"), col("j"), (col("day") - col("min_day")).as("k"), col("value"))
      .groupBy(col("i"), col("j"), col("k"))
      .agg(round(sum(col("value")), 4).as("v"))
      .orderBy(asc_nulls_first("i"), asc_nulls_first("j"), asc_nulls_first("k"))
  }

  val q43Oracle: String =
    """WITH e AS (
      |  SELECT user_id AS i,
      |    CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
      |      WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4
      |    END AS j,
      |    epoch_us(ts) // 86400000000 AS day, value
      |  FROM events)
      |SELECT i, j, day - (SELECT MIN(day) FROM e) AS k, ROUND(SUM(value), 4) AS v
      |FROM e
      |GROUP BY i, j, day
      |ORDER BY i NULLS FIRST, j NULLS FIRST, k NULLS FIRST""".stripMargin

  /** Q59 — calendar-series generation + gap fill: every January-1996 day
    * with its order count, zero-days included — the generated series is
    * the (tiny, broadcast) left side, the fact side pre-aggregates to
    * per-day counts, and missing days coalesce to 0. The standard
    * time-series densification pattern.
    */
  def q59(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val days = spark.range(1)
      .select(explode(expr(
        "sequence(DATE'1996-01-01', DATE'1996-01-31', interval 1 day)")).as("day"))
    val observed = c.orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
    days.join(observed, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n_orders"))
      .orderBy(asc_nulls_first("day"))
  }

  val q59Oracle: String =
    """WITH days AS (
      |  SELECT CAST(UNNEST(generate_series(DATE '1996-01-01', DATE '1996-01-31',
      |    INTERVAL 1 DAY)) AS DATE) AS day),
      |observed AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
      |  FROM orders GROUP BY 1)
      |SELECT days.day AS day, COALESCE(observed.n, 0) AS n_orders
      |FROM days LEFT JOIN observed ON days.day = observed.day
      |ORDER BY day NULLS FIRST""".stripMargin

  /** Q63 — ordered funnel analysis: view → click-after-view →
    * purchase-after-click per user, counting users who reach each stage
    * IN ORDER (a purchase before the first post-view click does not
    * count). Each stage is a keyed min-aggregate plus one equi-join on
    * user_id — the standard scalable funnel plan: no window over the raw
    * stream, no per-user sort, shuffle keyed by user_id only.
    */
  def q63(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val e = c.events.select(
      col("user_id"), col("event_type"), expr("ts DIV 1000").as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val cl = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("us") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
    val p = e.filter(col("event_type") === "purchase")
      .join(cl, Seq("user_id")).filter(col("us") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(cl.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
  }

  val q63Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |v AS (
      |  SELECT user_id, MIN(us) AS t1 FROM e
      |  WHERE event_type = 'view' GROUP BY user_id),
      |cl AS (
      |  SELECT e.user_id, MIN(us) AS t2 FROM e JOIN v USING (user_id)
      |  WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(us) AS t3 FROM e JOIN cl USING (user_id)
      |  WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id)
      |SELECT (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM cl) AS n_view_click,
      |  (SELECT COUNT(*) FROM p) AS n_view_click_purchase""".stripMargin

  /** Q65 — retention cohort matrix: users grouped by first-activity week
    * (cohort), counted as active per weeks-since-cohort offset. Two
    * user-keyed aggregates and one join — the cohort table every product
    * analytics pipeline materializes, shuffled only on user_id then on
    * the (tiny) matrix key.
    */
  def q65(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val e = c.events.select(
      col("user_id"), expr("(ts DIV 1000) DIV 86400000000").as("day"))
    val active = e.distinct()
    val cohort = active.groupBy(col("user_id")).agg(min(col("day")).as("c_day"))
    active.join(cohort, Seq("user_id"))
      .groupBy(
        (col("c_day") % 7).as("cohort_dow"),
        expr("(day - c_day) DIV 7").as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(asc_nulls_first("cohort_dow"), asc_nulls_first("weeks_since"))
  }

  val q65Oracle: String =
    """WITH e AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |cohort AS (
      |  SELECT user_id, MIN(day) AS c_day FROM e GROUP BY user_id)
      |SELECT c_day % 7 AS cohort_dow,
      |  CAST((day - c_day) // 7 AS BIGINT) AS weeks_since,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM e JOIN cohort USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY cohort_dow NULLS FIRST, weeks_since NULLS FIRST""".stripMargin

  /** Q86 — cooldown debounce (event-stream hygiene): drop an event when
    * the same user produced the same event type within the preceding 5
    * minutes — the duplicate-click / retry-storm filter every event
    * pipeline runs before counting anything. One (user, type)-keyed
    * window, total order (us, event_id) per ADVICE r1.
    */
  def q86(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(asc("us"), asc("event_id"))
    c.events
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("kept",
        col("prev_us").isNull || col("us") - col("prev_us") > 300000000L)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("kept"), 1)).as("n_kept"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q86Oracle: String =
    """WITH seq AS (
      |  SELECT event_type, epoch_us(ts) AS us,
      |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
      |      ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n_total,
      |  COUNT(*) FILTER (WHERE prev_us IS NULL OR us - prev_us > 300000000)
      |    AS n_kept
      |FROM seq
      |GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q87 — burst profile (bot/abuse detection): each user's maximum event
    * count inside ANY trailing 1-hour window, via a RANGE frame over
    * epoch-µs — the value-based frame makes "any window ending at an
    * event" exact, no bucketing approximation. One user-keyed window pass.
    */
  def q87(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val wRange = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(asc("us"))
      .rangeBetween(-3600000000L, 0L)
    c.events
      .select(col("user_id"), expr("ts DIV 1000").as("us"))
      .withColumn("in_hour", count(lit(1)).over(wRange))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("in_hour")).as("max_burst_1h"))
      .orderBy(asc_nulls_first("user_id"))
  }

  val q87Oracle: String =
    """WITH seq AS (
      |  SELECT user_id,
      |    COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS in_hour
      |  FROM events)
      |SELECT user_id, COUNT(*) AS n_events, MAX(in_hour) AS max_burst_1h
      |FROM seq
      |GROUP BY user_id
      |ORDER BY user_id NULLS FIRST""".stripMargin

  /** Q100 — trailing exponentially-weighted moving average (EWMA) of each
    * user's event values: over the 20 most recent events, weight 2^-i for
    * the value i steps back, normalized by the weight sum (the
    * bias-corrected trailing form of the classic smoother). Emits per-user
    * summary stats of the smoothed series so output stays bounded.
    *
    * Determinism discipline: the decay is DYADIC (α = 1/2), so every
    * weight is an exact power of two computed as `1/shiftleft(1,i)` —
    * integer shift + exact double division, never `pow()` (libm vs JVM
    * pow differ in the last ulp, which a hash gate would catch). Both
    * engines build the same array in the same frame order and fold it in
    * the same order, so the sums agree bitwise before the final round.
    *
    * Scale: one user-keyed window (shuffle on user_id, partition-local
    * sort), O(20) work per row — linear, no global sort, same plan class
    * as Q19/Q87.
    */
  /** API form of the Q100 smoother: append an `ewma` column — the
    * dyadic-weight trailing EWMA of `value` over each user's last
    * `window` events ordered by (us, event_id). Model-pinned in
    * OperatorPropertiesSpec.
    */
  def trailingEwma(events: DataFrame, window: Int = 20): DataFrame = {
    require(window >= 1 && window <= 62, s"window $window out of shift range")
    val w = Window.partitionBy(col("user_id")).orderBy(asc("us"), asc("event_id"))
      .rowsBetween(-(window - 1), 0)
    events
      .withColumn("vals", collect_list(col("value")).over(w))
      .withColumn("ewma", expr(
        """aggregate(sequence(1, size(vals)), 0.0D, (acc, i) ->
          |  acc + element_at(vals, i) /
          |        CAST(shiftleft(1L, size(vals) - i) AS DOUBLE)) /
          |aggregate(sequence(1, size(vals)), 0.0D, (acc, i) ->
          |  acc + 1.0D / CAST(shiftleft(1L, size(vals) - i) AS DOUBLE))"""
          .stripMargin))
      .drop("vals")
  }

  def q100(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    trailingEwma(c.events
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("us"),
        col("value")))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(avg(col("ewma")), 4).as("avg_ewma"),
        round(min(col("ewma")), 4).as("min_ewma"),
        round(max(col("ewma")), 4).as("max_ewma"))
      .orderBy(asc_nulls_first("user_id"))
  }

  val q100Oracle: String =
    """WITH smoothed AS (
      |  SELECT user_id,
      |    list_sum(list_transform(range(1, len(vals) + 1),
      |      i -> vals[i] / CAST(1 << (len(vals) - i) AS DOUBLE))) /
      |    list_sum(list_transform(range(1, len(vals) + 1),
      |      i -> 1.0 / CAST(1 << (len(vals) - i) AS DOUBLE))) AS ewma
      |  FROM (
      |    SELECT user_id,
      |      list(value) OVER (PARTITION BY user_id
      |        ORDER BY epoch_us(ts), event_id
      |        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
      |    FROM events))
      |SELECT user_id, COUNT(*) AS n_events,
      |  ROUND(AVG(ewma), 4) AS avg_ewma,
      |  ROUND(MIN(ewma), 4) AS min_ewma,
      |  ROUND(MAX(ewma), 4) AS max_ewma
      |FROM smoothed
      |GROUP BY user_id
      |ORDER BY user_id NULLS FIRST""".stripMargin

  /** Q104 — RFM customer segmentation: per user, Recency (last event
    * time), Frequency (event count), Monetary (value sum, rounded before
    * ranking so cross-engine summation order cannot move a bucket edge);
    * each dimension quintiled (ntile 5 over a UNIQUE order key), then
    * segment-level user counts and mean monetary.
    *
    * NOT the funnel (that's Q63) — this is the orthogonal segmentation
    * operator: no event ordering, three rank-bucketed dimensions.
    *
    * Scale notes: the gated form uses exact ntile — three global sorts —
    * as the reproducible twin (the same role Q35's exact verifier plays
    * for LSH). At 100 TB the quintile BOUNDARIES come from a mergeable
    * quantile sketch (the C15 capability) and assignment becomes a
    * map-side broadcast compare; the per-user aggregate underneath is
    * the same single user-keyed pass either way.
    */
  /** The per-user RFM measures Q104 and [[rfmSegmentsScalable]] share. */
  private def rfmMeasures(c: Catalog): DataFrame =
    c.events.groupBy(col("user_id")).agg(
      max(expr("ts DIV 1000")).as("last_us"),
      count(lit(1)).as("freq"),
      round(sum(col("value")), 4).as("monetary"))

  /** The implemented 100 TB path Q104's scaladoc declares: quintile
    * BOUNDARIES from the mergeable quantile sketch (percentile_approx —
    * bounded state, no global sort), broadcast into a map-side bucket
    * assignment. Buckets are approximately equal-sized (sketch rank
    * error), vs ntile's exactly-equal — the classic exact-vs-scalable
    * trade, tolerance-tested in OperatorPropertiesSpec.
    */
  def rfmSegmentsScalable(c: Catalog, accuracy: Int = 10000): DataFrame = {
    val per = rfmMeasures(c)
    val qs = array((1 to 4).map(q => lit(q / 5.0)): _*)
    val bounds = per.agg(
      percentile_approx(col("last_us"), qs, lit(accuracy)).as("b_r"),
      percentile_approx(col("freq"), qs, lit(accuracy)).as("b_f"),
      percentile_approx(col("monetary"), qs, lit(accuracy)).as("b_m"))
    def score(v: Column, b: Column): Column =
      lit(1) + when(v > b.getItem(0), 1).otherwise(0) +
        when(v > b.getItem(1), 1).otherwise(0) +
        when(v > b.getItem(2), 1).otherwise(0) +
        when(v > b.getItem(3), 1).otherwise(0)
    per.crossJoin(broadcast(bounds))
      .select(col("user_id"), col("monetary"),
        score(col("last_us"), col("b_r")).as("r_score"),
        score(col("freq"), col("b_f")).as("f_score"),
        score(col("monetary"), col("b_m")).as("m_score"))
  }

  def q104(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val per = rfmMeasures(c)
    val r = ntile(5).over(Window.orderBy(desc("last_us"), asc("user_id")))
    val f = ntile(5).over(Window.orderBy(desc("freq"), asc("user_id")))
    val m = ntile(5).over(Window.orderBy(desc("monetary"), asc("user_id")))
    per
      .withColumn("r_score", r).withColumn("f_score", f).withColumn("m_score", m)
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"),
        round(avg(col("monetary")), 4).as("avg_monetary"))
      .orderBy(asc_nulls_first("r_score"), asc_nulls_first("f_score"),
        asc_nulls_first("m_score"))
  }

  val q104Oracle: String =
    """WITH per AS (
      |  SELECT user_id, MAX(epoch_us(ts)) AS last_us, COUNT(*) AS freq,
      |    ROUND(SUM(value), 4) AS monetary
      |  FROM events GROUP BY 1),
      |scored AS (
      |  SELECT
      |    NTILE(5) OVER (ORDER BY last_us DESC, user_id) AS r_score,
      |    NTILE(5) OVER (ORDER BY freq DESC, user_id) AS f_score,
      |    NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS m_score,
      |    monetary
      |  FROM per)
      |SELECT r_score, f_score, m_score, COUNT(*) AS n_users,
      |  ROUND(AVG(monetary), 4) AS avg_monetary
      |FROM scored
      |GROUP BY 1, 2, 3
      |ORDER BY r_score NULLS FIRST, f_score NULLS FIRST,
      |  m_score NULLS FIRST""".stripMargin

  /** Shared Wilson-interval arithmetic (z = 1.96), written once and
    * interpolated into BOTH engines' expressions so every IEEE operation
    * happens in the same order on the same exact-integer inputs — the
    * result is bit-deterministic, no summation anywhere. Literals are
    * CAST to DOUBLE because bare decimal literals are DECIMAL-typed in
    * both SQL dialects (and decimal division would diverge).
    */
  private def wilson(nCol: String, cCol: String): (String, String, String) = {
    val p = s"(CAST($cCol AS DOUBLE) / $nCol)"
    val z2 = "CAST(3.8416 AS DOUBLE)" // 1.96²
    val z = "CAST(1.96 AS DOUBLE)"
    val center = s"($p + $z2 / (2 * $nCol))"
    val margin = s"($z * SQRT($p * (CAST(1.0 AS DOUBLE) - $p) / $nCol + $z2 / (4.0 * $nCol * $nCol)))"
    val denom = s"(CAST(1.0 AS DOUBLE) + $z2 / $nCol)"
    (p, s"(($center - $margin) / $denom)", s"(($center + $margin) / $denom)")
  }

  /** Q108 — deterministic A/B bucket conversion analysis: users split
    * 50/50 by md5 of a salted user key (reproducible across runs,
    * engines, and cluster layouts — no RNG), conversion = any purchase
    * event; per bucket the conversion rate with its 95% Wilson score
    * interval.
    *
    * NOT the cohort matrix (that's Q65) — this is the experimentation
    * operator: hash-bucket assignment + binomial interval arithmetic.
    *
    * Scale notes: bucket assignment is a map-side hash on the row, the
    * per-user conversion flag is one user-keyed aggregate, and the final
    * relation is 2 rows. The interval math runs on exact integer counts
    * through the shared-text formula (see [[wilson]]) — bit-identical in
    * both engines, no rounding discipline needed before the final ROUND.
    */
  def q108(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val (p, lo, hi) = wilson("n_users", "n_converted")
    c.events
      .withColumn("h", md5(concat(lit("exp1:"), col("user_id").cast("string"))))
      .withColumn("bucket", expr(NearDup.hexValueFastExpr("h")) % 2)
      .groupBy(col("user_id"), col("bucket"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_converted"))
      .select(col("bucket"), col("n_users"), col("n_converted"),
        expr(s"ROUND($p, 4)").as("conv_rate"),
        expr(s"ROUND($lo, 4)").as("wilson_lo"),
        expr(s"ROUND($hi, 4)").as("wilson_hi"))
      .orderBy(asc_nulls_first("bucket"))
  }

  val q108Oracle: String = {
    val (p, lo, hi) = wilson("n_users", "n_converted")
    s"""WITH flags AS (
       |  SELECT user_id,
       |    (${NearDup.hexValueExpr("md5('exp1:' || CAST(user_id AS VARCHAR))")}) % 2
       |      AS bucket,
       |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
       |  FROM events GROUP BY 1, 2),
       |agg AS (
       |  SELECT bucket, COUNT(*) AS n_users,
       |    CAST(SUM(converted) AS BIGINT) AS n_converted
       |  FROM flags GROUP BY 1)
       |SELECT bucket, n_users, n_converted,
       |  ROUND($p, 4) AS conv_rate,
       |  ROUND($lo, 4) AS wilson_lo,
       |  ROUND($hi, 4) AS wilson_hi
       |FROM agg
       |ORDER BY bucket NULLS FIRST""".stripMargin
  }

  /** Q109 — time-series resample + gap-fill: each user's event values
    * summed per day, re-gridded onto that user's full min..max day spine,
    * missing days filled by last-observation-carried-forward (LOCF).
    *
    * Distinct from Q59's calendar join: Q59 zero-fills COUNTS against a
    * fixed global calendar (absence means zero); Q109 INTERPOLATES a
    * per-entity measurement series (absence means "unchanged since last
    * observation") — the stateful fill mode sensor/metric pipelines need,
    * requiring the ignoreNulls running window rather than a coalesce.
    *
    * Scale notes: the spine is generated per user by `sequence()` —
    * linear in user-days, no global calendar cross join. The LOCF fill is
    * one user-keyed window (`last(_, ignoreNulls)` over an unbounded
    * preceding frame) — partition-local sort, O(1) state per row. Daily
    * sums are rounded BEFORE the fill so the carried value is the same
    * rounded double in both engines.
    */
  def q109(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    // referenced by the spine build AND the fill join — checkpoint so the
    // daily aggregate runs once
    val daily = c.events
      .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000").as("day"),
        col("value"))
      .groupBy(col("user_id"), col("day"))
      .agg(round(sum(col("value")), 4).as("day_value"))
      .localCheckpoint()
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(asc("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"),
        col("day_value").isNull.cast("int").as("is_gap"))
      .orderBy(asc_nulls_first("user_id"), asc_nulls_first("day"))
  }

  val q109Oracle: String =
    """WITH daily AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    ROUND(SUM(value), 4) AS day_value
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
      |           FROM daily GROUP BY 1),
      |spine AS (SELECT user_id, UNNEST(generate_series(d0, d1)) AS day
      |          FROM bounds),
      |j AS (SELECT s.user_id, s.day, d.day_value
      |      FROM spine s LEFT JOIN daily d
      |      ON d.user_id = s.user_id AND d.day = s.day)
      |SELECT user_id, day,
      |  last_value(day_value IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
      |  CAST(day_value IS NULL AS INT) AS is_gap
      |FROM j
      |ORDER BY user_id NULLS FIRST, day NULLS FIRST""".stripMargin

  /** Q118 — classical seasonal decomposition of the daily value series:
    * additive value = trend + seasonal + residual, with the trend a
    * CENTERED 7-CALENDAR-day moving average (defined only where all 7
    * calendar days exist AND have data — the textbook moving-average
    * decomposition), the seasonal index the mean detrended value per
    * day-of-week, and the residual what remains. The daily series is
    * re-gridded onto its full min..max day spine (same discipline as
    * Q109's LOCF resample) before the window, so on a GAPPED series the
    * trend goes NULL around the gap instead of silently averaging
    * non-adjacent days; gap days themselves are not emitted. Each
    * component is rounded before feeding the next so both engines
    * propagate identical doubles.
    *
    * Scale notes: everything runs on the DAILY aggregate (bounded rows —
    * the corpus collapses in the first hash aggregate); the spine is one
    * `sequence()` off a 1-row bounds aggregate; the trend is one ordered
    * window over that small series, the seasonal index one 7-key
    * aggregate joined back broadcast. Same plan discipline as Q60's
    * window-above-aggregate rule.
    */
  def q118(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    // values are 2-decimal monetary: summing exact integer CENTS makes
    // the daily total order-independent and bit-identical cross-engine —
    // a round(sum(double)) here once landed exactly on a 4-dp rounding
    // boundary and flipped between engines
    val daily = c.events
      .select(expr("ts DIV 1000 DIV 86400000000").as("day"), col("value"))
      .groupBy(col("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("s_cents"))
      .localCheckpoint() // feeds the spine bounds, the grid join, twice
    val spine = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = spine.join(daily, Seq("day"), "left")
      .withColumn("s", col("s_cents") / 100.0)
    val w = Window.orderBy(asc("day")).rowsBetween(-3, 3)
    // trend from the exact integer cent sum over the 7-day frame (÷700
    // in one step): a float AVG here is summation-order-dependent and
    // once flipped a 4-dp boundary RUN-TO-RUN inside one engine
    val trended = grid
      .withColumn("trend",
        when(count(col("s_cents")).over(w) === 7,
          round(sum(col("s_cents")).over(w) / 700.0, 4)))
      .filter(col("s").isNotNull) // gap days shaped the window; not emitted
      .withColumn("detr", round(col("s") - col("trend"), 4))
      .withColumn("dow", col("day") % 7)
    // seasonal mean over exact ten-thousandths (detr is a 4-dp value):
    // int64 sums are order-independent, so the mean can't wobble
    val seasonal = trended.filter(col("detr").isNotNull)
      .withColumn("detr_i", round(col("detr") * 10000).cast("long"))
      .groupBy(col("dow"))
      .agg(round(sum(col("detr_i")) /
        (count(col("detr_i")) * 10000.0), 4).as("seasonal"))
    trended.join(broadcast(seasonal), Seq("dow"), "left")
      .select(col("day"), col("dow"), col("s"), col("trend"),
        col("seasonal"),
        round(col("detr") - col("seasonal"), 4).as("residual"))
      .orderBy(asc_nulls_first("day"))
  }

  val q118Oracle: String =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS s_cents
      |  FROM events GROUP BY 1),
      |spine AS (
      |  SELECT UNNEST(generate_series((SELECT MIN(day) FROM daily),
      |                                (SELECT MAX(day) FROM daily))) AS day),
      |grid AS (
      |  SELECT sp.day, d.s_cents, d.s_cents / 100.0 AS s
      |  FROM spine sp LEFT JOIN daily d ON d.day = sp.day),
      |trended AS (
      |  SELECT day, s,
      |    CASE WHEN COUNT(s_cents) OVER w = 7
      |         THEN ROUND(SUM(s_cents) OVER w / 700.0, 4) END AS trend,
      |    day % 7 AS dow
      |  FROM grid
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |detrended AS (
      |  SELECT day, dow, s, trend, ROUND(s - trend, 4) AS detr
      |  FROM trended WHERE s IS NOT NULL),
      |seasonal AS (
      |  SELECT dow, ROUND(SUM(CAST(ROUND(detr * 10000, 0) AS BIGINT))
      |    / (COUNT(detr) * 10000.0), 4) AS seasonal
      |  FROM detrended WHERE detr IS NOT NULL GROUP BY 1)
      |SELECT d.day, d.dow, d.s, d.trend, se.seasonal,
      |  ROUND(d.detr - se.seasonal, 4) AS residual
      |FROM detrended d LEFT JOIN seasonal se ON se.dow = d.dow
      |ORDER BY d.day NULLS FIRST""".stripMargin

  /** Holt linear-trend (double-exponential) smoothing of a keyed series
    * with α = β = 1/2 (Holt 1957; the Hyndman & Athanasopoulos "fpp"
    * additive-trend form): l_t = (y_t + (l_{t-1} + b_{t-1})) / 2,
    * b_t = (b_{t-1} + (l_t - l_{t-1})) / 2, initialized l_0 = y_0,
    * b_0 = 0.
    *
    * Input: (key, k, y) rows — k the 0-based contiguous position, y the
    * observation. Returns one row per key: (key, n_obs, l, b) — the
    * final level and trend; the h-step forecast is l + h·b.
    *
    * Determinism discipline (the Q100 rule): the recurrence uses ONLY
    * IEEE adds, subtracts, and divisions by 2 with a FIXED
    * parenthesization, duplicated textually in the oracle — so the
    * doubles are bit-identical cross-engine even after the dyadic values
    * outgrow the 53-bit mantissa (every individual operation is
    * correctly rounded and both engines execute the same operation
    * sequence). No pow(), no libm.
    *
    * Scale notes: a smoother is sequential IN ITS KEY — the right
    * distributed shape is "parallel across keys, linear within key". The
    * series arrives as a bounded per-key array (the corpus collapses in
    * the upstream daily aggregate first — Q118 discipline) and the fold
    * is one codegen'd higher-order `aggregate` over it: O(n_obs) per
    * key, no shuffle beyond the collect_list aggregation, no driver
    * state. Per-key state is the series itself; for year-scale daily
    * series that is thousands of elements, not corpus-scale.
    */
  def holtLinear(series: DataFrame, keyCol: String): DataFrame =
    series.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("k"), col("y")))).as("ser"))
      .withColumn("fit", expr(
        """aggregate(ser,
          |  named_struct('l', CAST(0 AS DOUBLE), 'b', CAST(0 AS DOUBLE), 'started', false),
          |  (acc, x) -> IF(NOT acc.started,
          |    named_struct('l', CAST(x.y AS DOUBLE), 'b', CAST(0 AS DOUBLE), 'started', true),
          |    named_struct(
          |      'l', (CAST(x.y AS DOUBLE) + (acc.l + acc.b)) / 2D,
          |      'b', (acc.b + ((CAST(x.y AS DOUBLE) + (acc.l + acc.b)) / 2D - acc.l)) / 2D,
          |      'started', true)))""".stripMargin))
      .select(col(keyCol), size(col("ser")).cast("long").as("n_obs"),
        col("fit.l").as("l"), col("fit.b").as("b"))

  /** Q123 — Holt forecast of each event type's daily event count: the
    * per-type series is zero-filled onto its min..max day spine (a count
    * series — absence means zero, the Q59 fill mode), smoothed with
    * [[holtLinear]], and extrapolated 7 days ahead. The whole recurrence
    * is gated: any drift in any iteration of any series breaks the hash
    * against the oracle's recursive-CTE replay.
    */
  def q123(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    // referenced by the bounds aggregate AND the grid join
    val daily = c.events
      .select(col("event_type"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val spine = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), col("d0"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), (col("day") - col("d0")).as("k"),
        coalesce(col("n"), lit(0L)).as("y"))
    holtLinear(grid, "event_type")
      .select(col("event_type"), col("n_obs"), col("l"), col("b"),
        explode(sequence(lit(1), lit(7))).as("h"))
      .select(col("event_type"), col("h"), col("n_obs"),
        round(col("l"), 4).as("level"),
        round(col("b"), 4).as("trend"),
        round(col("l") + col("h").cast("double") * col("b"), 4).as("forecast"))
      .orderBy(asc_nulls_first("event_type"), asc("h"))
  }

  val q123Oracle: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      |           FROM daily GROUP BY 1),
      |spine AS (SELECT event_type, d0, UNNEST(generate_series(d0, d1)) AS day
      |          FROM bounds),
      |grid AS (
      |  SELECT s.event_type, s.day - s.d0 AS k, COALESCE(d.n, 0) AS y
      |  FROM spine s LEFT JOIN daily d
      |  ON d.event_type = s.event_type AND d.day = s.day),
      |maxk AS (SELECT event_type, MAX(k) AS kmax FROM grid GROUP BY 1),
      |holt AS (
      |  SELECT event_type, k, CAST(y AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
      |  FROM grid WHERE k = 0
      |  UNION ALL
      |  SELECT g.event_type, g.k,
      |    (CAST(g.y AS DOUBLE) + (h.l + h.b)) / 2,
      |    (h.b + ((CAST(g.y AS DOUBLE) + (h.l + h.b)) / 2 - h.l)) / 2
      |  FROM holt h JOIN grid g
      |  ON g.event_type = h.event_type AND g.k = h.k + 1),
      |fin AS (
      |  SELECT h.event_type, m.kmax + 1 AS n_obs, h.l, h.b
      |  FROM holt h JOIN maxk m
      |  ON m.event_type = h.event_type AND h.k = m.kmax)
      |SELECT f.event_type, CAST(hz.h AS INT) AS h, f.n_obs,
      |  ROUND(f.l, 4) AS level, ROUND(f.b, 4) AS trend,
      |  ROUND(f.l + CAST(hz.h AS DOUBLE) * f.b, 4) AS forecast
      |FROM fin f CROSS JOIN (SELECT UNNEST(range(1, 8)) AS h) hz
      |ORDER BY f.event_type NULLS FIRST, h""".stripMargin

  /** Q124 — CUSUM change-point detection (Page 1954) on each event
    * type's zero-filled daily count series, all-integer and therefore
    * bit-exact cross-engine by construction. Reference level mu is the
    * per-type floor mean, allowance kappa = mu DIV 4, decision threshold
    * h = 3·(mu+1) — every parameter derived from the data by integer
    * arithmetic, no floats anywhere.
    *
    * The engine does NOT run the sequential recurrence
    * s_i = max(0, s_{i-1} + d_i). It uses the prefix-sum identity
    * s_i = S_i − min(0, min_{j≤i} S_j) (S = running sum of the
    * deviations d), which turns the whole detector into two running
    * window aggregates over one (type, day) sort — a single shuffle,
    * fully codegen'd, no per-key fold state. The oracle replays the
    * textbook clamped recurrence in a recursive CTE, so the hash match
    * PROVES the identity on real data, per series, per day.
    *
    * Scale notes: the only shuffle is the daily pre-aggregate plus one
    * window sort by (type, day) — the series length is days, not events,
    * so the window input is bounded by spine size. The identity matters
    * at scale: a clamped fold needs a sequential pass per key (Q123's
    * collect_list shape), while prefix sums stay in Spark's streaming
    * window frame with O(1) state per row.
    */
  def q124(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val spine = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), coalesce(col("n"), lit(0L)).as("y"))
    val wAll = Window.partitionBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRun = Window.partitionBy(col("event_type")).orderBy(asc("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("total", sum(col("y")).over(wAll))
      .withColumn("ndays", count(lit(1)).over(wAll))
      .withColumn("mu", expr("total DIV ndays"))
      .withColumn("d", col("y") - col("mu") - expr("mu DIV 4"))
      .withColumn("ps", sum(col("d")).over(wRun))
      .withColumn("pm", min(col("ps")).over(wRun))
      .withColumn("stat", col("ps") - least(col("pm"), lit(0L)))
      .select(col("event_type"), col("day"), col("y"), col("mu"), col("stat"),
        (col("stat") > (col("mu") + lit(1L)) * 3L).cast("int").as("alarm"))
      .orderBy(asc_nulls_first("event_type"), asc("day"))
  }

  val q124Oracle: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      |           FROM daily GROUP BY 1),
      |spine AS (SELECT event_type, UNNEST(generate_series(d0, d1)) AS day
      |          FROM bounds),
      |grid AS (
      |  SELECT s.event_type, s.day, COALESCE(d.n, 0) AS y
      |  FROM spine s LEFT JOIN daily d
      |  ON d.event_type = s.event_type AND d.day = s.day),
      |param AS (
      |  SELECT event_type, SUM(y) // COUNT(*) AS mu FROM grid GROUP BY 1),
      |g2 AS (
      |  SELECT g.event_type, g.day, g.y, p.mu,
      |    g.y - p.mu - (p.mu // 4) AS d,
      |    ROW_NUMBER() OVER (PARTITION BY g.event_type ORDER BY g.day) - 1 AS k
      |  FROM grid g JOIN param p ON p.event_type = g.event_type),
      |cusum AS (
      |  SELECT event_type, k, day, y, mu,
      |    GREATEST(CAST(0 AS BIGINT), d) AS stat
      |  FROM g2 WHERE k = 0
      |  UNION ALL
      |  SELECT g.event_type, g.k, g.day, g.y, g.mu,
      |    GREATEST(CAST(0 AS BIGINT), c.stat + g.d)
      |  FROM cusum c JOIN g2 g
      |  ON g.event_type = c.event_type AND g.k = c.k + 1)
      |SELECT event_type, day, y, CAST(mu AS BIGINT) AS mu,
      |  CAST(stat AS BIGINT) AS stat,
      |  CAST(stat > (mu + 1) * 3 AS INT) AS alarm
      |FROM cusum
      |ORDER BY event_type NULLS FIRST, day""".stripMargin

  /** Q125 — per-type linear trend fit (ordinary least squares on the
    * zero-filled daily count series) via the integer normal equations:
    * slope = (n·Σky − Σk·Σy) / (n·Σk² − (Σk)²) with k the 0-based day
    * index. Numerator and denominator are exact int64 in both engines
    * (Q107's exact-integer-division discipline); the only float is one
    * final cast+divide+round for display. The fit classifies each
    * series as rising / falling / flat by the numerator's sign.
    *
    * Scale notes: one daily pre-aggregate, then a 5-sum groupBy per
    * type — map-side combined, output rows = distinct types. This is
    * the textbook "regression as aggregation" shape: no iteration, no
    * driver math, any series length.
    */
  def q125(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val spine = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), col("d0"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), (col("day") - col("d0")).as("k"),
        coalesce(col("n"), lit(0L)).as("y"))
    grid.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_obs"), sum(col("k")).as("sk"),
        sum(col("y")).as("sy"), sum(col("k") * col("y")).as("sky"),
        sum(col("k") * col("k")).as("skk"))
      .select(col("event_type"), col("n_obs"),
        (col("n_obs") * col("sky") - col("sk") * col("sy")).as("slope_num"),
        (col("n_obs") * col("skk") - col("sk") * col("sk")).as("slope_den"))
      .withColumn("slope",
        when(col("slope_den") > 0L,
          round(col("slope_num").cast("double") / col("slope_den").cast("double"), 6)))
      .withColumn("direction",
        when(col("slope_den") === 0L, lit(null).cast("string"))
          .when(col("slope_num") > 0L, lit("rising"))
          .when(col("slope_num") < 0L, lit("falling"))
          .otherwise(lit("flat")))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q125Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      |           FROM daily GROUP BY 1),
      |spine AS (SELECT event_type, d0, UNNEST(generate_series(d0, d1)) AS day
      |          FROM bounds),
      |grid AS (
      |  SELECT s.event_type, s.day - s.d0 AS k, COALESCE(d.n, 0) AS y
      |  FROM spine s LEFT JOIN daily d
      |  ON d.event_type = s.event_type AND d.day = s.day),
      |sums AS (
      |  SELECT event_type, COUNT(*) AS n_obs, SUM(k) AS sk, SUM(y) AS sy,
      |    SUM(k * y) AS sky, SUM(k * k) AS skk
      |  FROM grid GROUP BY 1)
      |SELECT event_type, n_obs,
      |  CAST(n_obs * sky - sk * sy AS BIGINT) AS slope_num,
      |  CAST(n_obs * skk - sk * sk AS BIGINT) AS slope_den,
      |  CASE WHEN n_obs * skk - sk * sk > 0 THEN
      |    ROUND(CAST(n_obs * sky - sk * sy AS DOUBLE)
      |          / CAST(n_obs * skk - sk * sk AS DOUBLE), 6) END AS slope,
      |  CASE WHEN n_obs * skk - sk * sk = 0 THEN NULL
      |       WHEN n_obs * sky - sk * sy > 0 THEN 'rising'
      |       WHEN n_obs * sky - sk * sy < 0 THEN 'falling'
      |       ELSE 'flat' END AS direction
      |FROM sums
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q128 — autocorrelation function (lags 1..7) of each event type's
    * zero-filled daily count series, as the exact-integer Pearson
    * correlation between the series and its lag-L shift (the Q125
    * discipline): num = m·Σab − Σa·Σb and both variance terms are exact
    * int64 in both engines; the only floats are the final SQRT and one
    * divide, with a fixed evaluation order duplicated textually. NULL
    * where either side of the overlap is constant (zero variance).
    *
    * Scale notes: the grid is the bounded daily spine (days × types
    * rows, never raw events). The lag shift is a self-join on
    * (type, day+L) rather than 7 distinct window passes — one shuffle
    * produces all 7 lags, and the 5-sum aggregate is map-side combined
    * down to types × 7 output rows. Intermediates stay int64 well past
    * 10⁵-scale daily counts (m·Σa² ≈ days²·peak² must stay < 2⁶³ —
    * at 10 years × 10⁶/day that is 10⁷·10¹² ≈ 10¹⁹, the one place a
    * 100 TB deployment would widen to DECIMAL(38,0), same plan shape).
    */
  def q128(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val spine = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), coalesce(col("n"), lit(0L)).as("y"))
      .localCheckpoint()
    val lags = spark.range(1, 8).select(col("id").as("lag"))
    val a = grid.crossJoin(broadcast(lags))
      .select(col("event_type"), col("lag"), col("day"), col("y").as("ya"))
    val b = grid.select(col("event_type").as("bt"), col("day").as("bday"),
      col("y").as("yb"))
    a.join(b, col("bt") === col("event_type") &&
        col("bday") === col("day") + col("lag"))
      .select(col("event_type"), col("lag"), col("ya"), col("yb"))
      .groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("m"), sum(col("ya")).as("sa"),
        sum(col("yb")).as("sb"), sum(col("ya") * col("yb")).as("sab"),
        sum(col("ya") * col("ya")).as("saa"),
        sum(col("yb") * col("yb")).as("sbb"))
      .select(col("event_type"), col("lag"), col("m"),
        (col("m") * col("sab") - col("sa") * col("sb")).as("num"),
        (col("m") * col("saa") - col("sa") * col("sa")).as("den_a"),
        (col("m") * col("sbb") - col("sb") * col("sb")).as("den_b"))
      .withColumn("acf",
        when(col("den_a") > 0L && col("den_b") > 0L,
          round(col("num").cast("double") /
            sqrt(col("den_a").cast("double") * col("den_b").cast("double")), 6)))
      .select(col("event_type"), col("lag"), col("m"), col("num"), col("acf"))
      .orderBy(asc_nulls_first("event_type"), asc("lag"))
  }

  val q128Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      |           FROM daily GROUP BY 1),
      |spine AS (SELECT event_type, UNNEST(generate_series(d0, d1)) AS day
      |          FROM bounds),
      |grid AS (
      |  SELECT s.event_type, s.day, COALESCE(d.n, 0) AS y
      |  FROM spine s LEFT JOIN daily d
      |  ON d.event_type = s.event_type AND d.day = s.day),
      |lagged AS (
      |  SELECT a.event_type, l.lag AS lag, a.y AS ya, b.y AS yb
      |  FROM grid a
      |  CROSS JOIN (SELECT UNNEST(range(1, 8)) AS lag) l
      |  JOIN grid b ON b.event_type = a.event_type AND b.day = a.day + l.lag),
      |sums AS (
      |  SELECT event_type, lag, COUNT(*) AS m, SUM(ya) AS sa, SUM(yb) AS sb,
      |    SUM(ya*yb) AS sab, SUM(ya*ya) AS saa, SUM(yb*yb) AS sbb
      |  FROM lagged GROUP BY 1, 2)
      |SELECT event_type, lag, m,
      |  CAST(m*sab - sa*sb AS BIGINT) AS num,
      |  CASE WHEN (m*saa - sa*sa) > 0 AND (m*sbb - sb*sb) > 0 THEN
      |    ROUND(CAST(m*sab - sa*sb AS DOUBLE)
      |      / SQRT(CAST(m*saa - sa*sa AS DOUBLE)
      |             * CAST(m*sbb - sb*sb AS DOUBLE)), 6)
      |  END AS acf
      |FROM sums
      |ORDER BY event_type NULLS FIRST, lag""".stripMargin

  /** Q130 — Theil–Sen robust trend estimate per event type: the median
    * of all pairwise slopes (y_j − y_i)/(j − i) over the zero-filled
    * daily series. Each slope is ONE int64 subtraction and ONE IEEE
    * divide — identical in both engines — and the median is
    * rank-and-pick over the slope multiset (ties carry equal doubles,
    * so the pick is deterministic without a tiebreak); an even count
    * averages the two middle values with the same (a+b)/2 in both
    * engines. Complements Q125: OLS answers "what is the LS fit", the
    * Theil–Sen breakdown point of 29% answers "what is the trend after
    * up to a third of the days are corrupted".
    *
    * Scale notes: pairs are quadratic in DAYS, not events — bounded by
    * spine², e.g. a 10-year series is ~6.6M slope rows per type, one
    * shuffle, well inside a single executor's sort budget; the raw
    * event table never self-joins. Distinct rationals with day-bounded
    * denominators are farther apart than double ULP at these
    * magnitudes, so the double sort order equals the exact rational
    * order.
    */
  def q130(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val spine = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), col("d0"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), (col("day") - col("d0")).as("k"),
        coalesce(col("n"), lit(0L)).as("y"))
      .localCheckpoint()
    val a = grid.select(col("event_type"), col("k").as("ka"), col("y").as("ya"))
    val b = grid.select(col("event_type").as("bt"), col("k").as("kb"),
      col("y").as("yb"))
    val slopes = a.join(b, a("event_type") === col("bt") && col("kb") > col("ka"))
      .select(col("event_type"),
        ((col("yb") - col("ya")).cast("double") /
          (col("kb") - col("ka")).cast("double")).as("slope"))
    val w = Window.partitionBy(col("event_type")).orderBy(asc("slope"))
    val wAll = Window.partitionBy(col("event_type"))
    slopes
      .withColumn("i", row_number().over(w))
      .withColumn("np", count(lit(1)).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(col("np")).as("n_pairs"),
        round(avg(when(col("i") === expr("(np + 1) DIV 2") ||
          col("i") === expr("(np + 2) DIV 2"), col("slope"))), 6)
          .as("theil_sen"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q130Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      |           FROM daily GROUP BY 1),
      |spine AS (SELECT event_type, d0, UNNEST(generate_series(d0, d1)) AS day
      |          FROM bounds),
      |grid AS (
      |  SELECT s.event_type, s.day - s.d0 AS k, COALESCE(d.n, 0) AS y
      |  FROM spine s LEFT JOIN daily d
      |  ON d.event_type = s.event_type AND d.day = s.day),
      |slopes AS (
      |  SELECT a.event_type,
      |    CAST(b.y - a.y AS DOUBLE) / CAST(b.k - a.k AS DOUBLE) AS slope
      |  FROM grid a JOIN grid b
      |  ON b.event_type = a.event_type AND b.k > a.k),
      |rk AS (
      |  SELECT event_type, slope,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS i,
      |    COUNT(*) OVER (PARTITION BY event_type) AS np
      |  FROM slopes)
      |SELECT event_type, MAX(np) AS n_pairs,
      |  ROUND(AVG(CASE WHEN i IN ((np+1)//2, (np+2)//2) THEN slope END), 6)
      |    AS theil_sen
      |FROM rk GROUP BY 1
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q132 — weekly cohort retention triangle: users are assigned to the
    * epoch-week of their FIRST event (the cohort), and each cell
    * (cohort_wk, wk_offset) counts how many of that cohort's users were
    * active k weeks after their first — the standard product-analytics
    * retention matrix, plus each cell's share of its cohort size. All
    * counts are exact integers; the share is one float divide.
    *
    * Scale notes: raw events collapse to DISTINCT (user, week) FIRST —
    * the only pass over the full table — then the first-week aggregate
    * and the activity join are co-keyed on user_id (one shuffle
    * partitioning serves both sides). After the join, rows are already
    * unique per (user, week), so the cell count is a plain map-side-
    * combinable COUNT, not a COUNT DISTINCT shuffle of user ids. The
    * cohort-size attach is a window over the weeks²-bounded matrix,
    * never over event rows.
    */
  def q132(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val uw = c.events
      .select(col("user_id"), expr("ts DIV 1000 DIV 604800000000").as("wk"))
      .distinct()
      .localCheckpoint()
    val first = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    val cells = uw.join(first, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
      .agg(count(lit(1)).as("n_users"))
    val wc = Window.partitionBy(col("cohort_wk"))
    cells
      .withColumn("cohort_size",
        max(when(col("wk_offset") === 0L, col("n_users"))).over(wc))
      .select(col("cohort_wk"), col("wk_offset"), col("n_users"),
        round(col("n_users").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
      .orderBy(asc("cohort_wk"), asc("wk_offset"))
  }

  val q132Oracle: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
      |  FROM events),
      |first_wk AS (
      |  SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY 1),
      |cells AS (
      |  SELECT f.cohort_wk, u.wk - f.cohort_wk AS wk_offset,
      |    COUNT(*) AS n_users
      |  FROM uw u JOIN first_wk f ON f.user_id = u.user_id
      |  GROUP BY 1, 2)
      |SELECT cohort_wk, wk_offset, n_users,
      |  ROUND(CAST(n_users AS DOUBLE)
      |    / CAST(MAX(CASE WHEN wk_offset = 0 THEN n_users END)
      |           OVER (PARTITION BY cohort_wk) AS DOUBLE), 6) AS retention
      |FROM cells
      |ORDER BY cohort_wk, wk_offset""".stripMargin

  /** Q134 — time-series resample + LINEAR-interpolation gap fill: the
    * interpolating sibling of Q109's LOCF. Each user's daily value series
    * is re-gridded onto that user's min..max day spine; a missing day is
    * filled on the straight line between its nearest observed neighbors
    * — the fill mode metric pipelines use for continuously-varying
    * quantities (LOCF is for step-function state).
    *
    * Exactness: daily values are summed as integer CENTS (Q118
    * discipline), so prev/next observations are exact int64. The
    * interpolated value is computed as ONE exact integer numerator
    * `pc·(nd−day) + nc·(day−pd)` over ONE exact integer denominator
    * `nd−pd` — both well inside 2⁵³ — followed by exactly two IEEE
    * divides (`num/den`, then `/100.0`) duplicated textually in the
    * oracle: bit-reproducible cross-engine with zero rounding steps.
    * Spine endpoints are observed days, so every gap has both neighbors
    * and the denominator is ≥ 2 wherever the interpolating branch runs.
    *
    * Scale notes: identical plan shape to Q109 — per-user `sequence()`
    * spine (linear in user-days, no global calendar cross join), then
    * TWO mirrored ignoreNulls windows (unbounded-preceding `last` for
    * the previous observation, unbounded-following `first` for the
    * next) over the SAME partition/order, sharing one per-user sort.
    * O(1) window state per row; the daily aggregate is checkpointed
    * because the spine bounds and the grid join both consume it.
    */
  def q134(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000").as("day"),
        col("value"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .localCheckpoint()
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val wPrev = Window.partitionBy(col("user_id")).orderBy(asc("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id")).orderBy(asc("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("pc", last(col("cents"), ignoreNulls = true).over(wPrev))
      .withColumn("pd",
        last(when(col("cents").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
      .withColumn("nc", first(col("cents"), ignoreNulls = true).over(wNext))
      .withColumn("nd",
        first(when(col("cents").isNotNull, col("day")), ignoreNulls = true).over(wNext))
      .select(col("user_id"), col("day"),
        when(col("cents").isNotNull, col("cents").cast("double") / lit(100.0))
          .otherwise(
            ((col("pc") * (col("nd") - col("day"))
              + col("nc") * (col("day") - col("pd"))).cast("double")
              / (col("nd") - col("pd")).cast("double")) / lit(100.0))
          .as("filled_value"),
        col("cents").isNull.cast("int").as("is_gap"))
      .orderBy(asc_nulls_first("user_id"), asc_nulls_first("day"))
  }

  val q134Oracle: String =
    """WITH daily AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
      |           FROM daily GROUP BY 1),
      |spine AS (SELECT user_id, UNNEST(generate_series(d0, d1)) AS day
      |          FROM bounds),
      |j AS (SELECT s.user_id, s.day, d.cents
      |      FROM spine s LEFT JOIN daily d
      |      ON d.user_id = s.user_id AND d.day = s.day),
      |nb AS (
      |  SELECT user_id, day, cents,
      |    last_value(cents IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
      |    last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
      |    first_value(cents IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
      |    first_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      |  FROM j)
      |SELECT user_id, day,
      |  CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE) / 100.0
      |       ELSE (CAST(pc * (nd - day) + nc * (day - pd) AS DOUBLE)
      |             / CAST(nd - pd AS DOUBLE)) / 100.0 END AS filled_value,
      |  CAST(cents IS NULL AS INT) AS is_gap
      |FROM nb
      |ORDER BY user_id NULLS FIRST, day NULLS FIRST""".stripMargin

  /** Q136 — longest consecutive-day activity streak per user: the
    * classic gaps-and-islands engagement metric (the "N-day streak" a
    * product dashboard shows). An island is a maximal run of consecutive
    * ACTIVE calendar days; the gate reports each user's best streak, the
    * day it started (earliest such streak on ties), and the totals.
    *
    * All-integer and tie-deterministic: island identity is the exact
    * `day − row_number` constant on the per-user DISTINCT day sequence;
    * the best streak is picked by (length DESC, start_day ASC) — no
    * floats anywhere.
    *
    * Scale notes: one DISTINCT (user, day) aggregate collapses the
    * corpus first (map-side combinable), so everything downstream is
    * bounded by user-days. Both windows and the island groupBy key on
    * user_id — one exchange, one per-user sort, reused; the unordered
    * totals window shares the rank window's partitioning. O(1) state
    * per row, no self-joins.
    */
  def q136(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val days = c.events
      .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .distinct()
    val wSeq = Window.partitionBy(col("user_id")).orderBy(asc("day"))
    val streaks = days
      .withColumn("grp", col("day") - row_number().over(wSeq))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
    val wUser = Window.partitionBy(col("user_id"))
    val wBest = Window.partitionBy(col("user_id"))
      .orderBy(desc("len"), asc("start_day"))
    streaks
      .withColumn("n_streaks", count(lit(1)).over(wUser))
      .withColumn("n_active_days", sum(col("len")).over(wUser))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("len").cast("int").as("best_streak"),
        col("start_day"), col("n_streaks"), col("n_active_days"))
      .orderBy(asc_nulls_first("user_id"))
  }

  val q136Oracle: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |isl AS (
      |  SELECT user_id, day,
      |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM days),
      |streaks AS (
      |  SELECT user_id, grp, COUNT(*) AS len, MIN(day) AS start_day
      |  FROM isl GROUP BY 1, 2),
      |ranked AS (
      |  SELECT user_id, CAST(len AS INT) AS best_streak, start_day,
      |    CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_streaks,
      |    CAST(SUM(len) OVER (PARTITION BY user_id) AS BIGINT) AS n_active_days,
      |    ROW_NUMBER() OVER (
      |      PARTITION BY user_id ORDER BY len DESC, start_day) AS rn
      |  FROM streaks)
      |SELECT user_id, best_streak, start_day, n_streaks, n_active_days
      |FROM ranked WHERE rn = 1
      |ORDER BY user_id NULLS FIRST""".stripMargin

  /** Q149 — moving-average crossover signals per event type: days where
    * the trailing 3-day mean of the zero-filled daily count crosses the
    * trailing 7-day mean ("golden" up-cross / "death" down-cross). The
    * comparison is the EXACT INTEGER inequality s3·7 vs s7·3 (both
    * sides int64 window sums of counts — no float MA is ever formed),
    * so the crossing indicator and its lag are bit-identical in both
    * engines by construction. Signals are defined only from the first
    * day where both trailing frames are full on the PREVIOUS day
    * (position ≥ 8 on the spine).
    *
    * Scale notes: the grid is the bounded daily spine (Q128
    * discipline); two trailing window sums + one lag over it, zero
    * corpus re-scans.
    */
  def q149(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val spine = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), coalesce(col("n"), lit(0L)).as("y"))
    val byType = Window.partitionBy(col("event_type")).orderBy(asc("day"))
    val w3 = byType.rowsBetween(-2, 0)
    val w7 = byType.rowsBetween(-6, 0)
    grid
      .withColumn("k", row_number().over(byType))
      .withColumn("s3", sum(col("y")).over(w3))
      .withColumn("s7", sum(col("y")).over(w7))
      .withColumn("above", (col("s3") * 7 > col("s7") * 3).cast("int"))
      .withColumn("prev", lag(col("above"), 1).over(byType))
      .filter(col("k") >= 8 && col("above") =!= col("prev"))
      .select(col("event_type"), col("day"), col("s3"), col("s7"),
        when(col("above") === 1, "golden").otherwise("death").as("signal"))
      .orderBy(asc_nulls_first("event_type"), asc("day"))
  }

  val q149Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      |           FROM daily GROUP BY 1),
      |spine AS (SELECT event_type, UNNEST(generate_series(d0, d1)) AS day
      |          FROM bounds),
      |grid AS (
      |  SELECT s.event_type, s.day, COALESCE(d.n, 0) AS y
      |  FROM spine s LEFT JOIN daily d
      |  ON d.event_type = s.event_type AND d.day = s.day),
      |ma AS (
      |  SELECT event_type, day,
      |    ROW_NUMBER() OVER wt AS k,
      |    SUM(y) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s3,
      |    SUM(y) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s7
      |  FROM grid
      |  WINDOW wt AS (PARTITION BY event_type ORDER BY day)),
      |sig AS (
      |  SELECT event_type, day, k, s3, s7,
      |    CAST(s3 * 7 > s7 * 3 AS INT) AS above,
      |    LAG(CAST(s3 * 7 > s7 * 3 AS INT), 1) OVER (
      |      PARTITION BY event_type ORDER BY day) AS prev
      |  FROM ma)
      |SELECT event_type, day, CAST(s3 AS BIGINT) AS s3,
      |  CAST(s7 AS BIGINT) AS s7,
      |  CASE WHEN above = 1 THEN 'golden' ELSE 'death' END AS signal
      |FROM sig
      |WHERE k >= 8 AND above <> prev
      |ORDER BY event_type NULLS FIRST, day""".stripMargin

  /** Q150 — rolling 7-ROW median of daily revenue per event type (ROWS
    * BETWEEN 6 PRECEDING AND CURRENT ROW in both engines, NOT a
    * 7-calendar-day RANGE frame: the daily series is not densified here,
    * so a calendar gap in (type, day) makes the window span more than 7
    * days — the declared semantics are last-7-OBSERVED-days, the
    * trading-days convention; densify via the Q124-style spine if true
    * calendar windows are wanted. ADVICE r7). The robust-trend twin of
    * Q118's mean-based
    * decomposition (a single flash-sale day drags a rolling mean for a
    * week; the median shrugs it off — the robustness argument for
    * monitoring pipelines). Daily sums
    * accumulate as exact integer cents (the Q118/Q127 discipline), so the
    * only cross-engine float op is the final interpolated median of
    * BIGINTs — identical `lower + frac·(upper−lower)` arithmetic in
    * Spark's `percentile` and DuckDB's windowed `MEDIAN`.
    *
    * Scale shape: the events scan aggregates down to (type × day) — a few
    * hundred rows regardless of SF — so the windowed median runs on a
    * vanishingly small frame; the work that scales (the daily rollup) is
    * one partial-aggregated shuffle. Capability: reference engine's
    * time-series family (`n/a — reference empty`, SURVEY.md §0.1).
    */
  def q150(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"), expr("ts DIV 1000 DIV 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("dcents"))
    val w7 = Window.partitionBy(col("event_type")).orderBy(asc("day"))
      .rowsBetween(-6, 0)
    daily
      .withColumn("med7_cents", expr("percentile(dcents, 0.5)").over(w7))
      .select(col("event_type"), col("day"), col("dcents"),
        round(col("med7_cents"), 4).as("med7_cents"))
      .orderBy(asc_nulls_first("event_type"), asc("day"))
  }

  val q150Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS dcents
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day, dcents,
      |  ROUND(MEDIAN(dcents) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7_cents
      |FROM daily
      |ORDER BY event_type NULLS FIRST, day""".stripMargin

  /** Q152 — grouped equi-width histogram of `value` per event type (the
    * `width_bucket` staple): 20 bins of width 25 over [0, 500), boundary
    * bins clamped so out-of-range values land in the edge buckets rather
    * than vanishing. Bin share is within-type, so each type's histogram
    * is a distribution regardless of type volume.
    *
    * Exactness: FLOOR(value/25) is one IEEE divide+floor, identical in
    * both engines; counts are integers and the share divide is the only
    * other float op. Scale shape: bin id is row-local arithmetic, the
    * aggregation is a (type × ≤20)-cardinality partial-agg shuffle, and
    * the within-type share reuses a window over the already-aggregated
    * ≤100 rows — nothing global touches raw events twice.
    */
  def q152(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val wType = Window.partitionBy(col("event_type"))
    c.events
      .select(col("event_type"),
        least(greatest(floor(col("value") / 25.0), lit(0.0)), lit(19.0))
          .cast("long").as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        round(col("n").cast("double") / sum(col("n")).over(wType), 6))
      .select(col("event_type"), col("bin"), col("n"), col("share"))
      .orderBy(asc_nulls_first("event_type"), asc("bin"))
  }

  val q152Oracle: String =
    """WITH b AS (
      |  SELECT event_type,
      |    CAST(LEAST(GREATEST(FLOOR(value / 25.0), 0), 19) AS BIGINT) AS bin
      |  FROM events),
      |h AS (
      |  SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM b GROUP BY 1, 2)
      |SELECT event_type, bin, n,
      |  ROUND(CAST(n AS DOUBLE) /
      |    SUM(n) OVER (PARTITION BY event_type), 6) AS share
      |FROM h
      |ORDER BY event_type NULLS FIRST, bin""".stripMargin

  /** Q153 — view→purchase conversion latency distribution: per user, the
    * interval from the FIRST view to the first purchase at-or-after it;
    * interpolated p50/p90/p99 (and max) of those intervals across
    * converting users, plus the converting-user count. The product
    * question behind every activation funnel: "how long does conversion
    * take, and how heavy is the tail?".
    *
    * Exactness: intervals are integer microseconds; the percentiles are
    * the same interpolated `lower + frac·(upper−lower)` in Spark
    * `percentile` and DuckDB `QUANTILE_CONT`. Scale shape: both sides of
    * the user join are pre-aggregated/filtered (first-view table is one
    * row per viewing user, purchases are filtered before the join), the
    * join and the per-user MIN share the user_id shuffle key, and the
    * final percentile aggregates one latency per converting user —
    * bounded by the user count, never the event count.
    */
  def q153(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val e = c.events.select(col("user_id"), col("event_type"),
      expr("ts DIV 1000").as("us"))
    val firstView = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v"))
    e.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("us") >= col("v"))
      .groupBy(col("user_id"))
      .agg((min(col("us")) - min(col("v"))).as("lat_us"))
      .agg(count(lit(1)).as("n_converted"),
        expr("percentile(lat_us, 0.5D)").as("p50"),
        expr("percentile(lat_us, 0.9D)").as("p90"),
        expr("percentile(lat_us, 0.99D)").as("p99"),
        max(col("lat_us")).as("max_us"))
      .select(col("n_converted"),
        round(col("p50"), 4).as("p50_us"),
        round(col("p90"), 4).as("p90_us"),
        round(col("p99"), 4).as("p99_us"),
        col("max_us"))
  }

  val q153Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |fv AS (
      |  SELECT user_id, MIN(us) AS v FROM e
      |  WHERE event_type = 'view' GROUP BY 1),
      |conv AS (
      |  SELECT p.user_id, MIN(p.us) - MIN(fv.v) AS lat_us
      |  FROM e p JOIN fv ON fv.user_id = p.user_id
      |  WHERE p.event_type = 'purchase' AND p.us >= fv.v
      |  GROUP BY 1)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
      |  ROUND(QUANTILE_CONT(lat_us, 0.5), 4) AS p50_us,
      |  ROUND(QUANTILE_CONT(lat_us, 0.9), 4) AS p90_us,
      |  ROUND(QUANTILE_CONT(lat_us, 0.99), 4) AS p99_us,
      |  CAST(MAX(lat_us) AS BIGINT) AS max_us
      |FROM conv""".stripMargin

  /** Q157 — TRUE 7-calendar-day rolling statistics per event type, via a
    * RANGE frame over the integer day key (RANGE BETWEEN 6 PRECEDING AND
    * CURRENT ROW): the calendar-window twin of Q150's ROWS frame
    * (ADVICE r7 — ROWS spans 7 OBSERVED days; RANGE spans 7 CALENDAR
    * days with no densification needed, because the frame is keyed by
    * the day VALUE, not the row position). Emits, per observed day: the
    * 7-day event count, how many of the 7 calendar days had activity,
    * and the min/max daily revenue-cents in the window — every measure
    * exact integer arithmetic, bit-identical across engines.
    *
    * Scale notes: the events scan collapses to the bounded (type × day)
    * grid first (one partial-aggregated shuffle); the RANGE window then
    * runs on a few hundred rows per type. At 100 TB the plan is
    * unchanged — the window input stays bounded by the calendar, not
    * the corpus.
    */
  /** The Q157 window as an API over any (event_type, day, n, dcents)
    * daily relation — RANGE-framed on the day VALUE, so calendar gaps
    * shrink the window instead of stretching it.
    */
  def calendarRolling7(daily: DataFrame): DataFrame = {
    val w7 = Window.partitionBy(col("event_type")).orderBy(asc("day"))
      .rangeBetween(-6, 0)
    daily
      .withColumn("n7", sum(col("n")).over(w7))
      .withColumn("active7", count(lit(1)).over(w7))
      .withColumn("min7_cents", min(col("dcents")).over(w7))
      .withColumn("max7_cents", max(col("dcents")).over(w7))
      .select(col("event_type"), col("day"), col("n7"), col("active7"),
        col("min7_cents"), col("max7_cents"))
  }

  def q157(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"), expr("ts DIV 1000 DIV 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("dcents"))
    calendarRolling7(daily)
      .orderBy(asc_nulls_first("event_type"), asc("day"))
  }

  val q157Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS dcents
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day,
      |  CAST(SUM(n) OVER w7 AS BIGINT) AS n7,
      |  COUNT(*) OVER w7 AS active7,
      |  MIN(dcents) OVER w7 AS min7_cents,
      |  MAX(dcents) OVER w7 AS max7_cents
      |FROM daily
      |WINDOW w7 AS (PARTITION BY event_type ORDER BY day
      |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY event_type NULLS FIRST, day""".stripMargin

  /** Q165 — inter-event arrival-time distribution per type: the gap
    * between consecutive events under the (ts, event_id) total order, as
    * exact integer microseconds; count/min/max plus interpolated
    * p50/p90/p99 (Q153's percentile pairing) and the mean as one float
    * divide. The capacity-planning primitive: burstiness shows up as
    * p99/mean ratio, and a Poisson-ish stream has mean ≈ p50/ln 2.
    *
    * Scale notes: one window sort per type partition (the same sort every
    * sessionization gate pays), then a k-row aggregate. The percentile
    * aggregate sees one gap per event — linear state, no materialized
    * all-gaps collect.
    */
  def q165(spark: SparkSession, dir: String): DataFrame =
    interArrival(Catalog(spark, dir).events
      .select(col("event_type"), expr("ts DIV 1000").as("us"), col("event_id")))

  /** The Q165 computation as an API over any (event_type, us, event_id)
    * relation. */
  def interArrival(e: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("us"), col("event_id"))
    e
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap")).as("min_us"),
        max(col("gap")).as("max_us"),
        round(expr("percentile(gap, 0.5D)"), 4).as("p50_us"),
        round(expr("percentile(gap, 0.9D)"), 4).as("p90_us"),
        round(expr("percentile(gap, 0.99D)"), 4).as("p99_us"),
        round(sum(col("gap")).cast("double") / count(lit(1)), 4).as("mean_us"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q165Oracle: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) AS us, event_id FROM events),
      |gaps AS (
      |  SELECT event_type,
      |    us - LAG(us) OVER (PARTITION BY event_type ORDER BY us, event_id)
      |      AS gap
      |  FROM e)
      |SELECT event_type, COUNT(*) AS n_gaps,
      |  CAST(MIN(gap) AS BIGINT) AS min_us,
      |  CAST(MAX(gap) AS BIGINT) AS max_us,
      |  ROUND(QUANTILE_CONT(gap, 0.5), 4) AS p50_us,
      |  ROUND(QUANTILE_CONT(gap, 0.9), 4) AS p90_us,
      |  ROUND(QUANTILE_CONT(gap, 0.99), 4) AS p99_us,
      |  ROUND(CAST(SUM(gap) AS DOUBLE)/COUNT(*), 4) AS mean_us
      |FROM gaps WHERE gap IS NOT NULL
      |GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q169 — GLOBAL session-length distribution: Q42's gaps-and-islands
    * sessionization (30-min inactivity gap) rolled up corpus-wide —
    * session count, single-event "bounce" sessions, interpolated
    * p50/p90/max of events-per-session and of session duration. The
    * engagement-shape diagnostic next to Q42's per-user view: bounce
    * share and the p90 tail are what capacity and UX decisions read.
    *
    * Exactness: session boundaries are integer-µs comparisons under the
    * (us, event_id) total order; durations are exact integer µs;
    * percentiles are the shared interpolated form (Q153 pairing).
    * Scale notes: one per-user window sort (shared with every
    * sessionization gate), one (user, session) aggregate, then a
    * single-row reduce over one row per session — linear, two shuffles.
    */
  def q169(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(asc("us"), asc("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c.events
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(wOrd))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("dur_us"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
        round(expr("percentile(n_events, 0.5D)"), 4).as("p50_events"),
        round(expr("percentile(n_events, 0.9D)"), 4).as("p90_events"),
        max(col("n_events")).as("max_events"),
        round(expr("percentile(dur_us, 0.5D)"), 4).as("p50_dur_us"),
        round(expr("percentile(dur_us, 0.9D)"), 4).as("p90_dur_us"),
        max(col("dur_us")).as("max_dur_us"))
  }

  val q169Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    epoch_us(ts) - LAG(epoch_us(ts), 1)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END
      |      AS new_sess
      |  FROM e),
      |sess AS (
      |  SELECT user_id, us,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM flagged),
      |per_sess AS (
      |  SELECT user_id, sess_id, COUNT(*) AS n_events,
      |    MAX(us) - MIN(us) AS dur_us
      |  FROM sess GROUP BY 1, 2)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bounce,
      |  ROUND(QUANTILE_CONT(n_events, 0.5), 4) AS p50_events,
      |  ROUND(QUANTILE_CONT(n_events, 0.9), 4) AS p90_events,
      |  CAST(MAX(n_events) AS BIGINT) AS max_events,
      |  ROUND(QUANTILE_CONT(dur_us, 0.5), 4) AS p50_dur_us,
      |  ROUND(QUANTILE_CONT(dur_us, 0.9), 4) AS p90_dur_us,
      |  CAST(MAX(dur_us) AS BIGINT) AS max_dur_us
      |FROM per_sess""".stripMargin


  /** Q175 — rolling 7-day active users (the DAU/WAU pair every product
    * dashboard leads with): for each calendar day of the global event
    * span, the count of DISTINCT users active that day (dau) and in the
    * trailing 7-day window (wau7). Sliding DISTINCT is the canonical
    * "not window-frameable" aggregate — distinct counts cannot be
    * combined across frame slides — so the plan EXPANDS instead: each
    * (user, active-day) contributes itself to the ≤7 window-days it can
    * influence, and wau7 is a plain per-day distinct over the expansion.
    *
    * Scale notes: the expansion is row-local (explode of a 7-element
    * sequence off the DEDUPED (user, day) relation, never raw events),
    * so the shuffled volume is 7 × |distinct user-days| — at 100 TB the
    * two count-distincts are Spark's standard two-phase partial
    * aggregates keyed (day, user), no all-days state anywhere. The day
    * spine is bounded by the calendar, and the trailing window never
    * re-scans history: day d's wau7 is assembled from the expansion, not
    * from a 7-day re-read.
    */
  def q175(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val du = c.events
      .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .distinct()
      .localCheckpoint()
    val spine = du.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val dau = du.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val wau = du
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("wday"))
      .groupBy(col("wday"))
      .agg(countDistinct(col("user_id")).as("wau7"))
      .withColumnRenamed("wday", "day")
    spine.join(dau, Seq("day"), "left").join(wau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau7"), lit(0L)).as("wau7"))
      .orderBy(asc("day"))
  }

  val q175Oracle: String =
    """WITH du AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM du),
      |spine AS (SELECT UNNEST(generate_series(d0, d1)) AS day FROM bounds),
      |dau AS (
      |  SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY 1),
      |expanded AS (
      |  SELECT user_id, UNNEST(generate_series(day, day + 6)) AS wday
      |  FROM du),
      |wau AS (
      |  SELECT wday AS day, COUNT(DISTINCT user_id) AS wau7
      |  FROM expanded GROUP BY 1)
      |SELECT s.day, CAST(COALESCE(d.dau, 0) AS BIGINT) AS dau,
      |  CAST(COALESCE(w.wau7, 0) AS BIGINT) AS wau7
      |FROM spine s
      |LEFT JOIN dau d ON d.day = s.day
      |LEFT JOIN wau w ON w.day = s.day
      |ORDER BY s.day""".stripMargin

  /** Q179 — lead–lag cross-correlation between every pair of event
    * types' zero-filled daily count series, lags −3..+3: the exact-
    * integer Pearson correlation (Q128 discipline — num = m·Σab − Σa·Σb,
    * both variance terms exact int64, one final SQRT+divide) between
    * type_a's series and type_b's series shifted by `lag` days. Positive
    * r at positive lag reads "type_a today co-moves with type_b `lag`
    * days later" — the which-metric-leads-which diagnostic behind
    * funnel/alerting dashboards; Q128 is this matrix's diagonal.
    *
    * Both series live on the GLOBAL day spine (union of all types'
    * activity, zero-filled) so every pair compares the same calendar
    * axis and m = spine_days − |lag| uniformly; pairs are type_a <
    * type_b (house Q137 convention; NULL types drop out of the strict
    * inequality). NULL r where either side of the overlap has zero
    * variance.
    *
    * Scale notes: the grid is types × bounded-calendar days, never raw
    * events; the lag shift is one self-join on (day + lag) producing all
    * 7 lags from a single broadcast of the 7-row lag spine; the 5-sum
    * aggregate is map-side combined to (pairs × 7) output rows. Same
    * int64 headroom analysis as Q128 (m·Σa² ≲ days²·peak²; a 100 TB
    * deployment widens to DECIMAL(38,0), same plan shape).
    */
  def q179(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val spine = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val types = daily.select(col("event_type")).distinct()
    val grid = types.crossJoin(spine)
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), coalesce(col("n"), lit(0L)).as("y"))
      .localCheckpoint()
    val lags = spark.range(-3, 4).select(col("id").as("lag"))
    val a = grid.crossJoin(broadcast(lags))
      .select(col("event_type").as("type_a"), col("lag"), col("day"),
        col("y").as("ya"))
    val b = grid.select(col("event_type").as("type_b"), col("day").as("bday"),
      col("y").as("yb"))
    a.join(b, col("type_a") < col("type_b") &&
        col("bday") === col("day") + col("lag"))
      .groupBy(col("type_a"), col("type_b"), col("lag"))
      .agg(count(lit(1)).as("m"), sum(col("ya")).as("sa"),
        sum(col("yb")).as("sb"), sum(col("ya") * col("yb")).as("sab"),
        sum(col("ya") * col("ya")).as("saa"),
        sum(col("yb") * col("yb")).as("sbb"))
      .select(col("type_a"), col("type_b"), col("lag"), col("m"),
        (col("m") * col("sab") - col("sa") * col("sb")).as("num"),
        (col("m") * col("saa") - col("sa") * col("sa")).as("den_a"),
        (col("m") * col("sbb") - col("sb") * col("sb")).as("den_b"))
      .withColumn("r",
        when(col("den_a") > 0L && col("den_b") > 0L,
          round(col("num").cast("double") /
            sqrt(col("den_a").cast("double") * col("den_b").cast("double")), 6)))
      .select(col("type_a"), col("type_b"), col("lag"), col("m"),
        col("num"), col("r"))
      .orderBy(asc("type_a"), asc("type_b"), asc("lag"))
  }

  val q179Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
      |spine AS (SELECT UNNEST(generate_series(d0, d1)) AS day FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM daily),
      |grid AS (
      |  SELECT t.event_type, s.day, COALESCE(d.n, 0) AS y
      |  FROM types t CROSS JOIN spine s
      |  LEFT JOIN daily d
      |  ON d.event_type = t.event_type AND d.day = s.day),
      |joined AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
      |    a.y AS ya, b.y AS yb
      |  FROM grid a
      |  CROSS JOIN (SELECT UNNEST(range(-3, 4)) AS lag) l
      |  JOIN grid b ON a.event_type < b.event_type
      |    AND b.day = a.day + l.lag),
      |sums AS (
      |  SELECT type_a, type_b, lag, COUNT(*) AS m, SUM(ya) AS sa,
      |    SUM(yb) AS sb, SUM(ya*yb) AS sab, SUM(ya*ya) AS saa,
      |    SUM(yb*yb) AS sbb
      |  FROM joined GROUP BY 1, 2, 3)
      |SELECT type_a, type_b, lag, m,
      |  CAST(m*sab - sa*sb AS BIGINT) AS num,
      |  CASE WHEN (m*saa - sa*sa) > 0 AND (m*sbb - sb*sb) > 0 THEN
      |    ROUND(CAST(m*sab - sa*sb AS DOUBLE)
      |      / SQRT(CAST(m*saa - sa*sa AS DOUBLE)
      |             * CAST(m*sbb - sb*sb AS DOUBLE)), 6)
      |  END AS r
      |FROM sums
      |ORDER BY type_a, type_b, lag""".stripMargin

  /** Q180 — burstiness and memory of each event type's inter-arrival
    * process (Goh & Barabási 2008, "Burstiness and memory in complex
    * systems"): B = (σ − μ)/(σ + μ) over the gap distribution (−1
    * regular, 0 Poisson, →1 bursty) and M = Pearson correlation between
    * consecutive gaps (do long gaps follow long gaps?). The pair
    * classifies the arrival process — Q165 reports the gap QUANTILES,
    * this reports its SHAPE, the difference between "slow feed" and
    * "bursty feed with the same mean".
    *
    * Exactness: gaps are integer SECONDS (µs DIV 10⁶ — keeps Σg² and
    * the M-statistic's m·Σab products inside int64 with wide margin at
    * fixture scale; the 100 TB widen-to-DECIMAL note mirrors Q128); μ,
    * σ, B, M derive from exact (n, Σg, Σg²) / 5-sum sufficient
    * statistics in pinned float shapes, rounded once. σ is the sample
    * form √((n·Σg² − (Σg)²)/(n·(n−1))). NULL B when σ + μ = 0 (all
    * gaps zero) or n < 2; NULL M when either pair-variance term is ≤ 0.
    *
    * Scale notes: one (type)-keyed window pass for gaps, a second for
    * the consecutive-pair shift, then two map-side-combinable rollups —
    * output rows = types. No driver math, any series length.
    */
  def q180(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = Window.partitionBy(col("event_type")).orderBy(col("us"), col("event_id"))
    val gaps = c.events
      .select(col("event_type"), expr("ts DIV 1000").as("us"), col("event_id"))
      .withColumn("gus", col("us") - lag(col("us"), 1).over(w))
      .withColumn("g", expr("gus DIV 1000000"))
      .filter(col("g").isNotNull)
      .withColumn("gn", lead(col("g"), 1).over(w))
      .localCheckpoint()
    val base = gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("g")).as("sg"),
        sum(col("g") * col("g")).as("sgg"))
    val pairsAgg = gaps.filter(col("gn").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("m"), sum(col("g")).as("pa"),
        sum(col("gn")).as("pb"), sum(col("g") * col("gn")).as("pab"),
        sum(col("g") * col("g")).as("paa"),
        sum(col("gn") * col("gn")).as("pbb"))
    base.join(pairsAgg, Seq("event_type"), "left")
      .withColumn("mu", col("sg").cast("double") / col("n"))
      .withColumn("sigma",
        when(col("n") >= 2L, sqrt(
          (col("n") * col("sgg") - col("sg") * col("sg")).cast("double") /
            (col("n").cast("double") * (col("n") - 1L)))))
      .select(col("event_type"), col("n").as("n_gaps"),
        round(col("mu"), 4).as("mean_gap_s"),
        when(col("sigma").isNotNull && (col("sigma") + col("mu")) > 0.0,
          round((col("sigma") - col("mu")) / (col("sigma") + col("mu")), 6))
          .as("burstiness"),
        when((col("m") * col("paa") - col("pa") * col("pa")) > 0L &&
            (col("m") * col("pbb") - col("pb") * col("pb")) > 0L,
          round((col("m") * col("pab") - col("pa") * col("pb")).cast("double") /
            sqrt((col("m") * col("paa") - col("pa") * col("pa")).cast("double") *
              (col("m") * col("pbb") - col("pb") * col("pb")).cast("double")), 6))
          .as("memory"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q180Oracle: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) AS us, event_id FROM events),
      |gaps0 AS (
      |  SELECT event_type, us, event_id,
      |    (us - LAG(us) OVER (PARTITION BY event_type
      |       ORDER BY us, event_id)) // 1000000 AS g
      |  FROM e),
      |gaps AS (
      |  SELECT event_type, g,
      |    LEAD(g) OVER (PARTITION BY event_type ORDER BY us, event_id) AS gn
      |  FROM gaps0 WHERE g IS NOT NULL),
      |base AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(g) AS sg, SUM(g*g) AS sgg
      |  FROM gaps GROUP BY 1),
      |pairs AS (
      |  SELECT event_type, COUNT(*) AS m, SUM(g) AS pa, SUM(gn) AS pb,
      |    SUM(g*gn) AS pab, SUM(g*g) AS paa, SUM(gn*gn) AS pbb
      |  FROM gaps WHERE gn IS NOT NULL GROUP BY 1),
      |fin AS (
      |  SELECT b.event_type, b.n, CAST(b.sg AS DOUBLE) / b.n AS mu,
      |    CASE WHEN b.n >= 2 THEN
      |      SQRT(CAST(b.n * b.sgg - b.sg * b.sg AS DOUBLE)
      |        / (CAST(b.n AS DOUBLE) * (b.n - 1))) END AS sigma,
      |    p.m, p.pa, p.pb, p.pab, p.paa, p.pbb
      |  FROM base b LEFT JOIN pairs p ON p.event_type = b.event_type)
      |SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
      |  ROUND(mu, 4) AS mean_gap_s,
      |  CASE WHEN sigma IS NOT NULL AND (sigma + mu) > 0
      |    THEN ROUND((sigma - mu) / (sigma + mu), 6) END AS burstiness,
      |  CASE WHEN (m*paa - pa*pa) > 0 AND (m*pbb - pb*pb) > 0 THEN
      |    ROUND(CAST(m*pab - pa*pb AS DOUBLE)
      |      / SQRT(CAST(m*paa - pa*pa AS DOUBLE)
      |             * CAST(m*pbb - pb*pb AS DOUBLE)), 6) END AS memory
      |FROM fin ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q182 — linear multi-touch attribution curve for first conversions:
    * every `view` in the 72 h before a user's FIRST `purchase` shares
    * that conversion's credit equally (1/n_touch), and the credit mass
    * is rolled up by days-before-purchase — the "how far out do
    * touches still convert" curve that allocates marketing spend.
    * Q153 measures conversion LATENCY (first view → purchase); this
    * allocates the conversion BACK onto the touches.
    *
    * Exactness: the window test and day bucket are integer-µs
    * arithmetic; per-touch credit is 1/n_touch — sums of ≤10⁵ such
    * doubles differ across engines only in accumulation order,
    * absorbed by round(4) (Q137 precedent). Credit conservation
    * (Σ credit = attributed conversions) is pinned in the spec.
    *
    * Scale notes: the purchase side is pre-aggregated to one row per
    * converting user (bounded); the touch join is user-keyed with the
    * 72 h predicate applied on the join — per-user pair volume is
    * linear in that user's views (first-purchase anchor, not
    * all-pairs). Day-bucket rollup is map-side combinable, 4 output
    * rows. Whale users shuffle-salt on the user key like any skewed
    * equi-join (C-capability), same plan shape.
    */
  def q182(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("us"))
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("us")).as("pus"))
    val touches = ev.filter(col("event_type") === "view")
      .join(fp, Seq("user_id"))
      .filter(col("us") < col("pus") &&
        col("us") >= col("pus") - lit(259200000000L))
      .select(col("user_id"), expr("(pus - us) DIV 86400000000").as("days_before"))
    // window over user_id reuses the join's hash partitioning — no new shuffle
    val wU = Window.partitionBy(col("user_id"))
    val credited = touches
      .withColumn("cr", lit(1.0) / count(lit(1)).over(wU))
    val tot = credited.agg(countDistinct(col("user_id")).as("n_conv"))
    credited.groupBy(col("days_before"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("cr")).as("credit_raw"))
      .crossJoin(tot) // single-row aggregate: share denominator
      .select(col("days_before"), col("n_touches"), col("n_users"),
        round(col("credit_raw"), 4).as("credit"),
        round(col("credit_raw") / col("n_conv"), 4).as("credit_share"))
      .orderBy(asc("days_before"))
  }

  val q182Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |fp AS (
      |  SELECT user_id, MIN(us) AS pus FROM ev
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |touch AS (
      |  SELECT v.user_id, (fp.pus - v.us) // 86400000000 AS days_before
      |  FROM ev v JOIN fp ON fp.user_id = v.user_id
      |  WHERE v.event_type = 'view'
      |    AND v.us < fp.pus AND v.us >= fp.pus - 259200000000),
      |cr AS (
      |  SELECT user_id, days_before,
      |    CAST(1 AS DOUBLE) / COUNT(*) OVER (PARTITION BY user_id) AS cr
      |  FROM touch),
      |tot AS (SELECT COUNT(DISTINCT user_id) AS n_conv FROM cr)
      |SELECT days_before,
      |  CAST(COUNT(*) AS BIGINT) AS n_touches,
      |  CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS n_users,
      |  ROUND(SUM(cr), 4) AS credit,
      |  ROUND(SUM(cr) / MAX(t.n_conv), 4) AS credit_share
      |FROM cr c CROSS JOIN tot t
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q183 — walk-forward forecast backtest on the zero-filled daily
    * count series: one-step-ahead NAIVE (ŷ_t = y_{t−1}) and
    * SEASONAL-NAIVE-7 (ŷ_t = y_{t−7}) baselines scored per event type
    * with MAE and sMAPE. These two baselines are the floor every real
    * forecaster (Q123's Holt included) must beat — a model that loses
    * to snaive7 on sMAPE is worse than "same as last week".
    *
    * Exactness: forecasts and absolute errors are exact int64 (lag of
    * an integer series); `sae` ships as the exact integer, MAE is ONE
    * divide of it, and each sMAPE term 2|y−ŷ|/(y+ŷ) is one divide of
    * exact integers (0 when y+ŷ=0, the both-zero convention) — only
    * the sMAPE SUM is order-sensitive (~1e-16 relative), absorbed by
    * round(6). Both lags share one (type, day) window sort.
    *
    * Scale notes: input is the bounded daily grid (types × days), never
    * raw events; the model unpivot doubles grid rows before one
    * map-side-combinable aggregate to 2 rows per type. At 100 TB only
    * the pre-aggregation to the grid touches the corpus.
    */
  def q183(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val spine = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("y"))
    val wT = Window.partitionBy(col("event_type")).orderBy(asc("day"))
    grid
      .withColumn("yh1", lag(col("y"), 1).over(wT))
      .withColumn("yh7", lag(col("y"), 7).over(wT))
      .select(col("event_type"), col("y"),
        explode(array(
          struct(lit("naive").as("model"), col("yh1").as("yh")),
          struct(lit("snaive7").as("model"), col("yh7").as("yh")))).as("m"))
      .select(col("event_type"), col("m.model").as("model"),
        col("y"), col("m.yh").as("yh"))
      .filter(col("yh").isNotNull)
      .groupBy(col("event_type"), col("model"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("y") - col("yh"))).as("sae"),
        sum(when(col("y") + col("yh") > 0L,
          (abs(col("y") - col("yh")) * 2L).cast("double") /
            (col("y") + col("yh")).cast("double")).otherwise(0.0)).as("ssm"))
      .select(col("event_type"), col("model"), col("n_eval"), col("sae"),
        round(col("sae").cast("double") / col("n_eval").cast("double"), 6)
          .as("mae"),
        round(col("ssm") / col("n_eval").cast("double"), 6).as("smape"))
      .orderBy(asc_nulls_first("event_type"), asc("model"))
  }

  val q183Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      |           FROM daily GROUP BY 1),
      |spine AS (SELECT event_type, UNNEST(generate_series(d0, d1)) AS day
      |          FROM bounds),
      |grid AS (
      |  SELECT s.event_type, s.day, COALESCE(d.n, 0) AS y
      |  FROM spine s LEFT JOIN daily d
      |  ON d.event_type = s.event_type AND d.day = s.day),
      |lagged AS (
      |  SELECT event_type, y,
      |    LAG(y, 1) OVER w AS yh1, LAG(y, 7) OVER w AS yh7
      |  FROM grid WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |long AS (
      |  SELECT event_type, 'naive' AS model, y, yh1 AS yh FROM lagged
      |  UNION ALL
      |  SELECT event_type, 'snaive7' AS model, y, yh7 AS yh FROM lagged),
      |agg AS (
      |  SELECT event_type, model, COUNT(*) AS n_eval,
      |    SUM(ABS(y - yh)) AS sae,
      |    SUM(CASE WHEN y + yh > 0 THEN
      |      CAST(ABS(y - yh) * 2 AS DOUBLE) / CAST(y + yh AS DOUBLE)
      |      ELSE 0.0 END) AS ssm
      |  FROM long WHERE yh IS NOT NULL GROUP BY 1, 2)
      |SELECT event_type, model, n_eval, CAST(sae AS BIGINT) AS sae,
      |  ROUND(CAST(sae AS DOUBLE) / CAST(n_eval AS DOUBLE), 6) AS mae,
      |  ROUND(ssm / CAST(n_eval AS DOUBLE), 6) AS smape
      |FROM agg
      |ORDER BY event_type NULLS FIRST, model""".stripMargin

  /** Q186 — temporal load profile per event type over the hour-of-week
    * grid (dow × hour, 168 cells): peak cell and its share, business-
    * hours (Mon–Fri 9–17h), night (0–6h) and weekend shares, and the
    * Shannon entropy of the 168-cell distribution in bits (log2-uniform
    * = 7.392 ceiling) — the capacity-planning / anomaly-baseline view
    * of WHEN a workload happens (Q118 models the trend, Q128 the
    * autocorrelation; this is the clock-face marginal).
    *
    * Exactness: dow/hour are pure integer arithmetic on epoch-µs
    * ((day+3) mod 7 maps Monday→0 … Sunday→6 — 1970-01-01 was a
    * Thursday, epoch day 0 → 3); all shares are ONE
    * divide of exact int64 counts; entropy terms ln(n/N)·n/N use
    * exact-count ratios (Q167 ln-parity discipline), summed over ≤168
    * cells then round(4). Peak cell picked by (count DESC, dow, hour)
    * total order — tie-proof.
    *
    * Scale notes: one partial-aggregated shuffle to the (type × 168)
    * grid; every summary is a map-side fold over that bounded relation.
    */
  def q186(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val cells = c.events
      .select(col("event_type"),
        expr("((ts DIV 1000 DIV 86400000000) + 3) % 7").as("dow"),
        expr("(ts DIV 1000 DIV 3600000000) % 24").as("hour"))
      .groupBy(col("event_type"), col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val wP = Window.partitionBy(col("event_type"))
      .orderBy(desc("n"), asc("dow"), asc("hour"))
    val wT = Window.partitionBy(col("event_type"))
    cells
      .withColumn("rk", row_number().over(wP))
      .withColumn("p",
        col("n").cast("double") / sum(col("n")).over(wT).cast("double"))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("total"),
        max(when(col("rk") === 1,
          struct(col("dow"), col("hour"), col("n")))).as("peak"),
        sum(when(col("dow") < 5 && col("hour") >= 9 && col("hour") < 17,
          col("n")).otherwise(0L)).as("biz"),
        sum(when(col("hour") < 6, col("n")).otherwise(0L)).as("night"),
        sum(when(col("dow") >= 5, col("n")).otherwise(0L)).as("wknd"),
        sum(-col("p") * log(col("p"))).as("hnat"))
      .select(col("event_type"), col("total"),
        col("peak.dow").as("peak_dow"), col("peak.hour").as("peak_hour"),
        round(col("peak.n").cast("double") / col("total").cast("double"), 6)
          .as("peak_share"),
        round(col("biz").cast("double") / col("total").cast("double"), 6)
          .as("biz_share"),
        round(col("night").cast("double") / col("total").cast("double"), 6)
          .as("night_share"),
        round(col("wknd").cast("double") / col("total").cast("double"), 6)
          .as("weekend_share"),
        round(col("hnat") / log(lit(2.0)), 4).as("entropy_bits"))
      .orderBy(asc_nulls_first("event_type"))
  }

  /** Q188 — day-of-week effect test per event type: one-way ANOVA of the
    * zero-filled daily counts grouped by weekday (k ≤ 7 groups), with η²
    * effect size and the peak weekday by mean. Q186 shows the clock-face
    * marginal and Q118 assumes a weekly season; this gate TESTS whether
    * the weekly cycle is statistically real — the decision between "fit
    * a weekly seasonal" and "the flat model is fine" (and whether
    * dow-partitioned capacity planning means anything).
    *
    * Exactness: group sufficient statistics (n_g, Σy, Σy²) are exact
    * int64 off the integer daily grid; every double term is formed by
    * the identical textual cast-then-divide in both engines (cast BEFORE
    * multiply — Σy² products overflow int64 at warehouse scale); the
    * peak argmax compares IEEE-identical s1/n quotients with a dow
    * tiebreak. F/η²/SS rounded at the end (Q184 discipline). NULL F on
    * degenerate series (k<2, N≤k, or zero within-variance).
    *
    * Scale notes: corpus → bounded daily grid (one shuffle) → ≤7×types
    * cells → types rows. The window for the peak runs on the ≤7-row
    * per-type cell relation.
    */
  def q188(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val spine = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), expr("(day + 3) % 7").as("dow"),
        coalesce(col("n"), lit(0L)).as("y"))
    val cell = grid.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_g"), sum(col("y")).as("s1"),
        sum(col("y") * col("y")).as("s2"))
      .withColumn("mean_g",
        col("s1").cast("double") / col("n_g").cast("double"))
    val wP = Window.partitionBy(col("event_type"))
      .orderBy(desc("mean_g"), asc("dow"))
    cell.withColumn("rk", row_number().over(wP))
      .groupBy(col("event_type"))
      .agg(sum(col("n_g")).as("n_days"), count(lit(1)).as("k_dows"),
        sum(col("s1")).as("t_all"), sum(col("s2")).as("ss_all"),
        sum(col("s1").cast("double") * col("s1").cast("double") /
          col("n_g").cast("double")).as("sgr"),
        max(when(col("rk") === 1,
          struct(col("dow"), col("mean_g")))).as("peak"))
      .select(col("event_type"), col("n_days"), col("k_dows"),
        (col("sgr") - col("t_all").cast("double") * col("t_all").cast("double") /
          col("n_days").cast("double")).as("ssb"),
        (col("ss_all").cast("double") - col("sgr")).as("ssw"),
        col("peak"))
      .select(col("event_type"), col("n_days"), col("k_dows"),
        round(col("ssb"), 4).as("ssb"), round(col("ssw"), 4).as("ssw"),
        when(col("k_dows") > 1L && col("n_days") > col("k_dows") &&
            col("ssw") > 0.0,
          round((col("ssb") / (col("k_dows") - 1L).cast("double")) /
            (col("ssw") / (col("n_days") - col("k_dows")).cast("double")), 4))
          .as("f"),
        when(col("ssb") + col("ssw") > 0.0,
          round(col("ssb") / (col("ssb") + col("ssw")), 6)).as("eta2"),
        col("peak.dow").as("peak_dow"),
        round(col("peak.mean_g"), 4).as("peak_mean"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q188Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      |           FROM daily GROUP BY 1),
      |spine AS (SELECT event_type, UNNEST(generate_series(d0, d1)) AS day
      |          FROM bounds),
      |grid AS (
      |  SELECT s.event_type, (s.day + 3) % 7 AS dow, COALESCE(d.n, 0) AS y
      |  FROM spine s LEFT JOIN daily d
      |  ON d.event_type = s.event_type AND d.day = s.day),
      |cell AS (
      |  SELECT event_type, dow, COUNT(*) AS n_g, SUM(y) AS s1,
      |    SUM(y * y) AS s2,
      |    CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_g
      |  FROM grid GROUP BY 1, 2),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY mean_g DESC, dow) AS rk
      |  FROM cell),
      |agg AS (
      |  SELECT event_type, CAST(SUM(n_g) AS BIGINT) AS n_days,
      |    COUNT(*) AS k_dows,
      |    CAST(SUM(s1) AS BIGINT) AS t_all,
      |    SUM(CAST(s2 AS DOUBLE)) AS ss_all,
      |    SUM(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
      |        / CAST(n_g AS DOUBLE)) AS sgr,
      |    MAX(CASE WHEN rk = 1 THEN dow END) AS peak_dow,
      |    MAX(CASE WHEN rk = 1 THEN mean_g END) AS peak_mean
      |  FROM ranked GROUP BY 1),
      |ss AS (
      |  SELECT event_type, n_days, k_dows,
      |    sgr - CAST(t_all AS DOUBLE) * CAST(t_all AS DOUBLE)
      |        / CAST(n_days AS DOUBLE) AS ssb,
      |    ss_all - sgr AS ssw, peak_dow, peak_mean
      |  FROM agg)
      |SELECT event_type, n_days, k_dows,
      |  ROUND(ssb, 4) AS ssb, ROUND(ssw, 4) AS ssw,
      |  CASE WHEN k_dows > 1 AND n_days > k_dows AND ssw > 0 THEN
      |    ROUND((ssb / CAST(k_dows - 1 AS DOUBLE))
      |      / (ssw / CAST(n_days - k_dows AS DOUBLE)), 4) END AS f,
      |  CASE WHEN ssb + ssw > 0 THEN
      |    ROUND(ssb / (ssb + ssw), 6) END AS eta2,
      |  peak_dow, ROUND(peak_mean, 4) AS peak_mean
      |FROM ss
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q192 — cohort LTV curve: cumulative purchase revenue per weekly
    * first-activity cohort, normalized per cohort user. Q132 counts who
    * COMES BACK; this tracks what each cohort is WORTH as it ages — the
    * payback-period curve (does week-0 acquisition spend recover by
    * week k?). One row per (cohort, offset) with revenue that week,
    * cumulative revenue, and cumulative cents per cohort user; offsets
    * appear where the cohort had purchase revenue (sparse curve, the
    * cumulative window runs over observed offsets).
    *
    * Exactness: revenue is the engine-wide exact-cents convention
    * (ROUND(value·100) → int64); weekly and cumulative sums are exact
    * int64; the per-user normalization is ONE divide, round(4). Cohort
    * assignment is Q132's (min week over ALL activity, not just
    * purchases).
    *
    * Scale notes: first-week and purchase relations co-key on user_id
    * (one shuffle each), cells are cohort×offset-bounded, the
    * cumulative window sorts the tiny cell relation, cohort sizes
    * broadcast.
    */
  def q192(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("user_id"), col("event_type"),
      expr("ts DIV 1000 DIV 604800000000").as("wk"),
      round(col("value") * 100).cast("long").as("cents"))
    val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      .localCheckpoint()
    val sizes = first.groupBy(col("cohort_wk"))
      .agg(count(lit(1)).as("cohort_users"))
    val weekly = ev.filter(col("event_type") === "purchase")
      .join(first, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
      .agg(sum(col("cents")).as("wk_rev_cents"))
    val wC = Window.partitionBy(col("cohort_wk")).orderBy(asc("wk_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly
      .withColumn("cum_rev_cents", sum(col("wk_rev_cents")).over(wC))
      .join(sizes, Seq("cohort_wk"))
      .select(col("cohort_wk"), col("wk_offset"), col("wk_rev_cents"),
        col("cum_rev_cents"), col("cohort_users"),
        round(col("cum_rev_cents").cast("double") /
          col("cohort_users").cast("double"), 4).as("ltv_cents_per_user"))
      .orderBy(asc("cohort_wk"), asc("wk_offset"))
  }

  val q192Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) // 604800000000 AS wk,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |first_wk AS (
      |  SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY 1),
      |sizes AS (
      |  SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS cohort_users
      |  FROM first_wk GROUP BY 1),
      |weekly AS (
      |  SELECT f.cohort_wk, e.wk - f.cohort_wk AS wk_offset,
      |    CAST(SUM(e.cents) AS BIGINT) AS wk_rev_cents
      |  FROM ev e JOIN first_wk f ON f.user_id = e.user_id
      |  WHERE e.event_type = 'purchase'
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort_wk, wk_offset, wk_rev_cents,
      |    CAST(SUM(wk_rev_cents) OVER (PARTITION BY cohort_wk
      |      ORDER BY wk_offset
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_rev_cents
      |  FROM weekly)
      |SELECT c.cohort_wk, c.wk_offset, c.wk_rev_cents, c.cum_rev_cents,
      |  s.cohort_users,
      |  ROUND(CAST(c.cum_rev_cents AS DOUBLE)
      |    / CAST(s.cohort_users AS DOUBLE), 4) AS ltv_cents_per_user
      |FROM cum c JOIN sizes s ON s.cohort_wk = c.cohort_wk
      |ORDER BY c.cohort_wk, c.wk_offset""".stripMargin

  /** Q193 — event-type lift matrix across users: for every unordered
    * type pair, how many users do both, and the lift
    * (n_ab·N)/(n_a·n_b) vs independence — the behavioral-correlation
    * read ("do users who ever error also purchase?") that Q107 answers
    * for order baskets and this answers for user journeys; with the
    * user-set Jaccard as the symmetric-overlap companion.
    *
    * Exactness: all counts are exact int64 over the DISTINCT
    * (user, type) relation; lift and jaccard are ONE divide each
    * (cast-before-multiply), round(4)/(6).
    *
    * Scale notes: the distinct relation is one shuffle; the pair join
    * is user-keyed and fans out ≤ |types|²/2 rows per user (types
    * bounded); margins and the user total are broadcast-sized.
    */
  def q193(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ut = c.events.select(col("user_id"), col("event_type")).distinct()
      .localCheckpoint()
    val margins = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val tot = ut.agg(countDistinct(col("user_id")).as("n_users"))
    val a = ut.select(col("user_id"), col("event_type").as("type_a"))
    val b = ut.select(col("user_id"), col("event_type").as("type_b"))
    a.join(b, Seq("user_id")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_ab"))
      .join(broadcast(margins.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(margins.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), Seq("type_b"))
      .crossJoin(tot) // single-row user total
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        round(col("n_ab").cast("double") * col("n_users").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 4)
          .as("lift"),
        round(col("n_ab").cast("double") /
          (col("n_a") + col("n_b") - col("n_ab")).cast("double"), 6)
          .as("user_jaccard"))
      .orderBy(asc_nulls_first("type_a"), asc_nulls_first("type_b"))
  }

  val q193Oracle: String =
    """WITH ut AS (
      |  SELECT DISTINCT user_id, event_type FROM events),
      |margins AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM ut GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |        FROM ut),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_ab
      |  FROM ut a JOIN ut b
      |  ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT p.type_a, p.type_b, ma.n AS n_a, mb.n AS n_b, p.n_ab,
      |  ROUND(CAST(p.n_ab AS DOUBLE) * CAST(t.n_users AS DOUBLE)
      |    / (CAST(ma.n AS DOUBLE) * CAST(mb.n AS DOUBLE)), 4) AS lift,
      |  ROUND(CAST(p.n_ab AS DOUBLE)
      |    / CAST(ma.n + mb.n - p.n_ab AS DOUBLE), 6) AS user_jaccard
      |FROM pairs p
      |JOIN margins ma ON ma.event_type = p.type_a
      |JOIN margins mb ON mb.event_type = p.type_b
      |CROSS JOIN tot t
      |ORDER BY p.type_a NULLS FIRST, p.type_b NULLS FIRST""".stripMargin

  /** Q194 — weekly growth accounting: the MAU accounting identity. Every
    * active user-week is classified NEW (first-ever week), RETAINED
    * (also active the immediately preceding week) or RESURRECTED
    * (returning after a gap); CHURNED(w) counts users active in w−1 and
    * absent in w. Emitted on the full global week spine (zero-filled),
    * with the quick ratio (new+resurrected)/churned. Q65/Q132 give the
    * cohort-shaped retention matrix; this is the week-over-week
    * gains/losses ledger a growth team actually reads, and the identity
    * active = new + retained + resurrected is pinned in the spec.
    *
    * Exactness: pure integer counts off the DISTINCT (user, week)
    * relation; the quick ratio is ONE divide, NULL when churn is 0.
    *
    * Scale notes: one user-keyed shuffle builds the distinct relation;
    * the classification windows (lag/lead + running min) share that
    * user sort; weekly rollups are map-side-combinable to the bounded
    * week spine.
    */
  def q194(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val uw = c.events
      .select(col("user_id"), expr("ts DIV 1000 DIV 604800000000").as("wk"))
      .distinct()
      .localCheckpoint()
    val wU = Window.partitionBy(col("user_id")).orderBy(asc("wk"))
    val classified = uw
      .withColumn("first_wk", min(col("wk")).over(
        wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("lag_wk", lag(col("wk"), 1).over(wU))
      .withColumn("lead_wk", lead(col("wk"), 1).over(wU))
    val weekly = classified.groupBy(col("wk"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("wk") === col("first_wk"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("lag_wk") === col("wk") - 1L, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("lag_wk").isNotNull && col("lag_wk") < col("wk") - 1L,
          1L).otherwise(0L)).as("n_resurrected"))
    // churned(w) = users active in w-1 with no activity in w
    val churn = classified
      .filter(col("lead_wk").isNull || col("lead_wk") > col("wk") + 1L)
      .groupBy((col("wk") + 1L).as("wk"))
      .agg(count(lit(1)).as("n_churned"))
    val spine = uw.agg(min(col("wk")).as("w0"), max(col("wk")).as("w1"))
      .select(explode(sequence(col("w0"), col("w1"))).as("wk"))
    spine
      .join(weekly, Seq("wk"), "left")
      .join(churn, Seq("wk"), "left")
      .select(col("wk"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .withColumn("quick_ratio",
        when(col("n_churned") > 0L,
          round((col("n_new") + col("n_resurrected")).cast("double") /
            col("n_churned").cast("double"), 4)))
      .orderBy(asc("wk"))
  }

  val q194Oracle: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
      |  FROM events),
      |cls AS (
      |  SELECT user_id, wk,
      |    MIN(wk) OVER (PARTITION BY user_id ORDER BY wk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_wk,
      |    LAG(wk, 1) OVER (PARTITION BY user_id ORDER BY wk) AS lag_wk,
      |    LEAD(wk, 1) OVER (PARTITION BY user_id ORDER BY wk) AS lead_wk
      |  FROM uw),
      |weekly AS (
      |  SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_active,
      |    CAST(SUM(CASE WHEN wk = first_wk THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_new,
      |    CAST(SUM(CASE WHEN lag_wk = wk - 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_retained,
      |    CAST(SUM(CASE WHEN lag_wk IS NOT NULL AND lag_wk < wk - 1
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      |  FROM cls GROUP BY 1),
      |churn AS (
      |  SELECT wk + 1 AS wk, CAST(COUNT(*) AS BIGINT) AS n_churned
      |  FROM cls
      |  WHERE lead_wk IS NULL OR lead_wk > wk + 1
      |  GROUP BY 1),
      |spine AS (
      |  SELECT UNNEST(generate_series(MIN(wk), MAX(wk))) AS wk FROM uw)
      |SELECT s.wk,
      |  COALESCE(w.n_active, 0) AS n_active,
      |  COALESCE(w.n_new, 0) AS n_new,
      |  COALESCE(w.n_retained, 0) AS n_retained,
      |  COALESCE(w.n_resurrected, 0) AS n_resurrected,
      |  COALESCE(c.n_churned, 0) AS n_churned,
      |  CASE WHEN COALESCE(c.n_churned, 0) > 0 THEN
      |    ROUND(CAST(COALESCE(w.n_new, 0) + COALESCE(w.n_resurrected, 0)
      |      AS DOUBLE) / CAST(c.n_churned AS DOUBLE), 4) END AS quick_ratio
      |FROM spine s
      |LEFT JOIN weekly w ON w.wk = s.wk
      |LEFT JOIN churn c ON c.wk = s.wk
      |ORDER BY s.wk""".stripMargin

  val q186Oracle: String =
    """WITH cells AS (
      |  SELECT event_type,
      |    ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow,
      |    (epoch_us(ts) // 3600000000) % 24 AS hour,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2, 3),
      |ranked AS (
      |  SELECT event_type, dow, hour, n,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY n DESC, dow, hour) AS rk,
      |    CAST(n AS DOUBLE)
      |      / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS p
      |  FROM cells),
      |agg AS (
      |  SELECT event_type, SUM(n) AS total,
      |    MAX(CASE WHEN rk = 1 THEN dow END) AS peak_dow,
      |    MAX(CASE WHEN rk = 1 THEN hour END) AS peak_hour,
      |    MAX(CASE WHEN rk = 1 THEN n END) AS peak_n,
      |    SUM(CASE WHEN dow < 5 AND hour >= 9 AND hour < 17
      |        THEN n ELSE 0 END) AS biz,
      |    SUM(CASE WHEN hour < 6 THEN n ELSE 0 END) AS night,
      |    SUM(CASE WHEN dow >= 5 THEN n ELSE 0 END) AS wknd,
      |    SUM(-p * LN(p)) AS hnat
      |  FROM ranked GROUP BY 1)
      |SELECT event_type, CAST(total AS BIGINT) AS total,
      |  peak_dow, peak_hour,
      |  ROUND(CAST(peak_n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS peak_share,
      |  ROUND(CAST(biz AS DOUBLE) / CAST(total AS DOUBLE), 6) AS biz_share,
      |  ROUND(CAST(night AS DOUBLE) / CAST(total AS DOUBLE), 6) AS night_share,
      |  ROUND(CAST(wknd AS DOUBLE) / CAST(total AS DOUBLE), 6)
      |    AS weekend_share,
      |  ROUND(hnat / LN(2), 4) AS entropy_bits
      |FROM agg ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q219 — STL-lite decomposition strength per event type: the daily
    * revenue-cents series (zero-filled spine) split into trend
    * (centered 7-day moving average, full-window days only), weekly
    * seasonal (per-day-of-week mean of the detrended series), and
    * residual; reported as variances plus Hyndman & Athanasopoulos'
    * strength measures F_trend = max(0, 1 − Var(R)/Var(T+R)) and
    * F_seasonal = max(0, 1 − Var(R)/Var(S+R)) — the one-row-per-series
    * answer to "is this series trending / weekly-seasonal enough to
    * model those components".
    *
    * Determinism: the spine is exact int64 cents converted once to
    * dollar units (one IEEE divide — keeps the round-4 variance
    * magnitudes inside cross-engine double-sum reproducibility; raw
    * cents² variances at ~1e8 demand ~1e-13 relative agreement, which
    * engine-order double sums do not guarantee); trend and seasonal
    * means are double divisions of those values; variances use the
    * AVG(x²) − AVG(x)² identity with identical expression text; only
    * ROUND-4 outputs. DOW is the epoch-day mod 7 (day 0 = Thursday) —
    * an arbitrary but engine-identical labeling, irrelevant to the
    * strengths.
    *
    * Scale notes: everything after the one daily aggregate runs on the
    * bounded spine (days × types); two window passes (centered MA,
    * per-dow mean) + one rollup. The decomposition never touches raw
    * events twice.
    */
  def q219(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).cast("long").as("v"))
    val ext = daily.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
    val spine = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(ext))
      .select(col("event_type"), explode(expr("sequence(dmin, dmax)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        (coalesce(col("v"), lit(0L)).cast("double") / lit(100.0)).as("v"))
    val wMa = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val trended = spine
      .withColumn("win_n", count(lit(1)).over(wMa))
      .withColumn("trend", sum(col("v")).over(wMa) / lit(7.0))
      .filter(col("win_n") === 7)
      .withColumn("dow", pmod(col("day"), lit(7L)))
      .withColumn("detr", col("v") - col("trend"))
    val wDow = Window.partitionBy(col("event_type"), col("dow"))
    val comps = trended
      .withColumn("seas", avg(col("detr")).over(wDow))
      .withColumn("resid", col("detr") - col("seas"))
    def varOf(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      avg(x * x) - avg(x) * avg(x)
    comps.groupBy(col("event_type")).agg(
        count(lit(1)).as("n_days"),
        round(varOf(col("v")), 4).as("var_total"),
        round(varOf(col("trend")), 4).as("var_trend"),
        round(varOf(col("seas")), 4).as("var_seasonal"),
        round(varOf(col("resid")), 4).as("var_residual"),
        round(greatest(lit(0.0),
          lit(1.0) - varOf(col("resid")) / varOf(col("v") - col("seas"))), 4)
          .as("f_trend"),
        round(greatest(lit(0.0),
          lit(1.0) - varOf(col("resid")) / varOf(col("detr"))), 4)
          .as("f_seasonal"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q219Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |ext AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM daily),
      |spine AS (
      |  SELECT t.event_type, g.day, CAST(COALESCE(d.v, 0) AS DOUBLE) / 100.0
      |    AS v
      |  FROM (SELECT DISTINCT event_type FROM daily) t
      |  CROSS JOIN (SELECT UNNEST(range(dmin, dmax + 1)) AS day FROM ext) g
      |  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = g.day),
      |trended AS (
      |  SELECT event_type, day, v,
      |    SUM(v) OVER w / 7.0 AS trend,
      |    COUNT(*) OVER w AS win_n,
      |    day % 7 AS dow
      |  FROM spine
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |comps AS (
      |  SELECT event_type, v, trend, v - trend AS detr,
      |    AVG(v - trend) OVER (PARTITION BY event_type, dow) AS seas
      |  FROM trended WHERE win_n = 7),
      |comps2 AS (
      |  SELECT event_type, v, trend, detr, seas, detr - seas AS resid
      |  FROM comps)
      |SELECT event_type, COUNT(*) AS n_days,
      |  ROUND(AVG(v * v) - AVG(v) * AVG(v), 4) AS var_total,
      |  ROUND(AVG(trend * trend) - AVG(trend) * AVG(trend), 4) AS var_trend,
      |  ROUND(AVG(seas * seas) - AVG(seas) * AVG(seas), 4) AS var_seasonal,
      |  ROUND(AVG(resid * resid) - AVG(resid) * AVG(resid), 4)
      |    AS var_residual,
      |  ROUND(GREATEST(0.0, 1.0 - (AVG(resid * resid) - AVG(resid)
      |    * AVG(resid)) / (AVG((v - seas) * (v - seas)) - AVG(v - seas)
      |    * AVG(v - seas))), 4) AS f_trend,
      |  ROUND(GREATEST(0.0, 1.0 - (AVG(resid * resid) - AVG(resid)
      |    * AVG(resid)) / (AVG(detr * detr) - AVG(detr) * AVG(detr))), 4)
      |    AS f_seasonal
      |FROM comps2
      |GROUP BY 1
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q338 — diurnal (hour-of-day) usage fingerprint per event type: the
    * 24-bin UTC hour histogram summarized as a χ² test against the
    * uniform clock, the peak hour and its traffic share, and a
    * 'diurnal' / 'flat' verdict. The WITHIN-day twin of the
    * day-of-week family (Q188/Q279 weekly cycle, Q118/Q219 seasonal
    * decompositions): capacity planning and bot/batch-traffic
    * screening read exactly this — human traffic concentrates in
    * waking hours, machine traffic doesn't.
    *
    * Determinism: hour = ((ts DIV 1000) DIV 3600000000) % 24 is pure
    * integer arithmetic on the epoch (the day-index idiom's hourly
    * sibling — no calendar functions); χ² against uniform collapses
    * algebraically to (24·Σo² − n²)/n, carried in DECIMAL(38,0)/
    * HUGEINT (Σo² overflows int64 once a single (type, hour) cell
    * passes ~3·10⁹ rows — reachable at 100 TB) with ONE terminal
    * divide rounded 4; peak share is one divide rounded 6; the
    * verdict compares the exact cross-product 24·max_o ≥ 2·n (peak
    * carries ≥ 2× its uniform share), int64-safe to n ≈ 4·10¹⁷ rows
    * per type. Peak-hour ties break to the earliest hour in both
    * engines.
    *
    * Scale notes: ONE corpus scan folds to ≤ 24·|types| cells
    * (map-side combinable — the Q116 bounded-cells shape); everything
    * downstream is arithmetic on that bounded relation. The argmax is
    * a bounded self-join on the 120-cell relation, not a window over
    * the corpus. Flat in corpus size.
    */
  def q338(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val hrs = c.events
      .select(col("event_type"),
        expr("((ts DIV 1000) DIV 3600000000) % 24").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint() // ≤ 24·|types| cells; feeds the summary AND the argmax
    val s = hrs.groupBy(col("event_type")).agg(
      sum(col("o")).cast("long").as("n"),
      sum(col("o").cast("decimal(38,0)") * col("o"))
        .cast("decimal(38,0)").as("sum_o2"),
      max(col("o")).cast("long").as("max_o"),
      count(lit(1)).cast("long").as("n_hours_active"))
    val p = hrs
      .join(s.select(col("event_type"), col("max_o")), Seq("event_type"))
      .filter(col("o") === col("max_o"))
      .groupBy(col("event_type"))
      .agg(min(col("hr")).cast("long").as("peak_hr"))
    s.join(p, Seq("event_type"))
      .select(col("event_type"), col("n"), col("n_hours_active"),
        expr("ROUND(CAST(CAST(24 AS DECIMAL(38,0)) * sum_o2 - " +
          "CAST(n AS DECIMAL(38,0)) * n AS DOUBLE) / n, 4)")
          .as("chi2_uniform"),
        col("peak_hr"),
        expr("ROUND(CAST(max_o AS DOUBLE) / n, 6)").as("peak_share"),
        expr("CASE WHEN 24 * max_o >= 2 * n THEN 'diurnal' " +
          "ELSE 'flat' END").as("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q338Oracle: String =
    """WITH hrs AS (
      |  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hr,
      |    CAST(COUNT(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, CAST(SUM(o) AS BIGINT) AS n,
      |    SUM(CAST(o AS HUGEINT) * o) AS sum_o2,
      |    CAST(MAX(o) AS BIGINT) AS max_o,
      |    CAST(COUNT(*) AS BIGINT) AS n_hours_active
      |  FROM hrs GROUP BY 1),
      |p AS (
      |  SELECT h.event_type, CAST(MIN(h.hr) AS BIGINT) AS peak_hr
      |  FROM hrs h JOIN s ON s.event_type = h.event_type AND h.o = s.max_o
      |  GROUP BY 1)
      |SELECT s.event_type, s.n, s.n_hours_active,
      |  ROUND(CAST(CAST(24 AS HUGEINT) * s.sum_o2 -
      |    CAST(s.n AS HUGEINT) * s.n AS DOUBLE) / s.n, 4) AS chi2_uniform,
      |  p.peak_hr,
      |  ROUND(CAST(s.max_o AS DOUBLE) / s.n, 6) AS peak_share,
      |  CASE WHEN 24 * s.max_o >= 2 * s.n THEN 'diurnal' ELSE 'flat' END
      |    AS verdict
      |FROM s JOIN p ON p.event_type = s.event_type
      |ORDER BY s.event_type NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q338" -> (q338 _),
    "Q219" -> (q219 _),
    "Q40" -> (q40 _), "Q41" -> (q41 _), "Q42" -> (q42 _), "Q43" -> (q43 _),
    "Q59" -> (q59 _), "Q63" -> (q63 _), "Q65" -> (q65 _), "Q86" -> (q86 _),
    "Q87" -> (q87 _), "Q100" -> (q100 _), "Q104" -> (q104 _),
    "Q108" -> (q108 _), "Q109" -> (q109 _), "Q118" -> (q118 _),
    "Q123" -> (q123 _), "Q124" -> (q124 _), "Q125" -> (q125 _),
    "Q128" -> (q128 _), "Q130" -> (q130 _), "Q132" -> (q132 _),
    "Q134" -> (q134 _), "Q136" -> (q136 _), "Q149" -> (q149 _),
    "Q150" -> (q150 _), "Q152" -> (q152 _), "Q153" -> (q153 _),
    "Q157" -> (q157 _), "Q165" -> (q165 _), "Q169" -> (q169 _),
    "Q175" -> (q175 _), "Q179" -> (q179 _), "Q180" -> (q180 _),
    "Q182" -> (q182 _), "Q183" -> (q183 _), "Q186" -> (q186 _),
    "Q188" -> (q188 _), "Q192" -> (q192 _), "Q193" -> (q193 _),
    "Q194" -> (q194 _), "Q269" -> (q269 _), "Q272" -> (q272 _))

  /** Q272 — Allen interval-algebra profile between event-type activity
    * spans (Allen, CACM 1983): per user each type's activity interval
    * is [first µs, last µs]; every ordered type pair classifies into
    * one of Allen's 13 exhaustive, mutually exclusive temporal
    * relations (before/meets/overlaps/starts/during/finishes, their
    * inverses, equals), and the corpus rolls up to the
    * (type_a, type_b, relation) distribution — the qualitative
    * temporal-structure read (does signup activity PRECEDE or OVERLAP
    * purchase activity?) that lag correlations (Q179/Q216) cannot
    * express. Degenerate point intervals (one event) classify by the
    * same predicates — the 13 cases stay exhaustive.
    *
    * Determinism: endpoints are exact integer µs under the engine's
    * single time convention; the 13-way CASE is ordered identically in
    * both engines over pure int comparisons; shares round at 6.
    *
    * Scale notes: one user-keyed aggregate to |users|·|types| interval
    * rows, a per-user type-pair join in the COLLAPSED domain (k²/2 per
    * user), one bounded rollup — the corpus is never self-joined at
    * event granularity.
    */
  def q272(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val iv = c.events
      .select(col("user_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("us")).as("s"), max(col("us")).as("e"))
    val a = iv.select(col("user_id"), col("event_type").as("type_a"),
      col("s").as("sa"), col("e").as("ea"))
    val b = iv.select(col("user_id").as("ub"), col("event_type").as("type_b"),
      col("s").as("sb"), col("e").as("eb"))
    val rel = a.join(b,
        col("user_id") === col("ub") && col("type_a") < col("type_b"))
      .withColumn("relation",
        when(col("ea") < col("sb"), "before")
          .when(col("ea") === col("sb"), "meets")
          .when(col("eb") < col("sa"), "after")
          .when(col("eb") === col("sa"), "met_by")
          .when(col("sa") === col("sb") && col("ea") === col("eb"), "equals")
          .when(col("sa") === col("sb") && col("ea") < col("eb"), "starts")
          .when(col("sa") === col("sb"), "started_by")
          .when(col("ea") === col("eb") && col("sa") > col("sb"), "finishes")
          .when(col("ea") === col("eb"), "finished_by")
          .when(col("sa") > col("sb") && col("ea") < col("eb"), "during")
          .when(col("sa") < col("sb") && col("ea") > col("eb"), "contains")
          .when(col("sa") < col("sb"), "overlaps")
          .otherwise("overlapped_by"))
    val cnt = rel.groupBy(col("type_a"), col("type_b"), col("relation"))
      .agg(count(lit(1)).cast("long").as("n_users"))
    val tot = cnt.groupBy(col("type_a"), col("type_b"))
      .agg(sum(col("n_users")).cast("long").as("n_pair_users"))
    cnt.join(tot, Seq("type_a", "type_b"))
      .withColumn("share",
        round(col("n_users").cast("double") / col("n_pair_users"), 6))
      .select(col("type_a"), col("type_b"), col("relation"),
        col("n_users"), col("n_pair_users"), col("share"))
      .orderBy(asc_nulls_first("type_a"), asc_nulls_first("type_b"),
        asc_nulls_first("relation"))
  }

  val q272Oracle: String =
    """WITH iv AS (
      |  SELECT user_id, event_type,
      |    MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
      |  FROM events GROUP BY 1, 2),
      |rel AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CASE
      |      WHEN a.e < b.s THEN 'before'
      |      WHEN a.e = b.s THEN 'meets'
      |      WHEN b.e < a.s THEN 'after'
      |      WHEN b.e = a.s THEN 'met_by'
      |      WHEN a.s = b.s AND a.e = b.e THEN 'equals'
      |      WHEN a.s = b.s AND a.e < b.e THEN 'starts'
      |      WHEN a.s = b.s THEN 'started_by'
      |      WHEN a.e = b.e AND a.s > b.s THEN 'finishes'
      |      WHEN a.e = b.e THEN 'finished_by'
      |      WHEN a.s > b.s AND a.e < b.e THEN 'during'
      |      WHEN a.s < b.s AND a.e > b.e THEN 'contains'
      |      WHEN a.s < b.s THEN 'overlaps'
      |      ELSE 'overlapped_by' END AS relation
      |  FROM iv a JOIN iv b
      |    ON b.user_id = a.user_id AND a.event_type < b.event_type),
      |cnt AS (
      |  SELECT type_a, type_b, relation, CAST(COUNT(*) AS BIGINT) AS n_users
      |  FROM rel GROUP BY 1, 2, 3),
      |tot AS (
      |  SELECT type_a, type_b, CAST(SUM(n_users) AS BIGINT) AS n_pair_users
      |  FROM cnt GROUP BY 1, 2)
      |SELECT c.type_a, c.type_b, c.relation, c.n_users, t.n_pair_users,
      |  ROUND(CAST(c.n_users AS DOUBLE) / t.n_pair_users, 6) AS share
      |FROM cnt c JOIN tot t
      |  ON t.type_a = c.type_a AND t.type_b = c.type_b
      |ORDER BY c.type_a NULLS FIRST, c.type_b NULLS FIRST,
      |  c.relation NULLS FIRST""".stripMargin

  /** Q269 — TIME-CONSTRAINED funnel (the Amplitude/Mixpanel "within N
    * hours" form): Q63's view→click→purchase funnel with each step
    * required within 24 h of the previous qualifying step — the
    * constraint that separates "eventually converted" from "converted
    * through THIS journey". Stage anchors are first-qualifying events
    * (min µs after the previous anchor, inside the window), so the
    * funnel is deterministic under the exact integer-µs order; emits
    * stage counts, step/overall conversion rates, and exact-µs
    * latency profiles (avg/max seconds) per step.
    *
    * Determinism: anchors and latencies are exact int64 µs; rates and
    * averages are one divide each, rounded once.
    *
    * Scale notes: three user-keyed min-aggregates chained by joins on
    * the SAME key (exchange reuse), then single-row rollup — Q63's
    * topology plus the window predicate, nothing more.
    */
  def q269(spark: SparkSession, dir: String): DataFrame = {
    val W = 86400000000L // 24 h in µs
    val c = Catalog(spark, dir)
    val e = c.events.select(
      col("user_id"), col("event_type"), expr("ts DIV 1000").as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val cl = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("us") > col("t1") && col("us") <= col("t1") + lit(W))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2"),
        min(col("t1")).as("t1k"))
    val p = e.filter(col("event_type") === "purchase")
      .join(cl, Seq("user_id"))
      .filter(col("us") > col("t2") && col("us") <= col("t2") + lit(W))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3"),
        min(col("t2")).as("t2k"))
    val s1 = v.agg(count(lit(1)).cast("long").as("n_view"))
    val s2 = cl.agg(count(lit(1)).cast("long").as("n_click_24h"),
      round(avg((col("t2") - col("t1k")).cast("double") / 1e6), 2)
        .as("avg_lat12_s"),
      round(max(col("t2") - col("t1k")).cast("double") / 1e6, 2)
        .as("max_lat12_s"))
    val s3 = p.agg(count(lit(1)).cast("long").as("n_purchase_24h"),
      round(avg((col("t3") - col("t2k")).cast("double") / 1e6), 2)
        .as("avg_lat23_s"),
      round(max(col("t3") - col("t2k")).cast("double") / 1e6, 2)
        .as("max_lat23_s"))
    s1.crossJoin(s2).crossJoin(s3)
      .withColumn("conv_12", when(col("n_view") > 0,
        round(col("n_click_24h").cast("double") / col("n_view"), 6)))
      .withColumn("conv_23", when(col("n_click_24h") > 0,
        round(col("n_purchase_24h").cast("double") / col("n_click_24h"), 6)))
      .withColumn("conv_13", when(col("n_view") > 0,
        round(col("n_purchase_24h").cast("double") / col("n_view"), 6)))
      .select(col("n_view"), col("n_click_24h"), col("n_purchase_24h"),
        col("conv_12"), col("conv_23"), col("conv_13"),
        col("avg_lat12_s"), col("max_lat12_s"),
        col("avg_lat23_s"), col("max_lat23_s"))
  }

  val q269Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |v AS (
      |  SELECT user_id, MIN(us) AS t1 FROM e
      |  WHERE event_type = 'view' GROUP BY user_id),
      |cl AS (
      |  SELECT e.user_id, MIN(us) AS t2, MIN(t1) AS t1k
      |  FROM e JOIN v USING (user_id)
      |  WHERE event_type = 'click' AND us > t1 AND us <= t1 + 86400000000
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(us) AS t3, MIN(t2) AS t2k
      |  FROM e JOIN cl USING (user_id)
      |  WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + 86400000000
      |  GROUP BY e.user_id),
      |s1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_view FROM v),
      |s2 AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_click_24h,
      |    ROUND(AVG(CAST(t2 - t1k AS DOUBLE) / 1e6), 2) AS avg_lat12_s,
      |    ROUND(CAST(MAX(t2 - t1k) AS DOUBLE) / 1e6, 2) AS max_lat12_s
      |  FROM cl),
      |s3 AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_purchase_24h,
      |    ROUND(AVG(CAST(t3 - t2k AS DOUBLE) / 1e6), 2) AS avg_lat23_s,
      |    ROUND(CAST(MAX(t3 - t2k) AS DOUBLE) / 1e6, 2) AS max_lat23_s
      |  FROM p)
      |SELECT s1.n_view, s2.n_click_24h, s3.n_purchase_24h,
      |  CASE WHEN s1.n_view > 0 THEN
      |    ROUND(CAST(s2.n_click_24h AS DOUBLE) / s1.n_view, 6) END
      |    AS conv_12,
      |  CASE WHEN s2.n_click_24h > 0 THEN
      |    ROUND(CAST(s3.n_purchase_24h AS DOUBLE) / s2.n_click_24h, 6) END
      |    AS conv_23,
      |  CASE WHEN s1.n_view > 0 THEN
      |    ROUND(CAST(s3.n_purchase_24h AS DOUBLE) / s1.n_view, 6) END
      |    AS conv_13,
      |  s2.avg_lat12_s, s2.max_lat12_s, s3.avg_lat23_s, s3.max_lat23_s
      |FROM s1, s2, s3""".stripMargin

  def oracles: Map[String, String] = Map(
    "Q338" -> q338Oracle,
    "Q40" -> q40Oracle, "Q41" -> q41Oracle, "Q42" -> q42Oracle,
    "Q43" -> q43Oracle, "Q59" -> q59Oracle, "Q63" -> q63Oracle,
    "Q65" -> q65Oracle, "Q86" -> q86Oracle, "Q87" -> q87Oracle,
    "Q100" -> q100Oracle, "Q104" -> q104Oracle, "Q108" -> q108Oracle,
    "Q109" -> q109Oracle, "Q118" -> q118Oracle, "Q123" -> q123Oracle,
    "Q124" -> q124Oracle, "Q125" -> q125Oracle, "Q128" -> q128Oracle,
    "Q130" -> q130Oracle, "Q132" -> q132Oracle,
    "Q134" -> q134Oracle, "Q136" -> q136Oracle, "Q149" -> q149Oracle,
    "Q150" -> q150Oracle, "Q152" -> q152Oracle, "Q153" -> q153Oracle,
    "Q157" -> q157Oracle, "Q165" -> q165Oracle, "Q169" -> q169Oracle,
    "Q175" -> q175Oracle, "Q179" -> q179Oracle, "Q180" -> q180Oracle,
    "Q182" -> q182Oracle, "Q183" -> q183Oracle, "Q186" -> q186Oracle,
    "Q188" -> q188Oracle, "Q192" -> q192Oracle, "Q193" -> q193Oracle,
    "Q194" -> q194Oracle, "Q219" -> q219Oracle, "Q269" -> q269Oracle,
    "Q272" -> q272Oracle)
}
