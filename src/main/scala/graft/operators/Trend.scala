package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Catalog

/** Round-10 trend / robustness / concentration family over the
  * zero-filled daily revenue grid (the Q125/Q267 spine) and the raw
  * event stream: the nonparametric twins of the parametric fits the
  * registry already carries (Theil–Sen vs OLS, Mann–Kendall vs the
  * Q267 residual test, Mann–Whitney vs Q212's Welch t), plus weekly
  * seasonality, revenue concentration, and CUSUM drift detection.
  *
  * House float discipline throughout: every aggregate is an exact
  * int64 (cents, counts, cross-products); each emitted float is a
  * single CAST-AS-DOUBLE divide (or one fixed-shape expression over
  * exact ints, identical text in both engines), rounded once; verdicts
  * compare integer cross-products or the ROUNDED float, never raw
  * doubles.
  */
object Trend {

  /** Shared pairwise (i < j) day-pair relation over the daily grid —
    * the candidate set for both Theil–Sen (Q275) and Mann–Kendall
    * (Q276). Spine-bounded: n ≤ spine days per type, pairs ≤ n(n−1)/2
    * (a 365-day year is ≤ 66k pairs per type — grouped-bounded-series
    * contract, flat in corpus size past the daily aggregate).
    */
  private def dayPairs(grid: DataFrame): DataFrame = {
    val a = grid.select(col("event_type"),
      col("day").as("i"), col("v").as("vi"))
    val b = grid.select(col("event_type"),
      col("day").as("j"), col("v").as("vj"))
    a.join(b, Seq("event_type")).filter(col("j") > col("i"))
  }

  private val pairsSql: String =
    """prs AS (
      |  SELECT a.event_type, a.day AS i, b.day AS j, a.v AS vi, b.v AS vj
      |  FROM grid a JOIN grid b
      |    ON b.event_type = a.event_type AND b.day > a.day)""".stripMargin

  /** Q275 — Theil–Sen robust trend per event type (Theil 1950; Sen
    * 1968): the median of all pairwise slopes (v_j − v_i)/(j − i) over
    * the zero-filled daily cents grid, beside the OLS slope the Q125
    * family fits. A single pathological day moves OLS by O(outlier)
    * but moves the pairwise-slope median not at all until ~29% of days
    * are corrupted — the breakdown-point argument for reading both.
    *
    * Determinism: each pairwise slope is ONE divide of exact int64
    * cents by exact day gaps; the median is rank-selected from the
    * sorted slope multiset (ranks (m+1) DIV 2 and m DIV 2 + 1, equal
    * when m is odd; their 2-term average is order-independent), so no
    * engine median()/quantile() semantics are involved. The OLS slope
    * is the Q125 exact-composite single divide. The agreement verdict
    * multiplies the two ROUNDED slopes.
    *
    * Scale notes: pairs live on the bounded per-type spine; the rank
    * pick is a window over that bounded relation. One corpus scan.
    */
  def q275(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val slopes = dayPairs(grid)
      .select(col("event_type"),
        ((col("vj") - col("vi")).cast("double") / (col("j") - col("i")))
          .as("slope"))
    val ranked = slopes
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("slope"))))
      .withColumn("m", count(lit(1)).over(
        Window.partitionBy(col("event_type"))).cast("long"))
    val ts = ranked
      .filter(col("rk") === expr("(m + 1) DIV 2") ||
        col("rk") === expr("m DIV 2 + 1"))
      .groupBy(col("event_type"))
      .agg(round(avg(col("slope")), 6).as("ts_slope"),
        min(col("m")).as("n_pairs"))
    val ols = grid
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("day")).cast("long").as("sx"),
        sum(col("v")).cast("long").as("sy"),
        sum(col("day") * col("day")).cast("long").as("sxx"),
        sum(col("day") * col("v")).cast("long").as("sxy"))
      .select(col("event_type"), col("n"),
        expr("ROUND(CAST(n * sxy - sx * sy AS DOUBLE)" +
          " / (n * sxx - sx * sx), 6)").as("ols_slope"))
    ols.join(ts, Seq("event_type"), "left")
      .withColumn("verdict",
        when(col("ts_slope").isNull, "insufficient")
          .when(col("ts_slope") * col("ols_slope") > 0, "agree")
          .when(col("ts_slope") === 0 && col("ols_slope") === 0, "agree")
          .otherwise("differ"))
      .select(col("event_type"), col("n").as("n_days"), col("n_pairs"),
        col("ts_slope"), col("ols_slope"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q275Oracle: String =
    s"""WITH ${Stats.gridSql},
       |$pairsSql,
       |slopes AS (
       |  SELECT event_type,
       |    CAST(vj - vi AS DOUBLE) / (j - i) AS slope
       |  FROM prs),
       |ranked AS (
       |  SELECT event_type, slope,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope)
       |      AS BIGINT) AS rk,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
       |  FROM slopes),
       |ts AS (
       |  SELECT event_type, ROUND(AVG(slope), 6) AS ts_slope,
       |    CAST(MIN(m) AS BIGINT) AS n_pairs
       |  FROM ranked
       |  WHERE rk = (m + 1) // 2 OR rk = m // 2 + 1
       |  GROUP BY 1),
       |ols AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    ROUND(CAST(COUNT(*) * SUM(day * v) - SUM(day) * SUM(v) AS DOUBLE)
       |      / (COUNT(*) * SUM(day * day) - SUM(day) * SUM(day)), 6)
       |      AS ols_slope
       |  FROM grid GROUP BY 1)
       |SELECT o.event_type, o.n AS n_days, t.n_pairs, t.ts_slope,
       |  o.ols_slope,
       |  CASE WHEN t.ts_slope IS NULL THEN 'insufficient'
       |    WHEN t.ts_slope * o.ols_slope > 0 THEN 'agree'
       |    WHEN t.ts_slope = 0 AND o.ols_slope = 0 THEN 'agree'
       |    ELSE 'differ' END AS verdict
       |FROM ols o LEFT JOIN ts t ON t.event_type = o.event_type
       |ORDER BY o.event_type NULLS FIRST""".stripMargin

  /** Q276 — Mann–Kendall trend test per event type (Mann 1945;
    * Kendall 1975): S = Σ_{i<j} sign(v_j − v_i) over the daily grid,
    * the tie-corrected variance Var(S) = [n(n−1)(2n+5) −
    * Σ_t t(t−1)(2t+5)]/18, and the continuity-corrected normal score
    * z = (S∓1)/√Var(S). The distribution-free "is there ANY monotone
    * trend" companion to Q275's "how steep is it" — the pair a
    * forecasting review reads together, with the verdict at the
    * two-sided 5% fence on the ROUNDED z.
    *
    * Determinism: S, n, and the tie spectrum are exact int64 (the
    * variance NUMERATOR n(n−1)(2n+5)−Σt(t−1)(2t+5) stays int64 to
    * n ≈ 1.6M days); z and tau are fixed-shape double expressions over
    * those ints, each rounded once. Var = 0 (all days tied) degrades
    * to NULL z + 'degenerate'.
    *
    * Scale notes: same bounded pair relation as Q275; the tie spectrum
    * is one groupBy over the bounded grid. One corpus scan.
    */
  def q276(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val s = dayPairs(grid)
      .groupBy(col("event_type"))
      .agg(sum(when(col("vj") > col("vi"), 1L)
        .when(col("vj") < col("vi"), -1L).otherwise(0L))
        .cast("long").as("s"))
    val ties = grid.groupBy(col("event_type"), col("v"))
      .agg(count(lit(1)).cast("long").as("t"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_distinct"),
        sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
          .cast("long").as("tt"),
        sum(col("t")).cast("long").as("n"))
    ties.join(s, Seq("event_type"))
      .withColumn("var18",
        col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) - col("tt"))
      .withColumn("z", when(col("var18") > 0, expr(
        "ROUND(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)" +
          " WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END" +
          " / SQRT(CAST(var18 AS DOUBLE) / 18), 4)")))
      .withColumn("tau",
        expr("ROUND(CAST(2 * s AS DOUBLE) / (n * (n - 1)), 6)"))
      .withColumn("verdict",
        when(col("z").isNull, "degenerate")
          .when(col("z") > 1.96, "increasing")
          .when(col("z") < -1.96, "decreasing")
          .otherwise("no_trend"))
      .select(col("event_type"), col("n").as("n_days"), col("n_distinct"),
        col("s"), col("var18"), col("tau"), col("z"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q276Oracle: String =
    s"""WITH ${Stats.gridSql},
       |$pairsSql,
       |sgn AS (
       |  SELECT event_type,
       |    CAST(SUM(CASE WHEN vj > vi THEN 1 WHEN vj < vi THEN -1
       |      ELSE 0 END) AS BIGINT) AS s
       |  FROM prs GROUP BY 1),
       |tie AS (
       |  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS t
       |  FROM grid GROUP BY 1, 2),
       |ties AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_distinct,
       |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt,
       |    CAST(SUM(t) AS BIGINT) AS n
       |  FROM tie GROUP BY 1),
       |m AS (
       |  SELECT ti.event_type, ti.n, ti.n_distinct, sg.s, ti.tt,
       |    ti.n * (ti.n - 1) * (2 * ti.n + 5) - ti.tt AS var18
       |  FROM ties ti JOIN sgn sg ON sg.event_type = ti.event_type)
       |SELECT event_type, n AS n_days, n_distinct, s, var18,
       |  ROUND(CAST(2 * s AS DOUBLE) / (n * (n - 1)), 6) AS tau,
       |  CASE WHEN var18 > 0 THEN
       |    ROUND(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
       |      WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
       |      ELSE CAST(0 AS DOUBLE) END
       |      / SQRT(CAST(var18 AS DOUBLE) / 18), 4) END AS z,
       |  CASE WHEN var18 <= 0 THEN 'degenerate'
       |    WHEN ROUND(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
       |      WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
       |      ELSE CAST(0 AS DOUBLE) END
       |      / SQRT(CAST(var18 AS DOUBLE) / 18), 4) > 1.96 THEN 'increasing'
       |    WHEN ROUND(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
       |      WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
       |      ELSE CAST(0 AS DOUBLE) END
       |      / SQRT(CAST(var18 AS DOUBLE) / 18), 4) < -1.96 THEN 'decreasing'
       |    ELSE 'no_trend' END AS verdict
       |FROM m
       |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q277 — Mann–Whitney U test per event type across the Q208/Q212
    * chronological 80/20 split: did the VALUE DISTRIBUTION shift
    * between the train and test eras, judged rank-wise (Mann & Whitney
    * 1947) instead of mean-wise (Q212's Welch t)? Heavy-tailed cents
    * break the t-test's mean story; U compares every train value to
    * every test value and only asks which is larger.
    *
    * Determinism: the rank machinery is the Q138/Q161 doubled-midrank
    * house rule — the window runs over the COLLAPSED per-(type, value)
    * relation with exact int64 2·cum+c+1 midranks, never a
    * row-granularity sort; 2·R₁ and 2·U₁ stay exact int64 (safe to
    * ~10⁹ rows/type before the documented DECIMAL switch); the
    * tie-corrected z = (2U₁ − n₁n₂) / (2·√(n₁n₂·((n+1) −
    * ΣT/(n(n−1)))/12)) is one fixed-shape double expression, rounded
    * 4, with ΣT = Σ(c³−c) exact. Degenerate splits (n₁ = 0, n₂ = 0, or
    * all values tied) emit 'insufficient'/'degenerate', never NaN.
    *
    * Scale notes: one corpus scan to (type, split, value) counts; the
    * rank window runs on the bounded distinct-value relation — the
    * shuffle is on (type, value), the same topology as Q138.
    */
  def q277(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("event_type"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents"))
    val cut = ev.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .select(expr("dmin + ((dmax - dmin + 1) * 4) DIV 5").as("cutoff"))
    val counts = ev.crossJoin(broadcast(cut))
      .groupBy(col("event_type"), col("cents"))
      .agg(sum(when(col("day") < col("cutoff"), 1L).otherwise(0L))
        .cast("long").as("c1"),
        sum(when(col("day") >= col("cutoff"), 1L).otherwise(0L))
          .cast("long").as("c2"))
      .withColumn("cc", col("c1") + col("c2"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = counts
      .withColumn("cum", coalesce(sum(col("cc")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cum") + col("cc") + 1)
    val agg = ranked.groupBy(col("event_type"))
      .agg(sum(col("c1")).cast("long").as("n1"),
        sum(col("c2")).cast("long").as("n2"),
        count(lit(1)).cast("long").as("n_vals"),
        sum(col("r2") * col("c1")).cast("long").as("r1x2"),
        sum(col("cc") * col("cc") * col("cc") - col("cc"))
          .cast("long").as("tt"))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("u1x2",
        lit(2L) * col("n1") * col("n2") + col("n1") * (col("n1") + 1)
          - col("r1x2"))
    agg
      .withColumn("z", when(
        col("n1") > 0 && col("n2") > 0 && col("n_vals") > 1, expr(
          "ROUND((CAST(u1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * n2)" +
            " / (2 * SQRT(CAST(n1 AS DOUBLE) * n2" +
            " * ((n + 1) - CAST(tt AS DOUBLE) / (n * (n - 1))) / 12)), 4)")))
      .withColumn("cles", when(col("n1") > 0 && col("n2") > 0,
        expr("ROUND(CAST(u1x2 AS DOUBLE) / (2 * CAST(n1 AS DOUBLE) * n2), 6)")))
      .withColumn("verdict",
        when(col("n1") === 0 || col("n2") === 0, "insufficient")
          .when(col("z").isNull, "degenerate")
          .when(abs(col("z")) > 1.96, "shifted")
          .otherwise("stable"))
      .select(col("event_type"), col("n1").as("n_train"),
        col("n2").as("n_test"), col("u1x2").as("u1_doubled"),
        col("tt").as("tie_term"), col("cles"), col("z"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q277Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |cut AS (
      |  SELECT MIN(day) + ((MAX(day) - MIN(day) + 1) * 4) // 5 AS cutoff
      |  FROM ev),
      |counts AS (
      |  SELECT event_type, cents,
      |    CAST(SUM(CASE WHEN day < cutoff THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c1,
      |    CAST(SUM(CASE WHEN day >= cutoff THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c2
      |  FROM ev CROSS JOIN cut GROUP BY 1, 2),
      |ranked AS (
      |  SELECT event_type, c1, c2, c1 + c2 AS cc,
      |    2 * COALESCE(SUM(c1 + c2) OVER (PARTITION BY event_type
      |      ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0) + (c1 + c2) + 1 AS r2
      |  FROM counts),
      |agg AS (
      |  SELECT event_type,
      |    CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
      |    CAST(COUNT(*) AS BIGINT) AS n_vals,
      |    CAST(SUM(r2 * c1) AS BIGINT) AS r1x2,
      |    CAST(SUM(cc * cc * cc - cc) AS BIGINT) AS tt
      |  FROM ranked GROUP BY 1),
      |m AS (
      |  SELECT event_type, n1, n2, n1 + n2 AS n, n_vals, tt,
      |    2 * n1 * n2 + n1 * (n1 + 1) - r1x2 AS u1x2
      |  FROM agg),
      |zc AS (
      |  SELECT *, CASE WHEN n1 > 0 AND n2 > 0
      |      AND n_vals > 1 THEN
      |    ROUND((CAST(u1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * n2)
      |      / (2 * SQRT(CAST(n1 AS DOUBLE) * n2
      |      * ((n + 1) - CAST(tt AS DOUBLE) / (n * (n - 1))) / 12)), 4)
      |    END AS z
      |  FROM m)
      |SELECT event_type, n1 AS n_train, n2 AS n_test,
      |  u1x2 AS u1_doubled, tt AS tie_term,
      |  CASE WHEN n1 > 0 AND n2 > 0 THEN
      |    ROUND(CAST(u1x2 AS DOUBLE) / (2 * CAST(n1 AS DOUBLE) * n2), 6)
      |  END AS cles,
      |  z,
      |  CASE WHEN n1 = 0 OR n2 = 0 THEN 'insufficient'
      |    WHEN z IS NULL THEN 'degenerate'
      |    WHEN ABS(z) > 1.96 THEN 'shifted'
      |    ELSE 'stable' END AS verdict
      |FROM zc
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q279 — weekly seasonality profile per event type: the day-of-week
    * revenue decomposition (dow = epoch-day mod 7; day 0 = Thursday —
    * the epoch convention, declared not localized). Per (type, dow):
    * day count, exact total cents, mean cents/day, share of the type's
    * total, and the dense rank by total; per type, the
    * concentration verdict 'strong_weekly' when the peak dow carries
    * ≥ 2/7 of the week-normalized mass (7·S_peak ≥ 2·S_total, exact
    * cross-product — double the uniform share), 'flat' otherwise,
    * 'degenerate' when the type's total is ≤ 0. The calendar-shape
    * companion to Q211's distribution drift: load-shifting by weekday
    * is invisible to both the trend and drift gates.
    *
    * Determinism: sums/counts exact int64; mean and share are single
    * CAST-AS-DOUBLE divides rounded once; ranks order by (total DESC,
    * dow) — fully tie-broken.
    *
    * Scale notes: one corpus-scan daily aggregate, then everything
    * lives on ≤ 7 rows per type. Flat in corpus size.
    */
  def q279(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val byDow = grid
      .withColumn("dow", pmod(col("day"), lit(7L)))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("v")).cast("long").as("s"))
    val wt = Window.partitionBy(col("event_type"))
    byDow
      .withColumn("s_tot", sum(col("s")).over(wt).cast("long"))
      .withColumn("s_peak", max(col("s")).over(wt).cast("long"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(desc("s"), asc("dow"))).cast("long"))
      .withColumn("mean_cents",
        expr("ROUND(CAST(s AS DOUBLE) / n_days, 2)"))
      .withColumn("share", when(col("s_tot") > 0,
        expr("ROUND(CAST(s AS DOUBLE) / s_tot, 6)")))
      .withColumn("verdict",
        when(col("s_tot") <= 0, "degenerate")
          .when(lit(7L) * col("s_peak") >= lit(2L) * col("s_tot"),
            "strong_weekly")
          .otherwise("flat"))
      .select(col("event_type"), col("dow"), col("n_days"), col("s"),
        col("mean_cents"), col("share"), col("rk"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"), asc("dow"))
  }

  val q279Oracle: String =
    s"""WITH ${Stats.gridSql},
       |bydow AS (
       |  SELECT event_type, day % 7 AS dow,
       |    CAST(COUNT(*) AS BIGINT) AS n_days,
       |    CAST(SUM(v) AS BIGINT) AS s
       |  FROM grid GROUP BY 1, 2),
       |wt AS (
       |  SELECT *,
       |    CAST(SUM(s) OVER (PARTITION BY event_type) AS BIGINT) AS s_tot,
       |    CAST(MAX(s) OVER (PARTITION BY event_type) AS BIGINT) AS s_peak,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY s DESC, dow) AS BIGINT) AS rk
       |  FROM bydow)
       |SELECT event_type, dow, n_days, s,
       |  ROUND(CAST(s AS DOUBLE) / n_days, 2) AS mean_cents,
       |  CASE WHEN s_tot > 0 THEN ROUND(CAST(s AS DOUBLE) / s_tot, 6) END
       |    AS share,
       |  rk,
       |  CASE WHEN s_tot <= 0 THEN 'degenerate'
       |    WHEN 7 * s_peak >= 2 * s_tot THEN 'strong_weekly'
       |    ELSE 'flat' END AS verdict
       |FROM wt
       |ORDER BY event_type NULLS FIRST, dow""".stripMargin

  /** Q280 — Gini concentration of per-user revenue per event type
    * (Gini 1912, rank formulation): over users with positive total
    * cents x_u, G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) with i the
    * ascending rank — the "how unequal is the engagement value"
    * audit, plus the top-decile share (the governance number a
    * data-acquisition review actually quotes) and a 'concentrated'
    * verdict when the top 10% of users carry ≥ 40% of the value
    * (5·S_top ≥ 2·S_tot, exact cross-product).
    *
    * Determinism: ranks order by (x, user_id) — Σ i·x is invariant to
    * tie order within equal x, and the tie-break pins the engine plans
    * anyway; all sums exact int64 (Σ i·x ≤ n²·x̄ — int64 to ~10⁸ users
    * at 10⁵-cent totals; the documented DECIMAL switch applies
    * beyond); G and the share divide once each, rounded 6. Types with
    * no positive-total user emit 'insufficient'.
    *
    * Scale notes: one corpus scan to per-(type, user) totals, one
    * window over each type's user list — the standard grouped ranking
    * topology (Q138 class), no global sort.
    */
  def q280(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ux = c.events
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("cents")).cast("long").as("x"))
      .filter(col("x") > 0)
    val ranked = ux
      .withColumn("i", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(asc("x"), asc("user_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))).cast("long"))
      .withColumn("k", greatest(expr("n DIV 10"), lit(1L)))
    val agg = ranked.groupBy(col("event_type"))
      .agg(min(col("n")).as("n_users"),
        min(col("k")).as("k_top"),
        sum(col("x")).cast("long").as("s_tot"),
        sum(col("i") * col("x")).cast("long").as("six"),
        sum(when(col("i") > col("n") - col("k"), col("x")).otherwise(0L))
          .cast("long").as("s_top"))
    val types = c.events.select(col("event_type")).distinct()
    types.join(agg, Seq("event_type"), "left")
      .withColumn("gini", when(col("s_tot") > 0, expr(
        "ROUND(CAST(2 * six - (n_users + 1) * s_tot AS DOUBLE)" +
          " / (n_users * s_tot), 6)")))
      .withColumn("top_decile_share", when(col("s_tot") > 0,
        expr("ROUND(CAST(s_top AS DOUBLE) / s_tot, 6)")))
      .withColumn("verdict",
        when(col("s_tot").isNull, "insufficient")
          .when(lit(5L) * col("s_top") >= lit(2L) * col("s_tot"),
            "concentrated")
          .otherwise("dispersed"))
      .select(col("event_type"), col("n_users"), col("k_top"),
        col("s_tot").as("total_cents"), col("gini"),
        col("top_decile_share"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q280Oracle: String =
    """WITH ux AS (
      |  SELECT event_type, user_id,
      |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |pos AS (SELECT * FROM ux WHERE x > 0),
      |ranked AS (
      |  SELECT event_type, x,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY x, user_id) AS BIGINT) AS i,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |    GREATEST(CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
      |      // 10, 1) AS k
      |  FROM pos),
      |agg AS (
      |  SELECT event_type, CAST(MIN(n) AS BIGINT) AS n_users,
      |    CAST(MIN(k) AS BIGINT) AS k_top,
      |    CAST(SUM(x) AS BIGINT) AS s_tot,
      |    CAST(SUM(i * x) AS BIGINT) AS six,
      |    CAST(SUM(CASE WHEN i > n - k THEN x ELSE 0 END) AS BIGINT)
      |      AS s_top
      |  FROM ranked GROUP BY 1),
      |types AS (SELECT DISTINCT event_type FROM events)
      |SELECT t.event_type, a.n_users, a.k_top, a.s_tot AS total_cents,
      |  CASE WHEN a.s_tot > 0 THEN
      |    ROUND(CAST(2 * a.six - (a.n_users + 1) * a.s_tot AS DOUBLE)
      |      / (a.n_users * a.s_tot), 6) END AS gini,
      |  CASE WHEN a.s_tot > 0 THEN
      |    ROUND(CAST(a.s_top AS DOUBLE) / a.s_tot, 6) END
      |    AS top_decile_share,
      |  CASE WHEN a.s_tot IS NULL THEN 'insufficient'
      |    WHEN 5 * a.s_top >= 2 * a.s_tot THEN 'concentrated'
      |    ELSE 'dispersed' END AS verdict
      |FROM types t LEFT JOIN agg a ON a.event_type = t.event_type
      |ORDER BY t.event_type NULLS FIRST""".stripMargin

  /** Q281 — CUSUM mean-shift detection per event type (Page 1954) on
    * the zero-filled daily grid: the first half of the spine is the
    * CALIBRATION era; deviations are the exact n_cal-scaled residuals
    * d_t = n_cal·v_t − S_cal (so the calibration mean never
    * materializes as a float); the test-era cumulative sum C_t = Σ d
    * alarms on the first day |C_t| exceeds 4× the calibration's total
    * absolute deviation Σ_cal|d_u| — a threshold in the SAME exact
    * integer scale. Where Q211 scores WHETHER the distribution
    * drifted and Q276 whether a trend exists, this pinpoints WHEN the
    * level broke.
    *
    * Determinism: every quantity through the alarm decision is exact
    * int64 (n_cal ≤ 365-day spines at 10⁷-cent days keep n_cal·v
    * within ~4·10⁹ and the running sum within ~10¹²); only the
    * reported drift_score (max |C|/threshold) divides, rounded 4.
    * n_cal < 7 degrades to 'insufficient'; a flat calibration era
    * (threshold 0) alarms on any nonzero deviation with NULL score.
    *
    * Scale notes: one corpus-scan daily aggregate, one per-type window
    * for the running sum over the bounded spine. Flat in corpus size.
    */
  def q281(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val idx = grid
      .withColumn("dmin", min(col("day")).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("t", (col("day") - col("dmin") + 1).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))).cast("long"))
      .withColumn("n_cal", expr("n DIV 2"))
    val meta = idx.groupBy(col("event_type"))
      .agg(min(col("n")).as("n"), min(col("n_cal")).as("n_cal"))
    val cal = idx.filter(col("t") <= col("n_cal"))
      .groupBy(col("event_type"))
      .agg(sum(col("v")).cast("long").as("s_cal"))
    val dev = idx.join(cal.select(col("event_type"), col("s_cal")),
        Seq("event_type"))
      .filter(col("t") > col("n_cal"))
      .withColumn("d", col("n_cal") * col("v") - col("s_cal"))
      .withColumn("cu", sum(col("d")).over(
        Window.partitionBy(col("event_type")).orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
    val thr = idx.filter(col("t") <= col("n_cal"))
      .join(cal.select(col("event_type"), col("s_cal")), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(sum(abs(col("n_cal") * col("v") - col("s_cal")))
        .cast("long").as("mad_scaled"))
    val alarms = dev.join(thr, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(abs(col("cu"))).cast("long").as("max_abs_cusum"),
        min(when(abs(col("cu")) > lit(4L) * col("mad_scaled"), col("day")))
          .as("first_alarm_day"))
    meta
      .join(thr, Seq("event_type"), "left")
      .join(alarms, Seq("event_type"), "left")
      .withColumn("drift_score",
        when(col("mad_scaled") > 0, expr(
          "ROUND(CAST(max_abs_cusum AS DOUBLE) / (4 * mad_scaled), 4)")))
      .withColumn("verdict",
        when(col("n_cal") < 7, "insufficient")
          .when(col("first_alarm_day").isNotNull, "drift")
          .otherwise("stable"))
      .select(col("event_type"), col("n").as("n_days"), col("n_cal"),
        col("mad_scaled"), col("max_abs_cusum"), col("first_alarm_day"),
        col("drift_score"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q281Oracle: String =
    s"""WITH ${Stats.gridSql},
       |idx AS (
       |  SELECT event_type, day, v,
       |    CAST(day - MIN(day) OVER (PARTITION BY event_type) + 1
       |      AS BIGINT) AS t,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) // 2
       |      AS n_cal
       |  FROM grid),
       |meta AS (
       |  SELECT event_type, CAST(MIN(n) AS BIGINT) AS n,
       |    CAST(MIN(n_cal) AS BIGINT) AS n_cal
       |  FROM idx GROUP BY 1),
       |cal AS (
       |  SELECT event_type, CAST(SUM(v) AS BIGINT) AS s_cal
       |  FROM idx WHERE t <= n_cal GROUP BY 1),
       |thr AS (
       |  SELECT i.event_type,
       |    CAST(SUM(ABS(i.n_cal * i.v - c.s_cal)) AS BIGINT) AS mad_scaled
       |  FROM idx i JOIN cal c ON c.event_type = i.event_type
       |  WHERE i.t <= i.n_cal GROUP BY 1),
       |dev AS (
       |  SELECT i.event_type, i.day, i.t,
       |    CAST(SUM(i.n_cal * i.v - c.s_cal) OVER (
       |      PARTITION BY i.event_type ORDER BY i.t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cu
       |  FROM idx i JOIN cal c ON c.event_type = i.event_type
       |  WHERE i.t > i.n_cal),
       |alarms AS (
       |  SELECT d.event_type,
       |    CAST(MAX(ABS(d.cu)) AS BIGINT) AS max_abs_cusum,
       |    CAST(MIN(CASE WHEN ABS(d.cu) > 4 * th.mad_scaled
       |      THEN d.day END) AS BIGINT) AS first_alarm_day
       |  FROM dev d JOIN thr th ON th.event_type = d.event_type
       |  GROUP BY 1)
       |SELECT c.event_type, c.n AS n_days, c.n_cal, th.mad_scaled,
       |  a.max_abs_cusum, a.first_alarm_day,
       |  CASE WHEN th.mad_scaled > 0 THEN
       |    ROUND(CAST(a.max_abs_cusum AS DOUBLE) / (4 * th.mad_scaled), 4)
       |  END AS drift_score,
       |  CASE WHEN c.n_cal < 7 THEN 'insufficient'
       |    WHEN a.first_alarm_day IS NOT NULL THEN 'drift'
       |    ELSE 'stable' END AS verdict
       |FROM meta c
       |LEFT JOIN thr th ON th.event_type = c.event_type
       |LEFT JOIN alarms a ON a.event_type = c.event_type
       |ORDER BY c.event_type NULLS FIRST""".stripMargin

  /** Q282 — Wald–Wolfowitz runs test on the OLS residual SIGNS per
    * event type (Wald & Wolfowitz 1940): fits the Q125/Q267 line via
    * the exact-int64 normal-equation composites, takes the sign of the
    * scaled residual E_t = nd·v_t − an − n·bn·t (zero residuals drop,
    * the standard convention), counts the RUNS in day order, and asks
    * whether R is consistent with exchangeable signs: too FEW runs =
    * residuals cluster (the line over/undershoots in streaks — what
    * Q267's DW measures parametrically), too MANY = oscillation.
    * E[R] = 1 + 2n₁n₂/n, Var(R) = 2n₁n₂(2n₁n₂−n)/(n²(n−1)).
    *
    * Determinism: signs come from exact int64 residuals (the Q267 n⁵
    * margin note applies); R is an exact LAG-transition count; z is
    * one fixed-shape double expression over (R, n₁, n₂), rounded 4,
    * verdict on the rounded z. n₁ = 0 or n₂ = 0 (all residuals one
    * side — a degenerate fit) emits 'degenerate'.
    *
    * Scale notes: the residual spine is bounded per type; one window
    * pass counts transitions. Flat in corpus size past the daily
    * aggregate.
    */
  def q282(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val dmin = grid.agg(min(col("day")).as("dmin"))
    val base = grid.crossJoin(broadcast(dmin))
      .select(col("event_type"), (col("day") - col("dmin")).as("t"), col("v"))
    val sums = base.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("t")).cast("long").as("sx"),
        sum(col("v")).cast("long").as("sy"),
        sum(col("t") * col("t")).cast("long").as("sxx"),
        sum(col("t") * col("v")).cast("long").as("sxy"))
      .withColumn("d", col("n_days") * col("sxx") - col("sx") * col("sx"))
      .withColumn("bn", col("n_days") * col("sxy") - col("sx") * col("sy"))
      .withColumn("an", col("sy") * col("d") - col("bn") * col("sx"))
    val signs = base.join(sums, Seq("event_type"))
      .withColumn("e", col("n_days") * col("d") * col("v") - col("an") -
        col("n_days") * col("bn") * col("t"))
      .filter(col("e") =!= 0)
      .withColumn("sgn", when(col("e") > 0, 1L).otherwise(-1L))
    val w = Window.partitionBy(col("event_type")).orderBy(col("t"))
    val runs = signs
      .withColumn("prev", lag(col("sgn"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(sum(when(col("sgn") === 1, 1L).otherwise(0L))
        .cast("long").as("n_pos"),
        sum(when(col("sgn") === -1, 1L).otherwise(0L))
          .cast("long").as("n_neg"),
        (sum(when(col("prev").isNull || col("sgn") =!= col("prev"), 1L)
          .otherwise(0L))).cast("long").as("r_runs"))
    val types = grid.select(col("event_type")).distinct()
    types.join(runs, Seq("event_type"), "left")
      .withColumn("n", col("n_pos") + col("n_neg"))
      .withColumn("z", when(col("n_pos") > 0 && col("n_neg") > 0 &&
        col("n") > 1, expr(
        "ROUND((CAST(r_runs AS DOUBLE) - (1 + CAST(2 * n_pos * n_neg" +
          " AS DOUBLE) / n)) / SQRT(CAST(2 * n_pos * n_neg AS DOUBLE)" +
          " * (2 * n_pos * n_neg - n)" +
          " / (CAST(n AS DOUBLE) * n * (n - 1))), 4)")))
      .withColumn("verdict",
        when(col("r_runs").isNull || col("n_pos") === 0 ||
          col("n_neg") === 0, "degenerate")
          .when(col("z") < -1.96, "clustered")
          .when(col("z") > 1.96, "oscillating")
          .otherwise("random"))
      .select(col("event_type"), col("n_pos"), col("n_neg"),
        col("r_runs"), col("z"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q282Oracle: String =
    s"""WITH ${Stats.gridSql},
       |bnd AS (SELECT MIN(day) AS dmin FROM grid),
       |base AS (
       |  SELECT event_type, day - (SELECT dmin FROM bnd) AS t, v FROM grid),
       |sums AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       |    CAST(SUM(t) AS BIGINT) AS sx, CAST(SUM(v) AS BIGINT) AS sy,
       |    CAST(SUM(t * t) AS BIGINT) AS sxx,
       |    CAST(SUM(t * v) AS BIGINT) AS sxy
       |  FROM base GROUP BY 1),
       |comp AS (
       |  SELECT event_type, n_days,
       |    n_days * sxx - sx * sx AS d,
       |    n_days * sxy - sx * sy AS bn, sx, sy
       |  FROM sums),
       |comp2 AS (
       |  SELECT event_type, n_days, d, bn, sy * d - bn * sx AS an FROM comp),
       |signs AS (
       |  SELECT b.event_type, b.t,
       |    CASE WHEN c.n_days * c.d * b.v - c.an - c.n_days * c.bn * b.t > 0
       |      THEN 1 ELSE -1 END AS sgn
       |  FROM base b JOIN comp2 c ON c.event_type = b.event_type
       |  WHERE c.n_days * c.d * b.v - c.an - c.n_days * c.bn * b.t <> 0),
       |lagged AS (
       |  SELECT event_type, sgn,
       |    LAG(sgn) OVER (PARTITION BY event_type ORDER BY t) AS prev
       |  FROM signs),
       |runs AS (
       |  SELECT event_type,
       |    CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_pos,
       |    CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_neg,
       |    CAST(SUM(CASE WHEN prev IS NULL OR sgn <> prev THEN 1 ELSE 0 END)
       |      AS BIGINT) AS r_runs
       |  FROM lagged GROUP BY 1),
       |types2 AS (SELECT DISTINCT event_type FROM grid),
       |m AS (
       |  SELECT t.event_type, r.n_pos, r.n_neg, r.r_runs,
       |    r.n_pos + r.n_neg AS n
       |  FROM types2 t LEFT JOIN runs r ON r.event_type = t.event_type),
       |zc AS (
       |  SELECT *, CASE WHEN n_pos > 0 AND n_neg > 0 AND n > 1 THEN
       |    ROUND((CAST(r_runs AS DOUBLE) - (1 + CAST(2 * n_pos * n_neg
       |      AS DOUBLE) / n)) / SQRT(CAST(2 * n_pos * n_neg AS DOUBLE)
       |      * (2 * n_pos * n_neg - n)
       |      / (CAST(n AS DOUBLE) * n * (n - 1))), 4) END AS z
       |  FROM m)
       |SELECT event_type, n_pos, n_neg, r_runs, z,
       |  CASE WHEN r_runs IS NULL OR n_pos = 0 OR n_neg = 0
       |      THEN 'degenerate'
       |    WHEN z < -1.96 THEN 'clustered'
       |    WHEN z > 1.96 THEN 'oscillating'
       |    ELSE 'random' END AS verdict
       |FROM zc
       |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q283 — Kruskal–Wallis-style mean-rank audit across event types
    * (Kruskal & Wallis 1952, per-group standardized form): global
    * doubled midranks over ALL event cents (the Q138 collapsed
    * per-value relation), then per type the mean rank, its expectation
    * (n+1)/2 under the null that all types draw one distribution, and
    * the tie-corrected standardized deviation z_j = (R̄_j − (n+1)/2) /
    * √[(n+1)(n−n_j)/(12 n_j) · (1 − ΣT/(n³−n))]. The per-group rows
    * ARE the Dunn-style readout a pipeline review wants ("which event
    * type's values sit systematically high/low"), and each row's z is
    * one fixed-shape expression over exact ints — no cross-group float
    * summation anywhere (the reason the scalar H statistic, a float
    * SUM over groups, is deliberately NOT emitted).
    *
    * Determinism: doubled midranks 2·cum+c+1 exact int64 on the
    * collapsed value relation; Σ r2·c_j exact; ΣT = Σ(c³−c) exact; z
    * divides once, rounded 4; verdict on the rounded z at ±1.96.
    *
    * Scale notes: the global value-collapse is one groupBy(cents);
    * the rank window runs over that bounded distinct-value relation
    * (Q138 house rule — never a row-granularity sort); per-type sums
    * are one aggregate over the value×type count relation.
    */
  def q283(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val vt = ev.groupBy(col("cents"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("cj"))
    val vals = vt.groupBy(col("cents"))
      .agg(sum(col("cj")).cast("long").as("cc"))
    val w = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = vals
      .withColumn("cum", coalesce(sum(col("cc")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cum") + col("cc") + 1)
    val glob = vals.agg(sum(col("cc")).cast("long").as("n"),
      sum(col("cc") * col("cc") * col("cc") - col("cc"))
        .cast("long").as("tt"))
    vt.join(ranked.select(col("cents"), col("r2")), Seq("cents"))
      .groupBy(col("event_type"))
      .agg(sum(col("cj")).cast("long").as("nj"),
        sum(col("r2") * col("cj")).cast("long").as("rj2"))
      .crossJoin(broadcast(glob))
      .withColumn("mean_rank",
        expr("ROUND(CAST(rj2 AS DOUBLE) / (2 * nj), 4)"))
      .withColumn("z", when(col("nj") < col("n"), expr(
        "ROUND((CAST(rj2 AS DOUBLE) / (2 * nj) - CAST(n + 1 AS DOUBLE) / 2)" +
          " / SQRT(CAST(n + 1 AS DOUBLE) * (n - nj) / (12 * nj)" +
          " * (1 - CAST(tt AS DOUBLE)" +
          " / (CAST(n AS DOUBLE) * n * n - n))), 4)")))
      .withColumn("verdict",
        when(col("z").isNull, "degenerate")
          .when(col("z") > 1.96, "high")
          .when(col("z") < -1.96, "low")
          .otherwise("typical"))
      .select(col("event_type"), col("nj").as("n_values"), col("n"),
        col("mean_rank"), col("z"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q283Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |vt AS (
      |  SELECT cents, event_type, CAST(COUNT(*) AS BIGINT) AS cj
      |  FROM ev GROUP BY 1, 2),
      |vals AS (
      |  SELECT cents, CAST(SUM(cj) AS BIGINT) AS cc FROM vt GROUP BY 1),
      |ranked AS (
      |  SELECT cents,
      |    2 * COALESCE(SUM(cc) OVER (ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      + cc + 1 AS r2
      |  FROM vals),
      |gstat AS (
      |  SELECT CAST(SUM(cc) AS BIGINT) AS n,
      |    CAST(SUM(cc * cc * cc - cc) AS BIGINT) AS tt
      |  FROM vals),
      |agg AS (
      |  SELECT vt.event_type, CAST(SUM(vt.cj) AS BIGINT) AS nj,
      |    CAST(SUM(r.r2 * vt.cj) AS BIGINT) AS rj2
      |  FROM vt JOIN ranked r ON r.cents = vt.cents
      |  GROUP BY 1)
      |SELECT a.event_type, a.nj AS n_values, g.n,
      |  ROUND(CAST(a.rj2 AS DOUBLE) / (2 * a.nj), 4) AS mean_rank,
      |  CASE WHEN a.nj < g.n THEN
      |    ROUND((CAST(a.rj2 AS DOUBLE) / (2 * a.nj)
      |      - CAST(g.n + 1 AS DOUBLE) / 2)
      |      / SQRT(CAST(g.n + 1 AS DOUBLE) * (g.n - a.nj) / (12 * a.nj)
      |      * (1 - CAST(g.tt AS DOUBLE)
      |      / (CAST(g.n AS DOUBLE) * g.n * g.n - g.n))), 4) END AS z,
      |  CASE WHEN a.nj >= g.n THEN 'degenerate'
      |    WHEN ROUND((CAST(a.rj2 AS DOUBLE) / (2 * a.nj)
      |      - CAST(g.n + 1 AS DOUBLE) / 2)
      |      / SQRT(CAST(g.n + 1 AS DOUBLE) * (g.n - a.nj) / (12 * a.nj)
      |      * (1 - CAST(g.tt AS DOUBLE)
      |      / (CAST(g.n AS DOUBLE) * g.n * g.n - g.n))), 4) > 1.96
      |      THEN 'high'
      |    WHEN ROUND((CAST(a.rj2 AS DOUBLE) / (2 * a.nj)
      |      - CAST(g.n + 1 AS DOUBLE) / 2)
      |      / SQRT(CAST(g.n + 1 AS DOUBLE) * (g.n - a.nj) / (12 * a.nj)
      |      * (1 - CAST(g.tt AS DOUBLE)
      |      / (CAST(g.n AS DOUBLE) * g.n * g.n - g.n))), 4) < -1.96
      |      THEN 'low'
      |    ELSE 'typical' END AS verdict
      |FROM agg a CROSS JOIN gstat g
      |ORDER BY a.event_type NULLS FIRST""".stripMargin

  /** Shared two-sided-normal-p text: p = erfc(|z|/√2) via the
    * Abramowitz–Stegun 7.1.26 polynomial (max abs error 1.5e-7, well
    * inside the round-6 report). One fixed-shape expression over the
    * already-ROUNDED z, textually identical in both engines, so both
    * walk the same double ops. The macro expands `Z` for the z column
    * reference.
    */
  private def pTwoSql(zCol: String): String = {
    val x = s"(ABS($zCol) / SQRT(2))"
    val u = s"(1 / (1 + 0.3275911 * $x))"
    s"ROUND(((((1.061405429 * $u - 1.453152027) * $u + 1.421413741) * $u" +
      s" - 0.284496736) * $u + 0.254829592) * $u * EXP(-($x * $x)), 6)"
  }

  /** Q284 — Benjamini–Hochberg FDR control over the per-type
    * Mann–Whitney shift tests (Benjamini & Hochberg 1995): Q277 runs
    * one test PER TYPE, so "which types shifted" is a multiple-testing
    * question — at α = 0.10 the BH step-up procedure ranks the
    * two-sided p-values ascending and rejects ranks 1..k* where k* is
    * the largest k with p_k ≤ α·k/m. The p-values come from the
    * rounded MWU z through the shared Abramowitz–Stegun erfc
    * polynomial, rounded 6 BEFORE ranking, so the whole decision
    * chain is reproducible digit-for-digit.
    *
    * Determinism: z is Q277's rounded-4 output; p is one fixed-shape
    * polynomial over it rounded 6; ranks tie-break on (p, type); the
    * BH fence compares p·10·m ≤ k in doubles of exact ints (α = 0.10
    * as the exact 1/10); k* is a window MAX of qualifying ranks.
    * Types whose MWU degraded (NULL z) emit 'no_test' and do not
    * count toward m.
    *
    * Scale notes: everything after Q277's aggregate lives on m rows
    * (one per type). Flat in corpus size.
    */
  def q284(spark: SparkSession, dir: String): DataFrame = {
    val base = q277(spark, dir).select(col("event_type"), col("z"))
    val tested = base.filter(col("z").isNotNull)
      .withColumn("p", expr(pTwoSql("z")))
      .withColumn("k", row_number().over(
        Window.orderBy(asc("p"), asc("event_type"))).cast("long"))
      .withColumn("m", count(lit(1)).over(
        Window.partitionBy()).cast("long"))
      .withColumn("kstar", max(when(col("p") * 10 * col("m") <= col("k"),
        col("k"))).over(Window.partitionBy()))
    base.join(tested.drop("z"), Seq("event_type"), "left")
      .withColumn("verdict",
        when(col("z").isNull, "no_test")
          .when(col("kstar").isNotNull && col("k") <= col("kstar"),
            "shifted_fdr10")
          .otherwise("not_significant"))
      .select(col("event_type"), col("z"), col("p"),
        col("k").as("p_rank"), col("m").as("n_tests"), col("kstar"),
        col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q284Oracle: String = {
    val p = pTwoSql("z")
    s"""WITH q277 AS (
       |${q277Oracle.linesIterator.map("  " + _).mkString("\n")}
       |),
       |base AS (SELECT event_type, z FROM q277),
       |tested AS (
       |  SELECT event_type, z, $p AS p
       |  FROM base WHERE z IS NOT NULL),
       |ranked AS (
       |  SELECT event_type, p,
       |    CAST(ROW_NUMBER() OVER (ORDER BY p, event_type) AS BIGINT) AS k,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS m
       |  FROM tested),
       |fenced AS (
       |  SELECT *, MAX(CASE WHEN p * 10 * m <= k THEN k END) OVER ()
       |    AS kstar
       |  FROM ranked)
       |SELECT b.event_type, b.z, f.p, f.k AS p_rank, f.m AS n_tests,
       |  f.kstar,
       |  CASE WHEN b.z IS NULL THEN 'no_test'
       |    WHEN f.kstar IS NOT NULL AND f.k <= f.kstar
       |      THEN 'shifted_fdr10'
       |    ELSE 'not_significant' END AS verdict
       |FROM base b LEFT JOIN fenced f ON f.event_type = b.event_type
       |ORDER BY b.event_type NULLS FIRST""".stripMargin
  }

  /** Q285 — distribution-free median confidence interval per event
    * type (order-statistic/binomial CI, normal-approximation indices;
    * e.g. Conover 1999 §3.2): the daily-cents median with the ~95% CI
    * [x_(lo), x_(hi)], lo = max(1, ⌊(n − 1.96√n)/2⌋), hi = min(n,
    * ⌈1 + (n + 1.96√n)/2⌉) — rank picks from the sorted daily values,
    * no bootstrap, no engine quantile(). The uncertainty companion to
    * Q275/Q276: a trend call over a median whose CI spans zero change
    * is noise.
    *
    * Determinism: the median is the house lower-median rank pick
    * (n+1) DIV 2 on (v, day) order; lo/hi indices are FLOOR/CEIL of
    * one fixed double expression of n, then exact rank picks; every
    * reported value is exact int64 cents. n < 8 emits 'insufficient'
    * (the normal approximation and the CI itself are vacuous).
    *
    * Scale notes: one corpus-scan daily aggregate, one window over the
    * bounded per-type spine, three rank picks. Flat in corpus size.
    */
  def q285(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val ranked = grid
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(asc("v"), asc("day"))).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))).cast("long"))
      .withColumn("lo", greatest(lit(1L), expr(
        "CAST(FLOOR((n - 1.96 * SQRT(CAST(n AS DOUBLE))) / 2) AS BIGINT)")))
      .withColumn("hi", least(col("n"), expr(
        "CAST(CEIL(1 + (n + 1.96 * SQRT(CAST(n AS DOUBLE))) / 2) AS BIGINT)")))
    ranked.groupBy(col("event_type"))
      .agg(min(col("n")).as("n_days"),
        min(col("lo")).as("lo_rank"),
        min(col("hi")).as("hi_rank"),
        min(when(col("rk") === expr("(n + 1) DIV 2"), col("v")))
          .as("median_cents"),
        min(when(col("rk") === col("lo"), col("v"))).as("ci_lo_cents"),
        min(when(col("rk") === col("hi"), col("v"))).as("ci_hi_cents"))
      .withColumn("verdict",
        when(col("n_days") < 8, "insufficient").otherwise("ok"))
      .select(col("event_type"), col("n_days"), col("median_cents"),
        col("ci_lo_cents"), col("ci_hi_cents"), col("lo_rank"),
        col("hi_rank"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q285Oracle: String =
    s"""WITH ${Stats.gridSql},
       |ranked AS (
       |  SELECT event_type, day, v,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY v, day) AS BIGINT) AS rk,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM grid),
       |idxed AS (
       |  SELECT *,
       |    GREATEST(1, CAST(FLOOR((n - 1.96 * SQRT(CAST(n AS DOUBLE))) / 2)
       |      AS BIGINT)) AS lo,
       |    LEAST(n, CAST(CEIL(1 + (n + 1.96 * SQRT(CAST(n AS DOUBLE))) / 2)
       |      AS BIGINT)) AS hi
       |  FROM ranked)
       |SELECT event_type, CAST(MIN(n) AS BIGINT) AS n_days,
       |  CAST(MIN(CASE WHEN rk = (n + 1) // 2 THEN v END) AS BIGINT)
       |    AS median_cents,
       |  CAST(MIN(CASE WHEN rk = lo THEN v END) AS BIGINT) AS ci_lo_cents,
       |  CAST(MIN(CASE WHEN rk = hi THEN v END) AS BIGINT) AS ci_hi_cents,
       |  CAST(MIN(lo) AS BIGINT) AS lo_rank,
       |  CAST(MIN(hi) AS BIGINT) AS hi_rank,
       |  CASE WHEN MIN(n) < 8 THEN 'insufficient' ELSE 'ok' END AS verdict
       |FROM idxed
       |GROUP BY event_type
       |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q291 — Poisson overdispersion test on the daily EVENT COUNTS per
    * type (the dispersion test; e.g. Cameron & Trivedi 1990's VMR
    * form): over the zero-filled day spine, the count variance-to-mean
    * ratio and its normal score z = (VMR − 1)·√((n−1)/2) — VMR = 1 is
    * the Poisson arrival hypothesis, VMR > 1 over-dispersion
    * (clumping/contagion), VMR < 1 under-dispersion (regular/paced
    * arrivals). The COUNT-side companion to Q211 (values) and Q276
    * (trend): a stable mean with clumping arrivals is invisible to
    * both.
    *
    * Determinism: daily counts, n, Σy, Σy² exact int64; VMR and z are
    * fixed-shape expressions over them, each rounded 4; a flat series
    * (Σy = 0 or zero variance with mean 0) degrades to 'degenerate'.
    *
    * Scale notes: one corpus-scan daily count aggregate, one
    * five-number rollup per type. Flat in corpus size.
    */
  def q291(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).cast("long").as("y"))
    val ext = daily.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(ext))
      .select(col("event_type"), explode(expr("sequence(dmin, dmax)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("y"), lit(0L)).as("y"))
    grid.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("y")).cast("long").as("sy"),
        sum(col("y") * col("y")).cast("long").as("syy"))
      .withColumn("mean_daily",
        expr("ROUND(CAST(sy AS DOUBLE) / n, 4)"))
      .withColumn("vmr", when(col("sy") > 0, expr(
        "ROUND(CAST(n * syy - sy * sy AS DOUBLE) / ((n - 1) * sy), 4)")))
      .withColumn("z", when(col("sy") > 0 && col("n") > 1, expr(
        "ROUND((CAST(n * syy - sy * sy AS DOUBLE) / ((n - 1) * sy) - 1)" +
          " * SQRT(CAST(n - 1 AS DOUBLE) / 2), 4)")))
      .withColumn("verdict",
        when(col("z").isNull, "degenerate")
          .when(col("z") > 1.96, "overdispersed")
          .when(col("z") < -1.96, "underdispersed")
          .otherwise("poisson_like"))
      .select(col("event_type"), col("n").as("n_days"), col("sy")
        .as("n_events"), col("mean_daily"), col("vmr"), col("z"),
        col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q291Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(COUNT(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM daily),
      |spine AS (SELECT UNNEST(generate_series(dmin, dmax)) AS day
      |  FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM daily),
      |grid AS (
      |  SELECT t.event_type, s.day, COALESCE(d.y, 0) AS y
      |  FROM types t CROSS JOIN spine s
      |  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM grid GROUP BY 1),
      |zc AS (
      |  SELECT *, CASE WHEN sy > 0 AND n > 1 THEN
      |    ROUND((CAST(n * syy - sy * sy AS DOUBLE) / ((n - 1) * sy) - 1)
      |      * SQRT(CAST(n - 1 AS DOUBLE) / 2), 4) END AS z
      |  FROM m)
      |SELECT event_type, n AS n_days, sy AS n_events,
      |  ROUND(CAST(sy AS DOUBLE) / n, 4) AS mean_daily,
      |  CASE WHEN sy > 0 THEN
      |    ROUND(CAST(n * syy - sy * sy AS DOUBLE) / ((n - 1) * sy), 4) END
      |    AS vmr,
      |  z,
      |  CASE WHEN z IS NULL THEN 'degenerate'
      |    WHEN z > 1.96 THEN 'overdispersed'
      |    WHEN z < -1.96 THEN 'underdispersed'
      |    ELSE 'poisson_like' END AS verdict
      |FROM zc
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q292 — inter-event-time regularity per type: the coefficient of
    * variation of consecutive event gaps (seconds, on the (ts,
    * event_id) total order). A Poisson process has exponential gaps
    * with CV = 1; CV ≫ 1 is burst-and-silence traffic, CV ≪ 1 a
    * paced/scheduled source. The CONTINUOUS-TIME twin of Q291's daily
    * count dispersion — together they tell clumping-within-days from
    * clumping-across-days. The ±10% Poisson band is decided on the
    * exact integer cross-product 10·|n·Σg² − 2·(Σg)²| ≤ (Σg)².
    *
    * Determinism: gaps are exact integer seconds (µs DIV 10⁶) over
    * the fully tie-broken order; n, Σg, Σg² exact int64 (second
    * granularity keeps Σg² within int64 to ~10¹⁰ gaps); CV² is one
    * fixed expression rounded 4; the verdict compares integer
    * cross-products, never the rounded float.
    *
    * Scale notes: one type-keyed LAG window over events, one rollup.
    * The gap relation is |events| rows — linear, no spine needed.
    */
  def q292(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("event_type"),
      expr("(ts DIV 1000) DIV 1000000").as("s"), col("event_id"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("s"), col("event_id"))
    val gaps = ev
      .withColumn("ps", lag(col("s"), 1).over(w))
      .filter(col("ps").isNotNull)
      .select(col("event_type"), (col("s") - col("ps")).as("g"))
    val types = ev.select(col("event_type")).distinct()
    types.join(
      gaps.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("g")).cast("long").as("sg"),
          sum(col("g") * col("g")).cast("long").as("sgg")),
      Seq("event_type"), "left")
      .withColumn("mean_gap_s", when(col("n") > 0,
        expr("ROUND(CAST(sg AS DOUBLE) / n, 4)")))
      .withColumn("cv2", when(col("sg") > 0, expr(
        "ROUND(CAST(n * sgg - sg * sg AS DOUBLE) / (sg * sg), 4)")))
      .withColumn("verdict",
        when(col("n").isNull || col("sg") <= 0, "degenerate")
          .when(lit(10L) * abs(col("n") * col("sgg")
            - lit(2L) * col("sg") * col("sg")) <= col("sg") * col("sg"),
            "poisson_like")
          .when(col("n") * col("sgg") > lit(2L) * col("sg") * col("sg"),
            "bursty")
          .otherwise("paced"))
      .select(col("event_type"), col("n").as("n_gaps"),
        col("mean_gap_s"), col("cv2"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q292Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) // 1000000 AS s, event_id
      |  FROM events),
      |gaps AS (
      |  SELECT event_type, s - ps AS g FROM (
      |    SELECT event_type, s,
      |      LAG(s) OVER (PARTITION BY event_type ORDER BY s, event_id)
      |        AS ps
      |    FROM ev)
      |  WHERE ps IS NOT NULL),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(g) AS BIGINT) AS sg,
      |    CAST(SUM(g * g) AS BIGINT) AS sgg
      |  FROM gaps GROUP BY 1),
      |types AS (SELECT DISTINCT event_type FROM ev)
      |SELECT t.event_type, m.n AS n_gaps,
      |  CASE WHEN m.n > 0 THEN ROUND(CAST(m.sg AS DOUBLE) / m.n, 4) END
      |    AS mean_gap_s,
      |  CASE WHEN m.sg > 0 THEN
      |    ROUND(CAST(m.n * m.sgg - m.sg * m.sg AS DOUBLE)
      |      / (m.sg * m.sg), 4) END AS cv2,
      |  CASE WHEN m.n IS NULL OR m.sg <= 0 THEN 'degenerate'
      |    WHEN 10 * ABS(m.n * m.sgg - 2 * m.sg * m.sg) <= m.sg * m.sg
      |      THEN 'poisson_like'
      |    WHEN m.n * m.sgg > 2 * m.sg * m.sg THEN 'bursty'
      |    ELSE 'paced' END AS verdict
      |FROM types t LEFT JOIN m ON m.event_type = t.event_type
      |ORDER BY t.event_type NULLS FIRST""".stripMargin

  /** Q296 — isotonic (monotone non-decreasing) regression of the daily
    * revenue series per event type, via the exact minimax
    * characterization fit_i = max_{j ≤ i} min_{k ≥ i} avg(v[j..k])
    * (Ayer et al. 1955; Robertson, Wright & Dykstra 1988, Thm 1.4.4) —
    * the closed form whose output EQUALS pool-adjacent-violators
    * without PAVA's inherently sequential merge loop, so both engines
    * (and a 1000-executor cluster) compute it as plain joins +
    * min/max aggregates. The monotone fit is the nonparametric answer
    * to "is revenue trending up, and through which level sets" —
    * the shape-constrained sibling of Q275's Theil–Sen line.
    *
    * Determinism: every segment average is ONE divide of exact int64
    * cents (prefix-sum differences) by an exact day count — both
    * engines produce bit-identical doubles — and min/max over a set
    * of identical doubles is order-independent; the fit is rounded
    * once at emit. No sequential state anywhere.
    *
    * Scale notes: the minimax relation is spine-bounded — segments
    * are n(n+1)/2 and the (i, j, k) triple ~n³/6 PER TYPE on the
    * 30-day spine (≈ 5k rows/type), independent of corpus size past
    * the daily aggregate (the grouped-bounded-series contract Q245's
    * DTW and Q264's LZ76 declare). For multi-year spines the same
    * fit would switch to the O(n) PAVA fold inside a grouped
    * aggregate; at this registry's spine the join form keeps the
    * whole gate inside WholeStageCodegen.
    */
  def q296(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val pre = grid.withColumn("s", sum(col("v")).over(w))
    val a = pre.select(col("event_type"), col("day").as("j"),
      (col("s") - col("v")).as("sjm1"))
    val b = pre.select(col("event_type"), col("day").as("k"), col("s").as("sk"))
    val segs = a.join(b, Seq("event_type")).filter(col("k") >= col("j"))
      .select(col("event_type"), col("j"), col("k"),
        ((col("sk") - col("sjm1")).cast("double") /
          (col("k") - col("j") + 1)).as("segavg"))
    val days = grid.select(col("event_type"), col("day").as("i"), col("v"))
    segs.join(days, Seq("event_type"))
      .filter(col("j") <= col("i") && col("i") <= col("k"))
      .groupBy(col("event_type"), col("i"), col("v"), col("j"))
      .agg(min(col("segavg")).as("mn"))
      .groupBy(col("event_type"), col("i"), col("v"))
      .agg(round(max(col("mn")), 4).as("fit_cents"))
      .select(col("event_type"), col("i").as("day"),
        col("v").as("cents"), col("fit_cents"))
      .orderBy(asc_nulls_first("event_type"), asc("day"))
  }

  val q296Oracle: String =
    s"""WITH ${Stats.gridSql},
       |pre AS (
       |  SELECT event_type, day, v,
       |    SUM(v) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
       |  FROM grid),
       |segs AS (
       |  SELECT a.event_type, a.day AS j, b.day AS k,
       |    CAST(b.s - (a.s - a.v) AS DOUBLE) / (b.day - a.day + 1) AS segavg
       |  FROM pre a JOIN pre b
       |    ON b.event_type = a.event_type AND b.day >= a.day),
       |mins AS (
       |  SELECT s.event_type, d.day AS i, d.v, s.j, MIN(s.segavg) AS mn
       |  FROM segs s JOIN grid d ON d.event_type = s.event_type
       |    AND d.day BETWEEN s.j AND s.k
       |  GROUP BY 1, 2, 3, 4)
       |SELECT event_type, i AS day, v AS cents,
       |  ROUND(MAX(mn), 4) AS fit_cents
       |FROM mins GROUP BY 1, 2, 3
       |ORDER BY event_type NULLS FIRST, day""".stripMargin

  /** Q309 — Haar wavelet multiresolution energy ladder per event type
    * (Haar 1910; Mallat 1989's pyramid): the zero-filled daily cents
    * series decomposes into 5 dyadic detail levels (level L reads
    * variation at the 2^L-day scale); the per-level detail energy and
    * its share of total detail energy say WHERE the series' variance
    * lives — day-to-day noise (level 1), weekly-scale swings (level
    * 3), or regime-scale drift (level 5). The TIME-LOCALIZED
    * multiresolution companion to Q255's Fourier periodogram: the DFT
    * reads periodicity, the wavelet ladder reads scale — a burst and
    * a cycle with equal spectral mass separate here.
    *
    * Determinism: the pyramid carries UNSCALED int64 pair sums and
    * differences (Haar coefficients at level L are d_scaled/2^L, so
    * energy = Σd_scaled²/4^L keeps everything exact-int until one
    * divide); incomplete pairs zero-pad implicitly through the
    * parity-sum construction; shares scale each level's Σd² by
    * 4^(5−L) to a common exact-int64 denominator. Every emitted float
    * is a single divide (POWER(4, L) is exact in the double), and the
    * dominant-scale verdict compares exact scaled ints.
    *
    * Scale notes: the pyramid is 5 grouped aggregates over the
    * spine-bounded grid (halving each level — Σ work < 2·spine per
    * type); output is |types|·5 rows. Σd²·4⁴ stays inside int64 to
    * ~10⁸ cents/day on this spine (the Q298 margin class).
    */
  def q309(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val dmin = grid.agg(min(col("day")).as("dmin"))
    var cur = grid.crossJoin(broadcast(dmin))
      .select(col("event_type"), (col("day") - col("dmin")).as("d"),
        col("v").as("a"))
    val levels = (1 to 5).map { lvl =>
      val paired = cur
        .withColumn("parent", expr("d DIV 2"))
        .withColumn("parity", expr("d % 2"))
        .groupBy(col("event_type"), col("parent"))
        .agg(sum(when(col("parity") === 0, col("a")).otherwise(0L))
            .cast("long").as("a0"),
          sum(when(col("parity") === 1, col("a")).otherwise(0L))
            .cast("long").as("a1"))
      cur = paired.select(col("event_type"), col("parent").as("d"),
        (col("a0") + col("a1")).as("a")).localCheckpoint()
      // detail energies in DECIMAL(38,0)/HUGEINT (r12 sf10 sweep: a
      // squared coarse-level coefficient of 3·10⁹-cent days tops 2⁶³);
      // the BIGINT ssq output degrades to NULL symmetrically via
      // try_cast (the Q339 discipline), shares compute on the decimals.
      paired.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n_coeffs"),
          sum((col("a0") - col("a1")).cast("decimal(38,0)") *
            (col("a0") - col("a1")))
            .cast("decimal(38,0)").as("ssqd"))
        .select(col("event_type"), lit(lvl).cast("long").as("level"),
          col("n_coeffs"), col("ssqd"))
    }
    val all = levels.reduce(_ unionAll _)
    val wAll = Window.partitionBy(col("event_type"))
    all
      .withColumn("esc", expr(
        "ssqd * CAST(POWER(4, 5 - level) AS BIGINT)"))
      .withColumn("tot", sum(col("esc")).over(wAll))
      .withColumn("mx", max(col("esc")).over(wAll))
      .select(col("event_type"), col("level"), col("n_coeffs"),
        expr("TRY_CAST(ssqd AS BIGINT)").as("ssq"),
        expr("ROUND(CAST(ssqd AS DOUBLE) / POWER(4, level), 4)")
          .as("energy"),
        expr("CASE WHEN tot > 0 THEN " +
          "ROUND(CAST(esc AS DOUBLE) / CAST(tot AS DOUBLE), 4) END")
          .as("energy_share"),
        expr("CASE WHEN esc = mx AND tot > 0 THEN 1 ELSE 0 END")
          .cast("long").as("is_dominant"))
      .orderBy(asc_nulls_first("event_type"), asc("level"))
  }

  val q309Oracle: String = {
    def lvl(prev: String, name: String): String =
      s"""$name AS (
         |  SELECT event_type, d // 2 AS d,
         |    CAST(SUM(CASE WHEN d % 2 = 0 THEN a ELSE 0 END) AS BIGINT)
         |      AS a0,
         |    CAST(SUM(CASE WHEN d % 2 = 1 THEN a ELSE 0 END) AS BIGINT)
         |      AS a1
         |  FROM $prev GROUP BY 1, 2)""".stripMargin
    val nxt = (name: String) =>
      s"(SELECT event_type, d, a0 + a1 AS a FROM $name)"
    s"""WITH ${Stats.gridSql},
       |dm AS (SELECT MIN(day) AS dmin FROM grid),
       |l0 AS (
       |  SELECT event_type, day - dmin AS d, v AS a FROM grid CROSS JOIN dm),
       |${lvl("l0", "p1")},
       |${lvl(nxt("p1"), "p2")},
       |${lvl(nxt("p2"), "p3")},
       |${lvl(nxt("p3"), "p4")},
       |${lvl(nxt("p4"), "p5")},
       |stats AS (
       |  SELECT event_type, lv AS level,
       |    CAST(COUNT(*) AS BIGINT) AS n_coeffs,
       |    CAST(SUM(CAST(a0 - a1 AS HUGEINT) * (a0 - a1)) AS HUGEINT) AS ssq
       |  FROM (
       |    SELECT event_type, CAST(1 AS BIGINT) AS lv, a0, a1 FROM p1
       |    UNION ALL
       |    SELECT event_type, CAST(2 AS BIGINT), a0, a1 FROM p2
       |    UNION ALL
       |    SELECT event_type, CAST(3 AS BIGINT), a0, a1 FROM p3
       |    UNION ALL
       |    SELECT event_type, CAST(4 AS BIGINT), a0, a1 FROM p4
       |    UNION ALL
       |    SELECT event_type, CAST(5 AS BIGINT), a0, a1 FROM p5)
       |  GROUP BY 1, 2),
       |scaled AS (
       |  SELECT *, ssq * CAST(POWER(4, 5 - level) AS BIGINT) AS esc,
       |    CAST(SUM(ssq * CAST(POWER(4, 5 - level) AS BIGINT))
       |      OVER (PARTITION BY event_type) AS HUGEINT) AS tot,
       |    CAST(MAX(ssq * CAST(POWER(4, 5 - level) AS BIGINT))
       |      OVER (PARTITION BY event_type) AS HUGEINT) AS mx
       |  FROM stats)
       |SELECT event_type, level, n_coeffs, TRY_CAST(ssq AS BIGINT) AS ssq,
       |  ROUND(CAST(ssq AS DOUBLE) / POWER(4, level), 4) AS energy,
       |  CASE WHEN tot > 0 THEN ROUND(CAST(esc AS DOUBLE) / CAST(tot AS DOUBLE), 4) END
       |    AS energy_share,
       |  CAST(CASE WHEN esc = mx AND tot > 0 THEN 1 ELSE 0 END AS BIGINT)
       |    AS is_dominant
       |FROM scaled
       |ORDER BY event_type NULLS FIRST, level""".stripMargin
  }

  /** Q310 — Hodges–Lehmann pseudo-median per event type (Hodges &
    * Lehmann 1963): the median of all n(n+1)/2 Walsh averages
    * (v_i + v_j)/2, i ≤ j, of the daily cents — the LOCATION sibling
    * of Q275's Theil–Sen slope (same pairwise-then-rank topology,
    * ~29% breakdown point) sitting between the mean (efficient,
    * fragile) and the median (robust, inefficient): the estimator
    * behind the Wilcoxon signed-rank CI. Emitted beside the plain
    * median and the mean, with a mean-vs-HL skew signal.
    *
    * Determinism: Walsh SUMS v_i + v_j are exact int64; both medians
    * are rank-selected from sorted multisets (ranks (m+1) DIV 2 and
    * m DIV 2 + 1, averaged) so no engine median() semantics are
    * involved; HL = (w_a + w_b)/4 and median = (x_a + x_b)/2 are
    * single divides of exact ints; the skew verdict compares the
    * exact integer cross-products 100·|4·Σv − n·W| vs n·W (a 1%
    * band), never a float.
    *
    * Scale notes: Walsh pairs live on the bounded per-type spine
    * (i ≤ j over ≤ 366 days — the Q275 grouped-bounded contract);
    * the rank picks are windows over that bounded relation. One
    * corpus scan feeds the daily aggregate.
    */
  def q310(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val a = grid.select(col("event_type"), col("day").as("i"),
      col("v").as("vi"))
    val b = grid.select(col("event_type"), col("day").as("j"),
      col("v").as("vj"))
    val walsh = a.join(b, Seq("event_type")).filter(col("j") >= col("i"))
      .select(col("event_type"), (col("vi") + col("vj")).as("w"))
    val wRank = Window.partitionBy(col("event_type")).orderBy(col("w"))
    val wAll = Window.partitionBy(col("event_type"))
    val hl = walsh
      .withColumn("rk", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wAll).cast("long"))
      .filter(col("rk") === expr("(m + 1) DIV 2") ||
        col("rk") === expr("m DIV 2 + 1"))
      .groupBy(col("event_type"))
      .agg(sum(col("w")).cast("long").as("wsum"),
        count(lit(1)).cast("long").as("npick"))
      // npick = 1 when both rank picks coincide (odd m with the DIV
      // algebra picking the same row); scale to the 2-pick sum shape.
      .select(col("event_type"),
        expr("CASE WHEN npick = 1 THEN 2 * wsum ELSE wsum END").as("w2"))
    val vRank = Window.partitionBy(col("event_type")).orderBy(col("v"))
    val med = grid
      .withColumn("rk", row_number().over(vRank))
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .filter(col("rk") === expr("(n + 1) DIV 2") ||
        col("rk") === expr("n DIV 2 + 1"))
      .groupBy(col("event_type"))
      .agg(sum(col("v")).cast("long").as("vsum"),
        count(lit(1)).cast("long").as("npick"))
      .select(col("event_type"),
        expr("CASE WHEN npick = 1 THEN 2 * vsum ELSE vsum END").as("v2"))
    val mom = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("v")).cast("long").as("sv"))
    mom.join(hl, Seq("event_type")).join(med, Seq("event_type"))
      .select(col("event_type"), col("n").as("n_days"),
        expr("ROUND(CAST(sv AS DOUBLE) / n, 4)").as("mean_cents"),
        expr("ROUND(CAST(v2 AS DOUBLE) / 2, 4)").as("median_cents"),
        expr("ROUND(CAST(w2 AS DOUBLE) / 4, 4)").as("hl_cents"),
        expr("CASE WHEN 100 * ABS(4 * sv - n * w2) <= n * w2" +
          " THEN 'symmetric_band' WHEN 4 * sv > n * w2" +
          " THEN 'mean_above_hl' ELSE 'mean_below_hl' END").as("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q310Oracle: String =
    s"""WITH ${Stats.gridSql},
       |walsh AS (
       |  SELECT a.event_type, a.v + b.v AS w
       |  FROM grid a JOIN grid b
       |    ON b.event_type = a.event_type AND b.day >= a.day),
       |wr AS (
       |  SELECT event_type, w,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY w)
       |      AS BIGINT) AS rk,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
       |  FROM walsh),
       |hl AS (
       |  SELECT event_type,
       |    CASE WHEN COUNT(*) = 1 THEN 2 * CAST(SUM(w) AS BIGINT)
       |      ELSE CAST(SUM(w) AS BIGINT) END AS w2
       |  FROM wr WHERE rk = (m + 1) // 2 OR rk = m // 2 + 1
       |  GROUP BY 1),
       |vr AS (
       |  SELECT event_type, v,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v)
       |      AS BIGINT) AS rk,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM grid),
       |med AS (
       |  SELECT event_type,
       |    CASE WHEN COUNT(*) = 1 THEN 2 * CAST(SUM(v) AS BIGINT)
       |      ELSE CAST(SUM(v) AS BIGINT) END AS v2
       |  FROM vr WHERE rk = (n + 1) // 2 OR rk = n // 2 + 1
       |  GROUP BY 1),
       |mom AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(v) AS BIGINT) AS sv
       |  FROM grid GROUP BY 1)
       |SELECT m.event_type, m.n AS n_days,
       |  ROUND(CAST(m.sv AS DOUBLE) / m.n, 4) AS mean_cents,
       |  ROUND(CAST(d.v2 AS DOUBLE) / 2, 4) AS median_cents,
       |  ROUND(CAST(h.w2 AS DOUBLE) / 4, 4) AS hl_cents,
       |  CASE WHEN 100 * ABS(4 * m.sv - m.n * h.w2) <= m.n * h.w2
       |    THEN 'symmetric_band' WHEN 4 * m.sv > m.n * h.w2
       |    THEN 'mean_above_hl' ELSE 'mean_below_hl' END AS verdict
       |FROM mom m JOIN hl h ON h.event_type = m.event_type
       |JOIN med d ON d.event_type = m.event_type
       |ORDER BY m.event_type NULLS FIRST""".stripMargin

  /** Q315 — turning-point randomness test per event type on the
    * zero-filled daily revenue series (Kendall & Stuart, *The Advanced
    * Theory of Statistics* vol. 3 §45.18): count strict local extrema
    * T among the n−2 interior days and test against the exact null
    * moments E[T] = 2(n−2)/3, Var[T] = (16n−29)/90. ORTHOGONAL to the
    * runs test (Q240, level clustering around the median) and
    * Mann–Kendall (Q227, monotone drift): turning points read the
    * SMOOTHNESS of increments — too many ⇒ high-frequency oscillation,
    * too few ⇒ momentum/inertia — which both of those miss.
    *
    * Determinism: peaks/troughs are strict integer comparisons on
    * exact cents; the z numerator 3T − 2(n−2) is exact int64 and z ONE
    * fixed float shape rounded 4; the verdict reads the rounded z.
    * Flat interior days (a tied neighbor) are counted and excluded
    * from T, per the strict-extremum definition.
    *
    * Scale notes: spine-bounded — one lag+lead window pass over the
    * types × calendar-days grid; no joins beyond the shared grid
    * build.
    */
  def q315(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    grid.withColumn("pv", lag(col("v"), 1).over(wd))
      .withColumn("nv", lead(col("v"), 1).over(wd))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("pv").isNotNull && col("nv").isNotNull &&
          col("v") > col("pv") && col("v") > col("nv"), 1L)
          .otherwise(0L)).as("n_peaks"),
        sum(when(col("pv").isNotNull && col("nv").isNotNull &&
          col("v") < col("pv") && col("v") < col("nv"), 1L)
          .otherwise(0L)).as("n_troughs"),
        sum(when(col("pv").isNotNull && col("nv").isNotNull &&
          (col("v") === col("pv") || col("v") === col("nv")), 1L)
          .otherwise(0L)).as("n_flat"))
      .select(col("event_type"), col("n_days"), col("n_peaks"),
        col("n_troughs"), col("n_flat"),
        (col("n_peaks") + col("n_troughs")).as("n_turning"),
        expr("CASE WHEN n_days < 3 THEN NULL ELSE " +
          "ROUND(CAST(3 * (n_peaks + n_troughs) - 2 * (n_days - 2) " +
          "AS DOUBLE) / (3 * SQRT(CAST(16 * n_days - 29 AS DOUBLE) " +
          "/ 90)), 4) END").as("z"))
      .withColumn("verdict", expr("CASE WHEN z IS NULL " +
        "THEN 'degenerate' WHEN z > 1.96 THEN 'oscillating' " +
        "WHEN z < -1.96 THEN 'smooth' ELSE 'random' END"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q315Oracle: String =
    s"""WITH ${Stats.gridSql},
       |lagged AS (
       |  SELECT event_type, v,
       |    LAG(v) OVER (PARTITION BY event_type ORDER BY day) AS pv,
       |    LEAD(v) OVER (PARTITION BY event_type ORDER BY day) AS nv
       |  FROM grid),
       |agg AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       |    CAST(SUM(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
       |      AND v > pv AND v > nv THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_peaks,
       |    CAST(SUM(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
       |      AND v < pv AND v < nv THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_troughs,
       |    CAST(SUM(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
       |      AND (v = pv OR v = nv) THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_flat
       |  FROM lagged GROUP BY 1),
       |out AS (
       |  SELECT event_type, n_days, n_peaks, n_troughs, n_flat,
       |    n_peaks + n_troughs AS n_turning,
       |    CASE WHEN n_days < 3 THEN NULL ELSE
       |      ROUND(CAST(3 * (n_peaks + n_troughs) - 2 * (n_days - 2)
       |      AS DOUBLE) / (3 * SQRT(CAST(16 * n_days - 29 AS DOUBLE)
       |      / 90)), 4) END AS z
       |  FROM agg)
       |SELECT event_type, n_days, n_peaks, n_troughs, n_flat, n_turning,
       |  z,
       |  CASE WHEN z IS NULL THEN 'degenerate'
       |    WHEN z > 1.96 THEN 'oscillating'
       |    WHEN z < -1.96 THEN 'smooth'
       |    ELSE 'random' END AS verdict
       |FROM out
       |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q323 — maximum drawdown profile per event type on the zero-filled
    * daily revenue series: the worst peak-to-trough drop below the
    * historical running maximum (the operational-health metric
    * portfolio analytics calls max drawdown; Magdon-Ismail & Atiya
    * 2004). Reports the peak, the trough day/value, the drawdown in
    * cents and as a share of the peak, how many days the series spent
    * below its running peak, and whether it had RECOVERED (matched the
    * old peak again) by the end of the window. Q227/Q275 read monotone
    * drift and Q114-era gates point anomalies — drawdown reads
    * sustained deterioration against the best level ever achieved,
    * which neither captures.
    *
    * Determinism: the series, running max, drawdown and all day picks
    * are exact int64 (trough = earliest day attaining the max drawdown,
    * an exact (dd, day) order statistic); dd_share is ONE single-divide
    * float rounded 6; the verdict reads exact ints only.
    *
    * Scale notes: spine-bounded — one running-max window and one
    * order-statistic pick over the types × calendar-days grid; no
    * joins beyond the shared grid build and a per-type single-row
    * broadcast-back.
    */
  def q323(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = grid
      .withColumn("runmax", max(col("v")).over(wCum))
      .withColumn("dd", col("runmax") - col("v"))
      .localCheckpoint()
    val wPick = Window.partitionBy(col("event_type"))
      .orderBy(desc("dd"), asc("day"))
    val trough = dd
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("trough_day"),
        col("runmax").as("peak_cents"), col("dd").as("max_dd_cents"))
    val agg = dd.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        max(col("v")).as("max_day_cents"),
        sum(when(col("dd") > 0, 1L).otherwise(0L)).as("days_below_peak"))
    // recovered = the global max day value was re-attained at or after
    // the trough day, i.e. some day >= trough has v >= peak
    val rec = dd.join(trough, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("day") >= col("trough_day") &&
        col("v") >= col("peak_cents"), 1L).otherwise(0L)).as("n_rec"))
    agg.join(trough, Seq("event_type")).join(rec, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("peak_cents"),
        col("trough_day"), col("max_dd_cents"), col("days_below_peak"),
        expr("CASE WHEN peak_cents > 0 THEN " +
          "ROUND(CAST(max_dd_cents AS DOUBLE) / peak_cents, 6) END")
          .as("dd_share"),
        col("n_rec"))
      .withColumn("verdict", expr("CASE WHEN max_dd_cents = 0 " +
        "THEN 'monotone_peak'" +
        " WHEN n_rec > 0 THEN 'recovered' ELSE 'underwater' END"))
      .drop("n_rec")
      .orderBy(asc_nulls_first("event_type"))
  }

  val q323Oracle: String =
    s"""WITH ${Stats.gridSql},
       |dd AS (
       |  SELECT event_type, day, v,
       |    CAST(MAX(v) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS runmax,
       |    CAST(MAX(v) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - v
       |      AS BIGINT) AS ddv
       |  FROM grid),
       |trough AS (
       |  SELECT event_type, day AS trough_day, runmax AS peak_cents,
       |    ddv AS max_dd_cents
       |  FROM (
       |    SELECT event_type, day, runmax, ddv,
       |      ROW_NUMBER() OVER (PARTITION BY event_type
       |        ORDER BY ddv DESC, day) AS rk
       |    FROM dd) r
       |  WHERE rk = 1),
       |agg AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       |    CAST(SUM(CASE WHEN ddv > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS days_below_peak
       |  FROM dd GROUP BY 1),
       |rec AS (
       |  SELECT d.event_type,
       |    CAST(SUM(CASE WHEN d.day >= t.trough_day
       |      AND d.v >= t.peak_cents THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_rec
       |  FROM dd d JOIN trough t ON t.event_type = d.event_type
       |  GROUP BY 1)
       |SELECT a.event_type, a.n_days, t.peak_cents, t.trough_day,
       |  t.max_dd_cents, a.days_below_peak,
       |  CASE WHEN t.peak_cents > 0 THEN
       |    ROUND(CAST(t.max_dd_cents AS DOUBLE) / t.peak_cents, 6) END
       |    AS dd_share,
       |  CASE WHEN t.max_dd_cents = 0 THEN 'monotone_peak'
       |    WHEN r.n_rec > 0 THEN 'recovered'
       |    ELSE 'underwater' END AS verdict
       |FROM agg a
       |JOIN trough t ON t.event_type = a.event_type
       |JOIN rec r ON r.event_type = a.event_type
       |ORDER BY a.event_type NULLS FIRST""".stripMargin

  /** Q333 — influence scan of the per-type daily OLS: leverage and
    * Cook's distance for every day, top-3 most influential days per
    * type (Cook 1977). The diagnostic that names WHICH observations
    * bend the Q125 trend line — where DW (Q267), the sign-runs test
    * (Q282) and Breusch–Pagan (Q332) read residual STRUCTURE, Cook's D
    * reads single-point LEVERAGE × misfit. p = 2 (intercept + slope);
    * rows flag 'influential' at the classical D > 4/n fence.
    *
    * Determinism: with the exact int64 composites (d, bn, an) and the
    * n-scaled residual E_t, BOTH diagnostics collapse to scale-free
    * ratios of exact integers — leverage h_t = a_t/(n·d) with
    * a_t = d + (n·t − Sx)² exact int64, and Cook's
    * D_t = (n−2)·E²·a·n·d / (2·ΣE²·(n·d − a)²), where the (nd)²
    * residual scale cancels; E² terms are the one documented double
    * stage (round 6), ranking orders on (round-6 D, day) with NULLs
    * coalesced below zero so both engines pick identical rows.
    *
    * Scale notes: the Q125 plan plus one spine-bounded scoring pass
    * and a per-type top-3 window. Flat past the daily rollup.
    */
  def q333(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val dmin = grid.agg(min(col("day")).as("dmin"))
    val base = grid.crossJoin(broadcast(dmin))
      .select(col("event_type"), col("day"),
        (col("day") - col("dmin")).as("t"), col("v"))
    val sums = base.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("t")).cast("long").as("sx"),
        sum(col("v")).cast("long").as("sy"),
        sum(col("t") * col("t")).cast("long").as("sxx"),
        sum(col("t") * col("v")).cast("long").as("sxy"))
      .withColumn("d", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("bn", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("an", col("sy") * col("d") - col("bn") * col("sx"))
    val resid = base.join(sums, Seq("event_type"))
      .withColumn("e", col("n") * col("d") * col("v") - col("an") -
        col("n") * col("bn") * col("t"))
      .withColumn("a", col("d") +
        (col("n") * col("t") - col("sx")) * (col("n") * col("t") - col("sx")))
    val sse = resid.groupBy(col("event_type"))
      .agg(sum(col("e").cast("double") * col("e")).as("se2"))
    val scored = resid.join(sse, Seq("event_type"))
      .withColumn("leverage", expr("ROUND(CAST(a AS DOUBLE) / (n * d), 6)"))
      .withColumn("cook_d", expr("CASE WHEN se2 > 0 AND n > 2 " +
        "AND (n * d - a) <> 0 THEN " +
        "ROUND((n - 2) * (CAST(e AS DOUBLE) * e) * a * n * d / " +
        "(2 * se2 * CAST(n * d - a AS DOUBLE) * (n * d - a)), 6) END"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(coalesce(col("cook_d"), lit(-1.0)).desc, asc("day"))
    scored.withColumn("influence_rank", row_number().over(w).cast("long"))
      .filter(col("influence_rank") <= 3)
      .select(col("event_type"), col("influence_rank"), col("day"),
        col("t"), col("v"), col("leverage"), col("cook_d"), col("n"))
      .withColumn("verdict", expr("CASE WHEN cook_d IS NULL " +
        "THEN 'degenerate' WHEN cook_d > 4.0 / n THEN 'influential' " +
        "ELSE 'ordinary' END"))
      .drop("n")
      .orderBy(asc_nulls_first("event_type"), asc("influence_rank"))
  }

  val q333Oracle: String =
    s"""WITH ${Stats.gridSql},
       |bnd AS (SELECT MIN(day) AS dmin FROM grid),
       |base AS (
       |  SELECT event_type, day, day - (SELECT dmin FROM bnd) AS t, v
       |  FROM grid),
       |sums AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(t) AS BIGINT) AS sx, CAST(SUM(v) AS BIGINT) AS sy,
       |    CAST(SUM(t * t) AS BIGINT) AS sxx,
       |    CAST(SUM(t * v) AS BIGINT) AS sxy
       |  FROM base GROUP BY 1),
       |comp AS (
       |  SELECT event_type, n, sx,
       |    n * sxx - sx * sx AS d,
       |    n * sxy - sx * sy AS bn,
       |    sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx AS an
       |  FROM sums),
       |resid AS (
       |  SELECT b.event_type, b.day, b.t, b.v, c.n, c.d,
       |    c.n * c.d * b.v - c.an - c.n * c.bn * b.t AS e,
       |    c.d + (c.n * b.t - c.sx) * (c.n * b.t - c.sx) AS a
       |  FROM base b JOIN comp c ON c.event_type = b.event_type),
       |sse AS (
       |  SELECT event_type, SUM(CAST(e AS DOUBLE) * e) AS se2
       |  FROM resid GROUP BY 1),
       |scored AS (
       |  SELECT r.event_type, r.day, r.t, r.v, r.n,
       |    ROUND(CAST(r.a AS DOUBLE) / (r.n * r.d), 6) AS leverage,
       |    CASE WHEN s.se2 > 0 AND r.n > 2 AND (r.n * r.d - r.a) <> 0
       |      THEN ROUND((r.n - 2) * (CAST(r.e AS DOUBLE) * r.e) * r.a *
       |      r.n * r.d / (2 * s.se2 * CAST(r.n * r.d - r.a AS DOUBLE) *
       |      (r.n * r.d - r.a)), 6) END AS cook_d
       |  FROM resid r JOIN sse s ON s.event_type = r.event_type),
       |ranked AS (
       |  SELECT event_type, day, t, v, n, leverage, cook_d,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY COALESCE(cook_d, -1.0) DESC, day) AS BIGINT)
       |      AS influence_rank
       |  FROM scored)
       |SELECT event_type, influence_rank, day, t, v, leverage, cook_d,
       |  CASE WHEN cook_d IS NULL THEN 'degenerate'
       |    WHEN cook_d > 4.0 / n THEN 'influential'
       |    ELSE 'ordinary' END AS verdict
       |FROM ranked
       |WHERE influence_rank <= 3
       |ORDER BY event_type NULLS FIRST, influence_rank""".stripMargin

  /** Q336 — Holt–Winters ADDITIVE-SEASONAL smoothing + 7-step forecast
    * per event type on the zero-filled daily revenue-cents grid
    * (Winters 1960; the Hyndman & Athanasopoulos "fpp" additive form
    * with period m = 7 and α = β = γ = 1/2) — the seasonal completion
    * of the smoothing family: Q100 (EWMA, no trend), Q123 (Holt,
    * trend but no season), Q118/Q219 (decompositions that DESCRIBE the
    * weekly cycle but don't forecast it). Recurrence for t ≥ 7:
    *   ℓ_t = ((y_t − s_{t−7}) + (ℓ_{t−1} + b_{t−1})) / 2
    *   b_t = (b_{t−1} + (ℓ_t − ℓ_{t−1})) / 2
    *   s_t = ((y_t − ℓ_t) + s_{t−7}) / 2
    * initialized from the first week: ℓ₆ = (Σ y₀..y₆)/7, b₆ = 0,
    * s_i = y_i − ℓ₆ (i = 0..6); forecast ŷ_{T+h} = ℓ_T + h·b_T +
    * s_{T+h−7} for h = 1..7. Fewer than 7 observed days degrades to
    * NULL metrics with an 'insufficient' verdict (the Q252 loudness
    * rule) rather than fitting a partial week.
    *
    * Determinism (the Q123 rule): ℓ₆ is ONE IEEE divide of an exact
    * int64 cents sum; every subsequent quantity uses only IEEE
    * add/sub/÷2 with a FIXED parenthesization duplicated textually in
    * the oracle's recursive-CTE replay — both engines execute the
    * identical operation sequence on identical doubles, so the state
    * is bit-equal at every t even where the values outgrow exactness.
    * The seasonal slot is t mod 7 (positions are the contiguous
    * global-spine index), integer arithmetic in both engines.
    *
    * Scale notes: consumes the bucketed [[Derived.dailyCentsGrid]]
    * artifact — no events scan; a smoother is sequential IN ITS KEY,
    * so the distributed shape is "parallel across types, one codegen'd
    * higher-order `aggregate` fold within type" over the spine-bounded
    * series array (Q123's shape, with the 7-slot seasonal ring carried
    * in the fold state). No shuffle beyond the per-type collect; flat
    * in corpus size past the artifact.
    */
  def q336(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    // textually shared ℓ/b/s step shapes (the oracle mirrors these)
    val sOld = "element_at(acc.s, CAST(pmod(acc.t, 7) + 1 AS INT))"
    val lNew = s"((CAST(x.v AS DOUBLE) - $sOld) + (acc.l + acc.b)) / 2"
    val fitExpr =
      s"""aggregate(
         |  slice(ser, 8, CAST(GREATEST(n_obs - 7, 0L) AS INT)),
         |  named_struct('t', 7, 'l', l0, 'b', CAST(0 AS DOUBLE),
         |    's', s_init),
         |  (acc, x) -> named_struct(
         |    't', acc.t + 1,
         |    'l', $lNew,
         |    'b', (acc.b + (($lNew) - acc.l)) / 2,
         |    's', transform(acc.s, (sv, si) -> IF(si = pmod(acc.t, 7),
         |      ((CAST(x.v AS DOUBLE) - ($lNew)) + $sOld) / 2,
         |      sv))))""".stripMargin
    val seas = "element_at(fit.s, CAST(pmod(n_obs - 1 + h, 7) + 1 AS INT))"
    grid.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("ser"))
      .withColumn("n_obs", size(col("ser")).cast("long"))
      .withColumn("init_sum", expr(
        "aggregate(slice(ser, 1, 7), 0L, (a, x) -> a + x.v)"))
      .withColumn("l0", expr("CAST(init_sum AS DOUBLE) / 7"))
      .withColumn("s_init", expr(
        "transform(slice(ser, 1, 7), x -> CAST(x.v AS DOUBLE) - l0)"))
      .withColumn("fit", expr(fitExpr))
      .select(col("event_type"), col("n_obs"), col("fit"),
        explode(expr("sequence(1, 7)")).as("h"))
      .select(col("event_type"), col("h"), col("n_obs"),
        when(col("n_obs") >= 7, round(col("fit.l"), 4)).as("level"),
        when(col("n_obs") >= 7, round(col("fit.b"), 4)).as("trend"),
        when(col("n_obs") >= 7, round(expr(seas), 4)).as("seasonal"),
        when(col("n_obs") >= 7, round(
          expr(s"fit.l + CAST(h AS DOUBLE) * fit.b + $seas"), 4))
          .as("forecast"),
        when(col("n_obs") >= 7, lit("ok")).otherwise("insufficient")
          .as("verdict"))
      .orderBy(asc_nulls_first("event_type"), asc("h"))
  }

  val q336Oracle: String = {
    val slots = 0 to 6
    def sOld(t: String) =
      "CASE (" + t + ") % 7 " +
        slots.map(i => s"WHEN $i THEN h.s$i").mkString(" ") + " END"
    val so = sOld("h.t + 1")
    val lNew = s"((CAST(g.v AS DOUBLE) - $so) + (h.l + h.b)) / 2"
    val sStep = slots.map { i =>
      s"""CASE WHEN (h.t + 1) % 7 = $i THEN
         |      ((CAST(g.v AS DOUBLE) - ($lNew)) + $so) / 2
         |      ELSE h.s$i END AS s$i""".stripMargin
    }.mkString(",\n    ")
    def sFin(t: String) =
      "CASE (" + t + ") % 7 " +
        slots.map(i => s"WHEN $i THEN f.s$i").mkString(" ") + " END"
    val seas = sFin("n.n_obs - 1 + hz.h")
    s"""WITH RECURSIVE ${Stats.gridSql},
       |pos AS (
       |  SELECT event_type, day, v,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
       |      - 1 AS BIGINT) AS k
       |  FROM grid),
       |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs
       |      FROM pos GROUP BY 1),
       |init AS (
       |  SELECT event_type, CAST(SUM(v) AS DOUBLE) / 7 AS l0,
       |    ${slots.map(i =>
            s"MAX(CASE WHEN k = $i THEN v END) AS y$i").mkString(",\n    ")}
       |  FROM pos WHERE k <= 6 GROUP BY 1
       |  HAVING COUNT(*) = 7),
       |hw AS (
       |  SELECT event_type, CAST(6 AS BIGINT) AS t, l0 AS l,
       |    CAST(0 AS DOUBLE) AS b,
       |    ${slots.map(i =>
            s"CAST(y$i AS DOUBLE) - l0 AS s$i").mkString(",\n    ")}
       |  FROM init
       |  UNION ALL
       |  SELECT h.event_type, h.t + 1,
       |    $lNew,
       |    (h.b + (($lNew) - h.l)) / 2,
       |    $sStep
       |  FROM hw h JOIN pos g
       |  ON g.event_type = h.event_type AND g.k = h.t + 1),
       |fin AS (
       |  SELECT h.* FROM hw h
       |  JOIN n ON n.event_type = h.event_type AND h.t = n.n_obs - 1),
       |hz AS (SELECT UNNEST(range(1, 8)) AS h)
       |SELECT n.event_type, CAST(hz.h AS INT) AS h, n.n_obs,
       |  ROUND(f.l, 4) AS level, ROUND(f.b, 4) AS trend,
       |  ROUND($seas, 4) AS seasonal,
       |  ROUND(f.l + CAST(hz.h AS DOUBLE) * f.b + $seas, 4) AS forecast,
       |  CASE WHEN f.event_type IS NULL THEN 'insufficient' ELSE 'ok' END
       |    AS verdict
       |FROM n CROSS JOIN hz
       |LEFT JOIN fin f ON f.event_type = n.event_type
       |ORDER BY n.event_type NULLS FIRST, h""".stripMargin
  }

  /** Q339 — cross-correlation function between every ORDERED event-type
    * pair at lags 0..7 days on the zero-filled daily revenue grid: the
    * cross-series completion of Q128's autocorrelation (self at lag L)
    * and Q298's Granger screen (lag-1 predictivity only) — "does
    * purchase revenue echo click revenue three days later, and at
    * which offset is the echo loudest?" (Box & Jenkins 1970's CCF).
    * For (ta, tb, L): Pearson r between ta's value at day d and tb's
    * at day d+L over the overlap, plus each pair's lead_rank ordering
    * lags by |r| — rank 1 is the pair's best alignment.
    *
    * Determinism (the Q125/Q128 discipline): the LINEAR moment sums
    * (m, Σx, Σy) are exact int64; the PRODUCT sums (Σxy, Σx², Σy²) are
    * widened to DECIMAL(38,0)/HUGEINT BEFORE the multiply (ADVICE r12:
    * a single x² tops 2⁶³ at the sf10 sweep's 3·10⁹-cent days — the
    * r12-measured Q257 fence — so "linear in the spine" never applied
    * to sums of squares); the cross-products num = m·Σxy − Σx·Σy and
    * both denominators stay in DECIMAL(38,0)/HUGEINT (exact to ~10³⁸
    * — ADVICE r11: the int64 form wrapped silently past m·Σv² ≈ 2⁶³
    * while the oracle raised, an asymmetric failure); the only floats
    * are the one SQRT and one
    * divide in a fixed textual shape, rounded 6 BEFORE the |r|
    * ranking so rank order cannot straddle a last-ulp difference.
    * The OUTPUT num column stays BIGINT via try_cast in BOTH engines,
    * so a value past 2⁶³ degrades to NULL symmetrically (Q252
    * loudness) instead of one engine wrapping and the other erroring.
    * NULL r (a zero-variance side) sorts below every real value via
    * COALESCE(|r|, −1); lag ties break ascending.
    *
    * Scale notes: consumes the daily-grid ARTIFACT (no events scan);
    * ONE self-join on (type-pair, day+L) with a broadcast 8-row lag
    * spine produces all lags in one shuffle of the bounded
    * types×days relation, map-side combined to |types|²·8 output
    * rows. r values stay exact to m·Σv² < 10³⁸ — beyond any
    * physical spine.
    */
  def q339(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val lags = spark.range(0, 8).select(col("id").as("lag"))
    val a = grid.select(col("event_type").as("ta"), col("day"),
      col("v").as("x")).crossJoin(broadcast(lags))
    val b = grid.select(col("event_type").as("tb"), col("day").as("bday"),
      col("v").as("y"))
    val scored = a.join(b, col("ta") =!= col("tb") &&
        col("bday") === col("day") + col("lag"))
      .groupBy(col("ta"), col("tb"), col("lag"))
      .agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        // Widen BEFORE the multiply (the Q257 discipline): a single
        // x·y tops 2⁶³ at ~3·10⁹-cent days, so the int64 product
        // throws under ANSI while the oracle's HUGEINT sum returns.
        sum(col("x").cast("decimal(38,0)") * col("y"))
          .cast("decimal(38,0)").as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x"))
          .cast("decimal(38,0)").as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y"))
          .cast("decimal(38,0)").as("syy"))
      .select(col("ta"), col("tb"), col("lag"), col("m"),
        // Cross-products in DECIMAL(38,0) (the Q338 widening, ADVICE r11):
        // the moment sums stay int64 (linear in the spine), but m·Σxy
        // wraps int64 past m·Σv² ≈ 2⁶³ — in DECIMAL the r values stay
        // exact to ~10³⁸ and only the OUTPUT num column degrades (to
        // NULL, symmetrically in both engines via try_cast below).
        (col("m").cast("decimal(38,0)") * col("sxy") -
          col("sx").cast("decimal(38,0)") * col("sy")).as("numd"),
        (col("m").cast("decimal(38,0)") * col("sxx") -
          col("sx").cast("decimal(38,0)") * col("sx")).as("den_a"),
        (col("m").cast("decimal(38,0)") * col("syy") -
          col("sy").cast("decimal(38,0)") * col("sy")).as("den_b"))
      .withColumn("num", expr("TRY_CAST(numd AS BIGINT)"))
      .withColumn("ccf",
        when(col("den_a") > 0L && col("den_b") > 0L,
          round(col("numd").cast("double") /
            sqrt(col("den_a").cast("double") * col("den_b").cast("double")),
            6)))
    scored
      .withColumn("lead_rank", row_number().over(
        Window.partitionBy(col("ta"), col("tb"))
          .orderBy(coalesce(abs(col("ccf")), lit(-1.0)).desc, col("lag").asc))
        .cast("long"))
      .select(col("ta"), col("tb"), col("lag"), col("m"), col("num"),
        col("ccf"), col("lead_rank"))
      .orderBy(asc_nulls_first("ta"), asc_nulls_first("tb"), asc("lag"))
  }

  val q339Oracle: String =
    s"""WITH ${Stats.gridSql},
       |lagged AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb, l.lag AS lag,
       |    a.v AS x, b.v AS y
       |  FROM grid a
       |  CROSS JOIN (SELECT UNNEST(range(0, 8)) AS lag) l
       |  JOIN grid b ON b.event_type <> a.event_type
       |    AND b.day = a.day + l.lag),
       |sums AS (
       |  SELECT ta, tb, lag, CAST(COUNT(*) AS BIGINT) AS m,
       |    SUM(x) AS sx, SUM(y) AS sy,
       |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
       |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
       |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
       |  FROM lagged GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT ta, tb, CAST(lag AS BIGINT) AS lag, m,
       |    TRY_CAST(m*sxy - CAST(sx AS HUGEINT)*sy AS BIGINT) AS num,
       |    CASE WHEN (m*sxx - CAST(sx AS HUGEINT)*sx) > 0
       |          AND (m*syy - CAST(sy AS HUGEINT)*sy) > 0 THEN
       |      ROUND(CAST(m*sxy - CAST(sx AS HUGEINT)*sy AS DOUBLE)
       |        / SQRT(CAST(m*sxx - CAST(sx AS HUGEINT)*sx AS DOUBLE)
       |               * CAST(m*syy - CAST(sy AS HUGEINT)*sy AS DOUBLE)), 6)
       |    END AS ccf
       |  FROM sums)
       |SELECT ta, tb, lag, m, num, ccf,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY ta, tb
       |    ORDER BY COALESCE(ABS(ccf), -1.0) DESC, lag) AS BIGINT)
       |    AS lead_rank
       |FROM scored
       |ORDER BY ta NULLS FIRST, tb NULLS FIRST, lag""".stripMargin

  /** Q340 — derandomized percentile-bootstrap 95% CI (Efron 1979) of
    * each event type's MEAN daily revenue on the zero-filled grid:
    * B = 200 resamples of the n-day series, each day of resample r
    * drawn by the md5-uniform index hv('boot:type:r:i') mod n — the
    * same engine-identical derandomization the permutation tests
    * (Q229) use for sign flips and Q101/Q108 use for sampling, so
    * both engines draw the IDENTICAL resamples and the bootstrap
    * distribution is a deterministic function of the data. CI bounds
    * are the ⌈0.025B⌉ = 5th and ⌈0.975B⌉ = 195th order statistics of
    * the resample SUMS (rank-and-pick, the Q54 discipline). The
    * INFERENTIAL companion the point-estimate gates lack: Q285 gives
    * a distribution-free median CI from order statistics; this gives
    * the mean's, where no closed form exists without normality.
    *
    * Determinism: resample sums are exact int64 (ranking never touches
    * a float); the only floats are the four final divides by n,
    * rounded 4. Sum ties in the rank pick break on the resample id —
    * and order statistics are tie-invariant anyway. The oracle's
    * resample index space is derived from the data (range to MAX(n)
    * over the per-type day counts — ADVICE r11: a hardcoded cap would
    * silently under-draw past its fence), so both engines enumerate
    * exactly n indices per (type, resample) at ANY spine length.
    *
    * Scale notes: consumes the daily-grid ARTIFACT; the resample
    * relation is B·n·|types| rows (bounded by the SPINE, not the
    * corpus — 200·365·types for a year) equi-joined to the grid on
    * (type, day-index) and folded to B·|types| sums map-side. Flat in
    * corpus size past the artifact.
    */
  def q340(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val pos = grid
      .crossJoin(broadcast(grid.agg(min(col("day")).as("dmin"))))
      .select(col("event_type"), (col("day") - col("dmin")).as("k"),
        col("v"))
      .localCheckpoint()
    val meta = pos.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("v")).cast("long").as("sv"))
    val hv = NearDup.hexValueFastExpr(
      "md5('boot:' || event_type || ':' || CAST(r AS STRING) || ':' || " +
        "CAST(i AS STRING))")
    val picks = meta.select(col("event_type"), col("n"))
      .crossJoin(broadcast(
        spark.range(1, 201).select(col("id").as("r"))))
      .select(col("event_type"), col("n"), col("r"),
        explode(expr("sequence(0L, n - 1)")).as("i"))
      .withColumn("pick", expr(s"($hv) % n"))
    val sums = picks
      .join(pos, picks("event_type") === pos("event_type") &&
        col("pick") === col("k"))
      .groupBy(picks("event_type").as("et"), col("r"))
      .agg(sum(col("v")).cast("long").as("s"))
    val ranked = sums.withColumn("rk", row_number().over(
      Window.partitionBy(col("et")).orderBy(col("s").asc, col("r").asc)))
    val lo = ranked.filter(col("rk") === 5)
      .select(col("et").as("event_type"), col("s").as("s_lo"))
    val hi = ranked.filter(col("rk") === 195)
      .select(col("et").as("event_type"), col("s").as("s_hi"))
    meta.join(lo, Seq("event_type")).join(hi, Seq("event_type"))
      .select(col("event_type"), col("n").as("n_days"),
        lit(200L).as("b"),
        expr("ROUND(CAST(sv AS DOUBLE) / n, 4)").as("mean_cents"),
        expr("ROUND(CAST(s_lo AS DOUBLE) / n, 4)").as("boot_lo"),
        expr("ROUND(CAST(s_hi AS DOUBLE) / n, 4)").as("boot_hi"),
        expr("ROUND(CAST(s_hi - s_lo AS DOUBLE) / n, 4)").as("ci_width"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q340Oracle: String = {
    val hv = NearDup.hexValueExpr(
      "md5('boot:' || m.event_type || ':' || CAST(r.r AS VARCHAR) || " +
        "':' || CAST(i.i AS VARCHAR))")
    s"""WITH ${Stats.gridSql},
       |pos AS (
       |  SELECT event_type, day - (SELECT MIN(day) FROM grid) AS k, v
       |  FROM grid),
       |meta AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(v) AS BIGINT) AS sv
       |  FROM pos GROUP BY 1),
       |picks AS (
       |  SELECT m.event_type, m.n, r.r, i.i, ($hv) % m.n AS pick
       |  FROM meta m
       |  CROSS JOIN (SELECT UNNEST(range(1, 201)) AS r) r
       |  CROSS JOIN (SELECT UNNEST(range(0, (SELECT MAX(n) FROM meta)))
       |              AS i) i
       |  WHERE i.i < m.n),
       |sums AS (
       |  SELECT p.event_type AS et, p.r, CAST(SUM(g.v) AS BIGINT) AS s
       |  FROM picks p JOIN pos g
       |  ON g.event_type = p.event_type AND g.k = p.pick
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT et, s,
       |    ROW_NUMBER() OVER (PARTITION BY et ORDER BY s, r) AS rk
       |  FROM sums)
       |SELECT m.event_type, m.n AS n_days, CAST(200 AS BIGINT) AS b,
       |  ROUND(CAST(m.sv AS DOUBLE) / m.n, 4) AS mean_cents,
       |  ROUND(CAST(lo.s AS DOUBLE) / m.n, 4) AS boot_lo,
       |  ROUND(CAST(hi.s AS DOUBLE) / m.n, 4) AS boot_hi,
       |  ROUND(CAST(hi.s - lo.s AS DOUBLE) / m.n, 4) AS ci_width
       |FROM meta m
       |JOIN (SELECT et, s FROM ranked WHERE rk = 5) lo ON lo.et = m.event_type
       |JOIN (SELECT et, s FROM ranked WHERE rk = 195) hi ON hi.et = m.event_type
       |ORDER BY m.event_type NULLS FIRST""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q336" -> (q336 _), "Q339" -> (q339 _), "Q340" -> (q340 _),
    "Q309" -> (q309 _), "Q310" -> (q310 _), "Q315" -> (q315 _),
    "Q323" -> (q323 _), "Q333" -> (q333 _),
    "Q275" -> (q275 _), "Q276" -> (q276 _), "Q277" -> (q277 _),
    "Q279" -> (q279 _), "Q280" -> (q280 _), "Q281" -> (q281 _),
    "Q282" -> (q282 _), "Q283" -> (q283 _), "Q284" -> (q284 _),
    "Q285" -> (q285 _), "Q291" -> (q291 _), "Q292" -> (q292 _),
    "Q296" -> (q296 _))

  def oracles: Map[String, String] = Map(
    "Q336" -> q336Oracle, "Q339" -> q339Oracle, "Q340" -> q340Oracle,
    "Q309" -> q309Oracle, "Q310" -> q310Oracle, "Q315" -> q315Oracle,
    "Q323" -> q323Oracle, "Q333" -> q333Oracle,
    "Q275" -> q275Oracle, "Q276" -> q276Oracle, "Q277" -> q277Oracle,
    "Q279" -> q279Oracle, "Q280" -> q280Oracle, "Q281" -> q281Oracle,
    "Q282" -> q282Oracle, "Q283" -> q283Oracle, "Q284" -> q284Oracle,
    "Q285" -> q285Oracle, "Q291" -> q291Oracle, "Q292" -> q292Oracle,
    "Q296" -> q296Oracle)
}
