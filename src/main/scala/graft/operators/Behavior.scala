package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Catalog

/** Behavioral analytics over the `events` stream — the user-journey
  * models a product/ML-analytics stack keeps next to the funnel (Q63),
  * retention (Q65/Q132) and RFM (Q104) reports: first-order Markov
  * transitions, train/test drift, era attribution, and journey
  * information measures.
  *
  * All three follow the repo's cross-engine determinism discipline:
  * event order is the total order (ts, event_id); money is exact int64
  * cents (`ROUND(value*100)`); day arithmetic is integer epoch-µs
  * division; doubles appear only in final ROUND-ed ratios/logs.
  *
  * Scale notes (100 TB): each query is one shuffle keyed by user (or
  * (type, bin)) followed by bounded-cardinality aggregates — transition
  * matrices are |types|² rows, PSI bins 10·|types|.
  * Nothing materializes per-user state on the driver.
  */
object Behavior {

  /** Q209 — first-order Markov transition matrix between event types:
    * per-user journeys ordered by (ts, event_id) yield (prev → next)
    * steps; each directed pair reports its step count, the row-share
    * probability P(next | prev) (round-6), and its rank among the
    * source type's successors (by count desc, then destination — the
    * "most likely next action" table).
    *
    * Scale: one window (LAG) over the per-user order — a single
    * shuffle on user_id — then a hash aggregate onto |types|² keys.
    */
  def q209(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = c.events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy(col("src"))
    steps
      .withColumn("row_total", sum(col("n")).over(tot))
      .withColumn("prob", round(col("n").cast("double") / col("row_total"), 6))
      .withColumn("succ_rank",
        row_number().over(tot.orderBy(desc("n"), asc("dst"))))
      .select(col("src"), col("dst"), col("n"), col("prob"), col("succ_rank"))
      .orderBy(asc_nulls_first("src"), asc_nulls_first("dst"))
  }

  val q209Oracle: String =
    """WITH steps AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS src
      |  FROM events),
      |pairs AS (
      |  SELECT src, event_type AS dst, COUNT(*) AS n
      |  FROM steps WHERE src IS NOT NULL GROUP BY 1, 2)
      |SELECT src, dst, n,
      |  ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src), 6) AS prob,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY n DESC, dst)
      |    AS BIGINT) AS succ_rank
      |FROM pairs
      |ORDER BY src NULLS FIRST, dst NULLS FIRST""".stripMargin

  /** Q211 — population-stability-index (PSI) drift audit between the
    * Q208 time split: per event type, the train vs test distribution
    * of value-cents over 10 equal-width bins spanned by the type's own
    * global [min, max] cents (integer bin arithmetic), scored with
    * Laplace-smoothed shares p_b=(n_b+1)/(N+10) so empty bins stay
    * finite. PSI = Σ (p−q)·ln(p/q); < 0.1 is conventionally stable,
    * > 0.25 drifted — the go/no-go a time-split feature pipeline
    * checks after Q208 flags leakage. Q176 is the time-HALVES PSI of
    * the value distribution (Jeffreys smoothing); this one is aligned
    * to Q208's 80/20 modeling split with Laplace smoothing, so the
    * drift verdict applies to the SAME eras the trainer would use.
    *
    * Scale: two passes over events (extent + binned counts), both
    * hash aggregates on (type, bin) ≤ 10·|types| keys; the ln/share
    * math runs on the tiny binned table.
    */
  def q211(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("event_type"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents"))
    val cut = ev.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .select(expr("dmin + ((dmax - dmin + 1) * 4) DIV 5").as("cutoff"))
    val ext = ev.groupBy(col("event_type"))
      .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    val binned = ev
      .join(broadcast(ext), Seq("event_type"))
      .crossJoin(broadcast(cut))
      .withColumn("bin",
        expr("least(CAST(9 AS BIGINT), ((cents - lo) * 10) DIV (hi - lo + 1))"))
      .withColumn("split",
        when(col("day") < col("cutoff"), "train").otherwise("test"))
      .groupBy(col("event_type"), col("bin")).agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).cast("long")
          .as("n_tr"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).cast("long")
          .as("n_te"))
    val totals = Window.partitionBy(col("event_type"))
    binned
      .withColumn("p", (col("n_tr") + 1L).cast("double") /
        (sum(col("n_tr")).over(totals) + 10L))
      .withColumn("q", (col("n_te") + 1L).cast("double") /
        (sum(col("n_te")).over(totals) + 10L))
      .groupBy(col("event_type")).agg(
        sum(col("n_tr")).cast("long").as("n_train"),
        sum(col("n_te")).cast("long").as("n_test"),
        count(lit(1)).as("bins_hit"),
        round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6)
          .as("psi"))
      .withColumn("verdict",
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "watch").otherwise("drifted"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q211Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |cut AS (
      |  SELECT MIN(day) + ((MAX(day) - MIN(day) + 1) * 4) // 5 AS cutoff
      |  FROM ev),
      |ext AS (
      |  SELECT event_type, MIN(cents) AS lo, MAX(cents) AS hi
      |  FROM ev GROUP BY 1),
      |binned AS (
      |  SELECT ev.event_type,
      |    LEAST(9, ((cents - lo) * 10) // (hi - lo + 1)) AS bin,
      |    CAST(SUM(CASE WHEN day < cutoff THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_tr,
      |    CAST(SUM(CASE WHEN day >= cutoff THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_te
      |  FROM ev JOIN ext ON ev.event_type = ext.event_type CROSS JOIN cut
      |  GROUP BY 1, 2),
      |shares AS (
      |  SELECT event_type, n_tr, n_te,
      |    CAST(n_tr + 1 AS DOUBLE)
      |      / (SUM(n_tr) OVER (PARTITION BY event_type) + 10) AS p,
      |    CAST(n_te + 1 AS DOUBLE)
      |      / (SUM(n_te) OVER (PARTITION BY event_type) + 10) AS q
      |  FROM binned)
      |SELECT event_type,
      |  CAST(SUM(n_tr) AS BIGINT) AS n_train,
      |  CAST(SUM(n_te) AS BIGINT) AS n_test,
      |  COUNT(*) AS bins_hit,
      |  ROUND(SUM((p - q) * LN(p / q)), 6) AS psi,
      |  CASE WHEN ROUND(SUM((p - q) * LN(p / q)), 6) < 0.1 THEN 'stable'
      |    WHEN ROUND(SUM((p - q) * LN(p / q)), 6) < 0.25 THEN 'watch'
      |    ELSE 'drifted' END AS verdict
      |FROM shares
      |GROUP BY 1
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q212 — Welch's two-sample t-test per event type across the Q208
    * time split: does the mean value differ significantly between the
    * train and test eras? Means and sample variances come from exact
    * int64 cents moments (Σx, Σx²), so both engines build identical
    * doubles before the one t / Welch–Satterthwaite-df computation;
    * the verdict applies the two-sided 5% normal threshold |t| > 1.96
    * (df is large here). Q211 scores distribution-shape drift; this
    * scores location drift with a significance, the pair a feature-
    * stability review reads together.
    *
    * Scale: one hash aggregate per (type, split) — six rows of moments
    * at any corpus size. Σx² of cents fits int64 through ~10^10 rows
    * of |value| ≤ 10^4; beyond that the moment pass switches to double
    * partials (same plan shape).
    */
  def q212(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("event_type"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents"))
    val cut = ev.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .select(expr("dmin + ((dmax - dmin + 1) * 4) DIV 5").as("cutoff"))
    val m = ev.crossJoin(broadcast(cut))
      .withColumn("is_tr", (col("day") < col("cutoff")).cast("long"))
      .groupBy(col("event_type")).agg(
        sum(col("is_tr")).cast("long").as("n1"),
        sum(col("is_tr") * col("cents")).cast("long").as("s1"),
        sum(col("is_tr") * col("cents") * col("cents")).cast("long").as("ss1"),
        sum(lit(1L) - col("is_tr")).cast("long").as("n2"),
        sum((lit(1L) - col("is_tr")) * col("cents")).cast("long").as("s2"),
        sum((lit(1L) - col("is_tr")) * col("cents") * col("cents"))
          .cast("long").as("ss2"))
    m.select(col("event_type"), col("n1").as("n_train"), col("n2").as("n_test"),
        round(col("s1").cast("double") / col("n1") / 100.0, 4).as("mean_train"),
        round(col("s2").cast("double") / col("n2") / 100.0, 4).as("mean_test"),
        ((col("ss1").cast("double") - col("s1").cast("double")
          * col("s1") / col("n1")) / (col("n1") - 1L)).as("v1"),
        ((col("ss2").cast("double") - col("s2").cast("double")
          * col("s2") / col("n2")) / (col("n2") - 1L)).as("v2"),
        col("n1"), col("n2"), col("s1"), col("s2"))
      .withColumn("se2",
        col("v1") / col("n1") + col("v2") / col("n2"))
      .withColumn("t_stat", round(
        (col("s1").cast("double") / col("n1")
          - col("s2").cast("double") / col("n2")) / sqrt(col("se2")), 4))
      .withColumn("df", round(
        (col("se2") * col("se2")) /
          ((col("v1") / col("n1")) * (col("v1") / col("n1"))
            / (col("n1") - 1L)
            + (col("v2") / col("n2")) * (col("v2") / col("n2"))
              / (col("n2") - 1L)), 1))
      .withColumn("verdict",
        when(abs(col("t_stat")) > 1.96, "shifted").otherwise("stable"))
      .select(col("event_type"), col("n_train"), col("n_test"),
        col("mean_train"), col("mean_test"), col("t_stat"), col("df"),
        col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q212Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |cut AS (
      |  SELECT MIN(day) + ((MAX(day) - MIN(day) + 1) * 4) // 5 AS cutoff
      |  FROM ev),
      |m AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN day < cutoff THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN day < cutoff THEN cents ELSE 0 END) AS BIGINT)
      |      AS s1,
      |    CAST(SUM(CASE WHEN day < cutoff THEN cents * cents ELSE 0 END)
      |      AS BIGINT) AS ss1,
      |    CAST(SUM(CASE WHEN day >= cutoff THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(SUM(CASE WHEN day >= cutoff THEN cents ELSE 0 END) AS BIGINT)
      |      AS s2,
      |    CAST(SUM(CASE WHEN day >= cutoff THEN cents * cents ELSE 0 END)
      |      AS BIGINT) AS ss2
      |  FROM ev CROSS JOIN cut GROUP BY 1),
      |v AS (
      |  SELECT event_type, n1, n2, s1, s2,
      |    (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1)
      |      AS v1,
      |    (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1)
      |      AS v2
      |  FROM m),
      |w AS (
      |  SELECT *, v1 / n1 + v2 / n2 AS se2 FROM v)
      |SELECT event_type, n1 AS n_train, n2 AS n_test,
      |  ROUND(CAST(s1 AS DOUBLE) / n1 / 100.0, 4) AS mean_train,
      |  ROUND(CAST(s2 AS DOUBLE) / n2 / 100.0, 4) AS mean_test,
      |  ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
      |    / SQRT(se2), 4) AS t_stat,
      |  ROUND(se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
      |    + (v2 / n2) * (v2 / n2) / (n2 - 1)), 1) AS df,
      |  CASE WHEN ABS(ROUND((CAST(s1 AS DOUBLE) / n1
      |      - CAST(s2 AS DOUBLE) / n2) / SQRT(se2), 4)) > 1.96
      |    THEN 'shifted' ELSE 'stable' END AS verdict
      |FROM w
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q213 — Gini concentration of user value per event type: how
    * unequally the type's spend concentrates across its users, from
    * the exact rank formula G = 2·Σ(i·xᵢ) / (n·Σx) − (n+1)/n over
    * users ordered by (spend, user_id). Reports each type's user
    * count, total cents, top-decile value share, and Gini — the
    * whale-concentration report a monetization/sampling review reads
    * next to Q104's RFM segments.
    *
    * Determinism: ranks come from a fully tie-broken total order;
    * every sum is exact int64 (Σ i·xᵢ bounded by n²·max-spend —
    * int64-safe through ~10^5 users of 10^8 cents); Gini and share
    * are final ROUND-6 doubles.
    *
    * Scale: one aggregate per (type, user), one range-partitioned
    * sort per type for ranks, one rollup. No driver state.
    */
  def q213(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val perUser = c.events
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("cents")).cast("long").as("x"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("x"), col("user_id"))
    val wAll = Window.partitionBy(col("event_type"))
    val ranked = perUser
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("decile_mass",
        when(col("i") > (col("n") * 9L).cast("long").divide(10L).cast("long"),
          col("x")).otherwise(0L))
    ranked.groupBy(col("event_type")).agg(
        count(lit(1)).as("n_users"),
        sum(col("x")).cast("long").as("cents_total"),
        sum(col("i") * col("x")).cast("long").as("ix"),
        sum(col("decile_mass")).cast("long").as("top_decile_cents"))
      .select(col("event_type"), col("n_users"), col("cents_total"),
        round(col("top_decile_cents").cast("double") / col("cents_total"), 6)
          .as("top_decile_share"),
        round(lit(2.0) * col("ix") / (col("n_users") * col("cents_total"))
          - (col("n_users") + 1L).cast("double") / col("n_users"), 6)
          .as("gini"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q213Oracle: String =
    """WITH per_user AS (
      |  SELECT event_type, user_id,
      |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |ranked AS (
      |  SELECT event_type, x,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x, user_id)
      |      AS i,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM per_user)
      |SELECT event_type,
      |  CAST(MAX(n) AS BIGINT) AS n_users,
      |  CAST(SUM(x) AS BIGINT) AS cents_total,
      |  ROUND(CAST(SUM(CASE WHEN i > (n * 9) // 10 THEN x ELSE 0 END)
      |    AS DOUBLE) / SUM(x), 6) AS top_decile_share,
      |  ROUND(2.0 * CAST(SUM(i * x) AS DOUBLE)
      |    / (MAX(n) * CAST(SUM(x) AS DOUBLE))
      |    - CAST(MAX(n) + 1 AS DOUBLE) / MAX(n), 6) AS gini
      |FROM ranked
      |GROUP BY 1
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q216 — lead-lag cross-correlation between event types: for every
    * ordered type pair (a, b), the Pearson correlation of a's daily
    * revenue-cents series against b's shifted by lag ∈ [−7, +7] days
    * (zero-filled common spine), reporting the lag-0 correlation and
    * the best-|r| lag — "does search volume lead purchase volume by
    * N days" asked of the whole type universe. Q128 is each series'
    * self-correlation; Q179 is the count-series cross matrix at lags
    * ±3 — this one correlates REVENUE-cents mass, widens to ±7, and
    * reduces each pair to its best-|r| alignment (the actionable
    * "who leads whom by how much" row) instead of emitting all lags.
    *
    * Determinism: the spine is exact integer cents on the global
    * [dmin, dmax] day grid; every correlation computes from exact
    * int64 sums (n, Σx, Σy, Σxy, Σx², Σy²) via the textbook identity,
    * with the division/sqrt the only doubles (ROUND-4). The best-lag
    * argmax orders by (|r| desc, lag asc) over identically-computed
    * doubles.
    *
    * Scale notes: everything after the one daily aggregate runs on
    * the bounded spine (days × types rows — thousands at any corpus
    * size); the lag join is spine×15 lags, still bounded. One corpus
    * scan total.
    */
  def q216(spark: SparkSession, dir: String): DataFrame = {
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
      .select(col("event_type"),
        explode(expr("sequence(dmin, dmax)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("v"), lit(0L)).as("v"))
      .localCheckpoint()
    val lags = spark.range(-7L, 8L).select(col("id").as("lag"))
    val a = spine.select(col("event_type").as("ta"), col("day"),
      col("v").as("x"))
    val b = spine.select(col("event_type").as("tb"),
      col("day").as("day_b"), col("v").as("y"))
    val sums = a.crossJoin(broadcast(lags))
      .join(b, col("day_b") === col("day") + col("lag"))
      .groupBy(col("ta"), col("tb"), col("lag")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("y")).cast("long").as("sy"),
        // moment sums of PRODUCTS in DECIMAL(38,0)/HUGEINT: a single
        // x·y of two sf10-scale daily-cents values (~3·10⁹ each) already
        // tops 2⁶³ — the r12 sf10 sweep measured the int64 form THROWING
        // under ANSI while the oracle's HUGEINT sum sailed on
        sum(col("x").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)").as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).cast("decimal(38,0)").as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)").as("syy"))
      // products of the raw sums exceed even decimal38 head-room when
      // multiplied again (n·Σxy), so the identity evaluates in DOUBLE —
      // same shape both engines
      .withColumn("r",
        (col("n").cast("double") * col("sxy") - col("sx").cast("double")
          * col("sy")) /
          sqrt((col("n").cast("double") * col("sxx")
            - col("sx").cast("double") * col("sx"))
            * (col("n").cast("double") * col("syy")
              - col("sy").cast("double") * col("sy"))))
    val wPair = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ta"), col("tb"))
      .orderBy(desc("abs_r"), asc("lag"))
    sums
      .withColumn("abs_r", abs(col("r")))
      .withColumn("rk", row_number().over(wPair))
      .withColumn("r0",
        max(when(col("lag") === 0L, col("r"))).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("ta"), col("tb"))))
      .filter(col("rk") === 1)
      .select(col("ta"), col("tb"), round(col("r0"), 4).as("r_lag0"),
        col("lag").as("best_lag"), round(col("r"), 4).as("best_r"))
      .orderBy(asc_nulls_first("ta"), asc_nulls_first("tb"))
  }

  val q216Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |ext AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM daily),
      |spine AS (
      |  SELECT t.event_type, g.day, COALESCE(d.v, 0) AS v
      |  FROM (SELECT DISTINCT event_type FROM daily) t
      |  CROSS JOIN (SELECT UNNEST(range(dmin, dmax + 1)) AS day FROM ext) g
      |  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = g.day),
      |sums AS (
      |  SELECT a.event_type AS ta, b.event_type AS tb, l.lag,
      |    COUNT(*) AS n,
      |    CAST(SUM(a.v) AS BIGINT) AS sx, CAST(SUM(b.v) AS BIGINT) AS sy,
      |    CAST(SUM(CAST(a.v AS HUGEINT) * b.v) AS HUGEINT) AS sxy,
      |    CAST(SUM(CAST(a.v AS HUGEINT) * a.v) AS HUGEINT) AS sxx,
      |    CAST(SUM(CAST(b.v AS HUGEINT) * b.v) AS HUGEINT) AS syy
      |  FROM spine a
      |  CROSS JOIN (SELECT UNNEST(range(-7, 8)) AS lag) l
      |  JOIN spine b ON b.day = a.day + l.lag
      |  GROUP BY 1, 2, 3),
      |corr AS (
      |  SELECT ta, tb, lag,
      |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |      / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS r
      |  FROM sums),
      |ranked AS (
      |  SELECT ta, tb, lag, r,
      |    ROW_NUMBER() OVER (PARTITION BY ta, tb
      |      ORDER BY ABS(r) DESC, lag) AS rk,
      |    MAX(CASE WHEN lag = 0 THEN r END) OVER (PARTITION BY ta, tb)
      |      AS r0
      |  FROM corr)
      |SELECT ta, tb, ROUND(r0, 4) AS r_lag0, lag AS best_lag,
      |  ROUND(r, 4) AS best_r
      |FROM ranked WHERE rk = 1
      |ORDER BY ta NULLS FIRST, tb NULLS FIRST""".stripMargin

  /** Q217 — point-in-time-correct churn feature/label audit: features
    * per user computed ONLY from pre-cutoff events (frequency, exact-
    * cents spend, recency to the cutoff, tenure, active days), the
    * label ONLY from post-cutoff presence — the temporal hygiene that
    * Q208 audits, demonstrated as an actual leakage-safe training
    * snapshot. Users are ranked into spend deciles (NTILE(10) over the
    * tie-broken (spend, user_id) order); the report gives each
    * decile's population, retention rate, and mean pre-cutoff
    * activity — the sanity curve (monotone-ish retention vs value) a
    * churn-model review reads before training.
    *
    * Scale: two disjoint-era aggregates per user + one bounded NTILE
    * over the per-user table + a 10-cell rollup. Join of features to
    * labels is user-keyed, co-partitioned with the feature aggregate.
    */
  def q217(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("user_id"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents"))
    val cut = ev.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .select(expr("dmin + ((dmax - dmin + 1) * 4) DIV 5").as("cutoff"))
    val tagged = ev.crossJoin(broadcast(cut))
    val feats = tagged.filter(col("day") < col("cutoff"))
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("freq"),
        sum(col("cents")).cast("long").as("spend"),
        (first(col("cutoff")) - lit(1L) - max(col("day"))).as("recency"),
        (max(col("day")) - min(col("day"))).as("tenure"),
        countDistinct(col("day")).as("active_days"))
    val labels = tagged.filter(col("day") >= col("cutoff"))
      .select(col("user_id")).distinct().withColumn("retained", lit(1L))
    val joined = feats.join(labels, Seq("user_id"), "left")
      .withColumn("retained", coalesce(col("retained"), lit(0L)))
      .withColumn("decile", ntile(10).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("spend"), col("user_id"))))
    joined.groupBy(col("decile")).agg(
        count(lit(1)).as("n_users"),
        sum(col("retained")).cast("long").as("n_retained"),
        round(sum(col("retained")).cast("double") / count(lit(1)), 6)
          .as("retention_rate"),
        round(avg(col("freq").cast("double")), 2).as("avg_freq"),
        round(avg(col("active_days").cast("double")), 2).as("avg_active_days"),
        sum(col("spend")).cast("long").as("cents_total"))
      .orderBy(col("decile"))
  }

  val q217Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |cut AS (
      |  SELECT MIN(day) + ((MAX(day) - MIN(day) + 1) * 4) // 5 AS cutoff
      |  FROM ev),
      |feats AS (
      |  SELECT user_id, COUNT(*) AS freq,
      |    CAST(SUM(cents) AS BIGINT) AS spend,
      |    ANY_VALUE(cutoff) - 1 - MAX(day) AS recency,
      |    MAX(day) - MIN(day) AS tenure,
      |    COUNT(DISTINCT day) AS active_days
      |  FROM ev CROSS JOIN cut WHERE day < cutoff GROUP BY 1),
      |labels AS (
      |  SELECT DISTINCT user_id, 1 AS retained
      |  FROM ev CROSS JOIN cut WHERE day >= cutoff),
      |joined AS (
      |  SELECT f.*, COALESCE(l.retained, 0) AS retained,
      |    NTILE(10) OVER (ORDER BY f.spend, f.user_id) AS decile
      |  FROM feats f LEFT JOIN labels l ON f.user_id = l.user_id)
      |SELECT CAST(decile AS INT) AS decile, COUNT(*) AS n_users,
      |  CAST(SUM(retained) AS BIGINT) AS n_retained,
      |  ROUND(CAST(SUM(retained) AS DOUBLE) / COUNT(*), 6)
      |    AS retention_rate,
      |  ROUND(AVG(CAST(freq AS DOUBLE)), 2) AS avg_freq,
      |  ROUND(AVG(CAST(active_days AS DOUBLE)), 2) AS avg_active_days,
      |  CAST(SUM(spend) AS BIGINT) AS cents_total
      |FROM joined
      |GROUP BY 1
      |ORDER BY decile""".stripMargin

  /** Q220 — top user-journey paths: every consecutive 3-step
    * event-type sequence (trigram) in each user's (ts, event_id)-
    * ordered journey, counted corpus-wide, with each path's share of
    * all trigrams and its rank — the "what do users actually do"
    * clickstream report next to Q209's one-step matrix (a first-order
    * chain predicts the next step; the trigram table shows which
    * multi-step flows dominate).
    *
    * Scale: two LAG columns over the one user-keyed window pass (same
    * shuffle Q209 already pays), then a hash aggregate onto ≤ |types|³
    * keys. Top-20 by (count desc, path) is a TakeOrdered.
    */
  def q220(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tri = c.events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("p1", lag(col("event_type"), 1).over(w))
      .withColumn("p2", lag(col("event_type"), 2).over(w))
      .filter(col("p2").isNotNull)
      .select(concat_ws(">", col("p2"), col("p1"), col("event_type"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
    tri.crossJoin(broadcast(tri.agg(sum(col("n")).cast("long").as("total"))))
      .withColumn("share", round(col("n").cast("double") / col("total"), 6))
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("n"), asc("path"))))
      .filter(col("rank") <= 20)
      .select(col("rank"), col("path"), col("n"), col("share"))
      .orderBy(col("rank"))
  }

  val q220Oracle: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type, 1) OVER w AS p1,
      |    LAG(event_type, 2) OVER w AS p2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |tri AS (
      |  SELECT p2 || '>' || p1 || '>' || event_type AS path, COUNT(*) AS n
      |  FROM seq WHERE p2 IS NOT NULL GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM tri),
      |ranked AS (
      |  SELECT path, n,
      |    ROUND(CAST(n AS DOUBLE) / total, 6) AS share,
      |    CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS INT) AS rank
      |  FROM tri CROSS JOIN tot)
      |SELECT rank, path, n, share
      |FROM ranked WHERE rank <= 20
      |ORDER BY rank""".stripMargin

  /** Q221 — price-volume-mix attribution between the Q208 eras: the
    * BI decomposition of revenue change per event type into VOLUME
    * (event-count change at the base era's overall rate), RATE
    * (value-per-event change at the base count), and MIX/interaction
    * (the cross term), with Δrevenue = volume + rate + mix holding
    * EXACTLY per type as an accounting identity. Answers "did revenue
    * move because we did more events, richer events, or a changed
    * blend" — the era-comparison twin of Q212's significance test.
    *
    * Determinism: counts and revenue are exact int64 (cents); the
    * three effects are single-expression doubles of those integers,
    * each a final ROUND-2; the identity is pinned in spec by
    * reconstructing Δ from the emitted effects.
    *
    * Scale: one hash aggregate per (type, era) — 2·|types| rows of
    * moments; everything after is scalar arithmetic.
    */
  def q221(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("event_type"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents"))
    val cut = ev.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .select(expr("dmin + ((dmax - dmin + 1) * 4) DIV 5").as("cutoff"))
    val m = ev.crossJoin(broadcast(cut))
      .withColumn("is_tr", (col("day") < col("cutoff")).cast("long"))
      .groupBy(col("event_type")).agg(
        sum(col("is_tr")).cast("long").as("n1"),
        sum(col("is_tr") * col("cents")).cast("long").as("r1"),
        sum(lit(1L) - col("is_tr")).cast("long").as("n2"),
        sum((lit(1L) - col("is_tr")) * col("cents")).cast("long").as("r2"))
    // effects in dollars: volume = Δn·rate1, rate = n1·Δrate,
    // mix = Δn·Δrate; rate_i = r_i/n_i (cents/event)
    m.select(col("event_type"),
        col("n1").as("n_base"), col("n2").as("n_curr"),
        round(col("r1").cast("double") / 100.0, 2).as("rev_base"),
        round(col("r2").cast("double") / 100.0, 2).as("rev_curr"),
        round((col("r2") - col("r1")).cast("double") / 100.0, 2).as("delta"),
        round((col("n2") - col("n1")).cast("double")
          * (col("r1").cast("double") / col("n1")) / 100.0, 2)
          .as("volume_effect"),
        round(col("n1").cast("double")
          * (col("r2").cast("double") / col("n2")
            - col("r1").cast("double") / col("n1")) / 100.0, 2)
          .as("rate_effect"),
        round((col("n2") - col("n1")).cast("double")
          * (col("r2").cast("double") / col("n2")
            - col("r1").cast("double") / col("n1")) / 100.0, 2)
          .as("mix_effect"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q221Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |cut AS (
      |  SELECT MIN(day) + ((MAX(day) - MIN(day) + 1) * 4) // 5 AS cutoff
      |  FROM ev),
      |m AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN day < cutoff THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN day < cutoff THEN cents ELSE 0 END) AS BIGINT)
      |      AS r1,
      |    CAST(SUM(CASE WHEN day >= cutoff THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n2,
      |    CAST(SUM(CASE WHEN day >= cutoff THEN cents ELSE 0 END) AS BIGINT)
      |      AS r2
      |  FROM ev CROSS JOIN cut GROUP BY 1)
      |SELECT event_type, n1 AS n_base, n2 AS n_curr,
      |  ROUND(CAST(r1 AS DOUBLE) / 100.0, 2) AS rev_base,
      |  ROUND(CAST(r2 AS DOUBLE) / 100.0, 2) AS rev_curr,
      |  ROUND(CAST(r2 - r1 AS DOUBLE) / 100.0, 2) AS delta,
      |  ROUND(CAST(n2 - n1 AS DOUBLE)
      |    * (CAST(r1 AS DOUBLE) / n1) / 100.0, 2) AS volume_effect,
      |  ROUND(CAST(n1 AS DOUBLE)
      |    * (CAST(r2 AS DOUBLE) / n2 - CAST(r1 AS DOUBLE) / n1) / 100.0, 2)
      |    AS rate_effect,
      |  ROUND(CAST(n2 - n1 AS DOUBLE)
      |    * (CAST(r2 AS DOUBLE) / n2 - CAST(r1 AS DOUBLE) / n1) / 100.0, 2)
      |    AS mix_effect
      |FROM m
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q224 — journey predictability: the conditional next-step entropy
    * H(next | prev = s) of Q209's Markov chain, per source type, in
    * bits, with its perplexity 2^H (the effective branching factor)
    * and the chain-level entropy rate Σ π(s)·H(s) under the empirical
    * source distribution — "how predictable is the next user action",
    * the single number that says whether a next-event model can beat
    * the majority-class baseline (whose own accuracy is emitted as
    * top_prob).
    *
    * Determinism: transition counts are exact int64; entropy terms
    * (n/N)·log₂(N/n) evaluate with identical expression text; ROUND-4
    * outputs. The per-source row carries its π weight so the spec can
    * reconstruct the rate exactly.
    *
    * Scale: reuses Q209's one window pass + |types|² aggregate;
    * everything downstream is arithmetic on the tiny matrix.
    */
  def q224(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = c.events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    val wSrc = Window.partitionBy(col("src"))
    steps
      .withColumn("row_total", sum(col("n")).over(wSrc))
      .withColumn("p", col("n").cast("double") / col("row_total"))
      .groupBy(col("src")).agg(
        max(col("row_total")).cast("long").as("n_steps"),
        round(sum(col("p") * log(2.0, lit(1.0) / col("p"))), 4)
          .as("h_bits"),
        round(pow(lit(2.0),
          sum(col("p") * log(2.0, lit(1.0) / col("p")))), 4)
          .as("perplexity"),
        round(max(col("p")), 4).as("top_prob"))
      .orderBy(asc_nulls_first("src"))
  }

  val q224Oracle: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS src
      |  FROM events),
      |pairs AS (
      |  SELECT src, event_type AS dst, COUNT(*) AS n
      |  FROM seq WHERE src IS NOT NULL GROUP BY 1, 2),
      |probs AS (
      |  SELECT src, n,
      |    CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src) AS p,
      |    SUM(n) OVER (PARTITION BY src) AS row_total
      |  FROM pairs)
      |SELECT src, CAST(MAX(row_total) AS BIGINT) AS n_steps,
      |  ROUND(SUM(p * (LN(1.0 / p) / LN(2.0))), 4) AS h_bits,
      |  ROUND(POW(2.0, SUM(p * (LN(1.0 / p) / LN(2.0)))), 4) AS perplexity,
      |  ROUND(MAX(p), 4) AS top_prob
      |FROM probs
      |GROUP BY 1
      |ORDER BY src NULLS FIRST""".stripMargin

  /** Q247 — calibration audit + Murphy (1973) decomposition of a
    * backtested median-split spend predictor: deciles of PRE-era
    * revenue cents (NTILE over the (cents, user_id) total order —
    * tie-free, engine-identical), each decile's forecast p̂_d = its
    * share of users above the PRE-era median, scored against the
    * POST-era outcome o = (post cents > post median) — fit on pre,
    * score on post, the Q211/Q217 temporal-split discipline. The TOTAL
    * row carries the Brier score and its exact Murphy decomposition
    * BRIER = REL − RES + UNC (reliability = calibration error,
    * resolution = decile separation, uncertainty = ō(1−ō)); the
    * identity is algebraic for binned constant forecasts and the spec
    * asserts it to 1e-9. On a memoryless corpus the read is exactly
    * what a calibration audit exists to catch: a {0,1}-confident
    * median-split heuristic against ≈½ outcomes → reliability ≈ ¼
    * dominates the Brier score.
    *
    * Determinism: both medians are exact lower order statistics
    * ((value, user_id) order), so every per-user flag and decile
    * count/positive-sum is exact int64; p̂_d/ō_d are single divides;
    * the three decomposition sums run over exactly 10 decile rows in
    * one pinned shape each, rounded once. Users with no pre-era events
    * are dropped by BOTH engines (no feature, nothing to score).
    *
    * Scale notes: the corpus collapses to one row per user (shuffle on
    * user_id); the median and decile ranks are one sort each of that
    * collapsed relation (at 10⁹ users: range partition + local rank,
    * the standard ntile topology); everything after is 10 rows.
    */
  def q247(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("user_id"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents"))
    val ext = ev.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .withColumn("cut", expr("dmin + (dmax - dmin + 1) div 2"))
    val per = ev.crossJoin(broadcast(ext))
      .groupBy(col("user_id"))
      .agg(sum(when(col("day") < col("cut"), 1L).otherwise(0L))
        .as("pre_n"),
        sum(when(col("day") < col("cut"), col("cents")).otherwise(0L))
          .cast("long").as("x"),
        sum(when(col("day") >= col("cut"), col("cents")).otherwise(0L))
          .cast("long").as("y"))
      .filter(col("pre_n") > 0L)
    val wx = Window.orderBy(col("x"), col("user_id"))
    val wy = Window.orderBy(col("y"), col("user_id"))
    val wn = Window.partitionBy(lit(1))
    val scored = per
      .withColumn("cnt", count(lit(1)).over(wn))
      .withColumn("rx", row_number().over(wx))
      .withColumn("ry", row_number().over(wy))
      .withColumn("mx", max(expr("CASE WHEN rx = (cnt + 1) div 2" +
        " THEN x END")).over(wn))
      .withColumn("my", max(expr("CASE WHEN ry = (cnt + 1) div 2" +
        " THEN y END")).over(wn))
      .withColumn("pre_hi", when(col("x") > col("mx"), 1L).otherwise(0L))
      .withColumn("post_hi", when(col("y") > col("my"), 1L).otherwise(0L))
      .withColumn("bucket", ntile(10).over(wx).cast("long"))
    val dec = scored.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("pre_hi")).as("a"),
        sum(col("post_hi")).as("s"))
      .withColumn("p_hat", expr("CAST(a AS DOUBLE) / n_users"))
      .withColumn("o_bar", expr("CAST(s AS DOUBLE) / n_users"))
    val tot = dec.groupBy()
      .agg(sum(col("n_users")).as("n_users"),
        sum(col("a")).cast("long").as("a"),
        sum(col("s")).cast("long").as("s"),
        sum(expr("n_users * p_hat * p_hat - 2 * p_hat * s + s"))
          .as("brier_num"),
        sum(expr("n_users * (p_hat - o_bar) * (p_hat - o_bar)"))
          .as("rel_num"),
        sum(expr("n_users * o_bar * o_bar")).as("so2"))
      .withColumn("obar_g", expr("CAST(s AS DOUBLE) / n_users"))
      .select(lit(null).cast("long").as("bucket"), col("n_users"),
        expr("ROUND(CAST(a AS DOUBLE) / n_users, 6)").as("pre_rate"),
        expr("ROUND(CAST(s AS DOUBLE) / n_users, 6)").as("post_rate"),
        expr("ROUND(brier_num / n_users, 6)").as("brier"),
        expr("ROUND(rel_num / n_users, 6)").as("reliability"),
        expr("ROUND(so2 / n_users - obar_g * obar_g, 6)").as("resolution"),
        expr("ROUND(obar_g * (1 - obar_g), 6)").as("uncertainty"))
    val decOut = dec.select(col("bucket"), col("n_users"),
      expr("ROUND(p_hat, 6)").as("pre_rate"),
      expr("ROUND(o_bar, 6)").as("post_rate"),
      lit(null).cast("double").as("brier"),
      lit(null).cast("double").as("reliability"),
      lit(null).cast("double").as("resolution"),
      lit(null).cast("double").as("uncertainty"))
    decOut.unionAll(tot).orderBy(asc_nulls_last("bucket"))
  }

  val q247Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |ext AS (
      |  SELECT MIN(day) + (MAX(day) - MIN(day) + 1) // 2 AS cut FROM ev),
      |per AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN day < (SELECT cut FROM ext) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS pre_n,
      |    CAST(SUM(CASE WHEN day < (SELECT cut FROM ext) THEN cents
      |      ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN day >= (SELECT cut FROM ext) THEN cents
      |      ELSE 0 END) AS BIGINT) AS y
      |  FROM ev GROUP BY 1),
      |kept AS (SELECT * FROM per WHERE pre_n > 0),
      |ranked AS (
      |  SELECT *,
      |    COUNT(*) OVER () AS cnt,
      |    ROW_NUMBER() OVER (ORDER BY x, user_id) AS rx,
      |    ROW_NUMBER() OVER (ORDER BY y, user_id) AS ry,
      |    CAST(NTILE(10) OVER (ORDER BY x, user_id) AS BIGINT) AS bucket
      |  FROM kept),
      |meds AS (
      |  SELECT *,
      |    MAX(CASE WHEN rx = (cnt + 1) // 2 THEN x END) OVER () AS mx,
      |    MAX(CASE WHEN ry = (cnt + 1) // 2 THEN y END) OVER () AS my
      |  FROM ranked),
      |scored AS (
      |  SELECT bucket,
      |    CASE WHEN x > mx THEN 1 ELSE 0 END AS pre_hi,
      |    CASE WHEN y > my THEN 1 ELSE 0 END AS post_hi
      |  FROM meds),
      |dec AS (
      |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(pre_hi) AS BIGINT) AS a,
      |    CAST(SUM(post_hi) AS BIGINT) AS s
      |  FROM scored GROUP BY 1),
      |d2 AS (
      |  SELECT *, CAST(a AS DOUBLE) / n_users AS p_hat,
      |    CAST(s AS DOUBLE) / n_users AS o_bar
      |  FROM dec),
      |tot AS (
      |  SELECT CAST(SUM(n_users) AS BIGINT) AS n_users,
      |    CAST(SUM(a) AS BIGINT) AS a, CAST(SUM(s) AS BIGINT) AS s,
      |    SUM(n_users * p_hat * p_hat - 2 * p_hat * s + s) AS brier_num,
      |    SUM(n_users * (p_hat - o_bar) * (p_hat - o_bar)) AS rel_num,
      |    SUM(n_users * o_bar * o_bar) AS so2
      |  FROM d2),
      |t2 AS (SELECT *, CAST(s AS DOUBLE) / n_users AS obar_g FROM tot)
      |SELECT bucket, n_users,
      |  ROUND(p_hat, 6) AS pre_rate, ROUND(o_bar, 6) AS post_rate,
      |  CAST(NULL AS DOUBLE) AS brier, CAST(NULL AS DOUBLE) AS reliability,
      |  CAST(NULL AS DOUBLE) AS resolution,
      |  CAST(NULL AS DOUBLE) AS uncertainty
      |FROM d2
      |UNION ALL
      |SELECT NULL, n_users,
      |  ROUND(CAST(a AS DOUBLE) / n_users, 6),
      |  ROUND(CAST(s AS DOUBLE) / n_users, 6),
      |  ROUND(brier_num / n_users, 6),
      |  ROUND(rel_num / n_users, 6),
      |  ROUND(so2 / n_users - obar_g * obar_g, 6),
      |  ROUND(obar_g * (1 - obar_g), 6)
      |FROM t2
      |ORDER BY bucket NULLS LAST""".stripMargin

  /** Q249 — discrimination readout (ROC AUC + KS) of the pre-era spend
    * score against the post-era outcome: Q247 asks "are the forecasts
    * CALIBRATED"; this asks the other half of forecast quality — do
    * higher scores RANK positives above negatives at all (Hanley &
    * McNeil 1982; the Mann–Whitney U identity makes AUC a pure rank
    * statistic). Score = pre-era cents, outcome = post-era cents above
    * the post median (Q247's exact framing, shared on purpose so the
    * calibration and discrimination reads describe the SAME predictor).
    * AUC = (ΣR⁺ − n⁺(n⁺+1)/2)/(n⁺n⁻) from DOUBLED int64 midranks
    * (the Q161/Q163 discipline — no float enters until the final
    * divide), Gini = 2·AUC − 1, and the KS separation statistic
    * maximized as the EXACT integer |cum⁺·n⁻ − cum⁻·n⁺| over the
    * score-sorted ECDF gap (threshold reported at the struct-max, ties
    * to the highest score).
    *
    * Determinism: midranks, rank sums, cumulative counts, and the KS
    * argmax are all exact int64 (KS numerator ≤ n⁺n⁻ ≪ 2⁶³); AUC, Gini
    * and KS are one divide each, rounded once. n⁺ = 0 or n⁻ = 0
    * degrades every statistic to NULL + 'degenerate'.
    *
    * Scale notes: one corpus scan collapses to per-user rows; the
    * midranks and the ECDF are windows over the (score)-sorted
    * collapsed relation (range partition + local rank at 10⁹ users);
    * output is ONE row.
    */
  def q249(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("user_id"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents"))
    val ext = ev.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .withColumn("cut", expr("dmin + (dmax - dmin + 1) div 2"))
    val per = ev.crossJoin(broadcast(ext))
      .groupBy(col("user_id"))
      .agg(sum(when(col("day") < col("cut"), 1L).otherwise(0L)).as("pre_n"),
        sum(when(col("day") < col("cut"), col("cents")).otherwise(0L))
          .cast("long").as("x"),
        sum(when(col("day") >= col("cut"), col("cents")).otherwise(0L))
          .cast("long").as("y"))
      .filter(col("pre_n") > 0L)
    val wy = Window.orderBy(col("y"), col("user_id"))
    val wn = Window.partitionBy(lit(1))
    val lab = per
      .withColumn("cnt", count(lit(1)).over(wn))
      .withColumn("ry", row_number().over(wy))
      .withColumn("my", max(expr("CASE WHEN ry = (cnt + 1) div 2" +
        " THEN y END")).over(wn))
      .withColumn("pos", when(col("y") > col("my"), 1L).otherwise(0L))
    // collapse to the distinct-score relation: everything below runs on
    // |distinct pre-cents| rows, with exact int64 midranks and ECDFs
    val byX = lab.groupBy(col("x"))
      .agg(count(lit(1)).as("m"), sum(col("pos")).cast("long").as("p"))
    val wxo = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byX
      .withColumn("cp", sum(col("p")).over(wxo))
      .withColumn("cm", sum(col("m")).over(wxo))
      .withColumn("cn", col("cm") - col("cp"))
      // doubled midrank of every row tied at this x: 2*(count below) + m + 1
      .withColumn("dr", (col("cm") - col("m")) * 2L + col("m") + 1L)
    val tot = cum.groupBy()
      .agg(sum(col("m")).cast("long").as("n_users"),
        sum(col("p")).cast("long").as("np"),
        sum(col("p") * col("dr")).cast("long").as("drp"))
    cum.crossJoin(broadcast(tot))
      .withColumn("ksn",
        abs(col("cp") * (col("n_users") - col("np")) -
          col("cn") * col("np")))
      .groupBy(col("n_users"), col("np"), col("drp"))
      .agg(max(struct(col("ksn"), col("x"))).as("ksm"))
      .withColumn("nn", col("n_users") - col("np"))
      .withColumn("auc_raw",
        expr("CASE WHEN np > 0 AND nn > 0 THEN" +
          " (CAST(drp AS DOUBLE) / 2 - CAST(np AS DOUBLE) * (np + 1) / 2)" +
          " / (CAST(np AS DOUBLE) * nn) END"))
      .select(col("n_users"), col("np").as("n_pos"), col("nn").as("n_neg"),
        round(col("auc_raw"), 6).as("auc"),
        expr("ROUND(2 * auc_raw - 1, 6)").as("gini"),
        expr("CASE WHEN np > 0 AND nn > 0 THEN" +
          " ROUND(CAST(ksm.ksn AS DOUBLE) / (CAST(np AS DOUBLE) * nn), 6)" +
          " END").as("ks"),
        expr("CASE WHEN np > 0 AND nn > 0 THEN ksm.x END").as("ks_at_cents"),
        expr("CASE WHEN auc_raw IS NULL THEN 'degenerate'" +
          " WHEN ROUND(auc_raw, 6) >= 0.7 THEN 'discriminates'" +
          " WHEN ROUND(auc_raw, 6) <= 0.3 THEN 'inverted'" +
          " ELSE 'weak' END").as("verdict"))
  }

  val q249Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |ext AS (
      |  SELECT MIN(day) + (MAX(day) - MIN(day) + 1) // 2 AS cut FROM ev),
      |per AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN day < (SELECT cut FROM ext) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS pre_n,
      |    CAST(SUM(CASE WHEN day < (SELECT cut FROM ext) THEN cents
      |      ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN day >= (SELECT cut FROM ext) THEN cents
      |      ELSE 0 END) AS BIGINT) AS y
      |  FROM ev GROUP BY 1),
      |kept AS (SELECT * FROM per WHERE pre_n > 0),
      |ranked AS (
      |  SELECT *, COUNT(*) OVER () AS cnt,
      |    ROW_NUMBER() OVER (ORDER BY y, user_id) AS ry
      |  FROM kept),
      |labd AS (
      |  SELECT *,
      |    CASE WHEN y > MAX(CASE WHEN ry = (cnt + 1) // 2 THEN y END)
      |      OVER () THEN 1 ELSE 0 END AS pos
      |  FROM ranked),
      |by_x AS (
      |  SELECT x, CAST(COUNT(*) AS BIGINT) AS m,
      |    CAST(SUM(pos) AS BIGINT) AS p
      |  FROM labd GROUP BY 1),
      |cum AS (
      |  SELECT *,
      |    SUM(p) OVER w AS cp, SUM(m) OVER w AS cm,
      |    SUM(m) OVER w - SUM(p) OVER w AS cn,
      |    (SUM(m) OVER w - m) * 2 + m + 1 AS dr
      |  FROM by_x
      |  WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING)),
      |tot AS (
      |  SELECT CAST(SUM(m) AS BIGINT) AS n_users,
      |    CAST(SUM(p) AS BIGINT) AS np,
      |    CAST(SUM(p * dr) AS BIGINT) AS drp
      |  FROM cum),
      |ks AS (
      |  SELECT t.n_users, t.np, t.drp,
      |    MAX((ABS(c.cp * (t.n_users - t.np) - c.cn * t.np), c.x)) AS ksm
      |  FROM cum c, tot t GROUP BY 1, 2, 3),
      |f AS (
      |  SELECT *, n_users - np AS nn,
      |    CASE WHEN np > 0 AND n_users - np > 0 THEN
      |      (CAST(drp AS DOUBLE) / 2 - CAST(np AS DOUBLE) * (np + 1) / 2)
      |      / (CAST(np AS DOUBLE) * (n_users - np)) END AS auc_raw
      |  FROM ks)
      |SELECT n_users, np AS n_pos, nn AS n_neg,
      |  ROUND(auc_raw, 6) AS auc,
      |  ROUND(2 * auc_raw - 1, 6) AS gini,
      |  CASE WHEN np > 0 AND nn > 0 THEN
      |    ROUND(CAST(ksm[1] AS DOUBLE) / (CAST(np AS DOUBLE) * nn), 6)
      |    END AS ks,
      |  CASE WHEN np > 0 AND nn > 0 THEN ksm[2] END AS ks_at_cents,
      |  CASE WHEN auc_raw IS NULL THEN 'degenerate'
      |    WHEN ROUND(auc_raw, 6) >= 0.7 THEN 'discriminates'
      |    WHEN ROUND(auc_raw, 6) <= 0.3 THEN 'inverted'
      |    ELSE 'weak' END AS verdict
      |FROM f""".stripMargin

  /** Q250 — Markov absorption probabilities of the purchase state
    * (Kemeny & Snell 1960's absorbing-chain read of Q209's transition
    * matrix): starting from each event type, what is the probability
    * the journey REACHES 'purchase' within 12 steps? The one number
    * that turns Q209's local transition table into a global journey
    * prognosis — and the gap between p_absorb12 and the one-step
    * P(s → purchase) is exactly the multi-hop value the chain model
    * adds. 'purchase' is made absorbing; the horizon-12 value iteration
    * a_{k+1}(s) = Σ_t P(s,t)·a_k(t) runs in PURE INTEGER fixed-point:
    * a is scaled by 10⁹ and each step is (Σ_t c(s,t)·A_k(t)) div n(s)
    * — exact int64 sums and one floor per state per step, so both
    * engines iterate IDENTICAL integers and the hash gate proves the
    * whole 12-round value iteration (the Q122/Q124 unrolled-iteration
    * discipline; the oracle replays it as a recursive CTE). Floor
    * error is ≤ 12·10⁻⁹ — invisible at the 6-decimal output round.
    *
    * Determinism: transition counts and row totals are exact int64
    * over the (ts, event_id) journey order; every iterate is exact
    * int64 by construction; the two emitted probabilities are single
    * divides rounded once. Dead-end states (padded zero self-loops
    * keep them in the state set) stay at exactly 0.
    *
    * Scale notes: one shuffle on user_id for the LAG, then the entire
    * iteration runs on the |types|² matrix — 12 joins over ≤ k² rows
    * regardless of corpus size (checkpointed every 4 rounds to bound
    * lineage). c·A products hold to int64 through ~10⁹-step corpora;
    * beyond that the accumulator widens to DECIMAL(38,0) (Q128
    * convention).
    */
  def q250(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val G = 1000000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val raw = c.events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).as("cnum"))
    val types = c.events.select(col("event_type")).distinct()
    // padded zero self-loops keep dead-end states in every iteration
    val steps2 = raw.unionByName(types
        .select(col("event_type").as("src"), col("event_type").as("dst"),
          lit(0L).as("cnum")))
      .groupBy(col("src"), col("dst")).agg(sum(col("cnum")).as("cnum"))
      .localCheckpoint()
    val rowTot = steps2.groupBy(col("src"))
      .agg(sum(col("cnum")).cast("long").as("n")).localCheckpoint()
    var a = types.select(col("event_type").as("s"),
      when(col("event_type") === "purchase", lit(G)).otherwise(lit(0L))
        .as("a"))
    for (i <- 1 to 12) {
      a = steps2.join(a, steps2("dst") === a("s"))
        .join(rowTot, Seq("src"))
        .groupBy(col("src"), col("n"))
        .agg(sum(col("cnum") * col("a")).cast("long").as("sa"),
          sum(col("cnum")).cast("long").as("sc"))
        .select(col("src").as("s"),
          when(col("src") === "purchase", lit(G))
            .when(col("sc") === 0L, lit(0L))
            .otherwise(expr("sa div n")).as("a"))
      if (i % 4 == 0) a = a.localCheckpoint()
    }
    val p1 = raw.filter(col("dst") === "purchase")
      .join(rowTot, Seq("src"))
      .select(col("src").as("s"),
        expr("ROUND(CAST(cnum AS DOUBLE) / n, 6)").as("p_one_step"))
    a.join(p1, Seq("s"), "left")
      .select(col("s").as("event_type"),
        expr("ROUND(CAST(a AS DOUBLE) / 1000000000, 6)").as("p_absorb12"),
        coalesce(col("p_one_step"), lit(0.0)).as("p_one_step"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q250Oracle: String =
    """WITH RECURSIVE raw AS (
      |  SELECT event_type AS src, nxt AS dst,
      |    CAST(COUNT(*) AS BIGINT) AS cnum
      |  FROM (
      |    SELECT event_type,
      |      LEAD(event_type, 1) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS nxt
      |    FROM events)
      |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |types AS (SELECT DISTINCT event_type FROM events),
      |steps2 AS (
      |  SELECT src, dst, CAST(SUM(cnum) AS BIGINT) AS cnum FROM (
      |    SELECT src, dst, cnum FROM raw
      |    UNION ALL
      |    SELECT event_type, event_type, 0 FROM types)
      |  GROUP BY 1, 2),
      |row_tot AS (
      |  SELECT src, CAST(SUM(cnum) AS BIGINT) AS n FROM steps2 GROUP BY 1),
      |dp AS (
      |  SELECT 0 AS k, event_type AS s,
      |    CASE WHEN event_type = 'purchase'
      |      THEN CAST(1000000000 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS a
      |  FROM types
      |  UNION ALL
      |  SELECT d.k + 1, st.src,
      |    CASE WHEN st.src = 'purchase' THEN CAST(1000000000 AS BIGINT)
      |      WHEN SUM(st.cnum) = 0 THEN CAST(0 AS BIGINT)
      |      ELSE CAST(SUM(st.cnum * d.a) // rt.n AS BIGINT) END
      |  FROM dp d
      |  JOIN steps2 st ON st.dst = d.s
      |  JOIN row_tot rt ON rt.src = st.src
      |  WHERE d.k < 12
      |  GROUP BY d.k, st.src, rt.n),
      |p1 AS (
      |  SELECT r.src AS s, ROUND(CAST(r.cnum AS DOUBLE) / t.n, 6) AS p1
      |  FROM raw r JOIN row_tot t ON t.src = r.src
      |  WHERE r.dst = 'purchase')
      |SELECT d.s AS event_type,
      |  ROUND(CAST(d.a AS DOUBLE) / 1000000000, 6) AS p_absorb12,
      |  COALESCE(p1.p1, 0.0) AS p_one_step
      |FROM dp d LEFT JOIN p1 ON p1.s = d.s
      |WHERE d.k = 12
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Shared-text closed-form 2-regressor OLS pieces for Q298: the
    * restricted (own-lag) and full (own-lag + cause-lag) residual sums
    * of squares, assembled from the m-scaled exact-int64 centered
    * moments M·· = m·S·· − S·S·· — identical text in both engines.
    */
  private val q298Dd =
    "CAST(m11 AS DOUBLE) * m22 - CAST(m12 AS DOUBLE) * m12"
  private val q298RssR =
    "CAST(myy AS DOUBLE) - CAST(m1y AS DOUBLE) * m1y / m11"
  private val q298B1 =
    "(CAST(m1y AS DOUBLE) * m22 - CAST(m2y AS DOUBLE) * m12) / dd"
  private val q298B2 =
    "(CAST(m2y AS DOUBLE) * m11 - CAST(m1y AS DOUBLE) * m12) / dd"
  private val q298RssF =
    "CAST(myy AS DOUBLE) - b1 * m1y - b2 * m2y"

  /** Q298 — Granger-style lead–lag predictivity screen between event
    * types (Granger 1969) on the zero-filled daily cents grid: for
    * every ORDERED pair (cause → effect), does yesterday's CAUSE
    * revenue improve the prediction of today's EFFECT revenue beyond
    * the effect's own yesterday? Restricted model y_t ~ y_{t−1} vs
    * full model y_t ~ y_{t−1} + x_{t−1}, both solved in closed form
    * from exact moments; F = (RSS_r − RSS_f)·(m−3)/RSS_f with 1 and
    * m−3 df. The DIRECTED sibling of Q216's symmetric lead–lag
    * cross-correlation — correlation says the series co-move, this
    * says whose past adds information about whose future.
    *
    * Determinism: the linear moments are exact int64 sums; product
    * moments and the centered M·· = m·S·· − S·S· are exact
    * DECIMAL(38,0)/HUGEINT (r12: a single x² of an sf10-scale day tops
    * 2⁶³); every float after that (determinant, betas, RSSs, F) is one
    * of the shared-text expressions above — identical IEEE evaluation in
    * both engines — and beta/F are rounded once at emit. Verdicts
    * compare the ROUNDED F against the declared 4.22 cut (the
    * F(1,26) 5% point for this registry's 30-day spine; χ²₁ 3.84
    * asymptotically).
    *
    * Scale notes: the pair relation is (types² × spine) — bounded by
    * the vocabulary, not the corpus (the grouped-bounded-series
    * contract); one corpus scan feeds the daily aggregate, everything
    * after is broadcast-sized. Moment magnitudes: m·S11 ~ m²·v̄²
    * stays inside int64 to ~10⁸ cents/day on a 30-day spine (~10⁶
    * dollars/day); past that the identical plan carries DECIMAL(38,0)
    * (the Q267 margin class).
    */
  def q298(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = Stats.dailyCentsGrid(spark, c)
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val eff = grid.withColumn("x1", lag(col("v"), 1).over(w))
      .filter(col("x1").isNotNull)
      .select(col("event_type").as("effect"), col("day"),
        col("v").as("y"), col("x1"))
    val cse = grid.select(col("event_type").as("cause"),
      (col("day") + 1).as("day"), col("v").as("x2"))
    val sums = eff.join(cse, Seq("day"))
      .filter(col("cause") =!= col("effect"))
      .groupBy(col("cause"), col("effect"))
      // product moments + centered M·· in DECIMAL(38,0)/HUGEINT (r12
      // sf10 sweep: a single x² of a 3·10⁹-cent day tops 2⁶³ and the
      // int64 form threw under ANSI); every downstream float already
      // CASTs to DOUBLE, so the shared expression texts are unchanged.
      .agg(count(lit(1)).cast("long").as("m"),
        sum(col("y")).as("sy"), sum(col("x1")).as("s1"),
        sum(col("x2")).as("s2"),
        sum(col("x1").cast("decimal(38,0)") * col("x1")).as("s11"),
        sum(col("x2").cast("decimal(38,0)") * col("x2")).as("s22"),
        sum(col("x1").cast("decimal(38,0)") * col("x2")).as("s12"),
        sum(col("x1").cast("decimal(38,0)") * col("y")).as("s1y"),
        sum(col("x2").cast("decimal(38,0)") * col("y")).as("s2y"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
    sums
      .withColumn("m11", expr("CAST(m AS DECIMAL(38,0)) * s11 - CAST(s1 AS DECIMAL(38,0)) * s1"))
      .withColumn("m22", expr("CAST(m AS DECIMAL(38,0)) * s22 - CAST(s2 AS DECIMAL(38,0)) * s2"))
      .withColumn("m12", expr("CAST(m AS DECIMAL(38,0)) * s12 - CAST(s1 AS DECIMAL(38,0)) * s2"))
      .withColumn("m1y", expr("CAST(m AS DECIMAL(38,0)) * s1y - CAST(s1 AS DECIMAL(38,0)) * sy"))
      .withColumn("m2y", expr("CAST(m AS DECIMAL(38,0)) * s2y - CAST(s2 AS DECIMAL(38,0)) * sy"))
      .withColumn("myy", expr("CAST(m AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .withColumn("dd", expr(q298Dd))
      .withColumn("rss_r",
        expr(s"CASE WHEN m11 > 0 THEN $q298RssR END"))
      .withColumn("b1", expr(s"CASE WHEN dd <> 0 THEN $q298B1 END"))
      .withColumn("b2", expr(s"CASE WHEN dd <> 0 THEN $q298B2 END"))
      .withColumn("rss_f",
        expr(s"CASE WHEN dd <> 0 THEN $q298RssF END"))
      .withColumn("f_stat", expr(
        "CASE WHEN rss_f > 0 AND m > 3 THEN " +
          "ROUND((rss_r - rss_f) * (m - 3) / rss_f, 4) END"))
      .select(col("cause"), col("effect"), col("m").as("n"),
        round(col("b2"), 6).as("beta_cause"), col("f_stat"),
        when(col("rss_r").isNull || col("b2").isNull, "degenerate")
          .when(col("f_stat").isNull, "saturated")
          .when(col("f_stat") >= 4.22, "granger_signal")
          .otherwise("none").as("verdict"))
      .orderBy(asc_nulls_first("cause"), asc_nulls_first("effect"))
  }

  val q298Oracle: String =
    s"""WITH ${graft.operators.Stats.gridSql},
       |lagged AS (
       |  SELECT event_type, day, v,
       |    LAG(v) OVER (PARTITION BY event_type ORDER BY day) AS x1
       |  FROM grid),
       |eff AS (
       |  SELECT event_type AS effect, day, v AS y, x1
       |  FROM lagged WHERE x1 IS NOT NULL),
       |cse AS (SELECT event_type AS cause, day + 1 AS day, v AS x2 FROM grid),
       |sums AS (
       |  SELECT c.cause, e.effect, CAST(COUNT(*) AS BIGINT) AS m,
       |    CAST(SUM(e.y) AS BIGINT) AS sy, CAST(SUM(e.x1) AS BIGINT) AS s1,
       |    CAST(SUM(c.x2) AS BIGINT) AS s2,
       |    CAST(SUM(CAST(e.x1 AS HUGEINT) * e.x1) AS HUGEINT) AS s11,
       |    CAST(SUM(CAST(c.x2 AS HUGEINT) * c.x2) AS HUGEINT) AS s22,
       |    CAST(SUM(CAST(e.x1 AS HUGEINT) * c.x2) AS HUGEINT) AS s12,
       |    CAST(SUM(CAST(e.x1 AS HUGEINT) * e.y) AS HUGEINT) AS s1y,
       |    CAST(SUM(CAST(c.x2 AS HUGEINT) * e.y) AS HUGEINT) AS s2y,
       |    CAST(SUM(CAST(e.y AS HUGEINT) * e.y) AS HUGEINT) AS syy
       |  FROM eff e JOIN cse c ON c.day = e.day AND c.cause <> e.effect
       |  GROUP BY 1, 2),
       |cen AS (
       |  SELECT cause, effect, m,
       |    CAST(m AS HUGEINT) * s11 - CAST(s1 AS HUGEINT) * s1 AS m11,
       |    CAST(m AS HUGEINT) * s22 - CAST(s2 AS HUGEINT) * s2 AS m22,
       |    CAST(m AS HUGEINT) * s12 - CAST(s1 AS HUGEINT) * s2 AS m12,
       |    CAST(m AS HUGEINT) * s1y - CAST(s1 AS HUGEINT) * sy AS m1y,
       |    CAST(m AS HUGEINT) * s2y - CAST(s2 AS HUGEINT) * sy AS m2y,
       |    CAST(m AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS myy
       |  FROM sums),
       |dets AS (SELECT *, $q298Dd AS dd FROM cen),
       |fits AS (
       |  SELECT *,
       |    CASE WHEN m11 > 0 THEN $q298RssR END AS rss_r,
       |    CASE WHEN dd <> 0 THEN $q298B1 END AS b1,
       |    CASE WHEN dd <> 0 THEN $q298B2 END AS b2
       |  FROM dets),
       |full_ AS (
       |  SELECT *, CASE WHEN dd <> 0 THEN $q298RssF END AS rss_f
       |  FROM fits),
       |fs AS (
       |  SELECT *, CASE WHEN rss_f > 0 AND m > 3 THEN
       |    ROUND((rss_r - rss_f) * (m - 3) / rss_f, 4) END AS f_stat
       |  FROM full_)
       |SELECT cause, effect, m AS n, ROUND(b2, 6) AS beta_cause, f_stat,
       |  CASE WHEN rss_r IS NULL OR b2 IS NULL THEN 'degenerate'
       |    WHEN f_stat IS NULL THEN 'saturated'
       |    WHEN f_stat >= 4.22 THEN 'granger_signal'
       |    ELSE 'none' END AS verdict
       |FROM fs
       |ORDER BY cause NULLS FIRST, effect NULLS FIRST""".stripMargin

  /** Q305 — second-order Markov memory test on user event journeys:
    * trigram transitions (s1, s2) → s3 over each user's (ts, event_id)-
    * ordered stream, with the lift of the second-order conditional over
    * the first-order one — p(s3|s1,s2) / p(s3|s2), both estimated on
    * the SAME trigram-position population so the ratio is a pure
    * memory signal. Lift ≈ 1 everywhere says Q209's first-order chain
    * is a sufficient journey model; a persistent ≥1.2/≤0.8 band says
    * journeys carry second-order structure the first-order model (and
    * anything trained on it) misses. Top-20 trigrams by support.
    *
    * Determinism: trigram/bigram/unigram counts are exact int64 over
    * the fully tie-broken per-user order; the conditional is one
    * divide; the lift is ONE fixed expression over four exact int64
    * counts (products ≤ 10⁸ at fixture scale, exact in the double);
    * verdicts compare the ROUNDED lift.
    *
    * Scale notes: two LAG windows over the user-keyed stream (the
    * same shuffle Q209 pays), then three vocabulary-bounded aggregates
    * (|types|³ at most). Count products cap int64-exactness in the
    * double around 10¹⁵ trigram instances — beyond any real corpus;
    * TakeOrdered bounds the output.
    */
  def q305(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tri = c.events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("s3"))
      .withColumn("s2", lag(col("s3"), 1).over(w))
      .withColumn("s1", lag(col("s3"), 2).over(w))
      .filter(col("s1").isNotNull)
      .select(col("s1"), col("s2"), col("s3"))
      .localCheckpoint()
    val c123 = tri.groupBy(col("s1"), col("s2"), col("s3"))
      .agg(count(lit(1)).cast("long").as("c123"))
    val c12 = tri.groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).cast("long").as("c12"))
    val c23 = tri.groupBy(col("s2"), col("s3"))
      .agg(count(lit(1)).cast("long").as("c23"))
    val c2 = tri.groupBy(col("s2"))
      .agg(count(lit(1)).cast("long").as("c2"))
    c123.join(c12, Seq("s1", "s2")).join(c23, Seq("s2", "s3"))
      .join(c2, Seq("s2"))
      .select(col("s1"), col("s2"), col("s3"), col("c123"),
        expr("ROUND(CAST(c123 AS DOUBLE) / c12, 6)").as("p_cond2"),
        expr("ROUND(CAST(c123 AS DOUBLE) * c2" +
          " / (CAST(c12 AS DOUBLE) * c23), 4)").as("lift"))
      .withColumn("verdict", expr(
        "CASE WHEN lift >= 1.2 OR lift <= 0.8 THEN 'second_order_memory' " +
          "ELSE 'markov1_ok' END"))
      .orderBy(desc("c123"), asc("s1"), asc("s2"), asc("s3"))
      .limit(20)
  }

  val q305Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type AS s3,
      |    LAG(event_type, 1) OVER w AS s2,
      |    LAG(event_type, 2) OVER w AS s1
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |tri AS (SELECT s1, s2, s3 FROM ev WHERE s1 IS NOT NULL),
      |c123 AS (SELECT s1, s2, s3, CAST(COUNT(*) AS BIGINT) AS c123
      |         FROM tri GROUP BY 1, 2, 3),
      |c12 AS (SELECT s1, s2, CAST(COUNT(*) AS BIGINT) AS c12
      |        FROM tri GROUP BY 1, 2),
      |c23 AS (SELECT s2, s3, CAST(COUNT(*) AS BIGINT) AS c23
      |        FROM tri GROUP BY 1, 2),
      |c2 AS (SELECT s2, CAST(COUNT(*) AS BIGINT) AS c2
      |       FROM tri GROUP BY 1)
      |SELECT t.s1, t.s2, t.s3, t.c123,
      |  ROUND(CAST(t.c123 AS DOUBLE) / b.c12, 6) AS p_cond2,
      |  ROUND(CAST(t.c123 AS DOUBLE) * u.c2
      |    / (CAST(b.c12 AS DOUBLE) * f.c23), 4) AS lift,
      |  CASE WHEN ROUND(CAST(t.c123 AS DOUBLE) * u.c2
      |      / (CAST(b.c12 AS DOUBLE) * f.c23), 4) >= 1.2
      |    OR ROUND(CAST(t.c123 AS DOUBLE) * u.c2
      |      / (CAST(b.c12 AS DOUBLE) * f.c23), 4) <= 0.8
      |    THEN 'second_order_memory' ELSE 'markov1_ok' END AS verdict
      |FROM c123 t
      |JOIN c12 b ON b.s1 = t.s1 AND b.s2 = t.s2
      |JOIN c23 f ON f.s2 = t.s2 AND f.s3 = t.s3
      |JOIN c2 u ON u.s2 = t.s2
      |ORDER BY t.c123 DESC, t.s1, t.s2, t.s3
      |LIMIT 20""".stripMargin

  /** Q318 — directional flow-asymmetry audit of the user-journey graph:
    * for every unordered event-type pair {a, b}, compare the a→b step
    * count against b→a with the exact sign test's normal statistic
    * z = (n_fwd − n_bwd)/√(n_fwd + n_bwd) (Dixon & Mood 1946; under
    * directionless flow n_fwd ~ Binomial(m, ½)). Q209 gives the
    * CONDITIONAL next-step table and Q298 the daily-series lead–lag —
    * this is the step-granular directionality readout: which
    * transitions are one-way streets (funnels) vs ping-pong loops.
    * Self-loops are excluded; only pairs with ≥ 1 step appear.
    *
    * Determinism: step counts are exact int64 from one LAG pass;
    * asymmetry and z are single-divide float shapes (rounded 6/4) and
    * the verdict reads the rounded z.
    *
    * Scale notes: one window over the per-user order (single shuffle
    * on user_id), then a hash aggregate onto ≤ |types|² keys — the
    * Q209 plan with a second bounded fold on LEAST/GREATEST; nothing
    * data-proportional after the first aggregate.
    */
  def q318(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = c.events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col("event_type"))
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    steps
      .groupBy(least(col("src"), col("dst")).as("type_a"),
        greatest(col("src"), col("dst")).as("type_b"))
      .agg(sum(when(col("src") < col("dst"), col("n")).otherwise(0L))
          .as("n_fwd"),
        sum(when(col("src") > col("dst"), col("n")).otherwise(0L))
          .as("n_bwd"))
      .withColumn("n_steps", col("n_fwd") + col("n_bwd"))
      .select(col("type_a"), col("type_b"), col("n_fwd"), col("n_bwd"),
        col("n_steps"),
        expr("ROUND(CAST(n_fwd - n_bwd AS DOUBLE) / n_steps, 6)")
          .as("asymmetry"),
        expr("ROUND(CAST(n_fwd - n_bwd AS DOUBLE) / " +
          "SQRT(CAST(n_steps AS DOUBLE)), 4)").as("z"))
      .withColumn("verdict", expr("CASE WHEN z >= 1.96 THEN 'forward' " +
        "WHEN z <= -1.96 THEN 'backward' ELSE 'balanced' END"))
      .orderBy(asc_nulls_first("type_a"), asc_nulls_first("type_b"))
  }

  val q318Oracle: String =
    """WITH steps AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS src
      |  FROM events),
      |dirs AS (
      |  SELECT src, event_type AS dst, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM steps WHERE src IS NOT NULL AND src <> event_type
      |  GROUP BY 1, 2),
      |folded AS (
      |  SELECT LEAST(src, dst) AS type_a, GREATEST(src, dst) AS type_b,
      |    CAST(SUM(CASE WHEN src < dst THEN n ELSE 0 END) AS BIGINT)
      |      AS n_fwd,
      |    CAST(SUM(CASE WHEN src > dst THEN n ELSE 0 END) AS BIGINT)
      |      AS n_bwd
      |  FROM dirs GROUP BY 1, 2),
      |out AS (
      |  SELECT type_a, type_b, n_fwd, n_bwd, n_fwd + n_bwd AS n_steps,
      |    ROUND(CAST(n_fwd - n_bwd AS DOUBLE) / (n_fwd + n_bwd), 6)
      |      AS asymmetry,
      |    ROUND(CAST(n_fwd - n_bwd AS DOUBLE) /
      |      SQRT(CAST(n_fwd + n_bwd AS DOUBLE)), 4) AS z
      |  FROM folded)
      |SELECT type_a, type_b, n_fwd, n_bwd, n_steps, asymmetry, z,
      |  CASE WHEN z >= 1.96 THEN 'forward'
      |    WHEN z <= -1.96 THEN 'backward'
      |    ELSE 'balanced' END AS verdict
      |FROM out
      |ORDER BY type_a NULLS FIRST, type_b NULLS FIRST""".stripMargin

  /** Q328 — Theil-T inequality decomposition of (user, event-type)
    * spend cells BY event type (Theil 1967; Shorrocks 1980 on the
    * decomposable class): T = T_between + Σ_g s_g·T_within,g — the
    * property Q213's Gini famously LACKS. Emits, per type, its
    * within-group Theil, its share-weighted contribution and its
    * between-group term, so "is spend inequality driven by gaps
    * BETWEEN activity types or by whales WITHIN a type?" is one read
    * of the output; the spec pins the decomposition identity itself.
    *
    * Determinism: cell totals, group sums and every verdict compare
    * (rev·N vs n_g·S, exact int64) are exact; the only floats are
    * Σ x·ln x sums (ln of exact ints — engine sum-order drift ~1e-13,
    * inside round 6) and the fixed ln-ratio shapes rounded once.
    *
    * Scale notes: one aggregate to (type, user) cells (map-side
    * combined on the natural key), one to k group rows, broadcast
    * totals — no window, no join beyond the k-row crossJoin. rev·N
    * stays int64 to ~10¹⁵ total cents · 10³ cells-scale; the ratio
    * forms cast first beyond that (documented).
    */
  def q328(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val cells = c.events
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("cents")).as("x"))
      .filter(col("x") > 0)
    val perG = cells.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_cells"), sum(col("x")).as("rev"),
        sum(col("x").cast("double") * log(col("x").cast("double")))
          .as("sxlx"))
    val tot = perG.agg(sum(col("n_cells")).as("nn"),
      sum(col("rev")).as("ss"))
    perG.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_cells"),
        col("rev").as("revenue_cents"),
        expr("ROUND(CAST(rev AS DOUBLE) / ss, 6)").as("revenue_share"),
        expr("ROUND(CAST(rev AS DOUBLE) / n_cells, 4)").as("mean_cents"),
        expr("ROUND(sxlx / rev - LN(CAST(rev AS DOUBLE) / n_cells), 6)")
          .as("theil_within"),
        expr("ROUND((CAST(rev AS DOUBLE) / ss) * (sxlx / rev - " +
          "LN(CAST(rev AS DOUBLE) / n_cells)), 6)").as("contribution"),
        expr("ROUND((CAST(rev AS DOUBLE) / ss) * " +
          "LN(CAST(rev AS DOUBLE) * nn / (CAST(n_cells AS DOUBLE) * ss))" +
          ", 6)").as("between_term"),
        expr("CASE WHEN rev * nn > n_cells * ss THEN 'above_mean' " +
          "WHEN rev * nn < n_cells * ss THEN 'below_mean' " +
          "ELSE 'at_mean' END").as("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q328Oracle: String =
    """WITH cells AS (
      |  SELECT event_type, user_id,
      |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2
      |  HAVING SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) > 0),
      |perg AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cells,
      |    CAST(SUM(x) AS BIGINT) AS rev,
      |    SUM(CAST(x AS DOUBLE) * LN(CAST(x AS DOUBLE))) AS sxlx
      |  FROM cells GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(n_cells) AS BIGINT) AS nn,
      |    CAST(SUM(rev) AS BIGINT) AS ss
      |  FROM perg)
      |SELECT p.event_type, p.n_cells, p.rev AS revenue_cents,
      |  ROUND(CAST(p.rev AS DOUBLE) / t.ss, 6) AS revenue_share,
      |  ROUND(CAST(p.rev AS DOUBLE) / p.n_cells, 4) AS mean_cents,
      |  ROUND(p.sxlx / p.rev - LN(CAST(p.rev AS DOUBLE) / p.n_cells), 6)
      |    AS theil_within,
      |  ROUND((CAST(p.rev AS DOUBLE) / t.ss) * (p.sxlx / p.rev -
      |    LN(CAST(p.rev AS DOUBLE) / p.n_cells)), 6) AS contribution,
      |  ROUND((CAST(p.rev AS DOUBLE) / t.ss) *
      |    LN(CAST(p.rev AS DOUBLE) * t.nn / (CAST(p.n_cells AS DOUBLE)
      |    * t.ss)), 6) AS between_term,
      |  CASE WHEN p.rev * t.nn > p.n_cells * t.ss THEN 'above_mean'
      |    WHEN p.rev * t.nn < p.n_cells * t.ss THEN 'below_mean'
      |    ELSE 'at_mean' END AS verdict
      |FROM perg p, tot t
      |ORDER BY p.event_type NULLS FIRST""".stripMargin

  /** Q331 — Lorenz decile table of total user spend (Lorenz 1905): the
    * curve behind Q213's Gini scalar and Q328's Theil — users ranked by
    * lifetime spend ascending, bucketed into exact tenths, each
    * decile's revenue and cumulative revenue share. This is the
    * operational shape: "the bottom half holds 28% of spend, the top
    * decile 23%" — numbers a concentration INDEX can't give back.
    *
    * Determinism: spend and rank are exact int64 ((spend, user_id)
    * total order); the decile bucket is pure integer arithmetic
    * ((rank−1)·10 DIV n + 1 — NOT ntile, whose remainder placement
    * convention we'd have to trust to match); shares are single-divide
    * floats rounded 6; the verdict compares exact cross-products
    * (rev_d·n vs total·n_d — is the decile above or below uniform?).
    *
    * Scale notes: one aggregate to per-user spend (map-side combined),
    * one rank window over that relation and a 10-key rollup. The rank
    * window is the gate's declared single-pass form; at warehouse
    * user counts it becomes the two-pass range-partitioned rank (the
    * Q327 note), identical semantics.
    */
  def q331(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val spend = c.events
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(sum(col("cents")).as("x"))
    val w = Window.orderBy(asc("x"), asc("user_id"))
    val tot = spend.agg(count(lit(1)).as("n_users"),
      sum(col("x")).as("total"))
    val deciled = spend
      .withColumn("rnk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("decile", expr("(rnk - 1) * 10 DIV n_users + 1"))
    val wCum = Window.orderBy(asc("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciled.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users_d"), sum(col("x")).as("decile_cents"),
        max(col("n_users")).as("n_users"), max(col("total")).as("total"))
      .withColumn("cum_cents", sum(col("decile_cents")).over(wCum))
      .select(col("decile"), col("n_users_d"), col("decile_cents"),
        expr("ROUND(CAST(decile_cents AS DOUBLE) / total, 6)")
          .as("revenue_share"),
        expr("ROUND(CAST(cum_cents AS DOUBLE) / total, 6)")
          .as("cum_share"),
        expr("CASE WHEN decile_cents * n_users > total * n_users_d " +
          "THEN 'above_uniform' WHEN decile_cents * n_users < " +
          "total * n_users_d THEN 'below_uniform' " +
          "ELSE 'uniform' END").as("verdict"))
      .orderBy(asc("decile"))
  }

  val q331Oracle: String =
    """WITH spend AS (
      |  SELECT user_id,
      |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |tot AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(x) AS BIGINT) AS total
      |  FROM spend),
      |deciled AS (
      |  SELECT s.x, t.n_users, t.total,
      |    (CAST(ROW_NUMBER() OVER (ORDER BY s.x, s.user_id) AS BIGINT)
      |      - 1) * 10 // t.n_users + 1 AS decile
      |  FROM spend s, tot t),
      |rolled AS (
      |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users_d,
      |    CAST(SUM(x) AS BIGINT) AS decile_cents,
      |    CAST(MAX(n_users) AS BIGINT) AS n_users,
      |    CAST(MAX(total) AS BIGINT) AS total
      |  FROM deciled GROUP BY 1)
      |SELECT decile, n_users_d, decile_cents,
      |  ROUND(CAST(decile_cents AS DOUBLE) / total, 6) AS revenue_share,
      |  ROUND(CAST(CAST(SUM(decile_cents) OVER (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS DOUBLE) / total, 6) AS cum_share,
      |  CASE WHEN decile_cents * n_users > total * n_users_d
      |    THEN 'above_uniform'
      |    WHEN decile_cents * n_users < total * n_users_d
      |    THEN 'below_uniform'
      |    ELSE 'uniform' END AS verdict
      |FROM rolled
      |ORDER BY decile""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q305" -> (q305 _), "Q318" -> (q318 _), "Q328" -> (q328 _),
    "Q331" -> (q331 _),
    "Q209" -> (q209 _), "Q211" -> (q211 _),
    "Q212" -> (q212 _), "Q213" -> (q213 _), "Q216" -> (q216 _),
    "Q217" -> (q217 _), "Q220" -> (q220 _), "Q221" -> (q221 _),
    "Q224" -> (q224 _), "Q247" -> (q247 _),
    "Q249" -> (q249 _), "Q250" -> (q250 _), "Q261" -> (q261 _),
    "Q271" -> (q271 _), "Q298" -> (q298 _))

  def oracles: Map[String, String] = Map(
    "Q305" -> q305Oracle, "Q318" -> q318Oracle, "Q328" -> q328Oracle,
    "Q331" -> q331Oracle,
    "Q209" -> q209Oracle, "Q211" -> q211Oracle,
    "Q212" -> q212Oracle, "Q213" -> q213Oracle, "Q216" -> q216Oracle,
    "Q217" -> q217Oracle, "Q220" -> q220Oracle, "Q221" -> q221Oracle,
    "Q224" -> q224Oracle, "Q247" -> q247Oracle,
    "Q249" -> q249Oracle, "Q250" -> q250Oracle, "Q261" -> q261Oracle,
    "Q271" -> q271Oracle, "Q298" -> q298Oracle)

  /** Q271 — Croston's method + SBA for INTERMITTENT demand per user
    * (Croston 1972; Syntetos & Boylan 2005): per-user daily purchase
    * cents are mostly-zero series where ordinary smoothing (Q100/Q123)
    * systematically lags — Croston smooths demand SIZES and
    * inter-demand INTERVALS separately and forecasts their ratio; SBA
    * applies the (1 − α/2) bias correction. With the dyadic α = 1/2
    * (the Q100 discipline), both EWMAs are EXACT integer ratios:
    * 2^{K−1}·ŝ = z₁ + Σ_{k≥2} z_k·2^{k−2} and the interval EWMA
    * scales by 2^{K−2}, so the Croston forecast collapses to ONE exact
    * divide ŝ/p̂ = S/(2P) — no float recursion anywhere. Each user also
    * gets the Syntetos–Boylan–Croston demand-class quadrant from the
    * exact mean interval (≥ 1.32) and size CV² (≥ 0.49) fences,
    * decided on integer cross-products.
    *
    * Determinism: demand points index by day order (exact), weights
    * are powers of two, the class fences compare integer
    * cross-products, and only the two reported forecasts divide,
    * rounded 4. The EWMA recursion is CAPPED at the last 40 demand
    * points per user (both engine texts identically): with α = 1/2
    * the dropped weights are < 2⁻³⁸ ≈ 4·10⁻¹² of the total — below
    * the round-4 resolution — and the cap bounds the largest shift at
    * 2³⁸. The exactness envelope is now ENFORCED, not just documented
    * (the Q252 loud-degradation discipline): a user with any demand
    * z > 2²⁴−1 cents/day (the 40-term numerator Σ z·2^k ≤ z·2³⁹ bound)
    * or any interval p > 2²⁵−1 days gets NULL s_num/p_num/forecasts
    * and demand_class = 'overflow_guard' — the capped branch fires
    * BEFORE the shift multiply in both engine texts, so neither engine
    * ever evaluates a wrapping (Spark, silent) or erroring (DuckDB,
    * loud) product. z ≤ 2²⁴ also keeps z_sq exact to ~2¹⁰ demand days
    * per user (a multi-century spine).
    *
    * Scale notes: one corpus scan to per-(user, day) demand, one
    * user-keyed window for indices/intervals, one aggregate. At 10⁹
    * users this is the standard grouped-series topology; the cap
    * bounds per-user state regardless of spine length.
    */
  def q271(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val demand = c.events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("cents")).cast("long").as("z"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val idx = demand
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("n_all",
        count(lit(1)).over(Window.partitionBy(col("user_id"))).cast("long"))
      // EWMA depth cap: re-index so ke = 1 is the 40th-from-last demand
      // point; rows with ke < 1 drop out of the EWMA numerators (their
      // α=1/2 weights are < 2⁻³⁸) but still count in kd/z_sum/z_sq/span.
      .withColumn("ke", col("k") - greatest(col("n_all") - lit(40L), lit(0L)))
      .withColumn("p", (col("day") - lag(col("day"), 1).over(w)).cast("long"))
    // Exactness-envelope caps: the 40-term α=1/2 numerator is ≤ z·2³⁹
    // (p·2³⁸), so z ≤ 2²⁴−1 / p ≤ 2²⁵−1 keep it inside int64. The cap
    // branch fires FIRST so the shift multiply is never evaluated on an
    // over-cap row in either engine.
    val zCap = 16777215L
    val pCap = 33554431L
    val agg = idx.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("kd"),
        sum(when(col("z") > zCap, lit(0L))
          .when(col("ke") === 1, col("z"))
          .when(col("ke") > 1,
            col("z") * expr("shiftleft(CAST(1 AS BIGINT), CAST(ke - 2 AS INT))")))
          .cast("long").as("s_raw"),
        sum(when(col("p") > pCap, lit(0L))
          .when(col("ke") === 2, col("p"))
          .when(col("ke") > 2,
            col("p") * expr("shiftleft(CAST(1 AS BIGINT), CAST(ke - 3 AS INT))")))
          .cast("long").as("p_raw"),
        sum(when(col("z") > zCap ||
            (col("p").isNotNull && col("p") > pCap), 1L).otherwise(0L))
          .cast("long").as("n_over"),
        sum(when(col("z") > zCap, lit(0L)).otherwise(col("z")))
          .cast("long").as("z_sum"),
        sum(when(col("z") > zCap, lit(0L)).otherwise(col("z") * col("z")))
          .cast("long").as("z_sq"),
        (max(col("day")) - min(col("day"))).cast("long").as("span"))
    agg.filter(col("kd") >= 2)
      .withColumn("s_num",
        when(col("n_over") === 0, col("s_raw")))
      .withColumn("p_num",
        when(col("n_over") === 0, col("p_raw")))
      .withColumn("croston_cents",
        expr("ROUND(CAST(s_num AS DOUBLE) / (2 * p_num), 4)"))
      .withColumn("sba_cents",
        expr("ROUND(CAST(3 * s_num AS DOUBLE) / (8 * p_num), 4)"))
      .withColumn("mean_interval",
        round(col("span").cast("double") / (col("kd") - 1), 4))
      // SBC fences on integer cross-products: mean interval ≥ 1.32 ⇔
      // 100·span ≥ 132·(kd−1); CV² ≥ 0.49 ⇔ 100·kd·(kd·z_sq − z_sum²)
      // ≥ 49·kd... CV² = (kd·z_sq − z_sum²)/z_sum², fence ⇔
      // 100·(kd·z_sq − z_sum²) ≥ 49·z_sum².
      .withColumn("intermittent",
        lit(100L) * col("span") >= lit(132L) * (col("kd") - 1))
      .withColumn("erratic",
        lit(100L) * (col("kd") * col("z_sq") - col("z_sum") * col("z_sum")) >=
          lit(49L) * col("z_sum") * col("z_sum"))
      .withColumn("demand_class",
        when(col("n_over") > 0, "overflow_guard")
          .when(col("intermittent") && col("erratic"), "lumpy")
          .when(col("intermittent"), "intermittent")
          .when(col("erratic"), "erratic")
          .otherwise("smooth"))
      .select(col("user_id"), col("kd").as("n_demands"),
        col("s_num"), col("p_num"), col("croston_cents"), col("sba_cents"),
        col("mean_interval"), col("demand_class"))
      .orderBy(asc_nulls_first("user_id"))
  }

  val q271Oracle: String =
    """WITH demand AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS z
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY 1, 2),
      |idx AS (
      |  SELECT user_id, day, z,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT)
      |      - GREATEST(CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
      |          - 40, 0) AS ke,
      |    CAST(day - LAG(day) OVER w AS BIGINT) AS p
      |  FROM demand
      |  WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      |agg AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS kd,
      |    CAST(SUM(CASE WHEN z > 16777215 THEN 0
      |      WHEN ke = 1 THEN z
      |      WHEN ke > 1 THEN z * (1::BIGINT << (ke - 2)::INT) END)
      |      AS BIGINT) AS s_raw,
      |    CAST(SUM(CASE WHEN p > 33554431 THEN 0
      |      WHEN ke = 2 THEN p
      |      WHEN ke > 2 THEN p * (1::BIGINT << (ke - 3)::INT) END)
      |      AS BIGINT) AS p_raw,
      |    CAST(SUM(CASE WHEN z > 16777215
      |      OR (p IS NOT NULL AND p > 33554431) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_over,
      |    CAST(SUM(CASE WHEN z > 16777215 THEN 0 ELSE z END)
      |      AS BIGINT) AS z_sum,
      |    CAST(SUM(CASE WHEN z > 16777215 THEN 0 ELSE z * z END)
      |      AS BIGINT) AS z_sq,
      |    CAST(MAX(day) - MIN(day) AS BIGINT) AS span
      |  FROM idx GROUP BY 1),
      |guarded AS (
      |  SELECT user_id, kd, n_over, z_sum, z_sq, span,
      |    CASE WHEN n_over = 0 THEN s_raw END AS s_num,
      |    CASE WHEN n_over = 0 THEN p_raw END AS p_num
      |  FROM agg)
      |SELECT user_id, kd AS n_demands, s_num, p_num,
      |  ROUND(CAST(s_num AS DOUBLE) / (2 * p_num), 4) AS croston_cents,
      |  ROUND(CAST(3 * s_num AS DOUBLE) / (8 * p_num), 4) AS sba_cents,
      |  ROUND(CAST(span AS DOUBLE) / (kd - 1), 4) AS mean_interval,
      |  CASE
      |    WHEN n_over > 0 THEN 'overflow_guard'
      |    WHEN 100 * span >= 132 * (kd - 1)
      |      AND 100 * (kd * z_sq - z_sum * z_sum) >= 49 * z_sum * z_sum
      |      THEN 'lumpy'
      |    WHEN 100 * span >= 132 * (kd - 1) THEN 'intermittent'
      |    WHEN 100 * (kd * z_sq - z_sum * z_sum) >= 49 * z_sum * z_sum
      |      THEN 'erratic'
      |    ELSE 'smooth' END AS demand_class
      |FROM guarded
      |WHERE kd >= 2
      |ORDER BY user_id NULLS FIRST""".stripMargin

  /** Q261 — exact Shapley-value channel attribution of conversion
    * (Shapley 1953; the coalition-game marketing-attribution form of
    * Zhao, Mahboobi & Bagheri 2018): where Q182's linear multi-touch
    * splits credit by COUNT of touches, this asks the counterfactual —
    * per user, the exposure COALITION is the set of non-purchase
    * channels seen strictly before the first purchase (whole history
    * for non-converters), the coalition value v(S) is the observed
    * conversion rate of users exposed to exactly S (unobserved
    * coalitions contribute v = 0, the standard data-driven
    * convention), and channel j earns φ_j = Σ_{S∌j}
    * [|S|!(k−1−|S|)!/k!]·(v(S∪{j}) − v(S)). Channels and k derive
    * from the data; coalitions enumerate RELATIONALLY as bitmask
    * 0..2^k−1 (k = |channel vocabulary|, tiny by construction —
    * nothing collects to the driver).
    *
    * Determinism: exposure masks are exact bit sums over distinct
    * (user, channel) rows with the alphabetic channel→bit order;
    * coalition counts are exact int64; factorial weights are exact
    * longs divided once; v and φ are fixed-order double arithmetic
    * rounded 6. The efficiency identity Σφ_j = v(full) − v(∅) holds
    * by construction and is exposed via the baseline columns.
    *
    * Scale notes: one events scan → per-user first-purchase window,
    * one DISTINCT (user, channel) shuffle, then everything lives on
    * |coalitions| = 2^k rows (≤ 32 for any plausible event vocabulary)
    * crossed with k channels. The user dimension never re-shuffles.
    */
  def q261(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("user_id"), col("event_type"), col("ts"))
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("fp_ts"))
    val users = ev.select(col("user_id")).distinct()
      .join(fp, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("fp_ts").isNotNull, 1L).otherwise(0L).as("converted"),
        col("fp_ts"))
    val ch = ev.filter(col("event_type") =!= "purchase")
      .select(col("event_type").as("channel")).distinct()
      .withColumn("j",
        (row_number().over(Window.orderBy(asc("channel"))) - 1).cast("long"))
    val expo = ev.filter(col("event_type") =!= "purchase")
      .join(fp, Seq("user_id"), "left")
      .filter(col("fp_ts").isNull || col("ts") < col("fp_ts"))
      .select(col("user_id"), col("event_type")).distinct()
      .join(ch, col("event_type") === col("channel"))
      .select(col("user_id"), col("j"))
    val um = users.join(expo, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("converted"))
      .agg(coalesce(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))")),
        lit(0L)).cast("long").as("mask"))
    val vrel = um.groupBy(col("mask"))
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum(col("converted")).cast("long").as("n_conv"))
    val kk = ch.agg(count(lit(1)).cast("long").as("k"))
    val masks = kk.select(col("k"),
      explode(expr(
        "sequence(CAST(0 AS BIGINT), shiftleft(CAST(1 AS BIGINT), CAST(k AS INT)) - 1)"))
        .as("s"))
    val pairs = masks.crossJoin(ch)
      .filter(expr("(shiftright(s, CAST(j AS INT)) & 1) = 0"))
      .withColumn("sj",
        expr("s + shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"))
      .withColumn("b", expr("CAST(bit_count(s) AS BIGINT)"))
      .join(vrel.select(col("mask").as("s"),
        (col("n_conv") / col("n_users")).as("v0")), Seq("s"), "left")
      .join(vrel.select(col("mask").as("sj"),
        (col("n_conv") / col("n_users")).as("v1")), Seq("sj"), "left")
      .withColumn("w",
        (factorial(col("b")) * factorial(col("k") - 1 - col("b")))
          .cast("double") / factorial(col("k")))
      .withColumn("gain",
        col("w") * (coalesce(col("v1"), lit(0.0)) -
          coalesce(col("v0"), lit(0.0))))
    val phi = pairs.groupBy(col("channel"))
      .agg(round(sum(col("gain")), 6).as("shapley"))
    val exposed = um.crossJoin(ch)
      .filter(expr("(shiftright(mask, CAST(j AS INT)) & 1) = 1"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).cast("long").as("n_exposed"),
        round(sum(col("converted")).cast("double") / count(lit(1)), 6)
          .as("conv_rate_exposed"))
    val base = um.agg(
      count(lit(1)).cast("long").as("n_users_total"),
      round(sum(col("converted")).cast("double") / count(lit(1)), 6)
        .as("conv_rate_overall"))
    phi.join(exposed, Seq("channel"), "left")
      .crossJoin(broadcast(base))
      .select(col("channel"), col("n_exposed"), col("conv_rate_exposed"),
        col("shapley"), col("n_users_total"), col("conv_rate_overall"))
      .orderBy(asc_nulls_first("channel"))
  }

  val q261Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, ts FROM events),
      |fp AS (
      |  SELECT user_id, MIN(ts) AS fp_ts FROM ev
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |users AS (
      |  SELECT u.user_id,
      |    CASE WHEN f.fp_ts IS NOT NULL THEN 1 ELSE 0 END AS converted
      |  FROM (SELECT DISTINCT user_id FROM ev) u
      |  LEFT JOIN fp f ON f.user_id = u.user_id),
      |ch AS (
      |  SELECT channel,
      |    CAST(ROW_NUMBER() OVER (ORDER BY channel) - 1 AS BIGINT) AS j
      |  FROM (SELECT DISTINCT event_type AS channel FROM ev
      |        WHERE event_type <> 'purchase')),
      |expo AS (
      |  SELECT DISTINCT e.user_id, c.j
      |  FROM ev e
      |  LEFT JOIN fp f ON f.user_id = e.user_id
      |  JOIN ch c ON c.channel = e.event_type
      |  WHERE e.event_type <> 'purchase'
      |    AND (f.fp_ts IS NULL OR e.ts < f.fp_ts)),
      |um AS (
      |  SELECT u.user_id, u.converted,
      |    CAST(COALESCE(SUM(1::BIGINT << e.j::INT), 0) AS BIGINT) AS mask
      |  FROM users u LEFT JOIN expo e ON e.user_id = u.user_id
      |  GROUP BY 1, 2),
      |vrel AS (
      |  SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(converted) AS BIGINT) AS n_conv
      |  FROM um GROUP BY 1),
      |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM ch),
      |masks AS (
      |  SELECT k, UNNEST(generate_series(0, (1::BIGINT << k::INT) - 1)) AS s
      |  FROM kk),
      |pairs AS (
      |  SELECT m.s + (1::BIGINT << c.j::INT) AS sj, m.s, m.k, c.channel,
      |    CAST(bit_count(m.s) AS BIGINT) AS b
      |  FROM masks m CROSS JOIN ch c
      |  WHERE ((m.s >> c.j::INT) & 1) = 0),
      |gains AS (
      |  SELECT p.channel,
      |    CAST(factorial(p.b::INT) * factorial((p.k - 1 - p.b)::INT)
      |      AS DOUBLE) / factorial(p.k::INT)
      |      * (COALESCE(v1.n_conv / v1.n_users, 0.0)
      |         - COALESCE(v0.n_conv / v0.n_users, 0.0)) AS gain
      |  FROM pairs p
      |  LEFT JOIN vrel v0 ON v0.mask = p.s
      |  LEFT JOIN vrel v1 ON v1.mask = p.sj),
      |phi AS (
      |  SELECT channel, ROUND(SUM(gain), 6) AS shapley FROM gains
      |  GROUP BY 1),
      |exposed AS (
      |  SELECT c.channel, CAST(COUNT(*) AS BIGINT) AS n_exposed,
      |    ROUND(CAST(SUM(u.converted) AS DOUBLE) / COUNT(*), 6)
      |      AS conv_rate_exposed
      |  FROM um u CROSS JOIN ch c
      |  WHERE ((u.mask >> c.j::INT) & 1) = 1
      |  GROUP BY 1),
      |base AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users_total,
      |    ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6)
      |      AS conv_rate_overall
      |  FROM um)
      |SELECT p.channel, e.n_exposed, e.conv_rate_exposed, p.shapley,
      |  b.n_users_total, b.conv_rate_overall
      |FROM phi p
      |LEFT JOIN exposed e ON e.channel = p.channel
      |CROSS JOIN base b
      |ORDER BY p.channel NULLS FIRST""".stripMargin
}
