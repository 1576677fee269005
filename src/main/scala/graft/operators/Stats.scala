package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Catalog

/** Classical statistical hypothesis tests and dependence measures — the
  * experiment-analysis layer (A/B deep-dives, drift detection between
  * cohorts) that sits next to the Q108 Wilson interval and the Q114/Q133
  * anomaly gates.
  *
  * Exactness discipline (the Q125/Q128 house rules): every statistic is
  * assembled from a handful of per-group aggregates (counts stay int64;
  * double sums are combined with a fixed, textually-duplicated formula) and
  * only the final scalar is rounded. Rank statistics (Q138/Q139) avoid
  * floats entirely until the last divide: average ranks are carried as
  * DOUBLED int64 ranks and ECDF gaps as integer numerators, so both
  * engines compare exact integers.
  *
  * Scale notes: all four gates reduce to bounded-cardinality aggregates.
  * The pairwise tests first collapse the corpus to per-(type[, value])
  * aggregates — shuffle keys of at most (types × distinct values) — then
  * join the tiny per-type summary table (k rows, broadcast) to form the
  * k·(k−1)/2 pairs. The corpus is scanned once per gate and never
  * self-joined at event granularity.
  */
object Stats {

  /** Per-type moment summary of events.value: n, Σv, Σv² — the sufficient
    * statistics for every mean/variance test. One map-side-combined scan. */
  private def typeMoments(c: Catalog): DataFrame =
    c.events
      .groupBy(col("event_type"))
      .agg(count(col("value")).as("n"),
        sum(col("value")).as("s1"),
        sum(col("value") * col("value")).as("s2"))

  /** All unordered type pairs (ta < tb) of a per-type summary, by
    * self-joining the bounded summary relation — k rows, broadcast. */
  private def pairs(summary: DataFrame, cols: Seq[String]): DataFrame = {
    val a = summary.select(col("event_type").as("type_a") +:
      cols.map(n => col(n).as(s"${n}_a")): _*)
    val b = summary.select(col("event_type").as("type_b") +:
      cols.map(n => col(n).as(s"${n}_b")): _*)
    a.join(broadcast(b), col("type_a") < col("type_b"))
  }

  /** Q137 — Welch's unequal-variance t-test between every pair of event
    * types on `value` (Welch 1947): t = (m̄a − m̄b)/√(va/na + vb/nb) with
    * the Welch–Satterthwaite df. Means and sample variances derive from
    * the (n, Σv, Σv²) sufficient statistics with the identical expression
    * text in both engines; t and df are the only emitted floats, rounded
    * to 4 (double-sum order across engines differs at ~1e-12 relative,
    * far inside the rounding).
    *
    * Scale notes: one corpus scan to k summary rows, then a k×k broadcast
    * self-join — no data-granularity shuffle at any size.
    */
  def q137(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val p = pairs(typeMoments(c), Seq("n", "s1", "s2"))
    p.select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        (col("s1_a") / col("n_a")).as("ma"),
        (col("s1_b") / col("n_b")).as("mb"),
        ((col("s2_a") - col("s1_a") * col("s1_a") / col("n_a")) /
          (col("n_a") - 1)).as("va"),
        ((col("s2_b") - col("s1_b") * col("s1_b") / col("n_b")) /
          (col("n_b") - 1)).as("vb"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        round(col("ma"), 4).as("mean_a"),
        round(col("mb"), 4).as("mean_b"),
        round((col("ma") - col("mb")) /
          sqrt(col("va") / col("n_a") + col("vb") / col("n_b")), 4).as("t"),
        round(pow(col("va") / col("n_a") + col("vb") / col("n_b"), 2) /
          (pow(col("va") / col("n_a"), 2) / (col("n_a") - 1) +
            pow(col("vb") / col("n_b"), 2) / (col("n_b") - 1)), 2).as("df"))
      .orderBy(asc_nulls_first("type_a"), asc_nulls_first("type_b"))
  }

  val q137Oracle: String =
    """WITH m AS (
      |  SELECT event_type, COUNT(value) AS n, SUM(value) AS s1,
      |         SUM(value*value) AS s2
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    a.n AS n_a, b.n AS n_b,
      |    a.s1/a.n AS ma, b.s1/b.n AS mb,
      |    (a.s2 - a.s1*a.s1/a.n)/(a.n - 1) AS va,
      |    (b.s2 - b.s1*b.s1/b.n)/(b.n - 1) AS vb
      |  FROM m a JOIN m b ON a.event_type < b.event_type)
      |SELECT type_a, type_b, n_a, n_b,
      |  ROUND(ma, 4) AS mean_a, ROUND(mb, 4) AS mean_b,
      |  ROUND((ma - mb)/SQRT(va/n_a + vb/n_b), 4) AS t,
      |  ROUND(POW(va/n_a + vb/n_b, 2)
      |    / (POW(va/n_a, 2)/(n_a - 1) + POW(vb/n_b, 2)/(n_b - 1)), 2) AS df
      |FROM p
      |ORDER BY type_a NULLS FIRST, type_b NULLS FIRST""".stripMargin

  /** Q138 — Mann–Whitney U (Wilcoxon rank-sum) between every pair of event
    * types on `value` (Mann & Whitney 1947), with midranks for ties and
    * the tie-corrected normal approximation. Ranks never materialize as
    * floats: for a tie group of size c starting after cum predecessors,
    * the DOUBLED midrank is the exact int64 `2·cum + c + 1`, so the rank
    * sum is carried as int64 `r2_a = Σ cnt_a·(2·cum + c + 1)` and
    * U_a = (r2_a − 2·na(na+1)/2)/2 is an exact half-integer. The only
    * floats are the final z (tie-corrected variance) rounded to 4.
    *
    * Scale notes: the corpus collapses to per-(type, value) counts first
    * (one map-side-combined shuffle); each pair's merged value list is
    * then at most 2·|distinct values| rows, windowed per pair. Each
    * distinct-value row joins into k−1 pairs — replication is in the
    * COLLAPSED domain, never the raw events.
    */
  def q138(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val byVal = c.events
      .groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val types = byVal.select(col("event_type")).distinct()
    val pairTags = types.select(col("event_type").as("type_a"))
      .join(types.select(col("event_type").as("type_b")),
        col("type_a") < col("type_b"))
    // Per-(pair, value) side counts: each collapsed (type, value) row
    // fans out to the k−1 pairs containing its type — replication in the
    // collapsed domain only.
    val sided = broadcast(pairTags)
      .join(byVal, col("event_type") === col("type_a") ||
        col("event_type") === col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("value"))
      .agg(sum(when(col("event_type") === col("type_a"), col("cnt"))
          .otherwise(0L)).as("cnt_a"),
        sum(when(col("event_type") === col("type_b"), col("cnt"))
          .otherwise(0L)).as("cnt_b"))
    val w = Window.partitionBy(col("type_a"), col("type_b"))
      .orderBy(asc("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = sided
      .withColumn("c", col("cnt_a") + col("cnt_b"))
      .withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
      .select(col("type_a"), col("type_b"),
        (col("cnt_a") * (lit(2L) * col("cum") + col("c") + 1L)).as("r2a"),
        col("cnt_a"), col("cnt_b"),
        (col("c") * col("c") * col("c") - col("c")).as("t3"))
    ranked.groupBy(col("type_a"), col("type_b"))
      .agg(sum(col("cnt_a")).as("na"), sum(col("cnt_b")).as("nb"),
        sum(col("r2a")).as("r2a"), sum(col("t3")).as("ties3"))
      .select(col("type_a"), col("type_b"), col("na"), col("nb"),
        ((col("r2a") - col("na") * (col("na") + 1)).cast("double") / 2)
          .as("u_a"),
        col("ties3"))
      .withColumn("nn", col("na") + col("nb"))
      .withColumn("z", round(
        (col("u_a") - col("na").cast("double") * col("nb") / 2) /
          sqrt(col("na").cast("double") * col("nb") / 12 *
            ((col("nn") + 1) - col("ties3").cast("double") /
              (col("nn") * (col("nn") - 1)))), 4))
      .select(col("type_a"), col("type_b"), col("na"), col("nb"),
        col("u_a"), col("z"))
      .orderBy(asc_nulls_first("type_a"), asc_nulls_first("type_b"))
  }

  val q138Oracle: String =
    """WITH byval AS (
      |  SELECT event_type, value, COUNT(*) AS cnt FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b
      |  FROM (SELECT DISTINCT event_type FROM byval) a
      |  JOIN (SELECT DISTINCT event_type FROM byval) b
      |    ON a.event_type < b.event_type),
      |sided AS (
      |  SELECT p.type_a, p.type_b, v.value,
      |    SUM(CASE WHEN v.event_type = p.type_a THEN v.cnt ELSE 0 END) AS cnt_a,
      |    SUM(CASE WHEN v.event_type = p.type_b THEN v.cnt ELSE 0 END) AS cnt_b
      |  FROM pairs p JOIN byval v
      |    ON v.event_type IN (p.type_a, p.type_b)
      |  GROUP BY 1, 2, 3),
      |ranked AS (
      |  SELECT type_a, type_b, cnt_a, cnt_b,
      |    cnt_a + cnt_b AS c,
      |    COALESCE(SUM(cnt_a + cnt_b) OVER (
      |      PARTITION BY type_a, type_b ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM sided),
      |agg AS (
      |  SELECT type_a, type_b,
      |    CAST(SUM(cnt_a) AS BIGINT) AS na, CAST(SUM(cnt_b) AS BIGINT) AS nb,
      |    SUM(cnt_a * (2*cum + c + 1)) AS r2a,
      |    SUM(c*c*c - c) AS ties3
      |  FROM ranked GROUP BY 1, 2)
      |SELECT type_a, type_b, na, nb,
      |  CAST(r2a - na*(na+1) AS DOUBLE)/2 AS u_a,
      |  ROUND((CAST(r2a - na*(na+1) AS DOUBLE)/2 - CAST(na AS DOUBLE)*nb/2)
      |    / SQRT(CAST(na AS DOUBLE)*nb/12
      |        * ((na+nb+1) - CAST(ties3 AS DOUBLE)/((na+nb)*(na+nb-1)))),
      |    4) AS z
      |FROM agg
      |ORDER BY type_a NULLS FIRST, type_b NULLS FIRST""".stripMargin

  /** Q139 — two-sample Kolmogorov–Smirnov statistic between every pair of
    * event types on `value`: D = max over the merged value set of
    * |F̂a(v) − F̂b(v)|. The ECDF gap is carried as the exact int64
    * numerator |cuma·nb − cumb·na| over the common denominator na·nb —
    * both engines take a max over integers, and only the final
    * D = num/(na·nb) is a (rounded) float.
    *
    * Scale notes: same collapsed-domain shape as Q138 — per-(type, value)
    * counts once, pair replication only over distinct values, one window
    * pass per pair for the two running ECDFs, then a max aggregate.
    * num ≈ na·nb caps at ~10¹⁸ for 10⁹-row sides — inside int64; beyond
    * that the same plan carries DECIMAL(38,0).
    */
  def q139(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val byVal = c.events
      .groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val types = byVal.select(col("event_type")).distinct()
    val pairTags = types.select(col("event_type").as("type_a"))
      .join(types.select(col("event_type").as("type_b")),
        col("type_a") < col("type_b"))
    val sided = broadcast(pairTags)
      .join(byVal, col("event_type") === col("type_a") ||
        col("event_type") === col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("value"))
      .agg(sum(when(col("event_type") === col("type_a"), col("cnt"))
          .otherwise(0L)).as("cnt_a"),
        sum(when(col("event_type") === col("type_b"), col("cnt"))
          .otherwise(0L)).as("cnt_b"))
    val w = Window.partitionBy(col("type_a"), col("type_b"))
      .orderBy(asc("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("type_a"), col("type_b"))
    sided
      .withColumn("cum_a", sum(col("cnt_a")).over(w))
      .withColumn("cum_b", sum(col("cnt_b")).over(w))
      .withColumn("na", max(col("cum_a")).over(wAll))
      .withColumn("nb", max(col("cum_b")).over(wAll))
      .groupBy(col("type_a"), col("type_b"))
      .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
        max(abs(col("cum_a") * col("nb") - col("cum_b") * col("na")))
          .as("ks_num"))
      .select(col("type_a"), col("type_b"), col("na"), col("nb"),
        col("ks_num"),
        round(col("ks_num").cast("double") /
          (col("na").cast("double") * col("nb")), 6).as("d"))
      .orderBy(asc_nulls_first("type_a"), asc_nulls_first("type_b"))
  }

  val q139Oracle: String =
    """WITH byval AS (
      |  SELECT event_type, value, COUNT(*) AS cnt FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b
      |  FROM (SELECT DISTINCT event_type FROM byval) a
      |  JOIN (SELECT DISTINCT event_type FROM byval) b
      |    ON a.event_type < b.event_type),
      |sided AS (
      |  SELECT p.type_a, p.type_b, v.value,
      |    SUM(CASE WHEN v.event_type = p.type_a THEN v.cnt ELSE 0 END) AS cnt_a,
      |    SUM(CASE WHEN v.event_type = p.type_b THEN v.cnt ELSE 0 END) AS cnt_b
      |  FROM pairs p JOIN byval v
      |    ON v.event_type IN (p.type_a, p.type_b)
      |  GROUP BY 1, 2, 3),
      |cums AS (
      |  SELECT type_a, type_b,
      |    SUM(cnt_a) OVER w AS cum_a, SUM(cnt_b) OVER w AS cum_b
      |  FROM sided
      |  WINDOW w AS (PARTITION BY type_a, type_b ORDER BY value
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tot AS (
      |  SELECT type_a, type_b,
      |    CAST(MAX(cum_a) AS BIGINT) AS na, CAST(MAX(cum_b) AS BIGINT) AS nb
      |  FROM cums GROUP BY 1, 2)
      |SELECT c.type_a AS type_a, c.type_b AS type_b, t.na AS na, t.nb AS nb,
      |  CAST(MAX(ABS(c.cum_a * t.nb - c.cum_b * t.na)) AS BIGINT) AS ks_num,
      |  ROUND(CAST(MAX(ABS(c.cum_a * t.nb - c.cum_b * t.na)) AS DOUBLE)
      |    / (CAST(t.na AS DOUBLE) * t.nb), 6) AS d
      |FROM cums c JOIN tot t
      |  ON t.type_a = c.type_a AND t.type_b = c.type_b
      |GROUP BY c.type_a, c.type_b, t.na, t.nb
      |ORDER BY c.type_a NULLS FIRST, c.type_b NULLS FIRST""".stripMargin

  /** Q140 — Pearson correlation matrix over the lineitem measures
    * (quantity, extendedprice, discount, tax): every pairwise
    * corr = (n·Σxy − Σx·Σy)/√((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)), all ten
    * sufficient sums computed in ONE corpus scan (the Q78 one-scan
    * discipline) and exploded to the 6 upper-triangle pairs. Only the
    * final coefficient is rounded (4 dp; double-sum order noise is
    * ~1e-12 relative).
    *
    * Scale notes: one map-side-combined aggregate to a single 14-measure
    * row — no shuffle wider than the combine tree, output bounded by
    * column-pair count, never data size. NULL if either variance term
    * is zero (constant column).
    */
  def q140(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val sums: Seq[Column] =
      count(lit(1)).as("n") +:
        cols.map(x => sum(col(x)).as(s"s_$x")) ++:
        (for { i <- cols.indices; j <- i until cols.length } yield
          sum(col(cols(i)) * col(cols(j))).as(s"s_${cols(i)}_${cols(j)}"))
    val wide = c.lineitem.agg(sums.head, sums.tail: _*)
    val pairRows = for { i <- cols.indices; j <- (i + 1) until cols.length }
      yield struct(
        lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"),
        (col("n") * col(s"s_${cols(i)}_${cols(j)}") -
          col(s"s_${cols(i)}") * col(s"s_${cols(j)}")).as("num"),
        (col("n") * col(s"s_${cols(i)}_${cols(i)}") -
          col(s"s_${cols(i)}") * col(s"s_${cols(i)}")).as("den_x"),
        (col("n") * col(s"s_${cols(j)}_${cols(j)}") -
          col(s"s_${cols(j)}") * col(s"s_${cols(j)}")).as("den_y"))
    wide
      .select(explode(array(pairRows: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"),
        when(col("p.den_x") > 0d && col("p.den_y") > 0d,
          round(col("p.num") / sqrt(col("p.den_x") * col("p.den_y")), 4))
          .as("corr"))
      .orderBy(asc_nulls_first("col_x"), asc_nulls_first("col_y"))
  }

  val q140Oracle: String =
    """WITH s AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(l_quantity) AS sq, SUM(l_extendedprice) AS se,
      |    SUM(l_discount) AS sd, SUM(l_tax) AS st,
      |    SUM(l_quantity*l_quantity) AS sqq,
      |    SUM(l_quantity*l_extendedprice) AS sqe,
      |    SUM(l_quantity*l_discount) AS sqd,
      |    SUM(l_quantity*l_tax) AS sqt,
      |    SUM(l_extendedprice*l_extendedprice) AS see,
      |    SUM(l_extendedprice*l_discount) AS sed,
      |    SUM(l_extendedprice*l_tax) AS set_,
      |    SUM(l_discount*l_discount) AS sdd,
      |    SUM(l_discount*l_tax) AS sdt,
      |    SUM(l_tax*l_tax) AS stt
      |  FROM lineitem),
      |p AS (
      |  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
      |    n*sqe - sq*se AS num, n*sqq - sq*sq AS den_x, n*see - se*se AS den_y
      |  FROM s
      |  UNION ALL SELECT 'l_quantity', 'l_discount',
      |    n*sqd - sq*sd, n*sqq - sq*sq, n*sdd - sd*sd FROM s
      |  UNION ALL SELECT 'l_quantity', 'l_tax',
      |    n*sqt - sq*st, n*sqq - sq*sq, n*stt - st*st FROM s
      |  UNION ALL SELECT 'l_extendedprice', 'l_discount',
      |    n*sed - se*sd, n*see - se*se, n*sdd - sd*sd FROM s
      |  UNION ALL SELECT 'l_extendedprice', 'l_tax',
      |    n*set_ - se*st, n*see - se*se, n*stt - st*st FROM s
      |  UNION ALL SELECT 'l_discount', 'l_tax',
      |    n*sdt - sd*st, n*sdd - sd*sd, n*stt - st*st FROM s)
      |SELECT col_x, col_y,
      |  CASE WHEN den_x > 0 AND den_y > 0
      |       THEN ROUND(num / SQRT(den_x * den_y), 4) END AS corr
      |FROM p
      |ORDER BY col_x NULLS FIRST, col_y NULLS FIRST""".stripMargin

  /** Q146 — Kaplan–Meier survival curve (Kaplan & Meier 1958) for
    * time-to-first-purchase: per user, t = hours from first event to
    * first 'purchase', administratively right-censored at 72 h (deaths
    * at t precede censoring at t, the standard convention). One row per
    * death time: at-risk n, deaths d, and Ŝ(t) = Π (1 − d/n).
    *
    * Exactness: n and d are exact int64 window sums over the bounded
    * per-time aggregate. The product is carried as a CUMULATIVE INT64
    * SUM of ln(1 − d/n)·10⁸ per-step integers (the Q118 fixed-point
    * discipline — float sums never cross engines unorder-rounded), and
    * only the final exp is rounded. A step with d = n zeroes the curve
    * from that time on via a cumulative flag instead of feeding ln(0).
    *
    * Scale notes: the corpus collapses to one row per user in the first
    * aggregate (shuffle on user_id), then to one row per distinct death
    * time — everything after is window passes over a bounded series.
    */
  def q146(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val perUser = c.events
      .select(col("user_id"), expr("ts DIV 1000").as("us"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(min(col("us")).as("us0"),
        min(when(col("event_type") === "purchase", col("us"))).as("pus"))
      .select(expr("(pus - us0) DIV 3600000000").as("t_h"))
      .select(when(col("t_h").isNotNull && col("t_h") <= 72, col("t_h"))
        .as("t_death"))
    // t_obs = death time, or the 72 h censoring horizon
    val obs = perUser.select(
      coalesce(col("t_death"), lit(72L)).as("t_obs"),
      when(col("t_death").isNotNull, 1L).otherwise(0L).as("death"))
    val byTime = obs.groupBy(col("t_obs"))
      .agg(count(lit(1)).as("leaving"), sum(col("death")).as("d"))
    val wDesc = Window.orderBy(desc("t_obs"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(asc("t_obs"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byTime
      .withColumn("n", sum(col("leaving")).over(wDesc)) // at risk: t_obs >= t
      .filter(col("d") > 0)
      .withColumn("l8",
        when(col("d") < col("n"),
          round(log((col("n") - col("d")).cast("double") / col("n")) *
            100000000L).cast("long")).otherwise(0L))
      .withColumn("dead_all", max((col("d") >= col("n")).cast("int")).over(wAsc))
      .withColumn("km",
        when(col("dead_all") === 1, 0.0)
          .otherwise(round(exp(sum(col("l8")).over(wAsc) / 1e8), 6)))
      .select(col("t_obs").as("t"), col("n"), col("d"), col("km"))
      .orderBy(asc("t"))
  }

  val q146Oracle: String =
    """WITH per_user AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS us0,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS pus
      |  FROM events GROUP BY 1),
      |obs AS (
      |  SELECT
      |    COALESCE(CASE WHEN pus IS NOT NULL
      |                   AND (pus - us0) // 3600000000 <= 72
      |              THEN (pus - us0) // 3600000000 END, 72) AS t_obs,
      |    CASE WHEN pus IS NOT NULL
      |          AND (pus - us0) // 3600000000 <= 72 THEN 1 ELSE 0 END AS death
      |  FROM per_user),
      |by_time AS (
      |  SELECT t_obs, COUNT(*) AS leaving, SUM(death) AS d
      |  FROM obs GROUP BY 1),
      |risked AS (
      |  SELECT t_obs, d,
      |    SUM(leaving) OVER (ORDER BY t_obs DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
      |  FROM by_time),
      |steps AS (
      |  SELECT t_obs, n, d,
      |    CASE WHEN d < n THEN CAST(ROUND(
      |      LN(CAST(n - d AS DOUBLE) / n) * 100000000, 0) AS BIGINT)
      |      ELSE 0 END AS l8
      |  FROM risked WHERE d > 0)
      |SELECT t_obs AS t, CAST(n AS BIGINT) AS n, CAST(d AS BIGINT) AS d,
      |  CASE WHEN MAX(CASE WHEN d >= n THEN 1 ELSE 0 END) OVER wa = 1 THEN 0.0
      |       ELSE ROUND(EXP(SUM(l8) OVER wa / 1e8), 6) END AS km
      |FROM steps
      |WINDOW wa AS (ORDER BY t_obs
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY t""".stripMargin

  /** The (value → doubled midrank) map of one measure: the window runs
    * over the COLLAPSED per-value relation (Q138 discipline — never a
    * row-granularity global sort). For a tie group of size c after cum
    * strict predecessors, the doubled midrank is the exact int64
    * 2·cum + c + 1. Callers join the bounded map back on the value.
    * (A distributed range-partitioned prefix-sum variant was measured
    * at sf0.1 and lost to this form — 3 checkpoints + an offset collect
    * per measure cost more than the one serial pass over the collapsed
    * cells; at a scale where a measure's distinct-value relation
    * outgrows one partition, swap in the two-pass prefix sum.)
    */
  private[operators] def doubledMidrankMap(
      rows: DataFrame, valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v")).rowsBetween(Long.MinValue, -1)
    rows.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
      .select(col("v"), (lit(2L) * col("cum") + col("c") + 1).as("r2"))
  }

  private val SpearmanMeasures =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Q161 — Spearman rank correlation matrix over the lineitem measures:
    * Pearson on midranks, the tie-correct definition (Spearman 1904).
    * Monotone dependence that Q140's Pearson r underweights (and outlier
    * sensitivity it overweights) shows up here — the robust member of the
    * dependence-profile family (Q116, Q140).
    *
    * Exactness: doubled midranks are exact int64 (Q138 house rule); all
    * fifteen pairwise sums accumulate in DECIMAL(38,0) with the cast
    * applied BEFORE the product (Q127 overflow rule — Σ(2r)² is 4n³,
    * past int64 at warehouse row counts); each r is one float expression
    * over the exactly-cast sums, rounded to 4. The oracle's row-level
    * RANK()+COUNT() midranks equal 2·cum+c+1 identically.
    *
    * Scale notes: per measure, one groupBy to the distinct-value
    * relation and one window over that bounded relation, each
    * materialized ONCE via localCheckpoint (the Q179 shared-relation
    * discipline — the round-10 chained form re-derived every earlier
    * measure's join inside each later measure's rank build, stacking 28
    * exchanges into the AQE-final plan); the main plan is then one
    * lineitem scan + four value-keyed joins of the checkpointed maps +
    * ONE aggregate pass whose single-row result serves all 6 pairs. No
    * row-granularity global sort anywhere.
    */
  def q161(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val meas = SpearmanMeasures
    // Only the four measure columns ride the joins — the sums are
    // order-independent, so no row identity is needed.
    val base = c.lineitem.select(meas.map(col): _*)
    // The four map builds are independent Spark jobs — materialize them
    // CONCURRENTLY (the scheduler interleaves their stages across the
    // executor cores) instead of paying four sequential checkpoint waits.
    val rankMaps = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      meas.map(m => m -> Future(doubledMidrankMap(base, m).localCheckpoint()))
        .map { case (m, f) => m -> Await.result(f, Duration.Inf) }
    }
    val withRanks = rankMaps.foldLeft(base) { case (df, (m, ranked)) =>
      df.join(ranked, df(m) === ranked("v")).drop("v")
        .withColumnRenamed("r2", s"r2_$m")
    }
    // Probe-proven narrow accumulation (r14, guide §2.3 narrower types —
    // only when provably safe): every doubled midrank is ≤ 2n by
    // construction, so each pairwise product is ≤ 4n² and each of the 15
    // sums is ≤ 4n³. One exact count probe decides: n ≤ 10⁶ ⇒ 4n³ ≤
    // 4·10¹⁸ < 2⁶³ and the whole pass runs in codegen'd int64 (the r13
    // bench measured the 23-way DECIMAL(38,0) aggregate as Q161's single
    // 1.5 s job — per-row BigDecimal multiply/add); past the fence the
    // DECIMAL(38,0) path runs unchanged (the 100 TB shape). The sums are
    // integers either way, so the cast("double") results — and the
    // rounded correlations — are bit-identical; the oracle's HUGEINT
    // text is untouched.
    val nRows = base.count()
    val dec = if (nRows <= 1000000L) "bigint" else "decimal(38,0)"
    def d(m: String): Column = col(s"r2_$m").cast(dec)
    val pairsIdx = for {
      i <- meas.indices; j <- meas.indices if i < j
    } yield (meas(i), meas(j))
    val aggExprs =
      meas.map(m => sum(d(m)).cast("double").as(s"s_$m")) ++
      meas.map(m => sum(d(m) * d(m)).cast("double").as(s"ss_$m")) ++
      pairsIdx.map { case (a, b) =>
        sum(d(a) * d(b)).cast("double").as(s"sp_${a}_$b") }
    val sums = withRanks.agg(count(lit(1)).as("n"), aggExprs: _*)
    // All six pair correlations come off the ONE single-row sums result
    // (struct-array + explode — no 6-way union re-deriving the aggregate).
    val pairStructs = pairsIdx.map { case (a, b) =>
      // NULL on zero rank variance (a constant measure) — the Q125
      // degenerate-series rule, mirrored by the oracle's NULLIF.
      val num = col("n").cast("double") * col(s"sp_${a}_$b") -
        col(s"s_$a") * col(s"s_$b")
      val den = sqrt((col("n").cast("double") * col(s"ss_$a") -
          col(s"s_$a") * col(s"s_$a")) *
        (col("n").cast("double") * col(s"ss_$b") -
          col(s"s_$b") * col(s"s_$b")))
      struct(lit(a).as("measure_a"), lit(b).as("measure_b"),
        round(num / when(den =!= 0, den), 4).as("spearman_r"))
    }
    sums
      .select(col("n"), explode(array(pairStructs: _*)).as("p"))
      .select(col("p.measure_a"), col("p.measure_b"), col("n"),
        col("p.spearman_r"))
      .orderBy(asc_nulls_first("measure_a"), asc_nulls_first("measure_b"))
  }

  val q161Oracle: String = {
    // All four doubled midranks come from ONE scan (four window functions
    // over the same rows), so rank pairing is by physical row with no join
    // key needed — (l_orderkey, l_linenumber) is NOT unique in the fixture.
    val meas = SpearmanMeasures
    val rankCols = meas.map { m =>
      s"""    2*RANK() OVER (ORDER BY $m)
         |       + COUNT(*) OVER (PARTITION BY $m) - 1 AS r2_$m""".stripMargin
    }.mkString(",\n")
    val pairs = for {
      i <- meas.indices; j <- meas.indices if i < j
    } yield {
      val (a, b) = (meas(i), meas(j))
      s"""SELECT '$a' AS measure_a, '$b' AS measure_b, n,
         |  ROUND((CAST(n AS DOUBLE)*sxy - sx*sy) /
         |        NULLIF(SQRT((CAST(n AS DOUBLE)*sxx - sx*sx) *
         |             (CAST(n AS DOUBLE)*syy - sy*sy)), 0), 4) AS spearman_r
         |FROM (
         |  SELECT COUNT(*) AS n,
         |    CAST(SUM(r2_$a) AS DOUBLE) AS sx,
         |    CAST(SUM(r2_$b) AS DOUBLE) AS sy,
         |    CAST(SUM(r2_$a*r2_$a) AS DOUBLE) AS sxx,
         |    CAST(SUM(r2_$b*r2_$b) AS DOUBLE) AS syy,
         |    CAST(SUM(r2_$a*r2_$b) AS DOUBLE) AS sxy
         |  FROM r)""".stripMargin
    }
    "WITH r AS (\n  SELECT\n" + rankCols + "\n  FROM lineitem)\n" +
      pairs.mkString("\nUNION ALL\n") +
      "\nORDER BY measure_a NULLS FIRST, measure_b NULLS FIRST"
  }

  /** Q163 — Kruskal–Wallis H (rank one-way ANOVA; Kruskal & Wallis 1952)
    * across event types on `value`, with midrank ties and the tie
    * correction — the k-sample extension of Q138's two-sample U. Rank
    * sums are carried as exact int64 Σ cnt·(2·cum+c+1) doubled midranks;
    * the statistic is assembled from the per-type exact sums with the
    * textually-shared float formula; H and its tie-corrected form are the
    * only floats, rounded to 4.
    *
    * Scale notes: one (type, value) map-side-combined aggregate, a pooled
    * window over the DISTINCT value relation, one value-keyed join back,
    * and a k-row final reduce — never a row-level sort. The tie term
    * Σ(c³−c) stays exact int64 on the bounded distinct-value relation.
    */
  def q163(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val byval = c.events.filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("value")).rowsBetween(Long.MinValue, -1)
    val ranked = byval.groupBy(col("value")).agg(sum(col("cnt")).as("c"))
      .withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
      .select(col("value"), col("c"),
        (lit(2L) * col("cum") + col("c") + 1).as("r2"))
    val perType = byval
      .join(ranked.select(col("value"), col("r2")), Seq("value"))
      .groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n_t"), sum(col("cnt") * col("r2")).as("rsum2"))
    val tot = perType.agg(
      sum(col("n_t")).as("n"), count(lit(1)).as("k"),
      sum(col("rsum2").cast("double") * col("rsum2") /
        (lit(4.0) * col("n_t"))).as("sr"))
    val ties = ranked.agg(
      sum(col("c") * col("c") * col("c") - col("c")).cast("double").as("tie3"))
    val h = lit(12.0) * col("sr") /
      (col("n").cast("double") * (col("n") + 1)) - lit(3.0) * (col("n") + 1)
    // NULL tie-corrected H when every pooled value is identical (the
    // correction denominator hits 0) or n = 1 — mirrored by NULLIF.
    val inner = col("n").cast("double") * col("n") * col("n") - col("n")
    val corr = lit(1.0) - col("tie3") / when(inner =!= 0, inner)
    tot.crossJoin(ties)
      .select(col("n"), col("k"), (col("k") - 1).as("dof"),
        round(h, 4).as("h"),
        round(h / when(corr =!= 0, corr), 4).as("h_tie_corrected"))
  }

  val q163Oracle: String =
    """WITH s AS (
      |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
      |byval AS (
      |  SELECT event_type, value, COUNT(*) AS cnt FROM s GROUP BY 1, 2),
      |pooled AS (SELECT value, SUM(cnt) AS c FROM byval GROUP BY 1),
      |ranked AS (
      |  SELECT value, c,
      |    2*(SUM(c) OVER (ORDER BY value) - c) + c + 1 AS r2
      |  FROM pooled),
      |per_type AS (
      |  SELECT b.event_type, SUM(b.cnt) AS n_t, SUM(b.cnt * r.r2) AS rsum2
      |  FROM byval b JOIN ranked r ON r.value = b.value
      |  GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(n_t) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS k,
      |    SUM(CAST(rsum2 AS DOUBLE)*rsum2/(4.0*n_t)) AS sr
      |  FROM per_type),
      |ties AS (SELECT CAST(SUM(c*c*c - c) AS DOUBLE) AS tie3 FROM pooled)
      |SELECT n, k, k - 1 AS dof,
      |  ROUND(12.0*sr/(CAST(n AS DOUBLE)*(n+1)) - 3.0*(n+1), 4) AS h,
      |  ROUND((12.0*sr/(CAST(n AS DOUBLE)*(n+1)) - 3.0*(n+1)) /
      |        NULLIF(1.0 - tie3/NULLIF(CAST(n AS DOUBLE)*n*n - n, 0), 0), 4)
      |    AS h_tie_corrected
      |FROM tot CROSS JOIN ties""".stripMargin

  /** Q176 — population stability index (PSI, the standard model- and
    * data-drift monitor in deployed scoring systems) of each event
    * type's `value` distribution, first half of the global time range
    * (reference) vs second half (current): 10 equi-width bins over the
    * type's [min, max], Jeffreys-smoothed shares (+0.5 per bin, +5 per
    * half — keeps empty bins finite and is the textbook small-sample
    * correction), PSI = Σ (p_cur − p_ref)·ln(p_cur / p_ref). The usual
    * reading: <0.1 stable, 0.1–0.25 moderate shift, >0.25 drifted.
    * Q158's JSD compares SOURCES at one time; this compares TIME HALVES
    * per type — the "did the feed change under me" gate.
    *
    * Cross-engine determinism: the split point and bin edges derive
    * from exact MIN/MAX aggregates; bin assignment is one row-local
    * IEEE expression with a pinned evaluation shape
    * (FLOOR(((v − vmin) · 10) / (vmax − vmin)), LEAST 9), so no
    * accumulation-order float can move a row across engines; shares and
    * LN round once at the end. Zero-range types (vmax = vmin) drop out
    * of the binnable set (house degenerate rule), never a NaN from 0/0.
    *
    * Scale notes: two scalar/grouped bound aggregates, one row-local
    * bin tag, one (type, half, bin)-keyed count — map-side combinable,
    * output rows = types × 2 × 10 before the per-type rollup. Nothing
    * driver-side, no windows over raw events.
    */
  def q176(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events
      .select(col("event_type"), expr("ts DIV 1000").as("us"), col("value"))
      .filter(col("value").isNotNull)
    val mid = ev.agg(((min(col("us")) + max(col("us"))) / lit(2L)).as("mid"))
    val rng = ev.groupBy(col("event_type"))
      .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    val tagged = ev.crossJoin(broadcast(mid))
      .join(broadcast(rng), Seq("event_type"))
      .filter(col("vmax") > col("vmin"))
      .select(col("event_type"),
        when(col("us") < col("mid"), lit(0)).otherwise(lit(1)).as("half"),
        least(lit(9), floor(((col("value") - col("vmin")) * lit(10.0)) /
          (col("vmax") - col("vmin"))).cast("int")).as("bin"))
    val counts = tagged.groupBy(col("event_type"), col("half"), col("bin"))
      .agg(count(lit(1)).as("n"))
    val bins = rng.filter(col("vmax") > col("vmin"))
      .select(col("event_type"), explode(sequence(lit(0), lit(9))).as("bin"))
      .crossJoin(spark.range(0, 2).select(col("id").cast("int").as("half")))
    val dense = bins.join(counts, Seq("event_type", "half", "bin"), "left")
      .select(col("event_type"), col("half"), col("bin"),
        coalesce(col("n"), lit(0L)).as("n"))
    val totals = dense.groupBy(col("event_type"), col("half"))
      .agg(sum(col("n")).as("tot"))
    dense.join(totals, Seq("event_type", "half"))
      .select(col("event_type"), col("bin"),
        when(col("half") === 0, (col("n") + lit(0.5)) / (col("tot") + lit(5.0)))
          .otherwise(lit(0.0)).as("pr"),
        when(col("half") === 1, (col("n") + lit(0.5)) / (col("tot") + lit(5.0)))
          .otherwise(lit(0.0)).as("pc"),
        when(col("half") === 0, col("n")).otherwise(lit(0L)).as("nr"),
        when(col("half") === 1, col("n")).otherwise(lit(0L)).as("nc"))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(col("pr")).as("pr"), sum(col("pc")).as("pc"),
        sum(col("nr")).as("nr"), sum(col("nc")).as("nc"))
      .groupBy(col("event_type"))
      .agg(sum(col("nr")).as("n_ref"), sum(col("nc")).as("n_cur"),
        round(sum((col("pc") - col("pr")) * log(col("pc") / col("pr"))), 6)
          .as("psi"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q176Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) AS us, value
      |  FROM events WHERE value IS NOT NULL),
      |mid AS (SELECT (MIN(us) + MAX(us)) / 2 AS mid FROM ev),
      |rng AS (
      |  SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax
      |  FROM ev GROUP BY 1),
      |tagged AS (
      |  SELECT e.event_type,
      |    CASE WHEN e.us < m.mid THEN 0 ELSE 1 END AS half,
      |    LEAST(9, CAST(FLOOR(((e.value - r.vmin) * 10.0)
      |      / (r.vmax - r.vmin)) AS INT)) AS bin
      |  FROM ev e CROSS JOIN mid m
      |  JOIN rng r ON r.event_type = e.event_type
      |  WHERE r.vmax > r.vmin),
      |counts AS (
      |  SELECT event_type, half, bin, COUNT(*) AS n
      |  FROM tagged GROUP BY 1, 2, 3),
      |bins AS (
      |  SELECT r.event_type, b.bin, h.half
      |  FROM rng r
      |  CROSS JOIN (SELECT UNNEST(range(0, 10)) AS bin) b
      |  CROSS JOIN (SELECT UNNEST(range(0, 2)) AS half) h
      |  WHERE r.vmax > r.vmin),
      |dense AS (
      |  SELECT b.event_type, b.half, b.bin, COALESCE(c.n, 0) AS n
      |  FROM bins b LEFT JOIN counts c
      |  ON c.event_type = b.event_type AND c.half = b.half
      |    AND c.bin = b.bin),
      |totals AS (
      |  SELECT event_type, half, SUM(n) AS tot FROM dense GROUP BY 1, 2),
      |shares AS (
      |  SELECT d.event_type, d.bin,
      |    SUM(CASE WHEN d.half = 0
      |      THEN (d.n + 0.5) / (t.tot + 5.0) ELSE 0 END) AS pr,
      |    SUM(CASE WHEN d.half = 1
      |      THEN (d.n + 0.5) / (t.tot + 5.0) ELSE 0 END) AS pc,
      |    SUM(CASE WHEN d.half = 0 THEN d.n ELSE 0 END) AS nr,
      |    SUM(CASE WHEN d.half = 1 THEN d.n ELSE 0 END) AS nc
      |  FROM dense d JOIN totals t
      |  ON t.event_type = d.event_type AND t.half = d.half
      |  GROUP BY 1, 2)
      |SELECT event_type, CAST(SUM(nr) AS BIGINT) AS n_ref,
      |  CAST(SUM(nc) AS BIGINT) AS n_cur,
      |  ROUND(SUM((pc - pr) * LN(pc / pr)), 6) AS psi
      |FROM shares
      |GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q184 — one-way ANOVA across event types on `value` (Fisher): the
    * parametric k-sample sibling of Q163's Kruskal–Wallis, from the SAME
    * sufficient statistics as Q137 (per-type n, Σv, Σv²). Between- and
    * within-group sums of squares via the computational identities
    * SSB = Σ(T_g²/n_g) − T²/N and SSW = ΣΣv² − Σ(T_g²/n_g);
    * F = (SSB/(k−1))/(SSW/(N−k)), plus η² = SSB/SST — the effect size
    * the F-statistic alone hides. One summary row.
    *
    * Exactness: counts are int64; the double terms use one divide per
    * group with the identical textual formula in both engines; only
    * F/η²/SS are rounded (4). SSB is a difference of near-equal sums —
    * the ~1e-12 relative double-order noise is far inside round(4)
    * (the Q137 variance-term precedent). NULL F on degenerate inputs
    * (k<2 or N≤k).
    *
    * Scale notes: one map-side-combined corpus scan to k summary rows;
    * the final fold is a k-row aggregate on the driver-side-free plan.
    */
  def q184(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    typeMoments(c)
      .agg(count(lit(1)).as("k"), sum(col("n")).as("n_total"),
        sum(col("s1")).as("t_all"), sum(col("s2")).as("ss_all"),
        sum(col("s1") * col("s1") / col("n").cast("double")).as("sgr"))
      .select(col("k"), col("n_total"),
        (col("sgr") - col("t_all") * col("t_all") /
          col("n_total").cast("double")).as("ssb"),
        (col("ss_all") - col("sgr")).as("ssw"))
      .select(col("k"), col("n_total"),
        round(col("ssb"), 4).as("ssb"), round(col("ssw"), 4).as("ssw"),
        when(col("k") > 1L && col("n_total") > col("k") && col("ssw") > 0.0,
          round((col("ssb") / (col("k") - 1L).cast("double")) /
            (col("ssw") / (col("n_total") - col("k")).cast("double")), 4))
          .as("f"),
        when(col("ssb") + col("ssw") > 0.0,
          round(col("ssb") / (col("ssb") + col("ssw")), 6)).as("eta2"))
  }

  val q184Oracle: String =
    """WITH m AS (
      |  SELECT event_type, COUNT(value) AS n, SUM(value) AS s1,
      |         SUM(value*value) AS s2
      |  FROM events GROUP BY 1),
      |tot AS (
      |  SELECT COUNT(*) AS k, CAST(SUM(n) AS BIGINT) AS n_total,
      |    SUM(s1) AS t_all, SUM(s2) AS ss_all,
      |    SUM(s1 * s1 / CAST(n AS DOUBLE)) AS sgr
      |  FROM m),
      |ss AS (
      |  SELECT k, n_total,
      |    sgr - t_all * t_all / CAST(n_total AS DOUBLE) AS ssb,
      |    ss_all - sgr AS ssw
      |  FROM tot)
      |SELECT k, n_total, ROUND(ssb, 4) AS ssb, ROUND(ssw, 4) AS ssw,
      |  CASE WHEN k > 1 AND n_total > k AND ssw > 0 THEN
      |    ROUND((ssb / CAST(k - 1 AS DOUBLE))
      |      / (ssw / CAST(n_total - k AS DOUBLE)), 4) END AS f,
      |  CASE WHEN ssb + ssw > 0 THEN
      |    ROUND(ssb / (ssb + ssw), 6) END AS eta2
      |FROM ss""".stripMargin

  /** Q199 — nonparametric bootstrap 95% CI for mean daily revenue per
    * event type (Efron 1979, percentile method), with the resampling
    * DERANDOMIZED: replicate b's s-th draw is md5('bs:type:b:s') % n —
    * reproducible across engines, runs, and partitionings, the same trick
    * as Q101/Q108's seeded sampling. B = 200 replicates of the n observed
    * daily sums; the CI is the nearest-rank 2.5%/97.5% of the replicate
    * means (ranks 5 and 195 — rank-and-pick, Q54 discipline).
    *
    * Determinism: every replicate mean is an exact int64 cents sum with
    * ONE final divide; the rank order is on exact (sum, b) integers, so
    * the picked quantiles cannot flip cross-engine.
    *
    * Scale notes: the bootstrap runs on the AGGREGATED (type, day) grid
    * — types×days rows, microscopic next to the event corpus — so the
    * B×n expansion (co-keyed join against the indexed grid, one shuffle
    * on (type, i)) is bounded by 200·|grid|, independent of event count.
    * At 100 TB the only corpus-sized work remains the first daily
    * aggregate.
    */
  def q199(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events.groupBy(col("event_type"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val wD = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    val idx = daily.withColumn("i", row_number().over(wD))
      .select(col("event_type"), col("i"), col("cents")).localCheckpoint()
    val st = idx.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("tot"))
    val picks = st.select(col("event_type").as("et"), col("n"))
      .withColumn("b", explode(sequence(lit(0), lit(199))))
      .withColumn("s", explode(sequence(lit(0), col("n") - 1)))
      .withColumn("pick", expr(NearDup.hexValueFastExpr(
        "md5(concat('bs:', et, ':', CAST(b AS STRING), ':', CAST(s AS STRING)))"))
        % col("n") + 1)
    val means = picks.join(idx,
        picks("et") === idx("event_type") && picks("pick") === idx("i"))
      .groupBy(col("et"), col("b")).agg(sum(col("cents")).as("sc"))
    val wR = org.apache.spark.sql.expressions.Window
      .partitionBy(col("et")).orderBy(col("sc"), col("b"))
    val ci = means.withColumn("rk", row_number().over(wR))
      .groupBy(col("et"))
      .agg(max(when(col("rk") === 5, col("sc"))).as("sc_lo"),
        max(when(col("rk") === 195, col("sc"))).as("sc_hi"))
    st.join(ci, st("event_type") === ci("et"))
      .select(col("event_type"), col("n").as("n_days"),
        round(col("tot").cast("double") / (col("n").cast("double") * 100.0), 4)
          .as("mean_rev"),
        round(col("sc_lo").cast("double") / (col("n").cast("double") * 100.0), 4)
          .as("ci_lo"),
        round(col("sc_hi").cast("double") / (col("n").cast("double") * 100.0), 4)
          .as("ci_hi"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q199Oracle: String = {
    val pick = NearDup.hexValueExpr(
      "md5('bs:' || event_type || ':' || CAST(b AS VARCHAR) || ':' || CAST(s AS VARCHAR))")
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents
       |  FROM events GROUP BY 1, 2),
       |idx AS (
       |  SELECT event_type, cents,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
       |  FROM daily),
       |st AS (SELECT event_type, COUNT(*) AS n, SUM(cents) AS tot
       |       FROM idx GROUP BY 1),
       |e1 AS (SELECT event_type, n, UNNEST(range(200)) AS b FROM st),
       |e2 AS (SELECT event_type, n, b, UNNEST(range(n)) AS s FROM e1),
       |picks AS (
       |  SELECT event_type, b, ($pick) % n + 1 AS pick FROM e2),
       |means AS (
       |  SELECT p.event_type, p.b, SUM(i.cents) AS sc
       |  FROM picks p JOIN idx i
       |    ON i.event_type = p.event_type AND i.i = p.pick
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT event_type, sc, ROW_NUMBER() OVER (
       |    PARTITION BY event_type ORDER BY sc, b) AS rk
       |  FROM means),
       |ci AS (
       |  SELECT event_type,
       |    MAX(CASE WHEN rk = 5 THEN sc END) AS sc_lo,
       |    MAX(CASE WHEN rk = 195 THEN sc END) AS sc_hi
       |  FROM ranked GROUP BY 1)
       |SELECT st.event_type, CAST(st.n AS BIGINT) AS n_days,
       |  ROUND(CAST(st.tot AS DOUBLE) / (CAST(st.n AS DOUBLE) * 100.0), 4)
       |    AS mean_rev,
       |  ROUND(CAST(ci.sc_lo AS DOUBLE) / (CAST(st.n AS DOUBLE) * 100.0), 4)
       |    AS ci_lo,
       |  ROUND(CAST(ci.sc_hi AS DOUBLE) / (CAST(st.n AS DOUBLE) * 100.0), 4)
       |    AS ci_hi
       |FROM st JOIN ci ON ci.event_type = st.event_type
       |ORDER BY st.event_type NULLS FIRST""".stripMargin
  }

  /** Q204 — winsorized and trimmed means per event type (10% per tail):
    * the robust location estimates between Q93's MAD and the raw mean —
    * trimming DROPS the k = ⌊n/10⌋ extreme values per side, winsorizing
    * CLAMPS them to the cut values. Emits per type: n, k, the exact cut
    * values, raw/trimmed/winsorized means — the three-way comparison
    * that quantifies tail influence on the metric a dashboard reports.
    *
    * Determinism: values are exact cents; the cut positions are
    * rank-and-pick on the (value, event_id) total order (Q54
    * discipline); all three numerators are exact int64 sums —
    * winsorized = Σmiddle + k·lo + k·hi — with ONE final divide each
    * (round 4). No interpolation, no float accumulation.
    *
    * Scale notes: one window sort per type (the same sort Q138's ranks
    * ride), then a bounded aggregate; at petabyte row counts the
    * production path swaps the exact ranks for C15 KLL sketch cut
    * values and a map-side clamp — same algebra, sketch-approximate
    * cuts.
    */
  def q204(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val vals = c.events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"), col("event_id"))
    val wT = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("cents"), col("event_id"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    val ranked = vals
      .withColumn("rk", row_number().over(wT))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("k", expr("n DIV 10"))
    ranked.groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n"),
        max(col("k")).as("k"),
        max(when(col("rk") === col("k") + 1, col("cents"))).as("lo_cents"),
        max(when(col("rk") === col("n") - col("k"), col("cents"))).as("hi_cents"),
        sum(col("cents")).as("s_all"),
        sum(when(col("rk") > col("k") && col("rk") <= col("n") - col("k"),
          col("cents")).otherwise(0L)).as("s_mid"))
      .select(col("event_type"), col("n"), col("k"),
        round(col("lo_cents").cast("double") / 100.0, 2).as("cut_lo"),
        round(col("hi_cents").cast("double") / 100.0, 2).as("cut_hi"),
        round(col("s_all").cast("double") /
          (col("n").cast("double") * 100.0), 4).as("mean_raw"),
        round(col("s_mid").cast("double") /
          ((col("n") - lit(2L) * col("k")).cast("double") * 100.0), 4)
          .as("mean_trimmed"),
        round((col("s_mid") + col("k") * col("lo_cents") +
          col("k") * col("hi_cents")).cast("double") /
          (col("n").cast("double") * 100.0), 4).as("mean_winsorized"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q204Oracle: String =
    """WITH vals AS (
      |  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
      |    event_id
      |  FROM events),
      |ranked AS (
      |  SELECT event_type, cents,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY cents, event_id) AS rk,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM vals),
      |agg AS (
      |  SELECT event_type, MAX(n) AS n, MAX(n // 10) AS k,
      |    MAX(CASE WHEN rk = n // 10 + 1 THEN cents END) AS lo_cents,
      |    MAX(CASE WHEN rk = n - n // 10 THEN cents END) AS hi_cents,
      |    SUM(cents) AS s_all,
      |    SUM(CASE WHEN rk > n // 10 AND rk <= n - n // 10
      |        THEN cents ELSE 0 END) AS s_mid
      |  FROM ranked GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
      |  ROUND(CAST(lo_cents AS DOUBLE) / 100.0, 2) AS cut_lo,
      |  ROUND(CAST(hi_cents AS DOUBLE) / 100.0, 2) AS cut_hi,
      |  ROUND(CAST(s_all AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0), 4)
      |    AS mean_raw,
      |  ROUND(CAST(s_mid AS DOUBLE)
      |    / (CAST(n - 2 * k AS DOUBLE) * 100.0), 4) AS mean_trimmed,
      |  ROUND(CAST(s_mid + k * lo_cents + k * hi_cents AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * 100.0), 4) AS mean_winsorized
      |FROM agg
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q215 — higher-moment normality profile per event type: population
    * skewness g₁ = m₃/m₂^1.5, excess-free kurtosis g₂ = m₄/m₂², and the
    * Jarque–Bera statistic JB = n/6·(g₁² + (g₂−3)²/4) with its χ²₂ 5%
    * verdict (JB > 5.99 ⇒ non-normal) — the distribution-shape gate a
    * modeling pipeline checks before assuming Gaussian residuals
    * (complements Q137's mean tests and Q211's drift bins).
    *
    * Determinism: raw power sums Σv..Σv⁴ are double aggregates with
    * IDENTICAL expression text in both engines (Q137's discipline —
    * cross-engine double-sum order differs at ~1e-12 relative, far
    * inside the final ROUND-4); central moments come from the raw-
    * moment identities, evaluated in the same association order.
    *
    * Scale: one scan to (n, Σv, Σv², Σv³, Σv⁴) per type — map-side
    * combinable, k output rows at any corpus size.
    */
  def q215(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val m = c.events.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("value")).as("s1"),
      sum(col("value") * col("value")).as("s2"),
      sum(col("value") * col("value") * col("value")).as("s3"),
      sum(col("value") * col("value") * col("value") * col("value")).as("s4"))
    m.withColumn("mu", col("s1") / col("n"))
      .withColumn("m2", col("s2") / col("n") - col("mu") * col("mu"))
      .withColumn("m3", col("s3") / col("n")
        - lit(3.0) * col("mu") * (col("s2") / col("n"))
        + lit(2.0) * col("mu") * col("mu") * col("mu"))
      .withColumn("m4", col("s4") / col("n")
        - lit(4.0) * col("mu") * (col("s3") / col("n"))
        + lit(6.0) * col("mu") * col("mu") * (col("s2") / col("n"))
        - lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu"))
      .withColumn("skewness", round(col("m3") / pow(col("m2"), 1.5), 4))
      .withColumn("kurtosis", round(col("m4") / (col("m2") * col("m2")), 4))
      .withColumn("jb", round(col("n") / lit(6.0)
        * (pow(col("m3") / pow(col("m2"), 1.5), 2.0)
          + pow(col("m4") / (col("m2") * col("m2")) - lit(3.0), 2.0)
            / lit(4.0)), 4))
      .withColumn("verdict",
        when(col("jb") > 5.99, "non_normal").otherwise("normal"))
      .select(col("event_type"), col("n"), round(col("mu"), 4).as("mean"),
        col("skewness"), col("kurtosis"), col("jb"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q215Oracle: String =
    """WITH m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    SUM(value) AS s1,
      |    SUM(value * value) AS s2,
      |    SUM(value * value * value) AS s3,
      |    SUM(value * value * value * value) AS s4
      |  FROM events GROUP BY 1),
      |c AS (
      |  SELECT event_type, n, s1 / n AS mu, s2, s3, s4 FROM m),
      |cm AS (
      |  SELECT event_type, n, mu,
      |    s2 / n - mu * mu AS m2,
      |    s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu AS m3,
      |    s4 / n - 4.0 * mu * (s3 / n) + 6.0 * mu * mu * (s2 / n)
      |      - 3.0 * mu * mu * mu * mu AS m4
      |  FROM c)
      |SELECT event_type, n, ROUND(mu, 4) AS mean,
      |  ROUND(m3 / POW(m2, 1.5), 4) AS skewness,
      |  ROUND(m4 / (m2 * m2), 4) AS kurtosis,
      |  ROUND(n / 6.0 * (POW(m3 / POW(m2, 1.5), 2)
      |    + POW(m4 / (m2 * m2) - 3.0, 2) / 4.0), 4) AS jb,
      |  CASE WHEN ROUND(n / 6.0 * (POW(m3 / POW(m2, 1.5), 2)
      |      + POW(m4 / (m2 * m2) - 3.0, 2) / 4.0), 4) > 5.99
      |    THEN 'non_normal' ELSE 'normal' END AS verdict
      |FROM cm
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** The zero-filled per-type daily revenue-cents grid on the GLOBAL
    * [dmin, dmax] day spine — the shared series base of the whole
    * Stats/Trend/Behavior spine (~34 gates). Since round 11 this is the
    * bucketed [[Derived.dailyCentsGrid]] ARTIFACT: the `events` corpus
    * scan + (type, day) aggregate runs once per dataset drop instead of
    * once per consumer execution (34 corpus scans at 100 TB → one), and
    * consumers read a types × calendar-days relation bucketed/sorted on
    * (event_type, day) — the exact layout their per-type day windows
    * want.
    */
  private[operators] def dailyCentsGrid(spark: SparkSession, c: Catalog): DataFrame =
    Derived.dailyCentsGrid(spark, c.dir)

  /** The shared DuckDB text of [[dailyCentsGrid]]. */
  private[operators] val gridSql: String =
    """daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM daily),
      |spine AS (SELECT UNNEST(generate_series(dmin, dmax)) AS day FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM daily),
      |grid AS (
      |  SELECT t.event_type, s.day, COALESCE(d.v, 0) AS v
      |  FROM types t CROSS JOIN spine s
      |  LEFT JOIN daily d
      |    ON d.event_type = t.event_type AND d.day = s.day)""".stripMargin

  /** Q227 — Mann–Kendall trend test + Kendall τ-b per event type on the
    * zero-filled daily revenue series (Mann 1945; Kendall 1975): the
    * NONPARAMETRIC sibling of Q125's OLS slope — S = Σ_{i<j}
    * sign(v_j − v_i) over all day pairs, the tie-corrected variance
    * var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 (t = value-tie group
    * sizes, which the zero-filled gaps exercise), the
    * continuity-corrected z = (S∓1)/√var(S), and
    * τ-b = S/√(n₀(n₀−n₁)) with n₀ = n(n−1)/2, n₁ = Σ_t t(t−1)/2 (the
    * time axis has no ties). Monotone-trend detection that no outlier
    * day can flip — the robustness Q130's Theil–Sen slope gives the
    * estimate, this gives the significance.
    *
    * Determinism: S, n₀, n₁, and both variance polynomials are exact
    * int64 (n ≤ calendar days, so n³ terms are microscopic); z and τ-b
    * are one √+divide each over identical doubles, rounded 4. Verdict
    * compares the ROUNDED z against ±1.96 so the fence itself is
    * engine-stable.
    *
    * Scale notes: the pairwise Σ runs on the bounded per-type spine
    * (days²/2 pairs per type — thousands of rows at ANY corpus size,
    * after the one corpus-scan daily aggregate). The tie table is
    * |distinct cents values| per type, also spine-bounded.
    */
  def q227(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val a = grid.select(col("event_type"), col("day").as("di"), col("v").as("vi"))
    val b = grid.select(col("event_type").as("tb"), col("day").as("dj"),
      col("v").as("vj"))
    val s = a.join(b, col("event_type") === col("tb") && col("di") < col("dj"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("vj") > col("vi"), 1L)
        .when(col("vj") < col("vi"), -1L).otherwise(0L)).cast("long").as("s"))
    val base = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"))
    val ties = grid.groupBy(col("event_type"), col("v"))
      .agg(count(lit(1)).cast("long").as("t"))
      .groupBy(col("event_type"))
      .agg(sum(expr("(t * (t - 1)) div 2")).cast("long").as("n1"),
        sum(col("t") * (col("t") - 1L) * (col("t") * 2L + 5L)).cast("long")
          .as("tie_poly"))
    // left join + 0: a 1-day spine has no (i < j) pair, so the S
    // aggregate emits nothing for that type — the row should still
    // exist (S = 0, guards NULL the statistics), not vanish
    base.join(s, Seq("event_type"), "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
      .join(ties, Seq("event_type"))
      .withColumn("n0", expr("(n * (n - 1)) div 2"))
      .withColumn("var18",
        col("n") * (col("n") - 1L) * (col("n") * 2L + 5L) - col("tie_poly"))
      .withColumn("tau_b",
        when(col("n0") - col("n1") > 0L,
          round(col("s").cast("double") /
            sqrt(col("n0").cast("double") * (col("n0") - col("n1"))
              .cast("double")), 4)))
      .withColumn("z",
        when(col("var18") > 0L,
          round(when(col("s") > 0L, (col("s") - 1L).cast("double"))
            .when(col("s") < 0L, (col("s") + 1L).cast("double"))
            .otherwise(lit(0.0)) /
            sqrt(col("var18").cast("double") / 18.0), 4)))
      .withColumn("trend",
        when(col("z") >= 1.96, "increasing")
          .when(col("z") <= -1.96, "decreasing").otherwise("none"))
      .select(col("event_type"), col("n").as("n_days"), col("s"),
        col("n1").as("n_ties"), col("tau_b"), col("z"), col("trend"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q227Oracle: String =
    s"""WITH $gridSql,
       |s AS (
       |  SELECT a.event_type,
       |    CAST(SUM(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1
       |      ELSE 0 END) AS BIGINT) AS s
       |  FROM grid a JOIN grid b
       |    ON b.event_type = a.event_type AND a.day < b.day
       |  GROUP BY 1),
       |base AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM grid GROUP BY 1),
       |tg AS (
       |  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS t
       |  FROM grid GROUP BY 1, 2),
       |ties AS (
       |  SELECT event_type,
       |    CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n1,
       |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_poly
       |  FROM tg GROUP BY 1),
       |j AS (
       |  SELECT base.event_type, base.n,
       |    COALESCE(s.s, 0) AS s, ties.n1, ties.tie_poly,
       |    base.n * (base.n - 1) // 2 AS n0,
       |    base.n * (base.n - 1) * (2 * base.n + 5) - ties.tie_poly AS var18
       |  FROM base
       |  LEFT JOIN s ON s.event_type = base.event_type
       |  JOIN ties ON ties.event_type = base.event_type),
       |fin AS (
       |  SELECT event_type, n, s, n1,
       |    CASE WHEN n0 - n1 > 0 THEN
       |      ROUND(CAST(s AS DOUBLE)
       |        / SQRT(CAST(n0 AS DOUBLE) * CAST(n0 - n1 AS DOUBLE)), 4)
       |    END AS tau_b,
       |    CASE WHEN var18 > 0 THEN
       |      ROUND((CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
       |             WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) ELSE 0.0 END)
       |        / SQRT(CAST(var18 AS DOUBLE) / 18.0), 4)
       |    END AS z
       |  FROM j)
       |SELECT event_type, n AS n_days, s, n1 AS n_ties, tau_b, z,
       |  CASE WHEN z >= 1.96 THEN 'increasing'
       |       WHEN z <= -1.96 THEN 'decreasing' ELSE 'none' END AS trend
       |FROM fin
       |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q228 — CUPED variance reduction for the Q108 A/B split (Deng,
    * Xu, Kohavi & Walker, WSDM 2013): per user, pre-period cents
    * (first half of the global day span) is the covariate x, post-
    * period cents the metric y; θ = cov(x,y)/var(x) is fit POOLED
    * across both md5 buckets (the standard all-traffic fit, so θ is
    * identical for both arms), and each bucket reports its raw vs
    * CUPED-adjusted mean ŷ_b = ȳ_b − θ(x̄_b − x̄) and the realized
    * per-bucket variance reduction 1 − var(y−θx)/var(y). The
    * experiment readout that narrows Q108's Wilson intervals without
    * touching the treatment assignment.
    *
    * Determinism: all moment sums (Σx, Σy, Σx², Σy², Σxy) are exact
    * int64 per bucket and pooled (per-user cents ≤ ~1e7 at sf0.1, so
    * Σxy ≲ 1e17 — int64 headroom; a 100 TB deployment widens the
    * moment columns to DECIMAL(38,0), same plan); θ and every output
    * assemble from them with the identical textual formula, rounded
    * at the end. Bucket = md5('exp1:'||user_id) % 2 — Q108's exact
    * assignment, so the two gates describe the same experiment.
    *
    * Scale notes: one corpus scan → per-(user, era) cents (shuffle on
    * user), pivot to (x, y) per user, then a 2-row bucket aggregate +
    * a broadcast 1-row pooled join. Nothing beyond the user aggregate
    * scales with the corpus.
    */
  /** The per-user experiment panel: md5 'exp1:' arm assignment (Q108's
    * exact bucket), pre-period x and post-period y cents on the global
    * midpoint day cut (zero-filled eras). The shared base of Q228
    * (CUPED) and Q232 (DiD) — built once so gates that describe the
    * same experiment can never drift apart on the cut or the
    * assignment.
    */
  private def expPanel(c: Catalog): DataFrame = {
    val ev = c.events.select(col("user_id"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents"))
    val ext = ev.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .withColumn("cut",
        // integer div: Column./ is double division, which would shift
        // the era fence by half a day vs the oracle's // on odd spans
        expr("dmin + (dmax - dmin + 1) div 2"))
    ev.crossJoin(broadcast(ext))
      .groupBy(col("user_id"))
      .agg(sum(when(col("day") < col("cut"), col("cents")).otherwise(0L))
        .cast("long").as("x"),
        sum(when(col("day") >= col("cut"), col("cents")).otherwise(0L))
          .cast("long").as("y"))
      .withColumn("h", md5(concat(lit("exp1:"), col("user_id").cast("string"))))
      .withColumn("bucket", expr(NearDup.hexValueFastExpr("h")) % 2)
  }

  /** The shared DuckDB text of [[expPanel]] (ev/ext/per_user CTEs). */
  private val panelSql: String = {
    val hv = NearDup.hexValueExpr(
      "md5('exp1:' || CAST(user_id AS VARCHAR))")
    s"""ev AS (
       |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
       |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
       |  FROM events),
       |ext AS (
       |  SELECT MIN(day) AS dmin, MAX(day) AS dmax,
       |    MIN(day) + (MAX(day) - MIN(day) + 1) // 2 AS cut
       |  FROM ev),
       |per_user AS (
       |  SELECT user_id,
       |    CAST(SUM(CASE WHEN day < (SELECT cut FROM ext) THEN cents
       |      ELSE 0 END) AS BIGINT) AS x,
       |    CAST(SUM(CASE WHEN day >= (SELECT cut FROM ext) THEN cents
       |      ELSE 0 END) AS BIGINT) AS y,
       |    ($hv) % 2 AS bucket
       |  FROM ev GROUP BY user_id)""".stripMargin
  }

  def q228(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val perUser = expPanel(c)
    val pooled = perUser.agg(count(lit(1)).cast("long").as("np"),
        sum(col("x")).cast("long").as("sxp"),
        sum(col("y")).cast("long").as("syp"),
        sum(col("x") * col("x")).cast("long").as("sxxp"),
        sum(col("x") * col("y")).cast("long").as("sxyp"))
      // products of the int64 sums exceed int64 → assemble in DOUBLE
      // (Q216 pattern; identical formula text in the oracle). The
      // covariate-variance denominator is ≥ 0 by Cauchy–Schwarz and 0
      // exactly when every user's x is identical (e.g. a single-day
      // drop) — guard it so both engines agree on NULL instead of
      // diverging NULL-vs-NaN on degenerate data.
      .withColumn("thden",
        col("np").cast("double") * col("sxxp")
          - col("sxp").cast("double") * col("sxp"))
      .withColumn("theta",
        when(col("thden") > 0.0,
          (col("np").cast("double") * col("sxyp")
            - col("sxp").cast("double") * col("syp")) / col("thden")))
      .withColumn("xbar", col("sxp").cast("double") / col("np"))
    perUser.groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("y")).cast("long").as("sy"),
        sum(col("x") * col("x")).cast("long").as("sxx"),
        sum(col("y") * col("y")).cast("long").as("syy"),
        sum(col("x") * col("y")).cast("long").as("sxy"))
      .crossJoin(broadcast(pooled.select(col("theta"), col("xbar"))))
      .withColumn("mean_y", col("sy").cast("double") / col("n"))
      .withColumn("mean_x", col("sx").cast("double") / col("n"))
      .withColumn("var_y",
        (col("n").cast("double") * col("syy")
          - col("sy").cast("double") * col("sy")) /
        (col("n").cast("double") * (col("n").cast("double") - 1.0)))
      .withColumn("var_adj",
        ((col("n").cast("double") * col("syy")
            - col("sy").cast("double") * col("sy"))
          - lit(2.0) * col("theta") * (col("n").cast("double") * col("sxy")
            - col("sx").cast("double") * col("sy"))
          + col("theta") * col("theta")
            * (col("n").cast("double") * col("sxx")
              - col("sx").cast("double") * col("sx"))) /
        (col("n").cast("double") * (col("n").cast("double") - 1.0)))
      .select(col("bucket").cast("long").as("bucket"),
        col("n").as("n_users"),
        round(col("theta"), 6).as("theta"),
        round(col("mean_y") / 100.0, 4).as("mean_post"),
        round((col("mean_y") - col("theta") * (col("mean_x") - col("xbar")))
          / 100.0, 4).as("mean_cuped"),
        round(col("var_y") / 10000.0, 4).as("var_post"),
        round(col("var_adj") / 10000.0, 4).as("var_cuped"),
        // 1-user arm (var 0/0 = NaN) or all-equal y (var 0) → NULL, not
        // a NULL-vs-NaN cross-engine divergence; the n guard is integer
        // so the NaN never reaches the float comparison
        when(col("n") > 1L && col("var_y") > 0.0,
          round(lit(1.0) - col("var_adj") / col("var_y"), 4))
          .as("var_reduction"))
      .orderBy(asc_nulls_first("bucket"))
  }

  val q228Oracle: String =
    s"""WITH $panelSql,
       |pooled AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS np,
       |    CAST(SUM(x) AS BIGINT) AS sxp, CAST(SUM(y) AS BIGINT) AS syp,
       |    CAST(SUM(x * x) AS BIGINT) AS sxxp,
       |    CAST(SUM(x * y) AS BIGINT) AS sxyp
       |  FROM per_user),
       |pth AS (
       |  SELECT CASE WHEN CAST(np AS DOUBLE) * sxxp
       |        - CAST(sxp AS DOUBLE) * sxp > 0.0 THEN
       |      (CAST(np AS DOUBLE) * sxyp - CAST(sxp AS DOUBLE) * syp)
       |        / (CAST(np AS DOUBLE) * sxxp - CAST(sxp AS DOUBLE) * sxp)
       |      END AS theta,
       |    CAST(sxp AS DOUBLE) / np AS xbar
       |  FROM pooled),
       |bk AS (
       |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x * x) AS BIGINT) AS sxx,
       |    CAST(SUM(y * y) AS BIGINT) AS syy,
       |    CAST(SUM(x * y) AS BIGINT) AS sxy
       |  FROM per_user GROUP BY 1),
       |d AS (
       |  SELECT bucket, n, theta, xbar,
       |    CAST(sy AS DOUBLE) / n AS mean_y,
       |    CAST(sx AS DOUBLE) / n AS mean_x,
       |    (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
       |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_y,
       |    ((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
       |      - 2.0 * theta * (CAST(n AS DOUBLE) * sxy
       |        - CAST(sx AS DOUBLE) * sy)
       |      + theta * theta * (CAST(n AS DOUBLE) * sxx
       |        - CAST(sx AS DOUBLE) * sx))
       |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_adj
       |  FROM bk CROSS JOIN pth)
       |SELECT CAST(bucket AS BIGINT) AS bucket, n AS n_users,
       |  ROUND(theta, 6) AS theta,
       |  ROUND(mean_y / 100.0, 4) AS mean_post,
       |  ROUND((mean_y - theta * (mean_x - xbar)) / 100.0, 4) AS mean_cuped,
       |  ROUND(var_y / 10000.0, 4) AS var_post,
       |  ROUND(var_adj / 10000.0, 4) AS var_cuped,
       |  CASE WHEN n > 1 AND var_y > 0.0
       |    THEN ROUND(1.0 - var_adj / var_y, 4) END AS var_reduction
       |FROM d
       |ORDER BY bucket NULLS FIRST""".stripMargin

  /** Q229 — derandomized paired sign-flip permutation test between every
    * event-type pair (Fisher 1935, randomization form): the day-paired
    * difference d(day) = v_a − v_b on the zero-filled common spine has
    * observed statistic T_obs = Σd; under the exchangeability null each
    * of P = 199 replicates flips every day's sign by the md5 parity
    * ε(p, day) = ±1 (Q199's derandomization discipline), and the
    * p-value is the standard add-one rank (1 + #{|T_p| ≥ |T_obs|})/200.
    * The EXACT-arithmetic significance companion to Q137's Welch t
    * (whose normality assumption Q215 audits): every T is an int64
    * cents sum, so the |T_p| ≥ |T_obs| comparisons are integer-exact
    * and the p-value cannot flip cross-engine.
    *
    * Scale notes: the replicate expansion runs on the bounded spine —
    * pairs × days × 199 rows (≈10⁶ at any corpus size), one shuffle
    * keyed (pair, p), after the single corpus-scan daily aggregate.
    * The md5 parities make it reproducible across engines, runs, and
    * partitionings.
    */
  def q229(spark: SparkSession, dir: String): DataFrame =
    signFlipCounts(spark, dir)
      .withColumn("p_value",
        round((lit(1.0) + col("n_extreme")) / 200.0, 4))
      .withColumn("verdict",
        when(col("p_value") < 0.05, "reject_null").otherwise("retain_null"))
      .select(col("type_a"), col("type_b"), col("n_days"), col("t_obs"),
        col("n_extreme"), col("p_value"), col("verdict"))
      .orderBy(asc_nulls_first("type_a"), asc_nulls_first("type_b"))

  /** Shared core of Q229/Q256: the derandomized sign-flip permutation
    * machinery up to the exact per-pair exceedance count — (type_a,
    * type_b, n_days, t_obs, n_extreme), T statistics in exact int64
    * cents over 199 md5-parity replicates. */
  private def signFlipCounts(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val a = grid.select(col("event_type").as("type_a"), col("day"),
      col("v").as("va"))
    val b = grid.select(col("event_type").as("type_b"), col("day").as("db"),
      col("v").as("vb"))
    val diffs = a.join(b,
        col("type_a") < col("type_b") && col("db") === col("day"))
      .select(col("type_a"), col("type_b"), col("day"),
        (col("va") - col("vb")).as("d"))
      .localCheckpoint()
    val obs = diffs.groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("d")).cast("long").as("t_obs"))
    val perms = diffs
      .withColumn("p", explode(sequence(lit(0), lit(198))))
      .withColumn("h", md5(concat(lit("pm:"), col("type_a"), lit(":"),
        col("type_b"), lit(":"), col("p").cast("string"), lit(":"),
        col("day").cast("string"))))
      .withColumn("eps",
        when(expr(NearDup.hexValueFastExpr("h")) % 2 === 0L, 1L).otherwise(-1L))
      .groupBy(col("type_a"), col("type_b"), col("p"))
      .agg(sum(col("eps") * col("d")).cast("long").as("t_p"))
    perms.join(obs, Seq("type_a", "type_b"))
      .groupBy(col("type_a"), col("type_b"), col("n_days"), col("t_obs"))
      .agg(sum(when(abs(col("t_p")) >= abs(col("t_obs")), 1L).otherwise(0L))
        .cast("long").as("n_extreme"))
  }

  /** Shared DuckDB text of [[signFlipCounts]] (the CTE chain ending in
    * `cnt`), composed under `WITH $gridSql` by the Q229/Q256 oracles. */
  private val signFlipCntSql: String = {
    val hv = NearDup.hexValueExpr(
      "md5('pm:' || type_a || ':' || type_b || ':' || " +
        "CAST(p AS VARCHAR) || ':' || CAST(day AS VARCHAR))")
    s"""diffs AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b, a.day,
       |    a.v - b.v AS d
       |  FROM grid a JOIN grid b
       |    ON a.event_type < b.event_type AND b.day = a.day),
       |obs AS (
       |  SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_days,
       |    CAST(SUM(d) AS BIGINT) AS t_obs
       |  FROM diffs GROUP BY 1, 2),
       |ex AS (
       |  SELECT type_a, type_b, day, d, UNNEST(range(199)) AS p
       |  FROM diffs),
       |flips AS (
       |  SELECT type_a, type_b, p,
       |    CAST(SUM((CASE WHEN ($hv) % 2 = 0 THEN 1 ELSE -1 END) * d)
       |      AS BIGINT) AS t_p
       |  FROM ex GROUP BY 1, 2, 3),
       |cnt AS (
       |  SELECT f.type_a, f.type_b, o.n_days, o.t_obs,
       |    CAST(SUM(CASE WHEN ABS(f.t_p) >= ABS(o.t_obs) THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_extreme
       |  FROM flips f
       |  JOIN obs o ON o.type_a = f.type_a AND o.type_b = f.type_b
       |  GROUP BY 1, 2, 3, 4)""".stripMargin
  }

  val q229Oracle: String =
    s"""WITH $gridSql,
       |$signFlipCntSql
       |SELECT type_a, type_b, n_days, t_obs, n_extreme,
       |  ROUND((1.0 + n_extreme) / 200.0, 4) AS p_value,
       |  CASE WHEN ROUND((1.0 + n_extreme) / 200.0, 4) < 0.05
       |    THEN 'reject_null' ELSE 'retain_null' END AS verdict
       |FROM cnt
       |ORDER BY type_a NULLS FIRST, type_b NULLS FIRST""".stripMargin

  /** Q230 — per-source quantile normalization of the doc token-length
    * distribution (Bolstad et al., Bioinformatics 2003 — the microarray
    * batch-effect correction, applied to corpus-mixture length bias):
    * each doc's per-source rank r (of n_s, tie-broken by doc_id) maps to
    * the POOLED length distribution's value at index ⌊r·N/n_s⌋ via the
    * discrete CDF. A source whose docs run short gets its distribution
    * replaced by the corpus-wide one — the normalization a mixture
    * builder applies before length-balanced sampling (Q71's mixtures
    * assume comparable length profiles; this is the correction when they
    * are not). Reports per-source raw vs normalized mean/median and the
    * mean shift.
    *
    * Determinism: ranks, CDF bounds, and the index arithmetic are exact
    * int64, and determinism rests on the per-source (len, doc_id) rank
    * tiebreak — the pooled side is a pure function of the grouped CDF,
    * so it needs no tiebreak of its own; means are one divide over
    * int64 sums, rounded 4.
    *
    * Scale notes: no global row-ranking — the pooled distribution is the
    * grouped length CDF (|distinct token-lengths| rows, bounded by max
    * doc length at any corpus size), broadcast into a range join against
    * the per-source window ranks. One corpus scan, one source-keyed
    * window, one broadcast join.
    */
  def q230(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("len"))
    val cdf = docs.groupBy(col("len")).agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("cum",
        sum(col("cnt")).over(Window.orderBy(asc("len"))).cast("long"))
      .select(col("len").as("qlen"), col("cnt"), col("cum"))
    val tot = docs.agg(count(lit(1)).cast("long").as("n_tot"))
    val ranked = docs
      .withColumn("r", row_number()
        .over(Window.partitionBy(col("source"))
          .orderBy(asc("len"), asc("doc_id"))).cast("long"))
      .withColumn("n_s",
        count(lit(1)).over(Window.partitionBy(col("source"))).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("idx", expr("(r * n_tot) div n_s"))
    ranked.join(broadcast(cdf),
        col("idx") > col("cum") - col("cnt") && col("idx") <= col("cum"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("len")).cast("long").as("sum_raw"),
        sum(col("qlen")).cast("long").as("sum_norm"),
        max(when(col("r") === expr("(n_s + 1) div 2"), col("len")))
          .cast("long").as("p50_raw"),
        max(when(col("r") === expr("(n_s + 1) div 2"), col("qlen")))
          .cast("long").as("p50_norm"))
      .select(col("source"), col("n_docs"),
        round(col("sum_raw").cast("double") / col("n_docs"), 4).as("mean_raw"),
        col("p50_raw"),
        round(col("sum_norm").cast("double") / col("n_docs"), 4).as("mean_norm"),
        col("p50_norm"),
        round((col("sum_norm") - col("sum_raw")).cast("double")
          / col("n_docs"), 4).as("mean_shift"))
      .orderBy(asc_nulls_first("source"))
  }

  val q230Oracle: String =
    """WITH docs AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS len
      |  FROM documents),
      |cdf AS (
      |  SELECT len AS qlen, CAST(COUNT(*) AS BIGINT) AS cnt,
      |    CAST(SUM(COUNT(*)) OVER (ORDER BY len) AS BIGINT) AS cum
      |  FROM docs GROUP BY len),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM docs),
      |ranked AS (
      |  SELECT source, len,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY len, doc_id)
      |      AS BIGINT) AS r,
      |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
      |  FROM docs),
      |norm AS (
      |  SELECT i.source, i.len, i.r, i.n_s, c.qlen
      |  FROM (SELECT source, len, r, n_s,
      |          (r * (SELECT n_tot FROM tot)) // n_s AS idx
      |        FROM ranked) i
      |  JOIN cdf c ON i.idx > c.cum - c.cnt AND i.idx <= c.cum)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  ROUND(CAST(SUM(len) AS DOUBLE) / COUNT(*), 4) AS mean_raw,
      |  CAST(MAX(CASE WHEN r = (n_s + 1) // 2 THEN len END) AS BIGINT)
      |    AS p50_raw,
      |  ROUND(CAST(SUM(qlen) AS DOUBLE) / COUNT(*), 4) AS mean_norm,
      |  CAST(MAX(CASE WHEN r = (n_s + 1) // 2 THEN qlen END) AS BIGINT)
      |    AS p50_norm,
      |  ROUND(CAST(SUM(qlen) - SUM(len) AS DOUBLE) / COUNT(*), 4)
      |    AS mean_shift
      |FROM norm
      |GROUP BY source
      |ORDER BY source NULLS FIRST""".stripMargin

  /** Shared-text formulas for Q231 (the Q108 `wilson` discipline: one
    * string, two engines, bit-identical IEEE evaluation order). The
    * z-sum 2.801585 = z_{α/2}(1.959964) + z_{β}(0.841621) for the
    * standard 5%-significance / 80%-power design point; 3.8415 is the
    * χ²₁ 5% critical value — both pinned as literals so neither engine
    * touches an inverse-CDF.
    */
  private val q231Z = "2.801585"
  private val q231SrmChi2 =
    "CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)"
  private val q231PHat = "CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)"
  private val q231NH = "2.0 * n_a * n_b / (n_a + n_b)"
  private val q231VarC =
    "(CAST(n_t AS DOUBLE) * ss_t - CAST(s_t AS DOUBLE) * s_t)" +
      " / (CAST(n_t AS DOUBLE) * (CAST(n_t AS DOUBLE) - 1.0))"
  private val q231MdeAbs = s"$q231Z * SQRT(2.0 * p_hat * (1.0 - p_hat) / n_h)"
  private val q231MdeCents = s"$q231Z * SQRT(2.0 * var_c / n_h)"

  /** Q231 — experiment HEALTH + DESIGN readout for the Q108 md5 split:
    * the pre-analysis gate every A/B pipeline runs before reading
    * Q108/Q212/Q228/Q229. Health: sample-ratio-mismatch χ² =
    * (n_a−n_b)²/(n_a+n_b) against the χ²₁ 5% fence — a failed SRM
    * invalidates the experiment regardless of the metric movement
    * (Fabijan et al., ICSE-SEIP 2019). Design: minimum detectable
    * effect at 5%/80% for BOTH metric families — the binary conversion
    * MDE (z-sum)·√(2p̂(1−p̂)/n_h) on the pooled rate, and the continuous
    * per-user revenue MDE from the pooled cents variance — with n_h the
    * harmonic per-arm size, so unequal splits are priced correctly.
    * "Converted" is Q11/Q153's session definition — a purchase within
    * 30 min after a view — not has-any-purchase, which saturates to
    * p̂ = 1 on every fixture and would price an MDE of zero.
    *
    * Determinism: counts, converted sums, and the cents moments are
    * exact int64 (Σcents² headroom documented at Q228); every double
    * assembles through the shared-text formulas above with the z/χ²
    * constants as literals, rounded once at the end. The SRM verdict
    * compares the ROUNDED χ² against 3.8415, so the fence itself is
    * engine-stable.
    *
    * Scale notes: one corpus scan for the user aggregate plus Q11's
    * documented user-keyed view×purchase range join for the conversion
    * flag (equi-on-user with range residual — SMJ, never a cross
    * product), then a 2-row conditional pivot to a single output row.
    * Nothing downstream of the user aggregate scales with the corpus.
    */
  def q231(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val us = c.events.select(col("user_id"), col("event_type"),
      expr("ts DIV 1000").as("us"))
    val conv = us.filter(col("event_type") === "view").alias("v")
      .join(us.filter(col("event_type") === "purchase").alias("p"),
        col("p.user_id") === col("v.user_id") &&
          col("p.us") > col("v.us") &&
          col("p.us") <= col("v.us") + lit(1800L * 1000000L))
      .select(col("v.user_id").as("user_id")).distinct()
      .withColumn("converted", lit(1L))
    val flags = c.events
      .withColumn("h", md5(concat(lit("exp1:"), col("user_id").cast("string"))))
      .withColumn("bucket", expr(NearDup.hexValueFastExpr("h")) % 2)
      .groupBy(col("user_id"), col("bucket"))
      .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("cents"))
      .join(conv, Seq("user_id"), "left")
      .withColumn("converted", coalesce(col("converted"), lit(0L)))
    flags.groupBy()
      .agg(
        sum(when(col("bucket") === 0L, 1L).otherwise(0L)).cast("long").as("n_a"),
        sum(when(col("bucket") === 1L, 1L).otherwise(0L)).cast("long").as("n_b"),
        sum(when(col("bucket") === 0L, col("converted")).otherwise(0L))
          .cast("long").as("x_a"),
        sum(when(col("bucket") === 1L, col("converted")).otherwise(0L))
          .cast("long").as("x_b"),
        count(lit(1)).cast("long").as("n_t"),
        sum(col("cents")).cast("long").as("s_t"),
        sum(col("cents") * col("cents")).cast("long").as("ss_t"))
      .withColumn("p_hat", expr(q231PHat))
      .withColumn("n_h", expr(q231NH))
      .withColumn("var_c", expr(q231VarC))
      .select(col("n_a"), col("n_b"), col("x_a"), col("x_b"),
        expr(s"ROUND($q231SrmChi2, 4)").as("srm_chi2"),
        expr(s"CASE WHEN ROUND($q231SrmChi2, 4) > 3.8415 THEN 'fail'" +
          " ELSE 'pass' END").as("srm_verdict"),
        expr("ROUND(p_hat, 6)").as("conv_rate"),
        // degenerate-drop guards (integer/exact predicates, so neither
        // engine ever compares a NaN): an empty arm has no MDE, a
        // zero-conversion corpus has no RELATIVE effect to price, and a
        // <=1-user panel has no variance estimate
        expr(s"CASE WHEN n_a > 0 AND n_b > 0" +
          s" THEN ROUND($q231MdeAbs, 6) END").as("mde_abs"),
        expr(s"CASE WHEN n_a > 0 AND n_b > 0 AND x_a + x_b > 0" +
          s" THEN ROUND(($q231MdeAbs) / p_hat, 4) END").as("mde_rel"),
        expr(s"CASE WHEN n_a > 0 AND n_b > 0 AND n_t > 1" +
          s" THEN ROUND(($q231MdeCents) / 100.0, 4) END").as("mde_value"))
  }

  val q231Oracle: String = {
    val hv = NearDup.hexValueExpr(
      "md5('exp1:' || CAST(e.user_id AS VARCHAR))")
    s"""WITH conv AS (
       |  SELECT DISTINCT v.user_id
       |  FROM events v JOIN events p
       |    ON p.user_id = v.user_id
       |    AND v.event_type = 'view' AND p.event_type = 'purchase'
       |    AND epoch_us(p.ts) > epoch_us(v.ts)
       |    AND epoch_us(p.ts) <= epoch_us(v.ts) + 1800 * 1000000),
       |flags AS (
       |  SELECT e.user_id, ($hv) % 2 AS bucket,
       |    CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS converted,
       |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
       |      AS cents
       |  FROM events e LEFT JOIN conv c ON c.user_id = e.user_id
       |  GROUP BY 1, 2, 3),
       |base AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(SUM(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(SUM(CASE WHEN bucket = 0 THEN converted ELSE 0 END) AS BIGINT)
       |      AS x_a,
       |    CAST(SUM(CASE WHEN bucket = 1 THEN converted ELSE 0 END) AS BIGINT)
       |      AS x_b,
       |    CAST(COUNT(*) AS BIGINT) AS n_t,
       |    CAST(SUM(cents) AS BIGINT) AS s_t,
       |    CAST(SUM(cents * cents) AS BIGINT) AS ss_t
       |  FROM flags),
       |d AS (
       |  SELECT *, $q231PHat AS p_hat, $q231NH AS n_h, $q231VarC AS var_c
       |  FROM base)
       |SELECT n_a, n_b, x_a, x_b,
       |  ROUND($q231SrmChi2, 4) AS srm_chi2,
       |  CASE WHEN ROUND($q231SrmChi2, 4) > 3.8415 THEN 'fail' ELSE 'pass' END
       |    AS srm_verdict,
       |  ROUND(p_hat, 6) AS conv_rate,
       |  CASE WHEN n_a > 0 AND n_b > 0
       |    THEN ROUND($q231MdeAbs, 6) END AS mde_abs,
       |  CASE WHEN n_a > 0 AND n_b > 0 AND x_a + x_b > 0
       |    THEN ROUND(($q231MdeAbs) / p_hat, 4) END AS mde_rel,
       |  CASE WHEN n_a > 0 AND n_b > 0 AND n_t > 1
       |    THEN ROUND(($q231MdeCents) / 100.0, 4) END AS mde_value
       |FROM d""".stripMargin
  }

  /** Q232 — panel difference-in-differences across the Q108 md5 arms ×
    * the Q228 pre/post midpoint cut (Card & Krueger 1994 form): each
    * user's revenue change d = post − pre cents (zero-filled eras, the
    * Q228 panel), DiD = mean(d | arm b) − mean(d | arm a) — identical
    * to the four-cell-mean double difference by construction — with the
    * Welch SE/df on the per-user deltas (the Q212 moment discipline)
    * and the |t| > 1.96 read. Q221 DECOMPOSES an era delta into
    * volume/rate/mix; Q228 narrows a post-period comparison; this is
    * the causal ESTIMATE of the arm effect net of the common time
    * trend, the read an experiment with a pre-period ships.
    *
    * Determinism: all moments (n, Σd, Σd², Σx, Σy per arm) are exact
    * int64; means/variance/t assemble through the one textually-shared
    * formula chain, rounded at the end. The verdict compares the
    * ROUNDED t against ±1.96.
    *
    * Scale notes: one corpus scan → one user-keyed aggregate → a 1-row
    * conditional pivot of six int64 moments per arm. Nothing after the
    * user aggregate scales with the corpus.
    */
  def q232(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val per = expPanel(c).withColumn("d", col("y") - col("x"))
    per.groupBy()
      .agg(
        sum(when(col("bucket") === 0L, 1L).otherwise(0L)).cast("long")
          .as("n_a"),
        sum(when(col("bucket") === 0L, col("x")).otherwise(0L)).cast("long")
          .as("sxa"),
        sum(when(col("bucket") === 0L, col("y")).otherwise(0L)).cast("long")
          .as("sya"),
        sum(when(col("bucket") === 0L, col("d") * col("d")).otherwise(0L))
          .cast("long").as("ssa"),
        sum(when(col("bucket") === 1L, 1L).otherwise(0L)).cast("long")
          .as("n_b"),
        sum(when(col("bucket") === 1L, col("x")).otherwise(0L)).cast("long")
          .as("sxb"),
        sum(when(col("bucket") === 1L, col("y")).otherwise(0L)).cast("long")
          .as("syb"),
        sum(when(col("bucket") === 1L, col("d") * col("d")).otherwise(0L))
          .cast("long").as("ssb"))
      .withColumn("sda", col("sya") - col("sxa"))
      .withColumn("sdb", col("syb") - col("sxb"))
      // 1-user arms make the sample variance 0/0; the integer n guards
      // keep both engines on NULL instead of NULL-vs-NaN divergence
      .withColumn("va",
        when(col("n_a") > 1L,
          (col("ssa").cast("double") - col("sda").cast("double") * col("sda")
            / col("n_a")) / (col("n_a") - 1L)))
      .withColumn("vb",
        when(col("n_b") > 1L,
          (col("ssb").cast("double") - col("sdb").cast("double") * col("sdb")
            / col("n_b")) / (col("n_b") - 1L)))
      .withColumn("se2", col("va") / col("n_a") + col("vb") / col("n_b"))
      .withColumn("did_c",
        col("sdb").cast("double") / col("n_b")
          - col("sda").cast("double") / col("n_a"))
      .withColumn("t_stat",
        when(col("se2") > 0.0, round(col("did_c") / sqrt(col("se2")), 4)))
      .withColumn("df",
        when(col("se2") > 0.0, round((col("se2") * col("se2")) /
          ((col("va") / col("n_a")) * (col("va") / col("n_a"))
            / (col("n_a") - 1L)
            + (col("vb") / col("n_b")) * (col("vb") / col("n_b"))
              / (col("n_b") - 1L)), 1)))
      .select(col("n_a"), col("n_b"),
        round(col("sxa").cast("double") / col("n_a") / 100.0, 4).as("pre_a"),
        round(col("sya").cast("double") / col("n_a") / 100.0, 4).as("post_a"),
        round(col("sxb").cast("double") / col("n_b") / 100.0, 4).as("pre_b"),
        round(col("syb").cast("double") / col("n_b") / 100.0, 4).as("post_b"),
        round(col("did_c") / 100.0, 4).as("did"),
        col("t_stat"), col("df"),
        when(abs(col("t_stat")) > 1.96, "effect").otherwise("no_effect")
          .as("verdict"))
  }

  val q232Oracle: String =
    s"""WITH $panelSql,
       |m AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(SUM(CASE WHEN bucket = 0 THEN x ELSE 0 END) AS BIGINT) AS sxa,
       |    CAST(SUM(CASE WHEN bucket = 0 THEN y ELSE 0 END) AS BIGINT) AS sya,
       |    CAST(SUM(CASE WHEN bucket = 0 THEN (y - x) * (y - x) ELSE 0 END)
       |      AS BIGINT) AS ssa,
       |    CAST(SUM(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(SUM(CASE WHEN bucket = 1 THEN x ELSE 0 END) AS BIGINT) AS sxb,
       |    CAST(SUM(CASE WHEN bucket = 1 THEN y ELSE 0 END) AS BIGINT) AS syb,
       |    CAST(SUM(CASE WHEN bucket = 1 THEN (y - x) * (y - x) ELSE 0 END)
       |      AS BIGINT) AS ssb
       |  FROM per_user),
       |d AS (
       |  SELECT *, sya - sxa AS sda, syb - sxb AS sdb FROM m),
       |v AS (
       |  SELECT *,
       |    CASE WHEN n_a > 1 THEN
       |      (CAST(ssa AS DOUBLE) - CAST(sda AS DOUBLE) * sda / n_a)
       |        / (n_a - 1) END AS va,
       |    CASE WHEN n_b > 1 THEN
       |      (CAST(ssb AS DOUBLE) - CAST(sdb AS DOUBLE) * sdb / n_b)
       |        / (n_b - 1) END AS vb,
       |    CAST(sdb AS DOUBLE) / n_b - CAST(sda AS DOUBLE) / n_a AS did_c
       |  FROM d),
       |s AS (
       |  SELECT *, va / n_a + vb / n_b AS se2 FROM v)
       |SELECT n_a, n_b,
       |  ROUND(CAST(sxa AS DOUBLE) / n_a / 100.0, 4) AS pre_a,
       |  ROUND(CAST(sya AS DOUBLE) / n_a / 100.0, 4) AS post_a,
       |  ROUND(CAST(sxb AS DOUBLE) / n_b / 100.0, 4) AS pre_b,
       |  ROUND(CAST(syb AS DOUBLE) / n_b / 100.0, 4) AS post_b,
       |  ROUND(did_c / 100.0, 4) AS did,
       |  CASE WHEN se2 > 0.0 THEN ROUND(did_c / SQRT(se2), 4) END AS t_stat,
       |  CASE WHEN se2 > 0.0 THEN ROUND((se2 * se2) /
       |    ((va / n_a) * (va / n_a) / (n_a - 1)
       |      + (vb / n_b) * (vb / n_b) / (n_b - 1)), 1) END AS df,
       |  CASE WHEN se2 > 0.0
       |      AND ABS(ROUND(did_c / SQRT(se2), 4)) > 1.96 THEN 'effect'
       |    ELSE 'no_effect' END AS verdict
       |FROM s""".stripMargin

  /** Q236 — rolling-origin one-step forecast backtest per event type
    * (Tashman 2000's out-of-sample evaluation discipline; Hyndman &
    * Koehler 2006 for MASE): on the zero-filled daily revenue-cents grid,
    * score the two canonical benchmark forecasters — naive ŷ_t = y_{t−1}
    * and seasonal-naive ŷ_t = y_{t−7} — at every origin where BOTH are
    * defined (day index > 7, so the two models face the identical eval
    * window). Emits MAE (dollars), WAPE = Σ|err|/Σ|y| (the scale-free
    * accuracy read robust to intermittent zeros, unlike MAPE), and
    * MASE = MAE_snaive/MAE_naive (< 1 ⟺ weekly seasonality carries real
    * signal — the "is Q123's Holt level+trend even beating a lag" gate,
    * and the scaling denominator any real forecaster must beat).
    *
    * Determinism: the grid is exact cents; every error sum Σ|y−ŷ| and
    * the mass Σ|y| are exact int64 (≤ days·max-daily-cents ≪ 2⁶³), so
    * all five emitted ratios are single divides of exact integers,
    * rounded once; the verdict compares the ROUNDED mase. Degenerate
    * series (Σ|err_naive| = 0) degrade to NULL mase + 'degenerate',
    * never NaN/Inf; spines ≤ 7 days drop the type in both engines.
    *
    * Scale notes: runs entirely on the types × bounded-calendar-days
    * grid ([[dailyCentsGrid]] — one corpus scan); two lags + one
    * row_number ride ONE window spec, and the rollup is a map-side-
    * combinable (type)-keyed sum. Output rows = event types.
    */
  def q236(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    dailyCentsGrid(spark, c)
      .withColumn("p1", lag(col("v"), 1).over(w))
      .withColumn("p7", lag(col("v"), 7).over(w))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 7)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("v") - col("p1"))).cast("long").as("sae1"),
        sum(abs(col("v") - col("p7"))).cast("long").as("sae7"),
        sum(abs(col("v"))).cast("long").as("sv"))
      .select(col("event_type"), col("n_eval"),
        round(col("sae1").cast("double") / col("n_eval") / 100.0, 4)
          .as("mae_naive"),
        round(col("sae7").cast("double") / col("n_eval") / 100.0, 4)
          .as("mae_snaive"),
        expr("CASE WHEN sv > 0 THEN ROUND(CAST(sae1 AS DOUBLE) / sv, 6) END")
          .as("wape_naive"),
        expr("CASE WHEN sv > 0 THEN ROUND(CAST(sae7 AS DOUBLE) / sv, 6) END")
          .as("wape_snaive"),
        expr("CASE WHEN sae1 > 0 THEN ROUND(CAST(sae7 AS DOUBLE) / sae1, 4) END")
          .as("mase"),
        expr("CASE WHEN sae1 = 0 THEN 'degenerate'" +
          " WHEN ROUND(CAST(sae7 AS DOUBLE) / sae1, 4) < 1.0" +
          " THEN 'seasonal_wins' ELSE 'naive_wins' END").as("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q236Oracle: String =
    s"""WITH $gridSql,
       |ext AS (
       |  SELECT event_type, v,
       |    LAG(v, 1) OVER w AS p1, LAG(v, 7) OVER w AS p7,
       |    ROW_NUMBER() OVER w AS rn
       |  FROM grid
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |s AS (
       |  SELECT event_type,
       |    CAST(COUNT(*) AS BIGINT) AS n_eval,
       |    CAST(SUM(ABS(v - p1)) AS BIGINT) AS sae1,
       |    CAST(SUM(ABS(v - p7)) AS BIGINT) AS sae7,
       |    CAST(SUM(ABS(v)) AS BIGINT) AS sv
       |  FROM ext WHERE rn > 7 GROUP BY 1)
       |SELECT event_type, n_eval,
       |  ROUND(CAST(sae1 AS DOUBLE) / n_eval / 100.0, 4) AS mae_naive,
       |  ROUND(CAST(sae7 AS DOUBLE) / n_eval / 100.0, 4) AS mae_snaive,
       |  CASE WHEN sv > 0 THEN ROUND(CAST(sae1 AS DOUBLE) / sv, 6) END
       |    AS wape_naive,
       |  CASE WHEN sv > 0 THEN ROUND(CAST(sae7 AS DOUBLE) / sv, 6) END
       |    AS wape_snaive,
       |  CASE WHEN sae1 > 0 THEN ROUND(CAST(sae7 AS DOUBLE) / sae1, 4) END
       |    AS mase,
       |  CASE WHEN sae1 = 0 THEN 'degenerate'
       |    WHEN ROUND(CAST(sae7 AS DOUBLE) / sae1, 4) < 1.0
       |      THEN 'seasonal_wins'
       |    ELSE 'naive_wins' END AS verdict
       |FROM s
       |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q239 — Haar multi-resolution energy decomposition per event type
    * (Haar 1910; Mallat 1989's pyramid): on the zero-filled daily cents
    * grid truncated to the largest multiple of 8 days, cascade three
    * levels of unnormalized Haar pair-differences d_l = a_{l-1}(2j) −
    * a_{l-1}(2j+1) / pair-sums a_l, and report where the series' energy
    * lives: day-to-day noise (level 1), 2-day swings (level 2), or
    * 4–8-day structure (level 3). The multi-resolution read that Q128's
    * fixed-lag ACF and Q188's day-of-week ANOVA can't give: ONE pass
    * localizes the dominant time scale.
    *
    * Determinism: v is exact cents, so every detail/approximation
    * coefficient is an exact int64 sum; the energies e_l = Σd_l²,
    * A = Σa_3², T = Σv² are exact DECIMAL(38,0)/HUGEINT (r12: the sf10
    * sweep measured a single 3·10⁹-cent day's v² topping 2⁶³, so the
    * old int64 form threw under ANSI) — the engine and oracle still
    * compare INTEGERS, and the Parseval identity 8T = 4e1 + 2e2 + e3 +
    * A holds exactly (the spec asserts it). The BIGINT energy output
    * columns degrade to NULL symmetrically via try_cast past 2⁶³ (the
    * Q339 discipline). Shares are single divides of exact quantities
    * rounded once; the dominant level compares exact decimals (ties
    * break to the finer scale). Constant series degrade to 'flat'.
    *
    * Scale notes: one corpus scan into the (type, day) daily aggregate;
    * the cascade is three map-side-combinable GROUP BYs over the
    * spine-bounded grid (≤ calendar days per type regardless of corpus
    * size). Energies stay exact to 10³⁸ — beyond any physical spine.
    */
  def q239(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val bounds = grid.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
    val idx = grid.crossJoin(broadcast(bounds))
      .withColumn("i", col("day") - col("dmin"))
      .withColumn("n8", expr("((dmax - dmin + 1) div 8) * 8"))
      .filter(col("i") < col("n8"))
      .select(col("event_type"), col("i"), col("v"), col("n8"))
    val l1 = idx.groupBy(col("event_type"), expr("i div 2").as("j"))
      .agg(sum(when(expr("i % 2 = 0"), col("v")).otherwise(-col("v")))
        .cast("long").as("d"),
        sum(col("v")).cast("long").as("a"))
    val l2 = l1.groupBy(col("event_type"), expr("j div 2").as("j2"))
      .agg(sum(when(expr("j % 2 = 0"), col("a")).otherwise(-col("a")))
        .cast("long").as("d"),
        sum(col("a")).cast("long").as("a"))
    val l3 = l2.groupBy(col("event_type"), expr("j2 div 2").as("j3"))
      .agg(sum(when(expr("j2 % 2 = 0"), col("a")).otherwise(-col("a")))
        .cast("long").as("d"),
        sum(col("a")).cast("long").as("a"))
    // Energy sums in DECIMAL(38,0)/HUGEINT (r12: at sf10 a single v² of
    // a 3·10⁹-cent day tops 2⁶³ and the int64 form THREW under ANSI);
    // shares and the dominant verdict compute on the exact decimals, and
    // the BIGINT output columns degrade to NULL symmetrically via
    // try_cast past 2⁶³ (the Q339 discipline).
    val base = idx.groupBy(col("event_type"))
      .agg(max(col("n8")).as("n8"),
        sum(col("v").cast("decimal(38,0)") * col("v"))
          .cast("decimal(38,0)").as("t_sqd"))
    val e1 = l1.groupBy(col("event_type"))
      .agg(sum(col("d").cast("decimal(38,0)") * col("d"))
        .cast("decimal(38,0)").as("e1d"))
    val e2 = l2.groupBy(col("event_type"))
      .agg(sum(col("d").cast("decimal(38,0)") * col("d"))
        .cast("decimal(38,0)").as("e2d"))
    val e3 = l3.groupBy(col("event_type"))
      .agg(sum(col("d").cast("decimal(38,0)") * col("d"))
        .cast("decimal(38,0)").as("e3d"),
        sum(col("a").cast("decimal(38,0)") * col("a"))
          .cast("decimal(38,0)").as("a_energyd"))
    base.join(e1, Seq("event_type")).join(e2, Seq("event_type"))
      .join(e3, Seq("event_type"))
      .withColumn("den", expr("4 * e1d + 2 * e2d + e3d"))
      .select(col("event_type"), col("n8"),
        expr("TRY_CAST(t_sqd AS BIGINT)").as("t_sq"),
        expr("TRY_CAST(e1d AS BIGINT)").as("e1"),
        expr("TRY_CAST(e2d AS BIGINT)").as("e2"),
        expr("TRY_CAST(e3d AS BIGINT)").as("e3"),
        expr("TRY_CAST(a_energyd AS BIGINT)").as("a_energy"),
        expr("CASE WHEN den > 0 THEN ROUND(CAST(4 * e1d AS DOUBLE) / CAST(den AS DOUBLE), 6) END")
          .as("share1"),
        expr("CASE WHEN den > 0 THEN ROUND(CAST(2 * e2d AS DOUBLE) / CAST(den AS DOUBLE), 6) END")
          .as("share2"),
        expr("CASE WHEN den > 0 THEN ROUND(CAST(e3d AS DOUBLE) / CAST(den AS DOUBLE), 6) END")
          .as("share3"),
        expr("CASE WHEN den = 0 THEN 'flat'" +
          " WHEN 4 * e1d >= 2 * e2d AND 4 * e1d >= e3d THEN 'day_noise'" +
          " WHEN 2 * e2d >= e3d THEN 'two_day'" +
          " ELSE 'multi_day' END").as("dominant"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q239Oracle: String =
    s"""WITH $gridSql,
       |bnd AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM grid),
       |idx AS (
       |  SELECT g.event_type, g.day - b.dmin AS i, g.v,
       |    ((b.dmax - b.dmin + 1) // 8) * 8 AS n8
       |  FROM grid g, bnd b
       |  WHERE g.day - b.dmin < ((b.dmax - b.dmin + 1) // 8) * 8),
       |l1 AS (
       |  SELECT event_type, i // 2 AS j,
       |    CAST(SUM(CASE WHEN i % 2 = 0 THEN v ELSE -v END) AS BIGINT) AS d,
       |    CAST(SUM(v) AS BIGINT) AS a
       |  FROM idx GROUP BY 1, 2),
       |l2 AS (
       |  SELECT event_type, j // 2 AS j2,
       |    CAST(SUM(CASE WHEN j % 2 = 0 THEN a ELSE -a END) AS BIGINT) AS d,
       |    CAST(SUM(a) AS BIGINT) AS a
       |  FROM l1 GROUP BY 1, 2),
       |l3 AS (
       |  SELECT event_type, j2 // 2 AS j3,
       |    CAST(SUM(CASE WHEN j2 % 2 = 0 THEN a ELSE -a END) AS BIGINT) AS d,
       |    CAST(SUM(a) AS BIGINT) AS a
       |  FROM l2 GROUP BY 1, 2),
       |base AS (
       |  SELECT event_type, CAST(MAX(n8) AS BIGINT) AS n8,
       |    CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS t_sq
       |  FROM idx GROUP BY 1),
       |s1 AS (SELECT event_type, CAST(SUM(CAST(d AS HUGEINT) * d) AS HUGEINT) AS e1
       |  FROM l1 GROUP BY 1),
       |s2 AS (SELECT event_type, CAST(SUM(CAST(d AS HUGEINT) * d) AS HUGEINT) AS e2
       |  FROM l2 GROUP BY 1),
       |s3 AS (SELECT event_type, CAST(SUM(CAST(d AS HUGEINT) * d) AS HUGEINT) AS e3,
       |    CAST(SUM(CAST(a AS HUGEINT) * a) AS HUGEINT) AS a_energy
       |  FROM l3 GROUP BY 1),
       |f AS (
       |  SELECT b.event_type, b.n8, b.t_sq, s1.e1, s2.e2, s3.e3,
       |    s3.a_energy, 4 * s1.e1 + 2 * s2.e2 + s3.e3 AS den
       |  FROM base b
       |  JOIN s1 USING (event_type) JOIN s2 USING (event_type)
       |  JOIN s3 USING (event_type))
       |SELECT event_type, n8, TRY_CAST(t_sq AS BIGINT) AS t_sq,
       |  TRY_CAST(e1 AS BIGINT) AS e1, TRY_CAST(e2 AS BIGINT) AS e2,
       |  TRY_CAST(e3 AS BIGINT) AS e3,
       |  TRY_CAST(a_energy AS BIGINT) AS a_energy,
       |  CASE WHEN den > 0 THEN ROUND(CAST(4 * e1 AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS share1,
       |  CASE WHEN den > 0 THEN ROUND(CAST(2 * e2 AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS share2,
       |  CASE WHEN den > 0 THEN ROUND(CAST(e3 AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS share3,
       |  CASE WHEN den = 0 THEN 'flat'
       |    WHEN 4 * e1 >= 2 * e2 AND 4 * e1 >= e3 THEN 'day_noise'
       |    WHEN 2 * e2 >= e3 THEN 'two_day'
       |    ELSE 'multi_day' END AS dominant
       |FROM f
       |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q240 — Wald–Wolfowitz runs test per event type (Wald & Wolfowitz
    * 1940): is the daily revenue series RANDOM around its median, or
    * does it cluster (momentum / regime persistence → too few runs) or
    * oscillate (over-dispersion → too many)? Dichotomize each grid day
    * against the series' lower median (the ⌊(n+1)/2⌋-th order statistic
    * — an exact int, no midpoint float), drop equal-to-median days per
    * the classical prescription, count sign runs R, and test R against
    * its exact null moments μ = 1 + 2n₁n₂/n, σ² = 2n₁n₂(2n₁n₂ − n) /
    * (n²(n−1)). The randomness read ORTHOGONAL to Q227's Mann–Kendall:
    * MK detects monotone drift; runs detect ANY serial dependence,
    * trend or alternation, without assuming a direction.
    *
    * Determinism: the median is an exact order statistic (value, day)
    * tie-break; n₁, n₂, R, 2n₁n₂ and both moment polynomials are exact
    * int64, so z is ONE pinned float shape rounded once, and the
    * verdict compares the ROUNDED z against ±1.96. n₁ = 0 or n₂ = 0 or
    * n < 2 degrade to NULL z + 'degenerate', never NaN.
    *
    * Scale notes: spine-bounded — the grid is ≤ calendar days per type
    * at any corpus size; the median is one (type)-partitioned sort of
    * that bounded relation, the run count one lag over the same sort.
    */
  def q240(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val wv = Window.partitionBy(col("event_type"))
      .orderBy(col("v"), col("day"))
    val wn = Window.partitionBy(col("event_type"))
    val med = grid.withColumn("rn", row_number().over(wv))
      .withColumn("cnt", count(lit(1)).over(wn))
      .filter(expr("rn = (cnt + 1) div 2"))
      .select(col("event_type"), col("v").as("med"),
        col("cnt").as("n_days"))
    val lab = grid.join(med, Seq("event_type"))
      .withColumn("lab",
        when(col("v") > col("med"), 1L).when(col("v") < col("med"), -1L))
      .filter(col("lab").isNotNull)
    val wd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    lab.withColumn("prev", lag(col("lab"), 1).over(wd))
      .groupBy(col("event_type"), col("med"), col("n_days"))
      .agg(sum(when(col("lab") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("lab") === -1L, 1L).otherwise(0L)).as("n2"),
        sum(when(col("prev").isNull || col("prev") =!= col("lab"), 1L)
          .otherwise(0L)).as("runs"))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("p2", col("n1") * col("n2") * 2L)
      .select(col("event_type"), col("n_days"), col("med").as("median_cents"),
        col("n1").as("n_above"), col("n2").as("n_below"), col("runs"),
        expr("CASE WHEN n1 > 0 AND n2 > 0 AND n > 1" +
          " AND p2 * (p2 - n) > 0 THEN" +
          " ROUND((runs - (1.0 + CAST(p2 AS DOUBLE) / n))" +
          " / SQRT(CAST(p2 AS DOUBLE) * (p2 - n)" +
          " / (CAST(n AS DOUBLE) * n * (n - 1))), 4) END").as("z"),
        expr("CASE WHEN n1 = 0 OR n2 = 0 OR n <= 1" +
          " OR p2 * (p2 - n) <= 0 THEN 'degenerate'" +
          " WHEN ABS(ROUND((runs - (1.0 + CAST(p2 AS DOUBLE) / n))" +
          " / SQRT(CAST(p2 AS DOUBLE) * (p2 - n)" +
          " / (CAST(n AS DOUBLE) * n * (n - 1))), 4)) > 1.96" +
          " THEN 'non_random' ELSE 'random' END").as("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q240Oracle: String =
    s"""WITH $gridSql,
       |med AS (
       |  SELECT event_type, v AS med, cnt AS n_days
       |  FROM (
       |    SELECT event_type, v,
       |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, day)
       |        AS rn,
       |      COUNT(*) OVER (PARTITION BY event_type) AS cnt
       |    FROM grid)
       |  WHERE rn = (cnt + 1) // 2),
       |lab AS (
       |  SELECT g.event_type, g.day, m.med, m.n_days,
       |    CASE WHEN g.v > m.med THEN 1 WHEN g.v < m.med THEN -1 END AS lab
       |  FROM grid g JOIN med m ON m.event_type = g.event_type
       |  WHERE g.v <> m.med),
       |r AS (
       |  SELECT event_type, med, n_days,
       |    CAST(SUM(CASE WHEN lab = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(SUM(CASE WHEN lab = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(SUM(CASE WHEN prev IS NULL OR prev <> lab THEN 1 ELSE 0 END)
       |      AS BIGINT) AS runs
       |  FROM (
       |    SELECT *, LAG(lab, 1) OVER
       |      (PARTITION BY event_type ORDER BY day) AS prev
       |    FROM lab)
       |  GROUP BY 1, 2, 3),
       |e AS (
       |  SELECT *, n1 + n2 AS n, n1 * n2 * 2 AS p2 FROM r)
       |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       |  CAST(med AS BIGINT) AS median_cents,
       |  n1 AS n_above, n2 AS n_below, runs,
       |  CASE WHEN n1 > 0 AND n2 > 0 AND n > 1 AND p2 * (p2 - n) > 0 THEN
       |    ROUND((runs - (1.0 + CAST(p2 AS DOUBLE) / n))
       |      / SQRT(CAST(p2 AS DOUBLE) * (p2 - n)
       |      / (CAST(n AS DOUBLE) * n * (n - 1))), 4) END AS z,
       |  CASE WHEN n1 = 0 OR n2 = 0 OR n <= 1
       |      OR p2 * (p2 - n) <= 0 THEN 'degenerate'
       |    WHEN ABS(ROUND((runs - (1.0 + CAST(p2 AS DOUBLE) / n))
       |      / SQRT(CAST(p2 AS DOUBLE) * (p2 - n)
       |      / (CAST(n AS DOUBLE) * n * (n - 1))), 4)) > 1.96
       |      THEN 'non_random' ELSE 'random' END AS verdict
       |FROM e
       |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Shared 95th-percentile χ² fence, dof 1..8, as SQL text used
    * verbatim by BOTH engines (the Q231 pinned-constant discipline) —
    * `e` must evaluate to an integer dof expression. dof > 8 yields
    * NULL (no fence pinned → verdict degrades to NULL, never a guess).
    */
  private def chi2Fence95(e: String): String =
    s"CASE ($e) WHEN 1 THEN 3.8415 WHEN 2 THEN 5.9915 WHEN 3 THEN 7.8147" +
      " WHEN 4 THEN 9.4877 WHEN 5 THEN 11.0705 WHEN 6 THEN 12.5916" +
      " WHEN 7 THEN 14.0671 WHEN 8 THEN 15.5073 END"

  /** Q241 — Brown–Forsythe scale-equality test across event types
    * (Brown & Forsythe 1974; Levene 1960 with the median center): do
    * the k daily-revenue series differ in DISPERSION, not just level?
    * Welch/ANOVA (Q137/Q184) compare means; this runs one-way ANOVA on
    * the absolute deviations z_ij = |v_ij − median_j| from each type's
    * lower median — the robust variance-homogeneity gate that decides
    * whether pooled-variance methods are even admissible. Emits the F
    * statistic, its large-N χ² form (k−1)·F against the pinned
    * χ²₀.₉₅ fence, and the widest/tightest types by mean |deviation|.
    *
    * Determinism: medians are exact order statistics, so every z_ij is
    * an exact int64 and the group moments S_j = Σz, Q_j = Σz² are exact
    * int64; SSB/SSW are assembled in ONE textually-pinned double shape
    * each and F is rounded once; the verdict compares the ROUNDED χ²
    * against the pinned table. k < 2 or SSW ≤ 0 degrade to NULL +
    * 'degenerate'. Widest/tightest compare exact (S_j, type) pairs —
    * group sizes are all equal to the spine length, so mean ordering ≡
    * sum ordering.
    *
    * Scale notes: spine-bounded like Q240 — one (type)-partitioned sort
    * for the medians, one map-side-combinable rollup for the moments;
    * the final assembly is k rows. Σz² holds to int64 through
    * ~10⁹-cent days on a 10⁵-day spine (Q128 convention).
    */
  def q241(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val wv = Window.partitionBy(col("event_type"))
      .orderBy(col("v"), col("day"))
    val wn = Window.partitionBy(col("event_type"))
    val med = grid.withColumn("rn", row_number().over(wv))
      .withColumn("cnt", count(lit(1)).over(wn))
      .filter(expr("rn = (cnt + 1) div 2"))
      .select(col("event_type"), col("v").as("med"))
    val z = grid.join(med, Seq("event_type"))
      .withColumn("z", abs(col("v") - col("med")))
    val grp = z.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nj"),
        sum(col("z")).cast("long").as("sj"),
        sum(col("z") * col("z")).cast("long").as("qj"))
    val wAll = Window.partitionBy(lit(1))
    val ranked = grp
      .withColumn("widest", first(col("event_type")).over(
        wAll.orderBy(desc("sj"), desc("event_type"))))
      .withColumn("tightest", first(col("event_type")).over(
        wAll.orderBy(asc("sj"), asc("event_type"))))
    ranked.groupBy(col("widest"), col("tightest"))
      .agg(count(lit(1)).as("k"),
        sum(col("nj")).as("n_total"),
        max(col("nj")).as("n_per_group"),
        sum(col("sj")).cast("long").as("s_all"),
        sum(expr("CAST(sj AS DOUBLE) * sj / nj")).as("sb_part"),
        sum(col("qj")).cast("long").as("q_all"))
      .withColumn("ssb",
        expr("sb_part - CAST(s_all AS DOUBLE) * s_all / n_total"))
      .withColumn("ssw", expr("q_all - sb_part"))
      .withColumn("f_raw",
        expr("CASE WHEN k > 1 AND n_total > k AND ssw > 0 THEN" +
          " (ssb / (k - 1)) / (ssw / (n_total - k)) END"))
      .select(col("k"), col("n_per_group"),
        round(col("f_raw"), 4).as("f_stat"),
        round(col("f_raw") * (col("k") - 1L), 4).as("chi2_approx"),
        expr("CASE WHEN f_raw IS NULL THEN 'degenerate'" +
          s" WHEN ROUND(f_raw * (k - 1), 4) > ${chi2Fence95("k - 1")}" +
          " THEN 'unequal_scale'" +
          s" WHEN ${chi2Fence95("k - 1")} IS NULL THEN NULL" +
          " ELSE 'equal_scale' END").as("verdict"),
        col("widest"), col("tightest"))
  }

  val q241Oracle: String =
    s"""WITH $gridSql,
       |med AS (
       |  SELECT event_type, v AS med
       |  FROM (
       |    SELECT event_type, v,
       |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, day)
       |        AS rn,
       |      COUNT(*) OVER (PARTITION BY event_type) AS cnt
       |    FROM grid)
       |  WHERE rn = (cnt + 1) // 2),
       |zt AS (
       |  SELECT g.event_type, ABS(g.v - m.med) AS z
       |  FROM grid g JOIN med m ON m.event_type = g.event_type),
       |grp AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nj,
       |    CAST(SUM(z) AS BIGINT) AS sj,
       |    CAST(SUM(z * z) AS BIGINT) AS qj
       |  FROM zt GROUP BY 1),
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
       |    CAST(SUM(nj) AS BIGINT) AS n_total,
       |    CAST(MAX(nj) AS BIGINT) AS n_per_group,
       |    CAST(SUM(sj) AS BIGINT) AS s_all,
       |    SUM(CAST(sj AS DOUBLE) * sj / nj) AS sb_part,
       |    CAST(SUM(qj) AS BIGINT) AS q_all,
       |    MIN((sj, event_type)) AS tmin, MAX((sj, event_type)) AS tmax
       |  FROM grp),
       |f AS (
       |  SELECT *,
       |    sb_part - CAST(s_all AS DOUBLE) * s_all / n_total AS ssb,
       |    q_all - sb_part AS ssw
       |  FROM agg),
       |g2 AS (
       |  SELECT *,
       |    CASE WHEN k > 1 AND n_total > k AND ssw > 0 THEN
       |      (ssb / (k - 1)) / (ssw / (n_total - k)) END AS f_raw
       |  FROM f)
       |SELECT k, n_per_group,
       |  ROUND(f_raw, 4) AS f_stat,
       |  ROUND(f_raw * (k - 1), 4) AS chi2_approx,
       |  CASE WHEN f_raw IS NULL THEN 'degenerate'
       |    WHEN ROUND(f_raw * (k - 1), 4) > ${chi2Fence95("k - 1")}
       |    THEN 'unequal_scale'
       |    WHEN ${chi2Fence95("k - 1")} IS NULL THEN NULL
       |    ELSE 'equal_scale' END AS verdict,
       |  tmax[2] AS widest, tmin[2] AS tightest
       |FROM g2""".stripMargin

  /** Q242 — Friedman blocked rank test + Kendall's W across event types
    * (Friedman 1937; Kendall & Babington Smith 1939; tie-corrected per
    * Conover 1999): with days as blocks and the k event types as
    * treatments on the zero-filled grid, do the types hold a CONSISTENT
    * daily revenue ordering? Within each day the k cents values get
    * DOUBLED midranks (exact int64 — the Q161/Q163 discipline), and the
    * tie-corrected statistic is assembled entirely from integers:
    * χ²_F = (k−1)·Σ_j (DR_j − n(k+1))² / (ΣDR² − nk(k+1)²), with
    * Kendall's concordance W = χ²_F / (n(k−1)) as the effect size. The
    * repeated-measures sibling of Q163's Kruskal–Wallis: KW pools all
    * observations, Friedman blocks out the day effect first — immune to
    * weekend/weekday level shifts that inflate KW.
    *
    * Determinism: doubled midranks, rank sums DR_j, and both χ²_F
    * polynomials are exact int64; χ²_F and W are one divide each,
    * rounded once; the verdict compares the ROUNDED χ² against the
    * pinned dof ≤ 8 table (NULL beyond — no unpinned fence). An
    * all-tied-every-day corpus zeroes the denominator and degrades to
    * NULL + 'degenerate'. Best/worst compare exact (DR_j, type) pairs.
    *
    * Scale notes: ranks are (day)-partitioned windows over the
    * spine-bounded grid (k rows per day); the rollup is two map-side-
    * combinable aggregates. ΣDR² ≤ n·k·(2k)² — microscopic at any scale.
    */
  def q242(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val wDay = Window.partitionBy(col("day")).orderBy(col("v"))
    val wTie = Window.partitionBy(col("day"), col("v"))
    val dr = grid.withColumn("dr",
      (rank().over(wDay) - 1L) * 2L + count(lit(1)).over(wTie) + 1L)
    val perType = dr.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("dr")).cast("long").as("drj"),
        sum(col("dr") * col("dr")).cast("long").as("dr2j"))
    val dims = perType.agg(count(lit(1)).as("k"), max(col("n")).as("n_days"))
    val wAll = Window.partitionBy(lit(1))
    val ranked = perType.crossJoin(broadcast(dims))
      .withColumn("dev", col("drj") - col("n_days") * (col("k") + 1L))
      .withColumn("best", first(col("event_type")).over(
        wAll.orderBy(desc("drj"), desc("event_type"))))
      .withColumn("worst", first(col("event_type")).over(
        wAll.orderBy(asc("drj"), asc("event_type"))))
    ranked.groupBy(col("k"), col("n_days"), col("best"), col("worst"))
      .agg(sum(col("dr2j")).cast("long").as("a2"),
        sum(col("dev") * col("dev")).cast("long").as("sdev2"))
      .withColumn("den",
        col("a2") - col("n_days") * col("k") * (col("k") + 1L) * (col("k") + 1L))
      .withColumn("chi2_raw",
        expr("CASE WHEN den > 0 AND k > 1 THEN" +
          " CAST((k - 1) * sdev2 AS DOUBLE) / den END"))
      .select(col("k"), col("n_days"),
        round(col("chi2_raw"), 4).as("chi2_f"),
        expr("CASE WHEN chi2_raw IS NOT NULL AND n_days > 0 AND k > 1 THEN" +
          " ROUND(chi2_raw / (n_days * (k - 1)), 6) END").as("kendall_w"),
        expr("CASE WHEN chi2_raw IS NULL THEN 'degenerate'" +
          s" WHEN ROUND(chi2_raw, 4) > ${chi2Fence95("k - 1")}" +
          " THEN 'types_differ'" +
          s" WHEN ${chi2Fence95("k - 1")} IS NULL THEN NULL" +
          " ELSE 'no_difference' END").as("verdict"),
        col("best"), col("worst"))
  }

  val q242Oracle: String =
    s"""WITH $gridSql,
       |dr AS (
       |  SELECT event_type,
       |    (RANK() OVER (PARTITION BY day ORDER BY v) - 1) * 2
       |      + COUNT(*) OVER (PARTITION BY day, v) + 1 AS dr
       |  FROM grid),
       |per AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(dr) AS BIGINT) AS drj,
       |    CAST(SUM(dr * dr) AS BIGINT) AS dr2j
       |  FROM dr GROUP BY 1),
       |dims AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
       |    CAST(MAX(n) AS BIGINT) AS n_days,
       |    MAX((drj, event_type)) AS tbest, MIN((drj, event_type)) AS tworst
       |  FROM per),
       |s AS (
       |  SELECT d.k, d.n_days, d.tbest[2] AS best, d.tworst[2] AS worst,
       |    CAST(SUM(p.dr2j) AS BIGINT) AS a2,
       |    CAST(SUM((p.drj - d.n_days * (d.k + 1))
       |      * (p.drj - d.n_days * (d.k + 1))) AS BIGINT) AS sdev2
       |  FROM per p, dims d GROUP BY 1, 2, 3, 4),
       |f AS (
       |  SELECT *,
       |    a2 - n_days * k * (k + 1) * (k + 1) AS den
       |  FROM s),
       |g2 AS (
       |  SELECT *,
       |    CASE WHEN den > 0 AND k > 1 THEN
       |      CAST((k - 1) * sdev2 AS DOUBLE) / den END AS chi2_raw
       |  FROM f)
       |SELECT k, n_days,
       |  ROUND(chi2_raw, 4) AS chi2_f,
       |  CASE WHEN chi2_raw IS NOT NULL AND n_days > 0 AND k > 1 THEN
       |    ROUND(chi2_raw / (n_days * (k - 1)), 6) END AS kendall_w,
       |  CASE WHEN chi2_raw IS NULL THEN 'degenerate'
       |    WHEN ROUND(chi2_raw, 4) > ${chi2Fence95("k - 1")}
       |    THEN 'types_differ'
       |    WHEN ${chi2Fence95("k - 1")} IS NULL THEN NULL
       |    ELSE 'no_difference' END AS verdict,
       |  best, worst
       |FROM g2""".stripMargin

  /** Q243 — log-rank (Mantel–Cox) test between the md5 experiment arms
    * on time-to-first-purchase (Mantel 1966; Peto & Peto 1972): Q146
    * draws the survival curve, this decides whether the two arms'
    * curves DIFFER. Q146's exact framing (t = hours from first event to
    * first 'purchase', right-censored at 72 h, deaths precede censoring
    * at equal t) with Q108's md5('exp1:'||user_id) % 2 arm assignment;
    * at each distinct death hour the hypergeometric expectation
    * E₁ += d·n₁/n and variance V += d(n−d)n₁n₂/(n²(n−1)) accumulate
    * over the at-risk sets, and χ² = (O₁−E₁)²/V is read against the
    * pinned χ²₁ fence. Also emits the O/E hazard-ratio estimate. The
    * time-to-event arm comparison Q212/Q232's mean-based reads can't
    * give: it uses EVERY user, censored or not, without assuming a
    * revenue distribution.
    *
    * Determinism: risk-set counts n₁/n₂/d₁/d and O₁/O₂ are exact int64
    * window sums over the ≤ 73 distinct death hours; each E/V term is
    * one pinned float shape summed over that bounded series (the Q206
    * order-free-after-round discipline) and rounded once; the verdict
    * compares the ROUNDED χ² against 3.8415. V ≤ 0, an empty arm, or no
    * deaths degrade to NULL χ² + 'degenerate'; hazard_ratio is NULL
    * when either arm's E or O is 0.
    *
    * Scale notes: the corpus collapses to one row per user (shuffle on
    * user_id), then to ≤ 73 death-hour rows — everything after is
    * window passes over a bounded series, at any corpus size.
    */
  def q243(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val perUser = c.events
      .select(col("user_id"), expr("ts DIV 1000").as("us"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(min(col("us")).as("us0"),
        min(when(col("event_type") === "purchase", col("us"))).as("pus"))
      .withColumn("t_h", expr("(pus - us0) DIV 3600000000"))
      .withColumn("t_death",
        when(col("t_h").isNotNull && col("t_h") <= 72L, col("t_h")))
      .withColumn("arm",
        expr(NearDup.hexValueFastExpr(
          "md5(concat('exp1:', CAST(user_id AS STRING)))")) % 2L)
      .select(col("arm"),
        coalesce(col("t_death"), lit(72L)).as("t_obs"),
        when(col("t_death").isNotNull, 1L).otherwise(0L).as("death"))
    val byTime = perUser.groupBy(col("t_obs"))
      .agg(count(lit(1)).as("leaving"),
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("leaving1"),
        sum(col("death")).as("d"),
        sum(when(col("arm") === 0L, col("death")).otherwise(0L)).as("d1"))
    val wDesc = Window.orderBy(desc("t_obs"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byTime
      .withColumn("n", sum(col("leaving")).over(wDesc))
      .withColumn("n1", sum(col("leaving1")).over(wDesc))
      .filter(col("d") > 0L)
      .withColumn("e1_t",
        expr("CAST(d AS DOUBLE) * n1 / n"))
      .withColumn("v_t",
        expr("CASE WHEN n > 1 THEN CAST(d AS DOUBLE) * (n - d) * n1" +
          " * (n - n1) / (CAST(n AS DOUBLE) * n * (n - 1)) ELSE 0.0 END"))
      .groupBy()
      .agg(sum(col("d")).cast("long").as("deaths"),
        sum(col("d1")).cast("long").as("o1"),
        sum(col("d") - col("d1")).cast("long").as("o2"),
        sum(col("e1_t")).as("e1_raw"),
        sum(col("d") - col("e1_t")).as("e2_raw"),
        sum(col("v_t")).as("v"),
        max(col("n")).as("n_users"),
        max(col("n1")).as("n_arm_a"))
      .withColumn("chi2_raw",
        expr("CASE WHEN v > 0 THEN" +
          " (o1 - e1_raw) * (o1 - e1_raw) / v END"))
      .select(col("n_users"), col("n_arm_a"),
        (col("n_users") - col("n_arm_a")).as("n_arm_b"),
        col("deaths"), col("o1"), col("o2"),
        round(col("e1_raw"), 4).as("e1"),
        round(col("e2_raw"), 4).as("e2"),
        round(col("chi2_raw"), 4).as("chi2"),
        expr("CASE WHEN o1 > 0 AND o2 > 0 AND e1_raw > 0 AND e2_raw > 0" +
          " THEN ROUND((o1 / e1_raw) / (o2 / e2_raw), 4) END")
          .as("hazard_ratio"),
        expr("CASE WHEN chi2_raw IS NULL THEN 'degenerate'" +
          " WHEN ROUND(chi2_raw, 4) > 3.8415 THEN 'arms_differ'" +
          " ELSE 'no_difference' END").as("verdict"))
  }

  val q243Oracle: String = {
    val hv = NearDup.hexValueExpr(
      "md5('exp1:' || CAST(user_id AS VARCHAR))")
    s"""WITH per_user AS (
       |  SELECT user_id, MIN(epoch_us(ts)) AS us0,
       |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
       |      AS pus
       |  FROM events GROUP BY 1),
       |obs AS (
       |  SELECT ($hv) % 2 AS arm,
       |    COALESCE(CASE WHEN (pus - us0) // 3600000000 <= 72
       |      THEN (pus - us0) // 3600000000 END, 72) AS t_obs,
       |    CASE WHEN pus IS NOT NULL
       |      AND (pus - us0) // 3600000000 <= 72 THEN 1 ELSE 0 END AS death
       |  FROM per_user),
       |by_time AS (
       |  SELECT t_obs, CAST(COUNT(*) AS BIGINT) AS leaving,
       |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS leaving1,
       |    CAST(SUM(death) AS BIGINT) AS d,
       |    CAST(SUM(CASE WHEN arm = 0 THEN death ELSE 0 END) AS BIGINT)
       |      AS d1
       |  FROM obs GROUP BY 1),
       |risk AS (
       |  SELECT *,
       |    SUM(leaving) OVER w AS n, SUM(leaving1) OVER w AS n1
       |  FROM by_time
       |  WINDOW w AS (ORDER BY t_obs DESC ROWS UNBOUNDED PRECEDING)),
       |terms AS (
       |  SELECT *,
       |    CAST(d AS DOUBLE) * n1 / n AS e1_t,
       |    CASE WHEN n > 1 THEN CAST(d AS DOUBLE) * (n - d) * n1
       |      * (n - n1) / (CAST(n AS DOUBLE) * n * (n - 1))
       |      ELSE 0.0 END AS v_t
       |  FROM risk WHERE d > 0),
       |s AS (
       |  SELECT CAST(SUM(d) AS BIGINT) AS deaths,
       |    CAST(SUM(d1) AS BIGINT) AS o1,
       |    CAST(SUM(d - d1) AS BIGINT) AS o2,
       |    SUM(e1_t) AS e1_raw, SUM(d - e1_t) AS e2_raw, SUM(v_t) AS v,
       |    CAST(MAX(n) AS BIGINT) AS n_users,
       |    CAST(MAX(n1) AS BIGINT) AS n_arm_a
       |  FROM terms),
       |f AS (
       |  SELECT *, CASE WHEN v > 0 THEN
       |    (o1 - e1_raw) * (o1 - e1_raw) / v END AS chi2_raw
       |  FROM s)
       |SELECT n_users, n_arm_a, n_users - n_arm_a AS n_arm_b,
       |  deaths, o1, o2,
       |  ROUND(e1_raw, 4) AS e1, ROUND(e2_raw, 4) AS e2,
       |  ROUND(chi2_raw, 4) AS chi2,
       |  CASE WHEN o1 > 0 AND o2 > 0 AND e1_raw > 0 AND e2_raw > 0
       |    THEN ROUND((o1 / e1_raw) / (o2 / e2_raw), 4) END
       |    AS hazard_ratio,
       |  CASE WHEN chi2_raw IS NULL THEN 'degenerate'
       |    WHEN ROUND(chi2_raw, 4) > 3.8415 THEN 'arms_differ'
       |    ELSE 'no_difference' END AS verdict
       |FROM f""".stripMargin
  }

  /** Q244 — empirical-Bayes beta-binomial shrinkage of per-part return
    * rates (Robbins 1956; the Efron–Morris 1975 rate-table recipe): a
    * part seen 3 times with 2 returns is NOT a 67%-return part. Fit a
    * Beta(α, β) prior to the observed per-part rates by method of
    * moments over the n ≥ 3 fit population (x̄, s² → ν = x̄(1−x̄)/s² − 1,
    * α = x̄ν), then shrink EVERY part toward the prior mean:
    * p̃ᵢ = (rᵢ + α)/(nᵢ + ν). Emits the top 15 parts by shrunken rate —
    * the ranking a naive raw-rate top-k gets wrong on exactly the
    * small-sample parts shrinkage exists to fix.
    *
    * Determinism: rᵢ/nᵢ are exact int64; x̄/s² are float sums over the
    * fit population (Q206 order-free-after-round discipline), and α and
    * ν are ROUNDED to 4 BEFORE the shrinkage divide — downstream of
    * that round, every p̃ᵢ is ONE divide of engine-identical values, so
    * a last-ULP disagreement in the prior fit cannot fan out into the
    * per-part ranking. The top-15 cut sorts on (rounded p̃, partkey).
    * s² ≤ 0 or ν ≤ 0 degrade to an empty result (both engines drop
    * identically — no prior, no ranking to publish).
    *
    * Scale notes: one lineitem scan → map-side-combined (partkey)
    * rollup; the prior fit is a second aggregate over the part rollup
    * (rows = parts, not lineitems); the final sort is a top-k
    * (TakeOrdered), never a global sort.
    */
  def q244(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val per = c.lineitem
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
    val fit = per.filter(col("n") >= 3L)
      .agg(count(lit(1)).as("k_fit"),
        sum(expr("CAST(r AS DOUBLE) / n")).as("sp"),
        sum(expr("(CAST(r AS DOUBLE) / n) * (CAST(r AS DOUBLE) / n)"))
          .as("spp"))
      .withColumn("xbar", expr("sp / k_fit"))
      .withColumn("s2",
        expr("CASE WHEN k_fit > 1 THEN (spp - sp * sp / k_fit)" +
          " / (k_fit - 1) END"))
      .withColumn("nu_raw",
        expr("CASE WHEN s2 > 0 THEN xbar * (1 - xbar) / s2 - 1 END"))
      .withColumn("nu", expr("CASE WHEN nu_raw > 0 THEN ROUND(nu_raw, 4) END"))
      .withColumn("alpha", expr("ROUND(xbar * nu_raw, 4)"))
      .filter(col("nu").isNotNull)
      .select(col("k_fit"), col("nu"), col("alpha"))
    per.crossJoin(broadcast(fit))
      .withColumn("shrunk_raw", expr("(r + alpha) / (n + nu)"))
      .select(col("l_partkey"), col("n").as("n_trials"),
        col("r").as("n_returns"),
        expr("ROUND(CAST(r AS DOUBLE) / n, 6)").as("raw_rate"),
        expr("ROUND(shrunk_raw, 6)").as("shrunk_rate"),
        col("alpha"), round(col("nu") - col("alpha"), 4).as("beta"),
        col("k_fit"))
      .orderBy(desc("shrunk_rate"), asc("l_partkey"))
      .limit(15)
  }

  val q244Oracle: String =
    """WITH per AS (
      |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS r
      |  FROM lineitem GROUP BY 1),
      |fit0 AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS k_fit,
      |    SUM(CAST(r AS DOUBLE) / n) AS sp,
      |    SUM((CAST(r AS DOUBLE) / n) * (CAST(r AS DOUBLE) / n)) AS spp
      |  FROM per WHERE n >= 3),
      |fit1 AS (
      |  SELECT k_fit, sp / k_fit AS xbar,
      |    CASE WHEN k_fit > 1 THEN (spp - sp * sp / k_fit) / (k_fit - 1)
      |      END AS s2
      |  FROM fit0),
      |fit2 AS (
      |  SELECT k_fit, xbar,
      |    CASE WHEN s2 > 0 THEN xbar * (1 - xbar) / s2 - 1 END AS nu_raw
      |  FROM fit1),
      |fit AS (
      |  SELECT k_fit,
      |    CASE WHEN nu_raw > 0 THEN ROUND(nu_raw, 4) END AS nu,
      |    ROUND(xbar * nu_raw, 4) AS alpha
      |  FROM fit2
      |  WHERE CASE WHEN nu_raw > 0 THEN ROUND(nu_raw, 4) END IS NOT NULL)
      |SELECT p.l_partkey, p.n AS n_trials, p.r AS n_returns,
      |  ROUND(CAST(p.r AS DOUBLE) / p.n, 6) AS raw_rate,
      |  ROUND((p.r + f.alpha) / (p.n + f.nu), 6) AS shrunk_rate,
      |  f.alpha, ROUND(f.nu - f.alpha, 4) AS beta, f.k_fit
      |FROM per p, fit f
      |ORDER BY shrunk_rate DESC, p.l_partkey
      |LIMIT 15""".stripMargin

  /** Q245 — banded dynamic-time-warping distance matrix between the
    * event types' daily revenue series (Berndt & Clifford 1994; Sakoe &
    * Chiba 1978 band w = 7): the alignment-tolerant series comparison
    * the lockstep family (Q216's lead-lag cross-correlation) can't give
    * — a pattern that runs days late still matches, and warp_gain =
    * 1 − dtw/L1 reads exactly how much of the lockstep distance was
    * mere misalignment. Engine side runs the whole DP inside the native
    * codegen'd `graft_dtw` expression over per-type collected series;
    * the oracle replays the SAME DP as a recursive CTE via the
    * prefix-min identity D(i,j) = P(i,j) + min_k [min(D(i−1,k),
    * D(i−1,k−1)) − PP(i,k)] (entry column k, within-row run k→j), so
    * the hash match proves the dynamic program itself, cell for cell.
    *
    * Determinism: costs |aᵢ−bⱼ| and every path sum are exact int64 —
    * there is NO float anywhere in the distance; dtw ≤ L1 (the diagonal
    * is a valid path) is asserted in the spec. dtw_per_day/warp_gain
    * are single divides rounded once; L1 = 0 (identical series) guards
    * warp_gain NULL.
    *
    * Scale notes: series are spine-bounded (≤ calendar days) and
    * collected per type AFTER the one-scan daily aggregate — k·n longs,
    * not events; the pair join is k²/2 rows with the O(n·w) DP inside
    * whole-stage codegen. At 10⁴ entities × 10³ days this is the
    * standard grouped-series topology: shuffle = the daily aggregate,
    * compute = embarrassingly parallel per pair.
    */
  def q245(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val series = grid.groupBy(col("event_type"))
      .agg(expr("transform(sort_array(collect_list(struct(day, v)))," +
        " s -> s.v)").as("s"),
        count(lit(1)).as("n"))
    val a = series.select(col("event_type").as("ta"), col("s").as("sa"),
      col("n"))
    val b = series.select(col("event_type").as("tb"), col("s").as("sb"))
    a.join(b, col("ta") < col("tb"))
      .withColumn("dtw", expr("graft_dtw(sa, sb, 7)"))
      .withColumn("l1", expr("aggregate(zip_with(sa, sb," +
        " (x, y) -> abs(x - y)), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .select(col("ta"), col("tb"), col("n").as("n_days"),
        col("dtw"), col("l1").as("l1_lockstep"),
        expr("ROUND(CAST(dtw AS DOUBLE) / n, 2)").as("dtw_per_day"),
        expr("CASE WHEN l1 > 0 THEN" +
          " ROUND(1 - CAST(dtw AS DOUBLE) / l1, 6) END").as("warp_gain"))
      .orderBy(asc("ta"), asc("tb"))
  }

  val q245Oracle: String =
    s"""WITH RECURSIVE $gridSql,
       |bnd AS (SELECT MIN(day) AS dmin FROM grid),
       |idx AS (
       |  SELECT event_type, day - (SELECT dmin FROM bnd) AS i, v
       |  FROM grid),
       |pairs AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb
       |  FROM (SELECT DISTINCT event_type FROM grid) a,
       |       (SELECT DISTINCT event_type FROM grid) b
       |  WHERE a.event_type < b.event_type),
       |cost AS (
       |  SELECT p.ta, p.tb, a.i AS i, b.i AS j, ABS(a.v - b.v) AS c
       |  FROM pairs p
       |  JOIN idx a ON a.event_type = p.ta
       |  JOIN idx b ON b.event_type = p.tb AND ABS(a.i - b.i) <= 7),
       |pre AS (
       |  SELECT ta, tb, i, j, c,
       |    SUM(c) OVER (PARTITION BY ta, tb, i ORDER BY j) AS p,
       |    SUM(c) OVER (PARTITION BY ta, tb, i ORDER BY j) - c AS pp
       |  FROM cost),
       |dp AS (
       |  SELECT ta, tb, 0 AS i, j, p AS d FROM pre WHERE i = 0
       |  UNION ALL
       |  SELECT t.ta, t.tb, t.i, t.j,
       |    t.p + MIN(LEAST(
       |      CASE WHEN r.j <= t.j AND r.j >= t.i - 7
       |        THEN r.d - p1.pp END,
       |      CASE WHEN r.j + 1 <= t.j AND r.j + 1 >= t.i - 7
       |        THEN r.d - p2.pp END)) AS d
       |  FROM dp r
       |  JOIN pre t ON t.ta = r.ta AND t.tb = r.tb AND t.i = r.i + 1
       |  LEFT JOIN pre p1 ON p1.ta = t.ta AND p1.tb = t.tb
       |    AND p1.i = t.i AND p1.j = r.j
       |  LEFT JOIN pre p2 ON p2.ta = t.ta AND p2.tb = t.tb
       |    AND p2.i = t.i AND p2.j = r.j + 1
       |  GROUP BY t.ta, t.tb, t.i, t.j, t.p
       |  HAVING MIN(LEAST(
       |      CASE WHEN r.j <= t.j AND r.j >= t.i - 7
       |        THEN r.d - p1.pp END,
       |      CASE WHEN r.j + 1 <= t.j AND r.j + 1 >= t.i - 7
       |        THEN r.d - p2.pp END)) IS NOT NULL),
       |nn AS (SELECT MAX(i) AS last FROM idx),
       |lock AS (
       |  SELECT p.ta, p.tb,
       |    CAST(COUNT(*) AS BIGINT) AS n_days,
       |    CAST(SUM(ABS(a.v - b.v)) AS BIGINT) AS l1
       |  FROM pairs p
       |  JOIN idx a ON a.event_type = p.ta
       |  JOIN idx b ON b.event_type = p.tb AND b.i = a.i
       |  GROUP BY 1, 2)
       |SELECT l.ta, l.tb, l.n_days,
       |  CAST(d.d AS BIGINT) AS dtw, l.l1 AS l1_lockstep,
       |  ROUND(CAST(d.d AS DOUBLE) / l.n_days, 2) AS dtw_per_day,
       |  CASE WHEN l.l1 > 0 THEN
       |    ROUND(1 - CAST(d.d AS DOUBLE) / l.l1, 6) END AS warp_gain
       |FROM lock l
       |JOIN dp d ON d.ta = l.ta AND d.tb = l.tb
       |  AND d.i = (SELECT last FROM nn) AND d.j = (SELECT last FROM nn)
       |ORDER BY l.ta, l.tb""".stripMargin

  /** Q252 — Pettitt change-point test per event type on the zero-filled
    * daily revenue series (Pettitt 1979): the DISTRIBUTION-FREE sibling
    * of Q124's CUSUM — no reference mean μ or slack κ to pick. The
    * statistic is U_t = Σ_{i≤t} Σ_{j>t} sign(v_j − v_i); the change
    * point is t* = argmax|U_t| over 1..n−1 with
    * K = max|U_t| and the classical tail bound
    * p ≈ 2·exp(−6K²/(n³+n²)). The O(n²) double sum never materializes
    * per t: each ordered day pair (i<j, s = sign) contributes s once to
    * a suffix margin C_i = Σ_{j>i} s and once to a prefix margin
    * D_j = Σ_{i<j} s, and the telescoping identity
    * U_t = U_{t−1} + C_t − D_t recovers every U_t with one running-sum
    * window — two groupBys and a window over the pair relation.
    *
    * Determinism: signs, margins, U_t, and K are exact int64 (|U| ≤
    * n²/2 — microscopic); the argmax tie-breaks on min day; p is one
    * exp over identical doubles, rounded 6; means on either side of t*
    * are exact-cent sums divided once, rounded 2. A single-day spine
    * has no interior split point — the type degrades to NULL stats and
    * an 'insufficient' verdict, never NaN (the Q243 guard discipline).
    *
    * Scale notes: pairs live on the bounded per-type spine (days²/2
    * rows per type after the one corpus-scan daily aggregate), the
    * margins collapse them right back to spine size, and the window
    * partitions per type — the corpus is never self-joined at event
    * granularity. At 10³ days this is ~5·10⁵ pair rows per type, flat
    * in corpus size.
    */
  def q252(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val a = grid.select(col("event_type"), col("day").as("di"),
      col("v").as("vi"))
    val b = grid.select(col("event_type").as("tb"), col("day").as("dj"),
      col("v").as("vj"))
    val pr = a.join(b, col("event_type") === col("tb") && col("dj") > col("di"))
      .select(col("event_type"), col("di"), col("dj"),
        signum(col("vj") - col("vi")).cast("long").as("s"))
    val cSuf = pr.groupBy(col("event_type"), col("di").as("day"))
      .agg(sum(col("s")).cast("long").as("cs"))
    val dPre = pr.groupBy(col("event_type"), col("dj").as("day"))
      .agg(sum(col("s")).cast("long").as("ds"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val u = grid
      .join(cSuf, Seq("event_type", "day"), "left")
      .join(dPre, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        (coalesce(col("cs"), lit(0L)) - coalesce(col("ds"), lit(0L))).as("delta"))
      .withColumn("u", sum(col("delta")).over(w).cast("long"))
    val nd = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        max(col("day")).cast("long").as("dmax"))
    val best = u.join(nd, Seq("event_type"))
      .filter(col("day") < col("dmax"))
      .withColumn("absu", abs(col("u")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(desc("absu"), asc("day"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("absu").as("k_stat"),
        col("day").as("t_star"))
    val split = grid.join(best, Seq("event_type"))
      .groupBy(col("event_type"), col("k_stat"), col("t_star"))
      .agg(
        round(sum(when(col("day") <= col("t_star"), col("v")).otherwise(0L))
          .cast("double") /
          sum(when(col("day") <= col("t_star"), 1L).otherwise(0L)), 2)
          .as("mean_before_cents"),
        round(sum(when(col("day") > col("t_star"), col("v")).otherwise(0L))
          .cast("double") /
          sum(when(col("day") > col("t_star"), 1L).otherwise(0L)), 2)
          .as("mean_after_cents"))
    nd.join(split, Seq("event_type"), "left")
      .withColumn("p_approx",
        when(col("k_stat").isNotNull && col("n_days") > 1,
          round(least(lit(1.0), lit(2.0) * exp(lit(-6.0) *
            col("k_stat") * col("k_stat") /
            (col("n_days") * col("n_days") * col("n_days") +
              col("n_days") * col("n_days")))), 6)))
      .withColumn("verdict",
        when(col("k_stat").isNull, "insufficient")
          .when(col("p_approx") < 0.05, "change_point")
          .otherwise("stable"))
      .select(col("event_type"), col("n_days"), col("k_stat"),
        col("t_star"), col("mean_before_cents"), col("mean_after_cents"),
        col("p_approx"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q252Oracle: String =
    s"""WITH $gridSql,
       |pr AS (
       |  SELECT a.event_type, a.day AS di, b.day AS dj,
       |    CAST(SIGN(b.v - a.v) AS BIGINT) AS s
       |  FROM grid a JOIN grid b
       |    ON b.event_type = a.event_type AND b.day > a.day),
       |csuf AS (
       |  SELECT event_type, di AS day, CAST(SUM(s) AS BIGINT) AS cs
       |  FROM pr GROUP BY 1, 2),
       |dpre AS (
       |  SELECT event_type, dj AS day, CAST(SUM(s) AS BIGINT) AS ds
       |  FROM pr GROUP BY 1, 2),
       |u AS (
       |  SELECT g.event_type, g.day,
       |    CAST(SUM(COALESCE(c.cs, 0) - COALESCE(d.ds, 0)) OVER (
       |      PARTITION BY g.event_type ORDER BY g.day) AS BIGINT) AS u
       |  FROM grid g
       |  LEFT JOIN csuf c ON c.event_type = g.event_type AND c.day = g.day
       |  LEFT JOIN dpre d ON d.event_type = g.event_type AND d.day = g.day),
       |nd AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       |    CAST(MAX(day) AS BIGINT) AS dmax
       |  FROM grid GROUP BY 1),
       |best AS (
       |  SELECT event_type, k_stat, t_star FROM (
       |    SELECT u.event_type, ABS(u.u) AS k_stat, u.day AS t_star,
       |      ROW_NUMBER() OVER (PARTITION BY u.event_type
       |        ORDER BY ABS(u.u) DESC, u.day) AS rk
       |    FROM u JOIN nd ON nd.event_type = u.event_type
       |    WHERE u.day < nd.dmax) r
       |  WHERE rk = 1),
       |split AS (
       |  SELECT g.event_type, b.k_stat, b.t_star,
       |    ROUND(CAST(SUM(CASE WHEN g.day <= b.t_star THEN g.v ELSE 0 END)
       |        AS DOUBLE)
       |      / SUM(CASE WHEN g.day <= b.t_star THEN 1 ELSE 0 END), 2)
       |      AS mean_before_cents,
       |    ROUND(CAST(SUM(CASE WHEN g.day > b.t_star THEN g.v ELSE 0 END)
       |        AS DOUBLE)
       |      / SUM(CASE WHEN g.day > b.t_star THEN 1 ELSE 0 END), 2)
       |      AS mean_after_cents
       |  FROM grid g JOIN best b ON b.event_type = g.event_type
       |  GROUP BY 1, 2, 3)
       |SELECT nd.event_type, nd.n_days, s.k_stat, s.t_star,
       |  s.mean_before_cents, s.mean_after_cents,
       |  CASE WHEN s.k_stat IS NOT NULL AND nd.n_days > 1 THEN
       |    ROUND(LEAST(1.0, 2.0 * EXP(-6.0 * s.k_stat * s.k_stat
       |      / (CAST(nd.n_days AS DOUBLE) * nd.n_days * nd.n_days
       |         + CAST(nd.n_days AS DOUBLE) * nd.n_days))), 6)
       |  END AS p_approx,
       |  CASE WHEN s.k_stat IS NULL THEN 'insufficient'
       |    WHEN ROUND(LEAST(1.0, 2.0 * EXP(-6.0 * s.k_stat * s.k_stat
       |      / (CAST(nd.n_days AS DOUBLE) * nd.n_days * nd.n_days
       |         + CAST(nd.n_days AS DOUBLE) * nd.n_days))), 6) < 0.05
       |    THEN 'change_point' ELSE 'stable' END AS verdict
       |FROM nd LEFT JOIN split s ON s.event_type = nd.event_type
       |ORDER BY nd.event_type NULLS FIRST""".stripMargin

  /** Q253 — Hurst exponent by rescaled-range (R/S) analysis per event
    * type on the zero-filled daily revenue series (Hurst 1951; the
    * Mandelbrot–Wallis form): long-memory detection the lag-window
    * family (Q128's ACF) reads only locally. The spine splits into
    * full blocks of n ∈ {4, 8, 16} days; per block the range of the
    * mean-centered cumulative sum R = max_t Y_t − min_t Y_t over the
    * population σ gives R/S, averaged per size, and the OLS slope of
    * ln(mean R/S) on ln(n) is the Hurst estimate (H ≈ 0.5 random walk,
    * > 0.5 persistent, < 0.5 mean-reverting).
    *
    * Determinism: deviations never materialize as floats — the block
    * identity Y_t·n = n·Σ_{i≤t}v_i − t·S1 keeps the cumulative range
    * R·n = max−min exact int64, and n²σ² = n·S2 − S1² is exact int64,
    * so R/S = (R·n)/√(n·S2 − S1²) is ONE divide of exact integers per
    * block. Zero-variance blocks are skipped (flat series degrade to
    * NULL hurst + 'degenerate', never NaN); per-size means and the
    * 3-point ln–ln OLS are double arithmetic rounded 4 (the Q137
    * sum-order tolerance, orders of magnitude inside the rounding).
    *
    * Scale notes: everything after the one corpus-scan daily aggregate
    * lives on the 3× replicated per-type spine (≤ 3·days rows per
    * type); block windows partition by (type, size, block). Cents are
    * int64 through n·S2 — at 10¹¹-cent daily revenues switch S2 to
    * double before the product (documented, not needed at any test sf).
    */
  def q253(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val dmin = grid.agg(min(col("day")).as("dmin"))
    val idx = grid.crossJoin(broadcast(dmin))
      .select(col("event_type"), (col("day") - col("dmin")).as("i"), col("v"))
    val sized = idx
      .withColumn("bn", explode(array(lit(4L), lit(8L), lit(16L))))
      .withColumn("blk", expr("i DIV bn"))
    val wAll = Window.partitionBy(col("event_type"), col("bn"), col("blk"))
    val wOrd = wAll.orderBy(col("i"))
    val perBlock = sized
      .withColumn("cnt", count(lit(1)).over(wAll))
      .filter(col("cnt") === col("bn"))
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("cum", sum(col("v")).over(wOrd).cast("long"))
      .withColumn("s1", sum(col("v")).over(wAll).cast("long"))
      // Σv² within a block in DECIMAL(38,0)/HUGEINT (r12: a single v²
      // of an sf10-scale 3·10⁹-cent day tops 2⁶³ — measured throwing
      // in the sweep); vs follows, the R/S divide is unchanged in-range.
      .withColumn("s2", sum(col("v").cast("decimal(38,0)") * col("v"))
        .over(wAll).cast("decimal(38,0)"))
      .withColumn("y", col("bn") * col("cum") - col("rn") * col("s1"))
      .groupBy(col("event_type"), col("bn"), col("blk"), col("s1"), col("s2"))
      .agg((max(col("y")) - min(col("y"))).cast("long").as("r2"))
      .withColumn("vs", col("bn").cast("decimal(38,0)") * col("s2") -
        col("s1").cast("decimal(38,0)") * col("s1"))
      .withColumn("rs", when(col("vs") > 0,
        col("r2").cast("double") / sqrt(col("vs").cast("double"))))
    val perSize = perBlock.groupBy(col("event_type"), col("bn"))
      .agg(count(col("rs")).cast("long").as("nb"), avg(col("rs")).as("mrs"))
    val fit = perSize.filter(col("mrs").isNotNull)
      .select(col("event_type"), log(col("bn")).as("x"), log(col("mrs")).as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("k"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("k") >= 2)
      .select(col("event_type"),
        round((col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx")), 4).as("hurst"))
    val wide = perSize.groupBy(col("event_type"))
      .agg(
        coalesce(max(when(col("bn") === 4, col("nb"))), lit(0L)).as("nb4"),
        coalesce(max(when(col("bn") === 8, col("nb"))), lit(0L)).as("nb8"),
        coalesce(max(when(col("bn") === 16, col("nb"))), lit(0L)).as("nb16"),
        round(max(when(col("bn") === 4, col("mrs"))), 4).as("rs4"),
        round(max(when(col("bn") === 8, col("mrs"))), 4).as("rs8"),
        round(max(when(col("bn") === 16, col("mrs"))), 4).as("rs16"))
    val nd = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"))
    nd.join(wide, Seq("event_type"), "left")
      .join(fit, Seq("event_type"), "left")
      .withColumn("regime",
        when(col("hurst").isNull, "degenerate")
          .when(col("hurst") > 0.55, "persistent")
          .when(col("hurst") < 0.45, "anti_persistent")
          .otherwise("random_walkish"))
      .select(col("event_type"), col("n_days"), col("nb4"), col("nb8"),
        col("nb16"), col("rs4"), col("rs8"), col("rs16"), col("hurst"),
        col("regime"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q253Oracle: String =
    s"""WITH $gridSql,
       |bnd AS (SELECT MIN(day) AS dmin FROM grid),
       |idx AS (
       |  SELECT event_type, day - (SELECT dmin FROM bnd) AS i, v FROM grid),
       |sized AS (
       |  SELECT event_type, i, v, bn, i // bn AS blk
       |  FROM idx, (SELECT UNNEST([4, 8, 16]) AS bn)),
       |yy AS (
       |  SELECT event_type, bn, blk,
       |    COUNT(*) OVER w_all AS cnt,
       |    ROW_NUMBER() OVER w_ord AS rn,
       |    SUM(v) OVER w_ord AS cum,
       |    SUM(v) OVER w_all AS s1,
       |    SUM(CAST(v AS HUGEINT) * v) OVER w_all AS s2
       |  FROM sized
       |  WINDOW
       |    w_all AS (PARTITION BY event_type, bn, blk),
       |    w_ord AS (PARTITION BY event_type, bn, blk ORDER BY i)),
       |blocks AS (
       |  SELECT event_type, bn, blk,
       |    CAST(MAX(bn * cum - rn * s1) - MIN(bn * cum - rn * s1) AS BIGINT)
       |      AS r2,
       |    CAST(MAX(CAST(bn AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
       |      AS HUGEINT) AS vs
       |  FROM yy WHERE cnt = bn
       |  GROUP BY 1, 2, 3),
       |perblock AS (
       |  SELECT event_type, bn, blk,
       |    CASE WHEN vs > 0 THEN CAST(r2 AS DOUBLE) / SQRT(CAST(vs AS DOUBLE)) END
       |      AS rs
       |  FROM blocks),
       |persize AS (
       |  SELECT event_type, bn, CAST(COUNT(rs) AS BIGINT) AS nb,
       |    AVG(rs) AS mrs
       |  FROM perblock GROUP BY 1, 2),
       |fit AS (
       |  SELECT event_type,
       |    ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 4) AS hurst
       |  FROM (
       |    SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS k,
       |      SUM(LN(bn)) AS sx, SUM(LN(mrs)) AS sy,
       |      SUM(LN(bn) * LN(mrs)) AS sxy, SUM(LN(bn) * LN(bn)) AS sxx
       |    FROM persize WHERE mrs IS NOT NULL
       |    GROUP BY 1) f
       |  WHERE k >= 2),
       |wide AS (
       |  SELECT event_type,
       |    COALESCE(MAX(CASE WHEN bn = 4 THEN nb END), 0) AS nb4,
       |    COALESCE(MAX(CASE WHEN bn = 8 THEN nb END), 0) AS nb8,
       |    COALESCE(MAX(CASE WHEN bn = 16 THEN nb END), 0) AS nb16,
       |    ROUND(MAX(CASE WHEN bn = 4 THEN mrs END), 4) AS rs4,
       |    ROUND(MAX(CASE WHEN bn = 8 THEN mrs END), 4) AS rs8,
       |    ROUND(MAX(CASE WHEN bn = 16 THEN mrs END), 4) AS rs16
       |  FROM persize GROUP BY 1),
       |nd AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
       |  FROM grid GROUP BY 1)
       |SELECT nd.event_type, nd.n_days, w.nb4, w.nb8, w.nb16,
       |  w.rs4, w.rs8, w.rs16, f.hurst,
       |  CASE WHEN f.hurst IS NULL THEN 'degenerate'
       |    WHEN f.hurst > 0.55 THEN 'persistent'
       |    WHEN f.hurst < 0.45 THEN 'anti_persistent'
       |    ELSE 'random_walkish' END AS regime
       |FROM nd
       |LEFT JOIN wide w ON w.event_type = nd.event_type
       |LEFT JOIN fit f ON f.event_type = nd.event_type
       |ORDER BY nd.event_type NULLS FIRST""".stripMargin

  /** Q254 — permutation entropy of order 3 per event type on the
    * zero-filled daily revenue series (Bandt & Pompe 2002): complexity
    * of the series' ORDINAL dynamics — every sliding day triple
    * (v_t, v_{t+1}, v_{t+2}) maps to one of 3! = 6 ordinal patterns and
    * H = −Σ p ln p over the pattern distribution, normalized by ln 6
    * (0 = fully predictable ordering, 1 = ordinally white). Reads
    * regularity that variance-based diagnostics (Q241) and spectral
    * reads (Q239) are blind to, and is invariant to any monotone
    * rescaling of revenue.
    *
    * Determinism: the pattern is decided by three exact int64
    * comparisons with the Bandt–Pompe stable tie rule (equal values
    * rank by time index, i.e. earlier-first ⇔ `<=` on the later
    * element), so counts are exact; shares and ln are identical
    * doubles, H sums ≤ 6 terms, h_norm rounds at 4. Top pattern ranks
    * count desc then pattern asc — fully tie-broken.
    *
    * Scale notes: one LEAD window over the bounded per-type spine after
    * the one corpus-scan daily aggregate; the pattern distribution is
    * at most 6 rows per type. Flat in corpus size past the daily
    * aggregate.
    */
  def q254(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val pat = grid
      .withColumn("v1", lead(col("v"), 1).over(w))
      .withColumn("v2", lead(col("v"), 2).over(w))
      .filter(col("v1").isNotNull && col("v2").isNotNull)
      .withColumn("pattern",
        when(col("v") <= col("v1") && col("v") <= col("v2") &&
          col("v1") <= col("v2"), "012")
          .when(col("v") <= col("v1") && col("v") <= col("v2"), "021")
          .when(col("v") <= col("v1") && col("v2") < col("v"), "201")
          .when(col("v1") < col("v") && col("v") <= col("v2"), "102")
          .when(col("v1") < col("v") && col("v1") <= col("v2"), "120")
          .otherwise("210"))
      .groupBy(col("event_type"), col("pattern"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val tot = pat.groupBy(col("event_type"))
      .agg(sum(col("cnt")).cast("long").as("n_windows"))
    val h = pat.join(tot, Seq("event_type"))
      .groupBy(col("event_type"), col("n_windows"))
      .agg(round(-sum((col("cnt").cast("double") / col("n_windows")) *
        log(col("cnt").cast("double") / col("n_windows"))) / log(lit(6.0)), 4)
        .as("h_norm"))
    val top = pat
      .withColumn("rk", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(desc("cnt"), asc("pattern"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("pattern").as("top_pattern"),
        col("cnt").as("top_cnt"))
    val wide = pat.groupBy(col("event_type"))
      .agg(
        coalesce(max(when(col("pattern") === "012", col("cnt"))), lit(0L)).as("c012"),
        coalesce(max(when(col("pattern") === "021", col("cnt"))), lit(0L)).as("c021"),
        coalesce(max(when(col("pattern") === "102", col("cnt"))), lit(0L)).as("c102"),
        coalesce(max(when(col("pattern") === "120", col("cnt"))), lit(0L)).as("c120"),
        coalesce(max(when(col("pattern") === "201", col("cnt"))), lit(0L)).as("c201"),
        coalesce(max(when(col("pattern") === "210", col("cnt"))), lit(0L)).as("c210"))
    h.join(wide, Seq("event_type"))
      .join(top, Seq("event_type"))
      .select(col("event_type"), col("n_windows"), col("c012"), col("c021"),
        col("c102"), col("c120"), col("c201"), col("c210"),
        col("h_norm"), col("top_pattern"), col("top_cnt"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q254Oracle: String =
    s"""WITH $gridSql,
       |led AS (
       |  SELECT event_type, v,
       |    LEAD(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS v1,
       |    LEAD(v, 2) OVER (PARTITION BY event_type ORDER BY day) AS v2
       |  FROM grid),
       |pat AS (
       |  SELECT event_type,
       |    CASE
       |      WHEN v <= v1 AND v <= v2 AND v1 <= v2 THEN '012'
       |      WHEN v <= v1 AND v <= v2 THEN '021'
       |      WHEN v <= v1 AND v2 < v THEN '201'
       |      WHEN v1 < v AND v <= v2 THEN '102'
       |      WHEN v1 < v AND v1 <= v2 THEN '120'
       |      ELSE '210' END AS pattern,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM led WHERE v1 IS NOT NULL AND v2 IS NOT NULL
       |  GROUP BY 1, 2),
       |tot AS (
       |  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_windows
       |  FROM pat GROUP BY 1),
       |h AS (
       |  SELECT p.event_type, t.n_windows,
       |    ROUND(-SUM((CAST(p.cnt AS DOUBLE) / t.n_windows)
       |      * LN(CAST(p.cnt AS DOUBLE) / t.n_windows)) / LN(6.0), 4)
       |      AS h_norm
       |  FROM pat p JOIN tot t ON t.event_type = p.event_type
       |  GROUP BY 1, 2),
       |top AS (
       |  SELECT event_type, pattern AS top_pattern, cnt AS top_cnt FROM (
       |    SELECT event_type, pattern, cnt,
       |      ROW_NUMBER() OVER (PARTITION BY event_type
       |        ORDER BY cnt DESC, pattern) AS rk
       |    FROM pat) r
       |  WHERE rk = 1),
       |wide AS (
       |  SELECT event_type,
       |    COALESCE(MAX(CASE WHEN pattern = '012' THEN cnt END), 0) AS c012,
       |    COALESCE(MAX(CASE WHEN pattern = '021' THEN cnt END), 0) AS c021,
       |    COALESCE(MAX(CASE WHEN pattern = '102' THEN cnt END), 0) AS c102,
       |    COALESCE(MAX(CASE WHEN pattern = '120' THEN cnt END), 0) AS c120,
       |    COALESCE(MAX(CASE WHEN pattern = '201' THEN cnt END), 0) AS c201,
       |    COALESCE(MAX(CASE WHEN pattern = '210' THEN cnt END), 0) AS c210
       |  FROM pat GROUP BY 1)
       |SELECT h.event_type, h.n_windows, w.c012, w.c021, w.c102, w.c120,
       |  w.c201, w.c210, h.h_norm, t.top_pattern, t.top_cnt
       |FROM h
       |JOIN wide w ON w.event_type = h.event_type
       |JOIN top t ON t.event_type = h.event_type
       |ORDER BY h.event_type NULLS FIRST""".stripMargin

  /** Q255 — discrete-Fourier periodogram over candidate periods P ∈
    * 2..14 days per event type on the zero-filled daily revenue series
    * (Schuster 1898; the Goertzel single-bin form): power(P) =
    * C_P² + S_P² with C_P = Σ e_t cos(2πt/P), S_P = Σ e_t sin(2πt/P)
    * over mean-centered values, normalized to shares. Emits the
    * dominant period (is the cycle actually weekly?), the runner-up,
    * the P = 7 share directly, and the spectral entropy over the 13
    * candidate bins (1 = white, 0 = single pure tone) — the frequency-
    * domain read next to Q239's Haar scale decomposition and Q219's
    * fixed-7 seasonal strength.
    *
    * Determinism: centering is exact — e_t = n·v_t − S1 in int64 —
    * and every trig argument is the identical double expression
    * 2.0·π·t/P in both engines; C/S are bounded ~30-term double sums
    * (sum-order noise ~1e-15 relative), shares round at 6 BEFORE the
    * dominant-period rank (P asc tie-break), entropy rounds at 4. A
    * flat series has zero total power and degrades to NULL shares +
    * 'flat', never NaN.
    *
    * Scale notes: the spine replicates 13× (once per candidate P) —
    * still bounded per type — and each (type, P) bin is one map-side-
    * combined aggregate. Nothing rescans the corpus after the daily
    * aggregate.
    */
  def q255(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val dmin = grid.agg(min(col("day")).as("dmin"))
    val base = grid.crossJoin(broadcast(dmin))
      .select(col("event_type"), (col("day") - col("dmin")).as("t"), col("v"))
    val wAll = Window.partitionBy(col("event_type"))
    val cent = base
      .withColumn("n", count(lit(1)).over(wAll).cast("long"))
      .withColumn("s1", sum(col("v")).over(wAll).cast("long"))
      .withColumn("e", (col("n") * col("v") - col("s1")).cast("double"))
    val bins = cent
      .withColumn("p", explode(expr("sequence(2, 14)")))
      .withColumn("arg",
        lit(2.0) * lit(math.Pi) * col("t").cast("double") / col("p"))
      .groupBy(col("event_type"), col("n"), col("p"))
      .agg(sum(col("e") * cos(col("arg"))).as("cp"),
        sum(col("e") * sin(col("arg"))).as("sp"))
      .withColumn("power", col("cp") * col("cp") + col("sp") * col("sp"))
    val tot = bins.groupBy(col("event_type"))
      .agg(sum(col("power")).as("tp"))
    val shares = bins.join(tot, Seq("event_type"))
      .withColumn("share",
        when(col("tp") > 0, round(col("power") / col("tp"), 6)))
    val ranked = shares
      .withColumn("rk", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(desc_nulls_last("share"), asc("p"))))
    val top = ranked.filter(col("rk") === 1)
      .select(col("event_type"), col("n").as("n_days"),
        when(col("share").isNotNull, col("p")).as("p_star"),
        col("share").as("share_star"))
    val second = ranked.filter(col("rk") === 2)
      .select(col("event_type"),
        when(col("share").isNotNull, col("p")).as("p_2nd"),
        col("share").as("share_2nd"))
    val p7 = shares.filter(col("p") === 7)
      .select(col("event_type"), col("share").as("p7_share"))
    val ent = shares.filter(col("share").isNotNull && col("power") > 0)
      .groupBy(col("event_type"))
      .agg(round(-sum((col("power") / col("tp")) *
        log(col("power") / col("tp"))) / log(lit(13.0)), 4)
        .as("spectral_entropy"))
    top.join(second, Seq("event_type"), "left")
      .join(p7, Seq("event_type"), "left")
      .join(ent, Seq("event_type"), "left")
      .withColumn("verdict",
        when(col("share_star").isNull, "flat")
          .when(col("p_star") === 7, "weekly")
          .otherwise("non_weekly"))
      .select(col("event_type"), col("n_days"), col("p_star"),
        col("share_star"), col("p_2nd"), col("share_2nd"), col("p7_share"),
        col("spectral_entropy"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q255Oracle: String =
    s"""WITH $gridSql,
       |bnd AS (SELECT MIN(day) AS dmin FROM grid),
       |base AS (
       |  SELECT event_type, day - (SELECT dmin FROM bnd) AS t, v FROM grid),
       |cent AS (
       |  SELECT event_type, t,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
       |    CAST(CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) * v
       |      - CAST(SUM(v) OVER (PARTITION BY event_type) AS BIGINT)
       |      AS DOUBLE) AS e
       |  FROM base),
       |bins AS (
       |  SELECT event_type, n, p,
       |    SUM(e * COS(2.0 * PI() * t / p)) AS cp,
       |    SUM(e * SIN(2.0 * PI() * t / p)) AS sp
       |  FROM cent, (SELECT UNNEST(generate_series(2, 14)) AS p)
       |  GROUP BY 1, 2, 3),
       |pw AS (
       |  SELECT event_type, n, p, cp * cp + sp * sp AS power FROM bins),
       |tot AS (SELECT event_type, SUM(power) AS tp FROM pw GROUP BY 1),
       |shares AS (
       |  SELECT w.event_type, w.n, w.p, w.power, t.tp,
       |    CASE WHEN t.tp > 0 THEN ROUND(w.power / t.tp, 6) END AS share
       |  FROM pw w JOIN tot t ON t.event_type = w.event_type),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
       |    ORDER BY share DESC NULLS LAST, p) AS rk
       |  FROM shares),
       |top AS (
       |  SELECT event_type, n AS n_days,
       |    CASE WHEN share IS NOT NULL THEN p END AS p_star,
       |    share AS share_star
       |  FROM ranked WHERE rk = 1),
       |sec AS (
       |  SELECT event_type,
       |    CASE WHEN share IS NOT NULL THEN p END AS p_2nd,
       |    share AS share_2nd
       |  FROM ranked WHERE rk = 2),
       |p7 AS (
       |  SELECT event_type, share AS p7_share FROM shares WHERE p = 7),
       |ent AS (
       |  SELECT event_type,
       |    ROUND(-SUM((power / tp) * LN(power / tp)) / LN(13.0), 4)
       |      AS spectral_entropy
       |  FROM shares WHERE share IS NOT NULL AND power > 0
       |  GROUP BY 1)
       |SELECT t.event_type, t.n_days, t.p_star, t.share_star,
       |  s.p_2nd, s.share_2nd, p7.p7_share, e.spectral_entropy,
       |  CASE WHEN t.share_star IS NULL THEN 'flat'
       |    WHEN t.p_star = 7 THEN 'weekly' ELSE 'non_weekly' END AS verdict
       |FROM top t
       |LEFT JOIN sec s ON s.event_type = t.event_type
       |LEFT JOIN p7 ON p7.event_type = t.event_type
       |LEFT JOIN ent e ON e.event_type = t.event_type
       |ORDER BY t.event_type NULLS FIRST""".stripMargin

  /** Q256 — multiple-testing control over Q229's permutation family
    * (Benjamini & Hochberg 1995; Bonferroni for contrast): the
    * missing piece once a test runs per PAIR — at m = k(k−1)/2
    * simultaneous tests, per-test α = 0.05 inflates the family-wise
    * false-positive rate toward 1 − 0.95^m. Because Q229's p-values
    * are exact add-one permutation ranks p = (1 + n_extreme)/200, the
    * entire BH step-up runs in INTEGER arithmetic: with q = 1/20,
    * p_(i) ≤ (i/m)·q ⇔ m·(1 + n_extreme) ≤ 10·i, the step-up
    * threshold is the largest passing p (tie-safe: rejection compares
    * p against the threshold VALUE, so equal p-values never split),
    * and Bonferroni is m·(1 + n_extreme) ≤ 10. No distributional
    * approximation anywhere — the whole gate is exact.
    *
    * Scale notes: reuses [[signFlipCounts]] (bounded spine × 199
    * replicates); the BH pass itself is k²/2 rows under two global
    * windows — at any corpus size this is dozens of rows, ranked once.
    */
  def q256(spark: SparkSession, dir: String): DataFrame = {
    val base = signFlipCounts(spark, dir)
      .withColumn("p_num", (col("n_extreme") + lit(1L)).cast("long"))
      .withColumn("rank", row_number().over(
        Window.orderBy(asc("p_num"), asc("type_a"), asc("type_b")))
        .cast("long"))
      .withColumn("m_tests",
        count(lit(1)).over(Window.partitionBy()).cast("long"))
      .withColumn("thr", max(when(
        col("m_tests") * col("p_num") <= lit(10L) * col("rank"),
        col("p_num"))).over(Window.partitionBy()))
      .withColumn("p_value", round(col("p_num") / lit(200.0), 4))
      .withColumn("bh_reject",
        when(col("thr").isNotNull && col("p_num") <= col("thr"), "reject")
          .otherwise("retain"))
      .withColumn("bonf_reject",
        when(col("m_tests") * col("p_num") <= lit(10L), "reject")
          .otherwise("retain"))
    base
      .withColumn("n_bh_rejected",
        sum(when(col("bh_reject") === "reject", 1L).otherwise(0L))
          .over(Window.partitionBy()).cast("long"))
      .select(col("rank"), col("type_a"), col("type_b"), col("n_days"),
        col("t_obs"), col("n_extreme"), col("p_value"), col("m_tests"),
        col("bh_reject"), col("bonf_reject"), col("n_bh_rejected"))
      .orderBy(asc("rank"))
  }

  val q256Oracle: String =
    s"""WITH $gridSql,
       |$signFlipCntSql,
       |ranked AS (
       |  SELECT type_a, type_b, n_days, t_obs, n_extreme,
       |    CAST(n_extreme + 1 AS BIGINT) AS p_num,
       |    CAST(ROW_NUMBER() OVER (
       |      ORDER BY n_extreme + 1, type_a, type_b) AS BIGINT) AS rank,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS m_tests
       |  FROM cnt),
       |thr AS (
       |  SELECT *, MAX(CASE WHEN m_tests * p_num <= 10 * rank
       |    THEN p_num END) OVER () AS thr
       |  FROM ranked),
       |dec AS (
       |  SELECT *,
       |    ROUND(p_num / 200.0, 4) AS p_value,
       |    CASE WHEN thr IS NOT NULL AND p_num <= thr
       |      THEN 'reject' ELSE 'retain' END AS bh_reject,
       |    CASE WHEN m_tests * p_num <= 10
       |      THEN 'reject' ELSE 'retain' END AS bonf_reject
       |  FROM thr)
       |SELECT rank, type_a, type_b, n_days, t_obs, n_extreme, p_value,
       |  m_tests, bh_reject, bonf_reject,
       |  CAST(SUM(CASE WHEN bh_reject = 'reject' THEN 1 ELSE 0 END)
       |    OVER () AS BIGINT) AS n_bh_rejected
       |FROM dec
       |ORDER BY rank""".stripMargin

  /** Q257 — partial autocorrelation function (lags 1..5) per event type
    * via the Durbin–Levinson recursion, with a Ljung–Box portmanteau
    * verdict (Durbin 1960; Levinson 1947; Ljung & Box 1978): where
    * Q128's ACF answers "is day t related to day t−k at all", the PACF
    * answers "is it related DIRECTLY, with the intermediate days
    * partialled out" — the standard AR-order-selection read (an AR(p)
    * series has PACF ≈ 0 beyond lag p). Lag-k autocorrelations are
    * Pearson over the overlapping windows with all five sufficient
    * sums exact int64; the five-step recursion φ_kk = (ρ_k −
    * Σφ_{k−1,j}ρ_{k−j})/(1 − Σφ_{k−1,j}ρ_j), φ_kj = φ_{k−1,j} −
    * φ_kk·φ_{k−1,k−j} is UNROLLED with textually identical expressions
    * in both engines, so every intermediate double matches bit-for-bit.
    * LB = n(n+2)·Σ ρ_k²/(n−k) gates against the χ²₅ 95% quantile
    * 11.0705 on the rounded statistic.
    *
    * Determinism: each ρ_k is one divide of exact int64 composites
    * (products cast to double only at the final num/√(a·b)); the DL
    * chain and LB are pure function composition of those identical
    * doubles; all outputs round at 4 and the verdict compares the
    * ROUNDED LB. Degenerate series (any zero-variance window ⇒ NULL ρ)
    * degrade to NULL PACF + 'degenerate', never NaN.
    *
    * Scale notes: the lag join replicates the spine 5× against itself
    * shifted — bounded per type — and everything downstream is one row
    * per type. Product sums and the n'·Σxy composites are carried in
    * DECIMAL(38,0)/HUGEINT (r12: the old ~10⁹-cent int64 fence was
    * MEASURED throwing at the sf10 rehearsal's 3·10⁹-cent days) —
    * exact to 10³⁸, beyond any physical spine.
    */
  def q257(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val lagged = grid
      .withColumn("k", explode(expr("sequence(1, 5)")))
      .select(col("event_type"), col("k"), (col("day") + col("k")).as("dayk"),
        col("v").as("x"))
      .join(grid.select(col("event_type"), col("day").as("dayk"),
        col("v").as("y")), Seq("event_type", "dayk"))
    // product sums + cross-products in DECIMAL(38,0)/HUGEINT (r12: the
    // sf10 sweep measured the documented int64 fence actually THROWING
    // at 3·10⁹-cent days — a single x² tops 2⁶³); the ρ divide is
    // unchanged in-range, and no output column carries the decimals.
    val rho = lagged.groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).cast("long").as("np"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("y")).cast("long").as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).cast("decimal(38,0)").as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)").as("syy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)").as("sxy"))
      .withColumn("a", col("np").cast("decimal(38,0)") * col("sxx") -
        col("sx").cast("decimal(38,0)") * col("sx"))
      .withColumn("b", col("np").cast("decimal(38,0)") * col("syy") -
        col("sy").cast("decimal(38,0)") * col("sy"))
      .withColumn("rho", when(col("a") > 0 && col("b") > 0,
        (col("np").cast("decimal(38,0)") * col("sxy") -
          col("sx").cast("decimal(38,0)") * col("sy")).cast("double") /
          sqrt(col("a").cast("double") * col("b").cast("double"))))
    val wide = rho.groupBy(col("event_type"))
      .agg(
        max(when(col("k") === 1, col("rho"))).as("r1"),
        max(when(col("k") === 2, col("rho"))).as("r2"),
        max(when(col("k") === 3, col("rho"))).as("r3"),
        max(when(col("k") === 4, col("rho"))).as("r4"),
        max(when(col("k") === 5, col("rho"))).as("r5"),
        sum(when(col("rho").isNotNull, 1L).otherwise(0L)).as("n_ok"))
    val nd = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"))
    val dl = nd.join(wide, Seq("event_type"), "left")
      .filter(col("n_ok") === 5)
      .withColumn("p11", col("r1"))
      .withColumn("p22", (col("r2") - col("p11") * col("r1")) /
        (lit(1.0) - col("p11") * col("r1")))
      .withColumn("p21", col("p11") - col("p22") * col("p11"))
      .withColumn("p33",
        (col("r3") - col("p21") * col("r2") - col("p22") * col("r1")) /
          (lit(1.0) - col("p21") * col("r1") - col("p22") * col("r2")))
      .withColumn("p31", col("p21") - col("p33") * col("p22"))
      .withColumn("p32", col("p22") - col("p33") * col("p21"))
      .withColumn("p44",
        (col("r4") - col("p31") * col("r3") - col("p32") * col("r2") -
          col("p33") * col("r1")) /
          (lit(1.0) - col("p31") * col("r1") - col("p32") * col("r2") -
            col("p33") * col("r3")))
      .withColumn("p41", col("p31") - col("p44") * col("p33"))
      .withColumn("p42", col("p32") - col("p44") * col("p32"))
      .withColumn("p43", col("p33") - col("p44") * col("p31"))
      .withColumn("p55",
        (col("r5") - col("p41") * col("r4") - col("p42") * col("r3") -
          col("p43") * col("r2") - col("p44") * col("r1")) /
          (lit(1.0) - col("p41") * col("r1") - col("p42") * col("r2") -
            col("p43") * col("r3") - col("p44") * col("r4")))
      .withColumn("lb", col("n_days").cast("double") * (col("n_days") + 2) *
        (col("r1") * col("r1") / (col("n_days") - 1) +
          col("r2") * col("r2") / (col("n_days") - 2) +
          col("r3") * col("r3") / (col("n_days") - 3) +
          col("r4") * col("r4") / (col("n_days") - 4) +
          col("r5") * col("r5") / (col("n_days") - 5)))
      .select(col("event_type"),
        round(col("r1"), 4).as("rho1"), round(col("r2"), 4).as("rho2"),
        round(col("r3"), 4).as("rho3"), round(col("r4"), 4).as("rho4"),
        round(col("r5"), 4).as("rho5"),
        round(col("p11"), 4).as("pacf1"), round(col("p22"), 4).as("pacf2"),
        round(col("p33"), 4).as("pacf3"), round(col("p44"), 4).as("pacf4"),
        round(col("p55"), 4).as("pacf5"),
        round(col("lb"), 4).as("lb_q"))
    nd.join(dl, Seq("event_type"), "left")
      .withColumn("verdict",
        when(col("lb_q").isNull, "degenerate")
          .when(col("lb_q") > 11.0705, "autocorrelated")
          .otherwise("white_noise"))
      .select(col("event_type"), col("n_days"), col("rho1"), col("rho2"),
        col("rho3"), col("rho4"), col("rho5"), col("pacf1"), col("pacf2"),
        col("pacf3"), col("pacf4"), col("pacf5"), col("lb_q"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q257Oracle: String =
    s"""WITH $gridSql,
       |lagged AS (
       |  SELECT a.event_type, k.k, a.v AS x, b.v AS y
       |  FROM grid a
       |  CROSS JOIN (SELECT UNNEST(generate_series(1, 5)) AS k) k
       |  JOIN grid b ON b.event_type = a.event_type
       |    AND b.day = a.day + k.k),
       |sums AS (
       |  SELECT event_type, k, CAST(COUNT(*) AS BIGINT) AS np,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
       |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
       |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
       |  FROM lagged GROUP BY 1, 2),
       |rho AS (
       |  SELECT event_type, k,
       |    CASE WHEN CAST(np AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
       |        AND CAST(np AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
       |      THEN CAST(CAST(np AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
       |        / SQRT(CAST(CAST(np AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
       |             * CAST(CAST(np AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)) END AS rho
       |  FROM sums),
       |wide AS (
       |  SELECT event_type,
       |    MAX(CASE WHEN k = 1 THEN rho END) AS r1,
       |    MAX(CASE WHEN k = 2 THEN rho END) AS r2,
       |    MAX(CASE WHEN k = 3 THEN rho END) AS r3,
       |    MAX(CASE WHEN k = 4 THEN rho END) AS r4,
       |    MAX(CASE WHEN k = 5 THEN rho END) AS r5,
       |    SUM(CASE WHEN rho IS NOT NULL THEN 1 ELSE 0 END) AS n_ok
       |  FROM rho GROUP BY 1),
       |nd AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
       |  FROM grid GROUP BY 1),
       |s1 AS (
       |  SELECT nd.event_type, nd.n_days, w.r1, w.r2, w.r3, w.r4, w.r5,
       |    w.r1 AS p11
       |  FROM nd JOIN wide w ON w.event_type = nd.event_type
       |  WHERE w.n_ok = 5),
       |s2 AS (
       |  SELECT *, (r2 - p11 * r1) / (1.0 - p11 * r1) AS p22 FROM s1),
       |s2b AS (
       |  SELECT *, p11 - p22 * p11 AS p21 FROM s2),
       |s3 AS (
       |  SELECT *, (r3 - p21 * r2 - p22 * r1)
       |    / (1.0 - p21 * r1 - p22 * r2) AS p33 FROM s2b),
       |s3b AS (
       |  SELECT *, p21 - p33 * p22 AS p31, p22 - p33 * p21 AS p32 FROM s3),
       |s4 AS (
       |  SELECT *, (r4 - p31 * r3 - p32 * r2 - p33 * r1)
       |    / (1.0 - p31 * r1 - p32 * r2 - p33 * r3) AS p44 FROM s3b),
       |s4b AS (
       |  SELECT *, p31 - p44 * p33 AS p41, p32 - p44 * p32 AS p42,
       |    p33 - p44 * p31 AS p43 FROM s4),
       |s5 AS (
       |  SELECT *, (r5 - p41 * r4 - p42 * r3 - p43 * r2 - p44 * r1)
       |    / (1.0 - p41 * r1 - p42 * r2 - p43 * r3 - p44 * r4) AS p55
       |  FROM s4b),
       |fin AS (
       |  SELECT event_type,
       |    ROUND(r1, 4) AS rho1, ROUND(r2, 4) AS rho2,
       |    ROUND(r3, 4) AS rho3, ROUND(r4, 4) AS rho4,
       |    ROUND(r5, 4) AS rho5,
       |    ROUND(p11, 4) AS pacf1, ROUND(p22, 4) AS pacf2,
       |    ROUND(p33, 4) AS pacf3, ROUND(p44, 4) AS pacf4,
       |    ROUND(p55, 4) AS pacf5,
       |    ROUND(CAST(n_days AS DOUBLE) * (n_days + 2)
       |      * (r1 * r1 / (n_days - 1) + r2 * r2 / (n_days - 2)
       |        + r3 * r3 / (n_days - 3) + r4 * r4 / (n_days - 4)
       |        + r5 * r5 / (n_days - 5)), 4) AS lb_q
       |  FROM s5)
       |SELECT nd.event_type, nd.n_days, f.rho1, f.rho2, f.rho3, f.rho4,
       |  f.rho5, f.pacf1, f.pacf2, f.pacf3, f.pacf4, f.pacf5, f.lb_q,
       |  CASE WHEN f.lb_q IS NULL THEN 'degenerate'
       |    WHEN f.lb_q > 11.0705 THEN 'autocorrelated'
       |    ELSE 'white_noise' END AS verdict
       |FROM nd LEFT JOIN fin f ON f.event_type = nd.event_type
       |ORDER BY nd.event_type NULLS FIRST""".stripMargin

  /** Q263 — sample entropy (m = 2) per event type on the zero-filled
    * daily revenue series (Richman & Moorman 2000): the template-match
    * irregularity read — B counts day pairs whose length-2 windows
    * agree within Chebyshev tolerance r, A the same for length-3, and
    * SampEn = −ln(A/B) is the conditional surprise of staying matched
    * one step longer (0 = perfectly self-similar; larger = less
    * predictable). The self-exclusion (i < j, no self-matches) is what
    * removes ApEn's bias. Complements Q254: permutation entropy reads
    * ORDINAL disorder, SampEn reads METRIC disorder at scale r.
    *
    * Determinism: the tolerance is the conventional 0.2σ made
    * engine-stable — r = ⌈√(n·S2 − S1²)/(5n)⌉ where the radicand is
    * exact int64 and IEEE mandates correctly-rounded sqrt, so both
    * engines ceil the identical double; all window distances and
    * A/B counts are then exact int64 comparisons. −ln(A/B) rounds at
    * 4; A = 0 or B = 0 degrades to NULL + 'undefined', never ±Inf.
    *
    * Scale notes: templates pair on the bounded per-type spine
    * (days²/2 rows per type after the one corpus-scan daily
    * aggregate) — the standard grouped-series topology, flat in
    * corpus size.
    */
  def q263(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val tmpl = grid
      .withColumn("v1", lead(col("v"), 1).over(w))
      .withColumn("v2", lead(col("v"), 2).over(w))
      .filter(col("v2").isNotNull)
    // Σv² and the variance radicand in DECIMAL(38,0)/HUGEINT (r12: a
    // single v² of an sf10-scale 3·10⁹-cent day tops 2⁶³ and the int64
    // sum THREW under ANSI); sqrt-of-decimal-cast-to-double is the same
    // correctly-rounded double in-range, so r_tol is unchanged.
    val tol = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("v")).cast("long").as("s1"),
        sum(col("v").cast("decimal(38,0)") * col("v")).cast("decimal(38,0)").as("s2"))
      .withColumn("vs", col("n_days").cast("decimal(38,0)") * col("s2") -
        col("s1").cast("decimal(38,0)") * col("s1"))
      .withColumn("r_tol",
        ceil(sqrt(col("vs").cast("double")) / (lit(5.0) * col("n_days")))
          .cast("long"))
      .select(col("event_type"), col("n_days"), col("r_tol"))
    val a = tmpl.select(col("event_type"), col("day").as("di"),
      col("v").as("xa0"), col("v1").as("xa1"), col("v2").as("xa2"))
    val b = tmpl.select(col("event_type").as("tb"), col("day").as("dj"),
      col("v").as("xb0"), col("v1").as("xb1"), col("v2").as("xb2"))
    val cnt = a.join(b, col("event_type") === col("tb") && col("dj") > col("di"))
      .join(tol, Seq("event_type"))
      .groupBy(col("event_type"), col("n_days"), col("r_tol"))
      .agg(
        sum(when(greatest(abs(col("xa0") - col("xb0")),
          abs(col("xa1") - col("xb1"))) <= col("r_tol"), 1L).otherwise(0L))
          .cast("long").as("b_cnt"),
        sum(when(greatest(abs(col("xa0") - col("xb0")),
          abs(col("xa1") - col("xb1")),
          abs(col("xa2") - col("xb2"))) <= col("r_tol"), 1L).otherwise(0L))
          .cast("long").as("a_cnt"))
    tol.join(cnt.drop("n_days", "r_tol"), Seq("event_type"), "left")
      .withColumn("sampen",
        when(col("a_cnt") > 0 && col("b_cnt") > 0,
          round(-log(col("a_cnt").cast("double") / col("b_cnt")), 4)))
      .withColumn("verdict",
        when(col("sampen").isNull, "undefined").otherwise("measured"))
      .select(col("event_type"), col("n_days"), col("r_tol"),
        coalesce(col("b_cnt"), lit(0L)).as("b_cnt"),
        coalesce(col("a_cnt"), lit(0L)).as("a_cnt"),
        col("sampen"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q263Oracle: String =
    s"""WITH $gridSql,
       |tmpl AS (
       |  SELECT event_type, day, v,
       |    LEAD(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS v1,
       |    LEAD(v, 2) OVER (PARTITION BY event_type ORDER BY day) AS v2
       |  FROM grid QUALIFY v2 IS NOT NULL),
       |tol AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       |    CAST(CEIL(SQRT(CAST(COUNT(*) * SUM(CAST(v AS HUGEINT) * v)
       |      - SUM(CAST(v AS HUGEINT)) * SUM(CAST(v AS HUGEINT))
       |      AS DOUBLE)) / (5.0 * COUNT(*))) AS BIGINT) AS r_tol
       |  FROM grid GROUP BY 1),
       |cnt AS (
       |  SELECT a.event_type,
       |    CAST(SUM(CASE WHEN GREATEST(ABS(a.v - b.v), ABS(a.v1 - b.v1))
       |      <= t.r_tol THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt,
       |    CAST(SUM(CASE WHEN GREATEST(ABS(a.v - b.v), ABS(a.v1 - b.v1),
       |      ABS(a.v2 - b.v2)) <= t.r_tol THEN 1 ELSE 0 END) AS BIGINT)
       |      AS a_cnt
       |  FROM tmpl a
       |  JOIN tmpl b ON b.event_type = a.event_type AND b.day > a.day
       |  JOIN tol t ON t.event_type = a.event_type
       |  GROUP BY 1)
       |SELECT t.event_type, t.n_days, t.r_tol,
       |  COALESCE(c.b_cnt, 0) AS b_cnt, COALESCE(c.a_cnt, 0) AS a_cnt,
       |  CASE WHEN c.a_cnt > 0 AND c.b_cnt > 0 THEN
       |    ROUND(-LN(CAST(c.a_cnt AS DOUBLE) / c.b_cnt), 4) END AS sampen,
       |  CASE WHEN c.a_cnt > 0 AND c.b_cnt > 0
       |    THEN 'measured' ELSE 'undefined' END AS verdict
       |FROM tol t LEFT JOIN cnt c ON c.event_type = t.event_type
       |ORDER BY t.event_type NULLS FIRST""".stripMargin

  /** Q264 — Lempel–Ziv (LZ76) algorithmic complexity per event type of
    * the daily DIRECTION sequence (Lempel & Ziv 1976; Kaspar &
    * Schuster 1987's c(n)): consecutive day deltas map to the ternary
    * alphabet u/d/f (up/down/flat — monotone-invariant like Q254's
    * ordinal patterns but with MEMORY: LZ76 sees long-range repeated
    * motifs that fixed-order entropies cannot), and the complexity is
    * the phrase count of the exhaustive-history parsing, computed by
    * the native codegen'd `graft_lz76` expression
    * (`plans/Lz76.scala`). The oracle replays the IDENTICAL phrase
    * parsing as a recursive CTE — longest earlier-occurring (overlap
    * allowed) prefix + one innovation character per step — so the hash
    * match proves the parser itself, phrase for phrase. norm_lz =
    * c·ln(n)/n is the Kaspar–Schuster normalization (→ ~1 for
    * incompressible sequences, → 0 for periodic ones).
    *
    * Determinism: symbols come from exact int64 comparisons, the
    * parsing is character-equality only (no floats anywhere in c), and
    * norm_lz is one rounded double expression.
    *
    * Scale notes: sequences are spine-bounded per type and built by one
    * grouped sort-collect after the corpus-scan daily aggregate; the
    * O(n²·L̄) parse runs inside WholeStageCodegen per GROUP row — the
    * same grouped-bounded-series contract as Q245's DTW. The oracle's
    * l/q enumeration bound is DERIVED from MAX(n) over the sequences
    * (not a hard-coded cap), so a longer spine enumerates further
    * instead of silently undercounting phrase matches.
    */
  def q264(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val sym = grid.withColumn("pv", lag(col("v"), 1).over(w))
      .filter(col("pv").isNotNull)
      .withColumn("ch", when(col("v") > col("pv"), "u")
        .when(col("v") < col("pv"), "d").otherwise("f"))
    val seqs = sym.groupBy(col("event_type"))
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(day, ch))), x -> x.ch), '')").as("s"),
        count(lit(1)).cast("long").as("n_symbols"),
        sum(when(col("ch") === "u", 1L).otherwise(0L)).cast("long").as("n_up"),
        sum(when(col("ch") === "d", 1L).otherwise(0L)).cast("long")
          .as("n_down"),
        sum(when(col("ch") === "f", 1L).otherwise(0L)).cast("long")
          .as("n_flat"))
    val nd = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"))
    nd.join(seqs, Seq("event_type"), "left")
      .withColumn("lz76", expr("graft_lz76(s)"))
      .withColumn("norm_lz", when(col("n_symbols") > 1,
        round(col("lz76") * log(col("n_symbols").cast("double")) /
          col("n_symbols"), 4)))
      .select(col("event_type"), col("n_days"),
        coalesce(col("n_symbols"), lit(0L)).as("n_symbols"),
        coalesce(col("n_up"), lit(0L)).as("n_up"),
        coalesce(col("n_down"), lit(0L)).as("n_down"),
        coalesce(col("n_flat"), lit(0L)).as("n_flat"),
        col("lz76"), col("norm_lz"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q264Oracle: String =
    s"""WITH RECURSIVE $gridSql,
       |sym AS (
       |  SELECT event_type, day,
       |    CASE WHEN v > pv THEN 'u' WHEN v < pv THEN 'd' ELSE 'f' END AS ch
       |  FROM (
       |    SELECT event_type, day, v,
       |      LAG(v) OVER (PARTITION BY event_type ORDER BY day) AS pv
       |    FROM grid)
       |  WHERE pv IS NOT NULL),
       |seqs AS (
       |  SELECT event_type, STRING_AGG(ch, '' ORDER BY day) AS s,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN ch = 'u' THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       |    CAST(SUM(CASE WHEN ch = 'd' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_down,
       |    CAST(SUM(CASE WHEN ch = 'f' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_flat
       |  FROM sym GROUP BY 1),
       |parse AS (
       |  SELECT event_type, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS c
       |  FROM seqs
       |  UNION ALL
       |  SELECT event_type, pos + phrase, c + 1 FROM (
       |    SELECT p.event_type, p.pos, p.c,
       |      LEAST(COALESCE(MAX(CASE WHEN q.q < p.pos
       |          AND l.l <= s.n - p.pos + 1
       |          AND substr(s.s, q.q, l.l) = substr(s.s, p.pos, l.l)
       |          THEN l.l END), 0) + 1,
       |        s.n - p.pos + 1) AS phrase
       |    FROM parse p
       |    JOIN seqs s ON s.event_type = p.event_type
       |    CROSS JOIN (SELECT UNNEST(generate_series(1,
       |      (SELECT CAST(MAX(n) AS BIGINT) FROM seqs))) AS l) l
       |    CROSS JOIN (SELECT UNNEST(generate_series(1,
       |      (SELECT CAST(MAX(n) AS BIGINT) FROM seqs))) AS q) q
       |    WHERE p.pos <= s.n
       |    GROUP BY 1, 2, 3, s.n) st),
       |lz AS (
       |  SELECT event_type, CAST(MAX(c) AS BIGINT) AS lz76
       |  FROM parse GROUP BY 1),
       |nd AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
       |  FROM grid GROUP BY 1)
       |SELECT nd.event_type, nd.n_days,
       |  COALESCE(s.n, 0) AS n_symbols,
       |  COALESCE(s.n_up, 0) AS n_up, COALESCE(s.n_down, 0) AS n_down,
       |  COALESCE(s.n_flat, 0) AS n_flat,
       |  z.lz76,
       |  CASE WHEN s.n > 1 THEN
       |    ROUND(z.lz76 * LN(CAST(s.n AS DOUBLE)) / s.n, 4) END AS norm_lz
       |FROM nd
       |LEFT JOIN seqs s ON s.event_type = nd.event_type
       |LEFT JOIN lz z ON z.event_type = nd.event_type
       |ORDER BY nd.event_type NULLS FIRST""".stripMargin

  /** Q267 — Durbin–Watson residual-autocorrelation test per event type
    * (Durbin & Watson 1950) on the zero-filled daily revenue series:
    * fits the same OLS line as Q125 and asks the question a trend fit
    * always begs — are the RESIDUALS independent, or does the line
    * systematically over/under-shoot in runs (DW ≈ 2(1 − ρ₁); < 2
    * positive residual autocorrelation, > 2 negative)? The serial-
    * dependence read on the residual side that Q257's PACF gives on
    * the raw side.
    *
    * Determinism: residuals never materialize as floats — with exact
    * int64 normal-equation composites d = nSxx − Sx², bn = nSxy −
    * SxSy, an = Sy·d − bn·Sx, the SCALED residual E_t = nd·y_t − an −
    * n·bn·t is exact int64 (the nd scale cancels in the DW ratio);
    * Σ(ΔE)² and ΣE² are double sums of exact integers (their squares
    * exceed int64 — the one documented double step), ~30 terms, and DW
    * is one divide rounded 4 with the verdict on the ROUNDED value
    * (1.5/2.5 fences). A flat/degenerate series (ΣE² = 0) degrades to
    * NULL + 'degenerate', never NaN.
    *
    * Scale notes: one corpus-scan daily aggregate, one five-sum
    * aggregate per type, one spine-join + lag window. Overflow margin:
    * the scaled residual E = nd·y − an − n·bn·t carries n·d ≈ n⁵/12,
    * so int64 holds only to ~1.7·10⁷ cents/day at a 365-day spine
    * (NOT the Q257 n·Sxy class — the margin shrinks as n⁵). Within
    * this data model (≤ ~10⁵ cents/day, spine ≤ 365) that is a ~170×
    * margin; for longer spines or larger magnitudes, divide the nd
    * scale out of E before the residual join (the ratio is invariant).
    */
  def q267(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val dmin = grid.agg(min(col("day")).as("dmin"))
    val base = grid.crossJoin(broadcast(dmin))
      .select(col("event_type"), (col("day") - col("dmin")).as("t"), col("v"))
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
      .select(col("event_type"), col("n"), col("t"),
        (col("n") * col("d") * col("v") - col("an") -
          col("n") * col("bn") * col("t")).as("e"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("t"))
    val dw = resid
      .withColumn("pe", lag(col("e"), 1).over(w))
      .groupBy(col("event_type"), col("n"))
      .agg(
        sum(when(col("pe").isNotNull,
          (col("e") - col("pe")).cast("double") *
            (col("e") - col("pe")).cast("double")).otherwise(lit(0.0)))
          .as("num"),
        sum(col("e").cast("double") * col("e").cast("double")).as("den"))
      .withColumn("dw", when(col("den") > 0,
        round(col("num") / col("den"), 4)))
    dw.withColumn("rho_resid",
        when(col("dw").isNotNull, round(lit(1.0) - col("dw") / 2.0, 4)))
      .withColumn("verdict",
        when(col("dw").isNull, "degenerate")
          .when(col("dw") < 1.5, "positive_autocorr")
          .when(col("dw") > 2.5, "negative_autocorr")
          .otherwise("independent"))
      .select(col("event_type"), col("n").as("n_days"), col("dw"),
        col("rho_resid"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q267Oracle: String =
    s"""WITH $gridSql,
       |bnd AS (SELECT MIN(day) AS dmin FROM grid),
       |base AS (
       |  SELECT event_type, day - (SELECT dmin FROM bnd) AS t, v FROM grid),
       |sums AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(t) AS BIGINT) AS sx, CAST(SUM(v) AS BIGINT) AS sy,
       |    CAST(SUM(t * t) AS BIGINT) AS sxx,
       |    CAST(SUM(t * v) AS BIGINT) AS sxy
       |  FROM base GROUP BY 1),
       |comp AS (
       |  SELECT event_type, n, sx, sy,
       |    n * sxx - sx * sx AS d,
       |    n * sxy - sx * sy AS bn
       |  FROM sums),
       |comp2 AS (
       |  SELECT event_type, n, d, bn, sy * d - bn * sx AS an FROM comp),
       |resid AS (
       |  SELECT b.event_type, c.n, b.t,
       |    CAST(c.n * c.d * b.v - c.an - c.n * c.bn * b.t AS BIGINT) AS e
       |  FROM base b JOIN comp2 c ON c.event_type = b.event_type),
       |lagged AS (
       |  SELECT event_type, n, e,
       |    LAG(e) OVER (PARTITION BY event_type ORDER BY t) AS pe
       |  FROM resid),
       |agg AS (
       |  SELECT event_type, n,
       |    SUM(CASE WHEN pe IS NOT NULL THEN
       |      CAST(e - pe AS DOUBLE) * CAST(e - pe AS DOUBLE)
       |      ELSE 0.0 END) AS num,
       |    SUM(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)) AS den
       |  FROM lagged GROUP BY 1, 2),
       |dw AS (
       |  SELECT event_type, n,
       |    CASE WHEN den > 0 THEN ROUND(num / den, 4) END AS dw
       |  FROM agg)
       |SELECT event_type, n AS n_days, dw,
       |  CASE WHEN dw IS NOT NULL THEN ROUND(1.0 - dw / 2.0, 4) END
       |    AS rho_resid,
       |  CASE WHEN dw IS NULL THEN 'degenerate'
       |    WHEN dw < 1.5 THEN 'positive_autocorr'
       |    WHEN dw > 2.5 THEN 'negative_autocorr'
       |    ELSE 'independent' END AS verdict
       |FROM dw
       |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q273 — split-conformal prediction-interval audit of the
    * seasonal-naive-7 forecaster (Vovk et al. 2005; Lei et al., JASA
    * 2018) on the zero-filled daily revenue series: residual days
    * (|y_t − y_{t−7}|, exact cents) split chronologically into a
    * CALIBRATION half and a TEST half; the conformal quantile is the
    * ⌈(n_cal+1)(1−α)⌉-th smallest calibration residual (α = 0.2 — an
    * 80% target), and the audit reports the EXACT test coverage of
    * ŷ_t ± q̂. The distribution-free "how wrong are my forecast
    * bands" companion to Q236's point-error backtest — the guarantee
    * coverage ≥ 1−α needs only exchangeability, which is exactly what
    * this gate checks empirically per type.
    *
    * Determinism: residuals and q̂ are exact int64 cents; the quantile
    * index is exact integer arithmetic ⌈13·0.8⌉ computed as
    * (4·(n_cal+1) + 4) DIV 5 (ceil of 4(n+1)/5 in pure ints); test
    * coverage is an exact count, the ≥ 0.8 verdict compares
    * 5·n_covered ≥ 4·n_test in int64, and only the reported coverage
    * share divides, rounded 6.
    *
    * Scale notes: residuals live on the bounded per-type spine (one
    * LAG window); the quantile is one rank pick in the tiny
    * calibration relation. Flat in corpus size past the daily
    * aggregate.
    */
  def q273(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val resid = grid
      .withColumn("yhat", lag(col("v"), 7).over(w))
      .filter(col("yhat").isNotNull)
      .withColumn("r", abs(col("v") - col("yhat")).cast("long"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))).cast("long"))
      .withColumn("n_cal", expr("n DIV 2"))
      .withColumn("split",
        when(col("i") <= col("n_cal"), "cal").otherwise("test"))
    val qhat = resid.filter(col("split") === "cal")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(asc("r"), asc("day")))
        .cast("long"))
      .withColumn("q_idx", expr("(4 * (n_cal + 1) + 4) DIV 5"))
      .filter(col("rk") === least(col("q_idx"), col("n_cal")))
      .select(col("event_type"), col("n_cal"), col("q_idx"),
        col("r").as("q_hat_cents"))
    val cover = resid.filter(col("split") === "test")
      .select(col("event_type"), col("r"))
      .join(qhat, Seq("event_type"))
      .groupBy(col("event_type"), col("n_cal"), col("q_idx"),
        col("q_hat_cents"))
      .agg(count(lit(1)).cast("long").as("n_test"),
        sum(when(col("r") <= col("q_hat_cents"), 1L).otherwise(0L))
          .cast("long").as("n_covered"))
    // Degrade discipline (ADVICE r9): types with too few residual days
    // for a calibration quantile (n_cal = 0, i.e. < 9 spine days) must
    // surface as 'insufficient' rows, not vanish through the inner joins
    // — the Q252/Q253/Q257 convention.
    val types = grid.select(col("event_type")).distinct()
    types.join(cover, Seq("event_type"), "left")
      .withColumn("coverage", when(col("n_test").isNotNull,
        round(col("n_covered").cast("double") / col("n_test"), 6)))
      .withColumn("verdict",
        when(col("n_test").isNull, "insufficient")
          .when(lit(5L) * col("n_covered") >= lit(4L) * col("n_test"),
            "covered").otherwise("under_covered"))
      .select(col("event_type"), col("n_cal"), col("n_test"), col("q_idx"),
        col("q_hat_cents"), col("n_covered"), col("coverage"), col("verdict"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q273Oracle: String =
    s"""WITH $gridSql,
       |resid0 AS (
       |  SELECT event_type, day,
       |    CAST(ABS(v - LAG(v, 7) OVER w) AS BIGINT) AS r,
       |    LAG(v, 7) OVER w AS yhat
       |  FROM grid
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |resid AS (
       |  SELECT event_type, day, r,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
       |      AS BIGINT) AS i,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM resid0 WHERE yhat IS NOT NULL),
       |sp AS (
       |  SELECT *, n // 2 AS n_cal,
       |    CASE WHEN i <= n // 2 THEN 'cal' ELSE 'test' END AS split
       |  FROM resid),
       |qhat AS (
       |  SELECT event_type, n_cal, q_idx, r AS q_hat_cents FROM (
       |    SELECT event_type, n_cal, r,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY event_type
       |        ORDER BY r, day) AS BIGINT) AS rk,
       |      (4 * (n_cal + 1) + 4) // 5 AS q_idx
       |    FROM sp WHERE split = 'cal') t
       |  WHERE rk = LEAST(q_idx, n_cal)),
       |cover AS (
       |  SELECT s.event_type, q.n_cal, q.q_idx, q.q_hat_cents,
       |    CAST(COUNT(*) AS BIGINT) AS n_test,
       |    CAST(SUM(CASE WHEN s.r <= q.q_hat_cents THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_covered
       |  FROM sp s JOIN qhat q ON q.event_type = s.event_type
       |  WHERE s.split = 'test'
       |  GROUP BY 1, 2, 3, 4),
       |tspine AS (SELECT DISTINCT event_type FROM grid)
       |SELECT t.event_type, c.n_cal, c.n_test, c.q_idx, c.q_hat_cents,
       |  c.n_covered,
       |  CASE WHEN c.n_test IS NOT NULL THEN
       |    ROUND(CAST(c.n_covered AS DOUBLE) / c.n_test, 6) END AS coverage,
       |  CASE WHEN c.n_test IS NULL THEN 'insufficient'
       |    WHEN 5 * c.n_covered >= 4 * c.n_test THEN 'covered'
       |    ELSE 'under_covered' END AS verdict
       |FROM tspine t LEFT JOIN cover c ON c.event_type = t.event_type
       |ORDER BY t.event_type NULLS FIRST""".stripMargin

  /** Q297 — exact 1-Wasserstein (earth-mover) distance between every
    * pair of event types' per-event value distributions, in cents
    * (Monge 1781 / Kantorovich 1942; for 1-D empirical measures
    * W₁ = ∫|F̂a − F̂b| — Vallender 1974). The KS statistic (Q139) reads
    * the WORST ECDF gap; W₁ integrates ALL of it, so two types that
    * differ by a small shift everywhere score higher than a pair with
    * one localized kink — the distance a distribution-drift monitor
    * actually wants.
    *
    * Determinism: values collapse to exact cents (the house
    * ROUND(value·100) convention); the integral is the exact int64 sum
    * Σ_t |cumA_t·nB − cumB_t·nA|·Δcents_t over consecutive distinct
    * cents, and only the final W₁ = num/(nA·nB) is a (rounded) float.
    *
    * Scale notes: the Q139 collapsed-domain shape — per-(type, cents)
    * counts once (linear), pair replication only over DISTINCT cents,
    * one window pass per pair for the two running ECDFs, one rollup.
    * num ≤ nA·nB·range(cents): ~10¹⁸ at 10⁶-row sides × 10⁵-cent range —
    * inside int64; beyond that the identical plan carries DECIMAL(38,0).
    */
  def q297(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val byVal = c.events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val types = byVal.select(col("event_type")).distinct()
    val pairTags = types.select(col("event_type").as("type_a"))
      .join(types.select(col("event_type").as("type_b")),
        col("type_a") < col("type_b"))
    val sided = broadcast(pairTags)
      .join(byVal, col("event_type") === col("type_a") ||
        col("event_type") === col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("cents"))
      .agg(sum(when(col("event_type") === col("type_a"), col("cnt"))
          .otherwise(0L)).as("cnt_a"),
        sum(when(col("event_type") === col("type_b"), col("cnt"))
          .otherwise(0L)).as("cnt_b"))
    val wOrd = Window.partitionBy(col("type_a"), col("type_b"))
      .orderBy(asc("cents"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("type_a"), col("type_b"))
    sided
      .withColumn("cum_a", sum(col("cnt_a")).over(wCum))
      .withColumn("cum_b", sum(col("cnt_b")).over(wCum))
      .withColumn("nxt", lead(col("cents"), 1).over(wOrd))
      .withColumn("na", max(col("cum_a")).over(wAll))
      .withColumn("nb", max(col("cum_b")).over(wAll))
      .filter(col("nxt").isNotNull)
      .groupBy(col("type_a"), col("type_b"))
      .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
        sum(abs(col("cum_a") * col("nb") - col("cum_b") * col("na")) *
          (col("nxt") - col("cents"))).as("w1_num"))
      .select(col("type_a"), col("type_b"), col("na"), col("nb"),
        col("w1_num"),
        round(col("w1_num").cast("double") /
          (col("na").cast("double") * col("nb")), 6).as("w1_cents"))
      .orderBy(asc_nulls_first("type_a"), asc_nulls_first("type_b"))
  }

  val q297Oracle: String =
    """WITH byval AS (
      |  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b
      |  FROM (SELECT DISTINCT event_type FROM byval) a
      |  JOIN (SELECT DISTINCT event_type FROM byval) b
      |    ON a.event_type < b.event_type),
      |sided AS (
      |  SELECT p.type_a, p.type_b, v.cents,
      |    SUM(CASE WHEN v.event_type = p.type_a THEN v.cnt ELSE 0 END) AS cnt_a,
      |    SUM(CASE WHEN v.event_type = p.type_b THEN v.cnt ELSE 0 END) AS cnt_b
      |  FROM pairs p JOIN byval v
      |    ON v.event_type IN (p.type_a, p.type_b)
      |  GROUP BY 1, 2, 3),
      |cums AS (
      |  SELECT type_a, type_b, cents,
      |    SUM(cnt_a) OVER w AS cum_a, SUM(cnt_b) OVER w AS cum_b,
      |    LEAD(cents) OVER (PARTITION BY type_a, type_b ORDER BY cents)
      |      AS nxt
      |  FROM sided
      |  WINDOW w AS (PARTITION BY type_a, type_b ORDER BY cents
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tot AS (
      |  SELECT type_a, type_b,
      |    CAST(MAX(cum_a) AS BIGINT) AS na, CAST(MAX(cum_b) AS BIGINT) AS nb
      |  FROM cums GROUP BY 1, 2)
      |SELECT c.type_a AS type_a, c.type_b AS type_b, t.na AS na, t.nb AS nb,
      |  CAST(SUM(ABS(c.cum_a * t.nb - c.cum_b * t.na) * (c.nxt - c.cents))
      |    AS BIGINT) AS w1_num,
      |  ROUND(CAST(SUM(ABS(c.cum_a * t.nb - c.cum_b * t.na)
      |      * (c.nxt - c.cents)) AS DOUBLE)
      |    / (CAST(t.na AS DOUBLE) * t.nb), 6) AS w1_cents
      |FROM cums c JOIN tot t
      |  ON t.type_a = c.type_a AND t.type_b = c.type_b
      |WHERE c.nxt IS NOT NULL
      |GROUP BY 1, 2, 3, 4
      |ORDER BY type_a NULLS FIRST, type_b NULLS FIRST""".stripMargin

  /** Shared-text Gumbel method-of-moments pieces for Q301 (Gumbel 1958
    * ch. 6): sample variance of the block maxima, scale
    * β = √(6·var)/π, location μ = mean − γ·β with the Euler–Mascheroni
    * constant as an explicit double literal, and the T = 30-block
    * return level μ − β·ln(−ln(1 − 1/30)).
    */
  private val q301Var =
    "CAST(n * smm - sm * sm AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))"
  private val q301Beta = s"SQRT(6 * ($q301Var)) / PI()"
  private val q301Mu =
    s"CAST(sm AS DOUBLE) / n - 0.5772156649015329 * ($q301Beta)"
  private val q301Rl30 =
    s"($q301Mu) - ($q301Beta) * LN(-LN(CAST(29 AS DOUBLE) / 30))"

  /** Q301 — Gumbel extreme-value fit + 30-day return level per event
    * type (Fisher–Tippett 1928; Gumbel 1958): the daily block maxima
    * of per-event value cents, fitted by method of moments to the
    * Gumbel (type-I) law, with the 30-block return level — "the daily
    * maximum you expect to see once a month" — and an exceedance
    * backtest against the observed maxima. The TAIL companion to the
    * bulk-distribution gates (Q137 moments, Q139/Q297 distances): ops
    * capacity planning reads this number, not the mean.
    *
    * Determinism: block maxima are exact int64 cents MAX per (type,
    * day); n, Σm, Σm² exact int64; β, μ, and the return level are the
    * shared-text fixed shapes above (PI(), LN, and the γ literal
    * evaluate identically in both engines), each rounded once at
    * emit; the exceedance count compares exact cents against the
    * ROUNDED return level, and the verdict compares exact ints.
    *
    * Scale notes: one linear scan to (type, day) maxima (map-side
    * combinable MAX), a spine-bounded moment rollup, and one bounded
    * join back for the exceedance count. Output is |types| rows.
    */
  def q301(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val maxima = c.events
      .select(col("event_type"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("cents")).as("mx"))
      .localCheckpoint()
    val fit = maxima.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("mx")).cast("long").as("sm"),
        sum(col("mx") * col("mx")).cast("long").as("smm"))
      .filter(col("n") > 1)
      .select(col("event_type"), col("n").as("n_blocks"),
        expr("ROUND(CAST(sm AS DOUBLE) / n, 4)").as("mean_max"),
        expr(s"ROUND($q301Beta, 4)").as("beta"),
        expr(s"ROUND($q301Mu, 4)").as("mu"),
        expr(s"ROUND($q301Rl30, 4)").as("rl30"))
    fit.join(maxima, Seq("event_type"))
      .groupBy(col("event_type"), col("n_blocks"), col("mean_max"),
        col("beta"), col("mu"), col("rl30"))
      .agg(sum(when(col("mx") > col("rl30"), 1L).otherwise(0L))
        .cast("long").as("n_exceed"))
      .withColumn("verdict", expr(
        "CASE WHEN n_exceed <= 1 THEN 'gumbel_consistent' " +
          "ELSE 'heavier_tail' END"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q301Oracle: String =
    s"""WITH maxima AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    CAST(MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS mx
       |  FROM events GROUP BY 1, 2),
       |mom AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(mx) AS BIGINT) AS sm,
       |    CAST(SUM(mx * mx) AS BIGINT) AS smm
       |  FROM maxima GROUP BY 1),
       |fit AS (
       |  SELECT event_type, n AS n_blocks,
       |    ROUND(CAST(sm AS DOUBLE) / n, 4) AS mean_max,
       |    ROUND($q301Beta, 4) AS beta,
       |    ROUND($q301Mu, 4) AS mu,
       |    ROUND($q301Rl30, 4) AS rl30
       |  FROM mom WHERE n > 1)
       |SELECT f.event_type, f.n_blocks, f.mean_max, f.beta, f.mu, f.rl30,
       |  CAST(SUM(CASE WHEN m.mx > f.rl30 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_exceed,
       |  CASE WHEN SUM(CASE WHEN m.mx > f.rl30 THEN 1 ELSE 0 END) <= 1
       |    THEN 'gumbel_consistent' ELSE 'heavier_tail' END AS verdict
       |FROM fit f JOIN maxima m ON m.event_type = f.event_type
       |GROUP BY 1, 2, 3, 4, 5, 6
       |ORDER BY f.event_type NULLS FIRST""".stripMargin

  /** Q306 — normalized compression distance between event types'
    * daily direction sequences (Cilibrasi & Vitányi 2005; Li et al.
    * 2004), using the native `graft_lz76` parser (Q264's expression)
    * as the compressor: NCD(x,y) = (C(xy) − min(C(x),C(y))) /
    * max(C(x),C(y)), with C(xy) symmetrized as the min over both
    * concatenation orders. Two types whose up/down/flat dynamics share
    * structure compress together (low NCD) even when their VALUE
    * distributions differ — the parameter-free, alignment-free
    * similarity that completes the sequence-distance family (Q245 DTW
    * aligns magnitudes, Q297 W₁ compares distributions, NCD compares
    * generative structure).
    *
    * Determinism: symbols are exact int64 comparisons on the
    * tie-broken daily grid; every C(·) is the integer LZ76 phrase
    * count (codegen'd expression, char-equality only); NCD is one
    * divide of exact ints rounded 4; the verdict compares the ROUNDED
    * value.
    *
    * Scale notes: sequences are spine-bounded per type (the
    * grouped-bounded-series contract); the pair relation is
    * |types|²-bounded with two O(n²) integer parses per pair inside
    * WholeStageCodegen — flat in corpus size past the daily
    * aggregate.
    */
  def q306(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val seqs = grid.withColumn("pv", lag(col("v"), 1).over(w))
      .filter(col("pv").isNotNull)
      .withColumn("ch", when(col("v") > col("pv"), "u")
        .when(col("v") < col("pv"), "d").otherwise("f"))
      .groupBy(col("event_type"))
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(day, ch))), x -> x.ch), '')").as("s"),
        count(lit(1)).cast("long").as("n"))
      .withColumn("cx", expr("graft_lz76(s)").cast("long"))
    val a = seqs.select(col("event_type").as("type_a"), col("s").as("sa"),
      col("n").as("n_a"), col("cx").as("c_a"))
    val b = seqs.select(col("event_type").as("type_b"), col("s").as("sb"),
      col("n").as("n_b"), col("cx").as("c_b"))
    a.join(b, col("type_a") < col("type_b"))
      .withColumn("c_ab", least(
        expr("graft_lz76(concat(sa, sb))").cast("long"),
        expr("graft_lz76(concat(sb, sa))").cast("long")))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("c_a"), col("c_b"), col("c_ab"),
        expr("ROUND(CAST(c_ab - LEAST(c_a, c_b) AS DOUBLE)" +
          " / GREATEST(c_a, c_b), 4)").as("ncd"))
      .withColumn("verdict", expr(
        "CASE WHEN ncd <= 0.5 THEN 'similar_dynamics' " +
          "ELSE 'distinct_dynamics' END"))
      .orderBy(asc_nulls_first("type_a"), asc_nulls_first("type_b"))
  }

  val q306Oracle: String =
    s"""WITH RECURSIVE $gridSql,
       |sym AS (
       |  SELECT event_type, day,
       |    CASE WHEN v > pv THEN 'u' WHEN v < pv THEN 'd' ELSE 'f' END AS ch
       |  FROM (
       |    SELECT event_type, day, v,
       |      LAG(v) OVER (PARTITION BY event_type ORDER BY day) AS pv
       |    FROM grid)
       |  WHERE pv IS NOT NULL),
       |seqs AS (
       |  SELECT event_type, STRING_AGG(ch, '' ORDER BY day) AS s,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM sym GROUP BY 1),
       |pairs0 AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb,
       |    a.s AS sa, b.s AS sb, a.n AS na, b.n AS nb
       |  FROM seqs a JOIN seqs b ON a.event_type < b.event_type),
       |strs AS (
       |  SELECT event_type AS k, s, n FROM seqs
       |  UNION ALL
       |  SELECT ta || '|' || tb || '|f', sa || sb, na + nb FROM pairs0
       |  UNION ALL
       |  SELECT ta || '|' || tb || '|r', sb || sa, na + nb FROM pairs0),
       |parse AS (
       |  SELECT k, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS c
       |  FROM strs
       |  UNION ALL
       |  SELECT k, pos + phrase, c + 1 FROM (
       |    SELECT p.k, p.pos, p.c,
       |      LEAST(COALESCE(MAX(CASE WHEN q.q < p.pos
       |          AND l.l <= s.n - p.pos + 1
       |          AND substr(s.s, q.q, l.l) = substr(s.s, p.pos, l.l)
       |          THEN l.l END), 0) + 1,
       |        s.n - p.pos + 1) AS phrase
       |    FROM parse p
       |    JOIN strs s ON s.k = p.k
       |    CROSS JOIN (SELECT UNNEST(generate_series(1,
       |      (SELECT CAST(MAX(n) AS BIGINT) FROM strs))) AS l) l
       |    CROSS JOIN (SELECT UNNEST(generate_series(1,
       |      (SELECT CAST(MAX(n) AS BIGINT) FROM strs))) AS q) q
       |    WHERE p.pos <= s.n
       |    GROUP BY 1, 2, 3, s.n) st),
       |lz AS (SELECT k, CAST(MAX(c) AS BIGINT) AS lz FROM parse GROUP BY 1)
       |SELECT p.ta AS type_a, p.tb AS type_b, p.na AS n_a, p.nb AS n_b,
       |  za.lz AS c_a, zb.lz AS c_b,
       |  LEAST(zf.lz, zr.lz) AS c_ab,
       |  ROUND(CAST(LEAST(zf.lz, zr.lz) - LEAST(za.lz, zb.lz) AS DOUBLE)
       |    / GREATEST(za.lz, zb.lz), 4) AS ncd,
       |  CASE WHEN ROUND(CAST(LEAST(zf.lz, zr.lz) - LEAST(za.lz, zb.lz)
       |      AS DOUBLE) / GREATEST(za.lz, zb.lz), 4) <= 0.5
       |    THEN 'similar_dynamics' ELSE 'distinct_dynamics' END AS verdict
       |FROM pairs0 p
       |JOIN lz za ON za.k = p.ta
       |JOIN lz zb ON zb.k = p.tb
       |JOIN lz zf ON zf.k = p.ta || '|' || p.tb || '|f'
       |JOIN lz zr ON zr.k = p.ta || '|' || p.tb || '|r'
       |ORDER BY type_a NULLS FIRST, type_b NULLS FIRST""".stripMargin

  /** Q308 — longest-common-subsequence alignment between event types'
    * daily direction sequences, via the native codegen'd `graft_lcs`
    * expression (`plans/Lcs.scala`, Wagner & Fischer 1974): the
    * order-preserving, indel-tolerant alignment score that completes
    * the sequence-distance family — DTW (Q245) warps magnitudes, NCD
    * (Q306) compares generative structure, LCS reads shared ORDERED
    * sub-patterns. Similarity is the Sørensen-normalized
    * 2·LCS/(n_a + n_b).
    *
    * Determinism: symbols are exact int64 comparisons on the
    * tie-broken daily grid; LCS is the integer DP (char equality
    * only); the similarity is one divide of exact ints rounded 4; the
    * verdict compares the ROUNDED value. The DuckDB twin replays the
    * DP through the prefix-max row identity LCS(i,j) =
    * max(LCS(i−1,j), max_{t≤j, a_i=b_t}(LCS(i−1,t−1)+1)) with each DP
    * row carried as a LIST in a recursive CTE — same integers, no
    * window-in-recursion needed.
    *
    * Scale notes: sequences are spine-bounded per type (the
    * grouped-bounded-series contract); the pair relation is
    * |types|²-bounded with one O(n·m) integer DP per pair inside
    * WholeStageCodegen.
    */
  def q308(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val seqs = grid.withColumn("pv", lag(col("v"), 1).over(w))
      .filter(col("pv").isNotNull)
      .withColumn("ch", when(col("v") > col("pv"), "u")
        .when(col("v") < col("pv"), "d").otherwise("f"))
      .groupBy(col("event_type"))
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(day, ch))), x -> x.ch), '')").as("s"),
        count(lit(1)).cast("long").as("n"))
    val a = seqs.select(col("event_type").as("type_a"), col("s").as("sa"),
      col("n").as("n_a"))
    val b = seqs.select(col("event_type").as("type_b"), col("s").as("sb"),
      col("n").as("n_b"))
    a.join(b, col("type_a") < col("type_b"))
      .withColumn("lcs", expr("graft_lcs(sa, sb)").cast("long"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("lcs"),
        expr("ROUND(CAST(2 * lcs AS DOUBLE) / (n_a + n_b), 4)")
          .as("lcs_sim"))
      .withColumn("verdict", expr(
        "CASE WHEN lcs_sim >= 0.8 THEN 'aligned' ELSE 'baseline' END"))
      .orderBy(asc_nulls_first("type_a"), asc_nulls_first("type_b"))
  }

  val q308Oracle: String =
    s"""WITH RECURSIVE $gridSql,
       |sym AS (
       |  SELECT event_type, day,
       |    CASE WHEN v > pv THEN 'u' WHEN v < pv THEN 'd' ELSE 'f' END AS ch
       |  FROM (
       |    SELECT event_type, day, v,
       |      LAG(v) OVER (PARTITION BY event_type ORDER BY day) AS pv
       |    FROM grid)
       |  WHERE pv IS NOT NULL),
       |seqs AS (
       |  SELECT event_type, STRING_AGG(ch, '' ORDER BY day) AS s,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM sym GROUP BY 1),
       |prs AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb,
       |    a.s AS sa, b.s AS sb, a.n AS na, b.n AS nb,
       |    a.event_type || '|' || b.event_type AS k
       |  FROM seqs a JOIN seqs b ON a.event_type < b.event_type),
       |dp AS (
       |  SELECT k, CAST(0 AS BIGINT) AS i,
       |    list_transform(generate_series(0, CAST(nb AS INTEGER)),
       |      x -> CAST(0 AS BIGINT)) AS row
       |  FROM prs
       |  UNION ALL
       |  SELECT r.k, r.i + 1,
       |    list_transform(generate_series(0, CAST(p.nb AS INTEGER)), j ->
       |      CASE WHEN j = 0 THEN CAST(0 AS BIGINT)
       |      ELSE GREATEST(r.row[j + 1],
       |        COALESCE(list_max(list_transform(generate_series(1, j), t ->
       |          CASE WHEN substr(p.sb, CAST(t AS INTEGER), 1)
       |              = substr(p.sa, CAST(r.i AS INTEGER) + 1, 1)
       |            THEN r.row[t] + 1 END)), 0)) END) AS row
       |  FROM dp r JOIN prs p ON p.k = r.k
       |  WHERE r.i < p.na),
       |lcs AS (
       |  SELECT d.k, d.row[CAST(p.nb AS INTEGER) + 1] AS lcs
       |  FROM dp d JOIN prs p ON p.k = d.k AND d.i = p.na)
       |SELECT p.ta AS type_a, p.tb AS type_b, p.na AS n_a, p.nb AS n_b,
       |  CAST(l.lcs AS BIGINT) AS lcs,
       |  ROUND(CAST(2 * l.lcs AS DOUBLE) / (p.na + p.nb), 4) AS lcs_sim,
       |  CASE WHEN ROUND(CAST(2 * l.lcs AS DOUBLE) / (p.na + p.nb), 4)
       |      >= 0.8 THEN 'aligned' ELSE 'baseline' END AS verdict
       |FROM prs p JOIN lcs l ON l.k = p.k
       |ORDER BY type_a NULLS FIRST, type_b NULLS FIRST""".stripMargin

  /** The exact int64 sum Σᵢⱼ|aᵢ − bⱼ| over a collapsed two-sided value
    * relation: each distinct cents row contributes
    * cnt_row · (v·cumB − sumB below v, mirrored above) via inclusive
    * running (count, value·count) cums — ties contribute 0 either way.
    * Shared by Q311's three pairwise-distance sums.
    */
  private def absPairSum(cntA: Column, v: Column, cbI: Column, sbI: Column,
      cbT: Column, sbT: Column): Column =
    cntA * (v * cbI - sbI + (sbT - sbI) - v * (cbT - cbI))

  /** Q311 — energy distance between every pair of event types' value
    * distributions (Székely & Rizzo 2004/2013): ℰ = 2·E|X−Y| −
    * E|X−X′| − E|Y−Y′|, the two-sample statistic that is zero IFF the
    * distributions are equal and reads ALL moments — where KS (Q139)
    * takes the worst ECDF gap and W₁ (Q297) integrates it, energy
    * distance weighs discrepancies by pairwise separation, which is
    * what makes the energy test consistent against every alternative.
    * Emitted in cents with the three exact pairwise sums.
    *
    * Determinism: values collapse to exact cents; all three Σ|·−·|
    * sums are exact int64 via inclusive running cums on the collapsed
    * domain (no pair enumeration anywhere); ℰ is ONE fixed three-term
    * expression of exact ints rounded 6.
    *
    * Scale notes: the Q139/Q297 collapsed-domain shape — one
    * per-(type, cents) aggregate, pair replication over DISTINCT
    * cents only, one window pass per pair. Σ|x−y| ≤ nA·nB·range:
    * inside int64 to ~10⁶-row sides at this value range; beyond, the
    * identical plan carries DECIMAL(38,0).
    */
  def q311(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val byVal = c.events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val types = byVal.select(col("event_type")).distinct()
    val pairTags = types.select(col("event_type").as("type_a"))
      .join(types.select(col("event_type").as("type_b")),
        col("type_a") < col("type_b"))
    val sided = broadcast(pairTags)
      .join(byVal, col("event_type") === col("type_a") ||
        col("event_type") === col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("cents"))
      .agg(sum(when(col("event_type") === col("type_a"), col("cnt"))
          .otherwise(0L)).as("cnt_a"),
        sum(when(col("event_type") === col("type_b"), col("cnt"))
          .otherwise(0L)).as("cnt_b"))
    val wCum = Window.partitionBy(col("type_a"), col("type_b"))
      .orderBy(asc("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("type_a"), col("type_b"))
    val cums = sided
      .withColumn("ca", sum(col("cnt_a")).over(wCum))
      .withColumn("sa", sum(col("cnt_a") * col("cents")).over(wCum))
      .withColumn("cb", sum(col("cnt_b")).over(wCum))
      .withColumn("sb", sum(col("cnt_b") * col("cents")).over(wCum))
      .withColumn("na", max(col("ca")).over(wAll))
      .withColumn("ta", max(col("sa")).over(wAll))
      .withColumn("nb", max(col("cb")).over(wAll))
      .withColumn("tb", max(col("sb")).over(wAll))
    cums.groupBy(col("type_a"), col("type_b"))
      .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
        sum(absPairSum(col("cnt_a"), col("cents"), col("cb"), col("sb"),
          col("nb"), col("tb"))).cast("long").as("sxy"),
        sum(absPairSum(col("cnt_a"), col("cents"), col("ca"), col("sa"),
          col("na"), col("ta"))).cast("long").as("sxx"),
        sum(absPairSum(col("cnt_b"), col("cents"), col("cb"), col("sb"),
          col("nb"), col("tb"))).cast("long").as("syy"))
      .select(col("type_a"), col("type_b"), col("na"), col("nb"),
        col("sxy"), col("sxx"), col("syy"),
        expr("ROUND(2 * CAST(sxy AS DOUBLE) / (CAST(na AS DOUBLE) * nb)" +
          " - CAST(sxx AS DOUBLE) / (CAST(na AS DOUBLE) * na)" +
          " - CAST(syy AS DOUBLE) / (CAST(nb AS DOUBLE) * nb), 6)")
          .as("e_cents"))
      .orderBy(asc_nulls_first("type_a"), asc_nulls_first("type_b"))
  }

  val q311Oracle: String = {
    def aps(cnt: String, cI: String, sI: String, cT: String, sT: String) =
      s"$cnt * (cents * $cI - $sI + ($sT - $sI) - cents * ($cT - $cI))"
    s"""WITH byval AS (
       |  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
       |    COUNT(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |pairs AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b
       |  FROM (SELECT DISTINCT event_type FROM byval) a
       |  JOIN (SELECT DISTINCT event_type FROM byval) b
       |    ON a.event_type < b.event_type),
       |sided AS (
       |  SELECT p.type_a, p.type_b, v.cents,
       |    SUM(CASE WHEN v.event_type = p.type_a THEN v.cnt ELSE 0 END)
       |      AS cnt_a,
       |    SUM(CASE WHEN v.event_type = p.type_b THEN v.cnt ELSE 0 END)
       |      AS cnt_b
       |  FROM pairs p JOIN byval v
       |    ON v.event_type IN (p.type_a, p.type_b)
       |  GROUP BY 1, 2, 3),
       |cums AS (
       |  SELECT type_a, type_b, cents, cnt_a, cnt_b,
       |    SUM(cnt_a) OVER w AS ca, SUM(cnt_a * cents) OVER w AS sa,
       |    SUM(cnt_b) OVER w AS cb, SUM(cnt_b * cents) OVER w AS sb,
       |    SUM(cnt_a) OVER wa AS na, SUM(cnt_a * cents) OVER wa AS ta,
       |    SUM(cnt_b) OVER wa AS nb, SUM(cnt_b * cents) OVER wa AS tb
       |  FROM sided
       |  WINDOW w AS (PARTITION BY type_a, type_b ORDER BY cents
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |         wa AS (PARTITION BY type_a, type_b)),
       |sums AS (
       |  SELECT type_a, type_b,
       |    CAST(MAX(na) AS BIGINT) AS na, CAST(MAX(nb) AS BIGINT) AS nb,
       |    CAST(SUM(${aps("cnt_a", "cb", "sb", "nb", "tb")}) AS BIGINT)
       |      AS sxy,
       |    CAST(SUM(${aps("cnt_a", "ca", "sa", "na", "ta")}) AS BIGINT)
       |      AS sxx,
       |    CAST(SUM(${aps("cnt_b", "cb", "sb", "nb", "tb")}) AS BIGINT)
       |      AS syy
       |  FROM cums GROUP BY 1, 2)
       |SELECT type_a, type_b, na, nb, sxy, sxx, syy,
       |  ROUND(2 * CAST(sxy AS DOUBLE) / (CAST(na AS DOUBLE) * nb)
       |    - CAST(sxx AS DOUBLE) / (CAST(na AS DOUBLE) * na)
       |    - CAST(syy AS DOUBLE) / (CAST(nb AS DOUBLE) * nb), 6) AS e_cents
       |FROM sums
       |ORDER BY type_a NULLS FIRST, type_b NULLS FIRST""".stripMargin
  }

  /** Q312 — Kendall τ-b dependence matrix over lineitem's three discrete
    * measures (quantity, discount, tax), pairwise (Kendall 1938; the
    * tie-corrected τ-b of Agresti, *Analysis of Ordinal Categorical
    * Data*). Where Q137's Pearson r reads only linear co-movement and
    * Q161's Spearman needs full midrank vectors, τ-b is the ordinal
    * association measure of record for heavily-tied discrete domains —
    * exactly these (50/11/9 distinct values): C and D count concordant /
    * discordant observation pairs, and the denominator removes pairs
    * tied in either margin.
    *
    * Determinism: measures collapse to exact cents; C, D, n₀ and both
    * tie terms are exact int64 assembled from cell counts; τ-b is ONE
    * fixed expression of those ints rounded 6, and the verdict reads the
    * already-rounded value.
    *
    * Scale notes: the corpus is scanned ONCE (stack → long form), then
    * everything runs on the collapsed (pair, x, y) cell relation whose
    * size is value-domain-bounded (≤ 50·11 + 50·9 + 11·9 = 1 049 cells
    * at ANY row count — 100 TB included); the C/D cell self-join is a
    * broadcast over that bounded relation, never an observation-level
    * pair join. Int64 headroom: C, D ≤ n(n−1)/2, inside int64 to
    * n ≈ 4·10⁹ rows; the τ denominator is formed in double (its exact
    * int form could overflow at ~10⁶ rows, so BOTH texts cast the two
    * factors to double before multiplying).
    */
  def q312(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val cells = c.lineitem
      .select(round(col("l_quantity")).cast("long").as("qty"),
        round(col("l_discount") * 100).cast("long").as("disc"),
        round(col("l_tax") * 100).cast("long").as("tax"))
      .selectExpr("stack(3, 'qty_disc', qty, disc, 'qty_tax', qty, tax, " +
        "'disc_tax', disc, tax) AS (pair, x, y)")
      .groupBy(col("pair"), col("x"), col("y"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tot = cells.groupBy(col("pair"))
      .agg(sum(col("cnt")).as("n"))
      .withColumn("n0", expr("n * (n - 1) DIV 2"))
    def tieTerm(margin: String, out: String): DataFrame = cells
      .groupBy(col("pair"), col(margin))
      .agg(sum(col("cnt")).as("t"))
      .groupBy(col("pair"))
      .agg(sum(expr("t * (t - 1) DIV 2")).as(out))
    val cd = cells
      .select(col("pair"), col("x").as("xa"), col("y").as("ya"),
        col("cnt").as("ca"))
      .join(broadcast(cells.select(col("pair"), col("x").as("xb"),
        col("y").as("yb"), col("cnt").as("cb"))),
        Seq("pair"))
      .where(col("xa") < col("xb"))
      .groupBy(col("pair"))
      .agg(sum(when(col("ya") < col("yb"), col("ca") * col("cb"))
          .otherwise(0L)).as("concordant"),
        sum(when(col("ya") > col("yb"), col("ca") * col("cb"))
          .otherwise(0L)).as("discordant"))
    // cd has no row for a pair whose x margin is a single distinct value
    // (no xa < xb combination exists) — LEFT join + coalesce-to-0 so the
    // pair surfaces as a 'degenerate' verdict row instead of vanishing
    // (tied_x = n0 there, so tau_b is NULL by the guard).
    tot.join(tieTerm("x", "tied_x"), Seq("pair"))
      .join(tieTerm("y", "tied_y"), Seq("pair"))
      .join(cd, Seq("pair"), "left")
      .withColumn("concordant", coalesce(col("concordant"), lit(0L)))
      .withColumn("discordant", coalesce(col("discordant"), lit(0L)))
      .select(col("pair"), col("n"), col("n0"), col("tied_x"),
        col("tied_y"), col("concordant"), col("discordant"),
        expr("CASE WHEN n0 - tied_x <= 0 OR n0 - tied_y <= 0 THEN NULL " +
          "ELSE ROUND(CAST(concordant - discordant AS DOUBLE) / " +
          "SQRT(CAST(n0 - tied_x AS DOUBLE) * " +
          "CAST(n0 - tied_y AS DOUBLE)), 6) END").as("tau_b"))
      .withColumn("verdict", expr("CASE WHEN tau_b IS NULL " +
        "THEN 'degenerate' WHEN ABS(tau_b) >= 0.05 THEN 'dependent' " +
        "ELSE 'independent' END"))
      .orderBy(asc_nulls_first("pair"))
  }

  val q312Oracle: String =
    """WITH li AS (
      |  SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty,
      |    CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS disc,
      |    CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS tax
      |  FROM lineitem),
      |longf AS (
      |  SELECT 'qty_disc' AS pair, qty AS x, disc AS y FROM li
      |  UNION ALL SELECT 'qty_tax', qty, tax FROM li
      |  UNION ALL SELECT 'disc_tax', disc, tax FROM li),
      |cells AS (
      |  SELECT pair, x, y, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM longf GROUP BY 1, 2, 3),
      |tot AS (
      |  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n,
      |    CAST(SUM(cnt) AS BIGINT) * (CAST(SUM(cnt) AS BIGINT) - 1) // 2
      |      AS n0
      |  FROM cells GROUP BY 1),
      |tx AS (
      |  SELECT pair, CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS tied_x
      |  FROM (SELECT pair, x, CAST(SUM(cnt) AS BIGINT) AS t
      |        FROM cells GROUP BY 1, 2)
      |  GROUP BY 1),
      |ty AS (
      |  SELECT pair, CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS tied_y
      |  FROM (SELECT pair, y, CAST(SUM(cnt) AS BIGINT) AS t
      |        FROM cells GROUP BY 1, 2)
      |  GROUP BY 1),
      |cd AS (
      |  SELECT a.pair,
      |    CAST(SUM(CASE WHEN a.y < b.y THEN a.cnt * b.cnt ELSE 0 END)
      |      AS BIGINT) AS concordant,
      |    CAST(SUM(CASE WHEN a.y > b.y THEN a.cnt * b.cnt ELSE 0 END)
      |      AS BIGINT) AS discordant
      |  FROM cells a JOIN cells b ON a.pair = b.pair AND a.x < b.x
      |  GROUP BY 1),
      |out AS (
      |  SELECT t.pair, t.n, t.n0, tx.tied_x, ty.tied_y,
      |    CAST(COALESCE(cd.concordant, 0) AS BIGINT) AS concordant,
      |    CAST(COALESCE(cd.discordant, 0) AS BIGINT) AS discordant,
      |    CASE WHEN t.n0 - tx.tied_x <= 0 OR t.n0 - ty.tied_y <= 0
      |      THEN NULL
      |      ELSE ROUND(CAST(COALESCE(cd.concordant, 0)
      |          - COALESCE(cd.discordant, 0) AS DOUBLE) /
      |        SQRT(CAST(t.n0 - tx.tied_x AS DOUBLE) *
      |        CAST(t.n0 - ty.tied_y AS DOUBLE)), 6) END AS tau_b
      |  FROM tot t
      |  JOIN tx ON tx.pair = t.pair
      |  JOIN ty ON ty.pair = t.pair
      |  LEFT JOIN cd ON cd.pair = t.pair)
      |SELECT pair, n, n0, tied_x, tied_y, concordant, discordant, tau_b,
      |  CASE WHEN tau_b IS NULL THEN 'degenerate'
      |    WHEN ABS(tau_b) >= 0.05 THEN 'dependent'
      |    ELSE 'independent' END AS verdict
      |FROM out
      |ORDER BY pair NULLS FIRST""".stripMargin

  /** Q313 — Cramér–von Mises two-sample statistic between every pair of
    * event types' value distributions (Cramér 1928; Anderson 1962's
    * two-sample form): T = nm/(n+m)² · Σ over POOLED observations of
    * (F_n − G_m)², i.e. the L² distance between the ECDFs. Completes
    * the ECDF-distance family: KS (Q139) takes the sup gap, W₁ (Q297)
    * its L¹ integral, energy distance (Q311) the all-pairs form — CvM
    * is the L² member, the one with the classical tabulated null
    * (reject at 5% when T ≥ 0.461).
    *
    * Determinism: on the collapsed cents domain the ECDF gap at a
    * pooled point is the exact int64 cross-count d = m·cumA − n·cumB,
    * and Σ w·d² is carried EXACTLY in DECIMAL(38,0) (Spark) /
    * HUGEINT (DuckDB) — d² alone can pass 2⁶³ at sf0.1 — then cast
    * once to double; T is ONE fixed expression of that exact integer
    * rounded 6, and the verdict reads the rounded T.
    *
    * Scale notes: the Q139/Q297/Q311 collapsed-domain shape — one
    * per-(type, cents) aggregate, pair replication over DISTINCT cents
    * only, one window pass per pair; never an observation-level join.
    * The decimal carrier is exact to ~10⁶-row sides (Σw·d² ≤ (n+m)·
    * (nm)² < 10³⁸); beyond that the identical plan carries the gap in
    * double with ~1 ulp noise on a statistic read against 0.461.
    */
  def q313(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val byVal = c.events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val types = byVal.select(col("event_type")).distinct()
    val pairTags = types.select(col("event_type").as("type_a"))
      .join(types.select(col("event_type").as("type_b")),
        col("type_a") < col("type_b"))
    val sided = broadcast(pairTags)
      .join(byVal, col("event_type") === col("type_a") ||
        col("event_type") === col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("cents"))
      .agg(sum(when(col("event_type") === col("type_a"), col("cnt"))
          .otherwise(0L)).as("cnt_a"),
        sum(when(col("event_type") === col("type_b"), col("cnt"))
          .otherwise(0L)).as("cnt_b"))
    val wCum = Window.partitionBy(col("type_a"), col("type_b"))
      .orderBy(asc("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("type_a"), col("type_b"))
    sided
      .withColumn("ca", sum(col("cnt_a")).over(wCum))
      .withColumn("cb", sum(col("cnt_b")).over(wCum))
      .withColumn("na", max(col("ca")).over(wAll))
      .withColumn("nb", max(col("cb")).over(wAll))
      .groupBy(col("type_a"), col("type_b"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sum(expr("CAST(nb * ca - na * cb AS DECIMAL(38,0)) * " +
          "CAST(nb * ca - na * cb AS DECIMAL(38,0)) * " +
          "CAST(cnt_a + cnt_b AS DECIMAL(38,0))")).as("udec"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        expr("CAST(udec AS DOUBLE)").as("sum_w_d2"),
        expr("ROUND(CAST(udec AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b *" +
          " (n_a + n_b) * (n_a + n_b)), 6)").as("t_cvm"))
      .withColumn("verdict", expr("CASE WHEN t_cvm >= 0.461 " +
        "THEN 'different' ELSE 'same' END"))
      .orderBy(asc_nulls_first("type_a"), asc_nulls_first("type_b"))
  }

  val q313Oracle: String =
    """WITH byval AS (
      |  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b
      |  FROM (SELECT DISTINCT event_type FROM byval) a
      |  JOIN (SELECT DISTINCT event_type FROM byval) b
      |    ON a.event_type < b.event_type),
      |sided AS (
      |  SELECT p.type_a, p.type_b, v.cents,
      |    CAST(SUM(CASE WHEN v.event_type = p.type_a THEN v.cnt
      |      ELSE 0 END) AS BIGINT) AS cnt_a,
      |    CAST(SUM(CASE WHEN v.event_type = p.type_b THEN v.cnt
      |      ELSE 0 END) AS BIGINT) AS cnt_b
      |  FROM pairs p JOIN byval v
      |    ON v.event_type IN (p.type_a, p.type_b)
      |  GROUP BY 1, 2, 3),
      |cums AS (
      |  SELECT type_a, type_b, cents, cnt_a, cnt_b,
      |    CAST(SUM(cnt_a) OVER w AS BIGINT) AS ca,
      |    CAST(SUM(cnt_b) OVER w AS BIGINT) AS cb,
      |    CAST(SUM(cnt_a) OVER wa AS BIGINT) AS na,
      |    CAST(SUM(cnt_b) OVER wa AS BIGINT) AS nb
      |  FROM sided
      |  WINDOW w AS (PARTITION BY type_a, type_b ORDER BY cents
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wa AS (PARTITION BY type_a, type_b)),
      |sums AS (
      |  SELECT type_a, type_b, MAX(na) AS n_a, MAX(nb) AS n_b,
      |    SUM(CAST(nb * ca - na * cb AS HUGEINT) *
      |        CAST(nb * ca - na * cb AS HUGEINT) *
      |        CAST(cnt_a + cnt_b AS HUGEINT)) AS udec
      |  FROM cums GROUP BY 1, 2)
      |SELECT type_a, type_b, n_a, n_b,
      |  CAST(udec AS DOUBLE) AS sum_w_d2,
      |  ROUND(CAST(udec AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b *
      |    (n_a + n_b) * (n_a + n_b)), 6) AS t_cvm,
      |  CASE WHEN ROUND(CAST(udec AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b
      |    * (n_a + n_b) * (n_a + n_b)), 6) >= 0.461
      |    THEN 'different' ELSE 'same' END AS verdict
      |FROM sums
      |ORDER BY type_a NULLS FIRST, type_b NULLS FIRST""".stripMargin

  /** Q314 — Mood's median test, decomposed per event type (Mood 1950;
    * Brown & Mood 1951): dichotomize every event's value against the
    * GRAND pooled median (exact lower order statistic, ties dropped per
    * the classical prescription) and test each type's above-median count
    * against its expectation with the ADJUSTED standardized residual
    * z = (o − n_t·A/N) / √(n_t·(A/N)·(B/N)·(1 − n_t/N)) — the k-sample
    * location screen that needs NO distributional shape at all, the
    * coarse-but-robust sibling of Mann–Whitney (Q280-era) and the
    * per-type decomposition the omnibus χ² form hides.
    *
    * Determinism: the grand median is an exact order statistic on the
    * collapsed cents domain; every count is exact int64; the residual
    * numerator N·o − n_t·A is ONE exact int64 and z ONE fixed float
    * shape rounded 4; the verdict reads the rounded z.
    *
    * Scale notes: one corpus scan collapses to (type, cents) cells; the
    * median is one cumulative pass over the POOLED cells (value-domain-
    * bounded, single global window on a bounded relation); per-type
    * counts are one more pass over the cells; totals broadcast. The
    * int64 numerator N·o holds to N ≈ 3·10⁹ events; beyond, the same
    * plan casts before the product (documented, not silent).
    */
  def q314(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val byVal = c.events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val pooled = byVal.groupBy(col("cents")).agg(sum(col("cnt")).as("w"))
    val ntot = pooled.agg(sum(col("w")).as("ntot"))
    val wCum = Window.orderBy(asc("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = pooled.withColumn("cum", sum(col("w")).over(wCum))
      .crossJoin(broadcast(ntot))
      .where(col("cum") >= expr("(ntot + 1) DIV 2"))
      .agg(min(col("cents")).as("grand_median_cents"))
    val perType = byVal.crossJoin(broadcast(med))
      .groupBy(col("event_type"), col("grand_median_cents"))
      .agg(sum(when(col("cents") > col("grand_median_cents"), col("cnt"))
          .otherwise(0L)).as("n_above"),
        sum(when(col("cents") < col("grand_median_cents"), col("cnt"))
          .otherwise(0L)).as("n_below"),
        sum(when(col("cents") === col("grand_median_cents"), col("cnt"))
          .otherwise(0L)).as("n_ties"))
    val tots = perType.agg(sum(col("n_above")).as("ta"),
      sum(col("n_below")).as("tb"))
    perType.crossJoin(broadcast(tots))
      .withColumn("nt", col("n_above") + col("n_below"))
      .withColumn("nn", col("ta") + col("tb"))
      .select(col("event_type"), col("grand_median_cents"),
        col("n_above"), col("n_below"), col("n_ties"),
        col("nt").as("n_used"),
        expr("CASE WHEN nt = 0 OR ta = 0 OR tb = 0 OR nn - nt = 0 " +
          "THEN NULL ELSE ROUND(CAST(nn * n_above - nt * ta AS DOUBLE) /" +
          " SQRT(CAST(nt AS DOUBLE) * ta * tb * (nn - nt) / nn), 4) END")
          .as("z_med"))
      .withColumn("verdict", expr("CASE WHEN z_med IS NULL " +
        "THEN 'degenerate' WHEN z_med >= 1.96 THEN 'above_median' " +
        "WHEN z_med <= -1.96 THEN 'below_median' ELSE 'centered' END"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q314Oracle: String =
    """WITH byval AS (
      |  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |pooled AS (
      |  SELECT cents, CAST(SUM(cnt) AS BIGINT) AS w
      |  FROM byval GROUP BY 1),
      |tot0 AS (SELECT CAST(SUM(w) AS BIGINT) AS ntot FROM pooled),
      |med AS (
      |  SELECT MIN(cents) AS grand_median_cents
      |  FROM (SELECT cents, CAST(SUM(w) OVER (ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum FROM pooled) c, tot0
      |  WHERE cum >= (ntot + 1) // 2),
      |pertype AS (
      |  SELECT event_type, grand_median_cents,
      |    CAST(SUM(CASE WHEN cents > grand_median_cents THEN cnt
      |      ELSE 0 END) AS BIGINT) AS n_above,
      |    CAST(SUM(CASE WHEN cents < grand_median_cents THEN cnt
      |      ELSE 0 END) AS BIGINT) AS n_below,
      |    CAST(SUM(CASE WHEN cents = grand_median_cents THEN cnt
      |      ELSE 0 END) AS BIGINT) AS n_ties
      |  FROM byval, med GROUP BY 1, 2),
      |tots AS (
      |  SELECT CAST(SUM(n_above) AS BIGINT) AS ta,
      |    CAST(SUM(n_below) AS BIGINT) AS tb
      |  FROM pertype),
      |out AS (
      |  SELECT p.event_type, p.grand_median_cents, p.n_above, p.n_below,
      |    p.n_ties, p.n_above + p.n_below AS n_used,
      |    CASE WHEN p.n_above + p.n_below = 0 OR t.ta = 0 OR t.tb = 0
      |        OR (t.ta + t.tb) - (p.n_above + p.n_below) = 0 THEN NULL
      |      ELSE ROUND(CAST((t.ta + t.tb) * p.n_above -
      |        (p.n_above + p.n_below) * t.ta AS DOUBLE) /
      |        SQRT(CAST(p.n_above + p.n_below AS DOUBLE) * t.ta * t.tb *
      |        ((t.ta + t.tb) - (p.n_above + p.n_below)) / (t.ta + t.tb)),
      |        4) END AS z_med
      |  FROM pertype p, tots t)
      |SELECT event_type, grand_median_cents, n_above, n_below, n_ties,
      |  n_used, z_med,
      |  CASE WHEN z_med IS NULL THEN 'degenerate'
      |    WHEN z_med >= 1.96 THEN 'above_median'
      |    WHEN z_med <= -1.96 THEN 'below_median'
      |    ELSE 'centered' END AS verdict
      |FROM out
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q316 — partial correlation matrix over lineitem's three discrete
    * measures: for each pair, the Pearson correlation CONTROLLING for
    * the third variable, r_xy·z = (C_xy·C_zz − C_xz·C_yz) /
    * √((C_xx·C_zz − C_xz²)(C_yy·C_zz − C_yz²)) on the centered-sum
    * matrix C_ab = n·Σab − Σa·Σb (Yule 1907; Anderson, *Introduction to
    * Multivariate Statistical Analysis* §4.3). Reported beside the
    * zero-order r so a confounded pair (r large, partial ≈ 0) is
    * visible — the screen Q137/Q161's marginal matrices can't give.
    *
    * Determinism: measures are exact cents; all nine sufficient sums
    * accumulate in DECIMAL(38,0) (cast BEFORE the product, the Q127
    * rule) / HUGEINT, each C_ab is assembled EXACTLY there and cast
    * ONCE to double; r and the partial are fixed double expressions of
    * those casts rounded 4, and the verdict reads rounded values.
    *
    * Scale notes: ONE aggregate pass over the corpus to a single
    * 10-field summary row (map-side combined); the three output rows
    * explode from that one row — no join, no second scan, no shuffle
    * beyond the scalar aggregate, at any data size.
    */
  def q316(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val meas = Seq("qty", "disc", "tax")
    val base = c.lineitem.select(
      round(col("l_quantity")).cast("long").as("qty"),
      round(col("l_discount") * 100).cast("long").as("disc"),
      round(col("l_tax") * 100).cast("long").as("tax"))
    val dec = "decimal(38,0)"
    def d(m: String): Column = col(m).cast(dec)
    val pairsIdx = for {
      i <- meas.indices; j <- meas.indices if i <= j
    } yield (meas(i), meas(j))
    val sums = base.agg(count(lit(1)).as("n"),
      meas.map(m => sum(d(m)).as(s"s_$m")) ++
        pairsIdx.map { case (a, b) =>
          sum(d(a) * d(b)).as(s"sp_${a}_$b") }: _*)
    val withC = pairsIdx.foldLeft(sums) { case (df, (a, b)) =>
      df.withColumn(s"c_${a}_$b",
        expr(s"CAST(CAST(n AS DECIMAL(38,0)) * sp_${a}_$b " +
          s"- s_$a * s_$b AS DOUBLE)"))
    }
    // (x, y, control) triples in fixed order
    val triples = Seq(("qty", "disc", "tax"), ("qty", "tax", "disc"),
      ("disc", "tax", "qty"))
    def cc(a: String, b: String): Column = {
      val (x, y) = if (meas.indexOf(a) <= meas.indexOf(b)) (a, b)
      else (b, a)
      col(s"c_${x}_$y")
    }
    val rows = triples.map { case (x, y, z) =>
      val num = cc(x, y) * cc(z, z) - cc(x, z) * cc(y, z)
      val dx = cc(x, x) * cc(z, z) - cc(x, z) * cc(x, z)
      val dy = cc(y, y) * cc(z, z) - cc(y, z) * cc(y, z)
      val r0den = sqrt(cc(x, x) * cc(y, y))
      struct(lit(x).as("measure_x"), lit(y).as("measure_y"),
        lit(z).as("control"),
        round(cc(x, y) / when(r0den =!= 0, r0den), 4).as("r_xy"),
        when(dx > 0 && dy > 0,
          round(num / sqrt(dx * dy), 4)).as("r_partial"))
    }
    withC.select(col("n"), explode(array(rows: _*)).as("p"))
      .select(col("p.measure_x"), col("p.measure_y"), col("p.control"),
        col("n"), col("p.r_xy"), col("p.r_partial"))
      .withColumn("verdict", expr("CASE WHEN r_partial IS NULL " +
        "THEN 'degenerate' WHEN ABS(r_partial) >= 0.05 " +
        "THEN 'dependent' ELSE 'independent' END"))
      .orderBy(asc_nulls_first("measure_x"), asc_nulls_first("measure_y"))
  }

  val q316Oracle: String = {
    // C_ab over HUGEINT sums, cast once to double — same exact integer,
    // same IEEE double, as the engine's DECIMAL(38,0) path.
    def cAs(a: String, b: String) =
      s"CAST(n * sp_${a}_$b - s_$a * s_$b AS DOUBLE) AS c_${a}_$b"
    def partial(x: String, y: String, z: String, cn: (String, String) => String) = {
      val num = s"(${cn(x, y)} * ${cn(z, z)} - ${cn(x, z)} * ${cn(y, z)})"
      val dx = s"(${cn(x, x)} * ${cn(z, z)} - ${cn(x, z)} * ${cn(x, z)})"
      val dy = s"(${cn(y, y)} * ${cn(z, z)} - ${cn(y, z)} * ${cn(y, z)})"
      s"""SELECT '$x' AS measure_x, '$y' AS measure_y, '$z' AS control,
         |  n, ROUND(${cn(x, y)} / NULLIF(SQRT(${cn(x, x)} * ${cn(y, y)}),
         |    0), 4) AS r_xy,
         |  CASE WHEN $dx > 0 AND $dy > 0 THEN
         |    ROUND($num / SQRT($dx * $dy), 4) END AS r_partial
         |FROM cmat""".stripMargin
    }
    val cn = (a: String, b: String) => {
      val ms = Seq("qty", "disc", "tax")
      val (x, y) = if (ms.indexOf(a) <= ms.indexOf(b)) (a, b) else (b, a)
      s"c_${x}_$y"
    }
    s"""WITH li AS (
       |  SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty,
       |    CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS disc,
       |    CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS tax
       |  FROM lineitem),
       |sums AS (
       |  SELECT COUNT(*) AS n,
       |    SUM(qty) AS s_qty, SUM(disc) AS s_disc, SUM(tax) AS s_tax,
       |    SUM(qty * qty) AS sp_qty_qty, SUM(qty * disc) AS sp_qty_disc,
       |    SUM(qty * tax) AS sp_qty_tax, SUM(disc * disc) AS sp_disc_disc,
       |    SUM(disc * tax) AS sp_disc_tax, SUM(tax * tax) AS sp_tax_tax
       |  FROM li),
       |cmat AS (
       |  SELECT CAST(n AS BIGINT) AS n,
       |    ${cAs("qty", "qty")}, ${cAs("qty", "disc")},
       |    ${cAs("qty", "tax")}, ${cAs("disc", "disc")},
       |    ${cAs("disc", "tax")}, ${cAs("tax", "tax")}
       |  FROM sums),
       |rows0 AS (
       |${partial("qty", "disc", "tax", cn)}
       |UNION ALL
       |${partial("qty", "tax", "disc", cn)}
       |UNION ALL
       |${partial("disc", "tax", "qty", cn)})
       |SELECT measure_x, measure_y, control, n, r_xy, r_partial,
       |  CASE WHEN r_partial IS NULL THEN 'degenerate'
       |    WHEN ABS(r_partial) >= 0.05 THEN 'dependent'
       |    ELSE 'independent' END AS verdict
       |FROM rows0
       |ORDER BY measure_x NULLS FIRST, measure_y NULLS FIRST""".stripMargin
  }

  /** Q326 — Kruskal–Wallis k-sample rank test across ALL event types at
    * once (Kruskal & Wallis 1952): H = 12/(N(N+1)) Σ R_j²/n_j − 3(N+1)
    * with the tie correction C = 1 − Σ(t³−t)/(N³−N). The OMNIBUS
    * location test the pairwise ladder can't give: Q138's Mann–Whitney
    * answers "are a and b shifted?" k(k−1)/2 times (multiplicity!);
    * KW answers "is ANY type shifted?" once — the gate you run BEFORE
    * the pairwise drill-down, exactly as one-way ANOVA precedes
    * pairwise t-tests.
    *
    * Determinism: the Q138 house rule — DOUBLED pooled midranks are
    * exact int64 (2·cum − t + 1 on the collapsed cents domain), so
    * every per-type rank sum R2_j, N and Σ(t³−t) are exact ints; the
    * only floats are the fixed H/C shapes rounded once, and the
    * verdict reads the rounded value with an explicit df guard.
    *
    * Scale notes: one corpus scan to (type, cents) cells; pooled
    * midranks are one window over the value-domain-bounded collapsed
    * relation; rank sums are one cell-keyed join + aggregate. Exact
    * int64 needs N³ < 2⁶³ ⇒ N ≲ 2·10⁶ for the tie term's denominator
    * — beyond that the SAME plan forms N³ in double (documented).
    */
  def q326(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val byVal = c.events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val wCum = Window.orderBy(asc("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byVal.groupBy(col("cents")).agg(sum(col("cnt")).as("w"))
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("r2", lit(2L) * col("cum") - col("w") + 1L)
    val perType = byVal
      .join(ranked.select(col("cents"), col("r2")), Seq("cents"))
      .groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("nj"), sum(col("cnt") * col("r2")).as("r2j"))
    val ties = ranked.agg(sum(expr("w * w * w - w")).as("t3"),
      sum(col("w")).as("nn"))
    perType.crossJoin(broadcast(ties))
      .agg(max(col("nn")).as("n_total"), count(lit(1)).as("k_types"),
        max(col("t3")).as("sum_t3_minus_t"),
        sum(expr("CAST(r2j AS DOUBLE) * r2j / (4.0 * nj)")).as("srr"))
      .select(col("n_total"), col("k_types"), col("sum_t3_minus_t"),
        (col("k_types") - 1L).as("df"),
        expr("ROUND(12.0 * srr / (CAST(n_total AS DOUBLE) * " +
          "(n_total + 1)) - 3.0 * (n_total + 1), 4)").as("h_stat"),
        expr("ROUND(1.0 - CAST(sum_t3_minus_t AS DOUBLE) / " +
          "(CAST(n_total AS DOUBLE) * n_total * n_total - n_total), 6)")
          .as("tie_c"),
        expr("ROUND((12.0 * srr / (CAST(n_total AS DOUBLE) * " +
          "(n_total + 1)) - 3.0 * (n_total + 1)) / " +
          "(1.0 - CAST(sum_t3_minus_t AS DOUBLE) / " +
          "(CAST(n_total AS DOUBLE) * n_total * n_total - n_total)), 4)")
          .as("h_adj"))
      .withColumn("verdict", expr("CASE WHEN k_types <> 5 " +
        "THEN 'unscored' WHEN h_adj > 9.488 THEN 'heterogeneous' " +
        "ELSE 'homogeneous' END"))
  }

  val q326Oracle: String =
    """WITH byval AS (
      |  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |pooled AS (
      |  SELECT cents, CAST(SUM(cnt) AS BIGINT) AS w
      |  FROM byval GROUP BY 1),
      |ranked AS (
      |  SELECT cents, w,
      |    2 * CAST(SUM(w) OVER (ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      - w + 1 AS r2
      |  FROM pooled),
      |pertype AS (
      |  SELECT v.event_type, CAST(SUM(v.cnt) AS BIGINT) AS nj,
      |    CAST(SUM(v.cnt * r.r2) AS BIGINT) AS r2j
      |  FROM byval v JOIN ranked r ON r.cents = v.cents
      |  GROUP BY 1),
      |ties AS (
      |  SELECT CAST(SUM(w * w * w - w) AS BIGINT) AS t3,
      |    CAST(SUM(w) AS BIGINT) AS nn
      |  FROM pooled),
      |agg AS (
      |  SELECT CAST(MAX(t.nn) AS BIGINT) AS n_total,
      |    CAST(COUNT(*) AS BIGINT) AS k_types,
      |    CAST(MAX(t.t3) AS BIGINT) AS sum_t3_minus_t,
      |    SUM(CAST(p.r2j AS DOUBLE) * p.r2j / (4.0 * p.nj)) AS srr
      |  FROM pertype p, ties t)
      |SELECT n_total, k_types, sum_t3_minus_t, k_types - 1 AS df,
      |  ROUND(12.0 * srr / (CAST(n_total AS DOUBLE) * (n_total + 1))
      |    - 3.0 * (n_total + 1), 4) AS h_stat,
      |  ROUND(1.0 - CAST(sum_t3_minus_t AS DOUBLE) /
      |    (CAST(n_total AS DOUBLE) * n_total * n_total - n_total), 6)
      |    AS tie_c,
      |  ROUND((12.0 * srr / (CAST(n_total AS DOUBLE) * (n_total + 1))
      |    - 3.0 * (n_total + 1)) /
      |    (1.0 - CAST(sum_t3_minus_t AS DOUBLE) /
      |    (CAST(n_total AS DOUBLE) * n_total * n_total - n_total)), 4)
      |    AS h_adj,
      |  CASE WHEN k_types <> 5 THEN 'unscored'
      |    WHEN ROUND((12.0 * srr / (CAST(n_total AS DOUBLE) *
      |      (n_total + 1)) - 3.0 * (n_total + 1)) /
      |      (1.0 - CAST(sum_t3_minus_t AS DOUBLE) /
      |      (CAST(n_total AS DOUBLE) * n_total * n_total - n_total)), 4)
      |      > 9.488
      |    THEN 'heterogeneous' ELSE 'homogeneous' END AS verdict
      |FROM agg""".stripMargin

  /** Q329 — Jonckheere–Terpstra ordered-alternative trend test of order
    * value across the five ORDERED priority classes (Jonckheere 1954;
    * Terpstra 1952): JT = Σ_{g<h in priority order} U_gh, the sum of
    * pairwise Mann–Whitney counts taken ONLY in the declared direction.
    * Where Kruskal–Wallis (Q326) asks "is any group shifted?", JT asks
    * the sharper ordered question — "does order value trend
    * monotonically with priority?" — with far more power against
    * monotone alternatives. Priorities order lexicographically
    * ('1-URGENT' < … < '5-LOW'), so z > 0 reads "value rises as
    * priority falls".
    *
    * Determinism: the Q138 collapsed-domain rule — DOUBLED pairwise
    * counts U2 = Σ_v c_h(v)·(2·C_g(<v) + c_g(v)) are exact int64 (ties
    * count once, not half, in the doubled form), as are N, Σn², the
    * doubled expectation e2 = (N²−Σn²)/2 (always an integer:
    * N²−Σn² = 2Σn_g n_h) and Σn²(2n+3); z is ONE fixed float shape
    * (the classical no-tie variance — prices are cents-distinct, tie
    * mass is negligible and the shape is DECLARED) rounded 4.
    *
    * Scale notes: one orders scan to (priority, cents) cells; the 10
    * ordered pairs replicate only the collapsed relation; one window
    * pass per pair. U2 ≤ N² holds int64 to N ≈ 3·10⁹ orders.
    */
  def q329(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val byVal = c.orders
      .select(col("o_orderpriority").as("prio"),
        expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
      .groupBy(col("prio"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val grps = byVal.select(col("prio")).distinct()
    val pairTags = grps.select(col("prio").as("ga"))
      .join(grps.select(col("prio").as("gb")), col("ga") < col("gb"))
    val sided = broadcast(pairTags)
      .join(byVal, col("prio") === col("ga") || col("prio") === col("gb"))
      .groupBy(col("ga"), col("gb"), col("cents"))
      .agg(sum(when(col("prio") === col("ga"), col("cnt")).otherwise(0L))
          .as("ca"),
        sum(when(col("prio") === col("gb"), col("cnt")).otherwise(0L))
          .as("cb"))
    val wCum = Window.partitionBy(col("ga"), col("gb"))
      .orderBy(asc("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val jt = sided
      .withColumn("cuma", sum(col("ca")).over(wCum))
      .withColumn("term", col("cb") *
        (lit(2L) * (col("cuma") - col("ca")) + col("ca")))
      .agg(sum(col("term")).as("jt2"))
    val sizes = byVal.groupBy(col("prio")).agg(sum(col("cnt")).as("n"))
      .agg(sum(col("n")).as("nn"), count(lit(1)).as("k_groups"),
        sum(col("n") * col("n")).as("sn2"),
        sum(col("n") * col("n") * (lit(2L) * col("n") + 3L)).as("sn2t"))
    jt.crossJoin(broadcast(sizes))
      .select(col("nn").as("n_total"), col("k_groups"), col("jt2"),
        expr("(nn * nn - sn2) DIV 2").as("e2"),
        expr("ROUND(CAST(jt2 - (nn * nn - sn2) DIV 2 AS DOUBLE) / " +
          "(2 * SQRT((CAST(nn AS DOUBLE) * nn * (2 * nn + 3) - sn2t) " +
          "/ 72)), 4)").as("z"))
      .withColumn("verdict", expr("CASE WHEN z >= 1.96 " +
        "THEN 'increasing' WHEN z <= -1.96 THEN 'decreasing' " +
        "ELSE 'no_trend' END"))
  }

  val q329Oracle: String =
    """WITH byval AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1, 2),
      |grps AS (SELECT DISTINCT prio FROM byval),
      |pairs AS (
      |  SELECT a.prio AS ga, b.prio AS gb
      |  FROM grps a JOIN grps b ON a.prio < b.prio),
      |sided AS (
      |  SELECT p.ga, p.gb, v.cents,
      |    CAST(SUM(CASE WHEN v.prio = p.ga THEN v.cnt ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN v.prio = p.gb THEN v.cnt ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM pairs p JOIN byval v ON v.prio IN (p.ga, p.gb)
      |  GROUP BY 1, 2, 3),
      |terms AS (
      |  SELECT cb * (2 * (CAST(SUM(ca) OVER (PARTITION BY ga, gb
      |      ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND
      |      CURRENT ROW) AS BIGINT) - ca) + ca) AS term
      |  FROM sided),
      |jt AS (SELECT CAST(SUM(term) AS BIGINT) AS jt2 FROM terms),
      |sizes AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
      |    CAST(COUNT(*) AS BIGINT) AS k_groups,
      |    CAST(SUM(n * n) AS BIGINT) AS sn2,
      |    CAST(SUM(n * n * (2 * n + 3)) AS BIGINT) AS sn2t
      |  FROM (SELECT prio, CAST(SUM(cnt) AS BIGINT) AS n
      |        FROM byval GROUP BY 1) g),
      |out AS (
      |  SELECT s.nn AS n_total, s.k_groups, j.jt2,
      |    (s.nn * s.nn - s.sn2) // 2 AS e2,
      |    ROUND(CAST(j.jt2 - (s.nn * s.nn - s.sn2) // 2 AS DOUBLE) /
      |      (2 * SQRT((CAST(s.nn AS DOUBLE) * s.nn * (2 * s.nn + 3)
      |      - s.sn2t) / 72)), 4) AS z
      |  FROM jt j, sizes s)
      |SELECT n_total, k_groups, jt2, e2, z,
      |  CASE WHEN z >= 1.96 THEN 'increasing'
      |    WHEN z <= -1.96 THEN 'decreasing'
      |    ELSE 'no_trend' END AS verdict
      |FROM out""".stripMargin

  /** Q330 — Doksum shift function between every pair of event types at
    * the nine interior deciles (Doksum 1974; Doksum & Sievers 1976):
    * Δ(p) = q_b(p) − q_a(p), the quantile-by-quantile difference that
    * says WHERE two distributions differ — a uniform Δ means a pure
    * location shift, Δ growing with p means the difference lives in
    * the tail — where KS (Q139), W₁ (Q297), CvM (Q313) and energy
    * (Q311) each compress the comparison to one scalar.
    *
    * Determinism: each quantile is an exact LOWER order statistic on
    * the collapsed cents domain (smallest cents with cum ≥
    * ⌈p·n/100⌉ = (p·n+99) DIV 100 — pure integer arithmetic); every
    * output is an exact int; no floats anywhere.
    *
    * Scale notes: one corpus scan to (type, cents) cells, one
    * per-type cumulative window over the value-domain-bounded
    * relation, a 9-row broadcast decile spine, then a min-aggregate
    * and a (type, pct)-keyed self-join of the k·9-row quantile table.
    */
  def q330(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val byVal = c.events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(asc("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val cums = byVal
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val spine = byVal.sparkSession.range(1, 10)
      .select((col("id") * 10).cast("long").as("pct"))
    val quant = cums.crossJoin(broadcast(spine))
      .filter(col("cum") >= expr("(pct * n + 99) DIV 100"))
      .groupBy(col("event_type"), col("pct"))
      .agg(min(col("cents")).as("qv"))
      .localCheckpoint()
    quant.select(col("event_type").as("type_a"), col("pct"),
        col("qv").as("q_a"))
      .join(quant.select(col("event_type").as("type_b"),
        col("pct").as("pctb"), col("qv").as("q_b")),
        col("pct") === col("pctb") && col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"), col("pct"), col("q_a"),
        col("q_b"), (col("q_b") - col("q_a")).as("shift_cents"))
      .withColumn("verdict", expr("CASE WHEN shift_cents > 0 " +
        "THEN 'b_above' WHEN shift_cents < 0 THEN 'a_above' " +
        "ELSE 'equal' END"))
      .orderBy(asc_nulls_first("type_a"), asc_nulls_first("type_b"),
        asc("pct"))
  }

  val q330Oracle: String =
    """WITH byval AS (
      |  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |cums AS (
      |  SELECT event_type, cents,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM byval),
      |spine AS (SELECT CAST(UNNEST([10,20,30,40,50,60,70,80,90])
      |  AS BIGINT) AS pct),
      |quant AS (
      |  SELECT c.event_type, s.pct, CAST(MIN(c.cents) AS BIGINT) AS qv
      |  FROM cums c CROSS JOIN spine s
      |  WHERE c.cum >= (s.pct * c.n + 99) // 100
      |  GROUP BY 1, 2)
      |SELECT a.event_type AS type_a, b.event_type AS type_b, a.pct,
      |  a.qv AS q_a, b.qv AS q_b, b.qv - a.qv AS shift_cents,
      |  CASE WHEN b.qv - a.qv > 0 THEN 'b_above'
      |    WHEN b.qv - a.qv < 0 THEN 'a_above'
      |    ELSE 'equal' END AS verdict
      |FROM quant a JOIN quant b
      |  ON b.pct = a.pct AND a.event_type < b.event_type
      |ORDER BY type_a NULLS FIRST, type_b NULLS FIRST, a.pct""".stripMargin

  /** Q332 — Breusch–Pagan/Koenker heteroskedasticity test per event
    * type on the Q125/Q267 daily OLS (Breusch & Pagan 1979; Koenker
    * 1981's studentized form): regress the SQUARED residuals on the
    * day index and take BP = n·R²_aux against χ²₁. Answers the
    * question the trend fit's OTHER diagnostics don't — is the
    * residual VARIANCE drifting over time (fan-out)? — where Q267's DW
    * reads serial correlation of the residual LEVEL, Q282 its sign
    * runs, and Q248-era Levene compares variance across GROUPS.
    *
    * Determinism: residuals are the exact int64 n-scaled composites
    * (E_t = nd·v − an − n·bn·t, the Q267 carrier — R² is invariant to
    * the nd scale, so E² substitutes for e² exactly); the four
    * auxiliary moments are double sums of E²-products (E⁴ passes both
    * int64 and DECIMAL(38,0), the one documented double stage — engine
    * sum-order drift ~1e-13, inside round 4); BP is one fixed shape
    * and the verdict reads the rounded value.
    *
    * Scale notes: the Q125 plan — one daily aggregate, one five-sum
    * pass, one residual spine join per type; the auxiliary moments
    * add one more spine-bounded aggregate. Flat in corpus size past
    * the daily rollup.
    */
  def q332(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val grid = dailyCentsGrid(spark, c)
    val dmin = grid.agg(min(col("day")).as("dmin"))
    val base = grid.crossJoin(broadcast(dmin))
      .select(col("event_type"), (col("day") - col("dmin")).as("t"),
        col("v"))
    val sums = base.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("t")).cast("long").as("sx"),
        sum(col("v")).cast("long").as("sy"),
        sum(col("t") * col("t")).cast("long").as("sxx"),
        sum(col("t") * col("v")).cast("long").as("sxy"))
      .withColumn("d", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("bn", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("an", col("sy") * col("d") - col("bn") * col("sx"))
    val aux = base.join(sums, Seq("event_type"))
      .withColumn("e", col("n") * col("d") * col("v") - col("an") -
        col("n") * col("bn") * col("t"))
      .withColumn("u", col("e").cast("double") * col("e"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("sx")).as("st"),
        max(col("sxx")).as("stt"),
        sum(col("u")).as("su"), sum(col("u") * col("t")).as("sut"),
        sum(col("u") * col("u")).as("suu"))
    aux.select(col("event_type"), col("n").as("n_days"),
        expr("CASE WHEN (n * suu - su * su) > 0 " +
          "AND (n * stt - CAST(st AS DOUBLE) * st) > 0 THEN " +
          "ROUND(n * (n * sut - su * st) * (n * sut - su * st) / " +
          "((n * suu - su * su) * " +
          "(n * stt - CAST(st AS DOUBLE) * st)), 4) END").as("bp"))
      .withColumn("verdict", expr("CASE WHEN bp IS NULL " +
        "THEN 'degenerate' WHEN bp > 3.841 THEN 'heteroskedastic' " +
        "ELSE 'homoskedastic' END"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q332Oracle: String =
    s"""WITH $gridSql,
       |bnd AS (SELECT MIN(day) AS dmin FROM grid),
       |base AS (
       |  SELECT event_type, day - (SELECT dmin FROM bnd) AS t, v
       |  FROM grid),
       |sums AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(t) AS BIGINT) AS sx, CAST(SUM(v) AS BIGINT) AS sy,
       |    CAST(SUM(t * t) AS BIGINT) AS sxx,
       |    CAST(SUM(t * v) AS BIGINT) AS sxy
       |  FROM base GROUP BY 1),
       |comp AS (
       |  SELECT event_type, n, sx, sxx,
       |    n * sxx - sx * sx AS d,
       |    n * sxy - sx * sy AS bn,
       |    sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx AS an
       |  FROM sums),
       |aux AS (
       |  SELECT b.event_type, CAST(MAX(c.n) AS BIGINT) AS n,
       |    CAST(MAX(c.sx) AS BIGINT) AS st,
       |    CAST(MAX(c.sxx) AS BIGINT) AS stt,
       |    SUM(CAST(c.n * c.d * b.v - c.an - c.n * c.bn * b.t AS DOUBLE)
       |      * (c.n * c.d * b.v - c.an - c.n * c.bn * b.t)) AS su,
       |    SUM(CAST(c.n * c.d * b.v - c.an - c.n * c.bn * b.t AS DOUBLE)
       |      * (c.n * c.d * b.v - c.an - c.n * c.bn * b.t) * b.t) AS sut,
       |    SUM((CAST(c.n * c.d * b.v - c.an - c.n * c.bn * b.t AS DOUBLE)
       |      * (c.n * c.d * b.v - c.an - c.n * c.bn * b.t)) *
       |      (CAST(c.n * c.d * b.v - c.an - c.n * c.bn * b.t AS DOUBLE)
       |      * (c.n * c.d * b.v - c.an - c.n * c.bn * b.t))) AS suu
       |  FROM base b JOIN comp c ON c.event_type = b.event_type
       |  GROUP BY 1),
       |out AS (
       |  SELECT event_type, n AS n_days,
       |    CASE WHEN (n * suu - su * su) > 0
       |      AND (n * stt - CAST(st AS DOUBLE) * st) > 0 THEN
       |      ROUND(n * (n * sut - su * st) * (n * sut - su * st) /
       |      ((n * suu - su * su) *
       |      (n * stt - CAST(st AS DOUBLE) * st)), 4) END AS bp
       |  FROM aux)
       |SELECT event_type, n_days, bp,
       |  CASE WHEN bp IS NULL THEN 'degenerate'
       |    WHEN bp > 3.841 THEN 'heteroskedastic'
       |    ELSE 'homoskedastic' END AS verdict
       |FROM out
       |ORDER BY event_type NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q297" -> (q297 _), "Q301" -> (q301 _), "Q306" -> (q306 _),
    "Q308" -> (q308 _), "Q311" -> (q311 _), "Q312" -> (q312 _),
    "Q313" -> (q313 _), "Q314" -> (q314 _), "Q316" -> (q316 _),
    "Q326" -> (q326 _), "Q329" -> (q329 _), "Q330" -> (q330 _),
    "Q332" -> (q332 _),
    "Q137" -> (q137 _), "Q138" -> (q138 _), "Q139" -> (q139 _),
    "Q140" -> (q140 _), "Q146" -> (q146 _), "Q161" -> (q161 _),
    "Q163" -> (q163 _), "Q176" -> (q176 _), "Q184" -> (q184 _),
    "Q199" -> (q199 _), "Q204" -> (q204 _), "Q215" -> (q215 _),
    "Q227" -> (q227 _), "Q228" -> (q228 _), "Q229" -> (q229 _),
    "Q230" -> (q230 _), "Q231" -> (q231 _), "Q232" -> (q232 _),
    "Q236" -> (q236 _), "Q239" -> (q239 _), "Q240" -> (q240 _),
    "Q241" -> (q241 _), "Q242" -> (q242 _), "Q243" -> (q243 _),
    "Q244" -> (q244 _), "Q245" -> (q245 _), "Q252" -> (q252 _),
    "Q253" -> (q253 _), "Q254" -> (q254 _), "Q255" -> (q255 _),
    "Q256" -> (q256 _), "Q257" -> (q257 _), "Q263" -> (q263 _),
    "Q264" -> (q264 _), "Q267" -> (q267 _), "Q273" -> (q273 _))

  def oracles: Map[String, String] = Map(
    "Q297" -> q297Oracle, "Q301" -> q301Oracle, "Q306" -> q306Oracle,
    "Q308" -> q308Oracle, "Q311" -> q311Oracle, "Q312" -> q312Oracle,
    "Q313" -> q313Oracle, "Q314" -> q314Oracle, "Q316" -> q316Oracle,
    "Q326" -> q326Oracle, "Q329" -> q329Oracle, "Q330" -> q330Oracle,
    "Q332" -> q332Oracle,
    "Q137" -> q137Oracle, "Q138" -> q138Oracle, "Q139" -> q139Oracle,
    "Q140" -> q140Oracle, "Q146" -> q146Oracle, "Q161" -> q161Oracle,
    "Q163" -> q163Oracle, "Q176" -> q176Oracle, "Q184" -> q184Oracle,
    "Q199" -> q199Oracle, "Q204" -> q204Oracle, "Q215" -> q215Oracle,
    "Q227" -> q227Oracle, "Q228" -> q228Oracle, "Q229" -> q229Oracle,
    "Q230" -> q230Oracle, "Q231" -> q231Oracle, "Q232" -> q232Oracle,
    "Q236" -> q236Oracle, "Q239" -> q239Oracle, "Q240" -> q240Oracle,
    "Q241" -> q241Oracle, "Q242" -> q242Oracle, "Q243" -> q243Oracle,
    "Q244" -> q244Oracle, "Q245" -> q245Oracle, "Q252" -> q252Oracle,
    "Q253" -> q253Oracle, "Q254" -> q254Oracle, "Q255" -> q255Oracle,
    "Q256" -> q256Oracle, "Q257" -> q257Oracle, "Q263" -> q263Oracle,
    "Q264" -> q264Oracle, "Q267" -> q267Oracle, "Q273" -> q273Oracle)
}
