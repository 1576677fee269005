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
    *
    * ONE scan for the whole profile: all columns' measures compute in a
    * single aggregate whose row is then exploded to per-column rows — a
    * per-column unionByName would scan the table once per column, which
    * at a 100 TB × 50-column table is 50 corpus passes. (countDistinct
    * over several columns in one aggregate expands to an Expand-based
    * multi-distinct — still one scan.)
    */
  def profile(df: DataFrame, cols: Seq[(String, Boolean)]): DataFrame = {
    val measures = cols.flatMap { case (name, numeric) =>
      val (vmin, vmax): (Column, Column) =
        if (numeric)
          (round(min(col(name)).cast("double"), 4),
            round(max(col(name)).cast("double"), 4))
        else (lit(null).cast("double"), lit(null).cast("double"))
      Seq(
        count(lit(1)).minus(count(col(name))).as(s"${name}__nulls"),
        countDistinct(col(name)).as(s"${name}__distinct"),
        vmin.as(s"${name}__min"), vmax.as(s"${name}__max"))
    }
    df.agg(measures.head, measures.tail: _*)
      .select(explode(array(cols.map { case (name, _) =>
        struct(lit(name).as("col_name"),
          col(s"${name}__nulls").as("n_nulls"),
          col(s"${name}__distinct").as("n_distinct"),
          col(s"${name}__min").as("vmin"),
          col(s"${name}__max").as("vmax"))
      }: _*)).as("c"))
      .select(col("c.col_name"), col("c.n_nulls"), col("c.n_distinct"),
        col("c.vmin"), col("c.vmax"))
  }

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

  /** Q114 — IQR anomaly detection over each event type's daily-volume
    * series: discrete quartiles by rank-and-pick (PURE integer ranks —
    * value at row floor((cnt−1)·q)+1 of the (n, day)-sorted series, the
    * same shuffle-native discipline as Q54, no interpolation, no
    * buffering percentile state), Tukey fences at 1.5·IQR, days outside
    * the fences counted as anomalies.
    *
    * Scale notes: the window runs over the DAILY aggregate (bounded:
    * days × types rows), never raw events; one keyed sort + one hash
    * aggregate. The only floating-point op is the single fence
    * multiply-add on exact integers — bit-deterministic.
    */
  def q114(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    // referenced by the quartile ranking AND the fence join — checkpoint
    // so the daily aggregate runs once
    val daily = c.events
      .select(col("event_type"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val w = Window.partitionBy(col("event_type")).orderBy(asc("n"), asc("day"))
    val wAll = Window.partitionBy(col("event_type"))
    daily
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy(col("event_type"))
      .agg(
        max(col("cnt")).as("n_days"),
        max(when(col("rn") === expr("(cnt - 1) DIV 4 + 1"), col("n"))).as("q1"),
        max(when(col("rn") === expr("(3 * (cnt - 1)) DIV 4 + 1"), col("n"))).as("q3"))
      .withColumn("lo_fence", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi_fence", col("q3") + (col("q3") - col("q1")) * 1.5)
      .join(daily, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        max(col("n_days")).as("n_days"),
        max(col("q1")).as("q1"), max(col("q3")).as("q3"),
        count(when(col("n") < col("lo_fence") || col("n") > col("hi_fence"), 1))
          .as("n_anomaly_days"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q114Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |ranked AS (
      |  SELECT event_type, day, n,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n, day) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM daily),
      |quart AS (
      |  SELECT event_type, MAX(cnt) AS n_days,
      |    MAX(CASE WHEN rn = (cnt - 1) // 4 + 1 THEN n END) AS q1,
      |    MAX(CASE WHEN rn = (3 * (cnt - 1)) // 4 + 1 THEN n END) AS q3
      |  FROM ranked GROUP BY 1),
      |fenced AS (
      |  SELECT event_type, n_days, q1, q3,
      |    q1 - (q3 - q1) * 1.5 AS lo_fence,
      |    q3 + (q3 - q1) * 1.5 AS hi_fence
      |  FROM quart)
      |SELECT f.event_type AS event_type, MAX(f.n_days) AS n_days,
      |  MAX(f.q1) AS q1, MAX(f.q3) AS q3,
      |  COUNT(CASE WHEN d.n < f.lo_fence OR d.n > f.hi_fence THEN 1 END)
      |    AS n_anomaly_days
      |FROM fenced f JOIN daily d ON d.event_type = f.event_type
      |GROUP BY 1
      |ORDER BY f.event_type NULLS FIRST""".stripMargin

  /** Q115 — declarative data-quality constraint audit (the Deequ-style
    * expectation layer a pipeline gates a new data drop on): nullness,
    * value-range, referential-integrity (orphan keys), and key-uniqueness
    * checks, one row per check with its violation count.
    *
    * Scale notes: the value checks are conditional counts fused into one
    * scan per table (map-side combinable); the orphan check is a
    * left-anti join where the key side aggregates to distinct keys
    * first; uniqueness is a keyed count filtered >1. Nothing driver-side;
    * each check row is an O(1) result of a distributed aggregate.
    */
  def q115(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val li = c.lineitem
    val liChecks = li.agg(
      count(lit(1)).as("n_checked"),
      count(when(col("l_quantity") <= 0, 1)).as("v_qty"),
      count(when(col("l_discount") < 0 || col("l_discount") > 1, 1)).as("v_disc"),
      count(when(col("l_shipdate") < to_timestamp(lit("1992-01-01")) ||
        col("l_shipdate") >= to_timestamp(lit("2002-01-01")), 1)).as("v_date"),
      count(when(col("l_extendedprice") <= 0, 1)).as("v_price"))
    val orphans = li.join(c.orders.select(col("o_orderkey").as("l_orderkey")).distinct(),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    val dupKeys = c.orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("k"))
      .filter(col("k") > 1).agg(count(lit(1)).as("n_dup"))
    val nullCust = c.orders.agg(
      count(lit(1)).as("n_orders"),
      count(lit(1)).minus(count(col("o_custkey"))).as("n_null"))
    // ONE row-generating explode over the single joined one-row relation:
    // a unionByName of per-check selects would duplicate the whole
    // aggregate subtree once per check (7× the scans and exchanges).
    def cell(name: String, viol: Column, checked: Column) =
      struct(lit(name).as("check_name"), viol.as("n_violations"),
        checked.as("n_checked"))
    liChecks.crossJoin(orphans).crossJoin(dupKeys).crossJoin(nullCust)
      .select(explode(array(
        cell("lineitem.l_quantity_positive", col("v_qty"), col("n_checked")),
        cell("lineitem.l_discount_in_unit_range", col("v_disc"), col("n_checked")),
        cell("lineitem.l_shipdate_in_domain", col("v_date"), col("n_checked")),
        cell("lineitem.l_extendedprice_positive", col("v_price"), col("n_checked")),
        cell("lineitem.orderkey_ref_integrity", col("n_orphans"), col("n_checked")),
        cell("orders.o_orderkey_unique", col("n_dup"), col("n_orders")),
        cell("orders.o_custkey_not_null", col("n_null"), col("n_orders")))).as("c"))
      .select(col("c.check_name"), col("c.n_violations"), col("c.n_checked"))
      .withColumn("passed", (col("n_violations") === 0).cast("int"))
      .orderBy(asc_nulls_first("check_name"))
  }

  val q115Oracle: String =
    """WITH li AS (
      |  SELECT COUNT(*) AS n_checked,
      |    COUNT(CASE WHEN l_quantity <= 0 THEN 1 END) AS v_qty,
      |    COUNT(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) AS v_disc,
      |    COUNT(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01' OR
      |      l_shipdate >= TIMESTAMP '2002-01-01' THEN 1 END) AS v_date,
      |    COUNT(CASE WHEN l_extendedprice <= 0 THEN 1 END) AS v_price
      |  FROM lineitem),
      |orph AS (
      |  SELECT COUNT(*) AS n_orphans FROM lineitem
      |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
      |dup AS (
      |  SELECT COUNT(*) AS n_dup FROM (
      |    SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)),
      |oc AS (
      |  SELECT COUNT(*) AS n_orders,
      |    COUNT(*) - COUNT(o_custkey) AS n_null
      |  FROM orders),
      |rows_out AS (
      |  SELECT 'lineitem.l_quantity_positive' AS check_name,
      |    v_qty AS n_violations, n_checked FROM li
      |  UNION ALL SELECT 'lineitem.l_discount_in_unit_range', v_disc, n_checked FROM li
      |  UNION ALL SELECT 'lineitem.l_shipdate_in_domain', v_date, n_checked FROM li
      |  UNION ALL SELECT 'lineitem.l_extendedprice_positive', v_price, n_checked FROM li
      |  UNION ALL SELECT 'lineitem.orderkey_ref_integrity', n_orphans,
      |    (SELECT n_checked FROM li) FROM orph
      |  UNION ALL SELECT 'orders.o_orderkey_unique', n_dup,
      |    (SELECT n_orders FROM oc) FROM dup
      |  UNION ALL SELECT 'orders.o_custkey_not_null', n_null, n_orders FROM oc)
      |SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
      |  CAST(n_checked AS BIGINT) AS n_checked,
      |  CAST(n_violations = 0 AS INT) AS passed
      |FROM rows_out
      |ORDER BY check_name NULLS FIRST""".stripMargin

  /** Q116 — categorical dependence profile between two columns: the
    * contingency table's mutual information (nats), chi-square statistic,
    * degrees of freedom, and Cramér's V. The feature-redundancy /
    * independence-test measure a profiling pass computes before feature
    * selection (complements Q62's numeric corr family and Q108's
    * interval arithmetic).
    *
    * Scale notes: one hash aggregate to the contingency table (cells ≤
    * |dom(a)|·|dom(b)| — bounded), margins re-aggregated from the CELLS,
    * not the data, and the statistics are a fold over cells. The corpus
    * is scanned exactly once. Cell-level terms involve log/÷ of exact
    * counts; the ≤ r·c-term sums land inside round(4), which absorbs
    * libm last-ulp and summation-order differences.
    */
  def q116(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    // referenced four times (margins ×2, totals, the stats join) —
    // checkpoint so the corpus aggregates once
    val cells = c.lineitem
      .groupBy(col("l_returnflag").as("a"), col("l_linestatus").as("b"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint()
    val ma = cells.groupBy(col("a")).agg(sum(col("o")).as("na"))
    val mb = cells.groupBy(col("b")).agg(sum(col("o")).as("nb"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("ra"), countDistinct(col("b")).as("rb"))
    cells
      .join(broadcast(ma), Seq("a")).join(broadcast(mb), Seq("b"))
      .crossJoin(broadcast(tot))
      .withColumn("p", col("o") / col("n"))
      .withColumn("e", col("na") * col("nb") / col("n").cast("double"))
      .agg(
        max(col("n")).as("n"),
        round(sum(col("p") * log(col("p") / ((col("na") / col("n")) * (col("nb") / col("n"))))), 4)
          .as("mi_nats"),
        round(sum(pow(col("o") - col("e"), 2) / col("e")), 4).as("chi2"),
        max((col("ra") - 1) * (col("rb") - 1)).as("dof"),
        round(sqrt(
          sum(pow(col("o") - col("e"), 2) / col("e")) /
            (max(col("n")) * least(max(col("ra")) - 1, max(col("rb")) - 1))), 4)
          .as("cramers_v"))
  }

  val q116Oracle: String =
    """WITH cells AS (
      |  SELECT l_returnflag AS a, l_linestatus AS b, COUNT(*) AS o
      |  FROM lineitem GROUP BY 1, 2),
      |ma AS (SELECT a, SUM(o) AS na FROM cells GROUP BY 1),
      |mb AS (SELECT b, SUM(o) AS nb FROM cells GROUP BY 1),
      |tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT a) AS ra,
      |  COUNT(DISTINCT b) AS rb FROM cells),
      |j AS (
      |  SELECT c.o, c.o / t.n AS p,
      |    ma.na * mb.nb / CAST(t.n AS DOUBLE) AS e,
      |    ma.na / t.n AS pa, mb.nb / t.n AS pb,
      |    t.n, t.ra, t.rb
      |  FROM cells c
      |  JOIN ma ON ma.a = c.a
      |  JOIN mb ON mb.b = c.b
      |  CROSS JOIN tot t)
      |SELECT CAST(MAX(n) AS BIGINT) AS n,
      |  ROUND(SUM(p * LN(p / (pa * pb))), 4) AS mi_nats,
      |  ROUND(SUM(POWER(o - e, 2) / e), 4) AS chi2,
      |  CAST(MAX((ra - 1) * (rb - 1)) AS BIGINT) AS dof,
      |  ROUND(SQRT(SUM(POWER(o - e, 2) / e) /
      |    (MAX(n) * LEAST(MAX(ra) - 1, MAX(rb) - 1))), 4) AS cramers_v
      |FROM j""".stripMargin

  /** Q127 — Gini concentration of customer revenue per market segment:
    * how unequal is spend across a segment's customers? Revenue is
    * fixed to exact integer CENTS at the ROW level (one IEEE
    * multiply+round per order — identical both engines), so the
    * per-customer sums, the rank weights, and the Gini numerator
    * Σ(2i−n−1)·x (x ascending) are all exact integer arithmetic; the
    * weighted sum accumulates in DECIMAL(38,0) because rank·cents
    * overflows int64 at warehouse row counts. Ties in x make the
    * weighted sum permutation-invariant within the tie group, so no
    * tiebreak is needed for determinism (one is used anyway). The only
    * float is the single final divide.
    *
    * Scale notes: orders pre-aggregate to one row per customer BEFORE
    * the segment join (shrinks the join input by the order fan-out);
    * the rank is one window sort per segment — Gini fundamentally
    * needs a per-group sort, and this does exactly one, over the
    * already-aggregated per-customer rows, not raw orders.
    */
  def q127(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val rev = c.orders
      .select(col("o_custkey"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("order_cents"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("order_cents")).as("cents"))
      .join(c.customer.select(col("c_custkey"), col("c_mktsegment").as("seg")),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("seg")).orderBy(asc("cents"), asc("c_custkey"))
    val wAll = Window.partitionBy(col("seg"))
    rev
      .withColumn("i", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("seg"))
      .agg(max(col("n")).as("n_customers"),
        sum(col("cents")).as("total_cents"),
        sum((col("i") * 2L - col("n") - 1L).cast(dec) * col("cents").cast(dec))
          .as("num"))
      .select(col("seg"), col("n_customers"), col("total_cents"),
        round(col("num").cast("double") /
          (col("n_customers").cast(dec) * col("total_cents").cast(dec))
            .cast("double"), 6).as("gini"))
      .orderBy(asc_nulls_first("seg"))
  }

  val q127Oracle: String =
    """WITH rev AS (
      |  SELECT c.c_mktsegment AS seg, c.c_custkey,
      |    SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS cents
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |rk AS (
      |  SELECT seg, cents,
      |    ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, c_custkey) AS i,
      |    COUNT(*) OVER (PARTITION BY seg) AS n
      |  FROM rev)
      |SELECT seg, MAX(n) AS n_customers,
      |  CAST(SUM(cents) AS BIGINT) AS total_cents,
      |  ROUND(CAST(SUM(CAST(2*i - n - 1 AS DECIMAL(38,0))
      |                 * CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
      |    / CAST(CAST(MAX(n) AS DECIMAL(38,0))
      |           * CAST(SUM(cents) AS DECIMAL(38,0)) AS DOUBLE), 6) AS gini
      |FROM rk GROUP BY seg
      |ORDER BY seg NULLS FIRST""".stripMargin

  /** Q129 — third-order behavior paths: the full trigram distribution
    * of consecutive event-type triples per user, extending Q79's
    * first-order Markov matrix to the sequence-mining shape (a
    * PrefixSpan-style length-3 pattern count with a window instead of
    * projected databases). Ordering is (event time, event_id) — the
    * same total order Q79 declares — so the gate is exact-count
    * deterministic.
    *
    * Scale notes: one user-partitioned window pass (two leads share
    * one sort) + one bounded |types|³ aggregate, map-side combined.
    * No self-join: the window turns the quadratic "pairs of pairs"
    * formulation into a linear scan per user.
    */
  def q129(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(asc("us"), asc("event_id"))
    c.events
      .select(col("user_id"), col("event_id"), col("event_type").as("t1"),
        expr("ts DIV 1000").as("us"))
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("t1"), asc_nulls_first("t2"),
        asc_nulls_first("t3"))
  }

  val q129Oracle: String =
    """WITH seq AS (
      |  SELECT event_type AS t1,
      |    LEAD(event_type, 1) OVER w AS t2,
      |    LEAD(event_type, 2) OVER w AS t3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      |SELECT t1, t2, t3, COUNT(*) AS n
      |FROM seq WHERE t3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY t1 NULLS FIRST, t2 NULLS FIRST, t3 NULLS FIRST""".stripMargin

  /** Q133 — MAD (median-absolute-deviation) robust anomaly days per
    * event type, the 50%-breakdown sibling of Q114's IQR fences (Hampel
    * 1974): med = median(daily n), mad = median(|n − med|), and a day is
    * anomalous when |n − med| > 3·mad. Every number stays EXACT in IEEE
    * doubles — counts are int64, each median is rank-and-pick averaging
    * at most two integers (dyadic halves), deviations are dyadic
    * (|int − x.5|), the second median quarters, and 3·mad is an exact
    * small-dyadic product — so engine and oracle agree bitwise with no
    * rounding step, and the deviation sort order (dev, day) is the same
    * total order in both engines.
    *
    * Scale notes: the Q114 shape — both medians rank over the
    * DAY-bounded per-type grid (types × days rows), never raw events;
    * the raw table is touched once by the daily aggregate. Two window
    * sorts (values, then deviations) is the irreducible cost of a
    * nested-median statistic; each reuses the same event_type hash
    * partitioning. The MAD=0 degenerate case (>50% of days identical)
    * flags any deviating day, which is the documented Hampel behavior,
    * not a division hazard — no divide exists here.
    */
  def q133(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"), expr("ts DIV 1000 DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val wN = Window.partitionBy(col("event_type")).orderBy(asc("n"), asc("day"))
    val wAll = Window.partitionBy(col("event_type"))
    val med = daily
      .withColumn("rn", row_number().over(wN))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(col("cnt")).as("n_days"),
        avg(when(col("rn") === expr("(cnt + 1) DIV 2") ||
          col("rn") === expr("(cnt + 2) DIV 2"), col("n"))).as("med"))
    val dev = daily.join(med, Seq("event_type"))
      .withColumn("dev", abs(col("n") - col("med")))
      .localCheckpoint()
    val wD = Window.partitionBy(col("event_type")).orderBy(asc("dev"), asc("day"))
    val mad = dev
      .withColumn("rn", row_number().over(wD))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy(col("event_type"))
      .agg(avg(when(col("rn") === expr("(cnt + 1) DIV 2") ||
        col("rn") === expr("(cnt + 2) DIV 2"), col("dev"))).as("mad"))
    dev.join(mad, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n_days")).as("n_days"),
        max(col("med")).as("med"), max(col("mad")).as("mad"),
        count(when(col("dev") > lit(3d) * col("mad"), 1))
          .as("n_anomaly_days"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q133Oracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |rkn AS (
      |  SELECT event_type, day, n,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n, day) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM daily),
      |med AS (
      |  SELECT event_type, MAX(cnt) AS n_days,
      |    AVG(CASE WHEN rn IN ((cnt + 1) // 2, (cnt + 2) // 2) THEN n END)
      |      AS med
      |  FROM rkn GROUP BY 1),
      |dev AS (
      |  SELECT d.event_type, d.day, ABS(d.n - m.med) AS dev,
      |    m.n_days, m.med
      |  FROM daily d JOIN med m ON m.event_type = d.event_type),
      |rkd AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, day) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM dev),
      |mad AS (
      |  SELECT event_type,
      |    AVG(CASE WHEN rn IN ((cnt + 1) // 2, (cnt + 2) // 2) THEN dev END)
      |      AS mad
      |  FROM rkd GROUP BY 1)
      |SELECT d.event_type, MAX(d.n_days) AS n_days,
      |  MAX(d.med) AS med, MAX(m.mad) AS mad,
      |  COUNT(CASE WHEN d.dev > 3 * m.mad THEN 1 END) AS n_anomaly_days
      |FROM dev d JOIN mad m ON m.event_type = d.event_type
      |GROUP BY 1
      |ORDER BY d.event_type NULLS FIRST""".stripMargin

  /** Q151 — join-key skew profile: the distribution of per-key row counts
    * for `lineitem.l_orderkey`, the diagnostic an engine consults BEFORE
    * choosing a shuffle-join strategy (a benign p99/p50 says hash-join
    * plainly; a hot max_cnt / top10_share says salt the build side or
    * let AQE split the skewed partition). One row out: key count, total
    * rows, max per-key count, interpolated p50/p99 of the count
    * distribution, and the row share of the 10 hottest keys.
    *
    * Exactness: counts are integers; the only float ops are the
    * interpolated percentiles (identical lower+frac·(upper−lower)
    * arithmetic in Spark `percentile` and DuckDB `QUANTILE_CONT`) and the
    * final share divide. Scale notes: per-key counts partial-aggregate
    * map-side; Spark's exact percentile buffers value→count pairs, and
    * DISTINCT per-key counts are bounded by the max fan-out (7 here, low
    * hundreds in any real key distribution), so aggregation state stays
    * tiny no matter how many keys exist; the top-10 is a TakeOrdered
    * (per-partition heads + driver merge), never a global sort.
    */
  def q151(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val cnts = c.lineitem
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("cnt"))
    val agg = cnts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_cnt"),
      expr("percentile(cnt, 0.5D)").as("p50"),
      expr("percentile(cnt, 0.99D)").as("p99"))
    val top10 = cnts
      .orderBy(desc("cnt"), asc("l_orderkey")).limit(10)
      .agg(sum(col("cnt")).as("top10_rows"))
    agg.crossJoin(broadcast(top10))
      .select(col("n_keys"), col("total_rows"), col("max_cnt"),
        round(col("p50"), 4).as("p50_cnt"),
        round(col("p99"), 4).as("p99_cnt"),
        col("top10_rows"),
        round(col("top10_rows").cast("double") / col("total_rows"), 6)
          .as("top10_share"))
  }

  val q151Oracle: String =
    """WITH cnts AS (
      |  SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
      |top10 AS (
      |  SELECT CAST(SUM(cnt) AS BIGINT) AS top10_rows FROM (
      |    SELECT cnt FROM cnts ORDER BY cnt DESC, l_orderkey LIMIT 10)),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
      |    CAST(SUM(cnt) AS BIGINT) AS total_rows,
      |    CAST(MAX(cnt) AS BIGINT) AS max_cnt,
      |    ROUND(QUANTILE_CONT(cnt, 0.5), 4) AS p50_cnt,
      |    ROUND(QUANTILE_CONT(cnt, 0.99), 4) AS p99_cnt
      |  FROM cnts)
      |SELECT a.n_keys, a.total_rows, a.max_cnt, a.p50_cnt, a.p99_cnt,
      |  t.top10_rows,
      |  ROUND(CAST(t.top10_rows AS DOUBLE) / a.total_rows, 6) AS top10_share
      |FROM agg a, top10 t""".stripMargin

  /** Q159 — Benford first-significant-digit audit of order totals per
    * priority class (Benford 1938; the classic forensic data-quality
    * screen — synthetic or tampered monetary columns diverge from the
    * log₁₀(1+1/d) law, organic ones don't). Emits each digit's observed
    * count and frequency, the Benford expectation, and the per-class
    * Pearson χ² distance so one scan flags the suspicious class.
    *
    * Determinism: the digit is extracted via EXACT integer cents
    * (floor(x·100) — same doubles, same IEEE multiply and floor in both
    * engines) rendered to a string, never via log10-of-double whose ULP
    * at a power-of-10 boundary could flip floor across engines. The χ²
    * sum has 9 terms — far below rounding sensitivity.
    *
    * Scale notes: one map pass + a (priority × digit ≤ 45)-key
    * aggregate; the χ² rollup is a window over those 45 rows. Nothing
    * else shuffles at any corpus size.
    */
  def q159(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val d = c.orders.select(col("o_orderpriority").as("priority"),
      substring(floor(col("o_totalprice") * 100).cast("long").cast("string"),
        1, 1).cast("int").as("digit"))
    val wAll = Window.partitionBy(col("priority"))
    d.groupBy(col("priority"), col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("tot", sum(col("n")).over(wAll))
      .withColumn("obs_f", col("n") / col("tot"))
      .withColumn("exp_f", log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))
      // (x)*(x), not pow(x, 2): Math.pow is not guaranteed bit-equal to
      // the plain IEEE multiply DuckDB's * performs
      .withColumn("chi2", sum(col("tot") * (col("obs_f") - col("exp_f"))
        * (col("obs_f") - col("exp_f")) / col("exp_f")).over(wAll))
      .select(col("priority"), col("digit"), col("n"),
        round(col("obs_f"), 4).as("obs_f"), round(col("exp_f"), 4).as("exp_f"),
        round(col("chi2"), 4).as("chi2"))
      .orderBy(asc_nulls_first("priority"), asc("digit"))
  }

  val q159Oracle: String =
    """WITH d AS (
      |  SELECT o_orderpriority AS priority,
      |    CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS INT) AS digit
      |  FROM orders),
      |agg AS (
      |  SELECT priority, digit, COUNT(*) AS n FROM d GROUP BY 1, 2),
      |w AS (
      |  SELECT priority, digit, n,
      |    CAST(SUM(n) OVER (PARTITION BY priority) AS BIGINT) AS tot,
      |    n / CAST(SUM(n) OVER (PARTITION BY priority) AS BIGINT) AS obs_f,
      |    ln(1.0 + 1.0 / digit) / ln(10.0) AS exp_f
      |  FROM agg)
      |SELECT priority, digit, n, ROUND(obs_f, 4) AS obs_f,
      |  ROUND(exp_f, 4) AS exp_f,
      |  ROUND(SUM(tot * (obs_f - exp_f) * (obs_f - exp_f) / exp_f)
      |    OVER (PARTITION BY priority), 4) AS chi2
      |FROM w
      |ORDER BY priority NULLS FIRST, digit""".stripMargin

  /** Q174 — decile gains table of customer revenue (the lift/gains
    * analysis behind "top decile drives X% of revenue"): customers
    * ranked by exact-cent revenue into NTILE(10) deciles, per-decile
    * revenue share and cumulative share. The actionable companion to
    * Q127's single-number Gini: the same concentration, read as a
    * curve. Revenue is exact integer cents (Q127 row-level fix);
    * shares are two final float divides rounded to 4.
    *
    * Scale notes: one order-keyed aggregate to per-customer cents, one
    * rank window over the customer relation, a 10-row rollup + a
    * 10-row cumulative window. At 100 TB the NTILE boundary comes from
    * the C15 quantile-sketch path exactly as Q104's scaladoc lays out;
    * the decile rollup itself is map-side combinable.
    */
  def q174(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val rev = c.orders
      .select(col("o_custkey").as("cust"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy(col("cust")).agg(sum(col("cents")).as("cents"))
    val wDec = Window.orderBy(desc("cents"), asc("cust"))
    val wCum = Window.orderBy(asc("decile")).rowsBetween(Long.MinValue, 0)
    val tot = rev.agg(sum(col("cents")).as("t"))
    rev.withColumn("decile", ntile(10).over(wDec))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("revenue_cents"))
      .crossJoin(tot)
      .withColumn("revenue_share",
        round(col("revenue_cents").cast("double") / col("t"), 4))
      .withColumn("cum_share",
        round(sum(col("revenue_cents")).over(wCum).cast("double") /
          col("t"), 4))
      .select(col("decile"), col("n_customers"), col("revenue_cents"),
        col("revenue_share"), col("cum_share"))
      .orderBy(asc("decile"))
  }

  val q174Oracle: String =
    """WITH rev AS (
      |  SELECT o_custkey AS cust,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |dec AS (
      |  SELECT cust, cents,
      |    NTILE(10) OVER (ORDER BY cents DESC, cust) AS decile FROM rev),
      |tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev)
      |SELECT decile,
      |  CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(cents) AS BIGINT) AS revenue_cents,
      |  ROUND(CAST(SUM(cents) AS DOUBLE) / (SELECT t FROM tot), 4)
      |    AS revenue_share,
      |  ROUND(CAST(SUM(SUM(cents)) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / (SELECT t FROM tot), 4) AS cum_share
      |FROM dec
      |GROUP BY decile ORDER BY decile""".stripMargin

  /** Q214 — Benford first-digit audit of `l_extendedprice`: the
    * classic fabricated-data / unit-mixing tripwire a data-quality
    * review runs on any money column spanning several orders of
    * magnitude. Per leading digit d∈1..9 of the exact cents value:
    * observed count and share, the Benford expectation
    * log₁₀(1 + 1/d), and the digit's χ² contribution
    * (n_d − N·p_d)²/(N·p_d); the final row order is the digit, so the
    * 9-row table IS the audit report (Σ chi2_term vs χ²₈ = 15.51 is
    * the eyeball test). Q159 runs the same law per ORDER-PRIORITY
    * class on o_totalprice (the which-class-is-tampered screen); this
    * is the corpus-level lineitem audit with per-digit χ² terms
    * exposed for the whole-table verdict.
    *
    * Determinism: the digit comes from the decimal string of an exact
    * int64 (cents ≥ 100 for every TPC-H price, so the first character
    * is the first significant digit); shares and χ² terms are final
    * ROUND-6 doubles of integer-derived quantities.
    *
    * Scale: one map pass + a 9-key hash aggregate; the expectation
    * join is a broadcast of a 9-row literal table. Any corpus size.
    */
  def q214(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val digits = c.lineitem
      .select(substring(round(col("l_extendedprice") * 100).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    digits
      .crossJoin(broadcast(digits.agg(sum(col("n")).cast("long").as("total"))))
      .withColumn("exp_share",
        round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6))
      .withColumn("obs_share",
        round(col("n").cast("double") / col("total"), 6))
      .withColumn("chi2_term", round(
        pow(col("n").cast("double")
          - col("total") * log(10.0, lit(1.0) + lit(1.0) / col("digit")),
          2.0)
          / (col("total") * log(10.0, lit(1.0) + lit(1.0) / col("digit"))),
        6))
      .select(col("digit"), col("n"), col("obs_share"), col("exp_share"),
        col("chi2_term"))
      .orderBy(col("digit"))
  }

  val q214Oracle: String =
    """WITH d AS (
      |  SELECT CAST(substring(CAST(CAST(ROUND(l_extendedprice * 100, 0)
      |    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit, COUNT(*) AS n
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM d)
      |SELECT digit, n,
      |  ROUND(CAST(n AS DOUBLE) / total, 6) AS obs_share,
      |  ROUND(LOG10(1 + 1.0 / digit), 6) AS exp_share,
      |  ROUND(POW(CAST(n AS DOUBLE) - total * LOG10(1 + 1.0 / digit), 2)
      |    / (total * LOG10(1 + 1.0 / digit)), 6) AS chi2_term
      |FROM d CROSS JOIN t
      |ORDER BY digit""".stripMargin

  /** Q223 — ABC/XYZ inventory classification of parts: ABC by
    * cumulative revenue concentration (A = parts inside the first 80%
    * of revenue on the (revenue desc, partkey) order, B to 95%, C the
    * tail) crossed with XYZ by demand variability (coefficient of
    * variation of weekly shipped quantity over the part's observed
    * weeks: X ≤ 0.5 steady, Y ≤ 1.0, Z erratic) — the 9-cell planning
    * matrix (Dickie 1951's ABC analysis × the standard XYZ extension)
    * every supply/ops review runs.
    *
    * Determinism: ABC thresholds compare EXACT integers (cum·5 ≤
    * tot·4 and cum·20 ≤ tot·19 — no double shares anywhere near the
    * boundary); weekly quantities are exact int64, CV's one
    * sqrt/divide is the only double, and the X/Y/Z cuts sit far from
    * any attainable CV at 4-decimal resolution.
    *
    * Scale notes: one lineitem scan to (part, week) demand + one to
    * part revenue; the ABC window is a single range-partitioned sort
    * of the PART table (not lineitem); output is 9 cells.
    */
  def q223(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val li = c.lineitem.select(col("l_partkey"),
      expr("datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') DIV 7")
        .as("week"),
      col("l_quantity").cast("long").as("qty"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val weekly = li.groupBy(col("l_partkey"), col("week"))
      .agg(sum(col("qty")).cast("long").as("q"))
    val perPart = weekly.groupBy(col("l_partkey")).agg(
        count(lit(1)).as("n_weeks"),
        sum(col("q")).cast("long").as("sq"),
        sum(col("q") * col("q")).cast("long").as("sqq"))
      .join(li.groupBy(col("l_partkey"))
        .agg(sum(col("cents")).cast("long").as("rev")), Seq("l_partkey"))
    val wCum = Window.orderBy(desc("rev"), asc("l_partkey"))
    val classed = perPart
      .withColumn("cum", sum(col("rev")).over(wCum))
      .crossJoin(broadcast(perPart.agg(sum(col("rev")).cast("long").as("tot"))))
      .withColumn("abc_class",
        when(col("cum") * 5L <= col("tot") * 4L, "A")
          .when(col("cum") * 20L <= col("tot") * 19L, "B").otherwise("C"))
      .withColumn("cv",
        sqrt((col("sqq").cast("double")
          - col("sq").cast("double") * col("sq") / col("n_weeks"))
          / col("n_weeks"))
          / (col("sq").cast("double") / col("n_weeks")))
      .withColumn("xyz_class",
        when(col("cv") <= 0.5, "X").when(col("cv") <= 1.0, "Y").otherwise("Z"))
    classed.groupBy(col("abc_class"), col("xyz_class")).agg(
        count(lit(1)).as("n_parts"),
        round(sum(col("rev")).cast("double") / max(col("tot")), 6)
          .as("rev_share"),
        round(avg(col("cv")), 4).as("avg_cv"))
      .orderBy(col("abc_class"), col("xyz_class"))
  }

  val q223Oracle: String =
    """WITH li AS (
      |  SELECT l_partkey,
      |    (CAST(l_shipdate AS DATE) - DATE '1970-01-01') // 7 AS week,
      |    CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
      |  FROM lineitem),
      |weekly AS (
      |  SELECT l_partkey, week, CAST(SUM(qty) AS BIGINT) AS q
      |  FROM li GROUP BY 1, 2),
      |per_part AS (
      |  SELECT w.l_partkey, w.n_weeks, w.sq, w.sqq, r.rev FROM
      |    (SELECT l_partkey, COUNT(*) AS n_weeks,
      |       CAST(SUM(q) AS BIGINT) AS sq,
      |       CAST(SUM(q * q) AS BIGINT) AS sqq
      |     FROM weekly GROUP BY 1) w
      |  JOIN (SELECT l_partkey, CAST(SUM(cents) AS BIGINT) AS rev
      |        FROM li GROUP BY 1) r ON w.l_partkey = r.l_partkey),
      |tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS tot FROM per_part),
      |classed AS (
      |  SELECT l_partkey, rev, n_weeks, sq, sqq, tot,
      |    CASE WHEN SUM(rev) OVER (ORDER BY rev DESC, l_partkey) * 5
      |        <= tot * 4 THEN 'A'
      |      WHEN SUM(rev) OVER (ORDER BY rev DESC, l_partkey) * 20
      |        <= tot * 19 THEN 'B'
      |      ELSE 'C' END AS abc_class,
      |    SQRT((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n_weeks)
      |        / n_weeks)
      |      / (CAST(sq AS DOUBLE) / n_weeks) AS cv
      |  FROM per_part CROSS JOIN tot),
      |labeled AS (
      |  SELECT *, CASE WHEN cv <= 0.5 THEN 'X'
      |    WHEN cv <= 1.0 THEN 'Y' ELSE 'Z' END AS xyz_class
      |  FROM classed)
      |SELECT abc_class, xyz_class, COUNT(*) AS n_parts,
      |  ROUND(CAST(SUM(rev) AS DOUBLE) / MAX(tot), 6) AS rev_share,
      |  ROUND(AVG(cv), 4) AS avg_cv
      |FROM labeled
      |GROUP BY 1, 2
      |ORDER BY abc_class, xyz_class""".stripMargin

  /** Q226 — shuffle-key skew profile: for each of the engine's three
    * hottest join/aggregation keys (orders.o_custkey,
    * lineitem.l_partkey, events.user_id), the per-key frequency
    * distribution summarized as the salting diagnostic — row/key
    * counts, the hottest key's absolute frequency and share of all
    * rows, discrete p50/p99 frequencies (rank-and-pick on the fully
    * tie-broken (freq, key) order, Q114's shuffle-native discipline),
    * and the p99/p50 skew ratio. This is the report that DECIDES the
    * 100 TB plan questions this codebase answers ad hoc (salt Q103's
    * hubs? AQE skew join on user_id?): a top_share near 1/n_keys and
    * skew_ratio near 1 says hash partitioning is safe; a fat top_share
    * says salt or isolate.
    *
    * Determinism: everything is exact int64 counts and ranks; the two
    * shares are final ROUND-6/ROUND-2 divides.
    *
    * Scale: one hash aggregate per relation (the same shuffle the
    * audited joins themselves pay), then rank-and-pick over the KEY
    * table. Output: 3 rows.
    */
  def q226(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    def profileKey(df: DataFrame, key: String, name: String): DataFrame = {
      val cnt = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("freq"))
      val w = Window.orderBy(asc("freq"), asc("k"))
      val wAll = Window.partitionBy()
      cnt
        .withColumn("rn", row_number().over(w))
        .withColumn("nk", count(lit(1)).over(wAll))
        .agg(
          sum(col("freq")).cast("long").as("n_rows"),
          max(col("nk")).as("n_keys"),
          max(col("freq")).as("max_freq"),
          max(when(col("rn") === expr("(nk - 1) DIV 2 + 1"), col("freq")))
            .as("p50_freq"),
          max(when(col("rn") === expr("(99 * (nk - 1)) DIV 100 + 1"),
            col("freq"))).as("p99_freq"))
        .select(lit(name).as("rel_key"), col("n_rows"), col("n_keys"),
          col("max_freq"),
          round(col("max_freq").cast("double") / col("n_rows"), 6)
            .as("top_share"),
          col("p50_freq"), col("p99_freq"),
          round(col("p99_freq").cast("double") / col("p50_freq"), 2)
            .as("skew_ratio"))
    }
    profileKey(c.orders, "o_custkey", "orders.o_custkey")
      .unionAll(profileKey(c.lineitem, "l_partkey", "lineitem.l_partkey"))
      .unionAll(profileKey(c.events, "user_id", "events.user_id"))
      .orderBy(asc_nulls_first("rel_key"))
  }

  val q226Oracle: String = {
    def one(tbl: String, key: String, name: String): String =
      s"""  SELECT '$name' AS rel_key,
         |    CAST(SUM(freq) AS BIGINT) AS n_rows, MAX(nk) AS n_keys,
         |    MAX(freq) AS max_freq,
         |    ROUND(CAST(MAX(freq) AS DOUBLE) / SUM(freq), 6) AS top_share,
         |    MAX(CASE WHEN rn = (nk - 1) // 2 + 1 THEN freq END) AS p50_freq,
         |    MAX(CASE WHEN rn = (99 * (nk - 1)) // 100 + 1 THEN freq END)
         |      AS p99_freq,
         |    ROUND(CAST(MAX(CASE WHEN rn = (99 * (nk - 1)) // 100 + 1
         |        THEN freq END) AS DOUBLE)
         |      / MAX(CASE WHEN rn = (nk - 1) // 2 + 1 THEN freq END), 2)
         |      AS skew_ratio
         |  FROM (
         |    SELECT freq, k,
         |      ROW_NUMBER() OVER (ORDER BY freq, k) AS rn,
         |      COUNT(*) OVER () AS nk
         |    FROM (SELECT $key AS k, COUNT(*) AS freq FROM $tbl GROUP BY 1))""".stripMargin
    s"""SELECT * FROM (
       |${one("orders", "o_custkey", "orders.o_custkey")}
       |  UNION ALL
       |${one("lineitem", "l_partkey", "lineitem.l_partkey")}
       |  UNION ALL
       |${one("events", "user_id", "events.user_id")})
       |ORDER BY rel_key NULLS FIRST""".stripMargin
  }

  /** Q234 — content-addressed dataset manifest per source (+ corpus
    * TOTAL): an ORDER-INDEPENDENT additive fingerprint fp = Σ h(doc)
    * mod p over leaf hashes h(doc) = md5-derived 32-bit value of
    * (doc_id, md5(text)), with exact doc/char accounting. This is the
    * public face of the engine's internal dataset-keying discipline
    * (the Derived artifacts cache on a physical-listing key; this is
    * the CONTENT key): two data drops agree on (n_docs, n_chars, fp)
    * per source iff their (doc_id, text) multisets agree mod hash
    * collisions — the drop-to-drop drift check and pipeline cache key
    * a 100 TB ingest runs before recomputing anything downstream.
    *
    * Determinism: leaf hashes are md5-derived int64 (< 2^32), the sum
    * is exact int64 (wrap-free through ~2^31 docs per source; a larger
    * deployment accumulates mod p per partition first — same plan),
    * and the final mod-p fold is integer. No floats anywhere.
    *
    * Scale notes: one scan, one map-side-combinable aggregate per
    * source — the additive form is what makes the fingerprint
    * mergeable across partitions/files with no ordering constraint
    * (a Merkle chain would force a total order; Σ mod p is the
    * standard multiset hash, cf. incremental set hashing,
    * Bellare–Micciancio 1997).
    */
  def q234(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    // materialize the md5 leaf once: hexValueExpr textually expands its
    // argument 8x, which would re-emit the doc-text hash per hex digit
    val leaves = c.documents
      .select(col("source"), col("text"),
        md5(concat(col("doc_id").cast("string"), lit(":"),
          md5(col("text")))).as("h"))
      .select(col("source"), col("text"),
        expr(NearDup.hexValueFastExpr("h")).as("hv"))
    val per = leaves.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(length(col("text"))).cast("long").as("n_chars"),
        (sum(col("hv")) % 2147483647L).cast("long").as("fp"))
    per.unionAll(leaves.agg(
        lit("TOTAL").as("source"),
        count(lit(1)).cast("long").as("n_docs"),
        sum(length(col("text"))).cast("long").as("n_chars"),
        (sum(col("hv")) % 2147483647L).cast("long").as("fp")))
      .orderBy(asc_nulls_first("source"))
  }

  val q234Oracle: String = {
    val hv = NearDup.hexValueExpr("h")
    s"""WITH hashed AS (
       |  SELECT source, text,
       |    md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)) AS h
       |  FROM documents),
       |leaves AS (
       |  SELECT source, text, ($hv) AS hv FROM hashed),
       |per AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
       |    CAST(SUM(hv) % 2147483647 AS BIGINT) AS fp
       |  FROM leaves GROUP BY 1
       |  UNION ALL
       |  SELECT 'TOTAL', CAST(COUNT(*) AS BIGINT),
       |    CAST(SUM(LENGTH(text)) AS BIGINT),
       |    CAST(SUM(hv) % 2147483647 AS BIGINT)
       |  FROM leaves)
       |SELECT source, n_docs, n_chars, fp
       |FROM per
       |ORDER BY source NULLS FIRST""".stripMargin
  }

  /** Q238 — supply-concentration profile per nation (Herfindahl 1950 /
    * Hirschman 1945; Shannon 1948 / Pielou 1966 for the diversity pair):
    * per nation over its suppliers' shipped-quantity shares s_i: HHI =
    * Σ s_i² (the merger-review concentration index, graded on the
    * DOJ/FTC 0.15/0.25 bands), effective supplier count 1/HHI (inverse
    * Simpson — "how many equal suppliers would look like this"), top
    * supplier share, Shannon entropy H = ln Q − (Σ q·ln q)/Q nats, and
    * Pielou evenness H/ln(k). The sourcing-risk read of the engine's
    * star schema: Q226 profiles key skew for the SHUFFLE, this profiles
    * the same skewness as a BUSINESS exposure.
    *
    * Determinism: per-supplier quantities are exact int64 (integral
    * l_quantity via the round-then-cast pin), so Q, Σq², and qmax are
    * exact and every share-derived ratio is divides of exact ints in ONE
    * pinned shape, rounded once; only the entropy term Σ q·ln q is a
    * float sum (order-free after round-4, the Q206 ln-parity
    * discipline). Single-supplier nations degrade evenness to NULL
    * (CASE guard, ln k = 0); the verdict compares the ROUNDED hhi.
    *
    * Scale notes: one lineitem scan, map-side-combined (nation,
    * supplier) partial agg before the suppliers-bounded rollup; both dim
    * joins broadcast. Σq² holds to int64 through ~10⁹-unit suppliers;
    * beyond that (full 100 TB ledgers) the q² accumulator widens to
    * DECIMAL(38,0) — the Q128 overflow-analysis convention.
    */
  def q238(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val li = c.lineitem.select(col("l_suppkey"),
      round(col("l_quantity")).cast("long").as("q"))
    val sup = c.supplier.select(col("s_suppkey"), col("s_nationkey"))
    val nat = c.nation.select(col("n_nationkey"), col("n_name"))
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"))
      .agg(sum(col("q")).as("q"))
      .filter(col("q") > 0L)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("q")).as("total_qty"),
        sum(col("q") * col("q")).as("sq2"),
        max(col("q")).as("qmax"),
        sum(col("q").cast("double") * log(col("q").cast("double")))
          .as("sqlq"))
      .select(col("n_name").as("nation"), col("n_suppliers"),
        col("total_qty"),
        expr("ROUND(CAST(sq2 AS DOUBLE) / (CAST(total_qty AS DOUBLE) * total_qty), 6)")
          .as("hhi"),
        expr("ROUND((CAST(total_qty AS DOUBLE) * total_qty) / sq2, 2)")
          .as("eff_suppliers"),
        expr("ROUND(CAST(qmax AS DOUBLE) / total_qty, 6)").as("top_share"),
        expr("ROUND(LN(CAST(total_qty AS DOUBLE)) - sqlq / total_qty, 4)")
          .as("entropy"),
        expr("CASE WHEN n_suppliers > 1 THEN" +
          " ROUND((LN(CAST(total_qty AS DOUBLE)) - sqlq / total_qty)" +
          " / LN(CAST(n_suppliers AS DOUBLE)), 4) END").as("evenness"),
        expr("CASE WHEN ROUND(CAST(sq2 AS DOUBLE) / (CAST(total_qty AS DOUBLE) * total_qty), 6) > 0.25" +
          " THEN 'concentrated'" +
          " WHEN ROUND(CAST(sq2 AS DOUBLE) / (CAST(total_qty AS DOUBLE) * total_qty), 6) > 0.15" +
          " THEN 'moderate' ELSE 'competitive' END").as("verdict"))
      .orderBy(asc("nation"))
  }

  val q238Oracle: String =
    """WITH per AS (
      |  SELECT n.n_name, s.s_suppkey,
      |    CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem l
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN nation n ON n.n_nationkey = s.s_nationkey
      |  GROUP BY 1, 2
      |  HAVING SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) > 0),
      |s AS (
      |  SELECT n_name,
      |    CAST(COUNT(*) AS BIGINT) AS n_suppliers,
      |    CAST(SUM(q) AS BIGINT) AS total_qty,
      |    CAST(SUM(q * q) AS BIGINT) AS sq2,
      |    CAST(MAX(q) AS BIGINT) AS qmax,
      |    SUM(CAST(q AS DOUBLE) * LN(CAST(q AS DOUBLE))) AS sqlq
      |  FROM per GROUP BY 1)
      |SELECT n_name AS nation, n_suppliers, total_qty,
      |  ROUND(CAST(sq2 AS DOUBLE) / (CAST(total_qty AS DOUBLE) * total_qty), 6)
      |    AS hhi,
      |  ROUND((CAST(total_qty AS DOUBLE) * total_qty) / sq2, 2)
      |    AS eff_suppliers,
      |  ROUND(CAST(qmax AS DOUBLE) / total_qty, 6) AS top_share,
      |  ROUND(LN(CAST(total_qty AS DOUBLE)) - sqlq / total_qty, 4) AS entropy,
      |  CASE WHEN n_suppliers > 1 THEN
      |    ROUND((LN(CAST(total_qty AS DOUBLE)) - sqlq / total_qty)
      |      / LN(CAST(n_suppliers AS DOUBLE)), 4) END AS evenness,
      |  CASE WHEN ROUND(CAST(sq2 AS DOUBLE) / (CAST(total_qty AS DOUBLE) * total_qty), 6) > 0.25
      |    THEN 'concentrated'
      |    WHEN ROUND(CAST(sq2 AS DOUBLE) / (CAST(total_qty AS DOUBLE) * total_qty), 6) > 0.15
      |    THEN 'moderate' ELSE 'competitive' END AS verdict
      |FROM s
      |ORDER BY nation""".stripMargin

  /** One Simpson screen: src carries (g, x, y) exact-int columns; the
    * output is the one-row sign audit for this screen name. Slope signs
    * are signs of the exact int64 covariance numerator n·Σxy − Σx·Σy —
    * no floats anywhere in the gate.
    */
  private def slopeSignScreen(src: DataFrame, screen: String): DataFrame = {
    val cells = src.groupBy(col("g")).agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("y")).cast("long").as("sy"),
        sum(col("x") * col("y")).cast("long").as("sxy"))
      // sign cross-products in DECIMAL(38,0)/HUGEINT (r12 sf10 sweep:
      // nn·txy ≈ 1.8·10¹⁹ tops 2⁶³ at 60M-row strata and the int64 form
      // threw under ANSI); only SIGNS leave this stage, so no output
      // type changes
      .withColumn("sg", expr(
        "CASE WHEN CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy > 0 THEN 1 " +
          "WHEN CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy < 0 THEN -1 ELSE 0 END"))
    cells.agg(
        sum(col("n")).cast("long").as("nn"),
        sum(col("sx")).cast("long").as("tx"),
        sum(col("sy")).cast("long").as("ty"),
        sum(col("sxy")).cast("long").as("txy"),
        count(lit(1)).cast("long").as("n_groups"),
        sum(when(col("sg") === 1, 1L).otherwise(0L)).cast("long").as("n_pos"),
        sum(when(col("sg") === -1, 1L).otherwise(0L)).cast("long").as("n_neg"),
        sum(when(col("sg") === 0, 1L).otherwise(0L)).cast("long").as("n_zero"))
      .select(lit(screen).as("screen"), col("nn").as("n_rows"),
        expr("CAST(CASE WHEN CAST(nn AS DECIMAL(38,0)) * txy - CAST(tx AS DECIMAL(38,0)) * ty > 0 THEN 1 " +
          "WHEN CAST(nn AS DECIMAL(38,0)) * txy - CAST(tx AS DECIMAL(38,0)) * ty < 0 THEN -1 ELSE 0 END AS BIGINT)")
          .as("overall_sign"),
        col("n_groups"), col("n_pos"), col("n_neg"), col("n_zero"))
      .withColumn("verdict", expr(
        "CASE WHEN overall_sign = 1 AND n_pos = 0 AND n_neg > 0 THEN 'paradox' " +
          "WHEN overall_sign = -1 AND n_neg = 0 AND n_pos > 0 THEN 'paradox' " +
          "WHEN n_pos > 0 AND n_neg > 0 THEN 'mixed' " +
          "ELSE 'consistent' END"))
  }

  /** Q295 — Simpson's-paradox screen (Simpson 1951; Pearl's
    * aggregation-reversal reading) over three declared
    * (x, y, stratifier) association triples: the sign of the pooled
    * x–y trend vs the per-stratum trend signs. A 'paradox' row means
    * the pooled direction is the OPPOSITE of every stratum that has a
    * direction — the aggregate would mislead any downstream consumer
    * that ignores the stratifier; 'mixed' means strata disagree among
    * themselves. Screens: discount→quantity by return flag,
    * ship-month→quantity by return flag (lineitem), and
    * size→price by brand (part).
    *
    * Determinism: x and y are exact ints (discount cents, quantities,
    * month index, size, price cents); every trend sign is the sign of
    * the exact int64 covariance numerator n·Σxy − Σx·Σy; the gate
    * emits no floats at all.
    *
    * Scale notes: each screen is one linear scan + a stratum-count
    * aggregate (strata are bounded: 3 flags, 25 brands); output is 3
    * rows. n·Σxy stays inside int64 to ~10⁸ rows per screen at these
    * column magnitudes (x·y ≤ ~500 for the lineitem screens); past
    * that the identical plan carries DECIMAL(38,0).
    */
  def q295(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val li = c.lineitem.select(
      col("l_returnflag"),
      expr("CAST(ROUND(l_discount * 100, 0) AS BIGINT)").as("disc"),
      expr("month(CAST(l_shipdate AS DATE))").cast("long").as("mth"),
      col("l_quantity").cast("long").as("qty"))
    val s1 = slopeSignScreen(
      li.select(col("l_returnflag").as("g"), col("disc").as("x"),
        col("qty").as("y")), "disc_qty_by_flag")
    val s2 = slopeSignScreen(
      li.select(col("l_returnflag").as("g"), col("mth").as("x"),
        col("qty").as("y")), "month_qty_by_flag")
    val s3 = slopeSignScreen(
      c.part.select(col("p_brand").as("g"),
        col("p_size").cast("long").as("x"),
        expr("CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)").as("y")),
      "size_price_by_brand")
    s1.unionAll(s2).unionAll(s3).orderBy(asc_nulls_first("screen"))
  }

  val q295Oracle: String = {
    def screen(cellsFrom: String, name: String): String =
      s"""(WITH cells AS (
         |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy
         |  FROM $cellsFrom GROUP BY 1),
         |sg AS (
         |  SELECT *, CASE WHEN CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy > 0 THEN 1
         |    WHEN CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy < 0 THEN -1 ELSE 0 END AS sg
         |  FROM cells),
         |roll AS (
         |  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(sx) AS BIGINT) AS tx,
         |    CAST(SUM(sy) AS BIGINT) AS ty, CAST(SUM(sxy) AS BIGINT) AS txy,
         |    CAST(COUNT(*) AS BIGINT) AS n_groups,
         |    CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |    CAST(SUM(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
         |    CAST(SUM(CASE WHEN sg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
         |  FROM sg)
         |SELECT '$name' AS screen, nn AS n_rows,
         |  CAST(CASE WHEN CAST(nn AS HUGEINT) * txy - CAST(tx AS HUGEINT) * ty > 0 THEN 1
         |    WHEN CAST(nn AS HUGEINT) * txy - CAST(tx AS HUGEINT) * ty < 0 THEN -1 ELSE 0 END AS BIGINT)
         |    AS overall_sign,
         |  n_groups, n_pos, n_neg, n_zero,
         |  CASE WHEN (CASE WHEN CAST(nn AS HUGEINT) * txy - CAST(tx AS HUGEINT) * ty > 0 THEN 1
         |      WHEN CAST(nn AS HUGEINT) * txy - CAST(tx AS HUGEINT) * ty < 0 THEN -1 ELSE 0 END) = 1
         |      AND n_pos = 0 AND n_neg > 0 THEN 'paradox'
         |    WHEN (CASE WHEN CAST(nn AS HUGEINT) * txy - CAST(tx AS HUGEINT) * ty > 0 THEN 1
         |      WHEN CAST(nn AS HUGEINT) * txy - CAST(tx AS HUGEINT) * ty < 0 THEN -1 ELSE 0 END) = -1
         |      AND n_neg = 0 AND n_pos > 0 THEN 'paradox'
         |    WHEN n_pos > 0 AND n_neg > 0 THEN 'mixed'
         |    ELSE 'consistent' END AS verdict
         |FROM roll)""".stripMargin
    val li1 = "(SELECT l_returnflag AS g, " +
      "CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x, " +
      "CAST(l_quantity AS BIGINT) AS y FROM lineitem)"
    val li2 = "(SELECT l_returnflag AS g, " +
      "CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT) AS x, " +
      "CAST(l_quantity AS BIGINT) AS y FROM lineitem)"
    val pt = "(SELECT p_brand AS g, CAST(p_size AS BIGINT) AS x, " +
      "CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS y FROM part)"
    s"""SELECT * FROM (
       |${screen(li1, "disc_qty_by_flag")}
       |UNION ALL
       |${screen(li2, "month_qty_by_flag")}
       |UNION ALL
       |${screen(pt, "size_price_by_brand")})
       |ORDER BY screen NULLS FIRST""".stripMargin
  }

  /** Shared-text inventory formulas for Q299 — the classic normal-
    * approximation safety-stock algebra (Silver, Pyke & Peterson 1998
    * ch. 7) with declared constants: review-period lead time L = 2
    * weeks, service factor z = 1.645 (95% cycle service).
    */
  private val q299Mean = "CAST(sq AS DOUBLE) / n"
  private val q299Var =
    "CAST(n * sqq - sq * sq AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))"

  /** Q299 — safety stock / reorder point profile per brand
    * (Silver–Pyke–Peterson normal approximation): weekly demand on
    * the ZERO-FILLED week spine (unlike Q223's observed-weeks CV, the
    * zero weeks are real demand observations here — omitting them
    * understates σ and the safety stock with it), then
    * SS = z·σ·√L, ROP = L·μ + SS, order-up-to = ROP + μ (one review
    * period), with an intermittency verdict that routes erratic
    * demand to the Croston/SBA forecaster (Q271) instead.
    *
    * Determinism: weekly demand is exact int64 quantities on the
    * shared week spine; n, zero-weeks, Σq, Σq² exact int64; μ, σ², and
    * every derived policy number assemble from the two shared-text
    * shapes above (single fixed expressions over exact ints; the
    * 1.645/2/3 constants fold identically in both engines), each
    * rounded once at emit; the verdict compares exact ints
    * (4·n_zero > n) or the ROUNDED cv.
    *
    * Scale notes: one lineitem scan (broadcast part join) to
    * (brand, week) demand; the spine fill is brands × weeks — bounded
    * by vocabulary × calendar, not corpus; output is 25 rows. Σq² is
    * inside int64 to ~10⁹-unit brand-weeks.
    */
  def q299(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val li = c.lineitem
      .join(broadcast(c.part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        expr("datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') DIV 7")
          .as("week"),
        col("l_quantity").cast("long").as("qty"))
    val weekly = li.groupBy(col("p_brand"), col("week"))
      .agg(sum(col("qty")).cast("long").as("q"))
    val ext = weekly.agg(min(col("week")).as("wmin"),
      max(col("week")).as("wmax"))
    val grid = weekly.select(col("p_brand")).distinct()
      .crossJoin(broadcast(ext))
      .select(col("p_brand"), explode(expr("sequence(wmin, wmax)")).as("week"))
      .join(weekly, Seq("p_brand", "week"), "left")
      .select(col("p_brand"), col("week"),
        coalesce(col("q"), lit(0L)).as("q"))
    grid.groupBy(col("p_brand")).agg(
        count(lit(1)).cast("long").as("n"),
        sum(when(col("q") === 0, 1L).otherwise(0L)).cast("long").as("nz"),
        sum(col("q")).cast("long").as("sq"),
        sum(col("q") * col("q")).cast("long").as("sqq"))
      .select(col("p_brand"), col("n").as("n_weeks"),
        col("nz").as("zero_weeks"),
        expr(s"ROUND($q299Mean, 4)").as("mean_weekly"),
        expr(s"CASE WHEN sq > 0 AND n > 1 THEN " +
          s"ROUND(SQRT($q299Var) / ($q299Mean), 4) END").as("cv"),
        expr(s"CASE WHEN n > 1 THEN " +
          s"ROUND(1.645 * SQRT(2 * ($q299Var)), 4) END").as("safety_stock"),
        expr(s"CASE WHEN n > 1 THEN ROUND(2 * ($q299Mean) " +
          s"+ 1.645 * SQRT(2 * ($q299Var)), 4) END").as("reorder_point"),
        expr(s"CASE WHEN n > 1 THEN ROUND(3 * ($q299Mean) " +
          s"+ 1.645 * SQRT(2 * ($q299Var)), 4) END").as("order_up_to"))
      .withColumn("verdict", expr(
        "CASE WHEN mean_weekly = 0 THEN 'idle' " +
          "WHEN 4 * zero_weeks > n_weeks THEN 'intermittent' " +
          "WHEN cv >= 1 THEN 'erratic' ELSE 'smooth' END"))
      .orderBy(asc_nulls_first("p_brand"))
  }

  val q299Oracle: String =
    s"""WITH li AS (
       |  SELECT p.p_brand,
       |    (CAST(l_shipdate AS DATE) - DATE '1970-01-01') // 7 AS week,
       |    CAST(l_quantity AS BIGINT) AS qty
       |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
       |weekly AS (
       |  SELECT p_brand, week, CAST(SUM(qty) AS BIGINT) AS q
       |  FROM li GROUP BY 1, 2),
       |ext AS (SELECT MIN(week) AS wmin, MAX(week) AS wmax FROM weekly),
       |spine AS (
       |  SELECT b.p_brand, s.week FROM
       |    (SELECT DISTINCT p_brand FROM weekly) b
       |  CROSS JOIN (SELECT UNNEST(generate_series(wmin, wmax)) AS week
       |              FROM ext) s),
       |grd AS (
       |  SELECT s.p_brand, s.week, COALESCE(w.q, 0) AS q
       |  FROM spine s LEFT JOIN weekly w
       |    ON w.p_brand = s.p_brand AND w.week = s.week),
       |agg AS (
       |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nz,
       |    CAST(SUM(q) AS BIGINT) AS sq,
       |    CAST(SUM(q * q) AS BIGINT) AS sqq
       |  FROM grd GROUP BY 1),
       |outp AS (
       |  SELECT p_brand, n AS n_weeks, nz AS zero_weeks,
       |    ROUND($q299Mean, 4) AS mean_weekly,
       |    CASE WHEN sq > 0 AND n > 1 THEN
       |      ROUND(SQRT($q299Var) / ($q299Mean), 4) END AS cv,
       |    CASE WHEN n > 1 THEN
       |      ROUND(1.645 * SQRT(2 * ($q299Var)), 4) END AS safety_stock,
       |    CASE WHEN n > 1 THEN ROUND(2 * ($q299Mean)
       |      + 1.645 * SQRT(2 * ($q299Var)), 4) END AS reorder_point,
       |    CASE WHEN n > 1 THEN ROUND(3 * ($q299Mean)
       |      + 1.645 * SQRT(2 * ($q299Var)), 4) END AS order_up_to
       |  FROM agg)
       |SELECT *,
       |  CASE WHEN mean_weekly = 0 THEN 'idle'
       |    WHEN 4 * zero_weeks > n_weeks THEN 'intermittent'
       |    WHEN cv >= 1 THEN 'erratic' ELSE 'smooth' END AS verdict
       |FROM outp
       |ORDER BY p_brand NULLS FIRST""".stripMargin

  /** Shared-text log-log OLS pieces for Q304: slope and R² from the
    * centered double moments (the log transform forces double sums;
    * they accumulate at ~1e-13 against the 1e-4 rounding grid — the
    * Q158 ln-parity precedent).
    */
  private val q304Slope = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
  private val q304R2 =
    "((n * sxy - sx * sy) * (n * sxy - sx * sy))" +
      " / ((n * sxx - sx * sx) * (n * syy - sy * sy))"

  /** Q304 — price elasticity of demand per part type, by log-log OLS
    * (Marshall 1890's elasticity; the constant-elasticity ln q = α +
    * ε·ln p regression): each part contributes one (ln price-cents,
    * ln total-quantity-sold) point; ε is the within-type slope, with
    * R² as the fit quality. ε ≤ −1 is elastic demand, −1 < ε < 0
    * inelastic — the pricing-analytics read on the catalog that the
    * Simpson screen (Q295) stratum-checks.
    *
    * Determinism: per-part quantity and price collapse to exact int64
    * first; x/y are single LN(CAST(int AS DOUBLE)) transforms; the
    * five moment sums are double accumulations bounded ~1e-13 against
    * the 1e-4 grid (Q158 precedent); slope/R² are the shared-text
    * shapes above rounded once; the verdict compares the ROUNDED
    * slope.
    *
    * Scale notes: one lineitem aggregate to per-part quantity
    * (map-side combinable), one broadcast part join, one
    * bounded-cardinality (6-type) moment rollup. n·Σxy stays far
    * inside double's exact-integer range at any scale because the
    * logs cap |x|,|y| ≲ 50.
    */
  def q304(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val qty = c.lineitem.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).cast("long").as("q"))
    val pts = qty.join(broadcast(c.part.select(col("p_partkey"),
        col("p_type"),
        expr("CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)").as("cents"))),
        col("l_partkey") === col("p_partkey"))
      .filter(col("q") > 0 && col("cents") > 0)
      .select(col("p_type"),
        expr("LN(CAST(cents AS DOUBLE))").as("x"),
        expr("LN(CAST(q AS DOUBLE))").as("y"))
    pts.groupBy(col("p_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .filter(col("n") > 2)
      .select(col("p_type"), col("n").as("n_parts"),
        expr(s"CASE WHEN n * sxx - sx * sx > 0 THEN " +
          s"ROUND($q304Slope, 4) END").as("elasticity"),
        expr(s"CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0" +
          s" THEN ROUND($q304R2, 4) END").as("r2"))
      .withColumn("verdict", expr(
        "CASE WHEN elasticity IS NULL THEN 'degenerate' " +
          "WHEN elasticity <= -1 THEN 'elastic' " +
          "WHEN elasticity < 0 THEN 'inelastic' " +
          "ELSE 'non_negative' END"))
      .orderBy(asc_nulls_first("p_type"))
  }

  val q304Oracle: String =
    s"""WITH qty AS (
       |  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
       |    AS q
       |  FROM lineitem GROUP BY 1),
       |pts AS (
       |  SELECT p.p_type,
       |    LN(CAST(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS DOUBLE))
       |      AS x,
       |    LN(CAST(q AS DOUBLE)) AS y
       |  FROM qty JOIN part p ON p.p_partkey = qty.l_partkey
       |  WHERE q > 0 AND CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) > 0),
       |mom AS (
       |  SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
       |    SUM(x * y) AS sxy, SUM(y * y) AS syy
       |  FROM pts GROUP BY 1),
       |fit AS (
       |  SELECT p_type, n AS n_parts,
       |    CASE WHEN n * sxx - sx * sx > 0 THEN
       |      ROUND($q304Slope, 4) END AS elasticity,
       |    CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
       |      THEN ROUND($q304R2, 4) END AS r2
       |  FROM mom WHERE n > 2)
       |SELECT *,
       |  CASE WHEN elasticity IS NULL THEN 'degenerate'
       |    WHEN elasticity <= -1 THEN 'elastic'
       |    WHEN elasticity < 0 THEN 'inelastic'
       |    ELSE 'non_negative' END AS verdict
       |FROM fit
       |ORDER BY p_type NULLS FIRST""".stripMargin

  /** Q325 — corpus-composition dissimilarity between every source pair:
    * Duncan & Duncan's (1955) index of dissimilarity over the language
    * distribution, D = ½ Σ_l |p_l|a − p_l|b| — the share of either
    * source's documents that would have to switch language for the two
    * compositions to match. The curation read for "can I mix these two
    * sources into one training shard without shifting the language
    * mix": PSI (Q211) audits ONE population across eras; this audits
    * every source pair at a point in time, with the top contributing
    * language named.
    *
    * Determinism: D's numerator Σ|c_al·n_b − c_bl·n_a| and the
    * top-language pick (largest gap, language tiebreak) are exact
    * int64; D is ONE single-divide float rounded 6; the verdict reads
    * the rounded D.
    *
    * Scale notes: one corpus scan collapses to (source, lang) cells;
    * pair replication happens on the BOUNDED cell relation (sources ×
    * langs), never on documents; per-pair work is one window pick +
    * one aggregate over ≤ |langs| rows. |c·n| holds int64 to ~3·10⁹
    * docs per source.
    */
  def q325(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val cells = c.documents.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tot = cells.groupBy(col("source")).agg(sum(col("cnt")).as("n"))
    val pairs = tot.select(col("source").as("src_a"), col("n").as("n_a"))
      .join(tot.select(col("source").as("src_b"), col("n").as("n_b")),
        col("src_a") < col("src_b"))
    val sided = broadcast(pairs)
      .join(cells, col("source") === col("src_a") ||
        col("source") === col("src_b"))
      .groupBy(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("lang"))
      .agg(sum(when(col("source") === col("src_a"), col("cnt"))
          .otherwise(0L)).as("c_a"),
        sum(when(col("source") === col("src_b"), col("cnt"))
          .otherwise(0L)).as("c_b"))
      .withColumn("gap", abs(col("c_a") * col("n_b") -
        col("c_b") * col("n_a")))
    val wTop = Window.partitionBy(col("src_a"), col("src_b"))
      .orderBy(desc("gap"), asc("lang"))
    val top = sided.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") === 1)
      .select(col("src_a"), col("src_b"), col("lang").as("top_lang"))
    sided.groupBy(col("src_a"), col("src_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_langs"), sum(col("gap")).as("gap_sum"))
      .join(top, Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("n_langs"),
        expr("ROUND(CAST(gap_sum AS DOUBLE) / (2 * n_a * n_b), 6)")
          .as("dissim"),
        col("top_lang"))
      .withColumn("verdict", expr("CASE WHEN dissim >= 0.2 " +
        "THEN 'shifted' ELSE 'aligned' END"))
      .orderBy(asc_nulls_first("src_a"), asc_nulls_first("src_b"))
  }

  val q325Oracle: String =
    """WITH cells AS (
      |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM documents GROUP BY 1, 2),
      |tot AS (
      |  SELECT source, CAST(SUM(cnt) AS BIGINT) AS n
      |  FROM cells GROUP BY 1),
      |pairs AS (
      |  SELECT a.source AS src_a, a.n AS n_a, b.source AS src_b,
      |    b.n AS n_b
      |  FROM tot a JOIN tot b ON a.source < b.source),
      |sided AS (
      |  SELECT p.src_a, p.src_b, p.n_a, p.n_b, c.lang,
      |    CAST(SUM(CASE WHEN c.source = p.src_a THEN c.cnt ELSE 0 END)
      |      AS BIGINT) AS c_a,
      |    CAST(SUM(CASE WHEN c.source = p.src_b THEN c.cnt ELSE 0 END)
      |      AS BIGINT) AS c_b
      |  FROM pairs p JOIN cells c
      |    ON c.source IN (p.src_a, p.src_b)
      |  GROUP BY 1, 2, 3, 4, 5),
      |gapped AS (
      |  SELECT src_a, src_b, n_a, n_b, lang,
      |    ABS(c_a * n_b - c_b * n_a) AS gap
      |  FROM sided),
      |top AS (
      |  SELECT src_a, src_b, lang AS top_lang FROM (
      |    SELECT src_a, src_b, lang,
      |      ROW_NUMBER() OVER (PARTITION BY src_a, src_b
      |        ORDER BY gap DESC, lang) AS rk
      |    FROM gapped) r
      |  WHERE rk = 1),
      |agg AS (
      |  SELECT src_a, src_b, n_a, n_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_langs,
      |    CAST(SUM(gap) AS BIGINT) AS gap_sum
      |  FROM gapped GROUP BY 1, 2, 3, 4)
      |SELECT a.src_a, a.src_b, a.n_a, a.n_b, a.n_langs,
      |  ROUND(CAST(a.gap_sum AS DOUBLE) / (2 * a.n_a * a.n_b), 6)
      |    AS dissim,
      |  t.top_lang,
      |  CASE WHEN ROUND(CAST(a.gap_sum AS DOUBLE) /
      |    (2 * a.n_a * a.n_b), 6) >= 0.2 THEN 'shifted'
      |    ELSE 'aligned' END AS verdict
      |FROM agg a JOIN top t ON t.src_a = a.src_a AND t.src_b = a.src_b
      |ORDER BY a.src_a NULLS FIRST, a.src_b NULLS FIRST""".stripMargin

  /** Q327 — ABC (Pareto) classification of parts by net lineitem
    * revenue: rank parts by Σ ROUND(extprice·(1−disc)·100) cents
    * descending and band the INCLUSIVE cumulative share at the
    * classical 80 / 95 cut points (A carries the first ~80% of
    * revenue, B the next ~15%, C the tail) — the inventory-control
    * segmentation (Dickie 1951's ABC analysis) every ops team runs;
    * the Q159/Q213-style concentration gates say HOW skewed revenue
    * is, this says WHICH items form each band and how thin the head
    * is.
    *
    * Determinism: per-part revenue is exact int64 cents; the ranking
    * orders (revenue DESC, partkey) — exact ints; band edges are
    * integer cross-multiplication (cum·100 ≤ 80·total), no float
    * thresholds; share is one single-divide float rounded 6. Rank 1
    * is pinned to A so a single dominant part can't produce an empty
    * A class.
    *
    * Scale notes: the per-part rollup is one map-side-combined
    * aggregate onto the part dimension; the cumulative pass is ONE
    * window over that dimension-sized relation (at warehouse scale,
    * swap for the two-pass range-partitioned cumsum — per-partition
    * partials + broadcast offsets — same semantics, documented, not
    * silent); the class rollup is 3 rows.
    */
  def q327(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val perPart = c.lineitem
      .select(col("l_partkey"),
        expr("CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) " +
          "AS BIGINT)").as("net_cents"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("net_cents")).as("rev"))
    val wCum = Window.orderBy(desc("rev"), asc("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = perPart.agg(sum(col("rev")).as("tot"))
    val classed = perPart
      .withColumn("cum", sum(col("rev")).over(wCum))
      .withColumn("rnk", row_number().over(
        Window.orderBy(desc("rev"), asc("l_partkey"))).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("abc_class", expr("CASE " +
        "WHEN rnk = 1 OR cum * 100 <= 80 * tot THEN 'A' " +
        "WHEN cum * 100 <= 95 * tot THEN 'B' ELSE 'C' END"))
    classed.groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("rev")).as("class_revenue_cents"),
        min(col("rnk")).as("first_rank"), max(col("rnk")).as("last_rank"),
        max(col("tot")).as("tot"))
      .select(col("abc_class"), col("n_parts"),
        col("class_revenue_cents"), col("first_rank"), col("last_rank"),
        expr("ROUND(CAST(class_revenue_cents AS DOUBLE) / tot, 6)")
          .as("revenue_share"))
      .orderBy(asc_nulls_first("abc_class"))
  }

  val q327Oracle: String =
    """WITH perpart AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100,
      |      0) AS BIGINT)) AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS tot FROM perpart),
      |classed AS (
      |  SELECT p.l_partkey, p.rev, t.tot,
      |    CAST(SUM(p.rev) OVER (ORDER BY p.rev DESC, p.l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum,
      |    CAST(ROW_NUMBER() OVER (ORDER BY p.rev DESC, p.l_partkey)
      |      AS BIGINT) AS rnk
      |  FROM perpart p, tot t),
      |banded AS (
      |  SELECT CASE
      |    WHEN rnk = 1 OR cum * 100 <= 80 * tot THEN 'A'
      |    WHEN cum * 100 <= 95 * tot THEN 'B' ELSE 'C' END AS abc_class,
      |    rev, rnk, tot
      |  FROM classed)
      |SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  CAST(SUM(rev) AS BIGINT) AS class_revenue_cents,
      |  CAST(MIN(rnk) AS BIGINT) AS first_rank,
      |  CAST(MAX(rnk) AS BIGINT) AS last_rank,
      |  ROUND(CAST(SUM(rev) AS DOUBLE) / MAX(tot), 6) AS revenue_share
      |FROM banded
      |GROUP BY 1
      |ORDER BY abc_class NULLS FIRST""".stripMargin

  /** Q343 — ABC × XYZ portfolio segmentation matrix over BRANDS (the
    * standard two-axis stocking-policy classification; Silver, Pyke &
    * Peterson 1998): Q327's Pareto REVENUE fences applied to brand
    * revenue, crossed with demand VARIABILITY classes from each
    * brand's 28-day-period quantity series — X (steady, CV ≤ 0.5),
    * Y (variable, CV ≤ 1), Z (erratic). An A-X brand wants tight
    * continuous replenishment; a C-Z brand wants make-to-order; the
    * ≤ 9-cell matrix is the report a planner reads. Q299's
    * safety-stock profile PRICES variability; this SEGMENTS the
    * portfolio by it. (Brands, not parts: fixture per-part demand is
    * 3 shipments over 7 years — per-part XYZ degenerates to all-Z at
    * any fence; the brand × 28-day series is dense enough to spread.)
    *
    * Determinism: period buckets are exact datediff-days DIV 28 from
    * the global min ship date; zero-demand periods enter the variance
    * through the GLOBAL period count n (absent periods contribute
    * nothing to Σq, Σq² — algebraically identical to zero-filling, no
    * spine join); the CV fences compare EXACT integer cross-products
    * (CV² = (nΣq² − S²)/S², so X ⇔ 4(nΣq² − S²) ≤ S², Y ⇔ ≤ S²)
    * carried in DECIMAL(38,0)/HUGEINT (S² passes int64 once a brand
    * ships ~3·10⁹ units); ABC classes replay Q327's exact
    * cum·100 ≤ 80·tot cross-multiplication with its rank-1 pin; the
    * only floats are the two share divides, rounded 6.
    *
    * Scale notes: one lineitem scan joined to the broadcast-sized
    * part dimension for p_brand, two map-side-combinable aggregates
    * (per-(brand, period), then per-brand), one broadcast bounds row,
    * the ABC rank window over the |brands|-bounded relation, and a
    * ≤ 9-cell output fold. Flat in corpus size past the brand
    * collapse.
    */
  def q343(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val bounds = c.lineitem.agg(
      min(col("l_shipdate")).as("w0"),
      expr("CAST(datediff(MAX(l_shipdate), MIN(l_shipdate)) DIV 28 + 1 " +
        "AS BIGINT)").as("n_periods"))
    val li = c.lineitem
      .join(broadcast(c.part.select(col("p_partkey").as("l_partkey"),
        col("p_brand"))), Seq("l_partkey"))
      .select(col("p_brand"),
        expr("CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) " +
          "AS BIGINT)").as("net_cents"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"),
        col("l_shipdate"))
      .crossJoin(broadcast(bounds))
    val periodic = li
      .select(col("p_brand"), col("qty"), col("n_periods"),
        expr("datediff(l_shipdate, w0) DIV 28").as("period"))
      .groupBy(col("p_brand"), col("period"), col("n_periods"))
      .agg(sum(col("qty")).as("q"))
    val xyz = periodic.groupBy(col("p_brand"), col("n_periods"))
      .agg(sum(col("q")).cast("long").as("s"),
        sum(col("q") * col("q")).cast("long").as("sq"))
      .withColumn("varn", expr(
        "CAST(n_periods AS DECIMAL(38,0)) * sq - CAST(s AS DECIMAL(38,0)) * s"))
      .withColumn("xyz_class", expr(
        "CASE WHEN 4 * varn <= CAST(s AS DECIMAL(38,0)) * s THEN 'X' " +
          "WHEN varn <= CAST(s AS DECIMAL(38,0)) * s THEN 'Y' " +
          "ELSE 'Z' END"))
      .select(col("p_brand"), col("xyz_class"), col("s"))
    val perBrand = li.groupBy(col("p_brand"))
      .agg(sum(col("net_cents")).as("rev"))
    val tot = perBrand.agg(sum(col("rev")).as("tot"))
    val qtot = xyz.agg(sum(col("s")).cast("long").as("qtot"))
    val abc = perBrand
      .withColumn("cum", sum(col("rev")).over(
        Window.orderBy(desc("rev"), asc("p_brand"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rnk", row_number().over(
        Window.orderBy(desc("rev"), asc("p_brand"))).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("abc_class", expr("CASE " +
        "WHEN rnk = 1 OR cum * 100 <= 80 * tot THEN 'A' " +
        "WHEN cum * 100 <= 95 * tot THEN 'B' ELSE 'C' END"))
      .select(col("p_brand"), col("abc_class"), col("rev"), col("tot"))
    abc.join(xyz, Seq("p_brand"))
      .crossJoin(broadcast(qtot))
      .groupBy(col("abc_class"), col("xyz_class"))
      .agg(count(lit(1)).cast("long").as("n_brands"),
        sum(col("rev")).cast("long").as("cell_revenue_cents"),
        sum(col("s")).cast("long").as("cell_qty"),
        max(col("tot")).as("tot"), max(col("qtot")).as("qtot"))
      .select(col("abc_class"), col("xyz_class"), col("n_brands"),
        col("cell_revenue_cents"),
        expr("ROUND(CAST(cell_revenue_cents AS DOUBLE) / tot, 6)")
          .as("revenue_share"),
        col("cell_qty"),
        expr("ROUND(CAST(cell_qty AS DOUBLE) / qtot, 6)").as("qty_share"))
      .orderBy(asc_nulls_first("abc_class"), asc_nulls_first("xyz_class"))
  }

  val q343Oracle: String =
    """WITH bounds AS (
      |  SELECT MIN(l_shipdate) AS w0,
      |    CAST(date_diff('day', MIN(l_shipdate), MAX(l_shipdate)) // 28 + 1
      |      AS BIGINT) AS n_periods
      |  FROM lineitem),
      |li AS (
      |  SELECT p.p_brand,
      |    CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
      |      AS BIGINT) AS net_cents,
      |    CAST(l.l_quantity AS BIGINT) AS qty,
      |    date_diff('day', b.w0, l.l_shipdate) // 28 AS period,
      |    b.n_periods
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey,
      |    bounds b),
      |periodic AS (
      |  SELECT p_brand, period, n_periods, CAST(SUM(qty) AS BIGINT) AS q
      |  FROM li GROUP BY 1, 2, 3),
      |xyz AS (
      |  SELECT p_brand, s, CASE
      |      WHEN 4 * varn <= CAST(s AS HUGEINT) * s THEN 'X'
      |      WHEN varn <= CAST(s AS HUGEINT) * s THEN 'Y'
      |      ELSE 'Z' END AS xyz_class
      |  FROM (
      |    SELECT p_brand,
      |      CAST(SUM(q) AS BIGINT) AS s,
      |      CAST(MIN(n_periods) AS HUGEINT) * CAST(SUM(q * q) AS BIGINT)
      |        - CAST(SUM(q) AS HUGEINT) * SUM(q) AS varn
      |    FROM periodic GROUP BY 1)),
      |perbrand AS (
      |  SELECT p_brand, CAST(SUM(net_cents) AS BIGINT) AS rev
      |  FROM li GROUP BY 1),
      |tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS tot FROM perbrand),
      |qtot AS (SELECT CAST(SUM(s) AS BIGINT) AS qtot FROM xyz),
      |abc AS (
      |  SELECT p.p_brand, p.rev, t.tot, CASE
      |      WHEN rnk = 1 OR cum * 100 <= 80 * t.tot THEN 'A'
      |      WHEN cum * 100 <= 95 * t.tot THEN 'B' ELSE 'C' END AS abc_class
      |  FROM (
      |    SELECT p_brand, rev,
      |      CAST(SUM(rev) OVER (ORDER BY rev DESC, p_brand
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |        AS BIGINT) AS cum,
      |      CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, p_brand)
      |        AS BIGINT) AS rnk
      |    FROM perbrand) p, tot t),
      |cells AS (
      |  SELECT a.abc_class, x.xyz_class,
      |    CAST(COUNT(*) AS BIGINT) AS n_brands,
      |    CAST(SUM(a.rev) AS BIGINT) AS cell_revenue_cents,
      |    CAST(SUM(x.s) AS BIGINT) AS cell_qty,
      |    CAST(MAX(a.tot) AS BIGINT) AS tot
      |  FROM abc a JOIN xyz x ON x.p_brand = a.p_brand
      |  GROUP BY 1, 2)
      |SELECT c.abc_class, c.xyz_class, c.n_brands, c.cell_revenue_cents,
      |  ROUND(CAST(c.cell_revenue_cents AS DOUBLE) / c.tot, 6)
      |    AS revenue_share,
      |  c.cell_qty,
      |  ROUND(CAST(c.cell_qty AS DOUBLE) / q.qtot, 6) AS qty_share
      |FROM cells c CROSS JOIN qtot q
      |ORDER BY c.abc_class NULLS FIRST, c.xyz_class NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q343" -> (q343 _),
    "Q295" -> (q295 _), "Q299" -> (q299 _), "Q304" -> (q304 _),
    "Q325" -> (q325 _), "Q327" -> (q327 _),
    "Q78" -> (q78 _), "Q79" -> (q79 _), "Q114" -> (q114 _), "Q115" -> (q115 _),
    "Q116" -> (q116 _), "Q127" -> (q127 _), "Q129" -> (q129 _),
    "Q133" -> (q133 _), "Q151" -> (q151 _), "Q159" -> (q159 _),
    "Q174" -> (q174 _), "Q214" -> (q214 _), "Q223" -> (q223 _),
    "Q226" -> (q226 _), "Q234" -> (q234 _), "Q238" -> (q238 _))

  def oracles: Map[String, String] = Map(
    "Q343" -> q343Oracle,
    "Q295" -> q295Oracle, "Q299" -> q299Oracle, "Q304" -> q304Oracle,
    "Q325" -> q325Oracle, "Q327" -> q327Oracle,
    "Q78" -> q78Oracle, "Q79" -> q79Oracle, "Q114" -> q114Oracle,
    "Q115" -> q115Oracle, "Q116" -> q116Oracle, "Q127" -> q127Oracle,
    "Q129" -> q129Oracle, "Q133" -> q133Oracle, "Q151" -> q151Oracle,
    "Q159" -> q159Oracle, "Q174" -> q174Oracle, "Q214" -> q214Oracle,
    "Q223" -> q223Oracle, "Q226" -> q226Oracle, "Q234" -> q234Oracle,
    "Q238" -> q238Oracle)
}
