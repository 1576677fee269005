package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Catalog

/** Aggregation operators (SURVEY.md §2.4): hash aggregate with partial/final
  * phases, exact & approximate distinct, rollup/cube/grouping sets, HAVING.
  *
  * Scale notes: every groupBy here is a map-side-combinable hash aggregate
  * (HashAggregateExec partial → shuffle on group keys → final). Group-key
  * cardinality is tiny relative to input (flags, statuses, nations), so the
  * shuffle moves only partial aggregate buffers — the pattern that survives
  * a 100 TB scan.
  */
object Aggregates {

  /** Q13 — TPC-H Q1 shape: multi-measure hash aggregate over lineitem. */
  def q13(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val disc  = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = disc * (lit(1.0) + col("l_tax"))
    c.lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")).cast("double"), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")).cast("double"), 4).as("sum_base_price"),
        round(sum(disc).cast("double"), 4).as("sum_disc_price"),
        round(sum(charge).cast("double"), 4).as("sum_charge"),
        round(avg(col("l_quantity")).cast("double"), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")).cast("double"), 4).as("avg_price"),
        round(avg(col("l_discount")).cast("double"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  val q13Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(CAST(SUM(l_quantity) AS DOUBLE), 4) AS sum_qty,
      |  ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 4) AS sum_base_price,
      |  ROUND(CAST(SUM(l_extendedprice * (1.0 - l_discount)) AS DOUBLE), 4) AS sum_disc_price,
      |  ROUND(CAST(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) AS DOUBLE), 4) AS sum_charge,
      |  ROUND(CAST(AVG(l_quantity) AS DOUBLE), 4) AS avg_qty,
      |  ROUND(CAST(AVG(l_extendedprice) AS DOUBLE), 4) AS avg_price,
      |  ROUND(CAST(AVG(l_discount) AS DOUBLE), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Q14 — exact distinct count per group (expand + two-phase agg). */
  def q14(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q14Oracle: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q15 — ROLLUP over the region⋈nation⋈supplier⋈lineitem snowflake.
    * All three dimensions broadcast; the fact table never shuffles before
    * the aggregate.
    */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.lineitem
      .join(broadcast(c.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(c.region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  val q15Oracle: String =
    """SELECT r_name, n_name,
      |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** Q16 — CUBE + GROUPING() disambiguation columns. */
  def q16(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).as("g_status"),
        grouping(col("o_orderpriority")).as("g_priority"),
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 4).as("total"))
      .orderBy(
        asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  }

  val q16Oracle: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  GROUPING(o_orderstatus) AS g_status,
      |  GROUPING(o_orderpriority) AS g_priority,
      |  COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Q17 — HAVING + min/max/avg/stddev_samp per nation over supplier. */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.supplier
      .join(broadcast(c.nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("s_acctbal")), 4).as("min_bal"),
        round(max(col("s_acctbal")), 4).as("max_bal"),
        round(avg(col("s_acctbal")), 4).as("avg_bal"),
        round(stddev_samp(col("s_acctbal")), 4).as("sd_bal"))
      .where(col("n") >= 2)
      .orderBy(asc_nulls_first("n_name"))
  }

  val q17Oracle: String =
    """SELECT n_name, COUNT(*) AS n,
      |  ROUND(MIN(s_acctbal), 4) AS min_bal,
      |  ROUND(MAX(s_acctbal), 4) AS max_bal,
      |  ROUND(AVG(s_acctbal), 4) AS avg_bal,
      |  ROUND(STDDEV_SAMP(s_acctbal), 4) AS sd_bal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name
      |HAVING COUNT(*) >= 2
      |ORDER BY n_name NULLS FIRST""".stripMargin

  /** Q17b / C06 — the custom Aggregator UDAF (log-space product) applied in
    * Spark; DuckDB oracle is the pure-SQL twin EXP(SUM(LN(x))). Scoped to
    * l_orderkey ≤ 200 to keep the product's magnitude in hash-safe range.
    */
  def q17b(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val logProduct = udaf(graft.functions.LogProduct)
    c.lineitem
      .filter(col("l_orderkey") <= 200)
      .groupBy(col("l_returnflag"))
      .agg(round(logProduct(lit(1.0) + col("l_tax")), 4).as("tax_product"))
      .orderBy(asc_nulls_first("l_returnflag"))
  }

  val q17bOracle: String =
    """SELECT l_returnflag, ROUND(EXP(SUM(LN(1.0 + l_tax))), 4) AS tax_product
      |FROM lineitem
      |WHERE l_orderkey <= 200
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag NULLS FIRST""".stripMargin

  /** Q53 — pivot (crosstab): per-user event counts, one column per event
    * type. The value list is fixed so the output schema is static — at
    * scale an unbounded pivot would need a values-discovery pass first.
    */
  def q53(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = c.events
      .filter(col("user_id") < 20)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(pivoted)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy(asc_nulls_first("user_id"))
  }

  val q53Oracle: String =
    """SELECT user_id,
      |  COUNT(*) FILTER (event_type = 'click') AS click,
      |  COUNT(*) FILTER (event_type = 'error') AS error,
      |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (event_type = 'view') AS view
      |FROM events
      |WHERE user_id < 20
      |GROUP BY user_id
      |ORDER BY user_id NULLS FIRST""".stripMargin

  /** Scale path for exact percentiles: the built-in `percentile()` buffers
    * every group value in the aggregation buffer — fine for bounded
    * groups, an OOM at 100 TB. This form is shuffle-native: one window
    * rank per group (sort-based, spillable) and a conditional aggregate
    * that picks the two straddling ranks, interpolating
    * v_lo·(1−frac) + v_hi·frac with the same (n−1)·q rule. Property-
    * checked against `percentile()` in OperatorPropertiesSpec.
    */
  def exactPercentilesScalable(
      df: DataFrame, group: String, value: String, qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(group)).orderBy(asc("v"))
    val ranked = df.select(col(group), col(value).cast("double").as("v"))
      .filter(col("v").isNotNull) // builtin percentile() ignores NULLs too
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(group))))
    val aggs = qs.map { q =>
      val pos = (col("n") - 1) * q
      val lo = floor(pos) + 1
      val hi = least(lo + 1, col("n"))
      val frac = pos - floor(pos)
      (max(when(col("rn") === lo, col("v") * (lit(1.0) - frac))) +
        max(when(col("rn") === hi, col("v") * frac)))
        .as(s"p${math.round(q * 100)}")
    }
    ranked.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
  }

  /** Q54 — exact interpolated percentiles per group (both engines use the
    * standard (n−1)·p linear interpolation). Runs on the shuffle-native
    * rank-and-pick plan (exactPercentilesScalable) rather than the
    * buffering builtin: per-group state is two rows per quantile instead
    * of every value, so the same plan survives a 100 TB group.
    */
  def q54(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    exactPercentilesScalable(c.orders, "o_orderstatus", "o_totalprice", Seq(0.5, 0.9))
      .select(
        col("o_orderstatus"),
        round(col("p50"), 4).as("p50"),
        round(col("p90"), 4).as("p90"))
      .orderBy(asc_nulls_first("o_orderstatus"))
  }

  val q54Oracle: String =
    """SELECT o_orderstatus,
      |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus NULLS FIRST""".stripMargin

  /** Q55 — deterministic ordered string aggregation: sorted distinct list
    * joined with a separator (collect_set order is engine-private, so the
    * hashable form sorts before joining).
    */
  def q55(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.documents
      .groupBy(col("lang"))
      .agg(array_join(array_sort(collect_set(col("source"))), ",").as("sources"))
      .orderBy(asc_nulls_first("lang"))
  }

  val q55Oracle: String =
    """SELECT lang,
      |  array_to_string(list_sort(list(DISTINCT source)), ',') AS sources
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang NULLS FIRST""".stripMargin

  /** Q58 — unpivot / melt: wide per-flag measure columns back to long
    * (measure, value) rows via the native unpivot operator.
    */
  def q58(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(col("l_quantity")), 4).as("qty"),
        round(sum(col("l_extendedprice")), 4).as("price"),
        round(sum(col("l_tax")), 4).as("tax"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("qty"), col("price"), col("tax")),
        "measure", "value")
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("measure"))
  }

  val q58Oracle: String =
    """WITH wide AS (
      |  SELECT l_returnflag,
      |    ROUND(SUM(l_quantity), 4) AS qty,
      |    ROUND(SUM(l_extendedprice), 4) AS price,
      |    ROUND(SUM(l_tax), 4) AS tax
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, 'qty' AS measure, qty AS value FROM wide
      |UNION ALL
      |SELECT l_returnflag, 'price' AS measure, price AS value FROM wide
      |UNION ALL
      |SELECT l_returnflag, 'tax' AS measure, tax AS value FROM wide
      |ORDER BY l_returnflag NULLS FIRST, measure NULLS FIRST""".stripMargin

  /** Q62 — bivariate statistical aggregates: correlation, sample
    * covariance, and least-squares regression of extendedprice on
    * quantity per returnflag. All are single-pass partial-aggregable
    * moments (Σx, Σy, Σxy, Σx², n) — the same two-phase HashAggregate
    * shape as Q13, so they scale identically.
    */
  def q62(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qp"),
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("intercept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 4).as("r2"))
      .orderBy(asc_nulls_first("l_returnflag"))
  }

  val q62Oracle: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
      |  ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
      |  ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
      |  ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
      |  ROUND(regr_r2(l_extendedprice, l_quantity), 4) AS r2
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag NULLS FIRST""".stripMargin

  /** Q64 — FILTER-clause (conditional) aggregates + boolean aggregates
    * per order priority: one scan computes each measure over its own
    * predicate slice — the idiomatic replacement for N self-joins or
    * CASE-WHEN pyramids, and still a single two-phase hash aggregate.
    */
  def q64(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.orders
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_total"),
        expr("count(*) FILTER (WHERE o_orderstatus = 'F')").as("n_f"),
        round(expr("coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0.0)"), 4)
          .as("rev_f"),
        expr("count(*) FILTER (WHERE o_totalprice > 200000)").as("n_big"),
        expr("bool_and(o_orderstatus <> 'X')").as("never_x"),
        expr("bool_or(o_totalprice > 400000)").as("any_huge"))
      .orderBy(asc_nulls_first("o_orderpriority"))
  }

  val q64Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS n_total,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0.0), 4) AS rev_f,
      |  COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
      |  bool_and(o_orderstatus <> 'X') AS never_x,
      |  bool_or(o_totalprice > 400000) AS any_huge
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority NULLS FIRST""".stripMargin

  /** Q75 — explicit GROUPING SETS (beyond Q15 ROLLUP / Q16 CUBE: an
    * arbitrary set list, here with the "priority within status" detail
    * level skipped), via Spark 4's Dataset.groupingSets API. One Expand +
    * one two-phase aggregate — same single-shuffle plan family as
    * rollup/cube.
    */
  def q75(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).as("g_status"),
        grouping(col("o_orderpriority")).as("g_priority"),
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 4).as("total"))
      .orderBy(
        asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  }

  val q75Oracle: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  GROUPING(o_orderstatus) AS g_status,
      |  GROUPING(o_orderpriority) AS g_priority,
      |  COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Q90 — discrete percentiles (the SQL-standard WITHIN GROUP form):
    * unlike Q54's interpolated `percentile`, percentile_disc returns an
    * ACTUAL data value (smallest value with cume_dist ≥ p), so no
    * floating interpolation is involved and the cross-engine compare is
    * exact by construction.
    */
  def q90(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.orders
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50_disc"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").as("p90_disc"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("o_orderstatus"))
  }

  val q90Oracle: String =
    """SELECT o_orderstatus,
      |  quantile_disc(o_totalprice, 0.5) AS p50_disc,
      |  quantile_disc(o_totalprice, 0.9) AS p90_disc,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus NULLS FIRST""".stripMargin

  /** Q91 — top-k VALUES per group via the native bounded-heap aggregate
    * `graft_topk`: O(k) state per group per partition, map-side combined —
    * no per-group sort of all rows (the window row_number form sorts
    * everything). Top-k values of a multiset are merge-order-independent,
    * so the result is deterministic and hash-declared.
    */
  def q91(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.orders
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("graft_topk(o_totalprice, 3)").as("top3"),
        count(lit(1)).as("n"))
      .select(col("o_orderstatus"), posexplode(col("top3")), col("n"))
      .select(
        col("o_orderstatus"),
        (col("pos") + 1).cast("long").as("rnk"),
        round(col("col"), 4).as("v"),
        col("n"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("rnk"))
  }

  // Array outputs can't ride the driver's pandas hash (unhashable ndarray),
  // so the top-3 is exploded to (rnk, v) rows. Values are deterministic under
  // ties even though DuckDB's row_number row choice isn't: only the VALUES
  // are emitted, and the top-3 multiset of values is unique.
  val q91Oracle: String =
    """SELECT o_orderstatus, CAST(rnk AS BIGINT) AS rnk, ROUND(v, 4) AS v, n
      |FROM (
      |  SELECT o_orderstatus, o_totalprice AS v,
      |    row_number() OVER (PARTITION BY o_orderstatus
      |                       ORDER BY o_totalprice DESC) AS rnk,
      |    COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      |  FROM orders) t
      |WHERE rnk <= 3
      |ORDER BY o_orderstatus NULLS FIRST, rnk NULLS FIRST""".stripMargin

  /** Q93 — robust dispersion: median absolute deviation around the median
    * per group (two exact-percentile passes: per-group median, then the
    * median of absolute deviations), plus the classic MAD/stddev
    * comparison column. Outliers move stddev, not MAD.
    */
  def q93(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val med = c.orders.groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("med"))
    c.orders
      .join(broadcast(med), Seq("o_orderstatus"))
      .withColumn("absdev", abs(col("o_totalprice") - col("med")))
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(absdev, 0.5)"), 4).as("mad"),
        round(stddev_samp(col("o_totalprice")), 4).as("sd"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("o_orderstatus"))
  }

  val q93Oracle: String =
    """WITH med AS (
      |  SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS med
      |  FROM orders GROUP BY o_orderstatus)
      |SELECT o.o_orderstatus AS o_orderstatus,
      |  ROUND(quantile_cont(ABS(o_totalprice - med), 0.5), 4) AS mad,
      |  ROUND(STDDEV_SAMP(o_totalprice), 4) AS sd,
      |  COUNT(*) AS n
      |FROM orders o JOIN med m ON o.o_orderstatus = m.o_orderstatus
      |GROUP BY o.o_orderstatus
      |ORDER BY o.o_orderstatus NULLS FIRST""".stripMargin

  /** Q110 — explicit GROUPING SETS (the general form Q15's ROLLUP and
    * Q16's CUBE are shorthands of): the four sets ((rf,ls),(rf),(ls),())
    * via the Spark 4 `groupingSets` DataFrame API. Same single Expand +
    * hash-aggregate plan class as ROLLUP/CUBE — one pass, rows replicated
    * only per requested set.
    */
  def q110(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.lineitem
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"),
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 4).as("sum_qty"))
      .orderBy(
        asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  val q110Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
      |  COUNT(*) AS n, ROUND(SUM(l_quantity), 4) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Q274 — order-to-ship latency profile per order priority: the
    * operational SLA read (how long from order to first shipment, and
    * does priority actually buy speed?). Latency is the exact integer
    * day difference ship − order per lineitem; per priority the gate
    * reports n, min/max, rank-picked lower median and p90 (the
    * Q54/Q114 discrete-percentile discipline — ranks (n+1) DIV 2 and
    * ⌈9n/10⌉ computed in pure ints, value at a rank boundary is
    * tie-invariant), mean (one divide), and the > 60-day late share
    * decided on exact counts.
    *
    * Determinism: both date columns are midnight-aligned day
    * timestamps, so datediff is exact int; every reported number is an
    * int, a rank-picked int, or one rounded divide.
    *
    * Scale notes: one orders⇄lineitem equi-join (orderkey — the
    * natural co-partition key), then per-priority windows in the
    * joined domain. At 100 TB the join is the bucketed-layout case;
    * percentile ranks partition by the 5-value priority key.
    */
  def q274(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val lat = c.lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(c.orders.select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
          .as("lat"))
    val w = Window.partitionBy(col("priority"))
    val ranked = lat
      .withColumn("rk", row_number().over(w.orderBy(asc("lat"))).cast("long"))
      .withColumn("n", count(lit(1)).over(w).cast("long"))
    val picks = ranked
      .withColumn("med_rk", expr("(n + 1) DIV 2"))
      .withColumn("p90_rk", expr("(9 * n + 9) DIV 10"))
      .groupBy(col("priority"), col("n"))
      .agg(
        max(when(col("rk") === col("med_rk"), col("lat"))).as("p50_days"),
        max(when(col("rk") === col("p90_rk"), col("lat"))).as("p90_days"))
    val sums = lat.groupBy(col("priority"))
      .agg(min(col("lat")).as("min_days"), max(col("lat")).as("max_days"),
        sum(col("lat")).cast("long").as("lat_sum"),
        sum(when(col("lat") > 60, 1L).otherwise(0L)).cast("long")
          .as("n_late"))
    picks.join(sums, Seq("priority"))
      .withColumn("mean_days",
        round(col("lat_sum").cast("double") / col("n"), 4))
      .withColumn("late_share",
        round(col("n_late").cast("double") / col("n"), 6))
      .select(col("priority"), col("n").as("n_lines"), col("min_days"),
        col("p50_days"), col("p90_days"), col("max_days"),
        col("mean_days"), col("n_late"), col("late_share"))
      .orderBy(asc_nulls_first("priority"))
  }

  val q274Oracle: String =
    """WITH lat AS (
      |  SELECT o.o_orderpriority AS priority,
      |    CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
      |      AS lat
      |  FROM lineitem l
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey),
      |ranked AS (
      |  SELECT priority, lat,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY priority ORDER BY lat)
      |      AS BIGINT) AS rk,
      |    CAST(COUNT(*) OVER (PARTITION BY priority) AS BIGINT) AS n
      |  FROM lat),
      |picks AS (
      |  SELECT priority, n,
      |    MAX(CASE WHEN rk = (n + 1) // 2 THEN lat END) AS p50_days,
      |    MAX(CASE WHEN rk = (9 * n + 9) // 10 THEN lat END) AS p90_days
      |  FROM ranked GROUP BY 1, 2),
      |sums AS (
      |  SELECT priority, CAST(MIN(lat) AS BIGINT) AS min_days,
      |    CAST(MAX(lat) AS BIGINT) AS max_days,
      |    CAST(SUM(lat) AS BIGINT) AS lat_sum,
      |    CAST(SUM(CASE WHEN lat > 60 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_late
      |  FROM lat GROUP BY 1)
      |SELECT p.priority, p.n AS n_lines, s.min_days, p.p50_days,
      |  p.p90_days, s.max_days,
      |  ROUND(CAST(s.lat_sum AS DOUBLE) / p.n, 4) AS mean_days,
      |  s.n_late,
      |  ROUND(CAST(s.n_late AS DOUBLE) / p.n, 6) AS late_share
      |FROM picks p JOIN sums s ON s.priority = p.priority
      |ORDER BY p.priority NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q274" -> (q274 _),
    "Q13" -> (q13 _), "Q14" -> (q14 _), "Q15" -> (q15 _), "Q16" -> (q16 _),
    "Q17" -> (q17 _), "Q17b" -> (q17b _), "Q53" -> (q53 _), "Q54" -> (q54 _),
    "Q55" -> (q55 _), "Q58" -> (q58 _), "Q62" -> (q62 _), "Q64" -> (q64 _),
    "Q75" -> (q75 _), "Q90" -> (q90 _), "Q91" -> (q91 _), "Q93" -> (q93 _),
    "Q110" -> (q110 _))

  def oracles: Map[String, String] = Map(
    "Q13" -> q13Oracle, "Q14" -> q14Oracle, "Q15" -> q15Oracle,
    "Q16" -> q16Oracle, "Q17" -> q17Oracle, "Q17b" -> q17bOracle,
    "Q53" -> q53Oracle, "Q54" -> q54Oracle, "Q55" -> q55Oracle,
    "Q58" -> q58Oracle, "Q62" -> q62Oracle, "Q64" -> q64Oracle,
    "Q75" -> q75Oracle, "Q90" -> q90Oracle, "Q91" -> q91Oracle,
    "Q93" -> q93Oracle, "Q110" -> q110Oracle, "Q274" -> q274Oracle)
}
