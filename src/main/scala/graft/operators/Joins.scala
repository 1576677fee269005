package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Catalog

/** Join operators, every flavor (SURVEY.md §2.3): broadcast/shuffle equi,
  * multi-way, outer, semi, anti, cross+theta, range (interval), as-of.
  *
  * Scale notes:
  *  - Small dimensions (customer, nation) are explicitly `broadcast()` so the
  *    big fact side never shuffles (BroadcastHashJoin — no exchange on the
  *    100 TB side).
  *  - Big-big joins (Q05 orders⋈lineitem) shuffle on the join key once;
  *    AQE picks SMJ/SHJ and splits skewed partitions at runtime.
  *  - The range join (Q11) is an equi join on user_id with a range residual:
  *    rows co-partition by user so the interval scan stays partition-local.
  *  - The as-of join (Q12) is a single window pass (one shuffle on user_id),
  *    not an O(n²) self-join.
  */
object Joins {

  /** Q04 — inner equi join, broadcast dimension. */
  def q04(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.orders
      .join(broadcast(c.customer), col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("total"))
      .orderBy(asc_nulls_first("c_mktsegment"))
  }

  val q04Oracle: String =
    """SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment NULLS FIRST""".stripMargin

  /** Q05 — multi-way join, TPC-H Q3 shape, top-10 by revenue. */
  def q05(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    broadcast(c.customer.filter(col("c_mktsegment") === "BUILDING"))
      .join(c.orders.filter(col("o_orderdate") < to_timestamp(lit("1996-07-01"))),
        col("c_custkey") === col("o_custkey"))
      .join(c.lineitem.filter(col("l_shipdate") > to_timestamp(lit("1996-07-01"))),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .orderBy(desc_nulls_last("revenue"), asc_nulls_first("l_orderkey"))
      .limit(10)
  }

  val q05Oracle: String =
    """SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-07-01 00:00:00'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC NULLS LAST, l_orderkey NULLS FIRST
      |LIMIT 10""".stripMargin

  /** Q06 — left outer join; order-count histogram incl. childless customers. */
  def q06(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.customer
      .join(c.orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("order_count"))
      .groupBy(col("order_count"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(asc_nulls_first("order_count"))
  }

  val q06Oracle: String =
    """SELECT order_count, COUNT(*) AS n_customers
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS order_count
      |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |  GROUP BY c_custkey
      |)
      |GROUP BY order_count
      |ORDER BY order_count NULLS FIRST""".stripMargin

  /** Q07 — full outer join; left-only / right-only / both classification. */
  def q07(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val l = c.events.select(col("user_id")).distinct()
    val r = c.customer.select((col("c_custkey") % 100).as("k")).distinct()
    l.join(r, col("user_id") === col("k"), "full")
      .select(
        when(col("user_id").isNull, "right_only")
          .when(col("k").isNull, "left_only")
          .otherwise("both").as("cls"))
      .groupBy(col("cls")).agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("cls"))
  }

  val q07Oracle: String =
    """SELECT CASE WHEN user_id IS NULL THEN 'right_only'
      |            WHEN k IS NULL THEN 'left_only'
      |            ELSE 'both' END AS cls, COUNT(*) AS n
      |FROM (SELECT DISTINCT user_id FROM events) l
      |FULL JOIN (SELECT DISTINCT c_custkey % 100 AS k FROM customer) r
      |  ON user_id = k
      |GROUP BY 1
      |ORDER BY cls NULLS FIRST""".stripMargin

  /** Q08 — left semi join: customers with ≥1 urgent order, per segment. */
  def q08(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.customer
      .join(c.orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("c_mktsegment"))
  }

  val q08Oracle: String =
    """SELECT c_mktsegment, COUNT(*) AS n
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment NULLS FIRST""".stripMargin

  /** Q09 — left anti join: customers with no orders — per-segment counts
    * plus an always-present 'TOTAL' row (a global aggregate emits exactly
    * one row even over empty input in both engines; ROLLUP does not in
    * Spark, so the total is a UNION ALL of a grand aggregate).
    */
  def q09(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val anti = c.customer
      .join(c.orders, col("c_custkey") === col("o_custkey"), "left_anti")
    anti.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .unionAll(anti.agg(lit("TOTAL").as("c_mktsegment"), count(lit(1)).as("n")))
      .orderBy(asc_nulls_first("c_mktsegment"))
  }

  val q09Oracle: String =
    """WITH no_orders AS (
      |  SELECT * FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
      |SELECT c_mktsegment, COUNT(*) AS n FROM no_orders GROUP BY c_mktsegment
      |UNION ALL
      |SELECT 'TOTAL' AS c_mktsegment, COUNT(*) AS n FROM no_orders
      |ORDER BY c_mktsegment NULLS FIRST""".stripMargin

  /** Q10 — cross join + theta predicate: same-region nation pairs. */
  def q10(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val n1 = c.nation.select(col("n_nationkey").as("k1"), col("n_regionkey").as("r1"))
    val n2 = c.nation.select(col("n_nationkey").as("k2"), col("n_regionkey").as("r2"))
    n1.crossJoin(n2)
      .filter(col("r1") === col("r2") && col("k1") < col("k2"))
      .groupBy(col("r1").as("n_regionkey")).agg(count(lit(1)).as("pairs"))
      .orderBy(asc_nulls_first("n_regionkey"))
  }

  val q10Oracle: String =
    """SELECT n1.n_regionkey AS n_regionkey, COUNT(*) AS pairs
      |FROM nation n1 CROSS JOIN nation n2
      |WHERE n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
      |GROUP BY 1
      |ORDER BY n_regionkey NULLS FIRST""".stripMargin

  /** Q11 — range (interval) join: view → purchase conversion within 30 min.
    * Equi on user_id + range residual on epoch-µs; co-partitioned by user.
    */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val e = c.events.select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("us"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("us").as("v_us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("us").as("p_us"))
    v.join(p,
        col("v_user") === col("p_user") &&
        col("p_us") > col("v_us") &&
        col("p_us") <= col("v_us") + lit(1800000000L))
      .groupBy(col("v_user").as("user_id")).agg(count(lit(1)).as("pairs"))
      .orderBy(asc_nulls_first("user_id"))
  }

  val q11Oracle: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events)
      |SELECT v.user_id AS user_id, COUNT(*) AS pairs
      |FROM e v JOIN e p
      |  ON v.user_id = p.user_id
      | AND v.event_type = 'view' AND p.event_type = 'purchase'
      | AND p.us > v.us AND p.us <= v.us + 1800000000
      |GROUP BY 1
      |ORDER BY user_id NULLS FIRST""".stripMargin

  /** Q12 — as-of join via a single window pass: for each purchase, the most
    * recent prior event of any other type by the same user; count per prior
    * event type. Epoch-µs ordering with event_id tiebreak so both engines
    * agree (DuckDB reads ts truncated to µs — never order on raw ns).
    */
  def q12(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val e = c.events.select(
      col("user_id"), col("event_id"), col("event_type"), expr("ts DIV 1000").as("us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(asc("us"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("prior_type",
        last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("prior_type").isNotNull)
      .groupBy(col("prior_type")).agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("prior_type"))
  }

  val q12Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_type
      |  FROM events)
      |SELECT prior_type, COUNT(*) AS n
      |FROM e
      |WHERE event_type = 'purchase' AND prior_type IS NOT NULL
      |GROUP BY prior_type
      |ORDER BY prior_type NULLS FIRST""".stripMargin

  /** Generic as-of join (API form of Q12): for every left row, attach the
    * latest right row with right time ≤ (or < when `strict`) left time,
    * within the same `on` keys.
    *
    * Union-sort-fill, the scalable pattern: tag both inputs, union them,
    * sort once per key group, and carry the last-seen right values forward
    * with an ignore-nulls window. One shuffle on the key — no row-by-row
    * probing, no O(n²) self-join, works at any skew because the window is
    * partition-local after the shuffle.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val l = left
      .withColumn("_t", col(leftTime).cast("long"))
      .withColumn("_src", lit(1))
    val keep = rightCols.map(c => col(c).as(s"_r_$c"))
    val r = right
      .select((on.map(col) ++ Seq(col(rightTime).cast("long").as("_t")) ++ keep): _*)
      .withColumn("_src", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows at equal time unless strict,
    // so ties attach (≤ semantics) or don't (<).
    val srcOrder = if (strict) desc("_src") else asc("_src")
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(asc("_t"), srcOrder)
      .rowsBetween(Window.unboundedPreceding, -1)
    val filled = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("_src") === 1)
      .drop((rightCols.map(c => s"_r_$c") :+ "_t" :+ "_src"): _*)
  }

  /** Native as-of join through the custom physical operator
    * (graft.plans.AsOfJoinExec): for each left row, the latest right
    * `rightValue` with right time ≤ left time on the same key. Key and
    * time columns must be LongType; the strategy must be registered
    * (graft.Catalog does, or GraftExtensions at session build).
    */
  def asofJoinNative(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValue: String,
      outName: String = "asof_value"): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val spark = left.sparkSession
    graft.plans.GraftExtensions.registerRuntime(spark)
    val lPlan = left.queryExecution.analyzed
    // Fresh aliases on the right side: if both inputs derive from the same
    // base relation they share ExprIds, and (unlike Join) a custom node
    // gets no analyzer self-join deduplication — column pruning would then
    // credit the right side's references to the left child.
    val rFresh = right.select(right.columns.map(c => col(c).as(s"__r_$c")).toIndexedSeq: _*)
    val rPlan = rFresh.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    // Analysis-time contract check: the merge loop compares key/time as
    // Long primitives, so reject anything else here with a clear message
    // rather than a runtime ClassCastException inside a task.
    def requireLong(a: org.apache.spark.sql.catalyst.expressions.Attribute, role: String): Unit =
      require(a.dataType == org.apache.spark.sql.types.LongType,
        s"asofJoinNative: $role column '${a.name}' must be LongType, got ${a.dataType}")
    val rv = attr(rPlan, s"__r_$rightValue")
    Seq(attr(lPlan, key) -> "left key", attr(lPlan, leftTime) -> "left time",
      attr(rPlan, s"__r_$key") -> "right key", attr(rPlan, s"__r_$rightTime") -> "right time")
      .foreach { case (a, role) => requireLong(a, role) }
    val out = AttributeReference(outName, rv.dataType, nullable = true)()
    org.apache.spark.sql.GraftSqlShims.ofRows(spark,
      graft.plans.AsOfJoinPlan(
        lPlan, rPlan,
        attr(lPlan, key), attr(lPlan, leftTime),
        attr(rPlan, s"__r_$key"), attr(rPlan, s"__r_$rightTime"),
        rv, out))
  }

  /** Q92 — purchase→latest-prior-view attribution through the NATIVE
    * as-of physical operator (AsOfJoinExec: one shuffle per side, sorted
    * two-pointer merge, O(1) carried state), hash-checked against DuckDB's
    * built-in ASOF LEFT JOIN — the custom SparkPlan itself sits inside the
    * correctness gate, not just its unit specs. The carried value is the
    * matched view's own timestamp, so equal-time ties cannot produce an
    * ambiguous output.
    */
  def q92(spark: SparkSession, dir: String): DataFrame = {
    val c = graft.Catalog(spark, dir)
    val e = c.events.select(col("user_id"), col("event_id"),
      col("event_type"), expr("ts DIV 1000").as("us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("us"))
    asofJoinNative(purchases, views, key = "user_id",
      leftTime = "us", rightTime = "us", rightValue = "us", outName = "view_us")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        count(col("view_us")).as("n_matched"),
        round(avg((col("us") - col("view_us")) / 1000000.0), 4).as("avg_gap_sec"))
      .orderBy(asc_nulls_first("user_id"))
  }

  val q92Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |p AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'purchase'),
      |v AS (SELECT user_id, us AS view_us FROM e WHERE event_type = 'view')
      |SELECT p.user_id AS user_id, COUNT(*) AS n_purchases,
      |  COUNT(view_us) AS n_matched,
      |  ROUND(AVG((p.us - view_us) / 1000000.0), 4) AS avg_gap_sec
      |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.view_us <= p.us
      |GROUP BY p.user_id
      |ORDER BY user_id NULLS FIRST""".stripMargin

  /** Skew-salted inner equi join: replicate the (small-enough) right side
    * `salt` times and scatter left rows across salt buckets, so one hot
    * key's rows spread over `salt` reducers instead of one straggler
    * partition. AQE's skew-join split handles moderate skew on its own;
    * salting is the explicit lever when a single key dominates (SURVEY §4).
    * Result is row-identical to a plain inner join on `key`.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)).cast("int"))
    val saltedRight = right
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Bloom-prefiltered semi join: build a Bloom filter over the small
    * side's keys (tree-aggregated to the driver by `stat.bloomFilter` —
    * O(bits) transferred, never the rows) and apply it to the big side as
    * a map-side predicate BEFORE any shuffle/join. False positives
    * (bounded by `fpp`) are eliminated by the real semi join that
    * follows; false negatives cannot occur, so semantics are exactly
    * `left SEMI JOIN right ON key`.
    *
    * 100 TB role: when the small side is too big to broadcast as a hash
    * relation but its key set fits a few-hundred-MB filter, this turns
    * "shuffle 100 TB by key" into "shuffle the ~matching fraction" — the
    * manual form of the runtime row-level filtering Spark applies to
    * shuffle joins, made explicit and composable (e.g. in front of
    * incremental-dedup candidate joins).
    */
  def bloomSemiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val filter = small.stat.bloomFilter(key, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    // Codegen'd probe (plans.BloomMightContain): the prefilter stays
    // fused inside the scan's WholeStageCodegen span instead of breaking
    // it with a boxing Scala UDF. Key-type support is checked at analysis
    // time by the expression; NULL keys propagate to NULL → rejected.
    graft.plans.GraftExtensions.registerRuntime(big.sparkSession)
    big.filter(call_function("graft_bloom_might_contain", col(key), lit(bos.toByteArray)))
      .join(small.select(col(key)).distinct(), Seq(key), "left_semi")
  }

  /** Skew-aware join: detect hot keys with the Misra–Gries sketch (one
    * pass, O(k) state — anything above `hotShare` + n/(k+1) of the left
    * side is guaranteed caught), then salt ONLY the hot keys and join the
    * cold remainder normally. Differential salting beats salting
    * everything: the cold path keeps its clean hash join (no right-side
    * explosion), while the hot keys — the rows that would have pinned one
    * task — spread across `salt` partitions.
    *
    * Result is row-identical to `left JOIN right ON key` (the hot/cold
    * split partitions the key space; proven in ScaleHygieneSpec).
    */
  def skewAwareJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salt: Int = 8,
      sketchK: Int = 64,
      hotShare: Double = 0.01,
      leftCount: Long = -1L): DataFrame = {
    graft.plans.GraftExtensions.registerRuntime(left.sparkSession)
    // Detection threshold needs |left|; pass `leftCount` when the caller
    // already knows it (table stats, a prior action) to save the extra
    // column-pruned counting pass over the left side.
    val n = if (leftCount >= 0) leftCount else left.count()
    val hot = left.select(col(key).cast("string").as("k"))
      .agg(call_function("graft_heavy_hitters", col("k"), lit(sketchK)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))
      .filter(col("est") > lit(n * hotShare))
      .collect().map(_.getString(0)).toSeq
    if (hot.isEmpty) left.join(right, Seq(key), "inner")
    else {
      val isHot = col(key).cast("string").isin(hot: _*)
      saltedJoin(left.filter(isHot), right.filter(isHot), key, salt)
        .unionByName(
          left.filter(!isHot).join(right.filter(!isHot), Seq(key), "inner"))
    }
  }

  /** Q177 — intra-region market share by customer region and order year
    * (the TPC-H Q8 "national market share" shape generalized to every
    * region at once): of the lineitem revenue bought by each region's
    * customers each year, the share supplied from WITHIN that region.
    * Exercises the planner's dual-role dimension handling — nation and
    * region each join twice under different roles (customer side,
    * supplier side) — plus conditional aggregation over a 6-table star.
    *
    * Money discipline: revenue is exact integer cents, rounded per ROW
    * with a pinned float shape ((price · (1 − discount)) · 100) that
    * both engines evaluate identically; sums are int64 (Q127 rule), and
    * the share is one final float divide rounded to 6.
    *
    * Scale notes: nation/region are tiny and explicitly broadcast in
    * both roles; supplier-region is broadcast against the fact; the
    * big lineitem⋈orders equi-join is the only real shuffle (AQE
    * broadcasts customer at test SF; at 100 TB the customer join
    * shuffles on the key, same plan shape). The rollup output is
    * bounded: regions × years.
    */
  def q177(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    def regionOf(role: String): DataFrame =
      c.nation.select(col("n_nationkey").as(s"${role}_nk"),
          col("n_regionkey").as(s"${role}_rk"))
        .join(broadcast(c.region.select(col("r_regionkey").as(s"${role}_rgk"),
          col("r_name").as(s"${role}_region"))),
          col(s"${role}_rk") === col(s"${role}_rgk"))
        .select(col(s"${role}_nk"), col(s"${role}_region"))
    val cust = c.customer.select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(regionOf("cu")), col("c_nationkey") === col("cu_nk"))
      .select(col("c_custkey"), col("cu_region"))
    val supp = c.supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(regionOf("su")), col("s_nationkey") === col("su_nk"))
      .select(col("s_suppkey"), col("su_region"))
    c.lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("CAST(ROUND((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)")
          .as("cents"))
      .join(c.orders.select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("yr")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("cu_region").as("region"), col("yr"))
      .agg(sum(col("cents")).as("total_cents"),
        sum(when(col("su_region") === col("cu_region"), col("cents"))
          .otherwise(0L)).as("intra_cents"))
      .withColumn("share",
        round(col("intra_cents").cast("double") /
          col("total_cents").cast("double"), 6))
      .orderBy(asc_nulls_first("region"), asc("yr"))
  }

  val q177Oracle: String =
    """WITH cust AS (
      |  SELECT c_custkey, r_name AS cu_region
      |  FROM customer
      |  JOIN nation ON n_nationkey = c_nationkey
      |  JOIN region ON r_regionkey = n_regionkey),
      |supp AS (
      |  SELECT s_suppkey, r_name AS su_region
      |  FROM supplier
      |  JOIN nation ON n_nationkey = s_nationkey
      |  JOIN region ON r_regionkey = n_regionkey)
      |SELECT cu.cu_region AS region,
      |  CAST(YEAR(o_orderdate) AS INT) AS yr,
      |  CAST(SUM(CAST(ROUND((l_extendedprice * (1.0 - l_discount)) * 100)
      |    AS BIGINT)) AS BIGINT) AS total_cents,
      |  CAST(SUM(CASE WHEN su.su_region = cu.cu_region
      |    THEN CAST(ROUND((l_extendedprice * (1.0 - l_discount)) * 100)
      |      AS BIGINT) ELSE 0 END) AS BIGINT) AS intra_cents,
      |  ROUND(CAST(SUM(CASE WHEN su.su_region = cu.cu_region
      |      THEN CAST(ROUND((l_extendedprice * (1.0 - l_discount)) * 100)
      |        AS BIGINT) ELSE 0 END) AS DOUBLE)
      |    / CAST(SUM(CAST(ROUND((l_extendedprice * (1.0 - l_discount)) * 100)
      |        AS BIGINT)) AS DOUBLE), 6) AS share
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN cust cu ON cu.c_custkey = o_custkey
      |JOIN supp su ON su.s_suppkey = l_suppkey
      |GROUP BY 1, 2
      |ORDER BY region NULLS FIRST, yr""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q04" -> (q04 _), "Q05" -> (q05 _), "Q06" -> (q06 _), "Q07" -> (q07 _),
    "Q08" -> (q08 _), "Q09" -> (q09 _), "Q10" -> (q10 _), "Q11" -> (q11 _),
    "Q12" -> (q12 _), "Q92" -> (q92 _), "Q177" -> (q177 _))

  def oracles: Map[String, String] = Map(
    "Q04" -> q04Oracle, "Q05" -> q05Oracle, "Q06" -> q06Oracle,
    "Q07" -> q07Oracle, "Q08" -> q08Oracle, "Q09" -> q09Oracle,
    "Q10" -> q10Oracle, "Q11" -> q11Oracle, "Q12" -> q12Oracle,
    "Q92" -> q92Oracle, "Q177" -> q177Oracle)
}
