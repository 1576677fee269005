package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog

/** Round-10 data-quality audit family: the warehouse-integrity gates a
  * 100 TB ingest pipeline runs BEFORE the analytics the rest of the
  * registry provides — referential integrity across the declared FK
  * graph (Q286), key-uniqueness across the declared PKs (Q287), and
  * domain-conformance rules (Q288). Each emits one exact-count row per
  * edge/key/rule with a clean/violating verdict; shares divide once,
  * rounded 6. On the synthetic fixtures every audit is clean — the
  * gate value is the machinery (the oracle proves the counting), and
  * the spec perturbs locally to prove violations surface.
  */
object Quality {

  /** Q286 — referential-integrity audit over the declared FK graph
    * (lineitem→orders/part/supplier, orders→customer,
    * customer/supplier→nation, nation→region, events→customer): per
    * edge, the child row count, orphan rows (no parent key), DISTINCT
    * orphan keys, and the orphan share. The audit a lakehouse ingest
    * runs after every load — FK violations upstream become silent
    * inner-join row loss downstream (the reason Q06-class outer joins
    * exist), so the edge list IS the operational contract.
    *
    * Determinism: each edge is one LEFT JOIN against the parent's
    * distinct-key relation with exact conditional counts; the share is
    * a single CAST-AS-DOUBLE divide rounded 6; output is one row per
    * edge, ordered by edge name.
    *
    * Scale notes: per edge one shuffle (or broadcast, for the
    * dimension parents — AQE picks) plus one aggregate; the 8 edges
    * union into a constant-height relation. Parent key relations are
    * distinct-collapsed before the join, so the probe is against the
    * smallest possible build side.
    */
  def q286(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    def edge(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame = {
      val pk = parent.select(col(parentKey).as("__pk")).distinct()
      child.select(col(childKey).as("__ck"))
        .join(pk, col("__ck") === col("__pk"), "left")
        .agg(count(lit(1)).cast("long").as("child_rows"),
          sum(when(col("__pk").isNull, 1L).otherwise(0L))
            .cast("long").as("orphan_rows"),
          countDistinct(when(col("__pk").isNull, col("__ck")))
            .cast("long").as("orphan_keys"))
        .select(lit(name).as("edge"), col("child_rows"),
          col("orphan_rows"), col("orphan_keys"))
    }
    val edges = Seq(
      edge("customer.c_nationkey->nation", c.customer, "c_nationkey",
        c.nation, "n_nationkey"),
      edge("events.user_id->customer", c.events, "user_id",
        c.customer, "c_custkey"),
      edge("lineitem.l_orderkey->orders", c.lineitem, "l_orderkey",
        c.orders, "o_orderkey"),
      edge("lineitem.l_partkey->part", c.lineitem, "l_partkey",
        c.part, "p_partkey"),
      edge("lineitem.l_suppkey->supplier", c.lineitem, "l_suppkey",
        c.supplier, "s_suppkey"),
      edge("nation.n_regionkey->region", c.nation, "n_regionkey",
        c.region, "r_regionkey"),
      edge("orders.o_custkey->customer", c.orders, "o_custkey",
        c.customer, "c_custkey"),
      edge("supplier.s_nationkey->nation", c.supplier, "s_nationkey",
        c.nation, "n_nationkey"))
    edges.reduce(_.unionAll(_))
      .withColumn("orphan_share",
        expr("ROUND(CAST(orphan_rows AS DOUBLE) / child_rows, 6)"))
      .withColumn("verdict",
        when(col("orphan_rows") === 0, "clean").otherwise("orphaned"))
      .orderBy(asc("edge"))
  }

  val q286Oracle: String = {
    def e(name: String, child: String, ck: String, parent: String,
        pk: String): String =
      s"""SELECT '$name' AS edge,
         |  CAST(COUNT(*) AS BIGINT) AS child_rows,
         |  CAST(SUM(CASE WHEN p.__pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS orphan_rows,
         |  CAST(COUNT(DISTINCT CASE WHEN p.__pk IS NULL THEN c.$ck END)
         |    AS BIGINT) AS orphan_keys
         |FROM $child c
         |LEFT JOIN (SELECT DISTINCT $pk AS __pk FROM $parent) p
         |  ON c.$ck = p.__pk""".stripMargin
    val parts = Seq(
      e("customer.c_nationkey->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      e("events.user_id->customer", "events", "user_id",
        "customer", "c_custkey"),
      e("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      e("lineitem.l_partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      e("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      e("nation.n_regionkey->region", "nation", "n_regionkey",
        "region", "r_regionkey"),
      e("orders.o_custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      e("supplier.s_nationkey->nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"))
    s"""WITH edges AS (
       |${parts.mkString("\nUNION ALL\n")})
       |SELECT edge, child_rows, orphan_rows, orphan_keys,
       |  ROUND(CAST(orphan_rows AS DOUBLE) / child_rows, 6)
       |    AS orphan_share,
       |  CASE WHEN orphan_rows = 0 THEN 'clean' ELSE 'orphaned' END
       |    AS verdict
       |FROM edges
       |ORDER BY edge""".stripMargin
  }

  /** Q287 — key-uniqueness audit over the declared primary keys of all
    * ten tables (composite (l_orderkey, l_linenumber) for lineitem):
    * per key, the row count, distinct key count, keys observed more
    * than once, and the worst multiplicity. Duplicate PKs are the
    * upstream defect that silently doubles every downstream aggregate
    * — this is the audit that catches it at ingest. On the synthetic
    * fixtures the lineitem composite key is GENUINELY duplicated (the
    * generator draws linenumbers randomly) — the audit reports that
    * fact; QualitySpec pins the counts against an independent
    * recomputation.
    *
    * Determinism: one groupBy per table to per-key multiplicities,
    * then exact counts; one row per table, ordered by table name.
    *
    * Scale notes: each check is one hash aggregate on the key (the
    * same shuffle the table's PK joins already pay); the per-table
    * result is a single row, so the union is constant-height.
    */
  def q287(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    def check(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).cast("long").as("m"))
        .agg(sum(col("m")).cast("long").as("n_rows"),
          count(lit(1)).cast("long").as("n_keys"),
          sum(when(col("m") > 1, 1L).otherwise(0L))
            .cast("long").as("n_dup_keys"),
          max(col("m")).cast("long").as("max_multiplicity"))
        .select(lit(name).as("table_key"), col("n_rows"), col("n_keys"),
          col("n_dup_keys"), col("max_multiplicity"))
    val checks = Seq(
      check("customer(c_custkey)", c.customer, Seq("c_custkey")),
      check("documents(doc_id)", c.documents, Seq("doc_id")),
      check("embeddings(vec_id)", c.embeddings, Seq("vec_id")),
      check("events(event_id)", c.events, Seq("event_id")),
      check("lineitem(l_orderkey,l_linenumber)", c.lineitem,
        Seq("l_orderkey", "l_linenumber")),
      check("nation(n_nationkey)", c.nation, Seq("n_nationkey")),
      check("orders(o_orderkey)", c.orders, Seq("o_orderkey")),
      check("part(p_partkey)", c.part, Seq("p_partkey")),
      check("region(r_regionkey)", c.region, Seq("r_regionkey")),
      check("supplier(s_suppkey)", c.supplier, Seq("s_suppkey")))
    checks.reduce(_.unionAll(_))
      .withColumn("verdict",
        when(col("n_dup_keys") === 0, "unique").otherwise("duplicated"))
      .orderBy(asc("table_key"))
  }

  val q287Oracle: String = {
    def ck(name: String, table: String, keys: String): String =
      s"""SELECT '$name' AS table_key,
         |  CAST(SUM(m) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(SUM(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_keys,
         |  CAST(MAX(m) AS BIGINT) AS max_multiplicity
         |FROM (SELECT $keys, COUNT(*) AS m FROM $table GROUP BY $keys)""".stripMargin
    val parts = Seq(
      ck("customer(c_custkey)", "customer", "c_custkey"),
      ck("documents(doc_id)", "documents", "doc_id"),
      ck("embeddings(vec_id)", "embeddings", "vec_id"),
      ck("events(event_id)", "events", "event_id"),
      ck("lineitem(l_orderkey,l_linenumber)", "lineitem",
        "l_orderkey, l_linenumber"),
      ck("nation(n_nationkey)", "nation", "n_nationkey"),
      ck("orders(o_orderkey)", "orders", "o_orderkey"),
      ck("part(p_partkey)", "part", "p_partkey"),
      ck("region(r_regionkey)", "region", "r_regionkey"),
      ck("supplier(s_suppkey)", "supplier", "s_suppkey"))
    s"""WITH checks AS (
       |${parts.mkString("\nUNION ALL\n")})
       |SELECT table_key, n_rows, n_keys, n_dup_keys, max_multiplicity,
       |  CASE WHEN n_dup_keys = 0 THEN 'unique' ELSE 'duplicated' END
       |    AS verdict
       |FROM checks
       |ORDER BY table_key""".stripMargin
  }

  /** Q288 — domain-conformance audit: ten declared value rules across
    * five tables (quantity/price positivity, discount/tax ranges,
    * status and priority enums, part-size bounds, the documents
    * n_chars = length(text) derived-column consistency, embedding
    * label domain, event value positivity). Per rule: rows checked,
    * violations, share, verdict. The enum and range fences are the
    * contract the loaders promise; a nonzero row here is a loader bug,
    * not a data fact.
    *
    * Determinism: every rule is one exact conditional count; rules
    * over one table fold into ONE scan via a multi-conditional
    * aggregate unpivoted to rows (the engine never scans a table
    * twice); shares divide once, rounded 6.
    *
    * Scale notes: five table scans total for ten rules; each scan is
    * a map-side-combined aggregate with no shuffle beyond the final
    * single-row exchange per table.
    */
  def q288(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    // lineitem: four rules, one scan
    val li = c.lineitem.agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(col("l_quantity") < 1, 1L).otherwise(0L))
        .cast("long").as("v1"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.5, 1L)
        .otherwise(0L)).cast("long").as("v2"),
      sum(when(col("l_tax") < 0, 1L).otherwise(0L)).cast("long").as("v3"),
      sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L))
        .cast("long").as("v4"))
      .selectExpr("stack(4, " +
        "'lineitem: l_quantity >= 1', n, v1, " +
        "'lineitem: 0 <= l_discount <= 0.5', n, v2, " +
        "'lineitem: l_tax >= 0', n, v3, " +
        "'lineitem: l_extendedprice > 0', n, v4) " +
        "AS (rule, n_rows, n_violations)")
    val ord = c.orders.agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
        .otherwise(0L)).cast("long").as("v1"),
      sum(when(!(substring(col("o_orderpriority"), 1, 1).isin(
        "1", "2", "3", "4", "5") &&
        substring(col("o_orderpriority"), 2, 1) === "-"), 1L)
        .otherwise(0L)).cast("long").as("v2"))
      .selectExpr("stack(2, " +
        "'orders: o_orderstatus in (O,F,P)', n, v1, " +
        "'orders: o_orderpriority like [1-5]-*', n, v2) " +
        "AS (rule, n_rows, n_violations)")
    val pt = c.part.agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(col("p_size") < 1 || col("p_size") > 50, 1L).otherwise(0L))
        .cast("long").as("v1"))
      .selectExpr("stack(1, " +
        "'part: 1 <= p_size <= 50', n, v1) " +
        "AS (rule, n_rows, n_violations)")
    val dc = c.documents.agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
        .cast("long").as("v1"))
      .selectExpr("stack(1, " +
        "'documents: n_chars = length(text)', n, v1) " +
        "AS (rule, n_rows, n_violations)")
    val em = c.embeddings.agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(col("label") < 0 || col("label") > 9, 1L).otherwise(0L))
        .cast("long").as("v1"))
      .selectExpr("stack(1, " +
        "'embeddings: 0 <= label <= 9', n, v1) " +
        "AS (rule, n_rows, n_violations)")
    val ev = c.events.agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(col("value") <= 0, 1L).otherwise(0L))
        .cast("long").as("v1"))
      .selectExpr("stack(1, " +
        "'events: value > 0', n, v1) " +
        "AS (rule, n_rows, n_violations)")
    Seq(li, ord, pt, dc, em, ev).reduce(_.unionAll(_))
      .select(col("rule"), col("n_rows").cast("long").as("n_rows"),
        col("n_violations").cast("long").as("n_violations"))
      .withColumn("violation_share",
        expr("ROUND(CAST(n_violations AS DOUBLE) / n_rows, 6)"))
      .withColumn("verdict",
        when(col("n_violations") === 0, "conforming")
          .otherwise("violations"))
      .orderBy(asc("rule"))
  }

  val q288Oracle: String =
    """WITH rules AS (
      |SELECT 'lineitem: l_quantity >= 1' AS rule,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN l_quantity < 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violations
      |FROM lineitem
      |UNION ALL
      |SELECT 'lineitem: 0 <= l_discount <= 0.5', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.5
      |    THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'lineitem: l_tax >= 0', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'lineitem: l_extendedprice > 0', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
      |    AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'orders: o_orderstatus in (O,F,P)', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
      |    THEN 1 ELSE 0 END) AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'orders: o_orderpriority like [1-5]-*', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN NOT (substring(o_orderpriority, 1, 1)
      |      IN ('1', '2', '3', '4', '5')
      |      AND substring(o_orderpriority, 2, 1) = '-')
      |    THEN 1 ELSE 0 END) AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'part: 1 <= p_size <= 50', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN p_size < 1 OR p_size > 50 THEN 1 ELSE 0 END)
      |    AS BIGINT)
      |FROM part
      |UNION ALL
      |SELECT 'documents: n_chars = length(text)', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
      |    AS BIGINT)
      |FROM documents
      |UNION ALL
      |SELECT 'embeddings: 0 <= label <= 9', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN label < 0 OR label > 9 THEN 1 ELSE 0 END)
      |    AS BIGINT)
      |FROM embeddings
      |UNION ALL
      |SELECT 'events: value > 0', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN value <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |FROM events)
      |SELECT rule, n_rows, n_violations,
      |  ROUND(CAST(n_violations AS DOUBLE) / n_rows, 6)
      |    AS violation_share,
      |  CASE WHEN n_violations = 0 THEN 'conforming' ELSE 'violations' END
      |    AS verdict
      |FROM rules
      |ORDER BY rule""".stripMargin

  /** Q324 — order-total reconciliation audit: per order, rebuild the
    * book total from its lines as Σ ROUND(extprice·(1−disc)·(1+tax)·
    * 100) cents and band the discrepancy against ROUND(o_totalprice·
    * 100) into exact relative-error buckets (0 / ≤0.1% / ≤1% / ≤10% /
    * >10% / no_lines). The cross-table ARITHMETIC invariant beside the
    * ingest trio — Q286 checks keys exist, Q287 that they're unique,
    * Q288 that values conform; this checks the MONEY adds up, the
    * audit every revenue pipeline runs first.
    *
    * Determinism: each line's cents value is one fixed ROUND of a
    * fixed double product (identical text both engines); order sums,
    * diffs and EVERY bucket edge are exact int64 — banding is integer
    * cross-multiplication (|d|·1000 ≤ book ⟺ rel ≤ 0.1%), no float
    * thresholds anywhere; share is one single-divide float rounded 6.
    *
    * Scale notes: one lineitem aggregate keyed on orderkey (map-side
    * combined), one join to orders on the SAME key (co-partitioned
    * exchange reuse), then a hash aggregate onto 6 bucket keys. The
    * bucket relation is O(1) at any scale; |d|·1000 holds int64 to
    * ~10¹⁵-cent orders.
    */
  def q324(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val recon = c.lineitem
      .select(col("l_orderkey"),
        expr("CAST(ROUND(l_extendedprice * (1 - l_discount) * " +
          "(1 + l_tax) * 100, 0) AS BIGINT)").as("line_cents"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("line_cents")).as("recon_cents"))
    val joined = c.orders
      .select(col("o_orderkey"),
        expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
          .as("book_cents"))
      .join(recon, col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("ad",
        abs(col("book_cents") - coalesce(col("recon_cents"), lit(0L))))
      .withColumn("bucket", expr("CASE " +
        "WHEN recon_cents IS NULL THEN 'no_lines' " +
        "WHEN ad = 0 THEN 'exact' " +
        "WHEN ad * 1000 <= book_cents THEN 'within_0_1pct' " +
        "WHEN ad * 100 <= book_cents THEN 'within_1pct' " +
        "WHEN ad * 10 <= book_cents THEN 'within_10pct' " +
        "ELSE 'over_10pct' END"))
    val tot = joined.agg(count(lit(1)).as("n_orders_total"))
    joined.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("recon_cents").isNotNull, col("ad")).otherwise(0L))
          .as("total_abs_diff_cents"),
        max(when(col("recon_cents").isNotNull, col("ad")).otherwise(0L))
          .as("max_abs_diff_cents"))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_orders"),
        col("total_abs_diff_cents"), col("max_abs_diff_cents"),
        expr("ROUND(CAST(n_orders AS DOUBLE) / n_orders_total, 6)")
          .as("share"))
      .orderBy(asc_nulls_first("bucket"))
  }

  val q324Oracle: String =
    """WITH recon AS (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) *
      |      (1 + l_tax) * 100, 0) AS BIGINT)) AS BIGINT) AS recon_cents
      |  FROM lineitem GROUP BY 1),
      |joined AS (
      |  SELECT o.o_orderkey,
      |    CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS book_cents,
      |    r.recon_cents,
      |    ABS(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
      |      - COALESCE(r.recon_cents, 0)) AS ad
      |  FROM orders o LEFT JOIN recon r ON r.l_orderkey = o.o_orderkey),
      |bucketed AS (
      |  SELECT CASE
      |    WHEN recon_cents IS NULL THEN 'no_lines'
      |    WHEN ad = 0 THEN 'exact'
      |    WHEN ad * 1000 <= book_cents THEN 'within_0_1pct'
      |    WHEN ad * 100 <= book_cents THEN 'within_1pct'
      |    WHEN ad * 10 <= book_cents THEN 'within_10pct'
      |    ELSE 'over_10pct' END AS bucket,
      |    recon_cents, ad
      |  FROM joined),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders_total
      |        FROM joined)
      |SELECT b.bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CASE WHEN b.recon_cents IS NOT NULL THEN b.ad
      |    ELSE 0 END) AS BIGINT) AS total_abs_diff_cents,
      |  CAST(MAX(CASE WHEN b.recon_cents IS NOT NULL THEN b.ad
      |    ELSE 0 END) AS BIGINT) AS max_abs_diff_cents,
      |  ROUND(CAST(COUNT(*) AS DOUBLE) / t.n_orders_total, 6) AS share
      |FROM bucketed b, tot t
      |GROUP BY b.bucket, t.n_orders_total
      |ORDER BY b.bucket NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q286" -> (q286 _), "Q287" -> (q287 _), "Q288" -> (q288 _),
    "Q324" -> (q324 _))

  def oracles: Map[String, String] = Map(
    "Q286" -> q286Oracle, "Q287" -> q287Oracle, "Q288" -> q288Oracle,
    "Q324" -> q324Oracle)
}
