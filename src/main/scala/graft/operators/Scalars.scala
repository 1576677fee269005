package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog

/** Scalar function families (SURVEY.md §2.8): string, regex, date/time,
  * math, array higher-order, JSON, map, explode/UDTF, scalar UDF.
  *
  * Scale notes: every function here except the C09 demo UDF is a built-in
  * Catalyst expression — codegen'd inside WholeStageCodegen, no
  * serialization boundary. Array math (Q30) uses higher-order functions
  * (`aggregate`/`transform`) which run over the array inline — no explode
  * shuffle for per-row vector math. The one Scala UDF (C09, `len2` in Q26)
  * exists to prove the UDF surface and is deliberately kept off hot paths.
  */
object Scalars {

  /** Q26 — string function family over part (+ C09 scalar UDF twin `len2`). */
  def q26(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val lenUdf = udf((s: String) => if (s == null) null else java.lang.Long.valueOf(s.length.toLong))
    c.part
      .filter(col("p_partkey") <= 50)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_name")).cast("long").as("name_len"),
        lenUdf(col("p_name")).as("len2"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), lit(" "), lit("_")).as("type_us"),
        trim(col("p_name")).as("name_trim"),
        lpad(col("p_size").cast("string"), 3, "0").as("size_pad"))
      .orderBy(asc_nulls_first("p_partkey"))
  }

  val q26Oracle: String =
    """SELECT p_partkey,
      |  UPPER(p_brand) AS brand_u,
      |  LOWER(p_type) AS type_l,
      |  SUBSTR(p_name, 1, 8) AS name8,
      |  LENGTH(p_name) AS name_len,
      |  LENGTH(p_name) AS len2,
      |  CONCAT(p_brand, '/', p_type) AS brand_type,
      |  REPLACE(p_type, ' ', '_') AS type_us,
      |  TRIM(p_name) AS name_trim,
      |  LPAD(CAST(p_size AS VARCHAR), 3, '0') AS size_pad
      |FROM part
      |WHERE p_partkey <= 50
      |ORDER BY p_partkey NULLS FIRST""".stripMargin

  /** Q27 — regex extract + regex predicate over part. */
  def q27(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.part
      .select(
        regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).cast("int").as("brand_num"),
        col("p_type"))
      .groupBy(col("brand_num"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("p_type").rlike("^PROMO"), 1L).otherwise(0L)).as("n_promo"))
      .orderBy(asc_nulls_first("brand_num"))
  }

  val q27Oracle: String =
    """SELECT CAST(REGEXP_EXTRACT(p_brand, 'Brand#([0-9]+)', 1) AS INTEGER) AS brand_num,
      |  COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN REGEXP_MATCHES(p_type, '^PROMO') THEN 1 ELSE 0 END) AS BIGINT) AS n_promo
      |FROM part
      |GROUP BY 1
      |ORDER BY brand_num NULLS FIRST""".stripMargin

  /** Q28 — date/time functions: ship delay per (year, quarter). */
  def q28(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.orders
      .join(c.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(
        year(col("o_orderdate")).cast("long").as("yr"),
        quarter(col("o_orderdate")).cast("long").as("qtr"))
      .agg(
        countDistinct(month(col("o_orderdate"))).as("n_months"),
        round(avg(datediff(col("l_shipdate"), col("o_orderdate"))), 4).as("avg_delay"))
      .orderBy(asc_nulls_first("yr"), asc_nulls_first("qtr"))
  }

  val q28Oracle: String =
    """SELECT YEAR(o_orderdate) AS yr, QUARTER(o_orderdate) AS qtr,
      |  COUNT(DISTINCT MONTH(o_orderdate)) AS n_months,
      |  ROUND(AVG(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_delay
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1, 2
      |ORDER BY yr NULLS FIRST, qtr NULLS FIRST""".stripMargin

  /** Q29 — math function family, aggregated to one row. */
  def q29(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.lineitem
      .filter(col("l_orderkey") <= 1000)
      .agg(
        round(sum(sqrt(col("l_quantity"))), 4).as("sum_sqrt"),
        round(sum(log(col("l_extendedprice"))), 4).as("sum_ln"),
        round(sum(pow(lit(1.0) + col("l_tax"), 2)), 4).as("sum_pow"),
        round(sum(abs(col("l_discount") - 0.05)), 4).as("sum_abs"),
        sum(ceil(col("l_extendedprice"))).as("sum_ceil"),
        sum(floor(col("l_extendedprice"))).as("sum_floor"),
        sum(col("l_linenumber") % 3).cast("long").as("sum_mod"))
  }

  val q29Oracle: String =
    """SELECT
      |  ROUND(SUM(SQRT(l_quantity)), 4) AS sum_sqrt,
      |  ROUND(SUM(LN(l_extendedprice)), 4) AS sum_ln,
      |  ROUND(SUM(POWER(1.0 + l_tax, 2)), 4) AS sum_pow,
      |  ROUND(SUM(ABS(l_discount - 0.05)), 4) AS sum_abs,
      |  CAST(SUM(CAST(CEIL(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_ceil,
      |  CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_floor,
      |  CAST(SUM(MOD(l_linenumber, 3)) AS BIGINT) AS sum_mod
      |FROM lineitem
      |WHERE l_orderkey <= 1000""".stripMargin

  /** Q30 — array higher-order functions: size, first element, L2 norm.
    * Float→double casts + natural left-to-right fold order, both engines.
    */
  def q30(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.embeddings
      .filter(col("vec_id") < 50)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
        round(sqrt(expr(
          "aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")), 4)
          .as("l2_norm"))
      .orderBy(asc_nulls_first("vec_id"))
  }

  val q30Oracle: String =
    """SELECT vec_id,
      |  LEN(embedding) AS dim,
      |  ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
      |  ROUND(SQRT(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
      |FROM embeddings
      |WHERE vec_id < 50
      |ORDER BY vec_id NULLS FIRST""".stripMargin

  /** Q31 — JSON extraction from the events.props string column. */
  def q31(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.events
      .groupBy(col("event_type"))
      .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q31Oracle: String =
    """SELECT event_type, CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q32 — map type exercised end-to-end: per-user event-type counts built
    * into a MAP, then exploded back to sorted entries (the hashable form —
    * map key order itself is engine-dependent).
    */
  def q32(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt")))).as("m"))
      .select(col("user_id"), explode(map_entries(col("m"))).as("entry"))
      .select(col("user_id"), col("entry.key").as("k"), col("entry.value").as("cnt"))
      .orderBy(asc_nulls_first("user_id"), asc_nulls_first("k"))
  }

  val q32Oracle: String =
    """SELECT user_id, event_type AS k, COUNT(*) AS cnt
      |FROM events
      |GROUP BY user_id, event_type
      |ORDER BY user_id NULLS FIRST, k NULLS FIRST""".stripMargin

  /** Q33 — explode / generator: token frequency over the whole corpus. */
  def q33(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.documents
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc_nulls_last("n"), asc_nulls_first("token"))
      .limit(31)
  }

  val q33Oracle: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token
      |ORDER BY n DESC NULLS LAST, token NULLS FIRST
      |LIMIT 31""".stripMargin

  /** Q82 — bitwise function family (Spark `^` is xor; DuckDB spells it
    * `xor()` because its `^` is power — the oracle uses the function form).
    */
  def q82(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.part
      .filter(col("p_partkey") <= 100)
      .select(
        col("p_partkey"),
        expr("p_partkey & 255").as("and_255"),
        expr("p_partkey | 16").as("or_16"),
        expr("p_partkey ^ 85").as("xor_85"),
        expr("shiftleft(p_partkey, 2)").as("shl_2"),
        expr("shiftright(p_partkey, 1)").as("shr_1"),
        expr("CAST(bit_count(p_partkey) AS BIGINT)").as("bits"))
      .orderBy(asc_nulls_first("p_partkey"))
  }

  val q82Oracle: String =
    """SELECT p_partkey,
      |  p_partkey & 255 AS and_255,
      |  p_partkey | 16 AS or_16,
      |  xor(p_partkey, 85) AS xor_85,
      |  p_partkey << 2 AS shl_2,
      |  p_partkey >> 1 AS shr_1,
      |  CAST(bit_count(p_partkey) AS BIGINT) AS bits
      |FROM part
      |WHERE p_partkey <= 100
      |ORDER BY p_partkey NULLS FIRST""".stripMargin

  /** Q83 — ISO calendar extraction: 1996 revenue by ISO week × day-of-week
    * (Spark dayofweek is 1=Sunday, DuckDB 0=Sunday — the query aligns on
    * the DuckDB convention; both engines' weekofyear is ISO-8601).
    */
  def q83(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.orders
      .filter(expr("year(o_orderdate) = 1996"))
      .groupBy(
        expr("CAST(weekofyear(o_orderdate) AS BIGINT)").as("week"),
        expr("CAST(dayofweek(o_orderdate) - 1 AS BIGINT)").as("dow"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("total"))
      .orderBy(asc_nulls_first("week"), asc_nulls_first("dow"))
  }

  val q83Oracle: String =
    """SELECT CAST(weekofyear(o_orderdate) AS BIGINT) AS week,
      |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
      |  COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total
      |FROM orders
      |WHERE year(o_orderdate) = 1996
      |GROUP BY 1, 2
      |ORDER BY week NULLS FIRST, dow NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q26" -> (q26 _), "Q27" -> (q27 _), "Q28" -> (q28 _), "Q29" -> (q29 _),
    "Q30" -> (q30 _), "Q31" -> (q31 _), "Q32" -> (q32 _), "Q33" -> (q33 _),
    "Q82" -> (q82 _), "Q83" -> (q83 _))

  def oracles: Map[String, String] = Map(
    "Q26" -> q26Oracle, "Q27" -> q27Oracle, "Q28" -> q28Oracle,
    "Q29" -> q29Oracle, "Q30" -> q30Oracle, "Q31" -> q31Oracle,
    "Q32" -> q32Oracle, "Q33" -> q33Oracle, "Q82" -> q82Oracle,
    "Q83" -> q83Oracle)
}
