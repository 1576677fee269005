package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Catalog

/** Window-function operators (SURVEY.md §2.5): ranking, lag/lead, sliding
  * frames, distribution functions.
  *
  * Scale notes: Q18/Q19 partition their windows by a high-cardinality key
  * (segment, user) — one shuffle on the partition key, then a partition-local
  * sort; no global sort. Q20/Q21 use a global (un-partitioned) window, which
  * Spark executes in a single partition — acceptable ONLY because the input
  * is pre-aggregated to tiny cardinality (days, customers-per-ntile); the
  * aggregation below them is the thing that scales. A raw-fact global window
  * would not survive 100 TB and is deliberately absent.
  */
object Windows {

  /** Q18 — row_number / rank / dense_rank: top-3 orders per segment. */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    c.orders
      .join(broadcast(c.customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select(
        col("c_mktsegment"), col("rn"), col("rnk"), col("drnk"),
        col("o_orderkey"), round(col("o_totalprice"), 4).as("price"))
      .orderBy(asc_nulls_first("c_mktsegment"), asc_nulls_first("rn"))
  }

  val q18Oracle: String =
    """SELECT c_mktsegment, rn, rnk, drnk, o_orderkey, ROUND(o_totalprice, 4) AS price
      |FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey)
      |)
      |WHERE rn <= 3
      |ORDER BY c_mktsegment NULLS FIRST, rn NULLS FIRST""".stripMargin

  /** Q19 — lag: inter-event gap per user, averaged per event type (seconds). */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(asc("us"), asc("event_id"))
    c.events
      .select(col("user_id"), col("event_id"), col("event_type"), expr("ts DIV 1000").as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(round(avg(col("gap")) / 1000000.0, 4).as("avg_gap_s"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q19Oracle: String =
    """WITH e AS (
      |  SELECT event_type,
      |    epoch_us(ts) - LAG(epoch_us(ts), 1)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events)
      |SELECT event_type, ROUND(AVG(gap) / 1000000.0, 4) AS avg_gap_s
      |FROM e WHERE gap IS NOT NULL
      |GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin

  /** Q20 — sliding frame: 7-day moving average of daily revenue, sampled at
    * month starts. Global window over the ~2500-day pre-aggregate only.
    */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = Window.orderBy(asc("day")).rowsBetween(-6, 0)
    c.orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice")).as("rev"))
      .withColumn("mavg", round(avg(col("rev")).over(w), 4))
      .filter(col("day") === to_date(date_trunc("month", col("day"))))
      .select(col("day"), col("mavg"))
      .orderBy(asc_nulls_first("day"))
  }

  val q20Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, SUM(o_totalprice) AS rev
      |  FROM orders GROUP BY 1),
      |ma AS (
      |  SELECT day,
      |    ROUND(AVG(rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mavg
      |  FROM daily)
      |SELECT day, mavg FROM ma
      |WHERE day = DATE_TRUNC('month', day)
      |ORDER BY day NULLS FIRST""".stripMargin

  /** Q21 — distribution functions: NTILE / PERCENT_RANK / CUME_DIST over
    * customer balances (total order via c_custkey tiebreak), summarized
    * per decile.
    */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = Window.orderBy(asc("c_acctbal"), asc("c_custkey"))
    c.customer
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("ntile", ntile(10).over(w))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .groupBy(col("ntile"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("c_acctbal")), 4).as("min_bal"),
        round(max(col("c_acctbal")), 4).as("max_bal"),
        round(max(col("pr")), 4).as("max_pr"),
        round(max(col("cd")), 4).as("max_cd"))
      .orderBy(asc_nulls_first("ntile"))
  }

  val q21Oracle: String =
    """WITH ranked AS (
      |  SELECT c_acctbal,
      |    NTILE(10) OVER w AS ntile,
      |    PERCENT_RANK() OVER w AS pr,
      |    CUME_DIST() OVER w AS cd
      |  FROM customer
      |  WINDOW w AS (ORDER BY c_acctbal, c_custkey))
      |SELECT ntile, COUNT(*) AS n,
      |  ROUND(MIN(c_acctbal), 4) AS min_bal,
      |  ROUND(MAX(c_acctbal), 4) AS max_bal,
      |  ROUND(MAX(pr), 4) AS max_pr,
      |  ROUND(MAX(cd), 4) AS max_cd
      |FROM ranked
      |GROUP BY ntile
      |ORDER BY ntile NULLS FIRST""".stripMargin

  /** Q60 — true value-RANGE frame: 7-day rolling revenue where the frame
    * is `RANGE BETWEEN 6 PRECEDING AND CURRENT ROW` over the day NUMBER —
    * on a gapped calendar this is a genuine 7-day window, while Q20's ROWS
    * frame is a 7-observation window; n_days exposes the difference.
    * Output sampled to every 30th day to keep it bounded. Same scale note
    * as Q20: the global window rides on a pre-aggregated tiny series.
    */
  def q60(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val daily = c.orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
        .as("day_num"))
      .agg(sum(col("o_totalprice")).as("rev"))
    val w = Window.orderBy(asc("day_num")).rangeBetween(-6, 0)
    daily
      .withColumn("rev7", sum(col("rev")).over(w))
      .withColumn("n_days", count(lit(1)).over(w))
      .filter(col("day_num") % 30 === 0)
      .select(col("day_num"), round(col("rev7"), 4).as("rev7"), col("n_days"))
      .orderBy(asc_nulls_first("day_num"))
  }

  val q60Oracle: String =
    """WITH daily AS (
      |  SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_num,
      |    SUM(o_totalprice) AS rev
      |  FROM orders GROUP BY 1),
      |rolled AS (
      |  SELECT day_num,
      |    SUM(rev) OVER w AS rev7,
      |    COUNT(*) OVER w AS n_days
      |  FROM daily
      |  WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT day_num, ROUND(rev7, 4) AS rev7, n_days
      |FROM rolled
      |WHERE day_num % 30 = 0
      |ORDER BY day_num NULLS FIRST""".stripMargin

  /** Q111 — frame-navigation window family (first_value / last_value /
    * nth_value) over a centered ±2-row frame per user, summarized per
    * user: mean frame span (last−first) and mean 2nd frame value. The
    * frame order key (us, event_id) is unique, so frame contents — and
    * therefore every navigation value — are deterministic. One user-keyed
    * window pass + one hash aggregate, same plan class as Q19/Q20.
    */
  def q111(spark: SparkSession, dir: String): DataFrame = {
    val c = graft.Catalog(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(asc("us"), asc("event_id"))
      .rowsBetween(-2, 2)
    c.events
      .select(col("user_id"), col("event_id"),
        expr("ts DIV 1000").as("us"), col("value"))
      .withColumn("fv", first(col("value")).over(w))
      .withColumn("lv", last(col("value")).over(w))
      .withColumn("n2", nth_value(col("value"), 2).over(w))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(avg(col("lv") - col("fv")), 4).as("avg_span"),
        round(avg(col("n2")), 4).as("avg_nth2"))
      .orderBy(asc_nulls_first("user_id"))
  }

  val q111Oracle: String =
    """WITH f AS (
      |  SELECT user_id,
      |    first_value(value) OVER w AS fv,
      |    last_value(value) OVER w AS lv,
      |    nth_value(value, 2) OVER w AS n2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id
      |    ORDER BY epoch_us(ts), event_id
      |    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING))
      |SELECT user_id, COUNT(*) AS n_events,
      |  ROUND(AVG(lv - fv), 4) AS avg_span,
      |  ROUND(AVG(n2), 4) AS avg_nth2
      |FROM f
      |GROUP BY user_id
      |ORDER BY user_id NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q18" -> (q18 _), "Q19" -> (q19 _), "Q20" -> (q20 _), "Q21" -> (q21 _),
    "Q60" -> (q60 _), "Q111" -> (q111 _))

  def oracles: Map[String, String] = Map(
    "Q18" -> q18Oracle, "Q19" -> q19Oracle, "Q20" -> q20Oracle,
    "Q21" -> q21Oracle, "Q60" -> q60Oracle, "Q111" -> q111Oracle)
}
