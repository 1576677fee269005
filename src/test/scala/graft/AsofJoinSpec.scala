package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** The generic as-of join API must reproduce Q12's window formulation. */
class AsofJoinSpec extends SparkSpec {

  test("asofJoin reproduces Q12's most-recent-prior-event semantics") {
    val c = Catalog(spark, sf("sf0.001"))
    val e = c.events.select(
      col("user_id"), col("event_id"), col("event_type"), expr("ts DIV 1000").as("us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us"))
    val others = e.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("us"), col("event_type"))

    val viaApi = Joins.asofJoin(
        purchases, others, on = Seq("user_id"),
        leftTime = "us", rightTime = "us",
        rightCols = Seq("event_type"), strict = true)
      .filter(col("asof_event_type").isNotNull)
      .groupBy(col("asof_event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val viaQ12 = Joins.q12(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaApi == viaQ12, s"$viaApi != $viaQ12")
  }

  test("native as-of operator matches the union-sort-fill formulation") {
    val c = Catalog(spark, sf("sf0.001"))
    val e = c.events.select(
      col("user_id"), col("event_id"), col("event_type"), expr("ts DIV 1000").as("us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us"))
    val others = e.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("us"), col("event_type"))

    val native = Joins.asofJoinNative(
        purchases, others, key = "user_id",
        leftTime = "us", rightTime = "us",
        rightValue = "event_type", outName = "prior_type")
      .select(col("event_id"), col("prior_type"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    val api = Joins.asofJoin(
        purchases, others, on = Seq("user_id"),
        leftTime = "us", rightTime = "us",
        rightCols = Seq("event_type"), strict = false)
      .select(col("event_id"), col("asof_event_type"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    assert(native.size == api.size && native.nonEmpty)
    val diff = native.filter { case (k, v) => api.get(k).flatten != v }
    assert(diff.isEmpty, s"${diff.take(5)}")
  }

  test("native as-of plan inserts exchanges+sorts from declared requirements") {
    import spark.implicits._
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "lv")
    val r = Seq((1L, 5L, "v1")).toDF("k", "t", "rv")
    val df = Joins.asofJoinNative(l, r, "k", "t", "t", "rv")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning(k"), plan)
    assert(plan.contains("Sort ["), plan)
    val row = df.collect()(0)
    assert(row.getAs[String]("asof_value") == "v1")
  }

  test("asofJoin non-strict attaches equal-time right rows; strict does not") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1")).toDF("k", "t", "lv")
    val right = Seq((1L, 100L, "r_eq"), (1L, 50L, "r_old")).toDF("k", "t", "rv")
    val loose = Joins.asofJoin(left, right, Seq("k"), "t", "t", Seq("rv"), strict = false)
      .collect()(0).getAs[String]("asof_rv")
    val strict = Joins.asofJoin(left, right, Seq("k"), "t", "t", Seq("rv"), strict = true)
      .collect()(0).getAs[String]("asof_rv")
    assert(loose == "r_eq" && strict == "r_old", s"loose=$loose strict=$strict")
  }
}
