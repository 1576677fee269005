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
