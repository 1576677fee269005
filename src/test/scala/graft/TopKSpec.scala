package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKHeap

/** Bounded-heap top-k aggregate: window-form equivalence under partial
  * aggregation, heap merge algebra, and the size bound.
  */
class TopKSpec extends SparkSpec {

  test("graft_topk equals the window row_number formulation per group") {
    val c = Catalog(spark, sf("sf0.01")); c.register()
    val viaAgg = spark.sql(
      """SELECT o_orderstatus, graft_topk(o_totalprice, 5) AS top5
        |FROM orders GROUP BY o_orderstatus""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    val viaWindow = spark.sql(
      """SELECT o_orderstatus, collect_list(o_totalprice) AS top5 FROM (
        |  SELECT o_orderstatus, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice DESC) AS rn
        |  FROM orders) WHERE rn <= 5
        |GROUP BY o_orderstatus""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).sorted.reverse.toSeq).toMap
    assert(viaAgg == viaWindow, s"$viaAgg vs $viaWindow")
  }

  test("heap merge: size-bounded, keeps the global top-k across any split") {
    val values = (1 to 10000).map(i => (i * 2654435761L % 100000).toDouble)
    val (l, r) = values.splitAt(3713)
    val a = new TopKHeap(7); l.foreach(a.add)
    val b = new TopKHeap(7); r.foreach(b.add)
    val merged = a.merge(b)
    assert(merged.heap.size <= 7)
    assert(merged.sortedDesc.toSeq == values.sorted.reverse.take(7))
  }
}
