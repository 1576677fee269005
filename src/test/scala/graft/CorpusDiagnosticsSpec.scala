package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventTime, Graphs, Profiling, TextAnalysis}

/** Round-8 diagnostics family: synchronized label propagation (Q156),
  * calendar RANGE rolling windows (Q157), Jensen–Shannon source
  * divergence (Q158), and the Benford digit audit (Q159).
  */
class CorpusDiagnosticsSpec extends SparkSpec {

  test("LPA splits two triangles joined by a bridge into their communities") {
    import spark.implicits._
    // triangle {1,2,3} — bridge 3-4 — triangle {4,5,6}
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val got = Graphs.labelPropagation(edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-traced synchronized min-tiebreak evolution converges to the
    // two triangle communities
    assert(Set(1L, 2L, 3L).map(got) == Set(1L))
    assert(Set(4L, 5L, 6L).map(got) == Set(3L))
  }

  test("LPA is deterministic across partitionings") {
    import spark.implicits._
    val edges = (1L to 40L).flatMap(i => Seq((i, i % 40 + 1), (i, (i + 7) % 40 + 1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")
    val a = Graphs.labelPropagation(edges.repartition(1), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Graphs.labelPropagation(edges.repartition(13), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("Q157 RANGE frame spans calendar days, not observed rows") {
    import spark.implicits._
    // days 0,1,10: the gap must RESET the window — a ROWS frame would
    // carry all three rows into day 10
    val daily = Seq(("a", 0L, 2L, 100L), ("a", 1L, 3L, 200L),
      ("a", 10L, 5L, 50L)).toDF("event_type", "day", "n", "dcents")
    val got = EventTime.calendarRolling7(daily)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got(0L) == ((2L, 1L, 100L, 100L)))
    assert(got(1L) == ((5L, 2L, 100L, 200L)))
    assert(got(10L) == ((5L, 1L, 50L, 50L))) // window = days 4..10, only day 10
  }

  test("JSD: identical sources = 0, disjoint sources = 1 bit") {
    import spark.implicits._
    val docs = Seq(
      ("A", "x y x y"), ("B", "x y x y"),     // identical distributions
      ("C", "p q p q")                        // disjoint from both
    ).toDF("source", "text")
    val got = TextAnalysis.jsdBySource(docs)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("A", "B")) == ((2L, 0.0)))
    assert(got(("A", "C")) == ((0L, 1.0)))
    assert(got(("B", "C")) == ((0L, 1.0)))
  }

  test("Q159 digit extraction + Benford expectations at sf0.001") {
    val rows = Profiling.q159(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => (1 to 9).contains(r.getAs[Int]("digit"))))
    // exp_f is the Benford law to 4dp
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      val expected = math.log(1.0 + 1.0 / d) / math.log(10.0)
      assert(math.abs(r.getAs[Double]("exp_f") - expected) < 5e-5)
    }
    // observed frequencies sum to ~1 within each priority
    rows.groupBy(_.getAs[String]("priority")).foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Double]("obs_f")).sum
      assert(math.abs(s - 1.0) < 1e-3)
    }
  }

  test("Q156/Q157/Q158 smoke on sf0.001: non-empty, deterministic re-run") {
    val q156a = Graphs.q156(spark, sf("sf0.001")).collect()
    val q156b = Graphs.q156(spark, sf("sf0.001")).collect()
    assert(q156a.nonEmpty && q156a.sameElements(q156b))
    assert(EventTime.q157(spark, sf("sf0.001")).count() > 0)
    assert(TextAnalysis.q158(spark, sf("sf0.001")).count() > 0)
  }
}
