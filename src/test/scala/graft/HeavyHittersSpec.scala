package graft

import graft.functions.MgSketch

/** Misra–Gries heavy-hitters sketch (TypedImperativeAggregate): exactness
  * when counters cover the domain, the frequent-items guarantee under
  * counter pressure, merge algebra, and distributed partial aggregation.
  */
class HeavyHittersSpec extends SparkSpec {

  private def topMap(sql: String): Map[String, Long] = {
    val c = Catalog(spark, sf("sf0.01")); c.register()
    spark.sql(sql).collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("exact regime: k >= |domain| reproduces exact token counts (Q33 oracle)") {
    // 31-token vocabulary (SURVEY V14) << k=64: no decrement ever fires, so
    // the sketch IS the exact count map, merge order notwithstanding.
    val est = topMap(
      """SELECT graft_heavy_hitters(t.token, 64)
        |FROM (SELECT explode(split(text, ' ')) AS token FROM documents) t""".stripMargin)
    val exact = spark.sql(
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT explode(split(text, ' ')) AS token FROM documents)
        |GROUP BY token""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exact, s"sketch/$est vs exact/$exact")
  }

  test("frequent-items guarantee: true count > n/(k+1) is always retained") {
    val c = Catalog(spark, sf("sf0.01")); c.register()
    val exact = spark.sql(
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT explode(split(text, ' ')) AS token FROM documents)
        |GROUP BY token""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 8
    val est = topMap(
      s"""SELECT graft_heavy_hitters(t.token, $k)
         |FROM (SELECT explode(split(text, ' ')) AS token FROM documents) t""".stripMargin)
    val bound = n.toDouble / (k + 1)
    exact.filter(_._2 > bound).foreach { case (tok, cnt) =>
      assert(est.contains(tok), s"guaranteed heavy hitter '$tok' ($cnt > $bound) missing")
      // Estimates never overcount and undercount by at most n/(k+1).
      assert(est(tok) <= cnt, s"$tok overcounted: ${est(tok)} > $cnt")
      assert(est(tok) >= cnt - bound, s"$tok undercut bound: ${est(tok)} < $cnt - $bound")
    }
  }

  test("merge respects the size bound and the error guarantee") {
    val words = Seq.tabulate(3000)(i => s"w${i % 97}") ++ Seq.fill(500)("hot")
    val (left, right) = words.splitAt(1700)
    val k = 16
    val a = new MgSketch(k); left.foreach(a.add)
    val b = new MgSketch(k); right.foreach(b.add)
    val merged = a.merge(b)
    assert(merged.counts.size <= k, s"size ${merged.counts.size} > k=$k")
    val n = words.size
    val trueHot = 500L
    assert(trueHot > n.toDouble / (k + 1)) // 'hot' is a guaranteed heavy hitter
    val est = merged.counts.getOrElse("hot", 0L)
    assert(est > 0, "guaranteed heavy hitter lost in merge")
    assert(est <= trueHot && est >= trueHot - n.toDouble / (k + 1), s"est=$est")
  }

  test("per-group sketch under partial aggregation finds each group's top token") {
    val c = Catalog(spark, sf("sf0.01")); c.register()
    val sketchTop = spark.sql(
      """SELECT lang, graft_heavy_hitters(t.token, 64)[0].item AS top_token
        |FROM (SELECT lang, explode(split(text, ' ')) AS token FROM documents) t
        |GROUP BY lang""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val exactTop = spark.sql(
      """SELECT lang, token FROM (
        |  SELECT lang, token,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, token) AS rn
        |  FROM (SELECT lang, explode(split(text, ' ')) AS token FROM documents)
        |  GROUP BY lang, token)
        |WHERE rn = 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sketchTop == exactTop, s"$sketchTop vs $exactTop")
  }
}
