package graft

import graft.functions.HllSketch

/** HyperLogLog sketch (TypedImperativeAggregate + sketch-column algebra):
  * accuracy vs exact at the 1.04/√m error model, small-range linear
  * counting, byte-level determinism of the register file (sketch of a
  * union ≡ merge of sketches), rollup equivalence, and the loud
  * mismatched-precision failure.
  */
class HllSpec extends SparkSpec {

  test("HLL estimate within 5 standard errors of exact at p=12") {
    val c = Catalog(spark, sf("sf0.01"))
    c.register()
    val row = spark.sql(
      """SELECT COUNT(DISTINCT l_partkey) AS exact,
        |       graft_hll_distinct(l_partkey, 12) AS hll
        |FROM lineitem""".stripMargin).collect()(0)
    val exact = row.getLong(0); val est = row.getLong(1)
    val se = 1.04 / math.sqrt(1 << 12) // ~1.6%
    assert(math.abs(est - exact).toDouble / exact <= 5 * se,
      s"exact=$exact hll=$est")
  }

  test("HLL small range uses linear counting: tight at n << m") {
    val c = Catalog(spark, sf("sf0.01"))
    c.register()
    // 5 event types with m=4096 registers: LC regime, ±0 expected.
    val small = spark.sql(
      "SELECT graft_hll_distinct(event_type, 12) AS n FROM events")
      .collect()(0).getLong(0)
    assert(small == 5, s"expected 5 in the LC regime, got $small")
  }

  test("HLL register file is a pure function of the input set: merge == union, bit-exact") {
    // local model check, no Spark needed
    val a = new HllSketch(10); val b = new HllSketch(10); val u = new HllSketch(10)
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(5000)(rnd.nextLong()); val ys = Seq.fill(5000)(rnd.nextLong())
    xs.foreach(a.add); ys.foreach(b.add)
    (xs ++ ys).foreach(u.add)
    a.merge(b)
    assert(java.util.Arrays.equals(a.regs, u.regs),
      "merge(sketch(A), sketch(B)) must be byte-identical to sketch(A ++ B)")
    // idempotent under re-merge
    val before = a.regs.clone()
    a.merge(u)
    assert(java.util.Arrays.equals(a.regs, before))
  }

  test("HLL sketch-column rollup: per-group sketches merge to the global estimate") {
    val c = Catalog(spark, sf("sf0.01"))
    c.register()
    val rolled = spark.sql(
      """SELECT graft_hll_estimate(graft_hll_merge(sk, 12)) AS n FROM (
        |  SELECT event_type, graft_hll_sketch(user_id, 12) AS sk
        |  FROM events GROUP BY event_type)""".stripMargin)
      .collect()(0).getLong(0)
    val direct = spark.sql(
      "SELECT graft_hll_distinct(user_id, 12) AS n FROM events")
      .collect()(0).getLong(0)
    assert(rolled == direct,
      s"rollup must equal the direct sketch exactly: $rolled vs $direct")
    val exact = spark.sql(
      "SELECT COUNT(DISTINCT user_id) FROM events").collect()(0).getLong(0)
    assert(math.abs(rolled - exact).toDouble / exact <= 0.1,
      s"exact=$exact rolled=$rolled")
  }

  test("HLL union scalar tracks exact |A ∪ B|; mismatched precision fails loudly") {
    val c = Catalog(spark, sf("sf0.01"))
    c.register()
    val row = spark.sql(
      """WITH sk AS (
        |  SELECT event_type, graft_hll_sketch(user_id, 12) AS s
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY event_type)
        |SELECT graft_hll_union(a.s, b.s) AS est
        |FROM sk a JOIN sk b
        |ON a.event_type = 'view' AND b.event_type = 'purchase'""".stripMargin)
      .collect()(0)
    val exact = spark.sql(
      """SELECT COUNT(DISTINCT user_id) FROM events
        |WHERE event_type IN ('view', 'purchase')""".stripMargin)
      .collect()(0).getLong(0)
    assert(math.abs(row.getLong(0) - exact).toDouble / exact <= 0.1,
      s"exact=$exact union=${row.getLong(0)}")

    val p10 = new HllSketch(10); val p12 = new HllSketch(12)
    val e = intercept[IllegalArgumentException](p10.merge(p12))
    assert(e.getMessage.contains("different precision"))
  }
}
