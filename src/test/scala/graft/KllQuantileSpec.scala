package graft

import org.apache.spark.sql.functions._
import graft.functions.KllState

/** KLL quantile sketch: local rank-error bounds across distribution
  * shapes, exact weight conservation, merge algebra (clamping, rollup
  * accuracy), and the SQL sketch-column surface on real tables.
  */
class KllQuantileSpec extends SparkSpec {

  private def buildLocal(xs: Seq[Double], k: Int): KllState = {
    val s = new KllState(k)
    xs.foreach(s.update)
    s
  }

  /** Max distance from q to the estimate's TRUE RANK INTERVAL, over a
    * quantile grid. A value with many duplicates legitimately covers the
    * whole rank range [#{v < est}, #{v ≤ est}]/n — any q inside it is a
    * perfect answer, so error is the distance to the interval, not to
    * one endpoint.
    */
  private def maxRankErr(s: KllState, sorted: IndexedSeq[Double]): Double = {
    val n = sorted.size
    (1 to 99).map { p =>
      val q = p / 100.0
      val est = s.quantile(q)
      val lo = sorted.count(_ < est).toDouble / n
      val hi = sorted.count(_ <= est).toDouble / n
      math.max(0.0, math.max(lo - q, q - hi))
    }.max
  }

  test("rank error stays within the KLL bound across distribution shapes") {
    val rnd = new scala.util.Random(1234)
    val n = 100000
    val k = 200
    val shapes: Map[String, Seq[Double]] = Map(
      "uniform" -> Seq.fill(n)(rnd.nextDouble()),
      "sorted" -> (1 to n).map(_.toDouble),
      "reversed" -> (n to 1 by -1).map(_.toDouble),
      "zipf-duplicates" -> Seq.tabulate(n)(i => math.floor(math.pow(i % 1000 + 1, 0.5)).toDouble),
      "lognormal" -> Seq.fill(n)(math.exp(rnd.nextGaussian())))
    shapes.foreach { case (name, xs) =>
      val s = buildLocal(xs, k)
      val err = maxRankErr(s, xs.sorted.toIndexedSeq)
      // theory: ~2.3/k at high confidence; 3/k = 1.5% leaves margin while
      // still failing on any real compaction bug
      assert(err <= 3.0 / k, f"$name: max rank error $err%.4f > ${3.0 / k}%.4f")
    }
  }

  test("n is conserved exactly through compaction and merge") {
    val rnd = new scala.util.Random(7)
    val s1 = buildLocal(Seq.fill(34567)(rnd.nextDouble()), 128)
    val s2 = buildLocal(Seq.fill(12345)(rnd.nextDouble()), 128)
    assert(s1.n == 34567L && s2.n == 12345L)
    assert(s1.merge(s2).n == 34567L + 12345L)
    // and the serialized form carries it
    assert(KllState.fromBytes(KllState.toBytes(s1)).n == 34567L + 12345L)
  }

  test("merge of per-partition sketches is as accurate as a single sketch") {
    val rnd = new scala.util.Random(99)
    val n = 80000
    val k = 200
    val xs = Seq.fill(n)(rnd.nextGaussian())
    val parts = xs.grouped(n / 8 + 1).toSeq
    val merged = parts.map(buildLocal(_, k)).reduce(KllState.mergeClamped)
    assert(merged.n == n.toLong)
    val err = maxRankErr(merged, xs.sorted.toIndexedSeq)
    assert(err <= 3.0 / k, f"merged rank error $err%.4f")
  }

  test("mismatched k clamps to the smallest (the KMV mergeClamped rule)") {
    val rnd = new scala.util.Random(5)
    val big = buildLocal(Seq.fill(50000)(rnd.nextDouble()), 256)
    val small = buildLocal(Seq.fill(50000)(rnd.nextDouble()), 64)
    assert(KllState.mergeClamped(big, small).k == 64)
    val rev = buildLocal(Seq.fill(1000)(rnd.nextDouble()), 64)
    assert(KllState.mergeClamped(rev, buildLocal(Seq(1.0), 256)).k == 64)
  }

  test("serialization round-trips byte-identically") {
    val rnd = new scala.util.Random(3)
    val s = buildLocal(Seq.fill(23456)(rnd.nextDouble()), 100)
    val b1 = KllState.toBytes(s)
    val b2 = KllState.toBytes(KllState.fromBytes(b1))
    assert(java.util.Arrays.equals(b1, b2))
  }

  test("SQL surface: per-group sketches vs exact percentiles on lineitem") {
    val c = Catalog(spark, sf("sf0.01"))
    c.register()
    val got = spark.sql(
      """SELECT l_returnflag,
        |  graft_kll_quantile(graft_kll_sketch(l_extendedprice, 200), 0.5D) AS p50,
        |  graft_kll_quantile(graft_kll_sketch(l_extendedprice, 200), 0.9D) AS p90,
        |  graft_kll_n(graft_kll_sketch(l_extendedprice, 200)) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    val exact = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n,
        |  percentile(l_extendedprice, 0.5D) AS p50,
        |  percentile(l_extendedprice, 0.9D) AS p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getLong(1)))).toMap
    exact.foreach { case (flag, (p50, p90, n)) =>
      val (e50, e90, en) = got(flag)
      assert(en == n, s"$flag: n $en != $n") // exact count survives sketching
      // value-space tolerance: the sketch guarantees RANK error <= ~1.5%;
      // on these smooth price distributions that is a small value delta
      assert(math.abs(e50 - p50) / p50 <= 0.05, s"$flag p50: $e50 vs $p50")
      assert(math.abs(e90 - p90) / p90 <= 0.05, s"$flag p90: $e90 vs $p90")
    }
  }

  test("SQL rollup: per-day sketch column re-aggregates to per-type quantiles") {
    val c = Catalog(spark, sf("sf0.01"))
    c.register()
    // build once per (type, day) — the persisted sketch-column shape —
    // then answer a per-type quantile question from the sketches alone
    spark.sql(
      """SELECT event_type, ts DIV 1000 DIV 86400000000 AS day,
        |  graft_kll_sketch(value, 200) AS sk
        |FROM events GROUP BY 1, 2""".stripMargin)
      .createOrReplaceTempView("day_sketches")
    val rolled = spark.sql(
      """SELECT event_type,
        |  graft_kll_quantile(graft_kll_merge(sk, 200), 0.5D) AS p50,
        |  graft_kll_n(graft_kll_merge(sk, 200)) AS n
        |FROM day_sketches GROUP BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val exact = spark.sql(
      """SELECT event_type, percentile(value, 0.5D) AS p50, COUNT(value) AS n
        |FROM events GROUP BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    exact.foreach { case (t, (p50, n)) =>
      assert(rolled(t)._2 == n, s"$t: rollup n ${rolled(t)._2} != $n")
      assert(math.abs(rolled(t)._1 - p50) / math.abs(p50) <= 0.05,
        s"$t: rollup p50 ${rolled(t)._1} vs exact $p50")
    }
  }

  test("rank probe and empty/degenerate behavior") {
    val c = Catalog(spark, sf("sf0.001"))
    c.register()
    // rank of the max is 1.0; rank below the min is 0.0
    val r = spark.sql(
      """SELECT graft_kll_rank(sk, 1e18) AS hi, graft_kll_rank(sk, -1e18) AS lo
        |FROM (SELECT graft_kll_sketch(l_quantity, 64) AS sk FROM lineitem)""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
    // empty input: quantile/rank are NULL, n = 0
    val e = spark.sql(
      """SELECT graft_kll_quantile(sk, 0.5D) AS q, graft_kll_rank(sk, 0D) AS rk,
        |  graft_kll_n(sk) AS n
        |FROM (SELECT graft_kll_sketch(l_quantity, 64) AS sk
        |      FROM lineitem WHERE l_quantity < -1)""".stripMargin).collect()(0)
    assert(e.isNullAt(0) && e.isNullAt(1) && e.getLong(2) == 0L)
  }
}
