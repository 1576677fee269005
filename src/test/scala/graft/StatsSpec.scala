package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.operators.Stats

/** In-memory-model pins for the Q137–Q140 hypothesis-test gates: each
  * Spark statistic is checked against a straightforward local reference
  * on small fixed data (including the tie cases the rank tests exist
  * for). The cross-engine hash gate is the DuckDB oracle; these pin the
  * MODEL (formulas, tie handling, exact-integer rank carry).
  */
class StatsSpec extends SparkSpec {

  private def eventsDf(rows: Seq[(String, Double)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (t, v) => Row(t, v) }, 3),
      schema)
  }

  /** Run a Stats gate against an in-memory events table by writing it as
    * a one-table mini-catalog. */
  private def withMiniCatalog(rows: Seq[(String, Double)])(
      f: String => DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("stats-spec").toString
    val n = rows.size
    eventsDf(rows)
      .selectExpr("monotonically_increasing_id() AS event_id",
        "timestamp '2024-01-01 00:00:00' AS ts",
        s"CAST(monotonically_increasing_id() % $n AS BIGINT) AS user_id",
        "event_type", "value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    f(dir)
  }

  test("Q137 Welch t matches a local two-sample reference") {
    val a = Seq(1.0, 2.0, 3.0, 4.0, 10.0)
    val b = Seq(2.0, 2.5, 3.5, 3.0)
    val rows = a.map("alpha" -> _) ++ b.map("beta" -> _)
    val out = withMiniCatalog(rows)(Stats.q137(spark, _)).collect()
    assert(out.length === 1)
    val r = out.head
    def meanVar(x: Seq[Double]) = {
      val m = x.sum / x.size
      (m, x.map(v => (v - m) * (v - m)).sum / (x.size - 1))
    }
    val (ma, va) = meanVar(a); val (mb, vb) = meanVar(b)
    val se2 = va / a.size + vb / b.size
    val t = (ma - mb) / math.sqrt(se2)
    val df = se2 * se2 / (math.pow(va / a.size, 2) / (a.size - 1) +
      math.pow(vb / b.size, 2) / (b.size - 1))
    assert(r.getAs[Long]("n_a") === a.size)
    assert(math.abs(r.getAs[Double]("t") - t) < 1e-3)
    assert(math.abs(r.getAs[Double]("df") - df) < 1e-1)
  }

  test("Q138 Mann-Whitney midranks: U and z match a local reference with ties") {
    // deliberate ties within and across groups
    val a = Seq(1.0, 2.0, 2.0, 3.0, 5.0)
    val b = Seq(2.0, 3.0, 3.0, 4.0)
    val rows = a.map("alpha" -> _) ++ b.map("beta" -> _)
    val out = withMiniCatalog(rows)(Stats.q138(spark, _)).collect()
    assert(out.length === 1)
    val r = out.head
    // local midrank reference
    val all = (a.map((_, 'a')) ++ b.map((_, 'b'))).sortBy(_._1)
    val ranks = scala.collection.mutable.Map[Double, Double]()
    var pos = 1
    all.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (v, g) =>
      ranks(v) = (2 * pos + g.size - 1) / 2.0 // midrank
      pos += g.size
    }
    val ra = a.map(ranks).sum
    val ua = ra - a.size * (a.size + 1) / 2.0
    val n = a.size + b.size
    val ties3 = all.groupBy(_._1).values.map(g =>
      math.pow(g.size, 3) - g.size).sum
    val varU = a.size.toDouble * b.size / 12 *
      ((n + 1) - ties3 / (n.toDouble * (n - 1)))
    val z = (ua - a.size.toDouble * b.size / 2) / math.sqrt(varU)
    assert(r.getAs[Double]("u_a") === ua)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-3)
  }

  test("Q139 KS statistic is the exact max ECDF gap") {
    val a = Seq(1.0, 2.0, 3.0, 4.0)
    val b = Seq(3.0, 4.0, 5.0, 6.0)
    val rows = a.map("alpha" -> _) ++ b.map("beta" -> _)
    val out = withMiniCatalog(rows)(Stats.q139(spark, _)).collect()
    assert(out.length === 1)
    val r = out.head
    // ECDF gap peaks at v=2: F_a=2/4, F_b=0 → D = 1/2, numerator 2*4-0=8
    assert(r.getAs[Long]("ks_num") === 8L)
    assert(math.abs(r.getAs[Double]("d") - 0.5) < 1e-9)
  }

  test("Q146 Kaplan-Meier: censoring keeps users at risk, the 72h " +
    "boundary counts as a death, and steps multiply exactly") {
    import spark.implicits._
    val H = 3600000000L // one hour in µs
    def ev(u: Long, hours: Long, typ: String) =
      (u * 10 + hours, hours * H * 1000L, u, typ, 1.0, "{}")
    // u1: purchase at +10h (death); u2: purchase at +80h (censored at 72);
    // u3: never purchases (censored); u4: death at +10h; u5: death at
    // exactly +72h (boundary: 72 <= 72 is a death)
    val rows = Seq(
      ev(1, 0, "view"), ev(1, 10, "purchase"),
      ev(2, 0, "view"), ev(2, 80, "purchase"),
      ev(3, 0, "view"), ev(3, 90, "click"),
      ev(4, 0, "view"), ev(4, 10, "purchase"),
      ev(5, 0, "view"), ev(5, 72, "purchase"))
    val dir = java.nio.file.Files.createTempDirectory("stats-km").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.Stats.q146(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
    // t=10: n=5 at risk, d=2 -> S = 3/5; t=72: deaths precede censoring,
    // n=3 (u2, u3, u5 still at risk), d=1 -> S = 0.6 * 2/3 = 0.4
    assert(out.toSeq === Seq(
      (10L, (5L, 2L, 0.6)), (72L, (3L, 1L, 0.4))), s"got ${out.toSeq}")
  }

  test("Q140 correlation matrix: perfect and anti correlations pin sign") {
    val dir = java.nio.file.Files.createTempDirectory("stats-spec").toString
    val schema = StructType(Seq(
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType)))
    val rows = (1 to 50).map(i => Row(
      i.toDouble, 2.0 * i + 1.0, 50.0 - i, (i % 7).toDouble))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Stats.q140(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("corr"))
      .toMap
    assert(math.abs(out(("l_quantity", "l_extendedprice")) - 1.0) < 1e-9)
    assert(math.abs(out(("l_quantity", "l_discount")) + 1.0) < 1e-9)
    assert(math.abs(out(("l_extendedprice", "l_discount")) + 1.0) < 1e-9)
  }

  test("Q184 one-way ANOVA matches the textbook decomposition") {
    // a=[1,2,3] b=[2,3,4] c=[3,4,5]: means 2,3,4, grand 3
    // SSB = 3*((2-3)^2+(3-3)^2+(4-3)^2) = 6; SSW = 3*2 = 6
    // F = (6/2)/(6/6) = 3; eta2 = 6/12 = 0.5
    val r = withMiniCatalog(Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 3.0), ("c", 4.0), ("c", 5.0)))(Stats.q184(spark, _)).collect().head
    assert(r.getAs[Long]("k") === 3L)
    assert(r.getAs[Long]("n_total") === 9L)
    assert(r.getAs[Double]("ssb") === 6.0)
    assert(r.getAs[Double]("ssw") === 6.0)
    assert(r.getAs[Double]("f") === 3.0)
    assert(r.getAs[Double]("eta2") === 0.5)

    // single group -> F undefined (NULL), eta2 = 0 (SSB = 0, SSW > 0)
    val d = withMiniCatalog(Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)))(
      Stats.q184(spark, _)).collect().head
    assert(d.isNullAt(d.fieldIndex("f")))
    assert(d.getAs[Double]("eta2") === 0.0)
  }
}
