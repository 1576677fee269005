package graft

import org.apache.spark.sql.functions._

/** Element-wise array-sum aggregate (the Q321 dense-moment engine):
  * per-index equivalence with the explode+sum formulation, null-row
  * handling, and the loud length-mismatch contract.
  */
class VecSumSpec extends SparkSpec {

  test("graft_vec_sum equals the explode+sum formulation per index") {
    val c = Catalog(spark, sf("sf0.01")); c.register()
    val viaAgg = spark.sql(
      """SELECT label, graft_vec_sum(list_t) AS s FROM (
        |  SELECT label, transform(embedding, x -> CAST(x AS DOUBLE)) AS list_t
        |  FROM embeddings)
        |GROUP BY label""".stripMargin)
      .collect().map(r => r.get(0) -> r.getSeq[Double](1).toVector).toMap
    val viaExplode = spark.sql(
      """SELECT label, pos, SUM(CAST(v AS DOUBLE)) AS s
        |FROM (SELECT label, posexplode(embedding) AS (pos, v) FROM embeddings)
        |GROUP BY label, pos""".stripMargin)
      .collect().groupBy(_.get(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toVector }
    assert(viaAgg.keySet == viaExplode.keySet)
    viaAgg.foreach { case (l, s) =>
      val e = viaExplode(l)
      assert(s.length == e.length)
      s.zip(e).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
          s"label $l: $a vs $b") }
    }
  }

  test("graft_vec_sum: null rows are skipped; all-null group yields NULL") {
    Catalog(spark, sf("sf0.001"))
    val r = spark.sql(
      """SELECT g, graft_vec_sum(a) AS s FROM VALUES
        |  (1, array(1.0D, 2.0D)), (1, CAST(NULL AS ARRAY<DOUBLE>)),
        |  (1, array(10.0D, 20.0D)), (2, CAST(NULL AS ARRAY<DOUBLE>))
        |  AS t(g, a)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(r(0).getSeq[Double](1) == Seq(11.0, 22.0))
    assert(r(1).isNullAt(1), "all-null group must yield NULL")
  }

  test("graft_vec_sum fails loudly on a NULL element inside an array") {
    Catalog(spark, sf("sf0.001"))
    val ex = intercept[Exception] {
      spark.sql(
        """SELECT graft_vec_sum(a) FROM VALUES
          |  (array(1.0D, CAST(NULL AS DOUBLE))) AS t(a)""".stripMargin)
        .collect()
    }
    assert(Option(ex.getMessage).exists(_.contains("NULL element")) ||
      Option(ex.getCause).flatMap(c => Option(c.getMessage))
        .exists(_.contains("NULL element")),
      s"expected the dense-array contract message, got: ${ex.getMessage}")
  }

  test("graft_vec_sum fails loudly on length mismatch") {
    Catalog(spark, sf("sf0.001"))
    val ex = intercept[Exception] {
      spark.sql(
        """SELECT graft_vec_sum(a) FROM VALUES
          |  (array(1.0D)), (array(1.0D, 2.0D)) AS t(a)""".stripMargin)
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
