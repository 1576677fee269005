package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** The native codegen'd dot-product expression must be numerically
  * identical (bit-exact) to the higher-order-function fold it replaces —
  * same left-to-right double accumulation.
  */
class DotProductSpec extends SparkSpec {

  test("graft_dot is bit-identical to the aggregate/zip_with fold") {
    val c = Catalog(spark, sf("sf0.01"))
    val e = c.embeddings.select(col("vec_id"), col("embedding"))
    val e2 = e.select(col("vec_id").as("id2"), col("embedding").as("emb2"))
    val pairs = e.join(broadcast(e2), col("vec_id") =!= col("id2") && col("id2") < 20)
      .select(
        VectorOps.dot(col("embedding"), col("emb2")).as("fast"),
        VectorOps.dotHof(col("embedding"), col("emb2")).as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("optimizer rule rewrites the HOF dot pattern to the native expression") {
    val c = Catalog(spark, sf("sf0.001")) // registers the rule
    val df = c.embeddings
      .select(VectorOps.dotHof(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), s"rule did not fire:\n$optimized")
    // And the rewrite preserves values.
    val viaHof = df.collect().map(_.getDouble(0))
    assert(viaHof.forall(_ > 0.0))
  }

  test("graft_dot works in SQL text after catalog registration") {
    val c = Catalog(spark, sf("sf0.001"))
    c.register()
    val r = spark.sql(
      "SELECT graft_dot(embedding, embedding) AS d FROM embeddings WHERE vec_id = 0")
      .collect()(0).getDouble(0)
    assert(r > 0.0)
  }

  test("long dot/sqdist rewrites fire and equal the HOF folds exactly") {
    val c = Catalog(spark, sf("sf0.01")) // registers the rule
    val xi = c.embeddings.select(col("vec_id"), expr(
      "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))")
      .as("xi"))
    val pairs = xi.join(
        broadcast(xi.select(col("vec_id").as("id2"), col("xi").as("x2"))),
        col("vec_id") < col("id2") && col("id2") <= 30)
    val df = pairs.select(
      expr("aggregate(zip_with(xi, x2, (a, b) -> a * b), 0L, (a, v) -> a + v)").as("dot_hof"),
      expr("graft_dot_long(xi, x2)").as("dot_nat"),
      expr("aggregate(zip_with(xi, x2, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)")
        .as("d2_hof"),
      expr("graft_sqdist_long(xi, x2)").as("d2_nat"),
      expr("aggregate(transform(xi, x -> x * x), 0L, (a, v) -> a + v)").as("n2_hof"),
      expr("graft_dot_long(xi, xi)").as("n2_nat"))
    // The optimizer must have rewritten every HOF fold to the native form.
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot_long") &&
      optimized.contains("graft_sqdist_long") &&
      !optimized.toLowerCase.contains("zip_with"),
      s"long-fold rewrite did not fire:\n$optimized")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"dot ${r.getLong(0)} != ${r.getLong(1)}")
      assert(r.getLong(2) == r.getLong(3), s"d2 ${r.getLong(2)} != ${r.getLong(3)}")
      assert(r.getLong(4) == r.getLong(5), s"n2 ${r.getLong(4)} != ${r.getLong(5)}")
    }
  }

  test("long folds: mixed int array, null element, and length mismatch match the HOF") {
    Catalog(spark, sf("sf0.001")) // registers rule + functions
    val df = spark.sql(
      """SELECT
        |  graft_dot_long(array(1L, 2L, 3L), array(4, 5, 6)) AS mixed,
        |  graft_dot_long(array(1L, NULL, 3L), array(4L, 5L, 6L)) AS withnull,
        |  graft_dot_long(array(1L, 2L), array(4L, 5L, 6L)) AS mismatch,
        |  aggregate(zip_with(array(1L, NULL, 3L), array(4L, 5L, 6L),
        |    (a, b) -> a * b), 0L, (a, v) -> a + v) AS hof_withnull,
        |  aggregate(zip_with(array(1L, 2L), array(4L, 5L, 6L),
        |    (a, b) -> a * b), 0L, (a, v) -> a + v) AS hof_mismatch,
        |  graft_sqdist_long(array(3L, 7L), array(1L, 2L)) AS sq
        |""".stripMargin)
    val r = df.collect()(0)
    assert(r.getLong(0) == 4L + 10L + 18L)
    assert(r.isNullAt(1) && r.isNullAt(3), "null element must null the fold")
    assert(r.isNullAt(2) && r.isNullAt(4), "length mismatch must null the fold")
    assert(r.getLong(5) == 4L + 25L)
  }
}
