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
}
