package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, VectorOps}

/** ANN scale path (SURVEY.md §2.9 Q38 ⚠): random-projection LSH top-k
  * recall against the exact brute-force cosine ranking.
  */
class AnnSpec extends SparkSpec {

  test("LSH approximate top-5 recalls most exact cosine neighbors") {
    val c = Catalog(spark, sf("sf0.01"))
    val probes = c.embeddings.filter(col("vec_id") < 10).select(col("vec_id"))
    val exact = VectorOps.cosineTopK(
        c.embeddings.filter(col("vec_id") < 10), c.embeddings, 5)
      .select(col("p_id"), col("n_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.cosineTopKApprox(spark, c.embeddings, probes, 5)
      .select(col("vec_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"ANN recall@5 = $recall")
  }

  test("IVF approximate top-5 recalls most exact cosine neighbors") {
    val c = Catalog(spark, sf("sf0.01"))
    val probes = c.embeddings.filter(col("vec_id") < 10).select(col("vec_id"))
    val exact = VectorOps.cosineTopK(
        c.embeddings.filter(col("vec_id") < 10), c.embeddings, 5)
      .select(col("p_id"), col("n_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.cosineTopKIvf(spark, c.embeddings, probes, 5, nlist = 10, nprobe = 4)
      .select(col("vec_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@5 = $recall")
  }
}
