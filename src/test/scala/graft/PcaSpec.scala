package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Distributed Gram-matrix PCA over the embedding column: the distributed
  * single-pass moments must reproduce the exact local decomposition, the
  * components must be orthonormal, and the projected variance must equal
  * the eigenvalue it came from (the defining property of PCA).
  */
class PcaSpec extends SparkSpec {

  test("distributed PCA matches the local covariance eigendecomposition") {
    import breeze.linalg.{eigSym, DenseMatrix => BDM}
    val c = Catalog(spark, sf("sf0.001"))
    val k = 4
    val (components, eigvals, projected) = VectorOps.pca(c.embeddings, "embedding", k)
    val d = components(0).length

    // Local reference from the collected data (500×64 at sf0.001).
    val rows = c.embeddings.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length
    val mean = Array.tabulate(d)(j => rows.map(_(j)).sum / n)
    val cov = BDM.zeros[Double](d, d)
    for (i <- 0 until d; j <- 0 until d)
      cov(i, j) = rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
    val es = eigSym(cov)
    val localTop = (0 until d).sortBy(p => -es.eigenvalues(p)).take(k)
      .map(es.eigenvalues(_))

    // Spectrum agreement (eigenvalues are basis-free, so directly
    // comparable; eigenvectors are sign/degeneracy-ambiguous).
    eigvals.zip(localTop).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 1e-8 * math.max(1.0, math.abs(want)),
        s"eigenvalue mismatch: $got vs $want")
    }
    // Orthonormal components.
    for (a <- 0 until k; b <- a until k) {
      val dotAB = (0 until d).map(i => components(a)(i) * components(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dotAB - want) < 1e-9, s"components($a)·components($b) = $dotAB")
    }
    // Projected variance per component == its eigenvalue.
    val stats = projected.select(
      (0 until k).flatMap(i => Seq(
        variance(col(s"pc_$i")).as(s"var_$i"),
        avg(col(s"pc_$i")).as(s"avg_$i"))): _*).collect()(0)
    (0 until k).foreach { i =>
      val varPop = stats.getDouble(2 * i) * (n - 1).toDouble / n
      assert(math.abs(varPop - eigvals(i)) <= 1e-6 * math.max(1.0, eigvals(i)),
        s"pc_$i variance $varPop != eigenvalue ${eigvals(i)}")
    }
    // Top component must actually dominate (non-degenerate data).
    assert(eigvals(0) > 0 && eigvals(0) >= eigvals(k - 1))
  }
}
