package graft

import org.apache.spark.sql.functions._
import graft.operators.{Derived, Graphs, TensorGates}

/** Model pins for the round-12 slate: Q334's DOULION estimator is pinned
  * against the exact triangle count it approximates (the r11 verdict's
  * "error bounds property-pinned against the exact gates at fixture
  * scale"), and Q345's full CP-ALS cycle against its structural
  * invariants. The cross-engine hash gate stays the DuckDB oracle; these
  * pin the MODEL.
  */
class Round12GatesSpec extends SparkSpec {

  test("Q334 DOULION estimate is within declared error of the exact count") {
    // Deterministic md5 sampling makes these fixed facts about the
    // fixture corpora, not flaky draws. Measured relative errors:
    // sf0.001 → +0.8% / +4.6% / +0.4%, sf0.01 → −4.5% / −1.6% / −1.9%
    // at p = 1/8, 1/4, 1/2; the pins leave honest headroom (DOULION
    // Var(T̂)/T² ≈ (p⁻³−1)/T) without admitting a broken estimator.
    for (tier <- Seq("sf0.001", "sf0.01")) {
      val dir = sf(tier)
      val exact = Graphs.triangleCorners(
        Derived.coOrderPairCounts(spark, dir).select(col("a"), col("b")))
        .count() / 3
      assert(exact > 0, s"$tier: fixture co-order graph has no triangles")
      val rows = Graphs.q334(spark, dir)
        .select(col("num"), col("kept_edges"), col("est_triangles"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L))
      // nested sampling: the num=1 graph is a subgraph of num=2 of num=4
      assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted,
        s"$tier: kept_edges must be monotone in the rate (nested draws)")
      rows.foreach { case (num, _, est) =>
        val bound = if (num == 1L) 0.15 else 0.10
        val rel = math.abs(est - exact).toDouble / exact
        assert(rel <= bound,
          s"$tier p=$num/8: est=$est exact=$exact relerr=$rel > $bound")
      }
    }
  }

  test("Q345 full CP-ALS cycle: quantization and λ invariants hold") {
    val dir = sf("sf0.001")
    val out = TensorGates.q345(spark, dir).collect()
    assert(out.nonEmpty)
    val c0 = out.map(_.getLong(2))
    val c1 = out.map(_.getLong(3))
    // max-normalization: the arg-max entry snaps to EXACTLY ±Grid and
    // nothing exceeds it (|x/λ| ≤ 1 by construction of λ = max|x|).
    assert(c0.map(math.abs).max == 1024L,
      s"c0q max |entry| = ${c0.map(math.abs).max}, expected the grid 1024")
    assert(c1.map(math.abs).max == 1024L)
    // λs are positive (|det|-normalized numerator maxima) and constant.
    for (idx <- 4 to 9) {
      val lams = out.map(_.getDouble(idx)).distinct
      assert(lams.length == 1, s"λ column $idx must be constant, got $lams")
      assert(lams.head > 0, s"λ column $idx must be positive, got $lams")
    }
    // the day spine is fully covered (one row per day index, contiguous)
    val ks = out.map(_.getLong(0)).sorted
    assert(ks.toSeq == (0L until ks.length).toSeq,
      "day mode must cover the contiguous spine")
  }
}
