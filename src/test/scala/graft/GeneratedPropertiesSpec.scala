package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property tests (SURVEY.md §5.3) over driver-side algebra —
  * the pieces whose correctness is a math property, not a fixture: the
  * UDAF merge monoid, slab balancing bounds, and Jaccard set identities.
  */
object GeneratedPropertiesSpec extends Properties("graft") {

  private val m = graft.functions.LogProduct

  property("LogProduct merge: associative, commutative, zero-identity") =
    Prop.forAll(Gen.chooseNum(-50.0, 50.0), Gen.chooseNum(-50.0, 50.0),
      Gen.chooseNum(-50.0, 50.0)) { (a, b, c) =>
      math.abs(m.merge(m.merge(a, b), c) - m.merge(a, m.merge(b, c))) < 1e-9 &&
      m.merge(a, b) == m.merge(b, a) &&
      m.merge(a, m.zero) == a
    }

  property("LogProduct reduce+finish == product") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0.5, 2.0))) { xs =>
      val viaAgg = m.finish(xs.foldLeft(m.zero)(m.reduce))
      math.abs(viaAgg - xs.product) / xs.product < 1e-9
    }

  property("SlabPartitioner: in-range assignment, LPT load bound") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(1L, 100L))),
      Gen.chooseNum(1, 16)) { (raw, slabs) =>
      val weights = raw.toMap.toSeq // dedupe slice ids
      val p = graft.tensor.SlabPartitioner.balanced(weights, slabs)
      val loads = new Array[Long](slabs)
      val inRange = weights.forall { case (i, w) =>
        val s = p.getPartition(i)
        if (s >= 0 && s < slabs) { loads(s) += w; true } else false
      }
      val ideal = weights.map(_._2).sum.toDouble / slabs
      val largest = weights.map(_._2).max
      // Always-valid greedy bound: when the eventual max slab received its
      // last slice it was the least loaded, hence at or below the mean, so
      // max ≤ ideal + largest. (4/3·OPT is the LPT guarantee, but OPT is
      // not computable here and max(largest, ideal) underestimates it —
      // e.g. five equal slices on four slabs.)
      inRange && loads.max <= ideal.ceil.toLong + largest
    }

  property("Jaccard on bitmask sets: identity, symmetry, bounds, formula") =
    Prop.forAll(Gen.chooseNum(1L, (1L << 31) - 1), Gen.chooseNum(1L, (1L << 31) - 1)) {
      (a, b) =>
        def j(x: Long, y: Long): Double = {
          val inter = java.lang.Long.bitCount(x & y).toDouble
          inter / java.lang.Long.bitCount(x | y).toDouble
        }
        val inter = java.lang.Long.bitCount(a & b).toDouble
        val alt = inter /
          (java.lang.Long.bitCount(a) + java.lang.Long.bitCount(b) - inter)
        j(a, a) == 1.0 && j(a, b) == j(b, a) &&
          j(a, b) >= 0.0 && j(a, b) <= 1.0 &&
          math.abs(j(a, b) - alt) < 1e-12
    }
}
