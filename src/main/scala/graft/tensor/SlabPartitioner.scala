package graft.tensor

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD

/** C13 — slice→slab load-balancing partitioner (SURVEY.md §2.11).
  *
  * Mode-1 slices X(i,:,:) are grouped into `numSlabs` slabs so that the
  * total nonzero count per slab is balanced even when slice sizes are
  * heavily skewed — the published PARAslice contribution for dense, skewed
  * tensors. Assignment is greedy LPT (longest-processing-time): slices
  * sorted by descending nonzero count, each placed on the currently
  * lightest slab. LPT guarantees max-load ≤ 4/3 · optimal.
  *
  * Two construction paths:
  *  - [[SlabPartitioner.balanced]]: exact, from the full per-slice
  *    histogram — O(I) driver memory, for I that fits the driver.
  *  - [[SlabPartitioner.balancedSketched]]: bounded driver memory for
  *    arbitrary I — only the `maxHeavy` heaviest slices (a distributed
  *    bounded-heap top-k, O(maxHeavy) on the driver) are LPT-placed; the
  *    uniform tail falls through to the `i % numSlabs` hash rule, and the
  *    greedy placement is seeded with the tail's actual per-slab loads
  *    (numSlabs longs from one reduceByKey) so heavy slices compensate
  *    any tail imbalance. Skew lives in the head by definition, so the
  *    LPT guarantee (max ≤ start-max + ideal-share + largest-heavy)
  *    carries over — property-checked in TensorSpec.
  */
final class SlabPartitioner(sliceToSlab: Map[Long, Int], val numSlabs: Int)
    extends Partitioner {
  require(numSlabs > 0)
  override def numPartitions: Int = numSlabs
  override def getPartition(key: Any): Int = key match {
    case i: Long => sliceToSlab.getOrElse(i, (i % numSlabs).toInt)
    case _       => 0
  }
  override def equals(other: Any): Boolean = other match {
    case p: SlabPartitioner => p.numSlabs == numSlabs && p.sliceToSlabView == sliceToSlabView
    case _                  => false
  }
  override def hashCode(): Int = numSlabs
  private def sliceToSlabView = sliceToSlab
}

object SlabPartitioner {

  /** Greedy LPT assignment from per-slice weights. */
  def balanced(sliceWeights: Seq[(Long, Long)], numSlabs: Int): SlabPartitioner =
    new SlabPartitioner(lpt(sliceWeights, Array.fill(numSlabs)(0L)), numSlabs)

  /** Bounded-driver-memory assignment from a distributed histogram: LPT
    * over the `maxHeavy` heaviest slices, seeded with the hashed tail's
    * real per-slab loads. Driver state: maxHeavy pairs + numSlabs longs,
    * independent of I.
    */
  def balancedSketched(
      sliceWeights: RDD[(Long, Long)],
      numSlabs: Int,
      maxHeavy: Int): SlabPartitioner = {
    // Distributed bounded heap: O(maxHeavy) per partition and on the driver.
    val heavy = sliceWeights
      .top(maxHeavy)(Ordering.by { case (i, w) => (w, i) })
    val heavyIds = heavy.map(_._1).toSet
    val bcHeavy = sliceWeights.sparkContext.broadcast(heavyIds)
    val tailLoads = sliceWeights
      .filter { case (i, _) => !bcHeavy.value.contains(i) }
      .map { case (i, w) => ((i % numSlabs).toInt, w) }
      .reduceByKey(_ + _)
      .collect() // ≤ numSlabs rows by construction
    bcHeavy.destroy()
    val loads = Array.fill(numSlabs)(0L)
    tailLoads.foreach { case (s, w) => loads(s) = w }
    new SlabPartitioner(lpt(heavy.toSeq, loads), numSlabs)
  }

  /** Deterministic greedy LPT into pre-loaded slabs: sort by (weight
    * desc, slice id) so ties break stably, place each on the currently
    * lightest slab.
    */
  private def lpt(sliceWeights: Seq[(Long, Long)], loads: Array[Long]): Map[Long, Int] = {
    val numSlabs = loads.length
    val assign = Map.newBuilder[Long, Int]
    sliceWeights.sortBy { case (i, w) => (-w, i) }.foreach { case (i, w) =>
      var best = 0
      var m = loads(0)
      var s = 1
      while (s < numSlabs) {
        if (loads(s) < m) { m = loads(s); best = s }
        s += 1
      }
      loads(best) += w
      assign += (i -> best)
    }
    assign.result()
  }
}
