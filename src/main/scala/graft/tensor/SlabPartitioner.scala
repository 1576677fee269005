package graft.tensor

import org.apache.spark.Partitioner

/** C13 — slice→slab load-balancing partitioner (SURVEY.md §2.11).
  *
  * Mode-1 slices X(i,:,:) are grouped into `numSlabs` slabs so that the
  * total nonzero count per slab is balanced even when slice sizes are
  * heavily skewed — the published PARAslice contribution for dense, skewed
  * tensors. Assignment is greedy LPT (longest-processing-time): slices
  * sorted by descending nonzero count, each placed on the currently
  * lightest slab. LPT guarantees max-load ≤ 4/3 · optimal.
  *
  * At 100 TB the per-slice histogram comes from one groupBy over the COO
  * relation (map-side combined); the assignment table is O(I) on the
  * driver and broadcast implicitly inside this Partitioner. For an I too
  * large for the driver, the same scheme degrades gracefully to
  * hash-of-range buckets — not needed at declared scales.
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
  def balanced(sliceWeights: Seq[(Long, Long)], numSlabs: Int): SlabPartitioner = {
    val loads = Array.fill(numSlabs)(0L)
    val assign = Map.newBuilder[Long, Int]
    // Deterministic: sort by (weight desc, slice id) so ties break stably.
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
    new SlabPartitioner(assign.result(), numSlabs)
  }
}
