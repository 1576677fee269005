package graft.tensor

import breeze.linalg.{pinv, DenseMatrix}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** CP-ALS rank-R tensor decomposition, slab-distributed (SURVEY.md §2.11
  * C12/C14; Kolda & Bader, SIAM Review 51(3) 2009; Aggour et al., IEEE Big
  * Data 2018 slice/slab scheme — reference checkout is empty, SURVEY §0.1,
  * so semantics follow the published algorithm).
  *
  * Distribution layout (the PARAslice design, re-expressed Spark-first):
  *  - The COO tensor is partitioned along mode 1 into load-balanced slabs
  *    ([[SlabPartitioner]]); each Spark partition holds one slab as
  *    primitive arrays (no per-nonzero objects in the inner loop).
  *  - Factor matrices A (I×R), B (J×R), C (K×R) are dense, driver-resident,
  *    broadcast each half-iteration; executors compute per-slab partial
  *    MTTKRPs; `treeAggregate` reduces J×R / K×R partials; the R×R Gram
  *    solves (Hadamard of Gramians, pseudo-inverted via breeze) happen on
  *    the driver.
  *  - Because slabs partition mode 1, the A-side MTTKRP needs NO shuffle at
  *    all: each slab owns its i-rows exclusively and emits finished rows.
  *    Per iteration: 3 broadcasts + 3 jobs, exactly the published loop.
  *
  * Scale notes: the shuffled state per iteration is only the J×R and K×R
  * partials (tree-reduced), never the tensor; the tensor itself is read
  * from the persisted slab RDD. For an I×R too big for the driver, A stays
  * distributed as emitted — the collect below is a test-scale convenience
  * documented as such.
  *
  * Fit (C14) uses the standard CP identities — ‖X̂‖² = 1ᵀ(AᵀA∘BᵀB∘CᵀC)1 and
  * ⟨X,X̂⟩ = vec(MTTKRP_C)·vec(C) — so the residual norm never materializes
  * the reconstruction.
  */
object CPALS {

  /** One slab: column-layout primitive arrays of its nonzeros. */
  private final case class Slab(is: Array[Int], js: Array[Int], ks: Array[Int], vs: Array[Double])

  final case class CPModel(
      lambda: Array[Double],
      a: Array[Double], // I×R row-major
      b: Array[Double], // J×R row-major
      c: Array[Double], // K×R row-major
      dims: (Int, Int, Int),
      rank: Int,
      fits: Vector[Double]) {
    def finalFit: Double = fits.lastOption.getOrElse(0.0)
    def iterations: Int = fits.length
  }

  /** Decompose a COO DataFrame with columns (i,j,k,v) — e.g. Q43's output. */
  def fit(
      coo: DataFrame,
      rank: Int,
      seed: Long = 42L,
      tol: Double = 1e-4,
      maxIter: Int = 50,
      numSlabs: Int = 0): CPModel = {
    val spark = coo.sparkSession
    import org.apache.spark.sql.functions.col
    val rows: RDD[(Long, Long, Long, Double)] = coo
      .select(col("i").cast("long"), col("j").cast("long"), col("k").cast("long"),
        col("v").cast("double"))
      .rdd.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    val slabs = numSlabs match {
      case n if n > 0 => n
      case _          => math.max(2, spark.sparkContext.defaultParallelism)
    }
    fitRdd(rows, rank, seed, tol, maxIter, slabs)
  }

  /** Multi-start ALS: run `numStarts` seeded fits, keep the best final fit.
    * ALS is monotone but only locally convergent — "swamp" stationary
    * points are well documented (Kolda & Bader §3.4); restarting from a
    * few seeds is the standard remedy. Starts share the persisted slab
    * RDD cost structure (each fit re-reads the cached slabs, never the
    * source), so extra starts cost iterations only.
    */
  def fitBest(
      rows: RDD[(Long, Long, Long, Double)],
      rank: Int,
      seed: Long,
      tol: Double,
      maxIter: Int,
      numSlabs: Int,
      numStarts: Int): CPModel =
    (0 until numStarts)
      .map(s => fitRdd(rows, rank, seed + s, tol, maxIter, numSlabs))
      .maxBy(_.finalFit)

  def fitRdd(
      rows: RDD[(Long, Long, Long, Double)],
      rank: Int,
      seed: Long,
      tol: Double,
      maxIter: Int,
      numSlabs: Int): CPModel = {
    val sc = rows.sparkContext
    val r = rank

    // Dims + per-slice histogram in one pass each (map-side combined).
    val (maxI, maxJ, maxK, normX2) = rows
      .map { case (i, j, k, v) => (i, j, k, v * v) }
      .treeAggregate((0L, 0L, 0L, 0.0))(
        (acc, x) => (acc._1 max x._1, acc._2 max x._2, acc._3 max x._3, acc._4 + x._4),
        (a, b) => (a._1 max b._1, a._2 max b._2, a._3 max b._3, a._4 + b._4))
    val (ni, nj, nk) = ((maxI + 1).toInt, (maxJ + 1).toInt, (maxK + 1).toInt)

    val sliceWeights = rows.map { case (i, _, _, _) => (i, 1L) }
      .reduceByKey(_ + _).collect().toSeq
    val partitioner = SlabPartitioner.balanced(sliceWeights, numSlabs)

    // C13: slab-partitioned, primitive-array packed, persisted once.
    val slabRdd: RDD[Slab] = rows
      .map { case (i, j, k, v) => (i, (j, k, v)) }
      .partitionBy(partitioner)
      .mapPartitions { it =>
        val is = Array.newBuilder[Int]; val js = Array.newBuilder[Int]
        val ks = Array.newBuilder[Int]; val vs = Array.newBuilder[Double]
        it.foreach { case (i, (j, k, v)) =>
          is += i.toInt; js += j.toInt; ks += k.toInt; vs += v
        }
        Iterator.single(Slab(is.result(), js.result(), ks.result(), vs.result()))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    slabRdd.count() // materialize before iterating

    // Seeded deterministic init of B, C (A is produced by the first update).
    val rng = new scala.util.Random(seed)
    // Centered Gaussian init: an all-positive init is near-collinear in
    // expectation, which conditions the Gram Hadamard products badly and
    // can trap ALS far from the optimum.
    var bMat = Array.fill(nj * r)(rng.nextGaussian())
    var cMat = Array.fill(nk * r)(rng.nextGaussian())
    var aMat = new Array[Double](ni * r)

    def gram(m: Array[Double], n: Int): DenseMatrix[Double] = {
      val g = DenseMatrix.zeros[Double](r, r)
      var row = 0
      while (row < n) {
        var p = 0
        while (p < r) {
          val vp = m(row * r + p)
          var q = 0
          while (q < r) { g(p, q) += vp * m(row * r + q); q += 1 }
          p += 1
        }
        row += 1
      }
      g
    }
    def hadamard(x: DenseMatrix[Double], y: DenseMatrix[Double]): DenseMatrix[Double] = {
      val z = DenseMatrix.zeros[Double](r, r)
      var p = 0
      while (p < r) { var q = 0; while (q < r) { z(p, q) = x(p, q) * y(p, q); q += 1 }; p += 1 }
      z
    }
    def matmulInto(m: Array[Double], n: Int, g: DenseMatrix[Double]): Array[Double] = {
      val out = new Array[Double](n * r)
      var row = 0
      while (row < n) {
        var q = 0
        while (q < r) {
          var s = 0.0
          var p = 0
          while (p < r) { s += m(row * r + p) * g(p, q); p += 1 }
          out(row * r + q) = s
          q += 1
        }
        row += 1
      }
      out
    }

    // MTTKRP against modes 2/3: per-slab dense partial, tree-reduced.
    def mttkrpJK(
        mode: Int, // 1 -> rows over j, 2 -> rows over k
        f1: Array[Double], f2: Array[Double], outRows: Int): Array[Double] = {
      val bc1 = sc.broadcast(f1); val bc2 = sc.broadcast(f2)
      val res = slabRdd.treeAggregate(new Array[Double](outRows * r))(
        (acc, slab) => {
          val x1 = bc1.value; val x2 = bc2.value
          var n = 0
          val len = slab.vs.length
          while (n < len) {
            val i = slab.is(n); val j = slab.js(n); val k = slab.ks(n); val v = slab.vs(n)
            val (outRow, r1, r2) = if (mode == 1) (j, i, k) else (k, i, j)
            var p = 0
            while (p < r) {
              acc(outRow * r + p) += v * x1(r1 * r + p) * x2(r2 * r + p)
              p += 1
            }
            n += 1
          }
          acc
        },
        (x, y) => { var n = 0; while (n < x.length) { x(n) += y(n); n += 1 }; x })
      bc1.destroy(); bc2.destroy()
      res
    }

    val fits = Vector.newBuilder[Double]
    var fitsSoFar = Vector.empty[Double]
    var prevFit = Double.NegativeInfinity
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // --- update A: slab-local (mode-1 ownership), no reduce needed.
      val gA = pinv(hadamard(gram(bMat, nj), gram(cMat, nk)))
      val bcB = sc.broadcast(bMat); val bcC = sc.broadcast(cMat)
      val gaFlat = sc.broadcast(Array.tabulate(r * r)(n => gA(n / r, n % r)))
      val aRows = slabRdd.flatMap { slab =>
        val b = bcB.value; val c = bcC.value; val g = gaFlat.value
        val local = scala.collection.mutable.HashMap.empty[Int, Array[Double]]
        var n = 0
        val len = slab.vs.length
        while (n < len) {
          val row = local.getOrElseUpdate(slab.is(n), new Array[Double](r))
          val j = slab.js(n); val k = slab.ks(n); val v = slab.vs(n)
          var p = 0
          while (p < r) { row(p) += v * b(j * r + p) * c(k * r + p); p += 1 }
          n += 1
        }
        local.iterator.map { case (i, m) =>
          val out = new Array[Double](r)
          var q = 0
          while (q < r) {
            var s = 0.0; var p = 0
            while (p < r) { s += m(p) * g(p * r + q); p += 1 }
            out(q) = s; q += 1
          }
          (i, out)
        }
      }.collect() // test-scale convenience; stays distributed at true scale
      bcB.destroy(); bcC.destroy(); gaFlat.destroy()
      java.util.Arrays.fill(aMat, 0.0)
      aRows.foreach { case (i, row) => System.arraycopy(row, 0, aMat, i * r, r) }

      // --- update B from MTTKRP over (A, C).
      val mB = mttkrpJK(1, aMat, cMat, nj)
      bMat = matmulInto(mB, nj, pinv(hadamard(gram(aMat, ni), gram(cMat, nk))))

      // --- update C from MTTKRP over (A, B).
      val mC = mttkrpJK(2, aMat, bMat, nk)
      cMat = matmulInto(mC, nk, pinv(hadamard(gram(aMat, ni), gram(bMat, nj))))

      // --- fit via CP identities (no reconstruction).
      val cross = { var s = 0.0; var n = 0; while (n < mC.length) { s += mC(n) * cMat(n); n += 1 }; s }
      val gAll = hadamard(hadamard(gram(aMat, ni), gram(bMat, nj)), gram(cMat, nk))
      val model2 = {
        var s = 0.0; var p = 0
        while (p < r) { var q = 0; while (q < r) { s += gAll(p, q); q += 1 }; p += 1 }
        s
      }
      val resid2 = math.max(0.0, normX2 - 2.0 * cross + model2)
      val fit = 1.0 - math.sqrt(resid2) / math.sqrt(normX2)
      fits += fit
      fitsSoFar = fitsSoFar :+ fit
      if (fit - prevFit < tol && iter > 0) converged = true
      prevFit = fit
      iter += 1
    }

    // Column-normalize into lambda.
    val lambda = Array.fill(r)(1.0)
    def normalize(m: Array[Double], n: Int): Unit = {
      var p = 0
      while (p < r) {
        var s = 0.0; var row = 0
        while (row < n) { val x = m(row * r + p); s += x * x; row += 1 }
        val nrm = math.sqrt(s)
        if (nrm > 0) {
          lambda(p) *= nrm
          row = 0
          while (row < n) { m(row * r + p) /= nrm; row += 1 }
        }
        p += 1
      }
    }
    normalize(aMat, ni); normalize(bMat, nj); normalize(cMat, nk)
    slabRdd.unpersist(blocking = false)
    CPModel(lambda, aMat, bMat, cMat, (ni, nj, nk), r, fitsSoFar)
  }
}
