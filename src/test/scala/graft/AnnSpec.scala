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

  test("SQ8 quantized search: bounded decode error, high recall, 1/4 the bytes") {
    val c = Catalog(spark, sf("sf0.01"))
    val (mins, ranges) = Ann.sqFit(c.embeddings, "embedding")
    assert(mins.length == 64 && ranges.forall(_ > 0))
    val codes = Ann.sqEncode(c.embeddings, "embedding", mins, ranges)
      .select(col("vec_id"), col("codes"))

    // Reconstruction error per dimension is bounded by half a quantization
    // step (range/255 per step, + float slack).
    val maxErr = Ann.sqEncode(c.embeddings, "embedding", mins, ranges)
      .select(greatest((0 until 64).map(i =>
        abs(element_at(Ann.sqDecodeCol(col("codes"), mins, ranges), i + 1) -
          element_at(col("embedding"), i + 1).cast("double"))): _*).as("err"))
      .agg(max(col("err"))).collect()(0).getDouble(0)
    val maxStep = ranges.max / 255.0
    assert(maxErr <= maxStep * 0.501 + 1e-9, s"decode error $maxErr > step/2 $maxStep")

    // Recall@5 of the quantized search vs the exact float search.
    val probes = c.embeddings.filter(col("vec_id") < 10)
    val exact = VectorOps.cosineTopK(probes, c.embeddings, 5)
      .select(col("p_id"), col("n_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Ann.sqTopK(probes, codes, mins, ranges, 5)
      .select(col("p_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 recall@5 = $recall")
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

  test("written IVF index: probes partition-prune to their cells and keep recall") {
    val c = Catalog(spark, sf("sf0.01"))
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    val centroids = Ann.writeIvfIndex(spark, c.embeddings, path, nlist = 10)
    assert(centroids.count() == 10)
    // On-disk layout: one directory per cell.
    val cellDirs = new java.io.File(path).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.length == 10, cellDirs.mkString(","))

    val probes = c.embeddings.filter(col("vec_id") < 10)
    val res = Ann.probeIvfIndex(spark, path, probes, centroids, k = 5, nprobe = 4)
    // Partition pruning must reach the scan: the index read carries a
    // partition filter on cell, not a full-table scan.
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell#") || plan.contains("cell IN") ||
      plan.contains("PartitionFilters: [isnotnull(cell"), plan.take(4000))

    val exact = VectorOps.cosineTopK(probes, c.embeddings, 5)
      .select(col("p_id"), col("n_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = res.select(col("vec_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"indexed IVF recall@5 = $recall")
  }

  test("PQ: 8-byte codes, ADC shortlist + exact rerank keeps recall") {
    val c = Catalog(spark, sf("sf0.01"))
    val model = Ann.pqFit(c.embeddings, "embedding", m = 16, ksub = 16, iters = 4)
    assert(model.codebooks.length == 16)
    assert(model.codebooks.forall(b => b.length == 16 && b.forall(_.length == 4)))

    val codes = Ann.pqEncode(c.embeddings, "embedding", model).cache()
    try {
      // every code fits in 4 bits → 16 codes = 8 bytes per vector (32×
      // smaller than the 256-byte float embedding)
      val r = codes
        .agg(max(size(col("codes"))).as("m"), max(array_max(col("codes"))).as("mx"))
        .collect()(0)
      assert(r.getInt(0) == 16 && r.getInt(1) < 16, r.toString)

      val probes = c.embeddings.filter(col("vec_id") < 10)
      val exact = VectorOps.cosineTopK(probes, c.embeddings, 5)
        .select(col("p_id"), col("n_id"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val got = Ann.pqTopK(probes, codes, c.embeddings, model, 5, shortlist = 100)
        .select(col("p_id"), col("neighbor_id"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val recall = (exact & got).size.toDouble / exact.size
      assert(recall >= 0.6, s"PQ recall@5 = $recall")
    } finally { codes.unpersist(); () }
  }

  test("IVF-PQ: cell-pruned candidates, 32x-compressed codes, recall >= 0.9 at high nprobe") {
    val c = Catalog(spark, sf("sf0.01"))
    val nlist = 10
    val (model, codesRaw) = Ann.ivfPqFit(c.embeddings, nlist = nlist, m = 16,
      ksub = 16, iters = 4)
    val codes = codesRaw.cache()
    try {
      val corpus = codes.count()
      // index geometry: every vector has a cell and 16 4-bit codes
      val r = codes.agg(max(size(col("codes"))).as("m"),
        max(array_max(col("codes"))).as("mx")).collect()(0)
      assert(r.getInt(0) == 16 && r.getInt(1) < 16, r.toString)

      val probes = c.embeddings.filter(col("vec_id") < 10)
      val exact = VectorOps.cosineTopK(probes, c.embeddings, 5)
        .select(col("p_id"), col("n_id"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet

      // nprobe sweep: recall must rise with nprobe and clear 0.9 when
      // probing (nearly) all cells; candidate rows stay ≤ the probed-cell
      // share of the corpus (cell pruning is real, not cosmetic).
      val recalls = Seq(2, 4, nlist).map { nprobe =>
        val got = Ann.ivfPqTopK(probes, codes, c.embeddings, model, 5,
            nprobe = nprobe, shortlist = 100)
          .select(col("p_id"), col("neighbor_id"))
          .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
        nprobe -> (exact & got).size.toDouble / exact.size
      }.toMap
      assert(recalls(nlist) >= 0.9, s"IVF-PQ full-probe recall@5 = ${recalls(nlist)}")
      assert(recalls(2) <= recalls(nlist) + 1e-9, s"recall did not rise with nprobe: $recalls")

      // candidate bound at nprobe=2: the scanned code rows are exactly the
      // probed cells' rows — measure the fraction directly.
      val cellSizes = codes.groupBy(col("cell")).count()
        .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
      val probeIds = probes.select(col("vec_id"),
        graft.operators.VectorOps.unitArr(col("embedding"))).collect()
      val probedRows = probeIds.map { row =>
        val q = row.getSeq[Double](1).toArray
        model.centroids.zipWithIndex.map { case (cen, i) =>
          (cen.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum, i)
        }.sortBy(t => (t._1, t._2)).take(2).map(t => cellSizes.getOrElse(t._2, 0L)).sum
      }.max
      assert(probedRows < corpus, s"nprobe=2 still touches the whole corpus")
      assert(probedRows.toDouble / corpus <= 0.7,
        s"nprobe=2 candidate share ${probedRows.toDouble / corpus} not pruned")
    } finally { codes.unpersist(); () }
  }
}
