package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.{Vector => MlVector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over the embedding column — the
  * 100 TB scale path for Q38's exact brute-force cosine top-k
  * (SURVEY.md §2.9 scale path ⚠; recall-checked against the exact form in
  * AnnSpec).
  *
  * Embeddings are L2-normalized so Euclidean distance is a monotone
  * transform of cosine (d² = 2 − 2·cos); random-projection LSH buckets
  * then approximate cosine neighborhoods. Candidate generation is an
  * equi-join on hash buckets (approxSimilarityJoin) — no all-pairs pass —
  * followed by exact re-ranking of candidates only.
  */
object Ann {

  private val toUnitVec = udf { (a: Seq[Float]) =>
    val d = a.map(_.toDouble).toArray
    val n = math.sqrt(d.map(x => x * x).sum)
    Vectors.dense(if (n > 0) d.map(_ / n) else d): MlVector
  }

  /** Fit an LSH model and return approximate cosine top-k neighbors for
    * the probe set. Output: (vec_id, rnk, neighbor_id, cos).
    */
  def cosineTopKApprox(
      spark: SparkSession,
      vectors: DataFrame, // (vec_id, embedding)
      probeIds: DataFrame, // (vec_id)
      k: Int,
      numHashTables: Int = 15,
      bucketLength: Double = 0.5,
      maxDistance: Double = 1.35): DataFrame = {
    val data = vectors.select(col("vec_id"), toUnitVec(col("embedding")).as("features"))
    val brp = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42)
    val model = brp.fit(data)
    val probes = data.join(probeIds, Seq("vec_id"))
      .select(col("vec_id").as("p_id"), col("features"))
    val joined = model.approxSimilarityJoin(probes, data, maxDistance, "dist")
      .select(
        col("datasetA.p_id").as("vec_id"),
        col("datasetB.vec_id").as("neighbor_id"),
        // exact cosine on the candidate only: d² = 2 − 2cos on unit vectors
        (lit(1.0) - col("dist") * col("dist") / 2.0).as("cos"))
      .filter(col("vec_id") =!= col("neighbor_id"))
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("cos"), asc("neighbor_id"))
    joined.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer partitions the
    * vector table into `nlist` cells; a probe searches only its `nprobe`
    * nearest cells, exactly re-ranked with the codegen'd dot product.
    * The cell assignment is the index build (one pass + tiny centroid
    * table broadcast); at 100 TB the vectors would be written bucketed by
    * cell so a probe reads only its cells' files.
    */
  def cosineTopKIvf(
      spark: SparkSession,
      vectors: DataFrame, // (vec_id, embedding)
      probeIds: DataFrame, // (vec_id)
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val data = vectors
      .select(col("vec_id"), toUnitVec(col("embedding")).as("features"))
      .cache()
    val model = new KMeans().setK(nlist).setSeed(42).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(data)
    val assigned = model.transform(data)
      .select(col("vec_id"), col("cell"), vector_to_array(col("features")).as("unit"))
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq)
      .toDF("cell", "centroid")

    // Probe → nprobe nearest cells (by cosine to centroid).
    val probes = assigned.join(probeIds, Seq("vec_id"))
      .select(col("vec_id").as("p_id"), col("unit").as("p_unit"))
    val wCell = Window.partitionBy(col("p_id")).orderBy(desc("c_cos"), asc("cell"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("c_cos", call_function("graft_dot", col("p_unit"), col("centroid")))
      .withColumn("c_rnk", row_number().over(wCell))
      .filter(col("c_rnk") <= nprobe)
      .select(col("p_id"), col("p_unit"), col("cell"))

    // Exact re-rank inside the probed cells only.
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("cos"), asc("neighbor_id"))
    probeCells.join(assigned, Seq("cell"))
      .filter(col("p_id") =!= col("vec_id"))
      .withColumn("cos", call_function("graft_dot", col("p_unit"), col("unit")))
      .select(col("p_id").as("vec_id"), col("vec_id").as("neighbor_id"), col("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Physical IVF index: vectors L2-normalized, cell-assigned, and WRITTEN
    * partitioned by cell — each cell is its own parquet directory. Returns
    * the (cell, centroid) table to keep (tiny: nlist rows; in production
    * it rides alongside the index).
    *
    * This is the piece that makes IVF pay at 100 TB: the scan layout
    * matches the search structure, so a probe's nprobe cells map to
    * nprobe directories and partition pruning skips every other file on
    * disk. Index build is one k-means fit (sampled in production) + one
    * linear assignment pass + one partitioned write.
    */
  def writeIvfIndex(
      spark: SparkSession,
      vectors: DataFrame, // (vec_id, embedding)
      path: String,
      nlist: Int = 16): DataFrame = {
    val data = vectors
      .select(col("vec_id"), toUnitVec(col("embedding")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(42).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(data)
    model.transform(data)
      .select(col("vec_id"), vector_to_array(col("features")).as("unit"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq)
      .toDF("cell", "centroid")
  }

  /** Probe a written IVF index: route each probe vector to its nprobe
    * nearest centroids (broadcast, tiny), collect the DISTINCT probed cell
    * ids (≤ nlist integers — bounded by construction, never by data), and
    * read the index with a static `cell IN (...)` predicate so partition
    * pruning limits the scan to the probed directories. Exact re-rank with
    * the codegen'd dot product inside those cells only.
    */
  def probeIvfIndex(
      spark: SparkSession,
      indexPath: String,
      probes: DataFrame, // (vec_id, embedding)
      centroids: DataFrame, // (cell, centroid) from writeIvfIndex
      k: Int,
      nprobe: Int = 4): DataFrame = {
    val p = probes
      .select(col("vec_id").as("p_id"),
        vector_to_array(toUnitVec(col("embedding"))).as("p_unit"))
    val wCell = Window.partitionBy(col("p_id")).orderBy(desc("c_cos"), asc("cell"))
    val probeCells = p.crossJoin(broadcast(centroids))
      .withColumn("c_cos", call_function("graft_dot", col("p_unit"), col("centroid")))
      .withColumn("c_rnk", row_number().over(wCell))
      .filter(col("c_rnk") <= nprobe)
      .select(col("p_id"), col("p_unit"), col("cell"))
    val cells = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val idx = spark.read.parquet(indexPath).where(col("cell").isin(cells: _*))
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("cos"), asc("neighbor_id"))
    probeCells.join(idx, Seq("cell"))
      .filter(col("p_id") =!= col("vec_id"))
      .withColumn("cos", call_function("graft_dot", col("p_unit"), col("unit")))
      .select(col("p_id").as("vec_id"), col("vec_id").as("neighbor_id"), col("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Per-dimension (min, range) of an embedding column — the scalar-
    * quantization codebook. One posexplode + groupBy(pos) pass; the
    * collected state is d pairs of doubles, independent of corpus size.
    */
  def sqFit(df: DataFrame, embCol: String): (Array[Double], Array[Double]) = {
    val stats = df
      .select(posexplode(col(embCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect().sortBy(_.getInt(0))
    val mins = stats.map(_.getFloat(1).toDouble)
    // Zero-range dims quantize to a constant; guard the divide.
    val ranges = stats.map(r => math.max(r.getFloat(2) - r.getFloat(1), 1e-12f).toDouble)
    (mins, ranges)
  }

  /** int8 scalar quantization (SQ8) of the embedding column: each
    * dimension maps affinely onto [-128, 127]. The codes column is
    * array<tinyint> — 1 byte/dim at rest vs 4 for float: the standard 4×
    * index-size lever in front of ANN search. Pure codegen'd per-row
    * transform, no shuffle.
    */
  def sqEncode(df: DataFrame, embCol: String,
      mins: Array[Double], ranges: Array[Double]): DataFrame = {
    val minA = array(mins.map(lit(_)).toIndexedSeq: _*)
    val rngA = array(ranges.map(lit(_)).toIndexedSeq: _*)
    df.withColumn("codes",
      zip_with(col(embCol), sequence(lit(1), lit(mins.length)),
        (x, i) => round((x.cast("double") - element_at(minA, i))
          / element_at(rngA, i) * lit(255.0) - lit(128.0)).cast("tinyint")))
  }

  /** Decoded (dequantized) double-array view of an SQ8 codes column. */
  def sqDecodeCol(codes: org.apache.spark.sql.Column,
      mins: Array[Double], ranges: Array[Double]): org.apache.spark.sql.Column = {
    val minA = array(mins.map(lit(_)).toIndexedSeq: _*)
    val rngA = array(ranges.map(lit(_)).toIndexedSeq: _*)
    zip_with(codes, sequence(lit(1), lit(mins.length)),
      (c, i) => element_at(minA, i) +
        (c.cast("double") + lit(128.0)) / lit(255.0) * element_at(rngA, i))
  }

  /** Top-k cosine search over the QUANTIZED corpus: decode codes on the
    * fly (scan-local arithmetic) and rank by graft_dot against the float
    * probes. Recall vs the exact float search is property-checked in
    * AnnSpec — SQ8's quantization error is ~range/510 per dim, far below
    * typical neighbor gaps.
    */
  /** Product quantization (Jégou, Douze & Schmid, "Product Quantization
    * for Nearest Neighbor Search", TPAMI 33(1) 2011): split each d-vector
    * into m subvectors, learn a ksub-centroid codebook per subspace
    * (Lloyd, deterministic seeds = the subvectors of the ksub smallest
    * vec_ids present),
    * store each vector as m small codes. With m=16, ksub=16 a 64-float
    * (256-byte) embedding compresses to 16 4-bit codes = 8 bytes — 32×,
    * vs SQ8's 4× (on unstructured data more subquantizers beat more
    * centroids; recall-tuned in AnnSpec).
    *
    * Scale shape: fitting broadcasts the m·ksub·dsub codebook and
    * reduces (sub, centroid)-keyed partial sums per iteration (same
    * discipline as Clustering.lloydStep — corpus never shuffled);
    * encoding is one map pass; ADC search broadcasts a per-probe m×ksub
    * lookup table and scores each code row with a codegen'd fold, then
    * exactly re-ranks only the shortlist.
    */
  final case class PqModel(m: Int, ksub: Int, dsub: Int,
      codebooks: Array[Array[Array[Double]]]) // (sub)(centroid)(dim)

  // PQ operates on L2-NORMALIZED vectors so subspace L2 distance is a
  // monotone surrogate of cosine (the same normalization the LSH path
  // uses); the final re-rank is exact cosine on the raw floats. The
  // IVF-PQ residual path passes normalize=false: residuals are already
  // in the centroid's tangent space and re-normalizing them would
  // destroy the distance structure.
  private def subVectors(df: DataFrame, embCol: String, m: Int, dsub: Int,
      normalize: Boolean = true) = {
    val prepared =
      if (normalize) VectorOps.unitArr(col(embCol))
      else col(embCol).cast("array<double>")
    df.select(col("vec_id"), prepared.as("nemb"))
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}, 1), s -> slice(nemb, s * $dsub + 1, $dsub))"))
      .as(Seq("sub", "svec")))
      .select(col("vec_id"), col("sub"),
        col("svec").cast("array<double>").as("svec"))
  }

  def pqFit(df: DataFrame, embCol: String, m: Int = 8, ksub: Int = 16,
      iters: Int = 5, normalize: Boolean = true): PqModel = {
    val head = df.select(size(col(embCol))).head(1)
    require(head.nonEmpty, "pqFit requires a non-empty vectors relation")
    val d = head(0).getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    // Deterministic seeds = the ksub SMALLEST vec_ids actually present
    // (the ids need not be dense from 0 — a filtered corpus is fine).
    val seedIds = df.select(col("vec_id")).orderBy(col("vec_id")).limit(ksub)
      .collect().map(_.getLong(0))
    require(seedIds.length == ksub,
      s"pqFit needs at least ksub=$ksub distinct vectors, found ${seedIds.length}")
    val seedRank = seedIds.zipWithIndex.toMap // id → centroid slot
    val subRdd = subVectors(df, embCol, m, dsub, normalize)
      .rdd.map(r => (r.getInt(1), r.getLong(0), r.getSeq[Double](2).toArray))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sc = subRdd.sparkContext
      var cb: Array[Array[Array[Double]]] = {
        val rankB = sc.broadcast(seedRank)
        val seeds = subRdd.filter(t => rankB.value.contains(t._2))
          .map { case (s, id, v) => ((s, rankB.value(id)), v) }.collectAsMap()
        Array.tabulate(m, ksub)((s, c) => seeds((s, c)))
      }
      def argmin(book: Array[Array[Double]], v: Array[Double]): Int = {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < book.length) {
          var dist = 0.0; var i = 0
          val cen = book(c)
          while (i < v.length) { val t = v(i) - cen(i); dist += t * t; i += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        best
      }
      var it = 0
      while (it < iters) {
        val b = sc.broadcast(cb)
        val sums = subRdd
          .map { case (s, _, v) => ((s, argmin(b.value(s), v)), (v, 1L)) }
          .reduceByKey { (a: (Array[Double], Long), b: (Array[Double], Long)) =>
            var i = 0
            while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
            (a._1, a._2 + b._2)
          }
          .collectAsMap()
        b.destroy()
        cb = Array.tabulate(m, ksub) { (s, c) =>
          sums.get((s, c))
            .map { case (v, n) => v.map(_ / n) }
            .getOrElse(cb(s)(c)) // empty cell keeps its centroid
        }
        it += 1
      }
      PqModel(m, ksub, dsub, cb)
    } finally { subRdd.unpersist(); () }
  }

  /** Encode every vector as its m nearest-centroid codes. `keep` carries
    * extra columns (e.g. the IVF cell id) through the encode projection.
    */
  def pqEncode(df: DataFrame, embCol: String, model: PqModel,
      normalize: Boolean = true, keep: Seq[String] = Nil): DataFrame = {
    // distance to each centroid unrolled as a codegen'd least-chain over
    // literal centroid arrays — no UDF in the encode path
    def subCode(s: Int): org.apache.spark.sql.Column = {
      val sv = expr(s"slice(nemb, ${s * model.dsub} + 1, ${model.dsub})")
      val dists = (0 until model.ksub).map { c =>
        val cen = array(model.codebooks(s)(c).map(lit(_)).toIndexedSeq: _*)
        struct(
          aggregate(zip_with(sv, cen, (x, y) => {
            val t = x.cast("double") - y; t * t
          }), lit(0.0), (acc, x) => acc + x).as("dist"),
          lit(c).as("code"))
      }
      least(dists: _*).getField("code")
    }
    val prepared =
      if (normalize) VectorOps.unitArr(col(embCol))
      else col(embCol).cast("array<double>")
    val kept = keep.map(col)
    df.select(Seq(col("vec_id"), prepared.as("nemb")) ++ kept: _*)
      .select(Seq(col("vec_id"),
        array((0 until model.m).map(subCode): _*).as("codes")) ++ kept: _*)
  }

  /** ADC (asymmetric distance) top-k: score codes against each probe's
    * per-subspace lookup table, shortlist, then exact cosine re-rank.
    */
  def pqTopK(probes: DataFrame, codesDf: DataFrame, vectors: DataFrame,
      model: PqModel, k: Int, shortlist: Int = 50): DataFrame = {
    val spark = probes.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // per-probe LUT: lut(s)(c) = ‖probe_sub(s) − centroid(s)(c)‖²
    val probeRows = probes.select(col("vec_id"),
      VectorOps.unitArr(col("embedding"))).collect().map { r =>
      val id = r.getLong(0)
      val emb = r.getSeq[Double](1).toArray
      val lut = Array.tabulate(model.m, model.ksub) { (s, c) =>
        var acc = 0.0; var i = 0
        val cen = model.codebooks(s)(c)
        while (i < model.dsub) {
          val t = emb(s * model.dsub + i) - cen(i); acc += t * t; i += 1
        }
        acc
      }
      Row(id, lut.map(_.toSeq).toSeq)
    }
    val lutDf = spark.createDataFrame(
      spark.sparkContext.parallelize(probeRows.toIndexedSeq, 1),
      StructType(Seq(StructField("p_id", LongType),
        StructField("lut", ArrayType(ArrayType(DoubleType))))))
    val wAdc = Window.partitionBy(col("p_id")).orderBy(asc("adc"), asc("vec_id"))
    val short = codesDf.crossJoin(broadcast(lutDf))
      .filter(col("p_id") =!= col("vec_id"))
      .withColumn("adc", expr(
        "aggregate(zip_with(codes, lut, (c, l) -> element_at(l, c + 1)), 0D, (acc, x) -> acc + x)"))
      .withColumn("rnk", row_number().over(wAdc))
      .filter(col("rnk") <= shortlist)
      .select(col("p_id"), col("vec_id").as("n_id"))
    exactRerank(short, probes, vectors, k)
  }

  /** Exact cosine re-rank of an ADC shortlist (p_id, n_id) against the
    * raw float vectors — the final stage of every compressed-search path.
    */
  private def exactRerank(short: DataFrame, probes: DataFrame,
      vectors: DataFrame, k: Int): DataFrame = {
    val v = vectors.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      VectorOps.l2(col("embedding")).as("n_norm"))
    val p = probes.select(col("vec_id").as("p_id"), col("embedding").as("p_emb"),
      VectorOps.l2(col("embedding")).as("p_norm"))
    val wCos = Window.partitionBy(col("p_id")).orderBy(desc("cos"), asc("n_id"))
    short.join(v, Seq("n_id")).join(broadcast(p), Seq("p_id"))
      .withColumn("cos",
        VectorOps.dot(col("p_emb"), col("n_emb")) / (col("p_norm") * col("n_norm")))
      .withColumn("rnk", row_number().over(wCos))
      .filter(col("rnk") <= k)
      .select(col("p_id"), col("rnk"), col("n_id").as("neighbor_id"),
        col("cos"))
  }

  /** IVF-PQ composition (FAISS-style IVFADC; Jégou, Douze & Schmid TPAMI
    * 33(1) 2011 §IV): the IVF coarse quantizer prunes CELLS, and PQ codes
    * over the per-cell RESIDUALS (x − centroid) compress what remains —
    * the form that actually runs at 10⁹ vectors: a probe touches
    * ≈ nprobe/nlist of the corpus, and what it touches is m bytes per
    * vector, not 4d.
    *
    * Scale shape: the coarse fit is one sampled k-means; residuals are a
    * broadcast-join map pass; the PQ fit reduces (sub, centroid)-keyed
    * partial sums (corpus never shuffled); candidate generation at query
    * time is an EQUI-JOIN on the cell id — at rest the codes relation
    * would be written partitioned by cell (like [[writeIvfIndex]]) so the
    * probed cells map to directories and partition pruning skips the rest.
    */
  final case class IvfPqModel(nlist: Int, centroids: Array[Array[Double]], pq: PqModel)

  /** Fit coarse + residual-PQ and encode the corpus. Returns the model
    * and the codes relation (vec_id, cell, codes) — m small ints per
    * vector, the 32×-compressed index.
    */
  def ivfPqFit(vectors: DataFrame, nlist: Int = 16, m: Int = 8,
      ksub: Int = 16, iters: Int = 5): (IvfPqModel, DataFrame) = {
    val spark = vectors.sparkSession
    val data = vectors.select(col("vec_id"), toUnitVec(col("embedding")).as("features"))
    val km = new KMeans().setK(nlist).setSeed(42).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(data)
    val centroids = km.clusterCenters.map(_.toArray)
    val centDf = spark.createDataFrame(
      centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq)
      .toDF("cell", "centroid")
    // residual = unit − centroid[cell]: a broadcast join + one zip_with —
    // checkpointed because the PQ fit (iterative) and the encode both
    // consume it.
    val residuals = km.transform(data)
      .select(col("vec_id"), col("cell"), vector_to_array(col("features")).as("unit"))
      .join(broadcast(centDf), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("unit"), col("centroid"), (x, y) => x - y).as("res"))
      .localCheckpoint()
    val pq = pqFit(residuals, "res", m, ksub, iters, normalize = false)
    val codes = pqEncode(residuals, "res", pq, normalize = false, keep = Seq("cell"))
    (IvfPqModel(nlist, centroids, pq), codes)
  }

  /** IVFADC search: route each probe to its nprobe nearest cells (by the
    * assignment metric, argmin ‖q − c‖²), build one m×ksub LUT per
    * (probe, cell) on the residual q − c, ADC-score ONLY the probed
    * cells' code rows via the cell equi-join, then exact-rerank the
    * shortlist on raw floats. Driver state: |probes|·nprobe·m·ksub
    * doubles — independent of corpus size.
    */
  def ivfPqTopK(probes: DataFrame, codes: DataFrame, vectors: DataFrame,
      model: IvfPqModel, k: Int, nprobe: Int = 4, shortlist: Int = 50): DataFrame = {
    val spark = probes.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val mm = model.pq
    val probeRows = probes.select(col("vec_id"),
      VectorOps.unitArr(col("embedding"))).collect().flatMap { r =>
      val id = r.getLong(0)
      val q = r.getSeq[Double](1).toArray
      val nearCells = model.centroids.zipWithIndex.map { case (c, i) =>
        var acc = 0.0; var j = 0
        while (j < q.length) { val t = q(j) - c(j); acc += t * t; j += 1 }
        (acc, i)
      }.sortBy(t => (t._1, t._2)).take(nprobe)
      nearCells.map { case (_, cell) =>
        val c = model.centroids(cell)
        val lut = Array.tabulate(mm.m, mm.ksub) { (s, cc) =>
          var acc = 0.0; var i = 0
          val cen = mm.codebooks(s)(cc)
          while (i < mm.dsub) {
            val t = (q(s * mm.dsub + i) - c(s * mm.dsub + i)) - cen(i)
            acc += t * t; i += 1
          }
          acc
        }
        Row(id, cell, lut.map(_.toSeq).toSeq)
      }
    }
    val lutDf = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*),
      StructType(Seq(StructField("p_id", LongType),
        StructField("cell", IntegerType),
        StructField("lut", ArrayType(ArrayType(DoubleType))))))
    val wAdc = Window.partitionBy(col("p_id")).orderBy(asc("adc"), asc("vec_id"))
    val short = codes.join(broadcast(lutDf), Seq("cell"))
      .filter(col("p_id") =!= col("vec_id"))
      .withColumn("adc", expr(
        "aggregate(zip_with(codes, lut, (c, l) -> element_at(l, c + 1)), 0D, (acc, x) -> acc + x)"))
      .withColumn("rnk", row_number().over(wAdc))
      .filter(col("rnk") <= shortlist)
      .select(col("p_id"), col("vec_id").as("n_id"))
    exactRerank(short, probes, vectors, k)
  }

  def sqTopK(probes: DataFrame, codesDf: DataFrame,
      mins: Array[Double], ranges: Array[Double], k: Int): DataFrame = {
    val p = probes.select(col("vec_id").as("p_id"),
      VectorOps.unitArr(col("embedding")).as("p_unit"))
    val c = codesDf.select(col("vec_id"),
      VectorOps.unitArr(sqDecodeCol(col("codes"), mins, ranges)).as("unit"))
    val w = Window.partitionBy(col("p_id")).orderBy(desc("cos"), asc("neighbor_id"))
    c.crossJoin(broadcast(p))
      .filter(col("p_id") =!= col("vec_id"))
      .withColumn("cos", call_function("graft_dot", col("p_unit"), col("unit")))
      .select(col("p_id"), col("vec_id").as("neighbor_id"), col("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
