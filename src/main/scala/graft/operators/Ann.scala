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
