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
}
