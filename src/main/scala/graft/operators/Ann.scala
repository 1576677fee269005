package graft.operators

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
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
}
