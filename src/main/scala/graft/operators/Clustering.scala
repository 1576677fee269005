package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog
import graft.operators.VectorOps.{dot, l2}

/** Distributed k-means over an embedding column (SURVEY.md §2.13 build
  * addendum; the ML-analytics family the reference's BASELINE.json:5-6
  * "ML-lib / direct ML analytics" category declares — reference checkout is
  * empty, see SURVEY.md §0.1).
  *
  * Lloyd's algorithm, Spark-first:
  *  - Centroids are the SMALL side (k·d doubles) — broadcast every
  *    iteration; the corpus is scanned once per iteration and never
  *    shuffled for assignment.
  *  - Assignment = argmax cosine against the broadcast centroids, computed
  *    with the codegen'd `graft_dot` (no UDF, no posexplode of the corpus).
  *  - The update step shuffles only (cluster, dim) cells — k·d rows of
  *    partial sums with map-side combine, NOT the member vectors.
  *  - Per-iteration driver state is k·d doubles (the new centroids) —
  *    independent of corpus size; at 100 TB the same two jobs per
  *    iteration stand, with the broadcast a few MB for k≤4096, d≤1024.
  *
  * Q102 gates ONE deterministic Lloyd step (seed centroids = vec_id < k,
  * cosine assignment with ties to the lowest centroid id) so DuckDB can
  * mirror it exactly; Q120 gates the ITERATED form end-to-end (3 rounds,
  * final assignment hash-matched against a chained-CTE oracle), and
  * [[kmeans]] is additionally pinned against a local Lloyd reference in
  * AnalyticsOpsSpec.
  */
object Clustering {

  /** One Lloyd step: assign every vector to its argmax-cosine centroid,
    * then recompute centroids as elementwise member means.
    *
    * @param vectors (id, emb) rows; `centroids` (cid, cemb) must be small
    *                enough to broadcast (k rows).
    * @return (assignments df: id, cid, cos; newCentroids df: cid, pos, cen)
    */
  def lloydStep(vectors: DataFrame, centroids: DataFrame): (DataFrame, DataFrame) = {
    // Row-local argmax over the k centroid LITERALS (r14, guide §2.4
    // remove shuffles outright): the centroids are k·d doubles — the
    // bounded-collect class that already rode driver↔executor as a
    // broadcast — so collect them ONCE (norms computed in Spark with the
    // same l2 expression, so every cosine is bit-identical to the joined
    // form) and fold each vector over the k (cos, cid) candidates in
    // ascending cid order with a strict > replace. That is exactly
    // row_number over (cos DESC, cid ASC) = 1, without materializing the
    // n·k cross join or shuffling it through the window sort — the
    // assignment pass is now one row-local projection over the corpus.
    val cents = centroids
      .select(col("cid"), col("cemb").cast("array<double>").as("ce"),
        l2(col("cemb")).as("cnrm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)
    require(cents.nonEmpty, "lloydStep requires a non-empty centroid relation")
    val candidates = array(cents.map { case (cid, ce, cnrm) =>
      struct(
        (dot(col("emb"), array(ce.map(lit): _*)) / (col("nrm") * lit(cnrm)))
          .as("cos"),
        lit(cid).as("cid"))
    }: _*)
    val best = aggregate(
      slice(candidates, lit(2), lit(math.max(0, cents.length - 1))),
      element_at(candidates, 1),
      (acc, x) => when(x.getField("cos") > acc.getField("cos"), x).otherwise(acc))
    val assigned = vectors
      .select(col("id"), col("emb"), l2(col("emb")).as("nrm"))
      .withColumn("best", best)
      .select(col("id"), col("best.cid").as("cid"), col("best.cos").as("cos"),
        col("emb"))
    // Update: explode members to (cid, pos) cells — the shuffle carries
    // k·d aggregation cells (map-side combined), not vectors.
    val newCentroids = assigned
      .select(col("cid"), posexplode(col("emb")).as(Seq("pos", "val")))
      .groupBy(col("cid"), col("pos"))
      .agg(avg(col("val").cast("double")).as("cen"))
    (assigned.drop("emb"), newCentroids)
  }

  /** Iterated Lloyd: `iters` steps from the deterministic seed (lowest k
    * ids). Centroid arrays round-trip driver↔executors as broadcasts of
    * k·d doubles; members never leave their partitions. Returns
    * (centroids as cid→array, final assignments).
    */
  def kmeans(vectors: DataFrame, k: Int, iters: Int): (Map[Long, Array[Double]], DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = vectors.sparkSession
    // Fail loudly up front (same discipline as the Tucker empty-tensor
    // guard): an empty relation would surface as an opaque head-of-empty
    // deep in the loop, and a zero-norm embedding makes cosine NaN — which
    // sorts FIRST under desc(cos) and would silently claim the vector.
    val audit = vectors.agg(
      count(lit(1)).as("n"),
      sum(when(col("emb").isNull || l2(col("emb")) === 0, 1L).otherwise(0L)).as("bad"))
      .head()
    require(audit.getLong(0) > 0, "kmeans requires a non-empty vectors relation")
    require(audit.getLong(1) == 0,
      s"kmeans: ${audit.getLong(1)} null or zero-norm embeddings — cosine is " +
        "undefined for them; filter or re-embed before clustering")
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cid",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cemb",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))))
    val idOrd = vectors.select(col("id")).orderBy(col("id")).limit(k)
    var cents = vectors.join(idOrd, Seq("id"))
      .select(col("id").as("cid"), col("emb").cast("array<double>").as("cemb"))
    var assigned: DataFrame = null
    var i = 0
    while (i < iters) {
      // Materialize the (small) new centroids as a LOCAL relation, then
      // re-broadcast — the classic synchronous Lloyd loop; k·d doubles per
      // iteration on the driver, and no 1-partition mini-job (the local
      // rows feed lloydStep's broadcast directly).
      val (a, nc) = lloydStep(vectors, cents)
      assigned = a
      val rows = nc.groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cen")))).as("cells"))
        .select(col("cid"), transform(col("cells"), _.getField("cen")).as("cemb"))
        .collect()
      cents = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), centSchema)
      i += 1
    }
    val model = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    (model, assigned)
  }

  /** Q102 — one deterministic k-means (Lloyd) step on the embeddings
    * table: seeds = vec_id < 8, cosine assignment, per-cluster member
    * count, mean member-to-seed cosine, and the L2 norm of the recomputed
    * centroid.
    */
  def q102(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val vecs = c.embeddings.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val seeds = vecs.filter(col("id") < 8)
      .select(col("id").as("cid"), col("emb").as("cemb"))
    val (assigned, newCents) = lloydStep(vecs, seeds)
    val stats = assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"), round(avg(col("cos")), 4).as("avg_cos"))
    val norms = newCents.groupBy(col("cid"))
      .agg(round(sqrt(sum(col("cen") * col("cen"))), 4).as("centroid_norm"))
    // both sides are k rows — broadcast is correct at any corpus size
    stats.join(broadcast(norms), Seq("cid"))
      .orderBy(asc_nulls_first("cid"))
  }

  /** Q120 — the WHOLE iterated algorithm, model-pinned end-to-end (the
    * Q117-DBSCAN pattern applied to the centroid family): 3 synchronous
    * Lloyd iterations from the deterministic lowest-8-ids seed, final
    * per-vector assignment hash-matched against a chained-CTE oracle that
    * replays the identical 3 rounds. The output is pure integers
    * (vec_id, cluster_id), so the hash pins the ASSIGNMENT decisions of
    * every iteration, not a rounded summary.
    */
  def q120(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val vecs = c.embeddings.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val (_, assigned) = kmeans(vecs, k = 8, iters = 3)
    assigned.select(col("id"), col("cid")).orderBy(asc("id"))
  }

  /** Three unrolled Lloyd rounds: seeds → a1 → c2 → a2 → c3 → a3. Mirrors
    * [[kmeans]] exactly (argmax cosine, ties to the lowest cid, member
    * means per dimension); everything computed in DOUBLE like the engine.
    */
  val q120Oracle: String =
    """WITH flat AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
      |    CAST(UNNEST(embedding) AS DOUBLE) AS val
      |  FROM embeddings),
      |vnorm AS (SELECT vec_id, SQRT(SUM(val * val)) AS nrm FROM flat GROUP BY 1),
      |seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8),
      |c1 AS (
      |  SELECT f.vec_id AS cid, f.pos, f.val AS cen
      |  FROM flat f JOIN seeds s ON s.vec_id = f.vec_id),
      |n1 AS (SELECT cid, SQRT(SUM(cen * cen)) AS cnrm FROM c1 GROUP BY 1),
      |d1 AS (
      |  SELECT f.vec_id AS id, c.cid, SUM(f.val * c.cen) AS dot
      |  FROM flat f JOIN c1 c ON c.pos = f.pos GROUP BY 1, 2),
      |a1 AS (
      |  SELECT id, cid FROM (
      |    SELECT d.id, d.cid, ROW_NUMBER() OVER (PARTITION BY d.id
      |      ORDER BY d.dot / (v.nrm * n.cnrm) DESC, d.cid) AS rnk
      |    FROM d1 d JOIN vnorm v ON v.vec_id = d.id JOIN n1 n ON n.cid = d.cid)
      |  WHERE rnk = 1),
      |c2 AS (
      |  SELECT a.cid, f.pos, AVG(f.val) AS cen
      |  FROM a1 a JOIN flat f ON f.vec_id = a.id GROUP BY 1, 2),
      |n2 AS (SELECT cid, SQRT(SUM(cen * cen)) AS cnrm FROM c2 GROUP BY 1),
      |d2 AS (
      |  SELECT f.vec_id AS id, c.cid, SUM(f.val * c.cen) AS dot
      |  FROM flat f JOIN c2 c ON c.pos = f.pos GROUP BY 1, 2),
      |a2 AS (
      |  SELECT id, cid FROM (
      |    SELECT d.id, d.cid, ROW_NUMBER() OVER (PARTITION BY d.id
      |      ORDER BY d.dot / (v.nrm * n.cnrm) DESC, d.cid) AS rnk
      |    FROM d2 d JOIN vnorm v ON v.vec_id = d.id JOIN n2 n ON n.cid = d.cid)
      |  WHERE rnk = 1),
      |c3 AS (
      |  SELECT a.cid, f.pos, AVG(f.val) AS cen
      |  FROM a2 a JOIN flat f ON f.vec_id = a.id GROUP BY 1, 2),
      |n3 AS (SELECT cid, SQRT(SUM(cen * cen)) AS cnrm FROM c3 GROUP BY 1),
      |d3 AS (
      |  SELECT f.vec_id AS id, c.cid, SUM(f.val * c.cen) AS dot
      |  FROM flat f JOIN c3 c ON c.pos = f.pos GROUP BY 1, 2),
      |a3 AS (
      |  SELECT id, cid FROM (
      |    SELECT d.id, d.cid, ROW_NUMBER() OVER (PARTITION BY d.id
      |      ORDER BY d.dot / (v.nrm * n.cnrm) DESC, d.cid) AS rnk
      |    FROM d3 d JOIN vnorm v ON v.vec_id = d.id JOIN n3 n ON n.cid = d.cid)
      |  WHERE rnk = 1)
      |SELECT id, cid FROM a3 ORDER BY id""".stripMargin

  val q102Oracle: String =
    """WITH norms AS (
      |  SELECT vec_id, SQRT(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |flat AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
      |    UNNEST(embedding) AS val
      |  FROM embeddings),
      |dots AS (
      |  SELECT v.vec_id AS id, s.vec_id AS cid,
      |    SUM(CAST(v.val AS DOUBLE) * CAST(s.val AS DOUBLE)) AS dot
      |  FROM flat v JOIN flat s ON v.pos = s.pos
      |  WHERE s.vec_id < 8
      |  GROUP BY 1, 2),
      |cosv AS (
      |  SELECT id, cid, dot / (nv.nrm * nc.nrm) AS cos
      |  FROM dots
      |  JOIN norms nv ON nv.vec_id = id
      |  JOIN norms nc ON nc.vec_id = cid),
      |best AS (
      |  SELECT id, cid, cos FROM (
      |    SELECT id, cid, cos,
      |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY cos DESC, cid) AS rnk
      |    FROM cosv) WHERE rnk = 1),
      |newc AS (
      |  SELECT b.cid, f.pos, AVG(CAST(f.val AS DOUBLE)) AS cen
      |  FROM best b JOIN flat f ON f.vec_id = b.id
      |  GROUP BY 1, 2),
      |cnorm AS (SELECT cid, SQRT(SUM(cen * cen)) AS centroid_norm FROM newc GROUP BY 1),
      |stats AS (
      |  SELECT cid, COUNT(*) AS n_members, AVG(cos) AS avg_cos
      |  FROM best GROUP BY 1)
      |SELECT s.cid AS cid, s.n_members, ROUND(s.avg_cos, 4) AS avg_cos,
      |  ROUND(c.centroid_norm, 4) AS centroid_norm
      |FROM stats s JOIN cnorm c ON c.cid = s.cid
      |ORDER BY s.cid NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q102" -> (q102 _),
    "Q120" -> (q120 _))

  def oracles: Map[String, String] = Map(
    "Q102" -> q102Oracle,
    "Q120" -> q120Oracle)
}
