package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-based clustering (SURVEY.md §2.13 build addendum; reference
  * checkout is empty, SURVEY.md §0.1 — the algorithm is published
  * grid-partitioned DBSCAN, Ester et al. KDD 1996 semantics with the
  * cell-join candidate generation of the MR-DBSCAN family).
  *
  * Complements [[Clustering]]'s centroid k-means: density clustering
  * finds arbitrary-shape clusters and labels sparse points as noise —
  * the outlier-aware grouping a curation pipeline wants for embedding
  * neighborhoods (project to 2-D with [[VectorOps.pca]], then cluster).
  *
  * Scale shape: points bin into eps-sized grid cells (map-side), so
  * every eps-neighbor of a point lies in its 3×3 cell block — candidate
  * pairs come from ONE equi-join on cell ids (each point replicated 9×),
  * never an all-pairs pass. Core status is a keyed count; cluster
  * formation runs the O(log n)-round star-contraction CC over core-core
  * edges ([[NearDup.connectedComponentsStars]] — the same engine the
  * dedup family uses); border points attach map-side to the minimum
  * neighboring core cluster. Deterministic throughout (min-rep ties).
  *
  * Dense-cell skew: a dense cell at 100 TB concentrates its pairs in one
  * join key. The `salt` parameter is the ENFORCED bound (the MaxBasket
  * discipline, applied to a join instead of a basket): the home-cell side
  * splits into `salt` hash groups and probes replicate across them, so
  * per-join-key build rows — and with them per-task pair work — shrink by
  * the salt factor while the pair set stays EXACTLY the same (every
  * (probe, point) pair meets exactly once, in the point's one salt
  * group). AQE's runtime skew split remains as the second layer; eps
  * sized so cells hold O(minPts·c) points bounds the quadratic term by
  * construction. DensitySpec manufactures the all-points-in-one-cell
  * case and asserts both the bound and exactness.
  */
object Density {

  /** DBSCAN over 2-D points (id, x, y). Returns (id, cluster, role):
    * cluster = min core id of the density-connected component, −1 for
    * noise; role ∈ core | border | noise. Border points with several
    * eps-reachable clusters take the minimum cluster id (deterministic
    * tie-break; classic DBSCAN leaves this order-dependent).
    */
  def dbscan2d(points: DataFrame, eps: Double, minPts: Int,
      salt: Int = 1): DataFrame = {
    require(eps > 0 && minPts >= 1, s"eps=$eps minPts=$minPts")
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val p = points
      .select(col("id").cast("long").as("id"),
        col("x").cast("double").as("x"), col("y").cast("double").as("y"))
      .withColumn("cx", floor(col("x") / eps))
      .withColumn("cy", floor(col("y") / eps))
      // salt group: splits a dense cell's build rows across `salt` join
      // keys — deterministic (murmur3 of the id), exactness-neutral
      .withColumn("sg", pmod(hash(col("id")), lit(salt)))
      .localCheckpoint() // referenced by the probe side, the join, and labeling
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)
    val probes = p.select(
        col("id").as("pid"), col("x").as("px"), col("y").as("py"),
        explode(offsets).as("o"),
        col("cx").as("hcx"), col("cy").as("hcy"))
      .select(col("pid"), col("px"), col("py"),
        (col("hcx") + col("o.dx")).as("cx"), (col("hcy") + col("o.dy")).as("cy"))
      // probes replicate across every salt group: each (probe, point)
      // pair still meets exactly once — in the point's one group
      .select(col("pid"), col("px"), col("py"), col("cx"), col("cy"),
        explode(sequence(lit(0), lit(salt - 1))).as("sg"))
    // each unordered eps-pair appears in BOTH directions (every point
    // probes the other's home cell), so per-point neighbor counts and
    // border attachment read directly off `pairs`
    val pairs = probes.join(p, Seq("cx", "cy", "sg"))
      .filter(col("pid") =!= col("id"))
      .filter(pow(col("px") - col("x"), 2) + pow(col("py") - col("y"), 2)
        <= eps * eps)
      .select(col("pid").as("a"), col("id").as("b"))
      .localCheckpoint()
    // DBSCAN counts the point itself toward minPts
    val core = pairs.groupBy(col("a")).agg(count(lit(1)).as("n"))
      .filter(col("n") + 1 >= minPts)
      .select(col("a").as("id"))
      .localCheckpoint()
    val coreEdges = pairs
      .join(core.withColumnRenamed("id", "a"), Seq("a"))
      .join(core.withColumnRenamed("id", "b"), Seq("b"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    // Adaptive CC (r13): driver union-find under the probe budget, the
    // O(log n) star contraction past it — identical labels either way.
    val labels = NearDup.connectedComponentsAdaptive(coreEdges)
    // isolated cores (no core neighbor) label themselves
    val coreClusters = core
      .join(labels.withColumnRenamed("member", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("rep"), col("id")).as("cluster"))
      .localCheckpoint()
    val borderClusters = pairs
      .join(coreClusters.withColumnRenamed("id", "b")
        .withColumnRenamed("cluster", "b_cluster"), Seq("b"))
      .join(core.withColumnRenamed("id", "a"), Seq("a"), "left_anti")
      .groupBy(col("a").as("id"))
      .agg(min(col("b_cluster")).as("cluster"))
    p.select(col("id"))
      .join(coreClusters.withColumnRenamed("cluster", "core_c"), Seq("id"), "left")
      .join(borderClusters.withColumnRenamed("cluster", "border_c"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("core_c"), col("border_c"), lit(-1L)).as("cluster"),
        when(col("core_c").isNotNull, "core")
          .when(col("border_c").isNotNull, "border")
          .otherwise("noise").as("role"))
  }

  /** Q117 — the full DBSCAN hash-gated cross-engine: cluster parts in
    * (size, price/5) feature space (eps 0.5, minPts 4). Every step is
    * exact arithmetic both engines share — squared-distance compares,
    * integer counts, min-id components — so an entire iterative
    * clustering algorithm hash-matches a recursive-CTE oracle.
    */
  def q117(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val c = graft.Catalog(spark, dir)
    dbscan2d(
      c.part.select(col("p_partkey").as("id"),
        col("p_size").cast("double").as("x"),
        (col("p_retailprice") / 5).as("y")),
      eps = 0.5, minPts = 4)
      .orderBy(asc_nulls_first("id"))
  }

  val q117Oracle: String =
    """WITH RECURSIVE pts AS (
      |  SELECT p_partkey AS id, CAST(p_size AS DOUBLE) AS x,
      |    p_retailprice / 5 AS y
      |  FROM part),
      |nb AS (
      |  SELECT p.id AS a, q.id AS b
      |  FROM pts p JOIN pts q ON p.id <> q.id
      |  WHERE (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y)
      |    <= 0.5 * 0.5),
      |core AS (SELECT a AS id FROM nb GROUP BY a HAVING COUNT(*) + 1 >= 4),
      |ce AS (
      |  SELECT a, b FROM nb
      |  WHERE a IN (SELECT id FROM core) AND b IN (SELECT id FROM core)),
      |reach(node, r) AS (
      |  SELECT id, id FROM core
      |  UNION
      |  SELECT ce.b, reach.r FROM reach JOIN ce ON ce.a = reach.node),
      |lab AS (SELECT node AS id, MIN(r) AS cluster FROM reach GROUP BY node),
      |border AS (
      |  SELECT nb.a AS id, MIN(lab.cluster) AS cluster
      |  FROM nb JOIN lab ON lab.id = nb.b
      |  WHERE nb.a NOT IN (SELECT id FROM core)
      |  GROUP BY nb.a)
      |SELECT p.id, COALESCE(l.cluster, bo.cluster, -1) AS cluster,
      |  CASE WHEN l.cluster IS NOT NULL THEN 'core'
      |       WHEN bo.cluster IS NOT NULL THEN 'border'
      |       ELSE 'noise' END AS role
      |FROM pts p
      |LEFT JOIN lab l ON l.id = p.id
      |LEFT JOIN border bo ON bo.id = p.id
      |ORDER BY p.id NULLS FIRST""".stripMargin

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "Q117" -> (q117 _))

  def oracles: Map[String, String] = Map(
    "Q117" -> q117Oracle)
}
