package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog

/** Graph analytics over relation-derived graphs (SURVEY.md §2.13 build
  * addendum; complements the connected-components family in
  * [[NearDup]]). Reference checkout is empty (SURVEY.md §0.1); the
  * algorithm is the published degree-oriented triangle enumeration
  * (Chiba–Nishizeki / Schank–Wagner "compact-forward": orient every edge
  * from the lower-(degree,id) endpoint to the higher, enumerate wedges at
  * the low node, close against the oriented edge set).
  *
  * Why orientation matters at 100 TB: the naive wedge join on an
  * UNordered edge list pays Σ deg(v)² — a single celebrity node with
  * degree 10⁷ yields 10¹⁴ wedges. Orienting by (degree, id) bounds every
  * out-degree by O(√m), so the wedge count is O(m^1.5) worst case and the
  * heavy hub contributes nothing: its edges all point INTO it. Both the
  * wedge build and the closing check are plain equi-joins — shuffle-keyed,
  * AQE-skew-splittable, no driver state.
  */
object Graphs {

  /** Distinct undirected edges (a < b) between parts co-occurring in the
    * same order. The self-join is keyed on l_orderkey (shuffle join; at
    * scale the per-order line count bounds the pair fanout, and a
    * pathological mega-order is exactly what AQE skew-split handles).
    */
  def coOrderEdges(lineitem: DataFrame): DataFrame = {
    val l1 = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("a"))
    val l2 = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("b"))
    l1.join(l2, Seq("ok"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** Triangles of an undirected (a<b) edge list, degree-oriented.
    * Returns one row per triangle corner: (node, x, y, z).
    *
    * Shape: per-node OUT-adjacency arrays (bounded ≤ O(√m) each by the
    * orientation), then one pass over the edges intersecting the two
    * endpoint lists — for oriented (u,v), every w ∈ adj(u) ∩ adj(v)
    * closes the triangle exactly once (u is the rank-lowest corner, and
    * only the (u,v) edge sees both out-edges). This replaces the wedge
    * self-join, whose O(Σ outdeg²) intermediate must cross a shuffle;
    * here the same work happens inside codegen'd array_intersect with
    * only the m edge rows shuffled (or none, when the adjacency relation
    * is small enough for AQE to broadcast — n·O(√m) entries).
    */
  def triangleCorners(edges: DataFrame): DataFrame = {
    // Total order (deg, id): ranks every node; out-degree under this
    // orientation is ≤ O(√m) regardless of raw degree skew.
    val deg = edges.select(col("a").as("v")).unionAll(edges.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), Seq("a"))
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), Seq("b"))
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val adj = oriented.groupBy(col("u")).agg(collect_list(col("v")).as("nbrs"))
    oriented
      .join(adj.select(col("u"), col("nbrs").as("u_nbrs")), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("v_nbrs")), Seq("v"))
      .select(col("u"), col("v"),
        explode(array_intersect(col("u_nbrs"), col("v_nbrs"))).as("w"))
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"),
        col("u"), col("v"), col("w"))
  }

  /** Q103 — top-20 parts by triangle participation in the co-order graph:
    * parts that form "bought-together" cliques. Output is total-ordered
    * (count desc, partkey asc) so LIMIT is deterministic.
    */
  def q103(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    triangleCorners(coOrderEdges(c.lineitem))
      .groupBy(col("node").as("p_partkey"))
      .agg(count(lit(1)).as("n_triangles"))
      .select(col("p_partkey"), col("n_triangles"))
      .orderBy(desc("n_triangles"), asc_nulls_first("p_partkey"))
      .limit(20)
  }

  val q103Oracle: String =
    """WITH e AS (
      |  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      |  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
      |  WHERE l1.l_partkey < l2.l_partkey),
      |t AS (
      |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM e e1
      |  JOIN e e2 ON e2.a = e1.b
      |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |corners AS (
      |  SELECT x AS node FROM t
      |  UNION ALL SELECT y FROM t
      |  UNION ALL SELECT z FROM t)
      |SELECT node AS p_partkey, COUNT(*) AS n_triangles
      |FROM corners
      |GROUP BY 1
      |ORDER BY n_triangles DESC, p_partkey
      |LIMIT 20""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q103" -> (q103 _))

  def oracles: Map[String, String] = Map(
    "Q103" -> q103Oracle)
}
