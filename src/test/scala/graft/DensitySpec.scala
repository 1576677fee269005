package graft

import org.apache.spark.sql.functions._
import graft.operators.{Density, VectorOps}

/** Grid DBSCAN pinned against a local reference implementation with the
  * same deterministic conventions (cluster id = min core id, border →
  * min neighboring cluster), plus a PCA-composition smoke run.
  */
class DensitySpec extends SparkSpec {

  test("grid DBSCAN matches a local reference on seeded blobs + noise") {
    val rnd = new scala.util.Random(5)
    val blobs = Seq((0.0, 0.0), (10.0, 0.0), (5.0, 8.0))
    val pts: Seq[(Long, Double, Double)] =
      blobs.zipWithIndex.flatMap { case ((bx, by), bi) =>
        (0 until 60).map { i =>
          (bi * 1000L + i, bx + rnd.nextGaussian() * 0.5, by + rnd.nextGaussian() * 0.5)
        }
      } ++ (0 until 20).map(i =>
        (9000L + i, -5 + rnd.nextDouble() * 20, -5 + rnd.nextDouble() * 20))
    val eps = 1.2; val minPts = 4

    val got = Density.dbscan2d(
        spark.createDataFrame(pts).toDF("id", "x", "y").repartition(5),
        eps, minPts)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

    // local reference with identical conventions
    val byId = pts.map(p => p._1 -> p).toMap
    def neighbors(p: (Long, Double, Double)): Seq[Long] =
      pts.filter(q => q._1 != p._1 &&
        math.pow(q._2 - p._2, 2) + math.pow(q._3 - p._3, 2) <= eps * eps).map(_._1)
    val nbrs = pts.map(p => p._1 -> neighbors(p)).toMap
    val cores = pts.map(_._1).filter(id => nbrs(id).size + 1 >= minPts).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(cores.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (c <- cores; n <- nbrs(c) if cores(n)) {
      val (ra, rb) = (find(c), find(n))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clusterOf = cores.map(c => c -> find(c)).toMap
    val ref = pts.map(_._1).map { id =>
      if (cores(id)) id -> (clusterOf(id), "core")
      else {
        val coreNbrs = nbrs(id).filter(cores)
        if (coreNbrs.nonEmpty) id -> (coreNbrs.map(clusterOf).min, "border")
        else id -> (-1L, "noise")
      }
    }.toMap

    assert(got.keySet == ref.keySet)
    // roles must agree everywhere
    assert(got.forall { case (id, (_, role)) => role == ref(id)._2 },
      got.filter { case (id, (_, role)) => role != ref(id)._2 }.take(5).toString)
    // min-based union-find reps match the star-CC min reps exactly
    assert(got == ref, got.toSeq.diff(ref.toSeq).take(5).toString)
    // sanity: the three blobs survive as three clusters with noise present
    val clusters = got.values.collect { case (c, r) if r != "noise" => c }.toSet
    assert(clusters.size == 3, clusters.toString)
    assert(got.values.exists(_._2 == "noise"))
  }

  test("adversarial dense cell: salted join bounds per-key build rows and stays exact") {
    // The case the scaladoc warns about: EVERY point lands in one
    // eps-cell, so the cell join concentrates all n build rows on a
    // single key (n² pair work in one task without mitigation).
    val n = 600
    val pts = (0 until n).map { i =>
      (i.toLong, 0.05 + (i % 25) * 0.015, 0.05 + (i / 25) * 0.015)
    }
    val df = spark.createDataFrame(pts).toDF("id", "x", "y").repartition(4)
    val eps = 0.5; val minPts = 4; val salt = 8

    // exactness: the salted run is row-identical to the unsalted one
    val base = Density.dbscan2d(df, eps, minPts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Density.dbscan2d(df, eps, minPts, salt = salt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == base, "salting changed the clustering")

    // the bound: per-(cell, salt-group) build rows shrink from n to
    // ~n/salt — the per-task pair work a dense cell can concentrate is
    // bounded by (max group)·(probe rows), not n²
    val groups = df
      .select(col("id"), floor(col("x") / eps).as("cx"), floor(col("y") / eps).as("cy"))
      .withColumn("sg", pmod(hash(col("id")), lit(salt)))
      .groupBy(col("cx"), col("cy"), col("sg")).count()
      .collect().map(_.getLong(3))
    assert(groups.length == salt, s"expected $salt salt groups, got ${groups.length}")
    assert(groups.max <= 2L * n / salt,
      s"salt groups unbalanced: max ${groups.max} vs n/salt ${n / salt}")

    // and the dense cell really is dense: one cluster, all cores
    assert(base.size == n)
    assert(base.forall(_._3 == "core"))
    assert(base.map(_._2).size == 1, s"expected one cluster, got ${base.map(_._2)}")
  }

  test("composes with PCA: density clusters over projected embeddings run end-to-end") {
    val c = Catalog(spark, sf("sf0.01"))
    val (_, _, projected) = VectorOps.pca(c.embeddings, "embedding", 2)
    val res = Density.dbscan2d(
        projected.select(col("vec_id").as("id"),
          col("pc_0").as("x"), col("pc_1").as("y")),
        eps = 0.5, minPts = 4)
      .groupBy(col("role")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res.values.sum == 500, res.toString)
  }
}
