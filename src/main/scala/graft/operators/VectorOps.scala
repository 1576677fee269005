package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Catalog

/** Vector / similarity-search operators over the embeddings table
  * (SURVEY.md §2.9): brute-force cosine top-k and per-label centroids.
  *
  * Scale notes: Q38 broadcasts the (small) probe set against the full
  * vector table — the big side is scanned once, never shuffled; cosine is a
  * single codegen'd higher-order-function fold per row (no posexplode
  * shuffle). Top-k per probe is a window over probe_id — the shuffle is
  * keyed on probe, whose cardinality bounds the state. The ANN scale path
  * (BucketedRandomProjectionLSH) lives in graft.operators.Ann and is
  * recall-checked against this exact form. Q39's centroid is a
  * posexplode→(label,pos) aggregate: 64·|labels| cells, map-side combined.
  */
object VectorOps {

  /** Σ xᵢ·yᵢ over two float arrays, double accumulation in array order —
    * the declared deterministic dot product, compiled by the native
    * codegen'd expression graft.plans.DotProduct (registered as
    * `graft_dot` by Catalog / GraftExtensions). Numerically identical to
    * the higher-order-function fold [[dotHof]], minus its per-row
    * zipped-array allocation.
    */
  def dot(x: Column, y: Column): Column = call_function("graft_dot", x, y)

  /** Pure-builtin fold form of the same dot product (kept as the
    * plan-B path and for equivalence testing against the native
    * expression).
    */
  def dotHof(x: Column, y: Column): Column =
    aggregate(
      zip_with(x, y, (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm with the same fold discipline. */
  def l2(x: Column): Column = sqrt(dot(x, x))

  /** Unit-normalized double-array view of a float/double array column.
    * The norm is evaluated ONCE per row (array_repeat materializes it,
    * zip_with divides) — embedding l2(x) inside a transform lambda would
    * re-run the full-array fold per ELEMENT, O(d²) per row.
    */
  def unitArr(x: Column): Column =
    zip_with(x, array_repeat(l2(x), size(x)),
      (v, n) => v.cast("double") / n)

  /** Brute-force cosine top-k of `probes` against `vectors` (API form). */
  def cosineTopK(probes: DataFrame, vectors: DataFrame, k: Int): DataFrame = {
    val p = probes.select(
      col("vec_id").as("p_id"), col("embedding").as("p_emb"),
      l2(col("embedding")).as("p_norm"))
    val v = vectors.select(
      col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      l2(col("embedding")).as("n_norm"))
    val w = Window.partitionBy(col("p_id"))
      .orderBy(desc("cos"), asc("n_id"))
    v.join(broadcast(p), col("p_id") =!= col("n_id"))
      .withColumn("cos", dot(col("p_emb"), col("n_emb")) / (col("p_norm") * col("n_norm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Q38 — cosine top-5 neighbors for each probe vec_id < 10. */
  def q38(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val e = c.embeddings
    cosineTopK(e.filter(col("vec_id") < 10), e, 5)
      .select(
        col("p_id").as("vec_id"), col("rnk"),
        col("n_id").as("neighbor_id"), round(col("cos"), 4).as("cos"))
      .orderBy(asc_nulls_first("vec_id"), asc_nulls_first("rnk"))
  }

  val q38Oracle: String =
    """WITH norms AS (
      |  SELECT vec_id, SQRT(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |flat AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
      |    UNNEST(embedding) AS val
      |  FROM embeddings),
      |dots AS (
      |  SELECT p.vec_id AS p_id, q.vec_id AS n_id,
      |    SUM(CAST(p.val AS DOUBLE) * CAST(q.val AS DOUBLE)) AS dot
      |  FROM flat p JOIN flat q ON p.pos = q.pos
      |  WHERE p.vec_id < 10 AND p.vec_id <> q.vec_id
      |  GROUP BY 1, 2),
      |cosv AS (
      |  SELECT p_id, n_id, dot / (np.nrm * nq.nrm) AS cos
      |  FROM dots
      |  JOIN norms np ON np.vec_id = p_id
      |  JOIN norms nq ON nq.vec_id = n_id),
      |ranked AS (
      |  SELECT p_id AS vec_id, n_id AS neighbor_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY cos DESC, n_id) AS rnk
      |  FROM cosv)
      |SELECT vec_id, rnk, neighbor_id, ROUND(cos, 4) AS cos
      |FROM ranked WHERE rnk <= 5
      |ORDER BY vec_id NULLS FIRST, rnk NULLS FIRST""".stripMargin

  /** Q39 — per-label centroids + mean member distance to own centroid. */
  def q39(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val flat = c.embeddings
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), col("vec_id"), col("pos"), col("v").cast("double").as("val"))
    val cent = flat.groupBy(col("label"), col("pos")).agg(avg(col("val")).as("cen"))
    flat.join(cent, Seq("label", "pos"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum(pow(col("val") - col("cen"), 2)).as("ss"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), round(avg(sqrt(col("ss"))), 4).as("avg_dist"))
      .orderBy(asc_nulls_first("label"))
  }

  val q39Oracle: String =
    """WITH flat AS (
      |  SELECT label, vec_id, pos, CAST(val AS DOUBLE) AS val FROM (
      |    SELECT label, vec_id, generate_subscripts(embedding, 1) AS pos,
      |      UNNEST(embedding) AS val
      |    FROM embeddings)),
      |cent AS (SELECT label, pos, AVG(val) AS cen FROM flat GROUP BY 1, 2),
      |ss AS (
      |  SELECT f.label, f.vec_id, SUM(POWER(f.val - c.cen, 2)) AS ss
      |  FROM flat f JOIN cent c ON f.label = c.label AND f.pos = c.pos
      |  GROUP BY 1, 2)
      |SELECT label, COUNT(*) AS n_vecs, ROUND(AVG(SQRT(ss)), 4) AS avg_dist
      |FROM ss
      |GROUP BY label
      |ORDER BY label NULLS FIRST""".stripMargin

  /** Q50 — embedding-cosine near-duplicate pairs: all (lo,hi) pairs within
    * a probe set whose cosine ≥ 0.4 (the corpus' pairwise max is ~0.51, so
    * the threshold bites). The all-pairs form is the exact verifier; the
    * scale path buckets candidates with random-projection LSH
    * (graft.operators.Ann) before this verification.
    */
  def q50(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val vecs = c.embeddings.filter(col("vec_id") < 500)
      .select(col("vec_id"), col("embedding"), l2(col("embedding")).as("nrm"))
    val v1 = vecs.select(col("vec_id").as("d1"), col("embedding").as("e1"), col("nrm").as("n1"))
    val v2 = vecs.select(col("vec_id").as("d2"), col("embedding").as("e2"), col("nrm").as("n2"))
    v1.join(broadcast(v2), col("d1") < col("d2"))
      .withColumn("cos", dot(col("e1"), col("e2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= 0.4)
      .select(col("d1").as("vec_lo"), col("d2").as("vec_hi"), round(col("cos"), 4).as("cos"))
      .orderBy(asc_nulls_first("vec_lo"), asc_nulls_first("vec_hi"))
  }

  val q50Oracle: String =
    """WITH v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500),
      |norms AS (
      |  SELECT vec_id, SQRT(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM v),
      |flat AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
      |    UNNEST(embedding) AS val
      |  FROM v),
      |dots AS (
      |  SELECT p.vec_id AS d1, q.vec_id AS d2,
      |    SUM(CAST(p.val AS DOUBLE) * CAST(q.val AS DOUBLE)) AS dot
      |  FROM flat p JOIN flat q ON p.pos = q.pos AND p.vec_id < q.vec_id
      |  GROUP BY 1, 2),
      |cosv AS (
      |  SELECT d1, d2, dot / (n1.nrm * n2.nrm) AS cos
      |  FROM dots
      |  JOIN norms n1 ON n1.vec_id = d1
      |  JOIN norms n2 ON n2.vec_id = d2)
      |SELECT d1 AS vec_lo, d2 AS vec_hi, ROUND(cos, 4) AS cos
      |FROM cosv WHERE cos >= 0.4
      |ORDER BY vec_lo NULLS FIRST, vec_hi NULLS FIRST""".stripMargin

  /** Distributed PCA of an embedding column, Gram-matrix form — the
    * exact "tall-skinny" path (n rows ≫ d dims, d driver-manageable):
    *
    *  1. ONE treeAggregate pass accumulates the d-vector sum and the d×d
    *     second-moment matrix per partition (primitive arrays, upper
    *     triangle mirrored at the end) — the data is never centered or
    *     copied, and nothing larger than d² crosses the wire.
    *  2. The d×d covariance eigendecomposes on the driver (breeze
    *     eigSym — d=64 here; the method is exact for any n).
    *  3. Projections ride the codegen'd graft_dot against the component
    *     vectors embedded as array literals — no UDF, no shuffle.
    *
    * Returns (components row-major k×d, eigenvalues desc, projected df
    * with pc_0..pc_{k-1} appended). Property-checked in VectorSpec:
    * components orthonormal, per-component projected variance equals the
    * eigenvalue, and the spectrum matches a local breeze reference.
    */
  def pca(df: DataFrame, embCol: String, k: Int): (Array[Array[Double]], Array[Double], DataFrame) = {
    import breeze.linalg.{eigSym, DenseMatrix => BDM}
    val d = df.select(size(col(embCol))).first().getInt(0)
    val (n, sums, moments) = df.select(col(embCol)).rdd
      .map(_.getSeq[Float](0))
      .treeAggregate((0L, new Array[Double](d), new Array[Double](d * d)))(
        seqOp = { case ((cnt, s, m), v) =>
          var i = 0
          while (i < d) {
            val vi = v(i).toDouble
            s(i) += vi
            var j = i
            while (j < d) { m(i * d + j) += vi * v(j).toDouble; j += 1 }
            i += 1
          }
          (cnt + 1, s, m)
        },
        combOp = { case ((c1, s1, m1), (c2, s2, m2)) =>
          var i = 0
          while (i < d) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < d * d) { m1(i) += m2(i); i += 1 }
          (c1 + c2, s1, m1)
        })
    val cov = BDM.zeros[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = moments(i * d + j) / n - (sums(i) / n) * (sums(j) / n)
        cov(i, j) = c; cov(j, i) = c
        j += 1
      }
      i += 1
    }
    val es = eigSym(cov) // ascending eigenvalues
    val order = (0 until d).sortBy(p => -es.eigenvalues(p)).take(k)
    val components = order.map(p => Array.tabulate(d)(r => es.eigenvectors(r, p))).toArray
    val eigvals = order.map(es.eigenvalues(_)).toArray
    val projected = components.zipWithIndex.foldLeft(df) { case (acc, (comp, ci)) =>
      acc.withColumn(s"pc_$ci",
        dot(col(embCol), array(comp.map(lit(_)).toIndexedSeq: _*)))
    }
    (components, eigvals, projected)
  }

  /** Q171 — per-label embedding cluster geometry: centroid norm and mean
    * within-cluster dispersion, via the variance decomposition
    * avg‖x−c‖² = avg‖x‖² − ‖c‖². For the unit-normalized corpus,
    * centroid norm IS intra-label cohesion (1 = all vectors identical,
    * → 0 = label carries no direction) — the health check before cosine
    * ANN (Q38/Q50) or per-label centroid routing (Q39/IVF) is trusted.
    *
    * Determinism: per-vector ‖x‖² is a row-local codegen'd fold in fixed
    * element order; per-dimension means are double sums of exact
    * float32→double values whose cross-engine accumulation-order error
    * (~1e-12 relative) sits far inside the 1e-4 rounding grid (Q137
    * precedent). Scale notes: one explode to (label, dim) cells —
    * labels×dims bounded — plus one row-local map; no vector ever
    * crosses the network whole.
    */
  def q171(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val coords = c.embeddings
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("d", "xf")))
      .select(col("label"), col("vec_id"), col("d"),
        col("xf").cast("double").as("x"))
    val dimmean = coords.groupBy(col("label"), col("d"))
      .agg((sum(col("x")) / count(lit(1))).as("mu"))
    val cent = dimmean.groupBy(col("label"))
      .agg(sqrt(sum(col("mu") * col("mu"))).as("cn"))
    val sq = c.embeddings.select(col("label"),
      expr("aggregate(embedding, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))")
        .as("s"))
    val avgsq = sq.groupBy(col("label"))
      .agg((sum(col("s")) / count(lit(1))).as("asq"),
        count(lit(1)).as("n_vecs"))
    avgsq.join(cent, Seq("label"))
      .select(col("label"), col("n_vecs"),
        round(col("cn"), 4).as("centroid_norm"),
        round(col("asq") - col("cn") * col("cn"), 4).as("dispersion"))
      .orderBy(asc_nulls_first("label"))
  }

  val q171Oracle: String =
    """WITH coords AS (
      |  SELECT label, vec_id, CAST(x AS DOUBLE) AS x
      |  FROM (SELECT label, vec_id, UNNEST(embedding) AS x,
      |          generate_subscripts(embedding, 1) AS d
      |        FROM embeddings)),
      |dimmean AS (
      |  SELECT label, d, SUM(x) / COUNT(*) AS mu
      |  FROM (SELECT label, vec_id, CAST(x AS DOUBLE) AS x, d
      |        FROM (SELECT label, vec_id, UNNEST(embedding) AS x,
      |                generate_subscripts(embedding, 1) AS d
      |              FROM embeddings))
      |  GROUP BY 1, 2),
      |cent AS (
      |  SELECT label, SQRT(SUM(mu * mu)) AS cn FROM dimmean GROUP BY 1),
      |sq AS (
      |  SELECT label, vec_id,
      |    list_aggregate(list_transform(embedding,
      |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum') AS s
      |  FROM embeddings),
      |avgsq AS (
      |  SELECT label, SUM(s) / COUNT(*) AS asq,
      |    CAST(COUNT(*) AS BIGINT) AS n_vecs
      |  FROM sq GROUP BY 1)
      |SELECT a.label, a.n_vecs,
      |  ROUND(c.cn, 4) AS centroid_norm,
      |  ROUND(a.asq - c.cn * c.cn, 4) AS dispersion
      |FROM avgsq a JOIN cent c ON c.label = a.label
      |ORDER BY a.label NULLS FIRST""".stripMargin

  /** Q173 — leave-one-out 1-NN label accuracy for the probe set
    * (vec_id < 100): each probe's nearest other vector by dot product
    * (unit corpus → cosine), scored against its own label — the
    * standard intrinsic embedding-quality eval (does the space cluster
    * by label?) that Q171's geometry summarizes and this gate tests
    * behaviorally. The ranking key is the dot ROUNDED to 6 (then
    * candidate id): both engines fold the product in identical element
    * order, and the rounding grid absorbs any sub-ULP accumulation
    * difference so the argmax can never flip on noise.
    *
    * Scale notes: probe×corpus is a bounded-probe linear scan (the
    * Q38 brute-force shape); at corpus×corpus scale the same question
    * routes through the IVF/PQ ANN capabilities instead. The per-pair
    * fold is codegen'd zip_with/aggregate; top-1 is a per-probe
    * window over the probe-keyed relation.
    */
  def q173(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val probe = c.embeddings.filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding").as("pe"),
        col("label").as("true_label"))
    val cand = c.embeddings
      .select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
        col("label").as("cand_label"))
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("rdot"), asc("cand_id"))
    probe.join(cand, col("cand_id") =!= col("vec_id"))
      .withColumn("rdot", round(expr(
        """aggregate(zip_with(pe, ce,
          |  (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),
          |  0D, (acc, x) -> acc + x)""".stripMargin), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("true_label").as("label"))
      .agg(count(lit(1)).as("n_probe"),
        sum(when(col("cand_label") === col("true_label"), 1L).otherwise(0L))
          .as("n_correct"),
        round(sum(when(col("cand_label") === col("true_label"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)), 4).as("accuracy"))
      .orderBy(asc_nulls_first("label"))
  }

  val q173Oracle: String =
    """WITH probe AS (
      |  SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 100),
      |scored AS (
      |  SELECT p.vec_id, p.label AS true_label, c.label AS cand_label,
      |    c.vec_id AS cand_id,
      |    ROUND(list_aggregate(list_transform(range(len(p.embedding)),
      |      i -> CAST(p.embedding[i+1] AS DOUBLE)
      |         * CAST(c.embedding[i+1] AS DOUBLE)), 'sum'), 6) AS rdot
      |  FROM probe p JOIN embeddings c ON c.vec_id <> p.vec_id),
      |best AS (
      |  SELECT vec_id, true_label, cand_label FROM (
      |    SELECT vec_id, true_label, cand_label,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id
      |        ORDER BY rdot DESC, cand_id) AS rn
      |    FROM scored) WHERE rn = 1)
      |SELECT true_label AS label,
      |  CAST(COUNT(*) AS BIGINT) AS n_probe,
      |  CAST(SUM(CASE WHEN cand_label = true_label THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_correct,
      |  ROUND(CAST(SUM(CASE WHEN cand_label = true_label THEN 1 ELSE 0 END)
      |    AS DOUBLE) / COUNT(*), 4) AS accuracy
      |FROM best GROUP BY 1 ORDER BY label NULLS FIRST""".stripMargin

  /** Q185 — simplified (centroid) silhouette per label: for each vector,
    * a = Euclidean distance to its OWN label centroid, b = distance to
    * the NEAREST other centroid, s = (b−a)/max(a,b); per-label means of
    * a, b, s. The standard clustering-quality score (Rousseeuw 1987) in
    * its centroid form (Hruschka et al.) — O(n·k) instead of O(n²), the
    * only form that exists at corpus scale. Q171 gives per-cluster
    * geometry in isolation; this scores SEPARATION between clusters,
    * the number that says whether label-routed processing will work.
    *
    * Exactness: per-pair squared distance is a fixed-order fold
    * (zip_with/aggregate vs list_zip/list_aggregate — both sequential
    * over the same element order), ROUNDED to 6 before the min so the
    * nearest-other choice sits on a shared grid (Q173's rounded-argmax
    * discipline); centroid means carry ~1e-15 engine noise absorbed by
    * that rounding except on measure-zero boundaries. All downstream
    * arithmetic (sqrt, s, means) is identical textual IEEE, final
    * round(4).
    *
    * Scale notes: centroids are a (labels × dims)-bounded relation
    * broadcast to a labels-wide cross join — n·k rows, map-side folds,
    * never vector×vector. The same shape serves IVF cell audits.
    */
  /** Per-label centroid relation (clabel, cvec) — the shared base of the
    * Q185 silhouette and Q262 Davies–Bouldin internal indices. */
  private def labelCentroids(c: Catalog): DataFrame = {
    val dimmean = c.embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "xf")))
      .groupBy(col("label"), col("d"))
      .agg((sum(col("xf").cast("double")) / count(lit(1))).as("mu"))
    dimmean.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("mu")))),
        x => x.getField("mu")).as("cvec"))
      .withColumnRenamed("label", "clabel")
  }

  def q185(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val cents = labelCentroids(c)
    // bounded-side cross join: |labels| centroid rows, broadcast
    val dists = c.embeddings.crossJoin(broadcast(cents))
      .withColumn("dsq", round(expr(
        """aggregate(zip_with(embedding, cvec,
          |  (x, m) -> (CAST(x AS DOUBLE) - m) * (CAST(x AS DOUBLE) - m)),
          |0D, (acc, v) -> acc + v)""".stripMargin), 6))
    dists.groupBy(col("vec_id"), col("label"))
      .agg(min(when(col("clabel") === col("label"), col("dsq"))).as("asq"),
        min(when(col("clabel") =!= col("label"), col("dsq"))).as("bsq"))
      .select(col("label"), sqrt(col("asq")).as("a"), sqrt(col("bsq")).as("b"))
      .withColumn("s", when(greatest(col("a"), col("b")) > 0.0,
        (col("b") - col("a")) / greatest(col("a"), col("b"))).otherwise(0.0))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("a")), 4).as("mean_a"),
        round(avg(col("b")), 4).as("mean_b"),
        round(avg(col("s")), 4).as("silhouette"))
      .orderBy(asc_nulls_first("label"))
  }

  val q185Oracle: String =
    """WITH coords AS (
      |  SELECT label, vec_id, CAST(x AS DOUBLE) AS x, d
      |  FROM (SELECT label, vec_id, UNNEST(embedding) AS x,
      |          generate_subscripts(embedding, 1) AS d
      |        FROM embeddings)),
      |dimmean AS (
      |  SELECT label, d, SUM(x) / COUNT(*) AS mu FROM coords GROUP BY 1, 2),
      |cents AS (
      |  SELECT label AS clabel, LIST(mu ORDER BY d) AS cvec
      |  FROM dimmean GROUP BY 1),
      |dists AS (
      |  SELECT e.vec_id, e.label, c.clabel,
      |    ROUND(list_aggregate(list_transform(list_zip(e.embedding, c.cvec),
      |      p -> (CAST(p[1] AS DOUBLE) - p[2])
      |         * (CAST(p[1] AS DOUBLE) - p[2])), 'sum'), 6) AS dsq
      |  FROM embeddings e CROSS JOIN cents c),
      |ab AS (
      |  SELECT vec_id, label,
      |    SQRT(MIN(CASE WHEN clabel = label THEN dsq END)) AS a,
      |    SQRT(MIN(CASE WHEN clabel <> label THEN dsq END)) AS b
      |  FROM dists GROUP BY 1, 2),
      |s AS (
      |  SELECT label, a, b,
      |    CASE WHEN GREATEST(a, b) > 0 THEN (b - a) / GREATEST(a, b)
      |         ELSE 0.0 END AS s
      |  FROM ab)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  ROUND(AVG(a), 4) AS mean_a, ROUND(AVG(b), 4) AS mean_b,
      |  ROUND(AVG(s), 4) AS silhouette
      |FROM s GROUP BY 1 ORDER BY label NULLS FIRST""".stripMargin

  /** md5-derived Rademacher sign for SRP hyperplane k, dimension d —
    * the same first-8-hex-digits parity both engines compute from
    * md5('srp:k:d') (NearDup.hexValueExpr's formula, evaluated once on
    * the driver so the Spark side embeds the signs as literals).
    */
  private[operators] def srpSign(k: Int, d: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"srp:$k:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
  }

  /** Q198 — SRP-LSH near-dup discovery over the embedding corpus
    * (Charikar 2002 signed random projections): the SCALE PATH for Q50,
    * whose all-pairs broadcast join is quadratic in the corpus. Each
    * vector quantizes to an exact integer grid (⌊x·2²⁰+0.5⌋ — float32
    * inputs are exact in double, so the grid is engine-independent),
    * projects onto 24 md5-derived ±1 hyperplanes (exact int64 sums),
    * and the sign bits split into eight r-bit bands; pairs sharing
    * any band bucket are candidates, verified by the exact-integer
    * cosine ≥ 0.4. Emits the verified pairs in Q50's shape.
    *
    * Band width is DATA-DERIVED (r13, SCALE.md finding 5): r12's
    * declared 8×3-bit shape admits only 8 bucket values per band, so
    * candidate mass was ~n²/8 BY PARAMETER (measured: ~70 GB scratch
    * disk exhaustion at 200k vectors) regardless of skew. Now
    * r = max(3, min r : 2^r · 256 ≥ n) — the smallest width that
    * keeps the UNIFORM expected bucket ≤ 256 vectors — computed from
    * the corpus count by IDENTICAL pure-integer search in both
    * engines (the Q340 derived-bound discipline: never a float log
    * whose last ulp could straddle a ceil). At the fixture tiers
    * (n = 500 and n = 2000) the search lands exactly on the old
    * r = 3, so golden hashes and bench-tier plans are byte-identical;
    * at sf10's 200k vectors r = 10 (1024 buckets/band, within-cluster
    * recall ≈ 0.86 at the corpus's cos ≈ 0.9 pairs) and candidate
    * mass collapses from n²/8 toward the true-pair mass. Recall
    * slides with r by the SRP curve p_band = p_agree^r — the
    * standard LSH cost/recall trade, stated rather than hidden.
    *
    * Determinism: the corpus count is exact in both engines, the
    * width search is integer-only, and every projection, band value,
    * dot, and norm is exact int64 arithmetic; cos is one divide of
    * identical doubles, so even the ≥ 0.4 fence cannot flip
    * cross-engine. AnnSpec pins recall against Q50's exhaustive pairs
    * on the shared id range.
    *
    * Scale notes: signatures are ROW-LOCAL codegen'd folds (zip_with +
    * aggregate over the 64-dim arrays — no per-dimension shuffle, the
    * plane signs ride along as literals); the only shuffles are the
    * (band, value) bucket self-join — candidate volume Σ bucket² now
    * tracks corpus size via the derived width — and the verify
    * join back to the integer vectors. A pathological hot bucket (all
    * vectors identical) degrades toward Q50's quadratic; the salting
    * defense is the same as Q103's and a per-bucket cap is one window.
    */
  private[graft] val SrpBands = 8
  private[graft] val SrpTargetBucket = 256L

  /** Smallest r ≥ 3 with 2^r · SrpTargetBucket ≥ n — pure-integer,
    * mirrored verbatim by the oracle's range-scan MIN.
    */
  private[graft] def srpBandBits(n: Long): Int =
    (1 to 40).find(r => (1L << r) * SrpTargetBucket >= n).getOrElse(40).max(3)

  def q198(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    // Corpus-count probe (two-long-to-driver class, the Q340/TextOps
    // adjudicated pattern): derives the band width both engines use.
    val rBits = srpBandBits(c.embeddings.count())
    val nPlanes = SrpBands * rBits
    val xi = c.embeddings.select(col("vec_id"), expr(
      "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))")
      .as("xi"))
    val projCols = (0 until nPlanes).map { k =>
      val signs = (0 until 64).map(d => srpSign(k, d)).mkString("array(", ", ", ")")
      expr(s"aggregate(zip_with(xi, $signs, (x, s) -> x * s), 0L, (a, v) -> a + v)")
        .as(s"p$k")
    }
    val withBands = xi.select(col("vec_id") +: col("xi") +: projCols: _*)
      .withColumns((0 until SrpBands).map(b => s"band$b" -> (0 until rBits).map(j =>
        when(col(s"p${rBits * b + j}") >= 0L, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)).toMap)
      .withColumn("nrm", expr("aggregate(transform(xi, x -> x * x), 0L, (a, v) -> a + v)"))
      .localCheckpoint()
    val buckets = (0 until SrpBands).map(b =>
        withBands.select(col("vec_id"), lit(b).as("band"), col(s"band$b").as("bv")))
      .reduce(_ union _)
    val cand = buckets.as("b1").join(buckets.as("b2"),
        col("b1.band") === col("b2.band") && col("b1.bv") === col("b2.bv") &&
          col("b1.vec_id") < col("b2.vec_id"))
      .select(col("b1.vec_id").as("v1"), col("b2.vec_id").as("v2"),
        col("b1.band").as("band"))
    // Verify join: the candidate relation is the BIG side (up to the
    // true-pair mass); the integer-vector sides are n × ~520 B. Below
    // ~1 GB built size, broadcasting both sides keeps the candidates
    // map-side (zero candidate shuffle); past that — production vector
    // corpora — the plain equi-join shuffles bucket-co-located, which
    // is the cluster-scale shape.
    //
    // Dedup at the SOURCE, then verify, then the (now duplicate-free)
    // distinct (r14, guide §2.3/§2.4): the r12→r14 sf10 sweeps measured
    // the DISTINCT over the raw candidate relation as Q198's wall —
    // 764 GB of aggregate spill / 43 GB of dedup shuffle at 200k
    // label-clustered vectors (Σ bucket² candidates, each pair repeated
    // once per shared band). Both band vectors ride the broadcast sides,
    // so each candidate row can decide ROW-LOCALLY whether its band is
    // the pair's minimal shared band and drop itself otherwise — every
    // surviving pair is emitted exactly once, no exchange ever carries a
    // duplicate, and only rows passing the exact cos ≥ 0.4 verify reach
    // the output shuffle. Same rows as dedup→verify by determinism of
    // the cosine; the r12-shape plan is preserved past the broadcast
    // fence where the equi-join shuffles bucket-co-located.
    val hintIfSmall: DataFrame => DataFrame =
      if (rBits <= 12) broadcast(_) else identity
    val bandArr = array((0 until SrpBands).map(b => col(s"band$b")): _*)
    val side1 = hintIfSmall(
      withBands.select(col("vec_id").as("v1"), col("xi").as("x1"),
        col("nrm").as("n1"), bandArr.as("ba1")))
    val side2 = hintIfSmall(
      withBands.select(col("vec_id").as("v2"), col("xi").as("x2"),
        col("nrm").as("n2"), bandArr.as("ba2")))
    cand.join(side1, Seq("v1")).join(side2, Seq("v2"))
      // minimal-shared-band fence: a candidate row exists for every
      // shared band, so array_position finds the smallest one; keep the
      // row only when it IS that band (exactly-once per pair).
      .filter(col("band") + 1 ===
        expr("array_position(zip_with(ba1, ba2, (x, y) -> x = y), true)"))
      .withColumn("dp", expr("aggregate(zip_with(x1, x2, (a, b) -> a * b), 0L, (a, v) -> a + v)"))
      .withColumn("cos", col("dp").cast("double") /
        (sqrt(col("n1").cast("double")) * sqrt(col("n2").cast("double"))))
      .filter(col("cos") >= 0.4)
      // No DISTINCT: the minimal-shared-band fence above emits each
      // ordered pair at most once by construction (one bucket row per
      // (vec, band) ⇒ one candidate row per (pair, shared band) ⇒ one
      // survivor per pair), so deduplication would be a full extra
      // shuffle of the verified output for nothing — at the sf10 tier
      // that output is ~1.7G rows (the corpus is ten giant near-dup
      // clusters by construction). AnnSpec pins the pair set against
      // the exhaustive Q50 relation.
      .select(col("v1").as("vec_lo"), col("v2").as("vec_hi"),
        round(col("cos"), 4).as("cos"))
      .orderBy(asc_nulls_first("vec_lo"), asc_nulls_first("vec_hi"))
  }

  val q198Oracle: String = {
    val hexv = NearDup.hexValueExpr(
      "md5('srp:' || CAST(k.k AS VARCHAR) || ':' || CAST(d.d AS VARCHAR))")
    s"""WITH rb AS (
       |  -- Data-derived band width (r13): smallest r >= 3 with
       |  -- 2^r * 256 >= corpus count — the IDENTICAL pure-integer
       |  -- search the engine runs on its driver-side count probe.
       |  SELECT GREATEST(3, (
       |    SELECT MIN(t.r) FROM range(1, 41) t(r)
       |    WHERE (CAST(1 AS BIGINT) << t.r) * 256 >=
       |      (SELECT COUNT(*) FROM embeddings))) AS r),
       |v AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
       |    AS xi
       |  FROM embeddings),
       |flat AS (
       |  SELECT vec_id, generate_subscripts(xi, 1) - 1 AS d, UNNEST(xi) AS x
       |  FROM v),
       |planes AS (
       |  SELECT k.k, d.d,
       |    CASE WHEN ($hexv) % 2 = 0 THEN 1 ELSE -1 END AS s
       |  FROM range(320) k(k) CROSS JOIN range(64) d(d), rb
       |  WHERE k.k < 8 * rb.r),
       |proj AS (
       |  SELECT f.vec_id, p.k, SUM(f.x * p.s) AS pr
       |  FROM flat f JOIN planes p ON p.d = f.d GROUP BY 1, 2),
       |bands AS (
       |  SELECT vec_id, k // rb.r AS band,
       |    SUM(CASE WHEN pr >= 0 THEN 1 << (k % rb.r) ELSE 0 END) AS bv
       |  FROM proj, rb GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT b1.vec_id AS v1, b2.vec_id AS v2
       |  FROM bands b1 JOIN bands b2
       |    ON b1.band = b2.band AND b1.bv = b2.bv AND b1.vec_id < b2.vec_id),
       |norms AS (
       |  SELECT vec_id, SUM(x * x) AS nn FROM flat GROUP BY 1),
       |dots AS (
       |  SELECT c.v1, c.v2, SUM(f1.x * f2.x) AS dp
       |  FROM cand c
       |  JOIN flat f1 ON f1.vec_id = c.v1
       |  JOIN flat f2 ON f2.vec_id = c.v2 AND f2.d = f1.d
       |  GROUP BY 1, 2),
       |cosv AS (
       |  SELECT v1, v2, CAST(dp AS DOUBLE)
       |    / (SQRT(CAST(n1.nn AS DOUBLE)) * SQRT(CAST(n2.nn AS DOUBLE))) AS cos
       |  FROM dots
       |  JOIN norms n1 ON n1.vec_id = v1
       |  JOIN norms n2 ON n2.vec_id = v2)
       |SELECT v1 AS vec_lo, v2 AS vec_hi, ROUND(cos, 4) AS cos
       |FROM cosv WHERE cos >= 0.4
       |ORDER BY vec_lo NULLS FIRST, vec_hi NULLS FIRST""".stripMargin
  }

  /** Q200 — maximal marginal relevance (Carbonell & Goldstein 1998):
    * the diversified top-k a retrieval pipeline runs AFTER similarity
    * search, trading relevance against redundancy. Probe = vector 0,
    * candidates = vectors 1..200; five greedy rounds pick
    * argmax λ·rel(i) − (1−λ)·max_{s∈S} sim(i, s) with λ = 0.7 — round 1
    * reduces to argmax λ·rel (empty penalty). Emits the pick sequence
    * (rank, vec_id, rel, mmr score at selection).
    *
    * Determinism: rel and every pairwise sim are Q198's exact-integer
    * cosines rounded at 6 BEFORE any comparison, and the composite score
    * rounds at 6 with id tiebreak (Q173's argmax-can't-flip rule) — the
    * greedy trajectory is therefore bit-stable across engines; the
    * oracle replays the identical five rounds as a chained CTE (Q120
    * discipline for iterated algorithms).
    *
    * Scale notes: the selected set is ≤k rows and BROADCASTS; each round
    * is one broadcast-join + argmax over the candidate relation (k
    * passes total, k bounded), never a candidate×candidate shuffle. The
    * per-round 1-row collect is the Q102/Q120-adjudicated bounded driver
    * step. At web scale the candidate relation is itself the output of
    * ANN shortlisting (Q38/Ann), keeping rounds shortlist-sized.
    */
  def q200(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Catalog(spark, dir)
    val xi = c.embeddings.filter(col("vec_id") <= 200)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))")
        .as("xi"))
      .withColumn("nrm", expr("aggregate(transform(xi, x -> x * x), 0L, (a, v) -> a + v)"))
      .localCheckpoint()
    val probe = xi.filter(col("vec_id") === 0)
      .select(col("xi").as("x0"), col("nrm").as("n0"))
    val rel = xi.filter(col("vec_id") >= 1).crossJoin(broadcast(probe))
      .withColumn("dp", expr("aggregate(zip_with(xi, x0, (a, b) -> a * b), 0L, (a, v) -> a + v)"))
      .select(col("vec_id"), col("xi"), col("nrm"),
        round(col("dp").cast("double") /
          (sqrt(col("nrm").cast("double")) * sqrt(col("n0").cast("double"))), 6)
          .as("rel"))
      .localCheckpoint()
    var selected = Vector.empty[(Long, Long, Double, Double)]
    for (r <- 1 to 5) {
      val selIds = selected.map(_._2)
      val rem = if (selIds.isEmpty) rel else rel.filter(!col("vec_id").isin(selIds: _*))
      val scored =
        if (selIds.isEmpty)
          rem.withColumn("score", round(lit(0.7) * col("rel"), 6))
        else {
          val selDf = rel.filter(col("vec_id").isin(selIds: _*))
            .select(col("vec_id").as("sid"), col("xi").as("sxi"), col("nrm").as("snrm"))
          rem.crossJoin(broadcast(selDf))
            .withColumn("dps", expr(
              "aggregate(zip_with(xi, sxi, (a, b) -> a * b), 0L, (a, v) -> a + v)"))
            .withColumn("cs", round(col("dps").cast("double") /
              (sqrt(col("nrm").cast("double")) * sqrt(col("snrm").cast("double"))), 6))
            .groupBy(col("vec_id"), col("rel")).agg(max(col("cs")).as("ms"))
            .withColumn("score",
              round(lit(0.7) * col("rel") - lit(0.3) * col("ms"), 6))
        }
      val row = scored.orderBy(desc("score"), asc("vec_id"))
        .select(col("vec_id"), col("rel"), col("score")).head()
      selected = selected :+ ((r.toLong, row.getLong(0), row.getDouble(1), row.getDouble(2)))
    }
    selected.toDF("rank", "vec_id", "rel", "mmr").orderBy(asc("rank"))
  }

  val q200Oracle: String = {
    def round(n: Int): String = {
      val prev = if (n == 1) "sel0" else s"sel${n - 1}"
      val pick =
        if (n == 1)
          s"""p1 AS (
             |  SELECT vec_id, rel, ROUND(0.7 * rel, 6) AS score
             |  FROM rel ORDER BY score DESC, vec_id LIMIT 1)"""
        else
          s"""sc$n AS (
             |  SELECT r.vec_id, r.rel,
             |    ROUND(0.7 * r.rel - 0.3 * MAX(s.cs), 6) AS score
             |  FROM rel r JOIN sim s ON s.a = r.vec_id
             |    AND s.b IN (SELECT vec_id FROM $prev)
             |  WHERE r.vec_id NOT IN (SELECT vec_id FROM $prev)
             |  GROUP BY r.vec_id, r.rel),
             |p$n AS (
             |  SELECT vec_id, rel, score FROM sc$n
             |  ORDER BY score DESC, vec_id LIMIT 1)"""
      val sel =
        if (n == 1) s"sel1 AS (SELECT vec_id FROM p1)"
        else s"sel$n AS (SELECT vec_id FROM $prev UNION ALL SELECT vec_id FROM p$n)"
      s"$pick,\n$sel"
    }
    val rounds = (1 to 5).map(round).mkString(",\n")
    val finals = (1 to 5)
      .map(n => s"SELECT CAST($n AS BIGINT) AS rank, vec_id, rel, score AS mmr FROM p$n")
      .mkString("\nUNION ALL ")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
       |    AS xi
       |  FROM embeddings WHERE vec_id <= 200),
       |flat AS (
       |  SELECT vec_id, generate_subscripts(xi, 1) AS pos, UNNEST(xi) AS x
       |  FROM v),
       |norms AS (SELECT vec_id, SUM(x * x) AS nn FROM flat GROUP BY 1),
       |rel AS (
       |  SELECT f.vec_id, ROUND(CAST(SUM(f.x * p.x) AS DOUBLE)
       |    / (SQRT(CAST(n1.nn AS DOUBLE)) * SQRT(CAST(n0.nn AS DOUBLE))), 6)
       |    AS rel
       |  FROM flat f
       |  JOIN flat p ON p.vec_id = 0 AND p.pos = f.pos
       |  JOIN norms n1 ON n1.vec_id = f.vec_id
       |  CROSS JOIN (SELECT nn FROM norms WHERE vec_id = 0) n0
       |  WHERE f.vec_id >= 1
       |  GROUP BY f.vec_id, n1.nn, n0.nn),
       |sim AS (
       |  SELECT f1.vec_id AS a, f2.vec_id AS b,
       |    ROUND(CAST(SUM(f1.x * f2.x) AS DOUBLE)
       |      / (SQRT(CAST(na.nn AS DOUBLE)) * SQRT(CAST(nb.nn AS DOUBLE))), 6)
       |      AS cs
       |  FROM flat f1
       |  JOIN flat f2 ON f2.pos = f1.pos
       |    AND f1.vec_id >= 1 AND f2.vec_id >= 1 AND f1.vec_id <> f2.vec_id
       |  JOIN norms na ON na.vec_id = f1.vec_id
       |  JOIN norms nb ON nb.vec_id = f2.vec_id
       |  GROUP BY 1, 2, na.nn, nb.nn),
       |$rounds
       |$finals
       |ORDER BY rank""".stripMargin
  }

  /** md5-derived Rademacher sign for the Q248 JL projection, namespace
    * 'jl:' so the 16 JL planes never collide with Q198's 24 SRP planes.
    */
  private[operators] def jlSign(k: Int, d: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"jl:$k:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
  }

  /** Q248 — Johnson–Lindenstrauss distance-preservation audit of a
    * 64 → 16 Rademacher projection (Johnson & Lindenstrauss 1984;
    * Achlioptas 2003 for the ±1 matrix): before routing ANN through a
    * reduced space, MEASURE what the reduction does to pairwise
    * distances. Vectors quantize to Q198's exact integer grid, project
    * onto 16 md5-derived ±1 hyperplanes (exact int64), and an
    * md5-sampled pair set compares ||Pa−Pb||²/(k·||a−b||²) — the JL
    * ratio whose expectation is 1. Emits the ratio histogram
    * (0.1-wide bins, ALL-INTEGER binning (10·p2) div (16·d2)) plus a
    * TOTAL row with mean/min/max ratio and the share of pairs within
    * ±25% distortion — decided by the EXACT integer fence
    * 12·d2 ≤ p2 ≤ 20·d2, so the headline number cannot flip
    * cross-engine.
    *
    * Determinism: grid coords, projections, p2, d2, bins, and the ±25%
    * fence are all exact int64; the per-pair ratio is one divide of
    * exact ints (identical doubles both engines → identical min/max);
    * only the mean is a float sum over the sampled pairs (Q206
    * round-once discipline). Identical-vector pairs (d2 = 0) drop in
    * both engines.
    *
    * Scale notes: projections are ROW-LOCAL codegen'd folds as in
    * Q198; the VECTORS are md5-sampled BEFORE any pairing, so the
    * candidate enumeration is quadratic in the SAMPLE, never in the
    * corpus: no n² id enumeration ever materializes. The gate modulus
    * is corpus-adaptive in BOTH engine texts — GREATEST(6,
    * (n+349) DIV 350), i.e. ~1/6 of ids at fixture scale (≈ the round-9
    * 1/37 pair density) and a ~350-vector / ~60k-pair sample at ANY
    * larger n (10⁹ vectors → modulus ~3·10⁶), the same statistic at a
    * bounded cost. Exact integer derivation, so the two engines compute
    * the identical modulus. Output rows = bins + 1.
    */
  def q248(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val xi = c.embeddings.select(col("vec_id"), expr(
      "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))")
      .as("xi"))
    val projArr = (0 until 16).map { k =>
      val signs = (0 until 64).map(d => jlSign(k, d)).mkString("array(", ", ", ")")
      s"aggregate(zip_with(xi, $signs, (x, s) -> x * s), 0L, (a, v) -> a + v)"
    }.mkString("array(", ", ", ")")
    val v = xi.withColumn("p", expr(projArr)).localCheckpoint()
    // Sample VECTORS before pairing (round-11 fix of the r10 `weak`):
    // the r9/r10 form enumerated ALL n²/2 id pairs and md5-gated each —
    // cheap rows, but corpus-quadratic enumeration (5·10¹⁷ hashes at
    // 10⁹ vectors). Gating vec_ids at ~1/6 first makes the pair stage
    // quadratic in the SAMPLE only, at the same surviving-pair density.
    // The nested-loop pair join's parallelism is the STREAM side's
    // partition count — a checkpointed small relation sits in 1-2
    // partitions and would run the quadratic stage single-threaded
    // (measured ~20 s vs ~1 s at sf0.1). Spread the ids first.
    // Corpus-adaptive gate modulus, derived on the DRIVER from the
    // already-checkpointed relation (r13, VERDICT r12 item 7: the r12
    // form computed it as a one-row aggregate + broadcast crossJoin —
    // an extra job and exchange that cost Q248 ~0.8 s of fixed
    // overhead per run; counting checkpointed blocks is ~free and the
    // literal modulus keeps the gate fully codegen'd). Same exact
    // integer formula as the oracle text → identical sample, hashes
    // unchanged.
    val modulus = math.max(6L, (v.count() + 349L) / 350L)
    val ids = v.select(col("vec_id"))
      .withColumn("hv", md5(concat(lit("jl:v:"), col("vec_id").cast("string"))))
      .filter(expr(graft.operators.NearDup.hexValueFastExpr("hv")) % lit(modulus) === 0L)
      .select(col("vec_id"))
      .repartition(spark.sparkContext.defaultParallelism)
    val sampled = ids.select(col("vec_id").as("v1"))
      .join(broadcast(ids.select(col("vec_id").as("v2"))),
        col("v1") < col("v2"))
      .select(col("v1"), col("v2"))
    val a = v.select(col("vec_id").as("v1"), col("xi").as("x1"),
      col("p").as("p1"))
    val b = v.select(col("vec_id").as("v2"), col("xi").as("x2"),
      col("p").as("p2v"))
    val pairs = sampled.join(a, Seq("v1")).join(b, Seq("v2"))
      .withColumn("d2", expr("aggregate(zip_with(x1, x2," +
        " (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"))
      .withColumn("p2", expr("aggregate(zip_with(p1, p2v," +
        " (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"))
      .filter(col("d2") > 0L)
      .withColumn("ratio", expr("CAST(p2 AS DOUBLE) / (16 * d2)"))
      .withColumn("bin", expr("least(CAST(20 AS BIGINT), (10 * p2) div (16 * d2))"))
      .withColumn("w25",
        expr("CASE WHEN p2 >= 12 * d2 AND p2 <= 20 * d2 THEN 1 ELSE 0 END"))
      .localCheckpoint()
    val tot = pairs.agg(count(lit(1)).as("n_pairs"),
        sum(col("w25")).cast("long").as("nw"),
        sum(col("ratio")).as("sr"),
        min(col("ratio")).as("mn"), max(col("ratio")).as("mx"))
      .select(lit(null).cast("long").as("bin"), col("n_pairs"),
        lit(null).cast("double").as("share"),
        expr("ROUND(sr / n_pairs, 6)").as("mean_ratio"),
        expr("ROUND(mn, 6)").as("min_ratio"),
        expr("ROUND(mx, 6)").as("max_ratio"),
        expr("ROUND(CAST(nw AS DOUBLE) / n_pairs, 6)").as("within_25pct"))
    val nAll = pairs.agg(count(lit(1)).as("na"))
    val bins = pairs.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(nAll))
      .select(col("bin"), col("n_pairs"),
        expr("ROUND(CAST(n_pairs AS DOUBLE) / na, 6)").as("share"),
        lit(null).cast("double").as("mean_ratio"),
        lit(null).cast("double").as("min_ratio"),
        lit(null).cast("double").as("max_ratio"),
        lit(null).cast("double").as("within_25pct"))
    bins.unionAll(tot).orderBy(asc_nulls_last("bin"))
  }

  val q248Oracle: String = {
    val hexPlane = NearDup.hexValueExpr(
      "md5('jl:' || CAST(k.k AS VARCHAR) || ':' || CAST(d.d AS VARCHAR))")
    val hexVec = NearDup.hexValueExpr(
      "md5('jl:v:' || CAST(vec_id AS VARCHAR))")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
       |    AS xi
       |  FROM embeddings),
       |flat AS (
       |  SELECT vec_id, generate_subscripts(xi, 1) - 1 AS d, UNNEST(xi) AS x
       |  FROM v),
       |planes AS (
       |  SELECT k.k, d.d,
       |    CASE WHEN ($hexPlane) % 2 = 0 THEN 1 ELSE -1 END AS s
       |  FROM range(16) k(k) CROSS JOIN range(64) d(d)),
       |proj AS (
       |  SELECT f.vec_id, p.k, CAST(SUM(f.x * p.s) AS BIGINT) AS pr
       |  FROM flat f JOIN planes p ON p.d = f.d GROUP BY 1, 2),
       |md AS (
       |  SELECT GREATEST(CAST(6 AS BIGINT),
       |    (COUNT(*) + 349) // 350) AS m FROM v),
       |samp AS (
       |  SELECT vec_id FROM v WHERE ($hexVec) % (SELECT m FROM md) = 0),
       |sampled AS (
       |  SELECT a.vec_id AS v1, b.vec_id AS v2
       |  FROM samp a JOIN samp b ON a.vec_id < b.vec_id),
       |dd AS (
       |  SELECT s.v1, s.v2,
       |    CAST(SUM((fa.x - fb.x) * (fa.x - fb.x)) AS BIGINT) AS d2
       |  FROM sampled s
       |  JOIN flat fa ON fa.vec_id = s.v1
       |  JOIN flat fb ON fb.vec_id = s.v2 AND fb.d = fa.d
       |  GROUP BY 1, 2),
       |pp AS (
       |  SELECT s.v1, s.v2,
       |    CAST(SUM((pa.pr - pb.pr) * (pa.pr - pb.pr)) AS BIGINT) AS p2
       |  FROM sampled s
       |  JOIN proj pa ON pa.vec_id = s.v1
       |  JOIN proj pb ON pb.vec_id = s.v2 AND pb.k = pa.k
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT dd.v1, dd.v2, dd.d2, pp.p2,
       |    CAST(pp.p2 AS DOUBLE) / (16 * dd.d2) AS ratio,
       |    LEAST(20, (10 * pp.p2) // (16 * dd.d2)) AS bin,
       |    CASE WHEN pp.p2 >= 12 * dd.d2 AND pp.p2 <= 20 * dd.d2
       |      THEN 1 ELSE 0 END AS w25
       |  FROM dd JOIN pp ON pp.v1 = dd.v1 AND pp.v2 = dd.v2
       |  WHERE dd.d2 > 0),
       |tot AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    CAST(SUM(w25) AS BIGINT) AS nw, SUM(ratio) AS sr,
       |    MIN(ratio) AS mn, MAX(ratio) AS mx
       |  FROM pairs)
       |SELECT CAST(bin AS BIGINT) AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n_pairs FROM tot), 6)
       |    AS share,
       |  CAST(NULL AS DOUBLE) AS mean_ratio,
       |  CAST(NULL AS DOUBLE) AS min_ratio,
       |  CAST(NULL AS DOUBLE) AS max_ratio,
       |  CAST(NULL AS DOUBLE) AS within_25pct
       |FROM pairs GROUP BY bin
       |UNION ALL
       |SELECT NULL, n_pairs, CAST(NULL AS DOUBLE),
       |  ROUND(sr / n_pairs, 6), ROUND(mn, 6), ROUND(mx, 6),
       |  ROUND(CAST(nw AS DOUBLE) / n_pairs, 6)
       |FROM tot
       |ORDER BY bin NULLS LAST""".stripMargin
  }

  /** Q262 — Davies–Bouldin index per label over the embedding corpus
    * (Davies & Bouldin 1979): the scatter-to-separation internal
    * clustering index next to Q185's silhouette — R_ij = (S_i + S_j)/
    * M_ij with S_i the mean member→centroid distance and M_ij the
    * centroid–centroid distance; each cluster reports its WORST partner
    * (the max R_ij, the specific confusion silhouette averages away)
    * and DB = mean_i max_j R_ij is the corpus score (lower = better
    * separated). Reads cluster quality pairwise where Q185 reads it
    * per vector.
    *
    * Exactness: per-pair squared distances fold in fixed element order
    * and ROUND at 6 before any sqrt/compare (the Q185/Q173 shared-grid
    * discipline); S_i is one mean of those rounded roots; R rounds at 6
    * BEFORE the per-cluster argmax (partner-label tie-break), DB
    * rounds at 4.
    *
    * Scale notes: members touch only the |labels|-wide broadcast
    * centroid relation (n·k fold rows); the R matrix is k² rows. No
    * vector×vector pair ever materializes — the same reason Q185's
    * centroid form is the only one that exists at corpus scale.
    */
  def q262(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val cents = labelCentroids(c)
    val s = c.embeddings.crossJoin(broadcast(cents))
      .filter(col("clabel") === col("label"))
      .withColumn("dsq", round(expr(
        """aggregate(zip_with(embedding, cvec,
          |  (x, m) -> (CAST(x AS DOUBLE) - m) * (CAST(x AS DOUBLE) - m)),
          |0D, (acc, v) -> acc + v)""".stripMargin), 6))
      .groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("n_vecs"),
        avg(sqrt(col("dsq"))).as("s_i"))
    val m = cents.crossJoin(broadcast(cents
        .select(col("clabel").as("clabel2"), col("cvec").as("cvec2"))))
      .filter(col("clabel") =!= col("clabel2"))
      .withColumn("msq", round(expr(
        """aggregate(zip_with(cvec, cvec2,
          |  (a, b) -> (a - b) * (a - b)),
          |0D, (acc, v) -> acc + v)""".stripMargin), 6))
      .select(col("clabel").as("la"), col("clabel2").as("lb"),
        sqrt(col("msq")).as("mij"))
    val r = m
      .join(s.select(col("label").as("la"), col("s_i").as("sa")), Seq("la"))
      .join(s.select(col("label").as("lb"), col("s_i").as("sb")), Seq("lb"))
      .withColumn("r", round((col("sa") + col("sb")) / col("mij"), 6))
      .withColumn("rk", row_number().over(Window.partitionBy(col("la"))
        .orderBy(desc("r"), asc("lb"))))
      .filter(col("rk") === 1)
      .select(col("la").as("label"), col("lb").as("worst_partner"),
        col("r").as("r_max"))
    s.join(r, Seq("label"))
      .withColumn("db_index",
        round(avg(col("r_max")).over(Window.partitionBy()), 4))
      .select(col("label"), col("n_vecs"), round(col("s_i"), 4).as("s_i"),
        col("worst_partner"), col("r_max"), col("db_index"))
      .orderBy(asc_nulls_first("label"))
  }

  val q262Oracle: String =
    """WITH coords AS (
      |  SELECT label, vec_id, CAST(x AS DOUBLE) AS x, d
      |  FROM (SELECT label, vec_id, UNNEST(embedding) AS x,
      |          generate_subscripts(embedding, 1) AS d
      |        FROM embeddings)),
      |dimmean AS (
      |  SELECT label, d, SUM(x) / COUNT(*) AS mu FROM coords GROUP BY 1, 2),
      |cents AS (
      |  SELECT label AS clabel, LIST(mu ORDER BY d) AS cvec
      |  FROM dimmean GROUP BY 1),
      |s AS (
      |  SELECT e.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |    AVG(SQRT(ROUND(list_aggregate(list_transform(
      |      list_zip(e.embedding, c.cvec),
      |      p -> (CAST(p[1] AS DOUBLE) - p[2])
      |         * (CAST(p[1] AS DOUBLE) - p[2])), 'sum'), 6))) AS s_i
      |  FROM embeddings e JOIN cents c ON c.clabel = e.label
      |  GROUP BY 1),
      |m AS (
      |  SELECT a.clabel AS la, b.clabel AS lb,
      |    SQRT(ROUND(list_aggregate(list_transform(
      |      list_zip(a.cvec, b.cvec),
      |      p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), 6)) AS mij
      |  FROM cents a CROSS JOIN cents b WHERE a.clabel <> b.clabel),
      |r AS (
      |  SELECT la, lb, ROUND((sa.s_i + sb.s_i) / mij, 6) AS r
      |  FROM m
      |  JOIN s sa ON sa.label = m.la
      |  JOIN s sb ON sb.label = m.lb),
      |best AS (
      |  SELECT la AS label, lb AS worst_partner, r AS r_max FROM (
      |    SELECT la, lb, r,
      |      ROW_NUMBER() OVER (PARTITION BY la ORDER BY r DESC, lb) AS rk
      |    FROM r) t
      |  WHERE rk = 1)
      |SELECT s.label, s.n_vecs, ROUND(s.s_i, 4) AS s_i,
      |  b.worst_partner, b.r_max,
      |  ROUND(AVG(b.r_max) OVER (), 4) AS db_index
      |FROM s JOIN best b ON b.label = s.label
      |ORDER BY s.label NULLS FIRST""".stripMargin

  /** Q270 — exact KNN-Shapley data valuation of the training vectors
    * (Jia et al., VLDB 2019, the K = 1 closed form): every training
    * point's Shapley contribution to 1-NN label accuracy over the
    * probe set — THE data-valuation primitive for curating training
    * corpora (which examples help, which actively hurt). Per probe,
    * train points sort by similarity and the recursion s_n = δ_n/n,
    * s_i = s_{i+1} + (δ_i − δ_{i+1})/i telescopes into a SUFFIX SUM of
    * per-rank contributions c_i — one ordered window per probe, no
    * iteration; the gate emits the 20 most valuable points and the
    * count of NEGATIVE-value points (mislabeled-looking neighbors that
    * lower probe accuracy).
    *
    * Determinism: neighbor order is the Q173 rounded-6-dot grid with
    * id tie-break; δ terms are exact 0/1; c_i values are identical
    * small rationals in double, suffix-summed in identical rank order;
    * the per-point mean over probes rounds at 6 BEFORE the rank.
    *
    * Scale notes: probe×train pair scoring is the Q173 topology
    * (probe-bounded, map-side folds); ranking windows partition per
    * probe. Efficiency IS the point of the closed form — exact Shapley
    * without a single Monte-Carlo permutation. At 10⁹ train points,
    * keep the probe set bounded and prune candidates with Q198's
    * SRP-LSH before the exact rank (documented scale path).
    */
  def q270(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val probe = c.embeddings.filter(col("vec_id") < 100)
      .select(col("vec_id").as("pid"), col("embedding").as("pe"),
        col("label").as("plabel"))
    val train = c.embeddings.filter(col("vec_id") >= 100)
      .select(col("vec_id").as("tid"), col("embedding").as("te"),
        col("label").as("tlabel"))
      // BNLJ parallelism = the STREAM side's partition count (the Q248
      // lesson): the small train parquet reads as 1-2 partitions, which
      // would run the probe×train scoring near-single-threaded.
      .repartition(spark.sparkContext.defaultParallelism)
    val scored = train.crossJoin(broadcast(probe))
      .withColumn("rdot", round(expr(
        """aggregate(zip_with(te, pe,
          |  (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),
          |  0D, (acc, x) -> acc + x)""".stripMargin), 6))
      .withColumn("delta",
        when(col("tlabel") === col("plabel"), 1L).otherwise(0L))
      .withColumn("i", row_number().over(Window.partitionBy(col("pid"))
        .orderBy(desc("rdot"), asc("tid"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("pid")))
        .cast("long"))
    val contrib = scored
      .withColumn("dnext", lead(col("delta"), 1).over(
        Window.partitionBy(col("pid")).orderBy(asc("i"))))
      .withColumn("ci",
        when(col("i") === col("n"), col("delta").cast("double") / col("n"))
          .otherwise((col("delta") - col("dnext")).cast("double") / col("i")))
      // Suffix sum as a RUNNING sum over descending rank: the
      // [currentRow, unboundedFollowing) frame looks identical but
      // Spark's UnboundedFollowingWindowFunctionFrame re-aggregates the
      // whole tail PER ROW — O(n²) per probe partition, measured as a
      // 72-CPU-minute-per-task wall at the sf10 sweep's 200k-row
      // partitions. The reversed unboundedPreceding frame is the O(n)
      // streaming form; both engines accumulate in the same i-descending
      // order, and all three fixture-tier hashes are unchanged.
      .withColumn("s", sum(col("ci")).over(
        Window.partitionBy(col("pid")).orderBy(desc("i"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val value = contrib.groupBy(col("tid"), col("tlabel"))
      .agg(count(lit(1)).cast("long").as("n_probes"),
        round(avg(col("s")), 6).as("mean_shapley"))
    val neg = value.agg(
      sum(when(col("mean_shapley") < 0, 1L).otherwise(0L)).cast("long")
        .as("n_negative"),
      count(lit(1)).cast("long").as("n_train"))
    value.crossJoin(broadcast(neg))
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("mean_shapley"), asc("tid"))).cast("long"))
      .filter(col("rank") <= 20)
      .select(col("rank"), col("tid").as("vec_id"),
        col("tlabel").as("label"), col("mean_shapley"), col("n_probes"),
        col("n_train"), col("n_negative"))
      .orderBy(asc("rank"))
  }

  val q270Oracle: String =
    """WITH probe AS (
      |  SELECT vec_id AS pid, embedding AS pe, label AS plabel
      |  FROM embeddings WHERE vec_id < 100),
      |train AS (
      |  SELECT vec_id AS tid, embedding AS te, label AS tlabel
      |  FROM embeddings WHERE vec_id >= 100),
      |scored AS (
      |  SELECT t.tid, t.tlabel, p.pid, p.plabel,
      |    ROUND(list_aggregate(list_transform(range(len(t.te)),
      |      i -> CAST(t.te[i+1] AS DOUBLE)
      |         * CAST(p.pe[i+1] AS DOUBLE)), 'sum'), 6) AS rdot,
      |    CASE WHEN t.tlabel = p.plabel THEN 1 ELSE 0 END AS delta
      |  FROM train t CROSS JOIN probe p),
      |ranked AS (
      |  SELECT *,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY pid
      |      ORDER BY rdot DESC, tid) AS BIGINT) AS i,
      |    CAST(COUNT(*) OVER (PARTITION BY pid) AS BIGINT) AS n
      |  FROM scored),
      |contrib AS (
      |  SELECT *,
      |    CASE WHEN i = n THEN CAST(delta AS DOUBLE) / n
      |      ELSE CAST(delta - LEAD(delta) OVER (PARTITION BY pid ORDER BY i)
      |        AS DOUBLE) / i END AS ci
      |  FROM ranked),
      |suff AS (
      |  -- Same DESCENDING-i running-sum shape as the engine (ADVICE
      |  -- r12): both engines accumulate the double ci terms in the
      |  -- identical i-descending order, so the suffix sums agree
      |  -- bit-for-bit, not merely to rounding.
      |  SELECT tid, tlabel, pid,
      |    SUM(ci) OVER (PARTITION BY pid ORDER BY i DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      |  FROM contrib),
      |value AS (
      |  SELECT tid, tlabel, CAST(COUNT(*) AS BIGINT) AS n_probes,
      |    ROUND(AVG(s), 6) AS mean_shapley
      |  FROM suff GROUP BY 1, 2),
      |neg AS (
      |  SELECT CAST(SUM(CASE WHEN mean_shapley < 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_negative,
      |    CAST(COUNT(*) AS BIGINT) AS n_train
      |  FROM value)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY mean_shapley DESC, tid)
      |    AS BIGINT) AS rank,
      |  tid AS vec_id, tlabel AS label, mean_shapley, n_probes,
      |  neg.n_train, neg.n_negative
      |FROM value CROSS JOIN neg
      |QUALIFY rank <= 20
      |ORDER BY rank""".stripMargin

  /** Q302 — hubness profile of the exact k = 10 cosine-NN graph over
    * the embedding table (Radovanović, Nanopoulos & Ivanović 2010):
    * the k-occurrence histogram — for each occurrence count, how many
    * vectors appear that often in OTHER vectors' top-10 lists. In high
    * dimension the distribution right-skews ("hub" points enter
    * everyone's neighbor lists, "anti-hubs" nobody's), which silently
    * degrades every kNN consumer downstream (Q38's search, Q270's
    * KNN-Shapley, label propagation); this gate is the diagnostic
    * that says whether that pathology is present BEFORE those run.
    *
    * Determinism: neighbor ranking orders on ROUND(cos, 6) with n_id
    * tiebreak — the two engines' dot products agree to ~1e-15, so the
    * 10⁻⁶ grid collapses them identically away from (doubly-unlucky)
    * boundary straddles, and ties inside a grid cell break on the
    * exact id; occurrence counts and the histogram are exact int64
    * (zero-occurrence vectors included via the id spine).
    *
    * Scale notes: exact all-pairs is the DECLARED gate (the fixture
    * table is bounded); the 100 TB path swaps the candidate generator
    * for the SRP-LSH / IVF-PQ structures (Q198, `Ann.scala`) and keeps
    * the same occurrence rollup — hubness only needs the top-k lists,
    * however they were produced. The histogram is ≤ n distinct rows,
    * the rollup one aggregate.
    */
  def q302(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val e = c.embeddings.select(col("vec_id"), col("embedding"),
      l2(col("embedding")).as("nrm"))
    val p = e.select(col("vec_id").as("p_id"),
      col("embedding").as("p_emb"), col("nrm").as("p_nrm"))
    // The nested-loop pair join's parallelism is the STREAM side's
    // partition count (the Q248/Q270 lesson): the small embedding
    // parquet reads as 1-2 partitions, which would run the n² dot
    // stage near-single-threaded (measured 8.1 s vs 1.5 s at sf0.1).
    val v = e.select(col("vec_id").as("n_id"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
      .repartition(spark.sparkContext.defaultParallelism)
    val w = Window.partitionBy(col("p_id"))
      .orderBy(desc("rcos"), asc("n_id"))
    val topk = v.join(broadcast(p), col("p_id") =!= col("n_id"))
      .withColumn("rcos", round(
        dot(col("p_emb"), col("n_emb")) / (col("p_nrm") * col("n_nrm")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
    val occ = e.select(col("vec_id"))
      .join(topk.groupBy(col("n_id"))
          .agg(count(lit(1)).cast("long").as("k_occ")),
        col("vec_id") === col("n_id"), "left")
      .select(col("vec_id"), coalesce(col("k_occ"), lit(0L)).as("k_occ"))
    occ.groupBy(col("k_occ"))
      .agg(count(lit(1)).cast("long").as("n_vectors"))
      .orderBy(asc("k_occ"))
  }

  val q302Oracle: String =
    """WITH norms AS (
      |  SELECT vec_id, SQRT(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |flat AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
      |    UNNEST(embedding) AS val
      |  FROM embeddings),
      |dots AS (
      |  SELECT p.vec_id AS p_id, q.vec_id AS n_id,
      |    SUM(CAST(p.val AS DOUBLE) * CAST(q.val AS DOUBLE)) AS dot
      |  FROM flat p JOIN flat q ON p.pos = q.pos
      |  WHERE p.vec_id <> q.vec_id
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT p_id, n_id,
      |    ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY
      |      ROUND(dot / (np.nrm * nq.nrm), 6) DESC, n_id) AS rnk
      |  FROM dots
      |  JOIN norms np ON np.vec_id = p_id
      |  JOIN norms nq ON nq.vec_id = n_id),
      |occ AS (
      |  SELECT e.vec_id, COALESCE(t.k_occ, 0) AS k_occ
      |  FROM (SELECT vec_id FROM embeddings) e
      |  LEFT JOIN (
      |    SELECT n_id, CAST(COUNT(*) AS BIGINT) AS k_occ
      |    FROM ranked WHERE rnk <= 10 GROUP BY 1) t
      |    ON t.n_id = e.vec_id)
      |SELECT k_occ, CAST(COUNT(*) AS BIGINT) AS n_vectors
      |FROM occ GROUP BY 1
      |ORDER BY k_occ""".stripMargin

  /** Q321 — embedding anisotropy / effective-rank audit per label via
    * covariance TRACE IDENTITIES (participation ratio, Roy & Vetterli
    * 2007 / Gao et al.'s PR dimension): eff_rank = (tr C)² / ‖C‖²_F
    * where C is the per-label population covariance — computed WITHOUT
    * any eigendecomposition, from one pass of per-dimension moments
    * (tr) and one pass of upper-triangle cross-moments (Frobenius).
    * eff_rank = d for isotropic embeddings and collapses toward 1 as a
    * single direction dominates — the representation-collapse /
    * anisotropy screen (Ethayarajh 2019's cone effect) every embedding
    * pipeline should run before trusting cosine geometry (Q38/Q50's
    * consumers). Also reports the top-variance coordinate.
    *
    * Determinism: per-dimension and cross sums are double sums of
    * float32-exact values (engine order drift ~1e-15 relative, far
    * inside the 4-digit rounding — the Q137 rule); the top-variance
    * pick ranks on ROUND(var, 6) with dimension-index tiebreak so both
    * engines collapse identically (the Q302 discipline).
    *
    * Scale notes: no n×n object — both passes are map-side-combinable
    * aggregates onto labels·d and labels·d(d+1)/2 keys respectively
    * (d = 64 ⇒ 2 080 cells/label at ANY row count); the pairwise pass
    * explodes each row to its upper triangle locally, shuffling only
    * the bounded cell keys. Memory per task is O(d²).
    */
  def q321(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val flat = c.embeddings
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos0", "v")))
      .select(col("label"), col("vec_id"),
        (col("pos0") + 1).cast("long").as("pos"),
        col("v").cast("double").as("val"))
      .localCheckpoint()
    val mom = flat.groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("s1"),
        sum(col("val") * col("val")).as("s2"))
      .withColumn("varj", col("s2") / col("n") -
        (col("s1") / col("n")) * (col("s1") / col("n")))
      .localCheckpoint()
    val trc = mom.groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"), count(lit(1)).as("d"),
        sum(col("varj")).as("tr_sum"))
    val top = mom
      .withColumn("rk", row_number().over(Window.partitionBy(col("label"))
        .orderBy(round(col("varj"), 6).desc, col("pos").asc)))
      .filter(col("rk") === 1)
      .select(col("label"), col("pos").as("top_var_dim"),
        round(col("varj"), 6).as("top_var"))
    // Upper-triangle outer products stay INSIDE one row as a d(d+1)/2
    // double array summed element-wise by graft_vec_sum (r13): the
    // previous form exploded one struct row per cell per input row —
    // n·d²/2 rows through the hash aggregate, measured as Q321's single
    // 1.5 s job — where the vector aggregate ships one d(d+1)/2 vector
    // per (label, partition). Same partition-parallel double sums of
    // the identical products (the Q137 rounding rule covers merge-order
    // drift, exactly as it did for the hash aggregate), then the
    // canonical (j ≤ k) spine unfolds the summed vector back to cells.
    val crossP = c.embeddings
      .select(col("label"), expr(
        "flatten(transform(sequence(1, size(embedding)), j -> " +
          "transform(sequence(j, size(embedding)), k -> " +
          "CAST(element_at(embedding, j) AS DOUBLE) * " +
          "CAST(element_at(embedding, k) AS DOUBLE))))").as("pp"))
      .groupBy(col("label"))
      // count(pp), not count(*): a NULL embedding contributes no cells in
      // the oracle's self-join and is skipped by graft_vec_sum, so it
      // must not inflate n either (ADVICE r13 — unreachable for the
      // declared NOT-NULL embeddings, pinned for the general operator).
      .agg(count(col("pp")).as("n"), expr("graft_vec_sum(pp)").as("sums"),
        max(size(col("pp"))).as("ncells"))
      .withColumn("d", expr(
        "CAST((CAST(SQRT(8.0 * ncells + 1.0) AS BIGINT) - 1) DIV 2 AS INT)"))
      .select(col("label"), col("n"), explode(expr(
        """zip_with(
          |  flatten(transform(sequence(1, d), j ->
          |    transform(sequence(j, d), k ->
          |      struct(CAST(j AS BIGINT) AS j, CAST(k AS BIGINT) AS k)))),
          |  sums, (jk, s) -> struct(jk.j AS j, jk.k AS k, s AS sjk))"""
          .stripMargin)).as("t"))
      .select(col("label"), col("t.j").as("j"), col("t.k").as("k"),
        col("n"), col("t.sjk").as("sjk"))
    val fro = crossP
      .join(broadcast(mom.select(col("label"), col("pos").as("j"),
        col("s1").as("s1j"))), Seq("label", "j"))
      .join(broadcast(mom.select(col("label"), col("pos").as("k"),
        col("s1").as("s1k"))), Seq("label", "k"))
      .withColumn("cjk", col("sjk") / col("n") -
        (col("s1j") / col("n")) * (col("s1k") / col("n")))
      .withColumn("w", expr("CASE WHEN j = k THEN cjk * cjk " +
        "ELSE 2 * cjk * cjk END"))
      .groupBy(col("label")).agg(sum(col("w")).as("fro2"))
    trc.join(fro, Seq("label")).join(top, Seq("label"))
      .select(col("label"), col("n_vecs"), col("d"),
        round(col("tr_sum"), 4).as("tr_c"),
        round(col("fro2"), 4).as("fro_sq"),
        expr("ROUND(tr_sum * tr_sum / fro2, 4)").as("eff_rank"),
        col("top_var_dim"), col("top_var"))
      .withColumn("verdict", expr("CASE WHEN eff_rank >= d / 2.0 " +
        "THEN 'isotropic' ELSE 'anisotropic' END"))
      .orderBy(asc_nulls_first("label"))
  }

  val q321Oracle: String =
    """WITH flat AS (
      |  SELECT label, vec_id, CAST(pos AS BIGINT) AS pos,
      |    CAST(val AS DOUBLE) AS val FROM (
      |    SELECT label, vec_id, generate_subscripts(embedding, 1) AS pos,
      |      UNNEST(embedding) AS val
      |    FROM embeddings)),
      |mom AS (
      |  SELECT label, pos, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(val) AS s1, SUM(val * val) AS s2,
      |    SUM(val * val) / COUNT(*)
      |      - (SUM(val) / COUNT(*)) * (SUM(val) / COUNT(*)) AS varj
      |  FROM flat GROUP BY 1, 2),
      |trc AS (
      |  SELECT label, CAST(MAX(n) AS BIGINT) AS n_vecs,
      |    CAST(COUNT(*) AS BIGINT) AS d, SUM(varj) AS tr_sum
      |  FROM mom GROUP BY 1),
      |top AS (
      |  SELECT label, pos AS top_var_dim, ROUND(varj, 6) AS top_var
      |  FROM (
      |    SELECT label, pos, varj,
      |      ROW_NUMBER() OVER (PARTITION BY label
      |        ORDER BY ROUND(varj, 6) DESC, pos) AS rk
      |    FROM mom) r
      |  WHERE rk = 1),
      |crossp AS (
      |  SELECT x.label, x.pos AS j, y.pos AS k,
      |    CAST(COUNT(*) AS BIGINT) AS n, SUM(x.val * y.val) AS sjk
      |  FROM flat x JOIN flat y
      |    ON y.label = x.label AND y.vec_id = x.vec_id AND y.pos >= x.pos
      |  GROUP BY 1, 2, 3),
      |fro AS (
      |  SELECT label,
      |    SUM(CASE WHEN j = k THEN cjk * cjk ELSE 2 * cjk * cjk END)
      |      AS fro2
      |  FROM (
      |    SELECT q.label, q.j, q.k,
      |      q.sjk / q.n - (mj.s1 / q.n) * (mk.s1 / q.n) AS cjk
      |    FROM crossp q
      |    JOIN mom mj ON mj.label = q.label AND mj.pos = q.j
      |    JOIN mom mk ON mk.label = q.label AND mk.pos = q.k) w
      |  GROUP BY 1)
      |SELECT t.label, t.n_vecs, t.d, ROUND(t.tr_sum, 4) AS tr_c,
      |  ROUND(f.fro2, 4) AS fro_sq,
      |  ROUND(t.tr_sum * t.tr_sum / f.fro2, 4) AS eff_rank,
      |  p.top_var_dim, p.top_var,
      |  CASE WHEN ROUND(t.tr_sum * t.tr_sum / f.fro2, 4) >= t.d / 2.0
      |    THEN 'isotropic' ELSE 'anisotropic' END AS verdict
      |FROM trc t
      |JOIN fro f ON f.label = t.label
      |JOIN top p ON p.label = t.label
      |ORDER BY t.label NULLS FIRST""".stripMargin

  /** Q322 — two-NN intrinsic-dimensionality estimate per label (Facco,
    * d'Errico, Rodriguez & Laio 2017): for each vector the ratio
    * μ = r₂/r₁ of its two nearest-neighbor distances follows a Pareto
    * with shape = the intrinsic dimension, giving the MLE
    * ID = 2n / Σ ln(d²₂/d²₁). Says how many degrees of freedom the
    * data ACTUALLY occupies — eff_rank (Q321) reads the linear spread,
    * two-NN the manifold dimension, and the gap between them is the
    * nonlinearity of the embedding cloud.
    *
    * Determinism: coordinates quantize to Q248's exact 2²⁰ integer
    * grid FIRST, so every squared distance is an exact int64 fold —
    * ranks CANNOT flip cross-engine (the Q302 all-integer discipline;
    * the round-10 form ranked rounded doubles computed via different
    * algebra on each engine, a knife-edge this rewrite retires);
    * d²₂/d²₁ is one divide of exact ints (identical doubles both
    * engines) and the ln sum drifts only at libm's last ulp, inside
    * the 4-digit round. Vectors whose grid d²₁ = 0 (grid-exact
    * duplicates) are excluded and counted.
    *
    * Scale notes: exact within-label all-pairs is the DECLARED gate
    * (the Q38/Q302 framing — the fixture table is bounded); the
    * 100 TB path swaps the candidate generator for the SRP-LSH / IVF
    * structures in `Ann.scala` and keeps the same two-NN rollup. The
    * pair stage broadcasts the probe side and repartitions the stream
    * side (the Q302/Q248 parallelism lesson).
    */
  def q322(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val e = c.embeddings.select(col("label"), col("vec_id"), expr(
      "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))")
      .as("xi"))
    val p = e.select(col("label").as("l"), col("vec_id").as("p_id"),
      col("xi").as("p_xi"))
    val v = e.select(col("label"), col("vec_id").as("n_id"),
      col("xi").as("n_xi"))
      .repartition(spark.sparkContext.defaultParallelism)
    val w = Window.partitionBy(col("p_id"))
      .orderBy(asc("d2"), asc("n_id"))
    val nn2 = v.join(broadcast(p),
        col("l") === col("label") && col("p_id") =!= col("n_id"))
      .withColumn("d2", expr("aggregate(zip_with(p_xi, n_xi," +
        " (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .groupBy(col("label"), col("p_id"))
      .agg(min(when(col("rnk") === 1, col("d2"))).as("d1sq"),
        min(when(col("rnk") === 2, col("d2"))).as("d2sq"))
    nn2.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("d1sq") > 0, 1L).otherwise(0L)).as("n_used"),
        sum(when(col("d1sq") > 0, log(col("d2sq") / col("d1sq")))).as("lnsum"))
      .select(col("label"), col("n_vecs"), col("n_used"),
        expr("CASE WHEN lnsum IS NULL OR lnsum <= 0 THEN NULL ELSE " +
          "ROUND(2 * n_used / lnsum, 4) END").as("id_two_nn"))
      .withColumn("verdict", expr("CASE WHEN id_two_nn IS NULL " +
        "THEN 'degenerate' WHEN id_two_nn < 8 THEN 'clustered' " +
        "WHEN id_two_nn < 32 THEN 'moderate' ELSE 'ambient' END"))
      .orderBy(asc_nulls_first("label"))
  }

  val q322Oracle: String =
    """WITH v AS (
      |  SELECT label, vec_id, list_transform(embedding,
      |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
      |    AS xi
      |  FROM embeddings),
      |flat AS (
      |  SELECT label, vec_id, generate_subscripts(xi, 1) AS pos,
      |    UNNEST(xi) AS val
      |  FROM v),
      |dots AS (
      |  SELECT p.vec_id AS p_id, q.vec_id AS n_id,
      |    CAST(SUM((p.val - q.val) * (p.val - q.val)) AS BIGINT) AS d2
      |  FROM flat p JOIN flat q ON p.pos = q.pos AND p.label = q.label
      |  WHERE p.vec_id <> q.vec_id
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT p_id, d2,
      |    ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY d2, n_id) AS rnk
      |  FROM dots),
      |nn2 AS (
      |  SELECT e.label, r.p_id,
      |    MIN(CASE WHEN r.rnk = 1 THEN r.d2 END) AS d1sq,
      |    MIN(CASE WHEN r.rnk = 2 THEN r.d2 END) AS d2sq
      |  FROM ranked r JOIN embeddings e ON e.vec_id = r.p_id
      |  WHERE r.rnk <= 2
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |    CAST(SUM(CASE WHEN d1sq > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_used,
      |    SUM(CASE WHEN d1sq > 0 THEN LN(d2sq / d1sq) END) AS lnsum
      |  FROM nn2 GROUP BY 1)
      |SELECT label, n_vecs, n_used,
      |  CASE WHEN lnsum IS NULL OR lnsum <= 0 THEN NULL ELSE
      |    ROUND(2 * n_used / lnsum, 4) END AS id_two_nn,
      |  CASE WHEN (CASE WHEN lnsum IS NULL OR lnsum <= 0 THEN NULL ELSE
      |      ROUND(2 * n_used / lnsum, 4) END) IS NULL THEN 'degenerate'
      |    WHEN ROUND(2 * n_used / lnsum, 4) < 8 THEN 'clustered'
      |    WHEN ROUND(2 * n_used / lnsum, 4) < 32 THEN 'moderate'
      |    ELSE 'ambient' END AS verdict
      |FROM agg
      |ORDER BY label NULLS FIRST""".stripMargin

  /** Per-bucket neighbor-side cap for the ANN-backed twin gates
    * (Q346/Q347): within each (band, bucket) cell only the first
    * [[SrpCandCap]] members by md5 order serve as NEIGHBOR candidates
    * (probes are never dropped), so total candidate mass is bounded by
    * SrpBands · SrpCandCap · n — LINEAR in the corpus regardless of
    * bucket skew, the guarantee the uncapped Q198 join lacks on a
    * degenerate hot bucket. 512 > the whole sf0.01 corpus, so the cap
    * CANNOT activate at the oracle tier; it is still mirrored in the
    * oracle text so any tier compares like-for-like.
    */
  private[graft] val SrpCandCap = 512

  /** Shared SRP-LSH candidate generator for the ANN twin gates:
    * returns (p_id, n_id) DIRECTED candidate pairs — every pair
    * sharing ≥ 1 band bucket, neighbor side capped per bucket — plus
    * the integer-grid vector relation (vec_id, xi, nrm2) for exact
    * scoring. Mirrors Q198's machinery (same md5 planes, same derived
    * band width) with the directed/capped shape top-k search needs.
    */
  private def srpCandidates(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, Int) = {
    val c = Catalog(spark, dir)
    val rBits = srpBandBits(c.embeddings.count())
    val nPlanes = SrpBands * rBits
    val xi = c.embeddings.select(col("vec_id"), expr(
      "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))")
      .as("xi"))
    val projCols = (0 until nPlanes).map { k =>
      val signs = (0 until 64).map(d => srpSign(k, d)).mkString("array(", ", ", ")")
      expr(s"aggregate(zip_with(xi, $signs, (x, s) -> x * s), 0L, (a, v) -> a + v)")
        .as(s"p$k")
    }
    val withBands = xi.select(col("vec_id") +: col("xi") +: projCols: _*)
      .withColumns((0 until SrpBands).map(b => s"band$b" -> (0 until rBits).map(j =>
        when(col(s"p${rBits * b + j}") >= 0L, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)).toMap)
      .withColumn("nrm2", expr("aggregate(transform(xi, x -> x * x), 0L, (a, v) -> a + v)"))
      .localCheckpoint()
    val buckets = (0 until SrpBands).map(b =>
        withBands.select(col("vec_id"), lit(b).as("band"), col(s"band$b").as("bv")))
      .reduce(_ union _)
    val capped = buckets
      .withColumn("h", md5(concat(lit("cap:"), col("vec_id").cast("string"))))
      .withColumn("hv", expr(NearDup.hexValueFastExpr("h")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("band"), col("bv"))
          .orderBy(asc("hv"), asc("vec_id"))))
      .filter(col("rk") <= SrpCandCap)
      .select(col("vec_id"), col("band"), col("bv"))
    // Per-probe dedup via bounded array unions (r13): the pair-granular
    // form joined every (probe, bucket-mate) row and pushed ~n·bands·
    // bucket rows through a DISTINCT exchange (the single heaviest job
    // of both twin gates). The capped cells are ≤ SrpCandCap members
    // each, so grouping members per cell and union-ing each probe's
    // ≤ SrpBands cells inside one array_distinct keeps the shuffle at
    // 8n bounded-array rows instead of Σ bucket² pairs — the SAME
    // candidate set (union over shared cells, self excluded), just
    // deduplicated per probe instead of per pair.
    val cells = capped.groupBy(col("band"), col("bv"))
      .agg(collect_list(col("vec_id")).as("members"))
    val cand = buckets.join(cells, Seq("band", "bv"))
      .groupBy(col("vec_id").as("p_id"))
      .agg(flatten(collect_list(col("members"))).as("all_members"))
      .select(col("p_id"),
        explode(array_distinct(col("all_members"))).as("n_id"))
      .filter(col("n_id") =!= col("p_id"))
    (cand, withBands.select(col("vec_id"), col("xi"), col("nrm2")), rBits)
  }

  /** Q346 — SRP-LSH-candidate hubness: the ANN-backed twin of Q302's
    * exact k-occurrence histogram (the Q334-vs-Q145 sampled-twin
    * discipline applied to vectors — r12 measured Q302's honest
    * all-pairs filling the disk at 200k vectors, 4·10¹⁰ dots). Top-10
    * lists are ranked EXACTLY — integer-grid cosine, round 6, id
    * tiebreak — but only over each probe's LSH candidates (any shared
    * band bucket, Q198's derived-width md5 planes, neighbor side
    * capped per bucket), so the dot count is candidate-bounded:
    * ≤ 8 · 512 · n by construction, never n². The occurrence rollup
    * and zero-occurrence spine are Q302's verbatim.
    *
    * Semantics, stated: a true top-10 neighbor missed by every band
    * (SRP recall curve) is replaced by the 11th-nearest candidate, so
    * the histogram is the hubness of the ANN GRAPH — which is exactly
    * the graph downstream consumers (Q38 shortlists, kNN labelers)
    * actually traverse at scale. VectorOpsSpec pins the twin against
    * exact Q302 at the fixture tier (near-total candidate recall).
    *
    * Determinism: candidates are md5-derived (planes, cap order) and
    * the score is one divide of exact int64 folds rounded at 6 with
    * id tiebreak — the Q302 discipline on a candidate subset.
    */
  def q346(spark: SparkSession, dir: String): DataFrame = {
    val (cand, vecs, rBits) = srpCandidates(spark, dir)
    // Same built-size fence as Q198's verify: below ~1 GB the vector
    // sides broadcast so the candidate mass never shuffles for scoring.
    val hintIfSmall: DataFrame => DataFrame =
      if (rBits <= 12) broadcast(_) else identity
    val s1 = hintIfSmall(vecs.select(col("vec_id").as("p_id"),
      col("xi").as("p_xi"), col("nrm2").as("p_n2")))
    val s2 = hintIfSmall(vecs.select(col("vec_id").as("n_id"),
      col("xi").as("n_xi"), col("nrm2").as("n_n2")))
    val topk = cand.join(s1, Seq("p_id")).join(s2, Seq("n_id"))
      .withColumn("dp", expr(
        "aggregate(zip_with(p_xi, n_xi, (a, b) -> a * b), 0L, (a, v) -> a + v)"))
      .withColumn("rcos", round(col("dp").cast("double") /
        (sqrt(col("p_n2").cast("double")) * sqrt(col("n_n2").cast("double"))), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("p_id")).orderBy(desc("rcos"), asc("n_id"))))
      .filter(col("rnk") <= 10)
    vecs.select(col("vec_id"))
      .join(topk.groupBy(col("n_id"))
          .agg(count(lit(1)).cast("long").as("k_occ")),
        col("vec_id") === col("n_id"), "left")
      .select(col("vec_id"), coalesce(col("k_occ"), lit(0L)).as("k_occ"))
      .groupBy(col("k_occ"))
      .agg(count(lit(1)).cast("long").as("n_vectors"))
      .orderBy(asc("k_occ"))
  }

  private def srpCandSql: String = {
    val hexv = NearDup.hexValueExpr(
      "md5('srp:' || CAST(k.k AS VARCHAR) || ':' || CAST(d.d AS VARCHAR))")
    val capv = NearDup.hexValueExpr("md5('cap:' || CAST(vec_id AS VARCHAR))")
    s"""rb AS (
       |  SELECT GREATEST(3, (
       |    SELECT MIN(t.r) FROM range(1, 41) t(r)
       |    WHERE (CAST(1 AS BIGINT) << t.r) * 256 >=
       |      (SELECT COUNT(*) FROM embeddings))) AS r),
       |v AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
       |    AS xi
       |  FROM embeddings),
       |flat AS (
       |  SELECT vec_id, generate_subscripts(xi, 1) - 1 AS d, UNNEST(xi) AS x
       |  FROM v),
       |planes AS (
       |  SELECT k.k, d.d,
       |    CASE WHEN ($hexv) % 2 = 0 THEN 1 ELSE -1 END AS s
       |  FROM range(320) k(k) CROSS JOIN range(64) d(d), rb
       |  WHERE k.k < 8 * rb.r),
       |proj AS (
       |  SELECT f.vec_id, p.k, SUM(f.x * p.s) AS pr
       |  FROM flat f JOIN planes p ON p.d = f.d GROUP BY 1, 2),
       |bands AS (
       |  SELECT vec_id, k // rb.r AS band,
       |    SUM(CASE WHEN pr >= 0 THEN 1 << (k % rb.r) ELSE 0 END) AS bv
       |  FROM proj, rb GROUP BY 1, 2),
       |capped AS (
       |  SELECT vec_id, band, bv FROM (
       |    SELECT vec_id, band, bv, ROW_NUMBER() OVER (
       |      PARTITION BY band, bv ORDER BY ($capv), vec_id) AS rk
       |    FROM bands)
       |  WHERE rk <= 512),
       |cand AS (
       |  SELECT DISTINCT b1.vec_id AS p_id, b2.vec_id AS n_id
       |  FROM bands b1 JOIN capped b2
       |    ON b1.band = b2.band AND b1.bv = b2.bv
       |    AND b1.vec_id <> b2.vec_id)""".stripMargin
  }

  val q346Oracle: String =
    s"""WITH $srpCandSql,
       |norms AS (
       |  SELECT vec_id, SUM(x * x) AS nn FROM flat GROUP BY 1),
       |dots AS (
       |  SELECT c.p_id, c.n_id, SUM(f1.x * f2.x) AS dp
       |  FROM cand c
       |  JOIN flat f1 ON f1.vec_id = c.p_id
       |  JOIN flat f2 ON f2.vec_id = c.n_id AND f2.d = f1.d
       |  GROUP BY 1, 2),
       |topk AS (
       |  SELECT n_id FROM (
       |    SELECT d.n_id, ROW_NUMBER() OVER (PARTITION BY d.p_id ORDER BY
       |      ROUND(CAST(d.dp AS DOUBLE)
       |        / (SQRT(CAST(n1.nn AS DOUBLE)) * SQRT(CAST(n2.nn AS DOUBLE))),
       |        6) DESC, d.n_id) AS rnk
       |    FROM dots d
       |    JOIN norms n1 ON n1.vec_id = d.p_id
       |    JOIN norms n2 ON n2.vec_id = d.n_id)
       |  WHERE rnk <= 10),
       |occ AS (
       |  SELECT e.vec_id, COALESCE(t.k_occ, 0) AS k_occ
       |  FROM (SELECT vec_id FROM embeddings) e
       |  LEFT JOIN (
       |    SELECT n_id, CAST(COUNT(*) AS BIGINT) AS k_occ
       |    FROM topk GROUP BY 1) t
       |    ON t.n_id = e.vec_id)
       |SELECT k_occ, CAST(COUNT(*) AS BIGINT) AS n_vectors
       |FROM occ GROUP BY 1
       |ORDER BY k_occ""".stripMargin

  /** Q347 — ANN two-NN intrinsic dimension: the candidate-bounded twin
    * of Q322 (whose exact within-label all-pairs was cut after 40 min
    * of healthy quadratic compute at sf10 — SCALE.md r12). Two nearest
    * SAME-LABEL candidates per probe by exact integer-grid distance,
    * then the Facco two-NN MLE rollup verbatim. Probes with fewer than
    * two same-label candidates (LSH misses) are excluded and COUNTED —
    * n_vecs is label size, n_cand how many probes had a usable pair,
    * so the miss rate is visible in the output, never silent.
    *
    * Determinism: md5-derived candidates, exact int64 distances with
    * id tiebreak, one divide + libm ln inside a 4-digit round — the
    * Q322 discipline on a candidate subset. VectorOpsSpec pins the
    * twin's id_two_nn against exact Q322 per label at the fixture tier.
    */
  def q347(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val (cand, vecs, rBits) = srpCandidates(spark, dir)
    val hintIfSmall: DataFrame => DataFrame =
      if (rBits <= 12) broadcast(_) else identity
    val labels = hintIfSmall(c.embeddings.select(col("vec_id"), col("label")))
    val s1 = hintIfSmall(vecs.select(col("vec_id").as("p_id"), col("xi").as("p_xi")))
    val s2 = hintIfSmall(vecs.select(col("vec_id").as("n_id"), col("xi").as("n_xi")))
    val nn2 = cand
      .join(labels.select(col("vec_id").as("p_id"), col("label")), Seq("p_id"))
      .join(labels.select(col("vec_id").as("n_id"), col("label").as("nl")),
        Seq("n_id"))
      .filter(col("nl") === col("label"))
      .join(s1, Seq("p_id")).join(s2, Seq("n_id"))
      .withColumn("d2", expr("aggregate(zip_with(p_xi, n_xi," +
        " (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("p_id")).orderBy(asc("d2"), asc("n_id"))))
      .filter(col("rnk") <= 2)
      .groupBy(col("label"), col("p_id"))
      .agg(min(when(col("rnk") === 1, col("d2"))).as("d1sq"),
        min(when(col("rnk") === 2, col("d2"))).as("d2sq"))
    c.embeddings.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"))
      .join(nn2
          .filter(col("d2sq").isNotNull)
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_cand"),
            sum(when(col("d1sq") > 0, 1L).otherwise(0L)).as("n_used"),
            sum(when(col("d1sq") > 0, log(col("d2sq") / col("d1sq"))))
              .as("lnsum")),
        Seq("label"), "left")
      .select(col("label"), col("n_vecs"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_used"), lit(0L)).as("n_used"),
        expr("CASE WHEN lnsum IS NULL OR lnsum <= 0 THEN NULL ELSE " +
          "ROUND(2 * n_used / lnsum, 4) END").as("id_two_nn"))
      .withColumn("verdict", expr("CASE WHEN id_two_nn IS NULL " +
        "THEN 'degenerate' WHEN id_two_nn < 8 THEN 'clustered' " +
        "WHEN id_two_nn < 32 THEN 'moderate' ELSE 'ambient' END"))
      .orderBy(asc_nulls_first("label"))
  }

  val q347Oracle: String =
    s"""WITH $srpCandSql,
       |lab AS (SELECT vec_id, label FROM embeddings),
       |samelab AS (
       |  SELECT c.p_id, c.n_id, lp.label
       |  FROM cand c
       |  JOIN lab lp ON lp.vec_id = c.p_id
       |  JOIN lab ln ON ln.vec_id = c.n_id AND ln.label = lp.label),
       |dists AS (
       |  SELECT s.p_id, s.n_id, s.label,
       |    CAST(SUM((f1.x - f2.x) * (f1.x - f2.x)) AS BIGINT) AS d2
       |  FROM samelab s
       |  JOIN flat f1 ON f1.vec_id = s.p_id
       |  JOIN flat f2 ON f2.vec_id = s.n_id AND f2.d = f1.d
       |  GROUP BY 1, 2, 3),
       |ranked AS (
       |  SELECT label, p_id, d2,
       |    ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY d2, n_id) AS rnk
       |  FROM dists),
       |nn2 AS (
       |  SELECT label, p_id,
       |    MIN(CASE WHEN rnk = 1 THEN d2 END) AS d1sq,
       |    MIN(CASE WHEN rnk = 2 THEN d2 END) AS d2sq
       |  FROM ranked WHERE rnk <= 2 GROUP BY 1, 2),
       |agg AS (
       |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_cand,
       |    CAST(SUM(CASE WHEN d1sq > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_used,
       |    SUM(CASE WHEN d1sq > 0 THEN LN(d2sq / d1sq) END) AS lnsum
       |  FROM nn2 WHERE d2sq IS NOT NULL GROUP BY 1),
       |base AS (
       |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
       |  FROM embeddings GROUP BY 1)
       |SELECT b.label, b.n_vecs,
       |  COALESCE(a.n_cand, 0) AS n_cand, COALESCE(a.n_used, 0) AS n_used,
       |  CASE WHEN a.lnsum IS NULL OR a.lnsum <= 0 THEN NULL ELSE
       |    ROUND(2 * a.n_used / a.lnsum, 4) END AS id_two_nn,
       |  CASE WHEN (CASE WHEN a.lnsum IS NULL OR a.lnsum <= 0 THEN NULL
       |      ELSE ROUND(2 * a.n_used / a.lnsum, 4) END) IS NULL
       |      THEN 'degenerate'
       |    WHEN ROUND(2 * a.n_used / a.lnsum, 4) < 8 THEN 'clustered'
       |    WHEN ROUND(2 * a.n_used / a.lnsum, 4) < 32 THEN 'moderate'
       |    ELSE 'ambient' END AS verdict
       |FROM base b LEFT JOIN agg a ON a.label = b.label
       |ORDER BY b.label NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q302" -> (q302 _), "Q321" -> (q321 _), "Q322" -> (q322 _),
    "Q346" -> (q346 _), "Q347" -> (q347 _),
    "Q38" -> (q38 _), "Q39" -> (q39 _), "Q50" -> (q50 _), "Q171" -> (q171 _),
    "Q173" -> (q173 _), "Q185" -> (q185 _), "Q198" -> (q198 _),
    "Q200" -> (q200 _), "Q248" -> (q248 _), "Q262" -> (q262 _),
    "Q270" -> (q270 _))

  def oracles: Map[String, String] = Map(
    "Q302" -> q302Oracle, "Q321" -> q321Oracle, "Q322" -> q322Oracle,
    "Q346" -> q346Oracle, "Q347" -> q347Oracle,
    "Q38" -> q38Oracle, "Q39" -> q39Oracle, "Q50" -> q50Oracle,
    "Q171" -> q171Oracle, "Q173" -> q173Oracle, "Q185" -> q185Oracle,
    "Q198" -> q198Oracle, "Q200" -> q200Oracle, "Q248" -> q248Oracle,
    "Q262" -> q262Oracle, "Q270" -> q270Oracle)
}
