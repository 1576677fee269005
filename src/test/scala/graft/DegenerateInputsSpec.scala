package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Density, Graphs, Skyline}

/** Degenerate-input behavior of the library APIs: empty and single-row
  * inputs must return empty/trivial results (or fail loudly with a
  * message), never throw obscure runtime errors — the contract a library
  * caller relies on when an upstream filter happens to drain a relation.
  */
class DegenerateInputsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.plans.GraftExtensions.registerRuntime(spark)
  }

  private def emptyLL(cols: (String, DataType)*) =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(cols.map { case (n, t) => StructField(n, t) }))

  test("skyline of an empty relation is empty; single point is its own frontier") {
    val empty = emptyLL("p_partkey" -> LongType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)
    assert(Skyline.skyline(empty).count() == 0)
    val one = spark.createDataFrame(Seq((1L, 5, 10.0)))
      .toDF("p_partkey", "p_size", "p_retailprice")
    val res = Skyline.skyline(one).collect()
    assert(res.length == 1 && res(0).getLong(0) == 1L)
  }

  test("triangleCorners and pageRank on an empty edge list are empty") {
    val empty = emptyLL("a" -> LongType, "b" -> LongType)
    assert(Graphs.triangleCorners(empty).count() == 0)
    assert(Graphs.pageRank(empty, 3).count() == 0)
  }

  test("bfsHops and kCore on an empty edge list are empty; single edge behaves") {
    val empty = emptyLL("a" -> LongType, "b" -> LongType)
    assert(Graphs.bfsHops(empty, 6).count() == 0)
    assert(Graphs.kCore(empty, 3, 12).count() == 0)
    val one = spark.createDataFrame(Seq((1L, 2L))).toDF("a", "b")
    val hops = Graphs.bfsHops(one, 6).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hops == Map(1L -> 0, 2L -> 1))
    // a single edge gives both endpoints degree 1 < 2: the 2-core is empty
    assert(Graphs.kCore(one, 2, 12).count() == 0)
  }

  test("pageRank on a single edge converges to the symmetric fixpoint") {
    val one = spark.createDataFrame(Seq((1L, 2L))).toDF("a", "b")
    val pr = Graphs.pageRank(one, 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.keySet == Set(1L, 2L))
    // two symmetric nodes: r = 0.15 + 0.85·r has fixpoint 1.0
    pr.values.foreach(v => assert(math.abs(v - 1.0) < 1e-9, pr.toString))
  }

  test("dbscan2d labels an isolated point as noise and an empty input as empty") {
    val one = spark.createDataFrame(Seq((7L, 0.0, 0.0))).toDF("id", "x", "y")
    val res = Density.dbscan2d(one, eps = 1.0, minPts = 2).collect()
    assert(res.length == 1)
    assert(res(0).getLong(1) == -1L && res(0).getString(2) == "noise")
    val empty = emptyLL("id" -> LongType, "x" -> DoubleType, "y" -> DoubleType)
    assert(Density.dbscan2d(empty, eps = 1.0, minPts = 2).count() == 0)
  }

  test("Tucker on an empty tensor fails loudly, not with a bare reduce error") {
    val empty = emptyLL("i" -> IntegerType, "j" -> IntegerType,
      "k" -> IntegerType, "v" -> DoubleType)
    val e = intercept[IllegalArgumentException] {
      graft.tensor.Tucker.hosvd(empty, (2, 2, 2))
    }
    assert(e.getMessage.contains("empty"))
  }

  test("kmeans with k larger than the corpus degrades to one cluster per vector") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("emb", ArrayType(FloatType))))
    val tiny = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, Seq(1f, 0f)), Row(1L, Seq(0f, 1f))), 2), schema)
    val (model, assigned) = graft.operators.Clustering.kmeans(tiny, k = 5, iters = 1)
    assert(model.keySet == Set(0L, 1L))
    assert(assigned.count() == 2)
  }

  test("kmeans fails loudly on empty input and on zero-norm embeddings") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("emb", ArrayType(FloatType))))
    val empty = emptyLL("id" -> LongType, "emb" -> ArrayType(FloatType))
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Clustering.kmeans(empty, k = 2, iters = 1)
    }
    assert(e1.getMessage.contains("non-empty"))
    val withZero = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, Seq(1f, 0f)), Row(1L, Seq(0f, 0f))), 2), schema)
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Clustering.kmeans(withZero, k = 2, iters = 1)
    }
    assert(e2.getMessage.contains("zero-norm"))
  }

  test("pqFit seeds from the smallest ids PRESENT (non-dense id space) and guards tiny corpora") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    // ids start at 1000 — the old seeds(id < ksub) lookup would throw
    val rng = new scala.util.Random(7)
    val rows = (0 until 40).map { i =>
      Row(1000L + i, Seq.fill(8)(rng.nextFloat()))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val model = graft.operators.Ann.pqFit(df, "embedding", m = 4, ksub = 8, iters = 2)
    assert(model.codebooks.length == 4 && model.codebooks(0).length == 8)
    val tiny = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.take(3), 1), schema)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Ann.pqFit(tiny, "embedding", m = 4, ksub = 8, iters = 1)
    }
    assert(e.getMessage.contains("ksub"))
  }

  test("round-8 gates (Q181-Q186) drain cleanly on empty source tables") {
    val dir = java.nio.file.Files.createTempDirectory("degen-r8").toString
    emptyLL("event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    emptyLL("doc_id" -> LongType, "source" -> StringType,
      "text" -> StringType)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    emptyLL("vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    assert(graft.operators.TextAnalysis.q181(spark, dir).count() == 0)
    assert(graft.operators.EventTime.q182(spark, dir).count() == 0)
    assert(graft.operators.EventTime.q183(spark, dir).count() == 0)
    assert(graft.operators.EventTime.q186(spark, dir).count() == 0)
    assert(graft.operators.VectorOps.q185(spark, dir).count() == 0)
    // global aggregate: one row, k=0, every statistic NULL
    val a = graft.operators.Stats.q184(spark, dir).collect()
    assert(a.length == 1 && a(0).getAs[Long]("k") == 0L)
    assert(a(0).isNullAt(a(0).fieldIndex("f")))
    assert(a(0).isNullAt(a(0).fieldIndex("eta2")))
  }

  test("round-9 experiment gates degrade to NULL, never NaN, on a single-day zero-conversion corpus") {
    // The degenerate drop the Q228/Q231/Q232 guards exist for: every
    // event on ONE calendar day (cut == dmin -> all pre-period sums are
    // zero -> the CUPED covariate has zero variance) and no view ->
    // purchase conversion anywhere. Both engines' guard predicates are
    // the same text, so proving the Spark side yields NULL (not NaN)
    // proves the hash gate cannot diverge NULL-vs-NaN here.
    val dir = java.nio.file.Files.createTempDirectory("degen-r9exp").toString
    val day0ns = 19723L * 86400L * 1000000000L
    // users 1..6 split 3/3 across the md5 arms (parities checked offline)
    val rows = (1L to 6L).map(u =>
      (u * 10, day0ns + u * 1000000000L, u, "view", u * 1.5, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // Q228: zero-variance covariate -> theta guarded NULL in every arm,
    // and everything theta feeds (mean_cuped, var_cuped, var_reduction)
    // propagates NULL instead of NaN
    val cuped = graft.operators.Stats.q228(spark, dir).collect()
    assert(cuped.length == 2, "both arms populated by construction")
    cuped.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("theta")), "theta must be guarded NULL")
      assert(r.isNullAt(r.fieldIndex("mean_cuped")))
      assert(r.isNullAt(r.fieldIndex("var_cuped")))
      assert(r.isNullAt(r.fieldIndex("var_reduction")))
      assert(!r.getAs[Double]("mean_post").isNaN)
    }

    // Q231: zero conversions -> p_hat = 0 exactly; the absolute MDE is a
    // true 0, the RELATIVE one is guarded NULL (0/0 otherwise)
    val h = graft.operators.Stats.q231(spark, dir).collect()(0)
    assert(h.getAs[Double]("conv_rate") == 0.0)
    assert(h.getAs[Double]("mde_abs") == 0.0)
    assert(h.isNullAt(h.fieldIndex("mde_rel")), "mde_rel must be guarded NULL")
    assert(!h.getAs[Double]("mde_value").isNaN)
    assert(h.getAs[String]("srm_verdict") == "pass")

    // Q232 still estimates: deltas equal the post sums, variances are
    // real, and t/df are finite or NULL -- never NaN
    val did = graft.operators.Stats.q232(spark, dir).collect()(0)
    Seq("t_stat", "df", "did").foreach { c =>
      val i = did.fieldIndex(c)
      assert(did.isNullAt(i) || !did.getDouble(i).isNaN, s"$c is NaN")
    }

    // Q227 on a 1-day spine: n0 = 0 and var18 = 0 -> tau_b and z guarded
    // NULL, trend 'none'; Q229 has no type pair on a single-type corpus
    val mk = graft.operators.Stats.q227(spark, dir).collect()
    assert(mk.length == 1 && mk(0).getAs[Long]("n_days") == 1L)
    assert(mk(0).isNullAt(mk(0).fieldIndex("tau_b")))
    assert(mk(0).isNullAt(mk(0).fieldIndex("z")))
    assert(mk(0).getAs[String]("trend") == "none")
    assert(graft.operators.Stats.q229(spark, dir).count() == 0)
  }

  test("Q271 degrades over-cap demand magnitudes to an 'overflow_guard' row, never a wrapped forecast") {
    // The exactness envelope (z <= 2^24-1 cents/day for the 40-term
    // alpha=1/2 EWMA numerator) is enforced, not just documented: a user
    // whose demand exceeds the cap must surface as demand_class =
    // 'overflow_guard' with NULL s_num/p_num/forecasts, while normal
    // users on the same corpus keep real forecasts.
    val dir = java.nio.file.Files.createTempDirectory("degen-croston").toString
    val day = 86400L * 1000000000L
    val day0 = 19723L * day
    val rows = Seq(
      // user 1: two modest demands -> real forecast
      (10L, day0, 1L, "purchase", 100.0, "{}"),
      (11L, day0 + 2 * day, 1L, "purchase", 200.0, "{}"),
      // user 2: one demand at 10^9 cents/day (over the 2^24-1 cap)
      (20L, day0, 2L, "purchase", 1.0e7, "{}"),
      (21L, day0 + 3 * day, 2L, "purchase", 50.0, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.Behavior.q271(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    val ok = out(1L)
    assert(ok.getAs[String]("demand_class") != "overflow_guard")
    assert(!ok.isNullAt(ok.fieldIndex("croston_cents")))
    // z1=10000, z2=20000, ke: 1,2 -> s_num = 10000 + 20000 = 30000;
    // p_num = interval 2 -> croston = 30000 / (2*2) = 7500
    assert(ok.getAs[Double]("croston_cents") == 7500.0)
    val over = out(2L)
    assert(over.getAs[String]("demand_class") == "overflow_guard")
    for (c <- Seq("s_num", "p_num", "croston_cents", "sba_cents"))
      assert(over.isNullAt(over.fieldIndex(c)), s"$c must be NULL under the guard")
    // the safe columns stay populated
    assert(over.getAs[Long]("n_demands") == 2L)
    assert(over.getAs[Double]("mean_interval") == 3.0)
  }

  test("Q264 direction-sequence lengths stay within the oracle's recursive-CTE practical depth") {
    // The Q264 oracle enumerates (l, q) up to MAX(n) per parse step, so
    // its cost grows ~ n^2 per phrase: the gate contract assumes the
    // per-type direction sequence (spine days - 1) stays small. Guard
    // that assumption on the LARGEST driver tier so a future testdata
    // regen with a multi-decade spine fails here, loudly, instead of
    // hanging the DuckDB compare.
    val c = Catalog(spark, sf("sf0.1"))
    val span = c.events
      .select(expr("(ts DIV 1000) DIV 86400000000").as("day"))
      .agg(expr("max(day) - min(day)").as("span")).collect()(0).getLong(0)
    assert(span + 1 <= 2048,
      s"event-day spine ${span + 1} exceeds the Q264 recursive-CTE depth " +
        "contract (2048); re-declare the oracle's enumeration bound or " +
        "cap the sequence before shipping this data scale")
  }
}
