package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{EventTime, Graphs, NearDup, Stats, TextAnalysis, TextOps}

/** Model pins for the round-8 session-2 family: the end-to-end MinHash-LSH
  * dedup pipeline (Q160), Spearman rank correlation (Q161), degree
  * assortativity (Q162), Kruskal–Wallis (Q163), syllable complexity
  * (Q164), inter-arrival gaps (Q165), the cross-source duplication matrix
  * (Q166), and bigram conditional entropy (Q167), plus the session-3 audit
  * gates: 13-gram duplication rate (Q172), leave-one-out 1-NN label
  * accuracy (Q173), and the decile gains table (Q174). Cross-engine hashes
  * are the DuckDB gates; these pin the MODELS on handcrafted data with
  * local references, plus pipeline-consistency properties at sf0.001.
  */
class CorpusStatsSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** Minimal lineitem mini-catalog: enough schema for Q161/Q162. */
  private def writeLineitem(dir: String,
      rows: Seq[(Long, Int, Long, Double, Double, Double, Double)]): Unit = {
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_partkey", LongType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map {
        case (ok, ln, pk, q, e, d, t) => Row(ok, ln, pk, q, e, d, t)
      }, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  /** Local midrank helper: value -> doubled midrank (2·cum + c + 1). */
  private def midrank2(xs: Seq[Double]): Map[Double, Long] = {
    val sorted = xs.sorted
    val byVal = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    byVal.map { case (v, c) =>
      v -> (2L * sorted.count(_ < v) + c + 1)
    }
  }

  private def localSpearman(a: Seq[Double], b: Seq[Double]): Double = {
    val (ra, rb) = (midrank2(a), midrank2(b))
    val x = a.map(ra(_).toDouble); val y = b.map(rb(_).toDouble)
    val n = x.size
    val (sx, sy) = (x.sum, y.sum)
    val sxx = x.map(v => v * v).sum; val syy = y.map(v => v * v).sum
    val sxy = x.zip(y).map { case (u, v) => u * v }.sum
    (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
  }

  test("Q160 LSH pipeline: every pair exact-verified, subset of the exact engine, high recall") {
    val got = NearDup.q160(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.forall(_._3 >= 0.6))
    val c = Catalog(spark, sf("sf0.001"))
    val exact = TextOps.jaccardFromTokens(spark, NearDup.shingles(c), 0.6)
      .collect().map(r => (r.getAs[Long]("doc_lo"), r.getAs[Long]("doc_hi")))
      .toSet
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    assert(gotPairs.subsetOf(exact),
      s"LSH emitted non-exact pairs: ${gotPairs.diff(exact)}")
    assert(exact.nonEmpty)
    // k=8/b=4 banding at the seeded-dup similarity level (J >= 0.9) has
    // candidate probability ~1-(1-J^2)^4 > 0.999; recall well above half.
    assert(gotPairs.size >= exact.size / 2,
      s"recall ${gotPairs.size}/${exact.size}")
  }

  test("Q161 Spearman: +1 / -1 on monotone columns, midrank reference under ties") {
    val dir = tmpDir("spearman-spec")
    val q = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)
    val tax = Seq(1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0)
    writeLineitem(dir, q.indices.map { i =>
      (i.toLong, i, i.toLong, q(i), q(i) * 10 + 1, -q(i), tax(i))
    })
    val got = Stats.q161(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got(("l_quantity", "l_extendedprice")) === 1.0)
    assert(got(("l_quantity", "l_discount")) === -1.0)
    val ref = localSpearman(q, tax)
    assert(math.abs(got(("l_quantity", "l_tax")) - ref) < 1e-3)
  }

  test("Q162 assortativity is -1 on a support-pruned star") {
    val dir = tmpDir("assort-spec")
    // parts {1,2},{1,3},{1,4} each co-ordered twice -> star around 1;
    // a noise pair {5,6} seen once is support-pruned away.
    val orders = Seq(
      Seq(1L, 2L), Seq(1L, 2L), Seq(1L, 3L), Seq(1L, 3L),
      Seq(1L, 4L), Seq(1L, 4L), Seq(5L, 6L))
    writeLineitem(dir, orders.zipWithIndex.flatMap { case (parts, oi) =>
      parts.zipWithIndex.map { case (pk, li) =>
        (oi.toLong, li, pk, 1.0, 1.0, 0.0, 0.0)
      }
    })
    val r = Graphs.q162(spark, dir).collect().head
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Double]("assortativity") === -1.0)
  }

  test("Q163 Kruskal-Wallis matches a local midrank reference with ties") {
    val groups = Map(
      "alpha" -> Seq(1.0, 2.0, 3.0),
      "beta" -> Seq(2.0, 3.0, 4.0, 4.0),
      "gamma" -> Seq(10.0, 11.0))
    val rows = groups.toSeq.flatMap { case (t, vs) => vs.map(t -> _) }
    val pooled = rows.map(_._2)
    val r2 = midrank2(pooled)
    val n = pooled.size
    val sr = groups.values.map { vs =>
      val rsum = vs.map(r2(_).toDouble / 2).sum
      rsum * rsum / vs.size
    }.sum
    val h = 12.0 * sr / (n * (n + 1.0)) - 3 * (n + 1)
    val tie3 = pooled.groupBy(identity).values
      .map(g => { val c = g.size.toDouble; c * c * c - c }).sum
    val hc = h / (1.0 - tie3 / (n.toDouble * n * n - n))

    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val dir = tmpDir("kw-spec")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (t, v) => Row(t, v) }, 2),
      schema)
      .selectExpr("monotonically_increasing_id() AS event_id",
        "timestamp '2024-01-01 00:00:00' AS ts",
        "CAST(0 AS BIGINT) AS user_id", "event_type", "value",
        "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Stats.q163(spark, dir).collect().head
    assert(got.getAs[Long]("n") === n.toLong)
    assert(got.getAs[Long]("k") === 3L)
    assert(got.getAs[Long]("dof") === 2L)
    assert(math.abs(got.getAs[Double]("h") - h) < 1e-3)
    assert(math.abs(got.getAs[Double]("h_tie_corrected") - hc) < 1e-3)
  }

  test("Q164 syllable model: vowel groups, floor at 1, >=3 is complex") {
    import spark.implicits._
    val docs = Seq(("s", "hello rhythm bcd beautiful a")).toDF("source", "text")
    val r = TextAnalysis.syllableProfile(docs).collect().head
    assert(r.getAs[Long]("n_words") === 5L)
    // hello=2, rhythm=1 (y), bcd=0->1 floored, beautiful=3 (eau,i,u), a=1
    assert(r.getAs[Long]("n_syllables") === 8L)
    assert(r.getAs[Long]("n_complex") === 1L)
    assert(r.getAs[Double]("syllables_per_word") === 1.6)
    assert(r.getAs[Double]("complex_word_frac") === 0.2)
    assert(r.getAs[Double]("avg_word_len") === 4.8)
  }

  test("Q165 inter-arrival gaps: handcrafted percentiles and mean") {
    import spark.implicits._
    val e = Seq(("a", 0L, 1L), ("a", 10L, 2L), ("a", 30L, 3L),
      ("a", 100L, 4L)).toDF("event_type", "us", "event_id")
    val r = EventTime.interArrival(e).collect().head
    assert(r.getAs[Long]("n_gaps") === 3L)
    assert(r.getAs[Long]("min_us") === 10L)
    assert(r.getAs[Long]("max_us") === 70L)
    // gaps sorted [10, 20, 70]: p50 = 20; p90 = 20 + 0.8*(70-20) = 60;
    // p99 = 20 + 0.98*50 = 69; mean = 100/3
    assert(r.getAs[Double]("p50_us") === 20.0)
    assert(r.getAs[Double]("p90_us") === 60.0)
    assert(r.getAs[Double]("p99_us") === 69.0)
    assert(r.getAs[Double]("mean_us") === 33.3333)
  }

  test("Q166 matrix totals equal the exact verified pair count at sf0.001") {
    val c = Catalog(spark, sf("sf0.001"))
    val exactPairs = TextOps
      .jaccardFromTokens(spark, NearDup.shingles(c), 0.6).count()
    val cells = NearDup.q166(spark, sf("sf0.001")).collect()
    assert(cells.map(_.getAs[Long]("n_pairs")).sum === exactPairs)
    assert(cells.forall(r =>
      r.getAs[String]("src_lo") <= r.getAs[String]("src_hi")))
  }

  test("Q168 modularity of two clean LPA triangles is 0.5") {
    val dir = tmpDir("modularity-spec")
    // two disjoint triangles, every edge co-ordered twice (support prune
    // keeps all six); LPA(3) converges to the min label per triangle.
    val triEdges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
    writeLineitem(dir, triEdges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(2 * i, 2 * i + 1).flatMap { oi =>
        Seq((oi.toLong, 0, a, 1.0, 1.0, 0.0, 0.0),
          (oi.toLong, 1, b, 1.0, 1.0, 0.0, 0.0))
      }
    })
    val r = Graphs.q168(spark, dir).collect().head
    assert(r.getAs[Long]("n_communities") === 2L)
    assert(r.getAs[Long]("n_edges") === 6L)
    // per community: intra2/2m - (dtot/2m)^2 = 6/12 - (6/12)^2 = 0.25
    assert(r.getAs[Double]("modularity") === 0.5)
  }

  test("Q169 session distribution on handcrafted sessions") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("us", LongType)))
    val dir = tmpDir("sessdist-spec")
    // user 1: 0s, 10s, 2000s -> sessions [0,10] and [2000]; user 2: one
    val rows = Seq((1L, 1L, 0L), (2L, 1L, 10000000L), (3L, 1L, 2000000000L),
      (4L, 2L, 0L))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map {
        case (e, u, us) => Row(e, u, us)
      }, 2), schema)
      .selectExpr("event_id", "timestamp_micros(us) AS ts", "user_id",
        "'view' AS event_type", "1.0 AS value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventTime.q169(spark, dir).collect().head
    assert(r.getAs[Long]("n_sessions") === 3L)
    assert(r.getAs[Long]("n_bounce") === 2L)
    // events/session sorted [1,1,2]: p50 = 1, p90 = 1 + 0.8*(2-1) = 1.8
    assert(r.getAs[Double]("p50_events") === 1.0)
    assert(r.getAs[Double]("p90_events") === 1.8)
    assert(r.getAs[Long]("max_events") === 2L)
    // durations sorted [0, 0, 10^7]: p50 = 0, p90 = 0.8*10^7
    assert(r.getAs[Double]("p50_dur_us") === 0.0)
    assert(r.getAs[Double]("p90_dur_us") === 8000000.0)
    assert(r.getAs[Long]("max_dur_us") === 10000000L)
  }

  test("Q170 vocab concentration: hapax and head mass on handcrafted text") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    val dir = tmpDir("vocab-spec")
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(0L, "s", "a a a b c")), 1), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.q170(spark, dir).collect().head
    assert(r.getAs[Long]("n_tokens") === 5L)
    assert(r.getAs[Long]("vocab_size") === 3L)
    assert(r.getAs[Long]("n_hapax") === 2L)
    assert(r.getAs[Double]("hapax_frac") === 0.6667)
    assert(r.getAs[Double]("top10_mass_frac") === 1.0)
  }

  test("Q171 cluster geometry: identical vectors cohere, opposed vectors cancel") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val dir = tmpDir("geom-spec")
    val rows = Seq(
      Row(0L, Seq(1.0f, 0.0f), 0), Row(1L, Seq(1.0f, 0.0f), 0),
      Row(2L, Seq(1.0f, 0.0f), 1), Row(3L, Seq(-1.0f, 0.0f), 1))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.VectorOps.q171(spark, dir).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("centroid_norm"),
          r.getAs[Double]("dispersion"))).toMap
    assert(got(0) === ((2L, 1.0, 0.0)))
    assert(got(1) === ((2L, 0.0, 1.0)))
  }

  test("degenerate inputs: constant measure / regular graph / all-tied values go NULL, not NaN") {
    // Q161: l_tax constant -> zero rank variance -> spearman_r NULL
    val dir1 = tmpDir("degen-spearman")
    writeLineitem(dir1, (0 until 4).map { i =>
      (i.toLong, i, i.toLong, i + 1.0, (i + 1.0) * 10, -(i + 1.0), 7.0)
    })
    val s = Stats.q161(spark, dir1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(s(("l_quantity", "l_tax")).isNullAt(3))
    assert(s(("l_quantity", "l_extendedprice")).getDouble(3) === 1.0)

    // Q162: one support-pruned edge -> both degrees 1 -> NULL
    val dir2 = tmpDir("degen-assort")
    writeLineitem(dir2, Seq(
      (0L, 0, 1L, 1.0, 1.0, 0.0, 0.0), (0L, 1, 2L, 1.0, 1.0, 0.0, 0.0),
      (1L, 0, 1L, 1.0, 1.0, 0.0, 0.0), (1L, 1, 2L, 1.0, 1.0, 0.0, 0.0)))
    val g = Graphs.q162(spark, dir2).collect().head
    assert(g.getAs[Long]("n_edges") === 1L)
    assert(g.isNullAt(g.fieldIndex("assortativity")))

    // Q163: every value identical -> tie correction denominator 0 -> NULL
    val dir3 = tmpDir("degen-kw")
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("value", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row("a", 5.0), Row("a", 5.0), Row("b", 5.0)), 2), schema)
      .selectExpr("monotonically_increasing_id() AS event_id",
        "timestamp '2024-01-01 00:00:00' AS ts",
        "CAST(0 AS BIGINT) AS user_id", "event_type", "value",
        "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir3/events.parquet")
    val k = Stats.q163(spark, dir3).collect().head
    assert(k.isNullAt(k.fieldIndex("h_tie_corrected")))
  }

  test("Q167 bigram entropy: deterministic sequence = 0 bits, fair branch = 2/3 bit") {
    import spark.implicits._
    val docs = Seq(("det", "a b a b a b a"), ("mix", "x a x b"))
      .toDF("source", "text")
    val got = TextAnalysis.bigramCondEntropy(docs).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("distinct_bigrams"),
          r.getAs[Double]("cond_entropy_bits"))).toMap
    // det: (a,b)x3, (b,a)x3 — every prefix has one successor
    assert(got("det") === ((6L, 2L, 0.0)))
    // mix: (x,a), (a,x), (x,b) — prefix x branches 50/50 on 2/3 of mass
    val (nb, db, hb) = got("mix")
    assert(nb === 3L && db === 3L)
    assert(math.abs(hb - 2.0 / 3.0) < 1e-3)
  }

  test("Q172 duplication audit: a shared 13-gram is flagged in both docs, clean docs are clean") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    val dir = tmpDir("dup13-spec")
    val shared = (1 to 13).map(i => s"w$i").mkString(" ")
    val clean = (1 to 14).map(i => s"z$i").mkString(" ")
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, "a", s"$shared x"),   // grams: shared, (w2..x)
        Row(1L, "a", s"$shared y"),   // grams: shared, (w2..y)
        Row(2L, "b", clean)), 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = NearDup.q172(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams"),
          r.getAs[Double]("dup_frac"), r.getAs[Long]("n_docs_with_dup"))).toMap
    assert(got("a") === ((4L, 2L, 0.5, 2L)))
    assert(got("b") === ((2L, 0L, 0.0, 0L)))
  }

  test("Q173 1-NN accuracy is 1.0 on a cleanly clustered space") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val dir = tmpDir("knn-spec")
    val rows = Seq(
      Row(0L, Seq(1.0f, 0.0f), 0), Row(1L, Seq(0.9f, 0.1f), 0),
      Row(2L, Seq(0.0f, 1.0f), 1), Row(3L, Seq(0.1f, 0.9f), 1))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.VectorOps.q173(spark, dir).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_probe"), r.getAs[Double]("accuracy"))).toMap
    assert(got(0) === ((2L, 1.0)))
    assert(got(1) === ((2L, 1.0)))
  }

  test("Q174 gains table: ten one-customer deciles reproduce exact revenue shares") {
    val schema = StructType(Seq(
      StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType)))
    val dir = tmpDir("gains-spec")
    // customer k (1..10) has revenue 11-k; total = 55
    val rows = (1 to 10).map(k => Row(k.toLong, (11 - k) * 1.0))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Profiling.q174(spark, dir).collect()
      .map(r => r.getAs[Int]("decile") ->
        (r.getAs[Long]("n_customers"), r.getAs[Long]("revenue_cents"),
          r.getAs[Double]("revenue_share"), r.getAs[Double]("cum_share"))).toMap
    assert(got(1) === ((1L, 1000L, 0.1818, 0.1818)))
    assert(got(10) === ((1L, 100L, 0.0182, 1.0)))
    assert((1 to 10).map(got(_)._2).sum === 5500L)
  }

  test("Q185 silhouette: two well-separated 1-D pairs score by hand") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val dir = tmpDir("silhouette-spec")
    // label 0 at {0, 2} (centroid 1), label 1 at {10, 12} (centroid 11):
    // every a = 1; b = 11, 9 / 9, 11; s-mean = (10/11 + 8/9)/2 = 0.899
    val rows = Seq(
      Row(0L, Seq(0.0f, 0.0f), 0), Row(1L, Seq(2.0f, 0.0f), 0),
      Row(2L, Seq(10.0f, 0.0f), 1), Row(3L, Seq(12.0f, 0.0f), 1))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.VectorOps.q185(spark, dir).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("mean_a"),
          r.getAs[Double]("mean_b"), r.getAs[Double]("silhouette"))).toMap
    assert(got(0) === ((2L, 1.0, 10.0, 0.899)))
    assert(got(1) === ((2L, 1.0, 10.0, 0.899)))
  }

  test("Q190 frequency spectrum: exact N_r classes and the 11+ pooled tail") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    val dir = tmpDir("freqspec-spec")
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, "s", "a a a b b c"),                   // a:3 b:2 c:1
        Row(1L, "big", ("t " * 12) + "u")), 2), schema) // t:12 -> tail, u:1
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.q190(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("type_share"), r.getAs[Double]("token_mass"))).toMap
    assert(got(("s", 1L)) === ((1L, 1L, 0.333333, 0.166667)))
    assert(got(("s", 2L)) === ((1L, 2L, 0.333333, 0.333333)))
    assert(got(("s", 3L)) === ((1L, 3L, 0.333333, 0.5)))
    assert(got(("big", 1L)) === ((1L, 1L, 0.5, 0.076923)))
    assert(got(("big", 11L)) === ((1L, 12L, 0.5, 0.923077))) // r=12 pools to 11+
    assert(got.size === 5)
  }

  test("Q191 burstiness: concentrated term scores cf/df, spread term scores 1, sub-support dropped") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    val dir = tmpDir("burst-spec")
    // "a": 6x in one doc (burst 6); "b": once in each of 5 docs
    // (burst 1); "c": cf 4 < 5 support, dropped.
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, "s", "a a a a a a b"),
        Row(1L, "s", "b c"), Row(2L, "s", "b c"),
        Row(3L, "s", "b c"), Row(4L, "s", "b c")), 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.operators.TextAnalysis.q191(spark, dir).collect().head
    assert(r.getString(0) === "s")
    assert(r.getAs[Long]("n_terms") === 2L)
    assert(r.getAs[Double]("mean_burst") === 3.5) // (6 + 1) / 2
    assert(r.getAs[Double]("bursty_share") === 0.5)
    assert(r.getAs[String]("top_bursty") === "a,b")
  }
}
