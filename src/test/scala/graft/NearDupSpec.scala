package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Near-dup scale-path properties (SURVEY.md §5.3): the corpus' seeded
  * `+" dup"` near-duplicates must be caught by the exact Jaccard form, and
  * MinHash-LSH banding must recall ≥ 0.9 of them as candidates.
  */
class NearDupSpec extends SparkSpec {

  /** The seeded near-dup pairs: doc2.text == doc1.text + " dup". */
  private def seededPairs(dir: String) = {
    val d = Catalog(spark, dir).documents
    val d1 = d.select(col("doc_id").as("a"), col("text").as("t1"))
    val d2 = d.select(col("doc_id").as("b"), col("text").as("t2"))
    d1.join(d2, col("t2") === concat(col("t1"), lit(" dup")))
      .select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("seeded near-duplicates exist and are caught by exact Jaccard (Q35)") {
    val seeded = seededPairs(sf("sf0.001"))
    assert(seeded.size >= 20, s"expected ~24 seeded pairs, got ${seeded.size}")
    val q35 = TextOps.q35(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = seeded -- q35
    assert(missed.isEmpty, s"exact Jaccard missed seeded pairs: $missed")
  }

  test("MinHash-LSH banding recalls >= 0.9 of seeded near-dups as candidates") {
    val dir = sf("sf0.001")
    val seeded = seededPairs(dir)
    val tok = Catalog(spark, dir).documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
    val sigs = NearDup.minHashSignatures(tok, k = 8)
    val candidates = NearDup.lshCandidates(sigs, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (seeded & candidates).size.toDouble / seeded.size
    assert(recall >= 0.9, s"LSH recall $recall (${(seeded & candidates).size}/${seeded.size})")
  }

  test("LSH-discovered pair relation equals the exact build at fixture scale") {
    // The artifact-build fallback path (r11 verdict item 1): force
    // TextOps.jaccardLsh on the SAME shingle relation Derived.nearDupPairs
    // consumes and require SET EQUALITY with the exact adaptive build —
    // pairs AND jaccard values. Deterministic (md5-seeded permutations),
    // so this is a fact about the chosen (k=32, b=16) parameters on this
    // corpus, not a flaky recall draw; the fixture pairs all sit at
    // J ≥ 0.8 where the per-pair band-miss probability is ≤ 9e-8.
    // sf0.1 included deliberately (the r11 verdict's "assert at sf ≤ 0.1"):
    // the bench tier has the corpus' only J < 0.9 pairs, the ones nearest
    // the banding knife edge — ~40 s of the suite buys the pin where it
    // actually bites.
    for (tier <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = sf(tier)
      val shingleTok = NearDup.shingles(Catalog(spark, dir)).cache()
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exact = pairSet(
        TextOps.jaccardFromTokens(spark, shingleTok, 0.6))
      val j = col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter"))
      val lsh = pairSet(
        TextOps.jaccardLsh(shingleTok, 0.6)
          .filter(j >= 0.6)
          .select(col("d1"), col("d2"), round(j, 4).as("jaccard")))
      assert(exact.nonEmpty, s"$tier: expected verified pairs on the seeded corpus")
      assert(lsh == exact,
        s"$tier: LSH-built != exact-built; missed=${exact -- lsh}, extra=${lsh -- exact}")
      shingleTok.unpersist()
    }
  }

  test("prefix-filtered Jaccard plan returns exactly the direct plan's pairs") {
    val dir = sf("sf0.001")
    val tok = Catalog(spark, dir).documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
      .cache()
    def pairsOf(plan: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] = {
      val j = col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter"))
      plan.filter(j >= 0.6)
        .select(col("d1"), col("d2"), col("inter"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val dfreq = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val direct = pairsOf(TextOps.jaccardDirect(tok, 0.6))
    val prefixed = pairsOf(TextOps.jaccardPrefix(tok, dfreq, 0.6))
    assert(direct.nonEmpty, "expected some pairs at J >= 0.6 on the seeded corpus")
    assert(prefixed == direct,
      s"plans disagree: onlyDirect=${direct -- prefixed} onlyPrefix=${prefixed -- direct}")
    tok.unpersist()
    ()
  }

  test("incrementalDedup flags seeded dups of the corpus with high recall, no false claims") {
    val dir = sf("sf0.001")
    val seeded = seededPairs(dir)
    val d = Catalog(spark, dir).documents
    // Split: the appended `... dup` docs are the "increment", rest is corpus.
    val isDup = col("text").endsWith(" dup")
    def toks(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token")).distinct()
    val found = NearDup.incrementalDedup(
        toks(d.filter(isDup)), toks(d.filter(!isDup)), threshold = 0.8)
      .collect()
    // The asymmetric join only sees increment×corpus pairs, so recall is
    // measured over the seeded pairs that CROSS the split (a dup whose
    // original itself ends in " dup" lives inside the increment and is
    // out of scope for this API by construction).
    val dupIds = d.filter(isDup).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val crossSeeded = seeded.filter { case (a, b) => dupIds(a) ^ dupIds(b) }
    val foundPairs = found.map(r =>
      (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(crossSeeded.nonEmpty)
    val recall = (crossSeeded & foundPairs).size.toDouble / crossSeeded.size
    assert(recall >= 0.9, s"incremental dedup recall $recall")
    found.foreach(r => assert(r.getDouble(2) >= 0.8, s"below threshold: $r"))
  }

  test("connectedComponents equals local union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 30
      val edges = (1 to 40).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      // Local union-find oracle.
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt)); if (ra != rb) parent(ra) = rb
      }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val expected = nodes.map { v =>
        val comp = nodes.filter(u => find(u.toInt) == find(v.toInt))
        (comp.min, v)
      }.toSet
      import spark.implicits._
      val got = NearDup.connectedComponents(edges.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"mismatch: onlySpark=${got -- expected} onlyLocal=${expected -- got}")
    }
  }

  test("large-star/small-star CC equals min-label propagation on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { _ =>
      val n = 40
      val edges = (1 to 50).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val df = edges.toDF("src", "dst")
      val viaLabels = NearDup.connectedComponents(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val (starLabels, _) = NearDup.connectedComponentsStars(df)
      val viaStars = starLabels
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaStars == viaLabels,
        s"mismatch: onlyStars=${viaStars -- viaLabels} onlyLabels=${viaLabels -- viaStars}")
    }
  }

  test("star CC and min-label agree on Q67's own near-dup pair set") {
    val c = Catalog(spark, sf("sf0.001"))
    val pairs = TextOps.jaccardFromTokens(spark, NearDup.shingles(c), 0.6)
      .select(col("doc_lo"), col("doc_hi"))
    val (labelDf, minLabelRounds) = NearDup.connectedComponentsMinLabel(pairs)
    val viaLabels = labelDf
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (starLabels, starRounds) = NearDup.connectedComponentsStars(pairs)
    val viaStars = starLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStars == viaLabels,
      s"mismatch: onlyStars=${viaStars -- viaLabels} onlyLabels=${viaLabels -- viaStars}")
    // The verdict-r3 observable: the gated (star) path must need no more
    // rounds than the O(diameter) min-label form on the real pair set.
    assert(viaStars.nonEmpty && starRounds >= 1 && starRounds <= minLabelRounds,
      s"star=$starRounds rounds vs min-label=$minLabelRounds")
    info(s"Q67 pair set: star CC $starRounds rounds, min-label $minLabelRounds rounds")
  }

  test("adaptive CC: driver union-find path and forced stars fallback emit identical labels") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { _ =>
      val n = 50
      val edges = (1 to 70).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val df = edges.toDF("src", "dst")
      val viaDriver = NearDup.connectedComponentsAdaptive(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // budget 0 forces the distributed star-contraction branch
      val viaStars = NearDup.connectedComponentsAdaptive(df, budget = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaMinLabel = NearDup.connectedComponents(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaDriver == viaStars,
        s"mismatch: onlyDriver=${viaDriver -- viaStars} onlyStars=${viaStars -- viaDriver}")
      assert(viaDriver == viaMinLabel,
        s"mismatch vs min-label: ${viaDriver -- viaMinLabel} / ${viaMinLabel -- viaDriver}")
    }
  }

  test("star CC converges in O(log n) rounds on a chain (worst case for min-label)") {
    import spark.implicits._
    // A 64-node path graph: diameter 63, so min-label needs ~63 rounds;
    // the star alternation must stay logarithmic.
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = NearDup.connectedComponentsStars(chain)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L until 64L).map(v => (0L, v)).toSet, s"wrong labels: $got")
    assert(rounds <= 16, s"chain took $rounds rounds — not O(log n)")
  }

  test("SimHash: seeded near-dup pairs have small hamming distance") {
    val dir = sf("sf0.001")
    val seeded = seededPairs(dir)
    val sig = NearDup.q48(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Only pairs fully inside the doc_id <= 100 probe window are checkable.
    val checkable = seeded.filter { case (a, b) => sig.contains(a) && sig.contains(b) }
    assert(checkable.nonEmpty, "no seeded pair inside the probe window")
    checkable.foreach { case (a, b) =>
      val ham = java.lang.Long.bitCount(sig(a) ^ sig(b))
      assert(ham <= 8, s"pair ($a,$b) hamming $ham too far for near-dups")
    }
  }

  test("Q126 edit-distance fuzzy match: matches a local DP reference and " +
    "respects the brand blocking") {
    // Planted typo cluster in brand B1 (exact dup, insert, substitute,
    // double-substitute, far outlier) plus an identical name in brand B2
    // that must NOT pair across the block boundary.
    val parts = Seq(
      (1L, "B1", "widget"), (2L, "B1", "widget"), (3L, "B1", "widgets"),
      (4L, "B1", "midget"), (5L, "B1", "gadget"), (6L, "B1", "zzzzzzzz"),
      (7L, "B2", "widget"), (8L, "B2", "widgef"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q126").toString
    spark.createDataFrame(parts).toDF("p_partkey", "p_brand", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      (ka, ba, na) <- parts; (kb, bb, nb) <- parts
      if ba == bb && ka < kb && lev(na, nb) <= 2
    } yield (ba, lev(na, nb), ka))
      .groupBy { case (b, d, _) => (b, d) }
      .map { case ((b, d), g) =>
        (b, d.toLong) -> (g.size.toLong, g.map(_._3).distinct.size.toLong) }
    assert(expected.exists { case ((b, _), _) => b == "B2" },
      "fixture must exercise a second block")
    assert(lev("widget", "widgets") == 1 && lev("widgets", "midget") == 2,
      "reference DP sanity")

    val got = graft.operators.NearDup.q126(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected,
      s"engine fuzzy-match disagrees with DP reference: $got vs $expected")
  }

  test("Q187 cluster-size profile: singleton, pair and triple counted with exact shares") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("clprof-spec").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, "s", "a b c d"), Row(1L, "s", "a b c d"),   // pair
        Row(2L, "s", "x y z w"),                            // singleton
        Row(3L, "s", "p q r s"), Row(4L, "s", "p q r s"),
        Row(5L, "s", "p q r s")), 2), schema)               // triple
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.NearDup.q187(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"),
          r.getAs[Double]("doc_share"))).toMap
    assert(got(1L) === ((1L, 1L, 0.166667)))
    assert(got(2L) === ((1L, 2L, 0.333333)))
    assert(got(3L) === ((1L, 3L, 0.5)))
    assert(got.size === 3)
  }

  test("Q189 containment: quote-inclusion pair invisible to Jaccard is caught; partial overlap is not") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("contain-spec").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, "s", "a b c d e"),                 // 3 shingles
        Row(1L, "s", "a b c d e f g h i j"),       // 8 shingles, contains doc0
        Row(2L, "s", "z1 z2 z3 z4"),               // clean
        Row(3L, "s", "a b c x1 x2")), 2), schema)  // shares only "a b c"
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.NearDup.q189(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("inter"), r.getAs[Long]("min_sz"),
          r.getAs[Double]("containment"))).toMap
    // (0,1): inter 3, min 3 -> containment 1.0; its Jaccard is
    // 3/(3+8-3) = 0.375 — below every symmetric gate's 0.6 bar.
    assert(got((0L, 1L)) === ((3L, 3L, 1.0)))
    // (0,3)/(1,3): inter 1, min 3 -> 0.333 < 0.8, excluded
    assert(got.size === 1)
  }
}
