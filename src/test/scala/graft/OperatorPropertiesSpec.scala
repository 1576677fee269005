package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Property / tolerance tests (SURVEY.md §5.3–§5.4): HLL tolerance (C05),
  * seeded sampling (C08), dedup idempotence, semi∪anti partition, UNION ALL
  * additivity, window-vs-join equivalence.
  */
class OperatorPropertiesSpec extends SparkSpec {

  test("C05: approx_count_distinct within 5% of exact per event type") {
    val c = Catalog(spark, sf("sf0.01"))
    val exact = Aggregates.q14(spark, sf("sf0.01"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = c.events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.05, s"$k: exact=$n approx=$a")
    }
  }

  test("C15: approx_percentile within 1% rank error of the exact percentiles") {
    // The mergeable-quantile capability (GK summaries under the hood):
    // bounded state per group at any scale, vs Q54's exact rank-and-pick.
    // Rank error, not value error — the correct metric for quantile
    // sketches (value error is unbounded on skewed data).
    val c = Catalog(spark, sf("sf0.01"))
    val eps = 0.01
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    val approx = c.lineitem
      .agg(percentile_approx(col("l_extendedprice"),
        array(qs.map(lit(_)): _*), lit((1 / eps).toInt)).as("p"))
      .collect()(0).getSeq[Double](0)
    val sorted = c.lineitem.select(col("l_extendedprice"))
      .collect().map(_.getDouble(0)).sorted
    val n = sorted.length
    qs.zip(approx).foreach { case (q, v) =>
      // rank of the returned value must be within eps·n of q·n
      val rank = sorted.count(_ <= v).toDouble / n
      assert(math.abs(rank - q) <= eps + 1.0 / n, s"q=$q v=$v rank=$rank")
    }
  }

  test("sketch-boundary RFM buckets are near-equal-sized (Q104's declared scale path)") {
    val c = Catalog(spark, sf("sf0.01"))
    val seg = EventTime.rfmSegmentsScalable(c).cache()
    try {
      val n = seg.count().toDouble
      Seq("r_score", "f_score", "m_score").foreach { dim =>
        val sizes = seg.groupBy(col(dim)).count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        assert(sizes.keySet.subsetOf((1 to 5).toSet), s"$dim: ${sizes.keySet}")
        // each quintile within a loose band of n/5 (sketch rank error +
        // tie mass; freq especially is heavily tied at small counts)
        sizes.foreach { case (b, s) =>
          assert(s <= n * 0.45, s"$dim bucket $b grossly oversized: $s of $n")
        }
        assert(sizes.values.sum.toDouble == n)
      }
    } finally { seg.unpersist(); () }
  }

  test("C08: seeded sample is deterministic, a subset, and binomially sized") {
    val c = Catalog(spark, sf("sf0.01"))
    val li = c.lineitem.select("l_orderkey", "l_linenumber")
    val s1 = li.sample(withReplacement = false, 0.1, seed = 42)
    val s2 = li.sample(withReplacement = false, 0.1, seed = 42)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty, "not deterministic")
    assert(s1.exceptAll(li).isEmpty, "not a subset")
    val n = li.count(); val k = s1.count()
    val mean = 0.1 * n; val sd = math.sqrt(n * 0.1 * 0.9)
    assert(math.abs(k - mean) <= 6 * sd, s"sample size $k vs mean $mean (n=$n)")
  }

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val c = Catalog(spark, sf("sf0.001"))
    // Materialized via cache: exceptAll directly over dropDuplicates trips
    // a Catalyst rewrite bug (ATTRIBUTE_NOT_FOUND) in Spark 4.1.2.
    val once = TextOps.dedupExact(c.documents, Seq("text")).cache()
    val twice = TextOps.dedupExact(once, Seq("text"))
    assert(once.count() == twice.count())
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
  }

  test("semi and anti join partition the left table") {
    val c = Catalog(spark, sf("sf0.01"))
    val urgent = c.orders.filter(col("o_orderpriority") === "1-URGENT")
    val semi = c.customer.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
    val anti = c.customer.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
    assert(semi.count() + anti.count() == c.customer.count())
    assert(semi.select("c_custkey").intersect(anti.select("c_custkey")).count() == 0)
  }

  test("UNION ALL is count-additive; UNION distinct bounded by key domain") {
    val c = Catalog(spark, sf("sf0.01"))
    val a = c.customer.select(col("c_nationkey").as("k"))
    val b = c.supplier.select(col("s_nationkey").as("k"))
    assert(a.unionAll(b).count() == a.count() + b.count())
    assert(a.unionAll(b).distinct().count() <= 25)
  }

  test("Q35 Jaccard: J(x,x)=1 and symmetry via canonical (lo,hi) ordering") {
    val pairs = TextOps.q35(spark, sf("sf0.001")).collect()
    assert(pairs.nonEmpty, "seeded near-duplicates should produce pairs")
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), s"pair not canonical: $r")
      val j = r.getDouble(2)
      assert(j >= 0.8 && j <= 1.0, s"J out of range: $r")
    }
  }

  test("shuffle-native exact percentile equals the buffering builtin") {
    val c = Catalog(spark, sf("sf0.01"))
    val scalable = Aggregates
      .exactPercentilesScalable(c.orders, "o_orderstatus", "o_totalprice", Seq(0.5, 0.9))
      .orderBy("o_orderstatus").collect()
    val builtin = c.orders.groupBy(col("o_orderstatus")).agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))
      .orderBy("o_orderstatus").collect()
    assert(scalable.length == builtin.length)
    scalable.zip(builtin).foreach { case (s, b) =>
      assert(s.getString(0) == b.getString(0))
      Seq(1, 2).foreach { i =>
        assert(math.abs(s.getDouble(i) - b.getDouble(i)) <= 1e-9 * math.abs(b.getDouble(i)),
          s"${s.getString(0)} col$i: ${s.getDouble(i)} vs ${b.getDouble(i)}")
      }
    }
  }

  test("approx_percentile tracks Q54's exact percentiles within 2%") {
    val c = Catalog(spark, sf("sf0.01"))
    val both = c.orders.groupBy(col("o_orderstatus")).agg(
      expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50"),
      expr("percentile(o_totalprice, 0.9)").as("exact_p90"),
      expr("approx_percentile(o_totalprice, 0.9, 1000)").as("approx_p90"))
    both.collect().foreach { r =>
      Seq((r.getDouble(1), r.getDouble(2)), (r.getDouble(3), r.getDouble(4))).foreach {
        case (exact, approx) =>
          assert(math.abs(approx - exact) / exact <= 0.02,
            s"approx $approx vs exact $exact for ${r.getString(0)}")
      }
    }
  }

  test("Q96 repetitionSignals matches a naive in-memory model on seeded docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(96)
    val vocab = Vector("the", "cat", "sat", "on", "mat", "a", "b", "c")
    // Mix of repetition-prone random docs and hand-picked edge cases:
    // empty text, whitespace runs, single token, pathological repeats.
    val random = (1L to 60L).map { id =>
      val n = rnd.nextInt(30)
      val base = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      val doc = if (rnd.nextBoolean() && n >= 4) {
        val phrase = base.take(3)
        base ++ phrase ++ phrase ++ phrase // inject a repeated phrase
      } else base
      (id, doc.mkString(" "))
    }
    val edges = Seq(
      (101L, ""), (102L, "   "), (103L, "one"), (104L, "a a a a a"),
      (105L, "x  y   z x  y"), (106L, "p q p q p q p q"))
    val docs = (random ++ edges).toDF("doc_id", "text")

    def model(text: String): (Long, Double, Double, String) = {
      def r4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val n = toks.length.toLong
      val bg = if (n >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq else Nil
      val tg = if (n >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq else Nil
      val topBg = if (bg.isEmpty) 0L
        else bg.groupBy(identity).values.map(_.size).max.toLong
      val dupTri = tg.groupBy(identity).values
        .collect { case g if g.size >= 2 => g.size.toLong }.sum
      val bgFrac = if (n > 0) r4(topBg * 2.0 / n) else 0.0
      val triFrac = if (tg.nonEmpty) r4(dupTri.toDouble / tg.size) else 0.0
      val verdict = if (bgFrac > 0.2 || triFrac > 0.3) "reject" else "keep"
      (n, bgFrac, triFrac, verdict)
    }

    val got = TextAnalysis.repetitionSignals(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getString(4)))).toMap
    val texts = (random ++ edges).toMap
    assert(got.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      assert(got(id) == model(text), s"doc $id '" + text + s"': got ${got(id)} want ${model(text)}")
    }
  }

  test("Q100 trailingEwma matches a naive in-memory model on random series") {
    import spark.implicits._
    val rnd = new scala.util.Random(100)
    val rows = for {
      user <- 1L to 8L
      i <- 0 until rnd.nextInt(50) + 1
    } yield (user, user * 1000 + i, i.toLong * 7, rnd.nextDouble() * 100 - 20)
    val df = rows.toDF("user_id", "event_id", "us", "value")
    val got = EventTime.trailingEwma(df, window = 20)
      .select("user_id", "event_id", "ewma")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // In-memory model: same dyadic weights, same array order, same fold.
    val byUser = rows.groupBy(_._1).view.mapValues(_.sortBy(r => (r._3, r._2)))
    byUser.foreach { case (_, evs) =>
      evs.zipWithIndex.foreach { case ((u, eid, _, _), idx) =>
        val win = evs.slice(math.max(0, idx - 19), idx + 1).map(_._4)
        val n = win.length
        val num = win.zipWithIndex.map { case (v, i) => v / (1L << (n - 1 - i)) }.sum
        val den = win.indices.map(i => 1.0 / (1L << (n - 1 - i))).sum
        val want = num / den
        assert(math.abs(got((u, eid)) - want) < 1e-9,
          s"user $u event $eid: got ${got((u, eid))} want $want")
      }
    }
  }

  test("Q101 ppsSamplePerGroup matches an in-memory md5-priority model") {
    import spark.implicits._
    val rnd = new scala.util.Random(101)
    val rows = (1L to 300L).map(id => (id, s"g${id % 4}", rnd.nextInt(5000) + 50))
    val docs = rows.toDF("doc_id", "grp", "w")
    val got = PipelineOps.ppsSamplePerGroup(docs, "grp", "doc_id", "w", 7, "pin:")
      .select("grp", "rk", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

    // Model: identical md5-derived uniform (first 8 hex digits as a
    // 32-bit unsigned over 2^32), identical priority, identical tiebreak.
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pin:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) / 4294967296.0
    }
    val expected = rows.groupBy(_._2).flatMap { case (g, rs) =>
      rs.map { case (id, _, w) => (id, u(id) / w) }
        .sortBy { case (id, p) => (p, id) }
        .take(7).zipWithIndex
        .map { case ((id, _), i) => (g, i + 1, id) }
    }.toSet
    assert(got == expected,
      s"onlySpark=${got -- expected} onlyModel=${expected -- got}")
  }

  test("Q19 lag equals self-join formulation") {
    val c = Catalog(spark, sf("sf0.001"))
    val e = c.events.select(col("user_id"), col("event_id"),
      expr("ts DIV 1000").as("us"))
    // Self-join: for each event, the max us among strictly-earlier events
    // of the same user equals lag(us).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(asc("us"), asc("event_id"))
    val viaLag = e.withColumn("prev", lag(col("us"), 1).over(w))
      .filter(col("prev").isNotNull)
      .agg(sum(col("us") - col("prev"))).collect()(0).getLong(0)
    val e2 = e.select(col("user_id").as("u2"), col("us").as("us2"), col("event_id").as("id2"))
    val viaJoin = e.join(e2,
        col("user_id") === col("u2") &&
        (col("us2") < col("us") ||
          (col("us2") === col("us") && col("id2") < col("event_id"))))
      .groupBy(col("user_id"), col("event_id"), col("us"))
      .agg(max(struct(col("us2"), col("id2"))).getField("us2").as("prev"))
      .agg(sum(col("us") - col("prev"))).collect()(0).getLong(0)
    assert(viaLag == viaJoin, s"$viaLag != $viaJoin")
  }
}
