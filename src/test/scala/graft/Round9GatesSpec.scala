package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graphs, NearDup, PipelineOps, Stats, TextAnalysis, TextRank, VectorOps}

/** Model pins for the round-9 gate family: each test recomputes the
  * operator's defining invariant (or the whole algorithm) locally from
  * first principles on sf0.001 and compares — the cross-engine hash gate
  * is the DuckDB oracle; these pin the MODEL (greedy trajectories, exact
  * integer disciplines, recall floors, reconciliation identities).
  */
class Round9GatesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  /** Spark's ROUND-on-double semantics (toString-based decimal HALF_UP). */
  private def r6(x: Double): Double =
    BigDecimal(java.lang.Double.toString(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r2(x: Double): Double =
    BigDecimal(java.lang.Double.toString(x))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("Q195 bigram LM: ppl is exp of the rounded mean ce; doc accounting closes") {
    val out = TextAnalysis.q195(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ce = r.getAs[Double]("mean_ce")
      assert(ce > 0, "cross-entropy must be positive")
      assert(r.getAs[Double]("ppl") == r2(math.exp(ce)),
        "ppl must be ROUND(EXP(mean_ce), 2) of the already-rounded mean")
      val lq = r.getAs[Double]("low_q_share")
      assert(lq >= 0.0 && lq <= 1.0)
    }
    // every held-out doc with >= 2 tokens is scored, none from the train split
    val c = Catalog(spark, dir)
    val expected = c.documents
      .withColumn("bucket",
        expr(
          "(" + (1 to 8).map { d =>
            val scale = math.pow(16, 8 - d).toLong
            s"(instr('0123456789abcdef', substring(md5(concat('lm:', CAST(doc_id AS STRING))), $d, 1)) - 1) * CAST($scale AS BIGINT)"
          }.mkString(" + ") + ") % 2"))
      .withColumn("ntok", expr("size(filter(split(text, ' '), t -> t <> ''))"))
      .filter(col("bucket") === 1 && col("ntok") >= 2).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == expected)
  }

  test("Q196 canonical selection: kept totals reconcile with Q68's min-id rule") {
    val q196 = NearDup.q196(spark, dir).collect()
    val q68 = NearDup.q68(spark, dir).collect()
    // same clusters, one survivor per cluster + all singletons — the RULE
    // differs (longest vs min-id) but the survivor COUNT cannot
    assert(q196.map(_.getAs[Long]("n_kept")).sum ==
      q68.map(_.getAs[Long]("n_kept")).sum)
    q196.foreach { r =>
      assert(r.getAs[Long]("chars_kept") <= r.getAs[Long]("chars_total"))
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
    // the quality rule must keep at least the char mass of ANY other rule
    // on the same clusters: per cluster it keeps the longest member, so
    // global kept-chars >= what min-id keeping would retain
    val pairs = operators.TextOps
      .jaccardFromTokens(spark, NearDup.shingles(Catalog(spark, dir)), 0.6)
      .select(col("doc_lo"), col("doc_hi"))
    val cc = NearDup.connectedComponentsStars(pairs)._1
    val chars = Catalog(spark, dir).documents
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = cc.collect().groupBy(_.getAs[Long]("rep"))
      .values.map(_.map(_.getAs[Long]("member")).toSeq)
    val qualityKeep = clusters.map(m => m.map(chars).max).sum
    val minIdKeep = clusters.map(m => chars(m.min)).sum
    val keptCharsInClusters = {
      val allMembers = clusters.flatten.toSet
      q196.map(_.getAs[Long]("chars_kept")).sum -
        chars.filterNot { case (id, _) => allMembers(id) }.values.sum
    }
    assert(keptCharsInClusters == qualityKeep)
    assert(qualityKeep >= minIdKeep)
  }

  test("Q197 HITS: the gate's exact-integer scores equal a local replay") {
    val c = Catalog(spark, dir)
    val edges = c.orders.select(col("o_orderkey"), col("o_custkey"))
      .join(c.lineitem.select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val a1 = edges.groupBy(_._2).map { case (p, es) => p -> es.size.toLong }
    val h1 = edges.groupBy(_._1).map { case (cu, es) =>
      cu -> es.map(e => a1(e._2)).sum }
    val a2 = edges.groupBy(_._2).map { case (p, es) =>
      p -> es.map(e => h1(e._1)).sum }
    val top = a2.toSeq.sortBy { case (p, s) => (-s, p) }.take(20)
    val got = Graphs.q197(spark, dir).collect()
    assert(got.length == top.length)
    got.zip(top).foreach { case (r, (p, s)) =>
      assert(r.getAs[Long]("p_partkey") == p)
      assert(r.getAs[Long]("a2") == s)
      assert(r.getAs[Long]("a1") == a1(p))
    }
  }

  test("Q198 SRP-LSH: verified pairs are a subset of the exhaustive sweep; recall >= 0.9") {
    val c = Catalog(spark, dir)
    val vecs = c.embeddings.collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1048576.0 + 0.5).toLong).toArray
    }
    val nrm = vecs.map { case (id, v) => id -> v.map(x => x * x).sum }.toMap
    val exhaustive = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      (ia, va) = vecs(i); (ib, vb) = vecs(j)
      dp = va.zip(vb).map { case (a, b) => a * b }.sum
      cos = dp.toDouble / (math.sqrt(nrm(ia).toDouble) * math.sqrt(nrm(ib).toDouble))
      if cos >= 0.4
    } yield (math.min(ia, ib), math.max(ia, ib))).toSet
    val got = VectorOps.q198(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_lo"), r.getAs[Long]("vec_hi"))).toSet
    assert(got.subsetOf(exhaustive), "LSH must never emit a sub-threshold pair")
    val recall = got.size.toDouble / exhaustive.size
    assert(recall >= 0.9, f"SRP recall $recall%.3f under the 3-bit-band floor")
  }

  test("Q199 bootstrap CI: percentile interval brackets the point estimate") {
    val out = Stats.q199(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lo, m, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("mean_rev"),
        r.getAs[Double]("ci_hi"))
      assert(lo < hi, "nondegenerate interval")
      assert(lo <= m && m <= hi, "95% percentile CI brackets the sample mean")
    }
  }

  test("Q202 Hamilton allocation: seats sum exactly to the budget, quota bounds hold") {
    val out = PipelineOps.q202(spark, dir).collect()
    assert(out.map(_.getAs[Long]("alloc")).sum == 1000L,
      "largest-remainder apportionment must hand out exactly the budget")
    val n = out.map(_.getAs[Long]("n_docs")).sum
    out.foreach { r =>
      val exact = 1000.0 * r.getAs[Long]("n_docs") / n
      val alloc = r.getAs[Long]("alloc")
      // Hamilton satisfies quota: floor(exact) <= alloc <= ceil(exact)
      assert(alloc >= math.floor(exact).toLong && alloc <= math.ceil(exact).toLong,
        s"${r.getAs[String]("source")}: alloc $alloc violates quota of $exact")
    }
  }

  test("Q203 repetition runs: per-doc max run equals a local scan") {
    val c = Catalog(spark, dir)
    val local = c.documents.select(col("doc_id"), col("source"), col("text"))
      .collect().map { r =>
        val toks = r.getString(2).split(" ").filter(_.nonEmpty)
        var best = if (toks.isEmpty) 0 else 1
        var run = 1
        toks.sliding(2).foreach { p =>
          if (p.length == 2 && p(0) == p(1)) { run += 1; best = math.max(best, run) }
          else run = 1
        }
        (r.getString(1), best)
      }.filter(_._2 > 0)
    val expect = local.groupBy(_._1).map { case (s, xs) =>
      s -> (xs.length.toLong, xs.map(_._2).max.toLong,
        xs.count(_._2 >= 3).toDouble / xs.length)
    }
    TextAnalysis.q203(spark, dir).collect().foreach { r =>
      val (nd, worst, _) = expect(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("worst_run") == worst)
    }
  }

  test("Q204 winsorized/trimmed means: ordering sanity and local replay on one type") {
    val out = Stats.q204(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("cut_lo") <= r.getAs[Double]("cut_hi"))
      val (tr, wi) = (r.getAs[Double]("mean_trimmed"), r.getAs[Double]("mean_winsorized"))
      // winsorized re-adds clamped tails: it sits between trimmed and raw
      assert(math.abs(wi - tr) <= math.abs(r.getAs[Double]("mean_raw") - tr) + 1e-9)
    }
    val c = Catalog(spark, dir)
    val t0 = out.head.getAs[String]("event_type")
    val cents = c.events.filter(col("event_type") === t0)
      .select(round(col("value") * 100).cast("long")).collect().map(_.getLong(0)).sorted
    val n = cents.length; val k = n / 10
    val mid = cents.slice(k, n - k)
    val trimmed = mid.sum.toDouble / ((n - 2 * k) * 100.0)
    val winsor = (mid.sum + k.toLong * mid.head + k.toLong * mid.last).toDouble / (n * 100.0)
    val r0 = out.head
    assert(math.abs(r0.getAs[Double]("mean_trimmed") - trimmed) < 5e-5)
    assert(math.abs(r0.getAs[Double]("mean_winsorized") - winsor) < 5e-5)
  }

  test("Q205 fold audit: cells reconcile to the corpus and expectations to margins") {
    val out = PipelineOps.q205(spark, dir).collect()
    val total = Catalog(spark, dir).documents.count()
    assert(out.map(_.getAs[Long]("n")).sum == total)
    val byFold = out.groupBy(_.getAs[Long]("fold"))
    // expected sums to the fold size within rounding
    byFold.foreach { case (_, rows) =>
      val nF = rows.map(_.getAs[Long]("n")).sum
      val eF = rows.map(_.getAs[Double]("expected")).sum
      assert(math.abs(eF - nF) < 0.01 * rows.length + 1e-6)
    }
  }

  test("Q201 TextRank: scores equal a local weighted-PageRank replay") {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("doc_id"), col("text")).collect()
    val edges = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty)
      toks.sliding(2).foreach { p =>
        if (p.length == 2 && p(0) != p(1)) {
          val key = if (p(0) < p(1)) (p(0), p(1)) else (p(1), p(0))
          edges(key) = edges.getOrElse(key, 0L) + 1
        }
      }
    }
    val pruned = edges.filter(_._2 >= 3)
    val de = pruned.toSeq.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
    val wdeg = de.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var pr = wdeg.map { case (nd, _) => nd -> 1.0 }
    (1 to 3).foreach { _ =>
      pr = de.groupBy(_._2).map { case (dst, es) =>
        dst -> (0.15 + 0.85 * es.map(e => pr(e._1) * e._3.toDouble / wdeg(e._1)).sum)
      }
    }
    def r4(x: Double): Double =
      BigDecimal(java.lang.Double.toString(x))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expTop = pr.toSeq
      .map { case (tk, p) => (tk, r4(p)) } // the gate's round-4 sort key
      .sortBy { case (tk, p) => (-p, tk) }.take(20).map(_._1)
    val got = TextRank.q201(spark, dir).collect().map(_.getAs[String]("token")).toSeq
    assert(got == expTop, s"gate=$got local=$expTop")
  }

  test("Q200 MMR: the greedy trajectory equals a local first-principles replay") {
    val c = Catalog(spark, dir)
    val vecs = c.embeddings.filter(col("vec_id") <= 200).collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1048576.0 + 0.5).toLong).toArray
    }.toMap
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(v.map(x => x * x).sum.toDouble) }
    def cos(a: Long, b: Long): Double = r6(
      vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum.toDouble / (nrm(a) * nrm(b)))
    val cand = vecs.keys.filter(_ >= 1).toSeq.sorted
    val rel = cand.map(i => i -> cos(i, 0L)).toMap
    var sel = Vector.empty[Long]
    (1 to 5).foreach { _ =>
      val pick = cand.filterNot(sel.contains).map { i =>
        val ms = if (sel.isEmpty) 0.0 else sel.map(s => cos(i, s)).max
        val score = if (sel.isEmpty) r6(0.7 * rel(i))
          else r6(0.7 * rel(i) - 0.3 * ms)
        (i, score)
      }.minBy { case (i, s) => (-s, i) }._1
      sel = sel :+ pick
    }
    val got = VectorOps.q200(spark, dir).collect().map(_.getAs[Long]("vec_id")).toVector
    assert(got == sel, s"gate picked $got, local greedy replay picked $sel")
  }

  test("Q206 Heaps fit: growth-curve endpoints and OLS beta match a local replay") {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("source"), col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ").filter(_.nonEmpty)))
    val out = TextAnalysis.q206(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val ordered = ds.sortBy(_._2)
      // exact integer growth curve: cumulative token mass + first-seen types
      val seen = scala.collection.mutable.Set.empty[String]
      var nCum = 0L
      val pts = ordered.map { case (_, _, toks) =>
        nCum += toks.length
        toks.foreach(seen += _)
        (nCum, seen.size.toLong)
      }.filter { case (n, v) => n >= 1 && v >= 1 }
      val r = out(src)
      assert(r.getAs[Long]("n_docs") == pts.length.toLong)
      assert(r.getAs[Long]("n_tokens") == pts.last._1)
      assert(r.getAs[Long]("vocab") == pts.last._2)
      // OLS of ln V on ln n over the same point set
      val xs = pts.map(p => math.log(p._1.toDouble))
      val ys = pts.map(p => math.log(p._2.toDouble))
      val n = pts.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getAs[Double]("beta") - beta) < 5e-4,
        s"$src: gate beta ${r.getAs[Double]("beta")} vs local $beta")
      // Heaps beta sits in (0,1) for real corpora; at sf0.001 a tiny
      // source whose later docs add no new types can round to 0.0
      assert(r.getAs[Double]("beta") >= 0 && r.getAs[Double]("beta") < 1,
        s"$src: Heaps beta must sit in [0,1)")
      assert(r.getAs[Double]("r2") >= 0 && r.getAs[Double]("r2") <= 1)
    }
  }

  test("Q207 k-anonymity: ladder monotone, accounting closes, L2 equals a local replay") {
    val out = operators.Pii.q207(spark, dir).collect()
      .map(r => r.getAs[String]("level") -> r).toMap
    assert(out.size == 3)
    val total = Catalog(spark, dir).customer.count()
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_records") == total,
        "every ladder level partitions the full table")
      assert(r.getAs[Long]("uniques") <= r.getAs[Long]("at_risk"),
        "k=1 records are a subset of k<5 records")
      assert(r.getAs[Long]("k_min") >= 1 &&
        r.getAs[Long]("k_min") <= r.getAs[Long]("k_max"))
    }
    // generalizing can only merge classes: classes shrink, k_min grows
    val l = Seq("L0_nation_seg_bal100", "L1_region_seg_bal1000",
      "L2_region_seg").map(out)
    assert(l(0).getAs[Long]("n_classes") >= l(1).getAs[Long]("n_classes"))
    assert(l(1).getAs[Long]("n_classes") >= l(2).getAs[Long]("n_classes"))
    assert(l(0).getAs[Long]("k_min") <= l(2).getAs[Long]("k_min"))
    // local replay of the coarsest level
    val c = Catalog(spark, dir)
    val nat = c.nation.collect()
      .map(r => r.getAs[Long]("n_nationkey") -> r.getAs[Long]("n_regionkey")).toMap
    val reg = c.region.collect()
      .map(r => r.getAs[Long]("r_regionkey") -> r.getAs[String]("r_name")).toMap
    val ks = c.customer.collect()
      .groupBy(r => (reg(nat(r.getAs[Int]("c_nationkey").toLong)),
        r.getAs[String]("c_mktsegment")))
      .map(_._2.length.toLong)
    val r2 = l(2)
    assert(r2.getAs[Long]("n_classes") == ks.size.toLong)
    assert(r2.getAs[Long]("k_min") == ks.min && r2.getAs[Long]("k_max") == ks.max)
    assert(r2.getAs[Long]("uniques") == ks.count(_ == 1).toLong)
    assert(r2.getAs[Long]("at_risk") == ks.filter(_ < 5).sum)
  }

  test("Q208 leakage audit: split accounting closes and matches a local replay") {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("event_type"), col("user_id"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (dmin, dmax) = (ev.map(_._3).min, ev.map(_._3).max)
    val cutoff = dmin + ((dmax - dmin + 1) * 4) / 5
    val out = PipelineOps.q208(spark, dir).collect()
    assert(out.map(r => r.getAs[Long]("n_train") + r.getAs[Long]("n_test")).sum
      == ev.length.toLong, "train+test must partition the stream")
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val rows = ev.filter(_._1 == t)
      val (tr, te) = rows.partition(_._3 < cutoff)
      assert(r.getAs[Long]("n_train") == tr.length.toLong)
      assert(r.getAs[Long]("n_test") == te.length.toLong)
      val trU = tr.map(_._2).toSet; val teU = te.map(_._2).toSet
      assert(r.getAs[Long]("test_users") == teU.size.toLong)
      assert(r.getAs[Long]("overlap_users") == (trU & teU).size.toLong)
      val trK = tr.map(x => (x._2, x._4)).toSet
      val teK = te.map(x => (x._2, x._4)).toSet
      assert(r.getAs[Long]("leaked_keys") == (trK & teK).size.toLong)
      val share = r.getAs[Double]("user_leak_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("Q209 Markov: transition counts equal a local journey replay; rows normalize") {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val local = scala.collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).foreach { case (_, rows) =>
      rows.sortBy(r => (r._2, r._3)).map(_._4).sliding(2).foreach { p =>
        if (p.length == 2)
          local((p(0), p(1))) = local.getOrElse((p(0), p(1)), 0L) + 1
      }
    }
    val out = operators.Behavior.q209(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n")).sum == local.values.sum)
    out.foreach { r =>
      assert(r.getAs[Long]("n") ==
        local((r.getAs[String]("src"), r.getAs[String]("dst"))))
    }
    out.groupBy(_.getAs[String]("src")).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getAs[Double]("prob")).sum - 1.0) < 1e-4,
        "row probabilities must sum to ~1")
      assert(rows.map(_.getAs[Int]("succ_rank")).sorted.toSeq
        == (1 to rows.length), "ranks must be a permutation")
    }
  }

  test("Q211 PSI: accounting closes, PSI nonnegative, one type replays locally") {
    val c = Catalog(spark, dir)
    val typeCounts = c.events.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = operators.Behavior.q211(spark, dir).collect()
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") == typeCounts(t))
      assert(r.getAs[Double]("psi") >= 0.0,
        "PSI is a sum of (p-q)ln(p/q) terms, each nonnegative")
      assert(r.getAs[Long]("bins_hit") >= 1 && r.getAs[Long]("bins_hit") <= 10)
    }
    // local replay for the first type
    val ev = c.events.select(col("event_type"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (dmin, dmax) = (ev.map(_._2).min, ev.map(_._2).max)
    val cutoff = dmin + ((dmax - dmin + 1) * 4) / 5
    val t0 = out.head.getAs[String]("event_type")
    val rows = ev.filter(_._1 == t0)
    val (lo, hi) = (rows.map(_._3).min, rows.map(_._3).max)
    def bin(cents: Long): Long = math.min(9L, (cents - lo) * 10 / (hi - lo + 1))
    val tr = rows.filter(_._2 < cutoff).groupBy(r => bin(r._3)).map { case (b, xs) => b -> xs.length.toLong }
    val te = rows.filter(_._2 >= cutoff).groupBy(r => bin(r._3)).map { case (b, xs) => b -> xs.length.toLong }
    val bins = (tr.keySet ++ te.keySet).toSeq.sorted
    val (nTr, nTe) = (tr.values.sum, te.values.sum)
    val psi = bins.map { b =>
      val p = (tr.getOrElse(b, 0L) + 1).toDouble / (nTr + 10)
      val q = (te.getOrElse(b, 0L) + 1).toDouble / (nTe + 10)
      (p - q) * math.log(p / q)
    }.sum
    assert(math.abs(out.head.getAs[Double]("psi") - psi) < 5e-5,
      s"$t0: gate psi ${out.head.getAs[Double]("psi")} vs local $psi")
  }

  test("Q212 Welch: moments replay locally, t/df match the textbook formula") {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("event_type"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (dmin, dmax) = (ev.map(_._2).min, ev.map(_._2).max)
    val cutoff = dmin + ((dmax - dmin + 1) * 4) / 5
    operators.Behavior.q212(spark, dir).collect().foreach { r =>
      val t = r.getAs[String]("event_type")
      val rows = ev.filter(_._1 == t)
      val (tr, te) = rows.partition(_._2 < cutoff)
      assert(r.getAs[Long]("n_train") == tr.length.toLong)
      assert(r.getAs[Long]("n_test") == te.length.toLong)
      def stats(xs: Array[Long]): (Double, Double) = {
        val n = xs.length
        val m = xs.sum.toDouble / n
        val v = (xs.map(x => x.toDouble * x).sum - xs.sum.toDouble * xs.sum / n) / (n - 1)
        (m, v)
      }
      val ((m1, v1), (m2, v2)) = (stats(tr.map(_._3)), stats(te.map(_._3)))
      val se2 = v1 / tr.length + v2 / te.length
      val tStat = (m1 - m2) / math.sqrt(se2)
      val df = se2 * se2 / ((v1 / tr.length) * (v1 / tr.length) / (tr.length - 1)
        + (v2 / te.length) * (v2 / te.length) / (te.length - 1))
      assert(math.abs(r.getAs[Double]("t_stat") - tStat) < 5e-4)
      assert(math.abs(r.getAs[Double]("df") - df) < 0.2)
      assert(r.getAs[String]("verdict") ==
        (if (math.abs(r.getAs[Double]("t_stat")) > 1.96) "shifted" else "stable"))
    }
  }

  test("Q213 Gini: rank formula equals the mean-absolute-difference definition") {
    val c = Catalog(spark, dir)
    val perUser = c.events.select(col("event_type"), col("user_id"),
      round(col("value") * 100).cast("long").as("cents")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(x => (x._1, x._2)).toSeq
      .map { case ((t, _), xs) => (t, xs.map(_._3).sum) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toArray }
    operators.Behavior.q213(spark, dir).collect().foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = perUser(t)
      assert(r.getAs[Long]("n_users") == xs.length.toLong)
      assert(r.getAs[Long]("cents_total") == xs.sum)
      // Gini via the O(n^2) mean-absolute-difference definition
      val n = xs.length
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b).toDouble).sum
      val gini = mad / (2.0 * n * n * (xs.sum.toDouble / n))
      // the rank formula equals MAD/2n²μ exactly (ties included)
      assert(math.abs(r.getAs[Double]("gini") - gini) < 5e-5,
        s"$t: gate ${r.getAs[Double]("gini")} vs MAD $gini")
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0)
      val share = r.getAs[Double]("top_decile_share")
      assert(share >= 0.1 - 1e-6 && share <= 1.0,
        "top decile holds at least its population share of value")
    }
  }

  test("Q214 Benford: digit counts replay locally; shares and chi2 close") {
    val c = Catalog(spark, dir)
    val local = c.lineitem.select(col("l_extendedprice")).collect()
      .map(r => math.round(r.getDouble(0) * 100).toString.charAt(0) - '0')
      .groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val out = operators.Profiling.q214(spark, dir).collect()
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total == c.lineitem.count())
    out.foreach { r =>
      val d = r.getAs[Int]("digit")
      assert(d >= 1 && d <= 9)
      assert(r.getAs[Long]("n") == local(d))
      val expShare = math.log10(1.0 + 1.0 / d)
      assert(math.abs(r.getAs[Double]("exp_share") - expShare) < 1e-5)
      val chi2 = math.pow(r.getAs[Long]("n").toDouble - total * expShare, 2) /
        (total * expShare)
      assert(math.abs(r.getAs[Double]("chi2_term") - chi2) < 5e-4)
    }
    // shares sum to 1 on both sides
    assert(math.abs(out.map(_.getAs[Double]("obs_share")).sum - 1.0) < 1e-3)
  }

  test("Q215 moments: skewness/kurtosis/JB match a local two-pass computation") {
    val c = Catalog(spark, dir)
    val byType = c.events.select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(_._2) }
    operators.Stats.q215(spark, dir).collect().foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = byType(t)
      val n = xs.length.toDouble
      val mu = xs.sum / n
      // two-pass central moments — numerically independent of the gate's
      // raw-moment identities, so agreement pins the algebra
      val m2 = xs.map(x => math.pow(x - mu, 2)).sum / n
      val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
      val skew = m3 / math.pow(m2, 1.5)
      val kurt = m4 / (m2 * m2)
      val jb = n / 6.0 * (skew * skew + math.pow(kurt - 3.0, 2) / 4.0)
      assert(r.getAs[Long]("n") == xs.length.toLong)
      assert(math.abs(r.getAs[Double]("skewness") - skew) < 1e-3,
        s"$t: skew ${r.getAs[Double]("skewness")} vs $skew")
      assert(math.abs(r.getAs[Double]("kurtosis") - kurt) < 1e-3)
      assert(math.abs(r.getAs[Double]("jb") - jb) < math.max(0.01 * jb, 0.05))
      assert(r.getAs[Double]("kurtosis") > 0, "kurtosis of a nondegenerate sample")
    }
  }

  test("Q216 lead-lag: self-pairs peak at lag 0 with r=1; matrix replays locally") {
    val c = Catalog(spark, dir)
    val daily = c.events.select(col("event_type"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2)).map { case ((t, d), xs) => (t, d, xs.map(_._3).sum) }
    val (dmin, dmax) = (daily.map(_._2).min, daily.map(_._2).max)
    val types = daily.map(_._1).toSeq.distinct.sorted
    val series = types.map { t =>
      val m = daily.filter(_._1 == t).map(r => r._2 -> r._3).toMap
      t -> (dmin to dmax).map(d => m.getOrElse(d, 0L)).toArray
    }.toMap
    def corr(xs: Array[Long], ys: Array[Long]): Double = {
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val sxy = xs.zip(ys).map { case (a, b) => a.toDouble * b }.sum
      val sxx = xs.map(a => a.toDouble * a).sum
      val syy = ys.map(a => a.toDouble * a).sum
      (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    val out = operators.Behavior.q216(spark, dir).collect()
    assert(out.length == types.length * types.length)
    out.filter(r => r.getAs[String]("ta") == r.getAs[String]("tb")).foreach { r =>
      assert(r.getAs[Long]("best_lag") == 0L, "a series' best alignment is itself")
      assert(math.abs(r.getAs[Double]("best_r") - 1.0) < 1e-6)
    }
    // replay a couple of cross pairs at lag 0
    out.filter(r => r.getAs[String]("ta") != r.getAs[String]("tb")).take(5)
      .foreach { r =>
        val local = corr(series(r.getAs[String]("ta")), series(r.getAs[String]("tb")))
        assert(math.abs(r.getAs[Double]("r_lag0") - local) < 5e-4,
          s"${r.getAs[String]("ta")}->${r.getAs[String]("tb")}: " +
            s"${r.getAs[Double]("r_lag0")} vs $local")
      }
  }

  test("Q217 point-in-time: deciles partition users, features are pre-cutoff only") {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("user_id"),
      expr("(ts DIV 1000) DIV 86400000000").as("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (dmin, dmax) = (ev.map(_._2).min, ev.map(_._2).max)
    val cutoff = dmin + ((dmax - dmin + 1) * 4) / 5
    val preUsers = ev.filter(_._2 < cutoff).map(_._1).toSet
    val postUsers = ev.filter(_._2 >= cutoff).map(_._1).toSet
    val out = operators.Behavior.q217(spark, dir).collect()
    // only users with pre-cutoff history are rows (labels join onto features)
    assert(out.map(_.getAs[Long]("n_users")).sum == preUsers.size.toLong)
    assert(out.map(_.getAs[Long]("n_retained")).sum ==
      (preUsers & postUsers).size.toLong)
    assert(out.map(_.getAs[Int]("decile")).sorted.toSeq == (1 to 10))
    val sizes = out.map(_.getAs[Long]("n_users"))
    assert(sizes.max - sizes.min <= 1, "NTILE(10) balance")
    out.foreach { r =>
      val rr = r.getAs[Double]("retention_rate")
      assert(rr >= 0.0 && rr <= 1.0)
      assert(r.getAs[Long]("n_retained") <= r.getAs[Long]("n_users"))
    }
  }

  test("Q218/graft_jaro_winkler: textbook pins, metric properties, gate replay") {
    import graft.plans.JaroWinkler.{similarity => jw}
    // classic Winkler test pairs (values match DuckDB's
    // jaro_winkler_similarity, probed this round)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-12)
    // floor-halved transpositions (odd out-of-order count)
    assert(math.abs(jw("abcdef", "bcafed") - 0.8888888888888888) < 1e-12)
    // boost gate: jaro <= 0.7 gets NO prefix boost
    assert(math.abs(jw("prefix", "prefiyyyyyyyyyyyyyyXX") - 0.6904761904761904) < 1e-12)
    assert(jw("abc", "abc") == 1.0 && jw("abc", "xyz") == 0.0)
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0)
    // symmetry + range on a vocabulary sample
    val words = Seq("small ring", "red widget", "blue bolt", "hot gear",
      "small gizmo", "large plate", "small bolt")
    for (a <- words; b <- words) {
      assert(math.abs(jw(a, b) - jw(b, a)) < 1e-15, s"symmetry $a/$b")
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
    }
    // gate replay: the SQL expression (codegen path) agrees with the
    // static scorer on every emitted row
    val out = NearDup.q218(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val local = jw(r.getAs[String]("name_a"), r.getAs[String]("name_b"))
      assert(math.abs(r.getAs[Double]("sim") - local) < 5e-5)
      assert(local >= 0.90 && r.getAs[Long]("n_pairs") >= 1)
    }
  }

  test("Q219 STL-lite: decomposition replays locally; strengths bounded") {
    val c = Catalog(spark, dir)
    val daily = c.events.select(col("event_type"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2)).map { case ((t, d), xs) => (t, d, xs.map(_._3).sum) }
    val (dmin, dmax) = (daily.map(_._2).min, daily.map(_._2).max)
    val out = operators.EventTime.q219(spark, dir).collect()
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val m = daily.filter(_._1 == t).map(x => x._2 -> x._3).toMap
      val v = (dmin to dmax).map(d => m.getOrElse(d, 0L).toDouble / 100.0).toArray
      val n = v.length
      // centered 7-day MA on full windows only
      val used = (3 until n - 3)
      val trend = used.map(i => (i - 3 to i + 3).map(v).sum / 7.0)
      val days = used.map(i => dmin + i)
      val detr = used.zip(trend).map { case (i, tr) => v(i) - tr }
      val byDow = days.zip(detr).groupBy(_._1 % 7)
        .map { case (d, xs) => d -> xs.map(_._2).sum / xs.length }
      val seas = days.zip(detr).map { case (d, x) => byDow(d % 7) }
      val resid = detr.zip(seas).map { case (a, b) => a - b }
      def variance(xs: Seq[Double]): Double = {
        val mu = xs.sum / xs.length
        xs.map(x => x * x).sum / xs.length - mu * mu
      }
      assert(r.getAs[Long]("n_days") == used.length.toLong)
      val vtot = variance(used.map(v(_)).toSeq)
      assert(math.abs(r.getAs[Double]("var_total") - vtot)
        < math.max(1e-3, 1e-6 * vtot))
      val fT = r.getAs[Double]("f_trend"); val fS = r.getAs[Double]("f_seasonal")
      assert(fT >= 0.0 && fT <= 1.0 && fS >= 0.0 && fS <= 1.0)
      val fsLocal = math.max(0.0, 1.0 - variance(resid.toSeq) / variance(detr.toSeq))
      assert(math.abs(fS - fsLocal) < 1e-3,
        s"$t: f_seasonal $fS vs local $fsLocal")
    }
  }

  test("Q220 paths: trigram counts replay locally; ranks and shares consistent") {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val local = scala.collection.mutable.Map.empty[String, Long]
    ev.groupBy(_._1).foreach { case (_, rows) =>
      rows.sortBy(r => (r._2, r._3)).map(_._4).sliding(3).foreach { w =>
        if (w.length == 3) {
          val p = w.mkString(">")
          local(p) = local.getOrElse(p, 0L) + 1
        }
      }
    }
    val expTop = local.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val out = operators.Behavior.q220(spark, dir).collect()
    assert(out.length == math.min(20, local.size))
    out.zip(expTop).foreach { case (r, (p, n)) =>
      assert(r.getAs[String]("path") == p && r.getAs[Long]("n") == n,
        s"rank ${r.getAs[Int]("rank")}: gate (${r.getAs[String]("path")}," +
          s"${r.getAs[Long]("n")}) vs local ($p,$n)")
    }
    val total = local.values.sum.toDouble
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("share") - r.getAs[Long]("n") / total) < 1e-4)
    }
  }

  test("Q221 PVM: volume+rate+mix reconstructs delta (accounting identity)") {
    val out = operators.Behavior.q221(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val delta = r.getAs[Double]("delta")
      val sum = r.getAs[Double]("volume_effect") + r.getAs[Double]("rate_effect") +
        r.getAs[Double]("mix_effect")
      // each effect is independently rounded to cents → ≤ 2 cents slack
      assert(math.abs(delta - sum) <= 0.02 + 1e-9,
        s"${r.getAs[String]("event_type")}: delta $delta vs effects sum $sum")
      assert(math.abs(r.getAs[Double]("rev_curr") - r.getAs[Double]("rev_base")
        - delta) <= 0.01 + 1e-9)
    }
  }

  test("Q222 graph profile: degree accounting and assortativity replay locally") {
    val c = Catalog(spark, dir)
    val edges = operators.Derived.coOrderPairCounts(spark, dir)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Long] // degree
    edges.foreach { case (a, b) =>
      adj(a) = adj.getOrElse(a, 0L) + 1; adj(b) = adj.getOrElse(b, 0L) + 1
    }
    val r = operators.Graphs.q222(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_nodes") == adj.size.toLong)
    assert(r.getAs[Long]("n_edges") == edges.length.toLong)
    assert(r.getAs[Long]("deg_min") == adj.values.min)
    assert(r.getAs[Long]("deg_max") == adj.values.max)
    // assortativity via directed-edge Pearson, from first principles
    val directed = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val m = directed.length.toDouble
    val js = directed.map { case (s, _) => adj(s).toDouble }
    val ks = directed.map { case (_, d) => adj(d).toDouble }
    val (sj, sjk, sjj) = (js.sum, js.zip(ks).map { case (x, y) => x * y }.sum,
      js.map(x => x * x).sum)
    val local = (m * sjk - sj * sj) / (m * sjj - sj * sj)
    assert(math.abs(r.getAs[Double]("assortativity") - local) < 1e-4,
      s"gate ${r.getAs[Double]("assortativity")} vs local $local")
    assert(r.getAs[Double]("density") > 0 && r.getAs[Double]("density") <= 1)
  }

  test("Q223 ABC/XYZ: cells partition parts, revenue shares close, ABC quota holds") {
    val c = Catalog(spark, dir)
    val nParts = c.lineitem.select(col("l_partkey")).distinct().count()
    val out = operators.Profiling.q223(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n_parts")).sum == nParts,
      "every shipped part lands in exactly one cell")
    val shares = out.map(_.getAs[Double]("rev_share")).sum
    assert(math.abs(shares - 1.0) < 1e-3, s"revenue shares sum to 1, got $shares")
    val byAbc = out.groupBy(_.getAs[String]("abc_class"))
      .map { case (k, rows) => k -> rows.map(_.getAs[Double]("rev_share")).sum }
    // A holds at most 80% (cut is <= 80% by construction), A+B at most 95%
    assert(byAbc.getOrElse("A", 0.0) <= 0.80 + 1e-6)
    assert(byAbc.getOrElse("A", 0.0) + byAbc.getOrElse("B", 0.0) <= 0.95 + 1e-6)
    assert(byAbc.getOrElse("C", 0.0) >= 0.05 - 1e-6)
    out.foreach { r =>
      assert(Set("A", "B", "C")(r.getAs[String]("abc_class")))
      assert(Set("X", "Y", "Z")(r.getAs[String]("xyz_class")))
      assert(r.getAs[Double]("avg_cv") >= 0.0)
    }
  }

  test("Q224 entropy: H from Q209's matrix, bounds, perplexity consistency") {
    val q209 = operators.Behavior.q209(spark, dir).collect()
    val byScr = q209.groupBy(_.getAs[String]("src"))
    val out = operators.Behavior.q224(spark, dir).collect()
    val k = q209.map(_.getAs[String]("dst")).distinct.length
    out.foreach { r =>
      val s = r.getAs[String]("src")
      val rows = byScr(s)
      val tot = rows.map(_.getAs[Long]("n")).sum.toDouble
      val h = rows.map { x =>
        val p = x.getAs[Long]("n") / tot
        p * math.log(1.0 / p) / math.log(2.0)
      }.sum
      assert(r.getAs[Long]("n_steps") == tot.toLong)
      assert(math.abs(r.getAs[Double]("h_bits") - h) < 1e-3,
        s"$s: H ${r.getAs[Double]("h_bits")} vs local $h")
      assert(r.getAs[Double]("h_bits") >= 0 &&
        r.getAs[Double]("h_bits") <= math.log(k.toDouble) / math.log(2.0) + 1e-9,
        "entropy bounded by log2(#destinations)")
      assert(math.abs(r.getAs[Double]("perplexity")
        - math.pow(2.0, r.getAs[Double]("h_bits"))) < 0.01)
      val topP = rows.map(_.getAs[Long]("n")).max / tot
      assert(math.abs(r.getAs[Double]("top_prob") - topP) < 1e-3)
    }
  }

  test("Q225 template contamination: matrix is symmetric in overlap and replays locally") {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").take(6).mkString(" ")))
    val bySource = docs.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    val out = operators.TextOps.q225(spark, dir).collect()
    val gate = out.map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      -> r.getAs[Long]("n_shared")).toMap
    // local replay of every contaminated pair
    for (a <- bySource.keys; b <- bySource.keys if a != b) {
      val shared = (bySource(a) & bySource(b)).size.toLong
      assert(gate.getOrElse((a, b), 0L) == shared,
        s"$a->$b: gate ${gate.getOrElse((a, b), 0L)} vs local $shared")
    }
    // overlap counts are symmetric (shares need not be)
    gate.foreach { case ((a, b), n) => assert(gate((b, a)) == n) }
    out.foreach { r =>
      assert(r.getAs[Long]("n_shared") >= 1)
      val sh = r.getAs[Double]("contamination")
      assert(sh > 0.0 && sh <= 1.0)
      assert(r.getAs[Long]("hashes_a") == bySource(r.getAs[String]("src_a")).size.toLong)
    }
  }

  test("Q226 skew profile: events.user_id row replays from a local frequency table") {
    val c = Catalog(spark, dir)
    val freqs = c.events.select(col("user_id")).collect()
      .groupBy(_.getLong(0)).map { case (k, xs) => k -> xs.length.toLong }
    val sorted = freqs.toSeq.sortBy { case (k, f) => (f, k) }.map(_._2)
    val nk = sorted.length
    val out = operators.Profiling.q226(spark, dir).collect()
      .map(r => r.getAs[String]("rel_key") -> r).toMap
    assert(out.size == 3)
    val r = out("events.user_id")
    assert(r.getAs[Long]("n_rows") == freqs.values.sum)
    assert(r.getAs[Long]("n_keys") == nk.toLong)
    assert(r.getAs[Long]("max_freq") == sorted.last)
    assert(r.getAs[Long]("p50_freq") == sorted((nk - 1) / 2))
    assert(r.getAs[Long]("p99_freq") == sorted(99 * (nk - 1) / 100))
    out.values.foreach { x =>
      assert(x.getAs[Double]("top_share") > 0 && x.getAs[Double]("top_share") <= 1)
      assert(x.getAs[Double]("skew_ratio") >= 1.0 - 1e-9,
        "p99 frequency cannot sit below the median")
    }
  }

  private def r4(x: Double): Double =
    BigDecimal(java.lang.Double.toString(x))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hv(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** The zero-filled per-type daily cents grid, replayed locally (the
    * shared series base of Q227/Q229). Cents extracted via Spark so the
    * ROUND-on-double convention is the engine's own.
    */
  private def localGrid(c: Catalog): Map[String, IndexedSeq[Long]] = {
    val ev = c.events.select(col("event_type"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val daily = ev.groupBy(t => (t._1, t._2))
      .map { case (k, xs) => k -> xs.map(_._3).sum }
    val dmin = daily.keys.map(_._2).min
    val dmax = daily.keys.map(_._2).max
    ev.map(_._1).distinct.map { ty =>
      ty -> (dmin to dmax).map(d => daily.getOrElse((ty, d), 0L))
    }.toMap
  }

  test("Q227 Mann–Kendall: S, tie polynomials, z and tau-b replay from a local pairwise scan") {
    val grid = localGrid(Catalog(spark, dir))
    val out = Stats.q227(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out.keySet == grid.keySet)
    for ((ty, vs) <- grid) {
      val n = vs.length.toLong
      var s = 0L
      for (i <- vs.indices; j <- (i + 1) until vs.length)
        s += java.lang.Long.signum(vs(j) - vs(i))
      val tieG = vs.groupBy(identity).values.map(_.length.toLong)
      val n1 = tieG.map(t => t * (t - 1) / 2).sum
      val tiePoly = tieG.map(t => t * (t - 1) * (2 * t + 5)).sum
      val n0 = n * (n - 1) / 2
      val var18 = n * (n - 1) * (2 * n + 5) - tiePoly
      val r = out(ty)
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("s") == s, s"$ty: S")
      assert(r.getAs[Long]("n_ties") == n1, s"$ty: n1")
      if (n0 - n1 > 0)
        assert(r.getAs[Double]("tau_b") ==
          r4(s.toDouble / math.sqrt(n0.toDouble * (n0 - n1).toDouble)), s"$ty: tau_b")
      if (var18 > 0) {
        val zNum = if (s > 0) (s - 1).toDouble else if (s < 0) (s + 1).toDouble else 0.0
        val z = r4(zNum / math.sqrt(var18.toDouble / 18.0))
        assert(r.getAs[Double]("z") == z, s"$ty: z")
        val trend =
          if (z >= 1.96) "increasing" else if (z <= -1.96) "decreasing" else "none"
        assert(r.getAs[String]("trend") == trend, s"$ty: trend")
      }
      // tau-b magnitude is a correlation
      assert(math.abs(r.getAs[Double]("tau_b")) <= 1.0 + 1e-9)
    }
  }

  test("Q228 CUPED: pooled theta is arm-invariant and the adjusted means/variances replay") {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("user_id"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dmin = ev.map(_._2).min; val dmax = ev.map(_._2).max
    val cut = dmin + (dmax - dmin + 1) / 2
    val per = ev.groupBy(_._1).map { case (u, xs) =>
      (md5hv(s"exp1:$u") % 2,
        xs.filter(_._2 < cut).map(_._3).sum,
        xs.filter(_._2 >= cut).map(_._3).sum)
    }.toSeq
    val np = per.size.toLong
    val sxp = per.map(_._2).sum; val syp = per.map(_._3).sum
    val sxxp = per.map(t => t._2 * t._2).sum
    val sxyp = per.map(t => t._2 * t._3).sum
    val theta = (np.toDouble * sxyp - sxp.toDouble * syp) /
      (np.toDouble * sxxp - sxp.toDouble * sxp)
    val xbar = sxp.toDouble / np
    val out = Stats.q228(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(out.keySet == Set(0L, 1L))
    for ((b, r) <- out) {
      val bs = per.filter(_._1 == b)
      val n = bs.size.toLong
      val sx = bs.map(_._2).sum; val sy = bs.map(_._3).sum
      val sxx = bs.map(t => t._2 * t._2).sum
      val syy = bs.map(t => t._3 * t._3).sum
      val sxy = bs.map(t => t._2 * t._3).sum
      val meanY = sy.toDouble / n; val meanX = sx.toDouble / n
      val varY = (n.toDouble * syy - sy.toDouble * sy) /
        (n.toDouble * (n.toDouble - 1.0))
      val varAdj = ((n.toDouble * syy - sy.toDouble * sy)
        - 2.0 * theta * (n.toDouble * sxy - sx.toDouble * sy)
        + theta * theta * (n.toDouble * sxx - sx.toDouble * sx)) /
        (n.toDouble * (n.toDouble - 1.0))
      assert(r.getAs[Long]("n_users") == n)
      // theta identical on both rows: the pooled fit is arm-invariant
      assert(r.getAs[Double]("theta") ==
        BigDecimal(java.lang.Double.toString(theta))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Double]("mean_post") == r4(meanY / 100.0), s"bucket $b mean_post")
      assert(r.getAs[Double]("mean_cuped") ==
        r4((meanY - theta * (meanX - xbar)) / 100.0), s"bucket $b mean_cuped")
      assert(r.getAs[Double]("var_post") == r4(varY / 10000.0))
      assert(r.getAs[Double]("var_cuped") == r4(varAdj / 10000.0))
      // CUPED cannot increase variance when theta is the pooled OLS fit
      // by more than sampling noise; sanity: reduction is bounded by 1
      assert(r.getAs[Double]("var_reduction") <= 1.0 + 1e-9)
    }
  }

  test("Q229 sign-flip permutation: T_obs exact, p-values replay from the md5 parities") {
    val grid = localGrid(Catalog(spark, dir))
    val types = grid.keys.toSeq.sorted
    val out = Stats.q229(spark, dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r).toMap
    val pairs = for (a <- types; b <- types if a < b) yield (a, b)
    assert(out.keySet == pairs.toSet)
    val nDays = grid(types.head).length
    val dmin0 = {
      // recover dmin from the catalog to label days exactly as the gate does
      val c = Catalog(spark, dir)
      c.events.select(expr("min((ts DIV 1000) DIV 86400000000)")).collect()(0).getLong(0)
    }
    for ((a, b) <- pairs) {
      val d = (0 until nDays).map(i => grid(a)(i) - grid(b)(i))
      val tObs = d.sum
      val r = out((a, b))
      assert(r.getAs[Long]("n_days") == nDays.toLong)
      assert(r.getAs[Long]("t_obs") == tObs, s"$a/$b: t_obs")
      var nExtreme = 0L
      for (p <- 0 until 199) {
        var tp = 0L
        for (i <- 0 until nDays) {
          val day = dmin0 + i
          val eps = if (md5hv(s"pm:$a:$b:$p:$day") % 2 == 0) 1L else -1L
          tp += eps * d(i)
        }
        if (math.abs(tp) >= math.abs(tObs)) nExtreme += 1
      }
      assert(r.getAs[Long]("n_extreme") == nExtreme, s"$a/$b: n_extreme")
      assert(r.getAs[Double]("p_value") == r4((1.0 + nExtreme) / 200.0))
      val verdict =
        if (r.getAs[Double]("p_value") < 0.05) "reject_null" else "retain_null"
      assert(r.getAs[String]("verdict") == verdict)
    }
  }

  test("Q230 quantile normalization: rank->pooled-CDF mapping replays against a sorted-array model") {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("len")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pooled = docs.map(_._3).sorted // the pooled distribution, 1-based below
    val nTot = pooled.length.toLong
    val out = Stats.q230(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val bySrc = docs.groupBy(_._1)
    assert(out.keySet == bySrc.keySet)
    for ((src, xs) <- bySrc) {
      val lens = xs.sortBy(t => (t._3, t._2)).map(_._3) // rank order: (len, doc_id)
      val nS = lens.length.toLong
      val norm = (1L to nS).map(r => pooled(((r * nTot) / nS).toInt - 1))
      val r = out(src)
      assert(r.getAs[Long]("n_docs") == nS)
      assert(r.getAs[Double]("mean_raw") == r4(lens.sum.toDouble / nS))
      assert(r.getAs[Double]("mean_norm") == r4(norm.sum.toDouble / nS))
      val m = ((nS + 1) / 2).toInt
      assert(r.getAs[Long]("p50_raw") == lens(m - 1))
      assert(r.getAs[Long]("p50_norm") == norm(m - 1))
      assert(r.getAs[Double]("mean_shift") ==
        r4((norm.sum - lens.sum).toDouble / nS))
      // the normalized values are genuine pooled-distribution quantiles
      assert(norm.forall(v => pooled.contains(v)))
      // monotone: normalization preserves the within-source order
      assert(norm == norm.sorted)
    }
    // sanity (the exact replay above already pins behavior): every
    // normalized median is a pooled value, so it lies in the pooled range
    out.values.foreach { r =>
      assert(r.getAs[Long]("p50_norm") >= pooled.head &&
        r.getAs[Long]("p50_norm") <= pooled.last)
    }
  }

  test("Q231 SRM + MDE: chi2, pooled rate, and both MDEs replay from exact per-user moments") {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        expr("ts DIV 1000").as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val per = ev.groupBy(_._1).map { case (u, xs) =>
      val views = xs.filter(_._2 == "view").map(_._4)
      val buys = xs.filter(_._2 == "purchase").map(_._4)
      val conv = views.exists(v =>
        buys.exists(p => p > v && p <= v + 1800L * 1000000L))
      (md5hv(s"exp1:$u") % 2, if (conv) 1L else 0L, xs.map(_._3).sum)
    }.toSeq
    val nA = per.count(_._1 == 0L).toLong
    val nB = per.count(_._1 == 1L).toLong
    val xA = per.filter(_._1 == 0L).map(_._2).sum
    val xB = per.filter(_._1 == 1L).map(_._2).sum
    val nT = per.size.toLong
    val sT = per.map(_._3).sum
    val ssT = per.map(t => t._3 * t._3).sum
    val chi2 = r4(((nA - nB) * (nA - nB)).toDouble / (nA + nB))
    val pHat = (xA + xB).toDouble / (nA + nB)
    val nH = 2.0 * nA * nB / (nA + nB)
    val varC = (nT.toDouble * ssT - sT.toDouble * sT) /
      (nT.toDouble * (nT.toDouble - 1.0))
    val z = 2.801585
    val r = Stats.q231(spark, dir).collect() match {
      case Array(row) => row
      case rows => fail(s"expected 1 row, got ${rows.length}")
    }
    assert(r.getAs[Long]("n_a") == nA && r.getAs[Long]("n_b") == nB)
    assert(r.getAs[Long]("x_a") == xA && r.getAs[Long]("x_b") == xB)
    assert(r.getAs[Double]("srm_chi2") == chi2)
    assert(r.getAs[String]("srm_verdict") ==
      (if (chi2 > 3.8415) "fail" else "pass"))
    // the md5 split is designed to be healthy: chi2 must sit far under
    // the fence on any of the shipped fixtures
    assert(r.getAs[String]("srm_verdict") == "pass")
    assert(math.abs(r.getAs[Double]("conv_rate") - pHat) < 1e-6 + 1e-12)
    val mdeAbs = z * math.sqrt(2.0 * pHat * (1.0 - pHat) / nH)
    assert(math.abs(r.getAs[Double]("mde_abs") - mdeAbs) < 1e-6 + 1e-12)
    assert(math.abs(r.getAs[Double]("mde_rel") - mdeAbs / pHat) < 1e-4 + 1e-12)
    val mdeVal = z * math.sqrt(2.0 * varC / nH) / 100.0
    assert(math.abs(r.getAs[Double]("mde_value") - mdeVal) < 1e-4 + 1e-12)
    // design sanity: detectable effect shrinks with n — the sf0.001
    // fixture's per-arm hundreds of users price a double-digit relative
    // lift, and the MDE is strictly positive
    assert(r.getAs[Double]("mde_abs") > 0.0)
    assert(r.getAs[Double]("mde_rel") > 0.0)
  }

  test("Q232 DiD: estimate equals the four-cell double difference and the delta-Welch t replays") {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("user_id"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dmin = ev.map(_._2).min; val dmax = ev.map(_._2).max
    val cut = dmin + (dmax - dmin + 1) / 2
    val per = ev.groupBy(_._1).map { case (u, xs) =>
      (md5hv(s"exp1:$u") % 2,
        xs.filter(_._2 < cut).map(_._3).sum,
        xs.filter(_._2 >= cut).map(_._3).sum)
    }.toSeq
    def arm(b: Long) = per.filter(_._1 == b)
    val r = Stats.q232(spark, dir).collect() match {
      case Array(row) => row
      case rows => fail(s"expected 1 row, got ${rows.length}")
    }
    assert(r.getAs[Long]("n_a") == arm(0).size.toLong)
    assert(r.getAs[Long]("n_b") == arm(1).size.toLong)
    // four cell means replay
    for ((b, pre, post) <- Seq((0L, "pre_a", "post_a"), (1L, "pre_b", "post_b"))) {
      val xs = arm(b)
      assert(r.getAs[Double](pre) == r4(xs.map(_._2).sum.toDouble / xs.size / 100.0))
      assert(r.getAs[Double](post) == r4(xs.map(_._3).sum.toDouble / xs.size / 100.0))
    }
    // DiD == mean(d|b) − mean(d|a) == the four-cell double difference
    def meanD(b: Long) = {
      val xs = arm(b); xs.map(t => t._3 - t._2).sum.toDouble / xs.size
    }
    val did = (meanD(1) - meanD(0)) / 100.0
    assert(r.getAs[Double]("did") == r4(did))
    // Welch on the per-user deltas
    def varD(b: Long) = {
      val ds = arm(b).map(t => t._3 - t._2)
      val n = ds.size; val s = ds.sum; val ss = ds.map(d => d * d).sum
      (ss.toDouble - s.toDouble * s / n) / (n - 1)
    }
    val (na, nb) = (arm(0).size, arm(1).size)
    val se2 = varD(0) / na + varD(1) / nb
    val t = r4((meanD(1) - meanD(0)) / math.sqrt(se2))
    assert(r.getAs[Double]("t_stat") == t)
    val df = (se2 * se2) / ((varD(0) / na) * (varD(0) / na) / (na - 1)
      + (varD(1) / nb) * (varD(1) / nb) / (nb - 1))
    assert(math.abs(r.getAs[Double]("df") - df) < 0.05 + 1e-9)
    assert(r.getAs[String]("verdict") ==
      (if (math.abs(t) > 1.96) "effect" else "no_effect"))
    // the md5 arms see the same time trend by construction (no real
    // treatment), so df sits near the two-arm total and t is finite
    assert(r.getAs[Double]("df") > 1.0)
    assert(!r.getAs[Double]("t_stat").isNaN)
  }

  test("Q233 kappa: LSH-screen and verified flags replay from a local minhash/Jaccard model") {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingleSet(t: String): Set[String] = {
      val toks = t.split(" ")
      if (toks.length < 3) Set.empty
      else (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
    }
    val sh = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    // verified >= 0.6 flags
    val ids = docs.map(_._1)
    val verified = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = sh(ids(i)); b = sh(ids(j))
      if a.nonEmpty && b.nonEmpty
      inter = (a & b).size
      if inter.toDouble / (a.size + b.size - inter) >= 0.6
    } yield Seq(ids(i), ids(j))).flatten.toSet
    // LSH candidate flags: k=8 minhash over shingles, 4 bands x 2 rows
    val sigs = sh.collect { case (id, s) if s.nonEmpty =>
      id -> (0 until 8).map(p => s.map(t => md5hv(s"$p:$t")).min)
    }
    val bandKey = (id: Long) => (0 until 4).map { b =>
      val parts = (0 until 8).filter(_ % 4 == b)
        .map(p => s"$p=${sigs(id)(p)}").sorted.mkString(",")
      (b, parts)
    }
    val flagged = scala.collection.mutable.Set[Long]()
    val sids = sigs.keys.toSeq
    for (i <- sids.indices; j <- (i + 1) until sids.length)
      if (bandKey(sids(i)).exists(bandKey(sids(j)).contains)) {
        flagged += sids(i); flagged += sids(j)
      }
    val n = docs.length.toLong
    val n11 = ids.count(id => flagged(id) && verified(id)).toLong
    val n10 = ids.count(id => flagged(id) && !verified(id)).toLong
    val n01 = ids.count(id => !flagged(id) && verified(id)).toLong
    val n00 = n - n11 - n10 - n01
    val r = NearDup.q233(spark, dir).collect() match {
      case Array(row) => row
      case rows => fail(s"expected 1 row, got ${rows.length}")
    }
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("n11") == n11, "n11")
    assert(r.getAs[Long]("n10") == n10, "n10")
    assert(r.getAs[Long]("n01") == n01, "n01")
    assert(r.getAs[Long]("n00") == n00, "n00")
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01)
      + (n01 + n00).toDouble * (n10 + n00)) / (n.toDouble * n)
    assert(r.getAs[Double]("p_agree") == r4(po))
    if (1.0 - pe > 0) {
      val k = r4((po - pe) / (1.0 - pe))
      assert(r.getAs[Double]("kappa") == k)
      assert(k <= 1.0 + 1e-9)
      val band =
        if (k < 0.0) "poor" else if (k < 0.2) "slight" else if (k < 0.4) "fair"
        else if (k < 0.6) "moderate" else if (k < 0.8) "substantial"
        else "near_perfect"
      assert(r.getAs[String]("agreement") == band)
    }
    // the miss mass n01 is a probabilistic LSH-recall quantity (the
    // 1-(1-J^2)^4 model), so no inequality against n11 is an invariant;
    // what IS structural: the screen catches at least one verified doc
    // whenever verified pairs exist at all (identical docs band
    // identically in every band)
    if (verified.nonEmpty) assert(n11 > 0, "screen caught no verified doc")
  }

  test("Q234 manifest: additive fingerprints replay and are order/partition independent") {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("source"), col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def leaf(id: Long, text: String): Long =
      md5hv(s"$id:${md5hex(text)}")
    val out = operators.Profiling.q234(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val bySrc = docs.groupBy(_._1)
    assert(out.keySet == bySrc.keySet + "TOTAL")
    for ((src, xs) <- bySrc) {
      val r = out(src)
      assert(r.getAs[Long]("n_docs") == xs.length.toLong)
      assert(r.getAs[Long]("n_chars") == xs.map(_._3.length.toLong).sum)
      // order independence is structural: the model sums over an
      // UNORDERED collection and must still match the engine
      assert(r.getAs[Long]("fp") ==
        xs.map(t => leaf(t._2, t._3)).sum % 2147483647L, s"$src fp")
    }
    val t = out("TOTAL")
    assert(t.getAs[Long]("n_docs") == docs.length.toLong)
    assert(t.getAs[Long]("fp") ==
      docs.map(x => leaf(x._2, x._3)).sum % 2147483647L)
    // sensitivity: flipping one doc's text changes its source fp
    val (s0, id0, t0) = docs.head
    val fp0 = out(s0).getAs[Long]("fp")
    val altered = (bySrc(s0).map(x =>
      if (x._2 == id0) leaf(x._2, x._3 + "X") else leaf(x._2, x._3)).sum
      % 2147483647L)
    assert(altered != fp0, "a single-doc edit must move the fingerprint")
  }

  test("Q235 Good-Turing: spectrum and estimator replay from local token counts") {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("source"), col("text")).collect()
      .map(r => (Option(r.getString(0)), r.getString(1)))
    val out = TextAnalysis.q235(spark, dir).collect()
      .map(r => Option(r.getAs[String]("source")) -> r).toMap
    val bySrc = docs.groupBy(_._1)
    assert(out.keySet == bySrc.keySet)
    for ((src, xs) <- bySrc) {
      val cnt = xs.flatMap(_._2.split(" ").filter(_.nonEmpty))
        .groupBy(identity).map { case (_, v) => v.length.toLong }.toSeq
      val (n, v) = (cnt.sum, cnt.length.toLong)
      val Seq(n1, n2, n3) = Seq(1L, 2L, 3L).map(k => cnt.count(_ == k).toLong)
      val r = out(src)
      assert(r.getAs[Long]("n_tokens") == n && r.getAs[Long]("vocab") == v)
      assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2 &&
        r.getAs[Long]("n3") == n3)
      // SQL `2.0` literals make the r* columns DecimalType — read numerically
      def num(f: String): Double =
        r.get(r.fieldIndex(f)).asInstanceOf[Number].doubleValue
      assert(r.getAs[Double]("p_unseen") == r6(n1.toDouble / n))
      // the r* guards: NULL iff the denominator class is empty
      if (n1 > 0) assert(math.abs(num("r_star1") - 2.0 * n2 / n1) <= 5e-5)
      else assert(r.isNullAt(r.fieldIndex("r_star1")))
      if (n2 > 0) assert(math.abs(num("r_star2") - 3.0 * n3 / n2) <= 5e-5)
      else assert(r.isNullAt(r.fieldIndex("r_star2")))
      assert(math.abs(num("gt_hapax_mass") - 2.0 * n2 / n) <= 5e-7)
    }
  }

  test("Q236 backtest: naive/seasonal MAE, WAPE, and MASE replay from a local grid") {
    val c = Catalog(spark, dir)
    val daily = c.events.select(col("event_type"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("v")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val days = daily.keys.map(_._2)
    val (dmin, dmax) = (days.min, days.max)
    val out = Stats.q236(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out.keySet == daily.keys.map(_._1).toSet)
    for (et <- out.keySet) {
      val series = (dmin to dmax).map(d => daily.getOrElse((et, d), 0L))
      val evalIdx = series.indices.filter(_ >= 7) // rn = idx+1 > 7
      val sae1 = evalIdx.map(i => math.abs(series(i) - series(i - 1))).sum
      val sae7 = evalIdx.map(i => math.abs(series(i) - series(i - 7))).sum
      val sv = evalIdx.map(i => math.abs(series(i))).sum
      val nEval = evalIdx.length.toLong
      val r = out(et)
      assert(r.getAs[Long]("n_eval") == nEval)
      assert(r.getAs[Double]("mae_naive") == r4(sae1.toDouble / nEval / 100.0))
      assert(r.getAs[Double]("mae_snaive") == r4(sae7.toDouble / nEval / 100.0))
      if (sv > 0) {
        assert(r.getAs[Double]("wape_naive") == r6(sae1.toDouble / sv))
        assert(r.getAs[Double]("wape_snaive") == r6(sae7.toDouble / sv))
      }
      if (sae1 > 0) {
        val mase = r4(sae7.toDouble / sae1)
        assert(r.getAs[Double]("mase") == mase)
        assert(r.getAs[String]("verdict") ==
          (if (mase < 1.0) "seasonal_wins" else "naive_wins"))
      } else {
        assert(r.isNullAt(r.fieldIndex("mase")))
        assert(r.getAs[String]("verdict") == "degenerate")
      }
    }
  }

  test("Q239 Haar energies: cascade replays exactly and Parseval closes in integers") {
    val grids = localGrid(Catalog(spark, dir)).view.mapValues(_.toVector).toMap
    val out = operators.Stats.q239(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out.keySet == grids.keySet)
    for ((et, series) <- grids) {
      val n8 = (series.length / 8) * 8
      val v = series.take(n8)
      def cascade(a: Vector[Long]): (Vector[Long], Vector[Long]) = {
        val pairs = a.grouped(2).toVector
        (pairs.map(p => p(0) - p(1)), pairs.map(p => p(0) + p(1)))
      }
      val (d1, a1) = cascade(v)
      val (d2, a2) = cascade(a1)
      val (d3, a3) = cascade(a2)
      val (e1, e2, e3) = (d1.map(x => x * x).sum, d2.map(x => x * x).sum,
        d3.map(x => x * x).sum)
      val aE = a3.map(x => x * x).sum
      val t = v.map(x => x * x).sum
      val r = out(et)
      assert(r.getAs[Long]("n8") == n8.toLong)
      assert(r.getAs[Long]("t_sq") == t)
      assert(r.getAs[Long]("e1") == e1 && r.getAs[Long]("e2") == e2 &&
        r.getAs[Long]("e3") == e3)
      assert(r.getAs[Long]("a_energy") == aE)
      // Parseval for the unnormalized cascade, exact in int64
      assert(8L * t == 4L * e1 + 2L * e2 + e3 + aE, s"$et parseval")
      val den = 4L * e1 + 2L * e2 + e3
      if (den > 0) {
        assert(r.getAs[Double]("share1") == r6(4.0 * e1 / den))
        assert(r.getAs[Double]("share2") == r6(2.0 * e2 / den))
        assert(r.getAs[Double]("share3") == r6(e3.toDouble / den))
        assert(r.getAs[String]("dominant") ==
          (if (4 * e1 >= 2 * e2 && 4 * e1 >= e3) "day_noise"
           else if (2 * e2 >= e3) "two_day" else "multi_day"))
      } else assert(r.getAs[String]("dominant") == "flat")
    }
  }

  test("Q240 runs test: run count, exact moments, and verdict replay locally") {
    val grids = localGrid(Catalog(spark, dir)).view.mapValues(_.toVector).toMap
    val out = operators.Stats.q240(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    for ((et, series) <- grids) {
      val med = series.sorted.apply((series.length + 1) / 2 - 1)
      val labs = series.map(v => if (v > med) 1 else if (v < med) -1 else 0)
        .filter(_ != 0)
      if (labs.isEmpty) assert(!out.contains(et))
      else {
        val r = out(et)
        val n1 = labs.count(_ == 1).toLong
        val n2 = labs.count(_ == -1).toLong
        val runs = 1L + labs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
        assert(r.getAs[Long]("median_cents") == med)
        assert(r.getAs[Long]("n_above") == n1 && r.getAs[Long]("n_below") == n2)
        assert(r.getAs[Long]("runs") == runs)
        val n = n1 + n2
        val p2 = 2L * n1 * n2
        if (n1 > 0 && n2 > 0 && n > 1 && p2 * (p2 - n) > 0) {
          val mu = 1.0 + p2.toDouble / n
          val sd = math.sqrt(p2.toDouble * (p2 - n) / (n.toDouble * n * (n - 1)))
          val z = r4((runs - mu) / sd)
          assert(r.getAs[Double]("z") == z, s"$et z")
          assert(r.getAs[String]("verdict") ==
            (if (math.abs(z) > 1.96) "non_random" else "random"))
        } else assert(r.getAs[String]("verdict") == "degenerate")
      }
    }
  }

  test("Q241 Brown-Forsythe: F from exact |dev|-moments, widest/tightest struct order") {
    val grids = localGrid(Catalog(spark, dir)).view.mapValues(_.toVector).toMap
    val stats = grids.map { case (et, series) =>
      val med = series.sorted.apply((series.length + 1) / 2 - 1)
      val z = series.map(v => math.abs(v - med))
      (et, series.length.toLong, z.sum, z.map(x => x * x).sum)
    }.toSeq
    val k = stats.length.toLong
    val nTot = stats.map(_._2).sum
    val sAll = stats.map(_._3).sum
    val sbPart = stats.map(s => s._3.toDouble * s._3 / s._2).sum
    val qAll = stats.map(_._4).sum
    val ssb = sbPart - sAll.toDouble * sAll / nTot
    val ssw = qAll - sbPart
    val r = operators.Stats.q241(spark, dir).collect().head
    assert(r.getAs[Long]("k") == k)
    assert(r.getAs[Long]("n_per_group") == stats.map(_._2).max)
    assert(r.getAs[String]("widest") ==
      stats.map(s => (s._3, s._1)).max._2)
    assert(r.getAs[String]("tightest") ==
      stats.map(s => (s._3, s._1)).min._2)
    if (k > 1 && nTot > k && ssw > 0) {
      val f = (ssb / (k - 1)) / (ssw / (nTot - k))
      assert(math.abs(r.getAs[Double]("f_stat") - f) <= 5e-5 + 1e-9)
      assert(math.abs(r.getAs[Double]("chi2_approx") - f * (k - 1)) <=
        5e-5 + 1e-9)
    } else assert(r.getAs[String]("verdict") == "degenerate")
  }

  test("Q242 Friedman: tie-corrected chi2 and Kendall W replay from doubled midranks") {
    val grids = localGrid(Catalog(spark, dir)).view.mapValues(_.toVector).toMap
    val types = grids.keys.toSeq.sorted
    val n = grids.values.head.length
    // doubled midrank of type j's value within each day-block
    val drByType = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    var a2 = 0L
    for (i <- 0 until n) {
      val vals = types.map(t => t -> grids(t)(i))
      for ((t, v) <- vals) {
        val lt = vals.count(_._2 < v).toLong
        val eq = vals.count(_._2 == v).toLong
        val dr = 2L * lt + eq + 1L
        drByType(t) += dr
        a2 += dr * dr
      }
    }
    val k = types.length.toLong
    val sdev2 = types.map { t =>
      val d = drByType(t) - n.toLong * (k + 1); d * d
    }.sum
    val den = a2 - n.toLong * k * (k + 1) * (k + 1)
    val r = operators.Stats.q242(spark, dir).collect().head
    assert(r.getAs[Long]("k") == k && r.getAs[Long]("n_days") == n.toLong)
    assert(r.getAs[String]("best") ==
      types.map(t => (drByType(t), t)).max._2)
    assert(r.getAs[String]("worst") ==
      types.map(t => (drByType(t), t)).min._2)
    if (den > 0 && k > 1) {
      val chi2 = ((k - 1) * sdev2).toDouble / den
      assert(math.abs(r.getAs[Double]("chi2_f") - chi2) <= 5e-5 + 1e-9)
      assert(math.abs(r.getAs[Double]("kendall_w") - chi2 / (n * (k - 1))) <=
        5e-7 + 1e-9)
      // Kendall's W is a [0,1] concordance
      assert(r.getAs[Double]("kendall_w") >= 0.0 &&
        r.getAs[Double]("kendall_w") <= 1.0 + 1e-12)
    } else assert(r.getAs[String]("verdict") == "degenerate")
  }

  test("Q243 log-rank: O/E/V accumulate over a locally-replayed risk table") {
    val c = Catalog(spark, dir)
    val users = c.events.select(col("user_id"),
        expr("ts DIV 1000").as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (uid, xs) =>
        val us0 = xs.map(_._2).min
        val pus = xs.filter(_._3 == "purchase").map(_._2).minOption
        val tDeath = pus.map(p => (p - us0) / 3600000000L).filter(_ <= 72L)
        val arm = md5hv(s"exp1:$uid") % 2L
        (arm, tDeath.getOrElse(72L), if (tDeath.isDefined) 1L else 0L)
      }.toSeq
    val byTime = users.groupBy(_._2).toSeq.sortBy(-_._1).map { case (t, xs) =>
      (t, xs.length.toLong, xs.count(_._1 == 0L).toLong,
        xs.map(_._3).sum, xs.filter(_._1 == 0L).map(_._3).sum)
    }
    var (n, n1) = (0L, 0L)
    var (o1, e1, v) = (0L, 0.0, 0.0)
    var deaths = 0L
    for ((_, leaving, leaving1, d, d1) <- byTime) {
      n += leaving; n1 += leaving1
      if (d > 0) {
        o1 += d1; deaths += d
        e1 += d.toDouble * n1 / n
        if (n > 1)
          v += d.toDouble * (n - d) * n1 * (n - n1) / (n.toDouble * n * (n - 1))
      }
    }
    val r = operators.Stats.q243(spark, dir).collect().head
    assert(r.getAs[Long]("n_users") == users.length.toLong)
    assert(r.getAs[Long]("n_arm_a") == users.count(_._1 == 0L).toLong)
    assert(r.getAs[Long]("deaths") == deaths)
    assert(r.getAs[Long]("o1") == o1)
    assert(r.getAs[Long]("o2") == deaths - o1)
    assert(math.abs(r.getAs[Double]("e1") - e1) <= 5e-5 + 1e-9)
    assert(math.abs(r.getAs[Double]("e2") - (deaths - e1)) <= 5e-5 + 1e-9)
    // O1 + O2 = deaths and E1 + E2 = deaths: the accounting identity
    assert(r.getAs[Double]("e1") + r.getAs[Double]("e2") ==
      r2(r.getAs[Double]("e1") + r.getAs[Double]("e2")) ||
      math.abs(r.getAs[Double]("e1") + r.getAs[Double]("e2") - deaths) <= 1e-3)
    if (v > 0) {
      val chi2 = (o1 - e1) * (o1 - e1) / v
      assert(math.abs(r.getAs[Double]("chi2") - chi2) <= 5e-4,
        s"chi2 ${r.getAs[Double]("chi2")} vs $chi2")
      assert(r.getAs[String]("verdict") ==
        (if (r.getAs[Double]("chi2") > 3.8415) "arms_differ"
         else "no_difference"))
    } else assert(r.getAs[String]("verdict") == "degenerate")
  }

  test("Q244 EB shrinkage: prior fit replays; shrinkage contracts toward the prior mean") {
    val c = Catalog(spark, dir)
    val per = c.lineitem.select(col("l_partkey"), col("l_returnflag"))
      .collect().map(r => (r.get(0).asInstanceOf[Number].longValue,
        r.getString(1)))
      .groupBy(_._1).map { case (pk, xs) =>
        (pk, xs.length.toLong, xs.count(_._2 == "R").toLong)
      }.toSeq
    val fitPop = per.filter(_._2 >= 3L)
    val k = fitPop.length.toLong
    val sp = fitPop.map(x => x._3.toDouble / x._2).sum
    val spp = fitPop.map { x => val p = x._3.toDouble / x._2; p * p }.sum
    val xbar = sp / k
    val s2 = (spp - sp * sp / k) / (k - 1)
    val nuRaw = xbar * (1 - xbar) / s2 - 1
    assert(nuRaw > 0, "sf0.001 lineitem must support a proper prior fit")
    val nu = r4(nuRaw)
    val alpha = r4(xbar * nuRaw)
    val out = operators.Stats.q244(spark, dir).collect()
    assert(out.length == math.min(15, per.length))
    val shrunkAll = per.map { case (pk, n, rr) =>
      (pk, r6((rr + alpha) / (n + nu)))
    }
    val expTop = shrunkAll.sortBy { case (pk, s) => (-s, pk) }.take(15)
    assert(out.map(_.getAs[Long]("l_partkey")).toSeq == expTop.map(_._1))
    out.zip(expTop).foreach { case (r, (_, s)) =>
      assert(r.getAs[Double]("shrunk_rate") == s)
      assert(r.getAs[Double]("alpha") == alpha)
      assert(r.getAs[Double]("beta") == r4(nu - alpha))
      // shrinkage contracts: the shrunk rate sits between raw and prior mean
      val raw = r.getAs[Double]("raw_rate")
      val prior = alpha / nu
      assert(s >= math.min(raw, prior) - 1e-6 &&
        s <= math.max(raw, prior) + 1e-6, s"no contraction: $raw $s $prior")
    }
  }

  test("Q245 banded DTW: native DP replays against a local full-matrix model") {
    def ref(a: IndexedSeq[Long], b: IndexedSeq[Long], w: Int): Long = {
      val (n, m) = (a.length, b.length)
      if (n == 0 || m == 0 || math.abs(n - m) > w) return -1L
      val inf = Long.MaxValue / 4
      val d = Array.fill(n, m)(inf)
      for (i <- 0 until n; j <- math.max(0, i - w) to math.min(m - 1, i + w)) {
        val c = math.abs(a(i) - b(j))
        val best =
          if (i == 0 && j == 0) 0L
          else Seq(
            if (i > 0) d(i - 1)(j) else inf,
            if (i > 0 && j > 0) d(i - 1)(j - 1) else inf,
            if (j > 0) d(i)(j - 1) else inf).min
        if (best < inf) d(i)(j) = best + c
      }
      if (d(n - 1)(m - 1) >= inf) -1L else d(n - 1)(m - 1)
    }
    // the expression itself, on randomized series + edge cases
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val n = 1 + rnd.nextInt(40)
      val a = IndexedSeq.fill(n)(rnd.nextInt(2000).toLong)
      val b = IndexedSeq.fill(n)(rnd.nextInt(2000).toLong)
      val w = rnd.nextInt(10)
      assert(plans.Dtw.distance(a.toArray, b.toArray, w) == ref(a, b, w))
      // w = 0 forces the diagonal: DTW degenerates to lockstep L1
      assert(plans.Dtw.distance(a.toArray, b.toArray, 0) ==
        a.zip(b).map { case (x, y) => math.abs(x - y) }.sum)
      // identical series warp for free
      assert(plans.Dtw.distance(a.toArray, a.toArray, w) == 0L)
    }
    assert(plans.Dtw.distance(Array.empty[Long], Array(1L), 5) == -1L)
    assert(plans.Dtw.distance(Array(1L, 2L, 3L), Array(1L), 1) == -1L,
      "band narrower than the length gap cannot connect the endpoints")
    // the gate: every pair replays, and warping never loses to lockstep
    val grids = localGrid(Catalog(spark, dir)).view.mapValues(_.toVector).toMap
    val out = operators.Stats.q245(spark, dir).collect()
    val types = grids.keys.toSeq.sorted
    assert(out.length == types.combinations(2).length)
    for (r <- out) {
      val (ta, tb) = (r.getAs[String]("ta"), r.getAs[String]("tb"))
      val dtw = ref(grids(ta), grids(tb), 7)
      val l1 = grids(ta).zip(grids(tb)).map { case (x, y) =>
        math.abs(x - y) }.sum
      assert(r.getAs[Long]("dtw") == dtw, s"$ta/$tb dtw")
      assert(r.getAs[Long]("l1_lockstep") == l1)
      assert(dtw <= l1, "the diagonal is always a valid banded path")
      if (l1 > 0)
        assert(r.getAs[Double]("warp_gain") == r6(1.0 - dtw.toDouble / l1))
    }
  }

  test("Q246 Fightin' Words: log-odds z replays and the top-10 cut is the model's") {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val st = docs.flatMap { case (s, t) =>
      t.split(" ").filter(_.nonEmpty).map(tok => (s, tok))
    }.groupBy(identity).map { case ((s, tok), xs) => (s, tok, xs.length.toLong) }
    val ns = st.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    val yw = st.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._3).sum }
    val nn = ns.values.sum
    val out = TextAnalysis.q246(spark, dir).collect()
      .groupBy(_.getAs[String]("source"))
    assert(out.keySet == ns.keySet)
    for ((src, rows) <- out) {
      assert(rows.length == math.min(10,
        st.count(_._1 == src)), s"$src row count")
      // replay the z for every emitted row and check the cut is the
      // model's own top-10 (z desc, token asc, rounded BEFORE ranking)
      val zAll = st.filter(_._1 == src).map { case (_, tok, ysw) =>
        val aw = (100L * yw(tok)).toDouble / nn
        val yrw = yw(tok) - ysw
        val nr = nn - ns(src)
        val delta =
          math.log((ysw + aw) / ((ns(src) + 100 - ysw).toDouble - aw)) -
            math.log((yrw + aw) / ((nr + 100 - yrw).toDouble - aw))
        val z = r4(delta / math.sqrt(1.0 / (ysw + aw) + 1.0 / (yrw + aw)))
        (tok, ysw, z)
      }.toSeq
      val expTop = zAll.sortBy { case (tok, _, z) => (-z, tok) }.take(10)
      assert(rows.sortBy(_.getAs[Long]("rk")).map(r =>
        (r.getAs[String]("token"), r.getAs[Long]("ysw"),
          r.getAs[Double]("z"))).toSeq == expTop, s"$src top-10")
    }
  }

  test("Q247 calibration: Murphy decomposition closes (BRIER = REL - RES + UNC)") {
    val out = operators.Behavior.q247(spark, dir).collect()
    val decs = out.filter(!_.isNullAt(0))
    val tot = out.filter(_.isNullAt(0)).head
    assert(decs.length == 10)
    val n = decs.map(_.getAs[Long]("n_users")).sum
    assert(tot.getAs[Long]("n_users") == n)
    // the decomposition identity, on the engine's own rounded terms
    val brier = tot.getAs[Double]("brier")
    val rel = tot.getAs[Double]("reliability")
    val res = tot.getAs[Double]("resolution")
    val unc = tot.getAs[Double]("uncertainty")
    assert(math.abs(brier - (rel - res + unc)) <= 3e-6,
      s"murphy: $brier vs $rel - $res + $unc")
    // p_hat is a {0,1} step in the median-split design: bottom deciles 0,
    // top deciles 1, exactly one boundary decile may sit in between
    val ph = decs.sortBy(_.getAs[Long]("bucket")).map(_.getAs[Double]("pre_rate"))
    assert(ph.zip(ph.tail).forall { case (a, b) => a <= b + 1e-12 },
      "pre_rate must be monotone in the pre-cents decile")
    decs.foreach { r =>
      val o = r.getAs[Double]("post_rate")
      assert(o >= 0.0 && o <= 1.0)
      assert(r.isNullAt(r.fieldIndex("brier")))
    }
    // uncertainty is obar(1-obar) of the total row's own post_rate
    val obar = tot.getAs[Double]("post_rate")
    assert(math.abs(unc - obar * (1 - obar)) <= 2e-6)
  }

  test("Q248 JL audit: exact-int projections, bins, and fences replay locally") {
    val c = Catalog(spark, dir)
    val vecs = c.embeddings.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def grid(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1048576.0 + 0.5).toLong)
    // independent replay of the plane seeds: md5('jl:k:d') parity
    val signs = Array.tabulate(16, 64)((k, d) =>
      if (md5hv(s"jl:$k:$d") % 2L == 0L) 1L else -1L)
    def proj(xi: Array[Long]): Array[Long] =
      Array.tabulate(16) { k =>
        var acc = 0L
        var d = 0
        while (d < xi.length) { acc += xi(d) * signs(k)(d); d += 1 }
        acc
      }
    // round-11 form: vec_ids are gated BEFORE pairing with a
    // corpus-adaptive modulus, so the pair set is quadratic in the
    // bounded sample, never the corpus
    val m = math.max(6L, (vecs.size + 349L) / 350L)
    val ids = vecs.keys.toSeq.sorted
      .filter(i => md5hv(s"jl:v:$i") % m == 0L)
    val model = for {
      i <- ids; j <- ids if i < j
      xa = grid(vecs(i)); xb = grid(vecs(j))
      d2 = xa.zip(xb).map { case (x, y) => (x - y) * (x - y) }.sum
      if d2 > 0
      pa = proj(xa); pb = proj(xb)
      p2 = pa.zip(pb).map { case (x, y) => (x - y) * (x - y) }.sum
    } yield (i, j, d2, p2)
    assert(model.nonEmpty)
    val out = operators.VectorOps.q248(spark, dir).collect()
    val tot = out.filter(_.isNullAt(0)).head
    assert(tot.getAs[Long]("n_pairs") == model.length.toLong)
    val ratios = model.map { case (_, _, d2, p2) => p2.toDouble / (16L * d2) }
    assert(math.abs(tot.getAs[Double]("mean_ratio") -
      ratios.sum / ratios.length) <= 5e-6)
    assert(tot.getAs[Double]("min_ratio") == r6(ratios.min))
    assert(tot.getAs[Double]("max_ratio") == r6(ratios.max))
    // the +-25% fence is the exact integer comparison, not a float one
    val nw = model.count { case (_, _, d2, p2) =>
      p2 >= 12L * d2 && p2 <= 20L * d2 }
    assert(tot.getAs[Double]("within_25pct") ==
      r6(nw.toDouble / model.length))
    val bins = out.filter(!_.isNullAt(0))
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_pairs")).toMap
    val expBins = model.groupBy { case (_, _, d2, p2) =>
      math.min(20L, (10L * p2) / (16L * d2)) }
      .view.mapValues(_.length.toLong).toMap
    assert(bins == expBins)
    // JL sanity: the Rademacher projection is unbiased, the mean sits near 1
    assert(tot.getAs[Double]("mean_ratio") > 0.8 &&
      tot.getAs[Double]("mean_ratio") < 1.2)
  }

  test("Q249 AUC/KS: exact rank statistics replay from a local per-user model") {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("user_id"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val days = ev.map(_._2)
    val cut = days.min + (days.max - days.min + 1) / 2
    val per = ev.groupBy(_._1).map { case (uid, xs) =>
      (uid, xs.count(_._2 < cut).toLong,
        xs.filter(_._2 < cut).map(_._3).sum,
        xs.filter(_._2 >= cut).map(_._3).sum)
    }.filter(_._2 > 0L).toSeq
    val my = per.map(u => (u._4, u._1)).sorted.apply((per.length + 1) / 2 - 1)._1
    val scored = per.map(u => (u._3, if (u._4 > my) 1L else 0L))
    val np = scored.map(_._2).sum
    val nn = scored.length - np
    // doubled midranks on the distinct-score relation
    val byX = scored.groupBy(_._1).toSeq.sortBy(_._1).map { case (x, xs) =>
      (x, xs.length.toLong, xs.map(_._2).sum)
    }
    var (cm, cp, drp) = (0L, 0L, 0L)
    var ksBest = (-1L, Long.MinValue)
    for ((x, m, p) <- byX) {
      val dr = cm * 2L + m + 1L
      cm += m; cp += p
      drp += p * dr
      val ksn = math.abs(cp * nn - (cm - cp) * np)
      if (ksn > ksBest._1 || (ksn == ksBest._1 && x > ksBest._2))
        ksBest = (ksn, x)
    }
    val r = operators.Behavior.q249(spark, dir).collect().head
    assert(r.getAs[Long]("n_users") == scored.length.toLong)
    assert(r.getAs[Long]("n_pos") == np && r.getAs[Long]("n_neg") == nn)
    if (np > 0 && nn > 0) {
      val auc = (drp.toDouble / 2 - np.toDouble * (np + 1) / 2) /
        (np.toDouble * nn)
      assert(r.getAs[Double]("auc") == r6(auc))
      assert(math.abs(r.getAs[Double]("gini") - (2 * auc - 1)) <= 2e-6)
      assert(r.getAs[Double]("ks") ==
        r6(ksBest._1.toDouble / (np.toDouble * nn)))
      assert(r.getAs[Long]("ks_at_cents") == ksBest._2)
      // AUC is a probability; KS ≥ |Gini| holds for any ROC curve
      assert(auc >= 0 && auc <= 1)
      assert(r.getAs[Double]("ks") >= math.abs(2 * auc - 1) - 2e-6)
    } else assert(r.getAs[String]("verdict") == "degenerate")
  }

  test("Q250 absorption: the 12-round integer value iteration replays exactly") {
    val c = Catalog(spark, dir)
    val G = 1000000000L
    val ev = c.events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ord = xs.sortBy(t => (t._2, t._3)).map(_._4)
      ord.zip(ord.tail)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val types = ev.map(_._4).distinct.sorted
    val n = types.map(s => s -> (trans.filter(_._1._1 == s).values.sum)).toMap
    var a = types.map(s => s -> (if (s == "purchase") G else 0L)).toMap
    for (_ <- 1 to 12) {
      a = types.map { s =>
        s -> (if (s == "purchase") G
        else if (n(s) == 0L) 0L
        else types.map(t => trans.getOrElse((s, t), 0L) * a(t)).sum / n(s))
      }.toMap
    }
    val out = operators.Behavior.q250(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out.keySet == types.toSet)
    for (s <- types) {
      val r = out(s)
      assert(r.getAs[Double]("p_absorb12") == r6(a(s).toDouble / G), s)
      val p1 = if (n(s) > 0)
        r6(trans.getOrElse((s, "purchase"), 0L).toDouble / n(s)) else 0.0
      assert(r.getAs[Double]("p_one_step") == p1, s"$s p1")
      // more steps can only help: horizon-12 dominates one step
      assert(r.getAs[Double]("p_absorb12") >=
        r.getAs[Double]("p_one_step") - 1e-6)
    }
    assert(out("purchase").getAs[Double]("p_absorb12") == 1.0)
  }

  test("Q251 cluster density: e/k replay from the artifacts; clique accounting closes") {
    val pairs = operators.Derived.nearDupPairs(spark, dir)
      .select(col("doc_lo"), col("doc_hi")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cc = operators.Derived.nearDupClusters(spark, dir).collect()
      .map(r => (r.getAs[Long]("rep"), r.getAs[Long]("member")))
    val repOf = cc.map { case (rep, m) => m -> rep }.toMap
    val k = cc.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val e = pairs.groupBy(p => repOf(p._1)).view.mapValues(_.length.toLong)
      .toMap
    // every verified pair lies inside one cluster: both endpoints agree
    pairs.foreach { case (lo, hi) => assert(repOf(lo) == repOf(hi)) }
    val out = operators.NearDup.q251(spark, dir).collect()
    val bySize = k.toSeq.map { case (rep, kk) => (kk, e.getOrElse(rep, 0L)) }
      .groupBy(_._1)
    assert(out.map(_.getAs[Long]("cl_size")).toSet == bySize.keySet)
    for (r <- out) {
      val kk = r.getAs[Long]("cl_size")
      val xs = bySize(kk)
      val poss = kk * (kk - 1) / 2
      assert(r.getAs[Long]("n_clusters") == xs.length.toLong)
      assert(r.getAs[Long]("possible_pairs") == poss * xs.length)
      assert(r.getAs[Long]("verified_pairs") == xs.map(_._2).sum)
      assert(r.getAs[Double]("pooled_density") ==
        r6(xs.map(_._2).sum.toDouble / (poss * xs.length)))
      assert(r.getAs[Double]("min_density") ==
        xs.map(x => r6(x._2.toDouble / poss)).min)
      assert(r.getAs[Double]("clique_share") ==
        r6(xs.count(_._2 == poss).toDouble / xs.length))
      // density is a (0, 1] share: at least the k-1 spanning edges exist
      assert(r.getAs[Double]("min_density") > 0.0 &&
        r.getAs[Double]("min_density") <= 1.0)
      assert(xs.forall { case (kk2, ee) => ee >= kk2 - 1 },
        "a connected component of size k has at least k-1 verified pairs")
    }
  }

  test("Q237 retrieval eval: nDCG@10 and MRR@10 replay from a local BM25 ranker") {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val n = docs.length.toLong
    val sdl = docs.map(_._2.length.toLong).sum
    val avgdl = sdl.toDouble / n
    val posting = docs.flatMap { case (id, p) =>
      p.filter(_.nonEmpty).groupBy(identity).map { case (t, v) =>
        (t, id, v.length.toLong, p.length.toLong)
      }
    }
    val dfm = posting.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._2).distinct.length.toLong
    }
    val qterms = dfm.toSeq.filter(_._2 >= 5L)
      .sortBy { case (t, df) => (df, t) }.take(20)
    val out = TextRank.q237(spark, dir).collect()
      .map(r => r.getAs[String]("term") -> r).toMap
    assert(out.keySet == qterms.map(_._1).toSet)
    assert(qterms.nonEmpty)
    for ((term, df) <- qterms) {
      val ps = posting.filter(_._1 == term).map { case (_, id, tf, dl) =>
        val bm25 = r6(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
          (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
        (id, tf, bm25, math.min(tf, 4L))
      }
      val ranked = ps.sortBy { case (id, _, s, _) => (-s, id) }.zipWithIndex
        .map { case ((id, tf, s, rel), i) => (id, tf, s, rel, i + 1) }
      val ideal = ps.sortBy { case (id, _, _, rel) => (-rel, id) }.zipWithIndex
      def gain(rel: Long, rank: Int): Double =
        (math.pow(2.0, rel.toDouble) - 1.0) /
          (math.log((rank + 1).toDouble) / math.log(2.0))
      val dcg = ranked.filter(_._5 <= 10).map(x => gain(x._4, x._5)).sum
      val idcg = ideal.filter(_._2 < 10).map { case ((_, _, _, rel), i) =>
        gain(rel, i + 1)
      }.sum
      val fr = ranked.filter(x => x._5 <= 10 && x._4 >= 2L).map(_._5)
        .sorted.headOption
      val r = out(term)
      assert(r.getAs[Long]("df") == df)
      assert(r.getAs[Long]("n_docs") == ps.length.toLong)
      assert(r.getAs[Long]("n_rel2") == ps.count(_._2 >= 2L).toLong)
      // float-sum-derived: engine must be a correct 6-dp rounding of the model
      assert(math.abs(r.getAs[Double]("ndcg10") - dcg / idcg) <= 5e-7 + 1e-9,
        s"$term ndcg")
      assert(r.getAs[Double]("mrr10") ==
        r6(fr.map(1.0 / _).getOrElse(0.0)), s"$term mrr")
      assert(r.getAs[Double]("ndcg10") <= 1.0 + 1e-12, "nDCG is normalized")
    }
  }

  test("Q238 supply concentration: HHI, effective count, entropy replay per nation") {
    val c = Catalog(spark, dir)
    def lv(r: org.apache.spark.sql.Row, i: Int): Long =
      r.get(i).asInstanceOf[Number].longValue
    val supNat = c.supplier.select(col("s_suppkey"), col("s_nationkey"))
      .collect().map(r => lv(r, 0) -> lv(r, 1)).toMap
    val natName = c.nation.select(col("n_nationkey"), col("n_name"))
      .collect().map(r => lv(r, 0) -> r.getString(1)).toMap
    val perSup = c.lineitem
      .select(col("l_suppkey"), round(col("l_quantity")).cast("long").as("q"))
      .collect().map(r => (lv(r, 0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      .filter(_._2 > 0L)
    val byNation = perSup.groupBy { case (sk, _) => natName(supNat(sk)) }
    val out = operators.Profiling.q238(spark, dir).collect()
      .map(r => r.getAs[String]("nation") -> r).toMap
    assert(out.keySet == byNation.keySet)
    for ((nat, sups) <- byNation) {
      val qs = sups.values.toSeq
      val total = qs.sum
      val sq2 = qs.map(q => q * q).sum
      val qmax = qs.max
      val sqlq = qs.map(q => q.toDouble * math.log(q.toDouble)).sum
      val k = qs.length.toLong
      val r = out(nat)
      assert(r.getAs[Long]("n_suppliers") == k)
      assert(r.getAs[Long]("total_qty") == total)
      val hhi = r6(sq2.toDouble / (total.toDouble * total))
      assert(r.getAs[Double]("hhi") == hhi)
      assert(r.getAs[Double]("eff_suppliers") ==
        r2((total.toDouble * total) / sq2))
      assert(r.getAs[Double]("top_share") == r6(qmax.toDouble / total))
      val entropy = math.log(total.toDouble) - sqlq / total
      assert(math.abs(r.getAs[Double]("entropy") - entropy) <= 5e-5 + 1e-9)
      if (k > 1)
        assert(math.abs(r.getAs[Double]("evenness") -
          entropy / math.log(k.toDouble)) <= 5e-5 + 1e-9)
      else assert(r.isNullAt(r.fieldIndex("evenness")))
      // HHI identities: 1/k <= hhi <= 1, effective count inverts it
      assert(hhi >= 1.0 / k - 1e-9 && hhi <= 1.0 + 1e-9)
      assert(r.getAs[String]("verdict") ==
        (if (hhi > 0.25) "concentrated"
         else if (hhi > 0.15) "moderate" else "competitive"))
    }
  }
}
