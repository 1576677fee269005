package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graphs, Trend}

/** Model pins for the round-10 gate family (Q275–Q281): each test
  * recomputes the operator's defining algorithm locally from first
  * principles on sf0.001 and compares — the cross-engine hash gate is
  * the DuckDB oracle; these pin the MODEL (median-of-slopes selection,
  * exact rank algebra, synchronized peeling, integer cross-product
  * verdicts).
  */
class Round10GatesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def r(k: Int)(x: Double): Double =
    BigDecimal(java.lang.Double.toString(x))
      .setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The shared daily cents grid, recomputed independently of the
    * operator helpers: (type, day, zero-filled cents).
    */
  private def localGrid(): Map[String, Seq[(Long, Long)]] = {
    val c = Catalog(spark, dir)
    val daily = c.events
      .select(col("event_type"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).cast("long").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val dmin = daily.map(_._2).min
    val dmax = daily.map(_._2).max
    val byType = daily.groupBy(_._1)
    byType.map { case (t, rows) =>
      val m = rows.map(r => r._2 -> r._3).toMap
      t -> (dmin to dmax).map(d => (d, m.getOrElse(d, 0L)))
    }
  }

  test("Q275 Theil-Sen: slope median matches the brute-force local median") {
    val grid = localGrid()
    val out = Trend.q275(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.nonEmpty)
    grid.foreach { case (t, series) =>
      val slopes = (for {
        (i, vi) <- series; (j, vj) <- series if j > i
      } yield (vj - vi).toDouble / (j - i)).sorted
      val m = slopes.length
      val med = (slopes((m + 1) / 2 - 1) + slopes(m / 2)) / 2
      assert(out(t).getAs[Double]("ts_slope") == r(6)(med),
        s"$t: median-of-slopes mismatch")
      assert(out(t).getAs[Long]("n_pairs") == m)
    }
  }

  test("Q276 Mann-Kendall: S and the tie-corrected variance numerator are exact") {
    val grid = localGrid()
    val out = Trend.q276(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    grid.foreach { case (t, series) =>
      val vs = series.map(_._2)
      val s = (for {
        i <- vs.indices; j <- vs.indices if j > i
      } yield java.lang.Long.signum(vs(j) - vs(i)).toLong).sum
      val n = vs.length.toLong
      val tt = vs.groupBy(identity).values
        .map(g => { val c = g.length.toLong; c * (c - 1) * (2 * c + 5) }).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tt
      assert(out(t).getAs[Long]("s") == s, s"$t: S mismatch")
      assert(out(t).getAs[Long]("var18") == var18, s"$t: Var numerator")
      val z = out(t).getAs[java.lang.Double]("z")
      if (var18 > 0) {
        val exp = (if (s > 0) s - 1.0 else if (s < 0) s + 1.0 else 0.0) /
          math.sqrt(var18.toDouble / 18)
        assert(z == r(4)(exp), s"$t: z")
      } else assert(z == null)
    }
  }

  test("Q277 Mann-Whitney: doubled U matches the brute-force pair count") {
    // 2*U1 = 2 * (#train-beats-test pairs + ties/2) — count pairs directly.
    val c = Catalog(spark, dir)
    val ev = c.events
      .select(col("event_type"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val dmin = ev.map(_._2).min
    val dmax = ev.map(_._2).max
    val cutoff = dmin + ((dmax - dmin + 1) * 4) / 5
    val out = Trend.q277(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val tr = rows.filter(_._2 < cutoff).map(_._3)
      val te = rows.filter(_._2 >= cutoff).map(_._3)
      // the gate's 2*U1 = 2*n1*n2 + n1(n1+1) - 2*R1 counts test-exceeds-
      // train pairs (ties half) under ascending ranks
      val u1x2 = (for (a <- tr; b <- te)
        yield (if (b > a) 2L else if (a == b) 1L else 0L)).sum
      assert(out(t).getAs[Long]("u1_doubled") == u1x2, s"$t: 2*U1")
      assert(out(t).getAs[Long]("n_train") == tr.length)
      assert(out(t).getAs[Long]("n_test") == te.length)
      if (tr.nonEmpty && te.nonEmpty) {
        val cles = out(t).getAs[Double]("cles")
        assert(cles >= 0.0 && cles <= 1.0)
        assert(cles == r(6)(u1x2.toDouble / (2.0 * tr.length * te.length)))
      }
    }
  }

  test("Q278 3-core: profile is monotone, stabilizes honestly, and the fixpoint is a true 3-core") {
    val rows = Graphs.q278(spark, dir).collect()
    assert(rows.length == 13)
    val byRound = rows.map(r => r.getAs[Long]("round") -> r).toMap
    // monotone non-increasing alive counts; edges shrink with nodes
    (1L to 12L).foreach { r =>
      assert(byRound(r).getAs[Long]("n_alive") <=
        byRound(r - 1).getAs[Long]("n_alive"), s"round $r grew")
      val phase = byRound(r).getAs[String]("phase")
      val stable =
        byRound(r).getAs[Long]("n_alive") == byRound(r - 1).getAs[Long]("n_alive")
      assert(phase == (if (stable) "stable" else "peeling"), s"round $r phase")
    }
    assert(byRound(0L).getAs[String]("phase") == "init")
    // if the walk stabilized, every surviving node must have >= 3 alive
    // neighbors — recompute the final alive set independently
    if (byRound(12L).getAs[String]("phase") == "stable") {
      val e = graft.operators.Derived.coOrderPairCounts(spark, dir)
        .select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      var alive = (e.map(_._1) ++ e.map(_._2)).toSet
      var changed = true
      var rounds = 0
      while (changed && rounds < 12) {
        val deg = (e.filter(p => alive(p._1) && alive(p._2))
          .flatMap(p => Seq(p._1, p._2)))
          .groupBy(identity).map { case (k, v) => k -> v.length }
        val next = alive.filter(n => deg.getOrElse(n, 0) >= 3)
        changed = next != alive
        alive = next
        rounds += 1
      }
      assert(byRound(12L).getAs[Long]("n_alive") == alive.size,
        "fixpoint alive-set size mismatch vs local peeling")
      val fe = e.count(p => alive(p._1) && alive(p._2))
      assert(byRound(12L).getAs[Long]("n_edges_alive") == fe)
    }
  }

  test("Q279 weekly profile: shares sum to ~1, ranks are a permutation, totals reconcile") {
    val grid = localGrid()
    val out = Trend.q279(spark, dir).collect()
    out.groupBy(_.getString(0)).foreach { case (t, rows) =>
      val ranks = rows.map(_.getAs[Long]("rk")).sorted
      assert(ranks.sameElements(1L to rows.length.toLong),
        s"$t: ranks not a permutation")
      val sTot = rows.map(_.getAs[Long]("s")).sum
      assert(sTot == grid(t).map(_._2).sum, s"$t: totals reconcile")
      if (sTot > 0) {
        val shareSum = rows.map(_.getAs[Double]("share")).sum
        assert(math.abs(shareSum - 1.0) < 1e-4, s"$t: shares sum to $shareSum")
      }
      val nDays = rows.map(_.getAs[Long]("n_days")).sum
      assert(nDays == grid(t).length)
    }
  }

  test("Q280 Gini: matches the local rank formulation and sits in [0, 1)") {
    val c = Catalog(spark, dir)
    val ux = c.events
      .select(col("event_type"), col("user_id"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("cents")).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = Trend.q280(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    ux.groupBy(_._1).foreach { case (t, rows) =>
      val xs = rows.filter(_._3 > 0).sortBy(r => (r._3, r._2)).map(_._3)
      if (xs.nonEmpty) {
        val n = xs.length.toLong
        val sTot = xs.sum
        val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
        val gini = (2.0 * six - (n + 1).toDouble * sTot) / (n.toDouble * sTot)
        assert(out(t).getAs[Double]("gini") == r(6)(gini), s"$t: gini")
        val g = out(t).getAs[Double]("gini")
        assert(g >= 0.0 && g < 1.0, s"$t: gini out of range: $g")
        val k = math.max(n / 10, 1L).toInt
        val sTop = xs.takeRight(k).sum
        assert(out(t).getAs[Double]("top_decile_share") ==
          r(6)(sTop.toDouble / sTot), s"$t: top share")
      }
    }
  }

  test("Q282 runs test: R replays from local residual signs") {
    val grid = localGrid()
    val out = Trend.q282(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    grid.foreach { case (t, series) =>
      val n = series.length.toLong
      val ts = series.map(_._1)
      val dmin = ts.min
      val xs = series.map(p => p._1 - dmin)
      val vs = series.map(_._2)
      val sx = xs.sum; val sy = vs.sum
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(vs).map { case (x, v) => x * v }.sum
      val d = n * sxx - sx * sx
      val bn = n * sxy - sx * sy
      val an = sy * d - bn * sx
      val signs = xs.zip(vs)
        .map { case (x, v) => n * d * v - an - n * bn * x }
        .filter(_ != 0L).map(e => if (e > 0) 1 else -1)
      val runs =
        if (signs.isEmpty) 0L
        else 1L + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      val row = out(t)
      assert(row.getAs[Long]("n_pos") == signs.count(_ == 1), s"$t: n_pos")
      assert(row.getAs[Long]("n_neg") == signs.count(_ == -1), s"$t: n_neg")
      assert(row.getAs[Long]("r_runs") == runs, s"$t: runs")
    }
  }

  test("Q283 mean-rank audit: group mean ranks replay from the global pooled ranking") {
    val c = Catalog(spark, dir)
    val ev = c.events
      .select(col("event_type"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val all = ev.map(_._2).sorted
    // doubled midrank of value v = 2*(# strictly smaller) + (# equal) + 1
    val below = all.groupBy(identity).map { case (v, g) =>
      v -> (all.count(_ < v).toLong, g.length.toLong) }
    val out = Trend.q283(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = all.length.toLong
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val r2sum = rows.map { case (_, v) =>
        val (cum, cc) = below(v); 2 * cum + cc + 1 }.sum
      val nj = rows.length.toLong
      assert(out(t).getAs[Long]("n_values") == nj)
      assert(out(t).getAs[Long]("n") == n)
      assert(out(t).getAs[Double]("mean_rank") ==
        r(4)(r2sum.toDouble / (2 * nj)), s"$t: mean rank")
    }
    // mean ranks must straddle the global expectation (n+1)/2
    val means = out.values.map(_.getAs[Double]("mean_rank"))
    assert(means.min <= (n + 1) / 2.0 && means.max >= (n + 1) / 2.0)
  }

  test("Q284 BH: p is the A&S polynomial of z, and the rejection set is exactly ranks <= k*") {
    val out = Trend.q284(spark, dir).collect()
    val tested = out.filter(_.getAs[java.lang.Double]("z") != null)
    assert(tested.nonEmpty)
    tested.foreach { row =>
      val z = row.getAs[Double]("z")
      val x = math.abs(z) / math.sqrt(2.0)
      val u = 1.0 / (1.0 + 0.3275911 * x)
      val p = ((((1.061405429 * u - 1.453152027) * u + 1.421413741) * u
        - 0.284496736) * u + 0.254829592) * u * math.exp(-(x * x))
      assert(row.getAs[Double]("p") == r(6)(p), "A&S p mismatch")
      assert(row.getAs[Double]("p") > 0 && row.getAs[Double]("p") <= 1)
    }
    val m = tested.head.getAs[Long]("n_tests")
    assert(m == tested.length)
    val kstar = Option(tested.head.getAs[java.lang.Long]("kstar"))
    tested.foreach { row =>
      val rejected = row.getAs[String]("verdict") == "shifted_fdr10"
      val k = row.getAs[Long]("p_rank")
      assert(rejected == kstar.exists(ks => k <= ks),
        s"BH coherence at rank $k")
      // every rejected rank satisfies its own fence only at k*; the
      // defining property: p_(k*) <= 0.1*k*/m
      if (kstar.contains(k))
        assert(row.getAs[Double]("p") * 10 * m <= k)
    }
  }

  test("Q285 median CI: rank picks replay from the sorted daily values") {
    val grid = localGrid()
    val out = Trend.q285(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    grid.foreach { case (t, series) =>
      val vs = series.map(_._2).sorted
      val n = vs.length
      val lo = math.max(1L,
        math.floor((n - 1.96 * math.sqrt(n.toDouble)) / 2).toLong)
      val hi = math.min(n.toLong,
        math.ceil(1 + (n + 1.96 * math.sqrt(n.toDouble)) / 2).toLong)
      val row = out(t)
      assert(row.getAs[Long]("median_cents") == vs((n + 1) / 2 - 1),
        s"$t: median")
      assert(row.getAs[Long]("ci_lo_cents") == vs(lo.toInt - 1), s"$t: lo")
      assert(row.getAs[Long]("ci_hi_cents") == vs(hi.toInt - 1), s"$t: hi")
      assert(row.getAs[Long]("ci_lo_cents") <=
        row.getAs[Long]("median_cents") &&
        row.getAs[Long]("median_cents") <= row.getAs[Long]("ci_hi_cents"))
    }
  }

  test("Q289 Heaps profile: dyadic prefix vocabularies replay from doc_id order") {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("source"), col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val out = graft.operators.TextAnalysis.q289(spark, dir).collect()
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val ordered = docs.filter(_._1 == src).sortBy(_._2)
      rows.foreach { r =>
        val np = r.getAs[Long]("n_prefix")
        val vocab = ordered.take(np.toInt)
          .flatMap(_._3.split(" ")).filter(_.nonEmpty).distinct.length
        assert(r.getAs[Long]("vocab") == vocab, s"$src k=${r.getAs[Long]("k")}")
        assert(np == (1L << r.getAs[Long]("k")))
      }
      // verdict only on the last level; betas are log2 ratios
      val byK = rows.sortBy(_.getAs[Long]("k"))
      byK.sliding(2).foreach {
        case Array(a, b) =>
          val exp = r(4)(math.log(b.getAs[Long]("vocab").toDouble /
            a.getAs[Long]("vocab")) / math.log(2))
          assert(b.getAs[Double]("beta") == exp)
        case _ =>
      }
      assert(byK.init.forall(_.getAs[String]("verdict") == null))
      assert(byK.last.getAs[String]("verdict") != null)
    }
  }

  test("Q290 burstiness: the VMR formula replays for every reported token") {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dTot = docs.length.toLong
    val counts = docs.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).map(tok => (tok, id)) }
      .groupBy(identity).map { case ((tok, id), g) => (tok, id, g.length.toLong) }
    val out = graft.operators.TextAnalysis.q290(spark, dir).collect()
    assert(out.length <= 20 && out.nonEmpty)
    val byTok = counts.groupBy(_._1)
    out.foreach { r =>
      val tok = r.getString(0)
      val cs = byTok(tok).map(_._3).toSeq
      val df = cs.length.toLong
      val n = cs.sum
      val ss = cs.map(x => x * x).sum
      assert(r.getAs[Long]("df") == df)
      assert(r.getAs[Long]("n_occurrences") == n)
      assert(r.getAs[Double]("burstiness") ==
        this.r(4)((dTot * ss - n * n).toDouble / (dTot * n)), s"token $tok")
      assert(df >= 5)
    }
    // descending by burstiness with token tie-break
    val bs = out.map(r => (r.getAs[Double]("burstiness"), r.getString(0)))
    assert(bs.sliding(2).forall {
      case Array((b1, t1), (b2, t2)) => b1 > b2 || (b1 == b2 && t1 < t2)
      case _ => true
    })
  }

  test("Q291 overdispersion: VMR and z replay from local daily counts") {
    val c = Catalog(spark, dir)
    val days = c.events.select(col("event_type"),
      expr("(ts DIV 1000) DIV 86400000000").as("day")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val dmin = days.map(_._2).min; val dmax = days.map(_._2).max
    val out = graft.operators.Trend.q291(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    days.groupBy(_._1).foreach { case (t, rows) =>
      val byDay = rows.groupBy(_._2).map { case (d, g) => d -> g.length.toLong }
      val ys = (dmin to dmax).map(d => byDay.getOrElse(d, 0L))
      val n = ys.length.toLong; val sy = ys.sum
      val syy = ys.map(y => y * y).sum
      val row = out(t)
      assert(row.getAs[Long]("n_days") == n)
      assert(row.getAs[Long]("n_events") == sy)
      val vmr = (n * syy - sy * sy).toDouble / ((n - 1) * sy)
      assert(row.getAs[Double]("vmr") == r(4)(vmr), s"$t vmr")
      assert(row.getAs[Double]("z") ==
        r(4)((vmr - 1) * math.sqrt((n - 1).toDouble / 2)), s"$t z")
    }
  }

  test("Q292 gap CV: cv2 replays from the totally ordered gap sequence") {
    val c = Catalog(spark, dir)
    val ev = c.events.select(col("event_type"),
      expr("(ts DIV 1000) DIV 1000000").as("s"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = graft.operators.Trend.q292(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val ss = rows.sortBy(p => (p._2, p._3)).map(_._2).toSeq
      val gaps: Seq[Long] = ss.zip(ss.drop(1)).map { case (a, b) => b - a }
      val n = gaps.length.toLong; val sg = gaps.sum
      val sgg = gaps.map(g => g * g).sum
      val row = out(t)
      assert(row.getAs[Long]("n_gaps") == n)
      if (sg > 0) {
        assert(row.getAs[Double]("cv2") ==
          r(4)((n * sgg - sg * sg).toDouble / (sg.toDouble * sg)), s"$t cv2")
        val pois = 10 * math.abs(n * sgg - 2 * sg * sg) <= sg * sg
        if (pois) assert(row.getAs[String]("verdict") == "poisson_like")
      }
    }
  }

  test("Q281 CUSUM: alarm decision replays exactly from the local grid") {
    val grid = localGrid()
    val out = Trend.q281(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    grid.foreach { case (t, series) =>
      val n = series.length.toLong
      val nCal = n / 2
      val row = out(t)
      assert(row.getAs[Long]("n_days") == n)
      assert(row.getAs[Long]("n_cal") == nCal)
      if (nCal >= 1) {
        val cal = series.take(nCal.toInt)
        val sCal = cal.map(_._2).sum
        val mad = cal.map(p => math.abs(nCal * p._2 - sCal)).sum
        assert(row.getAs[Long]("mad_scaled") == mad, s"$t: mad")
        var cu = 0L
        var maxAbs = 0L
        var alarm: Option[Long] = None
        series.drop(nCal.toInt).foreach { case (day, v) =>
          cu += nCal * v - sCal
          maxAbs = math.max(maxAbs, math.abs(cu))
          if (alarm.isEmpty && math.abs(cu) > 4 * mad) alarm = Some(day)
        }
        assert(row.getAs[Long]("max_abs_cusum") == maxAbs, s"$t: max cusum")
        assert(Option(row.getAs[java.lang.Long]("first_alarm_day"))
          .map(_.toLong) == alarm, s"$t: alarm day")
        val verdict = row.getAs[String]("verdict")
        if (nCal < 7) assert(verdict == "insufficient")
        else assert(verdict == (if (alarm.isDefined) "drift" else "stable"))
      }
    }
  }
}
