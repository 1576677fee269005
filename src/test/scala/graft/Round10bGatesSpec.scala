package graft

import org.apache.spark.sql.functions._
import graft.operators.{Behavior, NearDup, Profiling, Stats, TextRank, Trend}

/** Model pins for the round-10 continuation slate (Q293–Q299): each test
  * recomputes the gate's defining algorithm from first principles on
  * sf0.001 (driver-shaped but independent code paths — sequential PAVA
  * vs the engine's minimax joins, brute-force ECDF integration vs the
  * windowed pair relation, direct normal-equation OLS vs the shared-text
  * closed forms) and compares. The cross-engine hash gate stays the
  * DuckDB oracle; these pin the MODEL.
  */
class Round10bGatesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def r(k: Int)(x: Double): Double =
    BigDecimal(java.lang.Double.toString(x))
      .setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Zero-filled daily cents series per type, recomputed independently. */
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
    daily.groupBy(_._1).map { case (t, rows) =>
      val m = rows.map(r => r._2 -> r._3).toMap
      t -> (dmin to dmax).map(d => (d, m.getOrElse(d, 0L)))
    }
  }

  test("Q296 isotonic: minimax join output equals sequential PAVA") {
    val grid = localGrid()
    val out = Trend.q296(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        r.getAs[Double]("fit_cents")).toMap
    assert(out.nonEmpty)
    grid.foreach { case (t, series) =>
      // Sequential pool-adjacent-violators: stack of (sum, count) blocks,
      // merging while the left neighbor's mean exceeds the new block's.
      var blocks = List.empty[(Long, Long)] // (sum, n), head = rightmost
      series.foreach { case (_, v) =>
        var cur = (v, 1L)
        while (blocks.nonEmpty && {
          val (s0, n0) = blocks.head
          s0.toDouble / n0 >= cur._1.toDouble / cur._2
        }) {
          val (s0, n0) = blocks.head
          blocks = blocks.tail
          cur = (s0 + cur._1, n0 + cur._2)
        }
        blocks = cur :: blocks
      }
      val fits = blocks.reverse.flatMap { case (s, n) =>
        Seq.fill(n.toInt)(s.toDouble / n)
      }
      series.zip(fits).foreach { case ((day, _), f) =>
        assert(out((t, day)) == r(4)(f), s"$t day $day: PAVA mismatch")
      }
      // Isotonicity of the emitted fit itself.
      val emitted = series.map { case (day, _) => out((t, day)) }
      assert(emitted.zip(emitted.tail).forall { case (a, b) => a <= b },
        s"$t: fit not monotone")
    }
  }

  test("Q297 W1: exact earth-mover distance matches brute-force ECDF integration") {
    val c = Catalog(spark, dir)
    val vals = c.events
      .select(col("event_type"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    val out = Stats.q297(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.nonEmpty)
    for ((ta, va) <- vals; (tb, vb) <- vals if ta < tb) {
      val support = (va ++ vb).distinct.sorted
      val na = va.length.toLong
      val nb = vb.length.toLong
      var num = 0L
      support.zip(support.tail).foreach { case (x, nxt) =>
        val ca = va.count(_ <= x).toLong
        val cb = vb.count(_ <= x).toLong
        num += math.abs(ca * nb - cb * na) * (nxt - x)
      }
      val row = out((ta, tb))
      assert(row.getAs[Long]("w1_num") == num, s"($ta,$tb): W1 numerator")
      assert(row.getAs[Double]("w1_cents") ==
        r(6)(num.toDouble / (na.toDouble * nb)), s"($ta,$tb): W1")
    }
  }

  test("Q298 Granger: closed-form F matches a direct two-regressor OLS") {
    val grid = localGrid()
    val out = Behavior.q298(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.nonEmpty)
    for ((tc, cs) <- grid; (te, es) <- grid if tc != te) {
      val y = es.tail.map(_._2.toDouble)
      val x1 = es.init.map(_._2.toDouble)
      val x2 = cs.init.map(_._2.toDouble)
      val m = y.length
      def mean(s: Seq[Double]) = s.sum / m
      val (my, m1, m2) = (mean(y), mean(x1), mean(x2))
      def cc(a: Seq[Double], ma: Double, b: Seq[Double], mb: Double) =
        a.zip(b).map { case (u, w) => (u - ma) * (w - mb) }.sum
      val (c11, c22, c12) =
        (cc(x1, m1, x1, m1), cc(x2, m2, x2, m2), cc(x1, m1, x2, m2))
      val (c1y, c2y, cyy) =
        (cc(x1, m1, y, my), cc(x2, m2, y, my), cc(y, my, y, my))
      val rssR = cyy - c1y * c1y / c11
      val d = c11 * c22 - c12 * c12
      val b1 = (c1y * c22 - c2y * c12) / d
      val b2 = (c2y * c11 - c1y * c12) / d
      val rssF = cyy - b1 * c1y - b2 * c2y
      val f = (rssR - rssF) * (m - 3) / rssF
      val row = out((tc, te))
      assert(row.getAs[Long]("n") == m)
      // Independent float path (centered doubles vs m-scaled exact ints):
      // agree to 1e-6 relative, and the ROUNDED beta agrees at ~1e-4.
      val beta = row.getAs[Double]("beta_cause")
      assert(math.abs(beta - b2) <= 1e-4 * (1 + math.abs(b2)),
        s"($tc->$te): beta $beta vs $b2")
      val fOut = row.getAs[Double]("f_stat")
      assert(math.abs(fOut - f) <= 1e-3 * (1 + math.abs(f)),
        s"($tc->$te): F $fOut vs $f")
    }
  }

  test("Q295 Simpson screen: signs match direct covariance computation") {
    val c = Catalog(spark, dir)
    val li = c.lineitem.select(col("l_returnflag"),
        expr("CAST(ROUND(l_discount * 100, 0) AS LONG)").as("x"),
        col("l_quantity").cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def sign(rows: Seq[(Long, Long)]): Int = {
      val n = rows.length.toLong
      val sx = rows.map(_._1).sum
      val sy = rows.map(_._2).sum
      val sxy = rows.map(p => p._1 * p._2).sum
      java.lang.Long.signum(n * sxy - sx * sy)
    }
    val overall = sign(li.map(t => (t._2, t._3)).toSeq)
    val perGroup = li.groupBy(_._1).values
      .map(g => sign(g.map(t => (t._2, t._3)).toSeq)).toSeq
    val row = Profiling.q295(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
      .apply("disc_qty_by_flag")
    assert(row.getAs[Long]("overall_sign") == overall.toLong)
    assert(row.getAs[Long]("n_pos") == perGroup.count(_ == 1).toLong)
    assert(row.getAs[Long]("n_neg") == perGroup.count(_ == -1).toLong)
    assert(row.getAs[Long]("n_zero") == perGroup.count(_ == 0).toLong)
    val verdict = row.getAs[String]("verdict")
    val (np, nn) = (perGroup.count(_ == 1), perGroup.count(_ == -1))
    val expect =
      if (overall == 1 && np == 0 && nn > 0) "paradox"
      else if (overall == -1 && nn == 0 && np > 0) "paradox"
      else if (np > 0 && nn > 0) "mixed" else "consistent"
    assert(verdict == expect)
  }

  test("Q299 safety stock: policy numbers match local zero-filled weekly moments") {
    val c = Catalog(spark, dir)
    val rows = c.lineitem
      .join(c.part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        expr("datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') DIV 7")
          .as("week"), col("l_quantity").cast("long").as("qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val weekly = rows.groupBy(t => (t._1, t._2)).map { case (k, g) =>
      k -> g.map(_._3).sum
    }
    val wmin = weekly.keys.map(_._2).min
    val wmax = weekly.keys.map(_._2).max
    val out = Profiling.q299(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.map(_._1).distinct.foreach { b =>
      val series = (wmin to wmax).map(w => weekly.getOrElse((b, w), 0L))
      val n = series.length.toLong
      val sq = series.sum
      val sqq = series.map(q => q * q).sum
      val mean = sq.toDouble / n
      val v = (n * sqq - sq * sq).toDouble / (n.toDouble * (n - 1))
      val row = out(b)
      assert(row.getAs[Long]("n_weeks") == n)
      assert(row.getAs[Long]("zero_weeks") == series.count(_ == 0).toLong)
      assert(row.getAs[Double]("mean_weekly") == r(4)(mean))
      assert(row.getAs[Double]("safety_stock") ==
        r(4)(1.645 * math.sqrt(2 * v)), s"$b: safety stock")
      assert(row.getAs[Double]("reorder_point") ==
        r(4)(2 * mean + 1.645 * math.sqrt(2 * v)), s"$b: ROP")
      assert(row.getAs[Double]("order_up_to") ==
        r(4)(3 * mean + 1.645 * math.sqrt(2 * v)), s"$b: OUT")
    }
  }

  test("Q293 FS linkage: weights and top pair scores match brute force") {
    val c = Catalog(spark, dir)
    val recs = c.part.select(col("p_name"), col("p_size"), col("p_brand"),
        col("p_type"),
        expr("CAST(ROUND(p_retailprice * 100, 0) AS LONG) DIV 1000").as("pb"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val n = recs.length.toLong
    def uNum[K](key: ((String, Int, String, String, Long)) => K): Long =
      recs.groupBy(key).values.map(g => { val c = g.length.toLong; c * c }).sum
    def wa(num: Long) =
      (math.log(0.9 * n.toDouble * n) - math.log(num.toDouble)) / math.log(2)
    def wd(num: Long) =
      (math.log(0.1 * n.toDouble * n) - math.log((n * n - num).toDouble)) /
        math.log(2)
    val (ub, ut, up) = (uNum(_._3), uNum(_._4), uNum(_._5))
    val profiles = recs.groupBy(identity).map { case (p, g) =>
      (p, g.length.toLong)
    }.toSeq
    val scored = for {
      ((pa, ca), ia) <- profiles.zipWithIndex
      ((pb, cb), ib) <- profiles.zipWithIndex
      if pa._1 == pb._1 && pa._2 == pb._2 && ia != ib
      pka = s"${pa._3}|${pa._4}|${pa._5}"
      pkb = s"${pb._3}|${pb._4}|${pb._5}"
      if pka < pkb
    } yield {
      val s = (if (pa._3 == pb._3) wa(ub) else wd(ub)) +
        (if (pa._4 == pb._4) wa(ut) else wd(ut)) +
        (if (pa._5 == pb._5) wa(up) else wd(up))
      (r(4)(s), pa._1, pa._2, pka, pkb, ca * cb)
    }
    val top = scored.sortBy(t => (-t._1, t._2, t._3, t._4, t._5)).take(30)
    val out = NearDup.q293(spark, dir).collect()
    assert(out.length == math.min(30, scored.size))
    out.zip(top).foreach { case (row, exp) =>
      assert(row.getAs[Double]("fs_score") == exp._1 &&
        row.getAs[String]("p_name") == exp._2 &&
        row.getAs[String]("profile_a") == exp._4 &&
        row.getAs[String]("profile_b") == exp._5 &&
        row.getAs[Long]("n_pairs") == exp._6,
        s"row mismatch: $row vs $exp")
    }
  }

  test("Q300 Chao1: spectrum, estimate and coverage match local recount") {
    val c = Catalog(spark, dir)
    val toks = c.documents.select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val out = operators.TextAnalysis.q300(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    toks.groupBy(_._1).foreach { case (s, ts) =>
      val freq = ts.groupBy(_._2).map(_._2.length)
      val (v, n1, n2, nt) =
        (freq.size.toLong, freq.count(_ == 1).toLong,
          freq.count(_ == 2).toLong, ts.length.toLong)
      val row = out(s)
      assert(row.getAs[Long]("vocab") == v && row.getAs[Long]("n1") == n1 &&
        row.getAs[Long]("n2") == n2 && row.getAs[Long]("n_tokens") == nt)
      assert(row.getAs[Double]("chao1") ==
        r(4)(v + n1.toDouble * (n1 - 1) / (2 * (n2 + 1))), s"$s: chao1")
      assert(row.getAs[Double]("coverage") ==
        r(6)((nt - n1).toDouble / nt), s"$s: coverage")
      val expect = if (5 * n1 * (n1 - 1) > 2 * (n2 + 1) * v) "undersampled"
        else "well_sampled"
      assert(row.getAs[String]("verdict") == expect)
    }
  }

  test("Q301 Gumbel: moment fit and return level match local block maxima") {
    val c = Catalog(spark, dir)
    val mx = c.events.select(col("event_type"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("cents")).as("mx")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val out = operators.Stats.q301(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    mx.groupBy(_._1).foreach { case (t, xs) =>
      val ms = xs.map(_._2)
      val n = ms.length.toLong
      val (sm, smm) = (ms.sum, ms.map(m => m * m).sum)
      val varS = (n * smm - sm * sm).toDouble / (n.toDouble * (n - 1))
      val beta = math.sqrt(6 * varS) / math.Pi
      val mu = sm.toDouble / n - 0.5772156649015329 * beta
      val rl = mu - beta * math.log(-math.log(29.0 / 30))
      val row = out(t)
      assert(row.getAs[Long]("n_blocks") == n)
      assert(row.getAs[Double]("beta") == r(4)(beta), s"$t: beta")
      assert(row.getAs[Double]("mu") == r(4)(mu), s"$t: mu")
      assert(row.getAs[Double]("rl30") == r(4)(rl), s"$t: rl30")
      assert(row.getAs[Long]("n_exceed") ==
        ms.count(_.toDouble > r(4)(rl)).toLong, s"$t: exceedances")
    }
  }

  test("Q302 hubness: k-occurrence histogram matches a local exact kNN graph") {
    val c = Catalog(spark, dir)
    val vecs = c.embeddings.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val occ = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    vecs.foreach { case (pid, pv) =>
      vecs.filter(_._1 != pid)
        .map { case (nid, nv) => (r(6)(cos(pv, nv)), nid) }
        .sortBy { case (cc, nid) => (-cc, nid) }
        .take(10)
        .foreach { case (_, nid) => occ(nid) += 1 }
    }
    val hist = vecs.map(v => occ(v._1)).groupBy(identity)
      .map { case (k, g) => k -> g.length.toLong }
    val out = operators.VectorOps.q302(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == hist, s"histogram: $out vs $hist")
  }

  test("Q303 Burrows Delta: marker z-profile distance matches local recount") {
    val c = Catalog(spark, dir)
    val toks = c.documents.select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val tf = toks.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val markers = tf.groupBy(_._1._2).map { case (t, g) => t -> g.values.sum }
      .toSeq.sortBy { case (t, ct) => (-ct, t) }.take(30).map(_._1)
    val sources = toks.map(_._1).distinct.sorted
    val tot = sources.map(s => s -> toks.count(_._1 == s).toLong).toMap
    val f = (for (s <- sources; w <- markers)
      yield (s, w) -> tf.getOrElse((s, w), 0L).toDouble / tot(s)).toMap
    val ns = sources.length
    val zOpt = markers.map { w =>
      val fs = sources.map(s => f((s, w)))
      val mu = fs.sum / ns
      val sigma = math.sqrt(fs.map(x => x * x).sum / ns - mu * mu)
      w -> (if (sigma > 0) Some(sources.map(s => s -> (f((s, w)) - mu) / sigma).toMap)
            else None)
    }.toMap
    val out = operators.TextAnalysis.q303(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    for (a <- sources; b <- sources if a < b) {
      val zs = markers.flatMap(w => zOpt(w).map(z => math.abs(z(a) - z(b))))
      val row = out((a, b))
      assert(row.getAs[Long]("n_markers") == zs.length.toLong)
      val delta = zs.sum / zs.length
      val got = row.getAs[Double]("delta")
      assert(math.abs(got - delta) <= 2e-4 * (1 + math.abs(delta)),
        s"($a,$b): delta $got vs $delta")
    }
  }

  test("Q304 elasticity: log-log slope matches local OLS per type") {
    val c = Catalog(spark, dir)
    val pts = c.lineitem.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .join(c.part, col("l_partkey") === col("p_partkey"))
      .select(col("p_type"),
        expr("CAST(ROUND(p_retailprice * 100, 0) AS LONG)").as("cents"),
        col("q")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = operators.Profiling.q304(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    pts.groupBy(_._1).foreach { case (t, g) =>
      val xy = g.map(p => (math.log(p._2.toDouble), math.log(p._3.toDouble)))
      val n = xy.length.toDouble
      val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
      val sxx = xy.map(p => p._1 * p._1).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val got = out(t).getAs[Double]("elasticity")
      assert(math.abs(got - slope) <= 2e-4 * (1 + math.abs(slope)),
        s"$t: slope $got vs $slope")
      assert(out(t).getAs[Long]("n_parts") == g.length.toLong)
    }
  }

  test("Q305 trigram memory: counts and lift match a local recount") {
    val c = Catalog(spark, dir)
    val seqs = c.events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).values
      .map(_.sortBy(t => (t._2, t._3)).map(_._4).toSeq)
    val tris = seqs.flatMap(_.sliding(3).filter(_.length == 3)
      .map(s => (s(0), s(1), s(2)))).toSeq
    val c123 = tris.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val c12 = tris.groupBy(t => (t._1, t._2)).map { case (k, g) => k -> g.length.toLong }
    val c23 = tris.groupBy(t => (t._2, t._3)).map { case (k, g) => k -> g.length.toLong }
    val c2 = tris.groupBy(_._2).map { case (k, g) => k -> g.length.toLong }
    val out = operators.Behavior.q305(spark, dir).collect()
    assert(out.length == math.min(20, c123.size))
    out.foreach { row =>
      val k = (row.getString(0), row.getString(1), row.getString(2))
      assert(row.getAs[Long]("c123") == c123(k), s"$k: support")
      val lift = c123(k).toDouble * c2(k._2) /
        (c12((k._1, k._2)).toDouble * c23((k._2, k._3)))
      assert(row.getAs[Double]("lift") == r(4)(lift), s"$k: lift")
    }
    // The emitted top-20 really is the support-ordered head.
    val minEmitted = out.map(_.getAs[Long]("c123")).min
    val dropped = c123.filterNot { case (k, _) =>
      out.exists(r => (r.getString(0), r.getString(1), r.getString(2)) == k)
    }
    assert(dropped.values.forall(_ <= minEmitted))
  }

  test("Q306 NCD: compression distances match a local LZ76 recount") {
    // Independent LZ76 phrase counter (Lempel & Ziv 1976 exhaustive
    // history): at each position, the longest copy of a prefix of the
    // remainder that starts strictly earlier extends the phrase by one.
    def lz76(s: String): Long = {
      var (pos, c) = (0, 0L)
      while (pos < s.length) {
        var best = 0
        var q = 0
        while (q < pos) {
          var l = 0
          while (pos + l < s.length && q + l < s.length &&
            s(q + l) == s(pos + l)) l += 1
          if (l > best) best = l
          q += 1
        }
        pos += math.min(best + 1, s.length - pos)
        c += 1
      }
      c
    }
    val grid = localGrid()
    val seqs = grid.map { case (t, series) =>
      t -> series.zip(series.tail).map { case ((_, pv), (_, v)) =>
        if (v > pv) 'u' else if (v < pv) 'd' else 'f'
      }.mkString
    }
    val out = operators.Stats.q306(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    for ((ta, sa) <- seqs; (tb, sb) <- seqs if ta < tb) {
      val (ca, cb) = (lz76(sa), lz76(sb))
      val cab = math.min(lz76(sa + sb), lz76(sb + sa))
      val ncd = (cab - math.min(ca, cb)).toDouble / math.max(ca, cb)
      val row = out((ta, tb))
      assert(row.getAs[Long]("c_a") == ca && row.getAs[Long]("c_b") == cb &&
        row.getAs[Long]("c_ab") == cab, s"($ta,$tb): phrase counts")
      assert(row.getAs[Double]("ncd") == r(4)(ncd), s"($ta,$tb): ncd")
    }
  }

  test("Q307 3-itemsets: supports and lift3 match a local basket recount") {
    val c = Catalog(spark, dir)
    val baskets = c.lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (ok, g) =>
        ok -> g.map(_._2).distinct.sorted.take(50)
      }
    val nOrders = baskets.size.toLong
    val item = baskets.values.flatten.groupBy(identity)
      .map { case (p, g) => p -> g.size.toLong }
    val trip = baskets.values.flatMap(_.combinations(3))
      .map(s => (s(0), s(1), s(2))).toSeq
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      .filter(_._2 >= 2)
    val out = operators.Graphs.q307(spark, dir).collect()
    assert(out.length == math.min(20, trip.size) && out.nonEmpty)
    out.foreach { row =>
      val k = (row.getLong(0), row.getLong(1), row.getLong(2))
      assert(row.getAs[Long]("n_all3") == trip(k), s"$k: support")
      val lift = trip(k).toDouble * nOrders * nOrders /
        (item(k._1).toDouble * item(k._2) * item(k._3))
      assert(row.getAs[Double]("lift3") == r(4)(lift), s"$k: lift3")
    }
    val minEmitted = out.map(_.getAs[Long]("n_all3")).min
    assert(trip.filterNot { case (k, _) =>
      out.exists(r => (r.getLong(0), r.getLong(1), r.getLong(2)) == k)
    }.values.forall(_ <= minEmitted))
  }

  test("Q308 LCS: native expression matches a local DP and its identities") {
    // Independent memoized recursion (not the two-row sweep the
    // expression uses).
    def lcsLocal(a: String, b: String): Long = {
      val memo = Array.fill(a.length + 1, b.length + 1)(-1L)
      def go(i: Int, j: Int): Long = {
        if (i == 0 || j == 0) 0L
        else if (memo(i)(j) >= 0) memo(i)(j)
        else {
          val v =
            if (a(i - 1) == b(j - 1)) go(i - 1, j - 1) + 1
            else math.max(go(i - 1, j), go(i, j - 1))
          memo(i)(j) = v; v
        }
      }
      go(a.length, b.length)
    }
    // Expression-level identities on deterministic pseudo-random strings.
    val rnd = new scala.util.Random(42)
    val strs = (1 to 12).map(_ =>
      (1 to (5 + rnd.nextInt(25))).map(_ => "udf"(rnd.nextInt(3))).mkString)
    strs.foreach { s =>
      assert(graft.plans.Lcs.length(s, s) == s.length.toLong)
      assert(graft.plans.Lcs.length(s, "") == 0L)
    }
    for (a <- strs; b <- strs) {
      assert(graft.plans.Lcs.length(a, b) == lcsLocal(a, b), s"($a,$b)")
      assert(graft.plans.Lcs.length(a, b) == graft.plans.Lcs.length(b, a))
    }
    // Gate pin: per-pair LCS and similarity over the direction strings.
    val grid = localGrid()
    val seqs = grid.map { case (t, series) =>
      t -> series.zip(series.tail).map { case ((_, pv), (_, v)) =>
        if (v > pv) 'u' else if (v < pv) 'd' else 'f'
      }.mkString
    }
    val out = operators.Stats.q308(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    for ((ta, sa) <- seqs; (tb, sb) <- seqs if ta < tb) {
      val l = lcsLocal(sa, sb)
      val row = out((ta, tb))
      assert(row.getAs[Long]("lcs") == l, s"($ta,$tb): lcs")
      assert(row.getAs[Double]("lcs_sim") ==
        r(4)(2.0 * l / (sa.length + sb.length)), s"($ta,$tb): sim")
    }
  }

  test("Q309 Haar ladder: per-level energies match a local pyramid") {
    val grid = localGrid()
    val out = operators.Trend.q309(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    grid.foreach { case (t, series) =>
      var cur = series.map(_._2)
      var totEsc = 0L
      val perLevel = (1 to 5).map { lvl =>
        val pairs = cur.grouped(2).toSeq
        val a0a1 = pairs.map(p => (p.head, if (p.length > 1) p(1) else 0L))
        cur = a0a1.map { case (x, y) => x + y }
        val ssq = a0a1.map { case (x, y) => (x - y) * (x - y) }.sum
        totEsc += ssq * math.pow(4, 5 - lvl).toLong
        (lvl, a0a1.length.toLong, ssq)
      }
      perLevel.foreach { case (lvl, nc, ssq) =>
        val row = out((t, lvl.toLong))
        assert(row.getAs[Long]("n_coeffs") == nc, s"$t L$lvl: n_coeffs")
        assert(row.getAs[Long]("ssq") == ssq, s"$t L$lvl: ssq")
        assert(row.getAs[Double]("energy") ==
          r(4)(ssq.toDouble / math.pow(4, lvl)), s"$t L$lvl: energy")
        if (totEsc > 0) {
          val esc = ssq * math.pow(4, 5 - lvl).toLong
          assert(row.getAs[Double]("energy_share") ==
            r(4)(esc.toDouble / totEsc), s"$t L$lvl: share")
        }
      }
      // shares sum to ~1 and exactly one dominant level is flagged
      val rows = (1 to 5).map(l => out((t, l.toLong)))
      assert(rows.map(_.getAs[Long]("is_dominant")).sum >= 1)
      val shareSum = rows.flatMap(r =>
        Option(r.getAs[java.lang.Double]("energy_share"))).map(_.toDouble).sum
      assert(math.abs(shareSum - 1.0) < 0.001, s"$t: shares sum $shareSum")
    }
  }

  test("Q310 Hodges-Lehmann: pseudo-median matches the brute-force Walsh median") {
    val grid = localGrid()
    val out = operators.Trend.q310(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    grid.foreach { case (t, series) =>
      val vs = series.map(_._2)
      val walsh = (for {
        i <- vs.indices; j <- vs.indices if j >= i
      } yield vs(i) + vs(j)).sorted
      val m = walsh.length
      val hl = (walsh((m + 1) / 2 - 1) + walsh(m / 2)).toDouble / 4
      val sorted = vs.sorted
      val n = sorted.length
      val med = (sorted((n + 1) / 2 - 1) + sorted(n / 2)).toDouble / 2
      val row = out(t)
      assert(row.getAs[Double]("hl_cents") == r(4)(hl), s"$t: HL")
      assert(row.getAs[Double]("median_cents") == r(4)(med), s"$t: median")
      assert(row.getAs[Double]("mean_cents") ==
        r(4)(vs.sum.toDouble / n), s"$t: mean")
    }
  }

  test("Q311 energy distance: collapsed-domain sums match brute-force pair enumeration") {
    val c = Catalog(spark, dir)
    val vals = c.events
      .select(col("event_type"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    val out = operators.Stats.q311(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    def apsum(a: Seq[Long], b: Seq[Long]): Long =
      a.map(x => b.map(y => math.abs(x - y)).sum).sum
    for ((ta, va) <- vals; (tb, vb) <- vals if ta < tb) {
      val (sxy, sxx, syy) = (apsum(va, vb), apsum(va, va), apsum(vb, vb))
      val (na, nb) = (va.length.toLong, vb.length.toLong)
      val row = out((ta, tb))
      assert(row.getAs[Long]("sxy") == sxy && row.getAs[Long]("sxx") == sxx
        && row.getAs[Long]("syy") == syy, s"($ta,$tb): pair sums")
      val e = 2.0 * sxy / (na.toDouble * nb) - sxx.toDouble / (na.toDouble * na) -
        syy.toDouble / (nb.toDouble * nb)
      assert(row.getAs[Double]("e_cents") == r(6)(e), s"($ta,$tb): energy")
      // nonnegativity of the population statistic's estimator form
      assert(row.getAs[Double]("e_cents") >= 0, s"($ta,$tb): negative energy")
    }
  }

  test("Q312 Kendall tau-b: cell-join C/D/ties match a direct nested-loop count") {
    val c = Catalog(spark, dir)
    val rows = c.lineitem
      .select(round(col("l_quantity")).cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_tax") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val measures = Map(
      "qty_disc" -> rows.map(t => (t._1, t._2)),
      "qty_tax" -> rows.map(t => (t._1, t._3)),
      "disc_tax" -> rows.map(t => (t._2, t._3)))
    val out = Stats.q312(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == measures.keySet)
    measures.foreach { case (pair, xs) =>
      // Independent path: contingency cells + direct nested-loop cell
      // enumeration (the engine uses a broadcast self-join).
      val cells = xs.groupBy(identity).map { case (k, g) =>
        (k._1, k._2, g.length.toLong)
      }.toSeq
      var conc = 0L; var disc = 0L
      for ((xa, ya, ca) <- cells; (xb, yb, cb) <- cells if xa < xb) {
        if (ya < yb) conc += ca * cb
        else if (ya > yb) disc += ca * cb
      }
      val n = xs.length.toLong
      val n0 = n * (n - 1) / 2
      def ties(sel: ((Long, Long)) => Long): Long =
        xs.groupBy(sel).values.map { g =>
          val t = g.length.toLong; t * (t - 1) / 2
        }.sum
      val (tx, ty) = (ties(_._1), ties(_._2))
      val row = out(pair)
      assert(row.getAs[Long]("n") == n && row.getAs[Long]("n0") == n0,
        s"$pair: n/n0")
      assert(row.getAs[Long]("concordant") == conc &&
        row.getAs[Long]("discordant") == disc, s"$pair: C/D")
      assert(row.getAs[Long]("tied_x") == tx &&
        row.getAs[Long]("tied_y") == ty, s"$pair: ties")
      val tau = (conc - disc).toDouble /
        math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
      assert(row.getAs[Double]("tau_b") == r(6)(tau), s"$pair: tau_b")
      // τ-b is a correlation: bounded to [-1, 1]
      assert(math.abs(row.getAs[Double]("tau_b")) <= 1.0, s"$pair: range")
    }
  }

  test("Q313 Cramer-von Mises: window-pass U matches direct ECDF evaluation") {
    val c = Catalog(spark, dir)
    val vals = c.events
      .select(col("event_type"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    val out = operators.Stats.q313(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    for ((ta, va) <- vals; (tb, vb) <- vals if ta < tb) {
      val (n, m) = (va.length.toLong, vb.length.toLong)
      // Direct: evaluate both ECDF counts at every pooled observation.
      def cumAt(sorted: Seq[Long], x: Long): Long =
        sorted.count(_ <= x).toLong
      val u = (va ++ vb).map { x =>
        val d = m * cumAt(va, x) - n * cumAt(vb, x)
        BigInt(d) * BigInt(d)
      }.sum
      val row = out((ta, tb))
      assert(row.getAs[Long]("n_a") == n && row.getAs[Long]("n_b") == m,
        s"($ta,$tb): sizes")
      assert(row.getAs[Double]("sum_w_d2") == u.toDouble, s"($ta,$tb): U")
      val t = u.toDouble / (n.toDouble * m * (n + m) * (n + m))
      assert(row.getAs[Double]("t_cvm") == r(6)(t), s"($ta,$tb): T")
      assert(row.getAs[Double]("t_cvm") >= 0, s"($ta,$tb): nonneg")
    }
  }

  test("Q314 Mood median test: counts and residuals match a direct dichotomization") {
    val c = Catalog(spark, dir)
    val vals = c.events
      .select(col("event_type"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val all = vals.map(_._2).sorted
    val gm = all((all.length + 1) / 2 - 1) // exact lower median
    val byType = vals.groupBy(_._1).map { case (t, xs) =>
      val vs = xs.map(_._2)
      t -> (vs.count(_ > gm).toLong, vs.count(_ < gm).toLong,
        vs.count(_ == gm).toLong)
    }
    val ta = byType.values.map(_._1).sum
    val tb = byType.values.map(_._2).sum
    val nn = ta + tb
    val out = operators.Stats.q314(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == byType.keySet)
    byType.foreach { case (t, (oa, ob, ot)) =>
      val row = out(t)
      assert(row.getAs[Long]("grand_median_cents") == gm, s"$t: median")
      assert(row.getAs[Long]("n_above") == oa &&
        row.getAs[Long]("n_below") == ob &&
        row.getAs[Long]("n_ties") == ot, s"$t: counts")
      val nt = oa + ob
      val z = (nn * oa - nt * ta).toDouble /
        math.sqrt(nt.toDouble * ta * tb * (nn - nt) / nn)
      assert(row.getAs[Double]("z_med") == r(4)(z), s"$t: z")
    }
    // the above-median residuals balance: sum of numerators is zero
    val numSum = byType.values.map { case (oa, ob, _) =>
      nn * oa - (oa + ob) * ta
    }.sum
    assert(numSum == 0L, "residual numerators must sum to zero")
  }

  test("Q315 turning points: extrema counts and z match a sequential scan") {
    val grid = localGrid()
    val out = operators.Trend.q315(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == grid.keySet)
    grid.foreach { case (t, series) =>
      val vs = series.map(_._2)
      val n = vs.length
      var peaks = 0L; var troughs = 0L; var flat = 0L
      for (i <- 1 until n - 1) {
        if (vs(i) > vs(i - 1) && vs(i) > vs(i + 1)) peaks += 1
        else if (vs(i) < vs(i - 1) && vs(i) < vs(i + 1)) troughs += 1
        else if (vs(i) == vs(i - 1) || vs(i) == vs(i + 1)) flat += 1
      }
      val row = out(t)
      assert(row.getAs[Long]("n_days") == n.toLong, s"$t: n")
      assert(row.getAs[Long]("n_peaks") == peaks &&
        row.getAs[Long]("n_troughs") == troughs &&
        row.getAs[Long]("n_flat") == flat, s"$t: extrema")
      val tp = peaks + troughs
      val z = (3 * tp - 2L * (n - 2)).toDouble /
        (3 * math.sqrt((16.0 * n - 29) / 90))
      assert(row.getAs[Double]("z") == r(4)(z), s"$t: z")
    }
  }

  test("Q316 partial correlation: matrix identities match a direct BigInt computation") {
    val c = Catalog(spark, dir)
    val rows = c.lineitem
      .select(round(col("l_quantity")).cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_tax") * 100).cast("long"))
      .collect().map(r => Map("qty" -> r.getLong(0), "disc" -> r.getLong(1),
        "tax" -> r.getLong(2)))
    val n = BigInt(rows.length)
    def s(m: String): BigInt = rows.map(r => BigInt(r(m))).sum
    def sp(a: String, b: String): BigInt =
      rows.map(r => BigInt(r(a)) * r(b)).sum
    def cAb(a: String, b: String): Double =
      (n * sp(a, b) - s(a) * s(b)).toDouble
    val out = operators.Stats.q316(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    for ((x, y, z) <- Seq(("qty", "disc", "tax"), ("qty", "tax", "disc"),
      ("disc", "tax", "qty"))) {
      val row = out((x, y))
      assert(row.getAs[String]("control") == z)
      val rxy = cAb(x, y) / math.sqrt(cAb(x, x) * cAb(y, y))
      assert(row.getAs[Double]("r_xy") == r(4)(rxy), s"($x,$y): r")
      val num = cAb(x, y) * cAb(z, z) - cAb(x, z) * cAb(y, z)
      val dx = cAb(x, x) * cAb(z, z) - cAb(x, z) * cAb(x, z)
      val dy = cAb(y, y) * cAb(z, z) - cAb(y, z) * cAb(y, z)
      val part = num / math.sqrt(dx * dy)
      assert(row.getAs[Double]("r_partial") == r(4)(part), s"($x,$y): partial")
      assert(math.abs(row.getAs[Double]("r_partial")) <= 1.0, s"($x,$y): range")
    }
  }

  test("Q317 rich club: rungs match a brute-force degree filter") {
    val edges = operators.Derived.coOrderPairCounts(spark, dir)
      .filter(col("n_pairs") >= 2).select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (n, g) => n -> g.length.toLong }
    val nn = deg.size.toLong
    val ee = edges.length.toLong
    val out = operators.Graphs.q317(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 4L, 8L, 16L, 32L))
    for (k <- Seq(1L, 2L, 4L, 8L, 16L, 32L)) {
      val rich = deg.filter(_._2 > k).keySet
      val eRich = edges.count(e => rich(e._1) && rich(e._2)).toLong
      val row = out(k)
      assert(row.getAs[Long]("n_rich") == rich.size.toLong, s"k=$k: N")
      assert(row.getAs[Long]("e_rich") == eRich, s"k=$k: E")
      assert(row.getAs[Long]("n_nodes") == nn &&
        row.getAs[Long]("n_edges") == ee, s"k=$k: totals")
      if (rich.size >= 2)
        assert(row.getAs[Double]("phi") ==
          r(6)(2.0 * eRich / (rich.size.toDouble * (rich.size - 1))),
          s"k=$k: phi")
      else assert(row.getAs[String]("verdict") == "degenerate")
    }
  }

  test("Q318 flow asymmetry: pair counts match a per-user sequential scan") {
    val c = Catalog(spark, dir)
    val journeys = c.events
      .select(col("user_id"), expr("ts DIV 1000").as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (_, xs) => xs.sortBy(t => (t._2, t._3)).map(_._4).toSeq }
    val counts = scala.collection.mutable.Map
      .empty[(String, String), (Long, Long)].withDefaultValue((0L, 0L))
    journeys.foreach { seq =>
      seq.sliding(2).foreach {
        case Seq(s, t) if s != t =>
          val key = if (s < t) (s, t) else (t, s)
          val (f, b) = counts(key)
          counts(key) = if (s < t) (f + 1, b) else (f, b + 1)
        case _ =>
      }
    }
    val out = operators.Behavior.q318(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == counts.filter(c => c._2._1 + c._2._2 > 0).keySet)
    counts.foreach { case (key, (f, b)) =>
      val row = out(key)
      assert(row.getAs[Long]("n_fwd") == f &&
        row.getAs[Long]("n_bwd") == b, s"$key: counts")
      val z = (f - b).toDouble / math.sqrt((f + b).toDouble)
      assert(row.getAs[Double]("z") == r(4)(z), s"$key: z")
    }
  }

  test("Q319 crosstab residuals: cells match a direct contingency computation") {
    val c = Catalog(spark, dir)
    val obs = c.lineitem.select(col("l_returnflag"), col("l_linestatus"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val nn = obs.length.toLong
    val cells = obs.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val rowT = obs.groupBy(_._1).map { case (k, g) => k -> g.length.toLong }
    val colT = obs.groupBy(_._2).map { case (k, g) => k -> g.length.toLong }
    val out = operators.Reshape.q319(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == cells.keySet)
    var chi2 = 0.0
    cells.foreach { case ((rf, ls), o) =>
      val row = out((rf, ls))
      val (rr, cc) = (rowT(rf), colT(ls))
      assert(row.getAs[Long]("n_obs") == o &&
        row.getAs[Long]("row_total") == rr &&
        row.getAs[Long]("col_total") == cc, s"($rf,$ls): counts")
      val e = rr.toDouble * cc / nn
      assert(row.getAs[Double]("expected") == r(4)(e), s"($rf,$ls): E")
      val num = (nn * o - rr * cc).toDouble
      assert(row.getAs[Double]("chi2_part") ==
        r(4)(num * num / (nn.toDouble * rr * cc)), s"($rf,$ls): chi2")
      val z = num / math.sqrt(rr.toDouble * cc * (nn - rr) * (nn - cc) / nn)
      assert(row.getAs[Double]("z_adj") == r(4)(z), s"($rf,$ls): z")
      chi2 += num * num / (nn.toDouble * rr * cc)
    }
    // adjusted residuals of a 2-column table are antisymmetric per row
    out.values.groupBy(_.getAs[String]("returnflag")).foreach { case (_, g) =>
      val zs = g.map(_.getAs[Double]("z_adj")).toSeq.sorted
      assert(math.abs(zs.sum) <= 2e-4, s"row residuals should cancel: $zs")
    }
  }

  test("Q320 SCD2 point-in-time audit: invariant holds and totals match direct recon") {
    val c = Catalog(spark, dir)
    val out = operators.Cdc.q320(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("verdict") == "consistent"),
      "every (asof, state) cell must reconcile")
    // independent check: per as-of day, total users with any observation
    // at or before it equals the summed per-state counts
    val obs = c.events
      .select(col("user_id"), expr("(ts DIV 1000) DIV 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byAsof = out.groupBy(_.getAs[Long]("asof_day"))
    byAsof.foreach { case (d, rows) =>
      val expected = obs.filter(_._2 <= d).map(_._1).distinct.length.toLong
      assert(rows.map(_.getAs[Long]("n_scd")).sum == expected, s"asof $d")
      assert(rows.map(_.getAs[Long]("n_direct")).sum == expected, s"asof $d direct")
    }
  }

  test("Q321 effective rank: trace identities match a direct covariance build") {
    val c = Catalog(spark, dir)
    val vecs = c.embeddings.select(col("label"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .groupBy(_._1).map { case (l, g) => l -> g.map(_._2) }
    val out = operators.VectorOps.q321(spark, dir).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == vecs.keySet)
    vecs.foreach { case (l, xs) =>
      val n = xs.length
      val d = xs.head.length
      val mu = Array.tabulate(d)(j => xs.map(_(j)).sum / n)
      def cov(j: Int, k: Int): Double =
        xs.map(x => x(j) * x(k)).sum / n - mu(j) * mu(k)
      val tr = (0 until d).map(j => cov(j, j)).sum
      val fro = (for (j <- 0 until d; k <- 0 until d) yield {
        val v = cov(j, k); v * v
      }).sum
      val row = out(l)
      assert(row.getAs[Long]("n_vecs") == n.toLong &&
        row.getAs[Long]("d") == d.toLong, s"$l: dims")
      assert(math.abs(row.getAs[Double]("tr_c") - tr) < 1e-3, s"$l: trace")
      assert(math.abs(row.getAs[Double]("fro_sq") - fro) < 1e-3, s"$l: frobenius")
      assert(math.abs(row.getAs[Double]("eff_rank") - tr * tr / fro) < 0.01,
        s"$l: eff_rank")
      // participation ratio is bounded by min(d, n) and >= 1
      val er = row.getAs[Double]("eff_rank")
      assert(er >= 1.0 && er <= math.min(d, n).toDouble, s"$l: PR bounds")
      // top-variance dim agrees with direct argmax (round-6 tiebreak)
      val vars = (0 until d).map(j => (j + 1, r(6)(cov(j, j))))
      val top = vars.minBy { case (p, v) => (-v, p) }
      assert(row.getAs[Long]("top_var_dim") == top._1.toLong, s"$l: top dim")
      assert(row.getAs[Double]("top_var") == top._2, s"$l: top var")
    }
  }

  test("Q322 two-NN intrinsic dimension: matches a direct neighbor scan") {
    val c = Catalog(spark, dir)
    val vecs = c.embeddings.select(col("label"), col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
      .groupBy(_._1)
    val out = operators.VectorOps.q322(spark, dir).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == vecs.keySet)
    // round-11 form: distances on the exact 2^20 integer grid (Q302
    // discipline), so ranks and ratios are int-exact in both engines
    def grid(v: Array[Double]): Array[Long] =
      v.map(x => math.floor(x * 1048576.0 + 0.5).toLong)
    vecs.foreach { case (l, members) =>
      val ratios = members.map { case (_, id, x) =>
        val xi = grid(x)
        val ds = members.filter(_._2 != id).map { case (_, oid, y) =>
          val yi = grid(y)
          val d2 = xi.zip(yi).map { case (a, b) => (a - b) * (a - b) }.sum
          (d2, oid)
        }.sortBy(identity)
        (ds(0)._1, ds(1)._1)
      }.filter(_._1 > 0)
      val lnsum = ratios.map { case (d1, d2) =>
        math.log(d2.toDouble / d1.toDouble) }.sum
      val id = 2.0 * ratios.length / lnsum
      val row = out(l)
      assert(row.getAs[Long]("n_vecs") == members.length.toLong, s"$l: n")
      assert(row.getAs[Long]("n_used") == ratios.length.toLong, s"$l: used")
      assert(math.abs(row.getAs[Double]("id_two_nn") - id) < 0.01, s"$l: ID")
      assert(row.getAs[Double]("id_two_nn") > 0, s"$l: positive")
    }
  }

  test("Q323 max drawdown: peak/trough/recovery match a sequential scan") {
    val grid = localGrid()
    val out = operators.Trend.q323(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == grid.keySet)
    grid.foreach { case (t, series) =>
      var runmax = Long.MinValue
      var maxDd = Long.MinValue
      var troughDay = 0L; var peak = 0L; var below = 0L
      series.foreach { case (day, v) =>
        runmax = math.max(runmax, v)
        val dd = runmax - v
        if (dd > 0) below += 1
        if (dd > maxDd) { maxDd = dd; troughDay = day; peak = runmax }
      }
      val recovered = series.exists { case (day, v) =>
        day >= troughDay && v >= peak
      }
      val row = out(t)
      assert(row.getAs[Long]("peak_cents") == peak, s"$t: peak")
      assert(row.getAs[Long]("trough_day") == troughDay, s"$t: trough")
      assert(row.getAs[Long]("max_dd_cents") == maxDd, s"$t: dd")
      assert(row.getAs[Long]("days_below_peak") == below, s"$t: below")
      assert(row.getAs[Double]("dd_share") ==
        r(6)(maxDd.toDouble / peak), s"$t: share")
      val expectVerdict =
        if (maxDd == 0) "monotone_peak"
        else if (recovered) "recovered" else "underwater"
      assert(row.getAs[String]("verdict") == expectVerdict, s"$t: verdict")
    }
  }

  test("Q324 reconciliation: buckets match a direct per-order rebuild") {
    val c = Catalog(spark, dir)
    val recon = c.lineitem
      .select(col("l_orderkey"),
        expr("CAST(ROUND(l_extendedprice * (1 - l_discount) * " +
          "(1 + l_tax) * 100, 0) AS BIGINT)").as("lc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val books = c.orders
      .select(col("o_orderkey"),
        expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").as("bc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val buckets = books.map { case (ok, book) =>
      recon.get(ok) match {
        case None => ("no_lines", 0L)
        case Some(rc) =>
          val ad = math.abs(book - rc)
          val b =
            if (ad == 0) "exact"
            else if (ad * 1000 <= book) "within_0_1pct"
            else if (ad * 100 <= book) "within_1pct"
            else if (ad * 10 <= book) "within_10pct"
            else "over_10pct"
          (b, ad)
      }
    }
    val out = operators.Quality.q324(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val grouped = buckets.groupBy(_._1)
    assert(out.keySet == grouped.keySet)
    grouped.foreach { case (b, g) =>
      val row = out(b)
      assert(row.getAs[Long]("n_orders") == g.length.toLong, s"$b: n")
      assert(row.getAs[Long]("total_abs_diff_cents") == g.map(_._2).sum,
        s"$b: sum")
      assert(row.getAs[Long]("max_abs_diff_cents") == g.map(_._2).max,
        s"$b: max")
      assert(row.getAs[Double]("share") ==
        r(6)(g.length.toDouble / books.length), s"$b: share")
    }
  }

  test("Q325 dissimilarity index: matches a direct composition comparison") {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("source"), col("lang"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1).map { case (s, g) =>
      s -> g.groupBy(_._2).map { case (l, h) => l -> h.length.toLong }
    }
    val out = operators.Profiling.q325(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val srcs = bySrc.keys.toSeq.sorted
    assert(out.size == srcs.size * (srcs.size - 1) / 2)
    for (a <- srcs; b <- srcs if a < b) {
      val (ca, cb) = (bySrc(a), bySrc(b))
      val (na, nb) = (ca.values.sum, cb.values.sum)
      val langs = (ca.keySet ++ cb.keySet).toSeq.sorted
      val gaps = langs.map(l =>
        l -> math.abs(ca.getOrElse(l, 0L) * nb - cb.getOrElse(l, 0L) * na))
      val d = gaps.map(_._2).sum.toDouble / (2.0 * na * nb)
      val row = out((a, b))
      assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("n_b") == nb,
        s"($a,$b): totals")
      assert(row.getAs[Double]("dissim") == r(6)(d), s"($a,$b): D")
      // D is a proper dissimilarity: in [0, 1]
      assert(d >= 0 && d <= 1, s"($a,$b): bounds")
      val topLang = gaps.maxBy(g => (g._2, g._1.map(-_.toInt).mkString))._1
      val expectTop = gaps.sortBy(g => (-g._2, g._1)).head._1
      assert(row.getAs[String]("top_lang") == expectTop, s"($a,$b): top $topLang")
    }
  }

  test("Q326 Kruskal-Wallis: H matches a direct midrank computation") {
    val c = Catalog(spark, dir)
    val vals = c.events
      .select(col("event_type"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = vals.length.toLong
    // pooled doubled midranks per distinct value
    val sorted = vals.map(_._2).groupBy(identity)
      .map { case (v, g) => v -> g.length.toLong }.toSeq.sortBy(_._1)
    var cum = 0L
    val r2 = sorted.map { case (v, w) =>
      cum += w; v -> (2 * cum - w + 1)
    }.toMap
    val byType = vals.groupBy(_._1)
    val srr = byType.values.map { g =>
      val r2j = g.map(x => r2(x._2)).sum
      r2j.toDouble * r2j / (4.0 * g.length)
    }.sum
    val h = 12.0 * srr / (n.toDouble * (n + 1)) - 3.0 * (n + 1)
    val t3 = sorted.map { case (_, w) => w * w * w - w }.sum
    val tieC = 1.0 - t3.toDouble / (n.toDouble * n * n - n)
    val row = operators.Stats.q326(spark, dir).collect().head
    assert(row.getAs[Long]("n_total") == n)
    assert(row.getAs[Long]("k_types") == byType.size.toLong)
    assert(row.getAs[Long]("sum_t3_minus_t") == t3)
    assert(row.getAs[Double]("h_stat") == r(4)(h))
    assert(row.getAs[Double]("tie_c") == r(6)(tieC))
    assert(row.getAs[Double]("h_adj") == r(4)(h / tieC))
    assert(h >= 0, "H is nonnegative")
  }

  test("Q327 ABC classification: bands match a sequential cumulative scan") {
    val c = Catalog(spark, dir)
    val revs = c.lineitem
      .select(col("l_partkey"),
        expr("CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) " +
          "AS BIGINT)").as("nc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }.toSeq
    val sorted = revs.sortBy { case (pk, rev) => (-rev, pk) }
    val tot = sorted.map(_._2).sum
    var cum = 0L
    val banded = sorted.zipWithIndex.map { case ((pk, rev), i) =>
      cum += rev
      val cls =
        if (i == 0 || cum * 100 <= 80 * tot) "A"
        else if (cum * 100 <= 95 * tot) "B" else "C"
      (cls, rev, i + 1L)
    }
    val grouped = banded.groupBy(_._1)
    val out = operators.Profiling.q327(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == grouped.keySet)
    grouped.foreach { case (cls, g) =>
      val row = out(cls)
      assert(row.getAs[Long]("n_parts") == g.length.toLong, s"$cls: n")
      assert(row.getAs[Long]("class_revenue_cents") == g.map(_._2).sum,
        s"$cls: rev")
      assert(row.getAs[Long]("first_rank") == g.map(_._3).min &&
        row.getAs[Long]("last_rank") == g.map(_._3).max, s"$cls: ranks")
      assert(row.getAs[Double]("revenue_share") ==
        r(6)(g.map(_._2).sum.toDouble / tot), s"$cls: share")
    }
    // classes are contiguous rank bands in A < B < C order
    val byClass = grouped.view.mapValues(g => (g.map(_._3).min, g.map(_._3).max))
    for (Seq(a, b) <- Seq("A", "B", "C").filter(grouped.contains).sliding(2))
      assert(byClass(a)._2 + 1 == byClass(b)._1, s"$a/$b bands contiguous")
  }

  test("Q328 Theil decomposition: identity T_total = between + sum of contributions") {
    val c = Catalog(spark, dir)
    val cells = c.events
      .select(col("event_type"), col("user_id"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
      .filter(_._2 > 0)
    val xs = cells.toSeq.map { case ((t, _), x) => (t, x) }
    val nn = xs.length.toLong
    val ss = xs.map(_._2).sum
    val mu = ss.toDouble / nn
    val tTotal = xs.map { case (_, x) =>
      (x / mu) * math.log(x / mu)
    }.sum / nn
    val out = operators.Behavior.q328(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val byType = xs.groupBy(_._1)
    assert(out.keySet == byType.keySet)
    var recon = 0.0
    byType.foreach { case (t, g) =>
      val (ng, sg) = (g.length.toLong, g.map(_._2).sum)
      val mug = sg.toDouble / ng
      val tw = g.map { case (_, x) => (x / mug) * math.log(x / mug) }.sum / ng
      val share = sg.toDouble / ss
      val row = out(t)
      assert(row.getAs[Long]("n_cells") == ng, s"$t: n")
      assert(row.getAs[Long]("revenue_cents") == sg, s"$t: rev")
      assert(math.abs(row.getAs[Double]("theil_within") - tw) < 1e-4,
        s"$t: within")
      assert(math.abs(row.getAs[Double]("contribution") - share * tw) < 1e-4,
        s"$t: contribution")
      assert(math.abs(row.getAs[Double]("between_term") -
        share * math.log(mug / mu)) < 1e-4, s"$t: between")
      recon += row.getAs[Double]("contribution") +
        row.getAs[Double]("between_term")
    }
    // the decomposition identity (up to the 1e-6 output rounding per term)
    assert(math.abs(recon - tTotal) < 1e-4,
      s"decomposition identity: $recon vs $tTotal")
  }

  test("Q329 Jonckheere-Terpstra: JT and moments match a direct pair count") {
    val c = Catalog(spark, dir)
    val vals = c.orders
      .select(col("o_orderpriority"),
        expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = vals.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2)
    }
    val ordered = groups.keys.toSeq.sorted
    // doubled JT: pairs in declared order; x<y counts 2, tie counts 1
    var jt2 = 0L
    for {
      i <- ordered.indices; j <- ordered.indices if i < j
      x <- groups(ordered(i)); y <- groups(ordered(j))
    } jt2 += (if (x < y) 2L else if (x == y) 1L else 0L)
    val n = vals.length.toLong
    val ns = ordered.map(g => groups(g).length.toLong)
    val e2 = (n * n - ns.map(x => x * x).sum) / 2
    val varJt = (n.toDouble * n * (2 * n + 3) -
      ns.map(x => x.toDouble * x * (2 * x + 3)).sum) / 72
    val z = (jt2 - e2).toDouble / (2 * math.sqrt(varJt))
    val row = operators.Stats.q329(spark, dir).collect().head
    assert(row.getAs[Long]("n_total") == n)
    assert(row.getAs[Long]("jt2") == jt2, "doubled JT")
    assert(row.getAs[Long]("e2") == e2, "doubled expectation")
    assert(row.getAs[Double]("z") == r(4)(z), "z")
  }

  test("Q330 shift function: deciles match direct order statistics") {
    val c = Catalog(spark, dir)
    val vals = c.events
      .select(col("event_type"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    def quant(sorted: Seq[Long], pct: Long): Long = {
      val k = (pct * sorted.length + 99) / 100
      sorted((k - 1).toInt)
    }
    val out = operators.Stats.q330(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r).toMap
    val types = vals.keys.toSeq.sorted
    assert(out.size == types.size * (types.size - 1) / 2 * 9)
    for (a <- types; b <- types if a < b; p <- 10L to 90L by 10L) {
      val (qa, qb) = (quant(vals(a), p), quant(vals(b), p))
      val row = out((a, b, p))
      assert(row.getAs[Long]("q_a") == qa && row.getAs[Long]("q_b") == qb,
        s"($a,$b,$p): quantiles")
      assert(row.getAs[Long]("shift_cents") == qb - qa, s"($a,$b,$p)")
    }
    // shift function of a distribution against itself would be zero;
    // monotone quantiles: q_a non-decreasing in p within each pair
    for (a <- types; b <- types if a < b) {
      val qs = (10L to 90L by 10L).map(p => out((a, b, p)).getAs[Long]("q_a"))
      assert(qs == qs.sorted, s"($a,$b): monotone quantiles")
    }
  }

  test("Q331 Lorenz deciles: buckets match a direct rank scan") {
    val c = Catalog(spark, dir)
    val spend = c.events
      .select(col("user_id"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, g) => (u, g.map(_._2).sum) }.toSeq
    val ranked = spend.sortBy { case (u, x) => (x, u) }
    val n = ranked.length.toLong
    val total = ranked.map(_._2).sum
    val buckets = ranked.zipWithIndex.map { case ((_, x), i) =>
      (i.toLong * 10 / n + 1, x)
    }.groupBy(_._1)
    val out = operators.Behavior.q331(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == buckets.keySet)
    var cum = 0L
    buckets.toSeq.sortBy(_._1).foreach { case (d, g) =>
      cum += g.map(_._2).sum
      val row = out(d)
      assert(row.getAs[Long]("n_users_d") == g.length.toLong, s"$d: n")
      assert(row.getAs[Long]("decile_cents") == g.map(_._2).sum, s"$d: rev")
      assert(row.getAs[Double]("cum_share") == r(6)(cum.toDouble / total),
        s"$d: cum")
    }
    // users are rank-ordered, so the per-user decile MEAN is monotone
    // (decile sums need not be when bucket sizes differ by one)
    val means = buckets.toSeq.sortBy(_._1)
      .map(g => g._2.map(_._2).sum.toDouble / g._2.length)
    assert(means == means.sorted, "non-decreasing decile mean spend")
  }

  test("Q332 Breusch-Pagan: BP matches a direct auxiliary regression on raw residuals") {
    val grid = localGrid()
    val out = operators.Stats.q332(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == grid.keySet)
    grid.foreach { case (tp, series) =>
      val n = series.length
      val ts = series.indices.map(_.toDouble)
      val vs = series.map(_._2.toDouble)
      // plain textbook OLS in doubles, residuals e, then aux regression
      // of e^2 on t — R² is invariant to the engine's nd residual scale
      val (sx, sy) = (ts.sum, vs.sum)
      val sxx = ts.map(t => t * t).sum
      val sxy = ts.zip(vs).map { case (t, v) => t * v }.sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      val u = ts.zip(vs).map { case (t, v) =>
        val e = v - a - b * t; e * e
      }
      val (su, sut) = (u.sum, u.zip(ts).map { case (x, t) => x * t }.sum)
      val suu = u.map(x => x * x).sum
      val num = n * sut - su * sx
      val r2 = num * num / ((n * suu - su * su) * (n * sxx - sx * sx))
      val bp = n * r2
      val got = out(tp).getAs[Double]("bp")
      assert(math.abs(got - bp) < 5e-4, s"$tp: BP $got vs $bp")
      assert(got >= 0 && got <= n, s"$tp: BP bounds")
    }
  }

  test("Q333 Cook's distance: scale-cancelled form matches textbook leverage and D") {
    val grid = localGrid()
    val out = operators.Trend.q333(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("influence_rank")) -> r)
      .toMap
    grid.foreach { case (tp, series) =>
      val n = series.length
      val ts = series.indices.map(_.toDouble)
      val vs = series.map(_._2.toDouble)
      val (sx, sy) = (ts.sum, vs.sum)
      val sxx = ts.map(t => t * t).sum
      val sxy = ts.zip(vs).map { case (t, v) => t * v }.sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      val es = ts.zip(vs).map { case (t, v) => v - a - b * t }
      val sse = es.map(e => e * e).sum
      val s2 = sse / (n - 2)
      val tbar = sx / n
      val sxxC = sxx - sx * sx / n
      val scoredAll = ts.zip(es).zip(series).map { case ((t, e), (day, _)) =>
        val h = 1.0 / n + (t - tbar) * (t - tbar) / sxxC
        val dCook = e * e * h / (2 * s2 * (1 - h) * (1 - h))
        (day, h, dCook)
      }
      val top = scoredAll.sortBy { case (day, _, d) => (-r(6)(d), day) }.take(3)
      top.zipWithIndex.foreach { case ((day, h, dCook), i) =>
        val row = out((tp, i + 1L))
        assert(row.getAs[Long]("day") == day, s"$tp rank ${i + 1}: day")
        assert(math.abs(row.getAs[Double]("leverage") - h) < 1e-5,
          s"$tp rank ${i + 1}: leverage")
        assert(math.abs(row.getAs[Double]("cook_d") - dCook) < 1e-4,
          s"$tp rank ${i + 1}: D")
      }
    }
  }

  test("Q294 RAKE: phrase scores match a first-principles local RAKE") {
    val c = Catalog(spark, dir)
    val docs = c.documents.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stop = Set("the", "a", "value", "table", "row", "key", "")
    // Candidate phrases (runs of non-stop tokens, capped at 4 words).
    val phrases = docs.flatMap { case (_, text) =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      text.split(" ", -1).foreach { t =>
        if (stop(t)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= t
      }
      if (cur.nonEmpty) runs += cur
      runs.filter(_.length <= 4)
    }
    val freq = phrases.flatten.groupBy(identity).map { case (w, g) =>
      w -> g.length.toLong
    }
    val deg = phrases.flatMap(p => p.map(w => w -> p.length.toLong))
      .groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }
    val sm = freq.keys.map(w => w -> (1000L * deg(w)) / freq(w)).toMap
    val byPhrase = phrases.groupBy(_.mkString(" ")).map { case (ph, g) =>
      (ph, g.head.length.toLong, g.length.toLong,
        g.head.map(sm).sum)
    }.toSeq
    val top = byPhrase.sortBy(t => (-t._4, t._1)).take(20)
    val out = TextRank.q294(spark, dir).collect()
    assert(out.length == math.min(20, byPhrase.size))
    out.zip(top).foreach { case (row, (ph, nw, no, s)) =>
      assert(row.getAs[String]("phrase") == ph, s"phrase order: $row vs $ph")
      assert(row.getAs[Long]("n_words") == nw)
      assert(row.getAs[Long]("n_occur") == no)
      assert(row.getAs[Double]("rake_score") == r(3)(s.toDouble / 1000))
    }
  }
}
