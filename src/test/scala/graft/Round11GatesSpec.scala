package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventTime, Graphs, Profiling, Trend}

/** Model pins for the round-11 slate: each test recomputes the gate's
  * defining algorithm from first principles on sf0.001 (sequential
  * reference code vs the engine's distributed folds) and compares. The
  * cross-engine hash gate stays the DuckDB oracle; these pin the MODEL.
  */
class Round11GatesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def r(k: Int)(x: Double): Double =
    BigDecimal(java.lang.Double.toString(x))
      .setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Zero-filled daily cents series per type on the GLOBAL spine,
    * recomputed independently of the Derived artifact.
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
    daily.groupBy(_._1).map { case (t, rows) =>
      val m = rows.map(r => r._2 -> r._3).toMap
      t -> (dmin to dmax).map(d => (d, m.getOrElse(d, 0L)))
    }
  }

  test("Q336 Holt-Winters: distributed fold replays the sequential recurrence bit-exactly") {
    val grid = localGrid()
    val out = Trend.q336(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    assert(out.nonEmpty)
    grid.foreach { case (t, series) =>
      val y = series.map(_._2)
      val n = y.length
      assert(n >= 7, s"$t: fixture spine shorter than one week")
      // Sequential Holt-Winters additive, alpha = beta = gamma = 1/2,
      // m = 7, the EXACT parenthesization of the gate and oracle.
      var l = y.take(7).sum.toDouble / 7
      var b = 0.0
      val s = Array.tabulate(7)(i => y(i).toDouble - l)
      var t0 = 7
      while (t0 < n) {
        val sOld = s(t0 % 7)
        val lNew = ((y(t0).toDouble - sOld) + (l + b)) / 2
        val bNew = (b + (lNew - l)) / 2
        s(t0 % 7) = ((y(t0).toDouble - lNew) + sOld) / 2
        l = lNew; b = bNew; t0 += 1
      }
      (1 to 7).foreach { h =>
        val row = out((t, h))
        assert(row.getAs[Long]("n_obs") == n.toLong, s"$t h=$h: n_obs")
        assert(row.getAs[String]("verdict") == "ok", s"$t h=$h: verdict")
        assert(row.getAs[Double]("level") == r(4)(l), s"$t h=$h: level")
        assert(row.getAs[Double]("trend") == r(4)(b), s"$t h=$h: trend")
        val seas = s((n - 1 + h) % 7)
        assert(row.getAs[Double]("seasonal") == r(4)(seas),
          s"$t h=$h: seasonal")
        assert(row.getAs[Double]("forecast") ==
          r(4)(l + h.toDouble * b + seas), s"$t h=$h: forecast")
      }
    }
    // The one-week-exactly degenerate boundary: with n = 7 the fold body
    // never runs and the forecast must come straight from the init state.
    val t7 = grid.head._2.take(7).map(_._2)
    val l7 = t7.sum.toDouble / 7
    assert(r(4)(l7 + 1.0 * 0.0 + (t7(0).toDouble - l7)) ==
      r(4)(l7 + (t7(0).toDouble - l7)))
  }

  /** The support-pruned co-order edge set, recomputed independently. */
  private def localEdges(): Set[(Long, Long)] = {
    val c = Catalog(spark, dir)
    val occ = c.lineitem.select(col("l_orderkey"), col("l_partkey"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val occs = occ.groupBy(_._1).values.toSeq.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted.take(1000)
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }
    // NB: Map.collect returning tuples would rebuild a Map (collapsing
    // duplicate first components) — filter + keySet keeps the pair set.
    occs.groupBy(identity).filter(_._2.size >= 2).keySet
  }

  test("Q337 edge support: oriented enumeration equals brute-force common-neighbor counts") {
    val edges = localEdges()
    assert(edges.nonEmpty)
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
    val support = edges.toSeq.map { case (a, b) =>
      (adj(a) intersect adj(b)).size.toLong
    }
    val hist = support.groupBy(identity)
      .map { case (s, xs) => s -> xs.size.toLong }
    val out = Graphs.q337(spark, dir).collect()
      .map(r => r.getAs[Long]("support") -> r).toMap
    assert(out.keySet == hist.keySet, "support levels differ")
    hist.foreach { case (s, cnt) =>
      val row = out(s)
      assert(row.getAs[Long]("n_edges") == cnt, s"support $s: n_edges")
      assert(row.getAs[Long]("max_truss") == s + 2, s"support $s: max_truss")
      assert(row.getAs[Double]("edge_share") ==
        r(6)(cnt.toDouble / edges.size), s"support $s: share")
    }
    // Σ support over edges = 3 × triangle count (each triangle credits
    // its three edges exactly once).
    assert(support.sum % 3 == 0, "total support must be divisible by 3")
  }

  test("Q338 diurnal profile: chi-square identity and peak stats match a local replay") {
    val c = Catalog(spark, dir)
    val hrs = c.events
      .select(col("event_type"), expr("((ts DIV 1000) DIV 3600000000) % 24").as("hr"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.groupBy(_._2).map { case (h, ys) => h -> ys.size.toLong }
      }
    val out = EventTime.q338(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == hrs.keySet)
    hrs.foreach { case (t, bins) =>
      val n = bins.values.sum
      val row = out(t)
      assert(row.getAs[Long]("n") == n, s"$t: n")
      assert(row.getAs[Long]("n_hours_active") == bins.size.toLong, s"$t: active")
      // textbook chi2 Σ(o−e)²/e over ALL 24 bins (zeros included) must
      // equal the collapsed (24·Σo² − n²)/n identity the gate computes
      val e = n.toDouble / 24
      val chi2 = (0L until 24L).map { h =>
        val o = bins.getOrElse(h, 0L).toDouble
        (o - e) * (o - e) / e
      }.sum
      // textbook accumulation differs from the gate's exact-integer
      // numerator by float error only; exact equality is the DuckDB
      // hash gate's job
      assert(math.abs(row.getAs[Double]("chi2_uniform") - chi2) < 1e-3,
        s"$t: chi2 identity")
      val maxO = bins.values.max
      val peak = bins.filter(_._2 == maxO).keys.min
      assert(row.getAs[Long]("peak_hr") == peak, s"$t: peak hour")
      assert(row.getAs[Double]("peak_share") == r(6)(maxO.toDouble / n),
        s"$t: peak share")
      val verdict = if (24 * maxO >= 2 * n) "diurnal" else "flat"
      assert(row.getAs[String]("verdict") == verdict, s"$t: verdict")
    }
  }

  test("Q341 truss peeling: synchronized rounds match a sequential peel") {
    var e = localEdges()
    def support(es: Set[(Long, Long)]): Map[(Long, Long), Int] = {
      val adj = es.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
      es.toSeq.map(ed => ed -> (adj(ed._1) intersect adj(ed._2)).size).toMap
    }
    def nodes(es: Set[(Long, Long)]): Long =
      es.flatMap(ed => Seq(ed._1, ed._2)).size.toLong
    val prof = scala.collection.mutable.ArrayBuffer(
      (0L, e.size.toLong, nodes(e), "init"))
    for (r <- 1 to 8) {
      val sup = support(e)
      val next = e.filter(ed => sup(ed) >= 2)
      val phase = if (next.size == e.size) "stable" else "peeling"
      e = next
      prof += ((r.toLong, e.size.toLong, nodes(e), phase))
    }
    val out = Graphs.q341(spark, dir).collect()
      .map(r => r.getAs[Long]("round") -> r).toMap
    assert(out.size == 9)
    prof.foreach { case (r, ne, nn, ph) =>
      val row = out(r)
      assert(row.getAs[Long]("k") == 4L, s"round $r: k")
      assert(row.getAs[Long]("n_edges_alive") == ne, s"round $r: edges")
      assert(row.getAs[Long]("n_nodes_alive") == nn, s"round $r: nodes")
      assert(row.getAs[String]("phase") == ph, s"round $r: phase")
    }
    // peeling must be monotone and actually peel something at round 1
    // on the fixture (Q337's histogram shows support-0/1 edges exist)
    assert(prof(1)._2 < prof(0)._2, "round 1 peeled nothing")
  }

  test("Q342 modularity: LPA replay and exact contribution algebra match") {
    val edges = localEdges()
    val adjL = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2) }
    // deterministic 3-round LPA: most frequent neighbor label, min label
    // on ties — Q156's declared variant
    var lab: Map[Long, Long] = adjL.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lab = adjL.map { case (v, ns) =>
        val votes = ns.map(lab).groupBy(identity).toSeq
          .map { case (l, xs) => (xs.size, l) }
        v -> votes.maxBy { case (c, l) => (c, -l) }._2
      }
    }
    val m = edges.size.toLong
    val deg = adjL.map { case (v, ns) => v -> ns.size.toLong }
    val comms = lab.groupBy(_._2).map { case (l, members) =>
      val nodes = members.keys.toSeq
      val dSum = nodes.map(deg).sum
      val eIn = edges.count { case (a, b) => lab(a) == l && lab(b) == l }
        .toLong
      (l, nodes.size.toLong, dSum, eIn)
    }
    val qNum = comms.map { case (_, _, d, e) => BigInt(4) * m * e - BigInt(d) * d }.sum
    val modularity = r(6)((BigDecimal(qNum) /
      (BigDecimal(4) * BigDecimal(m) * BigDecimal(m))).toDouble)
    val out = Graphs.q342(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 10)
    val expTop = comms.toSeq.sortBy { case (l, n, _, _) => (-n, l) }.take(10)
    out.zip(expTop).foreach { case (row, (l, n, d, e)) =>
      assert(row.getAs[Long]("community") == l, "community order")
      assert(row.getAs[Long]("n_members") == n, s"comm $l: members")
      assert(row.getAs[Long]("d_sum") == d, s"comm $l: d_sum")
      assert(row.getAs[Long]("e_in") == e, s"comm $l: e_in")
      assert(row.getAs[Long]("m_edges") == m, s"comm $l: m")
      assert(row.getAs[Long]("n_comms") == comms.size.toLong, "n_comms")
      assert(math.abs(row.getAs[Double]("modularity") - modularity) < 2e-6,
        s"comm $l: global Q")
      val contrib = r(6)((BigDecimal(BigInt(4) * m * e - BigInt(d) * d) /
        (BigDecimal(4) * BigDecimal(m) * BigDecimal(m))).toDouble)
      assert(math.abs(row.getAs[Double]("contrib") - contrib) < 2e-6,
        s"comm $l: contrib")
    }
  }

  test("Q344 power-law MLE: Hill estimator matches a local replay on the unpruned graph") {
    val c = Catalog(spark, dir)
    // unpruned co-order degrees (Q103's input), replayed locally
    val occ = c.lineitem.select(col("l_orderkey"), col("l_partkey"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = occ.groupBy(_._1).values.toSeq.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted.take(1000)
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.distinct
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).toSeq.map { case (_, xs) => xs.size.toLong }
    val n = deg.size.toLong
    val tail = deg.filter(_ >= 2)
    val lnsum = tail.groupBy(identity).toSeq
      .map { case (d, xs) => xs.size * math.log(d.toDouble / 1.5) }.sum
    val alpha = 1.0 + tail.size.toDouble / lnsum
    val row = Graphs.q344(spark, dir).collect().head
    assert(row.getAs[Long]("n_nodes") == n, "n_nodes")
    assert(row.getAs[Long]("n_tail") == tail.size.toLong, "n_tail")
    assert(row.getAs[Long]("max_degree") == deg.max, "max_degree")
    assert(math.abs(row.getAs[Double]("alpha") - alpha) < 1e-6, "alpha")
    assert(row.getAs[Double]("tail_share") ==
      r(6)(tail.size.toDouble / n), "tail_share")
    val v = row.getAs[Double]("alpha")
    assert(row.getAs[String]("verdict") ==
      (if (v >= 2.0 && v <= 3.5) "scale-free-ish" else "not-power-law"),
      "verdict")
  }

  test("Q339 CCF: lagged Pearson and lead ranks match a local replay") {
    val grid = localGrid()
    val out = Trend.q339(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r).toMap
    assert(out.nonEmpty)
    for ((ta, sa) <- grid; (tb, sb) <- grid if ta != tb) {
      val byDayB = sb.toMap
      val rs = (0L to 7L).map { lag =>
        val pairs = sa.flatMap { case (d, x) =>
          byDayB.get(d + lag).map(y => (x, y))
        }
        val m = pairs.length.toLong
        val sx = pairs.map(_._1).sum
        val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val num = m * sxy - sx * sy
        val da = m * sxx - sx * sx
        val db = m * syy - sy * sy
        val ccf = if (da > 0 && db > 0)
          Some(r(6)(num.toDouble / math.sqrt(da.toDouble * db.toDouble)))
        else None
        (lag, m, num, ccf)
      }
      rs.foreach { case (lag, m, num, ccf) =>
        val row = out((ta, tb, lag))
        assert(row.getAs[Long]("m") == m, s"($ta,$tb,$lag): m")
        assert(row.getAs[Long]("num") == num, s"($ta,$tb,$lag): num")
        assert(Option(row.getAs[java.lang.Double]("ccf"))
          .map(_.doubleValue) == ccf, s"($ta,$tb,$lag): ccf")
      }
      // lead_rank 1 must be the lag maximizing |ccf| (NULL last, lag asc)
      val best = rs.minBy { case (lag, _, _, ccf) =>
        (-ccf.map(math.abs).getOrElse(-1.0), lag)
      }._1
      val rank1 = out.collect {
        case ((a, b, lag), row)
          if a == ta && b == tb && row.getAs[Long]("lead_rank") == 1L => lag
      }
      assert(rank1.toSeq == Seq(best), s"($ta,$tb): lead_rank 1")
    }
  }

  test("Q343 ABC-XYZ: class fences and cell rollups match a sequential replay") {
    val c = Catalog(spark, dir)
    val rows = c.lineitem
      .join(c.part.select(col("p_partkey").as("l_partkey"), col("p_brand")),
        Seq("l_partkey"))
      .select(col("p_brand"),
        expr("CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) " +
          "AS BIGINT)").as("cents"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"),
        expr("CAST(datediff(l_shipdate, DATE '1970-01-01') AS LONG)")
          .as("day"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d0 = rows.map(_._4).min
    val nPeriods = (rows.map(_._4).max - d0) / 28 + 1
    // per-brand 28-day-period sums -> exact CV fences
    val periodic = rows.groupBy(r => (r._1, (r._4 - d0) / 28)).toSeq
      .map { case ((b, _), xs) => (b, xs.map(_._3).sum) }
    val xyz = periodic.groupBy(_._1).map { case (b, ws) =>
      val s = ws.map(_._2).sum
      val sq = ws.map(w => w._2 * w._2).sum
      val varn = BigInt(nPeriods) * sq - BigInt(s) * s
      val cls = if (varn * 4 <= BigInt(s) * s) "X"
        else if (varn <= BigInt(s) * s) "Y" else "Z"
      b -> (cls, s)
    }
    // ABC replay (Q327 fences) on brand revenue
    val rev = rows.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val tot = rev.values.sum
    val ranked = rev.toSeq.sortBy { case (b, rv) => (-rv, b) }
    var cum = 0L
    val abc = ranked.zipWithIndex.map { case ((b, rv), i) =>
      cum += rv
      val cls = if (i == 0 || cum * 100 <= 80 * tot) "A"
        else if (cum * 100 <= 95 * tot) "B" else "C"
      b -> (cls, rv)
    }.toMap
    val qtot = xyz.values.map(_._2).sum
    val cells = abc.keys.map { b =>
      (abc(b)._1, xyz(b)._1, abc(b)._2, xyz(b)._2)
    }.toSeq.groupBy(t => (t._1, t._2))
    val out = Profiling.q343(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == cells.keySet, "cell set")
    cells.foreach { case (k, xs) =>
      val row = out(k)
      assert(row.getAs[Long]("n_brands") == xs.size.toLong, s"$k: n_brands")
      val cr = xs.map(_._3).sum
      val cq = xs.map(_._4).sum
      assert(row.getAs[Long]("cell_revenue_cents") == cr, s"$k: revenue")
      assert(row.getAs[Long]("cell_qty") == cq, s"$k: qty")
      assert(row.getAs[Double]("revenue_share") == r(6)(cr.toDouble / tot),
        s"$k: rev share")
      assert(row.getAs[Double]("qty_share") == r(6)(cq.toDouble / qtot),
        s"$k: qty share")
    }
    // both axes must actually spread on the fixture
    assert(Set("A", "B", "C").subsetOf(cells.keySet.map(_._1)), "ABC classes")
    assert(cells.keySet.map(_._2).size >= 2, "XYZ spread")
  }

  test("Q340 bootstrap CI: md5 resampling and order-statistic bounds match a local replay") {
    val grid = localGrid()
    val out = Trend.q340(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == grid.keySet)
    def hv(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    grid.foreach { case (t, series) =>
      val v = series.map(_._2)
      val n = v.length
      val sums = (1 to 200).map { rIdx =>
        (0 until n).map { i =>
          v((hv(s"boot:$t:$rIdx:$i") % n).toInt)
        }.sum -> rIdx
      }.sorted
      val sLo = sums(4)._1  // rank 5
      val sHi = sums(194)._1 // rank 195
      val row = out(t)
      assert(row.getAs[Long]("n_days") == n.toLong, s"$t: n_days")
      assert(row.getAs[Double]("mean_cents") == r(4)(v.sum.toDouble / n),
        s"$t: mean")
      assert(row.getAs[Double]("boot_lo") == r(4)(sLo.toDouble / n),
        s"$t: boot_lo")
      assert(row.getAs[Double]("boot_hi") == r(4)(sHi.toDouble / n),
        s"$t: boot_hi")
      assert(row.getAs[Double]("ci_width") ==
        r(4)((sHi - sLo).toDouble / n), s"$t: width")
      assert(sLo <= sHi, s"$t: CI ordering")
    }
  }
}
