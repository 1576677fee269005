package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Clustering, Graphs, Skyline}

/** In-memory-model pins for the round-4 analytics additions: k-means
  * (Q102 family), degree-oriented triangle counting (Q103), two-phase
  * skyline (Q105). Each Spark result is checked against a brute-force
  * reference computed locally on the same fixed-seed data.
  */
class AnalyticsOpsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    // the operators are exercised without a Catalog here, so register the
    // engine-native functions (graft_dot) the same way Catalog does
    graft.plans.GraftExtensions.registerRuntime(spark)
  }

  private def vecDf(rows: Seq[(Long, Array[Float])]) = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("emb", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v.toSeq) }, 3),
      schema)
  }

  test("kmeans matches a local Lloyd reference on fixed-seed data") {
    val rnd = new scala.util.Random(42)
    val d = 8
    // three planted clusters around orthogonal-ish anchors
    val anchors = Array.tabulate(3, d)((c, i) => if (i % 3 == c) 5f else 0f)
    val data: Seq[(Long, Array[Float])] = (0L until 60L).map { i =>
      val a = anchors((i % 3).toInt)
      i -> a.map(_ + rnd.nextFloat() * 0.5f)
    }
    val k = 3; val iters = 3
    val (model, assigned) = Clustering.kmeans(vecDf(data), k, iters)

    // local reference: identical seed rule (lowest k ids), cosine argmax
    // with ties to lowest cid, elementwise-mean update
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) { s += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      s / math.sqrt(nx * ny)
    }
    val pts = data.map { case (i, v) => i -> v.map(_.toDouble) }.toMap
    var cents: Map[Long, Array[Double]] =
      (0L until k.toLong).map(c => c -> pts(c)).toMap
    var ref: Map[Long, Long] = Map.empty
    for (_ <- 0 until iters) {
      ref = pts.map { case (i, v) =>
        i -> cents.toSeq.map { case (c, cv) => (-cos(v, cv), c) }.min._2
      }
      cents = ref.groupBy(_._2).map { case (c, members) =>
        val vs = members.keys.toSeq.map(pts)
        c -> Array.tabulate(vs.head.length)(j => vs.map(_(j)).sum / vs.size)
      }
    }
    val got = assigned.select(col("id"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ref)
    // planted structure recovered: each cluster holds exactly the ids ≡ cid (mod 3)
    assert(model.keySet === Set(0L, 1L, 2L))
    model.foreach { case (c, cen) => assert(cen.length === d) }
  }

  test("degree-oriented triangle corners match brute force on a fixed random graph") {
    val rnd = new scala.util.Random(7)
    val n = 30
    val edges = (for {
      a <- 0 until n; b <- (a + 1) until n
      if rnd.nextDouble() < 0.25
    } yield (a.toLong, b.toLong)).toSeq
    val eDf = spark.createDataFrame(edges).toDF("a", "b")
    val got = Graphs.triangleCorners(eDf)
      .groupBy("node").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val eset = edges.toSet
    def has(x: Long, y: Long) = eset((math.min(x, y), math.max(x, y)))
    val refCounts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var total = 0
    for (x <- 0 until n; y <- (x + 1) until n; z <- (y + 1) until n)
      if (has(x, y) && has(x, z) && has(y, z)) {
        total += 1
        Seq(x, y, z).foreach(v => refCounts(v) += 1)
      }
    assert(total > 0, "fixture must contain triangles")
    assert(got === refCounts.toMap)
  }

  test("triangleCountsPerNode equals the grouped corner enumeration") {
    val rnd = new scala.util.Random(11)
    val n = 40
    val edges = (for {
      a <- 0 until n; b <- (a + 1) until n
      if rnd.nextDouble() < 0.2
    } yield (a.toLong, b.toLong)).toSeq
    val eDf = spark.createDataFrame(edges).toDF("a", "b")
    val viaCorners = Graphs.triangleCorners(eDf)
      .groupBy("node").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDecomp = Graphs.triangleCountsPerNode(eDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaCorners.nonEmpty, "fixture must contain triangles")
    assert(viaDecomp === viaCorners)
  }

  test("collect_set edge build equals the self-join formulation on real lineitem") {
    val li = Catalog(spark, sf("sf0.001")).lineitem
    val viaArrays = Graphs.coOrderEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val l1 = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("a"))
    val l2 = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("b"))
    val viaJoin = l1.join(l2, Seq("ok")).filter(col("a") < col("b"))
      .select("a", "b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaArrays == viaJoin, s"${viaArrays.size} vs ${viaJoin.size}")
  }

  test("pageRank matches a local power-iteration reference") {
    val rnd = new scala.util.Random(19)
    val n = 25
    val edges = (for {
      a <- 0 until n; b <- (a + 1) until n
      if rnd.nextDouble() < 0.2
    } yield (a.toLong, b.toLong)).toSeq
    val eDf = spark.createDataFrame(edges).toDF("a", "b")
    val got = Graphs.pageRank(eDf, 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val nbrs = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = nbrs.view.mapValues(_.size.toDouble).toMap
    var pr: Map[Long, Double] = nbrs.keys.map(_ -> 1.0).toMap
    for (_ <- 0 until 3)
      pr = nbrs.keys.map { v =>
        v -> (0.15 + 0.85 * nbrs(v).map(u => pr(u) / deg(u)).sum)
      }.toMap
    assert(got.keySet === pr.keySet)
    got.foreach { case (v, r) => assert(math.abs(r - pr(v)) < 1e-9, s"node $v") }
  }

  test("two-phase skyline equals the brute-force dominance filter (ties and duplicates included)") {
    val rnd = new scala.util.Random(11)
    val base = (0 until 400).map { i =>
      (i.toLong, 1 + rnd.nextInt(40), math.rint(rnd.nextDouble() * 50) / 2.0)
    }
    // adversarial extras: an exact duplicate pair on the frontier and a
    // same-price / different-size tie
    val best = base.minBy(p => (p._3, -p._2))
    val pts = base ++ Seq(
      (1000L, best._2, best._3), (1001L, best._2, best._3),
      (1002L, best._2 - 1, best._3))
    val df = spark.createDataFrame(pts).toDF("p_partkey", "p_size", "p_retailprice")
      .repartition(5)
    val got = Skyline.skyline(df).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet

    def dominates(q: (Long, Int, Double), p: (Long, Int, Double)): Boolean =
      q._3 <= p._3 && q._2 >= p._2 && (q._3 < p._3 || q._2 > p._2)
    val ref = pts.filter(p => !pts.exists(q => dominates(q, p))).toSet
    assert(got === ref)
    // the duplicate frontier pair must BOTH survive
    assert(got.exists(_._1 == 1000L) === ref.exists(_._1 == 1000L))
  }

  test("Q118 trend is 7-CALENDAR-day: a gap day nulls every window that spans it") {
    // Synthetic 15-day series with day 7 missing entirely. The day-spine
    // re-grid must leave trend defined only at t=3 (days 0..6) and t=11
    // (days 8..14); every window that would span the gap goes NULL instead
    // of averaging non-adjacent days (the pre-fix 7-ROW behavior).
    val dir = java.nio.file.Files.createTempDirectory("graft-q118").toString
    val rows = (0 to 14).filter(_ != 7).flatMap { day =>
      // two events per day so the daily aggregate is exercised
      Seq((day * 86400000000L * 1000L, 10.0 + day),
        (day * 86400000000L * 1000L + 1000L, 20.0 + day))
    }
    spark.createDataFrame(rows).toDF("ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventTime.q118(spark, dir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got.keySet == (0 to 14).filter(_ != 7).map(_.toLong).toSet,
      "gap days must not be emitted")
    val defined = got.filter(_._2.isDefined).keySet
    assert(defined == Set(3L, 11L),
      s"trend must survive only where all 7 calendar days have data, got $defined")
    // day 3's window is days 0..6: mean of daily sums (10+d)+(20+d) = 30+2d
    val expect3 = (0 to 6).map(d => 30.0 + 2 * d).sum / 7
    assert(math.abs(got(3L).get - expect3) < 1e-9)
  }

  test("Q124 CUSUM: planted drift fires the alarm, and the window identity " +
    "matches the clamped recurrence") {
    // type "a": 20 quiet days at 10/day then a level shift to 30/day —
    // mu = 500/30 = 16, kappa = 4, so deviations are -10 before the
    // shift (stat pinned at 0) and +10 after (stat climbs 10/day);
    // threshold 3*(16+1) = 51 first exceeded on shift day 5 (day 25).
    // type "b": flat 10/day — its own mu = 10, kappa = 2, stat never
    // leaves... climbs? d = 10-12 = -2 < 0, stat stays 0, no alarms.
    val dir = java.nio.file.Files.createTempDirectory("graft-q124").toString
    def burst(tpe: String, day: Int, n: Int) =
      (0 until n).map(i => ((day * 86400000000L + i) * 1000L, tpe))
    val rows = (0 until 30).flatMap { d =>
      burst("a", d, if (d < 20) 10 else 30) ++ burst("b", d, 10)
    }
    spark.createDataFrame(rows).toDF("ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventTime.q124(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
      .toMap
    val aAlarms = got.collect { case (("a", day), (_, _, _, 1)) => day }.toSet
    assert(aAlarms == (25L to 29L).toSet,
      s"drift must alarm exactly on days 25..29, got $aAlarms")
    assert(got.collect { case (("b", _), v) => v }.forall(v => v._3 == 0L && v._4 == 0),
      "a flat series must never accumulate or alarm")
    // the prefix-sum/running-min identity vs the textbook recurrence,
    // replayed locally from the same (y, mu) inputs
    for (tpe <- Seq("a", "b")) {
      val series = got.collect { case ((`tpe`, day), v) => (day, v._1, v._2, v._3) }
        .toSeq.sortBy(_._1)
      var s = 0L
      for ((day, y, mu, stat) <- series) {
        s = math.max(0L, s + (y - mu - mu / 4))
        assert(stat == s, s"identity diverges from recurrence at $tpe/$day")
      }
    }
  }

  test("Q125 OLS: an exact linear series recovers its slope; degenerate " +
    "series classify as expected") {
    // "lin": y = 2k+3 for k=0..9 — exact fit, slope exactly 2.
    // "flat": constant 5/day — zero numerator, 'flat'.
    // "one": a single day — zero denominator, NULL slope and direction.
    val dir = java.nio.file.Files.createTempDirectory("graft-q125").toString
    def burst(tpe: String, day: Int, n: Int) =
      (0 until n).map(i => ((day * 86400000000L + i) * 1000L, tpe))
    val rows = (0 until 10).flatMap(k => burst("lin", k, 2 * k + 3)) ++
      (0 until 10).flatMap(k => burst("flat", k, 5)) ++ burst("one", 4, 7)
    spark.createDataFrame(rows).toDF("ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventTime.q125(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val lin = got("lin")
    assert(lin.getLong(2) == 2L * lin.getLong(3) && lin.getLong(3) > 0L,
      "exact linear series must yield slope_num == 2 * slope_den")
    assert(lin.getDouble(4) == 2.0 && lin.getString(5) == "rising")
    assert(got("flat").getLong(2) == 0L && got("flat").getString(5) == "flat")
    assert(got("one").getLong(3) == 0L && got("one").isNullAt(4) &&
      got("one").isNullAt(5), "a one-point series has no defined slope")
  }

  test("Q128 ACF: a perfectly alternating series gives acf(1) = -1 and " +
    "acf(2) = +1 exactly") {
    // 2,4,2,4,… for 8 days: the lag-1 overlap is perfectly anti-aligned
    // (num = -den), the lag-2 overlap perfectly aligned — both cancel to
    // exactly ±1.0 in the integer normal equations, no tolerance needed.
    val dir = java.nio.file.Files.createTempDirectory("graft-q128").toString
    def burst(tpe: String, day: Int, n: Int) =
      (0 until n).map(i => ((day * 86400000000L + i) * 1000L, tpe))
    val rows = (0 until 8).flatMap(d => burst("alt", d, if (d % 2 == 0) 2 else 4))
    spark.createDataFrame(rows).toDF("ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventTime.q128(spark, dir).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(got.size == 7, "lags 1..7 must all be present")
    assert(got(1L).getDouble(4) == -1.0 && got(2L).getDouble(4) == 1.0)
    assert(got(1L).getLong(2) == 7 && got(2L).getLong(2) == 6,
      "overlap length must shrink by one per lag")
    // at lag 7 the overlap is a single pair -> both variances are zero
    assert(got(7L).isNullAt(4), "a zero-variance overlap must yield NULL")
  }

  test("Q130 Theil-Sen: recovers the true slope of a linear series even " +
    "with a corrupted day (where OLS Q125 moves)") {
    // y = 3k+1 for k=0..10, except the LAST day is corrupted to 1000
    // events (max leverage for OLS — a center outlier would cancel).
    // 45 of the 55 pairwise slopes avoid day 10 and equal exactly 3, so
    // the median is 3.0; the OLS fit on the same data is dragged far off.
    val dir = java.nio.file.Files.createTempDirectory("graft-q130").toString
    def burst(tpe: String, day: Int, n: Int) =
      (0 until n).map(i => ((day * 86400000000L + i) * 1000L, tpe))
    val rows = (0 until 11).flatMap(k =>
      burst("s", k, if (k == 10) 1000 else 3 * k + 1))
    spark.createDataFrame(rows).toDF("ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ts = graft.operators.EventTime.q130(spark, dir).collect()
    assert(ts.length == 1 && ts(0).getLong(1) == 55L)
    assert(ts(0).getDouble(2) == 3.0, s"median slope must be exact 3.0")
    val ols = graft.operators.EventTime.q125(spark, dir).collect()(0)
    assert(math.abs(ols.getDouble(4) - 3.0) > 1.0,
      "the corrupted day must actually drag OLS, else the fixture is weak")
  }

  test("Q127 Gini: hand-computed value on a 4-customer segment, zero on " +
    "perfect equality, and order-sum exactness") {
    // seg "X": per-customer revenues 1.00, 2.00, 3.00, 4.00 dollars ->
    // cents 100..400, Gini = sum((2i-n-1)x) / (n*sum(x)) = 1000/4000 = 0.25.
    // seg "E": three equal customers -> Gini exactly 0. Customer 99 has no
    // orders and must not appear in any rank.
    val dir = java.nio.file.Files.createTempDirectory("graft-q127").toString
    val customers = Seq((1L, "X"), (2L, "X"), (3L, "X"), (4L, "X"),
      (5L, "E"), (6L, "E"), (7L, "E"), (99L, "X"))
    // customer 4's 4.00 arrives as two orders (1.50 + 2.50) to prove the
    // per-customer cents sum happens before ranking
    val orders = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 1.5), (4L, 2.5),
      (5L, 2.0), (6L, 2.0), (7L, 2.0))
    spark.createDataFrame(customers).toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    spark.createDataFrame(orders).toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Profiling.q127(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("X").getLong(1) == 4L && got("X").getLong(2) == 1000L)
    assert(got("X").getDouble(3) == 0.25)
    assert(got("E").getDouble(3) == 0.0, "perfect equality must be Gini 0")
  }

  test("Q129 trigrams: known sequences produce exactly their trigram " +
    "counts, with event_id breaking a timestamp tie") {
    // user 1: A B A B -> ABA, BAB. user 2: A A A A A -> AAA x3.
    // user 3 has two events at the SAME ts where only event_id order
    // yields CBA (ids 31,32,33 at ts 0,5,5: C then B@5(id32) then A@5(id33)).
    val dir = java.nio.file.Files.createTempDirectory("graft-q129").toString
    val rows = Seq(
      (10L, 0L, 1L, "A"), (11L, 1000000L, 1L, "B"),
      (12L, 2000000L, 1L, "A"), (13L, 3000000L, 1L, "B")) ++
      (0 until 5).map(i => (20L + i, i * 1000000L, 2L, "A")) ++
      Seq((31L, 0L, 3L, "C"), (32L, 5000000L, 3L, "B"), (33L, 5000000L, 3L, "A"))
    spark.createDataFrame(rows.map { case (id, us, u, t) => (id, us * 1000L, u, t) })
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Profiling.q129(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(got == Map(
      ("A", "B", "A") -> 1L, ("B", "A", "B") -> 1L,
      ("A", "A", "A") -> 3L, ("C", "B", "A") -> 1L))
  }

  test("bfsHops matches a local BFS reference on a fixed random graph") {
    val rnd = new scala.util.Random(11)
    val n = 40
    // sparse enough that some nodes sit beyond the hop cap
    val edges = (for {
      a <- 0 until n; b <- (a + 1) until n
      if rnd.nextDouble() < 0.06
    } yield (a.toLong, b.toLong)).toSeq
    val eDf = spark.createDataFrame(edges).toDF("a", "b")
    val maxHops = 3
    val got = Graphs.bfsHops(eDf, maxHops).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

    val nbrs = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val src = edges.map(_._1).min
    var ref = Map(src -> 0)
    var frontier = Seq(src)
    for (h <- 1 to maxHops) {
      val next = frontier.flatMap(nbrs.getOrElse(_, Nil))
        .distinct.filterNot(ref.contains)
      ref ++= next.map(_ -> h)
      frontier = next
    }
    assert(ref.values.max == maxHops, "fixture must exercise every round")
    assert(got === ref)
  }

  test("holtLinear is bit-equal to a local recurrence (same IEEE op order)") {
    // two series shapes: noisy upward trend, clean downward trend
    val series = Seq.tabulate(25)(t => ("up", t.toLong, (3 * t + 7 + (t % 5)).toLong)) ++
      Seq.tabulate(10)(t => ("down", t.toLong, (100 - 2 * t).toLong))
    val df = spark.createDataFrame(series).toDF("key", "k", "y").repartition(4)
    val got = graft.operators.EventTime.holtLinear(df, "key").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap

    val ref = series.groupBy(_._1).map { case (key, rows) =>
      val ys = rows.sortBy(_._2).map(_._3.toDouble)
      var l = ys.head; var b = 0.0
      for (y <- ys.tail) {
        val l2 = (y + (l + b)) / 2
        b = (b + (l2 - l)) / 2
        l = l2
      }
      key -> ((ys.size.toLong, l, b))
    }
    // exact equality, not a tolerance: the engine must execute the same
    // operation sequence, which is what lets Q123 hash-gate the fold
    assert(got === ref)
    // the clean linear series must converge toward its true slope
    assert(math.abs(got("down")._3 - (-2.0)) < 0.1)
  }

  test("kCore matches a local peeling reference on a fixed random graph") {
    // p=0.12 at n=30 puts the mean degree near k, so peeling cascades
    // over several rounds instead of converging in one.
    val rnd = new scala.util.Random(23)
    val n = 30
    val edges = (for {
      a <- 0 until n; b <- (a + 1) until n
      if rnd.nextDouble() < 0.12
    } yield (a.toLong, b.toLong)).toSeq
    val eDf = spark.createDataFrame(edges).toDF("a", "b")
    val k = 3
    val got = Graphs.kCore(eDf, k, 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    var alive = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var done = false
    var refDeg = Map.empty[Long, Long]
    while (!done) {
      val deg = edges.filter(e => alive(e._1) && alive(e._2))
        .flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val next = deg.filter(_._2 >= k).keySet
      done = next == alive
      refDeg = deg.filter(_._2 >= k)
      alive = next
    }
    assert(refDeg.nonEmpty && refDeg.size < edges.flatMap(e => Seq(e._1, e._2)).distinct.size,
      "fixture must actually peel something and keep something")
    assert(got === refDeg)
  }

  test("Q131 linkPredict: hand graph gives exact common-neighbor counts, " +
    "excludes adjacent pairs, and respects top-k") {
    // Triangle-plus-tail component: 1-2, 1-3, 2-3, 2-4, 3-4. The only
    // non-adjacent pair is (1,4): N(1)={2,3} = N(4), so cn=2 and
    // Jaccard 2/(2+2-2) = 1.0. (2,3) also shares two neighbors but IS an
    // edge and must not appear. Star 10-{11,12,13}: leaves pair up with
    // cn=1, Jaccard 1/(1+1-1) = 1.0.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L))
    val eDf = spark.createDataFrame(edges).toDF("a", "b")
    val got = Graphs.linkPredict(eDf, 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 4L, 2L, 1.0),
      (11L, 12L, 1L, 1.0), (11L, 13L, 1L, 1.0), (12L, 13L, 1L, 1.0)),
      s"ranked by (cn desc, pa, pb): $got")
    val top2 = Graphs.linkPredict(eDf, 2).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top2.toSeq == Seq((1L, 4L), (11L, 12L)), "top-k cut must be deterministic")
  }

  test("Q132 cohort retention: hand fixture gives the exact triangle and " +
    "in-week duplicates collapse") {
    // Cohort week 0: u1 active wks 0,1,2 (two events in wk 0 — must count
    // once), u2 wks 0,1, u3 wk 0. Cohort week 1: u4 active wks 1,3.
    val wkUs = 604800000000L
    def ev(user: Long, wk: Long, i: Int) = ((wk * wkUs + i) * 1000L, user)
    val rows = Seq(ev(1, 0, 0), ev(1, 0, 1), ev(1, 1, 0), ev(1, 2, 0),
      ev(2, 0, 0), ev(2, 1, 0), ev(3, 0, 0), ev(4, 1, 0), ev(4, 3, 0))
    val dir = java.nio.file.Files.createTempDirectory("graft-q132").toString
    spark.createDataFrame(rows).toDF("ts", "user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventTime.q132(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      (0L, 0L) -> (3L, 1.0), (0L, 1L) -> (2L, 0.666667), (0L, 2L) -> (1L, 0.333333),
      (1L, 0L) -> (1L, 1.0), (1L, 2L) -> (1L, 1.0)), s"got $got")
  }

  test("Q133 MAD anomalies: exact medians on odd and even day counts, " +
    "and the MAD=0 degenerate case flags every deviating day") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q133").toString
    def burst(tpe: String, day: Int, n: Int) =
      (0 until n).map(i => ((day * 86400000000L + i) * 1000L, tpe))
    // "m7": counts 5,5,5,5,5,100,1 -> med 5.0; devs {0x5, 4, 95} -> MAD 0;
    // the 3*MAD fence collapses to dev > 0, flagging exactly 2 days
    // (Hampel's documented majority-constant behavior).
    // "e4": counts 1,2,3,4 -> med (2+3)/2 = 2.5; devs 1.5,0.5,0.5,1.5 ->
    // MAD (0.5+1.5)/2 = 1.0; no dev exceeds 3.0 -> 0 anomalies.
    val rows = Seq(5, 5, 5, 5, 5, 100, 1).zipWithIndex
      .flatMap { case (n, d) => burst("m7", d, n) } ++
      Seq(1, 2, 3, 4).zipWithIndex.flatMap { case (n, d) => burst("e4", d, n) }
    spark.createDataFrame(rows).toDF("ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Profiling.q133(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got == Map(
      "m7" -> (7L, 5.0, 0.0, 2L),
      "e4" -> (4L, 2.5, 1.0, 0L)), s"got $got")
  }

  test("Q134 linear interpolation: exact straight-line fill between " +
    "neighbors, including a non-terminating division") {
    // user 1 observes days 0,2,6 at 10.00/30.00/14.00 -> day 1 is the
    // 20.00 midpoint; days 3,4,5 descend the (14-30)/4 = -4/day line.
    // user 2's 3-day gap divides 4 cents by 3: the result must be the
    // bit-exact IEEE (4.0/3.0)/100.0, proving the no-rounding contract.
    val dir = java.nio.file.Files.createTempDirectory("graft-q134").toString
    def ev(u: Long, day: Int, v: Double) =
      (u, day * 86400000000L * 1000L, v)
    val rows = Seq(ev(1L, 0, 10.0), ev(1L, 2, 30.0), ev(1L, 6, 14.0),
      ev(2L, 0, 0.01), ev(2L, 3, 0.02))
    spark.createDataFrame(rows).toDF("user_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventTime.q134(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3)))
      .toMap
    assert(got((1L, 0L)) == (10.0, 0) && got((1L, 2L)) == (30.0, 0))
    assert(got((1L, 1L)) == (20.0, 1), "midpoint of 10 and 30")
    assert(got((1L, 3L)) == (26.0, 1) && got((1L, 4L)) == (22.0, 1) &&
      got((1L, 5L)) == (18.0, 1), "the -4/day line to 14.0")
    assert(got((2L, 1L))._1 == (4.0 / 3.0) / 100.0 &&
      got((2L, 2L))._1 == (5.0 / 3.0) / 100.0,
      "inexact divisions must be the bare IEEE quotient, unrounded")
    assert(got.size == 11, "both spines fully gridded")
  }

  test("Q135 Bellman-Ford: a cheaper two-hop path beats the direct edge, " +
    "and the round bound truncates the horizon exactly") {
    import spark.implicits._
    // triangle: direct 1-3 costs 10, but 1-2-3 costs 2+3=5
    val tri = Seq((1L, 2L, 2L), (2L, 3L, 3L), (1L, 3L, 10L))
      .toDF("a", "b", "w")
    val got = Graphs.ssspBellmanFord(tri, Graphs.SsspRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 5L),
      s"label correction must revisit node 3: $got")
    // unit-weight chain 0-1-...-7: 6 rounds reach exactly 6 edges out
    val chain = (0L until 7L).map(i => (i, i + 1, 1L)).toDF("a", "b", "w")
    val hull = Graphs.ssspBellmanFord(chain, Graphs.SsspRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hull == (0L to 6L).map(i => i -> i).toMap,
      s"node 7 is 7 edges away and must be outside the 6-round horizon: $hull")
  }

  test("Q136 streaks: island lengths, totals, and the earliest-start " +
    "tie-break") {
    // user 1: days {0,1,2, 5,6, 10} -> best 3 starting day 0, 3 streaks;
    // user 2: {1,2, 7,8} -> two length-2 streaks, tie broken to start 1
    val dir = java.nio.file.Files.createTempDirectory("graft-q136").toString
    def ev(u: Long, day: Int) = (u, (day * 86400000000L + u) * 1000L, 1.0)
    val rows = Seq(0, 1, 2, 5, 6, 10).map(ev(1L, _)) ++
      Seq(1, 2, 7, 8).map(ev(2L, _)) ++
      Seq(ev(1L, 1)) // duplicate activity on an active day must not count twice
    spark.createDataFrame(rows).toDF("user_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventTime.q136(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      1L -> (3, 0L, 3L, 6L),
      2L -> (2, 1L, 2L, 4L)), s"got $got")
  }
  test("Q145 clustering coefficient: triangle corners are closed, the " +
    "hub with a pendant edge is diluted, pendant-only nodes are absent") {
    import spark.implicits._
    // order 10: parts 1,2,3 (a triangle); order 11: parts 1,4 (pendant)
    val dir = java.nio.file.Files.createTempDirectory("graft-q145").toString
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 1L), (11L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graphs.q145(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
    // cc: parts 2,3 close their whole (deg 2) neighborhood -> 1.0;
    // part 1 has deg 3 with one closed pair -> 1/3; part 4 never appears
    assert(got.toSeq === Seq(
      (2L, (2L, 1L, 1.0)), (3L, (2L, 1L, 1.0)),
      (1L, (3L, 1L, 0.333333))), s"got ${got.toSeq}")
  }
  test("Q147 multi-source BFS: distances per seed on a path graph, " +
    "exact 60/d harmonic carry") {
    import spark.implicits._
    // path 1-2-3-4-5: from seed 1, d(2)=1 d(3)=2 d(4)=3 d(5)=4
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val hops = Graphs.multiSourceBfsHops(path, 2, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(hops((1L, 5L)) === 4 && hops((1L, 3L)) === 2)
    assert(hops((2L, 5L)) === 3 && hops((2L, 1L)) === 1)
    // h60 for seed 1: 60 + 30 + 20 + 15 = 125
    val h60 = hops.collect { case ((s, v), d) if s == 1L && d > 0 => 60 / d }.sum
    assert(h60 === 125)
  }
  test("Q149 MA crossover: a step series golden-crosses once, exactly " +
    "where 7*s3 first exceeds 3*s7, and never before day 8") {
    import spark.implicits._
    // one event type, 14 days: low (1/day) for 9 days then high (10/day)
    val dir = java.nio.file.Files.createTempDirectory("graft-q149").toString
    val rows = (0 until 14).flatMap { d =>
      val n = if (d < 9) 1 else 10
      (0 until n).map(i => (d.toLong * 100 + i, (d * 86400000000L + i) * 1000L,
        1L, "click", 1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.EventTime.q149(spark, dir).collect()
      .map(r => (r.getLong(1), r.getString(4)))
    // day 9 (0-based): s3 = 1+1+10 = 12, s7 = 6*1+10 = 16 -> 84 > 48: cross
    assert(out.headOption === Some((9L, "golden")), s"got ${out.toSeq}")
    // the step up never crosses back down within horizon
    assert(out.count(_._2 == "death") === 0)
  }

  test("Q150 rolling median shrugs off a one-day spike that drags the mean") {
    import spark.implicits._
    // one type, 9 days at 1.00/day except day 4 at 1000.00 — the median of
    // any full 7-day window stays 100 cents while the mean would be ~143x
    val dir = java.nio.file.Files.createTempDirectory("graft-q150").toString
    val rows = (0 until 9).map { d =>
      val v = if (d == 4) 1000.0 else 1.0
      (d.toLong, d * 86400000000L * 1000L, 1L, "click", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventTime.q150(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // day 6 window = days 0..6: six 100s and one 100000 -> median 100
    assert(got(6L) === 100.0, s"median must ignore the spike, got ${got(6L)}")
    // day 4 window = days 0..4 (5 values, spike is the max) -> median 100
    assert(got(4L) === 100.0)
    // day 1 window = days 0..1 -> interpolated median of {100, 100} = 100
    assert(got(1L) === 100.0)
  }

  test("Q152 histogram clamps out-of-range values into the edge bins") {
    import spark.implicits._
    // values: -5 (underflow), 12 (bin 0), 30 (bin 1), 510 (overflow), 499 (bin 19)
    val dir = java.nio.file.Files.createTempDirectory("graft-q152").toString
    val vals = Seq(-5.0, 12.0, 30.0, 510.0, 499.0)
    vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, i.toLong * 1000000000L, 1L, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventTime.q152(spark, dir).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got(0L) === ((2L, 0.4)))  // -5 clamped + 12
    assert(got(1L) === ((1L, 0.2)))
    assert(got(19L) === ((2L, 0.4))) // 510 clamped + 499
    assert(got.keySet === Set(0L, 1L, 19L)) // empty bins not emitted
  }

  test("Q153 conversion latency: purchases before the first view don't count") {
    import spark.implicits._
    val us = 1000000L
    // user 1: purchase at t=5 BEFORE first view t=10; converts at t=30 -> lat 20s
    // user 2: view t=0, purchase t=100 -> lat 100s
    // user 3: views only -> never converts
    val rows = Seq(
      (1L, 5L, "purchase"), (1L, 10L, "view"), (1L, 30L, "purchase"),
      (2L, 0L, "view"), (2L, 100L, "purchase"),
      (3L, 1L, "view"), (3L, 2L, "view"))
    rows.zipWithIndex.map { case ((u, t, tpe), i) =>
      (i.toLong, t * us * 1000L, u, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir153/events.parquet")
    val r = graft.operators.EventTime.q153(spark, dir153).collect().head
    assert(r.getLong(0) === 2L)                       // users 1 and 2
    assert(r.getDouble(1) === (20L + 100L) * us / 2.0) // interpolated median
    assert(r.getLong(4) === 100L * us)                 // max
  }
  private lazy val dir153 =
    java.nio.file.Files.createTempDirectory("graft-q153").toString

  test("Q151 skew profile: planted hot key shows up in max/p99/top10_share") {
    import spark.implicits._
    // 100 keys with 2 rows each + key 999 with 60 rows
    val dir = java.nio.file.Files.createTempDirectory("graft-q151").toString
    val rows = (0 until 100).flatMap(k => Seq.fill(2)(k.toLong)) ++
      Seq.fill(60)(999L)
    rows.map(Tuple1(_)).toDF("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.operators.Profiling.q151(spark, dir).collect().head
    assert(r.getLong(0) === 101L)        // n_keys
    assert(r.getLong(1) === 260L)        // total_rows
    assert(r.getLong(2) === 60L)         // max_cnt
    assert(r.getDouble(3) === 2.0)       // p50: all-but-one key at 2
    assert(r.getDouble(4) === 2.0)       // p99: index .99*100 = 99 -> 2
    // top 10 = hot key (60) + nine cold keys (2 each) = 78 rows
    assert(r.getLong(5) === 78L)
    assert(math.abs(r.getDouble(6) - 78.0 / 260) < 1e-9)
  }
}
