package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{EventTime, Joins, Stats}

/** Round-8 session-3 product-analytics family: rolling 7-day active users
  * (Q175), population-stability drift between time halves (Q176), the
  * intra-region market-share star query (Q177), Flesch readability
  * (Q178), lead–lag cross-correlation (Q179), and arrival-process
  * burstiness/memory (Q180). Cross-engine hashes are the DuckDB gates;
  * these pin the MODELS on handcrafted data.
  */
class ProductAnalyticsSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def writeEvents(dir: String, rows: Seq[(Long, String, String, Double)]): Unit = {
    // (user_id, ts-string, event_type, value)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("tss", StringType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3, r._4)), 2), schema)
      .selectExpr("monotonically_increasing_id() AS event_id",
        "to_timestamp(tss) AS ts", "user_id", "event_type", "value",
        "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("Q175 dau/wau: expansion window matches hand-counted rolling distincts") {
    val dir = tmpDir("wau-spec")
    // u1 active day0+day1, u2 active day0+day8, u3 active day3 only.
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:00:00", "view", 1.0),
      (1L, "2024-01-01 11:00:00", "view", 1.0), // same user-day, dedups
      (1L, "2024-01-02 09:00:00", "view", 1.0),
      (2L, "2024-01-01 12:00:00", "view", 1.0),
      (2L, "2024-01-09 12:00:00", "view", 1.0),
      (3L, "2024-01-04 12:00:00", "view", 1.0)))
    val rows = EventTime.q175(spark, dir).collect()
    assert(rows.length === 9) // day0..day8 spine
    val byIdx = rows.zipWithIndex
      .map { case (r, i) => i -> (r.getAs[Long]("dau"), r.getAs[Long]("wau7")) }.toMap
    assert(byIdx(0) === ((2L, 2L)))  // u1,u2 active day0
    assert(byIdx(1) === ((1L, 2L)))  // u1 active; window {u1,u2}
    assert(byIdx(3) === ((1L, 3L)))  // u3 active; window {u1,u2,u3}
    assert(byIdx(6) === ((0L, 3L)))  // day6 window still covers day0..6
    assert(byIdx(7) === ((0L, 2L)))  // day0 fell out: {u1 (day1), u3 (day3)}
    assert(byIdx(8) === ((1L, 2L)))  // u2 returns; {u2, u3(day3? no: day8-6=2..8 → u3 day3 yes)}
  }

  test("Q176 PSI: identical halves score 0, a full bin shift scores ~1.953") {
    val dir = tmpDir("psi-spec")
    // Global range [t0, t3]; mid = t1.5. "same": {1,2} in both halves.
    // "drift": all-1 ref half, all-2 cur half.
    writeEvents(dir, Seq(
      (1L, "2024-01-01 00:00:00", "same", 1.0),
      (1L, "2024-01-01 00:00:00", "same", 2.0),
      (1L, "2024-01-01 03:00:00", "same", 1.0),
      (1L, "2024-01-01 03:00:00", "same", 2.0),
      (2L, "2024-01-01 00:00:00", "drift", 1.0),
      (2L, "2024-01-01 00:00:00", "drift", 1.0),
      (2L, "2024-01-01 00:00:00", "drift", 1.0),
      (2L, "2024-01-01 00:00:00", "drift", 1.0),
      (2L, "2024-01-01 03:00:00", "drift", 2.0),
      (2L, "2024-01-01 03:00:00", "drift", 2.0),
      (2L, "2024-01-01 03:00:00", "drift", 2.0),
      (2L, "2024-01-01 03:00:00", "drift", 2.0)))
    val got = Stats.q176(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Double]("psi"))).toMap
    assert(got("same")._1 === 2L && got("same")._2 === 2L)
    assert(got("same")._3 === 0.0)
    // ref: bin0 x4; cur: bin9 x4; Jeffreys shares 0.5/9 vs 4.5/9 twice:
    // 2 * (0.5 - 1/18) * ln(9) = 1.953089 (bins 1..8 cancel exactly)
    assert(math.abs(got("drift")._3 - 1.953089) < 1e-4)
  }

  test("Q176 zero-range value distribution reports NULL psi, not NaN") {
    val dir = tmpDir("psi-degen")
    writeEvents(dir, Seq(
      (1L, "2024-01-01 00:00:00", "const", 5.0),
      (1L, "2024-01-01 03:00:00", "const", 5.0)))
    val rows = Stats.q176(spark, dir).collect()
    assert(rows.isEmpty) // zero-range types drop out of the binnable set
  }

  test("Q177 market share: intra-region cents over hand-built two-region star") {
    val dir = tmpDir("share-spec")
    def write(name: String, schema: StructType, rows: Seq[Row]): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    write("region", StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType))),
      Seq(Row(0, "EAST"), Row(1, "WEST")))
    write("nation", StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
      Seq(Row(10, "A", 0), Row(20, "B", 1)))
    write("customer", StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_nationkey", IntegerType))),
      Seq(Row(1L, 10)))
    write("supplier", StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_nationkey", IntegerType))),
      Seq(Row(100L, 10), Row(200L, 20)))
    val ts = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    write("orders", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderdate", TimestampType))),
      Seq(Row(1000L, 1L, ts)))
    write("lineitem", StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_suppkey", LongType),
      StructField("l_extendedprice", DoubleType), StructField("l_discount", DoubleType))),
      Seq(Row(1000L, 100L, 10.0, 0.0),   // intra (EAST supplier): 1000 cents
        Row(1000L, 200L, 20.0, 0.5)))    // cross (WEST supplier): 1000 cents
    val got = Joins.q177(spark, dir).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getString(0) === "EAST" && r.getInt(1) === 1995)
    assert(r.getAs[Long]("total_cents") === 2000L)
    assert(r.getAs[Long]("intra_cents") === 1000L)
    assert(r.getAs[Double]("share") === 0.5)
  }

  test("Q178 Flesch: hand-computed scores for simple and complex prose") {
    val dir = tmpDir("flesch-spec")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, "a", "the cat sat. it ran!"),
        Row(1L, "a", ""),                       // empty: excluded
        Row(2L, "b", "infinity foundation")), 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.q178(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_sentences"),
          r.getAs[Long]("n_syllables"), r.getAs[Double]("flesch"),
          r.getAs[Double]("fk_grade"))).toMap
    // a: W=5 S=2 Y=5 -> RE = 206.835 - 1.015*2.5 - 84.6 = 119.6975
    assert(got("a") === ((5L, 2L, 5L, 119.6975, -2.815)))
    // b: W=2 S=1 Y=7 (in-fi-ni-ty=4, foun-da-tion=3)
    assert(got("b") === ((2L, 1L, 7L, -91.295, 26.49)))
  }

  test("Q179 lead-lag: a one-day-shifted series correlates perfectly at lag +1") {
    val dir = tmpDir("leadlag-spec")
    // x: day0 x1, day1 x2, day2 x3 ; y: day1 x1, day2 x2, day3 x3
    def day(d: Int, n: Int, t: String): Seq[(Long, String, String, Double)] =
      (1 to n).map(i => (i.toLong, f"2024-01-${d + 1}%02d 00:00:00", t, 1.0))
    writeEvents(dir,
      day(0, 1, "x") ++ day(1, 2, "x") ++ day(2, 3, "x") ++
        day(1, 1, "y") ++ day(2, 2, "y") ++ day(3, 3, "y"))
    val got = graft.operators.EventTime.q179(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getAs[Long]("m"), Option(r.getAs[Double]("r")))).toMap
    assert(got(("x", "y", 1L)) === ((3L, Some(1.0))))   // y trails x by 1 day
    assert(got(("x", "y", 0L)) === ((4L, Some(-0.2))))  // [1,2,3,0] vs [0,1,2,3]
    assert(got.size === 7)                              // one pair x 7 lags
  }

  test("Q180 burstiness: regular train scores -1, alternating gaps score (sigma-mu)/(sigma+mu)") {
    val dir = tmpDir("burst-spec")
    writeEvents(dir, Seq(
      // "reg": gaps 10,10,10 -> sigma=0, B=-1, memory NULL (zero variance)
      (1L, "2024-01-01 00:00:00", "reg", 1.0),
      (2L, "2024-01-01 00:00:10", "reg", 1.0),
      (3L, "2024-01-01 00:00:20", "reg", 1.0),
      (4L, "2024-01-01 00:00:30", "reg", 1.0),
      // "alt": gaps 0,30,0 -> mu=10 sigma=sqrt(300), memory=-1 (anti-run)
      (5L, "2024-01-01 00:00:00", "alt", 1.0),
      (6L, "2024-01-01 00:00:00", "alt", 1.0),
      (7L, "2024-01-01 00:00:30", "alt", 1.0),
      (8L, "2024-01-01 00:00:30", "alt", 1.0)))
    val got = graft.operators.EventTime.q180(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_gaps"), Option(r.getAs[Any]("burstiness")),
          Option(r.getAs[Any]("memory")))).toMap
    assert(got("reg")._1 === 3L)
    assert(got("reg")._2 === Some(-1.0))
    assert(got("reg")._3 === None)
    // gaps {0,30,0}: mu=10, sample var = (100+400+100)/2 = 300
    val bAlt = got("alt")._2.get.asInstanceOf[Double]
    assert(math.abs(bAlt - (math.sqrt(300.0) - 10) / (math.sqrt(300.0) + 10)) < 1e-3)
    assert(got("alt")._3.map(_.asInstanceOf[Double]) === Some(-1.0))
  }

  test("Q181 Zipf slope: an exact 1/rank law fits slope -1 with r2 = 1") {
    val dir = tmpDir("zipf-spec")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        // counts 6,3,2 = 6/rank exactly -> ln-ln line with slope -1
        Row(0L, "z", "a a a a a a b b b c c"),
        Row(1L, "one", "solo")), 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextAnalysis.q181(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_types"), Option(r.getAs[Any]("zipf_slope")),
          Option(r.getAs[Any]("r2")))).toMap
    assert(got("z")._1 === 3L)
    assert(got("z")._2.map(_.asInstanceOf[Double]) === Some(-1.0))
    assert(got("z")._3.map(_.asInstanceOf[Double]) === Some(1.0))
    assert(got("one") === ((1L, None, None))) // single rank: no fit
  }

  test("Q182 attribution: equal split across the 72h window, out-of-window views dropped") {
    val dir = tmpDir("attrib-spec")
    writeEvents(dir, Seq(
      // u1: purchase day4 noon; views 2h / 26h / 71h / 73h before
      (1L, "2024-01-04 12:00:00", "purchase", 1.0),
      (1L, "2024-01-04 10:00:00", "view", 1.0),
      (1L, "2024-01-03 10:00:00", "view", 1.0),
      (1L, "2024-01-01 13:00:00", "view", 1.0),
      (1L, "2024-01-01 11:00:00", "view", 1.0),  // 73h: outside
      // u2: two same-day touches share 1/2 each
      (2L, "2024-01-04 12:00:00", "purchase", 1.0),
      (2L, "2024-01-04 09:00:00", "view", 1.0),
      (2L, "2024-01-04 10:00:00", "view", 1.0),
      // u3: view only after purchase -> no attribution
      (3L, "2024-01-04 12:00:00", "purchase", 1.0),
      (3L, "2024-01-04 13:00:00", "view", 1.0)))
    val got = graft.operators.EventTime.q182(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_touches"), r.getAs[Long]("n_users"),
          r.getAs[Double]("credit"), r.getAs[Double]("credit_share"))).toMap
    assert(got(0L) === ((3L, 2L, 1.3333, 0.6667)))
    assert(got(1L) === ((1L, 1L, 0.3333, 0.1667)))
    assert(got(2L) === ((1L, 1L, 0.3333, 0.1667)))
    assert(got.size === 3)
  }

  test("Q183 backtest: hand-computed naive/snaive7 MAE and sMAPE, short series skips snaive") {
    val dir = tmpDir("backtest-spec")
    // type a: spine [1,0,0,1] (4 days -> naive only);
    // type b: spine [2,1,1,1,1,1,1,2] (8 days -> one snaive7 eval)
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:00:00", "a", 1.0),
      (1L, "2024-01-04 10:00:00", "a", 1.0)) ++
      Seq("2024-01-01 09:00:00", "2024-01-01 10:00:00",
        "2024-01-02 10:00:00", "2024-01-03 10:00:00", "2024-01-04 10:00:00",
        "2024-01-05 10:00:00", "2024-01-06 10:00:00", "2024-01-07 10:00:00",
        "2024-01-08 09:00:00", "2024-01-08 10:00:00")
        .map(ts => (2L, ts, "b", 1.0)))
    val got = graft.operators.EventTime.q183(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_eval"), r.getAs[Long]("sae"),
          r.getAs[Double]("mae"), r.getAs[Double]("smape"))).toMap
    // a/naive: errs 1,0,1; smape terms 2, 0 (both-zero convention), 2
    assert(got(("a", "naive")) === ((3L, 2L, 0.666667, 1.333333)))
    assert(!got.contains(("a", "snaive7"))) // series shorter than lag 7
    // b/naive: errs 1,0,0,0,0,0,1; terms 2/3, 0x5, 2/3
    assert(got(("b", "naive"))._1 === 7L)
    assert(got(("b", "naive"))._2 === 2L)
    assert(got(("b", "naive"))._3 === 0.285714)
    assert(got(("b", "naive"))._4 === 0.190476) // (4/3)/7
    // b/snaive7: one eval, y=yh=2 -> perfect
    assert(got(("b", "snaive7")) === ((1L, 0L, 0.0, 0.0)))
  }

  test("Q186 load profile: dow mapping (Mon=0), biz/night/weekend shares, exact entropy") {
    val dir = tmpDir("loadprof-spec")
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:00:00", "a", 1.0),  // Mon, 10h: biz
      (1L, "2024-01-01 10:30:00", "a", 1.0),  // same hour-of-week cell
      (2L, "2024-01-06 03:00:00", "a", 1.0),  // Sat, 3h: night + weekend
      (3L, "2024-01-07 23:00:00", "a", 1.0))) // Sun, 23h: weekend
    val r = graft.operators.EventTime.q186(spark, dir).collect().head
    assert(r.getAs[Long]("total") === 4L)
    assert(r.getAs[Long]("peak_dow") === 0L)   // Monday
    assert(r.getAs[Long]("peak_hour") === 10L)
    assert(r.getAs[Double]("peak_share") === 0.5)
    assert(r.getAs[Double]("biz_share") === 0.5)
    assert(r.getAs[Double]("night_share") === 0.25)
    assert(r.getAs[Double]("weekend_share") === 0.5)
    // cells {1/2, 1/4, 1/4} -> H = 1.5 bits exactly
    assert(r.getAs[Double]("entropy_bits") === 1.5)
  }

  test("Q188 dow ANOVA: hand-computed F/eta2 on a two-week weekly cycle") {
    val dir = tmpDir("dowanova-spec")
    // Two full weeks Jan 1-14 2024 (Jan 1 = Monday). Mondays get 3
    // events, Jan 9 (Tue) gets 2, every other day 1:
    // dow0 {3,3}, dow1 {1,2}, dows2-6 {1,1} ->
    // ssb = 47/7, ssw = 1/2, F = 47/3 = 15.6667, eta2 = 94/101 = 0.930693
    val rows = (1 to 14).flatMap { d =>
      val date = f"2024-01-$d%02d 10:00:00"
      val n = if (d == 1 || d == 8) 3 else if (d == 9) 2 else 1
      Seq.fill(n)((d.toLong, date, "a", 1.0))
    }
    writeEvents(dir, rows)
    val r = graft.operators.EventTime.q188(spark, dir).collect().head
    assert(r.getAs[Long]("n_days") === 14L)
    assert(r.getAs[Long]("k_dows") === 7L)
    assert(r.getAs[Double]("ssb") === 6.7143)
    assert(r.getAs[Double]("ssw") === 0.5)
    assert(r.getAs[Double]("f") === 15.6667)
    assert(r.getAs[Double]("eta2") === 0.930693)
    assert(r.getAs[Long]("peak_dow") === 0L)
    assert(r.getAs[Double]("peak_mean") === 3.0)

    // constant series: ssw = 0 -> F undefined (NULL), eta2 defined
    val dir2 = tmpDir("dowanova-flat")
    writeEvents(dir2, (1 to 14).map(d =>
      (d.toLong, f"2024-01-$d%02d 10:00:00", "b", 1.0)))
    val fl = graft.operators.EventTime.q188(spark, dir2).collect().head
    assert(fl.isNullAt(fl.fieldIndex("f")))
  }

  test("Q192 LTV curve: cohort assignment, exact cents accumulation, per-user normalization") {
    val dir = tmpDir("ltv-spec")
    // epoch weeks: Jan 1-3 2024 sit in week W, Jan 8-9 in W+1
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:00:00", "view", 1.0),      // u1 cohort W
      (1L, "2024-01-02 10:00:00", "purchase", 10.0), // W offset 0: 1000c
      (1L, "2024-01-08 10:00:00", "purchase", 5.0),  // W offset 1: 500c
      (2L, "2024-01-01 11:00:00", "view", 1.0),      // u2 cohort W, no rev
      (3L, "2024-01-08 11:00:00", "view", 1.0),      // u3 cohort W+1
      (3L, "2024-01-09 10:00:00", "purchase", 2.5))) // W+1 offset 0: 250c
    val got = graft.operators.EventTime.q192(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("wk_rev_cents"), r.getAs[Long]("cum_rev_cents"),
          r.getAs[Long]("cohort_users"),
          r.getAs[Double]("ltv_cents_per_user")))
    val byKey = got.toMap
    val w = got.map(_._1._1).min
    assert(byKey((w, 0L)) === ((1000L, 1000L, 2L, 500.0)))
    assert(byKey((w, 1L)) === ((500L, 1500L, 2L, 750.0)))
    assert(byKey((w + 1L, 0L)) === ((250L, 250L, 1L, 250.0)))
    assert(got.length === 3)
  }

  test("Q193 lift matrix: hand-computed lift and user-jaccard over three users") {
    val dir = tmpDir("lift-spec")
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:00:00", "view", 1.0),
      (1L, "2024-01-01 11:00:00", "purchase", 1.0),
      (2L, "2024-01-01 12:00:00", "view", 1.0),
      (3L, "2024-01-01 13:00:00", "view", 1.0),
      (3L, "2024-01-01 14:00:00", "purchase", 1.0),
      (3L, "2024-01-01 15:00:00", "error", 1.0)))
    val got = graft.operators.EventTime.q193(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_ab"),
          r.getAs[Double]("lift"), r.getAs[Double]("user_jaccard"))).toMap
    // N=3; view:3 purchase:2 error:1
    assert(got(("error", "purchase")) === ((1L, 2L, 1L, 1.5, 0.5)))
    assert(got(("error", "view")) === ((1L, 3L, 1L, 1.0, 0.333333)))
    assert(got(("purchase", "view")) === ((2L, 3L, 2L, 1.0, 0.666667)))
    assert(got.size === 3)
  }

  test("Q194 growth accounting: new/retained/resurrected/churned ledger with the MAU identity") {
    val dir = tmpDir("growth-spec")
    // weeks (epoch): u1 active W, W+1, W+3; u2 active W only; u3 W+1 only
    writeEvents(dir, Seq(
      (1L, "2024-01-04 10:00:00", "view", 1.0),  // W   (Jan 4-10)
      (1L, "2024-01-11 10:00:00", "view", 1.0),  // W+1
      (1L, "2024-01-25 10:00:00", "view", 1.0),  // W+3
      (2L, "2024-01-05 10:00:00", "view", 1.0),  // W
      (3L, "2024-01-12 10:00:00", "view", 1.0))) // W+1
    val rows = graft.operators.EventTime.q194(spark, dir).collect()
      .map(r => (r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
        r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
        r.getAs[Long]("n_churned"),
        Option(r.getAs[Any]("quick_ratio")).map(_.asInstanceOf[Double])))
    assert(rows.length === 4) // full spine W..W+3, W+2 zero-filled
    assert(rows(0) === ((2L, 2L, 0L, 0L, 0L, None)))        // W: both new
    assert(rows(1) === ((2L, 1L, 1L, 0L, 1L, Some(1.0))))   // u3 new, u1 ret, u2 churn
    assert(rows(2) === ((0L, 0L, 0L, 0L, 2L, Some(0.0))))   // u1+u3 churn into W+2
    assert(rows(3) === ((1L, 0L, 0L, 1L, 0L, None)))        // u1 resurrects
    // the accounting identity: active = new + retained + resurrected
    rows.foreach { case (a, n, rt, rs, _, _) => assert(a === n + rt + rs) }
  }
}
