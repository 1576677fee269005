package graft

import org.apache.spark.sql.functions._
import graft.functions.CmsState

/** Count-Min sketch: the one-sided error contract (never undercounts,
  * overcount bounded by (e/width)·n), exact n conservation, the
  * partitioning-independent merge algebra (byte identity — CMS state is
  * a sum, unlike KLL's order-sensitive compactors), and the SQL
  * sketch-column surface on a real table.
  */
class CountMinSpec extends SparkSpec {

  private def zipfItems(n: Int, keys: Int): Seq[String] =
    // deterministic zipf-ish mix: key j appears ~ n/(j+1) times
    (0 until n).map(i => s"k${i % (keys * (i % 7 + 1) / 7 + 1)}")

  test("estimates never undercount and respect the epsilon bound") {
    val items = zipfItems(50000, 200)
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val s = new CmsState(5, 512)
    items.foreach(s.add(_))
    assert(s.n === items.size.toLong)
    val eps = math.E / 512
    truth.foreach { case (k, t) =>
      val est = s.estimate(k)
      assert(est >= t, s"CMS undercounted $k: $est < $t")
      assert(est <= t + (eps * s.n).toLong + 1,
        s"$k overcounted past the bound: est $est, true $t, n ${s.n}")
    }
    // an unseen key may collide but stays within the same bound
    assert(s.estimate("never-seen") <= (eps * s.n).toLong + 1)
  }

  test("merge is exact addition: byte-identical to a single-pass build") {
    val items = zipfItems(20000, 100)
    val whole = new CmsState(4, 256)
    items.foreach(whole.add(_))
    // split into 7 arbitrary shards, build independently, merge
    val merged = items.grouped(2857).map { shard =>
      val s = new CmsState(4, 256)
      shard.foreach(s.add(_))
      s
    }.reduce(_.merge(_))
    assert(java.util.Arrays.equals(whole.serialize(), merged.serialize()),
      "CMS merge must be partitioning-independent (pure counter addition)")
  }

  test("dimension mismatch on merge fails loudly") {
    val a = new CmsState(4, 256); val b = new CmsState(4, 512)
    a.add("x"); b.add("x")
    intercept[IllegalArgumentException] { a.merge(b) }
  }

  test("serialization round-trips estimates and n") {
    val s = new CmsState(3, 64)
    Seq("a", "a", "b", "c", "c", "c").foreach(s.add(_))
    val back = CmsState.deserialize(s.serialize())
    assert(back.n === 6L)
    Seq("a", "b", "c", "zz").foreach { k =>
      assert(back.estimate(k) === s.estimate(k))
    }
  }

  test("SQL surface: per-group sketches roll up to the global answer") {
    graft.plans.GraftExtensions.registerRuntime(spark)
    import spark.implicits._
    val df = (0 until 10000)
      .map(i => (i % 8, s"tok${i % 37}"))
      .toDF("grp", "tok")
    df.createOrReplaceTempView("cms_in")
    // build per-group, roll up with graft_cms_merge, query two tokens
    val row = spark.sql(
      """SELECT graft_cms_n(m) AS n,
        |       graft_cms_query(m, 'tok0') AS c0,
        |       graft_cms_query(m, 'tok36') AS c36
        |FROM (SELECT graft_cms_merge(sk) AS m
        |      FROM (SELECT grp, graft_cms_sketch(tok, 5, 1024) AS sk
        |            FROM cms_in GROUP BY grp))""".stripMargin).head()
    assert(row.getLong(0) === 10000L)
    // tok0: ceil counts — i % 37 == 0 for 271 values of i in [0,10000)
    val true0 = (0 until 10000).count(_ % 37 == 0).toLong
    val true36 = (0 until 10000).count(_ % 37 == 36).toLong
    assert(row.getLong(1) >= true0 &&
      row.getLong(1) <= true0 + (math.E / 1024 * 10000).toLong + 1)
    assert(row.getLong(2) >= true36 &&
      row.getLong(2) <= true36 + (math.E / 1024 * 10000).toLong + 1)
  }
}
