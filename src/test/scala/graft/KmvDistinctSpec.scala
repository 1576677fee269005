package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvSketch

/** KMV distinct sketch (TypedImperativeAggregate): accuracy vs exact,
  * exactness below k, determinism, and merge algebra.
  */
class KmvDistinctSpec extends SparkSpec {

  test("KMV estimate within 15% of exact distinct at k=256") {
    val c = Catalog(spark, sf("sf0.01")) // registers graft_kmv_distinct
    c.register()
    val row = spark.sql(
      """SELECT COUNT(DISTINCT l_partkey) AS exact,
        |       graft_kmv_distinct(l_partkey, 256) AS kmv
        |FROM lineitem""".stripMargin).collect()(0)
    val exact = row.getLong(0); val est = row.getLong(1)
    assert(math.abs(est - exact).toDouble / exact <= 0.15, s"exact=$exact kmv=$est")
  }

  test("KMV is exact below k and deterministic across runs") {
    val c = Catalog(spark, sf("sf0.01"))
    c.register()
    // 5 event types << k=64 → exact.
    val small = spark.sql(
      "SELECT graft_kmv_distinct(event_type, 64) AS n FROM events").collect()(0).getLong(0)
    assert(small == 5, s"expected exact 5, got $small")
    val r1 = spark.sql(
      "SELECT graft_kmv_distinct(user_id, 128) FROM events").collect()(0).getLong(0)
    val r2 = spark.sql(
      "SELECT graft_kmv_distinct(user_id, 128) FROM events").collect()(0).getLong(0)
    assert(r1 == r2, s"$r1 != $r2")
  }

  test("KMV per-group with partial aggregation matches single-pass sketch") {
    val c = Catalog(spark, sf("sf0.01"))
    c.register()
    val grouped = spark.sql(
      """SELECT event_type, graft_kmv_distinct(user_id, 128) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.sql(
      """SELECT event_type, COUNT(DISTINCT user_id) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(math.abs(grouped(t) - n).toDouble / n <= 0.2, s"$t: ${grouped(t)} vs $n")
    }
  }

  test("sketch-column algebra: union/intersect/jaccard estimates track exact set ops") {
    val c = Catalog(spark, sf("sf0.01"))
    c.register()
    // One sketch column per event type over user ids, then pairwise set
    // estimates WITHOUT re-touching the events table — the sketch-column
    // pattern under test.
    val sketches = spark.sql(
      """SELECT event_type, graft_kmv_sketch(user_id, 256) AS sk
        |FROM events GROUP BY event_type""".stripMargin)
    sketches.createOrReplaceTempView("sketches")
    val est = spark.sql(
      """SELECT a.event_type AS ta, b.event_type AS tb,
        |  graft_kmv_union(a.sk, b.sk) AS u,
        |  graft_kmv_intersect(a.sk, b.sk) AS i,
        |  graft_kmv_jaccard(a.sk, b.sk) AS j
        |FROM sketches a JOIN sketches b ON a.event_type < b.event_type""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val users = spark.sql("SELECT DISTINCT event_type, user_id FROM events")
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    est.foreach { case ((ta, tb), (u, i, j)) =>
      val eu = (users(ta) | users(tb)).size
      val ei = (users(ta) & users(tb)).size
      val ej = ei.toDouble / eu
      assert(math.abs(u - eu).toDouble / eu <= 0.2, s"union $ta/$tb: $u vs $eu")
      assert(math.abs(i - ei).toDouble / math.max(ei, 1) <= 0.3, s"intersect $ta/$tb: $i vs $ei")
      assert(math.abs(j - ej) <= 0.15, s"jaccard $ta/$tb: $j vs $ej")
    }
  }

  test("sketch rollup: per-day sketches merged == direct sketch, byte-identical") {
    val c = Catalog(spark, sf("sf0.01"))
    c.register()
    val direct = spark.sql(
      """SELECT event_type, graft_kmv_sketch(user_id, 128) AS sk
        |FROM events GROUP BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val rolled = spark.sql(
      """SELECT event_type, graft_kmv_merge(sk, 128) AS sk FROM (
        |  SELECT event_type, ts DIV 1000 DIV 86400000000 AS day,
        |    graft_kmv_sketch(user_id, 128) AS sk
        |  FROM events GROUP BY 1, 2)
        |GROUP BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(direct.keySet == rolled.keySet)
    direct.foreach { case (t, bytes) =>
      assert(java.util.Arrays.equals(bytes, rolled(t)),
        s"$t: rollup changed the sketch — merge is not associativity-safe")
      assert(KmvSketch.fromBytes(bytes).estimate ==
        KmvSketch.fromBytes(rolled(t)).estimate)
    }
  }

  test("merge with a larger k clamps to the inputs' k instead of underestimating") {
    val c = Catalog(spark, sf("sf0.01"))
    c.register()
    // Saturated k=128 sketches rolled up under graft_kmv_merge(sk, 256):
    // the old buffer kept 256 slots that the 128-hash inputs could never
    // fill, so estimate() took its "exact" size<k branch — a gross
    // underestimate. The clamped merge must land near the k=128 estimate.
    val direct = spark.sql(
      "SELECT graft_kmv_distinct(user_id, 128) FROM events").collect()(0).getLong(0)
    val mergedBig = spark.sql(
      """SELECT graft_kmv_estimate(graft_kmv_merge(sk, 256)) FROM (
        |  SELECT event_type, graft_kmv_sketch(user_id, 128) AS sk
        |  FROM events GROUP BY 1)""".stripMargin).collect()(0).getLong(0)
    assert(math.abs(mergedBig - direct).toDouble / direct <= 0.25,
      s"k-mismatch merge drifted: direct k=128 $direct vs merge-at-256 $mergedBig")
  }

  test("sketch merge is commutative and idempotent on the same set") {
    def sk(xs: Seq[Long], k: Int): KmvSketch = {
      val s = new KmvSketch(k); xs.foreach(s.add); s
    }
    val a = sk((1L to 500L).map(_ * 7919), 64)
    val b = sk((200L to 900L).map(_ * 7919), 64)
    val ab = sk((1L to 500L).map(_ * 7919), 64).merge(sk((200L to 900L).map(_ * 7919), 64))
    val ba = sk((200L to 900L).map(_ * 7919), 64).merge(sk((1L to 500L).map(_ * 7919), 64))
    assert(ab.estimate == ba.estimate)
    val aa = sk((1L to 500L).map(_ * 7919), 64).merge(sk((1L to 500L).map(_ * 7919), 64))
    assert(aa.estimate == a.estimate)
  }
}
