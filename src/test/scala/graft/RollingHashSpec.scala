package graft

import org.apache.spark.sql.functions._

/** The codegen'd Rabin–Karp rolling hash must equal a naive per-window
  * polynomial recompute on arbitrary strings (the Q84 oracle proves it
  * cross-engine on the fixtures; this proves it on adversarial inputs —
  * empty, shorter-than-k, repeated chars, non-ASCII BMP).
  */
class RollingHashSpec extends SparkSpec {

  private val B = 1000003L
  private val Mask = 0xFFFFFFFFL

  private def naive(s: String, k: Int): Seq[Long] =
    if (s.length < k) Seq.empty
    else (0 to s.length - k).map { i =>
      var h = 0L
      (i until i + k).foreach(j => h = (h * B + s.charAt(j)) & Mask)
      h
    }

  test("rolling hashes equal the naive per-window recompute (incl. edge cases)") {
    graft.plans.GraftExtensions.registerRuntime(spark)
    import spark.implicits._
    val cases = Seq(
      "", "a", "abcdefgh", "aaaaaaaaaaaaaaaa", "the quick brown fox",
      "ababababababababab", "μικρό κείμενο εδώ", "x" * 500)
    val got = cases.toDF("s")
      .select(col("s"), call_function("graft_rolling_hash", col("s"), lit(8)).as("h"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    cases.foreach { s =>
      assert(got(s) == naive(s, 8), s"mismatch for '${s.take(30)}'")
    }
  }

  test("hash collisions across equal substrings; distinct for the fixture docs") {
    graft.plans.GraftExtensions.registerRuntime(spark)
    import spark.implicits._
    // Identical windows must produce identical hashes wherever they occur.
    val s = "prefix SHARED-WINDOW middle SHARED-WINDOW suffix"
    val hs = Seq(s).toDF("s")
      .select(explode(call_function("graft_rolling_hash", col("s"), lit(13))).as("h"))
      .collect().map(_.getLong(0))
    val occurrences = naive(s, 13)
    assert(hs.toSeq == occurrences)
    val shared = naive("SHARED-WINDOW", 13).head
    assert(hs.count(_ == shared) >= 2, "equal substrings must collide")
  }
}
