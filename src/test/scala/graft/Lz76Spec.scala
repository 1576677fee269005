package graft

import org.apache.spark.sql.functions._
import graft.plans.Lz76

/** The native LZ76 expression must implement the exhaustive-history
  * parsing exactly: known closed-form cases, agreement with an
  * independent reference parser on random ternary strings, and the
  * codegen path (DataFrame column) must equal the static parser.
  */
class Lz76Spec extends SparkSpec {

  /** Independent reference: Kaspar–Schuster c(n) state machine
    * (Physica D 1987) — a DIFFERENT formulation of the same parsing,
    * so agreement is evidence, not tautology.
    */
  private def ks(s: String): Long = {
    val n = s.length
    if (n == 0) return 0L
    var c = 1L
    var l = 1
    var i = 0
    var k = 1
    var kMax = 1
    if (l + k > n) return c // single character: one phrase, loop never runs
    var done = false
    while (!done) {
      if (s.charAt(i + k - 1) == s.charAt(l + k - 1)) {
        k += 1
        if (l + k > n) { c += 1; done = true }
      } else {
        if (k > kMax) kMax = k
        i += 1
        if (i == l) {
          c += 1
          l += kMax
          if (l + 1 > n) done = true
          else { i = 0; k = 1; kMax = 1 }
        } else {
          k = 1
        }
      }
    }
    c
  }

  test("closed-form cases") {
    assert(Lz76.complexity("") == 0L)
    assert(Lz76.complexity("a") == 1L)
    assert(Lz76.complexity("aa") == 2L)
    // a | aaaa... : one innovation then one self-reproducing run
    assert(Lz76.complexity("a" * 40) == 2L)
    // u | d | udud... : alternation parses in 3 phrases
    assert(Lz76.complexity("ud" * 20) == 3L)
    assert(Lz76.complexity("ab") == 2L)
    assert(Lz76.complexity("abc") == 3L)
  }

  test("agrees with the independent Kaspar-Schuster machine on random ternary strings") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val n = 1 + rnd.nextInt(60)
      val s = Array.fill(n)("udf".charAt(rnd.nextInt(3))).mkString
      assert(Lz76.complexity(s) == ks(s), s"mismatch on $s")
    }
  }

  test("codegen path equals the static parser and handles NULL") {
    val c = Catalog(spark, sf("sf0.001"))
    c.register()
    import spark.implicits._
    val rows = Seq("uddfudufddd", "uuuuuuu", "udfudfudf", "").toDF("s")
      .withColumn("lz", expr("graft_lz76(s)"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == Lz76.complexity(r.getString(0)))
    }
    val nul = spark.sql("SELECT graft_lz76(CAST(NULL AS STRING)) AS z").collect()(0)
    assert(nul.isNullAt(0))
  }
}
