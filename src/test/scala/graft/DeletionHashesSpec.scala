package graft

import org.apache.spark.sql.functions._

/** Pins for the FastSS deletion-neighborhood signature expression behind
  * Q126's candidate generation ([[graft.plans.DeletionHashes]]).
  */
class DeletionHashesSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.plans.GraftExtensions.registerRuntime(spark)
  }

  private val B = 1099511628211L

  private def refHash(s: String): Long =
    s.foldLeft(0L)((h, c) => h * B + c)

  /** All strings from s with at most k characters deleted, brute force. */
  private def refVariants(s: String, k: Int): Set[String] = {
    def del1(t: String): Seq[String] =
      t.indices.map(i => t.substring(0, i) + t.substring(i + 1))
    var acc = Set(s)
    var frontier = Set(s)
    for (_ <- 1 to k) {
      frontier = frontier.flatMap(del1)
      acc ++= frontier
    }
    acc
  }

  private def sigs(s: String, k: Int): Seq[Long] = {
    import spark.implicits._
    Seq(s).toDF("s")
      .select(expr(s"graft_deletion_hashes(s, $k)").as("h"))
      .head().getSeq[Long](0)
  }

  test("the O(1) piecewise hash algebra equals brute-force variant hashing") {
    // The MULTISET of emitted hashes must equal hashing every deletion
    // variant string directly — this is the proof the prefix/power
    // algebra (three-piece concatenation) is right, including at the
    // string boundaries (i=0, j=n-1, adjacent i,j).
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 30; n <- Seq(1, 2, 3, 8, 20)) {
      val s = (1 to n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      for (k <- Seq(1, 2)) {
        val got = sigs(s, k).toSet
        val want = refVariants(s, k).map(refHash)
        assert(got == want, s"s=$s k=$k")
      }
    }
  }

  test("completeness: strings within edit distance <= 2 always share a " +
    "signature (the property the Q126 equi-join relies on)") {
    val rnd = new scala.util.Random(13)
    val alpha = "abcdefgh"
    def mutate(s: String): String = rnd.nextInt(3) match {
      case 0 if s.nonEmpty => // substitute
        val i = rnd.nextInt(s.length)
        s.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + s.substring(i + 1)
      case 1 => // insert
        val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + s.substring(i)
      case _ if s.nonEmpty => // delete
        val i = rnd.nextInt(s.length)
        s.substring(0, i) + s.substring(i + 1)
      case _ => s
    }
    for (_ <- 1 to 100) {
      val u = (1 to 6 + rnd.nextInt(20)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val v = mutate(if (rnd.nextBoolean()) mutate(u) else u)
      assert(sigs(u, 2).toSet.intersect(sigs(v, 2).toSet).nonEmpty,
        s"u=$u v=$v must share a 2-deletion signature")
    }
  }

  test("edge cases: empty and single-char strings") {
    assert(sigs("", 2) == Seq(0L), "empty string has only itself")
    // length 1: the string itself and the empty string (one deletion)
    assert(sigs("a", 2).toSet == Set(refHash("a"), 0L))
    // array size for k=2 is 1 + n + n(n-1)/2 (duplicates NOT collapsed
    // by the expression; Q126 applies array_distinct before exploding)
    assert(sigs("aaaa", 2).size == 1 + 4 + 6)
    assert(sigs("aaaa", 2).toSet.size == 3, "aa/aaa/aaaa distinct contents")
  }
}
