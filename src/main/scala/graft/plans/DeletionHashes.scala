package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Native Catalyst expression: FastSS deletion-neighborhood signatures
  * (Bocek, Hunt & Stiller 2007) for edit-distance ≤ k candidate
  * generation, k ∈ {1, 2}. Returns one polynomial hash per variant of
  * the input obtainable by deleting AT MOST k characters — 1 + n +
  * n(n−1)/2 longs for k=2. Completeness: if ed(u, v) ≤ k, walking any
  * optimal alignment and deleting the substituted/inserted character of
  * each edit from the side that has it yields a COMMON string reached by
  * ≤ k deletions from each, so u and v always share a signature; hash
  * collisions only ADD candidates. Both properties make an equi-join on
  * the signature an exact pre-filter for a verify step — never a
  * source of misses.
  *
  * Each variant hash is O(1) via prefix hashes and power tables (mod
  * 2⁶⁴ by natural long overflow — collisions are harmless here, unlike
  * [[RollingHash]] whose oracle recomputes hashes in SQL): the variant
  * that deletes positions i < j is three substring pieces, and
  * hash(s[a..b)) = P[b] − P[a]·B^(b−a). Whole array costs O(n + n²/2)
  * work for n²/2 outputs — the precompute is amortized to O(1) per
  * signature.
  *
  * 100 TB role: turns a blocked all-pairs edit-distance join (Σ block²
  * DP evaluations — quadratic in table size under any FIXED blocking
  * key) into linear signature expansion + equi-join + verify-on-
  * candidates, the published shape for fuzzy joins at corpus scale.
  */
case class DeletionHashes(child: Expression, k: Int) extends UnaryExpression {

  private val B = 1099511628211L // FNV-ish odd 64-bit base

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && k <= 2)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_deletion_hashes expects (string, k in {1,2}), got " +
        s"${child.dataType.simpleString}, k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val p = new Array[Long](n + 1)
    val pw = new Array[Long](n + 1)
    pw(0) = 1L
    var i = 0
    while (i < n) {
      p(i + 1) = p(i) * B + s.charAt(i)
      pw(i + 1) = pw(i) * B
      i += 1
    }
    val m = if (k == 2) 1 + n + n * (n - 1) / 2 else 1 + n
    val out = new Array[Long](m)
    out(0) = p(n)
    var w = 1
    i = 0
    while (i < n) {
      // delete position i: s[0..i) ++ s[i+1..n)
      out(w) = p(i) * pw(n - i - 1) + (p(n) - p(i + 1) * pw(n - i - 1))
      w += 1
      i += 1
    }
    if (k == 2) {
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          // delete i < j: s[0..i) ++ s[i+1..j) ++ s[j+1..n)
          val mid = p(j) - p(i + 1) * pw(j - i - 1)
          val tail = p(n) - p(j + 1) * pw(n - j - 1)
          out(w) = (p(i) * pw(j - i - 1) + mid) * pw(n - j - 1) + tail
          w += 1
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s"); val n = ctx.freshName("n")
      val p = ctx.freshName("p"); val pw = ctx.freshName("pw")
      val out = ctx.freshName("out"); val w = ctx.freshName("w")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val mid = ctx.freshName("mid"); val tail = ctx.freshName("tail")
      val m = ctx.freshName("m")
      val gad = classOf[GenericArrayData].getName
      val pairLoop = if (k == 2)
        s"""
           |for (int $i = 0; $i < $n; $i++) {
           |  for (int $j = $i + 1; $j < $n; $j++) {
           |    long $mid = $p[$j] - $p[$i + 1] * $pw[$j - $i - 1];
           |    long $tail = $p[$n] - $p[$j + 1] * $pw[$n - $j - 1];
           |    $out[$w++] = ($p[$i] * $pw[$j - $i - 1] + $mid) * $pw[$n - $j - 1] + $tail;
           |  }
           |}
         """.stripMargin else ""
      s"""
         |java.lang.String $s = $a.toString();
         |int $n = $s.length();
         |long[] $p = new long[$n + 1];
         |long[] $pw = new long[$n + 1];
         |$pw[0] = 1L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $p[$i + 1] = $p[$i] * ${B}L + $s.charAt($i);
         |  $pw[$i + 1] = $pw[$i] * ${B}L;
         |}
         |int $m = ${if (k == 2) s"1 + $n + $n * ($n - 1) / 2" else s"1 + $n"};
         |long[] $out = new long[$m];
         |$out[0] = $p[$n];
         |int $w = 1;
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$w++] = $p[$i] * $pw[$n - $i - 1]
         |               + ($p[$n] - $p[$i + 1] * $pw[$n - $i - 1]);
         |}
         |$pairLoop
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DeletionHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_deletion_hashes"
}
