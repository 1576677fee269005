package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Rabin–Karp rolling hash — all k-length
  * substring hashes of a string in ONE O(n) pass (the naive per-window
  * recompute is O(n·k)). hash(w) = Σ c_j·B^(k−1−j) mod 2³², rolled as
  * h' = ((h − c_out·B^(k−1))·B + c_in) mod 2³².
  *
  * Constants: B = 1000003, modulus 2³² via `& 0xFFFFFFFF` — every
  * intermediate fits a signed 64-bit lane (c < 2¹⁶, h < 2³², products
  * < 2⁵², and Java's `&` of a negative two's-complement long yields the
  * correct non-negative residue), so the SAME values are computable in
  * plain integer SQL — the DuckDB oracle recomputes each window hash
  * directly (O(n·k)) and the cross-engine match IS the proof that the
  * O(n) rolling update is algebraically right.
  *
  * Defined over UTF-16 code units ≡ code points on the BMP (testdata is
  * ASCII). Codegen emits a tight primitive loop (doGenCode), same
  * discipline as [[DotProduct]].
  *
  * 100 TB role: content-defined fingerprinting/chunking at byte speed —
  * the hash family behind substring dedup and CDC-style chunk boundaries.
  */
case class RollingHash(child: Expression, k: Int) extends UnaryExpression {

  private val B = 1000003L
  private val Mask = 0xFFFFFFFFL

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash expects (string, k >= 1), got ${child.dataType.simpleString}, k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** B^(k-1) mod 2^32. */
  private lazy val powK1: Long = {
    var p = 1L; var i = 0
    while (i < k - 1) { p = (p * B) & Mask; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < k) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](n - k + 1)
      var h = 0L
      var i = 0
      while (i < k) { h = (h * B + s.charAt(i)) & Mask; i += 1 }
      out(0) = h
      while (i < n) {
        h = (((h - s.charAt(i - k) * powK1) & Mask) * B + s.charAt(i)) & Mask
        out(i - k + 1) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s"); val n = ctx.freshName("n")
      val out = ctx.freshName("out"); val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val gad = classOf[GenericArrayData].getName
      s"""
         |java.lang.String $s = $a.toString();
         |int $n = $s.length();
         |if ($n < $k) {
         |  ${ev.value} = new $gad(new long[0]);
         |} else {
         |  long[] $out = new long[$n - $k + 1];
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $k; $i++) { $h = ($h * ${B}L + $s.charAt($i)) & ${Mask}L; }
         |  $out[0] = $h;
         |  for (; $i < $n; $i++) {
         |    $h = ((($h - $s.charAt($i - $k) * ${powK1}L) & ${Mask}L) * ${B}L
         |          + $s.charAt($i)) & ${Mask}L;
         |    $out[$i - $k + 1] = $h;
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "graft_rolling_hash"
}
