package graft

import org.apache.spark.sql.functions._
import graft.operators.NearDup

/** The codegen'd graft_hex32 ([[graft.plans.Hex32]]) must be VALUE-
  * identical to the portable 8-term instr/substring chain it replaces on
  * the Spark side ([[NearDup.hexValueExpr]]) — for md5 outputs (the only
  * declared inputs) AND every edge case the chain defines: short strings
  * (missing digits contribute 0), non-hex characters (−1 per digit,
  * uppercase included — instr is case-sensitive), empty, and NULL.
  */
class Hex32Spec extends SparkSpec {

  private def portable(col0: String) = expr(NearDup.hexValueExpr(col0))
  private def fast(col0: String) = expr(NearDup.hexValueFastExpr(col0))

  test("graft_hex32 equals the portable chain on md5 outputs") {
    Catalog(spark, sf("sf0.001")) // registers graft_hex32
    import spark.implicits._
    val rows = (0 until 5000).map(i => s"probe:$i").toDF("s")
      .withColumn("h", md5(col("s")))
      .select(portable("h").as("p"), fast("h").as("f"))
      .collect()
    assert(rows.length == 5000)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"${r.getLong(0)} != ${r.getLong(1)}"))
  }

  test("graft_hex32 equals the portable chain on every edge case") {
    Catalog(spark, sf("sf0.001"))
    import spark.implicits._
    val cases = Seq(
      "", "0", "00000000", "ffffffff", "deadbeef01234567",
      "short", "abc", "ABCDEF12",          // uppercase is NOT a hex digit
      "zzzzzzzz", "g1234567", "0123456",   // 7 chars — 8th contributes 0
      "é漢字abcdef",                        // multibyte prefix → slow path
      "a" * 64, "0123456789abcdef")
    val rows = cases.toDF("h")
      .select(col("h"), portable("h").as("p"), fast("h").as("f"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"'${r.getString(0)}': portable=${r.getLong(1)} fast=${r.getLong(2)}")
    }
    // NULL propagates on both forms.
    val nulls = Seq[Option[String]](None).toDF("h")
      .select(portable("h").as("p"), fast("h").as("f"))
      .collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("graft_hex32 matches java parseLong on well-formed hex prefixes") {
    Catalog(spark, sf("sf0.001"))
    import spark.implicits._
    val rows = (0 until 200).map(i => s"seed:$i").toDF("s")
      .withColumn("h", md5(col("s")))
      .select(col("h"), fast("h").as("f"))
      .collect()
    rows.foreach { r =>
      val expected = java.lang.Long.parseLong(r.getString(0).substring(0, 8), 16)
      assert(r.getLong(1) == expected)
    }
  }
}
