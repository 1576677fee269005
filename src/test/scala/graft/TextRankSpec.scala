package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.TextRank

/** Model pins for the Q141/Q142 IR gates: BM25 against a hand-computed
  * two-document reference, PMI against the closed-form count formula.
  * (The cross-engine gate is the DuckDB oracle; these pin the math.)
  */
class TextRankSpec extends SparkSpec {

  private def docsDir(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("textrank").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = texts.zipWithIndex.map { case (t, i) =>
      Row(i.toLong, t, "en", "spec", t.length.toLong)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("Q141 BM25 matches a hand-computed two-doc reference") {
    // doc0 has 'spark' twice in 4 tokens; doc1 has it once in 8; doc2 none
    val dir = docsDir(Seq(
      "spark spark row row",
      "spark a a a a a a a",
      "b b b b"))
    val out = TextRank.q141(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet === Set(0L, 1L))
    val n = 3.0; val df = 2.0
    val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    val avgdl = (4 + 8 + 4) / 3.0
    def s(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert(math.abs(out(0L) - s(2, 4)) < 1e-5)
    assert(math.abs(out(1L) - s(1, 8)) < 1e-5)
    assert(out(0L) > out(1L)) // higher tf, shorter doc must win
  }

  test("Q148 inverted index: df counts every doc, postings cap at 20") {
    // token 'hot' in 25 docs, 'cold' in 2
    val texts = (0 until 25).map(i => if (i < 2) "hot cold" else "hot x")
    val dir = docsDir(texts)
    val out = graft.operators.TextRank.q148(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out("hot")._1 === 25L)
    // postings serialize as a comma-joined, numerically-sorted string
    assert(out("hot")._2 === (0L until 20L).mkString(",")) // capped, smallest ids
    assert(out("cold") === ((2L, "0,1")))
  }

  test("Q142 PMI matches the closed-form count formula") {
    // 'x y' always adjacent (10 times); fillers break other pairings
    val dir = docsDir(Seq.fill(10)("x y f1 f2 f3 f4 f5 f6 f7 f8"))
    val out = TextRank.q142(spark, dir).collect()
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getDouble(3))).toMap
    assert(m.contains(("x", "y")))
    val (cxy, pmi) = m(("x", "y"))
    assert(cxy === 10L)
    val nu = 100.0; val nb = 90.0
    val expect = math.log(cxy * nu * nu / (nb * 10.0 * 10.0))
    assert(math.abs(pmi - expect) < 1e-6)
    // every filler bigram also appears 10 times with identical counts
    assert(m.size === 9)
  }
}
