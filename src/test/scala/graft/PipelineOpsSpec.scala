package graft

import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

/** Semantic properties of the corpus-curation operators — the invariants
  * that hold on ANY corpus, checked on the fixtures (oracle hash-matching
  * covers exact values; these cover meaning).
  */
class PipelineOpsSpec extends SparkSpec {

  test("Q76 chunker: every chunk is exactly 10 tokens; count follows (n-10)/5+1") {
    val rows = PipelineOps.q76(spark, sf("sf0.01"))
      .withColumn("chunk_tokens", size(split(col("chunk"), " ")))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("chunk_tokens") == 10, r))
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val n = rs.head.getAs[Long]("n_tokens")
      val expected = (n - 10) / 5 + 1
      assert(rs.length == expected, s"doc $doc: ${rs.length} chunks for $n tokens")
      // chunk ids are dense 0..expected-1
      assert(rs.map(_.getAs[Long]("chunk_id")).sorted.toSeq == (0L until expected))
    }
  }

  test("Q72 sampler is deterministic and keeps every doc of the smallest language") {
    val a = PipelineOps.q72(spark, sf("sf0.01")).collect()
    val b = PipelineOps.q72(spark, sf("sf0.01")).collect()
    assert(a.toSeq == b.toSeq) // md5 bucketing: no RNG, same verdicts every run
    // The smallest language has rate 1.0 -> keeps everything.
    val minLang = a.minBy(_.getAs[Long]("n_docs"))
    assert(minLang.getAs[Long]("n_kept") == minLang.getAs[Long]("n_docs"), minLang)
    // No language keeps more than it has.
    a.foreach(r => assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"), r))
  }

  test("Q71 gate drops about a quartile; tied boundary groups drop whole") {
    PipelineOps.q71(spark, sf("sf0.01")).collect().foreach { r =>
      val n = r.getAs[Long]("n_docs"); val kept = r.getAs[Long]("n_kept")
      // percent_rank >= 0.25 targets the top three quartiles, but a tied
      // group STRADDLING the boundary shares the group-head rank and drops
      // together — retention lands near 75%, possibly under it.
      assert(kept <= n && kept.toDouble / n >= 0.5 && kept.toDouble / n <= 0.80,
        s"$r")
    }
  }

  test("Q70/Q80 flag counts are bounded by their populations") {
    PipelineOps.q70(spark, sf("sf0.01")).collect().foreach { r =>
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_train"), r)
    }
    PipelineOps.q80(spark, sf("sf0.01")).collect().foreach { r =>
      assert(r.getAs[Long]("n_with_shared_chunk") <= r.getAs[Long]("n_docs"), r)
    }
    // The corpus seeds ~5% near-dups by appending " dup" (SURVEY V14):
    // those pairs share every interior chunk, so Q80 must light up.
    val flagged = PipelineOps.q80(spark, sf("sf0.01"))
      .agg(sum(col("n_with_shared_chunk"))).collect()(0).getLong(0)
    assert(flagged > 0, "seeded near-dups should share chunks")
  }

  test("Q69 LM scores are negative log-probs with sane bounds") {
    PipelineOps.q69(spark, sf("sf0.01")).collect().foreach { r =>
      val lp = r.getAs[Double]("avg_logp")
      // log p of a unigram over a 31-token vocab: p in (0,1) -> lp < 0,
      // and no token is rarer than 1/corpus -> lp > -log(corpus tokens).
      assert(lp < 0.0 && lp > -20.0, s"$r")
    }
  }
}
