package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{NearDup, TextOps}

/** End-to-end curation pipeline: the operators composed the way a real
  * training-data run chains them — near-dup collapse, benchmark
  * decontamination, quality gating, deterministic downsampling, sequence
  * packing. Asserts the invariants that make the pipeline production-safe:
  * monotone corpus shrinkage, determinism across reruns, and per-stage
  * sanity.
  */
class CurationPipelineSpec extends SparkSpec {

  private def runPipeline(dir: String): (Seq[Long], DataFrame) = {
    val c = Catalog(spark, dir)
    val docs = c.documents
    val counts = Seq.newBuilder[Long]
    counts += docs.count()

    // 1. Near-dup collapse (Q67/Q68 machinery): keep cluster reps.
    val shingleTok = docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(toks) - 3),
          |  i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2),
          |              ' ', element_at(toks, i + 3)))""".stripMargin)).as("token"))
      .distinct()
    val pairs = TextOps.jaccardFromTokens(spark, shingleTok, 0.6)
      .select(col("doc_lo"), col("doc_hi"))
    val dropped = NearDup.connectedComponents(pairs)
      .filter(col("member") =!= col("rep")).select(col("member").as("doc_id"))
    val deduped = docs.join(broadcast(dropped), Seq("doc_id"), "left_anti")
    counts += deduped.count()

    // 2. Decontamination (Q70 machinery): drop docs sharing a 5-gram with
    //    the held-out src0 slice; src0 itself leaves the training set.
    val sh5 = (d: DataFrame) => d
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(toks) - 5),
          |  i -> concat_ws(' ', slice(toks, i + 1, 5)))""".stripMargin)).as("sh"))
    val evalSh = sh5(deduped.filter(col("source") === "src0"))
      .select(col("sh")).distinct()
    val train = deduped.filter(col("source") =!= "src0")
    val contaminated = sh5(train).join(broadcast(evalSh), Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    val clean = train.join(broadcast(contaminated), Seq("doc_id"), "left_anti")
    counts += clean.count()

    // 3. Quality gate (Q71 machinery): drop the bottom quartile per lang.
    val scoredDocs = clean
      .withColumn("n_tokens", expr("size(split(text, ' '))").cast("long"))
      .withColumn("quality", col("n_tokens").cast("double") / (col("n_chars") + 1))
    val gated = scoredDocs
      .withColumn("pr", percent_rank().over(
        Window.partitionBy(col("lang")).orderBy(asc("quality"), asc("doc_id"))))
      .filter(col("pr") >= 0.25)
    counts += gated.count()

    // 4. Deterministic downsample (Q72 machinery) to the smallest lang.
    val langN = gated.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val minN = langN.agg(min(col("n")).as("min_n"))
    val rates = langN.crossJoin(broadcast(minN))
      .select(col("lang"), (col("min_n").cast("double") / col("n")).as("rate"))
    val sampled = gated
      .withColumn("h", md5(col("text")))
      .withColumn("bucket", expr(
        "(instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + " +
          "instr('0123456789abcdef', substring(h, 2, 1)) - 1"))
      .join(broadcast(rates), Seq("lang"))
      .filter(col("bucket") < col("rate") * 256)
    counts += sampled.count()

    // 5. Pack into 512-token contexts (Q77 machinery).
    val packed = sampled
      .withColumn("cum", sum(col("n_tokens")).over(
        Window.partitionBy(col("lang")).orderBy(asc("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("bin", expr("(cum - n_tokens) DIV 512"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
    (counts.result(), packed)
  }

  test("pipeline shrinks monotonically, stays deterministic, and packs fully") {
    val (counts1, packed1) = runPipeline(sf("sf0.01"))
    assert(counts1.size == 5 && counts1.head > 0, counts1.toString)
    // Every stage can only remove documents.
    counts1.sliding(2).foreach { case Seq(a, b) => assert(b <= a, counts1.toString) }
    // Dedup and decontamination must actually fire on this seeded corpus.
    assert(counts1(1) < counts1(0), "near-dup collapse removed nothing")
    assert(counts1(2) < counts1(1), "decontamination removed nothing (src0 leaves + overlaps)")

    // Determinism: the full chain reruns to the identical packing.
    val (counts2, packed2) = runPipeline(sf("sf0.01"))
    assert(counts1 == counts2, s"$counts1 vs $counts2")
    val p1 = packed1.orderBy("lang", "bin").collect().toSeq
    val p2 = packed2.orderBy("lang", "bin").collect().toSeq
    assert(p1 == p2)

    // Packing conserves tokens: per lang, bins partition the doc set.
    val packTotal = packed1.agg(sum(col("n_docs"))).collect()(0).getLong(0)
    assert(packTotal == counts1(4), s"$packTotal vs ${counts1(4)}")
  }
}
