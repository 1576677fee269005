package graft

import org.apache.spark.sql.functions._
import graft.operators.Pii

/** PII detection/redaction: pattern semantics on crafted strings (the
  * cross-engine regex subset), mutual non-overlap of the four shapes, and
  * the gated queries' fixture invariants on sf0.001.
  */
class PiiSpec extends SparkSpec {

  private def one(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("detect counts each PII class independently") {
    val r = Pii.detect(one(
      "mail a@b.com and c.d+e@sub.domain.org call 555-123-4567 " +
        "ssn 987-65-4321 host 192.168.1.255 done"), "text")
      .select("email_hits", "phone_hits", "ssn_hits", "ipv4_hits")
      .head()
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) == 1)
    assert(r.getInt(2) == 1)
    assert(r.getInt(3) == 1)
  }

  test("redact replaces every match with its placeholder") {
    val got = Pii.redact(one(
      "a@b.com then 555-000-1111 then 987-65-0000 then 10.0.3.21 end"),
      "text", "red").select("red").head().getString(0)
    assert(got == "<EMAIL> then <PHONE> then <SSN> then <IP> end")
  }

  test("phone and SSN shapes do not cross-match (3-3-4 vs 3-2-4)") {
    val r = Pii.detect(one("call 555-123-4567 file 987-65-4321"), "text")
    val row = r.select("phone_hits", "ssn_hits").head()
    assert(row.getInt(0) == 1 && row.getInt(1) == 1)
    val red = Pii.redact(r, "text", "red").select("red").head().getString(0)
    assert(red == "call <PHONE> file <SSN>")
  }

  test("clean text passes through untouched") {
    val red = Pii.redact(one("plain words only, no identifiers here"),
      "text", "red").select("red").head().getString(0)
    assert(red == "plain words only, no identifiers here")
  }

  test("PII scrub is a map-only pass: zero exchanges in the physical plan") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val plan = Pii.redact(Pii.detect(docs, "text"), "text", "red")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("Q154 fixture invariants at sf0.001") {
    val dir = sf("sf0.001")
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val rows = Pii.q154(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // each dirty class marks exactly the doc_id % 5 == k docs; the fifth
    // class stays clean (word-salad corpus has no natural PII)
    val emailDocs = rows.map(_.getAs[Long]("email_docs")).sum
    val cleanDocs = rows.map(_.getAs[Long]("clean_docs")).sum
    val expectEmail = spark.read.parquet(s"$dir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(5)) === 0).count()
    val expectClean = spark.read.parquet(s"$dir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(5)) === 4).count()
    assert(emailDocs == expectEmail)
    assert(cleanDocs == expectClean)
  }

  test("Q155 emits exactly the dirtied docs, fully redacted") {
    val dir = sf("sf0.001")
    val out = Pii.q155(spark, dir)
    val n = spark.read.parquet(s"$dir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(5)) =!= 4).count()
    assert(out.count() == n)
    // redacted text carries the placeholder, never a residual match
    val residual = Pii.detect(
      out.withColumnRenamed("redacted", "text"), "text")
      .filter(col("email_hits") + col("phone_hits")
        + col("ssn_hits") + col("ipv4_hits") > 0)
    assert(residual.count() == 0)
    assert(out.filter(pmod(col("doc_id"), lit(5)) === 0)
      .filter(!col("redacted").contains("<EMAIL>")).count() == 0)
  }
}
