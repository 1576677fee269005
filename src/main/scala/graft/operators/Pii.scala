package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog

/** PII detection and redaction — the scrubbing pass every training-data
  * pipeline runs before anything else ships (SURVEY.md §2.13 build
  * addendum; reference checkout is empty, SURVEY.md §0.1 — the patterns
  * are the standard public detector shapes: RFC-5322-lite emails,
  * NANP-style phone numbers, dotted-quad IPv4, SSN-shaped ids).
  *
  * Engine shape: detection is `regexp_count` and redaction is chained
  * `regexp_replace` — both codegen'd, map-only, zero shuffles until the
  * per-source rollup. At 100 TB this is the ideal operator class: one
  * pass over the corpus, embarrassingly parallel, no state.
  *
  * Cross-engine regex discipline: Spark compiles Java regex, DuckDB
  * compiles RE2. The pattern set below stays inside the common subset —
  * character classes, bounded repetition, `\b` anchors, non-capturing
  * groups; no backreferences, no lookaround — where both engines share
  * leftmost, PCRE-preference semantics, so matches (and therefore
  * redacted outputs) are bit-identical.
  *
  * Test-fixture note: the synthetic corpus is PII-free word salad, so the
  * gated queries first DIRTY it deterministically — spans derived from
  * `doc_id` by pure integer/string arithmetic, identical SQL in both
  * engines — then run the detector. The operators themselves
  * ([[detect]], [[redact]]) are corpus-agnostic.
  */
object Pii {

  /** (type tag, pattern, replacement) — patterns valid with identical
    * match semantics in Java regex and RE2. The four shapes are mutually
    * non-overlapping (3-3-4 phones vs 3-2-4 SSNs vs dotted quads vs
    * @-containing emails), so redaction order cannot change the result.
    */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("ipv4", "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"))

  /** Adds one `<type>_hits` int column per pattern — match counts in
    * `textCol`. Map-only, codegen'd.
    */
  def detect(df: DataFrame, textCol: String): DataFrame =
    Patterns.foldLeft(df) { case (d, (tag, pat, _)) =>
      d.withColumn(s"${tag}_hits", regexp_count(col(textCol), lit(pat)))
    }

  /** Replaces every match of every pattern in `textCol` with its
    * placeholder token, into `outCol`. Map-only, codegen'd.
    */
  def redact(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol,
      Patterns.foldLeft(col(textCol): Column) { case (c, (_, pat, repl)) =>
        regexp_replace(c, lit(pat), lit(repl))
      })

  /** The deterministic PII dirtying shared by Q154/Q155: 4 of every 5
    * documents get one key-derived PII span appended (email / phone /
    * IPv4 / SSN by `doc_id % 5`); the fifth stays clean. Pure integer
    * and string arithmetic — the DuckDB oracles build the identical
    * strings.
    */
  private def dirtied(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.withColumn("text2", concat(col("text"),
      when(pmod(id, lit(5)) === 0,
        concat(lit(" contact user"), id.cast("string"), lit("@example.com now")))
      .when(pmod(id, lit(5)) === 1,
        concat(lit(" call 555-"),
          lpad(pmod(id, lit(1000)).cast("string"), 3, "0"), lit("-"),
          lpad(pmod(id, lit(10000)).cast("string"), 4, "0"), lit(" today")))
      .when(pmod(id, lit(5)) === 2,
        concat(lit(" host 10.0."), pmod(id, lit(256)).cast("string"),
          lit("."), pmod(id * 7, lit(256)).cast("string"), lit(" up")))
      .when(pmod(id, lit(5)) === 3,
        concat(lit(" id 987-65-"),
          lpad(pmod(id, lit(10000)).cast("string"), 4, "0"), lit(" filed")))
      .otherwise(lit(""))))
  }

  /** The same dirtying as a DuckDB SQL expression over `doc_id`/`text`.
    * NOTE: this fragment is interpolated into oracle strings that call
    * `.stripMargin` — no line may start with `|` (a leading `||` would
    * lose a pipe to margin stripping), so `||` sits at line ends.
    */
  private val dirtySql: String =
    """text || CASE doc_id % 5
      |  WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
      |  WHEN 1 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
      |    '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
      |  WHEN 2 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
      |    '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' up'
      |  WHEN 3 THEN ' id 987-65-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |    ' filed'
      |  ELSE '' END""".stripMargin

  /** Q154 — per-source PII exposure profile: how many documents carry
    * each PII class, total match counts, and the clean-document count —
    * the report a release review reads before a corpus ships.
    *
    * Scale: one codegen'd map pass (4 `regexp_count`s), then a rollup
    * keyed by the handful of sources. No shuffle of text bytes: only the
    * per-doc count vector aggregates.
    */
  def q154(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val d = detect(dirtied(c.documents), "text2")
    d.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("email_hits") > 0).cast("long")).as("email_docs"),
        sum(col("email_hits").cast("long")).as("email_hits"),
        sum((col("phone_hits") > 0).cast("long")).as("phone_docs"),
        sum(col("phone_hits").cast("long")).as("phone_hits"),
        sum((col("ssn_hits") > 0).cast("long")).as("ssn_docs"),
        sum(col("ssn_hits").cast("long")).as("ssn_hits"),
        sum((col("ipv4_hits") > 0).cast("long")).as("ipv4_docs"),
        sum(col("ipv4_hits").cast("long")).as("ipv4_hits"),
        sum((col("email_hits") + col("phone_hits") + col("ssn_hits")
          + col("ipv4_hits") === 0).cast("long")).as("clean_docs"))
      .orderBy(asc_nulls_first("source"))
  }

  val q154Oracle: String =
    s"""WITH dirty AS (
       |  SELECT source, doc_id, $dirtySql AS text2 FROM documents),
       |hits AS (
       |  SELECT source,
       |    len(regexp_extract_all(text2, '${Patterns(0)._2}')) AS e,
       |    len(regexp_extract_all(text2, '${Patterns(1)._2}')) AS p,
       |    len(regexp_extract_all(text2, '${Patterns(2)._2}')) AS s,
       |    len(regexp_extract_all(text2, '${Patterns(3)._2}')) AS i
       |  FROM dirty)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT) AS email_docs,
       |  CAST(SUM(e) AS BIGINT) AS email_hits,
       |  CAST(SUM(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS phone_docs,
       |  CAST(SUM(p) AS BIGINT) AS phone_hits,
       |  CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ssn_docs,
       |  CAST(SUM(s) AS BIGINT) AS ssn_hits,
       |  CAST(SUM(CASE WHEN i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ipv4_docs,
       |  CAST(SUM(i) AS BIGINT) AS ipv4_hits,
       |  CAST(SUM(CASE WHEN e + p + s + i = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS clean_docs
       |FROM hits
       |GROUP BY source
       |ORDER BY source NULLS FIRST""".stripMargin

  /** Q155 — redaction round-trip: every document that carried PII, with
    * its total hit count and the fully redacted text — the actual
    * scrubbed corpus, hash-compared byte-for-byte across engines (the
    * strongest possible check that two regex engines agreed on every
    * match boundary).
    *
    * Scale: map-only (`regexp_count` + 4 chained `regexp_replace`), one
    * filter; the only ordering is the gate's output sort.
    */
  def q155(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val d = redact(detect(dirtied(c.documents), "text2"), "text2", "redacted")
      .withColumn("n_hits",
        (col("email_hits") + col("phone_hits") + col("ssn_hits")
          + col("ipv4_hits")).cast("long"))
    d.filter(col("n_hits") > 0)
      .select(col("doc_id"), col("source"), col("n_hits"), col("redacted"))
      .orderBy(asc_nulls_first("doc_id"))
  }

  val q155Oracle: String = {
    val repl = Patterns.foldLeft("text2") { case (c, (_, pat, r)) =>
      s"regexp_replace($c, '$pat', '$r', 'g')"
    }
    val cnt = Patterns.map { case (_, pat, _) =>
      s"len(regexp_extract_all(text2, '$pat'))"
    }.mkString(" + ")
    s"""WITH dirty AS (
       |  SELECT source, doc_id, $dirtySql AS text2 FROM documents)
       |SELECT doc_id, source, CAST($cnt AS BIGINT) AS n_hits, $repl AS redacted
       |FROM dirty
       |WHERE $cnt > 0
       |ORDER BY doc_id NULLS FIRST""".stripMargin
  }

  /** Q207 — k-anonymity risk profile over a generalization ladder: the
    * release-review report for sharing `customer` as microdata. Three
    * quasi-identifier (QI) coarsenings — L0 (nation, segment, balance
    * bucketed to 100), L1 (region, segment, balance bucketed to 1000),
    * L2 (region, segment) — each scored by its equivalence-class
    * profile: class count, smallest/largest class (k_min/k_max),
    * singleton records (uniques, the k=1 re-identifiable rows),
    * records in classes below the k<5 publishing floor (at_risk), and
    * the prosecutor-model expected re-identification rate
    * avg_risk = E[1/k] per record = n_classes / n_records.
    *
    * Determinism: classes are exact integer counts over exact QI keys;
    * balance buckets use FLOOR(acctbal / width) — one IEEE double
    * divide + floor, bit-identical across engines. avg_risk is one
    * final ROUND-6.
    *
    * Scale notes: nation (25) and region (5) broadcast onto customer;
    * the three ladder levels compute in ONE scan via GROUPING SETS
    * (an Expand ×3 feeds a single QI-keyed hash aggregate — at 100 TB
    * that is one I/O pass instead of three), then a 3-key rollup over
    * the class table. `grouping_id()` over the five QI columns
    * identifies the level (bit set ⇔ column aggregated away). The
    * monotone ladder (generalizing can only merge classes) is pinned
    * in `Round9GatesSpec`.
    */
  def q207(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val base = c.customer
      .join(broadcast(c.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(c.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / 100.0).cast("long").as("bal100"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal1000"))
    // grouping_id bit order follows the listed columns
    // (n_name, r_name, seg, bal100, bal1000); a bit is 1 when the
    // column is aggregated away in that set.
    val classes = base.groupingSets(
      Seq(Seq(col("n_name"), col("seg"), col("bal100")),
        Seq(col("r_name"), col("seg"), col("bal1000")),
        Seq(col("r_name"), col("seg"))),
      col("n_name"), col("r_name"), col("seg"), col("bal100"), col("bal1000"))
      .agg(count(lit(1)).as("k"), grouping_id().as("gid"))
    classes
      .withColumn("level",
        when(col("gid") === 9L, "L0_nation_seg_bal100")   // r_name+bal1000 out
          .when(col("gid") === 18L, "L1_region_seg_bal1000") // n_name+bal100 out
          .otherwise("L2_region_seg"))                       // gid 19
      .groupBy(col("level")).agg(
        sum(col("k")).cast("long").as("n_records"),
        count(lit(1)).as("n_classes"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        sum(when(col("k") === 1, 1L).otherwise(0L)).cast("long").as("uniques"),
        sum(when(col("k") < 5, col("k")).otherwise(0L)).cast("long").as("at_risk"))
      .select(col("level"), col("n_records"), col("n_classes"),
        col("k_min"), col("k_max"), col("uniques"), col("at_risk"),
        round(col("n_classes").cast("double") / col("n_records"), 6).as("avg_risk"))
      .orderBy(asc_nulls_first("level"))
  }

  val q207Oracle: String = {
    def level(name: String, qi: String): String =
      s"""  SELECT '$name' AS level,
         |    CAST(SUM(k) AS BIGINT) AS n_records, COUNT(*) AS n_classes,
         |    MIN(k) AS k_min, MAX(k) AS k_max,
         |    CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS uniques,
         |    CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS at_risk,
         |    ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(k), 6) AS avg_risk
         |  FROM (SELECT $qi, COUNT(*) AS k FROM base GROUP BY ALL)""".stripMargin
    s"""WITH base AS (
       |  SELECT c_custkey, n_name, r_name, c_mktsegment AS seg,
       |    CAST(FLOOR(c_acctbal / 100.0) AS BIGINT) AS bal100,
       |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal1000
       |  FROM customer
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey)
       |SELECT * FROM (
       |${level("L0_nation_seg_bal100", "n_name, seg, bal100")}
       |  UNION ALL
       |${level("L1_region_seg_bal1000", "r_name, seg, bal1000")}
       |  UNION ALL
       |${level("L2_region_seg", "r_name, seg")})
       |ORDER BY level NULLS FIRST""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q154" -> (q154 _), "Q155" -> (q155 _), "Q207" -> (q207 _))

  def oracles: Map[String, String] = Map(
    "Q154" -> q154Oracle, "Q155" -> q155Oracle, "Q207" -> q207Oracle)
}
