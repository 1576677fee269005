package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog

/** Text-analysis operators for LLM training-data pipelines (builder-prompt
  * north star; extensions beyond SURVEY §2's Q-inventory, declared with the
  * same oracle discipline): language-ID scoring, quality scoring, token
  * counting, and order-sensitive document fingerprinting.
  *
  * Scale notes: every operator is per-row scalar work over `text` (array
  * higher-order functions + regex, all codegen'd) followed by at most one
  * bounded-key aggregate — embarrassingly parallel over a 100 TB corpus,
  * no shuffle except the final small groupBy. The fingerprint (Q47) is the
  * explode form; its per-row fold twin is a one-liner with `aggregate`.
  */
object TextAnalysis {

  /** Q44 — language identification by marker-token evidence. On this
    * synthetic corpus only the 'en' markers can fire; the scoring/argmax
    * structure is the declared operator. Emits the (actual, predicted)
    * confusion counts.
    */
  def q44(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.documents
      .withColumn("s_en", expr("size(filter(split(text, ' '), t -> t IN ('the', 'a')))"))
      .withColumn("s_de", expr("size(filter(split(text, ' '), t -> t IN ('der', 'die')))"))
      .withColumn("s_es", expr("size(filter(split(text, ' '), t -> t IN ('el', 'los')))"))
      .withColumn("pred", expr(
        """CASE WHEN s_en > s_de AND s_en > s_es THEN 'en'
          |     WHEN s_de > s_en AND s_de > s_es THEN 'de'
          |     WHEN s_es > s_en AND s_es > s_de THEN 'es'
          |     ELSE 'und' END""".stripMargin))
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("lang"), asc_nulls_first("pred"))
  }

  val q44Oracle: String =
    """WITH scored AS (
      |  SELECT lang,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS s_en,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('der', 'die'))) AS s_de,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('el', 'los'))) AS s_es
      |  FROM documents)
      |SELECT lang,
      |  CASE WHEN s_en > s_de AND s_en > s_es THEN 'en'
      |       WHEN s_de > s_en AND s_de > s_es THEN 'de'
      |       WHEN s_es > s_en AND s_es > s_de THEN 'es'
      |       ELSE 'und' END AS pred,
      |  COUNT(*) AS n
      |FROM scored
      |GROUP BY 1, 2
      |ORDER BY lang NULLS FIRST, pred NULLS FIRST""".stripMargin

  /** Q45 — document quality scoring: token count, mean token length,
    * stopword ratio, and a bounded composite score.
    */
  def q45(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.documents
      .filter(col("doc_id") <= 100)
      .withColumn("n_tokens", expr("size(split(text, ' '))").cast("long"))
      .withColumn("stop_hits",
        expr("size(filter(split(text, ' '), t -> t IN ('the', 'a', 'value')))").cast("long"))
      .withColumn("avg_tok",
        (col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
      .select(
        col("doc_id"), col("n_tokens"),
        round(col("avg_tok"), 4).as("avg_token_len"),
        round(col("stop_ratio"), 4).as("stop_ratio"),
        round(
          least(col("n_tokens") / 50.0, lit(1.0)) * 0.5 +
          (lit(1.0) - col("stop_ratio")) * 0.3 +
          least(col("avg_tok") / 10.0, lit(1.0)) * 0.2, 4).as("quality"))
      .orderBy(asc_nulls_first("doc_id"))
  }

  val q45Oracle: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      t -> t IN ('the', 'a', 'value'))) AS BIGINT) AS stop_hits,
      |    n_chars
      |  FROM documents WHERE doc_id <= 100),
      |derived AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens AS avg_tok,
      |    CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio
      |  FROM base)
      |SELECT doc_id, n_tokens,
      |  ROUND(avg_tok, 4) AS avg_token_len,
      |  ROUND(stop_ratio, 4) AS stop_ratio,
      |  ROUND(LEAST(n_tokens / 50.0, 1.0) * 0.5 + (1.0 - stop_ratio) * 0.3 +
      |        LEAST(avg_tok / 10.0, 1.0) * 0.2, 4) AS quality
      |FROM derived
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Q46 — token counting per source: whitespace tokens vs BPE-ish regex
    * pieces (letter runs / digit runs / single other symbols).
    */
  def q46(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.documents
      .withColumn("ws", expr("size(split(text, ' '))").cast("long"))
      .withColumn("bpe",
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))").cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws")).as("sum_ws_tokens"),
        sum(col("bpe")).as("sum_bpe_tokens"))
      .orderBy(asc_nulls_first("source"))
  }

  val q46Oracle: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_ws_tokens,
      |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
      |    AS sum_bpe_tokens
      |FROM documents
      |GROUP BY source
      |ORDER BY source NULLS FIRST""".stripMargin

  /** Q47 — order-sensitive document fingerprint: position-weighted rolling
    * sum of leading-character codes, mod a prime. Equal fingerprints are
    * cheap duplicate candidates; unequal fingerprints prove docs differ
    * in token order — which plain token-set signatures cannot see.
    */
  def q47(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.documents
      .filter(col("doc_id") <= 100)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      // Empty tokens (consecutive/leading/trailing spaces) diverge across
      // engines: Spark ascii('') = 0 vs DuckDB unicode('') = -1. Drop them
      // on both sides; positions keep their pre-filter indices so the
      // fingerprint stays order-sensitive.
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"))
      .agg((sum((col("pos") + 1) * ascii(col("token"))) % 1000000007L).as("fingerprint"))
      .orderBy(asc_nulls_first("doc_id"))
  }

  val q47Oracle: String =
    """WITH flat AS (
      |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
      |    UNNEST(string_split(text, ' ')) AS token
      |  FROM documents WHERE doc_id <= 100)
      |SELECT doc_id,
      |  CAST(SUM(pos * unicode(token)) % 1000000007 AS BIGINT) AS fingerprint
      |FROM flat
      |WHERE token <> ''
      |GROUP BY doc_id
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Q52 — TF-IDF: smoothed idf = ln((N+1)/(df+1)); top-3 terms per probe
    * doc by (tfidf desc, token). The doc-term matrix (Q37) is the input;
    * df is one bounded-key aggregate over it; idf joins back broadcast.
    */
  def q52(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val tf = c.documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val n = c.documents.count()
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(desc("tfidf_raw"), asc("token"))
    tf.join(broadcast(df), Seq("token"))
      .withColumn("tfidf_raw",
        col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)))
      .filter(col("doc_id") <= 20)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("token"), round(col("tfidf_raw"), 4).as("tfidf"))
      .orderBy(asc_nulls_first("doc_id"), asc_nulls_first("rnk"))
  }

  val q52Oracle: String =
    """WITH tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf
      |  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents)
      |  GROUP BY 1, 2),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      |scored AS (
      |  SELECT tf.doc_id, tf.token,
      |    tf.tf * LN((n.n + 1.0) / (df.df + 1.0)) AS tfidf_raw
      |  FROM tf JOIN df USING (token) CROSS JOIN n
      |  WHERE tf.doc_id <= 20),
      |ranked AS (
      |  SELECT doc_id, token, tfidf_raw,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf_raw DESC, token) AS rnk
      |  FROM scored)
      |SELECT doc_id, rnk, token, ROUND(tfidf_raw, 4) AS tfidf
      |FROM ranked WHERE rnk <= 3
      |ORDER BY doc_id NULLS FIRST, rnk NULLS FIRST""".stripMargin

  /** Q66 — repetition / diversity quality signals (the Gopher-rules
    * family): per document, distinct-token ratio, the most-frequent
    * token's share, and Shannon entropy of the token distribution —
    * the standard cheap filters a 100 TB training-data pipeline runs
    * before any model-based scoring. One explode + two keyed aggregates;
    * shuffle key (doc_id, token) then doc_id, both fine-grained.
    *
    * Entropy fold order: both engines sum -p·ln(p) over the SAME
    * grouping; the result is rounded to 4, and the per-token terms are
    * identical doubles, so cross-engine agreement holds as everywhere
    * else in §2.0.
    */
  def q66(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val tf = c.documents
      .filter(col("doc_id") <= 100)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("tf")).as("top_tf"),
        sum(col("tf") * log(col("tf"))).as("sum_flogf"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 4).as("distinct_ratio"),
        round(col("top_tf").cast("double") / col("n_tokens"), 4).as("top_token_ratio"),
        // H = ln(N) − (Σ f·ln f)/N — one exact rearrangement of
        // −Σ (f/N)·ln(f/N), avoiding a per-token division.
        round(log(col("n_tokens")) - col("sum_flogf") / col("n_tokens"), 4).as("entropy"))
      .orderBy(asc_nulls_first("doc_id"))
  }

  val q66Oracle: String =
    """WITH tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf
      |  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
      |        FROM documents WHERE doc_id <= 100)
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, SUM(tf) AS n_tokens, COUNT(*) AS n_distinct,
      |    MAX(tf) AS top_tf, SUM(tf * LN(tf)) AS sum_flogf
      |  FROM tf GROUP BY doc_id)
      |SELECT doc_id,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  n_distinct,
      |  ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 4) AS distinct_ratio,
      |  ROUND(CAST(top_tf AS DOUBLE) / n_tokens, 4) AS top_token_ratio,
      |  ROUND(LN(n_tokens) - sum_flogf / n_tokens, 4) AS entropy
      |FROM agg
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Q88 — split-novelty rate: hold out every 10th document (doc_id % 10
    * = 0) as validation and measure, per language, how many of its word
    * trigrams never occur in the training split — the generalization-
    * hygiene check that a random split actually carries novel text. The
    * training shingle set is global (any language may cover a shingle).
    *
    * Scale: two shingle scans + one anti join on the shingle — the
    * validation side is 10% of the corpus and the training shingle set
    * partitions by shingle hash; nothing quadratic.
    */
  def q88(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val sh = c.documents
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), explode(array_distinct(expr(
        """transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', slice(toks, i + 1, 3)))""".stripMargin))).as("sh"))
    val train = sh.filter(col("doc_id") % 10 =!= 0).select(col("sh")).distinct()
    val valSh = sh.filter(col("doc_id") % 10 === 0)
      .select(col("lang"), col("sh")).distinct()
    val unseen = valSh.join(train, Seq("sh"), "left_anti")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_unseen"))
    valSh.groupBy(col("lang")).agg(count(lit(1)).as("n_val_shingles"))
      .join(unseen, Seq("lang"), "left")
      .select(col("lang"), col("n_val_shingles"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        round(coalesce(col("n_unseen"), lit(0L)).cast("double") /
          col("n_val_shingles"), 4).as("novelty_rate"))
      .orderBy(asc_nulls_first("lang"))
  }

  val q88Oracle: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, lang, s FROM (
      |    SELECT doc_id, lang, UNNEST(list_transform(
      |      range(len(string_split(text, ' ')) - 2),
      |      i -> string_split(text, ' ')[i + 1] || ' ' ||
      |           string_split(text, ' ')[i + 2] || ' ' ||
      |           string_split(text, ' ')[i + 3])) AS s
      |    FROM documents WHERE len(string_split(text, ' ')) >= 3)),
      |train AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 <> 0),
      |val_sh AS (SELECT DISTINCT lang, s FROM sh WHERE doc_id % 10 = 0),
      |unseen AS (
      |  SELECT lang, COUNT(*) AS n_unseen FROM val_sh
      |  WHERE s NOT IN (SELECT s FROM train) GROUP BY lang)
      |SELECT v.lang AS lang, COUNT(*) AS n_val_shingles,
      |  COALESCE(MAX(u.n_unseen), 0) AS n_unseen,
      |  ROUND(CAST(COALESCE(MAX(u.n_unseen), 0) AS DOUBLE) / COUNT(*), 4)
      |    AS novelty_rate
      |FROM val_sh v LEFT JOIN unseen u ON v.lang = u.lang
      |GROUP BY v.lang
      |ORDER BY lang NULLS FIRST""".stripMargin

  /** Q89 — lexical diversity per source: document count, token mass,
    * vocabulary size, and type-token ratio — the corpus-composition table
    * a mixing strategy is tuned against.
    *
    * Scale: one explode + one (source, token)-keyed distinct aggregate;
    * the per-source rollup is bounded by #sources.
    */
  def q89(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.documents
      .select(col("source"), col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        countDistinct(col("token")).as("vocab"),
        round(countDistinct(col("token")).cast("double") / count(lit(1)), 4)
          .as("type_token_ratio"))
      .orderBy(asc_nulls_first("source"))
  }

  val q89Oracle: String =
    """WITH tok AS (
      |  SELECT source, doc_id, UNNEST(string_split(text, ' ')) AS token
      |  FROM documents)
      |SELECT source, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_tokens,
      |  COUNT(DISTINCT token) AS vocab,
      |  ROUND(CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*), 4)
      |    AS type_token_ratio
      |FROM tok
      |GROUP BY source
      |ORDER BY source NULLS FIRST""".stripMargin

  /** Q96 — intra-document repetition signals (the Gopher/MassiveText
    * repetition filters, token-level): fraction of tokens covered by the
    * single most frequent bigram, and fraction of trigram positions whose
    * trigram repeats within the document. Docs exceeding either threshold
    * are marked 'reject' — the self-repetition gate that runs before any
    * cross-document dedup.
    *
    * Scale: the statistics are PER-DOCUMENT, so nothing needs a shuffle —
    * n-grams are built row-locally (transform + slice), sorted in-row
    * (array_sort), and run-length-scanned with the `aggregate` higher-
    * order function: the most frequent bigram's count is the longest run,
    * and the duplicated-trigram mass is the total length of runs ≥ 2.
    * The whole filter is ONE map-only codegen'd pass over the corpus
    * (the final orderBy is gate cosmetics); the oracle recomputes the
    * same numbers relationally in DuckDB.
    */
  def q96(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    repetitionSignals(c.documents).orderBy(asc_nulls_first("doc_id"))
  }

  /** The Q96 computation as an API over any (doc_id, text) relation —
    * emits (doc_id, n_tokens, top_bigram_frac, dup_trigram_frac, verdict).
    * Map-only; see q96's scaladoc.
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    docs
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("bg", expr(
        """CASE WHEN size(toks) >= 2 THEN
          |  transform(sequence(0, size(toks) - 2),
          |    i -> concat_ws(' ', slice(toks, i + 1, 2)))
          |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
      .withColumn("tg", expr(
        """CASE WHEN size(toks) >= 3 THEN
          |  transform(sequence(0, size(toks) - 3),
          |    i -> concat_ws(' ', slice(toks, i + 1, 3)))
          |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
      // Longest run in the sorted bigram array = count of the most
      // frequent bigram. State: (prev gram, current run, best run).
      .withColumn("top_bg", expr(
        """aggregate(array_sort(bg),
          |  named_struct('prev', '', 'run', CAST(0 AS BIGINT),
          |               'best', CAST(0 AS BIGINT)),
          |  (a, g) -> named_struct(
          |    'prev', g,
          |    'run', IF(g = a.prev, a.run + 1, CAST(1 AS BIGINT)),
          |    'best', GREATEST(a.best, IF(g = a.prev, a.run + 1, CAST(1 AS BIGINT)))),
          |  a -> a.best)""".stripMargin))
      // Total mass of runs ≥ 2 in the sorted trigram array = number of
      // trigram positions whose trigram repeats within the doc.
      .withColumn("dup_tri", expr(
        """aggregate(array_sort(tg),
          |  named_struct('prev', '', 'run', CAST(0 AS BIGINT),
          |               'dup', CAST(0 AS BIGINT)),
          |  (a, g) -> IF(g = a.prev,
          |    named_struct('prev', g, 'run', a.run + 1, 'dup', a.dup),
          |    named_struct('prev', g, 'run', CAST(1 AS BIGINT),
          |      'dup', a.dup + IF(a.run >= 2, a.run, CAST(0 AS BIGINT)))),
          |  a -> a.dup + IF(a.run >= 2, a.run, CAST(0 AS BIGINT)))""".stripMargin))
      .withColumn("n_tri", size(col("tg")).cast("long"))
      .select(
        col("doc_id"), col("n_tokens"),
        round(when(col("n_tokens") > 0,
          col("top_bg") * 2.0 / col("n_tokens")).otherwise(lit(0.0)), 4)
          .as("top_bigram_frac"),
        round(when(col("n_tri") > 0,
          col("dup_tri").cast("double") / col("n_tri")).otherwise(lit(0.0)), 4)
          .as("dup_trigram_frac"))
      .withColumn("verdict",
        when(col("top_bigram_frac") > 0.2 || col("dup_trigram_frac") > 0.3, "reject")
          .otherwise("keep"))
  }

  val q96Oracle: String =
    """WITH base AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents),
      |ntok AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM base),
      |bg AS (
      |  SELECT doc_id, UNNEST(list_transform(range(len(toks) - 1),
      |    i -> toks[i + 1] || ' ' || toks[i + 2])) AS g
      |  FROM base WHERE len(toks) >= 2),
      |top_bg AS (
      |  SELECT doc_id, MAX(cnt) AS top_bg FROM (
      |    SELECT doc_id, g, COUNT(*) AS cnt FROM bg GROUP BY doc_id, g)
      |  GROUP BY doc_id),
      |tg AS (
      |  SELECT doc_id, UNNEST(list_transform(range(len(toks) - 2),
      |    i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])) AS g
      |  FROM base WHERE len(toks) >= 3),
      |tri AS (
      |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tri,
      |    CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS dup_tri
      |  FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM tg GROUP BY doc_id, g)
      |  GROUP BY doc_id),
      |joined AS (
      |  SELECT n.doc_id, n.n_tokens,
      |    ROUND(COALESCE(b.top_bg * 2.0 / n.n_tokens, 0.0), 4) AS top_bigram_frac,
      |    ROUND(COALESCE(CAST(t.dup_tri AS DOUBLE) / t.n_tri, 0.0), 4) AS dup_trigram_frac
      |  FROM ntok n
      |  LEFT JOIN top_bg b ON n.doc_id = b.doc_id
      |  LEFT JOIN tri t ON n.doc_id = t.doc_id)
      |SELECT doc_id, n_tokens, top_bigram_frac, dup_trigram_frac,
      |  CASE WHEN top_bigram_frac > 0.2 OR dup_trigram_frac > 0.3
      |       THEN 'reject' ELSE 'keep' END AS verdict
      |FROM joined
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Q158 — Jensen–Shannon divergence between every pair of sources'
    * unigram token distributions: THE standard domain-shift /
    * mixture-composition diagnostic (JSD is symmetric, bounded [0, 1]
    * in bits, and defined even where supports differ — exactly why
    * pipelines prefer it over raw KL for corpus comparison). Emits the
    * shared-vocabulary size alongside so a low JSD from tiny overlap is
    * visible.
    *
    * Determinism: probabilities are single IEEE divisions of exact
    * counts; the log terms accumulate at ~1e-16 relative error against
    * a 1e-4 rounding grid — the Q52/Q69 ln-parity precedent.
    *
    * Scale notes: token counts are one (source, token)-keyed aggregate
    * of the corpus (the only data-sized shuffle). The pairwise stage
    * runs on the DENSE (source × vocab) grid — fine here because the
    * fixture vocabulary is bounded; a 100 TB deployment caps the grid
    * by top-K global tokens first (the published practice: JSD over the
    * head vocabulary), which the same plan expresses as one extra
    * rank-filter on the count relation.
    */
  def q158(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    jsdBySource(c.documents)
  }

  /** The Q158 computation as an API over any (source, text) relation. */
  def jsdBySource(docs: DataFrame): DataFrame = {
    val cnt = docs
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tot = cnt.groupBy(col("source")).agg(sum(col("cnt")).as("tot"))
    val p = cnt.join(tot, Seq("source"))
      .select(col("source"), col("token"), (col("cnt") / col("tot")).as("p"))
    val grid = cnt.select(col("source")).distinct()
      .crossJoin(cnt.select(col("token")).distinct())
      .join(p, Seq("source", "token"), "left")
      .select(col("source"), col("token"), coalesce(col("p"), lit(0.0)).as("p"))
    val pair = grid.as("x")
      .join(grid.as("y"),
        col("x.token") === col("y.token") && col("x.source") < col("y.source"))
      .select(col("x.source").as("src_a"), col("y.source").as("src_b"),
        col("x.p").as("p"), col("y.p").as("q"))
      .filter(col("p") > 0 || col("q") > 0)
      .withColumn("m", (col("p") + col("q")) / 2)
      .withColumn("term",
        when(col("p") > 0, col("p") * log(col("p") / col("m"))).otherwise(lit(0.0))
          + when(col("q") > 0, col("q") * log(col("q") / col("m"))).otherwise(lit(0.0)))
    pair.groupBy(col("src_a"), col("src_b"))
      .agg(
        sum(((col("p") > 0) && (col("q") > 0)).cast("long")).as("shared_vocab"),
        round(sum(col("term")) / (2 * math.log(2.0)), 4).as("jsd_bits"))
      .orderBy(asc_nulls_first("src_a"), asc_nulls_first("src_b"))
  }

  val q158Oracle: String =
    """WITH tok AS (
      |  SELECT source, UNNEST(string_split(text, ' ')) AS token FROM documents),
      |cnt AS (
      |  SELECT source, token, COUNT(*) AS cnt FROM tok
      |  WHERE token <> '' GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot
      |        FROM cnt GROUP BY 1),
      |p AS (
      |  SELECT cnt.source, cnt.token, cnt.cnt / tot.tot AS p
      |  FROM cnt JOIN tot ON tot.source = cnt.source),
      |grid AS (
      |  SELECT s.source, v.token, COALESCE(p.p, 0.0) AS p
      |  FROM (SELECT DISTINCT source FROM cnt) s
      |  CROSS JOIN (SELECT DISTINCT token FROM cnt) v
      |  LEFT JOIN p ON p.source = s.source AND p.token = v.token),
      |pair AS (
      |  SELECT x.source AS src_a, y.source AS src_b, x.p AS p, y.p AS q,
      |    (x.p + y.p) / 2 AS m
      |  FROM grid x JOIN grid y
      |  ON x.token = y.token AND x.source < y.source
      |  WHERE x.p > 0 OR y.p > 0)
      |SELECT src_a, src_b,
      |  CAST(SUM(CASE WHEN p > 0 AND q > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS shared_vocab,
      |  ROUND(SUM(
      |    CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0.0 END
      |    + CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0.0 END)
      |    / (2 * ln(2.0)), 4) AS jsd_bits
      |FROM pair
      |GROUP BY 1, 2
      |ORDER BY src_a NULLS FIRST, src_b NULLS FIRST""".stripMargin

  /** Q164 — syllable-complexity profile per source: vowel-group syllable
    * counts (every maximal [aeiouy]+ run is one syllable nucleus — the
    * classic readability heuristic, floored at 1 per word), the
    * ≥3-syllable "complex word" fraction (the Gunning-fog/SMOG
    * ingredient; the corpus has no sentence punctuation, so the
    * sentence-length term is out of domain and the per-word terms are
    * reported directly), and mean word length. Exact integer tallies,
    * three final float divides rounded to 4.
    *
    * Scale notes: one codegen'd map pass (`regexp_count` per word) over
    * the exploded word relation, then a sources-bounded rollup — linear,
    * one shuffle.
    */
  def q164(spark: SparkSession, dir: String): DataFrame =
    syllableProfile(Catalog(spark, dir).documents)

  /** The Q164 computation as an API over any (source, text) relation. */
  def syllableProfile(docs: DataFrame): DataFrame = {
    docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("source"), length(col("w")).as("wlen"),
        greatest(regexp_count(lower(col("w")), lit("[aeiouy]+")), lit(1))
          .as("syl"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("syl")).as("n_syllables"),
        sum(when(col("syl") >= 3, 1L).otherwise(0L)).as("n_complex"),
        sum(col("wlen")).as("n_chars"))
      .select(col("source"), col("n_words"), col("n_syllables"),
        col("n_complex"),
        round(col("n_syllables").cast("double") / col("n_words"), 4)
          .as("syllables_per_word"),
        round(col("n_complex").cast("double") / col("n_words"), 4)
          .as("complex_word_frac"),
        round(col("n_chars").cast("double") / col("n_words"), 4)
          .as("avg_word_len"))
      .orderBy(asc_nulls_first("source"))
  }

  val q164Oracle: String =
    """WITH words AS (
      |  SELECT source, UNNEST(string_split(text, ' ')) AS w FROM documents),
      |scored AS (
      |  SELECT source, length(w) AS wlen,
      |    GREATEST(len(regexp_extract_all(lower(w), '[aeiouy]+')), 1) AS syl
      |  FROM words WHERE w <> ''),
      |agg AS (
      |  SELECT source, COUNT(*) AS n_words,
      |    CAST(SUM(syl) AS BIGINT) AS n_syllables,
      |    CAST(SUM(CASE WHEN syl >= 3 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_complex,
      |    CAST(SUM(wlen) AS BIGINT) AS n_chars
      |  FROM scored GROUP BY 1)
      |SELECT source, n_words, n_syllables, n_complex,
      |  ROUND(CAST(n_syllables AS DOUBLE)/n_words, 4) AS syllables_per_word,
      |  ROUND(CAST(n_complex AS DOUBLE)/n_words, 4) AS complex_word_frac,
      |  ROUND(CAST(n_chars AS DOUBLE)/n_words, 4) AS avg_word_len
      |FROM agg ORDER BY source NULLS FIRST""".stripMargin

  /** Q167 — bigram conditional entropy H(w₂|w₁) per source, in bits: the
    * sequence-predictability / compressibility diagnostic (Shannon's
    * entropy rate at order 1). Low H = templated/repetitive text, high
    * H = diverse text — the sequence-aware complement of Q66's unigram
    * entropy and Q158's cross-source JSD. Probabilities are single IEEE
    * divisions of exact counts and the ln terms follow the Q158 ln-parity
    * discipline; only the final bits value is rounded (4).
    *
    * Scale notes: positional bigrams are a row-local transform+explode;
    * everything after is (source, w1[, w2])-keyed aggregation —
    * vocab²-bounded, one data-sized shuffle.
    */
  def q167(spark: SparkSession, dir: String): DataFrame =
    bigramCondEntropy(Catalog(spark, dir).documents)

  /** The Q167 computation as an API over any (source, text) relation. */
  def bigramCondEntropy(docs: DataFrame): DataFrame = {
    val big = docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(col("source"), explode(expr(
        """transform(sequence(0, size(toks) - 2),
          |  i -> struct(element_at(toks, i + 1) AS w1,
          |              element_at(toks, i + 2) AS w2))""".stripMargin)).as("b"))
      .select(col("source"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .groupBy(col("source"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val uni = big.groupBy(col("source"), col("w1")).agg(sum(col("c2")).as("c1"))
    val n = big.groupBy(col("source")).agg(sum(col("c2")).as("nb"))
    big.join(uni, Seq("source", "w1")).join(n, Seq("source"))
      .groupBy(col("source"), col("nb"))
      .agg(count(lit(1)).as("distinct_bigrams"),
        round(-sum(col("c2").cast("double") / col("nb") *
          log(col("c2").cast("double") / col("c1"))) / math.log(2.0), 4)
          .as("cond_entropy_bits"))
      .select(col("source"), col("nb").as("n_bigrams"),
        col("distinct_bigrams"), col("cond_entropy_bits"))
      .orderBy(asc_nulls_first("source"))
  }

  val q167Oracle: String =
    """WITH toks AS (
      |  SELECT source, string_split(text, ' ')[i + 1] AS w1,
      |    string_split(text, ' ')[i + 2] AS w2
      |  FROM (SELECT source, text,
      |          UNNEST(range(len(string_split(text, ' ')) - 1)) AS i
      |        FROM documents WHERE len(string_split(text, ' ')) >= 2)),
      |big AS (
      |  SELECT source, w1, w2, COUNT(*) AS c2 FROM toks
      |  WHERE w1 <> '' AND w2 <> '' GROUP BY 1, 2, 3),
      |uni AS (SELECT source, w1, SUM(c2) AS c1 FROM big GROUP BY 1, 2),
      |n AS (SELECT source, CAST(SUM(c2) AS BIGINT) AS nb FROM big GROUP BY 1)
      |SELECT b.source, n.nb AS n_bigrams,
      |  CAST(COUNT(*) AS BIGINT) AS distinct_bigrams,
      |  ROUND(-SUM(CAST(b.c2 AS DOUBLE)/n.nb
      |             * ln(CAST(b.c2 AS DOUBLE)/u.c1)) / ln(2.0), 4)
      |    AS cond_entropy_bits
      |FROM big b
      |JOIN uni u ON u.source = b.source AND u.w1 = b.w1
      |JOIN n ON n.source = b.source
      |GROUP BY b.source, n.nb
      |ORDER BY b.source NULLS FIRST""".stripMargin

  /** Q170 — vocabulary concentration per source: token mass, vocabulary
    * size, hapax legomena (freq-1 types — the Heaps'-law growth frontier:
    * their share predicts how fast vocab grows with more data), and
    * top-10-type mass share (Zipf head concentration). Complements Q89
    * (TTR/diversity) with the two ends of the frequency spectrum. All
    * tallies exact int64; two final divides rounded to 4.
    *
    * Scale notes: one (source, token) map-side-combined aggregate, one
    * per-source rank window over the VOCAB relation (bounded by distinct
    * types, not tokens), one sources-bounded rollup.
    */
  def q170(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(desc("c"), asc("token"))
    c.documents
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        round(sum(when(col("c") === 1, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 4).as("hapax_frac"),
        round(sum(when(col("rk") <= 10, col("c")).otherwise(0L)).cast("double") /
          sum(col("c")), 4).as("top10_mass_frac"))
      .orderBy(asc_nulls_first("source"))
  }

  val q170Oracle: String =
    """WITH tok AS (
      |  SELECT source, UNNEST(string_split(text, ' ')) AS token
      |  FROM documents),
      |cnt AS (
      |  SELECT source, token, COUNT(*) AS c FROM tok
      |  WHERE token <> '' GROUP BY 1, 2),
      |ranked AS (
      |  SELECT source, c,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, token)
      |      AS rk
      |  FROM cnt)
      |SELECT source,
      |  CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS vocab_size,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*), 4) AS hapax_frac,
      |  ROUND(CAST(SUM(CASE WHEN rk <= 10 THEN c ELSE 0 END) AS DOUBLE)
      |    / SUM(c), 4) AS top10_mass_frac
      |FROM ranked
      |GROUP BY source ORDER BY source NULLS FIRST""".stripMargin


  /** Q178 — Flesch reading ease + Flesch–Kincaid grade per source
    * (Flesch 1948; Kincaid et al. 1975): RE = 206.835 − 1.015·(W/S) −
    * 84.6·(Y/W), FK = 0.39·(W/S) + 11.8·(Y/W) − 15.59, from exact int64
    * word (W), sentence (S), and syllable (Y) tallies. Sentences are
    * terminator runs ([.!?]+, floor 1 per doc); syllables are Q164's
    * vowel-group model (floor 1 per word). The classic corpus-quality
    * composite over Q164's raw profile — the "is this readable prose or
    * keyword soup" gate a curation pipeline thresholds on.
    *
    * Cross-engine determinism: all three tallies are exact integers;
    * the two ratios and the affine combination are the only floats,
    * computed in one pinned expression shape and rounded once to 4.
    * Empty-text docs (W = 0) are excluded before aggregation so no
    * 0/0 can arise; a source must keep ≥1 non-empty doc to appear.
    *
    * Scale notes: one documents scan; the per-doc tallies are row-local
    * higher-order folds (codegen'd, no explode shuffle), and the rollup
    * is a map-side-combinable (source)-keyed sum. Output rows = sources.
    */
  def q178(spark: SparkSession, dir: String): DataFrame =
    fleschProfile(Catalog(spark, dir).documents)

  /** The Q178 computation as an API over any (source, text) relation. */
  def fleschProfile(docs: DataFrame): DataFrame = {
    docs
      .select(col("source"),
        expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long")
          .as("w"),
        expr(
          """aggregate(transform(filter(split(text, ' '), w -> w <> ''),
            |  w -> CAST(greatest(regexp_count(lower(w), '[aeiouy]+'), 1) AS BIGINT)),
            |  0L, (a, x) -> a + x)""".stripMargin).as("y"),
        greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
          .cast("long").as("s"))
      .filter(col("w") > 0L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
        sum(col("s")).as("n_sentences"), sum(col("y")).as("n_syllables"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_syllables"),
        round(lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")), 4)
          .as("flesch"),
        round(lit(0.39) * (col("n_words").cast("double") / col("n_sentences"))
          + lit(11.8) * (col("n_syllables").cast("double") / col("n_words"))
          - lit(15.59), 4).as("fk_grade"))
      .orderBy(asc_nulls_first("source"))
  }

  val q178Oracle: String =
    """WITH perdoc AS (
      |  SELECT source,
      |    len(list_filter(string_split(text, ' '), w -> w <> '')) AS w,
      |    list_aggregate(list_transform(
      |      list_filter(string_split(text, ' '), w -> w <> ''),
      |      w -> GREATEST(len(regexp_extract_all(lower(w), '[aeiouy]+')), 1)),
      |      'sum') AS y,
      |    GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS s
      |  FROM documents),
      |agg AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(w) AS BIGINT) AS n_words,
      |    CAST(SUM(s) AS BIGINT) AS n_sentences,
      |    CAST(SUM(y) AS BIGINT) AS n_syllables
      |  FROM perdoc WHERE w > 0 GROUP BY 1)
      |SELECT source, n_docs, n_words, n_sentences, n_syllables,
      |  ROUND(206.835
      |    - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
      |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) AS flesch,
      |  ROUND(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
      |    + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
      |    - 15.59, 4) AS fk_grade
      |FROM agg ORDER BY source NULLS FIRST""".stripMargin

  /** Q181 — fitted Zipf slope per source: OLS of ln(frequency) on
    * ln(rank) over the top-100 vocabulary types (rank by count desc,
    * term asc tiebreak). Zipf's law predicts slope ≈ −1 for natural
    * language; boilerplate-heavy or templated corpora flatten the head
    * (slope > −1), keyword-stuffed ones steepen it. Q170 reports the
    * head MASS; this fits the head's SHAPE, with r² as the
    * goodness-of-fit that says whether "Zipf slope" is even a
    * meaningful summary of the source.
    *
    * Determinism: ranks are exact (count desc, term asc is total);
    * ln/×/Σ over ≤100 doubles per source differ across engines only in
    * summation order (~1e-14 relative), absorbed by round(4) (Q137
    * precedent). NULL slope/r² when the source has <2 distinct ranks.
    *
    * Scale notes: vocab build is the Q170 shuffle; the top-100 cut is
    * one (source)-partitioned window pass over the vocab relation —
    * at 100 TB the same cut routes through the TopK sketch capability;
    * the 5-sum OLS fold is map-side combinable, output rows = sources.
    */
  def q181(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val vocab = c.documents
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(desc("cnt"), asc("term"))
    val top = vocab.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 100)
      .select(col("source"),
        log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    top.groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("source"), col("n_types"),
        when(col("n_types") * col("sxx") - col("sx") * col("sx") > 0.0,
          round((col("n_types") * col("sxy") - col("sx") * col("sy")) /
            (col("n_types") * col("sxx") - col("sx") * col("sx")), 4))
          .as("zipf_slope"),
        when((col("n_types") * col("sxx") - col("sx") * col("sx")) *
            (col("n_types") * col("syy") - col("sy") * col("sy")) > 0.0,
          round(pow(col("n_types") * col("sxy") - col("sx") * col("sy"), 2) /
            ((col("n_types") * col("sxx") - col("sx") * col("sx")) *
              (col("n_types") * col("syy") - col("sy") * col("sy"))), 4))
          .as("r2"))
      .orderBy(asc_nulls_first("source"))
  }

  val q181Oracle: String =
    """WITH vocab AS (
      |  SELECT source, term, COUNT(*) AS cnt
      |  FROM (SELECT source, UNNEST(string_split(text, ' ')) AS term
      |        FROM documents)
      |  WHERE term <> '' GROUP BY 1, 2),
      |top AS (
      |  SELECT source,
      |    LN(CAST(rank AS DOUBLE)) AS x, LN(CAST(cnt AS DOUBLE)) AS y
      |  FROM (SELECT source, cnt,
      |          ROW_NUMBER() OVER (PARTITION BY source
      |            ORDER BY cnt DESC, term) AS rank
      |        FROM vocab)
      |  WHERE rank <= 100),
      |sums AS (
      |  SELECT source, COUNT(*) AS n_types, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy
      |  FROM top GROUP BY 1)
      |SELECT source, n_types,
      |  CASE WHEN n_types * sxx - sx * sx > 0 THEN
      |    ROUND((n_types * sxy - sx * sy) / (n_types * sxx - sx * sx), 4)
      |  END AS zipf_slope,
      |  CASE WHEN (n_types * sxx - sx * sx)
      |      * (n_types * syy - sy * sy) > 0 THEN
      |    ROUND(POW(n_types * sxy - sx * sy, 2)
      |      / ((n_types * sxx - sx * sx) * (n_types * syy - sy * sy)), 4)
      |  END AS r2
      |FROM sums ORDER BY source NULLS FIRST""".stripMargin

  /** Q190 — token frequency-of-frequencies spectrum per source: how many
    * vocabulary types occur exactly r times (r = 1..10, 11+ pooled as
    * the tail), with each class's type share and token mass. This is
    * the Good–Turing front-end (the N_r counts smoothing estimators are
    * built from) and the practical vocabulary-growth read: a corpus
    * whose mass sits in r=1..2 keeps minting new types (open vocabulary,
    * tokenizer pressure); one dominated by the 11+ tail has converged.
    * Q170 reports two points of this curve (hapax share, top-10 mass);
    * Q181 fits the head's shape; this emits the whole spectrum.
    *
    * Exactness: every count is exact int64; shares are ONE divide each,
    * round(6). The r-class key is integer LEAST(c, 11).
    *
    * Scale notes: the vocab build is the Q170 shuffle; the spectrum is
    * a second map-side-combinable aggregate over the vocab relation to
    * ≤ 11 rows per source.
    */
  def q190(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val vocab = c.documents
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
    val wS = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    vocab
      .select(col("source"), least(col("c"), lit(11L)).as("r"), col("c"))
      .groupBy(col("source"), col("r"))
      .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"))
      .withColumn("type_share",
        round(col("n_types").cast("double") /
          sum(col("n_types")).over(wS).cast("double"), 6))
      .withColumn("token_mass",
        round(col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(wS).cast("double"), 6))
      .orderBy(asc_nulls_first("source"), asc("r"))
  }

  val q190Oracle: String =
    """WITH cnt AS (
      |  SELECT source, token, COUNT(*) AS c
      |  FROM (SELECT source, UNNEST(string_split(text, ' ')) AS token
      |        FROM documents)
      |  WHERE token <> '' GROUP BY 1, 2),
      |spec AS (
      |  SELECT source, LEAST(c, 11) AS r, COUNT(*) AS n_types,
      |    SUM(c) AS n_tokens
      |  FROM cnt GROUP BY 1, 2)
      |SELECT source, r, CAST(n_types AS BIGINT) AS n_types,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  ROUND(CAST(n_types AS DOUBLE)
      |    / CAST(SUM(n_types) OVER (PARTITION BY source) AS DOUBLE), 6)
      |    AS type_share,
      |  ROUND(CAST(n_tokens AS DOUBLE)
      |    / CAST(SUM(n_tokens) OVER (PARTITION BY source) AS DOUBLE), 6)
      |    AS token_mass
      |FROM spec
      |ORDER BY source NULLS FIRST, r""".stripMargin

  /** Q191 — term burstiness per source (Church & Gale 1995): for every
    * term with collection frequency cf ≥ 5, the dispersion ratio cf/df
    * (occurrences per document CONTAINING the term). A content word is
    * "bursty" — rare across documents but repeated within the ones it
    * hits (cf ≫ df); function words and templated boilerplate spread
    * evenly (cf ≈ df). Emits per source: qualifying-term count, mean
    * burstiness, the share of terms with cf ≥ 2·df (exact-integer
    * test), and the top-5 burstiest terms — the spam/keyword-stuffing
    * lens Q170/Q190 (which ignore document spread entirely) cannot see.
    *
    * Exactness: cf/df quotients of bounded-denominator int64 rationals
    * are IEEE-identical across engines and distinct rationals cannot
    * collide within a double ULP, so the (cf/df DESC, term) rank is
    * deterministic; bursty_share is an exact-integer predicate over ONE
    * divide, round(6); mean rounds at 4. Top-5 list is rank-ordered via
    * sorted-struct array join (Spark) ≡ string_agg ORDER BY rk (DuckDB).
    *
    * Scale notes: (source, term, doc) distinct relation → two stacked
    * aggregates sharing the (source, term) shuffle; the rank window
    * runs on the cf ≥ 5 vocab slice; output rows = sources.
    */
  def q191(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val occ = c.documents
      .select(col("source"), col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val vocab = occ.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("cf"), countDistinct(col("doc_id")).as("df"))
      .filter(col("cf") >= 5L)
      .withColumn("burst", col("cf").cast("double") / col("df").cast("double"))
    val wR = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(desc("burst"), asc("term"))
    vocab.withColumn("rk", row_number().over(wR))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        round(avg(col("burst")), 4).as("mean_burst"),
        round(sum(when(col("cf") >= col("df") * 2L, 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double"), 6).as("bursty_share"),
        array_join(transform(
          array_sort(collect_list(when(col("rk") <= 5,
            struct(col("rk"), col("term"))))),
          x => x.getField("term")), ",").as("top_bursty"))
      .orderBy(asc_nulls_first("source"))
  }

  val q191Oracle: String =
    """WITH occ AS (
      |  SELECT source, doc_id, term FROM (
      |    SELECT source, doc_id, UNNEST(string_split(text, ' ')) AS term
      |    FROM documents)
      |  WHERE term <> ''),
      |vocab AS (
      |  SELECT source, term, COUNT(*) AS cf,
      |    COUNT(DISTINCT doc_id) AS df
      |  FROM occ GROUP BY 1, 2),
      |q AS (
      |  SELECT source, term, cf, df,
      |    CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) AS burst
      |  FROM vocab WHERE cf >= 5),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
      |    ORDER BY burst DESC, term) AS rk
      |  FROM q)
      |SELECT source, COUNT(*) AS n_terms,
      |  ROUND(AVG(burst), 4) AS mean_burst,
      |  ROUND(CAST(SUM(CASE WHEN cf >= df * 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS bursty_share,
      |  STRING_AGG(CASE WHEN rk <= 5 THEN term END, ',' ORDER BY rk)
      |    AS top_bursty
      |FROM ranked GROUP BY source
      |ORDER BY source NULLS FIRST""".stripMargin

  /** Q195 — held-out bigram language-model quality scoring (the CCNet /
    * Wenzek et al. 2020 shape: train an LM on a reference split, score
    * the candidate split, threshold on perplexity). The corpus splits
    * 50/50 by md5 of the doc id (reproducible, order-independent); an
    * add-one-smoothed bigram model trains on bucket 0 and every bucket-1
    * document is scored by its mean negative log-likelihood
    * ce = −avg ln((c12+1)/(c1+V)) with V = train vocab + 1 OOV class.
    * Emits per source: scored docs, bigram mass, mean cross-entropy
    * (nats), the perplexity of that mean, and the share of docs beyond
    * the ce > 3.55 low-quality fence — Q69's unigram scorer upgraded to
    * the held-out bigram form real curation pipelines threshold on.
    *
    * Determinism: every probability is one IEEE divide of exact int64
    * counts; ln follows the Q158 parity discipline; per-doc ce rounds at
    * 6 BEFORE the fence compare and the per-source mean (Q173's
    * round-then-compare rule), ppl applies exp to the already-rounded-4
    * mean so both engines exponentiate the identical double.
    *
    * Scale notes: the bigram/context/vocab relations are train-side
    * aggregates (vocabulary-bounded, far smaller than the corpus); the
    * scoring side joins co-keyed on the bigram/context keys with no
    * broadcast hint — at web scale the LM tables exceed driver memory,
    * so AQE picks the strategy. One corpus pass builds, one scores.
    */
  def q195(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val toks = c.documents
      .withColumn("bucket",
        expr(NearDup.hexValueFastExpr("md5(concat('lm:', CAST(doc_id AS STRING)))")) % 2)
      .withColumn("w", expr("filter(split(text, ' '), t -> t <> '')"))
    val big = toks.filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("source"), col("bucket"),
        explode(expr(
          """transform(sequence(0, size(w) - 2),
            |  i -> struct(w[i] AS w1, concat(w[i], ' ', w[i + 1]) AS bg))"""
            .stripMargin)).as("p"))
      .select(col("doc_id"), col("source"), col("bucket"),
        col("p.w1").as("w1"), col("p.bg").as("bg"))
    val lm12 = big.filter(col("bucket") === 0)
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val lm1 = big.filter(col("bucket") === 0)
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = toks.filter(col("bucket") === 0)
      .select(explode(col("w")).as("t"))
      .agg((countDistinct(col("t")) + 1L).as("v"))
    val scored = big.filter(col("bucket") === 1)
      .join(lm12, Seq("bg"), "left")
      .join(lm1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("nb"),
        round(-avg(log(
          (coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("v")).cast("double"))), 6)
          .as("ce"))
    scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nb")).as("n_bigrams"),
        round(avg(col("ce")), 4).as("mean_ce"),
        round(exp(round(avg(col("ce")), 4)), 2).as("ppl"),
        round(sum(when(col("ce") > 3.55, 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6).as("low_q_share"))
      .orderBy(asc_nulls_first("source"))
  }

  val q195Oracle: String = {
    val bucket = NearDup.hexValueExpr("md5('lm:' || CAST(doc_id AS VARCHAR))")
    s"""WITH toks AS (
       |  SELECT doc_id, source, ($bucket) % 2 AS bucket,
       |    list_filter(string_split(text, ' '), t -> t <> '') AS w
       |  FROM documents),
       |big AS (
       |  SELECT doc_id, source, bucket,
       |    UNNEST(list_transform(range(len(w) - 1), i -> w[i + 1])) AS w1,
       |    UNNEST(list_transform(range(len(w) - 1),
       |      i -> w[i + 1] || ' ' || w[i + 2])) AS bg
       |  FROM toks WHERE len(w) >= 2),
       |lm12 AS (SELECT bg, COUNT(*) AS c12 FROM big WHERE bucket = 0 GROUP BY 1),
       |lm1 AS (SELECT w1, COUNT(*) AS c1 FROM big WHERE bucket = 0 GROUP BY 1),
       |vocab AS (
       |  SELECT COUNT(DISTINCT t.t) + 1 AS v FROM (
       |    SELECT UNNEST(w) AS t FROM toks WHERE bucket = 0) t),
       |scored AS (
       |  SELECT b.doc_id, b.source, COUNT(*) AS nb,
       |    ROUND(-AVG(LN(CAST(COALESCE(l2.c12, 0) + 1 AS DOUBLE)
       |      / CAST(COALESCE(l1.c1, 0) + vocab.v AS DOUBLE))), 6) AS ce
       |  FROM big b
       |  LEFT JOIN lm12 l2 ON l2.bg = b.bg
       |  LEFT JOIN lm1 l1 ON l1.w1 = b.w1
       |  CROSS JOIN vocab
       |  WHERE b.bucket = 1
       |  GROUP BY 1, 2)
       |SELECT source, COUNT(*) AS n_docs, CAST(SUM(nb) AS BIGINT) AS n_bigrams,
       |  ROUND(AVG(ce), 4) AS mean_ce,
       |  ROUND(EXP(ROUND(AVG(ce), 4)), 2) AS ppl,
       |  ROUND(CAST(SUM(CASE WHEN ce > 3.55 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE), 6) AS low_q_share
       |FROM scored GROUP BY 1
       |ORDER BY source NULLS FIRST""".stripMargin
  }

  /** Q203 — degenerate-repetition (token-loop) detector: the longest run
    * of identical consecutive tokens per document, profiled per source —
    * the "aaaa…"/"buy buy buy buy" failure mode that slips past Q96's
    * bigram-coverage filters (a long run of ONE token spreads over many
    * distinct positions but few distinct bigrams only when short). Emits
    * per source: docs, max run observed, mean per-doc max run, and the
    * share of docs whose longest run ≥ 3 (the loop-suspect rate).
    *
    * Determinism: runs come from the exact gaps-and-islands identity
    * pos − rank-within-token (Q136's island key on the token axis); all
    * counts int64, shares single divides (round 4/6).
    *
    * Scale notes: one explode + two windows sharing the per-doc sort
    * (partition by doc) + one bounded aggregate — embarrassingly
    * parallel over documents; the row-local HOF-fold twin (aggregate
    * carrying (prev, run, best)) trades the windows for zero shuffle
    * when the corpus is wide-row.
    */
  def q203(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val tok = c.documents
      .select(col("doc_id"), col("source"),
        posexplode(expr("filter(split(text, ' '), t -> t <> '')"))
          .as(Seq("pos", "token")))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("token")).orderBy(col("pos"))
    val runs = tok
      .withColumn("isl", col("pos") - row_number().over(wRun))
      .groupBy(col("doc_id"), col("source"), col("token"), col("isl"))
      .agg(count(lit(1)).as("run"))
    runs.groupBy(col("doc_id"), col("source"))
      .agg(max(col("run")).as("max_run"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("max_run")).as("worst_run"),
        round(avg(col("max_run")), 4).as("mean_max_run"),
        round(sum(when(col("max_run") >= 3L, 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6).as("loop_share"))
      .orderBy(asc_nulls_first("source"))
  }

  val q203Oracle: String =
    """WITH tok AS (
      |  SELECT doc_id, source,
      |    generate_subscripts(w, 1) AS pos, UNNEST(w) AS token
      |  FROM (SELECT doc_id, source,
      |          list_filter(string_split(text, ' '), t -> t <> '') AS w
      |        FROM documents)),
      |runs AS (
      |  SELECT doc_id, source, token,
      |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id, token ORDER BY pos)
      |      AS isl
      |  FROM tok),
      |rl AS (
      |  SELECT doc_id, source, COUNT(*) AS run
      |  FROM runs GROUP BY doc_id, source, token, isl),
      |per_doc AS (
      |  SELECT doc_id, source, MAX(run) AS max_run FROM rl GROUP BY 1, 2)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(MAX(max_run) AS BIGINT) AS worst_run,
      |  ROUND(AVG(max_run), 4) AS mean_max_run,
      |  ROUND(CAST(SUM(CASE WHEN max_run >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS loop_share
      |FROM per_doc GROUP BY 1
      |ORDER BY source NULLS FIRST""".stripMargin

  /** Q206 — Heaps'-law fit per source: V(n) = K·n^β estimated by OLS of
    * ln V on ln n over the source's own vocabulary-growth curve (token
    * mass n and distinct-type count V after each document in doc_id
    * order). Q170's hapax share samples this curve at its endpoint and
    * Q190 gives its spectrum; the FIT says how fast the vocabulary will
    * keep growing — the capacity/OOV-rate forecast a tokenizer sizing
    * decision (Q113/Q119) reads. Emits per source: docs, final token
    * mass and vocabulary, β, K, and r².
    *
    * Determinism: the growth curve is exact integer accounting — token
    * mass is a running int64 sum, V(d) a running sum of first-occurrence
    * counts (min-doc per type, Q172-style) — so both engines regress
    * over IDENTICAL (ln n, ln V) point sets; the OLS sums follow Q181's
    * ln-parity + round-4 discipline.
    *
    * Scale notes: one (source, token) aggregate for first occurrences,
    * two running windows over the per-source doc spine (docs-bounded),
    * one bounded regression aggregate. The corpus is scanned once.
    */
  def q206(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    val perDoc = c.documents
      .select(col("source"), col("doc_id"),
        expr("size(filter(split(text, ' '), t -> t <> ''))").cast("long").as("ntok"))
    val firsts = c.documents
      .select(col("source"), col("doc_id"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("token"))
      .groupBy(col("source"), col("token")).agg(min(col("doc_id")).as("fd"))
      .groupBy(col("source"), col("fd")).agg(count(lit(1)).as("nt"))
    val curve = perDoc
      .join(firsts, perDoc("source") === firsts("source") &&
        perDoc("doc_id") === firsts("fd"), "left")
      .select(perDoc("source"), col("doc_id"), col("ntok"),
        coalesce(col("nt"), lit(0L)).as("nt"))
      .withColumn("n_cum", sum(col("ntok")).over(wS))
      .withColumn("v_cum", sum(col("nt")).over(wS))
      .filter(col("n_cum") >= 1L && col("v_cum") >= 1L)
      .select(col("source"), col("n_cum"), col("v_cum"),
        log(col("n_cum").cast("double")).as("x"),
        log(col("v_cum").cast("double")).as("y"))
    curve.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_cum")).as("n_tokens"),
        max(col("v_cum")).as("vocab"),
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("vocab"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 4).as("beta"),
        round(exp((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
          col("n")), 2).as("k_coef"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy")) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 4).as("r2"))
      .orderBy(asc_nulls_first("source"))
  }

  val q206Oracle: String =
    """WITH per_doc AS (
      |  SELECT source, doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
      |      AS BIGINT) AS ntok
      |  FROM documents),
      |tok AS (
      |  SELECT source, doc_id, UNNEST(
      |    list_filter(string_split(text, ' '), t -> t <> '')) AS token
      |  FROM documents),
      |firsts AS (
      |  SELECT source, fd, COUNT(*) AS nt FROM (
      |    SELECT source, token, MIN(doc_id) AS fd
      |    FROM tok GROUP BY 1, 2)
      |  GROUP BY 1, 2),
      |curve AS (
      |  SELECT p.source,
      |    SUM(p.ntok) OVER w AS n_cum,
      |    SUM(COALESCE(f.nt, 0)) OVER w AS v_cum
      |  FROM per_doc p LEFT JOIN firsts f
      |    ON f.source = p.source AND f.fd = p.doc_id
      |  WINDOW w AS (PARTITION BY p.source ORDER BY p.doc_id
      |    ROWS UNBOUNDED PRECEDING)),
      |pts AS (
      |  SELECT source, n_cum, v_cum,
      |    LN(CAST(n_cum AS DOUBLE)) AS x, LN(CAST(v_cum AS DOUBLE)) AS y
      |  FROM curve WHERE n_cum >= 1 AND v_cum >= 1),
      |s AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    MAX(n_cum) AS n_tokens, MAX(v_cum) AS vocab,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
      |    SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM pts GROUP BY 1)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_tokens AS BIGINT) AS n_tokens, CAST(vocab AS BIGINT) AS vocab,
      |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS beta,
      |  ROUND(EXP((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n),
      |    2) AS k_coef,
      |  ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
      |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
      |FROM s
      |ORDER BY source NULLS FIRST""".stripMargin

  /** Q235 — Good–Turing novelty estimator per source (Good 1953): the
    * ESTIMATOR built on Q190's frequency-of-frequencies front-end. From
    * the exact N_r spectrum: p_unseen = N₁/N (the Turing estimate of the
    * probability the NEXT token is an unseen type — the corpus-growth
    * payoff read a data-acquisition decision wants), the smoothed
    * adjusted counts r* = (r+1)·N_{r+1}/N_r for r = 1, 2 (how much mass
    * the estimator discounts from the rare classes), and the GT mass
    * reassigned to the hapax class (2·N₂/N). Q190 emits the spectrum;
    * this emits what the spectrum is FOR.
    *
    * Determinism: N, V, N₁, N₂, N₃ are exact int64 from one vocab
    * aggregate; each emitted float is a single divide of exact integers,
    * rounded once. N₁ = 0 or N₂ = 0 degrade the affected r* to NULL
    * (CASE guard), never NaN/Inf.
    *
    * Scale notes: the vocab build is the Q170 (source, token) map-side-
    * combined shuffle; the spectrum tallies collapse in the same
    * aggregate — no second pass, output rows = sources.
    */
  def q235(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.documents
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("c") === 3, 1L).otherwise(0L)).as("n3"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        col("n1"), col("n2"), col("n3"),
        round(col("n1").cast("double") / col("n_tokens"), 6).as("p_unseen"),
        expr("CASE WHEN n1 > 0 THEN ROUND(CAST(2 * n2 AS DOUBLE) / n1, 4) END")
          .as("r_star1"),
        expr("CASE WHEN n2 > 0 THEN ROUND(CAST(3 * n3 AS DOUBLE) / n2, 4) END")
          .as("r_star2"),
        expr("ROUND(CAST(2 * n2 AS DOUBLE) / n_tokens, 6)").as("gt_hapax_mass"))
      .orderBy(asc_nulls_first("source"))
  }

  val q235Oracle: String =
    """WITH tok AS (
      |  SELECT source, UNNEST(string_split(text, ' ')) AS token
      |  FROM documents),
      |cnt AS (
      |  SELECT source, token, COUNT(*) AS c FROM tok
      |  WHERE token <> '' GROUP BY 1, 2),
      |s AS (
      |  SELECT source,
      |    CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS vocab,
      |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(SUM(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
      |  FROM cnt GROUP BY source)
      |SELECT source, n_tokens, vocab, n1, n2, n3,
      |  ROUND(CAST(n1 AS DOUBLE) / n_tokens, 6) AS p_unseen,
      |  CASE WHEN n1 > 0 THEN ROUND(CAST(2 * n2 AS DOUBLE) / n1, 4) END AS r_star1,
      |  CASE WHEN n2 > 0 THEN ROUND(CAST(3 * n3 AS DOUBLE) / n2, 4) END AS r_star2,
      |  ROUND(CAST(2 * n2 AS DOUBLE) / n_tokens, 6) AS gt_hapax_mass
      |FROM s
      |ORDER BY source NULLS FIRST""".stripMargin

  /** Q246 — "Fightin' Words" keyness per source (Monroe, Colaresi &
    * Quinn 2008): which tokens DISTINGUISH each source from the rest of
    * the corpus, scored by the informative-Dirichlet log-odds z. Raw
    * frequency ratios over-reward rare tokens and PMI (Q142) ignores
    * variance; the Monroe estimator shrinks both tails: with prior
    * α_w = α₀·y_w/N (corpus-proportional, α₀ = 100), δ = ln[(y_sw+α_w)
    * / (n_s+α₀−y_sw−α_w)] − ln[(y_rw+α_w) / (n_r+α₀−y_rw−α_w)] and
    * z = δ/√(1/(y_sw+α_w) + 1/(y_rw+α_w)). Top 10 per source by z —
    * the "what is this slice actually about" readout a mixture-
    * composition decision (Q158's JS divergence says sources differ;
    * this says WHERE).
    *
    * Determinism: y_sw/n_s/y_w/N are exact int64 from one (source,
    * token) rollup; α_w and every log-odds term is a single
    * textually-pinned float shape (Q206 ln-parity), z is rounded to 4
    * BEFORE the per-source rank with token tie-break, so both engines
    * cut identical top-10 sets.
    *
    * Scale notes: one corpus scan → map-side-combined (source, token)
    * rollup; the global token margin joins back on token (vocab-bounded
    * shuffle); ranking is (source)-partitioned over the source's own
    * vocab. No driver state, no all-pairs anything.
    */
  def q246(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val st = c.documents
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("ysw"))
    val srcTot = st.groupBy(col("source")).agg(sum(col("ysw")).as("ns"))
    val tokTot = st.groupBy(col("token")).agg(sum(col("ysw")).as("yw"))
    val glob = srcTot.agg(sum(col("ns")).as("nn"))
    val z = st.join(srcTot, Seq("source")).join(tokTot, Seq("token"))
      .crossJoin(broadcast(glob))
      .withColumn("aw", expr("CAST(100 * yw AS DOUBLE) / nn"))
      .withColumn("yrw", col("yw") - col("ysw"))
      .withColumn("nr", col("nn") - col("ns"))
      .withColumn("delta",
        expr("LN((ysw + aw) / (CAST(ns + 100 - ysw AS DOUBLE) - aw))" +
          " - LN((yrw + aw) / (CAST(nr + 100 - yrw AS DOUBLE) - aw))"))
      .withColumn("z",
        expr("ROUND(delta / SQRT(CAST(1 AS DOUBLE) / (ysw + aw)" +
          " + CAST(1 AS DOUBLE) / (yrw + aw)), 4)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(desc("z"), asc("token"))
    z.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10L)
      .select(col("source"), col("rk"), col("token"), col("ysw"),
        col("yw"), col("z"))
      .orderBy(asc_nulls_first("source"), asc("rk"))
  }

  val q246Oracle: String =
    """WITH tok AS (
      |  SELECT source, UNNEST(string_split(text, ' ')) AS token
      |  FROM documents),
      |st AS (
      |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS ysw
      |  FROM tok WHERE token <> '' GROUP BY 1, 2),
      |src_tot AS (
      |  SELECT source, CAST(SUM(ysw) AS BIGINT) AS ns FROM st GROUP BY 1),
      |tok_tot AS (
      |  SELECT token, CAST(SUM(ysw) AS BIGINT) AS yw FROM st GROUP BY 1),
      |gtot AS (SELECT CAST(SUM(ns) AS BIGINT) AS nn FROM src_tot),
      |base AS (
      |  SELECT s.source, s.token, s.ysw, t.yw,
      |    CAST(100 * t.yw AS DOUBLE) / g.nn AS aw,
      |    t.yw - s.ysw AS yrw, r.ns AS ns, g.nn - r.ns AS nr
      |  FROM st s
      |  JOIN src_tot r ON r.source = s.source
      |  JOIN tok_tot t ON t.token = s.token
      |  CROSS JOIN gtot g),
      |z AS (
      |  SELECT source, token, ysw, yw,
      |    ROUND((LN((ysw + aw) / (CAST(ns + 100 - ysw AS DOUBLE) - aw))
      |      - LN((yrw + aw) / (CAST(nr + 100 - yrw AS DOUBLE) - aw)))
      |      / SQRT(CAST(1 AS DOUBLE) / (ysw + aw)
      |        + CAST(1 AS DOUBLE) / (yrw + aw)), 4) AS z
      |  FROM base),
      |rk AS (
      |  SELECT *, ROW_NUMBER() OVER
      |    (PARTITION BY source ORDER BY z DESC, token) AS rk
      |  FROM z)
      |SELECT source, CAST(rk AS BIGINT) AS rk, token, ysw, yw, z
      |FROM rk WHERE rk <= 10
      |ORDER BY source NULLS FIRST, rk""".stripMargin

  /** Q258 — held-out INTERPOLATED KNESER–NEY bigram perplexity per
    * source (Kneser & Ney 1995; Chen & Goodman 1999's interpolated
    * form, fixed discount D = 0.5): the modern-smoothing upgrade of
    * Q195's add-one scorer. Trained on the md5 bucket-0 half, scored
    * on bucket 1:
    * p(w₂|w₁) = max(c₁₂ − D, 0)/c₁ + (D·N₁₊(w₁·)/c₁)·p_cont(w₂) for
    * seen contexts, backing off to the CONTINUATION distribution
    * p_cont(w₂) = (N₁₊(·w₂) + 1)/(N₁₊(··) + V + 1) (add-one over
    * train vocab + one OOV class so unseen words stay finite) — the
    * "how many contexts does w₂ complete" estimate that makes KN
    * robust where raw frequency overweights burst words. Emits per
    * source the mean cross-entropy, its perplexity, the backoff share
    * (how often scoring left the trained context space — a
    * train/held-out drift read), and the ce > 3.5 low-quality share.
    *
    * Determinism: all counts (c₁₂, c₁, N₁₊ margins, V) are exact
    * int64; p is a fixed composition of two integer divides; per-doc
    * ce rounds at 6 BEFORE the fence and the source mean (the Q195
    * discipline); ppl exponentiates the already-rounded-4 mean.
    *
    * Scale notes: the LM relations are TRAIN-side aggregates over the
    * bigram-type domain (vocabulary-bounded); scoring joins co-keyed
    * on (w₁, w₂)/(w₁)/(w₂) with no broadcast hint — at web scale the
    * LM tables exceed driver memory and AQE picks the strategy. One
    * corpus pass builds, one scores (Q195's exact topology).
    */
  def q258(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val toks = c.documents
      .withColumn("bucket",
        expr(NearDup.hexValueFastExpr("md5(concat('kn:', CAST(doc_id AS STRING)))")) % 2)
      .withColumn("w", expr("filter(split(text, ' '), t -> t <> '')"))
    val big = toks.filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("source"), col("bucket"),
        explode(expr(
          """transform(sequence(0, size(w) - 2),
            |  i -> struct(w[i] AS w1, w[i + 1] AS w2))""".stripMargin)).as("p"))
      .select(col("doc_id"), col("source"), col("bucket"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
    val lm12 = big.filter(col("bucket") === 0)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("long").as("c12"))
    val lm1 = lm12.groupBy(col("w1"))
      .agg(sum(col("c12")).cast("long").as("c1"),
        count(lit(1)).cast("long").as("n1w1"))
    val cont = lm12.groupBy(col("w2"))
      .agg(count(lit(1)).cast("long").as("n1c"))
    val scal = lm12.agg(count(lit(1)).cast("long").as("n1pp"))
      .crossJoin(toks.filter(col("bucket") === 0)
        .select(explode(col("w")).as("t"))
        .agg(countDistinct(col("t")).cast("long").as("v")))
    val scored = big.filter(col("bucket") === 1)
      .join(lm12, Seq("w1", "w2"), "left")
      .join(lm1, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(scal))
      .withColumn("pcont",
        (coalesce(col("n1c"), lit(0L)) + lit(1L)).cast("double") /
          (col("n1pp") + col("v") + lit(1L)).cast("double"))
      .withColumn("pkn", when(col("c1").isNotNull,
        greatest(coalesce(col("c12"), lit(0L)).cast("double") - lit(0.5),
          lit(0.0)) / col("c1") +
          (lit(0.5) * col("n1w1") / col("c1")) * col("pcont"))
        .otherwise(col("pcont")))
      .withColumn("backoff", when(col("c1").isNull, 1L).otherwise(0L))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).cast("long").as("nb"),
        round(-avg(log(col("pkn"))), 6).as("ce"),
        sum(col("backoff")).cast("long").as("nbk"))
    scored.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("nb")).cast("long").as("n_bigrams"),
        round(avg(col("ce")), 4).as("mean_ce"),
        round(exp(round(avg(col("ce")), 4)), 2).as("ppl"),
        round(sum(col("nbk")).cast("double") / sum(col("nb")), 6)
          .as("backoff_share"),
        round(sum(when(col("ce") > 3.5, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("low_q_share"))
      .orderBy(asc_nulls_first("source"))
  }

  val q258Oracle: String = {
    val bucket = NearDup.hexValueExpr("md5('kn:' || CAST(doc_id AS VARCHAR))")
    s"""WITH toks AS (
       |  SELECT doc_id, source, ($bucket) % 2 AS bucket,
       |    list_filter(string_split(text, ' '), t -> t <> '') AS w
       |  FROM documents),
       |big AS (
       |  SELECT doc_id, source, bucket,
       |    UNNEST(list_transform(range(len(w) - 1), i -> w[i + 1])) AS w1,
       |    UNNEST(list_transform(range(len(w) - 1), i -> w[i + 2])) AS w2
       |  FROM toks WHERE len(w) >= 2),
       |lm12 AS (
       |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
       |  FROM big WHERE bucket = 0 GROUP BY 1, 2),
       |lm1 AS (
       |  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
       |    CAST(COUNT(*) AS BIGINT) AS n1w1
       |  FROM lm12 GROUP BY 1),
       |cont AS (
       |  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1c FROM lm12 GROUP BY 1),
       |scal AS (
       |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lm12) AS n1pp,
       |    (SELECT CAST(COUNT(DISTINCT t.t) AS BIGINT) FROM (
       |      SELECT UNNEST(w) AS t FROM toks WHERE bucket = 0) t) AS v),
       |sc AS (
       |  SELECT b.doc_id, b.source,
       |    CAST(COALESCE(l1.n1c, 0) + 1 AS DOUBLE)
       |      / CAST(s.n1pp + s.v + 1 AS DOUBLE) AS pcont,
       |    l2.c12, lc.c1, lc.n1w1
       |  FROM big b
       |  LEFT JOIN lm12 l2 ON l2.w1 = b.w1 AND l2.w2 = b.w2
       |  LEFT JOIN lm1 lc ON lc.w1 = b.w1
       |  LEFT JOIN cont l1 ON l1.w2 = b.w2
       |  CROSS JOIN scal s
       |  WHERE b.bucket = 1),
       |pk AS (
       |  SELECT doc_id, source,
       |    CASE WHEN c1 IS NOT NULL THEN
       |      GREATEST(CAST(COALESCE(c12, 0) AS DOUBLE) - 0.5, 0.0) / c1
       |        + (0.5 * n1w1 / c1) * pcont
       |    ELSE pcont END AS pkn,
       |    CASE WHEN c1 IS NULL THEN 1 ELSE 0 END AS backoff
       |  FROM sc),
       |scored AS (
       |  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS nb,
       |    ROUND(-AVG(LN(pkn)), 6) AS ce,
       |    CAST(SUM(backoff) AS BIGINT) AS nbk
       |  FROM pk GROUP BY 1, 2)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(nb) AS BIGINT) AS n_bigrams,
       |  ROUND(AVG(ce), 4) AS mean_ce,
       |  ROUND(EXP(ROUND(AVG(ce), 4)), 2) AS ppl,
       |  ROUND(CAST(SUM(nbk) AS DOUBLE) / SUM(nb), 6) AS backoff_share,
       |  ROUND(CAST(SUM(CASE WHEN ce > 3.5 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*), 6) AS low_q_share
       |FROM scored
       |GROUP BY source
       |ORDER BY source NULLS FIRST""".stripMargin
  }

  /** Q259 — lexical concentration per source: Yule's characteristic K,
    * Simpson's repeat rate, and Herdan's C (Yule 1944; Simpson 1949;
    * Herdan 1960) — the classical vocabulary-richness constants, all
    * exact off the per-source term-frequency relation. K =
    * 10⁴·(Σc_w² − N)/N² and D = Σc_w(c_w−1)/(N(N−1)) measure repeat
    * probability (length-robust where Q89's raw type-token ratio is
    * not); Herdan's C = ln V/ln N is the log-log vocabulary slope.
    * Complements Q190's spectrum (which keeps the whole N_r histogram)
    * with the scalar summaries reviewers actually threshold on.
    *
    * Determinism: N, V, Σc_w² are exact int64 (Σc_w² ≤ N² — safe);
    * each constant is one divide rounded once (K at 4, D at 6, C at 4).
    *
    * Scale notes: one corpus scan to the (source, token) count relation
    * (vocabulary-bounded), then a per-source aggregate. Nothing else.
    */
  def q259(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val tf = c.documents
      .select(col("source"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("t"))
      .groupBy(col("source"), col("t"))
      .agg(count(lit(1)).cast("long").as("cw"))
    tf.groupBy(col("source"))
      .agg(sum(col("cw")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("vocab"),
        sum(col("cw") * col("cw")).cast("long").as("sum_c2"))
      .withColumn("yule_k", round(lit(10000.0) *
        (col("sum_c2") - col("n_tokens")).cast("double") /
        (col("n_tokens").cast("double") * col("n_tokens")), 4))
      .withColumn("simpson_d", when(col("n_tokens") > 1,
        round((col("sum_c2") - col("n_tokens")).cast("double") /
          (col("n_tokens").cast("double") * (col("n_tokens") - 1)), 6)))
      .withColumn("herdan_c", when(col("n_tokens") > 1,
        round(log(col("vocab").cast("double")) /
          log(col("n_tokens").cast("double")), 4)))
      .select(col("source"), col("n_tokens"), col("vocab"), col("sum_c2"),
        col("yule_k"), col("simpson_d"), col("herdan_c"))
      .orderBy(asc_nulls_first("source"))
  }

  val q259Oracle: String =
    """WITH tf AS (
      |  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS cw
      |  FROM (
      |    SELECT source,
      |      UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |    FROM documents)
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT source, CAST(SUM(cw) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS vocab,
      |    CAST(SUM(cw * cw) AS BIGINT) AS sum_c2
      |  FROM tf GROUP BY 1)
      |SELECT source, n_tokens, vocab, sum_c2,
      |  ROUND(10000.0 * CAST(sum_c2 - n_tokens AS DOUBLE)
      |    / (CAST(n_tokens AS DOUBLE) * n_tokens), 4) AS yule_k,
      |  CASE WHEN n_tokens > 1 THEN
      |    ROUND(CAST(sum_c2 - n_tokens AS DOUBLE)
      |      / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)), 6) END
      |    AS simpson_d,
      |  CASE WHEN n_tokens > 1 THEN
      |    ROUND(LN(CAST(vocab AS DOUBLE))
      |      / LN(CAST(n_tokens AS DOUBLE)), 4) END AS herdan_c
      |FROM agg
      |ORDER BY source NULLS FIRST""".stripMargin

  /** Q289 — Heaps'-law vocabulary-growth profile per source (Heaps
    * 1978): the distinct-token count V(n) over the first n = 2^k docs
    * of each source (doc_id order — the declared deterministic
    * prefix), with the per-level growth exponent β_k = log₂(V_k /
    * V_{k−1}) and a sublinearity verdict on the LAST level. β ≈ 0.4–
    * 0.6 is natural text's signature; β → 1 means near-disjoint
    * vocabularies (boilerplate IDs, hashes — the corpus smell a
    * data-acquisition review looks for), β → 0 a closed template
    * vocabulary. The "how fast does more data buy new words" read
    * that the static Q170 vocab rollup cannot give.
    *
    * Determinism: prefixes are doc_id-ranked (exact); V counts are
    * exact distinct aggregates; β is one LN-ratio expression of two
    * exact int64 counts via LAG, rounded 4.
    *
    * Scale notes: one explode joined against log₂(n_docs) dyadic
    * levels — the token relation replicates at most ⌈log₂ D⌉ times
    * (the standard doubling-profile trick), then collapses per
    * (source, level) in one distinct aggregate. No quadratic term.
    */
  def q289(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val docs = c.documents
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("doc_id"))).cast("long"))
    val levels = docs.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .select(col("source"), col("n_docs"),
        explode(expr(
          "sequence(1, CAST(FLOOR(LOG2(CAST(n_docs AS DOUBLE))) AS INT))"))
          .as("k"))
      .withColumn("n_prefix", expr("shiftleft(CAST(1 AS BIGINT), k)"))
    val tok = docs
      .select(col("source"), col("rn"),
        explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val v = tok.join(levels, Seq("source"))
      .filter(col("rn") <= col("n_prefix"))
      .groupBy(col("source"), col("k"), col("n_prefix"))
      .agg(countDistinct(col("token")).cast("long").as("vocab"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("k"))
    v.withColumn("vprev", lag(col("vocab"), 1).over(w))
      .withColumn("beta", when(col("vprev").isNotNull, expr(
        "ROUND(LN(CAST(vocab AS DOUBLE) / vprev) / LN(2), 4)")))
      .withColumn("kmax", max(col("k")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
      .withColumn("verdict", when(col("k") =!= col("kmax"), lit(null)
        .cast("string"))
        .when(col("beta").isNull, "single_level")
        .when(col("beta") < 0.2, "closed_vocab")
        .when(col("beta") < 0.8, "heaps_sublinear")
        .otherwise("open_vocab"))
      .select(col("source"), col("k").cast("long").as("k"),
        col("n_prefix"), col("vocab"), col("beta"), col("verdict"))
      .orderBy(asc_nulls_first("source"), asc("k"))
  }

  val q289Oracle: String =
    """WITH docs AS (
      |  SELECT source, doc_id, text,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
      |      AS BIGINT) AS rn
      |  FROM documents),
      |lv AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM docs GROUP BY 1),
      |levels AS (
      |  SELECT source,
      |    CAST(UNNEST(generate_series(1,
      |      CAST(FLOOR(LOG2(CAST(n_docs AS DOUBLE))) AS BIGINT))) AS BIGINT)
      |      AS k
      |  FROM lv),
      |levels2 AS (
      |  SELECT source, k, (1::BIGINT << k::INT) AS n_prefix FROM levels),
      |tok AS (
      |  SELECT d.source, d.rn, UNNEST(string_split(d.text, ' ')) AS token
      |  FROM docs d),
      |v AS (
      |  SELECT t.source, l.k, l.n_prefix,
      |    CAST(COUNT(DISTINCT t.token) AS BIGINT) AS vocab
      |  FROM tok t JOIN levels2 l ON l.source = t.source
      |  WHERE t.token <> '' AND t.rn <= l.n_prefix
      |  GROUP BY 1, 2, 3),
      |b AS (
      |  SELECT *,
      |    LAG(vocab) OVER (PARTITION BY source ORDER BY k) AS vprev,
      |    CAST(MAX(k) OVER (PARTITION BY source) AS BIGINT) AS kmax
      |  FROM v)
      |SELECT source, k, n_prefix, vocab,
      |  CASE WHEN vprev IS NOT NULL THEN
      |    ROUND(LN(CAST(vocab AS DOUBLE) / vprev) / LN(2), 4) END AS beta,
      |  CASE WHEN k <> kmax THEN NULL
      |    WHEN vprev IS NULL THEN 'single_level'
      |    WHEN ROUND(LN(CAST(vocab AS DOUBLE) / vprev) / LN(2), 4) < 0.2
      |      THEN 'closed_vocab'
      |    WHEN ROUND(LN(CAST(vocab AS DOUBLE) / vprev) / LN(2), 4) < 0.8
      |      THEN 'heaps_sublinear'
      |    ELSE 'open_vocab' END AS verdict
      |FROM b
      |ORDER BY source NULLS FIRST, k""".stripMargin

  /** Q290 — token burstiness top-20 (Church & Gale 1995's
    * variance-to-mean read): for each token with df ≥ 5, the
    * population variance-to-mean ratio of its per-doc count over ALL
    * D docs (absent docs count 0): b = (D·Σc² − n²) / (D·n), exact
    * int64 cross-products, one divide. b ≈ 1 is Poisson scatter
    * (function words); b ≫ 1 marks topical/bursty tokens that
    * concentrate in few docs — the token-level signal behind Q44's
    * doc-level repetition flags, and the contamination smell when a
    * "common" token's mass sits in two documents.
    *
    * Determinism: per-(token, doc) counts, df, n, Σc² are exact; b
    * and the df share divide once each; the top-20 is fully
    * tie-broken (b round-4 desc, token asc).
    *
    * Scale notes: one explode → one (token, doc) groupBy → one token
    * rollup — the Q170 vocabulary topology; the top-20 is a
    * TakeOrdered over the vocabulary-bounded rollup.
    */
  def q290(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val dTot = c.documents.agg(count(lit(1)).cast("long").as("d_total"))
    val perDoc = c.documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    perDoc.groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("df"),
        sum(col("cnt")).cast("long").as("n"),
        sum(col("cnt") * col("cnt")).cast("long").as("ss"))
      .filter(col("df") >= 5)
      .crossJoin(broadcast(dTot))
      .withColumn("burstiness", expr(
        "ROUND(CAST(d_total * ss - n * n AS DOUBLE) / (d_total * n), 4)"))
      .withColumn("df_share",
        expr("ROUND(CAST(df AS DOUBLE) / d_total, 6)"))
      .select(col("token"), col("df"), col("n").as("n_occurrences"),
        col("burstiness"), col("df_share"))
      .orderBy(desc("burstiness"), asc("token"))
      .limit(20)
  }

  val q290Oracle: String =
    """WITH d AS (SELECT CAST(COUNT(*) AS BIGINT) AS d_total FROM documents),
      |per_doc AS (
      |  SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
      |    FROM documents) t
      |  WHERE token <> '' GROUP BY 1, 2),
      |roll AS (
      |  SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
      |    CAST(SUM(cnt) AS BIGINT) AS n,
      |    CAST(SUM(cnt * cnt) AS BIGINT) AS ss
      |  FROM per_doc GROUP BY 1)
      |SELECT token, df, n AS n_occurrences,
      |  ROUND(CAST(d_total * ss - n * n AS DOUBLE) / (d_total * n), 4)
      |    AS burstiness,
      |  ROUND(CAST(df AS DOUBLE) / d_total, 6) AS df_share
      |FROM roll CROSS JOIN d
      |WHERE df >= 5
      |ORDER BY burstiness DESC, token
      |LIMIT 20""".stripMargin

  /** Q300 — Chao1 nonparametric vocabulary-richness estimate per source
    * (Chao 1984, the bias-corrected form; Good 1953's coverage): how many
    * distinct tokens does the source's population vocabulary hold, given
    * what the sample's hapax/dis-legomena spectrum says about unseen
    * mass? Chao1 = V + n1(n1−1)/(2(n2+1)); Good's coverage Ĉ = 1 − n1/N.
    * The RICHNESS companion to Q235's Good–Turing mass re-allocation and
    * Q289's Heaps growth curve — Q289 measures how fast vocabulary is
    * still growing, Chao1 estimates where it tops out.
    *
    * Determinism: V, n1, n2, N are exact int64 spectrum counts; chao1
    * and coverage are single fixed-shape expressions over exact ints,
    * rounded once; the undersampling verdict compares the exact integer
    * cross-product 5·n1·(n1−1) > 2·(n2+1)·V (⟺ Chao1 > 1.2·V) — never
    * the rounded float.
    *
    * Scale notes: one (source, token) aggregate of the corpus (the
    * data-sized shuffle Q259 already pays), then a vocabulary-bounded
    * spectrum rollup per source. Output is |sources| rows.
    */
  def q300(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val tf = c.documents
      .select(col("source"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("t"))
      .groupBy(col("source"), col("t"))
      .agg(count(lit(1)).cast("long").as("cw"))
    tf.groupBy(col("source"))
      .agg(sum(col("cw")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("vocab"),
        sum(when(col("cw") === 1, 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("cw") === 2, 1L).otherwise(0L)).cast("long").as("n2"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        col("n1"), col("n2"),
        expr("ROUND(vocab + CAST(n1 * (n1 - 1) AS DOUBLE)" +
          " / (2 * (n2 + 1)), 4)").as("chao1"),
        expr("ROUND(CAST(n_tokens - n1 AS DOUBLE) / n_tokens, 6)")
          .as("coverage"),
        expr("CASE WHEN 5 * n1 * (n1 - 1) > 2 * (n2 + 1) * vocab" +
          " THEN 'undersampled' ELSE 'well_sampled' END").as("verdict"))
      .orderBy(asc_nulls_first("source"))
  }

  val q300Oracle: String =
    """WITH tf AS (
      |  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS cw
      |  FROM (
      |    SELECT source,
      |      UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |    FROM documents)
      |  GROUP BY 1, 2),
      |spec AS (
      |  SELECT source, CAST(SUM(cw) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS vocab,
      |    CAST(SUM(CASE WHEN cw = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN cw = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      |  FROM tf GROUP BY 1)
      |SELECT source, n_tokens, vocab, n1, n2,
      |  ROUND(vocab + CAST(n1 * (n1 - 1) AS DOUBLE) / (2 * (n2 + 1)), 4)
      |    AS chao1,
      |  ROUND(CAST(n_tokens - n1 AS DOUBLE) / n_tokens, 6) AS coverage,
      |  CASE WHEN 5 * n1 * (n1 - 1) > 2 * (n2 + 1) * vocab
      |    THEN 'undersampled' ELSE 'well_sampled' END AS verdict
      |FROM spec
      |ORDER BY source NULLS FIRST""".stripMargin

  /** Q303 — Burrows' Delta stylometric distance between sources
    * (Burrows 2002; Argamon 2008's z-score reading): over the top-30
    * corpus marker words (most frequent overall, token-ascending
    * tiebreak), each source's relative frequency is standardized
    * across sources (population z per word), and
    * Delta(a, b) = mean |z_a − z_b|. The authorship/register-shift
    * distance the JSD gate (Q158) can't give: JSD weighs the whole
    * vocabulary by mass, Delta reads only the function-word profile —
    * the classic stylometric signal.
    *
    * Determinism: marker selection orders on exact int64 counts;
    * relative frequencies are single divides of exact ints; per-word
    * mean/std and z assemble through fixed-shape expressions (the
    * source count is a small exact int); the per-pair sum of 30 |Δz|
    * doubles accumulates at ~1e-15 against the 1e-4 rounding grid
    * (the Q158 ln-parity precedent); words with σ = 0 drop on an
    * exact comparison.
    *
    * Scale notes: one (source, token) aggregate (shared shape with
    * Q259/Q300), a TakeOrdered(30) marker pick, then everything lives
    * on the (sources × 30) grid — broadcast-sized at any corpus
    * scale. Output is |sources|²/2 rows.
    */
  def q303(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val tf = c.documents
      .select(col("source"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("t"))
      .groupBy(col("source"), col("t"))
      .agg(count(lit(1)).cast("long").as("cw"))
      .localCheckpoint()
    val markers = tf.groupBy(col("t"))
      .agg(sum(col("cw")).cast("long").as("ct"))
      .orderBy(desc("ct"), asc("t")).limit(30)
      .select(col("t"))
    val tot = tf.groupBy(col("source")).agg(sum(col("cw")).cast("long").as("tot"))
    val nsrc = tot.agg(count(lit(1)).cast("long").as("ns"))
    val grid = tot.crossJoin(broadcast(markers))
      .join(tf, Seq("source", "t"), "left")
      .select(col("source"), col("t"),
        (coalesce(col("cw"), lit(0L)).cast("double") / col("tot")).as("f"))
    val stats = grid.groupBy(col("t"))
      .agg(sum(col("f")).as("sf"), sum(col("f") * col("f")).as("sff"))
      .crossJoin(broadcast(nsrc))
      .select(col("t"),
        expr("sf / ns").as("mu"),
        expr("SQRT(sff / ns - (sf / ns) * (sf / ns))").as("sigma"))
      .filter(col("sigma") > 0)
    val z = grid.join(stats, Seq("t"))
      .select(col("source"), col("t"),
        expr("(f - mu) / sigma").as("z"))
    z.as("x").join(z.as("y"),
        col("x.t") === col("y.t") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).cast("long").as("n_markers"),
        round(sum(abs(col("x.z") - col("y.z"))) /
          count(lit(1)), 4).as("delta"))
      .orderBy(asc_nulls_first("src_a"), asc_nulls_first("src_b"))
  }

  val q303Oracle: String =
    """WITH tf AS (
      |  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS cw
      |  FROM (
      |    SELECT source,
      |      UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |    FROM documents)
      |  GROUP BY 1, 2),
      |markers AS (
      |  SELECT t FROM (
      |    SELECT t, CAST(SUM(cw) AS BIGINT) AS ct FROM tf GROUP BY 1)
      |  ORDER BY ct DESC, t LIMIT 30),
      |tot AS (SELECT source, CAST(SUM(cw) AS BIGINT) AS tot
      |        FROM tf GROUP BY 1),
      |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM tot),
      |grid AS (
      |  SELECT s.source, m.t,
      |    CAST(COALESCE(f.cw, 0) AS DOUBLE) / s.tot AS f
      |  FROM tot s CROSS JOIN markers m
      |  LEFT JOIN tf f ON f.source = s.source AND f.t = m.t),
      |stats AS (
      |  SELECT t, sf / ns AS mu,
      |    SQRT(sff / ns - (sf / ns) * (sf / ns)) AS sigma
      |  FROM (SELECT t, SUM(f) AS sf, SUM(f * f) AS sff
      |        FROM grid GROUP BY 1) CROSS JOIN ns),
      |z AS (
      |  SELECT g.source, g.t, (g.f - s.mu) / s.sigma AS z
      |  FROM grid g JOIN stats s ON s.t = g.t
      |  WHERE s.sigma > 0)
      |SELECT x.source AS src_a, y.source AS src_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_markers,
      |  ROUND(SUM(ABS(x.z - y.z)) / COUNT(*), 4) AS delta
      |FROM z x JOIN z y ON y.t = x.t AND x.source < y.source
      |GROUP BY 1, 2
      |ORDER BY src_a NULLS FIRST, src_b NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q289" -> (q289 _), "Q290" -> (q290 _),
    "Q300" -> (q300 _), "Q303" -> (q303 _),
    "Q44" -> (q44 _), "Q45" -> (q45 _), "Q46" -> (q46 _), "Q47" -> (q47 _),
    "Q52" -> (q52 _), "Q66" -> (q66 _), "Q88" -> (q88 _), "Q89" -> (q89 _),
    "Q96" -> (q96 _), "Q158" -> (q158 _), "Q164" -> (q164 _),
    "Q167" -> (q167 _), "Q170" -> (q170 _), "Q178" -> (q178 _),
    "Q181" -> (q181 _), "Q190" -> (q190 _), "Q191" -> (q191 _),
    "Q195" -> (q195 _), "Q203" -> (q203 _), "Q206" -> (q206 _),
    "Q235" -> (q235 _), "Q246" -> (q246 _), "Q258" -> (q258 _),
    "Q259" -> (q259 _))

  def oracles: Map[String, String] = Map(
    "Q289" -> q289Oracle, "Q290" -> q290Oracle,
    "Q300" -> q300Oracle, "Q303" -> q303Oracle,
    "Q44" -> q44Oracle, "Q45" -> q45Oracle, "Q46" -> q46Oracle,
    "Q47" -> q47Oracle, "Q52" -> q52Oracle, "Q66" -> q66Oracle,
    "Q88" -> q88Oracle, "Q89" -> q89Oracle, "Q96" -> q96Oracle,
    "Q158" -> q158Oracle, "Q164" -> q164Oracle, "Q167" -> q167Oracle,
    "Q170" -> q170Oracle, "Q178" -> q178Oracle,
    "Q181" -> q181Oracle, "Q190" -> q190Oracle, "Q191" -> q191Oracle,
    "Q195" -> q195Oracle, "Q203" -> q203Oracle, "Q206" -> q206Oracle,
    "Q235" -> q235Oracle, "Q246" -> q246Oracle, "Q258" -> q258Oracle,
    "Q259" -> q259Oracle)
}
