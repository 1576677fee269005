package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Catalog

/** Corpus-curation operators for LLM training-data pipelines (builder-prompt
  * north star; extensions beyond SURVEY §2's Q-inventory, declared under the
  * same §2.0 oracle discipline): statistical language-model scoring (Q69),
  * benchmark decontamination (Q70), quantile-gated quality filtering (Q71),
  * deterministic hash sampling for domain mixing (Q72), array-function
  * coverage (Q73), and per-entity first/last attribution (Q74).
  *
  * Scale notes (100 TB): every operator here is linear passes + bounded-side
  * broadcasts. The corpus-level statistics each one needs (unigram LM,
  * benchmark shingle set, per-domain rates) are SMALL relative to the corpus
  * — vocabulary, eval-suite n-grams, #domains — so they broadcast, and the
  * corpus itself is touched only by embarrassingly-parallel map work plus at
  * most one aggregate. Nothing here shuffles the full corpus on a wide key.
  */
object PipelineOps {

  /** Tokens with multiplicity — the unit of LM scoring. */
  private def tokens(c: Catalog): DataFrame =
    c.documents.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))

  /** Q69 — unigram language-model document scoring (the classic
    * perplexity-style quality filter: score each document by the mean
    * log-probability of its tokens under the corpus unigram distribution;
    * low scorers are gibberish / boilerplate candidates).
    *
    * Scale: the LM is one groupBy over tokens (vocabulary-sized result —
    * bounded, broadcastable even for web-scale corpora at ~10^7 types);
    * scoring is a broadcast join + per-doc aggregate. One corpus pass for
    * the LM, one for scoring.
    */
  def q69(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val tok = tokens(c)
    val lm = tok.groupBy(col("token")).agg(count(lit(1)).as("tf"))
    val total = lm.agg(sum(col("tf")).as("corpus_n"))
    val probs = lm.crossJoin(broadcast(total))
      .select(col("token"),
        (col("tf").cast("double") / col("corpus_n")).as("p"))
    tok.filter(col("doc_id") <= 100)
      .join(broadcast(probs), Seq("token"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log(col("p"))), 4).as("avg_logp"))
      .orderBy(asc_nulls_first("doc_id"))
  }

  val q69Oracle: String =
    """WITH tok AS (
      |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents),
      |lm AS (SELECT token, COUNT(*) AS tf FROM tok GROUP BY token),
      |probs AS (
      |  SELECT token, CAST(tf AS DOUBLE) / SUM(tf) OVER () AS p FROM lm)
      |SELECT t.doc_id, COUNT(*) AS n_tokens, ROUND(AVG(LN(p.p)), 4) AS avg_logp
      |FROM tok t JOIN probs p ON t.token = p.token
      |WHERE t.doc_id <= 100
      |GROUP BY t.doc_id
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Word 5-gram shingles of a document relation (keeps lang/source). */
  private def shingles5(d: DataFrame): DataFrame = d
    .withColumn("toks", split(col("text"), " "))
    .filter(size(col("toks")) >= 5)
    .select(col("doc_id"), col("lang"), col("source"), explode(expr(
      """transform(sequence(0, size(toks) - 5),
        |  i -> concat_ws(' ', slice(toks, i + 1, 5)))""".stripMargin)).as("sh"))

  /** Q70 — benchmark decontamination: flag training documents sharing any
    * word 5-gram with a held-out evaluation set (here: `source = 'src0'`
    * plays the benchmark). Emits per-language train size and contamination
    * count — the report a curation pipeline acts on before training.
    *
    * Scale: the eval suite is tiny next to the corpus, so its distinct
    * shingle set BROADCASTS; the corpus side is a map-side semi join — no
    * shuffle of the 100 TB side at all.
    */
  def q70(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val evalSh = shingles5(c.documents.filter(col("source") === "src0"))
      .select(col("sh")).distinct()
    val train = c.documents.filter(col("source") =!= "src0")
    val flagged = shingles5(train)
      .join(broadcast(evalSh), Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    // flagged is data-dependent (could approach the train size on a badly
    // contaminated corpus) — no broadcast hint; AQE decides from runtime
    // stats. The eval shingle set above IS structurally bounded, so it
    // keeps its hint.
    train
      .join(flagged.withColumn("flag", lit(1)), Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_train"),
        count(col("flag")).as("n_contaminated"))
      .orderBy(asc_nulls_first("lang"))
  }

  val q70Oracle: String =
    """WITH sh AS (
      |  SELECT doc_id, source, UNNEST(list_transform(
      |    range(len(string_split(text, ' ')) - 4),
      |    i -> string_split(text, ' ')[i + 1] || ' ' ||
      |         string_split(text, ' ')[i + 2] || ' ' ||
      |         string_split(text, ' ')[i + 3] || ' ' ||
      |         string_split(text, ' ')[i + 4] || ' ' ||
      |         string_split(text, ' ')[i + 5])) AS s
      |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
      |eval_sh AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
      |flagged AS (
      |  SELECT DISTINCT doc_id FROM sh
      |  WHERE source <> 'src0' AND s IN (SELECT s FROM eval_sh))
      |SELECT d.lang, COUNT(*) AS n_train, COUNT(f.doc_id) AS n_contaminated
      |FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
      |WHERE d.source <> 'src0'
      |GROUP BY d.lang
      |ORDER BY lang NULLS FIRST""".stripMargin

  /** The Q45 composite quality score, computed for EVERY document (Q45
    * itself emits a probe window). Kept textually in sync with Q45.
    */
  private def scored(c: Catalog): DataFrame = c.documents
    .withColumn("n_tokens", expr("size(split(text, ' '))").cast("long"))
    .withColumn("stop_hits",
      expr("size(filter(split(text, ' '), t -> t IN ('the', 'a', 'value')))").cast("long"))
    .withColumn("avg_tok",
      (col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"))
    .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
    .withColumn("quality",
      least(col("n_tokens") / 50.0, lit(1.0)) * 0.5 +
      (lit(1.0) - col("stop_ratio")) * 0.3 +
      least(col("avg_tok") / 10.0, lit(1.0)) * 0.2)

  /** Q71 — quantile-gated quality filter: within each language, drop the
    * bottom quartile by composite quality score (Q45's formula) and report
    * corpus retention. The gate is RANK-based (percent_rank ≥ 0.25), not
    * value-interpolated: rank arithmetic is exact integer work, so the
    * cross-engine comparison cannot trip on a 1-ulp interpolation
    * difference the way a quantile_cont threshold could with tied scores.
    *
    * Scale: one window pass partitioned by language + one aggregate. For a
    * corpus where per-language sorting is too hot, the production variant
    * computes an approximate threshold (approx_percentile) on a sample and
    * broadcasts it — the gate then becomes a map-side filter.
    */
  def q71(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val pr = percent_rank().over(
      Window.partitionBy(col("lang")).orderBy(asc("quality")))
    scored(c)
      .withColumn("pr", pr)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("pr") >= 0.25, 1)).as("n_kept"),
        round(avg(when(col("pr") >= 0.25, col("quality"))), 4).as("avg_kept_quality"),
        round(min(when(col("pr") >= 0.25, col("quality"))), 4).as("gate_quality"))
      .orderBy(asc_nulls_first("lang"))
  }

  val q71Oracle: String =
    """WITH scored AS (
      |  SELECT lang,
      |    LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0) * 0.5 +
      |    (1.0 - CAST(len(list_filter(string_split(text, ' '),
      |                     t -> t IN ('the', 'a', 'value'))) AS DOUBLE)
      |           / len(string_split(text, ' '))) * 0.3 +
      |    LEAST((CAST(n_chars - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |           / len(string_split(text, ' '))) / 10.0, 1.0) * 0.2 AS quality
      |  FROM documents),
      |ranked AS (
      |  SELECT lang, quality,
      |    PERCENT_RANK() OVER (PARTITION BY lang ORDER BY quality) AS pr
      |  FROM scored)
      |SELECT lang, COUNT(*) AS n_docs,
      |  COUNT(*) FILTER (WHERE pr >= 0.25) AS n_kept,
      |  ROUND(AVG(quality) FILTER (WHERE pr >= 0.25), 4) AS avg_kept_quality,
      |  ROUND(MIN(quality) FILTER (WHERE pr >= 0.25), 4) AS gate_quality
      |FROM ranked
      |GROUP BY lang
      |ORDER BY lang NULLS FIRST""".stripMargin

  /** Q72 — deterministic hash sampling for target domain mixing: compute
    * per-language sampling rates that downsample every language to the
    * smallest language's size (a uniform target mix), then select
    * documents by md5-bucket — the reproducible, cluster-order-independent
    * way a pipeline subsamples (same doc always gets the same verdict,
    * any executor, any run). Emits per-language corpus size, kept count,
    * and the applied rate.
    *
    * Scale: rates come from a #languages-sized aggregate (broadcast); the
    * selection itself is a stateless per-row predicate — no shuffle, no
    * RNG, no driver coordination. This is how you hold a 30/30/40 domain
    * mix steady across 1000 executors.
    */
  def q72(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val counts = c.documents.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val target = counts.agg(min(col("n")).as("min_n"))
    val rates = counts.crossJoin(broadcast(target))
      .select(col("lang"), (col("min_n").cast("double") / col("n")).as("rate"))
    c.documents
      .withColumn("h", md5(col("text")))
      .withColumn("bucket", expr(NearDup.hexValueFastExpr("h")) % 10000)
      .join(broadcast(rates), Seq("lang"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("bucket") < col("rate") * 10000, 1)).as("n_kept"),
        round(max(col("rate")), 4).as("rate"))
      .orderBy(asc_nulls_first("lang"))
  }

  val q72Oracle: String = {
    val hv = NearDup.hexValueExpr("h")
    s"""WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
      |rates AS (
      |  SELECT lang, CAST((SELECT MIN(n) FROM counts) AS DOUBLE) / n AS rate
      |  FROM counts),
      |hashed AS (SELECT lang, md5(text) AS h FROM documents),
      |bucketed AS (SELECT lang, ($hv) % 10000 AS bucket FROM hashed)
      |SELECT b.lang AS lang, COUNT(*) AS n_docs,
      |  COUNT(*) FILTER (WHERE bucket < rate * 10000) AS n_kept,
      |  ROUND(MAX(rate), 4) AS rate
      |FROM bucketed b JOIN rates r ON b.lang = r.lang
      |GROUP BY b.lang
      |ORDER BY lang NULLS FIRST""".stripMargin
  }

  /** Q73 — array-function surface over token lists: distinct size, sorted
    * prefix, stopword intersection, membership probe. Spark array_* and
    * DuckDB list_* agree on set semantics (intersection deduplicates in
    * both engines).
    *
    * Scale: pure per-row scalar work, codegen'd, zero shuffles before the
    * output sort.
    */
  def q73(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.documents
      .filter(col("doc_id") <= 50)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        array_join(slice(sort_array(array_distinct(col("toks"))), 1, 3), ",")
          .as("first3"),
        size(array_intersect(col("toks"),
          array(lit("the"), lit("a"), lit("value")))).cast("long").as("stop_overlap"),
        array_contains(col("toks"), "dup").as("has_dup"))
      .orderBy(asc_nulls_first("doc_id"))
  }

  val q73Oracle: String =
    """SELECT doc_id,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
      |    AS first3,
      |  len(list_intersect(string_split(text, ' '), ['the', 'a', 'value']))
      |    AS stop_overlap,
      |  list_contains(string_split(text, ' '), 'dup') AS has_dup
      |FROM documents
      |WHERE doc_id <= 50
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Q74 — per-entity first/last attribution: each user's first and last
    * event type by event time (event_id tiebreak — ADVICE r1 requires the
    * total order to be explicit when timestamps can tie) plus their event
    * count, via unbounded-frame window first/last.
    *
    * Scale: one shuffle on user_id serves all three window computations
    * (same partitioning); at 100 TB this is the canonical "user profile"
    * pass and the partitioning is reused by any downstream per-user work.
    */
  def q74(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val wAll = Window.partitionBy(col("user_id"))
      .orderBy(asc("us"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c.events
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
      .select(
        col("user_id"),
        first(col("event_type")).over(wAll).as("first_type"),
        last(col("event_type")).over(wAll).as("last_type"),
        count(lit(1)).over(Window.partitionBy(col("user_id"))).as("n_events"))
      .distinct()
      .orderBy(asc_nulls_first("user_id"))
  }

  val q74Oracle: String =
    """SELECT DISTINCT user_id,
      |  first_value(event_type) OVER (PARTITION BY user_id
      |    ORDER BY epoch_us(ts), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
      |  last_value(event_type) OVER (PARTITION BY user_id
      |    ORDER BY epoch_us(ts), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
      |  COUNT(*) OVER (PARTITION BY user_id) AS n_events
      |FROM events
      |ORDER BY user_id NULLS FIRST""".stripMargin

  /** Q76 — sliding-window chunking (context-window preparation): split
    * each document into token windows of size 10 with stride 5 (full
    * windows only; sub-window docs are excluded — the padding policy is
    * the trainer's concern). Emits every chunk with its id and text for a
    * probe set of docs.
    *
    * Scale: per-row transform + explode — linear, no shuffle before the
    * output sort; chunk count per doc is (n−10)/5+1, so output size is
    * O(corpus tokens / stride), the expected blow-up of any chunker.
    */
  def q76(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.documents
      .filter(col("doc_id") <= 30)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 10)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        explode(expr(
          """transform(sequence(0, size(toks) - 10, 5),
            |  s -> struct(CAST(s DIV 5 AS BIGINT) AS chunk_id,
            |              concat_ws(' ', slice(toks, s + 1, 10)) AS chunk))"""
            .stripMargin)).as("c"))
      .select(col("doc_id"), col("n_tokens"),
        col("c.chunk_id").as("chunk_id"), col("c.chunk").as("chunk"))
      .orderBy(asc_nulls_first("doc_id"), asc_nulls_first("chunk_id"))
  }

  val q76Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS sp
      |  FROM documents WHERE doc_id <= 30 AND len(string_split(text, ' ')) >= 10)
      |SELECT doc_id, len(sp) AS n_tokens,
      |  s // 5 AS chunk_id,
      |  array_to_string(list_slice(sp, s + 1, s + 10), ' ') AS chunk
      |FROM (SELECT doc_id, sp, UNNEST(range(0, len(sp) - 9, 5)) AS s FROM d)
      |ORDER BY doc_id NULLS FIRST, chunk_id NULLS FIRST""".stripMargin

  /** Q77 — greedy sequence-packing assignment: concatenate each language's
    * documents in doc_id order into a token stream cut into 512-token
    * contexts; a document belongs to the context its first token lands in.
    * Emits per (lang, bin): document count and token mass — the packing
    * efficiency report for a training run.
    *
    * Scale: one running sum per language partition (window) + one bounded
    * aggregate. Deterministic: integer cumulative sums, no estimation.
    */
  def q77(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val w = Window.partitionBy(col("lang")).orderBy(asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c.documents
      .withColumn("n_tokens", expr("size(split(text, ' '))").cast("long"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr("(cum - n_tokens) DIV 512"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
      .orderBy(asc_nulls_first("lang"), asc_nulls_first("bin"))
  }

  val q77Oracle: String =
    """WITH sized AS (
      |  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens
      |  FROM documents),
      |packed AS (
      |  SELECT lang, n_tokens,
      |    (SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 512
      |      AS bin
      |  FROM sized)
      |SELECT lang, CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS tokens
      |FROM packed
      |GROUP BY lang, bin
      |ORDER BY lang NULLS FIRST, bin NULLS FIRST""".stripMargin

  /** Q80 — shared-chunk boilerplate detection (the chunk-level analog of
    * line-level dedup): hash every 10-token/stride-5 chunk, find hashes
    * present in ≥ 2 distinct documents, and report per language how many
    * documents carry at least one shared chunk. High counts mean template
    * text the near-dup pass should inspect.
    *
    * Scale: one chunk explode + one groupBy on the chunk hash (the same
    * shuffle class as exact dedup) + a broadcast-back of flagged docs;
    * never a doc×doc comparison.
    */
  def q80(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val chunks = c.documents
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 10)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(toks) - 10, 5),
          |  s -> concat_ws(' ', slice(toks, s + 1, 10)))""".stripMargin)).as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("h"))
      .distinct()
      // referenced by the shared-hash aggregate AND the semi-join probe;
      // the distinct just shuffled this into compact form, so pinning it
      // costs nothing beyond what the shuffle already wrote
      .localCheckpoint()
    val shared = chunks.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"))
    val flagged = chunks.join(shared, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
    // flagged is data-dependent (boilerplate-heavy corpora flag most
    // docs) — no broadcast hint, AQE decides.
    c.documents
      .join(flagged.withColumn("flag", lit(1)), Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), count(col("flag")).as("n_with_shared_chunk"))
      .orderBy(asc_nulls_first("lang"))
  }

  val q80Oracle: String =
    """WITH chunks AS (
      |  SELECT DISTINCT doc_id, md5(array_to_string(
      |    list_slice(string_split(text, ' '), s + 1, s + 10), ' ')) AS h
      |  FROM (SELECT doc_id, text,
      |          UNNEST(range(0, len(string_split(text, ' ')) - 9, 5)) AS s
      |        FROM documents WHERE len(string_split(text, ' ')) >= 10)),
      |shared AS (
      |  SELECT h FROM chunks GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
      |flagged AS (
      |  SELECT DISTINCT doc_id FROM chunks WHERE h IN (SELECT h FROM shared))
      |SELECT d.lang, COUNT(*) AS n_docs, COUNT(f.doc_id) AS n_with_shared_chunk
      |FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
      |GROUP BY d.lang
      |ORDER BY lang NULLS FIRST""".stripMargin

  /** Q81 — cross-modal coverage: which documents have a paired embedding
    * (doc_id = vec_id), per language, with the mean L2 norm of the paired
    * vectors — the join a multimodal corpus runs to find rows missing
    * their second modality.
    *
    * Scale: documents shuffle-join embeddings on the id (both corpus-
    * sized, the honest plan); norms are per-row folds, codegen'd.
    */
  def q81(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val e = c.embeddings.select(col("vec_id"),
      sqrt(expr(
        "aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
        .as("norm"))
    c.documents
      .join(e, col("doc_id") === col("vec_id"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("vec_id")).as("n_with_embedding"),
        round(avg(col("norm")), 4).as("avg_norm"))
      .orderBy(asc_nulls_first("lang"))
  }

  val q81Oracle: String =
    """SELECT d.lang, COUNT(*) AS n_docs,
      |  COUNT(e.vec_id) AS n_with_embedding,
      |  ROUND(AVG(SQRT(list_sum(list_transform(e.embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm
      |FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
      |GROUP BY d.lang
      |ORDER BY lang NULLS FIRST""".stripMargin

  /** Q97 — mixture UP-sampling planner + deterministic materialization
    * (the complement of Q72's downsample-only mixing): given externally
    * supplied per-source target weights and a token budget of 2× the
    * corpus, compute each source's repeat factor (capped at 4 epochs —
    * the "don't repeat data too often" rule), then materialize the plan
    * deterministically: every doc gets floor(repeat) full epochs, and the
    * fractional tail epoch is granted by md5-bucket — same doc, same
    * verdict, on any executor. Emits planned vs achieved mixture.
    *
    * Scale: the plan is a #sources-row aggregate (broadcast); the
    * materialization is a stateless per-row expression — the up-sampled
    * corpus is never collected, and the emitted (doc, epoch) multiplicity
    * is `explode(sequence(1, epochs))` downstream, still shuffle-free.
    */
  def q97(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val docs = c.documents
      .withColumn("nt",
        expr("size(filter(split(text, ' '), t -> t <> ''))").cast("long"))
      .withColumn("w", expr(
        """CASE WHEN source IN ('src0','src1','src2','src3') THEN 3.0
          |     WHEN source IN ('src4','src5','src6','src7') THEN 2.0
          |     ELSE 1.0 END""".stripMargin).cast("double"))
      .withColumn("h", md5(col("text")))
      .withColumn("bucket", expr(NearDup.hexValueFastExpr("h")) % 10000)
    // the small aggregates below are each referenced twice — checkpoint
    // them (source-count-sized rows) so their corpus-scanning lineage
    // executes once; the corpus itself is deliberately NOT checkpointed
    // (two pushdown map passes beat materializing 100 TB)
    val perSrc = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("nt")).as("n_tokens"),
      max(col("w")).as("w"))
      .localCheckpoint()
    val totals = perSrc.agg(
      sum(col("w")).as("tot_w"), sum(col("n_tokens")).as("tot_toks"))
    val rates = perSrc.crossJoin(broadcast(totals))
      .withColumn("target_frac", col("w") / col("tot_w"))
      .withColumn("rpt", least(
        lit(2.0) * col("tot_toks") * col("target_frac") / col("n_tokens"),
        lit(4.0)))
      .withColumn("full_epochs", floor(col("rpt")))
      .withColumn("tail_rate", col("rpt") - col("full_epochs"))
      .localCheckpoint()
    val emitted = docs
      .join(broadcast(rates.select(
        col("source"), col("full_epochs"), col("tail_rate"))), Seq("source"))
      .withColumn("epochs", col("full_epochs") +
        when(col("bucket") < col("tail_rate") * 10000, 1L).otherwise(0L))
      .groupBy(col("source"))
      .agg(
        sum(col("epochs")).as("emitted_docs"),
        sum(col("nt") * col("epochs")).as("emitted_tokens"))
      .localCheckpoint()
    val totEmitted = emitted.agg(sum(col("emitted_tokens")).as("tot_emitted"))
    rates
      .join(emitted, Seq("source"))
      .crossJoin(broadcast(totEmitted))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        round(col("target_frac"), 4).as("target_frac"),
        round(col("rpt"), 4).as("repeat_factor"),
        col("emitted_docs"),
        round(col("emitted_tokens").cast("double") / col("tot_emitted"), 4)
          .as("achieved_frac"))
      .orderBy(asc_nulls_first("source"))
  }

  val q97Oracle: String = {
    val hv = NearDup.hexValueExpr("h")
    s"""WITH docs AS (
      |  SELECT source,
      |    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS nt,
      |    CASE WHEN source IN ('src0','src1','src2','src3') THEN 3.0
      |         WHEN source IN ('src4','src5','src6','src7') THEN 2.0
      |         ELSE 1.0 END AS w,
      |    md5(text) AS h
      |  FROM documents),
      |bucketed AS (SELECT source, nt, w, ($hv) % 10000 AS bucket FROM docs),
      |per_src AS (
      |  SELECT source, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens,
      |    MAX(w) AS w
      |  FROM bucketed GROUP BY source),
      |totals AS (
      |  SELECT SUM(w) AS tot_w, CAST(SUM(n_tokens) AS BIGINT) AS tot_toks
      |  FROM per_src),
      |rates AS (
      |  SELECT p.source, p.n_docs, p.n_tokens,
      |    p.w / t.tot_w AS target_frac,
      |    LEAST(2.0 * t.tot_toks * (p.w / t.tot_w) / p.n_tokens, 4.0) AS rpt
      |  FROM per_src p, totals t),
      |rates2 AS (
      |  SELECT *, FLOOR(rpt) AS full_epochs, rpt - FLOOR(rpt) AS tail_rate
      |  FROM rates),
      |emitted AS (
      |  SELECT b.source,
      |    CAST(SUM(r.full_epochs +
      |      CASE WHEN b.bucket < r.tail_rate * 10000 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS emitted_docs,
      |    CAST(SUM(b.nt * (r.full_epochs +
      |      CASE WHEN b.bucket < r.tail_rate * 10000 THEN 1 ELSE 0 END)) AS BIGINT)
      |      AS emitted_tokens
      |  FROM bucketed b JOIN rates2 r ON b.source = r.source
      |  GROUP BY b.source),
      |tot_e AS (SELECT CAST(SUM(emitted_tokens) AS BIGINT) AS tot_emitted FROM emitted)
      |SELECT r.source, r.n_docs, r.n_tokens,
      |  ROUND(r.target_frac, 4) AS target_frac,
      |  ROUND(r.rpt, 4) AS repeat_factor,
      |  e.emitted_docs,
      |  ROUND(CAST(e.emitted_tokens AS DOUBLE) / t.tot_emitted, 4) AS achieved_frac
      |FROM rates2 r JOIN emitted e ON r.source = e.source, tot_e t
      |ORDER BY r.source NULLS FIRST""".stripMargin
  }

  /** Q98 — end-to-end curation funnel: the pipeline's ops COMPOSED into
    * one deterministic DAG — (1) composite-quality gate (Q45's score),
    * (2) exact dedup by content hash, (3) benchmark decontamination
    * (Q70's 5-gram rule), (4) hash-gated domain rebalance to the smallest
    * surviving language (Q72's rule) — emitting the per-stage funnel
    * report (docs in → docs out) a curation run publishes.
    *
    * Scale: stages 1–2 are map work + one content-hash shuffle; stage 3 is
    * a broadcast semi-join (eval shingles are eval-suite-sized); stage 4 is
    * a stateless hash gate with #languages broadcast rates. The funnel
    * counts are four scalar aggregates; at production scale each stage's
    * survivor set persists once instead of re-deriving (noted, not needed
    * at gate scale).
    */
  def q98(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    // every stage is counted twice (as its own output and the next
    // stage's input) — checkpoint each so the funnel chain executes once
    val train = scored(c).filter(col("source") =!= "src0")
      .withColumn("h", md5(col("text")))
      .withColumn("bucket", expr(NearDup.hexValueFastExpr("h")) % 10000)
      .localCheckpoint()
    val s1 = train.filter(col("quality") >= 0.7).localCheckpoint()
    val s2 = s1
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("h")).orderBy(asc("doc_id"))))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint()
    val evalSh = shingles5(c.documents.filter(col("source") === "src0"))
      .select(col("sh")).distinct()
    val flagged = shingles5(s2)
      .join(broadcast(evalSh), Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    // flagged is data-dependent — no broadcast hint; AQE decides (Q70 rule).
    val s3 = s2.join(flagged, Seq("doc_id"), "left_anti").localCheckpoint()
    val langCounts = s3.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val minN = langCounts.agg(min(col("n")).as("min_n"))
    val gateRates = langCounts.crossJoin(broadcast(minN))
      .select(col("lang"), (col("min_n").cast("double") / col("n")).as("rate"))
    val s4 = s3.join(broadcast(gateRates), Seq("lang"))
      .filter(col("bucket") < col("rate") * 10000)
    def cnt(df: DataFrame) = df.agg(count(lit(1)).as("n"))
    def stage(name: String, in: DataFrame, out: DataFrame): DataFrame =
      cnt(in).select(lit(name).as("stage"), col("n").as("docs_in"))
        .crossJoin(cnt(out).select(col("n").as("docs_out")))
    stage("1_quality", train, s1)
      .union(stage("2_dedup", s1, s2))
      .union(stage("3_decontam", s2, s3))
      .union(stage("4_mix", s3, s4))
      .orderBy(asc_nulls_first("stage"))
  }

  val q98Oracle: String = {
    val hv = NearDup.hexValueExpr("h")
    s"""WITH base AS (
      |  SELECT doc_id, lang, source, text,
      |    LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0) * 0.5 +
      |    (1.0 - CAST(len(list_filter(string_split(text, ' '),
      |                     t -> t IN ('the', 'a', 'value'))) AS DOUBLE)
      |           / len(string_split(text, ' '))) * 0.3 +
      |    LEAST((CAST(n_chars - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |           / len(string_split(text, ' '))) / 10.0, 1.0) * 0.2 AS quality,
      |    md5(text) AS h
      |  FROM documents),
      |train AS (
      |  SELECT *, ($hv) % 10000 AS bucket FROM base WHERE source <> 'src0'),
      |s1 AS (SELECT * FROM train WHERE quality >= 0.7),
      |s2 AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      |    FROM s1) WHERE rn = 1),
      |sh AS (
      |  SELECT doc_id, source, UNNEST(list_transform(
      |    range(len(string_split(text, ' ')) - 4),
      |    i -> string_split(text, ' ')[i + 1] || ' ' ||
      |         string_split(text, ' ')[i + 2] || ' ' ||
      |         string_split(text, ' ')[i + 3] || ' ' ||
      |         string_split(text, ' ')[i + 4] || ' ' ||
      |         string_split(text, ' ')[i + 5])) AS s
      |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
      |eval_sh AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
      |s2sh AS (
      |  SELECT doc_id, UNNEST(list_transform(
      |    range(len(string_split(text, ' ')) - 4),
      |    i -> string_split(text, ' ')[i + 1] || ' ' ||
      |         string_split(text, ' ')[i + 2] || ' ' ||
      |         string_split(text, ' ')[i + 3] || ' ' ||
      |         string_split(text, ' ')[i + 4] || ' ' ||
      |         string_split(text, ' ')[i + 5])) AS s
      |  FROM s2 WHERE len(string_split(text, ' ')) >= 5),
      |flagged AS (
      |  SELECT DISTINCT doc_id FROM s2sh WHERE s IN (SELECT s FROM eval_sh)),
      |s3 AS (
      |  SELECT * FROM s2
      |  WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
      |lc AS (SELECT lang, COUNT(*) AS n FROM s3 GROUP BY lang),
      |rates AS (
      |  SELECT lang, CAST((SELECT MIN(n) FROM lc) AS DOUBLE) / n AS rate
      |  FROM lc),
      |s4 AS (
      |  SELECT s3.* FROM s3 JOIN rates r ON s3.lang = r.lang
      |  WHERE bucket < rate * 10000)
      |SELECT * FROM (
      |  SELECT '1_quality' AS stage,
      |    (SELECT COUNT(*) FROM train) AS docs_in,
      |    (SELECT COUNT(*) FROM s1) AS docs_out
      |  UNION ALL SELECT '2_dedup',
      |    (SELECT COUNT(*) FROM s1), (SELECT COUNT(*) FROM s2)
      |  UNION ALL SELECT '3_decontam',
      |    (SELECT COUNT(*) FROM s2), (SELECT COUNT(*) FROM s3)
      |  UNION ALL SELECT '4_mix',
      |    (SELECT COUNT(*) FROM s3), (SELECT COUNT(*) FROM s4))
      |ORDER BY stage NULLS FIRST""".stripMargin
  }

  /** Q101 — weighted sampling without replacement per group (sequential
    * Poisson / PPS sampling — Ohlsson, "Sequential Poisson Sampling",
    * J. Official Statistics 14(2), 1998): per language, draw 5 documents
    * with inclusion probability proportional to length (n_chars) by
    * ranking on priority u/w, where u is an md5-derived uniform and w the
    * weight, and keeping the k smallest. The sampling primitive behind
    * "sample the mixture proportionally to token mass" — deterministic,
    * reproducible, executor-order-independent.
    *
    * Determinism discipline: priority = u/w uses ONLY integer-derived
    * doubles and one IEEE division (correctly rounded in every engine) —
    * no pow/log, whose last-ulp engine differences could flip a rank.
    *
    * Scale: one per-row hash + one k-bounded window per group (shuffle on
    * lang, partition-local top-k) — the same plan class as grouped top-k;
    * no per-group state beyond the heap, no RNG coordination.
    */
  /** API form of the Q101 sampler: per `groupCol`, the `k` rows with the
    * smallest sequential-Poisson priority u/w, where u is the md5-derived
    * uniform of (salt, idCol) and w = `weightCol`. Appends (u, priority,
    * rk). Model-pinned in OperatorPropertiesSpec.
    */
  def ppsSamplePerGroup(
      df: DataFrame, groupCol: String, idCol: String, weightCol: String,
      k: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(asc("priority"), asc(idCol))
    df
      .withColumn("h", md5(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("u", expr(NearDup.hexValueFastExpr("h")) / 4294967296.0)
      .withColumn("priority", col("u") / col(weightCol))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("h")
  }

  def q101(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    ppsSamplePerGroup(c.documents, "lang", "doc_id", "n_chars", 5, "q101:")
      .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"),
        round(col("priority") * 1e6, 4).as("prio_ppm"))
      .orderBy(asc_nulls_first("lang"), asc_nulls_first("rk"))
  }

  val q101Oracle: String = {
    val hv = NearDup.hexValueExpr("h")
    s"""WITH hashed AS (
      |  SELECT lang, doc_id, n_chars,
      |    md5('q101:' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |prio AS (
      |  SELECT lang, doc_id, n_chars,
      |    (($hv) / 4294967296.0) / n_chars AS priority
      |  FROM hashed),
      |ranked AS (
      |  SELECT lang, doc_id, n_chars, priority,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY priority, doc_id) AS rk
      |  FROM prio)
      |SELECT lang, rk, doc_id, n_chars,
      |  ROUND(priority * 1e6, 4) AS prio_ppm
      |FROM ranked
      |WHERE rk <= 5
      |ORDER BY lang NULLS FIRST, rk NULLS FIRST""".stripMargin
  }

  /** Q113 — vocabulary build + token-ID encoding: the text→ids step of a
    * training-data pipeline. Token ids are frequency ranks (count desc,
    * token asc — a total order, so ids are deterministic); documents are
    * re-emitted as (doc_id, pos, token_id) rows, the exploded form of the
    * id sequence (exploded because the gate hashes rows, and because the
    * row form is what sequence packing consumes).
    *
    * Scale notes: the vocabulary is one token-keyed aggregate whose
    * result is vocabulary-sized (bounded, ~10^7 types at web scale — the
    * id-assignment window runs on THAT, never on the corpus) and then
    * broadcasts into the encode join; encoding itself is the linear
    * explode + broadcast-join + map. Same broadcast-the-statistic shape
    * as Q69's LM scoring.
    */
  def q113(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val tok = tokens(c)
    val vocab = tok.groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .withColumn("token_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(desc("tf"), asc("token"))))
      .select(col("token"), col("token_id"))
    c.documents.filter(col("doc_id") <= 5)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .filter(col("pos") < 10)
      .join(broadcast(vocab), Seq("token"))
      .select(col("doc_id"), col("pos").cast("bigint").as("pos"), col("token_id"))
      .orderBy(asc_nulls_first("doc_id"), asc_nulls_first("pos"))
  }

  val q113Oracle: String =
    """WITH tok AS (
      |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
      |  FROM documents),
      |vocab AS (
      |  SELECT token,
      |    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS token_id
      |  FROM tok GROUP BY token),
      |seq AS (
      |  SELECT doc_id,
      |    generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
      |    UNNEST(string_split(text, ' ')) AS token
      |  FROM documents WHERE doc_id <= 5)
      |SELECT s.doc_id, CAST(s.pos AS BIGINT) AS pos, v.token_id
      |FROM seq s JOIN vocab v ON v.token = s.token
      |WHERE s.pos < 10
      |ORDER BY doc_id NULLS FIRST, pos NULLS FIRST""".stripMargin

  /** Q202 — stratified eval-set allocation by largest remainder
    * (Hamilton's apportionment): split a fixed 1000-document evaluation
    * budget across sources proportional to their doc counts, EXACTLY —
    * base quota ⌊1000·n_s/N⌋ per source, then the 1000 − Σbase leftover
    * seats go to the largest remainders (1000·n_s mod N, source-name
    * tiebreak). The construction step before any balanced eval/val split;
    * Q101's per-group sampler consumes the resulting counts.
    *
    * Determinism: every quota, remainder, rank, and seat is exact int64
    * arithmetic (1000·n_s fits trivially); the only doubles are the two
    * reporting shares, single divides rounded at 6. The apportionment
    * identity Σalloc = 1000 is spec-pinned in Round9GatesSpec.
    *
    * Scale notes: one corpus aggregate to a sources-bounded relation;
    * the quota window runs on that bounded relation. At 100 TB the only
    * corpus-sized work is the groupBy count.
    */
  def q202(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val k = 1000L
    val counts = c.documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val wRem = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy(desc("rem"), asc("source"))
    counts
      .withColumn("n_total", sum(col("n_docs")).over(wAll))
      .withColumn("alloc_base", expr(s"($k * n_docs) DIV n_total"))
      .withColumn("rem", (lit(k) * col("n_docs")) % col("n_total"))
      .withColumn("leftover", lit(k) - sum(col("alloc_base")).over(wAll))
      .withColumn("rk", row_number().over(wRem))
      .withColumn("alloc",
        col("alloc_base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .select(col("source"), col("n_docs"), col("alloc_base"), col("alloc"),
        round(col("alloc").cast("double") / lit(1000.0), 6).as("budget_share"),
        round(col("alloc").cast("double") / col("n_docs").cast("double"), 6)
          .as("sample_rate"))
      .orderBy(asc_nulls_first("source"))
  }

  val q202Oracle: String =
    """WITH counts AS (
      |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
      |quota AS (
      |  SELECT source, n_docs,
      |    SUM(n_docs) OVER () AS n_total,
      |    (1000 * n_docs) // SUM(n_docs) OVER () AS alloc_base,
      |    (1000 * n_docs) % SUM(n_docs) OVER () AS rem
      |  FROM counts),
      |seats AS (
      |  SELECT *,
      |    1000 - SUM(alloc_base) OVER () AS leftover,
      |    ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
      |  FROM quota)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(alloc_base AS BIGINT) AS alloc_base,
      |  CAST(alloc_base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
      |    AS BIGINT) AS alloc,
      |  ROUND(CAST(alloc_base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
      |    AS DOUBLE) / 1000.0, 6) AS budget_share,
      |  ROUND(CAST(alloc_base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
      |    AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS sample_rate
      |FROM seats
      |ORDER BY source NULLS FIRST""".stripMargin

  /** Q205 — cross-validation fold balance audit: documents split into 5
    * folds by md5 of the doc id (the reproducible fold assignment every
    * training pipeline needs), then the fold × language contingency is
    * checked against independence — observed count, expected count
    * row·col/N, and the χ² contribution per cell. A skewed cell flags a
    * fold that would bias per-language validation metrics.
    *
    * Determinism: counts and margins are exact int64; expected and the
    * χ² term are the same two-three IEEE ops on identical inputs (margins
    * cast to double BEFORE the product — at warehouse scale row·col
    * overflows int64, the Q127 cast-before-multiply rule), rounded 4/6.
    *
    * Scale notes: one corpus pass to the folds×langs-bounded cell
    * relation; margins are windows over that bounded relation.
    */
  def q205(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val cells = c.documents
      .withColumn("fold",
        expr(NearDup.hexValueFastExpr("md5(concat('cv:', CAST(doc_id AS STRING)))")) % 5)
      .groupBy(col("fold"), col("lang")).agg(count(lit(1)).as("n"))
    val wF = org.apache.spark.sql.expressions.Window.partitionBy(col("fold"))
    val wL = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    cells
      .withColumn("row_n", sum(col("n")).over(wF))
      .withColumn("col_n", sum(col("n")).over(wL))
      .withColumn("n_total", sum(col("n")).over(wAll))
      .withColumn("expected",
        col("row_n").cast("double") * col("col_n").cast("double") /
          col("n_total").cast("double"))
      .select(col("fold"), col("lang"), col("n"),
        round(col("expected"), 4).as("expected"),
        round((col("n").cast("double") - col("expected")) *
          (col("n").cast("double") - col("expected")) / col("expected"), 6)
          .as("chi2_term"))
      .orderBy(asc_nulls_first("fold"), asc_nulls_first("lang"))
  }

  val q205Oracle: String = {
    val fold = NearDup.hexValueExpr("md5('cv:' || CAST(doc_id AS VARCHAR))")
    s"""WITH cells AS (
       |  SELECT ($fold) % 5 AS fold, lang, COUNT(*) AS n
       |  FROM documents GROUP BY 1, 2),
       |m AS (
       |  SELECT fold, lang, n,
       |    SUM(n) OVER (PARTITION BY fold) AS row_n,
       |    SUM(n) OVER (PARTITION BY lang) AS col_n,
       |    SUM(n) OVER () AS n_total
       |  FROM cells),
       |e AS (
       |  SELECT fold, lang, n,
       |    CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
       |      / CAST(n_total AS DOUBLE) AS expected
       |  FROM m)
       |SELECT fold, lang, CAST(n AS BIGINT) AS n,
       |  ROUND(expected, 4) AS expected,
       |  ROUND((CAST(n AS DOUBLE) - expected) * (CAST(n AS DOUBLE) - expected)
       |    / expected, 6) AS chi2_term
       |FROM e
       |ORDER BY fold NULLS FIRST, lang NULLS FIRST""".stripMargin
  }

  /** Q208 — temporal train/test leakage audit: split `events` at the
    * 80% point of its day span (train = days before the cutoff, test =
    * the rest) and report, per event type, the three leakage channels a
    * time-split modeling pipeline must check before training:
    * entity leakage (test users whose history also appears in train —
    * `overlap_users` / `user_leak_share`), record leakage (exact
    * (user, value-cents) payloads present on BOTH sides —
    * `leaked_keys`), and boundary crowding (test mass inside the first
    * day after the cutoff, where label windows straddle the split —
    * `boundary_share`).
    *
    * Determinism: the cutoff is integer day arithmetic on the data's
    * own span (dmin + ((span+1)*4) DIV 5 with span = dmax-dmin, all
    * int64); every measure is an exact count over exact keys; the two
    * shares are final ROUND-6s.
    *
    * Scale notes: one pass computes the global day extent (scalar
    * broadcast); per-type counts are one hash aggregate; user overlap
    * and duplicate keys aggregate DISTINCT (type, user) / (type, user,
    * cents) tuples — bounded by distinct entities, never event rows,
    * and shuffled once on the composite key. No window functions, no
    * self-join of the raw stream.
    */
  def q208(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val ev = c.events.select(
      col("event_type"), col("user_id"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("cents"))
    val ext = ev.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .select(expr("dmin + ((dmax - dmin + 1) * 4) DIV 5").as("cutoff"))
    val tagged = ev.crossJoin(broadcast(ext))
      .withColumn("split", when(col("day") < col("cutoff"), "train")
        .otherwise("test"))
    val counts = tagged.groupBy(col("event_type")).agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).cast("long")
        .as("n_train"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).cast("long")
        .as("n_test"),
      sum(when(col("split") === "test" && col("day") < col("cutoff") + 1L,
        1L).otherwise(0L)).cast("long").as("n_boundary"))
    val users = tagged.groupBy(col("event_type"), col("user_id")).agg(
      max(when(col("split") === "train", 1L).otherwise(0L)).as("in_tr"),
      max(when(col("split") === "test", 1L).otherwise(0L)).as("in_te"))
      .groupBy(col("event_type")).agg(
        sum(col("in_te")).cast("long").as("test_users"),
        sum(col("in_tr") * col("in_te")).cast("long").as("overlap_users"))
    val dups = tagged.groupBy(col("event_type"), col("user_id"), col("cents"))
      .agg(max(when(col("split") === "train", 1L).otherwise(0L)).as("in_tr"),
        max(when(col("split") === "test", 1L).otherwise(0L)).as("in_te"))
      .groupBy(col("event_type"))
      .agg(sum(col("in_tr") * col("in_te")).cast("long").as("leaked_keys"))
    counts.join(users, Seq("event_type")).join(dups, Seq("event_type"))
      .select(col("event_type"), col("n_train"), col("n_test"),
        col("test_users"), col("overlap_users"),
        round(col("overlap_users").cast("double") / col("test_users"), 6)
          .as("user_leak_share"),
        col("leaked_keys"),
        round(col("n_boundary").cast("double") / col("n_test"), 6)
          .as("boundary_share"))
      .orderBy(asc_nulls_first("event_type"))
  }

  val q208Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, user_id, epoch_us(ts) // 86400000000 AS day,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |ext AS (
      |  SELECT MIN(day) + CAST(((MAX(day) - MIN(day) + 1) * 4) // 5
      |    AS BIGINT) AS cutoff FROM ev),
      |tagged AS (
      |  SELECT ev.*, CASE WHEN day < cutoff THEN 'train' ELSE 'test' END
      |    AS split, cutoff
      |  FROM ev CROSS JOIN ext),
      |counts AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_train,
      |    CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_test,
      |    CAST(SUM(CASE WHEN split = 'test' AND day < cutoff + 1
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary
      |  FROM tagged GROUP BY 1),
      |users AS (
      |  SELECT event_type,
      |    CAST(SUM(in_te) AS BIGINT) AS test_users,
      |    CAST(SUM(in_tr * in_te) AS BIGINT) AS overlap_users
      |  FROM (
      |    SELECT event_type, user_id,
      |      MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_tr,
      |      MAX(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_te
      |    FROM tagged GROUP BY 1, 2)
      |  GROUP BY 1),
      |dups AS (
      |  SELECT event_type, CAST(SUM(in_tr * in_te) AS BIGINT) AS leaked_keys
      |  FROM (
      |    SELECT event_type, user_id, cents,
      |      MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_tr,
      |      MAX(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_te
      |    FROM tagged GROUP BY 1, 2, 3)
      |  GROUP BY 1)
      |SELECT c.event_type, n_train, n_test, test_users, overlap_users,
      |  ROUND(CAST(overlap_users AS DOUBLE) / test_users, 6)
      |    AS user_leak_share,
      |  leaked_keys,
      |  ROUND(CAST(n_boundary AS DOUBLE) / n_test, 6) AS boundary_share
      |FROM counts c
      |JOIN users u ON c.event_type = u.event_type
      |JOIN dups d ON c.event_type = d.event_type
      |ORDER BY c.event_type NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q69" -> (q69 _), "Q70" -> (q70 _), "Q71" -> (q71 _),
    "Q72" -> (q72 _), "Q73" -> (q73 _), "Q74" -> (q74 _),
    "Q76" -> (q76 _), "Q77" -> (q77 _), "Q80" -> (q80 _),
    "Q81" -> (q81 _), "Q97" -> (q97 _), "Q98" -> (q98 _),
    "Q101" -> (q101 _), "Q113" -> (q113 _), "Q202" -> (q202 _),
    "Q205" -> (q205 _), "Q208" -> (q208 _))

  def oracles: Map[String, String] = Map(
    "Q69" -> q69Oracle, "Q70" -> q70Oracle, "Q71" -> q71Oracle,
    "Q72" -> q72Oracle, "Q73" -> q73Oracle, "Q74" -> q74Oracle,
    "Q76" -> q76Oracle, "Q77" -> q77Oracle, "Q80" -> q80Oracle,
    "Q81" -> q81Oracle, "Q97" -> q97Oracle, "Q98" -> q98Oracle,
    "Q101" -> q101Oracle, "Q113" -> q113Oracle,
    "Q202" -> q202Oracle, "Q205" -> q205Oracle, "Q208" -> q208Oracle)
}
