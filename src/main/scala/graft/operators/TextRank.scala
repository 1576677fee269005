package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Catalog

/** Classical IR ranking and collocation mining over the documents table —
  * the retrieval layer next to the Q37 doc-term matrix and the Q44-47
  * text-analysis family.
  *
  * Tokenization is the Q37 contract: literal single-space split, exactly
  * `string_split(text, ' ')` in DuckDB — both engines see byte-identical
  * token streams.
  *
  * Scale notes: both gates collapse the corpus to bounded aggregate
  * domains before any join — (doc × query-term) for BM25 (query terms are
  * a constant), (vocab²) for bigram PMI — and all corpus-wide totals ride
  * one broadcast one-row aggregate. The corpus is scanned once per gate
  * and never self-joined at document granularity.
  */
object TextRank {

  private val K1 = 1.2
  private val B  = 0.75

  /** The fixed benchmark query — three mid-frequency vocabulary terms. */
  private val QueryTerms = Seq("spark", "join", "window")

  /** Q141 — Okapi BM25 ranking (Robertson & Spärck Jones lineage;
    * Robertson et al., TREC-3 1994) of all documents against a fixed
    * 3-term query: score(d) = Σ_t idf(t)·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    * with idf(t) = ln(1 + (N−df+0.5)/(df+0.5)), k1=1.2, b=0.75. tf, dl,
    * df, N are exact int64 in both engines; the per-term score is a fixed
    * textually-duplicated float expression, summed over ≤3 terms and
    * rounded to 6 before the ORDER BY, so the top-20 cut and its
    * tie-break (doc_id) are decided on identical rounded keys.
    *
    * Scale notes: one corpus scan produces (doc, term, tf, dl) only for
    * the ≤|Q| query terms (the explode filters immediately — predicate
    * inside the scan projection); df and the corpus totals are two
    * bounded aggregates broadcast back. No shuffle is wider than
    * docs-containing-a-query-term.
    */
  def q141(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val docs = c.documents
      .select(col("doc_id"), split(col("text"), " ").as("p"))
      .select(col("doc_id"), col("p"), size(col("p")).cast("long").as("dl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("p")).as("token"))
      .filter(col("token").isin(QueryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val totals = docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    val dfreq = tf.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
    tf.join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") /
            (col("sdl").cast("double") / col("n"))))).as("s"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("s")), 6).as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(20)
  }

  val q141Oracle: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS p,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, dl, token, COUNT(*) AS tf
      |  FROM (SELECT doc_id, dl, UNNEST(p) AS token FROM docs)
      |  WHERE token IN ('spark', 'join', 'window')
      |  GROUP BY 1, 2, 3),
      |totals AS (SELECT COUNT(*) AS n, SUM(dl) AS sdl FROM docs),
      |dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1)
      |SELECT doc_id,
      |  ROUND(SUM(
      |    LN(1.0 + (t.n - d.df + 0.5) / (d.df + 0.5))
      |      * (f.tf * (1.2 + 1))
      |      / (f.tf + 1.2 * (1 - 0.75 + 0.75 * f.dl
      |           / (CAST(t.sdl AS DOUBLE) / t.n)))), 6) AS bm25
      |FROM tf f JOIN dfreq d ON d.token = f.token, totals t
      |GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id
      |LIMIT 20""".stripMargin

  /** Q142 — pointwise-mutual-information bigram collocations (Church &
    * Hanks 1990) over consecutive token pairs:
    * pmi(x,y) = ln(c_xy·Nu² / (Nb·c_x·c_y)) for bigrams seen ≥10 times.
    * The log argument is ONE exact int64 rational (all five factors are
    * counts), so both engines call ln on the identical value and the
    * 6-dp round absorbs any last-ulp libm difference.
    *
    * Scale notes: bigrams form in-row (an array transform over the
    * already-split token list — no per-document window shuffle, no
    * positional self-join); the only shuffles are the vocab-bounded
    * unigram and bigram count aggregates, map-side combined. The int64
    * product c_xy·Nu² caps around 10¹⁸ for ~10⁹-token corpora — past
    * that the same plan carries DECIMAL(38,0) (the Q139 discipline).
    */
  def q142(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val toks = c.documents
      .select(split(col("text"), " ").as("p"))
      .localCheckpoint()
    val uni = toks.select(explode(col("p")).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("cx"))
    val nu = toks.select(explode(col("p")).as("x"))
      .agg(count(lit(1)).as("nu"))
    val big = toks
      .select(explode(expr(
        "transform(sequence(0, size(p) - 2), i -> struct(p[i] AS x, p[i+1] AS y))"))
        .as("g"))
      .select(col("g.x").as("x"), col("g.y").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= 10)
    val nb = toks.select((size(col("p")) - 1).cast("long").as("m"))
      .agg(sum(col("m")).as("nb"))
    big
      .join(broadcast(uni), Seq("x"))
      .join(broadcast(uni.select(col("x").as("y"), col("cx").as("cy"))),
        Seq("y"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("x"), col("y"), col("cxy"),
        round(log((col("cxy") * col("nu") * col("nu")).cast("double") /
          (col("nb") * col("cx") * col("cy")).cast("double")), 6).as("pmi"))
      .orderBy(desc("pmi"), asc_nulls_first("x"), asc_nulls_first("y"))
      .limit(30)
  }

  val q142Oracle: String =
    """WITH toks AS (SELECT string_split(text, ' ') AS p FROM documents),
      |uni AS (
      |  SELECT x, COUNT(*) AS cx
      |  FROM (SELECT UNNEST(p) AS x FROM toks) GROUP BY 1),
      |nu AS (SELECT SUM(cx) AS nu FROM uni),
      |pos AS (
      |  SELECT p, UNNEST(generate_series(1, len(p) - 1)) AS i FROM toks),
      |big AS (
      |  SELECT p[i] AS x, p[i+1] AS y, COUNT(*) AS cxy
      |  FROM pos
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) >= 10),
      |nb AS (SELECT SUM(len(p) - 1) AS nb FROM toks)
      |SELECT b.x AS x, b.y AS y, b.cxy AS cxy,
      |  ROUND(LN(CAST(b.cxy * nu.nu * nu.nu AS DOUBLE)
      |           / CAST(nb.nb * ux.cx * uy.cx AS DOUBLE)), 6) AS pmi
      |FROM big b
      |JOIN uni ux ON ux.x = b.x
      |JOIN uni uy ON uy.x = b.y, nu, nb
      |ORDER BY pmi DESC, b.x NULLS FIRST, b.y NULLS FIRST
      |LIMIT 30""".stripMargin

  /** Q148 — inverted-index build (the retrieval-side twin of Q37's
    * forward doc-term matrix): per token, document frequency over the
    * whole corpus plus the head of its posting list (the 20 smallest
    * doc ids, sorted). Postings are CAPPED BEFORE COLLECTION by a
    * per-token row_number window — a bare collect_list would
    * materialize an unbounded array for a stopword-grade token, the
    * classic 100 TB aggregation-state blowup; here per-group state is
    * ≤ 20 ids no matter how common the token is, while df still counts
    * every document from the uncapped aggregate. The posting head is
    * emitted as a canonical comma-joined string (numeric sort first, then
    * stringify) — same information, but hashable by any downstream
    * row-compare that can't order raw array cells.
    */
  def q148(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val td = c.documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
      .localCheckpoint() // feeds df and the capped postings
    val dfreq = td.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(asc("doc_id"))
    val postings = td
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .groupBy(col("token"))
      .agg(array_join(
        transform(sort_array(collect_list(col("doc_id"))), _.cast("string")),
        ",").as("postings"))
    dfreq.join(postings, Seq("token"))
      .select(col("token"), col("df"), col("postings"))
      .orderBy(desc("df"), asc_nulls_first("token"))
  }

  val q148Oracle: String =
    """WITH td AS (
      |  SELECT DISTINCT doc_id, token FROM (
      |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
      |    FROM documents)),
      |dfreq AS (SELECT token, COUNT(*) AS df FROM td GROUP BY 1),
      |capped AS (
      |  SELECT token, doc_id FROM (
      |    SELECT token, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn
      |    FROM td) WHERE rn <= 20),
      |postings AS (
      |  SELECT token,
      |    array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
      |  FROM capped GROUP BY 1)
      |SELECT d.token AS token, d.df AS df, p.postings AS postings
      |FROM dfreq d JOIN postings p ON p.token = d.token
      |ORDER BY df DESC, token NULLS FIRST""".stripMargin

  /** Q201 — TextRank keyword extraction (Mihalcea & Tarau 2004), the
    * module's namesake: a weighted PageRank over the token co-occurrence
    * graph (adjacent-token pairs, direction dropped, multiplicity as
    * edge weight, support-pruned at ≥ 3 co-occurrences), 3 synchronous
    * damped iterations from 1.0 — keywords are the tokens the graph's
    * random surfer concentrates on, the graph-structural complement of
    * Q52's frequency-ratio TF-IDF. Emits the top-20 tokens with weighted
    * degree and score.
    *
    * Determinism: edge weights and weighted degrees are exact int64;
    * each iteration is Q106's discipline — SUM(pr·w/wdeg) per node, one
    * damped update, doubles whose accumulation-order jitter (~1e-12
    * relative) sits far inside the round-4 output grid; the top-20 cut
    * orders by the ROUNDED score with token tiebreak so the cut cannot
    * flip. Oracle = the identical 3 rounds unrolled (Q106 form).
    *
    * Scale notes: pair counting is one map-side-combined shuffle of the
    * adjacent-token relation (vocab²-bounded, Zipf-concentrated); each
    * iteration is one co-keyed join+groupBy on the pruned edge relation,
    * localCheckpoint'd once — 3 bounded rounds, never corpus-quadratic.
    * Stopword hubs are degree-bounded by the support prune; a per-node
    * degree cap (Q103's defense) is the guard if a real corpus needs it.
    */
  def q201(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val tok = c.documents
      .select(col("doc_id"),
        posexplode(expr("filter(split(text, ' '), t -> t <> '')"))
          .as(Seq("pos", "w")))
    val wNext = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val adj = tok
      .withColumn("w2", lead(col("w"), 1).over(wNext))
      .filter(col("w2").isNotNull && col("w") =!= col("w2"))
      .select(least(col("w"), col("w2")).as("a"),
        greatest(col("w"), col("w2")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("wt"))
      .filter(col("wt") >= 3L)
    val de = adj.select(col("a").as("src"), col("b").as("dst"), col("wt"))
      .union(adj.select(col("b").as("src"), col("a").as("dst"), col("wt")))
      .localCheckpoint()
    val wdeg = de.groupBy(col("src")).agg(sum(col("wt")).as("wdeg"))
    val edges = de.join(wdeg, Seq("src")).localCheckpoint()
    var pr = wdeg.select(col("src").as("node"), lit(1.0).as("pr"))
    for (_ <- 1 to 3) {
      pr = edges.join(pr, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg((lit(0.15) + lit(0.85) *
          sum(col("pr") * col("wt").cast("double") / col("wdeg").cast("double")))
          .as("pr"))
        .select(col("dst").as("node"), col("pr"))
    }
    pr.join(wdeg, col("node") === col("src"))
      .select(col("node").as("token"), col("wdeg"),
        round(col("pr"), 4).as("textrank"))
      .orderBy(desc("textrank"), asc_nulls_first("token"))
      .limit(20)
  }

  val q201Oracle: String = {
    def iter(n: Int): String = {
      val prev = s"r${n - 1}"
      s"""r$n AS (
         |  SELECT de.dst AS node,
         |    CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) *
         |      SUM($prev.pr * CAST(de.wt AS DOUBLE) / CAST(deg.wdeg AS DOUBLE))
         |      AS pr
         |  FROM de JOIN $prev ON $prev.node = de.src
         |  JOIN deg ON deg.src = de.src GROUP BY 1)"""
    }
    s"""WITH tok AS (
       |  SELECT doc_id, generate_subscripts(w, 1) AS pos, UNNEST(w) AS w
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(text, ' '), t -> t <> '') AS w
       |        FROM documents)),
       |seq AS (
       |  SELECT doc_id, pos, w,
       |    LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
       |  FROM tok),
       |e AS (
       |  SELECT LEAST(w, w2) AS a, GREATEST(w, w2) AS b, COUNT(*) AS wt
       |  FROM seq WHERE w2 IS NOT NULL AND w <> w2
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
       |de AS (SELECT a AS src, b AS dst, wt FROM e
       |       UNION ALL SELECT b, a, wt FROM e),
       |deg AS (SELECT src, SUM(wt) AS wdeg FROM de GROUP BY 1),
       |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS pr FROM deg),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}
       |SELECT r3.node AS token, CAST(deg.wdeg AS BIGINT) AS wdeg,
       |  ROUND(r3.pr, 4) AS textrank
       |FROM r3 JOIN deg ON deg.src = r3.node
       |ORDER BY textrank DESC, token
       |LIMIT 20""".stripMargin
  }

  /** Q237 — retrieval-quality evaluation of the BM25 ranker itself
    * (Järvelin & Kekäläinen 2002 for nDCG; MRR per the TREC QA track):
    * the "is the ranking any good" gate next to Q141's "produce the
    * ranking". Query set = the 20 rarest terms with df ≥ 5 (the
    * highest-idf, most discriminative end of the vocabulary — frequent
    * enough to rank a top-10, rare enough that length normalization
    * decides), selected deterministically (df asc, term asc). Per
    * query term: rank its posting docs by the single-term BM25 score
    * (Q141's exact expression, rounded to 6 BEFORE ranking, doc_id
    * tie-break), grade relevance as min(tf, 4) (graded gain 2^rel − 1),
    * and score the ranker with nDCG@10 against the ideal rel-desc
    * ordering plus MRR@10 on the first rel ≥ 2 hit. BM25's length
    * normalization makes this non-trivial: a high-tf long doc can rank
    * below a low-tf short one, and nDCG@10 measures exactly that
    * divergence.
    *
    * Determinism: tf/df/dl/N are exact int64; both rankings sort on a
    * ROUNDED score (or int rel) with doc_id tie-break, so both engines
    * cut identical top-10 sets; gains are exact small powers of two and
    * each DCG term is one pinned float shape, summed over ≤ 10 terms and
    * rounded once. idcg > 0 always (df ≥ 5 docs with rel ≥ 1), so no
    * divide guard is needed; queries with no rel ≥ 2 doc in the top 10
    * emit mrr10 = 0 via COALESCE, never NULL.
    *
    * Scale notes: the posting relation is built once, filtered to the
    * ≤ 20 broadcast query terms at the explode (never vocab-wide
    * downstream); rankings are (term)-partitioned windows over
    * df-bounded postings; output rows = query terms. At 100 TB the
    * query set is a constant and every shuffle is bounded by
    * docs-containing-a-query-term — the Q141 topology with an
    * evaluation head.
    */
  def q237(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val docs = c.documents
      .select(col("doc_id"), split(col("text"), " ").as("p"))
      .select(col("doc_id"), col("p"), size(col("p")).cast("long").as("dl"))
    val toks = docs
      .select(col("doc_id"), col("dl"), explode(col("p")).as("token"))
      .filter(col("token") =!= "")
    val totals = docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    val dfreq = toks.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val qterms = dfreq
      .filter(col("df") >= 5L)
      .orderBy(asc("df"), asc("token")).limit(20)
      .select(col("token"), col("df"))
    val tf = toks.join(broadcast(qterms), Seq("token"))
      .groupBy(col("token"), col("df"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf.crossJoin(broadcast(totals))
      .withColumn("bm25", round(
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") /
            (col("sdl").cast("double") / col("n")))), 6))
      .withColumn("rel", least(col("tf"), lit(4L)))
    val wR = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(desc("bm25"), asc("doc_id"))
    val wI = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(desc("rel"), asc("doc_id"))
    scored
      .withColumn("rnk", row_number().over(wR))
      .withColumn("irk", row_number().over(wI))
      .groupBy(col("token"), col("df"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("tf") >= 2L, 1L).otherwise(0L)).as("n_rel2"),
        sum(when(col("rnk") <= 10,
          expr("(POW(2.0, rel) - 1.0) / (LN(CAST(rnk + 1 AS DOUBLE)) / LN(2.0))"))
          .otherwise(lit(0.0))).as("dcg"),
        sum(when(col("irk") <= 10,
          expr("(POW(2.0, rel) - 1.0) / (LN(CAST(irk + 1 AS DOUBLE)) / LN(2.0))"))
          .otherwise(lit(0.0))).as("idcg"),
        min(when(col("rnk") <= 10 && col("rel") >= 2L, col("rnk"))).as("fr"))
      .select(col("token").as("term"), col("df"), col("n_docs"),
        col("n_rel2"),
        round(col("dcg") / col("idcg"), 6).as("ndcg10"),
        round(coalesce(lit(1.0) / col("fr"), lit(0.0)), 6).as("mrr10"))
      .orderBy(asc("term"))
  }

  val q237Oracle: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS p,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      |  FROM documents),
      |tokf AS (
      |  SELECT doc_id, dl, token
      |  FROM (SELECT doc_id, dl, UNNEST(p) AS token FROM docs)
      |  WHERE token <> ''),
      |totals AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sdl
      |  FROM docs),
      |dfreq AS (
      |  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM tokf GROUP BY 1),
      |qterms AS (
      |  SELECT token, df FROM dfreq
      |  WHERE df >= 5
      |  ORDER BY df, token LIMIT 20),
      |tf AS (
      |  SELECT q.token, q.df, t.doc_id, t.dl, COUNT(*) AS tf
      |  FROM tokf t JOIN qterms q ON q.token = t.token
      |  GROUP BY 1, 2, 3, 4),
      |scored AS (
      |  SELECT f.token, f.df, f.doc_id, f.tf,
      |    ROUND(LN(1.0 + (t.n - f.df + 0.5) / (f.df + 0.5))
      |      * (f.tf * (1.2 + 1))
      |      / (f.tf + 1.2 * (1 - 0.75 + 0.75 * f.dl
      |           / (CAST(t.sdl AS DOUBLE) / t.n))), 6) AS bm25,
      |    LEAST(f.tf, 4) AS rel
      |  FROM tf f, totals t),
      |ranked AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY token ORDER BY bm25 DESC, doc_id)
      |      AS rnk,
      |    ROW_NUMBER() OVER (PARTITION BY token ORDER BY rel DESC, doc_id)
      |      AS irk
      |  FROM scored),
      |s AS (
      |  SELECT token, df,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel2,
      |    SUM(CASE WHEN rnk <= 10 THEN (POW(2.0, rel) - 1.0)
      |      / (LN(CAST(rnk + 1 AS DOUBLE)) / LN(2.0)) ELSE 0.0 END) AS dcg,
      |    SUM(CASE WHEN irk <= 10 THEN (POW(2.0, rel) - 1.0)
      |      / (LN(CAST(irk + 1 AS DOUBLE)) / LN(2.0)) ELSE 0.0 END) AS idcg,
      |    MIN(CASE WHEN rnk <= 10 AND rel >= 2 THEN rnk END) AS fr
      |  FROM ranked GROUP BY 1, 2)
      |SELECT token AS term, df, n_docs, n_rel2,
      |  ROUND(dcg / idcg, 6) AS ndcg10,
      |  ROUND(COALESCE(1.0 / fr, 0.0), 6) AS mrr10
      |FROM s
      |ORDER BY term""".stripMargin

  /** Q260 — reciprocal-rank fusion of two INDEPENDENT rankers over the
    * shared query-term set (Cormack, Clarke & Büttcher, SIGIR 2009):
    * Q141's Okapi BM25 and a Dirichlet-smoothed query-likelihood model
    * score_QL = Σ_t ln((tf + μ·cf_t/|C|)/(dl + μ)) with μ = 2000
    * (Zhai & Lafferty 2001) — the two classic lexical rankers that
    * disagree exactly where fusion helps (BM25 saturates tf, QL
    * rewards length-normalized likelihood). Fusion is rank-only:
    * RRF(d) = Σ_r 1/(60 + rank_r(d)) over the same candidate set
    * (docs containing ≥ 1 query term), so no score calibration is
    * needed — the property that made RRF the default fusion in modern
    * hybrid (lexical + vector) retrieval stacks.
    *
    * Determinism: both component scores are fixed double expressions
    * over exact int64 (tf, df, cf, dl, |C|) stats, ROUNDED 6 BEFORE
    * their rank (doc_id tie-break); RRF is a 2-term sum of exact
    * reciprocals of small ints, rounded 6 before the fused rank.
    *
    * Scale notes: candidate generation is the inverted-index filter
    * (tokens ∈ query), never a corpus scan per query; stats relations
    * are term-bounded; the three rankings are global windows over the
    * CANDIDATE set only. TakeOrdered bounds the output at 20.
    */
  def q260(spark: SparkSession, dir: String): DataFrame = {
    val fused = dualRankings(spark, dir)
      .withColumn("rrf_score",
        round(lit(1.0) / (lit(60L) + col("r_bm25")) +
          lit(1.0) / (lit(60L) + col("r_ql")), 6))
      .withColumn("fused_rank", row_number().over(
        Window.orderBy(desc("rrf_score"), asc("doc_id"))).cast("long"))
    fused
      .select(col("fused_rank"), col("doc_id"), col("r_bm25"), col("r_ql"),
        col("bm25"), col("ql"), col("rrf_score"))
      .orderBy(asc("fused_rank"))
      .limit(20)
  }

  /** Shared core of Q260/Q266: both component rankings over the common
    * candidate set — (doc_id, bm25, ql, r_bm25, r_ql) with scores
    * rounded 6 BEFORE their ranks (doc_id tie-break). */
  private def dualRankings(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val docs = c.documents
      .select(col("doc_id"), split(col("text"), " ").as("p"))
      .select(col("doc_id"), col("p"), size(col("p")).cast("long").as("dl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("p")).as("token"))
      .filter(col("token").isin(QueryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val totals = docs.agg(count(lit(1)).cast("long").as("n"),
      sum(col("dl")).cast("long").as("sdl"))
    val stats = tf.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).cast("long").as("df"),
        sum(col("tf")).cast("long").as("cf"))
    val bm25 = tf.join(broadcast(stats), Seq("token"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") /
            (col("sdl").cast("double") / col("n"))))).as("s"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("s")), 6).as("bm25"))
    val cand = tf.select(col("doc_id"), col("dl")).distinct()
    val ql = cand.crossJoin(broadcast(stats))
      .join(tf.select(col("doc_id"), col("token"), col("tf")),
        Seq("doc_id", "token"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        log((coalesce(col("tf"), lit(0L)) +
          lit(2000.0) * col("cf") / col("sdl")) /
          (col("dl") + lit(2000L))).as("s"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("s")), 6).as("ql"))
    bm25.join(ql, Seq("doc_id"))
      .withColumn("r_bm25", row_number().over(
        Window.orderBy(desc("bm25"), asc("doc_id"))).cast("long"))
      .withColumn("r_ql", row_number().over(
        Window.orderBy(desc("ql"), asc("doc_id"))).cast("long"))
  }

  /** Shared DuckDB text of [[dualRankings]] (CTE chain ending in
    * `fused`), composed under WITH by the Q260/Q266 oracles. */
  private val dualRankSql: String =
    """docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS p,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, dl, token, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, dl, UNNEST(p) AS token FROM docs)
      |  WHERE token IN ('spark', 'join', 'window')
      |  GROUP BY 1, 2, 3),
      |totals AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sdl
      |  FROM docs),
      |stats AS (
      |  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
      |    CAST(SUM(tf) AS BIGINT) AS cf
      |  FROM tf GROUP BY 1),
      |bm AS (
      |  SELECT doc_id,
      |    ROUND(SUM(
      |      LN(1.0 + (t.n - d.df + 0.5) / (d.df + 0.5))
      |        * (f.tf * (1.2 + 1))
      |        / (f.tf + 1.2 * (1 - 0.75 + 0.75 * f.dl
      |             / (CAST(t.sdl AS DOUBLE) / t.n)))), 6) AS bm25
      |  FROM tf f JOIN stats d ON d.token = f.token, totals t
      |  GROUP BY doc_id),
      |cand AS (SELECT DISTINCT doc_id, dl FROM tf),
      |ql AS (
      |  SELECT c.doc_id,
      |    ROUND(SUM(LN((COALESCE(f.tf, 0) + 2000.0 * s.cf / t.sdl)
      |      / (c.dl + 2000))), 6) AS ql
      |  FROM cand c
      |  CROSS JOIN stats s
      |  LEFT JOIN tf f ON f.doc_id = c.doc_id AND f.token = s.token
      |  CROSS JOIN totals t
      |  GROUP BY c.doc_id),
      |fused AS (
      |  SELECT b.doc_id, b.bm25, q.ql,
      |    CAST(ROW_NUMBER() OVER (ORDER BY b.bm25 DESC, b.doc_id)
      |      AS BIGINT) AS r_bm25,
      |    CAST(ROW_NUMBER() OVER (ORDER BY q.ql DESC, b.doc_id)
      |      AS BIGINT) AS r_ql
      |  FROM bm b JOIN ql q ON q.doc_id = b.doc_id)""".stripMargin

  val q260Oracle: String =
    s"""WITH $dualRankSql,
       |rrf AS (
       |  SELECT *, ROUND(1.0 / (60 + r_bm25) + 1.0 / (60 + r_ql), 6)
       |    AS rrf_score
       |  FROM fused)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id)
       |    AS BIGINT) AS fused_rank,
       |  doc_id, r_bm25, r_ql, bm25, ql, rrf_score
       |FROM rrf
       |ORDER BY fused_rank
       |LIMIT 20""".stripMargin

  /** Q266 — ranker-agreement audit between Q260's two component
    * rankers: rank-biased overlap at depth 20 (Webber, Moffat & Zobel
    * 2010 — top-weighted, p = 0.9), top-10 set Jaccard, and exact
    * Kendall τ-a over the full common candidate set. The
    * fusion-diagnostics companion to Q260: RRF helps most when the
    * rankers genuinely disagree (low τ) yet each has signal — this
    * gate measures that disagreement instead of assuming it.
    *
    * Determinism: ranks are Q260's round-before-rank integers, so
    * every prefix-intersection count, concordant/discordant pair count
    * and set size is exact int64 (row_number ranks are tie-free, so
    * τ-a needs no tie correction); RBO's geometric weights are
    * identical POWER(0.9, d−1) doubles, summed over 20 terms and
    * rounded 6; τ is one divide of exact ints rounded 6.
    *
    * Scale notes: prefix counts are candidates × 20 depth rows; the τ
    * pair count is candidate-quadratic BY DEFINITION of the statistic
    * — bounded by the query's candidate set (inverted-index filtered),
    * never the corpus. Single-row output.
    */
  def q266(spark: SparkSession, dir: String): DataFrame = {
    val r = dualRankings(spark, dir)
      .select(col("doc_id"), col("r_bm25"), col("r_ql"))
      .localCheckpoint()
    val depths = spark.range(1, 21).select(col("id").as("d"))
    val xs = r.crossJoin(depths)
      .filter(col("r_bm25") <= col("d") && col("r_ql") <= col("d"))
      .groupBy(col("d")).agg(count(lit(1)).cast("long").as("xd"))
    val rbo = depths.join(xs, Seq("d"), "left")
      .agg(round(sum(lit(0.1) * pow(lit(0.9), col("d") - 1) *
        coalesce(col("xd"), lit(0L)) / col("d")), 6).as("rbo_20"))
    val tens = r.agg(
      sum(when(col("r_bm25") <= 10 && col("r_ql") <= 10, 1L).otherwise(0L))
        .cast("long").as("inter_10"),
      sum(when(col("r_bm25") <= 10 || col("r_ql") <= 10, 1L).otherwise(0L))
        .cast("long").as("union_10"),
      count(lit(1)).cast("long").as("n_candidates"))
    // BNLJ parallelism = the STREAM side's partition count (the Q248
    // lesson): r comes out of global rank windows in ONE partition,
    // which would run the candidate-quadratic τ stage single-threaded.
    val a = r.repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id").as("ia"), col("r_bm25").as("ba"),
        col("r_ql").as("qa"))
    val b = r.select(col("doc_id").as("ib"), col("r_bm25").as("bb"),
      col("r_ql").as("qb"))
    val tau = a.join(broadcast(b), col("ib") > col("ia"))
      .agg(
        sum(when((col("ba") - col("bb")) * (col("qa") - col("qb")) > 0, 1L)
          .otherwise(0L)).cast("long").as("concordant"),
        sum(when((col("ba") - col("bb")) * (col("qa") - col("qb")) < 0, 1L)
          .otherwise(0L)).cast("long").as("discordant"),
        count(lit(1)).cast("long").as("n_pairs"))
    tens.crossJoin(rbo).crossJoin(tau)
      .select(col("n_candidates"), col("rbo_20"),
        col("inter_10"), col("union_10"),
        round(col("inter_10").cast("double") / col("union_10"), 6)
          .as("jaccard_10"),
        col("n_pairs"), col("concordant"), col("discordant"),
        round((col("concordant") - col("discordant")).cast("double") /
          col("n_pairs"), 6).as("kendall_tau"))
  }

  val q266Oracle: String =
    s"""WITH $dualRankSql,
       |r AS (SELECT doc_id, r_bm25, r_ql FROM fused),
       |depths AS (SELECT UNNEST(generate_series(1, 20)) AS d),
       |xs AS (
       |  SELECT d.d, CAST(COUNT(*) AS BIGINT) AS xd
       |  FROM r CROSS JOIN depths d
       |  WHERE r.r_bm25 <= d.d AND r.r_ql <= d.d
       |  GROUP BY 1),
       |rbo AS (
       |  SELECT ROUND(SUM(0.1 * POWER(0.9, d.d - 1)
       |    * COALESCE(x.xd, 0) / d.d), 6) AS rbo_20
       |  FROM depths d LEFT JOIN xs x ON x.d = d.d),
       |tens AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN r_bm25 <= 10 AND r_ql <= 10 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS inter_10,
       |    CAST(SUM(CASE WHEN r_bm25 <= 10 OR r_ql <= 10 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS union_10,
       |    CAST(COUNT(*) AS BIGINT) AS n_candidates
       |  FROM r),
       |tau AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN (a.r_bm25 - b.r_bm25) * (a.r_ql - b.r_ql) > 0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
       |    CAST(SUM(CASE WHEN (a.r_bm25 - b.r_bm25) * (a.r_ql - b.r_ql) < 0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
       |    CAST(COUNT(*) AS BIGINT) AS n_pairs
       |  FROM r a JOIN r b ON b.doc_id > a.doc_id)
       |SELECT t.n_candidates, rbo.rbo_20, t.inter_10, t.union_10,
       |  ROUND(CAST(t.inter_10 AS DOUBLE) / t.union_10, 6) AS jaccard_10,
       |  u.n_pairs, u.concordant, u.discordant,
       |  ROUND(CAST(u.concordant - u.discordant AS DOUBLE) / u.n_pairs, 6)
       |    AS kendall_tau
       |FROM tens t CROSS JOIN rbo CROSS JOIN tau u""".stripMargin

  /** Q294 — RAKE keyword extraction (Rose, Engel, Cramer & Cowley
    * 2010): the CO-OCCURRENCE-based keyword ranker beside the
    * graph-based one (Q237 TextRank) and the frequency-based one
    * (Q142 TF-IDF). Documents split into candidate phrases at the
    * declared delimiter set ('the','a','value','table','row','key',
    * and the empty token); for each word in a kept phrase (1–4 words,
    * RAKE's standard cap), freq(w) counts occurrences and deg(w) sums
    * the lengths of the phrases containing it (degree = within-phrase
    * co-occurrence mass); word score = deg/freq favors words that
    * appear in LONG multi-word phrases; a phrase scores the sum of
    * its words' scores. Top-20 phrases.
    *
    * Determinism: word scores are carried as exact int64
    * milli-scores (1000·deg) DIV freq — RAKE's deg/freq quantized at
    * the declared 10⁻³ resolution — so the phrase score is a SUM OF
    * EXACT INTS (order-independent, unlike summing float ratios);
    * the one emitted float is a single divide-by-1000, and the
    * ranking orders on the int. Phrase assembly uses the
    * position-sorted struct collect (the registry's standard
    * order-pinned idiom).
    *
    * Scale notes: linear — one posexplode over documents, one window
    * per doc for phrase ids, two vocabulary-bounded aggregates
    * (freq/deg), one phrase rollup, TakeOrdered(20). No pair joins
    * anywhere: RAKE's co-occurrence is WITHIN-phrase only, so the
    * "graph" never materializes (that's why it beats TextRank at
    * 100 TB: Q237 needs the token co-occurrence graph, RAKE needs a
    * groupBy).
    */
  def q294(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val toks = c.documents.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("dl",
        col("tok").isin("the", "a", "value", "table", "row", "key", "")
          .cast("int"))
      .withColumn("pid", sum(col("dl")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ptoks = toks.filter(col("dl") === 0)
      .select(col("doc_id"), col("pid"), col("pos"), col("tok"))
      .localCheckpoint()
    val plen = ptoks.groupBy(col("doc_id"), col("pid"))
      .agg(count(lit(1)).cast("long").as("len"),
        expr("array_join(transform(array_sort(collect_list(" +
          "struct(pos, tok))), x -> x.tok), ' ')").as("phrase"))
      .filter(col("len") <= 4)
    val wsc = ptoks.join(plen, Seq("doc_id", "pid"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).cast("long").as("freq"),
        sum(col("len")).cast("long").as("deg"))
      .select(col("tok"), expr("(1000 * deg) DIV freq").as("sm"))
    ptoks.join(plen, Seq("doc_id", "pid"))
      .join(wsc, Seq("tok"))
      .groupBy(col("doc_id"), col("pid"), col("phrase"), col("len"))
      .agg(sum(col("sm")).cast("long").as("isc"))
      .groupBy(col("phrase"))
      .agg(min(col("len")).as("n_words"),
        count(lit(1)).cast("long").as("n_occur"),
        min(col("isc")).as("sm"))
      .select(col("phrase"), col("n_words"), col("n_occur"),
        expr("ROUND(CAST(sm AS DOUBLE) / 1000, 3)").as("rake_score"))
      .orderBy(desc("rake_score"), asc("phrase"))
      .limit(20)
  }

  val q294Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
      |    UNNEST(string_split(text, ' ')) AS tok
      |  FROM documents),
      |marked AS (
      |  SELECT doc_id, pos, tok,
      |    CASE WHEN tok IN ('the', 'a', 'value', 'table', 'row', 'key', '')
      |      THEN 1 ELSE 0 END AS dl
      |  FROM toks),
      |pids AS (
      |  SELECT doc_id, pos, tok, dl,
      |    SUM(dl) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
      |  FROM marked),
      |ptoks AS (SELECT doc_id, pid, pos, tok FROM pids WHERE dl = 0),
      |plen AS (
      |  SELECT doc_id, pid, CAST(COUNT(*) AS BIGINT) AS len,
      |    string_agg(tok, ' ' ORDER BY pos) AS phrase
      |  FROM ptoks GROUP BY 1, 2 HAVING COUNT(*) <= 4),
      |wsc AS (
      |  SELECT t.tok,
      |    (1000 * CAST(SUM(p.len) AS BIGINT))
      |      // CAST(COUNT(*) AS BIGINT) AS sm
      |  FROM ptoks t JOIN plen p ON p.doc_id = t.doc_id AND p.pid = t.pid
      |  GROUP BY 1),
      |inst AS (
      |  SELECT t.doc_id, t.pid, p.phrase, p.len,
      |    CAST(SUM(w.sm) AS BIGINT) AS isc
      |  FROM ptoks t
      |  JOIN plen p ON p.doc_id = t.doc_id AND p.pid = t.pid
      |  JOIN wsc w ON w.tok = t.tok
      |  GROUP BY 1, 2, 3, 4),
      |ph AS (
      |  SELECT phrase, CAST(MIN(len) AS BIGINT) AS n_words,
      |    CAST(COUNT(*) AS BIGINT) AS n_occur,
      |    CAST(MIN(isc) AS BIGINT) AS sm
      |  FROM inst GROUP BY 1)
      |SELECT phrase, n_words, n_occur,
      |  ROUND(CAST(sm AS DOUBLE) / 1000, 3) AS rake_score
      |FROM ph
      |ORDER BY rake_score DESC, phrase
      |LIMIT 20""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q141" -> (q141 _), "Q142" -> (q142 _), "Q148" -> (q148 _),
    "Q201" -> (q201 _), "Q237" -> (q237 _), "Q260" -> (q260 _),
    "Q266" -> (q266 _), "Q294" -> (q294 _))

  def oracles: Map[String, String] = Map(
    "Q141" -> q141Oracle, "Q142" -> q142Oracle, "Q148" -> q148Oracle,
    "Q201" -> q201Oracle, "Q237" -> q237Oracle, "Q260" -> q260Oracle,
    "Q266" -> q266Oracle, "Q294" -> q294Oracle)
}
