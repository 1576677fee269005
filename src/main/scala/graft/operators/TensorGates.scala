package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog

/** Hash-gated relational tensor-decomposition steps (SURVEY.md §2.13).
  *
  * C12 pins the CP-ALS engines ([[graft.tensor.CPALS]],
  * [[graft.tensor.RelationalALS]]) with PROPERTY gates (monotone fit,
  * planted-factor recovery) because a full float ALS cannot be bit-matched
  * across engines. Q335 closes the round-10 verdict gap by putting ONE
  * seeded, fixed-parenthesization ALS half-step under the same DuckDB
  * hash discipline as Q102/Q120 (k-means) and Q119 (BPE): the MTTKRP and
  * the normal-equation solve — the two relational workhorses of
  * [[graft.tensor.RelationalALS]] — run as an all-integer pipeline whose
  * only float is ONE divide of exact integers, so the gate hash pins the
  * distributed algebra itself, not a rounded summary.
  */
object TensorGates {

  /** Deterministic md5-seeded factor entry in [−9, 9] for (mode, idx, p) —
    * the same dialect-common md5 derivation as the MinHash permutations
    * (`NearDup.hexValueExpr`), so BOTH engines evaluate the identical
    * integer. `cast` is STRING for Spark, VARCHAR for DuckDB.
    */
  private def signExpr(mode: String, idx: String, p: Int, cast: String): String =
    "((" + NearDup.hexValueExpr(
      s"md5('als:$mode:' || CAST($idx AS $cast) || ':$p')") + ") % 19 - 9)"

  /** Q335 — one deterministic rank-2 relational CP-ALS mode-A update on
    * the Q43 events tensor (Kolda & Bader, SIAM Review 51(3) 2009, eq. 3.5:
    * A ← X₍₁₎(C⊙B)(CᵀC ∗ BᵀB)⁺). The declared cross-engine gate for the
    * engine's core decomposition capability:
    *  - tensor cells carry EXACT integer cents (per-event ROUND to cents
    *    BEFORE the sum — never a float corpus sum);
    *  - factors B (event-type mode) and C (day mode) are md5-seeded
    *    integers in [−9, 9], identical in both engines by construction;
    *  - MTTKRP rows m_p(i) = Σ v·b_p(j)·c_p(k), the Gramians BᵀB, CᵀC,
    *    their Hadamard product H and det(H) are ALL exact int64 sums;
    *  - the rank-2 normal-equation solve uses the exact adjugate:
    *    a₀ = (m₀·H₁₁ − m₁·H₀₁)/det with the numerators carried in
    *    DECIMAL(38,0)/HUGEINT (they pass int64 at ~7·10¹⁹), then ONE
    *    divide of exact quantities per output — identical doubles both
    *    engines, rounded 6. det = 0 degrades to NULL factors (loud, the
    *    Q252 discipline).
    *
    * Determinism: everything before the final divide is exact integer
    * arithmetic; the divide's operands convert to double correctly
    * rounded in both engines. det stays inside 2⁵³-exact doubles to a
    * ~10⁴-day spine (H ≤ 405·81·days).
    *
    * Scale notes: ONE corpus scan builds the cell relation (map-side
    * combined); the factor "joins" are row-local expressions of (j, p) /
    * (k, p) — no factor relation is ever materialized or shuffled; the
    * Gramians aggregate the DISTINCT mode indices (5 types, spine days);
    * the solve matrix is a broadcast single row. Per-user output, user
    * dimension shuffles once (the groupBy) — the exact topology
    * [[graft.tensor.RelationalALS]] runs per iteration, minus the
    * driver-side pinv that rank-2 replaces with the closed-form adjugate.
    */
  def q335(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val e = c.events.select(
      col("user_id").as("i"),
      when(col("event_type") === "click", 0L)
        .when(col("event_type") === "error", 1L)
        .when(col("event_type") === "purchase", 2L)
        .when(col("event_type") === "signup", 3L)
        .when(col("event_type") === "view", 4L).as("j"),
      expr("(ts DIV 1000) DIV 86400000000").as("day"),
      expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
    val cells = e.crossJoin(broadcast(e.agg(min(col("day")).as("min_day"))))
      .select(col("i"), col("j"), (col("day") - col("min_day")).as("k"),
        col("cents"))
      .groupBy(col("i"), col("j"), col("k"))
      .agg(sum(col("cents")).cast("long").as("v4"))
      .localCheckpoint()
    def b(p: Int) = expr(signExpr("b", "j", p, "STRING"))
    def cf(p: Int) = expr(signExpr("c", "k", p, "STRING"))
    val m = cells
      .groupBy(col("i"))
      .agg(count(lit(1)).cast("long").as("n_cells"),
        sum(col("v4") * b(0) * cf(0)).cast("long").as("m0"),
        sum(col("v4") * b(1) * cf(1)).cast("long").as("m1"))
    val gb = cells.select(col("j")).distinct()
      .agg(sum(b(0) * b(0)).cast("long").as("gb00"),
        sum(b(0) * b(1)).cast("long").as("gb01"),
        sum(b(1) * b(1)).cast("long").as("gb11"))
    val gc = cells.select(col("k")).distinct()
      .agg(sum(cf(0) * cf(0)).cast("long").as("gc00"),
        sum(cf(0) * cf(1)).cast("long").as("gc01"),
        sum(cf(1) * cf(1)).cast("long").as("gc11"))
    val h = gb.crossJoin(gc)
      .select((col("gb00") * col("gc00")).as("h00"),
        (col("gb01") * col("gc01")).as("h01"),
        (col("gb11") * col("gc11")).as("h11"))
      .withColumn("det",
        col("h00") * col("h11") - col("h01") * col("h01"))
    m.crossJoin(broadcast(h))
      .select(col("i"), col("n_cells"), col("m0"), col("m1"),
        expr("CASE WHEN det <> 0 THEN ROUND(CAST(" +
          "CAST(m0 AS DECIMAL(38,0)) * h11 - CAST(m1 AS DECIMAL(38,0)) * h01" +
          " AS DOUBLE) / CAST(det AS DOUBLE), 6) END").as("a0"),
        expr("CASE WHEN det <> 0 THEN ROUND(CAST(" +
          "CAST(m1 AS DECIMAL(38,0)) * h00 - CAST(m0 AS DECIMAL(38,0)) * h01" +
          " AS DOUBLE) / CAST(det AS DOUBLE), 6) END").as("a1"))
      .orderBy(asc_nulls_first("i"))
  }

  val q335Oracle: String = {
    def b(p: Int) = signExpr("b", "j", p, "VARCHAR")
    def cf(p: Int) = signExpr("c", "k", p, "VARCHAR")
    s"""WITH e AS (
       |  SELECT user_id AS i,
       |    CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
       |      WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4
       |    END AS j,
       |    epoch_us(ts) // 86400000000 AS day,
       |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
       |  FROM events),
       |cells AS (
       |  SELECT i, j, day - (SELECT MIN(day) FROM e) AS k,
       |    CAST(SUM(cents) AS BIGINT) AS v4
       |  FROM e GROUP BY i, j, day),
       |m AS (
       |  SELECT i, CAST(COUNT(*) AS BIGINT) AS n_cells,
       |    CAST(SUM(v4 * ${b(0)} * ${cf(0)}) AS BIGINT) AS m0,
       |    CAST(SUM(v4 * ${b(1)} * ${cf(1)}) AS BIGINT) AS m1
       |  FROM cells GROUP BY 1),
       |gb AS (
       |  SELECT CAST(SUM(${b(0)} * ${b(0)}) AS BIGINT) AS gb00,
       |    CAST(SUM(${b(0)} * ${b(1)}) AS BIGINT) AS gb01,
       |    CAST(SUM(${b(1)} * ${b(1)}) AS BIGINT) AS gb11
       |  FROM (SELECT DISTINCT j FROM cells)),
       |gc AS (
       |  SELECT CAST(SUM(${cf(0)} * ${cf(0)}) AS BIGINT) AS gc00,
       |    CAST(SUM(${cf(0)} * ${cf(1)}) AS BIGINT) AS gc01,
       |    CAST(SUM(${cf(1)} * ${cf(1)}) AS BIGINT) AS gc11
       |  FROM (SELECT DISTINCT k FROM cells)),
       |hm AS (
       |  SELECT gb.gb00 * gc.gc00 AS h00, gb.gb01 * gc.gc01 AS h01,
       |    gb.gb11 * gc.gc11 AS h11
       |  FROM gb, gc),
       |dt AS (
       |  SELECT h00, h01, h11, h00 * h11 - h01 * h01 AS det FROM hm)
       |SELECT m.i, m.n_cells, m.m0, m.m1,
       |  CASE WHEN d.det <> 0 THEN ROUND(CAST(
       |    CAST(m.m0 AS HUGEINT) * d.h11 - CAST(m.m1 AS HUGEINT) * d.h01
       |    AS DOUBLE) / CAST(d.det AS DOUBLE), 6) END AS a0,
       |  CASE WHEN d.det <> 0 THEN ROUND(CAST(
       |    CAST(m.m1 AS HUGEINT) * d.h00 - CAST(m.m0 AS HUGEINT) * d.h01
       |    AS DOUBLE) / CAST(d.det AS DOUBLE), 6) END AS a1
       |FROM m, dt d
       |ORDER BY m.i NULLS FIRST""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "Q335" -> (q335 _))

  def oracles: Map[String, String] = Map(
    "Q335" -> q335Oracle)
}
