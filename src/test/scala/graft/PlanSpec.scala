package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Physical-plan assertions (SURVEY.md §4, M8) — the plans the 100 TB
  * design depends on must actually materialize, not just be intended:
  * broadcast joins stay broadcast, top-k never full-sorts, filters reach
  * the parquet scan, global sorts range-partition.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("Q04: dimension join is a BroadcastHashJoin (no fact shuffle)") {
    val p = plan(Joins.q04(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("Q22: global top-k compiles to TakeOrderedAndProject (no full sort)") {
    val p = plan(SortSet.q22(spark, sf("sf0.001")))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("Q02: range predicates are pushed to the parquet scan, columns pruned") {
    val p = plan(Filters.q02(spark, sf("sf0.001")))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate"), p)
    // Projection pruning: untouched wide columns must not be read.
    assert(!p.contains("l_comment") && !p.contains("l_returnflag"), p)
  }

  test("C07: full distributed sort is range-partitioned") {
    val c = Catalog(spark, sf("sf0.001"))
    val p = plan(c.lineitem.orderBy(col("l_extendedprice")))
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning")
      || p.contains("range_partitioning"), p)
    assert(p.contains("Sort"), p)
  }

  test("Q13: aggregation is two-phase hash (partial before shuffle)") {
    val p = plan(Aggregates.q13(spark, sf("sf0.001")))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum") || p.contains("partial"), p)
  }

  test("Q38: probe side broadcast; big vector side not shuffled before join") {
    val p = plan(VectorOps.q38(spark, sf("sf0.001")))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("Q64: N filtered measures run as ONE two-phase aggregate over one scan") {
    val p = plan(Aggregates.q64(spark, sf("sf0.001")))
    // One scan, one shuffle: conditional (FILTER-clause) aggregation must
    // not expand into per-measure scans or joins.
    assert(p.contains("HashAggregate") && p.contains("partial"), p)
    assert("(?i)exchange".r.findAllIn(p).size <= 2, p) // agg + final order
    assert(!p.contains("Join"), p)
  }

  test("Q62: moment aggregates (corr/covar/regr) are partial-aggregable") {
    val p = plan(Aggregates.q62(spark, sf("sf0.001")))
    assert(p.contains("HashAggregate") && p.contains("partial"), p)
    assert(!p.contains("Join"), p)
  }

  test("Q70: decontamination semi join broadcasts the eval shingle set") {
    val p = plan(PipelineOps.q70(spark, sf("sf0.001")))
    // The corpus side must not shuffle into the semi join: the benchmark
    // n-gram set is the small side and broadcasts.
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("Q69: unigram LM and scoring join are broadcast (no corpus-wide shuffle join)") {
    val p = plan(PipelineOps.q69(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("Q72: sampling predicate is map-side — rates broadcast, no RNG, no corpus shuffle join") {
    val p = plan(PipelineOps.q72(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.toLowerCase.contains("rand"), p)
  }

  test("Q102: centroid side broadcasts; the vector table never shuffles for assignment") {
    val p = plan(Clustering.q102(spark, sf("sf0.001")))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("Q103: consumes the triangle artifact; the enumeration's closure stays codegen'd") {
    // r13: Q103 reads the shared (node, n_triangles) artifact — the
    // degree-oriented enumeration runs once per dataset in the
    // tri_build leg. The consumer plan must be an artifact scan + top-k;
    // the BUILD plan keeps the codegen'd array_intersect closure with no
    // cartesian anywhere.
    val p = plan(Graphs.q103(spark, sf("sf0.001")))
    assert(p.contains("co_tri"), p)
    assert(!p.contains("CartesianProduct"), p)
    val build = plan(Graphs.triangleCorners(
      graft.operators.Derived.coOrderPairCounts(spark, sf("sf0.001"))
        .select(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b"))))
    assert(build.contains("array_intersect"), build)
    assert(!build.contains("CartesianProduct"), build)
  }

  test("Q105: skyline is join-free — dominated rows die in partition-local sweeps") {
    val p = plan(Skyline.q105(spark, sf("sf0.001")))
    assert(!p.contains("Join"), p)
    // one exchange for the candidate coalesce, one for the final order —
    // never a data-sized shuffle
    assert("(?i)exchange".r.findAllIn(p).size <= 2, p)
  }

  test("Q106: PageRank iterations read the checkpointed edge relation, not its lineage") {
    val p = plan(Graphs.q106(spark, sf("sf0.001")))
    // localCheckpoint materializes the edge build once; the iteration
    // joins must scan the RDD, with no parquet re-scan of lineitem per round
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    assert("lineitem".r.findAllIn(p).isEmpty, p)
  }

  test("Q108: A/B analysis is pure aggregation — hash-bucket map-side, no join, no RNG") {
    val p = plan(EventTime.q108(spark, sf("sf0.001")))
    assert(p.contains("HashAggregate") && p.contains("partial"), p)
    assert(!p.contains("Join"), p)
    assert(!p.toLowerCase.contains("rand("), p)
  }

  test("Q60: RANGE frame runs on the pre-aggregated daily series, not raw facts") {
    val df = Windows.q60(spark, sf("sf0.001"))
    val p = plan(df)
    // The window must sit ABOVE the (tiny) day-level aggregate: a Window
    // over raw orders would be the 100 TB anti-pattern.
    val planLines = p.linesIterator.toSeq
    val winIdx = planLines.indexWhere(_.contains("Window"))
    val aggIdx = planLines.lastIndexWhere(_.contains("HashAggregate"))
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"expected HashAggregate below Window:\n$p")
  }
}
