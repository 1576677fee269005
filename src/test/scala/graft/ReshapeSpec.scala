package graft

import graft.operators.Reshape

/** Plan + model pins for the Q143/Q144 reshaping gates. The value gate
  * is the DuckDB oracle; here we pin the SCALE properties: an explicit
  * pivot value list must stay one aggregate (no distinct-collect
  * pre-job), and unpivot must be a map-side Expand, not a union of
  * self-scans.
  */
class ReshapeSpec extends SparkSpec {

  test("Q143 pivot with explicit values plans as a single aggregate pass") {
    val plan = Reshape.q143(spark, sf("sf0.001"))
      .queryExecution.optimizedPlan.toString
    // one scan, no Union: Spark's pivot rewrite is the two-phase
    // (key, pivotCol) cell aggregate + pivotfirst aggregate — both on
    // the same shuffle path. Omitting the value list would add a
    // separate distinct-collect JOB, which never reaches this plan.
    assert(!plan.contains("Union"))
    assert("Relation ".r.findAllIn(plan).size === 1)
    assert("Aggregate \\[".r.findAllIn(plan).size <= 2)
    val out = Reshape.q143(spark, sf("sf0.001")).collect()
    assert(out.length === 5)
    assert(out.head.schema.fieldNames.toSeq ===
      Seq("o_orderpriority", "F_n", "F_rev", "O_n", "O_rev", "P_n", "P_rev"))
  }

  test("Q144 unpivot plans as one Expand over one scan") {
    val plan = Reshape.q144(spark, sf("sf0.001"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Expand"))
    assert(!plan.contains("Union"))
    // 3 measures x flags, every melted total matches the wide-form sum
    val rows = Reshape.q144(spark, sf("sf0.001")).collect()
    assert(rows.map(_.getString(1)).distinct.sorted.toSeq ===
      Seq("l_discount", "l_quantity", "l_tax"))
  }
}
