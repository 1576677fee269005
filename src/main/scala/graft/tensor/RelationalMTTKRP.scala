package graft.tensor

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational MTTKRP (SURVEY.md §2.11 C12 alternative path): the
  * matricized-tensor times Khatri-Rao product expressed as Q43-style
  * DataFrame joins + aggregation, for the very-sparse regime where packing
  * dense slabs wastes memory.
  *
  * M₍₁₎(i, r) = Σ_{(i,j,k,v)} v · B(j,r) · C(k,r)
  *
  * Factors are stored relationally as (row, pos, val); the COO relation
  * joins both factor relations on their mode indices + shared rank
  * position and aggregates per (target row, pos). Catalyst broadcasts the
  * (small) factor relations, so the tensor relation streams through one
  * pass with map-side partial aggregation — the same communication pattern
  * as the slab path, derived automatically from the declarative plan.
  */
object RelationalMTTKRP {

  /** Explode a driver-side row-major factor into its (row, pos, val) form. */
  def factorRelation(spark: SparkSession, m: Array[Double], rows: Int, rank: Int,
      rowCol: String): DataFrame = {
    import spark.implicits._
    (0 until rows).flatMap(r => (0 until rank).map(p => (r.toLong, p, m(r * rank + p))))
      .toDF(rowCol, "pos", "val")
  }

  /** MTTKRP against mode 1: rows over i, contracting B over j and C over k.
    * `coo` columns: (i, j, k, v). Returns (i, pos, mval).
    */
  def mttkrpMode1(coo: DataFrame, b: DataFrame, c: DataFrame): DataFrame =
    coo
      .join(broadcast(b), Seq("j"))
      .join(broadcast(c.withColumnRenamed("val", "cval")), Seq("k", "pos"))
      .groupBy(col("i"), col("pos"))
      .agg(sum(col("v") * col("val") * col("cval")).as("mval"))
}
