package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout control: z-order (Morton) clustering for multi-dimensional
  * scan pruning.
  *
  * A single-column sort gives parquet min/max pruning on that column only;
  * a 2-D box predicate on a linearly-sorted table still touches every
  * file for the second column. Interleaving the bits of both columns
  * (the Morton curve) makes each file cover a LOCAL rectangle of the
  * (a, b) space, so every file's min/max envelope is tight in BOTH
  * dimensions and a box predicate prunes most files before any IO — the
  * standard lakehouse layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`),
  * reproduced here with plain Spark primitives: one min/max aggregate,
  * an arithmetic z-value expression, `repartitionByRange` on it, and a
  * within-partition sort. At 100 TB this runs as one range-shuffle write
  * job; the payoff is every subsequent selective scan.
  *
  * The z-value is pure arithmetic (aggregate over bit positions), fully
  * codegen-resident; no UDF.
  */
object Layout {

  /** Morton-interleaved z-value of two already-normalized non-negative
    * int columns (referenced by name) in [0, 2^bits): bit i of `a` lands
    * at position 2i, of `b` at 2i+1.
    */
  def zValue(aCol: String, bCol: String, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    expr(
      s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, i) ->
         |  acc + shiftleft(shiftright(CAST($aCol AS BIGINT), i) % 2, 2 * i)
         |      + shiftleft(shiftright(CAST($bCol AS BIGINT), i) % 2, 2 * i + 1))"""
        .stripMargin)
  }

  /** Affine map of a numeric column onto [0, 2^bits) given its observed
    * (min, max) — the normalization step before interleaving.
    */
  def normalize(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val scale = ((1L << bits) - 1).toDouble / math.max(mx - mn, 1e-12)
    least(greatest(round((c.cast("double") - lit(mn)) * lit(scale)), lit(0.0)),
      lit(((1L << bits) - 1).toDouble)).cast("bigint")
  }

  /** Write `df` to parquet z-ordered on two numeric columns: one stats
    * pass (two mins + two maxes to the driver), range-repartition on the
    * z-value into `files` output files, sort within each, drop the helper
    * column. Each file then covers a compact rectangle of (a, b).
    */
  def writeZOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      files: Int, bits: Int = 16): Unit = {
    val s = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).collect()(0)
    df.withColumn("_za", normalize(col(colA), s.getDouble(0), s.getDouble(1), bits))
      .withColumn("_zb", normalize(col(colB), s.getDouble(2), s.getDouble(3), bits))
      .withColumn("_z", zValue("_za", "_zb", bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_za", "_zb", "_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Min/max-pruning candidate count: how many files of a written layout
    * could contain rows matching `aRange`/`bRange` judging ONLY by each
    * file's per-column envelope — exactly the decision parquet row-group /
    * file skipping makes from footer stats. Used by the layout spec to
    * compare clustering quality; scans each file's two columns once.
    */
  def candidateFiles(
      spark: org.apache.spark.sql.SparkSession, path: String,
      colA: String, aRange: (Double, Double),
      colB: String, bRange: (Double, Double)): (Int, Int) = {
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(colA).cast("double")).as("amn"), max(col(colA).cast("double")).as("amx"),
        min(col(colB).cast("double")).as("bmn"), max(col(colB).cast("double")).as("bmx"))
      .collect()
    val hits = perFile.count { r =>
      r.getDouble(2) >= aRange._1 && r.getDouble(1) <= aRange._2 &&
      r.getDouble(4) >= bRange._1 && r.getDouble(3) <= bRange._2
    }
    (hits, perFile.length)
  }
}
