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

  /** Morton-interleaved z-value of n already-normalized non-negative int
    * columns (referenced by name), each in [0, 2^bits): bit i of column c
    * lands at position n·i + c. Still one pure-arithmetic codegen'd
    * aggregate over bit positions — no UDF at any dimensionality.
    */
  def zValueN(cols: Seq[String], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, s"need >= 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"$n cols x $bits bits overflows the 63-bit z-value")
    // Unrolled flat arithmetic (n·bits addends) instead of a higher-order
    // aggregate over sequence(): no per-row array allocation or lambda
    // dispatch — the whole z-value is one codegen'd integer expression.
    val terms = for {
      i <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield s"shiftleft(shiftright(CAST($c AS BIGINT), $i) % 2, ${n * i + ci})"
    expr(terms.mkString(" + "))
  }

  /** 2-D special case (bit i of `a` at position 2i, of `b` at 2i+1). */
  def zValue(aCol: String, bCol: String, bits: Int): Column =
    zValueN(Seq(aCol, bCol), bits)

  /** Affine map of a numeric column onto [0, 2^bits) given its observed
    * (min, max) — the normalization step before interleaving.
    */
  def normalize(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val scale = ((1L << bits) - 1).toDouble / math.max(mx - mn, 1e-12)
    least(greatest(round((c.cast("double") - lit(mn)) * lit(scale)), lit(0.0)),
      lit(((1L << bits) - 1).toDouble)).cast("bigint")
  }

  /** Write `df` to parquet z-ordered on n numeric columns: one stats pass
    * (n mins + n maxes to the driver), range-repartition on the z-value
    * into `files` output files, sort within each, drop the helper columns.
    * Each file then covers a compact hyper-rectangle of the column space.
    */
  def writeZOrderedN(
      df: DataFrame, path: String, zCols: Seq[String],
      files: Int, bits: Int = 16): Unit = {
    val statAggs = zCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val s = df.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val helpers = zCols.indices.map(ci => s"_z$ci")
    val normalized = zCols.zipWithIndex.foldLeft(df) { case (acc, (c, ci)) =>
      acc.withColumn(s"_z$ci",
        normalize(col(c), s.getDouble(2 * ci), s.getDouble(2 * ci + 1), bits))
    }
    normalized
      .withColumn("_z", zValueN(helpers, bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop(helpers :+ "_z": _*)
      .write.mode("overwrite").parquet(path)
  }

  /** 2-D special case of [[writeZOrderedN]]. */
  def writeZOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      files: Int, bits: Int = 16): Unit =
    writeZOrderedN(df, path, Seq(colA, colB), files, bits)

  /** Min/max-pruning candidate count: how many files of a written layout
    * could contain rows matching `aRange`/`bRange` judging ONLY by each
    * file's per-column envelope — exactly the decision parquet row-group /
    * file skipping makes from footer stats. Used by the layout spec to
    * compare clustering quality; scans each file's two columns once.
    */
  def candidateFiles(
      spark: org.apache.spark.sql.SparkSession, path: String,
      colA: String, aRange: (Double, Double),
      colB: String, bRange: (Double, Double)): (Int, Int) =
    candidateFilesN(spark, path, Seq(colA -> aRange, colB -> bRange))

  /** n-D form: files whose per-column min/max envelopes all overlap their
    * query ranges — the box-predicate skipping decision for any arity.
    */
  def candidateFilesN(
      spark: org.apache.spark.sql.SparkSession, path: String,
      ranges: Seq[(String, (Double, Double))]): (Int, Int) = {
    val aggs = ranges.flatMap { case (c, _) =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))) }
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val hits = perFile.count { r =>
      ranges.zipWithIndex.forall { case ((_, (lo, hi)), ci) =>
        r.getDouble(2 * ci + 2) >= lo && r.getDouble(2 * ci + 1) <= hi
      }
    }
    (hits, perFile.length)
  }
}
