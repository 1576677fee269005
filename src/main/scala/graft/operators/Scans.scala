package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Catalog

/** Scan / source operators (SURVEY.md §2.1).
  *
  * Scale notes: each table is a plain parquet scan; Q01's per-table counts
  * compile to metadata-only parquet row-group count aggregation
  * (no column materialization), the cheapest possible full-table statistic
  * at 100 TB. CSV/JSON sources (C01/C02) and sinks (C03/C04) are exercised
  * in SourceSinkSpec (no fixtures in testdata).
  */
object Scans {

  /** Q01 — all 10 tables readable; exact counts via UNION ALL. */
  def q01(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    Catalog.tableNames
      .map(t => c.table(t).agg(lit(t).as("t"), count(lit(1)).as("n")))
      .reduce(_ unionAll _)
      .orderBy(asc_nulls_first("t"))
  }

  val q01Oracle: String = Catalog.tableNames
    .map(t => s"SELECT '$t' AS t, COUNT(*) AS n FROM $t")
    .mkString("", " UNION ALL ", " ORDER BY t NULLS FIRST")

  /** Q99 — 3-D z-order layout end-to-end: write a copy of lineitem
    * Morton-clustered on (l_extendedprice, l_discount, l_quantity)
    * ([[graft.sources.Layout.writeZOrderedN]] — one stats pass, one
    * range-shuffle write), then answer a 3-D box predicate FROM THE
    * Z-ORDERED COPY. Layout changes bytes-on-disk order only, so the
    * result is hash-identical to the same query over the original table —
    * which is exactly what the DuckDB oracle checks. The pruning payoff
    * (files skipped vs a linear sort) is quantified in LayoutSpec and
    * docs/BENCH_NOTES.md; at 100 TB the write is one job and every
    * subsequent selective scan reads a fraction of the files.
    */
  def q99(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val zPath = s"${System.getProperty("java.io.tmpdir")}/graft_q99_z_" +
      dir.replaceAll("[^A-Za-z0-9]", "_")
    graft.sources.Layout.writeZOrderedN(
      c.lineitem.select(col("l_returnflag"), col("l_extendedprice"),
        col("l_discount"), col("l_quantity")),
      zPath, Seq("l_extendedprice", "l_discount", "l_quantity"),
      files = 16, bits = 10)
    // Box shape is the one that MOTIVATES z-ordering: wide on the column a
    // linear layout would sort by (price), narrow on the other two — a
    // single-column sort prunes nothing here, the Morton layout prunes in
    // every dimension (quantified in LayoutSpec on this exact box).
    spark.read.parquet(zPath)
      .filter(col("l_extendedprice").between(5000, 80000) &&
        col("l_discount").between(0.02, 0.04) &&
        col("l_quantity").between(10, 20))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")).cast("double"), 4).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("double"), 4).as("sum_disc_price"))
      .orderBy(asc_nulls_first("l_returnflag"))
  }

  val q99Oracle: String =
    """SELECT l_returnflag, COUNT(*) AS n_rows,
      |  ROUND(CAST(SUM(l_quantity) AS DOUBLE), 4) AS sum_qty,
      |  ROUND(CAST(SUM(l_extendedprice * (1.0 - l_discount)) AS DOUBLE), 4)
      |    AS sum_disc_price
      |FROM lineitem
      |WHERE l_extendedprice BETWEEN 5000 AND 80000
      |  AND l_discount BETWEEN 0.02 AND 0.04
      |  AND l_quantity BETWEEN 10 AND 20
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("Q01" -> (q01 _), "Q99" -> (q99 _))

  def oracles: Map[String, String] =
    Map("Q01" -> q01Oracle, "Q99" -> q99Oracle)
}
