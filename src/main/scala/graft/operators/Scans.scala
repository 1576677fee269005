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

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("Q01" -> (q01 _))

  def oracles: Map[String, String] =
    Map("Q01" -> q01Oracle)
}
