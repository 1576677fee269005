package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source / sink surface beyond the parquet catalog (SURVEY.md §2.1
  * C01–C04). Explicit schemas only — schema inference costs a full extra
  * pass at 100 TB and can silently drift types between runs.
  */
object Sources {

  /** C01 — CSV with explicit schema. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** C02 — JSON-lines with explicit schema. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** C03 — lossless parquet sink. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** C04 — hive-style partitioned sink: one directory per partition value,
    * enabling static + dynamic partition pruning on re-read.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** ORC source/sink — the second columnar format Spark ships natively;
    * same pushdown/pruning machinery as parquet. Explicit schema on read
    * for the same no-inference-pass reason as CSV/JSONL.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
