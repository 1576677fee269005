package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-generated parquet testdata.
  *
  * Capability mirrored from the reference engine's relational-source layer
  * (reference checkout is empty — see SURVEY.md §0.1; semantics are declared
  * by SURVEY.md §1.2/§1.3 from the verified fixture schemas in FIXTURES.md).
  *
  * Design for scale: tables are plain parquet scans — Catalyst handles
  * predicate pushdown / column pruning / partition pruning; nothing is
  * cached or collected here. At 100 TB the same code path works because
  * every downstream operator declares its plan against these scans.
  */
final class Catalog(val spark: SparkSession, val dir: String) {
  // Mandatory before touching events.parquet: its `ts` column is parquet
  // INT64 TIMESTAMP(NANOS) which Spark 4.1.2 refuses by default
  // (SURVEY.md V10/V11/V17). Runtime-settable; `ts` then reads as LongType
  // epoch-nanoseconds. Cross-engine convention: epoch-µs via `ts div 1000`.
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  // Engine-native functions (codegen'd expressions). The driver harness
  // owns the session builder, so registration happens at runtime here;
  // deployments that own the builder use
  // spark.sql.extensions=graft.plans.GraftExtensions instead.
  graft.plans.GraftExtensions.registerRuntime(spark)

  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  def events: DataFrame     = table("events")
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register all tables as temp views for SQL entry (SURVEY §3.2 E2). */
  def register(): Unit =
    Catalog.tableNames.foreach(t => table(t).createOrReplaceTempView(t))
}

object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String): Catalog = new Catalog(spark, dir)
}
