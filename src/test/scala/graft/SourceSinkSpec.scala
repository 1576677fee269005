package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Sources

/** C01–C04: CSV / JSONL sources round-trip with explicit schemas; parquet
  * sink is lossless; partitioned sink prunes partitions on re-read.
  */
class SourceSinkSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val sampleSchema = StructType(Seq(
    StructField("k", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("C01: CSV source with explicit schema round-trips") {
    import spark.implicits._
    val dir = tmp("graft-csv")
    val src = Seq((1L, "alpha", 1.5), (2L, "beta", -2.25), (3L, "gamma", 0.0))
    src.toDF("k", "name", "score").write.mode("overwrite").csv(dir)
    val back = Sources.readCsv(spark, dir, sampleSchema)
    assert(back.schema == sampleSchema)
    val rows = back.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == src)
  }

  test("C02: JSONL source with explicit schema round-trips") {
    import spark.implicits._
    val dir = tmp("graft-jsonl")
    val src = Seq((10L, "x", 3.5), (20L, null.asInstanceOf[String], 4.25))
    src.toDF("k", "name", "score").write.mode("overwrite").json(dir)
    val back = Sources.readJsonl(spark, dir, sampleSchema)
    val rows = back.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == src)
  }

  test("C03: parquet sink round-trips the Q13 result losslessly") {
    val dir = tmp("graft-pq")
    val q13 = graft.operators.Aggregates.q13(spark, sf("sf0.001"))
    Sources.writeParquet(q13, dir)
    val back = spark.read.parquet(dir)
      .orderBy("l_returnflag", "l_linestatus").collect()
    val orig = q13.collect()
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) => assert(b == o, s"$b != $o") }
  }

  test("ORC sink round-trips the Q13 result losslessly with predicate pushdown") {
    val dir = tmp("graft-orc")
    val q13 = graft.operators.Aggregates.q13(spark, sf("sf0.001"))
    Sources.writeOrc(q13, dir)
    val back = Sources.readOrc(spark, dir, q13.schema)
      .orderBy("l_returnflag", "l_linestatus").collect()
    val orig = q13.collect()
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) => assert(b == o, s"$b != $o") }
    // Same pushdown machinery as parquet: the filter reaches the ORC scan.
    val filtered = Sources.readOrc(spark, dir, q13.schema)
      .filter(col("l_returnflag") === "A")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("l_returnflag"), plan)
  }

  test("C04: partitioned sink prunes partitions on re-read") {
    val dir = tmp("graft-part")
    val events = Catalog(spark, sf("sf0.001")).events
    Sources.writePartitioned(events, dir, Seq("event_type"))
    // One subdirectory per event type.
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.forall(_.startsWith("event_type=")) && subdirs.length == 5, subdirs.mkString(","))

    val pruned = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    // Partition pruning is visible in the scan's partition filters.
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"no partition filter in plan:\n$plan")
    val expected = events.filter(col("event_type") === "purchase").count()
    assert(pruned.count() == expected)
  }
}
