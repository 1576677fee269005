package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `Catalog.normalizeTs`, the shim that tolerates both on-disk
  * physical types of `events.ts` (parquet `timestamp[us]` since the
  * 2026-08-12 testdata regen; epoch-ns INT64 in legacy files and synthetic
  * test fixtures). Every event-time operator depends on the invariant
  * asserted here: after the Catalog read, `ts` is epoch-nanoseconds
  * LongType with `ts DIV 1000` equal to the stored microsecond instant.
  */
class CatalogSpec extends SparkSpec {

  private val micros = Seq(
    1704067200000000L, // 2024-01-01 00:00:00 UTC
    1706657176220708L, // sub-second fraction carried
    0L)                // epoch boundary

  test("timestamp[us] events normalize to the same epoch-ns longs as legacy long files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-catalog").toString

    // File A: ts as TIMESTAMP_NTZ — what the regenerated parquet stores.
    micros.map(us => Tuple1(java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)))
      .toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    // File B: ts as epoch-ns LongType — the legacy/synthetic-fixture shape.
    micros.map(us => Tuple1(us * 1000L)).toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/long/events.parquet")

    val fromNtz = Catalog(spark, s"$dir/ntz").events
    val fromLong = Catalog(spark, s"$dir/long").events
    assert(fromNtz.schema("ts").dataType === LongType)
    assert(fromLong.schema("ts").dataType === LongType)

    def sortedNs(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(col("ts")).collect().map(_.getLong(0)).sorted.toSeq
    assert(sortedNs(fromNtz) === micros.sorted.map(_ * 1000L))
    assert(sortedNs(fromNtz) === sortedNs(fromLong))

    // The cross-engine convention every operator and oracle shares.
    val us = fromNtz.select(expr("ts DIV 1000").as("us"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(us === micros.sorted)
  }
}
