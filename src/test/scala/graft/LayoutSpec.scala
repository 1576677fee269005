package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Z-order layout: a 2-D box predicate must min/max-prune materially more
  * files under Morton clustering than under a linear single-column sort —
  * the property parquet footer-stats skipping exploits at scale.
  */
class LayoutSpec extends SparkSpec {

  test("z-ordered layout prunes a 2-D box to fewer files than a linear sort") {
    val c = Catalog(spark, sf("sf0.01"))
    // Two independent dimensions with real spread: user and hour-of-month.
    val ev = c.events.select(
      col("user_id"),
      expr("ts DIV 1000 DIV 3600000000").as("hr"),
      col("event_type"), col("value"))
    val files = 64

    val zPath = Files.createTempDirectory("graft-z").toString
    Layout.writeZOrdered(ev, zPath, "user_id", "hr", files, bits = 10)

    val linPath = Files.createTempDirectory("graft-lin").toString
    ev.repartitionByRange(files, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(linPath)

    // Layouts must hold identical data.
    val zSum = spark.read.parquet(zPath)
      .agg(count(lit(1)), sum(col("user_id")), round(sum(col("value")), 2)).collect()(0)
    val lSum = spark.read.parquet(linPath)
      .agg(count(lit(1)), sum(col("user_id")), round(sum(col("value")), 2)).collect()(0)
    assert(zSum == lSum, s"$zSum vs $lSum")

    // Box covering ~1/5 of each dimension.
    val (uLo, uHi) = (20.0, 50.0)
    val stats = ev.agg(min(col("hr")), max(col("hr"))).collect()(0)
    val (hMin, hMax) = (stats.getLong(0).toDouble, stats.getLong(1).toDouble)
    val hLo = hMin + (hMax - hMin) * 0.4
    val hHi = hMin + (hMax - hMin) * 0.6

    val (zHits, zTotal) =
      Layout.candidateFiles(spark, zPath, "user_id", (uLo, uHi), "hr", (hLo, hHi))
    val (lHits, lTotal) =
      Layout.candidateFiles(spark, linPath, "user_id", (uLo, uHi), "hr", (hLo, hHi))
    assert(zTotal == files && lTotal == files, s"$zTotal/$lTotal files written")
    // The linear layout prunes on user_id only, so the box keeps every
    // file in the user range regardless of hr; the z-layout's per-file
    // envelopes are tight in both dimensions.
    assert(zHits < lHits,
      s"z-order pruned nothing: z=$zHits vs linear=$lHits of $files files")
  }

  test("3-D z-order (Q99's layout) prunes a 3-D box better than a linear sort") {
    val c = Catalog(spark, sf("sf0.01"))
    val li = c.lineitem.select(
      col("l_extendedprice"), col("l_discount"), col("l_quantity"))
    val files = 64
    val zCols = Seq("l_extendedprice", "l_discount", "l_quantity")

    val zPath = Files.createTempDirectory("graft-z3").toString
    Layout.writeZOrderedN(li, zPath, zCols, files, bits = 10)

    val linPath = Files.createTempDirectory("graft-lin3").toString
    li.repartitionByRange(files, col("l_extendedprice"))
      .sortWithinPartitions(col("l_extendedprice"))
      .write.mode("overwrite").parquet(linPath)

    val zSum = spark.read.parquet(zPath)
      .agg(count(lit(1)), round(sum(col("l_extendedprice")), 2)).collect()(0)
    val lSum = spark.read.parquet(linPath)
      .agg(count(lit(1)), round(sum(col("l_extendedprice")), 2)).collect()(0)
    assert(zSum == lSum, s"$zSum vs $lSum")

    // Q99's own box predicate: wide on the linear layout's sort column,
    // narrow on the other two — the case a single-column sort cannot prune.
    val ranges = Seq(
      "l_extendedprice" -> (5000.0, 80000.0),
      "l_discount" -> (0.02, 0.04),
      "l_quantity" -> (10.0, 20.0))
    val (zHits, zTotal) = Layout.candidateFilesN(spark, zPath, ranges)
    val (lHits, lTotal) = Layout.candidateFilesN(spark, linPath, ranges)
    assert(zTotal == files && lTotal == files, s"$zTotal/$lTotal files written")
    assert(zHits < lHits,
      s"3-D z-order pruned nothing: z=$zHits vs linear=$lHits of $files files")
    info(s"3-D box candidates: z-order $zHits/$zTotal vs linear $lHits/$lTotal")
  }
}
