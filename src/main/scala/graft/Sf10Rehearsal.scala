package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** sf10 dress-rehearsal runner (r10 verdict item 8) — a DEV TOOL. Runs the
  * derived builds plus a hand-picked set of the heaviest scale-safe legs
  * against an [[Sf10Gen]] directory, with a task-metrics listener that
  * reports per-leg wall time, memory/disk SPILL bytes, shuffle write
  * bytes, and peak single-task execution memory — the "where does the
  * first spill appear" measurement SCALE.md's analysis is pinned to.
  *
  * Usage: runMain graft.Sf10Rehearsal [dir=/tmp/graft-sf10] [legs...]
  */
object Sf10Rehearsal {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle-partition override for wide-output legs (r14): Q198's
    // declared sf10 output is ~1.7G rows, and 64 partitions put ~750 MB
    // under each of 32 concurrent sorts — execution memory fragments
    // (UNABLE_TO_ACQUIRE) before the spill threshold helps. More, smaller
    // partitions are the guide-§2.2 sizing; AQE still coalesces small
    // stages, so light legs are unaffected.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spillMem = new AtomicLong(0L)
    val spillDisk = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    val peakTaskMem = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          peakTaskMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
        }
      }
    })

    def mb(b: Long): String = f"${b / 1048576.0}%.1f"

    def leg(name: String)(body: => Unit): Unit = {
      spark.catalog.clearCache()
      System.gc()
      val before = spark.sparkContext.getPersistentRDDs.keySet
      spillMem.set(0); spillDisk.set(0); shufWrite.set(0); shufRead.set(0)
      peakTaskMem.set(0)
      val t0 = System.nanoTime()
      val ok = try { body; true } catch {
        case e: Throwable =>
          println(s"""{"leg":"$name","error":"${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").take(120).replace('"', ' ')}"}""")
          false
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // wait for straggler task-end events before reading the counters
      Thread.sleep(500)
      if (ok) println(f"""{"leg":"$name","sec":$sec%.1f,"spill_mem_mb":${
        mb(spillMem.get)},"spill_disk_mb":${mb(spillDisk.get)},"shuffle_write_mb":${
        mb(shufWrite.get)},"shuffle_read_mb":${mb(shufRead.get)},"peak_task_mem_mb":${
        mb(peakTaskMem.get)}}""")
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
    }

    // Build legs are selectable by name like query legs. The r11
    // rehearsal measured `neardup_build` EXHAUSTING THE DISK at sf10
    // (exact PPJoin candidate mass → n² on the low-entropy fixture
    // vocabulary); since r12 the adaptive LSH fallback
    // (TextOps.jaccardFromTokens) makes the same leg complete in ~130 s
    // with ~4 GB scratch — see SCALE.md finding 1 (RESOLVED).
    val defaultLegs = Seq("derived_build", "tri_build", "daily_grid_build",
      "lpa_build", "neardup_build", "Q13", "Q05", "Q103", "Q117",
      "Q145", "Q156", "Q160", "Q161", "Q218", "Q248", "Q334", "Q335",
      "Q345")
    // `all` (r11 verdict item 5): the WHOLE registry, one run per leg,
    // builds first, with the known-heaviest wedge-mass legs deferred to
    // the very end so an interrupted sweep still yields full-family
    // coverage. Meant for a 48 GB heap (SPARK_DRIVER_MEM=48g) — Q145's
    // exact enumeration OOMs the 8 GB dev default (SCALE.md finding 3).
    val heavyTail = Seq("Q334", "Q117", "Q103", "Q145")
    val legs =
      if (args.drop(1).toSeq == Seq("all"))
        Seq("derived_build", "tri_build", "daily_grid_build", "lpa_build",
          "neardup_build") ++
          (SparkEntry.queries.keys.toSeq.sorted.filterNot(heavyTail.contains)
            ++ heavyTail)
      else if (args.length > 1) args.drop(1).toSeq
      else defaultLegs

    legs.foreach {
      case "derived_build" => leg("derived_build") {
        operators.Derived.rebuildCoOrderPairCounts(spark, dir) }
      case "tri_build" => leg("tri_build") {
        operators.Derived.rebuildTriangleCounts(spark, dir) }
      case "daily_grid_build" => leg("daily_grid_build") {
        operators.Derived.rebuildDailyCentsGrid(spark, dir) }
      case "lpa_build" => leg("lpa_build") {
        operators.Derived.rebuildLpaLabels(spark, dir) }
      case "neardup_build" => leg("neardup_build") {
        operators.Derived.rebuildNearDupClusters(spark, dir) }
      case "fastss_build" => leg("fastss_build") {
        operators.Derived.rebuildFastssSignatures(spark, dir, 2) }
      case q => leg(q) {
        SparkEntry.queries(q)(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
