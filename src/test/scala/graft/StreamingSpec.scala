package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingOps

/** §2.10 streaming acceptance: streaming forms reach batch-equal final
  * state (t1 assertion); watermark drops late data (C10); stateful ops
  * run (C11).
  */
class StreamingSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Copy the sf0.001 events parquet into a fresh dir as the stream source. */
  private def stageEvents(): String = {
    val dir = tmpDir("graft-stream-src")
    Files.copy(
      Paths.get(sf("sf0.001") + "/events.parquet"),
      Paths.get(dir, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("streaming SCD changelog converges to the batch as-of state over a multi-batch replay") {
    // Stage the event log as THREE time-ordered files so the file source
    // replays them as separate micro-batches (append-log shape) — the
    // changelog must survive cross-batch state, not just one fold.
    val srcDir = tmpDir("graft-cdc-src")
    val ev = Catalog(spark, sf("sf0.001")).events
    val cuts = Seq(
      ("0", col("ts") < 1704931200000000000L),
      ("1", col("ts") >= 1704931200000000000L && col("ts") < 1705795200000000000L),
      ("2", col("ts") >= 1705795200000000000L))
    cuts.foreach { case (name, pred) =>
      val stage = tmpDir(s"graft-cdc-stage$name")
      ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.copy(Paths.get(part), Paths.get(srcDir, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Thread.sleep(20) // distinct mtimes → deterministic batch order
    }
    // transformWithState needs multi-column-family state → RocksDB provider
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val log = try {
      val q = StreamingOps.dimensionStateStream(spark,
          StreamingOps.eventsStream(spark, srcDir, maxFilesPerTrigger = Some(1)))
        .writeStream.format("memory").queryName("cdc_stream")
        .outputMode("update")
        .option("checkpointLocation", tmpDir("graft-ckpt"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      spark.table("cdc_stream").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
    // Final state per user = the changelog row with the max version stamp.
    val finalState = log.groupBy(_._1).map { case (u, rows) =>
      u -> rows.maxBy(r => (r._3, r._4))._2
    }
    val want = graft.operators.Cdc.stateAsOf(ev, Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(finalState == want,
      s"changelog end-state diverges: ${finalState.size} vs ${want.size} users")
    // Incremental proof: at least one user's type actually changed across
    // batches, so the changelog carries more rows than users.
    assert(log.length > want.size, s"no cross-batch change rows: ${log.length}")
  }

  test("Q40 streaming twin reaches batch-equal final state") {
    val src = stageEvents()
    val q = StreamingOps.q40Stream(StreamingOps.eventsStream(spark, src))
      .writeStream
      .format("memory")
      .queryName("q40_stream")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("graft-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("q40_stream")
      .select(col("win_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type").collect()
    val batch = graft.operators.EventTime.q40(spark, sf("sf0.001")).collect()
    assert(streamed.length == batch.length, s"${streamed.length} vs ${batch.length}")
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0) && s.getString(1) == b.getString(1)
        && s.getLong(2) == b.getLong(2)
        && math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-9, s"$s vs $b")
    }
  }

  test("Q41 sliding-window streaming twin reaches batch-equal final state") {
    val src = stageEvents()
    val q = StreamingOps.q41Stream(StreamingOps.eventsStream(spark, src))
      .writeStream
      .format("memory")
      .queryName("q41_stream")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("graft-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("q41_stream")
      .orderBy("win_start", "event_type").collect()
    val batch = graft.operators.EventTime.q41(spark, sf("sf0.001")).collect()
    assert(streamed.length == batch.length, s"${streamed.length} vs ${batch.length}")
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0) && s.getString(1) == b.getString(1)
        && s.getLong(2) == b.getLong(2)
        && math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-9, s"$s vs $b")
    }
  }

  test("Q42 streaming session windows match batch session stats") {
    val src = stageEvents()
    val q = StreamingOps.q42Stream(StreamingOps.eventsStream(spark, src))
      .writeStream
      .format("memory")
      .queryName("q42_stream")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("graft-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // Aggregate the streaming per-session rows to the batch Q42 shape.
    val streamed = spark.table("q42_stream")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        round(avg(col("n_events")), 4).as("avg_events"),
        round(avg(col("dur_us") / 1000000.0), 4).as("avg_dur_s"))
      .orderBy("user_id").collect()
    val batch = graft.operators.EventTime.q42(spark, sf("sf0.001"))
      .orderBy("user_id").collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0), s"user: $s vs $b")
      assert(s.getLong(1) == b.getLong(1), s"n_sessions: $s vs $b")
      assert(math.abs(s.getDouble(2) - b.getDouble(2)) < 1e-6, s"avg_events: $s vs $b")
      assert(math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-6, s"avg_dur: $s vs $b")
    }
  }

  test("stream-stream interval join matches the batch range join (Q11)") {
    val src = stageEvents()
    val q = StreamingOps.viewPurchaseJoinStream(StreamingOps.eventsStream(spark, src))
      .writeStream
      .format("memory")
      .queryName("q11_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("graft-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("q11_stream")
      .groupBy(col("user_id")).agg(count(lit(1)).as("pairs"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val batch = graft.operators.Joins.q11(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.toSeq == batch.toSeq,
      s"${streamed.mkString(",")} vs ${batch.mkString(",")}")
  }

  test("streaming funnel state machine reaches batch-equal stage counts (Q63)") {
    val src = stageEvents()
    val q = StreamingOps.funnelStream(spark, StreamingOps.eventsStream(spark, src))
      .writeStream.format("memory").queryName("q63_stream")
      .outputMode("update")
      .option("checkpointLocation", tmpDir("graft-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // Update mode re-emits a user on every micro-batch; the final stage
    // per user is the max (stages are monotone under accumulation).
    val finalStage = spark.table("q63_stream")
      .groupBy(col("user_id")).agg(max(col("stage")).as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val streamedCounts = (
      finalStage.values.count(_ >= 1).toLong,
      finalStage.values.count(_ >= 2).toLong,
      finalStage.values.count(_ >= 3).toLong)
    val b = graft.operators.EventTime.q63(spark, sf("sf0.001")).collect()(0)
    assert(streamedCounts == ((b.getLong(0), b.getLong(1), b.getLong(2))),
      s"$streamedCounts vs $b")
  }

  test("C10: late rows beyond the watermark are dropped in append mode") {
    import spark.implicits._
    val src = tmpDir("graft-late-src")
    val ckpt = tmpDir("graft-ckpt")
    val hourUs = 3600L * 1000000L
    val base = 1700000000000000L // µs, hour-ish aligned below
    def write(batchId: Int, rows: Seq[(Long, Long)]): Unit =
      rows.toDF("event_id", "us")
        .select(col("event_id"), expr("us * 1000").as("ts"),
          lit(1L).as("user_id"), lit("click").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$src/b$batchId")

    // Batch 1: events now → watermark advances to max - 2h.
    write(1, Seq((1L, base + 10 * hourUs), (2L, base + 10 * hourUs + 1)))
    val stream = spark.readStream.schema(StreamingOps.eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src + "/*")
    val q = StreamingOps.q40StreamWatermarked(stream)
      .writeStream.format("memory").queryName("c10_sink")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      // Batch 2: a row 8 hours older than the watermark → must be dropped.
      write(2, Seq((3L, base + 1 * hourUs)))
      q.processAllAvailable()
      // Batch 3: advance time to flush closed windows into the append sink.
      write(3, Seq((4L, base + 20 * hourUs)))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("c10_sink").collect()
    val lateWin = (base + 1 * hourUs) / hourUs * hourUs
    assert(!rows.exists(_.getLong(0) == lateWin),
      s"late row leaked into sink: ${rows.mkString(";")}")
    val mainWin = (base + 10 * hourUs) / hourUs * hourUs
    assert(rows.exists(r => r.getLong(0) == mainWin && r.getLong(2) == 2L),
      s"on-time window missing: ${rows.mkString(";")}")
  }

  test("C11: streaming dedup within watermark + arbitrary running state") {
    import spark.implicits._
    val src = tmpDir("graft-dedup-src")
    val ckpt1 = tmpDir("graft-ckpt")
    val base = 1700000000000000L
    Seq((1L, base), (1L, base + 1L), (2L, base + 2L))
      .toDF("event_id", "us")
      .select(col("event_id"), expr("us * 1000").as("ts"),
        (col("event_id") % 2).as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$src/b1")

    val dd = StreamingOps.dedupStream(
        spark.readStream.schema(StreamingOps.eventsSchema).parquet(src + "/*"))
      .writeStream.format("memory").queryName("c11_dedup")
      .outputMode("append")
      .option("checkpointLocation", ckpt1)
      .trigger(Trigger.AvailableNow())
      .start()
    dd.awaitTermination(120000)
    val ids = spark.table("c11_dedup").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L), s"dedup kept: ${ids.mkString(",")}")

    val rc = StreamingOps.runningCounts(spark,
        spark.readStream.schema(StreamingOps.eventsSchema).parquet(src + "/*"))
      .writeStream.format("memory").queryName("c11_counts")
      .outputMode("update")
      .option("checkpointLocation", tmpDir("graft-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    rc.awaitTermination(120000)
    val counts = spark.table("c11_counts")
      .groupBy("user_id").agg(max("n_events").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 2L, 0L -> 1L), s"counts=$counts")

    // C11c: the same counter through the Spark 4 transformWithState API.
    // Its ValueState column families need the RocksDB state store
    // provider (the cluster-scale store; the HDFS-backed default cannot
    // host multiple column families) — scoped to this query.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tws = StreamingOps.runningCountsTws(spark,
          spark.readStream.schema(StreamingOps.eventsSchema).parquet(src + "/*"))
        .writeStream.format("memory").queryName("c11_tws")
        .outputMode("update")
        .option("checkpointLocation", tmpDir("graft-ckpt"))
        .trigger(Trigger.AvailableNow())
        .start()
      tws.awaitTermination(120000)
      val twsCounts = spark.table("c11_tws")
        .groupBy("user_id").agg(max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(twsCounts == Map(1L -> 2L, 0L -> 1L), s"twsCounts=$twsCounts")
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("streaming recursive EWMA reaches the batch sequential fold per user") {
    val src = stageEvents()
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingOps.ewmaStream(spark,
          StreamingOps.eventsStream(spark, src))
        .writeStream.format("memory").queryName("ewma_stream")
        .outputMode("update")
        .option("checkpointLocation", tmpDir("graft-ckpt"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      // Update sink may carry one row per trigger: the LAST value per
      // user is the final smoothed state. Single AvailableNow batch here,
      // so it is also the only row.
      val got = spark.table("ewma_stream")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

      // Batch twin: the same (us, event_id)-ordered fold in plain Scala.
      val want = Catalog(spark, sf("sf0.001")).events
        .select(col("user_id"), expr("ts DIV 1000").as("us"),
          col("event_id"), col("value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .groupBy(_._1)
        .map { case (u, rows) =>
          val ys = rows.sortBy(r => (r._2, r._3)).map(_._4)
          u -> ys.tail.foldLeft(ys.head)((y, x) => (y + x) / 2)
        }
      assert(got.keySet == want.keySet,
        s"users differ: ${got.keySet.size} vs ${want.keySet.size}")
      want.foreach { case (u, w) =>
        assert(math.abs(got(u) - w) < 1e-12, s"user $u: got ${got(u)} want $w")
      }
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("streaming sketch aggregation: HLL windows batch-exact, MG carries its guarantee across batches") {
    // Three time-ordered files -> three micro-batches: the sketch agg
    // buffers must survive the state store across batch boundaries.
    val srcDir = tmpDir("graft-sketch-src")
    val ev = Catalog(spark, sf("sf0.001")).events
    val cuts = Seq(
      ("0", col("ts") < 1704931200000000000L),
      ("1", col("ts") >= 1704931200000000000L && col("ts") < 1705795200000000000L),
      ("2", col("ts") >= 1705795200000000000L))
    cuts.foreach { case (name, pred) =>
      val stage = tmpDir(s"graft-sketch-stage$name")
      ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.copy(Paths.get(part), Paths.get(srcDir, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Thread.sleep(20)
    }
    val q = StreamingOps.sketchWindowStream(spark,
        StreamingOps.eventsStream(spark, srcDir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("sketch_stream")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("graft-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sketch_stream").collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[org.apache.spark.sql.Row](1)
            .map(t => t.getString(0) -> t.getLong(1)).toMap,
          r.getLong(2))).toMap

    // HLL: registers are a pure function of the window's user SET ->
    // streamed estimate must equal the batch estimate exactly.
    graft.plans.GraftExtensions.registerRuntime(spark)
    val batch = ev
      .withColumn("ts_micro", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(window(col("ts_micro"), "1 hour"), col("event_type"))
      .count()
    val batchHll = ev
      .withColumn("ts_micro", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(window(col("ts_micro"), "1 hour"))
      .agg(expr("graft_hll_distinct(user_id, 12)").as("hll"))
      .select(unix_micros(col("window.start")), col("hll")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed.keySet == batchHll.keySet)
    streamed.foreach { case (w, (_, users)) =>
      assert(users == batchHll(w), s"window $w: HLL $users != ${batchHll(w)}")
    }

    // MG guarantee per window: every type with true count > n/k is
    // present; every estimate is in [true - n/k, true].
    val trueCounts = batch
      .select(unix_micros(col("window.start")).as("w"), col("event_type"),
        col("count")).collect()
      .groupBy(_.getLong(0))
      .map { case (w, rows) =>
        w -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap }
    trueCounts.foreach { case (w, counts) =>
      val n = counts.values.sum
      val bound = n / 8
      val (mg, _) = streamed(w)
      counts.filter(_._2 > bound).foreach { case (t, c) =>
        assert(mg.contains(t), s"window $w: heavy type $t (count $c) missing")
      }
      mg.foreach { case (t, est) =>
        val c = counts.getOrElse(t, 0L)
        assert(est <= c && est >= c - bound,
          s"window $w type $t: est $est outside [${c - bound}, $c]")
      }
    }
  }

  test("streaming parquet file sink lands batch-equal rows (exactly-once commit log)") {
    val src = stageEvents()
    val outDir = tmpDir("graft-stream-sink")
    // Append-mode file sink needs a watermark-finalized aggregate; use the
    // watermarked Q40 so windows close and flush to files.
    val q = StreamingOps.q40StreamWatermarked(StreamingOps.eventsStream(spark, src))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", tmpDir("graft-ckpt"))
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // With AvailableNow + watermark, all but the trailing window(s) are
    // finalized; every landed row must match its batch twin exactly.
    val landed = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val batch = graft.operators.EventTime.q40(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(landed.nonEmpty, "no finalized windows landed")
    landed.foreach { case (k, v) =>
      assert(batch.contains(k) && batch(k)._1 == v._1
        && math.abs(batch(k)._2 - v._2) < 1e-9, s"$k -> $v vs ${batch.get(k)}")
    }
  }

  test("heavy-hitters sketch aggregates incrementally over a stream (exact regime)") {
    graft.plans.GraftExtensions.registerRuntime(spark)
    val src = stageEvents()
    val q = StreamingOps.eventsStream(spark, src)
      .groupBy()
      .agg(call_function("graft_heavy_hitters", col("event_type"), lit(8)).as("hh"))
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("graft-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("hh_stream")
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 5 event types << k=8: the sketch is exact, so the streaming state
    // (serialized MgSketch merged across micro-batches) must reproduce the
    // exact batch counts.
    val batch = Catalog(spark, sf("sf0.001")).events
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"$streamed vs $batch")
  }

  test("streaming transition extractor aggregates to the batch Markov matrix (Q79)") {
    val src = stageEvents()
    val q = StreamingOps.transitionStream(spark, StreamingOps.eventsStream(spark, src))
      .writeStream.format("memory").queryName("trans_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("graft-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("trans_stream")
      .groupBy(col("event_type"), col("next_type")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.operators.Profiling.q79(spark, sf("sf0.001"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, s"$streamed vs $batch")
  }

  test("stream-static enrichment join is batch-equal and needs no join state") {
    val src = stageEvents()
    val customer = Catalog(spark, sf("sf0.001")).customer
    val q = StreamingOps.enrichedStream(StreamingOps.eventsStream(spark, src), customer)
      .writeStream.format("memory").queryName("enriched_stream")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("graft-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("enriched_stream")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val c = Catalog(spark, sf("sf0.001"))
    val dim = c.customer
      .select((col("c_custkey") % 100).as("user_id"), col("c_mktsegment"))
      .groupBy(col("user_id")).agg(min(col("c_mktsegment")).as("segment"))
    val batch = c.events
      .join(dim, Seq("user_id"), "left")
      .groupBy(col("event_type"), coalesce(col("segment"), lit("UNKNOWN")).as("segment"))
      .count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, s"$streamed vs $batch")
  }

  test("streamed Q234 manifest equals the batch manifest across a multi-batch replay") {
    // Stage the documents as THREE doc_id-ranged files so the additive
    // fingerprint state must fold across micro-batch boundaries — the
    // property that makes the manifest maintainable over continuous
    // ingest (sum mod p is associative/commutative, so batch boundaries
    // cannot matter).
    val srcDir = tmpDir("graft-manifest-src")
    val docs = Catalog(spark, sf("sf0.001")).documents
    val ids = docs.agg(min(col("doc_id")), max(col("doc_id"))).collect()(0)
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val c1 = lo + (hi - lo) / 3; val c2 = lo + 2 * (hi - lo) / 3
    val cuts = Seq(
      ("0", col("doc_id") <= c1),
      ("1", col("doc_id") > c1 && col("doc_id") <= c2),
      ("2", col("doc_id") > c2))
    cuts.foreach { case (name, pred) =>
      val stage = tmpDir(s"graft-manifest-stage$name")
      docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.copy(Paths.get(part), Paths.get(srcDir, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Thread.sleep(20)
    }
    val q = StreamingOps.manifestStream(
        StreamingOps.documentsStream(spark, srcDir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("manifest_stream")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("graft-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("manifest_stream").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // batch contract rows (drop the TOTAL rollup — the stream maintains
    // per-source state; TOTAL is a read-time fold)
    val batchMap = graft.operators.Profiling.q234(spark, sf("sf0.001"))
      .filter(col("source") =!= "TOTAL").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_chars"), r.getAs[Long]("fp")))
      .toMap
    assert(streamed == batchMap, s"streamed $streamed vs batch $batchMap")
  }

  test("streamed Q268 SCD2 closed versions equal the batch history across a day-split replay") {
    // Three time-ordered files cut on DAY boundaries (the scd2Stream
    // ingest contract: a day never straddles micro-batches), so the
    // version chain must close correctly across batch boundaries.
    val srcDir = tmpDir("graft-scd2-src")
    val ev = Catalog(spark, sf("sf0.001")).events
    val cuts = Seq(
      ("0", col("ts") < 1704931200000000000L),
      ("1", col("ts") >= 1704931200000000000L && col("ts") < 1705795200000000000L),
      ("2", col("ts") >= 1705795200000000000L))
    cuts.foreach { case (name, pred) =>
      val stage = tmpDir(s"graft-scd2-stage$name")
      ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.copy(Paths.get(part), Paths.get(srcDir, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Thread.sleep(20)
    }
    val q = StreamingOps.scd2Stream(
        StreamingOps.eventsStream(spark, srcDir, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("scd2_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("graft-scd2-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("scd2_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // Batch contract: every PROVABLY closed version. Closing version k
    // requires FINALIZING the first day of version k+1 (a later day must
    // arrive — last-event-wins means a day's state is not final until the
    // day is over), so when the successor is the CURRENT version with
    // exactly one observed day, the close is not yet provable and stays
    // in state. Everything else must match exactly.
    val all = graft.operators.Cdc.q268(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version")) ->
        (r.getAs[String]("state"), r.getAs[Long]("valid_from_day"),
          r.getAs[Long]("valid_to_day"), r.getAs[Long]("n_obs_days"),
          r.getAs[Long]("is_current")))
      .toMap
    val batch = all.collect {
      case ((u, v), (st, from, to, obs, cur))
          if cur == 0 && !all.get((u, v + 1)).exists(nx =>
            nx._5 == 1 && nx._4 == 1) =>
        (u, v) -> (st, from, to, obs)
    }
    assert(streamed.size == batch.size,
      s"closed-version count ${streamed.size} != batch ${batch.size}")
    assert(streamed == batch)
  }

  test("streamed online W1 drift monitor equals the batch replay across a day-split") {
    val k = 14
    val bucketed = Catalog(spark, sf("sf0.001")).events
      .select(col("event_type"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        expr("CAST(ROUND(value * 100, 0) AS LONG) DIV 100").as("bucket"))
      .groupBy(col("event_type"), col("day"), col("bucket"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val rows = bucketed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(p => (p._1, p._2, p._3))
    val days = rows.map(_._2).distinct.sorted
    val cutA = days(days.length / 4)
    val cutB = days(days.length / 2)
    val srcDir = tmpDir("graft-w1-src")
    Seq(("0", (d: Long) => d <= cutA),
      ("1", (d: Long) => d > cutA && d <= cutB),
      ("2", (d: Long) => d > cutB)).foreach { case (name, pred) =>
      import spark.implicits._
      val stage = tmpDir(s"graft-w1-stage$name")
      rows.filter(p => pred(p._2)).toSeq
        .toDF("event_type", "day", "bucket", "cnt")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.copy(Paths.get(part), Paths.get(srcDir, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Thread.sleep(20)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = StreamingOps.w1DriftStream(stream, k)
      .toDF("event_type", "day", "phase", "n_live", "w1_num", "w1_den")
      .writeStream.format("memory").queryName("w1_stream")
      .outputMode("update")
      .option("checkpointLocation", tmpDir("graft-w1-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("w1_stream").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // Batch replay of the identical semantics.
    rows.groupBy(_._1).foreach { case (t, series) =>
      val byDay = series.groupBy(_._2).toSeq.sortBy(_._1)
      val calDays = byDay.map(_._1).take(k).toSet
      val ref = series.filter(p => calDays(p._2)).groupBy(_._3)
        .map { case (b, g) => b -> g.map(_._4).sum }
      var live = Map.empty[Long, Long]
      byDay.foreach { case (day, dayRows) =>
        val expected =
          if (calDays(day)) ("calibrating", 0L, 0L, 0L)
          else {
            live = dayRows.foldLeft(live) { case (h, (_, _, b, n)) =>
              h.updated(b, h.getOrElse(b, 0L) + n)
            }
            val nR = ref.values.sum
            val nL = live.values.sum
            val grid = (ref.keySet ++ live.keySet).toSeq.sorted
            var (cumR, cumL, num) = (0L, 0L, 0L)
            grid.zip(grid.tail).foreach { case (b, nxt) =>
              cumR += ref.getOrElse(b, 0L)
              cumL += live.getOrElse(b, 0L)
              num += math.abs(cumR * nL - cumL * nR) * (nxt - b)
            }
            (if (num > 2 * nR * nL) "drift" else "monitoring",
              nL, num, nR * nL)
          }
        assert(streamed((t, day)) == expected,
          s"$t day $day: ${streamed((t, day))} != $expected")
      }
      assert(streamed.keys.count(_._1 == t) == byDay.length)
    }
  }

  test("streamed online CUSUM equals the sequential fold across a day-split replay") {
    // Daily grid recomputed independently of the operator helpers.
    val daily = Catalog(spark, sf("sf0.001")).events
      .select(col("event_type"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).cast("long").as("v"))
    val rows = daily.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(p => (p._1, p._2))
    val days = rows.map(_._2).distinct.sorted
    // Three day-range files -> three micro-batches; calibration (first
    // 14 days) must freeze across a batch boundary, not inside one fold.
    val cutA = days(days.length / 4)
    val cutB = days(days.length / 2)
    val srcDir = tmpDir("graft-cusum-src")
    Seq(("0", (d: Long) => d <= cutA),
      ("1", (d: Long) => d > cutA && d <= cutB),
      ("2", (d: Long) => d > cutB)).foreach { case (name, pred) =>
      import spark.implicits._
      val stage = tmpDir(s"graft-cusum-stage$name")
      rows.filter(p => pred(p._2)).toSeq.toDF("event_type", "day", "v")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.copy(Paths.get(part), Paths.get(srcDir, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Thread.sleep(20)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val k = 14
    val q = StreamingOps.cusumStream(stream, k)
      .toDF("event_type", "day", "phase", "cusum", "alarm_day")
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("update")
      .option("checkpointLocation", tmpDir("graft-cusum-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("cusum_stream").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4)))
      .toMap
    // Sequential fold of the identical semantics, one pass per type.
    rows.groupBy(_._1).foreach { case (t, series) =>
      val sorted = series.sortBy(_._2)
      val cal = sorted.take(k)
      val sCal = cal.map(_._3).sum
      val mad = cal.map(p => math.abs(k * p._3 - sCal)).sum
      var cu = 0L
      var alarm = -1L
      sorted.zipWithIndex.foreach { case ((_, day, v), i) =>
        val expected =
          if (i < k) ("calibrating", 0L, -1L)
          else {
            cu += k * v - sCal
            if (alarm < 0 && math.abs(cu) > 4 * mad) alarm = day
            (if (alarm >= 0) "drift" else "monitoring", cu, alarm)
          }
        assert(streamed((t, day)) == expected,
          s"$t day $day: ${streamed((t, day))} != $expected")
      }
      // every emitted day is accounted for (no phantom rows)
      assert(streamed.keys.count(_._1 == t) == sorted.length)
    }
  }

  test("streamed online drawdown monitor equals a sequential scan and batch Q323 across a day-split") {
    val grid = {
      // zero-filled daily cents grid, recomputed independently
      val daily = Catalog(spark, sf("sf0.001")).events
        .select(col("event_type"),
          expr("(ts DIV 1000) DIV 86400000000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS LONG)").as("cents"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("cents")).cast("long").as("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val dmin = daily.map(_._2).min
      val dmax = daily.map(_._2).max
      val m = daily.map(t => (t._1, t._2) -> t._3).toMap
      (for {
        t <- daily.map(_._1).distinct
        d <- dmin to dmax
      } yield (t, d, m.getOrElse((t, d), 0L))).sortBy(p => (p._1, p._2))
    }
    val days = grid.map(_._2).distinct.sorted
    val cutA = days(days.length / 4)
    val cutB = days(days.length / 2)
    val srcDir = tmpDir("graft-dd-src")
    Seq(("0", (d: Long) => d <= cutA),
      ("1", (d: Long) => d > cutA && d <= cutB),
      ("2", (d: Long) => d > cutB)).foreach { case (name, pred) =>
      import spark.implicits._
      val stage = tmpDir(s"graft-dd-stage$name")
      grid.filter(p => pred(p._2)).toSeq.toDF("event_type", "day", "v")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.copy(Paths.get(part), Paths.get(srcDir, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Thread.sleep(20)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = StreamingOps.drawdownStream(stream)
      .toDF("event_type", "day", "v", "runmax", "dd", "max_dd",
        "trough_day", "peak_cents", "recovered")
      .writeStream.format("memory").queryName("dd_stream")
      .outputMode("update")
      .option("checkpointLocation", tmpDir("graft-dd-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("dd_stream").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getBoolean(8)))
      .toMap
    // Sequential replay of the identical semantics.
    val batch = graft.operators.Trend.q323(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r).toMap
    grid.groupBy(_._1).foreach { case (t, series) =>
      var runmax = Long.MinValue
      var maxDd = -1L; var troughDay = 0L; var peak = 0L
      var recovered = false
      series.sortBy(_._2).foreach { case (_, day, v) =>
        runmax = math.max(runmax, v)
        val dd = runmax - v
        if (dd > maxDd) {
          maxDd = dd; troughDay = day; peak = runmax
          recovered = v >= runmax
        } else if (day >= troughDay && v >= peak) recovered = true
        assert(streamed((t, day)) ==
          ((runmax, dd, maxDd, troughDay, peak, recovered)),
          s"$t day $day")
      }
      // final state agrees with batch Q323
      val row = batch(t)
      assert(row.getAs[Long]("peak_cents") == peak, s"$t: batch peak")
      assert(row.getAs[Long]("trough_day") == troughDay, s"$t: batch trough")
      assert(row.getAs[Long]("max_dd_cents") == maxDd, s"$t: batch dd")
      val expectVerdict =
        if (maxDd == 0) "monotone_peak"
        else if (recovered) "recovered" else "underwater"
      assert(row.getAs[String]("verdict") == expectVerdict, s"$t: verdict")
    }
  }
}
