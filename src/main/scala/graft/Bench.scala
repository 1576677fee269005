package graft

import org.apache.spark.sql.SparkSession

/** BENCH harness (BASELINE.md protocol): warm-up, 3 timed runs per query,
  * median reported; results fully materialized via the no-op sink (every
  * operator runs, nothing collects to the driver); CP-ALS timed separately
  * on the Q43 tensor. Prints exactly one JSON line.
  */
object Bench {
  /** Locale-pinned decimal format: the f interpolator uses the JVM default
    * locale, and a comma-decimal locale would make the bench stdout/
    * BENCH_LAST.json line unparseable JSON (ADVICE r7). */
  private def d(pattern: String, v: Double): String =
    String.format(java.util.Locale.ROOT, pattern, Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = newSession()

    def materialize(name: String): Double = {
      // Drop any relation an operator cached during a previous run: the
      // cache manager matches canonicalized plans, so a leaked cache would
      // let the 2nd/3rd timed runs read cached data and under-report the
      // protocol's "fully-materialized runs" (and caches would accumulate
      // across the whole 61-query session).
      spark.catalog.clearCache()
      // Collect the previous queries' garbage OUTSIDE the timed region:
      // in a full-registry session a deferred full GC otherwise lands on
      // an arbitrary query and can span all of its timed runs (observed:
      // a 9x one-off on Q98 that re-measured at 1x in the next session
      // and in isolation).
      System.gc()
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val sec =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      // Unpersist the localCheckpoint RDD blocks this run created (r10
      // verdict #2): clearCache() covers DataFrame caches but NOT
      // checkpoint blocks, which otherwise accumulate block-manager debt
      // across the 335-leg session — the prime suspect for the 2-6x
      // late-position inflation the driver's full-registry runs showed on
      // checkpoint-heavy legs (Q248/Q103/Q156/Q160). Outside the timed
      // region; non-blocking so the removal overlaps the next GC.
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
      sec
    }

    // Warm-up: JVM/codegen/parquet-footer caches.
    materialize("Q01")

    // Derived artifacts: force a FRESH build and time it as its own leg.
    // The graph family (Q103/Q106/Q107) then benches as pure consumers of
    // the bucketed artifact, and stale /tmp state from a previous run can
    // never flatter the query timings.
    val derivedBuild =
      try {
        val t0 = System.nanoTime()
        operators.Derived.rebuildCoOrderPairCounts(spark, sfDir)
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }

    // Triangle-count artifact (Q103/Q145 consume; r13): same protocol.
    // Runs AFTER derivedBuild — it reads the co-pair artifact.
    val triBuild =
      try {
        val t0 = System.nanoTime()
        operators.Derived.rebuildTriangleCounts(spark, sfDir)
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }

    // Near-dup cluster artifact (Q67/Q68/Q187/Q196 consume): same
    // force-fresh-and-time-separately protocol as the co-order pairs.
    val nearDupBuild =
      try {
        val t0 = System.nanoTime()
        operators.Derived.rebuildNearDupClusters(spark, sfDir)
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }

    // Daily-cents-grid artifact (the ~34-gate Stats/Trend/Behavior spine
    // consumes): same force-fresh-and-time-separately protocol.
    val dailyGridBuild =
      try {
        val t0 = System.nanoTime()
        operators.Derived.rebuildDailyCentsGrid(spark, sfDir)
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }

    // LPA community-label artifact (Q156/Q342 consume): same protocol.
    // Runs AFTER derivedBuild — it reads the co-pair artifact.
    val lpaBuild =
      try {
        val t0 = System.nanoTime()
        operators.Derived.rebuildLpaLabels(spark, sfDir)
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }

    // Dev-only subset: `runMain graft.Bench Q102 Q103`, or
    // `runMain graft.Bench tensors` for the tensor legs alone (isolates
    // them from end-of-session registry pressure). The driver passes no
    // args, so its runs always time the full registry.
    val tensorsOnly = args.sameElements(Array("tensors"))
    val names =
      if (tensorsOnly) Seq.empty
      else if (args.nonEmpty) args.toSeq.sorted
      else SparkEntry.queries.keys.toSeq.sorted
    // Runs stay back-to-back per query (NOT interleaved across the
    // registry): with >100 codegen units live, interleaving makes every
    // run miss the bounded generated-class cache and re-pay compilation —
    // measured +35% on the whole registry. The session-stall risk that
    // interleaving would have hedged is addressed by the untimed
    // System.gc() in materialize() instead.
    //
    // Session recycling (VERDICT r7 #3): a 155-query x 3-run session
    // accumulates block-manager state (localCheckpoint RDD blocks) and
    // old-gen heap debt that the per-query System.gc() bounds but does
    // not eliminate; late-position graph legs (Q103/Q145) measured up to
    // 3.7x their dedicated-session medians under that pressure. Restart
    // the session every RECYCLE queries (untimed, ~1-2s each) so no leg
    // carries more than a bounded chunk of debt. The JVM-global codegen
    // class cache survives the restart, so back-to-back runs still hit it;
    // the Derived bucketed artifact re-registers from disk in the fresh
    // session (Derived.coOrderPairCounts external-table path).
    val RECYCLE = 30
    // The first chunk otherwise times its queries in the SAME session
    // that just ran the two derived builds (~17 s of heavy shuffle/GC
    // debt) — measured as Q103 at 9.35 s full-registry vs a 2.7–4.2 s
    // dedicated median (VERDICT r9 #6, the half of the r8 hygiene item
    // that the chunk recycling didn't cover). Recycle once after the
    // builds so chunk 1 starts as clean as every later chunk.
    if (names.nonEmpty) {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      spark = newSession()
      materialize(names.head)
    }
    // Session-pressure sentinels (VERDICT r11 #4): re-time the same two
    // trivial, unchanged legs (Q01 metadata counts, Q13 TPC-H Q1) at the
    // START, MIDDLE, and END of the full-registry session and publish the
    // three medians. BENCH r10 and r11 both showed 2–6× late-leg
    // inflation in the driver's session that dedicated re-measures did
    // not reproduce; the engine-side hygiene (cache clears, checkpoint
    // unpersist, chunk recycling) is in place, so the remaining drift is
    // machine pressure the engine cannot fix — these make it LEGIBLE: a
    // judge normalizes any suspect leg by the sentinel ratio at its
    // session position (protocol in docs/BENCH_NOTES.md). Mid/end
    // sentinels run immediately AFTER a chunk finishes (before its
    // recycle), where accumulated session debt is at its local maximum.
    def sentinel(): String =
      Seq("Q01", "Q13").map { q =>
        val runs = (1 to 3).map(_ => materialize(q)).filter(_ >= 0).sorted
        val med = if (runs.isEmpty) -1.0 else runs(runs.length / 2)
        "\"" + q + "\":" + d("%.3f", med)
      }.mkString("{", ",", "}")
    val sentinels = scala.collection.mutable.LinkedHashMap[String, String]()
    val chunks = names.grouped(RECYCLE).toSeq
    if (names.nonEmpty) sentinels("start") = sentinel()
    val results = chunks.zipWithIndex.flatMap { case (chunk, ci) =>
      if (chunk.head != names.head) {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        spark = newSession()
        // Prime the fresh session OUTSIDE any timed region: the first
        // post-recycle query otherwise absorbs the old context's async
        // teardown (executor/block-manager cleanup of 30 queries' state)
        // plus fresh-session catalog/footer setup across ALL THREE of its
        // timed runs — observed as Q145 at 8.66 s full-registry vs 3.07 s
        // dedicated on the same build. One untimed materialization of the
        // chunk head soaks both before timing starts.
        materialize(chunk.head)
      }
      val timed = chunk.map { name =>
        val runs = (1 to 3).map(_ => materialize(name)).filter(_ >= 0).sorted
        val median = if (runs.isEmpty) -1.0 else runs(runs.length / 2)
        name -> median
      }
      if (ci == (chunks.length - 1) / 2) sentinels("mid") = sentinel()
      if (ci == chunks.length - 1) sentinels("end") = sentinel()
      timed
    }

    // CP-ALS on the Q43 events tensor (rank 8, fixed 10 iterations).
    // Skipped on dev subset runs — it times the tensor loop, not a query.
    val cpals =
      if (args.nonEmpty && !tensorsOnly) """{"sec_per_iter":-1}"""
      else try {
        val coo = operators.EventTime.q43(spark, sfDir)
        val t0 = System.nanoTime()
        val model = tensor.CPALS.fit(coo, rank = 8, seed = 42, tol = 0.0,
          maxIter = 10, numSlabs = cpus.toInt)
        val total = (System.nanoTime() - t0) / 1e9
        val perIter = total / model.iterations
        s"""{"sec_per_iter":${d("%.4f", perIter)},"iters":${model.iterations},"fit":${d("%.6f", model.finalFit)}}"""
      } catch { case _: Throwable => """{"sec_per_iter":-1}""" }

    // Nonnegative CP via HALS on the same tensor (the Q43 values are sums
    // of nonnegative event values, so the NN model is meaningful here).
    // Skipped on dev subset runs.
    val nnhals =
      if (args.nonEmpty && !tensorsOnly) """{"sec_per_iter":-1}"""
      else try {
        val coo = operators.EventTime.q43(spark, sfDir)
        val t0 = System.nanoTime()
        val model = tensor.NnHals.fit(coo, rank = 8, seed = 42, tol = 0.0,
          maxIter = 10, numSlabs = cpus.toInt)
        val total = (System.nanoTime() - t0) / 1e9
        val perIter = total / model.iterations
        s"""{"sec_per_iter":${d("%.4f", perIter)},"iters":${model.iterations},"fit":${d("%.6f", model.finalFit)}}"""
      } catch { case _: Throwable => """{"sec_per_iter":-1}""" }

    // Tucker/HOSVD on the same tensor (skipped on dev subset runs).
    val tucker =
      if (args.nonEmpty && !tensorsOnly) """{"sec":-1}"""
      else try {
        val coo = operators.EventTime.q43(spark, sfDir).selectExpr("i", "j", "k", "v")
        // Clamp target ranks to the tier's tensor dims (rank <= dim is
        // Tucker's loud contract; at sf0.001 mode 1 is only 15 wide).
        val dims = coo.selectExpr(
          "cast(max(i) as long)", "cast(max(j) as long)", "cast(max(k) as long)").head()
        val ranks = (
          math.min(16, dims.getLong(0).toInt + 1),
          math.min(4, dims.getLong(1).toInt + 1),
          math.min(16, dims.getLong(2).toInt + 1))
        val t0 = System.nanoTime()
        val m = tensor.Tucker.hosvd(coo, ranks)
        val sec = (System.nanoTime() - t0) / 1e9
        s"""{"sec":${d("%.4f", sec)},"fit":${d("%.6f", m.fit)}}"""
      } catch { case _: Throwable => """{"sec":-1}""" }

    // The driver's bench artifact retains only a ~2000-char stdout tail
    // (with ~85 of that spent on sbt's [success] trailer); the r7 line
    // measured ~1980 chars and still lost its head, leaving parsed:null
    // (VERDICT r7 #8). Stdout therefore prints 2-decimal legs (10ms
    // resolution — inside the box's measured ±6% run-to-run band) AND
    // flattens the tensor legs to their bare headline numbers (~110 chars
    // saved); the repo copy in docs/BENCH_LAST.json keeps 4 decimals and
    // the full tensor objects (iters/fit).
    val sentinelJson = sentinels
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // All-in total (r14, VERDICT r13 item 5): queries + every build leg +
    // the tensor legs' full wall time — the accounting that cannot be
    // gamed by moving work into an excluded leg. Published NEXT TO the
    // existing `value` (which stays the sum of query legs only, as every
    // prior round's artifact defined it) — additions-only.
    def headlineD(obj: String, field: String): Double = {
      val m = (s""""$field":(-?[0-9.]+)""").r.findFirstMatchIn(obj)
      m.map(_.group(1).toDouble).getOrElse(-1.0)
    }
    val allIn = {
      val q = results.map(_._2).filter(_ >= 0).sum
      val builds = Seq(derivedBuild, triBuild, nearDupBuild, dailyGridBuild,
        lpaBuild).filter(_ >= 0).sum
      val cpTotal = math.max(0.0, headlineD(cpals, "sec_per_iter")) *
        math.max(0.0, headlineD(cpals, "iters"))
      val nnTotal = math.max(0.0, headlineD(nnhals, "sec_per_iter")) *
        math.max(0.0, headlineD(nnhals, "iters"))
      val tkTotal = math.max(0.0, headlineD(tucker, "sec"))
      q + builds + cpTotal + nnTotal + tkTotal
    }
    def line(fmt: Double => String, sf: String, tensorObjects: Boolean): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      def headline(obj: String, field: String): String = {
        val m = (s""""$field":(-?[0-9.]+)""").r.findFirstMatchIn(obj)
        m.map(_.group(1)).getOrElse("-1")
      }
      val (cp, nn, tk) =
        if (tensorObjects) (cpals, nnhals, tucker)
        else (headline(cpals, "sec_per_iter"), headline(nnhals, "sec_per_iter"),
          headline(tucker, "sec"))
      s"""{"metric":"total","value":${fmt(total)},"value_all_in":${fmt(allIn)},"unit":"sec","queries":$qs,"cpals":$cp,"nnhals":$nn,"tucker":$tk,"derived_build":${fmt(derivedBuild)},"tri_build":${fmt(triBuild)},"neardup_build":${fmt(nearDupBuild)},"daily_grid_build":${fmt(dailyGridBuild)},"lpa_build":${fmt(lpaBuild)},"sentinels":$sentinelJson,"sf":"$sf"}"""
    }
    // Stdout form: trailing zeros trimmed ("0.10"→"0.1", "3.00"→"3" —
    // still valid JSON numbers) and sf as its basename; every byte helps
    // the full line survive the collector's bounded tail.
    def compact(v: Double): String =
      if (v < 0) "-1"
      else {
        val s = d("%.2f", v)
        if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
      }
    println(line(compact, sfDir.split('/').last, tensorObjects = false))
    // The registry outgrew the collector's 2000-char tail again (179+ legs
    // ≈ 2,150 chars at 2-decimal compaction vs ~1,915 usable after sbt's
    // trailer), so a truncated head would leave the line unparseable every
    // round. Print a complete SUMMARY line LAST: the tail then carries the
    // end of the full map (most legs) plus this whole line — and since
    // truncation removes the full map's leading '{"metric"' marker, any
    // parser scanning the tail finds exactly one complete JSON object.
    // The authoritative full-precision map stays in docs/BENCH_LAST.json.
    locally {
      val total = results.map(_._2).filter(_ >= 0).sum
      def headline(obj: String, field: String): String = {
        val m = (s""""$field":(-?[0-9.]+)""").r.findFirstMatchIn(obj)
        m.map(_.group(1)).getOrElse("-1")
      }
      val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(8)
        .map { case (k, v) => "\"" + k + "\":" + compact(v) }.mkString("{", ",", "}")
      println(s"""{"metric":"total","value":${compact(total)},"value_all_in":${compact(allIn)},"unit":"sec","n_queries":${results.size},"slowest":$slowest,"cpals":${headline(cpals, "sec_per_iter")},"nnhals":${headline(nnhals, "sec_per_iter")},"tucker":${headline(tucker, "sec")},"derived_build":${compact(derivedBuild)},"tri_build":${compact(triBuild)},"neardup_build":${compact(nearDupBuild)},"daily_grid_build":${compact(dailyGridBuild)},"lpa_build":${compact(lpaBuild)},"sentinels":$sentinelJson,"queries_map":"docs/BENCH_LAST.json","sf":"${sfDir.split('/').last}"}""")
    }
    // Only a full-registry (driver-shaped) run AT THE DRIVER'S SF may
    // refresh the repo copy — a dev subset would clobber it with a partial
    // map, and a CI sf0.001 sweep would clobber it with the wrong tier's
    // numbers.
    if (args.isEmpty && sfDir.split('/').last == "sf0.1") {
      val full = line(v => if (v < 0) "-1" else d("%.4f", v), sfDir,
        tensorObjects = true) + "\n"
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("docs/BENCH_LAST.json"), full.getBytes("UTF-8"))
      catch { case _: Throwable => () }
      // Per-core archive (r14, VERDICT r13 item 6): the driver re-runs the
      // bench at a lower core count AFTER its main run, which used to
      // clobber BENCH_LAST.json and lose the 32-core per-query map. A
      // core-count-suffixed copy preserves every map of the round.
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(s"docs/BENCH_LAST_c$cpus.json"),
        full.getBytes("UTF-8"))
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
