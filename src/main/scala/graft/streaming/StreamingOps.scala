package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming forms of the event-time operators (SURVEY.md §2.10).
  *
  * The batch twins (graft.operators.EventTime Q40–Q42) are the DuckDB
  * hash-checked contract; these streaming forms run the SAME Catalyst plan
  * incrementally (micro-batch), so their final sink state must equal the
  * batch result — asserted in StreamingSpec by replaying the events parquet
  * through a file-source stream.
  *
  * Scale notes: state per key lives in the executor-local state store
  * (RocksDB/HDFS-backed on a cluster); watermarks bound state size —
  * without one, windowed state grows forever, which is why C10 is part of
  * the contract. Aggregations are keyed on (window, type) / session —
  * bounded cardinality, partitioned by key across executors.
  */
object StreamingOps {

  /** events schema under the engine's normalized convention (ts: epoch-ns
    * LongType). Synthetic test fixtures write files in this shape directly;
    * driver-generated parquet carries ts as timestamp[us] instead, which
    * `eventsStream` detects by probing the files and normalizes on read.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet files.
    * `maxFilesPerTrigger` caps files per micro-batch (source option —
    * the lever that turns a staged multi-file log into a multi-batch
    * replay). Streaming sources need an explicit schema, and the on-disk
    * `ts` physical type varies (timestamp[us] vs legacy ns-long), so the
    * schema is probed with a one-off batch read of the same directory and
    * `ts` is then normalized to epoch-ns LongType — every downstream
    * operator keeps the single `ts DIV 1000` epoch-µs convention.
    */
  def eventsStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The batch probe throws AnalysisException when the directory is empty
    // (no parquet files yet — a legitimate state for a stream that starts
    // before its producer). Fall back to the declared eventsSchema so the
    // stream can still be constructed; normalizeTs passes the LongType ts
    // through unchanged (ADVICE r7).
    val fileSchema =
      try spark.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => eventsSchema }
    val r = spark.readStream.schema(fileSchema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    graft.Catalog.normalizeTs(r.parquet(dir))
  }

  /** documents schema for streams started before any files land. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a directory of documents parquet files —
    * the continuous-ingest twin of the batch documents table.
    */
  def documentsStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val fileSchema =
      try spark.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => documentsSchema }
    val r = spark.readStream.schema(fileSchema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** Q234 streaming twin — the content-addressed manifest maintained
    * INCREMENTALLY over a document stream: per-source doc/char counts
    * and the additive multiset fingerprint Σ md5-leaf mod p. The
    * additive form is exactly what makes the manifest streamable — the
    * state per source is three int64 partials, every micro-batch folds
    * in map-side-combined increments, and no ordering constraint exists
    * across batches (a Merkle chain could not stream). Complete-mode
    * output over the bounded source cardinality; the final sink state
    * must equal the batch Q234 rows (asserted in StreamingSpec over a
    * multi-batch file replay).
    */
  def manifestStream(docs: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.registerRuntime(docs.sparkSession)
    docs
      .select(col("source"), col("text"),
        md5(concat(col("doc_id").cast("string"), lit(":"),
          md5(col("text")))).as("h"))
      .select(col("source"), col("text"),
        expr(graft.operators.NearDup.hexValueFastExpr("h")).as("hv"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(length(col("text"))).cast("long").as("n_chars"),
        (sum(col("hv")) % 2147483647L).cast("long").as("fp"))
  }

  /** Event-time TimestampType column (µs, truncated from ns — the declared
    * cross-engine convention).
    */
  private def eventTime(df: DataFrame): DataFrame =
    df.withColumn("ts_micro", timestamp_micros(expr("ts DIV 1000")))

  /** Q40 streaming twin — tumbling 1h windows; win_start kept in epoch-µs
    * BIGINT so results align with the batch/DuckDB form.
    */
  def q40Stream(events: DataFrame): DataFrame =
    eventTime(events)
      .groupBy(window(col("ts_micro"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Q40 streaming twin with a 2h watermark (C10): append-mode emission,
    * late rows beyond the watermark dropped, state finalized and evicted.
    */
  def q40StreamWatermarked(events: DataFrame): DataFrame =
    eventTime(events)
      .withWatermark("ts_micro", "2 hours")
      .groupBy(window(col("ts_micro"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Q41 streaming twin — sliding 1h windows every 15 min. The batch form
    * replicates rows by explode(sequence(0,3)); the streaming form gets
    * the same 4-window replication from window()'s slide argument.
    */
  def q41Stream(events: DataFrame): DataFrame =
    eventTime(events)
      .groupBy(window(col("ts_micro"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Q42 streaming twin — native session windows (30 min gap) per user.
    * session_window.end = last event + gap, while the batch form defines
    * duration = last − first event, so the gap is subtracted here to keep
    * the two semantics identical.
    */
  def q42Stream(events: DataFrame): DataFrame =
    eventTime(events)
      .groupBy(session_window(col("ts_micro"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(col("session_window.end")) - unix_micros(col("session_window.start"))
          - lit(1800000000L)).as("dur_us"))
      .select(col("user_id"), col("n_events"), col("dur_us"))

  /** C11a — streaming exact dedup on event_id within a watermark: state is
    * bounded by the watermark horizon instead of growing forever.
    */
  def dedupStream(events: DataFrame): DataFrame =
    eventTime(events)
      .withWatermark("ts_micro", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join (Q11's semantics on live streams): views
    * joined to purchases of the same user within the following 30 minutes.
    * Both sides carry watermarks so the join state (buffered rows awaiting
    * matches) is bounded and evicted once the range condition can no
    * longer match — the only way a stream-stream join survives unbounded
    * input.
    */
  def viewPurchaseJoinStream(events: DataFrame): DataFrame = {
    val base = eventTime(events)
    val views = base.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts_micro").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_micro").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    views.join(purchases,
      col("v_user") === col("p_user") &&
      col("p_ts") > col("v_ts") &&
      col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("v_user").as("user_id"),
        unix_micros(col("v_ts")).as("v_us"), unix_micros(col("p_ts")).as("p_us"))
  }

  /** Stream-static enrichment join: live events against a batch dimension
    * (customer, via the Q07 synthetic user↔custkey bridge). The static
    * side is a plain DataFrame — Catalyst broadcasts it into every
    * micro-batch, so the stream is never shuffled and no join state
    * accumulates (unlike stream-stream joins, a static side needs no
    * watermark). This is the 100 TB pattern for attaching dimensions to a
    * firehose: broadcast the dimension, map the stream.
    */
  def enrichedStream(events: DataFrame, customer: DataFrame): DataFrame = {
    val dim = customer
      .select((col("c_custkey") % 100).as("user_id"), col("c_mktsegment"))
      .groupBy(col("user_id"))
      .agg(min(col("c_mktsegment")).as("segment"))
    eventTime(events)
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
      .groupBy(col("event_type"), coalesce(col("segment"), lit("UNKNOWN")).as("segment"))
      .count()
  }

  /** Streaming twin of the ordered funnel (Q63): per-user state machine
    * over view → click-after-view → purchase-after-click, emitting the
    * user's current stage (0–3) on every update. Correct under ANY event
    * arrival order: the state buffers the per-user view-minimum plus the
    * (deduplicated) click/purchase time sets and re-derives the funnel,
    * so a late view that predates an already-seen click still promotes
    * the user. At production scale the buffered sets are bounded with a
    * watermark (times older than the horizon are folded irrevocably into
    * the stage and dropped) — the same state-bounding discipline as C10;
    * kept unbounded here because the twin is asserted batch-equal on a
    * finite replay.
    */
  def funnelStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .select(col("user_id").as[Long], col("event_type").as[String],
        expr("ts DIV 1000").as[Long])
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, (Long, Int)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String, Long)], state: GroupState[FunnelState]) =>
          val s0 = state.getOption.getOrElse(FunnelState(None, Set.empty, Set.empty))
          var minView = s0.minView
          var clicks = s0.clicks
          var purchases = s0.purchases
          rows.foreach {
            case (_, "view", us)     => if (minView.forall(us < _)) minView = Some(us)
            case (_, "click", us)    => clicks += us
            case (_, "purchase", us) => purchases += us
            case _                   => ()
          }
          val t1 = minView
          val t2 = t1.flatMap(t => clicks.filter(_ > t).minOption)
          val t3 = t2.flatMap(t => purchases.filter(_ > t).minOption)
          val stage = Seq(t1, t2, t3).takeWhile(_.isDefined).size
          state.update(FunnelState(minView, clicks, purchases))
          Iterator.single((user, stage))
      }
      .toDF("user_id", "stage")
  }

  /** Streaming twin of the Q79 transition matrix: per-user state carries
    * the latest (time, event_id, type); each batch's events sort after it
    * and emit (prev_type -> type) pairs. Downstream `groupBy(prev, curr)
    * .count()` reproduces the batch Markov matrix when replay order
    * respects event time per user (AvailableNow over a finite source);
    * cross-batch late events need the usual watermark discipline.
    * State is O(1) per user — the minimal sequence-mining state shape.
    */
  def transitionStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .select(col("user_id").as[Long], col("event_id").as[Long],
        col("event_type").as[String], expr("ts DIV 1000").as[Long])
      .as[(Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), (String, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, String, Long)],
         state: GroupState[(Long, Long, String)]) =>
          // Order this batch's rows by (us, event_id) — Q79's total order.
          val sorted = rows.toSeq.sortBy(r => (r._4, r._2))
          var prev = state.getOption
          val out = Seq.newBuilder[(String, String)]
          sorted.foreach { case (_, eid, tpe, us) =>
            prev.foreach { case (_, _, pType) => out += ((pType, tpe)) }
            prev = Some((us, eid, tpe))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
      .toDF("event_type", "next_type")
  }

  /** C11c — the Spark 4 transformWithState API: same running per-user
    * counter through a StatefulProcessor with an explicit ValueState
    * handle (the state-store-native successor of mapGroupsWithState;
    * state lives in the executor-local store, TTL-able, schema-evolvable).
    */
  def runningCountsTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("user_id").as[Long], col("event_id").as[Long])
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RunningCountProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events")
  }

  /** Streaming recursive EWMA per user (the incremental time-series
    * smoother; batch family member: EventTime.trailingEwma / Q100):
    * y ← (y + x)/2 per event, seeded with the first value — the α = 1/2
    * recursive form whose state is ONE double per user, updated in O(1)
    * per event via transformWithState. Rows are applied in (us, event_id)
    * order within each micro-batch; across batches the file source
    * replays commit order, so a time-ordered source yields the exact
    * sequential fold (asserted batch-equal in StreamingSpec).
    */
  def ewmaStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("user_id").as[Long], expr("ts DIV 1000").as[Long],
        col("event_id").as[Long], col("value").as[Double])
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new EwmaProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "ewma")
  }

  /** Streaming twin of the Q112 CDC dimension (graft.operators.Cdc):
    * type-1 SCD maintenance as a CHANGELOG stream — per user, keep the
    * (us, event_id)-latest event_type; emit a row only when the kept
    * value changes, stamped with the version it is valid as of. State is
    * one (Long, Long, String) per key; out-of-order rows within or
    * across batches cannot regress the state (max-by semantics, the
    * same total order as the batch stateAsOf window). Asserted
    * batch-equal in StreamingSpec over a multi-batch replay.
    */
  def dimensionStateStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("user_id").as[Long], expr("ts DIV 1000").as[Long],
        col("event_id").as[Long], col("event_type").as[String])
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new DimensionStateProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "new_type", "as_of_us", "as_of_event_id")
  }

  /** Streaming sketch aggregation: per tumbling 1h event-time window,
    * the Misra-Gries top event types and the HyperLogLog distinct-user
    * estimate — through the SAME TypedImperativeAggregate sketches the
    * batch engine registers (`graft_heavy_hitters`, `graft_hll_distinct`).
    * The streaming state IS the serialized sketch buffer: partial
    * aggregation merges sketch states within a batch, the state store
    * carries them across batches, and update mode re-emits a window as
    * its sketches absorb late rows. Nothing streaming-specific is
    * implemented — the sketch algebra composes with Structured
    * Streaming because merge-associativity is exactly the contract both
    * layers require.
    *
    * Equality contract (pinned in StreamingSpec): HLL registers are a
    * pure function of the input SET, so the streamed per-window
    * estimate equals the batch estimate EXACTLY, regardless of batch
    * boundaries; Misra-Gries summaries are merge-order-sensitive, so
    * the streamed result carries MG's guarantee (every item with true
    * count > n/k survives, estimates within n/k of truth), not
    * bit-equality.
    */
  def sketchWindowStream(spark: SparkSession, events: DataFrame,
      k: Int = 8, p: Int = 12): DataFrame = {
    graft.plans.GraftExtensions.registerRuntime(spark)
    eventTime(events)
      .groupBy(window(col("ts_micro"), "1 hour"))
      .agg(expr(s"graft_heavy_hitters(event_type, $k)").as("top_types"),
        expr(s"graft_hll_distinct(user_id, $p)").as("approx_users"))
      .select(unix_micros(col("window.start")).as("win_start"),
        col("top_types"), col("approx_users"))
  }

  /** C11b — arbitrary stateful processing: running per-user event counter
    * via flatMapGroupsWithState (update mode; state = one Long per user).
    */
  def runningCounts(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .select(col("user_id").as[Long], col("event_id").as[Long])
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = prev + rows.size
          state.update(next)
          Iterator.single((user, next))
      }
      .toDF("user_id", "n_events")
  }

  /** Input row for the SCD2 state machine (epoch-µs + derived day). */
  case class Scd2Event(user_id: Long, day: Long, us: Long,
    event_id: Long, event_type: String)

  /** Per-user SCD2 machine state: the not-yet-final CURRENT DAY's best
    * observation (last event wins by (us, event_id)) plus the OPEN
    * version of the dimension chain. O(1) per key. */
  case class Scd2State(
    hasPending: Boolean, pendingDay: Long, pendingUs: Long,
    pendingEid: Long, pendingType: String,
    hasCur: Boolean, version: Long, curState: String, curFrom: Long,
    curObs: Long)

  /** A CLOSED SCD2 version row (the open version stays in state). */
  case class Scd2Version(user_id: Long, version: Long, state: String,
    valid_from_day: Long, valid_to_day: Long, n_obs_days: Long)

  /** Q268 streaming twin — SCD Type-2 dimension history maintained
    * INCREMENTALLY over an event stream with flatMapGroupsWithState:
    * per user, a day finalizes when a later day arrives (the ingest
    * contract is day-ordered files — the usual log-replay shape; within
    * a micro-batch rows sort by (day, us, event_id), so intra-day
    * arrival order never matters); a finalized day either extends the
    * open version or CLOSES it, emitting the closed version row with
    * its validity range in append mode. The emitted set must equal the
    * batch Q268's PROVABLY closed rows (asserted in StreamingSpec over
    * a multi-batch day-split replay): closing version k requires
    * finalizing the first day of version k+1, so a close whose
    * successor is the current version with exactly one observed day is
    * not yet provable and stays in state — that trailing close and the
    * open version are read-time state, like Q234's TOTAL rollup.
    *
    * Scale notes: state is ~10 scalars per user key in the state store;
    * emission is append-only (closed versions are immutable — the
    * property that makes SCD2 streamable at all). At production scale a
    * watermark on event time bounds how long a day stays pending.
    */
  def scd2Stream(events: DataFrame): org.apache.spark.sql.Dataset[Scd2Version] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .select(col("user_id"),
        expr("(ts DIV 1000) DIV 86400000000").as("day"),
        expr("ts DIV 1000").as("us"), col("event_id"), col("event_type"))
      .as[Scd2Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Version](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Scd2Event], gs: GroupState[Scd2State]) =>
          var st = gs.getOption.getOrElse(
            Scd2State(false, 0L, 0L, 0L, "", false, 0L, "", 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Version]
          def finalizePending(): Unit = if (st.hasPending) {
            if (!st.hasCur)
              st = st.copy(hasCur = true, version = 1L,
                curState = st.pendingType, curFrom = st.pendingDay,
                curObs = 1L)
            else if (st.pendingType == st.curState)
              st = st.copy(curObs = st.curObs + 1L)
            else {
              out += Scd2Version(user, st.version, st.curState, st.curFrom,
                st.pendingDay - 1L, st.curObs)
              st = st.copy(version = st.version + 1L,
                curState = st.pendingType, curFrom = st.pendingDay,
                curObs = 1L)
            }
            st = st.copy(hasPending = false)
          }
          it.toSeq.sortBy(e => (e.day, e.us, e.event_id)).foreach { e =>
            if (!st.hasPending)
              st = st.copy(hasPending = true, pendingDay = e.day,
                pendingUs = e.us, pendingEid = e.event_id,
                pendingType = e.event_type)
            else if (e.day == st.pendingDay) {
              if (e.us > st.pendingUs ||
                (e.us == st.pendingUs && e.event_id > st.pendingEid))
                st = st.copy(pendingUs = e.us, pendingEid = e.event_id,
                  pendingType = e.event_type)
            } else if (e.day > st.pendingDay) {
              finalizePending()
              st = st.copy(hasPending = true, pendingDay = e.day,
                pendingUs = e.us, pendingEid = e.event_id,
                pendingType = e.event_type)
            }
            // e.day < pendingDay: out-of-order past the day contract —
            // dropped (a production deployment bounds this with a
            // watermark + dead-letter, not silent state rewind)
          }
          gs.update(st)
          out.iterator
      }
  }


  /** Per-type state of the online CUSUM monitor: the first-K daily
    * buffer (bounded by K), then the frozen calibration stats and the
    * running cumulative sum. */
  case class CusumState(
    calDays: List[Long], calVals: List[Long],
    frozen: Boolean, sCal: Long, mad: Long,
    cusum: Long, maxAbs: Long, alarmDay: Long)

  /** One emitted monitor row per processed day. */
  case class CusumRow(event_type: String, day: Long, phase: String,
    cusum: Long, alarm_day: Long)

  /** Q281 streaming twin — ONLINE CUSUM drift monitor per event type
    * with flatMapGroupsWithState: the batch gate splits the spine in
    * half offline; the online form freezes calibration at the FIRST K
    * observed days (K = 14 by default — an operational choice, declared
    * not inferred), then updates the n_cal-scaled cumulative deviation
    * in O(1) per day and latches the first alarm day where |C| exceeds
    * 4× the calibration's total absolute deviation — the identical
    * integer threshold algebra as Q281, so the monitor's post-
    * calibration fold is asserted equal to a batch replay of the same
    * daily rows in Round10GatesSpec. Ingest contract is day-ordered
    * files (the SCD2/EWMA twin contract); within a micro-batch rows
    * sort by day.
    *
    * Scale notes: state per type is the bounded K-day calibration
    * buffer until frozen, then six scalars; emission is one row per
    * processed day in update mode. At production scale a watermark
    * bounds replay depth exactly as for the other twins.
    */
  def cusumStream(daily: DataFrame, k: Int = 14): org.apache.spark.sql.Dataset[CusumRow] = {
    val spark = daily.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    daily
      .select(col("event_type").as[String], col("day").as[Long],
        col("v").as[Long])
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (tpe: String, it: Iterator[(String, Long, Long)],
         gs: GroupState[CusumState]) =>
          var st = gs.getOption.getOrElse(
            CusumState(Nil, Nil, false, 0L, 0L, 0L, 0L, -1L))
          val out = scala.collection.mutable.ArrayBuffer.empty[CusumRow]
          it.toSeq.sortBy(_._2).foreach { case (_, day, v) =>
            if (!st.frozen) {
              val days = st.calDays :+ day
              val vals = st.calVals :+ v
              if (days.length < k) {
                st = st.copy(calDays = days, calVals = vals)
                out += CusumRow(tpe, day, "calibrating", 0L, -1L)
              } else {
                val sCal = vals.sum
                val mad = vals.map(x => math.abs(k * x - sCal)).sum
                st = CusumState(Nil, Nil, frozen = true, sCal, mad,
                  0L, 0L, -1L)
                out += CusumRow(tpe, day, "calibrating", 0L, -1L)
              }
            } else {
              val cu = st.cusum + k * v - st.sCal
              val maxAbs = math.max(st.maxAbs, math.abs(cu))
              val alarm =
                if (st.alarmDay >= 0) st.alarmDay
                else if (math.abs(cu) > 4 * st.mad) day
                else -1L
              st = st.copy(cusum = cu, maxAbs = maxAbs, alarmDay = alarm)
              out += CusumRow(tpe, day,
                if (alarm >= 0) "drift" else "monitoring", cu, alarm)
            }
          }
          gs.update(st)
          out.iterator
      }
  }

  /** Per-type state of the online W₁ drift monitor: the set of
    * calibration days seen so far, the frozen reference histogram, and
    * the running live histogram — both over the declared $1 value
    * buckets, so state is bounded by the value DOMAIN, not the stream.
    */
  case class W1State(
    calDays: List[Long], frozen: Boolean,
    ref: Map[Long, Long], live: Map[Long, Long])

  /** One emitted monitor row per post-calibration processed day. */
  case class W1Row(event_type: String, day: Long, phase: String,
    n_live: Long, w1_num: Long, w1_den: Long)

  /** Q297 streaming twin — ONLINE 1-Wasserstein drift monitor per event
    * type with flatMapGroupsWithState: the batch gate compares two
    * types' full distributions offline; the online form freezes a
    * REFERENCE histogram over the first K observed days (K = 14
    * declared, the cusumStream convention), then folds each later
    * day's values into a live histogram and emits the exact integer
    * W₁ algebra between the two ECDFs — w1_num = Σ_t
    * |cumRef·nLive − cumLive·nRef|·Δbucket over the merged bucket
    * grid, w1_den = nRef·nLive — the identical exact-int shape as
    * Q297, so the monitor's post-calibration fold is asserted equal
    * to a batch replay in StreamingSpec. Values quantize to $1
    * buckets (cents DIV 100) so per-type state is bounded by the
    * value domain (≤ ~500 buckets here) rather than the stream.
    * Drift flags on the integer compare w1_num > 2·w1_den (a ≥ 2-
    * bucket mean shift), never a float.
    *
    * Ingest contract: day-ordered files of pre-aggregated
    * (event_type, day, bucket, cnt) rows (the SCD2/EWMA/CUSUM twin
    * contract); within a micro-batch rows sort by day.
    */
  def w1DriftStream(buckets: DataFrame, k: Int = 14): org.apache.spark.sql.Dataset[W1Row] = {
    val spark = buckets.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def w1(ref: Map[Long, Long], live: Map[Long, Long]): (Long, Long) = {
      val nR = ref.values.sum
      val nL = live.values.sum
      val grid = (ref.keySet ++ live.keySet).toSeq.sorted
      var (cumR, cumL, num) = (0L, 0L, 0L)
      grid.zip(grid.tail).foreach { case (b, nxt) =>
        cumR += ref.getOrElse(b, 0L)
        cumL += live.getOrElse(b, 0L)
        num += math.abs(cumR * nL - cumL * nR) * (nxt - b)
      }
      (num, nR * nL)
    }
    buckets
      .select(col("event_type").as[String], col("day").as[Long],
        col("bucket").as[Long], col("cnt").as[Long])
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[W1State, W1Row](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (tpe: String, it: Iterator[(String, Long, Long, Long)],
         gs: GroupState[W1State]) =>
          var st = gs.getOption.getOrElse(
            W1State(Nil, frozen = false, Map.empty, Map.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[W1Row]
          it.toSeq.sortBy(r => (r._2, r._3)).groupBy(_._2).toSeq
            .sortBy(_._1).foreach { case (day, rows) =>
              if (!st.frozen && (st.calDays.contains(day) ||
                  st.calDays.length < k)) {
                val ref = rows.foldLeft(st.ref) { case (h, (_, _, b, n)) =>
                  h.updated(b, h.getOrElse(b, 0L) + n)
                }
                val calDays =
                  if (st.calDays.contains(day)) st.calDays
                  else st.calDays :+ day
                st = st.copy(calDays = calDays, ref = ref,
                  frozen = calDays.length >= k)
                out += W1Row(tpe, day, "calibrating", 0L, 0L, 0L)
              } else {
                if (!st.frozen) st = st.copy(frozen = true)
                val live = rows.foldLeft(st.live) { case (h, (_, _, b, n)) =>
                  h.updated(b, h.getOrElse(b, 0L) + n)
                }
                st = st.copy(live = live)
                val (num, den) = w1(st.ref, live)
                out += W1Row(tpe, day,
                  if (num > 2 * den) "drift" else "monitoring",
                  live.values.sum, num, den)
              }
            }
          gs.update(st)
          out.iterator
      }
  }

  /** Per-type online drawdown state: the running peak, the worst
    * peak-to-trough drop seen so far and where it happened, plus
    * whether the pre-trough peak has been re-attained since. */
  case class DdState(runmax: Long, maxDd: Long, troughDay: Long,
    peakAtTrough: Long, recovered: Boolean)

  /** One emitted row per processed (type, day). */
  case class DdRow(event_type: String, day: Long, v: Long, runmax: Long,
    dd: Long, max_dd: Long, trough_day: Long, peak_cents: Long,
    recovered: Boolean)

  /** Q323 streaming twin — ONLINE maximum-drawdown monitor per event
    * type with flatMapGroupsWithState: the batch gate scans the whole
    * daily grid offline; the online form carries O(1) exact-int64
    * state per type — (running peak, worst drawdown, its trough day,
    * the peak it fell from, recovered?) — and emits the full drawdown
    * readout per processed day. All updates are exact integer
    * comparisons (a NEW worst drawdown resets the recovery flag; any
    * later day with v ≥ that peak sets it), so the monitor is
    * REPLAY-EQUAL to a sequential scan of the same day-ordered feed —
    * asserted against batch Q323's (peak, trough, max_dd, verdict) in
    * StreamingSpec.
    *
    * Ingest contract: day-ordered files of pre-aggregated (type, day,
    * cents) rows (the dailyCentsGrid shape); within a micro-batch,
    * rows sort by day before the fold, so day-split replay and
    * all-at-once replay produce identical rows.
    */
  def drawdownStream(daily: DataFrame): org.apache.spark.sql.Dataset[DdRow] = {
    val spark = daily.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    daily
      .select(col("event_type").as[String], col("day").as[Long],
        col("v").as[Long])
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[DdState, DdRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (tpe: String, it: Iterator[(String, Long, Long)],
         gs: GroupState[DdState]) =>
          var st = gs.getOption.getOrElse(
            DdState(Long.MinValue, -1L, 0L, 0L, recovered = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[DdRow]
          it.toSeq.sortBy(_._2).foreach { case (_, day, v) =>
            val runmax = math.max(st.runmax, v)
            val dd = runmax - v
            st =
              if (dd > st.maxDd)
                DdState(runmax, dd, day, runmax, recovered = v >= runmax)
              else st.copy(runmax = runmax,
                recovered = st.recovered ||
                  (day >= st.troughDay && v >= st.peakAtTrough))
            out += DdRow(tpe, day, v, runmax, dd, st.maxDd,
              st.troughDay, st.peakAtTrough, st.recovered)
          }
          gs.update(st)
          out.iterator
      }
  }

}

/** Per-user funnel state: min view time plus the click/purchase time sets
  * a late-arriving view could still re-qualify against.
  */
case class FunnelState(minView: Option[Long], clicks: Set[Long], purchases: Set[Long])

/** StatefulProcessor for the streaming EWMA: one (seeded, y) pair of
  * state per user; each batch's rows are sorted by (us, event_id) before
  * the fold so intra-batch order is event-time order.
  */
class EwmaProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Long, Double), (Long, Double)] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ValueState}

  @transient private var ewmaState: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ewmaState = getHandle.getValueState[Double]("ewma", Encoders.scalaDouble,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Double)] = {
    val ordered = rows.toSeq.sortBy(r => (r._2, r._3))
    // exists(), not Option(get()): get() on an absent primitive-encoded
    // state yields the zero value, which would silently seed the fold.
    var y = if (ewmaState.exists()) Some(ewmaState.get()) else None
    ordered.foreach { case (_, _, _, x) =>
      y = Some(y.fold(x)(prev => (prev + x) / 2))
    }
    y.foreach(ewmaState.update)
    y.map(v => (key, v)).iterator
  }
}

/** StatefulProcessor for the SCD changelog: state = the (us, event_id,
  * type) of the latest event seen per user; a batch's rows fold in
  * (us, event_id) order and a changelog row is emitted only when the
  * resulting latest TYPE differs from the batch-entry state (version
  * churn within a batch collapses to one row — changelog compaction).
  */
class DimensionStateProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Long, String), (Long, String, Long, Long)] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ValueState}

  @transient private var latest: ValueState[(Long, Long, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    latest = getHandle.getValueState[(Long, Long, String)]("latest",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, String)],
      timerValues: TimerValues): Iterator[(Long, String, Long, Long)] = {
    val entry = if (latest.exists()) Some(latest.get()) else None
    var cur = entry
    rows.foreach { case (_, us, eid, tpe) =>
      if (cur.forall(c => us > c._1 || (us == c._1 && eid > c._2)))
        cur = Some((us, eid, tpe))
    }
    cur match {
      case Some(c) =>
        latest.update(c)
        if (entry.map(_._3) != Some(c._3))
          Iterator.single((key, c._3, c._1, c._2))
        else Iterator.empty
      case None => Iterator.empty
    }
  }
}

/** StatefulProcessor for C11c: one Long ValueState per user key. */
class RunningCountProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Long), (Long, Long)] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ValueState}

  @transient private var countState: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    countState = getHandle.getValueState[Long]("count", Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val prev = Option(countState.get()).getOrElse(0L)
    val next = prev + rows.size
    countState.update(next)
    Iterator.single((key, next))
  }
}
