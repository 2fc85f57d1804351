package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's knob event (reference util/util.go:12-19,
  * simulate-knobs.go:25-29): a keyed update with an event timestamp.
  * `ts` is a proper timestamp — upgrading the reference's float epoch
  * seconds (SURVEY.md §1 "Supported primitive types").
  */
case class KnobEvent(id: Long, n: Long, ts: Timestamp)

/** Latest accepted state per knob (reference knobs.go:58). */
case class KnobState(id: Long, n: Long, tsMicros: Long)

/** One closed session: emitted by [[SessionTotalsProcessor]] when the
  * watermark passes the key's idle-gap timer. `closeMs` is the event-time
  * instant the session closed (last event + gap), epoch millis. */
case class SessionTotal(id: Long, total: Long, nEvents: Long, closeMs: Long)

/** [[SessionTotalsProcessor]]'s per-key state: running aggregate plus the
  * currently-armed timer (so the next batch can disarm it). */
case class SessionAgg(total: Long, nEvents: Long, timerMs: Long)

/** `transformWithState` processor behind [[StreamOps.sessionTotalsTws]]:
  * gap-based sessionization with a per-key ValueState aggregate and one
  * re-armable event-time timer. All state lives in the keyed state store
  * (RocksDB column families) — nothing driver-side, so a 1000-executor
  * cluster shards keys exactly like every other stateful stage here.
  */
class SessionTotalsProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, KnobEvent, SessionTotal] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig}
  import org.apache.spark.sql.{Encoders, streaming}

  @transient private var agg: streaming.ValueState[SessionAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getValueState("agg", Encoders.product[SessionAgg],
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[KnobEvent],
      timers: TimerValues): Iterator[SessionTotal] = {
    val prev = if (agg.exists()) agg.get() else SessionAgg(0L, 0L, -1L)
    var total = prev.total
    var n = prev.nEvents
    var maxMs = Long.MinValue
    rows.foreach { e =>
      total += e.n; n += 1
      maxMs = math.max(maxMs, e.ts.getTime)
    }
    // One live timer per key: disarm the previous deadline, re-arm at the
    // newest event + gap. (Late rows under the watermark can only EXTEND
    // the session — same monotone-close semantics as session_window.)
    val deadline = math.max(prev.timerMs, maxMs + gapMs)
    if (prev.timerMs >= 0 && deadline != prev.timerMs)
      getHandle.deleteTimer(prev.timerMs)
    if (deadline != prev.timerMs) getHandle.registerTimer(deadline)
    agg.update(SessionAgg(total, n, deadline))
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[SessionTotal] = {
    val out =
      if (agg.exists()) {
        val a = agg.get()
        Iterator.single(SessionTotal(key, a.total, a.nEvents,
          expired.getExpiryTimeInMs))
      } else Iterator.empty
    agg.clear()
    out
  }
}

/** Structured Streaming twins of the reference pipeline's stateful stages.
  *
  * Semantics upgrades vs the reference, deliberate (SURVEY.md §0.2/§7.3):
  * exactly-once via checkpointed state instead of ack-always at-least-once;
  * event-time windows + watermarks instead of wall-clock tickers. What is
  * preserved exactly: the event-time guard that drops out-of-order/stale
  * updates (knobs.go:101-102), zero-window suppression (knobs.go:68-69),
  * and the bounded-retry external sink (reducer.go:24-25,118-126 — see
  * [[RetrySink]]).
  *
  * Scale notes: every operator is keyed — state lives in the state store
  * partitioned by the group key, so a 1000-executor cluster shards it; no
  * operator here keeps driver-side state.
  */
object StreamOps {

  /** Event-time micros from a Timestamp: getTime is millis; the sub-ms
    * component lives in getNanos. One shared definition — the connector's
    * `ts_us` payload field and every stateful compare must agree on this
    * conversion or at-least-once payload identity silently breaks. */
  def eventMicros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000

  /** R8 flood stage: fan each update out to n unit messages, lazily (a
    * strict (1 to n).map would materialize an n-element collection per
    * event on the executor heap). R7 zero-guard first — sequence(1, 0)
    * semantics aside, a 0-weight update must emit nothing. Shared by the
    * in-engine [[pipeline]] and the wire-composed ChainSoak stage. */
  def flood(events: Dataset[KnobEvent]): Dataset[KnobEvent] = {
    import events.sparkSession.implicits._
    events
      .filter(_.n > 0)
      .flatMap(e => (0L until e.n).iterator.map(_ => e.copy(n = 1L)))
  }

  /** R5 streaming form: keep the newest-by-event-time record per key,
    * ignoring older arrivals — `state[id] = msg if msg.ts > state[id].ts`
    * (reference knobs.go:92-103). Emits the key's current state on every
    * update (OutputMode.Update downstream).
    */
  def latestPerKey(events: Dataset[KnobEvent]): Dataset[KnobState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.id)
      .flatMapGroupsWithState[KnobState, KnobState](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (id: Long, updates: Iterator[KnobEvent], state: GroupState[KnobState]) =>
          // Compare at MICROS precision (shared eventMicros): a millis-
          // truncated compare would drop an event genuinely newer by
          // <1 ms as a stale tie, diverging from the batch twin
          // q_latest_per_key, which orders by unix_micros.
          val newest = updates.maxBy(e => (eventMicros(e.ts), e.n))
          val newestUs = eventMicros(newest.ts)
          if (state.getOption.forall(_.tsMicros < newestUs)) {
            val next = KnobState(id, newest.n, newestUs)
            state.update(next)
            Iterator.single(next)
          } else {
            // Stale/out-of-order: state must not regress (knobs.go:101-102)
            // AND unchanged state is not re-emitted — the reference's
            // change-detection skip (reducer.go:96-98).
            Iterator.empty
          }
      }
  }

  /** R10/R12: tumbling event-time window counts per key with a watermark —
    * the mapper's 100 ms windows generalized to event time. Late data
    * beyond the watermark is dropped (append mode) instead of silently
    * double-counted as in the reference's at-least-once acking.
    */
  def windowedCounts(
      events: Dataset[KnobEvent],
      window: String = "10 seconds",
      watermark: String = "30 seconds"): Dataset[(Timestamp, Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("id"))
      .agg(sum("n").as("total"))
      .filter(col("total") > 0) // R7: suppress empty/zero windows
      .select(col("window.start").as("w_start"), col("id"), col("total"))
      .as[(Timestamp, Long, Long)]
  }

  /** Streaming trending keys: the `freq_candidates` Misra–Gries sketch
    * running over tumbling event-time windows — "what's hot right now"
    * with O(cap) aggregation state per window regardless of key
    * cardinality, the streaming face of q_heavy_hitters. The sketch's
    * mergeable-summaries merge rule is exactly what Spark's partial →
    * state-store → final aggregation path needs: membership stays a
    * guaranteed superset of every key above windowMass/(cap+1) across
    * batches, and counts are lower bounds. Exact counts, when needed,
    * are a batch verify pass over the emitted candidates (precisely
    * q_heavy_hitters' second pass). Requires [[graft.GraftExtensions]]
    * on the session (registers the function).
    */
  def trendingKeys(
      events: Dataset[KnobEvent],
      window: String = "10 seconds",
      watermark: String = "30 seconds",
      cap: Int = 8): org.apache.spark.sql.DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(expr(s"freq_candidates(CAST(id AS STRING), $cap)").as("candidates"))
      .select(col("window.start").as("w_start"), col("candidates"))

  /** Streaming dedup within the watermark horizon — the upgrade over the
    * reference's double-count-on-redelivery (SURVEY.md §0.2). Key is the
    * full logical identity of a message.
    */
  def dedup(events: Dataset[KnobEvent], watermark: String = "30 seconds"): Dataset[KnobEvent] =
    events.withWatermark("ts", watermark)
      .dropDuplicates("id", "n", "ts")

  /** Redelivery-tolerant dedup: identity is the PAYLOAD (id, n) only, so a
    * broker retry that re-stamps the message with a fresh timestamp — the
    * at-least-once failure mode [[dedup]]'s full-identity key misses — is
    * still dropped, as long as the copies arrive within the watermark
    * delay of each other. `dropDuplicatesWithinWatermark` keeps each key
    * only as long as the watermark requires (state evicted at wm passage),
    * so state is bounded by the redelivery horizon, not the stream's
    * lifetime key cardinality. */
  def dedupPayload(events: Dataset[KnobEvent],
      watermark: String = "30 seconds"): Dataset[KnobEvent] =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("id", "n")

  /** Session windows per key (SURVEY.md §2B streaming rows): counts per
    * activity burst separated by `gap` of silence. */
  def sessionCounts(
      events: Dataset[KnobEvent],
      gap: String = "5 seconds",
      watermark: String = "30 seconds"): Dataset[(Timestamp, Timestamp, Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("id"), col("cnt"))
      .as[(Timestamp, Timestamp, Long, Long)]
  }

  /** Session totals via `transformWithState` — the arbitrary-state API
    * (Spark 4): typed [[org.apache.spark.sql.streaming.ValueState]] plus
    * EVENT-TIME TIMERS, the pair session_window's declarative form can't
    * give you (emit-on-close with custom payloads, per-key timer
    * extension, state you can enrich mid-session). Each key accumulates
    * (sum, count) in a ValueState; every batch re-arms the key's one
    * timer at maxSeenTs + gap; when the WATERMARK passes the armed time
    * the timer fires, the session is emitted once (Append semantics) and
    * the state cleared. State per key is O(1) and timer-scoped — an idle
    * key costs nothing after its flush. Requires the RocksDB state store
    * provider (transformWithState's storage contract — the v2 state
    * format with column families).
    */
  def sessionTotalsTws(
      events: Dataset[KnobEvent],
      gapMs: Long = 5000L,
      watermark: String = "30 seconds"): Dataset[SessionTotal] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.id)
      .transformWithState(new SessionTotalsProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** R13 streaming form: the reducer's ever-growing global total
    * (reducer.go:79,87) as an unbounded streaming aggregation — state is
    * one row per key in the state store, emitted on change (update mode).
    */
  def runningTotals(events: Dataset[KnobEvent]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupBy(col("id")).agg(sum("n").as("total"))
      .as[(Long, Long)]
  }

  /** Stream-stream interval join: pair each left event with same-key
    * right events whose event time falls within [l_ts, l_ts + within] —
    * the correlation primitive (click→purchase attribution, request→
    * response matching) batch q_join_asof approximates offline. BOTH
    * sides carry watermarks and the join condition bounds time in BOTH
    * directions, which is what lets Spark evict buffered rows once the
    * opposite watermark passes the bound — state stays bounded for an
    * unbounded run, keyed and store-backed like every stage here. Inner
    * join (the default) emits matches as soon as both sides arrive;
    * `joinType = "left_outer"` additionally emits unmatched left events
    * with NULL right columns — but only once the watermark proves no
    * match can still arrive (attribution-with-misses: every click
    * reported, converted or not).
    */
  def intervalJoin(
      left: Dataset[KnobEvent],
      right: Dataset[KnobEvent],
      watermark: String = "30 seconds",
      within: String = "10 seconds",
      joinType: String = "inner"): org.apache.spark.sql.DataFrame = {
    val l = left.select(col("id"), col("n").as("l_n"), col("ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("id").as("r_id"), col("n").as("r_n"),
        col("ts").as("r_ts"))
      .withWatermark("r_ts", watermark)
    l.join(r, col("id") === col("r_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"interval $within"), joinType)
      .select(col("id"), col("l_n"), col("r_n"), col("l_ts"), col("r_ts"))
  }

  /** Stream–static enrichment join: attach dimension attributes to each
    * streaming event by joining the stream against a BATCH table on `id`.
    * The static side is broadcast — no streaming state, no watermark
    * needed, and the dimension frame is re-resolved every micro-batch (a
    * dim refresh lands at the next trigger). This is the production shape
    * for decorating an unbounded event stream with a small dimension
    * table; at cluster scale the broadcast replaces what would otherwise
    * be a per-batch shuffle of the whole stream. `left_outer` (default)
    * keeps events whose key has no dimension row (NULL attributes);
    * `inner` drops them.
    */
  def enrich(
      events: Dataset[KnobEvent],
      dim: org.apache.spark.sql.DataFrame,
      joinType: String = "left_outer"): org.apache.spark.sql.DataFrame =
    events.toDF().join(
      org.apache.spark.sql.functions.broadcast(dim), Seq("id"), joinType)

  /** The whole reference pipeline as ONE streaming job (SURVEY.md §5.4):
    * latest-per-key (knobs) → fan-out n rows (flood) → windowed count per
    * key (mapper/reducer). Returns the windowed counts; with constant
    * input n per knob, steady-state counts equal n × windows — the
    * reference's own operator invariant (README.md:4,24).
    */
  def pipeline(events: Dataset[KnobEvent], window: String = "10 seconds"): Dataset[(Timestamp, Long, Long)] = {
    import events.sparkSession.implicits._
    flood(events) // R7 zero-guard + R8 lazy fan-out (shared stage)
      .withWatermark("ts", "30 seconds")
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("id"), col("cnt"))
      .as[(Timestamp, Long, Long)]
  }
}

/** Bounded-retry push helper mirroring the reference's IoT sink loop
  * (reducer.go:24-25,118-126: up to 10 tries, 100 ms wait, give up and log
  * on exhaustion). Used from `foreachBatch`, where user code owns delivery.
  */
object RetrySink {
  /** Run `push`, retrying up to `maxTries` with `backoffMs` sleeps.
    * Returns the number of attempts made; throws the last error if all
    * tries fail (streaming then fails the batch — exactly-once restart
    * semantics — rather than the reference's silent drop).
    */
  def pushWithRetry(maxTries: Int = 10, backoffMs: Long = 100)(push: () => Unit): Int = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxTries) {
      attempt += 1
      try { push(); return attempt }
      catch {
        case e: Throwable =>
          lastErr = e
          if (attempt < maxTries) Thread.sleep(backoffMs)
      }
    }
    throw lastErr
  }
}
