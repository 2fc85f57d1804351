package graft.operators

import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch twins of the reference pipeline's own computational surface
  * (SURVEY.md §2A R4, R8-R13): explode fan-out, hex key round-trip, JSON
  * field extraction, tumbling/sliding event-time windows, running total.
  *
  * The reference does all of this imperatively over Pub/Sub messages
  * (flood.go:74-81 fan-out; mapper.go:98-103 hex parse; knobs.go:93-100
  * JSON decode; mapper.go:64-86 + reducer.go:80-89 windowed counts;
  * reducer.go:79,87 running total). Here each is a declarative plan:
  * generation happens inside `explode(sequence(...))` (codegen'd, no
  * driver-side loop), windows are event-time `window()` buckets rather than
  * wall-clock ticks, and the running total is a frame-bounded window
  * aggregate that shuffles once on the partition key.
  */
object DataflowOps {

  val queries: Map[String, Q] = Map(
    // R8: (id, n) → n rows. nation supplies 25 deterministic (id, n) pairs;
    // n = n_nationkey + 1 so the fan-out ranges 1..25 rows (325 total at
    // every sf). sequence() is evaluated per-row inside codegen —
    // distributed generation, the Spark analog of flood.go's publish loop.
    "q_explode_fanout" -> ((s, d) => {
      Tables.nation(s, d)
        .select(col("n_nationkey").cast("long").as("id"),
          (col("n_nationkey") + 1).cast("long").as("n"))
        .select(col("id"), col("n"),
          explode(sequence(lit(1L), col("n"))).as("i"))
        .select(col("id"), col("i"), hex(col("id")).as("key_hex"))
        .orderBy("id", "i")
    }),

    // R9: int key → hex payload → int key (mapper.go:98-103 parses the hex
    // payload flood.go:77 produced). Round-trip must be the identity.
    "q_hex_key_roundtrip" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"))
        .distinct()
        .select(col("o_orderkey"), hex(col("o_orderkey")).as("key_hex"))
        .withColumn("decoded", conv(col("key_hex"), 16, 10).cast("long"))
        .orderBy("o_orderkey")
    }),

    // R4: JSON payload decode, generalized to a field extraction over the
    // events stream. get_json_object is codegen'd; a malformed document
    // yields NULL rather than failing the task (the reference's
    // log-and-continue, knobs.go:85-90, as an expression semantic).
    "q_json_extract" -> ((s, d) => {
      Tables.orderedOnce(Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 50),
        col("event_id"))
    }),

    // R10/R12: tumbling 1-hour event-time window counts per event type.
    // Two-phase hash aggregate: partial counts per partition, one shuffle
    // of (window, type) pairs — shuffle volume is O(windows × types), not
    // O(events), exactly the mapper→reducer combiner structure.
    "q_tumbling_count" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
          col("cnt"), col("sum_value"))
        .orderBy("w_start_us", "event_type")
    }),

    // Sliding 1-hour window every 30 minutes: each event lands in exactly
    // two windows. window() expands rows ×(size/slide) BEFORE the partial
    // agg — the blow-up is bounded by the overlap factor, and the shuffle
    // still carries only aggregated (window, type) rows.
    "q_sliding_window_count" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
          col("cnt"))
        .orderBy("w_start_us", "event_type")
    }),

    // Batch sessionization: the batch twin of StreamOps.sessionCounts
    // (streaming session windows have no SQL oracle; this form does). Per
    // user, a new session starts where the gap since the previous event
    // exceeds 6 hours; session_id is the running count of session starts.
    // ONE shuffle on user_id serves both window passes (lag and the
    // running sum share the same partitioning+ordering); the final
    // per-session aggregate ships one partial row per session. Ordering
    // ties on (ts_us, event_id) so both engines number identically.
    "q_sessionize" -> ((s, d) => {
      val gapUs = 6L * 3600 * 1000000 // 6 hours
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("prev_us", lag("ts_us", 1).over(byUser))
        .withColumn("brk",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
        .withColumn("session_id", sum("brk").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts_us").as("s_start_us"), max("ts_us").as("s_end_us"))
        .orderBy("user_id", "session_id")
    }),

    // R13: running total (reducer.go:79,87 accumulates `total` forever).
    // Frame-bounded window sum per user: one shuffle on user_id, one sort
    // per partition; both engines add in the same (ts, event_id) order, so
    // the IEEE double result is bit-identical before the defensive round.
    "q_window_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("running_value", round(sum("value").over(w), 2))
        .select("event_id", "user_id", "ts_us", "running_value")
        .orderBy("event_id")
    }),

    // Time-series gap fill: per-user DAILY event counts with missing days
    // zero-filled across each user's own active span — the densification
    // pass a downstream forecaster/feature-builder needs. The grid is
    // generated from the AGGREGATED frame (one row per user-day, O(users ×
    // days) ≪ O(events)), so the sequence explode and the fill join never
    // touch raw events — at 100 TB the only full-data pass is the first
    // compacting groupBy; everything after runs on the compacted key space.
    // Day = floor(epoch_us / 86400e6): pure integer division, identical in
    // both engines, no session-timezone dependence.
    "q_gap_fill" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy("user_id", "day").agg(count(lit(1)).as("cnt"))
      val grid = counts.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      grid.join(counts, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
        .orderBy("user_id", "day")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // The single-window DuckDB form is the spec; Spark reproduces it with
    // the compacted-grid join above.
    "q_gap_fill" ->
      """WITH c AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                           count(*) AS cnt
                    FROM events GROUP BY 1, 2),
         s AS (SELECT user_id, min(day) AS d0, max(day) AS d1
               FROM c GROUP BY 1),
         g AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM s)
         SELECT g.user_id, g.day, coalesce(c.cnt, 0) AS cnt
         FROM g LEFT JOIN c ON g.user_id = c.user_id AND g.day = c.day
         ORDER BY g.user_id, g.day""",
    "q_explode_fanout" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
                unnest(generate_series(1, CAST(n_nationkey AS BIGINT) + 1)) AS i,
                to_hex(n_nationkey) AS key_hex
         FROM nation
         ORDER BY id, i""",
    "q_hex_key_roundtrip" ->
      """SELECT DISTINCT o_orderkey, to_hex(o_orderkey) AS key_hex,
                CAST(CAST('0x' || to_hex(o_orderkey) AS BIGINT) AS BIGINT) AS decoded
         FROM orders
         ORDER BY o_orderkey""",
    "q_json_extract" ->
      """SELECT event_id, json_extract(props, '$.k')::BIGINT AS k
         FROM events
         WHERE json_extract(props, '$.k')::BIGINT > 50
         ORDER BY event_id""",
    "q_tumbling_count" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us, event_type,
                count(*) AS cnt, round(sum("value"), 2) AS sum_value
         FROM events
         GROUP BY 1, 2
         ORDER BY w_start_us, event_type""",
    // Each event belongs to the 1-hour windows starting at its 30-minute
    // bucket and at that bucket minus 30 minutes.
    "q_sliding_window_count" ->
      """SELECT w_start_us, event_type, count(*) AS cnt
         FROM (
           SELECT unnest([
                    epoch_us(time_bucket(INTERVAL '30 minutes', ts)),
                    epoch_us(time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes')
                  ]) AS w_start_us,
                  event_type
           FROM events
         )
         GROUP BY w_start_us, event_type
         ORDER BY w_start_us, event_type""",
    "q_window_running_sum" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                round(sum("value") OVER (PARTITION BY user_id
                  ORDER BY epoch_us(ts), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                  AS running_value
         FROM events
         ORDER BY event_id""",
    // Session numbering must use ROWS (not the default RANGE) so tied
    // timestamps accumulate exactly like Spark's rowsBetween frame; the
    // (ts_us, event_id) ordering makes the tie-break itself deterministic.
    // sum() over integers is HUGEINT in DuckDB — cast back to BIGINT to
    // match Spark's long session_id.
    "q_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
         ),
         g AS (
           SELECT user_id, event_id, ts_us,
             CASE WHEN lag(ts_us) OVER w IS NULL
                    OR ts_us - lag(ts_us) OVER w > 21600000000
                  THEN 1 ELSE 0 END AS brk
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         ),
         s AS (
           SELECT user_id, ts_us,
             CAST(sum(brk) OVER (PARTITION BY user_id
               ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM g
         )
         SELECT user_id, session_id, count(*) AS n_events,
                min(ts_us) AS s_start_us, max(ts_us) AS s_end_us
         FROM s GROUP BY 1, 2
         ORDER BY user_id, session_id"""
  )
}
