package graft.operators

import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Num.round2

/** Window functions, global sort/limit, top-k per group (SURVEY.md §2B).
  *
  * The reference's only "window function" is its running total
  * (reducer.go:79,87 — see DataflowOps.q_window_running_sum); ranking and
  * analytic functions are extension surface.
  *
  * Scale notes: every window here partitions by a real key (nation, user,
  * customer) — one hash shuffle + per-partition sort, no single-partition
  * global window (`Window.orderBy` without partitionBy is the scale
  * killer; deliberately absent). `orderBy(...).limit(k)` plans
  * TakeOrderedAndProject: per-partition top-k heaps + driver merge of
  * k×partitions rows, never a global sort of the table.
  */
object WindowOps {

  val queries: Map[String, Q] = Map(
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("nation"),
          round(col("c_acctbal"), 2).as("bal"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          row_number().over(w).cast("long").as("rn"))
        .orderBy("c_custkey")
    }),

    "q_window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          round(col("value"), 2).as("v"),
          round(lag("value", 1).over(w), 2).as("prev_v"),
          round(lead("value", 1).over(w), 2).as("next_v"),
          round(col("value") - lag("value", 1).over(w), 2).as("delta"))
        .orderBy("event_id")
    }),

    // Frame-bounded moving average: both engines sum the identical ≤3-row
    // frame in the same order, so the double result matches bit-for-bit
    // before the defensive round.
    "q_window_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          round2(avg("value").over(w)).as("mavg3"))
        .orderBy("event_id")
    }),

    // Distribution-rank analytics per group: quartile bucket (ntile),
    // percent_rank, cume_dist. The (value, event_id) ordering leaves no
    // peer rows, so cume_dist's peer-group semantics cannot diverge
    // between engines; the fraction outputs get the scaled round every
    // derived double gets (Num.round2 rationale).
    "q_window_ntile" -> ((s, d) => {
      val w = Window.partitionBy("event_type")
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          round(col("value"), 2).as("v"),
          ntile(4).over(w).cast("long").as("quartile"),
          (round(percent_rank().over(w) * 1000000) / 1000000).as("pr"),
          (round(cume_dist().over(w) * 1000000) / 1000000).as("cd"))
        .orderBy("event_id")
    }),

    // RANGE-framed window: per user, activity within the TRAILING HOUR of
    // each event — frame membership is defined by the ordering VALUE
    // (micros within 3.6e9 of the current row), not a row count, so it is
    // insensitive to how many events share a timestamp (all peers always
    // included — no tie-break needed for determinism). This is the
    // time-decayed feature shape (rolling engagement, rate-limit counters)
    // that ROWS frames can't express. The summed metric is integer CENTS:
    // a range frame can span hundreds of rows, and engines disagree on
    // float summation order inside sliding frames, so doubles are scaled
    // to exact longs before the frame sum.
    "q_window_range_frame" -> ((s, d) => {
      val hourUs = 3600L * 1000000L
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-hourUs, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          count(lit(1)).over(w).as("hr_events"),
          sum("cents").over(w).as("hr_cents"))
        .orderBy("event_id")
    }),

    // Global sort + limit → TakeOrderedAndProject (no full sort at scale).
    "q_sort_limit" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Top-3 orders per customer: rank within partition then filter. The
    // filter on row_number is applied streaming per partition — Spark's
    // WindowGroupLimit pushes the k-limit into the sort at the exec level.
    "q_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    // Gaps-and-islands: longest run of CONSECUTIVE active days per user
    // (retention/engagement analytics). The day − row_number() trick turns
    // each consecutive run into a constant group key, so islands fall out
    // of one ordinary groupBy — no iterative logic. One shuffle on user_id
    // serves the window; the two aggregates after it run on O(user-days)
    // then O(islands) rows. Input is the DISTINCT user-day frame, so raw
    // event volume only affects the first compacting aggregate.
    "q_streaks" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("day")
      Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max("len").as("best_streak"), count(lit(1)).as("n_streaks"))
        .orderBy("user_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
                      epoch_us(ts) // 86400000000 AS day FROM events),
         g AS (SELECT user_id, day,
                 day - row_number() OVER (PARTITION BY user_id
                   ORDER BY day) AS grp
               FROM d),
         runs AS (SELECT user_id, grp, count(*) AS len
                  FROM g GROUP BY 1, 2)
         SELECT user_id, max(len) AS best_streak, count(*) AS n_streaks
         FROM runs GROUP BY user_id ORDER BY user_id""",
    "q_window_range_frame" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                count(*) OVER w AS hr_events,
                CAST(sum(CAST(round("value" * 100) AS BIGINT)) OVER w
                  AS BIGINT) AS hr_cents
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q_window_rank" ->
      """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
                round(c_acctbal, 2) AS bal,
                CAST(rank() OVER w AS BIGINT) AS rnk,
                CAST(dense_rank() OVER w AS BIGINT) AS drnk,
                CAST(row_number() OVER w AS BIGINT) AS rn
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
         ORDER BY c_custkey""",
    "q_window_lag_lead" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                round("value", 2) AS v,
                round(lag("value", 1) OVER w, 2) AS prev_v,
                round(lead("value", 1) OVER w, 2) AS next_v,
                round("value" - lag("value", 1) OVER w, 2) AS delta
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         ORDER BY event_id""",
    "q_window_moving_avg" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                round(avg("value") OVER (PARTITION BY user_id
                  ORDER BY epoch_us(ts), event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100) / 100 AS mavg3
         FROM events
         ORDER BY event_id""",
    "q_window_ntile" ->
      """SELECT event_id, event_type, round("value", 2) AS v,
                CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                round(percent_rank() OVER w * 1000000) / 1000000 AS pr,
                round(cume_dist() OVER w * 1000000) / 1000000 AS cd
         FROM events
         WINDOW w AS (PARTITION BY event_type ORDER BY "value", event_id)
         ORDER BY event_id""",
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
         FROM orders
         ORDER BY price DESC, o_orderkey
         LIMIT 100""",
    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
               FROM orders) t
         WHERE rn <= 3
         ORDER BY o_custkey, rn"""
  )
}
