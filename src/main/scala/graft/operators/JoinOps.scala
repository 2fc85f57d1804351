package graft.operators

import graft.Tables
import graft.Tables.Q
import graft.functions.Num.round2
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2B "Joins").
  *
  * The reference has no joins at all (SURVEY.md §2A, "Absent from the
  * reference entirely"); this is the declared extension surface. The one
  * join-shaped behavior it does have — keep the latest record per key and
  * merge it against a probe (reference knobs.go:101-102) — generalizes to
  * the as-of join here.
  *
  * Scale notes (100 TB / 1000 executors):
  *  - Equi-joins shuffle both sides on the join key → sort-merge join; AQE
  *    converts to broadcast when a side fits under the threshold.
  *  - Dimension joins use an explicit [[broadcast]] hint: nation/region are
  *    O(100) rows at ANY scale factor, so shipping them to every executor
  *    beats shuffling the fact side, always.
  *  - The theta/range join keeps the tiny side (5 bands) broadcast, so the
  *    physical plan is BroadcastNestedLoopJoin with the fact side streamed —
  *    no shuffle of the big side at all.
  *  - The as-of join deliberately avoids the quadratic
  *    `probe ⋈ build ON ts <= ts` + argmax shape: we union both sides and
  *    take a running `last(ignoreNulls)` over a single per-key sort. One
  *    shuffle, O(n log n) per key, no blowup when a key has many build rows.
  */
object JoinOps {

  /** High-value-order threshold shared by the semi/anti pair; chosen so both
    * the matching and non-matching customer sets are non-empty at every sf.
    */
  private val HiValue = 400000.0

  /** Bucketed-table materialization for [[q_join_bucketed]] (idempotent per
    * (session, sfDir); table names carry an sfDir tag so scale factors
    * don't collide in one warehouse). Returns the two bucketed frames.
    * Shared with BucketedJoinSpec so the spec asserts the exact production
    * layout. */
  def bucketedTables(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val nBuckets = 8
    val tag = Tables.sfTag(d)
    val li = Tables.materializedTable(s, s"li_bkt_$tag") {
      Tables.lineitem(s, d).repartition(nBuckets, col("l_orderkey"))
        .write.bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(s"li_bkt_$tag")
    }
    val ord = Tables.materializedTable(s, s"ord_bkt_$tag") {
      Tables.orders(s, d).repartition(nBuckets, col("o_orderkey"))
        .write.bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(s"ord_bkt_$tag")
    }
    (li, ord)
  }

  val queries: Map[String, Q] = Map(
    // lineitem ⋈ orders ⋈ customer equi-chain. Shuffles on l_orderkey then
    // o_custkey; both are the natural keys a 100 TB layout would bucket by.
    "q_join_inner_equi" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      // Bare orderBy, NOT orderedOnce (r22 A/B): the sort's range
      // sampling does re-execute the scans and both broadcast joins
      // (nothing between scan and sort is an exchange at fixture scale),
      // but persisting the 600k-row join output cost MORE than the saved
      // pass — measured 1.58 -> 2.31 s min; the columnar cache build is
      // the same trap q_scalar_math's r21 rework removed. At cluster
      // scale the joins shuffle and sampling reuses shuffle files anyway.
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(
          col("o_orderkey"), col("l_linenumber"), col("c_custkey"),
          col("c_mktsegment"), col("l_quantity"),
          round(col("o_totalprice"), 2).as("o_price"))
        .orderBy("o_orderkey", "l_linenumber")
    }),

    // Fact ⋈ small dims with explicit broadcast hints: nation (25 rows) and
    // region (5 rows) are constant-size regardless of sf, so the plan is
    // two BroadcastHashJoins — zero shuffle of the customer side before the
    // final (tiny, 25-group) aggregation.
    "q_join_broadcast" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("sum_bal"))
        .orderBy("r_name", "n_name")
    }),

    // customer LEFT JOIN (high-value orders): customers with no such order
    // surface with NULL order columns. NULLS FIRST is pinned explicitly —
    // Spark's ASC default is nulls-first, DuckDB's is nulls-last.
    "q_join_left_outer" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > HiValue)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select(col("c_custkey"), col("c_mktsegment"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_price"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    }),

    // EXISTS: customers having at least one high-value order. Left-semi
    // shuffles only the key column of the build side and short-circuits on
    // first match — no row multiplication.
    "q_join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > HiValue)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // NOT EXISTS: the complement set (non-empty at every sf by construction).
    "q_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > HiValue)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // Non-equi (theta) range join: orders banded by price. The band table is
    // derived from region (5 rows) so it exists in both engines. Planned by
    // the engine's own RangeJoinStrategy (plans/BroadcastRangeJoin): the
    // interval side is collected + lo-sorted once and each fact row probes
    // by binary search — O(rows log bands) instead of the stock
    // BroadcastNestedLoopJoin's O(rows × bands), with the fact side still
    // streamed exactly once. The oracle hash-compare proves the custom
    // operator bit-identical to the relational spec.
    "q_join_theta_range" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val bands = Tables.region(s, d).select(
        col("r_regionkey").cast("long").as("band"),
        (col("r_regionkey") * 100000.0).as("lo"),
        ((col("r_regionkey") + 1) * 100000.0).as("hi"))
      o.join(broadcast(bands),
          o("o_totalprice") >= bands("lo") && o("o_totalprice") < bands("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("band")
    }),

    // 5-table star join (TPC-H Q5 shape): revenue per nation for one
    // region. The dimension chain region→nation is O(1)+O(25) — Catalyst
    // broadcasts both and the region filter PRUNES NATIONS BEFORE the
    // fact tables join (join reorder + predicate pushdown through the
    // star). customer⋈orders⋈lineitem are the real shuffles, on their
    // natural keys. Revenue sums in exact decimal (q_decimal_agg
    // treatment): round2 per row, then an order-independent decimal sum.
    "q_star_revenue" -> ((s, d) => {
      val revenue = round2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,2)")
      Tables.region(s, d).filter(col("r_name") === "ASIA")
        .join(Tables.nation(s, d), col("n_regionkey") === col("r_regionkey"))
        .join(Tables.customer(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"))
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // NULL-SAFE equi-join (`<=>` / IS NOT DISTINCT FROM): rows whose join
    // key is NULL match the NULL group instead of silently dropping — the
    // semantics a pipeline needs when "unknown" is itself a category
    // (unattributed traffic, missing language tag). The fixture has no
    // natural NULLs, so a deterministic nullif plants them: user bucket 0
    // becomes the NULL segment. Spark plans EqualNullSafe as a first-class
    // hash-join key (coalesce-keyed under the hood), so this stays a
    // SortMergeJoin/broadcast join at scale, never a nested loop.
    "q_join_null_safe" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"),
          nullif(pmod(col("user_id"), lit(10)), lit(0)).as("segment"))
      // dim derives from ev, so the join is a self-join: rename the dim
      // key instead of relying on dataset-tagged columns (ambiguous).
      val dim = ev.groupBy("segment").agg(count(lit(1)).as("segment_n"))
        .withColumnRenamed("segment", "dim_segment")
      ev.join(dim, col("segment") <=> col("dim_segment"))
        .select(col("event_id"), col("segment"), col("segment_n"))
        .orderBy("event_id")
    }),

    // FULL OUTER join: reconcile two sets that each have rows the other
    // lacks — here one market segment's customers vs the high-value order
    // book. Left-only rows (BUILDING customers with no high-value order)
    // and right-only rows (high-value orders from other segments) both
    // survive with NULLs on the absent side; this is the shape of a
    // two-source reconciliation/backfill audit. Plans as a SortMergeJoin
    // with FullOuter — both sides shuffle on the key, same as inner.
    // NULLS FIRST pinned on both sort keys (Spark ASC default) since the
    // unmatched rows are exactly the NULL-keyed ones.
    "q_join_full_outer" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_totalprice") > HiValue)
      c.join(o, c("c_custkey") === o("o_custkey"), "full")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_custkey"), round(col("o_totalprice"), 2).as("o_price"))
        .orderBy(col("c_custkey").asc_nulls_first,
          col("o_orderkey").asc_nulls_first)
    }),

    // Bucket-co-located join ("reuse a partitioning across stages"): both
    // fact tables are materialized ONCE as bucketed+sorted tables on the
    // join key, and every later join between them runs with ZERO exchange
    // and ZERO sort — the physical layout a 100 TB warehouse maintains so
    // its hottest join never pays the shuffle again. Mechanics that make
    // the files line up: the pre-write repartition uses the SAME
    // HashPartitioning expression the bucket-id assignment uses
    // (pmod(murmur3, n)), so each write task holds exactly one bucket and
    // each bucket lands in ONE file — the single-file-per-bucket condition
    // under which the scan reports the sortBy order and the downstream
    // SortMergeJoin needs neither Exchange nor Sort (BucketedJoinSpec
    // asserts both absences against the stock plan's two shuffles). The
    // `merge` hint pins SMJ so small scale factors don't flip to a
    // broadcast plan and vacuously pass. One-time materialization per
    // (session, sfDir): of Bench's 3 passes only the first pays the write.
    "q_join_bucketed" -> ((s, d) => {
      val (li, ord) = bucketedTables(s, d)
      val revenue = round2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,2)")
      li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }),

    // AS-OF join (generalizes reference knobs.go:101-102, "latest record at
    // or before the probe time"): for each purchase event, the latest click
    // by the same user with click.ts <= purchase.ts. Implemented as the
    // single-shuffle union + running last(ignoreNulls) — the plan that
    // survives 100× scale (a per-key sort, never a per-key cross product).
    "q_join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), lit(0).as("side"),
          col("event_id"), col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), lit(1).as("side"),
          col("event_id"), lit(null).cast("long").as("click_id"))
      // side=0 sorts before side=1 at equal ts, so a click in the same
      // microsecond as the purchase is visible to it (<= semantics).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts_us"), col("side"), col("event_id"))
        .rowsBetween(Long.MinValue, 0)
      clicks.unionByName(purchases)
        .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("last_click_ts_us",
          last(when(col("side") === 0, col("ts_us")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select("event_id", "user_id", "ts_us", "last_click_id", "last_click_ts_us")
        .orderBy("event_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // Per-row round to cents, then an exact decimal sum — aggregation
    // order cannot matter in either engine.
    "q_star_revenue" ->
      """SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) / 100
             AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
         FROM region
         JOIN nation   ON n_regionkey = r_regionkey
         JOIN customer ON c_nationkey = n_nationkey
         JOIN orders   ON o_custkey = c_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY n_name""",
    "q_join_full_outer" ->
      """SELECT c_custkey, c_name, o_orderkey, o_custkey,
                round(o_totalprice, 2) AS o_price
         FROM (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
         FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
           ON c.c_custkey = o.o_custkey
         ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""",
    "q_join_null_safe" ->
      """WITH ev AS (SELECT event_id, nullif(user_id % 10, 0) AS segment
                     FROM events),
         dim AS (SELECT segment, count(*) AS segment_n FROM ev
                 GROUP BY segment)
         SELECT ev.event_id, ev.segment, dim.segment_n
         FROM ev JOIN dim ON ev.segment IS NOT DISTINCT FROM dim.segment
         ORDER BY event_id""",
    "q_join_inner_equi" ->
      """SELECT o_orderkey, l_linenumber, c_custkey, c_mktsegment, l_quantity,
                round(o_totalprice, 2) AS o_price
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey, l_linenumber""",
    "q_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
                round(sum(c_acctbal), 2) AS sum_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""",
    "q_join_left_outer" ->
      """SELECT c_custkey, c_mktsegment, o_orderkey,
                round(o_totalprice, 2) AS o_price
         FROM customer
         LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
           ON c_custkey = o_custkey
         ORDER BY c_custkey, o_orderkey NULLS FIRST""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment
         FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment
         FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
         ORDER BY c_custkey""",
    "q_join_theta_range" ->
      """SELECT band, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
         FROM orders
         JOIN (SELECT CAST(r_regionkey AS BIGINT) AS band,
                      r_regionkey * 100000.0 AS lo,
                      (r_regionkey + 1) * 100000.0 AS hi
               FROM region) bands
           ON o_totalprice >= lo AND o_totalprice < hi
         GROUP BY band
         ORDER BY band""",
    // Bucketing is a physical layout only — the relational spec is the
    // plain join over the raw tables.
    "q_join_bucketed" ->
      """SELECT o_orderpriority,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) / 100
             AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_join_asof" ->
      """WITH ev AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
         ), u AS (
           SELECT user_id, ts_us, 0 AS side, event_id, event_id AS click_id
           FROM ev WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, ts_us, 1 AS side, event_id, NULL AS click_id
           FROM ev WHERE event_type = 'purchase'
         ), w AS (
           SELECT *,
             last_value(click_id IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts_us, side, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id,
             last_value(CASE WHEN side = 0 THEN ts_us END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts_us, side, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts_us
           FROM u
         )
         SELECT event_id, user_id, ts_us, last_click_id, last_click_ts_us
         FROM w WHERE side = 1 ORDER BY event_id"""
  )
}
