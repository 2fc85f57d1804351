package graft.operators

import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2B "Set operations") — absent from the
  * reference (SURVEY.md §2A note), pure built-ins here.
  *
  * Scale notes: `union` is a zero-shuffle concatenation of partitions;
  * INTERSECT/EXCEPT plan as aggregate-dedup + hash join on the full row —
  * both shuffle once on the row hash, the same cost class as distinct.
  */
object SetOps {

  private val Hi = 300000.0
  private val Lo = 50000.0

  val queries: Map[String, Q] = Map(
    // UNION ALL of two (overlapping-free by construction) labeled subsets,
    // plus the dedup variant folded in via a distinct count column would
    // change the shape — kept as pure concatenation; dedup is exercised by
    // q_intersect/q_except's Distinct.
    "q_union_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val hi = o.filter(col("o_totalprice") > Hi)
        .select(col("o_orderkey"), lit("hi").as("src"))
      val lo = o.filter(col("o_totalprice") < Lo)
        .select(col("o_orderkey"), lit("lo").as("src"))
      hi.unionByName(lo).orderBy("src", "o_orderkey")
    }),

    // Customers that placed BOTH a >300k and a <50k order.
    "q_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_totalprice") > Hi).select("o_custkey")
        .intersect(o.filter(col("o_totalprice") < Lo).select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // Customers that never placed a >300k order.
    "q_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      Tables.customer(s, d).select(col("c_custkey").as("o_custkey"))
        .except(o.filter(col("o_totalprice") > Hi).select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // Upsert/MERGE compaction — the CDC pattern every snapshot-maintaining
    // pipeline runs: a base snapshot plus an update batch, updates winning
    // on key collision, inserts appended. Expressed as UNION ALL + one
    // arg-max-by-priority aggregate per key: a SINGLE shuffle on the key,
    // single-pass, map-side partial — never a join of base against updates
    // (two shuffles) or a window sort. Money is exact integer cents (the
    // updated price is +10%, and scaled-long arithmetic keeps the bump
    // identical across engines). n_versions exposes which keys collided.
    // Base = orderkeys not ≡0 (mod 10); updates = orderkeys ≡0 (mod 3) —
    // overlapping but not nested, so all three MERGE cases (update,
    // insert, untouched) are non-empty at every sf.
    "q_upsert_merge" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val base = o.filter(pmod(col("o_orderkey"), lit(10)) =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderstatus"), lit(0L).as("pri"))
      val upd = o.filter(pmod(col("o_orderkey"), lit(3)) === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 110).cast("long").as("cents"),
          lit("U").as("o_orderstatus"), lit(1L).as("pri"))
      base.unionByName(upd)
        .groupBy("o_orderkey")
        .agg(max_by(col("o_custkey"), col("pri")).as("o_custkey"),
          max_by(col("cents"), col("pri")).as("cents"),
          max_by(col("o_orderstatus"), col("pri")).as("status"),
          count(lit(1)).as("n_versions"))
        .orderBy("o_orderkey")
    }),

    // SCD type-2 history build from a CDC update log — the companion to
    // q_upsert_merge (which keeps only the LATEST version, this keeps them
    // ALL as validity intervals): per user, change-compress consecutive
    // identical values (the reference's skip-if-unchanged push semantics,
    // reducer.go:96-104, applied to history), then each surviving version
    // is valid [its ts, next version's ts); the last is open-ended and
    // flagged current. Scale shape: both windows partition on user_id with
    // the same (ts_us, event_id) order, so ONE exchange + sort serves the
    // change-compression lag and the interval lead — and the lead runs on
    // the already-compressed (smaller) row set. No self-join; the classic
    // EXISTS-per-version SCD2 build would shuffle the log twice and
    // quadratically probe hot keys.
    "q_scd2_history" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val log = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
      val versions = log
        .withColumn("prev_v", lag("value", 1).over(w))
        .filter(col("prev_v").isNull || col("value") =!= col("prev_v"))
      versions
        .withColumn("valid_to_us", lead("ts_us", 1).over(w))
        .select(col("user_id"), col("ts_us").as("valid_from_us"),
          col("valid_to_us"), round(col("value"), 2).as("v"),
          col("valid_to_us").isNull.as("is_current"))
        .orderBy("user_id", "valid_from_us")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_union_all" ->
      """SELECT * FROM (
           SELECT o_orderkey, 'hi' AS src FROM orders WHERE o_totalprice > 300000
           UNION ALL
           SELECT o_orderkey, 'lo' AS src FROM orders WHERE o_totalprice < 50000
         ) ORDER BY src, o_orderkey""",
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 300000
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_totalprice < 50000
         ORDER BY o_custkey""",
    "q_except" ->
      """SELECT c_custkey AS o_custkey FROM customer
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_totalprice > 300000
         ORDER BY o_custkey""",
    "q_upsert_merge" ->
      """WITH base AS (
           SELECT o_orderkey, o_custkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  o_orderstatus, 0 AS pri
           FROM orders WHERE o_orderkey % 10 <> 0
         ), upd AS (
           SELECT o_orderkey, o_custkey,
                  CAST(round(o_totalprice * 110) AS BIGINT) AS cents,
                  'U' AS o_orderstatus, 1 AS pri
           FROM orders WHERE o_orderkey % 3 = 0
         ), u AS (SELECT * FROM base UNION ALL SELECT * FROM upd)
         SELECT o_orderkey,
                arg_max(o_custkey, pri) AS o_custkey,
                arg_max(cents, pri) AS cents,
                arg_max(o_orderstatus, pri) AS status,
                count(*) AS n_versions
         FROM u GROUP BY o_orderkey ORDER BY o_orderkey""",
    // Change-compression first (frame = the full per-user log), interval
    // lead second (frame = surviving versions only) — two WINDOW clauses
    // over the same partitioning, exactly the Spark plan's shape.
    "q_scd2_history" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, "value"
           FROM events),
         c AS (
           SELECT *, lag("value", 1) OVER
             (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_v
           FROM e),
         f AS (SELECT * FROM c WHERE prev_v IS NULL OR "value" <> prev_v)
         SELECT user_id, ts_us AS valid_from_us,
                lead(ts_us, 1) OVER w AS valid_to_us,
                round("value", 2) AS v,
                lead(ts_us, 1) OVER w IS NULL AS is_current
         FROM f
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         ORDER BY user_id, valid_from_us"""
  )
}
