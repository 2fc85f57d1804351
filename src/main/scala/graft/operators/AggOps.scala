package graft.operators

import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.functions._
import graft.functions.Num.round2

/** Aggregation operators (SURVEY.md §2B "Aggregation").
  *
  * Generalizes the reference's count-by-key pipeline: the mapper's windowed
  * per-key partial counts (reference mapper.go:64-86) plus the reducer's
  * global vector-sum (reference reducer.go:146-153) are, in Spark, a single
  * declarative `groupBy(...).agg(...)` — Catalyst plans the partial/final
  * HashAggregate split automatically, so the map-side combiner the reference
  * hand-wires with atomics comes for free and scales with partition count.
  */
object AggOps {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Per-user counts pivoted to one column per event type — shared by
    * q_pivot and q_unpivot. The fill is SCOPED to the count columns: an
    * unscoped na.fill would also rewrite a null group key to 0, colliding
    * with a real user 0. */
  private def pivotedCounts(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .count()
      .na.fill(0L, EventTypes)

  val queries: Map[String, Q] = Map(
    // R10/R11: count per key. Partial agg on the scan side means the
    // shuffle carries one row per (partition, key) — at 100 TB the shuffle
    // volume is O(partitions × distinct keys), not O(rows).
    "q_agg_count_by_key" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q1 shape: multi-aggregate per group. Sums run over
    // DECIMAL(18,2) (the q_decimal_agg treatment) so they are EXACT
    // regardless of aggregation order at any sf — round2-after-sum can
    // land on a half-cent boundary once groups are large enough. The
    // derived product is round2'd PER ROW first, making the
    // double→decimal cast exact in both engines.
    "q_agg_multi" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(round2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,2)")).cast("double").as("sum_disc_price"),
          round2(avg("l_quantity")).as("avg_qty"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Exact count(distinct) per group — Catalyst plans Expand + two-phase
    // agg; distinct keys are deduped map-side before the shuffle.
    "q_agg_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")
    }),

    // Grouping-set family. grouping_id disambiguates NULL-as-subtotal from
    // NULL-as-data, and gives the oracle a stable sort key.
    "q_agg_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(round2(sum("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    "q_agg_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(round2(sum("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Explicit GROUPING SETS — the general form rollup/cube specialize:
    // the caller names exactly the aggregation levels wanted, and Spark
    // expands them in ONE pass (no re-scan per level). Same single-shuffle
    // shape as rollup; gid disambiguates levels exactly as there.
    "q_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(round2(sum("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // R7 generalized: post-aggregation filter (HAVING). The reference
    // suppresses empty windows (knobs.go:68-69, mapper.go:75); here any
    // group predicate applies after the final agg.
    "q_agg_having" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("cnt"), round2(sum("l_quantity")).as("sum_qty"))
        .filter(col("cnt") > 500)
        .orderBy("l_suppkey")
    }),

    // Exact interpolated quantiles of event value per type — the
    // distribution-shape aggregate every metrics pipeline needs. Exact
    // percentile sorts each group's values in aggregation buffers, which
    // is fine for bounded groups but NOT the 100 TB path: there you swap
    // in approx_percentile (t-digest sketch, partial-aggregates map-side
    // and merges associatively — AggSpec pins it within 5% of exact on
    // the same data). Exact is registered because it is the form a SQL
    // oracle can check; the swap is one function name.
    "q_quantiles" -> ((s, d) => {
      def q(p: Double, name: String) =
        (round(expr(s"percentile(value, $p)") * 10000) / 10000).as(name)
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(q(0.5, "p50"), q(0.95, "p95"), q(0.99, "p99"),
          (round(max("value") * 10000) / 10000).as("p100"))
        .orderBy("event_type")
    }),

    // Ordered string aggregation per group. collect_list's arrival order
    // is partition-nondeterministic, so the sort happens INSIDE the row
    // (array_sort) before joining — deterministic on any cluster, same
    // result as DuckDB's string_agg(... ORDER BY). Guard rail: this shape
    // is for bounded groups (names per region); an unbounded group would
    // accumulate the whole partition in one aggregation buffer.
    "q_string_agg" -> ((s, d) => {
      Tables.nation(s, d)
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(array_sort(collect_list("n_name")), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy("r_name")
    }),

    // Pivot: event counts per user spread across one column per event
    // type. The type list is EXPLICIT — with it, Spark plans a single
    // pass (conditional aggregation); without it, a first job must scan
    // for distinct values. At 100 TB the explicit list is the only
    // acceptable form.
    "q_pivot" -> ((s, d) => pivotedCounts(s, d).orderBy("user_id")),

    // Unpivot (melt): the inverse — wide per-type counts back to long
    // (user_id, event_type, cnt) rows via stack().
    "q_unpivot" -> ((s, d) => {
      pivotedCounts(s, d)
        .select(col("user_id"), expr(
          """stack(5, 'click', click, 'error', error, 'purchase', purchase,
             'signup', signup, 'view', view) AS (event_type, cnt)"""))
        .filter(col("cnt") > 0)
        .orderBy("user_id", "event_type")
    }),

    // Salted two-stage aggregation — the explicit skew-mitigation form.
    // l_returnflag has 3 values with one holding ~half the table; at
    // 100 TB a plain groupBy sends that key's every partial row to one
    // reducer task. Salting splits each key across 16 sub-keys in the
    // first (wide) aggregate, so no reduce task ever sees more than
    // ~1/16 of the hot key; the second aggregate recombines 3×16 tiny
    // rows. The salt is a DETERMINISTIC hash of the row's primary key —
    // rand() would break retry idempotency (a re-executed task must
    // salt identically) and the cross-engine oracle. Sums run over
    // DECIMAL so the two-stage regrouping is order-exact; the oracle is
    // the PLAIN one-stage GROUP BY, proving the decomposition lossless.
    "q_skew_salted_agg" -> ((s, d) => {
      val partial = Tables.lineitem(s, d)
        .withColumn("salt",
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(16)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("part_qty"),
          sum(round2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,2)")).as("part_net"),
          count(lit(1)).as("part_cnt"))
      partial.groupBy("l_returnflag")
        .agg(sum("part_qty").cast("double").as("sum_qty"),
          sum("part_net").cast("double").as("sum_net"),
          sum("part_cnt").as("cnt"))
        .orderBy("l_returnflag")
    }),

    // Winsorized aggregate: clip a value column to its per-group
    // [p1, p99] before summing — the outlier-robust statistic a quality
    // pipeline wants when a few corrupt rows would otherwise own a mean.
    // Percentile bounds are selected by EXPLICIT integer rank
    // (rank = ceil(k·n/100) over a per-group sort), not an interpolating
    // percentile: rank selection does no float arithmetic, so both
    // engines pick the exact same element and the clip boundary can
    // never drift by an ulp.
    //
    // Round-12 de-skew: the per-group rank comes from the DISTRIBUTED
    // prefix sum over the global (g, x) range order (TextOps
    // .distributedCumsum) minus a broadcast per-group offset — not from
    // `Window.partitionBy(g)`, whose parallelism is bounded by GROUP
    // COUNT (3 return flags here: three tasks each sorting a third of a
    // 100 TB table, the same unsplittable-window trap the substring
    // family closed in round 11). Range partitioning spreads each group
    // across many sorted partitions and the rank is
    // global_cum − rows_before_group, so the oracle-exact form is now
    // also the scale form. Ties at a boundary rank are safe: ROWS-frame
    // cumsum gives row_number semantics, and any tie picked at rank k
    // has the same x. Measured price at sf0.1: 2.7 s vs 1.7 s for the
    // 3-task group window (same box, same harness) — the checkpoint +
    // offset machinery costs ~1.6× where 3 tasks still fit, and wins as
    // soon as a group outgrows one task. approx_percentile stays the
    // documented alternative when one pass matters more than exactness
    // (AggSpec pins the swap within 5%).
    "q_winsorize" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
      // ONE corpus pass total (round-12 verdict #6): the cumsum's eager
      // localCheckpoint is the only read of parquet — group sizes, the
      // bounds extraction, AND the final clip pass all re-derive from the
      // checkpointed range-partitioned frame (Catalyst's ColumnPruning
      // removes the rank window from the consumers that never reference
      // `cum`, so those passes are plain scans of the cached partitions,
      // not re-sorts). The previous spelling re-scanned lineitem for the
      // sizes and the clip — three parquet passes where one suffices.
      // The split form (r22): `base` is the bare checkpointed frame —
      // the sizes and the final clip pass never reference `cum`, so they
      // skip the sorted cum pass entirely (the old window-based cum let
      // ColumnPruning do this; the shuffle-free mapPartitions cum is
      // opaque to it).
      val (base, cs) = graft.operators.TextOps.distributedCumsumSplit(
        li.withColumn("one", lit(1L)), "one", "cum", col("g"), col("x"))
      // per-group sizes and rank offsets: a group-cardinality-bounded
      // frame (3 rows), so its single-partition window is trivial
      val sizes = base.groupBy("g").agg(count(lit(1)).as("n"))
        .withColumn("off", coalesce(
          sum("n").over(org.apache.spark.sql.expressions.Window
            .orderBy("g").rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding,
              -1)), lit(0L)))
      val ranked = cs
        .join(broadcast(sizes), "g")
        .withColumn("r", col("cum") - col("off"))
      // ceil(n/100) and ceil(99n/100) in pure integer arithmetic — `div`,
      // not `/` (Spark's Column./ is always floating-point division)
      val bounds = ranked
        .filter(col("r") === expr("(n + 99) div 100") ||
          col("r") === expr("(n * 99 + 99) div 100"))
        .groupBy("g").agg(min("x").as("lo"), max("x").as("hi"))
      base.join(broadcast(bounds), "g")
        .select(col("g"),
          least(greatest(col("x"), col("lo")), col("hi")).as("wx"),
          (col("x") < col("lo")).cast("long").as("below"),
          (col("x") > col("hi")).cast("long").as("above"))
        .groupBy("g")
        .agg(sum(col("wx").cast("decimal(18,2)")).cast("double").as("wsum"),
          sum("below").as("n_clip_lo"), sum("above").as("n_clip_hi"),
          count(lit(1)).as("n"))
        .orderBy("g")
    }),

    // Fixed-width histogram: bucket a measure by pure integer arithmetic
    // (floor-divide, clamp to the last bucket) and aggregate per bucket —
    // the distribution profile every data-quality dashboard starts from.
    // Bucketing in-row keeps it a plain scan + 10-group aggregate: fully
    // map-side-combined, no shuffle of the measure itself. Empty buckets
    // are absent in both engines (GROUP BY, not a dense histogram).
    "q_histogram" -> ((s, d) => {
      val width = 60000L
      Tables.orders(s, d)
        .withColumn("bucket",
          least(floor(col("o_totalprice") / width), lit(9L)).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(min("o_totalprice"), 2).as("lo"),
          round(max("o_totalprice"), 2).as("hi"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("sum_price"))
        .orderBy("bucket")
    }),

    // R5 batch twin: arg-max by event timestamp per key (reference
    // knobs.go:101-102 keeps the newest record per knob, dropping
    // out-of-order arrivals). max_by is a single-pass aggregate — no
    // window/sort shuffle, and it partial-aggregates map-side.
    "q_latest_per_key" -> ((s, d) => {
      // Ordering key is (epoch micros, event_id): micros because that is
      // the precision both engines share, event_id as the unique
      // tie-breaker for events in the same microsecond.
      val ord = struct(unix_micros(col("ts")), col("event_id"))
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          max_by(col("event_id"), ord).as("last_event_id"),
          max_by(col("event_type"), ord).as("last_event_type"),
          max(unix_micros(col("ts"))).as("last_ts_us"))
        .orderBy("user_id")
    }),

    // Statistical aggregates (corr, sample stddev) with cross-engine
    // float discipline: built-in corr()/stddev_samp() stream doubles in
    // partition order, so their low bits differ per engine AND per run.
    // Instead the five moment sums run in EXACT decimal (order-
    // independent), and the statistics are assembled from them in one
    // identical double expression — the only doubles compared are the two
    // final defensive rounds. The groupBy still partial-aggregates
    // map-side; at 100 TB the shuffle carries 6 decimals per group.
    "q_corr_stats" -> ((s, d) => {
      val x = col("l_quantity").cast("decimal(18,2)")
      val y = col("l_extendedprice").cast("decimal(18,2)")
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"),
          sum(x * y).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          (round((col("n") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double"))
            / sqrt(col("n") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
            / sqrt(col("n") * col("syy").cast("double")
              - col("sy").cast("double") * col("sy").cast("double"))
            * 1e6) / 1e6).as("corr_qty_price"),
          (round(sqrt((col("n") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
            / (col("n") * (col("n") - 1)).cast("double"))
            * 1e6) / 1e6).as("stddev_qty"))
        .orderBy("l_returnflag")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // Identical moment sums in exact decimal, identical double assembly.
    "q_corr_stats" ->
      """WITH m AS (
           SELECT l_returnflag, count(*) AS n,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             sum(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
             sum(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
           round((n * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / sqrt(n * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
             / sqrt(n * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
             * 1000000) / 1000000 AS corr_qty_price,
           round(sqrt((n * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
             / (n * (n - 1))::DOUBLE) * 1000000) / 1000000 AS stddev_qty
         FROM m ORDER BY l_returnflag""",
    "q_agg_count_by_key" ->
      """SELECT l_returnflag, count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // quantile_cont uses the same (n-1)*p linear interpolation as Spark's
    // percentile; the scaled round absorbs last-ulp arithmetic drift.
    "q_quantiles" ->
      """SELECT event_type,
                round(quantile_cont("value", 0.5) * 10000) / 10000 AS p50,
                round(quantile_cont("value", 0.95) * 10000) / 10000 AS p95,
                round(quantile_cont("value", 0.99) * 10000) / 10000 AS p99,
                round(max("value") * 10000) / 10000 AS p100
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_agg_multi" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) / 100
                  AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
                round(avg(l_quantity) * 100) / 100 AS avg_qty,
                min(l_quantity) AS min_qty,
                max(l_quantity) AS max_qty,
                count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 60000), 9) AS BIGINT) AS bucket,
                count(*) AS n,
                round(min(o_totalprice), 2) AS lo,
                round(max(o_totalprice), 2) AS hi,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                  AS sum_price
         FROM orders GROUP BY 1 ORDER BY bucket""",
    "q_agg_distinct" ->
      """SELECT l_returnflag,
                count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity) * 100) / 100 AS sum_qty, count(*) AS cnt,
                grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity) * 100) / 100 AS sum_qty, count(*) AS cnt,
                grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity) * 100) / 100 AS sum_qty, count(*) AS cnt,
                grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), ())
         ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_string_agg" ->
      """SELECT r_name,
                string_agg(n_name, ',' ORDER BY n_name) AS nations,
                count(*) AS n
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q_agg_having" ->
      """SELECT l_suppkey, count(*) AS cnt, round(sum(l_quantity) * 100) / 100 AS sum_qty
         FROM lineitem GROUP BY l_suppkey HAVING count(*) > 500
         ORDER BY l_suppkey""",
    "q_pivot" ->
      """SELECT user_id,
                count(*) FILTER (WHERE event_type = 'click') AS click,
                count(*) FILTER (WHERE event_type = 'error') AS error,
                count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                count(*) FILTER (WHERE event_type = 'signup') AS signup,
                count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_unpivot" ->
      """SELECT user_id, event_type, cnt FROM (
           SELECT user_id, event_type, count(*) AS cnt
           FROM events GROUP BY user_id, event_type)
         WHERE cnt > 0
         ORDER BY user_id, event_type""",
    // The oracle is the PLAIN single-stage aggregate: a hash match proves
    // the salted two-stage decomposition is lossless.
    "q_skew_salted_agg" ->
      """SELECT l_returnflag,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) / 100
                  AS DECIMAL(18,2))) AS DOUBLE) AS sum_net,
                count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // Identical integer rank selection — both engines pick the same
    // element, no interpolation arithmetic anywhere.
    "q_winsorize" ->
      """WITH ranked AS (
           SELECT l_returnflag AS g, l_extendedprice AS x,
                  row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY l_extendedprice) AS r,
                  count(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem),
         bounds AS (
           SELECT g, min(x) AS lo, max(x) AS hi FROM ranked
           WHERE r = (n + 99) // 100 OR r = (n * 99 + 99) // 100
           GROUP BY g)
         SELECT r.g AS g,
                CAST(sum(CAST(least(greatest(r.x, b.lo), b.hi)
                  AS DECIMAL(18,2))) AS DOUBLE) AS wsum,
                CAST(sum(CAST(r.x < b.lo AS BIGINT)) AS BIGINT) AS n_clip_lo,
                CAST(sum(CAST(r.x > b.hi AS BIGINT)) AS BIGINT) AS n_clip_hi,
                count(*) AS n
         FROM (SELECT l_returnflag AS g, l_extendedprice AS x FROM lineitem) r
         JOIN bounds b USING (g)
         GROUP BY r.g ORDER BY g""",
    // DuckDB arg_max has no composite-key overload → window emulation
    // with the identical (epoch_us(ts), event_id) ordering.
    "q_latest_per_key" ->
      """SELECT user_id, event_id AS last_event_id,
                event_type AS last_event_type, epoch_us(ts) AS last_ts_us
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
               FROM events) t
         WHERE rn = 1 ORDER BY user_id"""
  )
}
