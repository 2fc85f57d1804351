package graft.operators

import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.functions._
import graft.functions.Num.round2

/** Scan + scalar-function surface (SURVEY.md §2B "Scans" / "Projection /
  * filter / scalar functions").
  *
  * Generalizes the reference's per-message projection/filter steps (rate
  * scaling knobs.go:63-67, zero suppression knobs.go:68-69) to the full
  * built-in scalar library. Everything here is a narrow projection over one
  * scan — the plan to demand is a single WholeStageCodegen span with the
  * predicate and column pruning pushed into the parquet reader
  * (`PushedFilters` / `ReadSchema` in explain): at 100 TB the scan IS the
  * query, so rows that can be skipped at the reader never cost CPU.
  *
  * Oracle dialect notes (SURVEY.md §7.3): Spark `dayofweek` is 1-7
  * Sunday-first, DuckDB's is 0-6 → oracle adds 1; Spark `ceil` returns
  * LONG, DuckDB DOUBLE → oracle casts; DATE values don't normalize across
  * the compare harness → all date-ish outputs go out as epoch micros.
  */
object ScalarOps {

  /** Date-partitioned events materialization for [[q_partition_prune]]
    * (idempotent per (session, sfDir), same tag scheme as
    * JoinOps.bucketedTables). Directory-partitioning by day is the OTHER
    * physical-layout lever next to bucketing: a time-range predicate
    * becomes a directory listing, so a 100 TB store scans only the days
    * asked for. Shared with PartitionPruneSpec. */
  def partitionedEvents(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val name = s"ev_day_${Tables.sfTag(d)}"
    Tables.materializedTable(s, name) {
      Tables.events(s, d)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .write.partitionBy("day").mode("overwrite").saveAsTable(name)
    }
  }

  val queries: Map[String, Q] = Map(
    // Partition-pruned time-range scan over the day-partitioned events
    // layout: the `day` predicate is a PARTITION filter (PartitionFilters
    // in the scan, not PushedFilters), so the 23 out-of-range days are
    // never opened — directory pruning, the scan-side complement of
    // q_join_bucketed's exchange elimination. PartitionPruneSpec asserts
    // the filter lands partition-side and that only the 7 matching
    // partitions are read; the oracle replays the same week over the raw
    // table (partitioning is physical only).
    "q_partition_prune" -> ((s, d) => {
      partitionedEvents(s, d)
        .filter(col("day") >= "2024-01-08" && col("day") <= "2024-01-14")
        .groupBy("day", "event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(round2(col("value")).cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .orderBy("day", "event_type")
    }),

    // The most-used operator in any workload: scan, predicate, narrow
    // projection. Filter lands in PushedFilters; ReadSchema carries only
    // the 6 referenced columns of lineitem's 11.
    "q_scan_filter_project" -> ((s, d) => {
      Tables.orderedOnce(Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("disc_price")),
        col("l_orderkey"), col("l_linenumber"))
    }),

    "q_scalar_string" -> ((s, d) => {
      Tables.orderedOnce(Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          lower(col("p_brand")).as("brand_lower"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_type"), 1, 5).as("type_pfx"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          trim(col("p_name")).as("name_trim"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word")),
        col("p_partkey"))
    }),

    "q_scalar_date" -> ((s, d) => {
      Tables.orderedOnce(Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"),
          dayofweek(col("o_orderdate")).cast("long").as("o_dow"),
          unix_micros(date_trunc("month", col("o_orderdate")).cast("timestamp"))
            .as("month_start_us"),
          unix_micros((col("o_orderdate") + expr("INTERVAL 30 DAYS"))
            .cast("timestamp")).as("plus30_us")),
        col("o_orderkey"))
    }),

    // SORT-FIRST, PROJECT-AFTER (optimization r21, guide §2.3/§2.4): the
    // sort keys (l_orderkey, l_linenumber) are plain source columns and a
    // projection is a map — it preserves the sorted row order — so the
    // global sort runs on the 6 NARROW source columns and the
    // transcendental projection is computed exactly ONCE, after the range
    // exchange, parallel across the sort partitions. The two shapes this
    // replaces both paid more: a bare projection-then-sort executes the
    // math TWICE (the range boundary sampling re-runs the child), and
    // orderedOnce's persist() paid a columnar cache build measured at
    // 1.9 s single-task at sf0.1 (the scan stage is one row group) plus
    // output-sized executor memory at any scale. Output rows and order
    // are IDENTICAL ((l_orderkey, l_linenumber) is the table's unique
    // key); oracle hash unchanged.
    "q_scalar_math" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net"),
          abs(col("l_discount") - 0.05).as("disc_dev"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          floor(col("l_extendedprice")).as("price_floor"),
          round(sqrt(col("l_quantity")), 4).as("qty_sqrt"),
          round(log(col("l_extendedprice")), 4).as("price_ln"),
          round(pow(col("l_tax") + 1.0, 2), 4).as("tax_sq"))
    }),

    // Array ops over the 64-dim float embeddings. Elements are cast to
    // double and rounded in BOTH engines so float32→double widening is
    // applied identically before compare. The slice/transform result goes
    // out as a comma-joined string of SCALED LONGS (round(x*1e4)): raw
    // array<double> columns crash the driver's pandas comparator
    // (unhashable ndarray), and double→string rendering differs across
    // engines (Spark Ryu says 1.0E-4 where DuckDB says 0.0001) — integer
    // rendering is identical everywhere.
    "q_scalar_array" -> ((s, d) => {
      Tables.orderedOnce(Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
          round(element_at(col("embedding"), 64).cast("double"), 4).as("e64"),
          concat_ws(",", transform(slice(col("embedding"), 1, 3),
            x => round(x.cast("double") * 10000).cast("long").cast("string")))
            .as("head3")),
        col("vec_id"))
    }),

    // Conditional projection + aggregation over the branches.
    "q_case_when" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("bucket"),
          col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), round2(avg("o_totalprice")).as("avg_price"))
        .orderBy("bucket")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // Partitioning is physical only — the spec is the same week over the
    // raw table. day is derived (not filtered on ts) so both engines cut
    // on the identical string boundary.
    "q_partition_prune" ->
      """WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, value
                    FROM events)
         SELECT day, event_type, count(*) AS n_events,
                CAST(sum(CAST(round(value * 100) / 100 AS DECIMAL(18,2)))
                  AS DOUBLE) AS sum_value
         FROM e
         WHERE day >= '2024-01-08' AND day <= '2024-01-14'
         GROUP BY day, event_type
         ORDER BY day, event_type""",
    "q_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
                round(l_extendedprice * (1.0 - l_discount) * 100) / 100 AS disc_price
         FROM lineitem
         WHERE l_quantity > 45 AND l_discount >= 0.05
         ORDER BY l_orderkey, l_linenumber""",
    "q_scalar_string" ->
      """SELECT p_partkey,
                upper(p_name) AS name_upper,
                lower(p_brand) AS brand_lower,
                CAST(length(p_name) AS BIGINT) AS name_len,
                substring(p_type, 1, 5) AS type_pfx,
                p_brand || '#' || p_type AS brand_type,
                trim(p_name) AS name_trim,
                regexp_extract(p_name, '^(\w+)', 1) AS first_word
         FROM part ORDER BY p_partkey""",
    "q_scalar_date" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS BIGINT) AS o_year,
                CAST(month(o_orderdate) AS BIGINT) AS o_month,
                CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS o_dow,
                epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
                epoch_us(o_orderdate + INTERVAL 30 DAY) AS plus30_us
         FROM orders ORDER BY o_orderkey""",
    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
                round(l_extendedprice * (1.0 - l_discount) * 100) / 100 AS net,
                abs(l_discount - 0.05) AS disc_dev,
                CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
                CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
                round(sqrt(l_quantity), 4) AS qty_sqrt,
                round(ln(l_extendedprice), 4) AS price_ln,
                round(pow(l_tax + 1.0, 2), 4) AS tax_sq
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_scalar_array" ->
      """SELECT vec_id,
                CAST(len(embedding) AS BIGINT) AS dim,
                round(embedding[1]::DOUBLE, 4) AS e1,
                round(embedding[64]::DOUBLE, 4) AS e64,
                array_to_string(list_transform(embedding[1:3],
                  x -> CAST(CAST(round(x::DOUBLE * 10000) AS BIGINT) AS VARCHAR)), ',') AS head3
         FROM embeddings ORDER BY vec_id""",
    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
                     WHEN o_totalprice > 100000 THEN 'mid'
                     ELSE 'low' END AS bucket,
                count(*) AS n, round(avg(o_totalprice) * 100) / 100 AS avg_price
         FROM orders
         GROUP BY 1 ORDER BY bucket"""
  )
}
