package graft.operators

import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The SQL front-end surface: the engine's tables as temp views +
  * queries expressed as SQL text through `spark.sql` — same Catalyst
  * planning as the DSL, proving API parity (SURVEY.md §3.4: "No custom
  * parser is needed"; Spark's parser IS the engine's SQL parser).
  * Also the DecimalType surface (SURVEY.md §1): money math in exact
  * decimal, immune to FP summation-order drift by construction.
  */
object SqlOps {

  /** Register fixture tables as temp views for SQL-text queries. Each
    * `spark.read.parquet` costs a schema-inference job (~20 ms, measured:
    * ten 1-task jobs ahead of q_sql_lateral_top1's first real stage), so
    * queries pass exactly the tables their SQL text references — an
    * r21 optimization (guide §1.2: don't compute what you throw away);
    * the no-arg form keeps the register-everything behavior for harness
    * callers. View registration is metadata-only and changes no plan. */
  def registerViews(s: SparkSession, d: String,
      only: Seq[String] = Seq.empty): Unit = {
    val wanted = if (only.isEmpty) Tables.names else only
    wanted.filterNot(_ == "events")
      .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    if (only.isEmpty || only.contains("events"))
      Tables.events(s, d).createOrReplaceTempView("events")
  }

  val queries: Map[String, Q] = Map(
    // TPC-H Q3 shape, written as SQL TEXT rather than the DSL — the whole
    // relational stack (parse → analyze → optimize → execute) through the
    // SQL entry point. Plan is identical to the DSL form: broadcast/SMJ
    // joins + partial aggregation + TakeOrderedAndProject for the LIMIT.
    "q_sql_revenue" -> ((s, d) => {
      registerViews(s, d, Seq("customer", "orders", "lineitem"))
      s.sql("""
        SELECT o_orderkey,
               round(sum(l_extendedprice * (1.0 - l_discount)) * 100) / 100
                 AS revenue,
               c_mktsegment
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, c_mktsegment
        ORDER BY revenue DESC, o_orderkey
        LIMIT 50
      """)
    }),

    // WITH RECURSIVE through Spark's own parser/executor (new in Spark
    // 4): ancestor-chain depth over a deterministic binary-heap parent
    // relation (parent(n) = (n-1) div 2, root 0) built from nation. The
    // recursion is the UnionLoop iterative plan — each step is a
    // distributed batch, so a 100 TB hierarchy walks in O(depth) rounds,
    // the same shape as GraphOps' star contraction. Only the integer-
    // division spelling differs per engine (div vs //).
    "q_sql_org_depth" -> ((s, d) => {
      registerViews(s, d, Seq("nation"))
      s.sql("""
        WITH RECURSIVE up(node, anc, depth) AS (
          SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
                 CAST(0 AS BIGINT)
          FROM nation
          UNION ALL
          SELECT node, (anc - 1) div 2, depth + 1 FROM up WHERE anc > 0
        )
        SELECT node, max(depth) AS depth
        FROM up GROUP BY node ORDER BY node
      """)
    }),

    // Correlated LATERAL subquery with ORDER BY + LIMIT — "for each row,
    // a dependent top-1 query". Catalyst decorrelates the lateral into a
    // join + per-key limit rather than executing the subquery per row, so
    // the shape stays distributed at any fact size. Same SQL text runs on
    // DuckDB as the oracle.
    "q_sql_lateral_top1" -> ((s, d) => {
      registerViews(s, d, Seq("customer", "orders"))
      s.sql("""
        SELECT c_custkey, o.o_orderkey, o.price
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, round(o_totalprice * 100) / 100 AS price
          FROM orders WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
        ) o
        ORDER BY c_custkey
      """)
    }),

    // Exact decimal money math: quantities cast to DECIMAL(18,2) before
    // summing, so the result is EXACT in both engines regardless of
    // aggregation order — the no-compromise alternative to Num.round2 for
    // financial columns. Output cast to double only for the compare.
    "q_decimal_agg" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_sql_revenue" ->
      """SELECT o_orderkey,
                round(sum(l_extendedprice * (1.0 - l_discount)) * 100) / 100
                  AS revenue,
                c_mktsegment
         FROM customer
         JOIN orders   ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey, c_mktsegment
         ORDER BY revenue DESC, o_orderkey
         LIMIT 50""",
    "q_sql_org_depth" ->
      """WITH RECURSIVE up(node, anc, depth) AS (
           SELECT n_nationkey::BIGINT, n_nationkey::BIGINT, 0::BIGINT
           FROM nation
           UNION ALL
           SELECT node, (anc - 1) // 2, depth + 1 FROM up WHERE anc > 0)
         SELECT node, max(depth) AS depth
         FROM up GROUP BY node ORDER BY node""",
    "q_sql_lateral_top1" ->
      """SELECT c_custkey, o.o_orderkey, o.price
         FROM customer c,
         LATERAL (
           SELECT o_orderkey, round(o_totalprice * 100) / 100 AS price
           FROM orders WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
         ) o
         ORDER BY c_custkey""",
    "q_decimal_agg" ->
      """SELECT o_orderstatus,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_price,
                count(*) AS n
         FROM orders
         GROUP BY o_orderstatus ORDER BY o_orderstatus"""
  )
}
