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

  /** Register every fixture table as a temp view for SQL-text queries. */
  def registerViews(s: SparkSession, d: String): Unit = {
    Tables.names.foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    Tables.events(s, d).createOrReplaceTempView("events")
  }

  val queries: Map[String, Q] = Map(
    // TPC-H Q3 shape, written as SQL TEXT rather than the DSL — the whole
    // relational stack (parse → analyze → optimize → execute) through the
    // SQL entry point. Plan is identical to the DSL form: broadcast/SMJ
    // joins + partial aggregation + TakeOrderedAndProject for the LIMIT.
    "q_sql_revenue" -> ((s, d) => {
      registerViews(s, d)
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
    "q_decimal_agg" ->
      """SELECT o_orderstatus,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_price,
                count(*) AS n
         FROM orders
         GROUP BY o_orderstatus ORDER BY o_orderstatus"""
  )
}
