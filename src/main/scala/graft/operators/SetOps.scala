package graft.operators

import graft.Tables
import graft.Tables.Q
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
         ORDER BY o_custkey"""
  )
}
