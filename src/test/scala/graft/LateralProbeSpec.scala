package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scratch probe: correlated LATERAL subquery with ORDER BY + LIMIT. */
class LateralProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  test("lateral correlated top-1 parses and runs") {
    graft.operators.SqlOps.registerViews(spark, TestSpark.sf)
    val df = spark.sql(
      """SELECT c_custkey, o.o_orderkey, o.price
         FROM customer c,
         LATERAL (
           SELECT o_orderkey, round(o_totalprice, 2) AS price
           FROM orders WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
         ) o
         ORDER BY c_custkey""")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }
}
