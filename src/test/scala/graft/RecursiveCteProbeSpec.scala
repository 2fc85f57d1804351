package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scratch probe: does this Spark build support WITH RECURSIVE? */
class RecursiveCteProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  test("recursive cte parses and runs") {
    val df = spark.sql(
      """WITH RECURSIVE r(n) AS (
           SELECT 1
           UNION ALL
           SELECT n + 1 FROM r WHERE n < 5)
         SELECT sum(n) AS s FROM r""")
    assert(df.collect().head.getLong(0) == 15L)
  }
}
