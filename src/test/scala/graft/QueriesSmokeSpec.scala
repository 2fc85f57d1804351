package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run on sf0.001, produce rows, and produce
  * the SAME rows when re-run (plan-level determinism — the oracle compare
  * depends on it). Also pins the driver contract: every oracle entry has a
  * query, and the flagship entry returns rows.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs non-empty and deterministically on sf0.001") {
      val df1 = fn(spark, TestSpark.sf)
      val rows1 = df1.collect()
      assert(rows1.nonEmpty, s"$name returned no rows")
      assert(df1.columns.nonEmpty && df1.columns.forall(_.nonEmpty))
      val rows2 = fn(spark, TestSpark.sf).collect()
      assert(rows1.sameElements(rows2), s"$name not deterministic across runs")
    }
  }
}
