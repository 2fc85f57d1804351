package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Aggregate-family properties without a SQL oracle. */
class AggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_percentile tracks exact percentile within 5% (the scale path)") {
    // q_quantiles registers the EXACT form because DuckDB can check it;
    // at corpus scale the swap-in is approx_percentile (t-digest-style
    // sketch, map-side partial aggregation). This pins the swap's error
    // so the scale path isn't a semantics cliff.
    val e = Tables.events(spark, TestSpark.sf)
    Seq(0.5, 0.95, 0.99).foreach { p =>
      val row = e.agg(
        expr(s"percentile(value, $p)").as("exact"),
        expr(s"approx_percentile(value, $p, 10000)").as("approx")).first()
      val (exact, approx) = (row.getDouble(0), row.getDouble(1))
      val denom = math.max(math.abs(exact), 1e-9)
      assert(math.abs(approx - exact) / denom <= 0.05,
        s"p=$p: exact=$exact approx=$approx")
    }
  }
}
