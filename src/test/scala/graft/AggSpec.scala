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

  test("salted two-stage aggregate equals the plain one-stage aggregate") {
    val salted = SparkEntry.queries("q_skew_salted_agg")(spark, TestSpark.sf)
      .collect()
    val plain = Tables.lineitem(spark, TestSpark.sf)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"),
        count(lit(1)))
      .orderBy("l_returnflag").collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (sr, pr) =>
      assert(sr.getString(0) == pr.getString(0))
      assert(sr.getDouble(1) == pr.getDouble(1), s"sum_qty ${sr.getString(0)}")
      assert(sr.getLong(3) == pr.getLong(2), s"cnt ${sr.getString(0)}")
    }
  }

  test("winsorize matches an exact in-memory reference") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    // independent reference: per-group sort in Scala, same integer rank
    // selection (feasible at sf0.001; the DuckDB oracle covers bigger SFs)
    val byG = li.select("l_returnflag", "l_extendedprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (g, a) => g -> a.map(_._2).sorted }
    val expected = byG.map { case (g, xs) =>
      val n = xs.length
      val lo = xs((n + 99) / 100 - 1)
      val hi = xs((n * 99 + 99) / 100 - 1)
      val wsum = xs.map(x => BigDecimal(math.min(math.max(x, lo), hi))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      g -> (wsum.toDouble, xs.count(_ < lo).toLong, xs.count(_ > hi).toLong,
        n.toLong)
    }
    val rows = SparkEntry.queries("q_winsorize")(spark, TestSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSet == expected.keySet)
    for (r <- rows) {
      val g = r.getString(0)
      val (wsum, nLo, nHi, n) = expected(g)
      assert(r.getDouble(1) == wsum, s"$g wsum ${r.getDouble(1)} vs $wsum")
      assert(r.getLong(2) == nLo && r.getLong(3) == nHi, s"$g clip counts")
      assert(r.getLong(4) == n, s"$g row count")
      // the clip is real on both tails and bounded at ~1% each
      assert(nLo > 0 && nLo < n / 50, s"$g clipped below: $nLo of $n")
      assert(nHi > 0 && nHi < n / 50, s"$g clipped above: $nHi of $n")
    }
  }

  test("null-safe join keeps NULL-key rows matched to the NULL group") {
    val rows = SparkEntry.queries("q_join_null_safe")(spark, TestSpark.sf)
      .collect()
    val ev = Tables.events(spark, TestSpark.sf)
    assert(rows.length == ev.count(), "no rows dropped by the join")
    val nullRows = rows.filter(_.isNullAt(1))
    assert(nullRows.nonEmpty, "NULL segment present (user bucket 0)")
    // every NULL-segment row carries the NULL group's own count
    assert(nullRows.forall(_.getLong(2) == nullRows.length))
  }
}
