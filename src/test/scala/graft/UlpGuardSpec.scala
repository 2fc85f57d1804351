package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ln() ulp-boundary guard for the two oracles whose hash compare rests on
  * `round(ln(exact_integer_ratio) * 1e6)` agreeing between the JVM's
  * Math.log and the driver DuckDB's libm (q_bigram_pmi, q_unigram_logprob).
  *
  * Both engines are handed bit-identical doubles (the ratios are built
  * from exact integer counts), so the only divergence channel is a 1-ulp
  * libm disagreement on ln itself. That flips the rounded BIGINT only if
  * ln(r)*1e6 sits within ~|ln(r)|*1e6*2^-52 (< 5e-9 for every value in
  * range) of a .5 boundary. This spec asserts every term at BOTH driver
  * scales sits >= 1e-8 away — if data ever lands on a boundary, this
  * fails first, and SURVEY §7.3 says demote the query to rows-only rather
  * than ship a flake.
  */
class UlpGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Eps = 1e-8
  private val SfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  /** distance of x from the nearest half-integer rounding boundary */
  private def boundaryDist(x: Double): Double = {
    val f = x - math.floor(x)
    math.abs(f - 0.5)
  }

  test("q_unigram_logprob: every rounded ln(c/N)*1e6 term is off-boundary") {
    for (d <- SfDirs) {
      val words = Tables.documents(spark, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val counts = words.groupBy("word").agg(count(lit(1)).as("c"))
        .select("c").as[Long](spark.implicits.newLongEncoder).collect()
      val n = counts.sum
      val worst = counts.distinct
        .map(c => boundaryDist(math.log(c.toDouble / n.toDouble) * 1e6)).min
      assert(worst >= Eps,
        s"$d: a ln(c/N) term sits $worst from a .5 boundary — demote " +
          "q_unigram_logprob to rows-only before a libm difference flakes it")
    }
  }

  test("q_bigram_pmi: every rounded PMI*1e6 term is off-boundary") {
    for (d <- SfDirs) {
      val docs = Tables.documents(spark, d)
      val w = split(col("text"), " ")
      val words = docs.select(explode(w).as("word"))
        .filter(length(col("word")) > 0)
      val uni = words.groupBy("word").agg(count(lit(1)).as("c"))
      val bg = docs.select(explode(zip_with(
          slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      val bi = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      val nU = uni.agg(sum("c")).head.getLong(0)
      val nBi = bi.agg(sum("c_ab")).head.getLong(0)
      // mirror the query's exact double construction: integer products,
      // THEN one cast each side, THEN the divide
      val terms = bi.filter(col("c_ab") >= 20)
        .join(uni.select(col("word").as("w1"), col("c").as("c_a")), "w1")
        .join(uni.select(col("word").as("w2"), col("c").as("c_b")), "w2")
        .select("c_ab", "c_a", "c_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(terms.nonEmpty, s"$d: no PMI terms survived the floor")
      val worst = terms.map { case (cab, ca, cb) =>
        boundaryDist(math.log((cab * nU * nU).toDouble
          / (nBi * ca * cb).toDouble) * 1e6)
      }.min
      assert(worst >= Eps,
        s"$d: a PMI term sits $worst from a .5 boundary — demote " +
          "q_bigram_pmi to rows-only before a libm difference flakes it")
      spark.catalog.clearCache()
    }
  }
}
