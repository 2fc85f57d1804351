package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_compress_ratio has no SQL oracle (DuckDB exposes no deflate), so its
  * contract is pinned here: determinism across runs, the redundancy
  * ordering the signal exists for, and sane bounds on real fixture text.
  */
class TextQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ratiosFor(rows: Seq[(Long, String)]): Map[Long, Double] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zq")
    try {
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      SparkEntry.queries("q_compress_ratio")(spark, dir.toString)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    } finally {
      spark.catalog.clearCache()
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("repetitive text compresses far below prose; empty text is guarded") {
    val rnd = new scala.util.Random(7)
    val prose = Seq.fill(400)(
      "abcdefghijklmnopqrstuvwxyz".charAt(rnd.nextInt(26))).mkString
    val got = ratiosFor(Seq(
      (1L, "spam ham " * 200), // highly repetitive
      (2L, prose),             // high-entropy "prose"
      (3L, "")))               // degenerate: no division by zero
    assert(got(1L) < 0.05, s"repetitive ratio ${got(1L)}")
    assert(got(2L) > 0.5, s"random-text ratio ${got(2L)}")
    assert(got(1L) < got(2L) / 5, "redundancy ordering lost")
    assert(got(3L) >= 0.0, s"empty doc ratio ${got(3L)}")
  }

  test("fixture ratios are deterministic across runs and in sane bounds") {
    val q = SparkEntry.queries("q_compress_ratio")
    val a = q(spark, TestSpark.sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache()
    val b = q(spark, TestSpark.sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(a.sameElements(b), "compression output not reproducible")
    spark.catalog.clearCache()
    assert(a.length == Tables.documents(spark, TestSpark.sf).count())
    // deflate of short ASCII text stays within (0, 1.2] — above 1 is
    // possible for tiny docs (header overhead), far above means a bug
    for ((id, raw, z, ratio) <- a) {
      assert(z > 0 && ratio > 0, s"doc $id: z=$z ratio=$ratio")
      assert(ratio <= 1.2 || raw < 64, s"doc $id: ratio=$ratio raw=$raw")
    }
  }
}
