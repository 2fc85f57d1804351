package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.TextSources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The JSONL/CSV ingestion path: format round-trips must lose nothing,
  * and a malformed record must be contained, never fatal. */
class TextSourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val docSchema = Tables.documents(spark, TestSpark.sf).schema

  test("JSONL round-trips the documents table losslessly") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_jsonl").toString
    docs.write.mode("overwrite").json(s"$dir/docs")
    // cache: corrupt-column-only queries on raw file scans are disallowed
    val back = TextSources.jsonLines(spark, s"$dir/docs", docSchema).cache()
    assert(back.filter(col(TextSources.CorruptCol).isNotNull).count() == 0)
    val cols = docs.columns.map(col).toSeq
    assert(back.select(cols: _*).exceptAll(docs).isEmpty &&
      docs.exceptAll(back.select(cols: _*)).isEmpty)
  }

  test("CSV round-trips the documents table losslessly") {
    // documents text is space-separated words, no commas/quotes — a clean
    // CSV citizen; escaping behavior is the format's concern, not ours
    val docs = Tables.documents(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(s"$dir/docs")
    val back = TextSources.csv(spark, s"$dir/docs", docSchema).cache()
    assert(back.filter(col(TextSources.CorruptCol).isNotNull).count() == 0)
    val cols = docs.columns.map(col).toSeq
    assert(back.select(cols: _*).exceptAll(docs).isEmpty &&
      docs.exceptAll(back.select(cols: _*)).isEmpty)
  }

  test("ORC round-trips the documents table losslessly with pushdown intact") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_orc").toString
    TextSources.writeOrc(docs, s"$dir/docs")
    val back = TextSources.orc(spark, s"$dir/docs", docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // the filter must reach the ORC reader (same pushdown contract as
    // parquet scans) — formatted explain carries the PushedFilters list
    val plan = back.filter(col("doc_id") > 100)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]"),
      s"filter not pushed to ORC scan:\n$plan")
  }

  test("a malformed JSONL line is contained, valid lines survive") {
    val dir = Files.createTempDirectory("graft_jsonl_bad").toString
    Files.write(Paths.get(dir, "part.jsonl"),
      ("""{"doc_id": 1, "text": "a b c", "lang": "en", "source": "s", "n_chars": 5}""" + "\n" +
        """{"doc_id": 2, "text": "BROKEN""" + "\n" +
        """{"doc_id": 3, "text": "d e f", "lang": "en", "source": "s", "n_chars": 5}""" + "\n")
        .getBytes(StandardCharsets.UTF_8))
    val back = TextSources.jsonLines(spark, dir, docSchema).cache()
    val good = back.filter(col(TextSources.CorruptCol).isNull)
    val bad = back.filter(col(TextSources.CorruptCol).isNotNull)
    assert(good.select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 3L)))
    assert(bad.count() == 1)
    assert(bad.select(TextSources.CorruptCol).first().getString(0)
      .contains("BROKEN"))
  }
}
