package graft

import graft.sources.TextSources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Ingestion realities a long-lived corpus store hits that the happy-path
  * readers don't exercise: crawl drops arrive gzip-compressed, and a
  * dataset written over months drifts schema across its parquet files.
  * Both behaviors are Spark built-ins — and both are silently losable
  * (a codec regression reads garbage rows into _corrupt; a
  * non-merged read picks ONE file's schema and silently drops the new
  * column), so they are pinned here.
  */
class IngestFormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("gzip JSONL reads transparently, corrupt-record containment intact") {
    val dir = new java.io.File("/tmp/graft-warehouse/ingest_gz")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val out = new java.io.PrintWriter(new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir, "part-0.jsonl.gz"))))
    out.println("""{"doc_id": 1, "text": "alpha"}""")
    out.println("""{"doc_id": 2, "text": "beta"}""")
    out.println("""not json at all""")
    out.println("""{"doc_id": 4, "text": "gamma"}""")
    out.close()

    // cache(): Spark refuses a query whose referenced columns are ONLY
    // the corrupt column against raw JSON (QUERY_ONLY_CORRUPT_RECORD_
    // COLUMN) — parse once, then both the good and quarantine counts
    // read the parsed result, which is also what a real ingest job does.
    val df = TextSources.jsonLines(spark, dir.getAbsolutePath, docSchema)
      .cache()
    try {
      val good = df.filter(col("_corrupt").isNull)
        .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted
      assert(good.toSeq == Seq(1L, 2L, 4L))
      assert(df.filter(col("_corrupt").isNotNull).count() == 1)
    } finally df.unpersist()
  }

  test("parquet schema evolution: mergeSchema unions drifted files") {
    import spark.implicits._
    val dir = "/tmp/graft-warehouse/ingest_evolve"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // month 1: (doc_id, text); month 6: lang added
    Seq((1L, "old doc")).toDF("doc_id", "text")
      .write.parquet(s"$dir/m1")
    Seq((2L, "new doc", "en")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/m6")

    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/m1", s"$dir/m6")
    assert(merged.columns.sorted.toSeq == Seq("doc_id", "lang", "text"))
    val byId = merged.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(merged.columns.indexOf("lang"))) null
       else r.getString(merged.columns.indexOf("lang")))).toMap
    assert(byId(1L) == null && byId(2L) == "en")

    // The trap being pinned: a non-merged multi-file read takes ONE
    // footer's schema — which one is file-picking luck, not a contract.
    // So the assertion is exactly that: the result equals one of the two
    // files' schemas (when the old footer wins, `lang` silently drops);
    // only mergeSchema makes the union a guarantee.
    val unmerged = spark.read.parquet(s"$dir/m1", s"$dir/m6")
      .columns.sorted.toSeq
    assert(unmerged == Seq("doc_id", "text") ||
      unmerged == Seq("doc_id", "lang", "text"),
      s"non-merged schema should be one file's footer, got $unmerged")
  }
}
