package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-explicit batch readers for the text formats raw corpora arrive
  * in (JSONL from crawls and API dumps, CSV from tabular exports) — the
  * batch siblings of the streaming ingestion seam (graft.streaming
  * .EventSource). Two rules, both scale-driven:
  *
  *  - The schema is always EXPLICIT. Inference reads the data twice (a
  *    full sampling pass before the real one) and can flip types between
  *    ingest runs when a batch happens to lack, say, a null — at 100 TB
  *    both are unacceptable. Callers pass the contract schema; files are
  *    read once, split-parallel like any other source.
  *  - Malformed records are CONTAINED, not fatal: PERMISSIVE mode lands
  *    broken lines in a `_corrupt` column (the reference's
  *    log-and-continue, knobs.go:85-90, as a source semantic), so one bad
  *    crawl record cannot fail a 1000-executor job. Callers split on
  *    `_corrupt IS NULL` and route the rejects to a quarantine sink.
  *    NOTE (Spark restriction): a query that references ONLY the corrupt
  *    column of a raw file scan is rejected
  *    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — persist
  *    the parsed frame once, then split; at ingest scale you were going
  *    to materialize the batch anyway.
  */
object TextSources {

  val CorruptCol = "_corrupt"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, "string")

  /** JSON-lines reader: one JSON object per line, explicit schema,
    * malformed lines contained in [[CorruptCol]]. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** CSV reader with header, explicit schema, malformed rows contained in
    * [[CorruptCol]]. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** ORC reader/writer pair — the columnar interchange format alongside
    * the engine's native Parquet (warehouses emit either; both carry
    * min/max statistics the scan uses for predicate pushdown, so a filter
    * reaches the stripe/row-group reader the same way). ORC is
    * self-describing, so no corrupt-record containment applies: a damaged
    * stripe fails its SPLIT, not the record — upstream validation happens
    * at the text→columnar ingest boundary (jsonLines/csv above). Schema is
    * still explicit, same contract rule as the text readers. */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
