package graft

import org.apache.spark.sql.SparkSession

/** Shared local-mode SparkSession builder for the harness mains and tests.
  *
  * Centralizes the conf the engine needs so no table loader has to mutate a
  * live session (see ADVICE.md round 1): UTC timezone (oracle compare),
  * shuffle partitions sized to cores (local mode — a real cluster would set
  * this to a multiple of executor cores), and the legacy nanos-as-long
  * parquet read used by `Tables.events` (the fixture's `ts` column is
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects).
  */
object Sessions {
  def local(
      cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      appName: String = "graft",
      extra: Map[String, String] = Map.empty): SparkSession = {
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
