package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: `runMain graft.Explain <queryName> [sfDir] [mode]`.
  *
  * Prints the formatted physical plan for one registered query (or `all`),
  * plus row count. Used to verify the plan shape is the one we'd want on a
  * 1000-executor cluster: broadcasts where expected, filters pushed into the
  * scan, whole-stage codegen spans wide, no stray shuffles.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = Sessions.local()
    // comma-separated names batch one JVM/session over several captures
    // (r22: plan-dump tooling only; each query still builds fresh).
    val names =
      if (name == "all") SparkEntry.queries.keys.toSeq.sorted
      else name.split(',').toSeq.filter(_.nonEmpty)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"===== $n =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString(mode)))
      println(s"rows=${df.count()}")
      // Queries may persist intermediates (Tables.orderedOnce, signature
      // reuse in SimilarityOps) sized to their output; drop them between
      // queries like Verify/Bench do, or an `all` run accumulates caches.
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
