package graft
object ExplainNearDup {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "explain-neardup")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (q <- Seq("q_minhash_neardup", "q_jaccard_neardup")) {
      val df = SparkEntry.queries(q)(spark, d)
      df.write.format("noop").mode("overwrite").save() // materialize cache
      val plan = df.queryExecution.executedPlan.toString
      val explodes = "Generate explode".r.findAllIn(plan).length
      val memScans = "InMemoryTableScan".r.findAllIn(plan).length
      println(s"[explain] $q: Generate-explode nodes=$explodes, InMemoryTableScan nodes=$memScans")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
