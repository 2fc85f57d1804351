package graft

import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [q_name ...] — the optional names restrict the
    // dump to those queries (dev iteration); the driver's 2-arg invocation
    // runs everything.
    val sfDir = args(0)
    val outDir = args(1)
    val only = args.drop(2).toSet
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    val spark = Sessions.local(appName = "graft-verify")
    new java.io.File(outDir).mkdirs()
    // Round-12 (verdict #3): a query that dies must leave a NAMED error
    // in the dump dir — round 11's loader break erased 21 queries from
    // CORRECTNESS by silent absence, with zero diagnosis in the artifact.
    val errors = scala.collection.mutable.Map.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        errors(name) = s"${e.getClass.getName}: " +
          Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(300)
        System.err.println(s"[verify] $name failed: ${errors(name)}")
      } finally spark.catalog.clearCache() // queries that persist()
      // intermediates (the near-dup family) must not leave corpus-sized
      // cache frames registered for the remaining 50+ queries of the run
    }
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
        .mkString("{", ",", "}"))
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson(only))
    spark.stop()
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The oracle map rendered as the JSON file the driver consumes; shared
    * with the type-sweep spec so both gates serialize identically. */
  def oracleJson(only: Set[String] = Set.empty): String =
    SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
      .mkString("{", ",", "}")
}
