package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("4", "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
