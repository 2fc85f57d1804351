package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("4", "graft-test")
  val sf: String = "/root/testdata/sf0.001"

  /** Scoped session-conf override: set, run, restore the PRIOR value (or
    * unset). One copy because the restore half is easy to get wrong — a
    * spec this round restored a conf to a hardcoded value and leaked
    * state into the rest of the JVM. */
  def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
