package graft

import org.apache.spark.sql.functions._

/** Evidence probe for plans/BroadcastRangeJoin: the same interval join
  * executed by the engine's binary-search range join vs Spark's stock
  * nested-loop plan, at an interval count where the O(rows × intervals)
  * shape stops being viable. Usage:
  *
  *   sbt "runMain graft.RangeProbe [nIntervals] [nPoints]"
  *
  * Intervals overlap (each [10i, 10i+15) overlaps its successor by 5) so
  * the prefix-max-hi backward scan is exercised, and points are spread
  * by multiplicative hash so every band matches.
  */
object RangeProbe {
  def main(args: Array[String]): Unit = {
    val nIntervals = args.headOption.map(_.toInt).getOrElse(5000)
    val nPoints = args.drop(1).headOption.map(_.toInt).getOrElse(500000)
    val spark = Sessions.local(appName = "graft-range-probe")

    val intervals = spark.range(nIntervals).select(col("id").as("band_id"),
        (col("id") * 10.0).as("lo"), (col("id") * 10.0 + 15.0).as("hi"))
      .localCheckpoint(true)
    val points = spark.range(nPoints).select(col("id").as("pid"),
        pmod(col("id") * 2654435761L, lit(nIntervals * 10L)).cast("double")
          .as("p"))
      .localCheckpoint(true)

    def run(label: String): Long = {
      val t0 = System.nanoTime()
      val joined = points.join(intervals,
        points("p") >= intervals("lo") && points("p") < intervals("hi"))
      val n = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      val node =
        if (plan.contains("BroadcastRangeJoin")) "BroadcastRangeJoinExec"
        else if (plan.contains("BroadcastNestedLoopJoin")) "BroadcastNestedLoopJoin"
        else "CartesianProduct"
      println(f"[range-probe] $label via $node: rows=$n " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      n
    }

    val a = run(s"custom ($nIntervals intervals x $nPoints points)")
    // third arg "noStock" skips the nested-loop baseline — at 50k+
    // intervals the O(rows × intervals) side takes tens of minutes,
    // which is exactly the point
    if (!args.contains("noStock")) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val b = run("stock")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      require(a == b, s"row-count mismatch: custom $a vs stock $b")
      println("[range-probe] identical row counts — OK")
    }
    spark.stop()
  }
}
