package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adversarial-skew probe for the window-group-limit family
  * (q_domain_cap / q_topk_per_group / q_cluster_sample shapes):
  * `runMain graft.WindowLimitSkewProbe [nRows]` (default 10M).
  *
  * ScalePatternsSpec pins the PLAN (a Partial WindowGroupLimit below the
  * exchange); this probe shows the plan matters WHERE it matters — a
  * corpus where the capped key owns 90% of all rows. With the map-side
  * prune, every scan partition forwards at most cap rows per key, so the
  * hot key crosses the exchange as ≤ cap × partitions rows; without it
  * (Catalyst's InferWindowGroupLimit excluded — exactly what a
  * hand-written filter-after-window that the rewrite can't see would
  * get), ALL 90% of the corpus shuffles to the ONE task that owns the
  * hot (lang, source) partition and gets sorted there — the unsplittable
  * hot-task trap, demonstrated rather than assumed. The probe asserts
  * both variants return identical results (the rule is an optimization,
  * not a semantics change) and reports both wall times plus the hot
  * key's output count.
  */
object WindowLimitSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = Sessions.local(appName = "graft-wgl-skew-probe")

    // 90% of rows land on ("en", "hot"); the rest spread over ~1000
    // (lang, source) pairs. Pure codegen generation — no driver loop.
    def corpus: DataFrame = spark.range(0, n).select(
      col("id").as("doc_id"),
      when(col("id") % 10 =!= 0, lit("en"))
        .otherwise(concat(lit("l"), pmod(col("id"), lit(37)))).as("lang"),
      when(col("id") % 10 =!= 0, lit("hot"))
        .otherwise(concat(lit("s"), pmod(col("id"), lit(1000)))).as("source"))

    val cap = 5
    def capped: DataFrame = {
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(graft.functions.Num.mulHash(col("doc_id"), 1000000007L),
          col("doc_id"))
      corpus.withColumn("rk", row_number().over(w)).filter(col("rk") <= cap)
    }

    def run(): (Double, Array[(String, String, Long, Long)]) = {
      val t0 = System.nanoTime()
      val rows = capped.collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(0), r.getInt(3).toLong))
      ((System.nanoTime() - t0) / 1e9,
        rows.sortBy(t => (t._1, t._2, t._4)))
    }

    val (withRule, resA) = run()
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit")
    val (withoutRule, resB) =
      try run()
      finally spark.conf.unset("spark.sql.optimizer.excludedRules")

    require(resA.sameElements(resB),
      "WindowGroupLimit changed the result set — it must be a pure optimization")
    val hotRows = resA.count(t => t._1 == "en" && t._2 == "hot")
    require(hotRows == cap, s"hot key emitted $hotRows rows, expected $cap")
    val line =
      s"""{"metric":"window_limit_skew_probe","rows":$n,"hot_share":0.9,"cap":$cap,"out_rows":${resA.length},"hot_out":$hotRows,"secs_with_wgl":${f"$withRule%.2f"},"secs_without_wgl":${f"$withoutRule%.2f"},"speedup":${f"${withoutRule / withRule}%.2f"}}"""
    System.err.println(line)
    println(line)
    spark.stop()
  }
}
