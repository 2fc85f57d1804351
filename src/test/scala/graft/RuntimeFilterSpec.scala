package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the 100 TB lever where a SELECTIVE
  * dim-side predicate (here: one market segment's customers) is turned
  * into a bloom filter evaluated INSIDE the fact side's scan, so fact
  * rows that cannot join die at the reader instead of travelling through
  * the shuffle. Spark injects this automatically
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, on by default);
  * what needs proving is that the ENGINE'S query shapes are eligible —
  * an accidental cast or derived join key silences the rewrite with no
  * error, which is why this is pinned by a spec rather than assumed.
  * Local fixtures sit below the size thresholds that gate the rewrite at
  * production scale, so the spec lowers them for the duration — the
  * assertion is about plan SHAPE, not about when the cost model engages.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withRuntimeFilterConfs(body: => Unit): Unit =
    TestSpark.withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // AQE's broadcast demotion doesn't matter here, but a broadcast
      // JOIN would: runtime filters only pay off (and only inject) on
      // shuffle joins, so pin the join strategy via hint below and keep
      // autoBroadcast off for the control's benefit.
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")(body)

  test("selective dim predicate injects a bloom filter into the fact scan") {
    withRuntimeFilterConfs {
      val o = Tables.orders(spark, TestSpark.sf)
      val c = Tables.customer(spark, TestSpark.sf)
        .filter(col("c_mktsegment") === "BUILDING")
      val joined = o.hint("merge")
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom filter on the fact side:\n$optimized")
      // The filter must sit on the FACT side's key, i.e. reference
      // o_custkey, not the already-filtered dim side.
      assert(optimized.linesIterator.exists(l =>
          l.contains("might_contain") && l.contains("o_custkey")),
        s"bloom filter should prune on o_custkey:\n$optimized")
    }
  }

  test("without a selective predicate no filter is injected") {
    withRuntimeFilterConfs {
      val o = Tables.orders(spark, TestSpark.sf)
      val c = Tables.customer(spark, TestSpark.sf)
      val joined = o.hint("merge")
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("might_contain"),
        s"no selective creation side -> no runtime filter:\n$optimized")
    }
  }

  test("bloom-pruned join answers exactly like the plain join") {
    withRuntimeFilterConfs {
      val o = Tables.orders(spark, TestSpark.sf)
      val c = Tables.customer(spark, TestSpark.sf)
        .filter(col("c_mktsegment") === "BUILDING")
      val pruned = o.hint("merge")
        .join(c, o("o_custkey") === c("c_custkey"))
        .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
      var plain: Seq[org.apache.spark.sql.Row] = Seq.empty
      TestSpark.withConfs(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        plain = o.join(c, o("o_custkey") === c("c_custkey"))
          .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
      }
      assert(pruned == plain)
    }
  }
}
