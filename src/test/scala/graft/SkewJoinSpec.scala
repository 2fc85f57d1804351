package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting — the runtime half of the engine's skew story
  * (the compile-time half is the salted aggregation, q_skew_salted_agg).
  * A planted hot key concentrates ~90% of a million rows in one shuffle
  * partition; adaptive execution must re-plan the sort-merge join with
  * that partition SPLIT (`skew=true` on the final plan's SMJ node) so one
  * straggler task doesn't serialize the stage — at 100 TB a single hot
  * join key otherwise pins a thousand-executor stage on one core.
  * Thresholds are lowered in-spec (the planted partition is ~MBs, real
  * gates are 256 MB-class); the assertion is the re-plan SHAPE.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a planted hot join key is split by AQE (skew=true in final plan)") {
    TestSpark.withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // the planted hot partition is ~10 MB; production-size gates would
      // never see it, so scale them to the fixture
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB",
      // coalescing would merge the small partitions and muddy the count;
      // keep the experiment to the skew path
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val n = 1000000L
      // 90% of rows carry key 0; the rest spread over distinct keys. The
      // payload v must be INCOMPRESSIBLE and must survive the join
      // (consumed by the aggregate): skew detection reads compressed
      // map-output sizes, and a hot partition of a million IDENTICAL
      // longs lz4-compresses below any threshold — the first cut of this
      // spec planted exactly that and AQE rightly saw no skew.
      val fact = spark.range(n).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
        xxhash64(col("id")).as("v"))
      val dim = spark.range(2000).select(col("id").as("dk"),
        (col("id") % 5).as("grp"))
      val joined = fact.join(dim.hint("merge"), col("k") === col("dk"))
        .groupBy("grp")
        .agg(count(lit(1)).as("cnt"), sum(pmod(col("v"), lit(1000L))).as("s"))
      val rows = joined.collect()
      // key 0 matches dim row 0 -> 900k joined rows; the distinct keys
      // surviving the 10% leg that also exist in dim are 9,19,...,1999
      // (200 of them, one row each).
      assert(rows.map(_.getLong(1)).sum == 900000L + 200L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"))
      assert(finalPlan.contains("skew=true"),
        s"AQE should have split the hot partition:\n$finalPlan")
    }
  }
}
