package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-side skew — the small-files/straggler-files problem: a shard
  * write partitioned by a skewed column otherwise emits one huge file
  * next to hundreds of slivers, and the NEXT job's scan inherits the
  * imbalance. AQE's rebalance hint (`REBALANCE(col)`) re-plans the write
  * exchange with skew-aware splitting + small-partition coalescing, so
  * output files track the advisory size, not the key distribution. This
  * is the write-path counterpart of SkewJoinSpec's read-path split, and
  * like every AQE lever it can be silently lost to an eligibility slip —
  * hence a spec.
  */
class RebalanceWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("REBALANCE splits a hot write partition to the advisory size") {
    // Splitting is optimizeSkewsInRebalancePartitions (on by default)
    // paced by the advisory size — that one conf is the whole experiment.
    TestSpark.withConfs(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1MB") {
      // 95% of rows in one key, incompressible payload (the SkewJoinSpec
      // lesson: sizes are compressed bytes).
      val skewed = spark.range(400000L).select(
        when(col("id") % 20 < 19, lit("hot")).otherwise(lit("cold")).as("shard"),
        xxhash64(col("id")).as("v1"), xxhash64(col("id"), lit(1)).as("v2"))

      val out = "/tmp/graft-warehouse/rebalance_probe"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      skewed.hint("rebalance", col("shard"))
        .write.mode("overwrite").parquet(out)

      val files = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sorted
      assert(files.length >= 3,
        s"hot shard should split into multiple files, got ${files.length}")
      // No monster file: with ~6 MB of hot rows and a 1 MB advisory, the
      // biggest file must sit near the advisory, not near the full shard.
      assert(files.max < 4L * 1024 * 1024,
        s"largest file ${files.max}B suggests the hot shard did not split")

      // Control: the naive repartition(shard) write concentrates the hot
      // key in ONE file regardless of size.
      val ctl = "/tmp/graft-warehouse/rebalance_probe_ctl"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ctl))
      skewed.repartition(col("shard"))
        .write.mode("overwrite").parquet(ctl)
      val ctlMax = new java.io.File(ctl).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).max
      assert(ctlMax > files.max,
        s"control's hot file ($ctlMax B) should dwarf rebalanced max (${files.max} B)")
    }
  }
}
