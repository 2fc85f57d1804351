package graft

import graft.operators.ScalarOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_partition_prune's scale claim is that the day predicate is answered
  * by the DIRECTORY LISTING, not by reading rows: the scan must carry it
  * as a PartitionFilter and select only the matching partitions. The
  * oracle proves the answer; this proves the layout did the work.
  */
class PartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("day predicate prunes partitions at the scan") {
    val df = ScalarOps.partitionedEvents(spark, TestSpark.sf)
      .filter(col("day") >= "2024-01-08" && col("day") <= "2024-01-14")
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    val pf = scan.partitionFilters.map(_.sql).mkString(", ")
    assert(pf.contains(">=") && pf.contains("<="),
      s"day range must be a partition filter, got: $pf")
    // selectedPartitions is the pruned directory set: exactly the 7 days
    // of the window (the fixture spans 2024-01-01..01-30 at every sf).
    assert(scan.selectedPartitions.partitionCount == 7,
      s"expected 7 pruned partitions, got ${scan.selectedPartitions.partitionCount}")
    // And nothing of the predicate should need row-level evaluation: the
    // data filters must not mention the partition column.
    assert(!scan.dataFilters.exists(_.references.exists(_.name == "day")),
      s"day must not appear in dataFilters: ${scan.dataFilters}")
  }

  test("a selective dim join prunes partitions dynamically (DPP)") {
    // The star-schema form of the same lever: the partition predicate is
    // not known until a DIM side is filtered — here a 30-row date dim cut
    // to 3 days — and dynamic partition pruning turns the broadcast dim's
    // keys into a runtime partition filter on the fact scan. At 100 TB
    // this is the difference between scanning 3 days and scanning 10
    // years because the predicate lived on the dim's attribute.
    import spark.implicits._
    val ev = ScalarOps.partitionedEvents(spark, TestSpark.sf)
    // The dim must be storage-backed: a LocalRelation dim gets its filter
    // constant-folded away before the PartitionPruning rule looks for a
    // selective predicate, and DPP silently never injects.
    val dimPath = "/tmp/graft-warehouse/dpp_date_dim"
    (1 to 30).map(i => (f"2024-01-$i%02d", i)).toDF("dday", "idx")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = ev.join(broadcast(dim).filter(col("idx") <= 3),
        col("day") === col("dday"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter on the fact scan:\n$plan")
    val got = joined.orderBy("day").collect().map(r => r.getString(0))
    assert(got.toSeq == Seq("2024-01-01", "2024-01-02", "2024-01-03"))
  }

  test("pruned result equals the raw-table filter") {
    val pruned = SparkEntry.queries("q_partition_prune")(spark, TestSpark.sf)
      .collect().toSeq
    val raw = Tables.events(spark, TestSpark.sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .filter(col("day") >= "2024-01-08" && col("day") <= "2024-01-14")
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(graft.functions.Num.round2(col("value")).cast("decimal(18,2)"))
          .cast("double").as("sum_value"))
      .orderBy("day", "event_type")
      .collect().toSeq
    assert(pruned == raw)
  }
}
