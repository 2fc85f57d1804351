package graft

import graft.functions.Salt
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proofs for the two scale techniques the small fixtures can't show in a
  * plan audit: bucketed co-located joins (the shuffle disappears) and skew
  * salting (same result set, scattered hot key).
  */
class ScalePatternsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables co-locate: join plans without a shuffle exchange") {
    import spark.implicits._
    val li = Tables.lineitem(spark, TestSpark.sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, TestSpark.sf).select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    // a previously-crashed run can leave the managed location behind
    Seq("li_b", "o_b").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"/tmp/graft-warehouse/$t"))
    }
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_b")
    // force the non-broadcast path so the shuffle question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("partitioned layout prunes at the directory level (PartitionFilters)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, TestSpark.sf)
      .select("event_id", "user_id", "event_type", "value")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val clicks = spark.read.parquet(dir)
      .filter($"event_type" === "click").select("event_id")
    val scan = clicks.queryExecution.executedPlan.toString
    // the predicate must prune PARTITION DIRECTORIES, not filter rows
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition pruning in:\n$scan")
    assert(clicks.count() ==
      ev.filter($"event_type" === "click").count())
  }

  test("token-budget cumsum never plans a single-partition window") {
    // The naive ORDER BY-without-PARTITION BY window moves the whole
    // corpus to one partition; the two-pass prefix sum must keep every
    // exchange partitioned (hash by pid / range by the sort key).
    val df = SparkEntry.queries("q_token_budget")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in token-budget plan:\n$plan")
    // and it still computes: cum is monotone over the kept prefix
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(2) <= 15000L))
  }

  test("salted join returns exactly the unsalted result on skewed data") {
    import spark.implicits._
    // 90% of the big side hits one hot key — the classic straggler shape
    val big = (1 to 10000).map(i =>
      (if (i % 10 == 0) i.toLong % 50 else 7L, i.toLong)).toDF("k", "payload")
    val small = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "payload", "name")
      .collect().map(_.toString).sorted
    val salted = Salt.saltedJoin(big, small, "k", k = 8)
      .select("k", "payload", "name").collect().map(_.toString).sorted
    assert(salted.sameElements(plain),
      s"salted join diverged: ${salted.length} vs ${plain.length} rows")
  }
}
