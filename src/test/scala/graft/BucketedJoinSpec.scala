package graft

import graft.operators.JoinOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_join_bucketed's scale claim is PHYSICAL, so the spec asserts the
  * physical plan: joining the two bucketed+sorted tables must need neither
  * an Exchange nor a Sort (the bucket layout IS the join distribution and
  * order), while the identical logical join over the raw parquet pays two
  * shuffles. The oracle only proves the ANSWER right; this proves the
  * layout actually bought the plan the operator exists to demonstrate.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // SortExec prints as `Sort [keys], global, limit` — the trailing ` [`
  // distinguishes it from SortMergeJoin's name. Plan STRINGS, not node
  // collects: AQE wraps shuffling plans in AdaptiveSparkPlanExec (a leaf
  // to collect()), but its toString renders the inner plan.
  private def sortNodes(plan: String) = "(?m)^\\W*Sort \\[".r.findAllIn(plan).size
  private def exchanges(plan: String) = "Exchange hashpartitioning".r.findAllIn(plan).size

  test("bucketed join plans with zero exchange and zero sort") {
    val (li, ord) = JoinOps.bucketedTables(spark, TestSpark.sf)
    val joined = li.hint("merge")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin:\n$plan")
    assert(exchanges(plan) == 0,
      s"bucketed join must not shuffle:\n$plan")
    assert(sortNodes(plan) == 0,
      s"one-file-per-bucket sortBy layout must not re-sort:\n$plan")
  }

  test("the same logical join over raw parquet pays two exchanges") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    val ord = Tables.orders(spark, TestSpark.sf)
    val joined = li.hint("merge")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(exchanges(plan) == 2,
      s"control plan should shuffle both sides:\n$plan")
  }

  test("bucketed join result equals the raw-parquet join result") {
    val bucketed = SparkEntry.queries("q_join_bucketed")(spark, TestSpark.sf)
      .collect().toSeq
    val li = Tables.lineitem(spark, TestSpark.sf)
    val ord = Tables.orders(spark, TestSpark.sf)
    val raw = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(graft.functions.Num.round2(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
      .collect().toSeq
    assert(bucketed == raw)
  }

  test("aggregation on the bucket key also plans without an exchange") {
    // The layout pays for more than the join: any groupBy on the bucket
    // column reads the scan's HashPartitioning as already-satisfied
    // distribution, so per-key aggregation over the hottest key is
    // exchange-free too — one layout, every downstream re-keying free.
    val (li, _) = JoinOps.bucketedTables(spark, TestSpark.sf)
    val agg = li.groupBy("l_orderkey")
      .agg(org.apache.spark.sql.functions.sum("l_quantity").as("q"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(exchanges(plan) == 0,
      s"bucket-key aggregation must not shuffle:\n$plan")
  }

  test("materialization survives a stale warehouse dir under a fresh catalog") {
    // The second JVM of a Verify-then-Bench driver sequence: in-memory
    // catalog knows nothing, but the managed location survives on disk
    // from the previous process — saveAsTable refuses to create over it
    // unless the helper clears the orphan first.
    val tag = Tables.sfTag(TestSpark.sf)
    spark.sql(s"DROP TABLE IF EXISTS li_bkt_$tag") // drops dir too (managed)
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val orphan = new java.io.File(wh, s"li_bkt_$tag")
    assert(orphan.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(orphan, "stale-part").toPath, "junk")
    val (li, _) = JoinOps.bucketedTables(spark, TestSpark.sf)
    assert(li.count() == Tables.lineitem(spark, TestSpark.sf).count())
  }

  test("each bucket lands in exactly one file") {
    // The pre-write repartition mirrors the bucket-id hash, so bucket i's
    // rows all sit in write task i: if this drifts (a Spark upgrade
    // changing HashPartitioning, a refactor dropping the repartition) the
    // sorted-scan condition silently vanishes and only this spec notices
    // (the join would re-gain Sort nodes but still answer correctly).
    // Self-sufficient under `testOnly -- -z`: materialize before describing
    // (a fresh JVM's catalog has no li_bkt table until something builds it).
    JoinOps.bucketedTables(spark, TestSpark.sf)
    val tag = Tables.sfTag(TestSpark.sf)
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED li_bkt_$tag")
      .filter(col("col_name") === "Location")
      .head().getString(1).stripPrefix("file:")
    val files = new java.io.File(loc).listFiles()
      .filter(f => f.getName.startsWith("part-"))
    val buckets = files.map(_.getName.replaceAll(".*_(\\d{5})\\..*", "$1"))
    assert(buckets.distinct.length == files.length,
      s"expected one file per bucket, got ${files.map(_.getName).toSeq}")
  }
}
