package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BroadcastRangeJoinExec (plans/BroadcastRangeJoin): the custom planner
  * strategy must (1) actually claim the `p >= lo AND p < hi` join shape,
  * (2) produce EXACTLY the rows the stock plan produces — including
  * overlapping and nested intervals, duplicate lo values, boundary
  * inclusivity, and NULL handling — and (3) stand down when the interval
  * side is not broadcast-small.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q_join_theta_range is planned by the custom range join") {
    val df = SparkEntry.queries("q_join_theta_range")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"),
      s"custom strategy did not claim the range join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"fell back:\n$plan")
  }

  test("binary-search probe equals the nested-loop result on adversarial intervals") {
    import spark.implicits._
    // overlapping, nested, duplicate-lo, empty, and point-boundary
    // intervals; probe points land on every boundary
    val intervals = Seq(
      (0L, 0.0, 10.0), (1L, 0.0, 5.0), (2L, 2.0, 3.0), (3L, 2.0, 12.0),
      (4L, 5.0, 5.0), (5L, 7.0, 8.0), (6L, 7.0, 30.0), (7L, 20.0, 25.0)
    ).toDF("band_id", "lo", "hi")
    val points = (0 until 400).map(i => (i.toLong, i * 0.1 - 2.0))
      .toDF("pid", "p")
    def join() = points.join(intervals,
      points("p") >= intervals("lo") && points("p") < intervals("hi"))
      .select("pid", "band_id")
    val custom = join()
    assert(custom.queryExecution.executedPlan.toString
      .contains("BroadcastRangeJoin"))
    val customRows = custom.collect().map(_.toString).sorted
    // stock plan: disable the strategy's size gate so it stands down
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val stock = try {
      val df = join()
      assert(!df.queryExecution.executedPlan.toString
        .contains("BroadcastRangeJoin"), "strategy must stand down at -1")
      df.collect().map(_.toString).sorted
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(customRows.sameElements(stock),
      s"custom ${customRows.length} rows vs stock ${stock.length}")
  }

  test("closed, strict, and flipped interval spellings all match the stock plan") {
    import spark.implicits._
    import org.apache.spark.sql.Column
    val intervals = Seq(
      (0L, 0.0, 10.0), (1L, 0.0, 5.0), (2L, 2.0, 3.0), (3L, 5.0, 12.0)
    ).toDF("band_id", "lo", "hi")
    val points = (0 until 300).map(i => (i.toLong, i * 0.1)).toDF("pid", "p")
    val conds: Seq[(String, () => Column)] = Seq(
      ("between (>= <=)", () => points("p").between(intervals("lo"), intervals("hi"))),
      ("strict lower (> <)", () => points("p") > intervals("lo") && points("p") < intervals("hi")),
      ("half-open closed hi (> <=)", () => points("p") > intervals("lo") && points("p") <= intervals("hi")),
      ("flipped operands", () => intervals("lo") <= points("p") && intervals("hi") > points("p")))
    for ((label, cond) <- conds) {
      def join() = points.join(intervals, cond()).select("pid", "band_id")
      val custom = join()
      assert(custom.queryExecution.executedPlan.toString
        .contains("BroadcastRangeJoin"), s"$label: strategy did not claim")
      val customRows = custom.collect().map(_.toString).sorted
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val stock = try join().collect().map(_.toString).sorted
      finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      assert(customRows.sameElements(stock),
        s"$label: custom ${customRows.length} vs stock ${stock.length}")
    }
  }

  test("null points and null interval bounds produce no matches") {
    import spark.implicits._
    val intervals = Seq((0L, Some(0.0), Some(10.0)), (1L, None, Some(5.0)),
      (2L, Some(1.0), None)).toDF("band_id", "lo", "hi")
    val points = Seq((0L, Some(3.0)), (1L, None)).toDF("pid", "p")
    val joined = points.join(intervals,
      points("p") >= intervals("lo") && points("p") < intervals("hi"))
      .select("pid", "band_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(joined.toSet == Set((0L, 0L))) // only the fully-non-null match
  }
}
