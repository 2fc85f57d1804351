package graft

import java.math.RoundingMode
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Serial-model checks for the CDC history and train/test-split operators —
  * the oracle hash-compare proves Spark and DuckDB agree, these prove the
  * SHARED formula is the intended one (the same split of labor as
  * PipelineOpsSpec).
  */
class CdcSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  /** Spark's round(double, 2): shortest-decimal-repr BigDecimal, HALF_UP. */
  private def round2(v: Double): Double =
    java.math.BigDecimal.valueOf(v).setScale(2, RoundingMode.HALF_UP)
      .doubleValue()

  test("q_scd2_history equals a serial run-length-compressed interval model") {
    val evs = Tables.events(spark, TestSpark.sf)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val model = evs.groupBy(_._2).toSeq.flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._1))
      // keep run starts: dropping events equal to their immediate
      // predecessor IS comparing against the last surviving version
      val versions = sorted.foldLeft(Vector.empty[(Long, Double)]) {
        (acc, r) =>
          if (acc.nonEmpty && acc.last._2 == r._4) acc else acc :+ ((r._3, r._4))
      }
      versions.zipWithIndex.map { case ((ts, v), i) =>
        val to = if (i + 1 < versions.length) Some(versions(i + 1)._1) else None
        (uid, ts, to, round2(v), to.isEmpty)
      }
    }.toSet

    val got = run("q_scd2_history").collect().map { r =>
      val to = if (r.isNullAt(2)) None else Some(r.getLong(2))
      (r.getLong(0), r.getLong(1), to, r.getDouble(3), r.getBoolean(4))
    }.toSet
    assert(got == model,
      s"scd2 mismatch: ${(got -- model).take(3)} vs ${(model -- got).take(3)}")

    // structural invariants the set-compare already implies but whose
    // failure messages are far more readable on their own
    val byUser = got.toSeq.groupBy(_._1)
    for ((uid, vs) <- byUser) {
      assert(vs.count(_._5) == 1, s"user $uid: not exactly one current row")
      val sorted = vs.sortBy(_._2)
      for (Seq(a, b) <- sorted.sliding(2) if sorted.length > 1)
        assert(a._3.contains(b._2),
          s"user $uid: interval ending ${a._3} not contiguous with ${b._2}")
      assert(sorted.last._3.isEmpty, s"user $uid: last interval not open")
    }
    spark.catalog.clearCache()
  }

  test("q_scd2_history: both windows share ONE hash exchange") {
    val plan = run("q_scd2_history").queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1,
      s"change-compression lag and interval lead should reuse one user_id " +
        s"shuffle, found $hashEx hash exchanges:\n$plan")
    spark.catalog.clearCache()
  }

  test("q_train_test_split equals a serial split+leak model and partitions the corpus") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    def bucket(id: Long): Long = ((id % 2147483648L) * 2654435761L) % 100
    def splitOf(id: Long): String = {
      val b = bucket(id)
      if (b < 90) "train" else if (b < 95) "val" else "test"
    }
    def digest(text: String): String = {
      val d = MessageDigest.getInstance("SHA-256")
        .digest(text.trim.toLowerCase.getBytes(StandardCharsets.UTF_8))
      d.map("%02x".format(_)).mkString
    }
    // -1 limit: Spark's split() keeps trailing empty strings
    def nWords(text: String): Long = text.split(" ", -1).length.toLong

    val held = docs.filter(d => splitOf(d._1) != "train")
      .map(d => digest(d._3)).toSet
    val model = docs
      .map { case (id, lang, text) =>
        val s = splitOf(id)
        val leak = s == "train" && held.contains(digest(text))
        (s, lang, leak, nWords(text))
      }
      .groupBy(t => (t._1, t._2)).map { case ((s, lang), rows) =>
        (s, lang, rows.count(!_._3).toLong, rows.count(_._3).toLong,
          rows.filter(!_._3).map(_._4).sum)
      }.toSet

    val got = run("q_train_test_split").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == model,
      s"split mismatch: ${(got -- model).take(3)} vs ${(model -- got).take(3)}")

    // the splits partition the corpus: every doc is counted exactly once,
    // either kept or leaked; leaks only ever come from train
    assert(got.toSeq.map(t => t._3 + t._4).sum == docs.length,
      "kept + leaked doc counts do not cover the corpus")
    assert(got.filter(_._1 != "train").forall(_._4 == 0L),
      "non-train split reported leaked docs")
    assert(got.map(_._1) == Set("train", "val", "test"),
      s"expected all three splits at fixture scale, got ${got.map(_._1)}")
    spark.catalog.clearCache()
  }

  test("q_train_test_split leak join shuffles the 128-bit hash pair, not hex sha256") {
    // The held set is 10% of the corpus and is SHUFFLE-joined (too big to
    // broadcast at 100 TB): the join key must be the two xxhash64 longs
    // (16 bytes), not a 64-char hex digest (~4× wider on the wire).
    val plan = run("q_train_test_split").queryExecution.executedPlan.toString
    assert(!plan.contains("sha2("),
      s"leak-guard plan still carries a sha2 digest:\n$plan")
    assert(plan.contains("xxhash64"),
      s"expected xxhash64 pair as the leak join key:\n$plan")
    spark.catalog.clearCache()
  }
}
