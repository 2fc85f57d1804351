package graft

import graft.functions.VectorAgg
import graft.operators.MediaOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("vectorSum aggregates element-wise across partitions") {
    import spark.implicits._
    val df = (1 to 100).map(i => Array(i.toDouble, 2.0 * i, -i.toDouble))
      .toDF("v").repartition(7)
    val got = df.agg(VectorAgg.vectorSumUdaf(col("v"))).first()
      .getSeq[Double](0)
    assert(got == Seq(5050.0, 10100.0, -5050.0))
  }

  test("vectorSum of empty input is the empty vector (identity)") {
    import spark.implicits._
    val got = Seq.empty[Array[Double]].toDF("v")
      .agg(VectorAgg.vectorSumUdaf(col("v"))).first().getSeq[Double](0)
    assert(got.isEmpty)
  }

  test("int8 quantization stays in range with bounded reconstruction error") {
    val rows = SparkEntry.queries("q_embed_quantize")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    for (r <- rows) {
      val (scale, qAbsSum, err) =
        (r.getDouble(1), r.getLong(3), r.getDouble(4))
      assert(scale > 0, s"vec ${r.getLong(0)}: zero scale")
      // every quantized component is in [-127, 127] → 64-dim L1 bound
      assert(qAbsSum <= 127L * 64, s"vec ${r.getLong(0)}: q out of range")
      // per-dim error ≤ scale/254 (round-to-nearest) → L2 ≤ sqrt(64)·scale/254
      assert(err <= 8.0 * scale / 254 + 1e-6,
        s"vec ${r.getLong(0)}: recon err $err vs scale $scale")
    }
  }

  test("quantization of an all-zero embedding yields zero, not NaN") {
    // Degenerate case the fixture can never produce (its embeddings are
    // random): scale = max|x| = 0 would make x/scale NaN in Spark but NULL
    // in DuckDB — the when(scale===0) guard must map it to an exactly-zero
    // quantized vector with recon_err 0.0 in both engines.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zero_vec")
    try {
      Seq(
        (1L, Array.fill(64)(0.0f), 0),
        (2L, Array.fill(64)(0.5f), 1)
      ).toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val rows = SparkEntry.queries("q_embed_quantize")(spark, dir.toString)
        .collect().sortBy(_.getLong(0))
      val zero = rows(0)
      assert(zero.getDouble(1) == 0.0, "scale_r")
      assert(zero.getLong(2) == 0L && zero.getLong(3) == 0L, "q sums")
      assert(zero.getDouble(4) == 0.0, s"recon_err ${zero.getDouble(4)}")
      // the non-degenerate row still quantizes normally
      assert(rows(1).getLong(3) == 127L * 64, "uniform vec |q| sum")
    } finally {
      spark.catalog.clearCache()
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("media decode stub is deterministic with fixed-width features") {
    val m = MediaOps.Media(7L, "video", "hello world".getBytes("UTF-8"))
    val d1 = MediaOps.decodeStub(m)
    val d2 = MediaOps.decodeStub(m)
    assert(d1.feature.length == 8 && d1.feature.sameElements(d2.feature))
    assert(d1.n_frames > 1) // video kind samples frames
    assert(d1.feature.forall(x => x >= 0 && x < 1))
  }
}
