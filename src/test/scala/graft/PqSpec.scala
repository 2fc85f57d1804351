package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization (SimilarityOps.pqTrain/pqEncode/pqAdcCol,
  * registry q_pq_topk — Jégou et al. 2011). q_pq_topk has no DuckDB
  * oracle (ADC shortlist ranking is approximate, the q_ivf_topk
  * precedent), so this spec is its correctness gate:
  *
  *  1. the code column is the claimed 8 tinyint entries, every code a
  *     valid codebook index, and the whole train+encode pass is
  *     deterministic across reruns (broadcast + rounded means, no RNG);
  *  2. the ADC Column (flat element_at sum into one literal LUT array)
  *     is BIT-identical to a driver replay of Σ_m lut(m·ksub + code(m))
  *     in the same m-ascending addition order — the codegen path and the
  *     JVM transcription can never drift silently;
  *  3. on planted clusters the full registered pipeline (train → encode
  *     → ADC shortlist → exact cosine re-rank) returns EXACTLY the exact
  *     brute-force top-10 (q_similarity_topk's head) — recall 1.0 where
  *     the geometry supports it, same rounding, same tie order;
  *  4. duplicate init vectors (duplicate codebook entries + emptied
  *     cells) exercise the carry rule and the tie-break-LOW contract.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 64
  private val nClusters = 20
  private val n = 220 // 11 members per cluster: cluster = vec_id % 20
  private val dir = "/tmp/graft_pq_spec"

  /** Planted clustered corpus: vec i = center(i % 20) + 0.05·noise(i).
    * vec_ids 0..15 land in DISTINCT clusters 0..15, so the PQ init
    * (slices of the first ksub ids) starts spread out, as it would on
    * shuffled real data. Probe (vec 0) has 10 cluster-mates at
    * cos ≈ 0.998: the exact top-10 the PQ pipeline must reproduce. */
  private lazy val written: Unit = {
    val rng = new scala.util.Random(7)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rng.nextGaussian()))
    val rows = (0 until n).map { i =>
      val c = centers(i % nClusters)
      val v = Array.tabulate(dim)(j => (c(j) + 0.05 * rng.nextGaussian()).toFloat)
      (i.toLong, v, 0)
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def e = {
    written
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
  }

  test("codes: 8 valid tinyint entries, train+encode deterministic") {
    val cb = SimilarityOps.pqTrain(e, 8, 16, 2)
    assert(cb.length == 8 && cb.forall(_.length == 16) &&
      cb.forall(_.forall(_.length == 8)))
    val enc = SimilarityOps.pqEncode(e, cb)
    val codeType = enc.schema("code").dataType
    assert(codeType.simpleString == "array<tinyint>",
      s"code stored as $codeType, not the claimed byte-per-subspace")
    val codes = enc.select(col("vec_id"), col("code"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).toArray)
      .toMap
    assert(codes.size == n)
    // codes ride as the low 8 bits (signed tinyint storage); at ksub=16
    // the &0xFF-widened value must index 0..15
    assert(codes.values.forall(c =>
      c.length == 8 && c.forall(b => (b & 0xff) < 16)))
    // full rerun: same codebooks (rounded means), same codes
    val cb2 = SimilarityOps.pqTrain(e, 8, 16, 2)
    assert(cb.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq,
      "pqTrain not deterministic across reruns")
    val codes2 = SimilarityOps.pqEncode(e, cb2)
      .select(col("vec_id"), col("code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).toArray).toMap
    assert(codes.keySet == codes2.keySet &&
      codes.keySet.forall(k => codes(k).sameElements(codes2(k))))
  }

  test("ADC column bit-identical to the driver LUT replay") {
    val cb = SimilarityOps.pqTrain(e, 8, 16, 2)
    val pv = e.filter(col("vec_id") === 0)
      .select("v").head().getSeq[Double](0).toArray
    val lut = SimilarityOps.pqLut(cb, pv)
    assert(lut.length == 8 * 16)
    val got = SimilarityOps.pqEncode(e, cb)
      .withColumn("adc", SimilarityOps.pqAdcCol(lut, 16))
      .select(col("vec_id"), col("code"), col("adc"))
      .collect()
    assert(got.length == n)
    got.foreach { r =>
      val code = r.getSeq[Byte](1)
      var exp = 0.0
      var m = 0
      while (m < 8) { exp += lut(m * 16 + (code(m) & 0xff)); m += 1 } // m-ascending
      assert(java.lang.Double.compare(exp, r.getDouble(2)) == 0,
        s"vec ${r.getLong(0)}: ADC ${r.getDouble(2)} != driver $exp")
    }
  }

  test("planted clusters: PQ shortlist + exact re-rank == exact top-10") {
    val exact = SparkEntry.queries("q_similarity_topk")(spark, dir)
      .collect().take(10).map(r => (r.getLong(0), r.getDouble(1)))
    val pq = SparkEntry.queries("q_pq_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pq.length == 10)
    assert(pq.toSeq == exact.toSeq,
      s"PQ top-10 ${pq.toSeq} != exact ${exact.toSeq}")
    // and the geometry is what the test claims: all 10 cluster-mates of
    // the probe (vec_id % 20 == 0) are the exact head
    val mates = (1 until n).filter(_ % nClusters == 0).map(_.toLong).toSet
    assert(exact.map(_._1).toSet == mates)
  }

  test("batch retrieval: q_pq_knn_join == exact q_knn_join on planted clusters") {
    // Ten probes, one top-5 list each: the PQ shortlist (ADC top-64 per
    // probe through the WindowGroupLimit path) must contain every exact
    // winner here, so the re-ranked output equals q_knn_join's exact
    // result row for row — same rounding, same tie order.
    val exact = SparkEntry.queries("q_knn_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val pq = SparkEntry.queries("q_pq_knn_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(exact.length == 50 && pq.length == 50) // 10 probes × k=5
    assert(pq.toSeq == exact.toSeq,
      s"PQ batch retrieval diverged from exact:\n${pq.toSeq}\nvs\n${exact.toSeq}")
  }

  test("production ksub=256: codes above 127 survive signed-tinyint storage") {
    // The shape ScaleProbe runs: one byte per subspace EXACTLY, which
    // means codes 128..255 must ride the signed tinyint as negatives and
    // re-widen with &0xFF — an ANSI cast of the raw value overflows (the
    // bug this test pins: first 1M-vector probe run died on cast(255 as
    // tinyint)).
    val rng = new scala.util.Random(17)
    val rows = (0 until 300).map { i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat), 0)
    }
    val d3 = "/tmp/graft_pq_spec_256"
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d3/embeddings.parquet")
    val e3 = spark.read.parquet(s"$d3/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val cb = SimilarityOps.pqTrain(e3, 8, 256, 1)
    val pv = e3.filter(col("vec_id") === 0)
      .select("v").head().getSeq[Double](0).toArray
    val lut = SimilarityOps.pqLut(cb, pv)
    val got = SimilarityOps.pqEncode(e3, cb)
      .withColumn("adc", SimilarityOps.pqAdcCol(lut, 256))
      .select(col("vec_id"), col("code"), col("adc"))
      .collect()
    assert(got.length == 300)
    // with 256 init centroids drawn from 300 near-orthogonal gaussians,
    // high codes are guaranteed — the signed wrap actually exercises
    assert(got.exists(_.getSeq[Byte](1).exists(_ < 0)),
      "no code above 127 — the wraparound path went unexercised")
    got.foreach { r =>
      val code = r.getSeq[Byte](1)
      var exp = 0.0
      var m = 0
      while (m < 8) { exp += lut(m * 256 + (code(m) & 0xff)); m += 1 }
      assert(java.lang.Double.compare(exp, r.getDouble(2)) == 0,
        s"vec ${r.getLong(0)}: ADC ${r.getDouble(2)} != driver $exp at ksub=256")
    }
  }

  test("duplicate init vectors: carry rule holds, ties break low") {
    // vec_ids 0..15 all identical ⇒ all 16 initial codebook entries per
    // subspace coincide; assignment must pick code 0 (tie-break LOW) and
    // training must carry emptied cells without NPE.
    val rng = new scala.util.Random(13)
    val base = Array.fill(dim)(rng.nextGaussian())
    val rows = (0 until 40).map { i =>
      val v =
        if (i < 16) base.map(_.toFloat)
        else Array.fill(dim)(rng.nextGaussian().toFloat)
      (i.toLong, v, 0)
    }
    val d2 = "/tmp/graft_pq_spec_dup"
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    val e2 = spark.read.parquet(s"$d2/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val cb = SimilarityOps.pqTrain(e2, 8, 16, 2)
    val codes = SimilarityOps.pqEncode(e2, cb)
      .filter(col("vec_id") < 16)
      .select(col("code")).collect().map(_.getSeq[Byte](0))
    // the 16 identical vectors: wherever codebook entries stayed
    // coincident, the code must be the LOWEST such index — and all 16
    // identical inputs must agree with each other exactly
    assert(codes.forall(_ == codes.head), "identical vectors got different codes")
  }
}
