package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Random-rotation PQ (q_rrpq_encode — the "RR" baseline of Ge et al.,
  * OPQ, CVPR 2013). The DuckDB oracle already hash-matches the full
  * rotate→train→encode pipeline; this spec pins the three properties the
  * oracle can't express as a hash: the rotation is orthonormal (so ADC
  * distances in rotated space rank exactly like the originals), it is
  * the same matrix on every JVM, and it actually performs its published
  * job — spreading variance across subspaces on anisotropic data. */
class RrPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dim = 64

  test("rotation matrix is orthonormal and JVM-deterministic") {
    val r = SimilarityOps.rrMatrix
    assert(r.length == dim && r.forall(_.length == dim))
    var worst = 0.0
    for (i <- 0 until dim; k <- 0 until dim) {
      var s = 0.0
      var j = 0
      while (j < dim) { s += r(i)(j) * r(k)(j); j += 1 }
      val expect = if (i == k) 1.0 else 0.0
      worst = math.max(worst, math.abs(s - expect))
    }
    assert(worst < 1e-12, s"R·Rᵀ deviates from I by $worst")
    // seeded java.util.Random is spec-fixed: the first entry is a
    // constant of the implementation, pinned so a refactor that silently
    // changes the seed or the generation order (and therefore
    // invalidates every stored RR-PQ code AND the oracle) fails here
    // rather than as a cross-engine hash mismatch
    assert(math.abs(r(0)(0) - new java.util.Random(271828L).nextGaussian() /
      math.sqrt({
        val rnd = new java.util.Random(271828L)
        val row = Array.fill(dim)(rnd.nextGaussian())
        row.map(x => x * x).sum
      })) < 1e-12)
  }

  test("rotation is an L2 isometry: ADC rank order transfers exactly") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 50).map(i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian())))
    val e = spark.createDataFrame(rows).toDF("vec_id", "v")
    val rot = SimilarityOps.rrRotate(e).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    rows.foreach { case (id, v) =>
      val n0 = math.sqrt(v.map(x => x * x).sum)
      val rv = rot(id)
      val n1 = math.sqrt(rv.map(x => x * x).sum)
      assert(math.abs(n0 - n1) < 1e-9 * math.max(1.0, n0),
        s"vec $id: |v|=$n0 but |Rv|=$n1 — not an isometry")
    }
  }

  test("rotation spreads variance across subspaces on anisotropic data") {
    // The published mechanism: without rotation, PQ wastes codebooks on
    // near-constant slices. Plant extreme anisotropy — dims 0..7 carry
    // variance 100, the rest 1e-4 — and measure the per-subspace total
    // variance spread (max/min over the 8 slices of 8 dims).
    val rng = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        if (j < 8) 10.0 * rng.nextGaussian() else 0.01 * rng.nextGaussian()))
    }
    val e = spark.createDataFrame(rows).toDF("vec_id", "v")
    def subVar(vecs: Seq[Array[Double]]): Seq[Double] = {
      val n = vecs.length
      (0 until 8).map { m =>
        (m * 8 until m * 8 + 8).map { j =>
          val mean = vecs.map(_(j)).sum / n
          vecs.map(v => (v(j) - mean) * (v(j) - mean)).sum / n
        }.sum
      }
    }
    val before = subVar(rows.map(_._2))
    val after = subVar(SimilarityOps.rrRotate(e).collect()
      .map(_.getSeq[Double](1).toArray).toSeq)
    val spreadBefore = before.max / before.min
    val spreadAfter = after.max / after.min
    assert(spreadBefore > 100000,
      f"fixture not anisotropic enough: spread $spreadBefore%.1f")
    assert(spreadAfter < 10,
      f"rotation left subspace variance spread at $spreadAfter%.1f " +
        "(expected near-uniform) — the OPQ mechanism is not happening")
    // and total variance is preserved (isometry, seen from the variance side)
    assert(math.abs(before.sum - after.sum) < 1e-6 * before.sum)
  }

  test("measured payoff: RR shortlist recall beats flat PQ on anisotropic clusters") {
    // The mechanism test above shows variance spreads; this one shows why
    // that MATTERS: 64 clusters living only in dims 0..7 (dims 8..63
    // tiny noise). Flat PQ hands all cluster structure to subspace 0's
    // single 16-entry codebook — 64 clusters into 16 cells collide, and
    // subspaces 1..7 quantize noise — so same-cluster neighbors collide
    // with strangers in ADC. Rotation spreads the 8 signal dims across
    // all subspaces: effective resolution 16^8 cells. Deterministic
    // (fixed seeds); measured here: flat finds 3/9 same-cluster members
    // in the ADC top-16, RR finds 9/9.
    val rng = new scala.util.Random(13)
    val centers = Array.fill(64)(Array.tabulate(dim)(j =>
      if (j < 8) 10.0 * rng.nextGaussian() else 0.0))
    val rows = (0 until 640).map { i =>
      val c = centers(i % 64)
      (i.toLong, Array.tabulate(dim)(j =>
        c(j) + (if (j < 8) 0.3 else 0.05) * rng.nextGaussian()))
    }
    val e = spark.createDataFrame(rows).toDF("vec_id", "v")
    val probeId = 5L
    val cluster = rows.filter(r => r._1 % 64 == 5 && r._1 != probeId)
      .map(_._1).toSet
    val pvFlat = rows(5)._2

    def shortlistHits(frame: org.apache.spark.sql.DataFrame,
        pv: Array[Double]): Int = {
      val cb = SimilarityOps.pqTrain(frame, 8, 16, 2)
      val lut = SimilarityOps.pqLut(cb, pv)
      val ids = SimilarityOps
        .pqEncode(frame.filter(col("vec_id") =!= probeId), cb)
        .withColumn("adc", SimilarityOps.pqAdcCol(lut, 16))
        .orderBy(col("adc").asc, col("vec_id")).limit(16)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      cluster.count(ids)
    }

    val flatHits = shortlistHits(e, pvFlat)
    val r = SimilarityOps.rrMatrix
    val pvRot = Array.tabulate(dim) { i =>
      var s = 0.0; var j = 0
      while (j < dim) { s += r(i)(j) * pvFlat(j); j += 1 }
      s
    }
    val rrHits = shortlistHits(SimilarityOps.rrRotate(e), pvRot)
    assert(rrHits == cluster.size,
      s"RR shortlist missed same-cluster members: $rrHits/${cluster.size}")
    assert(flatHits < rrHits,
      s"flat PQ unexpectedly matched RR ($flatHits vs $rrHits) — the " +
        "anisotropy fixture no longer stresses the un-rotated layout")
  }
}
