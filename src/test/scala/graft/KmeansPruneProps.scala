package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.SimilarityOps

/** Property layer for the pruned assignment's bit-identity claim,
  * complementing KmeansPruneSpec's fixed adversarial cases with random
  * structure: arbitrary centroid sets (with planted exact duplicates and
  * 1e-7-near twins — the tie and cancellation regimes), arbitrary
  * vectors (including zero vectors and vectors ON centroids). The
  * reference implementation here is a direct Scala transcription of the
  * brute Column path's arithmetic — (v·v − 2·v·c) + Σc², all
  * left-to-right folds, first-occurrence-of-min tie rule — evaluated
  * over EVERY centroid, so any unsound skip in the triangle-inequality
  * index shows up as a label or bit-level distance mismatch. Pure JVM
  * (no Spark jobs): the Column-vs-JVM equivalence is KmeansPruneSpec's
  * job; this layer hammers the index's pruning logic itself across
  * hundreds of random geometries.
  */
object KmeansPruneProps extends Properties("KmeansPrune") {

  private val dim = 16

  private def bruteRef(
      v: Array[Double], cents: Array[(Int, Array[Double])]): (Int, Double) = {
    var vv = 0.0
    var i = 0
    while (i < dim) { vv += v(i) * v(i); i += 1 }
    var best = Double.PositiveInfinity
    var bestCid = -1
    cents.foreach { case (cid, c) =>
      var vc = 0.0
      var t = 0
      while (t < dim) { vc += v(t) * c(t); t += 1 }
      val cc = c.map(x => x * x).sum
      val d = (vv - 2 * vc) + cc
      if (d < best) { best = d; bestCid = cid } // strict <: first min wins
    }
    (bestCid, best)
  }

  private val genCorpus: Gen[(Array[(Int, Array[Double])], List[Array[Double]])] =
    for {
      seed <- Gen.choose(0L, Long.MaxValue)
      k <- Gen.choose(33, 72) // always the pruned regime
      n <- Gen.choose(50, 250)
    } yield {
      val rng = new scala.util.Random(seed)
      val base = Array.fill(k)(Array.fill(dim)(rng.nextGaussian()))
      // plant tie + cancellation structure: centroid i duplicates or
      // near-duplicates an earlier one with probability ~1/4 each
      for (i <- 1 until k) {
        val roll = rng.nextInt(4)
        if (roll == 0) base(i) = base(rng.nextInt(i)).clone()
        else if (roll == 1) {
          base(i) = base(rng.nextInt(i)).clone()
          base(i)(rng.nextInt(dim)) += 1e-7
        }
      }
      val cents = base.zipWithIndex.map { case (c, i) => i -> c }
      val vecs = List.fill(n) {
        rng.nextInt(4) match {
          case 0 => base(rng.nextInt(k)).clone() // ON a centroid: d = 0
          case 1 => Array.fill(dim)(0.0) // zero vector
          case _ => Array.fill(dim)(rng.nextGaussian() * (1 + rng.nextInt(3)))
        }
      }
      (cents, vecs)
    }

  property("index.assign == full-scan brute, bit for bit") =
    forAll(genCorpus) { case (cents, vecs) =>
      val idx = SimilarityOps.assignIndexFor(cents) // test hook

      vecs.forall { v =>
        val (pc, pd) = idx.assign(v)
        val (bc, bd) = bruteRef(v, cents)
        pc == bc && java.lang.Double.doubleToLongBits(pd) ==
          java.lang.Double.doubleToLongBits(bd)
      }
    }
}
