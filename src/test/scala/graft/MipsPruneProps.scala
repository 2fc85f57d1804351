package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.SimilarityOps

/** Property layer for the MIPS-pruned IVF assignment's cell-identity
  * claim (CentIndex.assignMips), the dot-product twin of
  * [[KmeansPruneProps]]: the Cauchy–Schwarz group/member bounds must
  * never skip the true argmax-dot centroid, and the selection must
  * replicate Spark's double ordering (±0.0 fold, NaN top, first index
  * among ties — the array_position-of-array_max rule). The reference is
  * a full-scan transcription of the brute Column path's arithmetic:
  * strict left-to-right dot folds and SQLOrderingUtil.compareDoubles
  * selection over EVERY centroid. Random geometries plant the regimes
  * the bounds have to survive: duplicate and 1e-7-near-twin centroids
  * (exact and near dot ties), vectors ON centroids, zero vectors, and
  * heavy-norm outlier centroids (where |v|·|c−g| slack is largest).
  */
object MipsPruneProps extends Properties("MipsPrune") {

  private val dim = 16

  /** First index of the max dot under Spark's ordering — the brute
    * `array_position(scores, array_max(scores)) − 1`. */
  private def bruteRef(
      v: Array[Double], cents: Array[(Int, Array[Double])]): Int = {
    var best = Double.NegativeInfinity
    var bestIdx = -1
    var i = 0
    while (i < cents.length) {
      val c = cents(i)._2
      var vc = 0.0
      var t = 0
      while (t < dim) { vc += v(t) * c(t); t += 1 }
      val cmp =
        if (bestIdx < 0) 1
        else if (vc == best) 0
        else java.lang.Double.compare(vc, best)
      if (cmp > 0) { best = vc; bestIdx = i } // ties keep the FIRST index
      i += 1
    }
    bestIdx
  }

  private val genCorpus: Gen[(Array[(Int, Array[Double])], List[Array[Double]])] =
    for {
      seed <- Gen.choose(0L, Long.MaxValue)
      k <- Gen.choose(33, 72) // always the pruned regime
      n <- Gen.choose(50, 250)
    } yield {
      val rng = new scala.util.Random(seed)
      val base = Array.fill(k)(Array.fill(dim)(rng.nextGaussian()))
      // tie + near-tie + outlier-norm structure
      for (i <- 1 until k) {
        rng.nextInt(5) match {
          case 0 => base(i) = base(rng.nextInt(i)).clone()
          case 1 =>
            base(i) = base(rng.nextInt(i)).clone()
            base(i)(rng.nextInt(dim)) += 1e-7
          case 2 => base(i) = base(i).map(_ * 100.0) // heavy-norm outlier
          case _ =>
        }
      }
      val cents = base.zipWithIndex.map { case (c, i) => i -> c }
      val vecs = List.fill(n) {
        rng.nextInt(4) match {
          case 0 => base(rng.nextInt(k)).clone() // ON a centroid
          case 1 => Array.fill(dim)(0.0) // zero vector: all dots ±0.0 ties
          case _ => Array.fill(dim)(rng.nextGaussian() * (1 + rng.nextInt(3)))
        }
      }
      (cents, vecs)
    }

  property("index.assignMips == full-scan brute argmax, same cell") =
    forAll(genCorpus) { case (cents, vecs) =>
      val idx = SimilarityOps.assignIndexFor(cents)
      vecs.forall { v => idx.assignMips(v) == bruteRef(v, cents) }
    }
}
