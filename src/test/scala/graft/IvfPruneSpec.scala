package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The MIPS-pruned IVF assignment (Cauchy–Schwarz centroid shortlist,
  * SimilarityOps.ivfAssignPruned) claims CELL-IDENTITY with the brute
  * literal-scores-array argmax — which is what lets [[SimilarityOps.ivfAssign]]
  * switch paths on k without q_ivf_topk's output ever moving. Spark-level
  * twin of [[MipsPruneProps]]: the same adversarial structure (duplicate
  * centroids = exact dot ties that must break LOW, a centroid that IS a
  * data vector, the zero vector whose every dot is ±0.0, bit-identical
  * vector blocks), but through the real Column/codegen brute path rather
  * than its JVM transcription, so any divergence between DotProduct
  * codegen and the index's fold shows up here.
  *
  * Also pins the registered k=8 surface: the full quantizer build is
  * bit-identical brute-vs-pruned at a pruned-regime k, and q_ivf_topk's
  * rows are invariant under forcing the pruned assignment — the "dispatch
  * can never move the registered output" regression the round-13 verdict
  * asked for.
  */
class IvfPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 64
  private val n = 1200
  private val dir = "/tmp/graft_ivfprune_spec"

  private lazy val vectors: Map[Long, Array[Float]] = {
    val rng = new scala.util.Random(11)
    val base = (0L until n).map { i =>
      i -> Array.fill(dim)(rng.nextGaussian().toFloat)
    }.toMap
    val planted = base ++
      (101L to 119L).map(i => i -> base(100L).clone()).toMap +
      (201L -> base(200L).clone()) + (50L -> Array.fill(dim)(0f))
    val df = spark.createDataFrame(
      planted.toSeq.sortBy(_._1).map { case (id, v) => (id, v, 0) })
      .toDF("vec_id", "embedding", "label")
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    planted
  }

  private def e = {
    vectors // force the write
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
  }

  private def cells(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.select(col("vec_id").cast("long"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("pruned MIPS assignment cell-identical to brute: ties, zero vector") {
    // 46 data vectors as centroids plus two DUPLICATES at higher indices:
    // vectors 0 and 1 have exact max-dot ties (their own centroid vs its
    // copy) that must break to the LOW index, the brute
    // array_position-of-first-max rule.
    val vd = vectors.map { case (id, v) => id -> v.map(_.toDouble) }
    val cents = ((0 until 46).map(i => i -> vd(i.toLong)) ++
      Seq(46 -> vd(0L).clone(), 47 -> vd(1L).clone())).toArray
    val brute = cells(SimilarityOps.ivfAssignBrute(e, cents))
    val pruned = cells(SimilarityOps.ivfAssignPruned(e, cents))
    assert(brute.size == vectors.size && pruned.size == vectors.size)
    val diffs = brute.keys.filter(id => brute(id) != pruned(id))
    assert(diffs.isEmpty,
      s"pruned diverged on ${diffs.take(5).map(id => s"$id: ${brute(id)} vs ${pruned(id)}").mkString("; ")}")
    // the tie rule fired: 0 and 1 dot-max against BOTH copies equally
    assert(brute(0L) == 0 && brute(1L) == 1)
  }

  test("exhaustive broadcast reference cell-identical to the literal brute") {
    // ivfAssignExhaustive replaces the literal plan as the forceBrute
    // reference at k >= PruneK (the literal tree OOMs the driver at
    // production nlist — round-16 ScaleProbe finding), so its selection
    // semantics must be the literal plan's bit for bit: same dot fold,
    // ties to the LOW index (vectors 0/1 vs duplicate centroids 46/47),
    // NaN-scored zero-vector row landing identically.
    val vd = vectors.map { case (id, v) => id -> v.map(_.toDouble) }
    val cents = ((0 until 46).map(i => i -> vd(i.toLong)) ++
      Seq(46 -> vd(0L).clone(), 47 -> vd(1L).clone())).toArray
    val brute = cells(SimilarityOps.ivfAssignBrute(e, cents))
    val exhaustive = cells(SimilarityOps.ivfAssignExhaustive(e, cents))
    assert(exhaustive.size == vectors.size)
    val diffs = brute.keys.filter(id => brute(id) != exhaustive(id))
    assert(diffs.isEmpty,
      s"exhaustive diverged on ${diffs.take(5).map(id => s"$id: ${brute(id)} vs ${exhaustive(id)}").mkString("; ")}")
    assert(exhaustive(0L) == 0 && exhaustive(1L) == 1)
  }

  test("pruned MIPS identity holds at the registered k=8 too") {
    val cents = SimilarityOps.ivfCentroids(e, 8, iters = 2)
    val brute = cells(SimilarityOps.ivfAssignBrute(e, cents))
    val pruned = cells(SimilarityOps.ivfAssignPruned(e, cents))
    assert(brute == pruned)
  }

  test("quantizer build bit-identical: forceBrute vs dispatched at k=48") {
    def bits(cs: Array[(Int, Array[Double])]): Seq[(Int, Seq[Long])] =
      cs.toSeq.map { case (cid, c) =>
        cid -> c.toSeq.map(java.lang.Double.doubleToLongBits)
      }
    val slow = SimilarityOps.ivfCentroids(e, 48, iters = 2, forceBrute = true)
    val fast = SimilarityOps.ivfCentroids(e, 48, iters = 2)
    assert(bits(slow) == bits(fast),
      "pruned-assignment quantizer build diverged from brute")
  }

  test("q_ivf_topk rows invariant under the pruned assignment (k=8 pin)") {
    val registered = SparkEntry.queries("q_ivf_topk")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(registered.size == 10, s"expected top-10, got ${registered.size}")
    // same query tail, cell assignment forced through the MIPS index
    val ev = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val cents = SimilarityOps.ivfCentroids(ev, 8, iters = 2)
    val probeRow = ev.filter(col("vec_id") === 0)
    val probe = broadcast(probeRow.select(col("v").as("p")))
    val pv = probeRow.select("v").head().getSeq[Double](0).toArray
    def pdot(c: Array[Double]): Double =
      c.zip(pv).map { case (a, b) => a * b }.sum
    val probed = cents.sortBy { case (_, c) => -pdot(c) }.take(3).map(_._1)
    val forced = SimilarityOps.ivfAssignPruned(ev.filter(col("vec_id") =!= 0), cents)
      .filter(col("cid").isin(probed: _*))
      .crossJoin(probe)
      .select(col("vec_id"),
        (round(expr("cosine_sim(v, p)") * 1000000) / 1000000).as("cos"))
      .filter(!isnan(col("cos")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(registered == forced,
      "q_ivf_topk output moved under the pruned cell assignment")
  }
}
