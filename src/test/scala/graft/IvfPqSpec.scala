package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ / IVFADC (SimilarityOps.ivfPqResiduals/ivfPqEncode/
  * ivfPqProbedCells + pqAdcColOf, registry q_ivfpq_topk — Jégou et al.
  * 2011 §IV-A). Like q_pq_topk, the shortlist is approximate ⇒ no DuckDB
  * oracle; this spec is the correctness gate:
  *
  *  1. the probe's own cell is always probed — ivfPqProbedCells uses
  *     CentIndex.assign's exact expanded arithmetic, so this is an
  *     identity, not a probability;
  *  2. the joined-LUT ADC column (pqAdcColOf over a broadcast per-cell
  *     frame) is BIT-identical to a driver replay, and every candidate's
  *     cid is one of the probed cells (the join IS the nprobe filter);
  *  3. on planted clusters the registered pipeline returns EXACTLY the
  *     exact brute-force top-10 — same rounding, same tie order;
  *  4. the whole pipeline is deterministic across reruns.
  */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 64
  private val nClusters = 20
  private val n = 220
  private val dir = "/tmp/graft_ivfpq_spec"

  private lazy val written: Unit = {
    val rng = new scala.util.Random(23)
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

  test("probe's own cell is probed; joined ADC bit-identical; candidates cell-contained") {
    val cents = SimilarityOps.kmCentroids(e, 8, 2)
    val resid = SimilarityOps.ivfPqResiduals(e, cents)
      .select(col("vec_id"), col("r").as("v"))
    val cb = SimilarityOps.pqTrain(resid, 8, 16, 2)
    val pv = e.filter(col("vec_id") === 0)
      .select("v").head().getSeq[Double](0).toArray
    val probed = SimilarityOps.ivfPqProbedCells(cents, pv, 3)
    // identity, not probability: the probe's assigned cell leads the list
    val ownCell = new SimilarityOps.CentIndex(cents).assign(pv)._1
    assert(probed.head._1 == ownCell,
      s"probed head ${probed.head._1} != probe's own cell $ownCell")

    val luts = probed.map { case (cid, c) =>
      cid -> SimilarityOps.pqLut(cb, Array.tabulate(pv.length)(j => pv(j) - c(j)))
    }
    val lutDf = broadcast(
      spark.createDataFrame(luts.toSeq).toDF("cid", "lut"))
    val got = SimilarityOps.ivfPqEncode(e, cents, cb)
      .join(lutDf, "cid")
      .withColumn("adc",
        SimilarityOps.pqAdcColOf(col("lut"), col("code"), 16, 8))
      .select(col("vec_id"), col("cid"), col("code"), col("adc"))
      .collect()
    assert(got.nonEmpty)
    val probedSet = probed.map(_._1).toSet
    val lutMap = luts.toMap
    got.foreach { r =>
      assert(probedSet.contains(r.getInt(1)),
        s"candidate ${r.getLong(0)} leaked from unprobed cell ${r.getInt(1)}")
      val lut = lutMap(r.getInt(1))
      val code = r.getSeq[Byte](2)
      var exp = 0.0
      var m = 0
      while (m < 8) { exp += lut(m * 16 + (code(m) & 0xff)); m += 1 }
      assert(java.lang.Double.compare(exp, r.getDouble(3)) == 0,
        s"vec ${r.getLong(0)}: joined ADC ${r.getDouble(3)} != driver $exp")
    }
  }

  test("planted clusters: IVF-PQ shortlist + exact re-rank == exact top-10") {
    val exact = SparkEntry.queries("q_similarity_topk")(spark, dir)
      .collect().take(10).map(r => (r.getLong(0), r.getDouble(1)))
    val got = SparkEntry.queries("q_ivfpq_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 10)
    assert(got.toSeq == exact.toSeq,
      s"IVF-PQ top-10 ${got.toSeq} != exact ${exact.toSeq}")
  }

  test("cid-partitioned codes table: nprobe filter reaches the scan as partition pruning") {
    // The 100 TB layout: codes written partitionBy(cid), probed cells
    // selected with an isin on the partition column — the plan must show
    // the filter in PartitionFilters (pruned BEFORE reading files), not
    // as a post-scan Filter over all cells.
    val cents = SimilarityOps.kmCentroids(e, 8, 2)
    val resid = SimilarityOps.ivfPqResiduals(e, cents)
      .select(col("vec_id"), col("r").as("v"))
    val cb = SimilarityOps.pqTrain(resid, 8, 16, 2)
    val d2 = "/tmp/graft_ivfpq_spec_part"
    SimilarityOps.ivfPqEncode(e, cents, cb)
      .select("vec_id", "cid", "code")
      .write.mode("overwrite").partitionBy("cid").parquet(d2)
    val pv = e.filter(col("vec_id") === 0)
      .select("v").head().getSeq[Double](0).toArray
    val probed = SimilarityOps.ivfPqProbedCells(cents, pv, 3).map(_._1)
    val scan = spark.read.parquet(d2)
      .filter(col("cid").isin(probed: _*))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.split("PartitionFilters:")(1).takeWhile(_ != ']').contains("cid"),
      s"cid isin not in PartitionFilters:\n$plan")
    // and pruning is real: only the probed cells' rows come back
    val cids = scan.select("cid").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cids.subsetOf(probed.toSet), s"unpruned cells: $cids vs $probed")
  }

  test("deterministic across reruns") {
    val a = SparkEntry.queries("q_ivfpq_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = SparkEntry.queries("q_ivfpq_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b, "q_ivfpq_topk not deterministic")
  }

  test("batch retrieval: q_ivfpq_knn_join == exact q_knn_join on planted clusters") {
    // Ten probes, one top-5 list each, shortlists built from
    // partition-prunable residual codes: with 20 tight planted clusters
    // every exact winner shares its probe's coarse cell neighborhood, so
    // the nprobe=3 join + ADC top-64 must contain all of them and the
    // re-ranked output equals q_knn_join's exact result row for row —
    // same rounding, same tie order.
    val exact = SparkEntry.queries("q_knn_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val got = SparkEntry.queries("q_ivfpq_knn_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(exact.length == 50 && got.length == 50) // 10 probes × k=5
    assert(got.toSeq == exact.toSeq,
      s"IVF-PQ batch retrieval diverged from exact:\n${got.toSeq}\nvs\n${exact.toSeq}")
  }

  test("q_ivfpq_encode: codes land in the assigned cell and match a driver re-encode") {
    // The oracle already hash-matches this cross-engine at sf0.01; here
    // the same invariants are pinned on the spec fixture so a refactor
    // can't silently regress between oracle runs: every (vec_id, m)
    // appears exactly once per subspace, cid equals the coarse
    // assignment, and the exploded code equals pqEncode's packed one.
    written
    val full = SparkEntry.queries("q_ivfpq_encode")(spark, dir).collect()
    assert(full.length == n * 8, s"${full.length} rows != ${n * 8}")
    val cents = SimilarityOps.kmCentroids(e, 8, 2)
    val resid = SimilarityOps.ivfPqResiduals(e, cents)
      .select(col("vec_id"), col("r").as("v"))
    val cb = SimilarityOps.pqTrain(resid, 8, 16, 2)
    val packed = SimilarityOps.ivfPqEncode(e, cents, cb)
      .select("vec_id", "cid", "code").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Byte](2))))
      .toMap
    full.foreach { r =>
      val (id, cid, m, code) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (pcid, pcode) = packed(id)
      assert(cid == pcid, s"vec $id: exploded cid $cid != assigned $pcid")
      assert(code == (pcode(m.toInt) & 0xff).toLong,
        s"vec $id subspace $m: exploded code $code != packed ${pcode(m.toInt)}")
    }
  }
}
