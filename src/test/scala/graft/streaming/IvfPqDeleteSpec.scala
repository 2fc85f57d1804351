package graft.streaming

import graft.TestSpark
import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deletion in the compressed store ([[IvfPqIngest.delete]] /
  * [[IvfPqIngest.compact]]) — r17 verdict #3. The invariant under test:
  * a deleted vector NEVER appears in an ADC result — not between the
  * tombstone append and the physical purge (anti-join), not after
  * compaction (physically gone), not through a migration (dropped), and
  * not through any crash window of the compaction's dir swaps. */
class IvfPqDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 64
  private val nClusters = 20
  private val nBoot = 220

  private def freshDir(tag: String): String =
    s"/tmp/graft_ivfpq_delete_$tag-${System.nanoTime()}"

  /** Bootstrap + 2 batches; batch 2 carries 5 planted near-twins of
    * bootstrap vector 7 — the natural deletion victims: they dominate
    * the probe's top-k, so a leak is unmissable. */
  private lazy val fixture: (Seq[(Long, Array[Double])], Seq[Seq[(Long, Array[Double])]]) = {
    val rng = new scala.util.Random(53)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rng.nextGaussian()))
    def near(c: Array[Double], eps: Double) =
      Array.tabulate(dim)(j => c(j) + eps * rng.nextGaussian())
    val boot = (0 until nBoot).map { i =>
      (i.toLong, near(centers(i % nClusters), 0.05))
    }
    val target = boot(7)._2
    val batches = Seq(
      (1000 until 1040).map(i => (i.toLong, near(centers(i % nClusters), 0.05))),
      (2000 until 2040).map(i => (i.toLong, near(centers(i % nClusters), 0.05)))
        ++ (0 until 5).map(i => (2100L + i, near(target, 0.01))))
    (boot, batches.map(_.toSeq))
  }

  private def df(rows: Seq[(Long, Array[Double])]) =
    spark.createDataFrame(rows).toDF("vec_id", "v")

  private def idsDf(ids: Seq[Long]) =
    spark.createDataFrame(ids.map(Tuple1(_))).toDF("vec_id")

  private lazy val structures = {
    val (boot, _) = fixture
    val e = df(boot)
    val cents = SimilarityOps.kmCentroids(e, 8, 2)
    val resid = SimilarityOps.ivfPqResiduals(e, cents)
      .select(col("vec_id"), col("r").as("v"))
    (cents, SimilarityOps.pqTrain(resid, 8, 16, 2))
  }

  private def build(dir: String): Unit = {
    val (boot, batches) = fixture
    val (cents, cb) = structures
    IvfPqIngest.processBatch(df(boot), 0L, dir, cents, cb)
    batches.zipWithIndex.foreach { case (b, i) =>
      IvfPqIngest.processBatch(df(b), (i + 1).toLong, dir, cents, cb)
    }
  }

  private def topIds(dir: String, k: Int = 20): Set[Long] = {
    val (cents, cb) = structures
    IvfPqIngest.retrieve(spark, dir, cents, cb, fixture._1(7)._2, 3, k)
      .collect().map(_.getLong(0)).toSet
  }

  private val twins = (0 until 5).map(i => 2100L + i).toSet

  test("tombstoned vectors never reach the shortlist (pre-compaction)") {
    val dir = freshDir("anti")
    build(dir)
    assert(twins.subsetOf(topIds(dir)), "fixture sanity: twins retrieved")
    IvfPqIngest.delete(spark, dir, idsDf(Seq(2100L, 2101L, 7L)))
    val got = topIds(dir)
    assert(got.intersect(Set(2100L, 2101L, 7L)).isEmpty,
      s"deleted ids leaked into the shortlist: $got")
    assert(Set(2102L, 2103L, 2104L).subsetOf(got),
      "undeleted twins must still surface")
  }

  test("compaction purges past the threshold, skips below it, prunes tombstones") {
    val dir = freshDir("compact")
    build(dir)
    // 2/45 of batch 2 (~4.4%) + an unknown id: below a 10% threshold.
    IvfPqIngest.delete(spark, dir, idsDf(Seq(2100L, 2101L, 999999L)))
    assert(IvfPqIngest.compact(spark, dir, 0.10).isEmpty,
      "4% deleted must not trip a 10% threshold")
    // Live tombstones untouched below threshold; the unknown id (which
    // matches no row anywhere) prunes even without a rewrite.
    assert(IvfPqIngest.readDeletes(spark, dir)
      .get.collect().map(_.getLong(0)).toSet == Set(2100L, 2101L))
    // 5 more from batch 2 (7/45 ≈ 16%): now it compacts.
    IvfPqIngest.delete(spark, dir, idsDf(Seq(2102L, 2103L, 2104L, 2000L, 2001L)))
    val rewritten = IvfPqIngest.compact(spark, dir, 0.10)
    assert(rewritten == Seq((0, 2L)), s"expected batch 2 rewritten: $rewritten")
    // Physically gone: the raw codes scan has no trace.
    val raw = spark.read.parquet(s"$dir/codes").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(raw.intersect(twins ++ Set(2000L, 2001L)).isEmpty,
      "purged ids still physically present")
    // Every tombstone was consumed by the rewrite: the table empties.
    val remaining = IvfPqIngest.readDeletes(spark, dir)
      .map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty)
    assert(remaining.isEmpty,
      s"tombstones not pruned after their purge: $remaining")
    // Retrieval stays leak-free and serviceable post-compaction.
    val got = topIds(dir)
    assert(got.intersect(twins ++ Set(2000L, 2001L)).isEmpty,
      s"post-compaction leak: $got")
    assert(got.nonEmpty && got.contains(7L),
      "retrieval must still return the surviving neighborhood")
  }

  test("double delete and unknown ids are idempotent no-ops") {
    val dir = freshDir("idem")
    build(dir)
    IvfPqIngest.delete(spark, dir, idsDf(Seq(2100L)))
    IvfPqIngest.delete(spark, dir, idsDf(Seq(2100L))) // again
    IvfPqIngest.delete(spark, dir, idsDf(Seq(424242L))) // never existed
    val got = topIds(dir)
    assert(!got.contains(2100L) && Set(2101L, 2102L).subsetOf(got))
    // Compaction of batch 2 at 1/45: below any sane threshold — but at
    // threshold 0.0...01 it rewrites once and the dup tombstones all go.
    val rewritten = IvfPqIngest.compact(spark, dir, 0.01)
    assert(rewritten.contains((0, 2L)))
    assert(IvfPqIngest.readDeletes(spark, dir).isEmpty ||
      IvfPqIngest.readDeletes(spark, dir).get.count() == 0,
      "dup + unknown tombstones must all prune once consumed")
  }

  test("interrupted swap recovers: backup restored when live dir is missing") {
    val dir = freshDir("swap")
    build(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Simulate a crash between swapDir's two renames: live moved to the
    // hidden backup, replacement never landed.
    val live = new org.apache.hadoop.fs.Path(s"$dir/codes/gen=0/batch=2")
    val backup = new org.apache.hadoop.fs.Path(s"$dir/codes/gen=0/_batch=2.pre")
    require(fs.rename(live, backup))
    assert(!fs.exists(live))
    IvfPqIngest.recoverSwaps(spark, dir)
    assert(fs.exists(live) && !fs.exists(backup),
      "crash window not healed: batch dir lost")
    assert(twins.subsetOf(topIds(dir)), "healed store must retrieve")
    // Completed-swap debris (backup AND live both present) just drops.
    val debris = new org.apache.hadoop.fs.Path(s"$dir/codes/gen=0/_batch=1.pre")
    fs.mkdirs(debris)
    IvfPqIngest.recoverSwaps(spark, dir)
    assert(!fs.exists(debris))
  }

  test("migration drops tombstoned rows and does not trip the lossy guard") {
    val dir = freshDir("mig")
    build(dir)
    IvfPqIngest.delete(spark, dir, idsDf(Seq(2100L, 2101L)))
    val (cents, cb) = structures
    // Retrain (fewer iters → different books) and migrate; the corpus
    // is missing the taken-down vectors — exactly the takedown reality.
    val e = df(fixture._1)
    val resid = SimilarityOps.ivfPqResiduals(e, cents)
      .select(col("vec_id"), col("r").as("v"))
    val cb1 = SimilarityOps.pqTrain(resid, 8, 16, 1)
    IvfPqIngest.beginGeneration(spark, dir, 1, cents, cb1)
    val corpus = df((fixture._1 ++ fixture._2.flatten)
      .filterNot(r => Set(2100L, 2101L)(r._1)))
    IvfPqIngest.migrate(spark, dir, corpus, 1, cents, cb1)
    val raw = spark.read.parquet(s"$dir/codes").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(raw.intersect(Set(2100L, 2101L)).isEmpty,
      "migration carried tombstoned rows forward")
    assert(raw.contains(2102L), "migration lost a live row")
    // The next compaction prunes the now-matchless tombstones.
    IvfPqIngest.compact(spark, dir, 2.0) // threshold no dir can reach
    assert(IvfPqIngest.readDeletes(spark, dir).isEmpty ||
      IvfPqIngest.readDeletes(spark, dir).get.count() == 0)
  }
}
