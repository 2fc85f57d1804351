package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evidence probe for the bucketed-layout operators: the same join+agg
  * executed over raw parquet (two shuffles + two sorts) vs the maintained
  * bucketed+sorted layout (zero exchange, zero sort — BucketedJoinSpec
  * proves the plan shape; this probe proves the WALL-CLOCK claim at a
  * scale where the shuffle is real). Usage:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.LayoutProbe [nFact] [nDim]"
  *
  * Defaults: 20M fact rows × 5M dim rows (fact parquet ~hundreds of MB —
  * the shuffle both sides pay on every raw join). The one-time bucketed
  * write is timed and reported too: the layout's economics are
  * (write once) vs (shuffle on every join), so the report carries both
  * numbers instead of hiding the amortized cost.
  *
  * Join keys are id-scrambled (multiplicative hash) so neither input is
  * pre-sorted on the key and the raw plan's sorts do real work — range
  * writes would hand the raw SMJ nearly-sorted runs and understate the
  * layout's win.
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val nFact = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nDim = args.drop(1).headOption.map(_.toLong).getOrElse(5000000L)
    val spark = Sessions.local(appName = "graft-layout-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val base = "/tmp/graft-warehouse/layout_probe"
    val nBuckets = 32

    // Synthetic fact/dim: every fact row joins exactly once — which
    // requires d_key to be a PERMUTATION of [0, nDim), i.e. a multiplier
    // coprime to nDim (a shared factor g would leave only nDim/g distinct
    // dim keys, silently dropping most fact rows and fanning out the
    // rest). Distinct primes: at least one divides no nDim.
    val dimMult = Seq(40507L, 40519L, 40529L, 40531L)
      .find(m => BigInt(m).gcd(BigInt(nDim)) == 1)
      .getOrElse(sys.error(s"no coprime multiplier for nDim=$nDim"))
    val fact = spark.range(nFact).select(
      pmod(col("id") * 2654435761L, lit(nDim)).as("f_key"),
      (col("id") % 100).cast("double").as("f_qty"))
    val dim = spark.range(nDim).select(
      pmod(col("id") * dimMult, lit(nDim)).as("d_key"),
      (col("id") % 7).as("d_grp"))

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (_, tRawWrite) = timed {
      fact.write.mode("overwrite").parquet(s"$base/fact_raw")
      dim.write.mode("overwrite").parquet(s"$base/dim_raw")
    }
    // Fresh-catalog-over-stale-dir (a previous probe JVM's leftovers)
    // refuses saveAsTable — clear both first, same rule as
    // Tables.materializedTable.
    Seq("layout_probe_fact", "layout_probe_dim").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File("/tmp/graft-warehouse", t))
    }
    val (_, tBktWrite) = timed {
      spark.read.parquet(s"$base/fact_raw")
        .repartition(nBuckets, col("f_key"))
        .write.bucketBy(nBuckets, "f_key").sortBy("f_key")
        .mode("overwrite").saveAsTable("layout_probe_fact")
      spark.read.parquet(s"$base/dim_raw")
        .repartition(nBuckets, col("d_key"))
        .write.bucketBy(nBuckets, "d_key").sortBy("d_key")
        .mode("overwrite").saveAsTable("layout_probe_dim")
    }

    def joinAgg(f: DataFrame, d: DataFrame): DataFrame =
      f.hint("merge").join(d, col("f_key") === col("d_key"))
        .groupBy("d_grp").agg(sum("f_qty").as("qty"), count(lit(1)).as("n"))

    // mk must CONSTRUCT a fresh DataFrame per run: a reused DataFrame
    // object keeps its adaptive plan's materialized shuffle stages, and
    // "re-running" it replays 20M-row joins in 60 ms of stage reuse.
    def runOnce(label: String, mk: () => DataFrame): (Double, Long) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = mk().collect().map(_.getLong(2)).sum
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[layout-probe] $label: $t%.2f s (joined rows $n)")
      (t, n)
    }

    def mkRaw() = joinAgg(
      spark.read.parquet(s"$base/fact_raw"),
      spark.read.parquet(s"$base/dim_raw"))
    def mkBkt() = joinAgg(
      spark.table("layout_probe_fact"), spark.table("layout_probe_dim"))

    val rawEx = "Exchange hashpartitioning".r
      .findAllIn(mkRaw().queryExecution.executedPlan.toString).size
    // the post-join groupBy legitimately exchanges on d_grp in both plans;
    // the join-key exchanges are the ones the layout deletes
    val bktEx = "Exchange hashpartitioning".r
      .findAllIn(mkBkt().queryExecution.executedPlan.toString).size

    // INTERLEAVED pairs (JIT warm-up + page-cache warming then land on
    // both sides equally; local disk shuffle is cheap enough that cache
    // state, not the exchange, dominates single runs) and a warm-up pair
    // that is not timed. Mins over 4 timed pairs; the full arrays go in
    // the JSON so the spread is visible in the artifact.
    runOnce("warm-up raw", () => mkRaw())
    runOnce("warm-up bucketed", () => mkBkt())
    val samples = (1 to 4).map { _ =>
      val (tr, nr) = runOnce("raw parquet join", () => mkRaw())
      val (tb, nb) = runOnce("bucketed join", () => mkBkt())
      require(nr == nb, s"row mismatch: raw $nr vs bucketed $nb")
      (tr, tb, nr)
    }
    val tRaw = samples.map(_._1).min
    val tBkt = samples.map(_._2).min
    val nRaw = samples.head._3

    val speedup = tRaw / tBkt
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(
      s"""{"metric":"layout_join_speedup","value":${f"$speedup%.2f"},""" +
      s""""raw_min_sec":${f"$tRaw%.2f"},"bucketed_min_sec":${f"$tBkt%.2f"},""" +
      s""""raw_runs":${arr(samples.map(_._1))},"bucketed_runs":${arr(samples.map(_._2))},""" +
      s""""raw_exchanges":$rawEx,"bucketed_exchanges":$bktEx,""" +
      s""""bucketed_write_sec":${f"$tBktWrite%.2f"},"raw_write_sec":${f"$tRawWrite%.2f"},""" +
      s""""n_fact":$nFact,"n_dim":$nDim,"joined_rows":$nRaw}""")
    spark.stop()
  }
}
