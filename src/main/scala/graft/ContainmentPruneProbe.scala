package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Measurement probe for PPJoin-style candidate pruning in
  * q_containment_dedup (OPTIMIZATION_r21 "Not yet optimized" #3): before
  * changing the operator, quantify on real corpora how many candidate
  * pairs the two provably-exact filters would remove and how much
  * intersection-join fan-out that saves.
  *
  *  - LENGTH filter: n_inter ≤ min(n_rep_a, n_rep_b) because A∩B ⊆
  *    rep(A) ∩ rep(B); the final gate needs n_inter·10 ≥ n_sh_a·9, so any
  *    pair with n_rep_b·10 < n_sh_a·9 fails the gate no matter what the
  *    intersection join finds. (The x side is already length-gated by
  *    surv's u < p filter.)
  *  - POSITIONAL filter (PPJoin, Xiao et al. WWW'08): (df, sh) is a GLOBAL
  *    total order (df is a shingle property, sh unique), so both docs sort
  *    shared shingles identically. For a prefix match at rank i of rep(A)
  *    and rank j of rep(B): shared shingles below it number ≤ min(i−1,j−1)
  *    and above it ≤ min(n_rep_a−i, n_rep_b−j), so
  *    n_inter ≤ min(i−1,j−1) + 1 + min(n_rep_a−i, n_rep_b−j); the
  *    min of that bound over a pair's prefix matches is still an upper
  *    bound, so pruning pairs whose bound·10 < n_sh_a·9 is exact.
  *
  * Prints candidate counts and fan-out (Σ n_rep_a over surviving pairs)
  * under: no filter / length / length+positional.
  *
  * Usage: ContainmentPruneProbe <dataDir>
  */
object ContainmentPruneProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: ContainmentPruneProbe <dataDir>")
    val dir = args.head
    val spark = Sessions.local(appName = "graft-containment-prune-probe")
    import org.apache.spark.sql.expressions.Window

    // Replicates containmentDedup's frame derivations (same spellings).
    val shSets = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(call_function("shingle_hashes", col("text"))))
          .as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = shSets.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val dfreq = shSets.groupBy("sh").agg(count(lit(1)).as("df"))
    val rep = shSets.join(dfreq.filter(col("df") >= 2), "sh")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nRep = rep.groupBy("doc_id").agg(count(lit(1)).as("n_rep"))
    val surv = nRep.join(sizes, "doc_id")
      .withColumn("p", expr("n_sh div 10") + 1)
      .withColumn("u", col("n_sh") - col("n_rep"))
      .filter(col("u") < col("p"))
      .select(col("doc_id"), (col("p") - col("u")).as("k_rep"))

    // Rank EVERY rep row per doc (the positional filter needs y-side
    // ranks; the x-side prefix rank is the same number restricted to
    // rk <= k_rep).
    val perDoc = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    val repRk = rep.withColumn("rk", row_number().over(perDoc))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val prefixes = repRk.join(surv, "doc_id")
      .filter(col("rk") <= col("k_rep"))
      .select(col("doc_id"), col("sh"), col("rk"))

    // Candidate pairs with the tightest per-pair positional bound kept.
    val cand = prefixes.as("x").join(repRk.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") =!= col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_contained"),
        col("y.doc_id").as("doc_container"))
      .agg(min(struct(col("x.rk").as("i"), col("y.rk").as("j"))).as("ij"))
      .select(col("doc_contained"), col("doc_container"),
        col("ij.i").as("i"), col("ij.j").as("j"))
      .join(nRep.select(col("doc_id").as("doc_contained"),
        col("n_rep").as("n_rep_a")), "doc_contained")
      .join(nRep.select(col("doc_id").as("doc_container"),
        col("n_rep").as("n_rep_b")), "doc_container")
      .join(sizes.select(col("doc_id").as("doc_contained"),
        col("n_sh").as("n_sh_a")), "doc_contained")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val t = col("n_sh_a") * 9 // gate: n_inter*10 >= n_sh_a*9
    val lengthOk = col("n_rep_b") * 10 >= t
    // NOTE: min(struct(i,j)) is lexicographic — it picks the pair's
    // earliest x-rank match, not the tightest bound over all matches; the
    // bound below is therefore a VALID upper bound (any single match gives
    // one) but not the tightest. Good enough to measure the direction.
    val posBound = least(col("i") - 1, col("j") - 1) + 1 +
      least(col("n_rep_a") - col("i"), col("n_rep_b") - col("j"))
    val posOk = posBound * 10 >= t

    val nCand = cand.count()
    val nLen = cand.filter(lengthOk).count()
    val nPos = cand.filter(lengthOk && posOk).count()
    def fanout(f: org.apache.spark.sql.DataFrame): Long =
      f.agg(sum("n_rep_a")).head.getLong(0)
    val fAll = fanout(cand)
    val fLen = fanout(cand.filter(lengthOk))
    val fPos = fanout(cand.filter(lengthOk && posOk))
    println(f"[containment-prune] dir=$dir cand=$nCand%d " +
      f"after_length=$nLen%d after_length_pos=$nPos%d")
    println(f"[containment-prune] fanout_all=$fAll%d fanout_length=$fLen%d " +
      f"fanout_length_pos=$fPos%d")
    println(f"[containment-prune] length_kill=${100.0 * (nCand - nLen) / math.max(1L, nCand)}%.1f%% " +
      f"pos_extra_kill=${100.0 * (nLen - nPos) / math.max(1L, nCand)}%.1f%% " +
      f"fanout_cut=${100.0 * (fAll - fPos) / math.max(1L, fAll)}%.1f%%")
    spark.stop()
  }
}
