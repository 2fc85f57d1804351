package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helper (SURVEY.md "salting for skew"): when one join key
  * dominates (a hot user, a null-ish default), every row of that key lands
  * on one reducer and the stage runs at the speed of its slowest task.
  * Salting scatters the hot key across `k` sub-keys: the big side gets a
  * deterministic salt derived from its whole row, the small side is
  * replicated k× so every (key, salt) combination still finds its match.
  *
  * AQE's skewedJoin handles this automatically for sort-merge joins at
  * runtime; the explicit form remains necessary for aggregations and for
  * plans AQE can't re-split. Salt is hash-derived (never rand()) so reruns
  * are identical — the determinism contract of the whole engine.
  */
object Salt {

  /** Inner equi-join `big ⋈ small` on `key`, with the big side scattered
    * over `k` salts and the small side replicated k×. Result set is
    * identical to the unsalted join; only the partitioning changes.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, k: Int): DataFrame = {
    require(k > 0, "salt factor must be positive")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(k)).cast("int"))
    // generators can't nest inside other expressions (e.g. a cast) —
    // sequence(int, int) already explodes to IntegerType
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(k - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
