package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, pmod, round}

/** Cross-engine-deterministic numeric helpers.
  *
  * Spark's `round(x, 2)` on a DOUBLE routes through
  * `BigDecimal.valueOf(x)` — i.e. the SHORTEST DECIMAL REPRESENTATION of
  * the double — then HALF_UP, while DuckDB rounds the raw binary double.
  * For a derived value whose shortest repr lands exactly on a half cent
  * (e.g. 1222.745), Spark says 1222.75 and DuckDB says 1222.74. Rounding
  * in scaled-integer space first (`round(x*100)/100`) makes both engines
  * round the SAME binary double at scale 0, where their semantics agree
  * (half away from zero), so results are bit-identical.
  *
  * Use for any oracle-compared double that is DERIVED (products, averages)
  * rather than copied from a 2-decimal fixture column.
  */
object Num {
  /** Round to 2 decimals, deterministically across Spark and DuckDB.
    * Oracle-side equivalent: `round(x * 100) / 100`. */
  def round2(c: Column): Column = round(c * 100) / 100

  /** The deterministic multiplicative-hash family used by the sampling /
    * capping / mixing queries (Knuth's 2654435761 = ⌊2³² / φ⌋), made
    * OVERFLOW-SAFE: the id is reduced mod 2³¹ BEFORE the multiply, so the
    * product is at most (2³¹−1)·2654435761 ≈ 5.7×10¹⁸ < 2⁶³−1 on every
    * engine. Without the reduction the two oracle engines diverge exactly
    * when the corpus gets big (id ≳ 2⁶³/2654435761 ≈ 3.47×10⁹): Spark
    * under ANSI (the 4.x default) RAISES on int64 overflow, non-ANSI
    * wraps silently, and DuckDB promotes to HUGEINT or raises — three
    * different answers for one query. For ids < 2³¹ the reduction is the
    * identity, so fixture-scale results are bit-identical to the unreduced
    * form. Oracle-side spelling: `((id % 2147483648) * 2654435761) % m`.
    *
    * The mod-2³¹ fold truncates to the LOW 31 bits, which for sequential
    * ids (the corpus case) keeps the draw equidistributed; ids whose
    * entropy lives above bit 31 should be pre-mixed (xxhash64) instead.
    */
  def mulHash(id: Column, m: Long): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L), lit(m))
}
