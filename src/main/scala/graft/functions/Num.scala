package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.round

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
}
