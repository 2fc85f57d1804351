package graft

import graft.functions.Num
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Overflow safety of the multiplicative-hash family (Num.mulHash and the
  * q_mixture_upsample composite key): the round-9 verdict flagged that the
  * unreduced `doc_id * 2654435761` silently diverges between engines once
  * doc_id ≳ 2⁶³/2654435761 ≈ 3.47×10⁹ (Spark-ANSI raises, non-ANSI wraps,
  * DuckDB promotes to HUGEINT). These tests pin the fix at exactly that
  * boundary and far beyond it:
  *  - the reduced form evaluates WITHOUT error at ids up to Long.MaxValue
  *    under the session's ANSI default, and equals a BigInt reference;
  *  - for ids < 2³¹ the reduction is the identity, so every fixture-scale
  *    result is unchanged (the oracle-hash-green invariant).
  */
class HashBoundsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Mult = BigInt(2654435761L)
  private val OverflowEdge = Long.MaxValue / 2654435761L // ≈ 3.47e9

  /** BigInt reference for Num.mulHash — the semantics both engines must
    * implement in int64 without ever leaving it. */
  private def refMulHash(id: Long, m: Long): Long =
    ((BigInt(id).mod(BigInt(2147483648L)) * Mult).mod(BigInt(m))).toLong

  private def refMixKey(id: Long, epoch: Long): Long =
    (((BigInt(id).mod(BigInt(2147483L))) * 1000 + epoch) * Mult)
      .mod(BigInt(1000000L)).toLong

  private val hugeIds = Seq(
    OverflowEdge - 1, OverflowEdge, OverflowEdge + 1, // the divergence edge
    1L << 31, (1L << 31) - 1, 1L << 40, Long.MaxValue - 1, Long.MaxValue)

  test("mulHash matches the BigInt reference at and far past the int64 overflow edge") {
    import spark.implicits._
    for (m <- Seq(1000L, 4294967296L, 1000000007L)) {
      val got = hugeIds.toDF("id")
        .select(col("id"), Num.mulHash(col("id"), m).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      hugeIds.foreach { id =>
        assert(got(id) == refMulHash(id, m),
          s"mulHash($id, $m): got ${got(id)}, want ${refMulHash(id, m)}")
      }
    }
  }

  test("mixture composite key matches its BigInt reference at huge doc ids") {
    import spark.implicits._
    val rows = for (id <- hugeIds; e <- 1L to 4L) yield (id, e)
    val got = rows.toDF("doc_id", "epoch")
      .select(col("doc_id"), col("epoch"),
        pmod((pmod(col("doc_id"), lit(2147483L)) * lit(1000L)
            + col("epoch")) * lit(2654435761L),
          lit(1000000L)).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (id, e) =>
      assert(got((id, e)) == refMixKey(id, e),
        s"mixKey($id, $e): got ${got((id, e))}, want ${refMixKey(id, e)}")
    }
  }

  test("reduction is the identity below 2^31 — fixture-scale draws unchanged") {
    import spark.implicits._
    val smallIds = Seq(0L, 1L, 17L, 9999L, 1000003L, (1L << 31) - 1)
    for (m <- Seq(1000L, 4294967296L, 1000000007L)) {
      val got = smallIds.toDF("id")
        .select(col("id"), Num.mulHash(col("id"), m).as("h"),
          // the PRE-FIX spelling, safe here because id*mult < 2^63
          pmod(col("id") * lit(2654435761L), lit(m)).as("h0"))
        .collect()
      got.foreach { r =>
        assert(r.getLong(1) == r.getLong(2),
          s"mulHash(${r.getLong(0)}, $m) != legacy draw: ${r.getLong(1)} vs ${r.getLong(2)}")
      }
    }
  }
}
