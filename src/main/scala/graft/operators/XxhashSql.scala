package graft.operators

/** Generates DuckDB SQL that replicates Spark's `xxhash64` BIT-FOR-BIT,
  * so the xxhash-based sketch operators (MinHash signatures + LSH bands,
  * SimHash) can be oracle-checked instead of rows-only.
  *
  * Why this is possible: XXH64 is pure 64-bit integer arithmetic
  * (public algorithm; Spark ships it in catalyst's XXH64). DuckDB has no
  * wrapping 64-bit ops, so every step runs in HUGEINT on the unsigned
  * domain [0, 2^64): multiply-mod-2^64 via 32-bit limb splitting, rotations
  * via divide/multiply by powers of two, xor by round-tripping through
  * signed BIGINT. Sequential steps are emitted as a CHAIN OF CTEs — one
  * projected column per step — because DuckDB's lateral column aliases
  * substitute textually and would blow up exponentially through ~100
  * chained steps.
  *
  * Fixture constraints this relies on (asserted in FIXTURES.md): shingle
  * strings are ASCII (so `ord(char)` == the UTF-8 byte Spark hashes) and
  * under 32 bytes (so only XXH64's short path is needed).
  */
private[operators] object XxhashSql {

  private val M64 = "18446744073709551616" // 2^64
  private val M32 = 4294967296L
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def u(v: Long): String = java.lang.Long.toUnsignedString(v)

  /** Spark XXH64.hashInt in plain JVM longs (wrapping arithmetic is the
    * semantics) — used to PRECOMPUTE chain seeds for literal ints, e.g.
    * xxhash64(lit(j), x) == hashLong(x, hashInt(j, 42)). */
  def hashInt(i: Int, seed: Long): Long = {
    var h = seed + P5 + 4L
    h ^= (i.toLong & 0xFFFFFFFFL) * P1
    h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
    fmixLong(h)
  }

  private def fmixLong(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^ (h >>> 32)
  }

  /** Emits `name AS (SELECT *, expr AS col FROM prev)` chains. */
  final class Chain(base: String, pfx: String) {
    private val ctes = scala.collection.mutable.ArrayBuffer[String]()
    var prev: String = base
    private var n = 0

    def emit(expr: String): String = {
      n += 1
      val alias = s"${pfx}x$n"
      val name = s"${pfx}_l$n"
      ctes += s"$name AS (SELECT *, $expr AS $alias FROM $prev)"
      prev = name
      alias
    }

    def mulmodConst(src: String, p: Long): String = {
      val p0 = p & 0xFFFFFFFFL
      val p1 = p >>> 32
      val lo = emit(s"$src % $M32")
      val hi = emit(s"$src // $M32")
      emit(s"(($lo*$p0::HUGEINT + (($lo*$p1::HUGEINT + $hi*$p0::HUGEINT) % $M32)*$M32::HUGEINT) % $M64)")
    }

    def rotl(src: String, r: Int): String = {
      val low = java.math.BigInteger.TWO.pow(64 - r)
      val mul = java.math.BigInteger.TWO.pow(r)
      emit(s"(($src % $low::HUGEINT)*$mul::HUGEINT + $src // $low::HUGEINT)")
    }

    def xor(a: String, b: String): String = {
      val sa = emit(s"CASE WHEN $a >= 9223372036854775808::HUGEINT THEN ($a - $M64::HUGEINT)::BIGINT ELSE $a::BIGINT END")
      val sb = emit(s"CASE WHEN $b >= 9223372036854775808::HUGEINT THEN ($b - $M64::HUGEINT)::BIGINT ELSE $b::BIGINT END")
      val z = emit(s"xor($sa, $sb)")
      emit(s"CASE WHEN $z < 0 THEN $z::HUGEINT + $M64::HUGEINT ELSE $z::HUGEINT END")
    }

    def shr(src: String, r: Int): String =
      emit(s"($src // ${java.math.BigInteger.TWO.pow(r)}::HUGEINT)")

    def fmix(h0: String): String = {
      var h = xor(h0, shr(h0, 33))
      h = mulmodConst(h, P2)
      h = xor(h, shr(h, 29))
      h = mulmodConst(h, P3)
      xor(h, shr(h, 32))
    }

    /** h ^= rotl(k*P2, 31)*P1; h = rotl(h, 27)*P1 + P4 */
    def wordStep(h0: String, k: String): String = {
      var t = mulmodConst(k, P2)
      t = rotl(t, 31)
      t = mulmodConst(t, P1)
      var h = xor(h0, t)
      h = rotl(h, 27)
      h = mulmodConst(h, P1)
      emit(s"(($h + ${u(P4)}::HUGEINT) % $M64)")
    }

    /** XXH64.hashLong of unsigned column `l` with seed expr (col/const). */
    def hashLong(l: String, seedExpr: String): String = {
      val h = emit(s"(($seedExpr + ${u(P5)}::HUGEINT + 8) % $M64)")
      fmix(wordStep(h, l))
    }

    /** XXH64.hashUnsafeBytes of an ASCII string (<32 bytes, short path):
      * `bl` = 1-based byte list column, `n` = HUGEINT length column. */
    def stringHash(bl: String, n: String): String = {
      var h = emit(s"((42 + ${u(P5)}::HUGEINT + $n) % $M64)")
      for (c <- 0 until 3) {
        val base = 8 * c
        val k = emit((0 until 8).map(i =>
          s"COALESCE($bl[${base + i + 1}], 0)::HUGEINT*${java.math.BigInteger.valueOf(256L).pow(i)}::HUGEINT")
          .mkString("(", " + ", ")"))
        val hs = wordStep(h, k)
        h = emit(s"CASE WHEN $n >= ${base + 8} THEN $hs ELSE $h END")
      }
      val o = emit(s"(($n // 8) * 8)::BIGINT")
      val gi = emit((0 until 4).map(i =>
        s"COALESCE($bl[$o + ${i + 1}], 0)::HUGEINT*${java.math.BigInteger.valueOf(256L).pow(i)}::HUGEINT")
        .mkString("(", " + ", ")"))
      val t = mulmodConst(gi, P1)
      var hx = xor(h, t)
      hx = rotl(hx, 23)
      hx = mulmodConst(hx, P2)
      hx = emit(s"(($hx + ${u(P3)}::HUGEINT) % $M64)")
      val took4 = emit(s"($o + 4 <= $n)")
      h = emit(s"CASE WHEN $took4 THEN $hx ELSE $h END")
      val to = emit(s"(CASE WHEN $took4 THEN $o + 4 ELSE $o END)::BIGINT")
      for (ti <- 0 until 3) {
        val b = emit(s"COALESCE($bl[$to + ${ti + 1}], 0)::HUGEINT")
        val tt = mulmodConst(b, P5)
        var hx2 = xor(h, tt)
        hx2 = rotl(hx2, 11)
        hx2 = mulmodConst(hx2, P1)
        h = emit(s"CASE WHEN $to + $ti < $n THEN $hx2 ELSE $h END")
      }
      fmix(h)
    }

    def toSigned(h: String): String =
      emit(s"CASE WHEN $h >= 9223372036854775808::HUGEINT THEN ($h - $M64::HUGEINT)::BIGINT ELSE $h::BIGINT END")

    def sqlWith: String = ctes.mkString(",\n")
  }
}
