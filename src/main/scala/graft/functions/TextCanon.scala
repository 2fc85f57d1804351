package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `text_canon(s)` — Unicode-robust text canonicalization for dedup keys:
  * lowercase (simple mapping) + trim + collapse whitespace runs in ONE
  * fused pass at the scan projection, then NFC normalize LAST.
  *
  * Order matters and is load-bearing: lowering must precede NFC. Some
  * combining sequences have a precomposed form only in lowercase (T +
  * U+0308 has none; ẗ = U+1E97 exists), so NFC-then-lower leaves
  * "T̈" decomposed while precomposed "ẗ" input stays composed — two
  * render-identical texts keyed differently, and canon(canon(s)) ≠
  * canon(s). Lower-then-NFC makes canon a PROJECTION (idempotent —
  * TextCanonProps found the original violation and now pins the fix) and
  * collapses that duplicate class. Whitespace order is immaterial: NFC
  * neither produces nor composes across the ASCII ws class.
  *
  * Why a dedicated canon step: exact dedup keyed on raw bytes misses the
  * duplicate class where two crawls of the same page differ ONLY in
  * Unicode encoding form (é as U+00E9 vs e + U+0301 — byte-different,
  * render-identical), letter case, or whitespace layout. At 100 TB that
  * class is material (different scrapers emit different normal forms of
  * the same content), and catching it here costs one map-side projection
  * instead of a near-dup pipeline.
  *
  * Cross-engine contract (the oracle replays this exactly):
  * `nfc_normalize(trim(regexp_replace(lower(s), '[ \t\n\f\r\v]+', ' ', 'g')))`
  * in DuckDB. Whitespace is pinned to the explicit 6-char ASCII class —
  * NOT regex `\s` — because Java's `\s` includes U+000B while RE2's does
  * not; the fused loop below and the oracle's character class agree by
  * construction. Lowercasing is SIMPLE per-codepoint mapping
  * (`Character.toLowerCase(int)`), NOT `String.toLowerCase` — the String
  * method applies FULL/contextual mapping (İ → i + combining dot-above,
  * final-position Σ → ς) where DuckDB's utf8proc applies the simple 1:1
  * UnicodeData table (İ → i, Σ → σ always); the two agree only under the
  * simple mapping (probed: U+0130, U+03A3-in-ΟΔΟΣ, U+1E9E, U+212A/B).
  *
  * Contract bounds, from an exhaustive sweep (every codepoint
  * U+0020..U+2FFFF embedded as "x_y", JVM canon vs the DuckDB spelling):
  * 194,495 agree; the ONLY 3 divergences are U+A7C7/U+A7C9/U+A7F5 —
  * case pairs ADDED in Unicode 13, which JDK 17 lowers and DuckDB 1.0's
  * utf8proc (older Unicode) does not. Unicode-VERSION skew is inherent
  * to any cross-engine case mapping; it is documented rather than
  * special-cased, since pinning to the oracle's table would flip the
  * divergence on the oracle's next upgrade.
  */
case class TextCanon(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // no annotation: AbstractDataType is private[sql] (SimHash64 precedent)
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "text_canon"

  override def nullSafeEval(input: Any): Any =
    TextCanon.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextCanon.canon($t)")

  override protected def withNewChildInternal(newChild: Expression): TextCanon =
    copy(child = newChild)
}

object TextCanon {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r' || c == '\u000B'

  /** Called from both eval and generated code. NFC needs the JVM String
    * form, so the pass is String-level: one fused lower+trim+collapse
    * loop over CODEPOINTS (simple case mapping — see the class doc for
    * why `String.toLowerCase` would break the oracle), then NFC LAST
    * (see the class doc for why lower must precede NFC). */
  def canon(text: UTF8String): UTF8String = {
    val s = text.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp < 0x80 && isWs(cp.toChar)) {
        // emit at most one space, and none before the first word (trim)
        pendingSpace = out.length() > 0
      } else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.appendCodePoint(Character.toLowerCase(cp))
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(java.text.Normalizer.normalize(
      out, java.text.Normalizer.Form.NFC))
  }
}
