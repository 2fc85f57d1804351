package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `text_canon(s)` — Unicode-robust text canonicalization for dedup keys:
  * NFC normalize → lowercase (root locale) → trim → collapse whitespace
  * runs to a single space, in ONE fused pass at the scan projection.
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
  * `regexp_replace(trim(lower(nfc_normalize(s))), '[ \t\n\f\r\v]+', ' ', 'g')`
  * in DuckDB. Whitespace is pinned to the explicit 6-char ASCII class —
  * NOT regex `\s` — because Java's `\s` includes U+000B while RE2's does
  * not; the fused loop below and the oracle's character class agree by
  * construction. Lowercasing is SIMPLE per-codepoint mapping
  * (`Character.toLowerCase(int)`), NOT `String.toLowerCase` — the String
  * method applies FULL/contextual mapping (İ → i + combining dot-above,
  * final-position Σ → ς) where DuckDB's utf8proc applies the simple 1:1
  * UnicodeData table (İ → i, Σ → σ always); the two agree only under the
  * simple mapping (probed: U+0130, U+03A3-in-ΟΔΟΣ, U+1E9E, U+212A/B).
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
    * form, so the pass is String-level: normalize, then one fused
    * lower+trim+collapse loop over CODEPOINTS (simple case mapping — see
    * the class doc for why `String.toLowerCase` would break the oracle). */
  def canon(text: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.NFC)
    val n = nfc.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val cp = nfc.codePointAt(i)
      if (cp < 0x80 && isWs(cp.toChar)) {
        // emit at most one space, and none before the first word (trim)
        pendingSpace = out.length() > 0
      } else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.appendCodePoint(Character.toLowerCase(cp))
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(out.toString)
  }
}
