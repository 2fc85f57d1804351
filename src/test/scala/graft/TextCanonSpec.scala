package graft

import graft.functions.TextCanon
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Planted-input semantics for text_canon (the ASCII fixtures only
  * exercise its case/whitespace legs — the Unicode leg lives here), plus
  * the codegen-path parity every native expression gets. All non-ASCII
  * content is spelled in \u escapes so the source file's own encoding /
  * normal form can never silently change what the test plants. */
class TextCanonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val EAcuteNfc = "\u00e9"        // é, composed
  private val EAcuteNfd = "e\u0301"       // e + combining acute

  private def canon(s: String): String =
    TextCanon.canon(UTF8String.fromString(s)).toString

  test("NFD and NFC spellings of the same text canon identically") {
    val nfc = s"caf$EAcuteNfc bar"
    val nfd = s"caf$EAcuteNfd bar"
    assert(nfc != nfd)               // byte-different inputs...
    assert(canon(nfc) == canon(nfd)) // ...one canonical form
    assert(canon(nfd) == "caf\u00e9 bar")
  }

  test("case folds and whitespace collapses, all six ASCII ws chars") {
    assert(canon("  Hello\t\tWORLD \r\n x\fy\u000Bz  ") == "hello world x y z")
    assert(canon("") == "")
    assert(canon(" \t ") == "")
    assert(canon("already canonical") == "already canonical")
  }

  test("case mapping is SIMPLE (per-codepoint), matching DuckDB's lower") {
    // Full/contextual mapping (String.toLowerCase) would emit i+combining
    // dot for dotted-İ and final sigma ς — DuckDB's utf8proc does neither.
    assert(canon("\u0130") == "i")             // dotted-I, 1 codepoint out
    assert(canon("\u039f\u0394\u039f\u03a3") ==
      "\u03bf\u03b4\u03bf\u03c3")          // NOT final sigma \u03c2
    assert(canon("\u1e9e") == "\u00df")        // capital sharp s -> eszett
    assert(canon("\u212a") == "k")             // Kelvin sign
  }

  test("lower-then-NFC: lowercase-only compositions key identically") {
    // T+combining-diaeresis has no uppercase precomposed form, so the
    // old NFC-then-lower order left it decomposed while precomposed
    // U+1E97 input stayed composed — render-identical texts, different
    // keys, and canon(canon(s)) != canon(s). TextCanonProps found it.
    assert(canon("T\u0308") == "\u1e97")
    assert(canon("\u1e97") == "\u1e97")
    assert(canon(canon("T\u0308")) == canon("T\u0308"))
  }

  test("non-BMP content (emoji, CJK) passes through untouched") {
    val s = "\ud83d\ude00 \u4f60\u597d"
    assert(canon(s) == s)
  }

  test("codegen path agrees with eval path on a planted frame") {
    import spark.implicits._
    val rows = Seq("  Hello\tWORLD ", s"Caf$EAcuteNfc", s"caf$EAcuteNfd", "", "a  b")
    val df = rows.toDF("text")
      .select(col("text"), expr("text_canon(text)").as("c"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toMap
    rows.foreach { s => assert(got(s) == canon(s), s"input ${s.length} chars") }
    // NULL in, NULL out (UnaryExpression default null channel).
    val n = Seq[Option[String]](None).toDF("text")
      .select(expr("text_canon(text)")).head()
    assert(n.isNullAt(0))
  }

  test("q_unicode_canon's grouping collapses a planted NFD/NFC twin pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"The CAF\u00c9  menu"),   // composed É, extra spaces
      (2L, s"the caf$EAcuteNfd menu"),     // decomposed é, lowercase
      (3L, "an unrelated document")).toDF("doc_id", "text")
    val groups = docs
      .groupBy(sha2(expr("text_canon(text)"), 256).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")
      .collect()
    assert(groups.length == 2)
    assert(groups(0).getLong(1) == 1L && groups(0).getLong(2) == 2L)
    assert(groups(1).getLong(1) == 3L && groups(1).getLong(2) == 1L)
  }
}
