package graft

import graft.functions.TextCanon
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for text_canon. A dedup KEY must be a
  * projection: re-canonicalizing an already-canonical text must be the
  * identity (otherwise two pipeline stages that each canonicalize would
  * key the same doc differently), and the whitespace invariants must hold
  * on every output. Codepoints are drawn from planes/blocks where case
  * and normalization actually do work (Latin, Greek, Cyrillic, combining
  * marks, CJK, emoji) — pure-ASCII fuzzing would exercise none of the
  * Unicode machinery. Lone surrogates are excluded by generating valid
  * codepoints, not arbitrary UTF-16 chars.
  */
object TextCanonProps extends Properties("text_canon") {

  private def canon(s: String): String =
    TextCanon.canon(UTF8String.fromString(s)).toString

  private val interestingCp: Gen[Int] = Gen.frequency(
    4 -> Gen.chooseNum(0x20, 0x7e),          // ASCII incl space
    2 -> Gen.oneOf(Seq(0x9, 0xa, 0xb, 0xc, 0xd)), // the ws class
    3 -> Gen.chooseNum(0xc0, 0x17f),         // Latin-1/Extended-A (case+accents)
    2 -> Gen.chooseNum(0x386, 0x3ce),        // Greek (incl final-sigma region)
    2 -> Gen.chooseNum(0x410, 0x44f),        // Cyrillic
    2 -> Gen.oneOf(Seq(0x300, 0x301, 0x308, 0x327)), // combining marks
    1 -> Gen.chooseNum(0x4e00, 0x4e2f),      // CJK (caseless)
    1 -> Gen.oneOf(Seq(0x130, 0x131, 0x1e9e, 0xdf, 0x212a, 0x212b)),
    1 -> Gen.chooseNum(0x1f600, 0x1f60f))    // emoji (non-BMP)

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    cps <- Gen.listOfN(n, interestingCp)
  } yield cps.foldLeft(new StringBuilder) { (b, cp) =>
    b.appendAll(Character.toChars(cp))
  }.toString

  property("idempotent: canon(canon(s)) == canon(s)") =
    Prop.forAll(textGen) { s => canon(canon(s)) == canon(s) }

  property("no leading/trailing/doubled whitespace in output") =
    Prop.forAll(textGen) { s =>
      val c = canon(s)
      val wsOk = !c.exists(ch =>
        ch == '\t' || ch == '\n' || ch == '\f' || ch == '\r' || ch == '\u000B')
      c == c.trim && !c.contains("  ") && wsOk
    }

  property("no uppercase survives (simple mapping fixpoint)") =
    Prop.forAll(textGen) { s =>
      canon(s).codePoints().toArray.forall { cp =>
        Character.toLowerCase(cp) == cp
      }
    }
}
