package graft

import graft.functions.{CosineSimilarity, DotProduct, FreqCandidates, ShingleGenerator, TopKBy}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point (SURVEY.md §4): registers the
  * engine's native expressions so they are usable from SQL and `expr()`.
  * Enable with `spark.sql.extensions=graft.GraftExtensions` (Sessions.local
  * sets it for all harness mains and tests).
  *
  *  - `cosine_sim(a, b)` — codegen'd cosine similarity ([[CosineSimilarity]])
  *  - `dot_product(a, b)` — codegen'd dot product ([[DotProduct]])
  *  - `shingles(text, n)` — word n-gram UDTF ([[ShingleGenerator]])
  *  - `top_k_by(payload, ord, k)` — bounded-heap top-k aggregate ([[TopKBy]])
  *  - `freq_candidates(item, capacity)` — Misra–Gries frequent-items
  *    sketch ([[FreqCandidates]])
  *  - `minhash_sig(text, k)` — one-pass K-component MinHash signature
  *    over 3-word shingles ([[graft.functions.MinHashSig]])
  *  - `simhash64(text)` — one-pass 64-bit SimHash sketch over 3-word
  *    shingles ([[graft.functions.SimHash64]])
  *  - `shingle_hashes(text)` — one-pass array of per-position 3-word
  *    shingle hashes ([[graft.functions.ShingleHashes]])
  *  - `text_canon(text)` — Unicode-robust canonicalization (case fold +
  *    whitespace collapse, then NFC) for dedup keys ([[graft.functions.TextCanon]])
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.functions.SimplifySelfCosine)
    // point >= lo AND point < hi against a broadcast-small interval side:
    // binary-search probe instead of nested-loop (plans/BroadcastRangeJoin)
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[TopKBy].getName, "top_k_by"),
      (children: Seq[Expression]) =>
        TopKBy(children(0), children(1), children(2))
        .toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("freq_candidates"),
      new ExpressionInfo(classOf[FreqCandidates].getName, "freq_candidates"),
      (children: Seq[Expression]) =>
        FreqCandidates(children(0), children(1))
        .toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_sig(text, k): k must be an integer literal, got $other")
        }
        graft.functions.MinHashSig(children(0), k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[graft.functions.ShingleHashes].getName,
        "shingle_hashes"),
      (children: Seq[Expression]) =>
        graft.functions.ShingleHashes(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("text_canon"),
      new ExpressionInfo(classOf[graft.functions.TextCanon].getName,
        "text_canon"),
      (children: Seq[Expression]) => graft.functions.TextCanon(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => graft.functions.SimHash64(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShingleGenerator].getName, "shingles"),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) => v.toInt
          case Literal(v: Short, _) => v.toInt
          case Literal(v: Byte, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"shingles(text, n): n must be an integer literal, got $other")
        }
        ShingleGenerator(children(0), n)
      }))
  }
}
