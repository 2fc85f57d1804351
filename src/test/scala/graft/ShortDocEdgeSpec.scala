package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression for the short-document crash class: `sequence(1, size-2)`
  * infers a NEGATIVE step when size < 3, producing index 0 (always an
  * element_at error) and out-of-range indices (errors under ANSI mode,
  * which is Spark 4's default). The fixtures only contain ≥10-word
  * documents, so these paths were latent until guarded. Drives the real
  * registered queries over a synthetic mini-fixture with degenerate docs.
  */
class ShortDocEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val miniDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_minidocs").toString
    Seq(
      (0L, "", "en", "src0", 0L),
      (1L, "one", "en", "src0", 3L),
      (2L, "two words", "en", "src0", 9L),
      (3L, "exactly three words", "en", "src0", 19L),
      (4L, "a longer document with plenty of words for shingles", "en", "src0", 51L),
      (5L, "a longer document with plenty of words for shingles", "en", "src0", 51L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  for (q <- Seq("q_doc_fingerprint", "q_minhash_neardup", "q_simhash_neardup",
    "q_jaccard_neardup", "q_text_ngrams", "q_text_quality", "q_dedup_exact",
    "q_neardup_groups", "q_dedup_canonical", "q_sample_stratified",
    "q_token_budget", "q_pii_redact", "q_line_dedup", "q_tfidf_top_terms",
    "q_decontaminate", "q_repetition", "q_bm25_top_terms")) {
    test(s"$q survives 0/1/2-word documents") {
      val rows = SparkEntry.queries(q)(spark, miniDir).collect()
      assert(rows != null) // primary assertion: no ANSI element_at crash
    }
  }

  test("fingerprints of sub-3-word docs are NULL; near-dup pair found among long docs") {
    val fp = SparkEntry.queries("q_doc_fingerprint")(spark, miniDir).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(fp(0L).isEmpty && fp(1L).isEmpty && fp(2L).isEmpty)
    assert(fp(3L).isDefined && fp(4L).isDefined && fp(4L) == fp(5L))
    val mh = SparkEntry.queries("q_minhash_neardup")(spark, miniDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(mh.contains((4L, 5L)), s"identical docs not found as dup: ${mh.toSeq}")
    // identical texts → identical shingle multisets → identical simhash
    // sketch → hamming 0: the guaranteed-recall subclass of simhash
    val sh = SparkEntry.queries("q_simhash_neardup")(spark, miniDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sh.contains((4L, 5L)), s"identical docs not simhash-paired: ${sh.toSeq}")
  }

  test("line dedup drops every line of the identical doc pair, keeps unique docs intact") {
    val ld = SparkEntry.queries("q_line_dedup")(spark, miniDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // docs 4 and 5 are byte-identical → each of their pseudo-lines occurs
    // twice corpus-wide → all dropped, cleaned text empty
    for (id <- Seq(4L, 5L)) {
      val (clean, kept, dropped) = ld(id)
      assert(clean == "" && kept == 0L && dropped >= 1L, s"doc $id: ${ld(id)}")
    }
    // a unique single-line doc survives untouched
    assert(ld(3L) == (("exactly three words", 1L, 0L)), s"doc 3: ${ld(3L)}")
  }
}
