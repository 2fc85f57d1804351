package graft

import org.apache.spark.sql.functions._

/** Text-pipeline scale probe: `runMain graft.TextProbe [nDocs]` (default
  * 100,000).
  *
  * The fixture `documents` table is 500 rows at every sf, so the new text
  * family's scaling behavior (corpus-wide line frequencies, broadcast
  * decontamination, the (doc, term) shuffle under TF-IDF/BM25) is otherwise
  * only measured at bench scale (5k docs). This main generates the same
  * deterministic hash-derived corpus as ScaleProbe — ~60 words/doc over a
  * 500-word vocabulary, with 1% planted near-identical twins — and times
  * the REAL registered queries against it. The twins double as a
  * correctness canary: a twin pair shares its first 57 words, so line
  * dedup must drop each shared 5-token pseudo-line from BOTH docs.
  *
  * Everything is distributed DataFrame work; the driver sees only counters.
  */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = Sessions.local(appName = "graft-text-probe")
    import spark.implicits._

    val dir = s"/tmp/graft_text_$nDocs"
    val vocabSize = 500
    val wordsPerDoc = 60

    val word = (seed: org.apache.spark.sql.Column) =>
      concat(lit("w"), pmod(xxhash64(seed), lit(vocabSize)))
    val base = spark.range(0, nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until wordsPerDoc).map(j =>
          word(concat(col("id"), lit(s"_$j")))): _*).as("text"))
    val twins = base.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + nDocs).as("doc_id"),
        concat(
          expr(s"substring_index(text, ' ', ${wordsPerDoc - 3})"),
          lit(" zz1 zz2 zz3")).as("text"))
    base.unionByName(twins)
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("synth").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val total = nDocs + (nDocs + 99) / 100 // twins planted at every doc_id % 100 == 0: CEIL
    println(s"[text-probe] corpus: $total docs at $dir")

    def time(name: String)(f: => Long): Long = {
      spark.catalog.clearCache() // cold-cache like Bench.runOnce
      val t0 = System.nanoTime()
      val n = f
      println(f"[text-probe] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
      n
    }
    // Warm-up (the Bench lesson, round 4): without it the FIRST timed
    // query absorbs JVM/codegen init plus the cold read of the freshly
    // written corpus — measured ~3× on a 1M-doc run (q_substring_prune
    // 93 s cold-first vs 34 s after another query warmed the file cache),
    // which made cross-query comparisons meaningless.
    spark.read.parquet(s"$dir/documents.parquet").count()
    SparkEntry.queries("q_text_tokens")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    def run(name: String): Long = time(name) {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      -1L
    }

    // optional args after nDocs filter which queries run (dev loop)
    val only = args.drop(1).toSet
    def want(n: String) = only.isEmpty || only(n)
    // q_domain_cap / q_corpus_pipeline here are the HOT-KEY stress: the
    // synthetic corpus is one (lang, source) domain, so the cap window
    // collapses onto a single key — WindowGroupLimit's map-side prune is
    // what keeps the exchange at 5 rows per input partition instead of
    // the whole corpus.
    Seq("q_pii_redact", "q_repetition", "q_tfidf_top_terms",
      "q_bm25_top_terms", "q_decontaminate", "q_chunk_overlap",
      "q_unigram_logprob", "q_domain_cap", "q_corpus_pipeline",
      "q_substring_dedup", "q_pack_sequences",
      // the exact-dedup pair: both key on a normalized-text sha256
      // (dedup_exact = lower+trim built-ins; unicode_canon = the native
      // codepoint loop + NFC) — the canon's String-level pass is the
      // cost delta under scrutiny
      "q_dedup_exact", "q_unicode_canon",
      // simhash with the Manku block-permutation tables (20 index rows
      // per doc, ~32-bit keys): the 1M-doc wall time evidences that the
      // 5× index fan-out stays cheap while the old 65k-bucket chunk
      // join's quadratic term is gone
      "q_simhash_neardup")
      .filter(want).foreach(run)
    // substring PRUNE with the twin canary: a twin shares its first 57
    // words with its base doc, i.e. all 38 of the base's 20-word windows
    // starting at positions 1..38 recur in the twin — the twin (higher
    // doc_id, so never the corpus-wide first occurrence) must lose words
    // while its base keeps all 60. Random 20-gram collisions over the
    // 500-word vocab are ~vanishing, so the base bound is exact.
    if (want("q_substring_prune")) {
      // time the FULL materialization (every other probe row pays the
      // noop-sink cost of all output columns — a counters-only select
      // would let Catalyst prune the text_clean rebuild, the very cost
      // the operator documents); the twin canary re-runs a narrow
      // projection UNTIMED
      run("q_substring_prune")
      val out = SparkEntry.queries("q_substring_prune")(spark, dir)
        .filter(col("doc_id").isin(0L, nDocs))
        .select("doc_id", "n_dropped").as[(Long, Long)].collect().toMap
      spark.catalog.clearCache()
      require(out(0L) == 0L, s"base doc lost ${out(0L)} words (is first)")
      require(out(nDocs) > 0L, "twin kept its duplicated span")
      println(s"[text-probe] prune twin canary ok: twin dropped ${out(nDocs)} words")
    }
    // Containment with the twin canary: a twin shares 55 of its 58
    // trigram shingles with its base (C = 55/58 ≈ 0.948 ≥ 0.9, both
    // directions), so the prefix-filter inverted index must surface
    // twin⊂base at any corpus size — the recall theorem exercised at
    // probe scale, where the df distribution is real rather than the
    // 500-doc fixture's.
    if (want("q_containment_dedup")) {
      run("q_containment_dedup")
      val hit = SparkEntry.queries("q_containment_dedup")(spark, dir)
        .filter(col("doc_contained") === lit(nDocs) &&
          col("doc_container") === 0L).count()
      spark.catalog.clearCache()
      require(hit == 1L, "twin-in-base containment pair missing at scale")
      println("[text-probe] containment twin canary ok")
    }
    // Opt-in boilerplate-skew phase (`runMain graft.TextProbe N boiler`):
    // every 5th doc carries the SAME 25-word header, so each of the
    // header's 6 pure-header 20-word windows occurs in nDocs/5 documents
    // — ONE digest with 200k occurrences at 1M docs. This is the skew
    // the round-11 de-skew exists for: a Window.partitionBy(gh) plan
    // funnels all occurrences of the hot digest into a single task's
    // sort (unsplittable, 10⁹-scale fatal), while the shipped
    // aggregation shape collapses them map-side in partial agg and the
    // join-back is AQE-splittable. The canary asserts the semantics on
    // the hot path: every non-first boilerplate doc must report (dedup)
    // and lose (prune) its header windows.
    if (only.contains("boiler")) {
      val bdir = s"$dir-boiler"
      val header = (1 to 25).map(j => s"bp$j").mkString(" ")
      base.select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(lit(header + " "), col("text"))).otherwise(col("text"))
            .as("text"))
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("synth").as("source"), length(col("text")).as("n_chars"))
        .write.mode("overwrite").parquet(s"$bdir/documents.parquet")
      spark.read.parquet(s"$bdir/documents.parquet").count() // warm cache
      def runB(name: String): Unit = time(s"$name [boiler]") {
        SparkEntry.queries(name)(spark, bdir)
          .write.format("noop").mode("overwrite").save()
        -1L
      }
      runB("q_substring_dedup")
      runB("q_substring_prune")
      val hot = SparkEntry.queries("q_substring_dedup")(spark, bdir)
        .filter(col("doc_id") === 5L).select("dup_grams").as[Long].head()
      spark.catalog.clearCache()
      require(hot >= 6L,
        s"boilerplate doc reported only $hot dup windows (expected >= 6)")
      val dropped = SparkEntry.queries("q_substring_prune")(spark, bdir)
        .filter(col("doc_id") === 5L).select("n_dropped").as[Long].head()
      spark.catalog.clearCache()
      require(dropped >= 6L,
        s"boilerplate doc kept its header ($dropped words dropped)")
      println(s"[text-probe] boiler canary ok: doc 5 dup_grams=$hot " +
        s"dropped=$dropped")
    }
    if (!want("q_line_dedup")) { spark.stop(); return }
    // line dedup last, with the twin canary: doc 0 and doc nDocs share
    // words 1..57, i.e. pseudo-lines 1..11 (1-based 5-token chunks) of doc 0
    // all occur at least twice corpus-wide → doc 0 keeps at most its last
    // chunk. (Other cross-doc line collisions are possible over a 500-word
    // vocab — the canary asserts an upper bound, not an exact count.)
    run("q_line_dedup") // timed with ALL columns materialized (see above)
    val kept = SparkEntry.queries("q_line_dedup")(spark, dir)
      .filter(col("doc_id") === 0).select("n_kept").as[Long].head()
    spark.catalog.clearCache()
    require(kept <= 1, s"twin lines not deduped: doc 0 kept $kept lines")
    println(s"[text-probe] line-dedup twin canary ok: doc 0 kept $kept lines")
    spark.stop()
  }
}
