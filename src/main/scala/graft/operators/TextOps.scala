package graft.operators

import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators over the `documents` table —
  * the LLM-data-pipeline extension surface (SURVEY.md §2B, BASELINE north
  * star). The reference has no text processing at all; these are the
  * operators a 100 TB training-data pipeline actually runs.
  *
  * Scale notes:
  *  - Exact dedup is ONE hash-shuffle on a 64-hex digest — never a window
  *    over the full text, never a self-join.
  *  - All tokenization happens inside codegen'd higher-order functions
  *    (`split`/`transform`/`aggregate`): no UDF, no row-at-a-time JVM
  *    boundary crossing, no driver collect.
  *  - Word/ngram counts shuffle only (token, partial_count) pairs thanks to
  *    map-side partial aggregation — shuffle volume is O(vocabulary), not
  *    O(corpus).
  */
object TextOps {

  private val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is")

  /** SQL IN-list generated from [[Stopwords]] so the DuckDB oracles cannot
    * drift from the Spark-side list (the same single-source-of-truth move
    * LangId makes with its profile-generated SQL). */
  private val StopwordsSql = Stopwords.map("'" + _ + "'").mkString(",")

  val queries: Map[String, Q] = Map(
    // Exact dedup by normalized-text digest: group on sha2(lower(trim)),
    // keep the smallest doc_id, count copies. The digest (64 bytes) is the
    // only thing shuffled — at 100 TB the text never leaves the scan.
    "q_dedup_exact" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id")
    }),

    // Classic wordcount: tokenize, explode, count. Partial agg collapses
    // each partition to its local vocabulary before the shuffle.
    "q_text_wordcount" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
    }),

    // Bigram counts: adjacent-word pairs via zip_with of the two shifted
    // slices — pure codegen'd array ops, one explode, one agg.
    "q_text_ngrams" -> ((s, d) => {
      val w = split(col("text"), " ")
      Tables.documents(s, d)
        .select(explode(zip_with(
          slice(w, lit(1), size(w) - 1),
          slice(w, lit(2), size(w) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
    }),

    // Token counting, BPE-ish: word runs plus single punctuation marks.
    "q_text_tokens" -> ((s, d) => {
      val toks = regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(split(col("text"), " ")).cast("long").as("n_words"))
        .orderBy("doc_id")
    }),

    // Quality scoring: word count, mean word length, stopword ratio — the
    // cheap per-document features a corpus filter runs before training.
    "q_text_quality" -> ((s, d) => {
      val w = split(col("text"), " ")
      val nWords = size(w).cast("double")
      val sumLen = aggregate(transform(w, x => length(x).cast("long")),
        lit(0L), (acc, x) => acc + x).cast("double")
      val nStop = size(filter(w, x => x.isInCollection(Stopwords))).cast("double")
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(w).cast("long").as("n_words"),
          (round(sumLen / nWords * 10000) / 10000).as("avg_word_len"),
          (round(nStop / nWords * 10000) / 10000).as("stopword_ratio"))
        .orderBy("doc_id")
    }),

    // Stratified downsampling — the corpus-mixing primitive (keep all rare
    // languages, hard-downsample the dominant one). The keep decision is a
    // deterministic multiplicative hash of doc_id, so it is reproducible
    // across runs/engines and is a pure SCAN-SIDE filter: no shuffle, no
    // state, pushes into the scan at any corpus size. (A production
    // pipeline would use xxhash64 for better mixing; the linear hash here
    // is equidistributed over sequential ids and DuckDB-expressible.)
    "q_sample_stratified" -> ((s, d) => {
      val keepPermille = when(col("lang") === "en", 300)
        .when(col("lang").isin("de", "es", "fr"), 800)
        .otherwise(1000)
      Tables.documents(s, d)
        .filter(pmod(col("doc_id") * lit(2654435761L), lit(1000)) < keepPermille)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    }),

    // Token-budget selection: rank by quality, keep the prefix that fits a
    // token budget — "fill the training mix greedily". The global cumsum
    // is a distributed two-pass prefix sum: range-partition by the total
    // order, window WITHIN each partition, then add per-partition prefix
    // offsets (a k-row driver collect) — never the single-partition window
    // Spark falls into for ORDER BY without PARTITION BY.
    "q_token_budget" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 15000L
      val toks = regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0))
      val w = split(col("text"), " ")
      val nStop = size(filter(w, x => x.isInCollection(Stopwords))).cast("double")
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
          (round(nStop / size(w).cast("double") * 10000) / 10000).as("quality"))
      // localCheckpoint (eager), not persist: the pid→offset map collected
      // below is only valid for THIS materialization — if a persisted frame
      // were evicted and recomputed, repartitionByRange would resample its
      // boundaries and spark_partition_id could shift, silently corrupting
      // cum_tokens. Checkpointing truncates the lineage, so losing a block
      // fails the job loudly instead of recomputing different partitions.
      val ranged = scored
        .repartitionByRange(col("quality").desc, col("doc_id"))
        .withColumn("pid", spark_partition_id())
        .localCheckpoint(true)
      val partTotals = ranged.groupBy("pid").agg(sum("n_tokens").as("t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toSeq.sortBy(_._1)
      // prefix offset per partition; cum values are invariant to where the
      // range boundaries fall, so nondeterministic boundary sampling is fine
      val offsets = partTotals.map(_._1)
        .zip(partTotals.scanLeft(0L)(_ + _._2).dropRight(1))
      val offCol =
        if (offsets.isEmpty) lit(0L)
        else coalesce(element_at(
          map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*),
          col("pid")), lit(0L))
      val win = Window.partitionBy("pid")
        .orderBy(col("quality").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ranged
        .withColumn("cum_tokens", sum("n_tokens").over(win) + offCol)
        .filter(col("cum_tokens") <= budget)
        .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
        .orderBy("doc_id")
    }),

    // Document fingerprint: lexicographic min of sha2 over all 3-word
    // shingles — an order-invariant-ish locality fingerprint (the exact
    // min-hash with one permutation). Computed entirely inside array HOFs.
    "q_doc_fingerprint" -> ((s, d) => {
      // Materialize the split ONCE: referencing `split(text)` inside the
      // lambda would re-tokenize the document on every element_at — O(n²)
      // per doc (measured 7.6 s → 0.6 s at sf0.1 for this change).
      // The `when` guard matters: for <3-word docs, sequence(1, size-2)
      // would infer a NEGATIVE step and hit element_at(w, 0) — an error
      // under ANSI mode. Empty array → NULL fingerprint, matching DuckDB's
      // list_min([]) for the same input.
      val w = col("w")
      val shingleHashes = when(size(w) >= 3,
        transform(
          sequence(lit(1), size(w) - 2),
          i => sha2(concat_ws(" ",
            element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)), 256)))
        .otherwise(array().cast("array<string>"))
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), array_min(shingleHashes).as("fingerprint"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT sha256(lower(trim(text))) AS h, min(doc_id) AS keep_id,
                count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keep_id""",
    "q_text_wordcount" ->
      """SELECT word, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         WHERE length(word) > 0
         GROUP BY word ORDER BY cnt DESC, word""",
    "q_text_ngrams" ->
      """SELECT bigram, count(*) AS cnt
         FROM (SELECT unnest([w[i] || ' ' || w[i+1]
                              for i in generate_series(1, len(w)-1)]) AS bigram
               FROM (SELECT string_split(text, ' ') AS w FROM documents))
         GROUP BY bigram ORDER BY cnt DESC, bigram""",
    "q_text_tokens" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
         FROM documents ORDER BY doc_id""",
    "q_text_quality" ->
      ("""SELECT doc_id,
                CAST(len(w) AS BIGINT) AS n_words,
                round(list_sum(list_transform(w, x -> length(x)))::DOUBLE
                      / len(w)::DOUBLE * 10000) / 10000 AS avg_word_len,
                round(len(list_filter(w, x -> x IN
                        (""" + StopwordsSql + """)))::DOUBLE
                      / len(w)::DOUBLE * 10000) / 10000 AS stopword_ratio
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         ORDER BY doc_id"""),
    "q_sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE (doc_id * 2654435761) % 1000 <
           CASE lang WHEN 'en' THEN 300
                     WHEN 'de' THEN 800 WHEN 'es' THEN 800 WHEN 'fr' THEN 800
                     ELSE 1000 END
         ORDER BY doc_id""",
    // The monotone cumsum means "cum <= budget" is a prefix of the quality
    // order; DuckDB's single window is the semantic spec the distributed
    // two-pass prefix sum must reproduce exactly.
    "q_token_budget" ->
      ("""WITH t AS (
           SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens,
             round(len(list_filter(string_split(text, ' '), x -> x IN
                     (""" + StopwordsSql + """)))::DOUBLE
                   / len(string_split(text, ' '))::DOUBLE * 10000) / 10000 AS quality
           FROM documents
         ),
         c AS (
           SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
           FROM t
         )
         SELECT doc_id, n_tokens, cum_tokens FROM c
         WHERE cum_tokens <= 15000 ORDER BY doc_id"""),
    "q_doc_fingerprint" ->
      """SELECT doc_id,
                list_min([sha256(w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                          for i in generate_series(1, len(w)-2)]) AS fingerprint
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         ORDER BY doc_id"""
  )
}
