package graft.operators

import graft.Tables
import graft.Tables.Q
import graft.functions.{LangId, Num}
import org.apache.spark.sql.functions._

/** Queries exercising the engine's custom extension surface: the native
  * codegen'd expression, the UDTF Generator, and the scalar UDF — each the
  * idiomatic demonstrator for its extension point (SURVEY.md §2B "UDF /
  * UDAF / UDTF surface").
  *
  * These require the session to be built with
  * `spark.sql.extensions=graft.GraftExtensions` (Sessions.local does).
  */
object ExtensionOps {

  val queries: Map[String, Q] = Map(
    // Identical semantics (and oracle) to q_similarity_topk, but the
    // cosine runs through the native CosineSimilarity expression — one
    // fused codegen loop instead of zip_with+aggregate lambdas. The
    // summation order is identical, so the hash-compare proves the
    // custom expression bit-exact against both the HOF form and DuckDB.
    "q_similarity_topk_expr" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val probe = broadcast(e.filter(col("vec_id") === 0).select(col("v").as("p")))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(probe)
        .select(col("vec_id"),
          (round(expr("cosine_sim(v, p)") * 1000000) / 1000000).as("cos"))
        // zero-norm guard, mirrored in the shared q_similarity_topk
        // oracle: NaN cosine sorts ABOVE every number in both engines
        .filter(!isnan(col("cos")))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(20)
    }),

    // The UDTF form of shingling: LATERAL VIEW over the custom Generator.
    // Output: distinct trigram shingle count per doc — compared against a
    // DuckDB list-comprehension oracle.
    "q_udtf_shingles" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), expr("shingles(text, 3)"))
        .groupBy("doc_id")
        .agg(countDistinct(col("shingle")).as("n_distinct_shingles"))
        .orderBy("doc_id")
    }),

    // The custom TypedImperativeAggregate surface: top-3 orders per
    // customer via the k-bounded heap aggregate (functions/TopKBy) —
    // same result set as the window form (q_topk_per_group) but with O(k)
    // state per group instead of a per-partition sort, partial-merged
    // map-side. Price rides as exact cents so the heap's total order and
    // the restored double are engine-identical.
    "q_topk_agg" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy("o_custkey")
        .agg(expr("top_k_by(o_orderkey, cents, 3)").as("top"))
        .select(col("o_custkey"), posexplode(col("top")))
        .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rn"),
          col("col.payload").as("o_orderkey"),
          (col("col.ord").cast("double") / 100).as("price"))
        .orderBy("o_custkey", "rn")
    }),

    // Exact heavy hitters (words above 1% of the corpus) in the 2-pass
    // sketch-then-verify shape: pass 1 folds the corpus into a
    // Misra–Gries sketch (freq_candidates, O(capacity) state per
    // partition, merged map-side) whose membership is GUARANTEED to
    // contain every item with frequency > N/(cap+1), computing the total
    // N in the SAME aggregate so the corpus is scanned exactly twice —
    // the minimum for exact answers; pass 2 exact-counts ONLY the ≤100
    // candidates (broadcast inner join filters map-side, N rides along
    // on the broadcast rows) and applies the integer threshold
    // cnt*100 > N. The full-vocabulary groupBy never happens — at 100 TB
    // that is the difference between shuffling ~10⁹ distinct tokens and
    // shuffling 100. Output is exact and deterministic even though the
    // sketch's extra (non-heavy) members vary with partition order — the
    // verify pass is what the oracle hashes.
    "q_heavy_hitters" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val cand = words
        .agg(expr("freq_candidates(word, 100)").as("cs"), count(lit(1)).as("n"))
        .select(explode(col("cs")).as("c"), col("n"))
        .select(col("c.item").as("word"), col("n"))
      words.join(broadcast(cand), Seq("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"), first(col("n")).as("n"))
        .filter(col("cnt") * 100 > col("n"))
        .select(col("word"), col("cnt"))
        .orderBy(col("cnt").desc, col("word"))
    }),

    // Deterministic per-domain uniform sample — "show me k docs from every
    // domain" at corpus scale. Ranking by a multiplicative hash of doc_id
    // is a uniform draw that is reproducible across runs/engines (same
    // hash family as q_sample_stratified), and top_k_by keeps it O(k)
    // state per group with map-side partials — no per-group sort, no
    // window over the whole corpus, immune to a hot domain (the same
    // reason q_topk_agg uses it). ord is the NEGATED hash because
    // top_k_by keeps largest-ord with payload-ascending tiebreak.
    // Num.mulHash reduces doc_id mod 2^31 before the multiply so the
    // product cannot overflow int64 at any corpus size (see Num scaladoc).
    "q_sample_per_group" -> ((s, d) => {
      val h = Num.mulHash(col("doc_id"), 4294967296L)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), (-h).as("neg_h"))
        .groupBy("lang")
        .agg(expr("top_k_by(doc_id, neg_h, 5)").as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rn"),
          col("col.payload").as("doc_id"))
        .orderBy("lang", "rn")
    }),

    // Scalar UDF surface: heuristic language-ID over documents. Oracle:
    // the same bigram-profile scoring re-expressed as DuckDB list lambdas,
    // GENERATED from LangId.profiles so the two cannot drift.
    // The UDF runs AFTER the scan projection — one column in, one out.
    "q_lang_id" -> ((s, d) => {
      Tables.documents(s, d)
        .select(LangId.langIdUdf(col("text")).as("pred_lang"))
        .groupBy("pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("pred_lang")
    })
  )

  /** Per-language profile lookup as a SQL CASE over list literals, built
    * from the UDF's own profiles (sorted for a stable SQL string). */
  private def profileCaseSql: String =
    LangId.profiles.toSeq.sortBy(_._1).map { case (lang, prof) =>
      s"WHEN '$lang' THEN ${prof.toSeq.sorted.map(b => s"'$b'").mkString("[", ",", "]")}"
    }.mkString("CASE l.lang ", " ", " END")

  val oracleSql: Map[String, String] = Map(
    "q_similarity_topk_expr" -> SimilarityOps.oracleSql("q_similarity_topk"),
    // The sketch is a pruning pass only; the final exact counts + integer
    // threshold are what the oracle can (and does) state directly.
    "q_heavy_hitters" ->
      """WITH x AS (SELECT unnest(string_split(text, ' ')) AS word
                    FROM documents),
         c AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM x
               WHERE length(word) > 0 GROUP BY 1),
         t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c)
         SELECT word, cnt FROM c, t
         WHERE cnt * 100 > n
         ORDER BY cnt DESC, word""",
    // hash-ascending row_number is the window spelling of the negated-ord
    // bounded heap; ties break payload-ascending on both engines.
    "q_sample_per_group" ->
      """SELECT lang, rn, doc_id FROM (
           SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
               ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296
                 ASC, doc_id ASC)
               AS rn
           FROM documents)
         WHERE rn <= 5
         ORDER BY lang, rn""",
    // The window form is the semantic spec the bounded-heap aggregate
    // must reproduce exactly (same cents order, same orderkey tie-break).
    "q_topk_agg" ->
      """SELECT o_custkey, rn, o_orderkey, cents::DOUBLE / 100 AS price
         FROM (
           SELECT o_custkey, o_orderkey,
             round(o_totalprice * 100)::BIGINT AS cents,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY round(o_totalprice * 100)::BIGINT DESC, o_orderkey)
               AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    // Replicates LangId.detect: lowercase, strip non-letters, per-word
    // character bigrams, fraction-in-profile score, argmax with the
    // (score, lang) max tie-break — counts suffice for the argmax since
    // the denominator is shared. 'und' when no bigrams or all scores 0.
    "q_lang_id" ->
      s"""WITH det AS (
           SELECT doc_id,
             flatten(list_transform(
               list_filter(string_split(
                 regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
                 w -> len(w) >= 2),
               w -> list_transform(generate_series(1, len(w) - 1),
                 i -> substr(w, i, 2)))) AS bgs
           FROM documents
         ),
         scored AS (
           SELECT doc_id, len(bgs) AS nb, l.lang,
             len(list_filter(bgs, b -> list_contains($profileCaseSql, b))) AS cnt
           FROM det CROSS JOIN (VALUES ('en'), ('de'), ('es'), ('fr')) l(lang)
         ),
         best AS (
           SELECT doc_id, nb, lang, cnt,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY cnt DESC, lang DESC) AS rn
           FROM scored
         )
         SELECT pred_lang, CAST(count(*) AS BIGINT) AS n FROM (
           SELECT CASE WHEN nb = 0 OR cnt = 0 THEN 'und' ELSE lang END AS pred_lang
           FROM best WHERE rn = 1)
         GROUP BY pred_lang ORDER BY pred_lang""",
    "q_udtf_shingles" ->
      """SELECT doc_id, CAST(count(DISTINCT s) AS BIGINT) AS n_distinct_shingles
         FROM (SELECT doc_id,
                 unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                         for i in generate_series(1, len(w)-2)]) AS s
               FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
         GROUP BY doc_id ORDER BY doc_id"""
  )
}
