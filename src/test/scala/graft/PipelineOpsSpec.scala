package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the round-8 pipeline operators — properties
  * the DuckDB hash-compare can't express (it proves equality, not
  * correctness of the shared formula).
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("chunking covers every word: last chunk reaches doc length, no empty chunks") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = run("q_chunk_overlap").collect()
    assert(chunks.forall(_.getLong(3) > 0), "empty chunk emitted")
    val lastEnd = chunks.groupBy(_.getLong(0)).map { case (id, cs) =>
      val last = cs.maxBy(_.getLong(1))
      id -> (last.getLong(1) * 15 + last.getLong(3)) // start-1 + n_words
    }
    for ((id, end) <- lastEnd)
      assert(end == docs(id), s"doc $id: chunks end at $end, len ${docs(id)}")
    // overlap contract: consecutive chunks share cw - stride = 5 words
    val byDoc = chunks.groupBy(_.getLong(0)).values
    for (cs <- byDoc; Array(a, b) <- cs.sortBy(_.getLong(1)).sliding(2)
           .filter(_.length == 2).map(_.toArray)) {
      val aWords = a.getString(2).split(" ")
      val bWords = b.getString(2).split(" ")
      assert(aWords.drop(15).sameElements(bWords.take(aWords.length - 15)),
        s"doc ${a.getLong(0)}: chunk ${b.getLong(1)} does not overlap its predecessor by 5 words")
    }
    spark.catalog.clearCache()
  }

  test("domain cap: no (lang, source) group exceeds the cap, ranks are 1..n") {
    val rows = run("q_domain_cap").collect()
    val byDomain = rows.groupBy(r => (r.getString(1), r.getString(2)))
    for ((dom, rs) <- byDomain) {
      assert(rs.length <= 5, s"$dom kept ${rs.length} > 5 docs")
      assert(rs.map(_.getLong(3)).sorted.sameElements(1L to rs.length),
        s"$dom ranks not dense")
    }
    spark.catalog.clearCache()
  }

  test("gap fill: days are contiguous per user and counts reconcile with raw events") {
    val rows = run("q_gap_fill").collect()
    val byUser = rows.groupBy(_.getLong(0))
    for ((u, rs) <- byUser) {
      val days = rs.map(_.getLong(1)).sorted
      assert(days.last - days.head + 1 == days.length,
        s"user $u: days not contiguous")
    }
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.events(spark, TestSpark.sf).count(),
      "zero-filled counts must sum to the raw event count")
  }

  test("streaks: best streak is bounded by active days and positive") {
    val active = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = run("q_streaks").collect()
    assert(rows.length == active.size)
    for (r <- rows) {
      val (u, best, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(best >= 1 && best <= active(u), s"user $u best=$best active=${active(u)}")
      // islands partition the active days: n islands of length <= best
      assert(n >= 1 && n <= active(u) && best * n >= active(u),
        s"user $u: $n islands of max $best cannot cover ${active(u)} days")
    }
  }

  test("knn join: cosine is monotone non-increasing within each probe, bounded") {
    val rows = run("q_knn_join").collect()
    for ((_, rs) <- rows.groupBy(_.getLong(0))) {
      val ordered = rs.sortBy(_.getLong(1))
      val cos = ordered.map(_.getDouble(3))
      assert(cos.forall(c => c >= -1.0000001 && c <= 1.0000001))
      assert(cos.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        "cosine not monotone in rank")
    }
    spark.catalog.clearCache()
  }

  test("corpus pipeline: aggregates reconcile with stage arithmetic") {
    val rows = run("q_corpus_pipeline").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (docs, chunks, words) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(chunks >= docs, "every kept doc yields at least one chunk")
      assert(words >= 30 * docs, "quality gate admits only >=30-word docs")
    }
    spark.catalog.clearCache()
  }

  test("unigram logprob: scores are negative and gibberish scores below common text") {
    val rows = run("q_unigram_logprob").collect()
    assert(rows.forall(_.getDouble(2) < 0.0), "log-probabilities must be negative")
    spark.catalog.clearCache()
  }

  test("substring dedup: only windows inside a cross-doc shared span count") {
    import spark.implicits._
    // docs A and B share a verbatim 25-word span with different
    // surroundings; doc C is unrelated. Exactly the 25-20+1 = 6 windows
    // fully inside the span are duplicated; windows crossing the span
    // edge differ between A and B and must NOT count.
    val span = (1 to 25).map(i => s"shared$i").mkString(" ")
    val a = s"alpha1 alpha2 alpha3 $span omega1 omega2"
    val b = s"beta1 beta2 $span gamma1 gamma2 gamma3 gamma4"
    val c = (1 to 40).map(i => s"unique$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val stats = graft.operators.TextOps.substringDupStats(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // A: 3+25+2 = 30 words -> 11 windows; B: 2+25+4 = 31 -> 12; C: 40 -> 21
    assert(stats(1L) == ((11L, 6L)), s"doc A wrong: ${stats(1L)}")
    assert(stats(2L) == ((12L, 6L)), s"doc B wrong: ${stats(2L)}")
    assert(stats(3L) == ((21L, 0L)), s"doc C wrong: ${stats(3L)}")
    // within-doc repetition alone is NOT substring duplication: a 20-word
    // phrase repeated twice gives windows 1 and 21 the SAME digest (cnt=2
    // in one doc), but only one distinct doc carries it
    val rep = (1 to 2).flatMap(_ => (1 to 20).map(i => s"loop$i")).mkString(" ")
    val solo = Seq((9L, rep)).toDF("doc_id", "text")
    val soloStats = graft.operators.TextOps.substringDupStats(solo).collect()
    assert(soloStats.head.getLong(2) == 0L,
      "within-doc repeats must not count as cross-doc duplication")
  }

  test("substring prune: removes exactly the non-first span copies and reconciles with dup_grams") {
    import spark.implicits._
    // same planted corpus as the dedup-signal test: A and B share a
    // verbatim 25-word span, C is unrelated. A (lower doc_id) holds the
    // corpus-wide FIRST occurrence of every shared window, so A keeps its
    // copy; B loses exactly the 25 span words (the 6 duplicated windows'
    // union), nothing from its distinct surroundings; C is untouched.
    val span = (1 to 25).map(i => s"shared$i").mkString(" ")
    val a = s"alpha1 alpha2 alpha3 $span omega1 omega2"
    val b = s"beta1 beta2 $span gamma1 gamma2 gamma3 gamma4"
    val c = (1 to 40).map(i => s"unique$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pruned = graft.operators.TextOps.substringPrune(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(pruned(1L)._1 == a && pruned(1L)._4 == 0L,
      s"first occurrence must be kept whole: ${pruned(1L)}")
    assert(pruned(2L)._1 == "beta1 beta2 gamma1 gamma2 gamma3 gamma4",
      s"doc B must lose exactly the shared span: ${pruned(2L)}")
    assert(pruned(2L)._4 == 25L, s"doc B dropped ${pruned(2L)._4}, want 25")
    assert(pruned(3L)._1 == c && pruned(3L)._4 == 0L, "unrelated doc touched")
    // within-doc repetition alone is not pruned (the dedup-signal rule)
    val rep = (1 to 2).flatMap(_ => (1 to 20).map(i => s"loop$i")).mkString(" ")
    val solo = Seq((9L, rep)).toDF("doc_id", "text")
    assert(graft.operators.TextOps.substringPrune(solo)
      .collect().head.getLong(4) == 0L,
      "within-doc repeats must not be pruned")

    // fixture-level reconciliation with q_substring_dedup (the VERDICT
    // "token accounting must reconcile" contract): a doc loses words iff
    // it has duplicated windows, never more than 20 per duplicated
    // window, and kept + dropped == total — with real pruning happening
    // (the fixture plants cross-doc spans).
    val dup = run("q_substring_dedup").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> dup_grams
    val fix = run("q_substring_prune").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(fix.exists(_._4 > 0), "fixture prune was a no-op — weak test")
    for ((id, nWords, nKept, nDropped) <- fix) {
      assert(nKept + nDropped == nWords, s"doc $id accounting broken")
      val grams = dup.getOrElse(id, 0L)
      if (nDropped > 0)
        assert(grams > 0, s"doc $id dropped words without a dup signal")
      assert(nDropped <= 20L * grams,
        s"doc $id dropped $nDropped > 20 * $grams dup windows")
    }
    spark.catalog.clearCache()
  }

  test("mixture upsample: replica counts follow the epoch weights, keys deterministic") {
    val out = run("q_mixture_upsample")
      .select("doc_id", "lang", "epoch", "mix_key").collect()
    // every (doc_id, epoch) appears exactly once and epochs are 1..f(lang)
    val perDoc = out.groupBy(_.getLong(0))
    val factor = Map("en" -> 1L, "de" -> 2L, "es" -> 2L, "fr" -> 2L)
    perDoc.foreach { case (id, rows) =>
      val f = factor.getOrElse(rows.head.getString(1), 4L)
      assert(rows.map(_.getLong(2)).sorted.sameElements(1L to f),
        s"doc $id: epochs ${rows.map(_.getLong(2)).toSeq} for factor $f")
    }
    // totals reconcile with the per-lang weights against the raw table
    val docs = Tables.documents(spark, TestSpark.sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = docs.map { case (l, n) => n * factor.getOrElse(l, 4L) }.sum
    assert(out.length.toLong == expect, s"${out.length} rows, expected $expect")
    // the interleave key is a pure function of (doc_id, epoch) — rerunning
    // must produce the identical training order
    val again = run("q_mixture_upsample")
      .select("doc_id", "lang", "epoch", "mix_key").collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)),
      "mixture order is not reproducible across runs")
  }

  test("pack sequences: distributed cumsum matches a serial scan, pack arithmetic exact") {
    // the distributed two-pass prefix sum (range partition + windows +
    // offsets) must reproduce the serial left-to-right cumsum bit-for-bit
    // — recompute it with a fold over the collected rows and check every
    // derived pack field against the serial reference
    val rows = run("q_pack_sequences").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).sameElements(rows.map(_._1).sorted),
      "output not in corpus order")
    var cum = 0L
    for ((id, n, packId, off, spanned) <- rows) {
      assert(packId == cum / 2048,
        s"doc $id pack_id $packId, serial says ${cum / 2048}")
      assert(off == cum % 2048, s"doc $id offset $off != ${cum % 2048}")
      val expSpan =
        if (n == 0) 0L else (cum + n - 1) / 2048 - cum / 2048 + 1
      assert(spanned == expSpan, s"doc $id spans $spanned, want $expSpan")
      cum += n
    }
    // packs are dense: every pack index up to the last one hosts at least
    // one doc start or continuation (no empty training sequences)
    val lastPack = (cum - 1) / 2048
    val touched = rows.flatMap { case (_, n, p, _, s) =>
      if (n == 0) Seq.empty else p to (p + s - 1) }.toSet
    assert((0L to lastPack).forall(touched),
      "a training sequence would be empty")
    spark.catalog.clearCache()
  }

  test("fuzzy-key dedup: a planted hot prefix is capped, not quadratic") {
    import spark.implicits._
    // 10k docs share one 8-char prefix ("https://"): uncapped blocking
    // would self-join that block into ~50M Levenshtein pairs. The cap
    // must exclude it BEFORE the join while a small organic block of
    // near-identical keys still pairs.
    val hot = (1L to 10000L).map(i => (i, "en", s"https://site-$i.example/path/$i rest of document $i"))
    val ctrl = Seq(
      (20001L, "en", "controlA key one two three"),
      (20002L, "en", "controlA key one two thre"),
      (20003L, "en", "controlA key one two threX"))
    val docs = (hot ++ ctrl).toDF("doc_id", "lang", "text")
    val pairs = graft.operators.TextOps.fuzzyKeyPairs(docs).collect()
    // only the 3 control docs pair: C(3,2) = 3 pairs, all within distance
    assert(pairs.length == 3, s"expected 3 control pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(0) >= 20001L && r.getLong(1) >= 20001L),
      "hot-block pair leaked through the cap")
    // the cap is loud: the dropped block is reported, with its true size
    val dropped = graft.operators.TextOps.fuzzyKeyDroppedBlocks(docs).collect()
    assert(dropped.length == 1 && dropped.head.getString(1) == "https://"
      && dropped.head.getLong(2) == 10000L,
      s"dropped-block report wrong: ${dropped.mkString(", ")}")
  }
}
