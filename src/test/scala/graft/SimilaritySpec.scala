package graft

import graft.operators.AnnPlanes
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the approximate operators that have no DuckDB oracle:
  * MinHash estimates vs exact Jaccard, ANN recall on PLANTED neighbors
  * (the fixture embeddings are random, so fixture-level recall is
  * meaningless by construction — see SimilarityOps scaladoc), and
  * approx_count_distinct error bounds vs exact.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def shingles(t: String): Set[String] = {
    val w = t.split(" ")
    (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
  }

  test("minhash est_jaccard tracks exact Jaccard on found pairs (±0.35)") {
    val found = graft.operators.SimilarityOps
      .queries("q_minhash_neardup")(spark, TestSpark.sf)
      .collect()
    assert(found.nonEmpty, "fixtures contain planted near-dups; none found")
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    found.foreach { r =>
      val (a, b, est) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (sa, sb) = (shingles(docs(a)), shingles(docs(b)))
      val j = (sa & sb).size.toDouble / (sa | sb).size
      assert(math.abs(est - j) <= 0.35,
        s"pair ($a,$b): est=$est exact=$j — estimator off")
      assert(j >= 0.3, s"pair ($a,$b): exact J=$j — LSH surfaced a non-dup")
    }
  }

  test("ANN LSH finds planted high-similarity neighbors (recall = 1)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val base = Array.fill(64)(rng.nextGaussian())
    def jitter(eps: Double): Array[Double] = {
      val v = base.zip(Array.fill(64)(rng.nextGaussian()))
        .map { case (b, g) => b + eps * g }
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    // id 0 = probe; 1..5 planted neighbors (cos ≈ 0.98); 6..105 random
    val vecs = (0L, jitter(0.0)) +:
      (1L to 5L).map(i => i -> jitter(0.2)) ++:
      (6L to 105L).map(i => i -> {
        val v = Array.fill(64)(rng.nextGaussian())
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n)
      })
    val df = vecs.toDF("vec_id", "v")
    def dotc(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def sketchOf(vcol: org.apache.spark.sql.Column) =
      (0 until 8).map { m =>
        val plane = array(AnnPlanes.planes(m).map(lit): _*)
        when(dotc(vcol, plane) > 0, shiftleft(lit(1), m)).otherwise(0)
      }.reduce(_ + _)
    val sk = df.select(col("vec_id"), col("v"), sketchOf(col("v")).as("sketch"))
    val probe = sk.filter(col("vec_id") === 0)
      .select(col("v").as("p"), col("sketch").as("ps"))
    val got = sk.filter(col("vec_id") =!= 0).crossJoin(broadcast(probe))
      .filter(bit_count(col("sketch").bitwiseXOR(col("ps"))) <= 3)
      .select(col("vec_id"), dotc(col("v"), col("p")).as("cos"))
      .orderBy(col("cos").desc).limit(5)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 4L, 5L),
      s"planted neighbors not recovered: $got")
  }

  test("native simhash64 is bit-identical to an independent grouped bit-sum spelling") {
    // The grouped spelling re-derived from scratch (shingle explode →
    // per-shingle hash → 64 grouped ±1 bit-sums → sign bits), NOT shared
    // code — the point is two independent spellings of the sketch agree
    // on every fixture doc.
    val w = split(col("text"), " ")
    val shingles = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"),
        explode(when(size(w) >= 3,
          transform(sequence(lit(1), size(w) - 2),
            i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
              element_at(w, i + 2))))
          .otherwise(array().cast("array<string>"))).as("sh"))
    val sums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s$j")
    }
    val sketch = (0 until 64).map { j =>
      when(col(s"s$j") > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce(_ + _)
    val grouped = shingles
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
      .groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), sketch.as("simhash"))
    val native = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), call_function("simhash64", col("text")).as("simhash"))
      .filter(col("simhash").isNotNull)
    assert(grouped.count() == native.count(), "sketch-bearing doc sets differ")
    val mismatches = grouped.as("g").join(native.as("n"), Seq("doc_id"))
      .filter(col("g.simhash") =!= col("n.simhash")).count()
    assert(mismatches == 0, s"$mismatches sketch mismatches")
  }

  test("simhash surfaced pairs are all true near-dups (precision contract)") {
    // SimHash at hamming≤3 over ~90-shingle docs is the high-PRECISION
    // screen: single-shingle edits flip several marginal bits, so recall
    // on J≈0.98 pairs is deliberately partial (the minhash/jaccard path
    // owns recall — its oracle proves recall 1.0). The content contract
    // worth asserting here: everything surfaced IS a near-dup, and
    // identical docs (hamming 0) are NEVER missed (ShortDocEdgeSpec).
    val found = graft.operators.SimilarityOps
      .queries("q_simhash_neardup")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(found.nonEmpty, "fixtures contain planted near-dups; none found")
    val ids = found.flatMap(p => Seq(p._1, p._2)).toSet
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    found.foreach { case (a, b) =>
      val (sa, sb) = (shingles(docs(a)), shingles(docs(b)))
      val j = (sa & sb).size.toDouble / (sa | sb).size
      assert(j >= 0.5, s"pair ($a,$b): exact J=$j — simhash surfaced a non-dup")
    }
    assert(ids.size >= 2)
  }

  test("embed near-dup surfaces planted near-identical vectors at the top") {
    import spark.implicits._
    // The fixture embeddings are random (max off-diag cos ≈ 0.37), so
    // plant the structure: 3 base vectors, each with a near-identical
    // jittered twin (cos ≈ 0.999), among 100 random unit vectors.
    val rng = new scala.util.Random(11)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    def rand(): Array[Double] = unit(Array.fill(64)(rng.nextGaussian()))
    def jit(b: Array[Double], eps: Double): Array[Double] =
      unit(b.zip(Array.fill(64)(rng.nextGaussian())).map { case (x, g) => x + eps * g })
    val planted = Array.fill(3)(rand()).zipWithIndex.flatMap { case (b, i) =>
      Seq((100L + 2 * i, b), (101L + 2 * i, jit(b, 0.03)))
    }
    val rows = planted ++ (0 until 100).map(i => (200L + i, rand()))
    val dir = java.nio.file.Files.createTempDirectory("graft_embfix").toString
    rows.toSeq.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("float")).as("embedding"),
        lit(0).as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.SimilarityOps.queries("q_embed_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.take(3).toSet == Set((100L, 101L), (102L, 103L), (104L, 105L)),
      s"planted twins not the top pairs: ${got.take(3).toSeq}")
  }

  test("neardup groups resolve transitive chains; canonical keeps one per group") {
    import spark.implicits._
    // a~b and b~c above threshold, a~c below: one interior-word edit kills
    // 3 of 28 trigrams (J ≈ 0.81 ≥ 0.8); two edits kill 6 (J ≈ 0.65 < 0.8).
    // The {a,b,c} group therefore exists ONLY via transitive closure.
    val w = (1 to 30).map(i => s"t$i")
    val a = w.mkString(" ")
    val b = w.updated(9, "xx").mkString(" ")
    val c = w.updated(9, "xx").updated(19, "yy").mkString(" ")
    val d = (1 to 30).map(i => s"u$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_chain").toString
    Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ops = graft.operators.SimilarityOps
    val pairs = ops.queries("q_jaccard_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)), s"pair graph: $pairs")
    val groups = ops.queries("q_neardup_groups")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"groups: $groups")
    val kept = ops.queries("q_dedup_canonical")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), s"canonical corpus: $kept")
  }

  test("native shingle_hashes is bit-identical to the HOF explode+xxhash64 spelling") {
    // Independent spelling: string shingles via the declarative HOF path
    // (explodedShingles) then the stock xxhash64 expression — NOT shared
    // code with the native fused loop. Compared as full multisets so a
    // dropped/duplicated/reordered position would also surface.
    val viaHof = graft.operators.SimilarityOps
      .explodedShingles(spark, TestSpark.sf)
      .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val viaNative = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"),
        explode(call_function("shingle_hashes", col("text"))).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(viaNative.length == viaHof.length &&
      viaNative.sameElements(viaHof),
      s"native=${viaNative.take(3).toSeq}… hof=${viaHof.take(3).toSeq}…")
  }

  test("containment dedup finds doc-in-doc pairs Jaccard misses; " +
      "serial all-pairs model agrees") {
    import spark.implicits._
    // 2 = a 12-word verbatim slice of 1 (containment 1.0, J ≈ 10/98 —
    // structurally invisible to the 0.8 Jaccard gate); 4 = the slice with
    // its FIRST word edited (kills exactly shingle 1 of 10 → containment
    // 0.9, the integer-gate boundary); 3/5 = identical docs (containment
    // 1.0 BOTH directions); 6 = unrelated.
    val big = (1 to 100).map(i => s"b$i").mkString(" ")
    val slice = (41 to 52).map(i => s"b$i").mkString(" ")
    val edge = ("qq" +: (42 to 52).map(i => s"b$i")).mkString(" ")
    val twin = (1 to 50).map(i => s"z$i").mkString(" ")
    val docs = Seq(1L -> big, 2L -> slice, 3L -> twin, 4L -> edge,
      5L -> twin, 6L -> (1 to 50).map(i => s"y$i").mkString(" "))
    val dir = java.nio.file.Files.createTempDirectory("graft_cont").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.SimilarityOps
      .queries("q_containment_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // serial exact model: all directed pairs with 10·|A∩B| ≥ 9·|A|
    val sets = docs.map { case (id, t) => id -> shingles(t) }
    val model = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b && sa.nonEmpty
      inter = (sa & sb).size if inter * 10 >= sa.size * 9
    } yield (a, b) -> math.round(inter.toDouble / sa.size * 10000) / 10000.0)
      .toMap
    assert(got == model, s"got=$got\nmodel=$model")
    assert(got((2L, 1L)) == 1.0 && got((4L, 1L)) == 0.9 &&
      got((3L, 5L)) == 1.0 && got((5L, 3L)) == 1.0)
    val jac = graft.operators.SimilarityOps
      .queries("q_jaccard_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)) && !jac.contains((2L, 1L)),
      "slice-in-page pair visible to Jaccard — planted case is wrong")
  }

  test("containment length filter is output-invariant on a template-heavy " +
      "corpus (many candidates on both sides of the prune boundary)") {
    import spark.implicits._
    // One 100-word template plus 20 overlapping 15-word slices of it.
    // Exercises every population the PPJoin length filter partitions:
    //  - slice→template: true containment 1.0, survives filter and gate;
    //  - template→slice: the template IS a surv candidate (its last 9
    //    shingles are df=1, so u=9 < p=10, and its prefix therefore holds
    //    exactly one df≥2 shingle — shared with slices), and every such
    //    pair is LENGTH-PRUNED (slice rep-count 13 ≪ 0.9·98);
    //  - slice→slice: adjacent slices share 9 of 13 shingles — candidates
    //    that SURVIVE the filter (equal sizes) but fail the 0.9 gate in
    //    the intersection join, pinning the verify path.
    // The serial all-pairs model is ground truth: a wrongly-pruned pair
    // shows up as a missing key.
    val words = (1 to 100).map(i => s"t$i")
    val docs = (0 until 20).map { k =>
      (100L + k, words.slice(k * 4, k * 4 + 15).mkString(" "))
    } :+ (1L -> words.mkString(" "))
    val dir = java.nio.file.Files.createTempDirectory("graft_lenf").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.SimilarityOps
      .queries("q_containment_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sets = docs.map { case (id, t) => id -> shingles(t) }
    val model = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b && sa.nonEmpty
      inter = (sa & sb).size if inter * 10 >= sa.size * 9
    } yield (a, b) -> math.round(inter.toDouble / sa.size * 10000) / 10000.0)
      .toMap
    assert(got == model, s"got=${got.keySet}\nmodel=${model.keySet}")
    // the planted structure actually exercised both populations
    assert(model.keySet.forall(_._2 == 1L) && model.size == 20,
      s"expected exactly the 20 slice→template hits, got ${model.keySet}")
  }

  test("incremental dedup drops only batch docs that duplicate the corpus") {
    import spark.implicits._
    // corpus = doc_id < 250, batch = doc_id ≥ 250 (the query's contract).
    // 300 near-copies corpus doc 10 (one trailing-word edit on 40 words:
    // J = 36/40 = 0.9); 301 is unique; 302/303 duplicate EACH OTHER but
    // nothing in the corpus — within-batch dups are q_dedup_canonical's
    // job, so the incremental pass must keep both.
    val w = (1 to 40).map(i => s"w$i")
    val corpus10 = w.mkString(" ")
    val batchTwin = w.updated(39, "zz").mkString(" ")
    val uniq = (1 to 40).map(i => s"q$i").mkString(" ")
    val inBatch = (1 to 40).map(i => s"v$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    Seq((10L, corpus10), (11L, (1 to 40).map(i => s"c$i").mkString(" ")),
        (300L, batchTwin), (301L, uniq), (302L, inBatch), (303L, inBatch))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = graft.operators.SimilarityOps
      .queries("q_dedup_incremental")(spark, dir).collect().map(_.getLong(0))
    assert(kept.sameElements(Array(301L, 302L, 303L)), s"kept: ${kept.toSeq}")
  }

  /** A seeded embeddings fixture written the way the driver's table is
    * laid out; vec_ids are consecutive from 0 (the k-means init contract:
    * initial centroids are vec_id 0..k-1). */
  private def writeEmbFixture(rows: Seq[(Long, Array[Double])]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kmfix").toString
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("float")).as("embedding"),
        lit(0).as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("kmeans assignment partitions the corpus; a duplicated init vector " +
      "empties its cluster and the carry rule holds") {
    val rng = new scala.util.Random(23)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    def rand(): Array[Double] = unit(Array.fill(64)(rng.nextGaussian()))
    val v0 = rand()
    // vec 1 is BIT-IDENTICAL to vec 0: in every assignment round both get
    // the same distance array, the tie rule sends both to the lower cell,
    // and cluster 1 finishes the round EMPTY — exercising the
    // carry-previous-centroid rule (without it the centroid array shrinks
    // and every later cell id misaligns).
    val rows = Seq((0L, v0), (1L, v0)) ++ (2L until 40L).map(i => (i, rand()))
    val dir = writeEmbFixture(rows)
    val got = graft.operators.SimilarityOps
      .queries("q_kmeans_assign")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 40, s"not a partition: ${got.length} rows")
    assert(got.map(_._1).toSet == (0L until 40L).toSet)
    assert(got.forall { case (_, c) => c >= 0 && c < 8 },
      s"cluster out of range: ${got.filterNot { case (_, c) => c >= 0 && c < 8 }.toSeq}")
    val byId = got.toMap
    assert(byId(0L) == byId(1L), "identical vectors assigned to different cells")
  }

  test("cluster dedup matches a serial within-cell union-find model; " +
      "planted identical twins are dropped") {
    val rng = new scala.util.Random(29)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    def rand(): Array[Double] = unit(Array.fill(64)(rng.nextGaussian()))
    val base = (0L until 60L).map(i => (i, rand()))
    // 60/61 duplicate 20/21 exactly: identical distance arrays put each
    // twin in its base's cell, cosine 1.0 ≥ τ makes the pair a certain
    // semantic-dup edge, and the canonical rule must keep the min id.
    // 62 is ALL-ZERO: its cosine with every cell-mate is NaN, which both
    // Spark and the serial model must treat as NOT-a-duplicate (Spark
    // orders NaN above every number, so an unguarded >= τ gate would
    // collapse the zero vector's whole cell; Scala's NaN >= τ is false,
    // so the model catches a missing !isnan guard as a mismatch).
    val rows = base ++ Seq((60L, base(20)._2), (61L, base(21)._2),
      (62L, Array.fill(64)(0.0)))
    val dir = writeEmbFixture(rows)
    val ops = graft.operators.SimilarityOps
    val cells = ops.queries("q_kmeans_assign")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Serial model over the FLOAT-CAST vectors the query actually read:
    // same cells, exact cosine with the query's 1e-6 rounding, union-find
    // closure, keep each component's min.
    val stored = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = stored.keys.toArray.sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for {
      a <- ids; b <- ids if a < b && cells(a) == cells(b)
      raw = cos(stored(a), stored(b)) // NaN for the zero vector's pairs
      if !raw.isNaN &&
        BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble >= 0.35
    } { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val expectedKept = ids.filter(i => find(i) == i).toSet
    val kept = ops.queries("q_cluster_dedup")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(kept == expectedKept,
      s"extra=${(kept -- expectedKept).toSeq.sorted} missing=${(expectedKept -- kept).toSeq.sorted}")
    assert(!kept.contains(60L) && !kept.contains(61L) &&
      kept.contains(20L) && kept.contains(21L),
      s"planted twins mishandled: kept ∩ {20,21,60,61} = ${kept.intersect(Set(20L, 21L, 60L, 61L))}")
  }

  test("approx_count_distinct within 10% of exact") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    val exact = li.select(countDistinct("l_partkey")).first().getLong(0)
    val approx = li.select(approx_count_distinct("l_partkey", 0.02))
      .first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.10,
      s"approx=$approx exact=$exact")
  }
}
