package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties mirroring the reference pipeline's core invariant
  * (SURVEY.md §5.3): the flood fan-out followed by the mapper/reducer
  * count-by-key must reproduce the input counts exactly —
  * R8 ∘ R10 ∘ R11 = identity on (id, n). Plus dedup idempotence.
  *
  * Spark jobs per sample are expensive; minSuccessful is kept small — the
  * value is in the randomized shapes (zeros, single keys, skew), not volume.
  */
object RoundtripProps extends Properties("roundtrip") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val knobGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 8)
    ids <- Gen.pick(n, 0L until 50L)
    counts <- Gen.listOfN(n, Gen.chooseNum(0L, 200L))
  } yield ids.toList.zip(counts)

  property("explode-then-count reproduces input counts") =
    Prop.forAll(knobGen) { knobs =>
      import spark.implicits._
      val in = knobs.toDF("id", "n")
      // R7 zero-suppression BEFORE R8: Spark's sequence(1, 0) infers step
      // -1 and yields [1, 0] — without the filter, n=0 knobs would fan out
      // to 2 rows. The reference has the same guard (knobs.go:68-69).
      val out = in
        .filter(col("n") > 0)
        .select(col("id"), explode(sequence(lit(1L), col("n"))).as("i"))
        .groupBy("id").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = knobs.filter(_._2 > 0).toMap
      out == expected
    }

  /** Random corpora over a tiny vocabulary with a small window (k=3) so
    * cross-doc window collisions are COMMON — the interesting regime for
    * the prune. The distributed result must equal a direct serial model:
    * window→(doc,pos) occurrence list, keep the (doc,pos)-min occurrence
    * of every ≥2-distinct-doc window, delete the word positions of all
    * other occurrences, rebuild. */
  private val corpusGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.chooseNum(1, 8)
    texts <- Gen.listOfN(nDocs,
      for {
        len <- Gen.chooseNum(1, 12)
        ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
      } yield ws.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def modelPrune(docs: List[(Long, String)], k: Int)
      : Map[Long, (String, Long, Long, Long)] = {
    val split = docs.map { case (id, t) => id -> t.split(" ").toVector }
    val occ = for {
      (id, ws) <- split if ws.length >= k
      i <- 1 to (ws.length - k + 1)
    } yield (ws.slice(i - 1, i - 1 + k).mkString(" "), id, i)
    val byGram = occ.groupBy(_._1)
    val deleted = byGram.valuesIterator.flatMap { os =>
      if (os.map(_._2).distinct.length >= 2) os.sortBy(o => (o._2, o._3)).tail
      else Nil
    }.toList
    val delByDoc = deleted.groupBy(_._2)
      .map { case (id, os) => id -> os.map(_._3) }
    split.map { case (id, ws) =>
      val starts = delByDoc.getOrElse(id, Nil)
      val keep = (1 to ws.length)
        .filterNot(p => starts.exists(s => p >= s && p < s + k))
      id -> (keep.map(p => ws(p - 1)).mkString(" "),
        ws.length.toLong, keep.length.toLong,
        (ws.length - keep.length).toLong)
    }.toMap
  }

  property("substring prune equals the serial model on random colliding corpora") =
    Prop.forAll(corpusGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val got = graft.operators.TextOps.substringPrune(df, k = 3)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      got == modelPrune(docs, 3)
    }

  property("exact dedup is idempotent and keeps one row per distinct text") =
    Prop.forAll(Gen.listOf(Gen.oneOf("a b c", "a  b", "A B C", "x y", "x y "))) {
      texts =>
        import spark.implicits._
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val dedup = df
          .groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
          .agg(min("doc_id").as("keep_id"))
        val n1 = dedup.count()
        // idempotence: dedup of the kept set changes nothing
        val kept = df.join(dedup.select(col("keep_id").as("doc_id")), "doc_id")
        val n2 = kept
          .groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
          .agg(min("doc_id")).count()
        // normalization is lower(trim(_)) — internal runs of spaces are
        // distinct texts ("a  b" != "a b")
        val distinctExact = texts.map(_.trim.toLowerCase).distinct.size
        n1 == distinctExact && n2 == n1
    }
}
