package graft.operators

import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (LLM-pipeline extension surface): media
  * payloads as opaque `BinaryType` columns with typed metadata, decode /
  * feature-extract as partition-local batch transforms.
  *
  * There is no real media fixture (and no image/audio codec in this
  * environment), so the payload is the document text's UTF-8 bytes and the
  * DECODE STEP IS A DETERMINISTIC STUB — but everything Spark-side is the
  * real shape a production pipeline needs: binary column + metadata schema,
  * `mapPartitions` batch processing (the Scala analog of a Pandas-UDF
  * batch: iterator in, iterator out, decode state amortized per partition,
  * no per-row driver involvement), and a fixed-width feature vector out.
  */
object MediaOps {

  /** A media row: opaque payload + kind tag. */
  case class Media(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded metadata + extracted features (fixed 8-dim). */
  case class DecodedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, feature: Array[Double])

  /** STUB decode: a real implementation would hand `bytes` to an image /
    * audio / video codec here (e.g. JPEG dimensions from the SOF header,
    * frame sampling for video). The stub derives deterministic fake
    * dimensions from the payload so the downstream plumbing is testable.
    */
  def decodeStub(m: Media): DecodedMedia = {
    val n = m.bytes.length
    val h = java.util.Arrays.hashCode(m.bytes)
    val width = 16 + math.abs(h % 1024)
    val height = 16 + math.abs((h / 1024) % 1024)
    val frames = m.kind match {
      case "video" => 1 + n % 30
      case "audio" => 1 + n % 100
      case _ => 1
    }
    // "Features": 8 chunk checksums normalized to [0,1) — stands in for a
    // model embedding; fixed width regardless of payload size.
    val feature = Array.tabulate(8) { c =>
      val from = c * n / 8
      val until = (c + 1) * n / 8
      var acc = 1125899906842597L
      var i = from
      while (i < until) { acc = 31 * acc + m.bytes(i); i += 1 }
      (acc & 0xffffffffL).toDouble / 4294967296.0
    }
    DecodedMedia(m.media_id, m.kind, width, height, frames, feature)
  }

  /** The media table derived from documents: payload = UTF-8 bytes of the
    * text, kind assigned round-robin. Binary stays opaque to Catalyst —
    * only metadata columns participate in pruning/filtering.
    */
  def mediaTable(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[Media]
  }

  /** Partition-local batch decode: the Pandas-UDF-shaped hot path. */
  def decodeFeatures(media: Dataset[Media]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition init would go here (codec handles, model session)
      batch.map(decodeStub)
    }
  }

  val queries: Map[String, Q] = Map(
    // Metadata over binary payloads — oracle-checked: byte length and
    // content digest computed on the binary column in both engines.
    "q_multimodal_meta" -> ((s, d) => {
      Tables.orderedOnce(mediaTable(s, d).toDF()
        .select(col("media_id"), col("kind"),
          length(col("bytes")).cast("long").as("n_bytes"),
          sha2(col("bytes"), 256).as("content_hash")),
        col("media_id"))
    }),

    // Stubbed decode + feature extraction — oracle-checked: the stub is
    // pure integer hash arithmetic, so DuckDB replicates it exactly with
    // HUGEINT mod-2^32/2^64 emulation of Java's wrapping int/long (below).
    // The 8-dim feature vector goes out as a comma-joined string of
    // scaled longs: raw array<double> columns crash the driver's pandas
    // comparator (unhashable ndarray).
    "q_media_features" -> ((s, d) => {
      Tables.orderedOnce(decodeFeatures(mediaTable(s, d)).toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("n_frames"),
          concat_ws(",", transform(col("feature"),
            x => round(x * 10000).cast("long").cast("string"))).as("feature")),
        col("media_id"))
    }),

    // Frame sampling — the bounded fan-out shape of video/audio feature
    // extraction: each decoded row explodes into AT MOST 4 evenly-spaced
    // frame indices (step = ceil(n_frames/4); a real pipeline hands each
    // sampled frame to the codec for a thumbnail/spectrogram slice). The
    // bound is the scale contract: output rows ≤ 4× input regardless of
    // how long a video is, so the explode can never amplify a 100 TB
    // media table unboundedly. Frame signature is the deterministic
    // mulHash of (media_id, frame_idx) — the stub stand-in for a
    // per-frame content digest.
    "q_media_frames" -> ((s, d) => {
      val decoded = decodeFeatures(mediaTable(s, d)).toDF()
      val step = ceil(col("n_frames").cast("double") / 4).cast("long")
      Tables.orderedOnce(decoded
        .select(col("media_id"), col("kind"),
          col("n_frames").cast("long").as("n_frames"),
          explode(sequence(lit(0L), col("n_frames").cast("long") - 1,
            greatest(lit(1L), step))).as("frame_idx"))
        .select(col("media_id"), col("kind"), col("n_frames"),
          col("frame_idx"),
          graft.functions.Num.mulHash(
            col("media_id") * 256 + col("frame_idx"), 1000000007L)
            .as("frame_sig")),
        col("media_id"), col("frame_idx"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id,
                CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                     WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                sha256(text) AS content_hash
         FROM documents ORDER BY media_id""",

    // decodeStub's twin. Java wrapping arithmetic is emulated in HUGEINT:
    // Arrays.hashCode (int, mod 2^32 then re-signed), the chunk checksum
    // (long, mod 2^64; the & 0xffffffff low-word is mod 2^32 of the
    // unsigned form), and truncating (not flooring) division for h/1024.
    // Text is ASCII (verified octet_length == length), so ord(char) ==
    // UTF-8 byte and DuckDB needs no blob indexing.
    "q_media_features" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             list_transform(generate_series(1, len(text)),
               i -> ord(substr(text, i, 1))) AS bytes,
             len(text) AS n
           FROM documents
         ),
         h AS (
           SELECT media_id, kind, bytes, n,
             list_reduce(list_prepend(1::HUGEINT, bytes),
               (acc, x) -> (31 * acc + x) % 4294967296::HUGEINT) AS h32u
           FROM m
         ),
         hs AS (
           SELECT media_id, kind, bytes, n,
             CASE WHEN h32u >= 2147483648 THEN h32u - 4294967296
                  ELSE h32u END AS hsig
           FROM h
         ),
         dims AS (
           SELECT media_id, kind, bytes, n,
             CAST(16 + abs(hsig % 1024) AS INTEGER) AS width,
             CAST(16 + abs((CASE WHEN hsig < 0 THEN -((-hsig) // 1024)
                                 ELSE hsig // 1024 END) % 1024)
               AS INTEGER) AS height,
             CAST(CASE kind WHEN 'video' THEN 1 + n % 30
                            WHEN 'audio' THEN 1 + n % 100
                            ELSE 1 END AS INTEGER) AS n_frames
           FROM hs
         )
         SELECT media_id, kind, width, height, n_frames,
           array_to_string(list_transform(generate_series(0, 7), c ->
             CAST(CAST(round(
               CAST(list_reduce(
                 list_prepend(1125899906842597::HUGEINT,
                   bytes[(c * n // 8) + 1 : ((c + 1) * n // 8)]),
                 (acc, x) -> (31 * acc + x) % 18446744073709551616::HUGEINT
               ) % 4294967296 AS DOUBLE) / 4294967296.0 * 10000)
               AS BIGINT) AS VARCHAR)), ',') AS feature
         FROM dims ORDER BY media_id""",

    // n_frames needs only kind + byte length (no hash), so the frame
    // fan-out replays without the HUGEINT machinery; generate_series with
    // the same ceil-step reproduces the ≤4 evenly-spaced indices, and the
    // signature is the Num.mulHash spelling.
    "q_media_frames" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             octet_length(encode(text)) AS n
           FROM documents
         ),
         f AS (
           SELECT media_id, kind,
             CAST(CASE kind WHEN 'video' THEN 1 + n % 30
                            WHEN 'audio' THEN 1 + n % 100
                            ELSE 1 END AS BIGINT) AS n_frames
           FROM m
         )
         SELECT media_id, kind, n_frames, frame_idx,
           (((media_id * 256 + frame_idx) % 2147483648) * 2654435761)
             % 1000000007 AS frame_sig
         FROM (
           SELECT media_id, kind, n_frames,
             unnest(generate_series(0, n_frames - 1,
               greatest(1, CAST(ceil(n_frames / 4.0) AS BIGINT)))) AS frame_idx
           FROM f)
         ORDER BY media_id, frame_idx"""
  )
}
