package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal column surface (SURVEY.md §2.11 L5). m01 uses utf-8 text
  * stand-in payloads; m02 synthesizes GENUINE PNGs executor-side and
  * decodes them through javax.imageio; m04 does the same for audio
  * (real PCM WAVs through javax.sound.sampled); m05 runs the full
  * decode → pixel resize → re-encode → decode chain. Binary columns,
  * metadata structs, partition-local decode, and the image/audio codec
  * paths are all real; every emitted field is doc_id arithmetic, so
  * DuckDB verifies the codec round trips without owning any codec.
  */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // -- Binary column basics: payload size + content hash (oracle-checked).
    "m01_binary_columns" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      Multimodal.mediaFromDocuments(t.documents).select(
        col("doc_id"),
        col("modality"),
        octet_length(col("content")).cast("long").as("n_bytes"),
        sha2(col("content"), 256).as("content_sha256")
      )
    },

    // -- REAL decode via mapPartitions: genuine PNG payloads synthesized
    //    executor-side (doc_id-derived dimensions), then header-decoded
    //    through javax.imageio. Oracle-checked: the expected width/height
    //    are recomputable from doc_id alone, so DuckDB verifies the whole
    //    encode→decode round trip without owning a PNG codec.
    "m02_media_meta" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val media = Multimodal.synthesizeImages(t.documents)
      Multimodal.extractMeta(media, Multimodal.imageioDecoder)
        .select(col("doc_id"), col("modality"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.n_frames").as("n_frames"), col("meta.format").as("format"))
    },

    // -- REAL audio decode via mapPartitions: genuine 16-bit PCM WAV
    //    payloads synthesized executor-side (doc_id-derived shape), then
    //    header-decoded through javax.sound.sampled. Oracle-checked the
    //    same way as m02: every decoded field is doc_id arithmetic.
    "m04_audio_meta" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val media = Multimodal.synthesizeAudio(t.documents)
      Multimodal.extractAudioMeta(media, Multimodal.audioDecoder)
        .select(col("doc_id"), col("modality"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"),
          col("meta.n_frames").as("n_frames"),
          // exact: n_frames is a multiple of 8 and sample_rate is 8000
          (col("meta.n_frames").cast("long") * lit(1000L) /
            col("meta.sample_rate").cast("long")).cast("long").as("duration_ms"),
          col("meta.format").as("format"))
    },

    // -- REAL resize: decode pixels, scale the long edge to 16 (integer
    //    math, never upscale), re-encode PNG, decode the result's header.
    //    The resized dimensions are pure doc_id arithmetic, so the whole
    //    decode → resize → encode → decode chain is oracle-checked.
    "m05_resized_meta" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val media = Multimodal.synthesizeImages(t.documents)
      val resized = Multimodal.resizeImages(media, maxDim = 16)
      Multimodal.extractMeta(resized, Multimodal.imageioDecoder)
        .select(col("doc_id"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.format").as("format"))
    },

    // -- REAL multi-frame video decode: genuine animated GIFs synthesized
    //    executor-side, frame count read back through the imageio
    //    multi-frame reader, and the frame-sampling plan (m03's operator)
    //    driven by the DECODED count — the full video pipeline, decode
    //    through sampling, oracle-checked from doc_id arithmetic.
    "m06_video_meta" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val media = Multimodal.synthesizeVideos(t.documents)
      val meta = Multimodal.extractMeta(media, Multimodal.imageioDecoder)
      Multimodal.frameSamplePlan(meta, stride = 3)
        .select(col("doc_id"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.n_frames").as("n_frames"),
          col("meta.format").as("format"),
          size(col("sample_frames")).as("n_sampled"))
    },

    // -- REAL per-frame PIXEL decode: beyond m06's frame counting, every
    //    3rd frame of each genuine animated GIF is pixel-decoded and
    //    reduced to mean R/G/B. Each synthesized frame is a solid fill
    //    whose color is (doc_id, frame) arithmetic, and GIF's palette is
    //    lossless for a single-color frame, so the encode → multi-frame
    //    pixel decode → channel-stats chain is oracle-checked exactly.
    "m07_video_frame_stats" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val media = Multimodal.synthesizeVideos(t.documents)
      Multimodal.videoFrameStats(media, stride = 3)
        .select(col("doc_id"), col("frame_idx"),
          col("mean_r"), col("mean_g"), col("mean_b"))
    },

    // -- Frame-sampling plan for the video subset. n_frames is derived
    //    from doc metadata (1 + doc_id % 64) rather than the stub decoder,
    //    which makes the whole sampling plan — stride arithmetic, frame
    //    bounds, counts — oracle-checkable in SQL. The decoder-driven
    //    variant of the same arithmetic is m02's real-decode path (also
    //    fully oracled since round 6 — synthesized dims ARE doc_id math).
    "m03_frame_samples" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val meta = Multimodal.mediaFromDocuments(t.documents)
        .filter(col("modality") === "video")
        .withColumn("meta", struct(
          (lit(1) + pmod(col("doc_id"), lit(64))).cast("int").as("n_frames")))
      Multimodal.frameSamplePlan(meta, stride = 10)
        .select(col("doc_id"), col("meta.n_frames").as("n_frames"),
          size(col("sample_frames")).as("n_sampled"),
          element_at(col("sample_frames"), 1).as("first_frame"),
          element_at(col("sample_frames"), -1).as("last_frame"))
    },

    // -- Multimodal DEDUP: perceptual hashing over really-decoded pixels.
    //    Synthesized PNGs carry a 60-bit id-derived block pattern (ids ≡ 1
    //    mod 8 render the previous id's pattern with two bits flipped — a
    //    planted near-dup at hamming 2); aHash must recover the pattern
    //    EXACTLY through the encode→decode→block-mean→threshold chain, and
    //    the banded pair join is pigeonhole-exhaustive at hamming ≤ 3 — so
    //    the oracle recomputes the entire pair set from pure integer
    //    arithmetic and the gate is rows+schema+hash exact.
    "m08_image_phash_dedup" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val media = Multimodal.synthesizeBitPatternImages(t.documents)
      val hashes = Multimodal.imageAHash(media)
      Multimodal.perceptualNearDups(hashes, maxHamming = 3)
    },

    // -- Training-record assembly: the terminal multimodal join — text
    //    stats ⋈ embeddings (LEFT: not every doc is embedded yet at
    //    sf0.1, a real pipeline state) ⋈ really-decoded image metadata,
    //    one row per doc as a trainer consumes it. Embedding presence
    //    travels on a marker (a null label is a value, not absence);
    //    norms reuse the s09-proven round-6 list_dot_product parity.
    "m09_training_records" -> { (spark, dir) =>
      import graft.functions.TextFunctions.tokenCount
      val t = Tables(spark, dir)
      val docs = t.documents.select(col("doc_id"), col("lang"),
        tokenCount(col("text")).as("n_tokens"))
      val emb = t.embeddings.select(col("vec_id").as("doc_id"), col("label"),
        round(sqrt(aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, v) => acc + v)), 6).as("emb_norm"),
        lit(true).as("_has"))
      val meta = Multimodal.extractMeta(
        Multimodal.synthesizeImages(t.documents), Multimodal.imageioDecoder)
        .select(col("doc_id"), col("meta.width").as("width"),
          col("meta.height").as("height"))
      docs.join(emb, Seq("doc_id"), "left")
        .join(meta, Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          coalesce(col("_has"), lit(false)).as("has_embedding"),
          col("label"), col("emb_norm"), col("width"), col("height"))
    }
  )

  override def oracles: Map[String, String] = Map(
    "m02_media_meta" ->
      """SELECT doc_id, 'image' AS modality,
        |  CAST(8 + doc_id % 64 AS INT) AS width,
        |  CAST(8 + doc_id % 48 AS INT) AS height,
        |  1 AS n_frames,
        |  'png' AS format
        |FROM documents""".stripMargin,
    "m01_binary_columns" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS content_sha256
        |FROM documents""".stripMargin,
    // n_sampled = frames at indices 0, 3, 6, ... below n_frames
    "m06_video_meta" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 16 AS INT) AS width,
        |  CAST(8 + doc_id % 12 AS INT) AS height,
        |  CAST(2 + doc_id % 8 AS INT) AS n_frames,
        |  'gif' AS format,
        |  CAST(floor((1 + doc_id % 8) / 3) + 1 AS INT) AS n_sampled
        |FROM documents""".stripMargin,
    // every 3rd frame index below n_frames = 2 + doc_id % 8; the frame's
    // solid-fill color is pure (doc_id, frame) arithmetic (see
    // synthesizeVideos), so mean channel values equal the fill exactly
    "m07_video_frame_stats" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(doc_id * 7 % 256 AS DOUBLE) AS mean_r,
        |  CAST(f * 29 % 256 AS DOUBLE) AS mean_g,
        |  CAST(doc_id * 31 % 256 AS DOUBLE) AS mean_b
        |FROM documents, unnest(range(0, 2 + doc_id % 8)) AS t(f)
        |WHERE f % 3 = 0""".stripMargin,
    "m04_audio_meta" ->
      """SELECT doc_id, 'audio' AS modality,
        |  8000 AS sample_rate,
        |  CAST(1 + doc_id % 2 AS INT) AS channels,
        |  CAST(400 + 8 * (doc_id % 200) AS INT) AS n_frames,
        |  50 + doc_id % 200 AS duration_ms,
        |  'wav' AS format
        |FROM documents""".stripMargin,
    // resize arithmetic: d' = max(1, d * 16 // max(w, h)) when the long
    // edge exceeds 16, unchanged otherwise (// = integer floor division,
    // matching Java int division for positive ints)
    "m05_resized_meta" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    8 + doc_id % 64 AS w, 8 + doc_id % 48 AS h
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN greatest(w, h) <= 16 THEN w
        |    ELSE greatest(1, (w * 16) // greatest(w, h)) END AS INT) AS width,
        |  CAST(CASE WHEN greatest(w, h) <= 16 THEN h
        |    ELSE greatest(1, (h * 16) // greatest(w, h)) END AS INT) AS height,
        |  'png' AS format
        |FROM dims""".stripMargin,
    "m03_frame_samples" ->
      """SELECT doc_id,
        |  CAST(1 + doc_id % 64 AS INT) AS n_frames,
        |  CAST(floor((doc_id % 64) / 10) + 1 AS INT) AS n_sampled,
        |  0 AS first_frame,
        |  CAST(10 * floor((doc_id % 64) / 10) AS INT) AS last_frame
        |FROM documents
        |WHERE doc_id % 3 = 2""".stripMargin,
    // m08: the pixel pattern is Multimodal.patternBits — two xor-mixed
    // 31-bit multiplicative-hash lanes packed to 60 bits (all nonneg
    // BIGINT arithmetic), flip mask 2^5+2^37 on ids ≡ 1 mod 8. The
    // brute-force pair filter here equals the engine's banded join because
    // 4x15-bit banding is exhaustive at hamming <= 3 (pigeonhole).
    "m08_image_phash_dedup" ->
      """WITH k AS (SELECT doc_id,
        |    CASE WHEN doc_id % 8 = 1 THEN doc_id - 1 ELSE doc_id END AS k
        |  FROM documents),
        |a AS (SELECT doc_id,
        |    ((k + 1) % 2147483648) * 2654435761 % 2147483648 AS a1,
        |    ((k + 99991) % 2147483648) * 2654435761 % 2147483648 AS a2
        |  FROM k),
        |m AS (SELECT doc_id,
        |    (xor(a1, a1 >> 16) * 2654435761 % 2147483648) AS u1,
        |    (xor(a2, a2 >> 16) * 2654435761 % 2147483648) AS u2
        |  FROM a),
        |base AS (SELECT doc_id,
        |    (u1 // 2) * 1073741824 + (u2 // 2) AS b FROM m),
        |p AS (SELECT doc_id,
        |    CASE WHEN doc_id % 8 = 1 THEN xor(b, 137438953504) ELSE b END AS ph
        |  FROM base)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
        |FROM p a JOIN p b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 3""".stripMargin,
    // m09: n_tokens via the t01 raw-token twin, norms via the s09-proven
    // round-6 list_dot_product parity, image dims from doc_id arithmetic
    // (the m02 contract the real decode path is gated against).
    "m09_training_records" ->
      """WITH e AS (SELECT vec_id, label,
        |    round(sqrt(list_dot_product(lt, lt)), 6) AS emb_norm, TRUE AS m
        |  FROM (SELECT vec_id, label,
        |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS lt
        |    FROM embeddings))
        |SELECT d.doc_id, d.lang,
        |  len(list_filter(string_split_regex(trim(d.text), '\s+'),
        |    x -> x <> '')) AS n_tokens,
        |  e.m IS NOT NULL AS has_embedding,
        |  e.label, e.emb_norm,
        |  CAST(8 + d.doc_id % 64 AS INT) AS width,
        |  CAST(8 + d.doc_id % 48 AS INT) AS height
        |FROM documents d LEFT JOIN e ON d.doc_id = e.vec_id""".stripMargin
  )
}
