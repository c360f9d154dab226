package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.11 L5): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as batched partition-local transforms.
  *
  * The Spark-side machinery here is real and tested — schema, partitioning,
  * batch shape, mapPartitions signature — and so are all three codec
  * paths, using only the JDK: IMAGE decode (`imageioDecoder`: PNG/JPEG
  * via `javax.imageio`), image RESIZE (`resizeImages`: pixel decode →
  * scale → re-encode), AUDIO decode (`audioDecoder`: WAV/AIFF/AU via
  * `javax.sound.sampled`), and multi-frame VIDEO decode (animated GIF —
  * the one multi-frame container the JDK encodes and decodes natively;
  * frame counting via `getNumImages`). `synthesizeImages`/
  * `synthesizeAudio`/`synthesizeVideos` produce genuine payloads
  * executor-side for fixtures. Heavyweight codecs (H.264, MP3) are not in
  * the JDK; a javacv/ffmpeg decoder injects at the same `Decoder` seam
  * (`stubDecoder` marks that seam) without changing the pipeline shape.
  *
  * Scale design (100 TB of media):
  *  - payloads stay off the driver; decode runs inside `mapPartitions`,
  *    one partition per task, so throughput scales with executors.
  *  - `spark.sql.files.maxPartitionBytes` bounds the bytes a task holds;
  *    media tables should also set a row-group-friendly target file size.
  *  - decoded features are small structs — the wide binary column is
  *    dropped before any shuffle (project early, shuffle late).
  */
object Multimodal {

  /** Decoded-media metadata produced by a decoder. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)
  ))

  type Decoder = Array[Byte] => (Int, Int, Int, String)

  /** ImageIO defaults to DISK-backed stream caches: every read/write spills
    * the payload to a temp file first. For in-memory byte-array payloads
    * that is pure overhead — measured on the m-suite it was 6-20x the
    * actual codec cost AND the dominant variance source (32 concurrent
    * tasks contending on /tmp: m05's full chain dropped 2.1-8.5 s → 0.35 s
    * once disabled). Flipped executor-side at the top of every codec
    * closure — a JVM-global primitive, idempotent, cluster-safe.
    */
  private def useMemoryCodecBuffers(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** REAL image decoder via the JDK's `javax.imageio` — handles PNG, JPEG,
    * GIF, BMP with zero external dependencies. Returns
    * (width, height, 1 frame, lowercased format name); undecodable payloads
    * map to the (0, 0, 0, "undecodable") sentinel instead of killing the
    * task — at 100 TB a corrupt object is a row to quarantine, not a job
    * failure. Runs headless (pure-Java codecs, no display needed).
    */
  val imageioDecoder: Decoder = bytes => {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (readers != null && readers.hasNext) {
        val reader = readers.next()
        try {
          reader.setInput(in)
          // header-only dimension read: no pixel decode needed for
          // metadata. getNumImages(true) counts frames in multi-frame
          // containers (animated GIF) and returns 1 for PNG/JPEG; the
          // search is bounded by the payload the task already holds.
          (reader.getWidth(0), reader.getHeight(0),
            reader.getNumImages(true), reader.getFormatName.toLowerCase)
        } finally reader.dispose()
      } else (0, 0, 0, "undecodable")
    } catch {
      case _: java.io.IOException => (0, 0, 0, "undecodable")
    } finally if (in != null) in.close()
  }

  /** Deterministic fake decoder: dimensions derived from a stable 64-bit
    * fold of the payload. Stands in for the audio/video codecs absent from
    * this environment; the pipeline shape does not change.
    */
  val stubDecoder: Decoder = bytes => {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val w = 64 + (math.abs(h) % 1024).toInt
    val ht = 64 + (math.abs(h >> 10) % 1024).toInt
    val frames = 1 + (math.abs(h >> 20) % 64).toInt
    (w, ht, frames, if (bytes.length % 2 == 0) "png" else "jpeg")
  }

  /** Decoded-audio metadata. `n_frames` counts PCM sample frames, so
    * duration_ms = n_frames * 1000 / sample_rate exactly when sample_rate
    * divides 1000 evenly into the frame count (true for the fixtures).
    */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)
  ))

  /** REAL audio decoder via the JDK's `javax.sound.sampled` — parses
    * WAV/AIFF/AU headers with zero external dependencies (header-only, no
    * sample decode). Undecodable payloads map to the (0, 0, 0,
    * "undecodable") sentinel — quarantine a row, never kill the task.
    */
  val audioDecoder: Decoder = bytes => {
    try {
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val af = fmt.getFormat
      (af.getSampleRate.toInt, af.getChannels, fmt.getFrameLength,
        fmt.getType.getExtension.toLowerCase)
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException =>
        (0, 0, 0, "undecodable")
      case _: java.io.IOException => (0, 0, 0, "undecodable")
    }
  }

  /** Synthesizes a GENUINE audio table from documents: each doc becomes a
    * real 16-bit PCM WAV payload (encoded executor-side inside
    * mapPartitions) whose shape is doc_id-derived arithmetic:
    * sample_rate = 8000, channels = 1 + doc_id % 2,
    * n_frames = 400 + 8 * (doc_id % 200) (i.e. 50–249 ms), samples a
    * doc_id-seeded square wave. The decode path over these payloads is
    * end-to-end REAL (WAV encode → bytes → header parse) while staying
    * oracle-checkable from doc_id alone.
    */
  def synthesizeAudio(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"))
      // single-file fixture scans arrive as ONE partition; the encode loop
      // is the expensive part, so spread the (8-byte) ids BEFORE it — the
      // same degenerate-scan discipline as Dedup (SCALE.md §1). Hash on
      // doc_id: deterministic placement at any input order.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long].mapPartitions { ids =>
      ids.map { id =>
        val channels = 1 + (id % 2).toInt
        val nFrames = 400 + 8 * (id % 200).toInt
        val af = new javax.sound.sampled.AudioFormat(8000f, 16, channels, true, false)
        val bytes = new Array[Byte](nFrames * channels * 2)
        val period = 16 + (id % 48).toInt // doc_id-seeded square wave
        var f = 0
        while (f < nFrames) {
          val v: Short = if ((f / period) % 2 == 0) 12000 else -12000
          var c = 0
          while (c < channels) {
            val off = (f * channels + c) * 2
            bytes(off) = (v & 0xFF).toByte
            bytes(off + 1) = ((v >> 8) & 0xFF).toByte
            c += 1
          }
          f += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bytes), af, nFrames.toLong)
        val out = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        (id, out.toByteArray, "audio")
      }
    }.toDF("doc_id", "content", "modality")
  }

  /** Synthesizes a GENUINE multi-frame video table from documents: each
    * doc becomes a real animated GIF (the one multi-frame container the
    * JDK can encode AND decode with zero dependencies), written
    * executor-side frame by frame via the imageio sequence writer. Shape
    * is doc_id arithmetic — width = 8 + doc_id % 16,
    * height = 8 + doc_id % 12, n_frames = 2 + doc_id % 8 — so the
    * encode → bytes → multi-frame header decode round trip is end-to-end
    * real and oracle-checkable from doc_id alone. Real codecs (H.264 via
    * javacv/ffmpeg) inject at the same Decoder seam.
    */
  def synthesizeVideos(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id")) // see synthesizeAudio
      .as[Long].mapPartitions { ids =>
      useMemoryCodecBuffers()
      ids.map { id =>
        val w = 8 + (id % 16).toInt
        val h = 8 + (id % 12).toInt
        val nFrames = 2 + (id % 8).toInt
        val out = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(out)
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = img.createGraphics()
            try {
              g.setColor(new java.awt.Color((id * 7 % 256).toInt,
                (f * 29 % 256), (id * 31 % 256).toInt))
              g.fillRect(0, 0, w, h)
            } finally g.dispose()
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
        } finally { writer.dispose(); ios.close() }
        (id, out.toByteArray, "video")
      }
    }.toDF("doc_id", "content", "modality")
  }

  /** Batched partition-local audio metadata extraction — same seam as
    * [[extractMeta]] with the audio-shaped struct.
    */
  def extractAudioMeta(media: DataFrame,
      decoder: Decoder = audioDecoder): DataFrame = {
    val outSchema = StructType(
      media.schema.filterNot(_.name == "content") :+
        StructField("meta", audioMetaSchema, nullable = true))
    val contentIdx = media.schema.fieldIndex("content")
    val keptIdx = media.schema.indices.filterNot(_ == contentIdx)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val meta = if (bytes == null) null
        else { val (sr, ch, nf, fmt) = decoder(bytes); Row(sr, ch, nf, fmt) }
        Row.fromSeq(keptIdx.map(r.get) :+ meta)
      }
    }
  }

  /** REAL image resize inside mapPartitions: decode pixels, scale the long
    * edge to `maxDim` (never upscale; integer math so the output dims are
    * arithmetic any engine can recompute: d' = max(1, d * maxDim / max(w,
    * h))), re-encode PNG. Payloads that fail pixel decode pass through as
    * null content — quarantine, not task failure.
    */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    val outSchema = media.schema
    val contentIdx = media.schema.fieldIndex("content")
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    media.mapPartitions { rows =>
      useMemoryCodecBuffers()
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val resized: Array[Byte] =
          if (bytes == null) null
          else try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) null
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              val m = math.max(w, h)
              if (m <= maxDim) bytes // never upscale; payload unchanged
              else {
                val rw = math.max(1, w * maxDim / m)
                val rh = math.max(1, h * maxDim / m)
                val out = new java.awt.image.BufferedImage(
                  rw, rh, java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = out.createGraphics()
                try g.drawImage(img, 0, 0, rw, rh, null) finally g.dispose()
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(out, "png", bos)
                bos.toByteArray
              }
            }
          } catch { case _: java.io.IOException => null }
        Row.fromSeq(r.toSeq.updated(contentIdx, resized))
      }
    }
  }

  /** S-surface for real media lakes: `binaryFile` reads whole objects as
    * (path, modificationTime, length, content) rows with a size guard and
    * glob filtering — on S3 this is the raw-media ingestion path. Column
    * pruning applies: queries not touching `content` never read the bytes.
    */
  def readBinaryFiles(spark: SparkSession, dir: String,
      glob: String = "*", maxBytes: Long = 512L * 1024 * 1024): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .filter(col("length") <= maxBytes)

  /** Synthesizes a GENUINE image table from documents: each doc becomes a
    * real PNG payload (encoded executor-side via `javax.imageio`, inside
    * mapPartitions — no driver round-trip, no shuffle) whose dimensions are
    * doc_id-derived arithmetic: width = 8 + doc_id % 64,
    * height = 8 + doc_id % 48, solid fill color folded from doc_id. The
    * decode path over these payloads is therefore end-to-end REAL (PNG
    * encode → bytes → header parse) while staying oracle-checkable: any
    * engine can recompute the expected dimensions from doc_id alone.
    */
  def synthesizeImages(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id")) // see synthesizeAudio
      .as[Long].mapPartitions { ids =>
      useMemoryCodecBuffers()
      ids.map { id =>
        val w = 8 + (id % 64).toInt
        val h = 8 + (id % 48).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (((id * 7) % 256) << 16 | ((id * 13) % 256) << 8 | ((id * 31) % 256)).toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        (id, out.toByteArray, "image")
      }
    }.toDF("doc_id", "content", "modality")
  }

  /** Builds a media table from documents: payload = utf-8 bytes of the text
    * (a stand-in for real image bytes), modality assigned deterministically.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")
      ).as("modality")
    )

  /** Batched partition-local decode: binary content → metadata struct.
    * The decoder runs once per row inside a partition iterator — no
    * driver-side collection, no shuffle; output drops the payload.
    */
  def extractMeta(media: DataFrame, decoder: Decoder = stubDecoder): DataFrame = {
    val outSchema = StructType(
      media.schema.filterNot(_.name == "content") :+
        StructField("meta", mediaMetaSchema, nullable = true))
    val contentIdx = media.schema.fieldIndex("content")
    val keptIdx = media.schema.indices.filterNot(_ == contentIdx)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    media.mapPartitions { rows =>
      useMemoryCodecBuffers()
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val meta = if (bytes == null) null
        else { val (w, h, f, fmt) = decoder(bytes); Row(w, h, f, fmt) }
        Row.fromSeq(keptIdx.map(r.get) :+ meta)
      }
    }
  }

  /** Per-frame PIXEL statistics for multi-frame payloads: decodes every
    * `stride`-th frame's full raster (not just the header) and emits one
    * row per sampled frame with mean R/G/B channel values. This is the
    * frame-feature-extraction shape of a video pipeline — sample frames,
    * decode pixels, reduce to a small feature row — with the wide binary
    * column dropped before anything shuffles.
    *
    * Scale: decode runs inside `mapPartitions` (one reader per payload,
    * frames read by index through the imageio multi-frame API), output is
    * a few doubles per sampled frame, and the work is map-only — per-row
    * codec cost parallelizes across executors exactly like [[extractMeta]].
    * Undecodable payloads quarantine as a single (frame_idx = -1,
    * means = -1) sentinel row, never a task failure.
    */
  def videoFrameStats(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    val contentIdx = media.schema.fieldIndex("content")
    val keptIdx = media.schema.indices.filterNot(_ == contentIdx)
    val outSchema = StructType(
      media.schema.filterNot(_.name == "content") ++ Seq(
        StructField("frame_idx", IntegerType, nullable = false),
        StructField("mean_r", DoubleType, nullable = false),
        StructField("mean_g", DoubleType, nullable = false),
        StructField("mean_b", DoubleType, nullable = false)))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val sentinel = Seq[Any](-1, -1.0, -1.0, -1.0)
    media.mapPartitions { rows =>
      useMemoryCodecBuffers()
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val kept = keptIdx.map(r.get)
        val out: Seq[Seq[Any]] =
          if (bytes == null) Seq(sentinel)
          else {
            val in = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(in)
              if (readers == null || !readers.hasNext) Seq(sentinel)
              else {
                val reader = readers.next()
                try {
                  reader.setInput(in)
                  val n = reader.getNumImages(true)
                  // a decodable container with zero frames still quarantines
                  // (`0 until 0` would emit NO row, silently dropping the doc)
                  if (n <= 0) Seq(sentinel)
                  else (0 until n by stride).map { f =>
                    val img = reader.read(f)
                    val (w, h) = (img.getWidth, img.getHeight)
                    var (sr, sg, sb) = (0L, 0L, 0L)
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) {
                        val p = img.getRGB(x, y)
                        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                        x += 1
                      }
                      y += 1
                    }
                    val np = w.toLong * h
                    if (np == 0L) Seq[Any](f, -1.0, -1.0, -1.0) // zero-area frame: NaN guard
                    else Seq[Any](f, sr.toDouble / np, sg.toDouble / np, sb.toDouble / np)
                  }
                } finally reader.dispose()
              }
            } catch {
              // ImageIO readers throw RuntimeExceptions (IllegalArgument,
              // IndexOutOfBounds, ...) on malformed payloads, not just
              // IOException — the quarantine contract is "never a task
              // failure", so catch everything non-fatal.
              case scala.util.control.NonFatal(_) => Seq(sentinel)
            } finally if (in != null) in.close()
          }
        out.map(tail => Row.fromSeq(kept ++ tail))
      }
    }
  }

  /** Deterministic frame sampling plan for video payloads: every `stride`-th
    * frame index up to `n_frames` — a pure expression over the metadata, no
    * decode needed to plan the work.
    */
  def frameSamplePlan(meta: DataFrame, stride: Int): DataFrame =
    meta.withColumn("sample_frames",
      when(col("meta.n_frames") > 0,
        filter(
          sequence(lit(0), col("meta.n_frames") - 1),
          i => i % stride === 0))
        .otherwise(array().cast("array<int>"))) // 0-frame media: no plan, not frame [-1,0]

  // -- Perceptual image hashing: the multimodal dedup signal -----------------

  /** 60-bit id-derived block pattern — the shared contract between
    * [[synthesizeBitPatternImages]] (renders it as pixels) and the m08
    * oracle (recomputes it as integer arithmetic). Two xor-mixed 31-bit
    * multiplicative-hash lanes: the xor between affine stages breaks the
    * mod-2^31 linearity a plain Knuth hash keeps, so unrelated ids land at
    * ~random hamming distance (~30 of 60) and the PLANTED variants are the
    * only low-hamming structure. Every step is nonneg-BIGINT arithmetic
    * (products < 2^63) that DuckDB reproduces exactly.
    */
  def patternBits(id: Long): Long = {
    val M = 2147483648L
    def m1(x: Long): Long = (x % M) * 2654435761L % M
    def mix(x: Long): Long = { val a = m1(x); m1(a ^ (a >> 16)) }
    (mix(id + 1) / 2) * 1073741824L + (mix(id + 99991L) / 2)
  }

  /** Ids ≡ 1 (mod 8) render the PREVIOUS id's pattern with two bits
    * flipped — a planted near-duplicate at hamming 2. */
  val phashFlipMask: Long = (1L << 5) | (1L << 37)

  private def plantedPattern(id: Long): Long =
    if (id % 8 == 1) patternBits(id - 1) ^ phashFlipMask else patternBits(id)

  /** Real PNG payloads carrying the 60-bit pattern as a 10×6 grid of 4×4
    * black/white cells (40×24 px). Executor-side synthesis like
    * [[synthesizeImages]]; the decode→hash pipeline must recover the
    * pattern EXACTLY, which is what makes m08 hash-oracle-able.
    */
  def synthesizeBitPatternImages(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long].mapPartitions { ids =>
        useMemoryCodecBuffers()
        ids.map { id =>
          val bits = plantedPattern(id)
          val img = new java.awt.image.BufferedImage(
            40, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var k = 0
          while (k < 60) {
            val cx = k % 10; val cy = k / 10
            val rgb = if (((bits >> k) & 1L) == 1L) 0xFFFFFF else 0x000000
            var y = cy * 4
            while (y < cy * 4 + 4) {
              var x = cx * 4
              while (x < cx * 4 + 4) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            k += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          (id, out.toByteArray)
        }
      }.toDF("doc_id", "content")
  }

  /** Average-hash (aHash) of an image payload: decode, 10×6 grid of block
    * means, one bit per block — set iff the block mean exceeds the global
    * mean of block means. 60 bits packed into a BIGINT. The standard
    * perceptual fingerprint (same family as pHash/dHash): re-encoding,
    * resampling, and small local edits move few bits, so near-duplicate
    * images sit at low hamming distance — the image analogue of SimHash
    * over text.
    *
    * Map-only per row (decode + integer block sums inside mapPartitions);
    * decode failures quarantine to hash = -1 / ok = false, never a task
    * failure (the Multimodal contract). At 100 TB the wide binary column
    * is dropped right here — only (id, 8-byte hash) ever shuffles.
    */
  def imageAHash(media: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        useMemoryCodecBuffers()
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) (id, -1L, false)
            else {
              val w = img.getWidth; val h = img.getHeight
              val sums = new Array[Long](60)
              val counts = new Array[Long](60)
              var y = 0
              while (y < h) {
                val cy = math.min(y * 6 / h, 5)
                var x = 0
                while (x < w) {
                  val cx = math.min(x * 10 / w, 9)
                  val rgb = img.getRGB(x, y)
                  // integer luma (BT.601-ish, /256 keeps it exact-integer)
                  val g = (((rgb >> 16) & 0xFF) * 77 + ((rgb >> 8) & 0xFF) * 151 +
                    (rgb & 0xFF) * 28) >> 8
                  val k = cy * 10 + cx
                  sums(k) += g; counts(k) += 1
                  x += 1
                }
                y += 1
              }
              // exact rational compare: mean_k > global_mean without floats —
              // (sum_k/cnt_k) > (Σsum/Σcnt) ⟺ sum_k·Σcnt > Σsum·cnt_k
              val totSum = sums.sum; val totCnt = counts.sum
              var bits = 0L; var k = 0
              while (k < 60) {
                if (counts(k) > 0 && sums(k) * totCnt > totSum * counts(k))
                  bits |= (1L << k)
                k += 1
              }
              (id, bits, true)
            }
          } catch { case scala.util.control.NonFatal(_) => (id, -1L, false) }
        }
      }.toDF(idCol, "phash", "ok")
  }

  /** Near-duplicate image pairs by perceptual-hash hamming distance —
    * banded exactly like SimHash text dedup: 4 bands of 15 bits, a pair
    * meets iff SOME band matches (pigeonhole: ≤ 3 flipped bits leave at
    * least one band untouched, so recall at maxHamming ≤ 3 is exhaustive,
    * not probabilistic), then the true hamming filter runs on the met
    * pairs only. Scale shape: the join is an equi join on (band, value) —
    * candidates meet in buckets, never all-pairs.
    */
  def perceptualNearDups(hashes: DataFrame, idCol: String = "doc_id",
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x15-bit banding is exhaustive only to hamming 3")
    val banded = hashes.filter(col("ok"))
      .select(col(idCol).as("id"), col("phash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("phash"), 15 * b).bitwiseAND(lit(32767L))
              .as("v"))): _*)).as("bk"))
      .select(col("id"), col("phash"),
        col("bk.band").as("band"), col("bk.v").as("v"))
    banded.select(col("id").as("id_a"), col("phash").as("ph_a"), col("band"), col("v"))
      .join(banded.select(col("id").as("id_b"), col("phash").as("ph_b"),
        col("band"), col("v")), Seq("band", "v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }
}
