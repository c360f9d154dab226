package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal column surface (SURVEY.md §2.11 L5). The binary payloads are
  * utf-8 text stand-ins (no media fixtures exist); the plumbing — binary
  * columns, metadata structs, partition-local decode — is the real thing.
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

    // -- Stubbed decode via mapPartitions: metadata extraction (rows-only —
    //    the stub decoder is engine-defined; determinism property-tested).
    "m02_media_meta" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val media = Multimodal.mediaFromDocuments(t.documents)
      Multimodal.extractMeta(media)
        .select(col("doc_id"), col("modality"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.n_frames").as("n_frames"), col("meta.format").as("format"))
    },

    // -- Frame-sampling plan for the video subset. n_frames is derived
    //    from doc metadata (1 + doc_id % 64) rather than the stub decoder,
    //    which makes the whole sampling plan — stride arithmetic, frame
    //    bounds, counts — oracle-checkable in SQL. The decoder-driven
    //    variant of the same operator is m02's rows-only path.
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
    }
  )

  override def oracles: Map[String, String] = Map(
    "m01_binary_columns" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS content_sha256
        |FROM documents""".stripMargin,
    "m03_frame_samples" ->
      """SELECT doc_id,
        |  CAST(1 + doc_id % 64 AS INT) AS n_frames,
        |  CAST(floor((doc_id % 64) / 10) + 1 AS INT) AS n_sampled,
        |  0 AS first_frame,
        |  CAST(10 * floor((doc_id % 64) / 10) AS INT) AS last_frame
        |FROM documents
        |WHERE doc_id % 3 = 2""".stripMargin
  )
}
