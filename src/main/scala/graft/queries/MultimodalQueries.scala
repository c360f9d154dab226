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

    // -- Frame-sampling plan for the video subset (rows-only).
    "m03_frame_samples" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val meta = Multimodal.extractMeta(Multimodal.mediaFromDocuments(t.documents))
        .filter(col("modality") === "video")
      Multimodal.frameSamplePlan(meta, stride = 10)
        .select(col("doc_id"), col("meta.n_frames").as("n_frames"),
          size(col("sample_frames")).as("n_sampled"))
    }
  )

  override def oracles: Map[String, String] = Map(
    "m01_binary_columns" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS content_sha256
        |FROM documents""".stripMargin
  )
}
