package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal
import graft.ts.Round6

/** Driver-checked queries for the multimodal plumbing
  * ([[graft.pipeline.Multimodal]]). The decode stage is a marked stub
  * (no codecs in this environment); the oracle recomputes the feature
  * math from the same deterministic payload construction, so the whole
  * binary → mapPartitions → features path is still value-checked. */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // binary payload → per-partition decode (stub) → histogram features
    ("mm_features",
      ((s: SparkSession, d: String) => {
        val feats = Multimodal.extractFeatures(s,
          Multimodal.syntheticMedia(Tables.documents(s, d))).toDF()
        feats.select(col("doc_id"), col("media_type"),
          col("n_bytes").cast("long").as("n_bytes"),
          Round6.r6(col("brightness")).as("brightness"),
          Round6.r6(element_at(col("histogram"), 1)).as("h0"),
          Round6.r6(element_at(col("histogram"), 6)).as("h5"),
          Round6.r6(element_at(col("histogram"), 16)).as("h15"))
          .orderBy("doc_id")
      }): Q,
      Some(
        s"""WITH ${Multimodal.mediaSql}, ${Multimodal.featuresSql}
           |SELECT doc_id, media_type, CAST(n_bytes AS BIGINT) AS n_bytes,
           |  ${Round6.r6Sql("brightness")} AS brightness,
           |  ${Round6.r6Sql("histogram[1]")} AS h0,
           |  ${Round6.r6Sql("histogram[6]")} AS h5,
           |  ${Round6.r6Sql("histogram[16]")} AS h15
           |FROM feats ORDER BY doc_id""".stripMargin)),

    // frame sampling: every 4th frame of each video row
    ("mm_frame_sample",
      ((s, d) => Multimodal.frameSample(
        Multimodal.syntheticMedia(Tables.documents(s, d)), 4)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))
        .orderBy("doc_id", "frame_idx")): Q,
      Some(
        s"""WITH ${Multimodal.mediaSql}
           |SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, 4)) AS BIGINT) AS frame_idx
           |FROM media WHERE media_type = 'video' AND n_frames > 0
           |ORDER BY doc_id, frame_idx""".stripMargin)),

    // resize plan: metadata-only halving with a floor
    ("mm_resize",
      ((s, d) => Multimodal.resizePlan(
        Multimodal.syntheticMedia(Tables.documents(s, d)), 48)
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("out_width").cast("long").as("out_width"),
          col("out_height").cast("long").as("out_height"))
        .orderBy("doc_id")): Q,
      Some(
        s"""WITH ${Multimodal.mediaSql}
           |SELECT doc_id, CAST(width AS BIGINT) AS width,
           |  CAST(height AS BIGINT) AS height,
           |  CAST(greatest(width // 2, 48) AS BIGINT) AS out_width,
           |  CAST(greatest(height // 2, 48) AS BIGINT) AS out_height
           |FROM media ORDER BY doc_id""".stripMargin))
  )

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
