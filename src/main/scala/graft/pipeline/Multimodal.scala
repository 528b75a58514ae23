package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads + typed metadata, with decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side machinery is real — binary columns, metadata structs,
  * per-partition batched processing through typed `mapPartitions` (the
  * Scala analogue of `mapInPandas`: one iterator per partition, so a
  * decoder amortizes model/codec setup across the batch and the corpus
  * scan streams without collecting). The DECODER ITSELF IS A STUB
  * ([[decodeStub]]): no image/audio codecs exist in this environment, so
  * it derives deterministic pseudo-pixels from the payload bytes; swap
  * the marked function for a real codec in production. Everything
  * downstream of the stub (schema, batching, partitioning, feature
  * math) is production-shaped and oracle-checked.
  */
object Multimodal {

  /** One media row: payload is the opaque blob, metadata is typed. */
  final case class MediaRow(doc_id: Long, media_type: String,
      payload: Array[Byte], width: Int, height: Int, n_frames: Int,
      sample_rate: Int)

  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Int, brightness: Double, histogram: Array[Double])

  /** Deterministic synthetic media over the documents table: payload =
    * unhex(md5(doc_id) · 4) (64 bytes), media type and dimensions derived
    * from doc_id. Stands in for a parquet lake with real blob columns —
    * the plumbing downstream is identical. */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val h = md5(col("doc_id").cast("string"))
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      unhex(concat(h, h, h, h)).as("payload"),
      (lit(64) + pmod(col("doc_id"), lit(4)).cast("int") * 32).as("width"),
      (lit(64) + pmod(col("doc_id"), lit(3)).cast("int") * 32).as("height"),
      (lit(8) + pmod(col("doc_id"), lit(5)).cast("int") * 4).as("n_frames"),
      lit(16000).as("sample_rate"))
  }

  /** ======= STUB — replace with a real codec in production =======
    * "Decodes" a payload by treating its bytes as pixels: deterministic,
    * fast, and shape-compatible with a real decoder's output. */
  def decodeStub(payload: Array[Byte]): Array[Int] =
    payload.map(b => b & 0xff)
  // ======= end STUB =======

  /** Feature extraction over the media frame: per-partition batched
    * decode → 16-bin intensity histogram (L1-normalized) + mean
    * brightness. This is the `mapInPandas` shape: the lambda sees the
    * whole partition iterator, not row-at-a-time. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload", "width", "height",
        "n_frames", "sample_rate")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup would open the codec once, here: nothing
        rows.map { r =>
          val px = decodeStub(r.payload)
          val hist = new Array[Double](16)
          var sum = 0L
          px.foreach { v => hist(v >> 4) += 1.0; sum += v }
          val n = math.max(px.length, 1)
          MediaFeatures(r.doc_id, r.media_type, r.payload.length,
            sum.toDouble / (255.0 * n), hist.map(_ / n))
        }
      }
  }

  /** Resize plan: metadata-only transform (the real pixel work happens
    * in the decode stage); halves dimensions, floors at `minSide`. */
  def resizePlan(media: DataFrame, minSide: Int): DataFrame =
    media.withColumn("out_width", greatest(expr("width div 2"), lit(minSide)))
      .withColumn("out_height", greatest(expr("height div 2"), lit(minSide)))

  /** Frame sampling for video rows: every `stride`-th frame index,
    * exploded to one row per sampled frame. A corrupt/empty video
    * (n_frames ≤ 0) yields zero frames rather than an illegal-sequence
    * error killing the job. */
  def frameSample(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    media.filter(col("media_type") === "video" && col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
  }

  // ---- DuckDB oracle builders: recompute the feature math from the
  // ---- hex construction (no blob indexing needed — same bytes) ----

  /** CTE `media(doc_id, media_type, hex, n_bytes, width, height,
    * n_frames)` mirroring [[syntheticMedia]]. */
  def mediaSql: String =
    """media AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |    repeat(md5(CAST(doc_id AS VARCHAR)), 4) AS hex,
      |    64 AS n_bytes,
      |    64 + CAST(doc_id % 4 AS INT) * 32 AS width,
      |    64 + CAST(doc_id % 3 AS INT) * 32 AS height,
      |    8 + CAST(doc_id % 5 AS INT) * 4 AS n_frames
      |  FROM documents
      |)""".stripMargin

  /** `bytes` = payload byte values decoded from the hex string. */
  private val bytesExpr =
    "[CAST('0x' || substr(hex, 2 * i - 1, 2) AS INT) for i in generate_series(1, len(hex) // 2)]"

  def featuresSql: String =
    s"""feats AS (
       |  SELECT doc_id, media_type, n_bytes,
       |    list_sum([CAST(b AS DOUBLE) for b in bs]) / (255.0 * len(bs)) AS brightness,
       |    [CAST(len(list_filter(bs, b -> (b // 16) = k)) AS DOUBLE) / len(bs)
       |     for k in generate_series(0, 15)] AS histogram
       |  FROM (SELECT doc_id, media_type, n_bytes, $bytesExpr AS bs FROM media)
       |)""".stripMargin
}
