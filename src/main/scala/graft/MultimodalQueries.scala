package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal
import graft.ts.Round6

/** Driver-checked queries for the multimodal pipeline
  * ([[graft.pipeline.Multimodal]]): real PNG/WAV/video decode through
  * `javax.imageio` / `javax.sound.sampled`.
  *
  * Oracle: `tools/mm_oracle.py` — a JVM-free Python mirror of the
  * seeded-LCG payload content and the integer feature math (PNG and PCM
  * WAV are lossless, so decoded content is exactly predictable). It
  * emits pinned parquet the driver hash-compares, in the
  * `tools/hw_oracle.py` mold; regenerate with
  * `python3 tools/mm_oracle.py /root/testdata/sf0.01 tools/mm_oracle_out/sf0.01`.
  * The same script cross-checks the codecs themselves: it decodes
  * JVM-encoded fixtures with its own pure-Python PNG/WAV readers
  * (`tools/mm_fixtures/`, regenerate via `graft.pipeline.MediaFixtures`),
  * and MediaCodecsSpec decodes the oracle's Python-encoded fixtures. */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** The one scale factor with pinned oracle parquet checked in. */
  private val PinnedSf = "sf0.01"

  /** Resolved against the working directory (the repo root under the
    * driver and sbt), not a hardcoded checkout path. */
  private def pinnedDir: String =
    new java.io.File(s"tools/mm_oracle_out/$PinnedSf").getCanonicalPath

  private def pinned(q: String): String =
    s"SELECT * FROM read_parquet('$pinnedDir/$q.parquet') " + (q match {
      case "mm_frame_sample" => "ORDER BY doc_id, frame_idx"
      case q2 if q2.endsWith("_pairs") => "ORDER BY doc_a, doc_b"
      case _ => "ORDER BY doc_id"
    })

  /** Fail FAST on a dataset the pin does not cover — a different scale
    * factor would otherwise run fine on the Spark side and then
    * hash-mismatch against the wrong pinned parquet. */
  private def requirePinned(d: String): Unit = {
    val sf = new java.io.File(d).getName
    require(sf == PinnedSf,
      s"mm_* queries compare against pinned $PinnedSf oracle parquet " +
        s"($pinnedDir); got dataset '$sf'. Generate a pin with " +
        s"`python3 tools/mm_oracle.py $d tools/mm_oracle_out/$sf` and " +
        "update MultimodalQueries.PinnedSf.")
  }

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // binary payload → per-partition REAL decode → histogram features
    ("mm_features",
      ((s: SparkSession, d: String) => {
        requirePinned(d)
        val feats = Multimodal.extractFeatures(s,
          Multimodal.syntheticMedia(s, Tables.documents(s, d))).toDF()
        feats.select(col("doc_id"), col("media_type"),
          col("n_values").cast("long").as("n_values"),
          Round6.r6(col("brightness")).as("brightness"),
          Round6.r6(element_at(col("histogram"), 1)).as("h0"),
          Round6.r6(element_at(col("histogram"), 6)).as("h5"),
          Round6.r6(element_at(col("histogram"), 16)).as("h15"))
          .orderBy("doc_id")
      }): Q,
      Some(pinned("mm_features"))),

    // selective frame decode: every 4th frame of each video payload
    ("mm_frame_sample",
      ((s, d) => { requirePinned(d); Multimodal.sampleFrames(s,
        Multimodal.syntheticMedia(s, Tables.documents(s, d)), 4).toDF()
        .select(col("doc_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          Round6.r6(col("brightness")).as("brightness"))
        .orderBy("doc_id", "frame_idx") }): Q,
      Some(pinned("mm_frame_sample"))),

    // real 2x2 box-filter downscale of the image rows
    ("mm_resize",
      ((s, d) => { requirePinned(d); Multimodal.resizeImages(s,
        Multimodal.syntheticMedia(s, Tables.documents(s, d))).toDF()
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("out_width").cast("long").as("out_width"),
          col("out_height").cast("long").as("out_height"),
          Round6.r6(col("out_brightness")).as("out_brightness"))
        .orderBy("doc_id") }): Q,
      Some(pinned("mm_resize"))),

    // perceptual image hashes: decode → integer-exact 8×8 aHash over
    // the corpus images PLUS their planted perturbed twins (4 pixels
    // +16 each, re-encoded, id + 10^9) — the hash math itself pinned
    ("mm_phash",
      ((s, d) => { requirePinned(d)
        val media = Multimodal.syntheticMedia(s, Tables.documents(s, d))
        val twins = Multimodal.perturbImages(s, media, 4, 16, 1000000000L)
        Multimodal.imageHashes(s, media.union(twins)).toDF()
          .select(col("doc_id"), col("ahash")).orderBy("doc_id") }): Q,
      Some(pinned("mm_phash"))),

    // image near-dup pairs: byte-band candidates + bit_count verify at
    // Hamming ≤ 7 (exact recall by pigeonhole) — each image must pair
    // with its perturbed twin and nothing else (noise images sit ~32
    // bits apart)
    ("mm_phash_pairs",
      ((s, d) => { requirePinned(d)
        val media = Multimodal.syntheticMedia(s, Tables.documents(s, d))
        val twins = Multimodal.perturbImages(s, media, 4, 16, 1000000000L)
        Multimodal.imageHashPairs(
            Multimodal.imageHashes(s, media.union(twins)).toDF(), 7)
          .orderBy("doc_a", "doc_b") }): Q,
      Some(pinned("mm_phash_pairs"))),

    // audio envelope fingerprints over the corpus WAVs + perturbed
    // twins (first 4 intensities +16, re-encoded PCM)
    ("mm_afp",
      ((s, d) => { requirePinned(d)
        val media = Multimodal.syntheticMedia(s, Tables.documents(s, d))
        val twins = Multimodal.perturbAudio(s, media, 4, 16, 1000000000L)
        Multimodal.audioFingerprints(s, media.union(twins)).toDF()
          .select(col("doc_id"), col("afp")).orderBy("doc_id") }): Q,
      Some(pinned("mm_afp"))),

    // audio near-dup pairs: banded Hamming ≤ 7 over the envelope hash
    ("mm_afp_pairs",
      ((s, d) => { requirePinned(d)
        val media = Multimodal.syntheticMedia(s, Tables.documents(s, d))
        val twins = Multimodal.perturbAudio(s, media, 4, 16, 1000000000L)
        Multimodal.audioFpPairs(
            Multimodal.audioFingerprints(s, media.union(twins)).toDF(), 7)
          .orderBy("doc_a", "doc_b") }): Q,
      Some(pinned("mm_afp_pairs"))),

    // video near-dup pairs: ≥ 7 shared frame aHashes (frames are the
    // windows) — twins differ only in a perturbed frame 0
    ("mm_video_pairs",
      ((s, d) => { requirePinned(d)
        val media = Multimodal.syntheticMedia(s, Tables.documents(s, d))
        val twins = Multimodal.perturbVideos(s, media, 4, 16, 1000000000L)
        Multimodal.videoPairs(
            Multimodal.videoFrameHashes(s, media.union(twins)).toDF(), 7)
          .orderBy("doc_a", "doc_b") }): Q,
      Some(pinned("mm_video_pairs")))
  )

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
