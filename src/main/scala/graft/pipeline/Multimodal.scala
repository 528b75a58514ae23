package graft.pipeline

import scala.util.{Success, Try}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: image/audio/video as opaque `binary`
  * payloads + typed metadata, with decode / feature-extract / resize /
  * frame-sample stages running REAL codecs ([[MediaCodecs]]: PNG via
  * `javax.imageio`, 16-bit PCM WAV via `javax.sound.sampled`, a
  * length-prefixed frame container for video).
  *
  * Execution shape is the `mapInPandas` analogue: typed `mapPartitions`
  * so the decoder sees one iterator per partition — codec setup is
  * amortized across the batch and the corpus scan streams without
  * collecting. All stages are map-side: no decode stage introduces a
  * shuffle, so at 100 TB the cost is one pass over the blob column with
  * whatever parallelism the scan has.
  *
  * Correctness is cross-engine: payload CONTENT is a seeded LCG
  * ([[MediaCodecs.byteStream]]) mirrored byte-for-byte by
  * `tools/mm_oracle.py`, which predicts every decoded pixel/sample in
  * pure Python (PNG and PCM WAV are lossless). The oracle also encodes
  * fixtures with its own zlib/wave writers that [[MediaCodecs]] must
  * decode back to the same content (MediaCodecsSpec), so a channel-order
  * or sample-packing bug in either engine breaks the match.
  *
  * Reference scope: tgres has no media pipeline; this implements the
  * survey's training-data-curation extension (SURVEY.md §2, multimodal
  * columns).
  */
object Multimodal {

  /** One media row: payload is the opaque encoded blob, the rest is
    * typed metadata (as a real blob lake would carry alongside). */
  final case class MediaRow(doc_id: Long, media_type: String,
      payload: Array[Byte], width: Int, height: Int, n_frames: Int,
      sample_rate: Int, n_samples: Int)

  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_values: Int, brightness: Double, histogram: Array[Double])

  final case class FrameRow(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, brightness: Double)

  final case class ResizeRow(doc_id: Long, width: Int, height: Int,
      out_width: Int, out_height: Int, out_brightness: Double)

  /** Video frames are seeded per (doc, frame) so the oracle can predict
    * each frame independently; 100003 is prime so streams don't alias. */
  def frameSeed(docId: Long, frame: Int): Long =
    docId * 100003L + frame

  private val VideoSide = 32

  /** Deterministic synthetic media over the documents table, ENCODED
    * with the real codecs: doc_id % 3 picks image (grayscale PNG) /
    * audio (16-bit mono WAV) / video (GFV1 frame container of PNGs);
    * dimensions derive from doc_id; content is the seeded LCG stream.
    * Map-side generation — stands in for scanning a parquet lake with a
    * real blob column, which is what every downstream stage sees. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      (id % 3) match {
        case 1 => // audio
          val n = 2048 + (id % 7).toInt * 512
          val pcm = MediaCodecs.byteStream(id, n)
            .map(b => ((b - 128) * 256).toShort)
          MediaRow(id, "audio", MediaCodecs.encodeWav(16000, pcm),
            0, 0, 0, 16000, n)
        case 2 => // video
          val nf = 8 + (id % 5).toInt * 4
          val frames = (0 until nf).map { f =>
            MediaCodecs.encodePng(VideoSide, VideoSide,
              MediaCodecs.byteStream(frameSeed(id, f), VideoSide * VideoSide))
          }
          MediaRow(id, "video", MediaCodecs.encodeVideo(frames),
            VideoSide, VideoSide, nf, 0, 0)
        case _ => // image
          val w = 64 + (id % 4).toInt * 32
          val h = 64 + (id % 3).toInt * 32
          MediaRow(id, "image", MediaCodecs.encodePng(w, h,
            MediaCodecs.byteStream(id, w * h)), w, h, 0, 0, 0)
      }
    }
  }

  /** Normalize decoded content to 0..255 intensities: pixels directly;
    * audio via arithmetic-shift requantization (floor semantics match
    * Python's `>>`, so the oracle mirrors it exactly). */
  private def intensities(r: MediaRow): Array[Int] = r.media_type match {
    case "audio" =>
      MediaCodecs.decodeWav(r.payload)._2.map(s => (s >> 8) + 128)
    case "video" =>
      MediaCodecs.decodeVideoFrames(r.payload, _ => true)
        .flatMap(_._4).toArray
    case _ =>
      MediaCodecs.decodeImage(r.payload)._3
  }

  /** Feature extraction: per-partition batched REAL decode → 16-bin
    * intensity histogram (L1-normalized) + mean brightness. Undecodable
    * payloads are dropped (a poisoned blob must not kill a 100 TB job);
    * count them as `input - output` if a quarantine stream is needed. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        Try(intensities(r)) match {
          case Success(px) =>
            val hist = new Array[Double](16)
            var sum = 0L
            px.foreach { v => hist(v >> 4) += 1.0; sum += v }
            val n = math.max(px.length, 1)
            Some(MediaFeatures(r.doc_id, r.media_type, px.length,
              sum.toDouble / (255.0 * n), hist.map(_ / n)))
          case _ => None
        }
      }
    }
  }

  /** Frame sampling with SELECTIVE decode: every `stride`-th frame is
    * inflated, the rest are skipped by their length prefix — the I/O
    * analogue of predicate pushdown into the container format. A
    * corrupt/empty video yields zero rows rather than a job failure. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
      stride: Int): Dataset[FrameRow] = {
    require(stride > 0, "stride must be positive")
    import spark.implicits._
    media.filter(_.media_type == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        Try(MediaCodecs.decodeVideoFrames(r.payload, _ % stride == 0))
          .getOrElse(Seq.empty)
          .map { case (idx, w, h, px) =>
            FrameRow(r.doc_id, idx, w, h,
              px.map(_.toLong).sum.toDouble / (255.0 * math.max(px.length, 1)))
          }
      }
    }
  }

  /** Real 2x2 box-filter downscale of image rows (all synthetic image
    * dims are even; odd-dim images are passed through unchanged rather
    * than resampled wrong). Emits the resized brightness so correctness
    * of the pixel math is observable, not just the metadata. */
  def resizeImages(spark: SparkSession, media: Dataset[MediaRow]): Dataset[ResizeRow] = {
    import spark.implicits._
    media.filter(_.media_type == "image").mapPartitions { rows =>
      rows.flatMap { r =>
        Try {
          val (w, h, px) = MediaCodecs.decodeImage(r.payload)
          if (w % 2 == 0 && h % 2 == 0) {
            val (ow, oh, out) = MediaCodecs.resizeHalf(w, h, px)
            ResizeRow(r.doc_id, w, h, ow, oh,
              out.map(_.toLong).sum.toDouble / (255.0 * math.max(out.length, 1)))
          } else {
            ResizeRow(r.doc_id, w, h, w, h,
              px.map(_.toLong).sum.toDouble / (255.0 * math.max(px.length, 1)))
          }
        }.toOption
      }
    }
  }

  /** Metadata-only frame-index plan (no payload touched): which frames
    * WOULD be sampled. Useful for cost estimation / pushdown planning
    * before paying for any decode; `sampleFrames` is the decode stage. */
  def frameIndexPlan(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    media.filter(col("media_type") === "video" && col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
  }

  final case class ImageHash(doc_id: Long, ahash: Long)

  /** Perceptual image hashes: per-partition REAL decode → 64-bit aHash
    * ([[MediaCodecs.aHash64]] — integer-exact, oracle-mirrorable).
    * Map-side like every decode stage; undecodable payloads drop. */
  def imageHashes(spark: SparkSession, media: Dataset[MediaRow])
      : Dataset[ImageHash] = {
    import spark.implicits._
    media.filter(_.media_type == "image").mapPartitions { rows =>
      rows.flatMap { r =>
        Try {
          val (w, h, px) = MediaCodecs.decodeImage(r.payload)
          ImageHash(r.doc_id, MediaCodecs.aHash64(w, h, px))
        }.toOption
      }
    }
  }

  /** IMAGE near-dup pairs over [[imageHashes]] output — the visual twin
    * of text SimHash dedup, same plan shape as
    * [[NearDup.simhashPairs]]: 8 one-byte bands generate candidates
    * (equal byte j of the hash for any j), `bit_count` verifies
    * Hamming ≤ `maxDist`. For `maxDist ≤ 7` recall is EXACT by
    * pigeonhole (≤ 7 flipped bits cannot dirty all 8 bands), which is
    * what lets the oracle state the output as a plain brute-force
    * Hamming filter; larger `maxDist` keeps precision but may miss
    * pairs whose flips spread across every band. Corpus never
    * all-pairs: candidates are band-bucket joins on a near-uniform key
    * (noise images collide per band at ~2^-8). */
  def imageHashPairs(hashes: DataFrame, maxDist: Int): DataFrame =
    hammingPairs64(hashes, "ahash", maxDist)

  /** Shared band-join core of the 64-bit fingerprint dedups (image
    * aHash, audio envelope hash): 8 one-byte bands generate
    * candidates, `bit_count` verifies. See [[imageHashPairs]] for the
    * maxDist ≤ 7 exact-recall argument. */
  private def hammingPairs64(hashes: DataFrame, hashCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val bytes = hashes.select(col("doc_id"), col(hashCol),
      posexplode(array((0 until 8).map(j =>
        shiftright(col(hashCol), j * 8).bitwiseAND(lit(255L))): _*))
        .as(Seq("bix", "byte")))
    val a = bytes.select(col("bix"), col("byte"),
      col("doc_id").as("doc_a"), col(hashCol).as("hash_a"))
    val b = bytes.select(col("bix"), col("byte"),
      col("doc_id").as("doc_b"), col(hashCol).as("hash_b"))
    a.join(b, Seq("bix", "byte")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(hash_a ^ hash_b)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  final case class AudioFp(doc_id: Long, afp: Long)

  /** Audio fingerprints: decode WAV → the 0..255 intensity stream
    * ([[intensities]]' requantization, oracle-exact) → 64-window
    * envelope hash ([[MediaCodecs.eHash64]]). Map-side. */
  def audioFingerprints(spark: SparkSession, media: Dataset[MediaRow])
      : Dataset[AudioFp] = {
    import spark.implicits._
    media.filter(_.media_type == "audio").mapPartitions { rows =>
      rows.flatMap { r =>
        Try(AudioFp(r.doc_id, MediaCodecs.eHash64(intensities(r)))).toOption
      }
    }
  }

  /** AUDIO near-dup pairs — same banded shape as [[imageHashPairs]],
    * over the envelope hash. */
  def audioFpPairs(fps: DataFrame, maxDist: Int): DataFrame =
    hammingPairs64(fps, "afp", maxDist)

  /** Deterministic near-duplicate audio twins: bump the first
    * `nSamples` INTENSITIES by `delta` (mod 256) and re-encode the
    * PCM — the audio analogue of [[perturbImages]], lossless and
    * oracle-mirrorable because the intensity map is. */
  def perturbAudio(spark: SparkSession, media: Dataset[MediaRow],
      nSamples: Int, delta: Int, idOffset: Long): Dataset[MediaRow] = {
    import spark.implicits._
    media.filter(_.media_type == "audio").mapPartitions { rows =>
      rows.flatMap { r =>
        Try {
          val (rate, pcm) = MediaCodecs.decodeWav(r.payload)
          val out = pcm.clone()
          var i = 0
          while (i < math.min(nSamples, out.length)) {
            val v = (((out(i) >> 8) + 128 + delta) & 0xff) - 128
            out(i) = (v * 256).toShort
            i += 1
          }
          r.copy(doc_id = r.doc_id + idOffset,
            payload = MediaCodecs.encodeWav(rate, out))
        }.toOption
      }
    }
  }

  final case class FrameHash(doc_id: Long, frame_idx: Int, fhash: Long)

  /** Per-frame perceptual hashes of every video: the video's
    * fingerprint is its SET of frame aHashes. Map-side full decode. */
  def videoFrameHashes(spark: SparkSession, media: Dataset[MediaRow])
      : Dataset[FrameHash] = {
    import spark.implicits._
    media.filter(_.media_type == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        Try(MediaCodecs.decodeVideoFrames(r.payload, _ => true))
          .getOrElse(Seq.empty)
          .map { case (idx, w, h, px) =>
            FrameHash(r.doc_id, idx, MediaCodecs.aHash64(w, h, px)) }
      }
    }
  }

  /** VIDEO near-dup pairs: videos sharing ≥ `minShared` DISTINCT frame
    * hashes — the frame-grain analogue of
    * [[NearDup.windowFpPairs]]' shared-window rule (frames are the
    * windows). An edited/re-cut copy keeps most frames bit-identical
    * under aHash; unrelated noise videos share none. Inverted-index
    * join on the frame-hash key, count-distinct verification. */
  def videoPairs(frameHashes: DataFrame, minShared: Int): DataFrame = {
    require(minShared > 0, "minShared must be > 0")
    val fh = frameHashes.select(col("doc_id"), col("fhash")).distinct()
    fh.select(col("fhash"), col("doc_id").as("doc_a"))
      .join(fh.select(col("fhash"), col("doc_id").as("doc_b")), "fhash")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Deterministic near-duplicate video twins: perturb the first
    * `nPixels` of FRAME 0 by `delta`, re-encode every frame — one
    * changed frame out of nf, the re-encoded-clip shape. */
  def perturbVideos(spark: SparkSession, media: Dataset[MediaRow],
      nPixels: Int, delta: Int, idOffset: Long): Dataset[MediaRow] = {
    import spark.implicits._
    media.filter(_.media_type == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        Try {
          val frames = MediaCodecs.decodeVideoFrames(r.payload, _ => true)
          val encoded = frames.map { case (idx, w, h, px) =>
            val out = if (idx == 0) {
              val c = px.clone()
              var i = 0
              while (i < math.min(nPixels, c.length)) {
                c(i) = (c(i) + delta) & 0xff; i += 1
              }
              c
            } else px
            MediaCodecs.encodePng(w, h, out)
          }
          r.copy(doc_id = r.doc_id + idOffset,
            payload = MediaCodecs.encodeVideo(encoded))
        }.toOption
      }
    }
  }

  /** Deterministic NEAR-duplicate image twins: decode, bump the first
    * `nPixels` intensities by `delta` (mod 256), re-encode, re-id at
    * `doc_id + idOffset`. The planted-positive generator for
    * [[imageHashPairs]]' correctness row — a handful of changed pixels
    * moves only borderline aHash bits, exactly the perturbation a
    * re-encoded/watermarked web image shows. Map-side. */
  def perturbImages(spark: SparkSession, media: Dataset[MediaRow],
      nPixels: Int, delta: Int, idOffset: Long): Dataset[MediaRow] = {
    import spark.implicits._
    media.filter(_.media_type == "image").mapPartitions { rows =>
      rows.flatMap { r =>
        Try {
          val (w, h, px) = MediaCodecs.decodeImage(r.payload)
          val out = px.clone()
          var i = 0
          while (i < math.min(nPixels, out.length)) {
            out(i) = (out(i) + delta) & 0xff; i += 1
          }
          r.copy(doc_id = r.doc_id + idOffset,
            payload = MediaCodecs.encodePng(w, h, out))
        }.toOption
      }
    }
  }
}
