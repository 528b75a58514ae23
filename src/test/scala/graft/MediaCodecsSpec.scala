package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.{MediaCodecs, MediaFixtures, Multimodal}

/** Real-codec invariants: JVM round-trips, cross-engine decode of the
  * PYTHON-encoded fixtures (written by `tools/mm_oracle.py` with its own
  * zlib/wave writers — no shared code with `javax.imageio`), selective
  * video decode, and the failure containment the 100 TB path needs
  * (corrupt payloads drop, never kill the job). */
class MediaCodecsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private def spark: SparkSession = spark0

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[4]").appName("media-codecs-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark0 != null) spark0.stop()

  private val fixDir = Paths.get("tools/mm_fixtures")

  test("PNG round-trip: encode → decode is the identity on content") {
    val px = MediaCodecs.byteStream(11L, 96 * 64)
    val bytes = MediaCodecs.encodePng(96, 64, px)
    val (w, h, out) = MediaCodecs.decodeImage(bytes)
    assert((w, h) === (96, 64))
    assert(out.toSeq === px.toSeq)
  }

  test("WAV round-trip: 16-bit mono PCM is lossless") {
    val pcm = MediaCodecs.byteStream(12L, 500).map(b => ((b - 128) * 256).toShort)
    val (rate, out) = MediaCodecs.decodeWav(MediaCodecs.encodeWav(16000, pcm))
    assert(rate === 16000)
    assert(out.toSeq === pcm.toSeq)
  }

  test("cross-engine: Python-encoded PNG fixture decodes to the LCG content") {
    val p = fixDir.resolve("py_gray.png")
    assume(Files.exists(p), "python fixtures not generated")
    val (w, h, px) = MediaCodecs.decodeImage(Files.readAllBytes(p))
    assert((w, h) === (MediaFixtures.PngW, MediaFixtures.PngH))
    assert(px.toSeq ===
      MediaCodecs.byteStream(MediaFixtures.PngSeed, w * h).toSeq)
  }

  test("cross-engine: Python-encoded WAV fixture decodes to the LCG content") {
    val p = fixDir.resolve("py_pcm.wav")
    assume(Files.exists(p), "python fixtures not generated")
    val (rate, pcm) = MediaCodecs.decodeWav(Files.readAllBytes(p))
    assert(rate === MediaFixtures.WavRate)
    assert(pcm.toSeq === MediaCodecs.byteStream(MediaFixtures.WavSeed,
      MediaFixtures.WavN).map(b => ((b - 128) * 256).toShort).toSeq)
  }

  test("video container: selective decode skips unwanted frames by prefix") {
    val frames = (0 until 5).map(f =>
      MediaCodecs.encodePng(4, 4, MediaCodecs.byteStream(100L + f, 16)))
    val vid = MediaCodecs.encodeVideo(frames)
    assert(MediaCodecs.videoFrameCount(vid) === 5)
    val got = MediaCodecs.decodeVideoFrames(vid, i => i % 2 == 0)
    assert(got.map(_._1) === Seq(0, 2, 4))
    got.foreach { case (i, w, h, px) =>
      assert((w, h) === (4, 4))
      assert(px.toSeq === MediaCodecs.byteStream(100L + i, 16).toSeq)
    }
  }

  test("resizeHalf: 2x2 box filter floors the average") {
    // 4x2 image: blocks (0,1,4,5)=10,11,14,15 → 12; (2,3,6,7) → 50
    val px = Array(10, 11, 48, 49, 14, 15, 52, 53)
    val (ow, oh, out) = MediaCodecs.resizeHalf(4, 2, px)
    assert((ow, oh) === (2, 1))
    assert(out.toSeq === Seq(12, 50))
    intercept[IllegalArgumentException](MediaCodecs.resizeHalf(3, 2, px))
  }

  test("extractFeatures: real decode; corrupt payloads drop, not crash") {
    val s = spark; import s.implicits._
    val good = Multimodal.MediaRow(1L, "image",
      MediaCodecs.encodePng(16, 16, Array.fill(256)(32)), 16, 16, 0, 0, 0)
    val bad = Multimodal.MediaRow(2L, "image",
      Array[Byte](1, 2, 3, 4), 16, 16, 0, 0, 0)
    val out = Multimodal.extractFeatures(spark,
      Seq(good, bad).toDS()).collect()
    assert(out.length === 1)
    assert(out.head.doc_id === 1L)
    assert(out.head.n_values === 256)
    assert(math.abs(out.head.brightness - 32.0 / 255.0) < 1e-12)
    assert(out.head.histogram(2) === 1.0) // all pixels in bin 32>>4
  }

  test("sampleFrames + resizeImages agree with direct codec math") {
    val s = spark
    val media = Multimodal.syntheticMedia(spark,
      s.range(0, 9).toDF().withColumnRenamed("id", "doc_id"))
    val frames = Multimodal.sampleFrames(spark, media, 4).collect()
    // doc 2,5,8 are video with nf = 8+(id%5)*4 → 16, 8, 20
    assert(frames.map(f => (f.doc_id, f.frame_idx)).sorted.toSeq ===
      Seq((2L, 0), (2L, 4), (2L, 8), (2L, 12),
        (5L, 0), (5L, 4),
        (8L, 0), (8L, 4), (8L, 8), (8L, 12), (8L, 16)))
    val oneFrame = MediaCodecs.byteStream(Multimodal.frameSeed(2L, 4), 1024)
    val want = oneFrame.map(_.toLong).sum.toDouble / (255.0 * 1024)
    val got = frames.find(f => f.doc_id == 2L && f.frame_idx == 4).get
    assert(math.abs(got.brightness - want) < 1e-15)

    val rs = Multimodal.resizeImages(spark, media).collect()
    assert(rs.map(_.doc_id).sorted.toSeq === Seq(0L, 3L, 6L))
    val r0 = rs.find(_.doc_id == 0L).get
    assert((r0.width, r0.height, r0.out_width, r0.out_height) === (64, 64, 32, 32))
  }

  test("aHash64: hand-computed split image, ties set, locality under perturbation") {
    // left half 0, right half 255: each row's cells 4..7 set → 0xF0 per
    // row byte
    val split = Array.tabulate(64 * 64)(i => if (i % 64 < 32) 0 else 255)
    assert(MediaCodecs.aHash64(64, 64, split) === 0xF0F0F0F0F0F0F0F0L)
    // uniform image: every cell mean EQUALS the global mean, ties set →
    // all 64 bits
    assert(MediaCodecs.aHash64(64, 64, Array.fill(64 * 64)(7)) === -1L)
    // perturbing a few pixels of a noise image moves only borderline
    // bits: Hamming distance stays far under the unrelated ~32
    val noise = MediaCodecs.byteStream(99L, 96 * 64)
    val tweaked = noise.clone(); (0 until 4).foreach(i =>
      tweaked(i) = (tweaked(i) + 16) & 0xff)
    val d = java.lang.Long.bitCount(
      MediaCodecs.aHash64(96, 64, noise) ^ MediaCodecs.aHash64(96, 64, tweaked))
    assert(d <= 7, s"perturbation moved $d bits")
    // unrelated noise images really do sit far apart
    val other = MediaCodecs.byteStream(100L, 96 * 64)
    val far = java.lang.Long.bitCount(
      MediaCodecs.aHash64(96, 64, noise) ^ MediaCodecs.aHash64(96, 64, other))
    assert(far > 7, s"unrelated images only $far bits apart")
  }

  test("imageHashPairs: planted twins pair up, banded recall exact at maxDist 7") {
    val s = spark
    val media = Multimodal.syntheticMedia(spark,
      s.range(0, 30).toDF().withColumnRenamed("id", "doc_id"))
    val twins = Multimodal.perturbImages(spark, media, 4, 16, 1000L)
    val hashes = Multimodal.imageHashes(spark, media.union(twins)).toDF()
    val pairs = Multimodal.imageHashPairs(hashes, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // image docs are 0,3,..,27: every one must meet exactly its twin
    val want = (0L until 30L by 3).map(i => (i, i + 1000L)).toSet
    assert(pairs === want)
  }

  test("eHash64: hand-computed ramp; audio twins pair; video twins share frames") {
    // ramp 0..63 with 64 windows of one value each: bits set exactly
    // where value >= mean 31.5, i.e. the top 32 windows
    val ramp = Array.tabulate(64)(identity)
    assert(MediaCodecs.eHash64(ramp) === 0xFFFFFFFF00000000L)
    val s = spark
    val media = Multimodal.syntheticMedia(spark,
      s.range(0, 30).toDF().withColumnRenamed("id", "doc_id"))
    // audio docs are 1,4,..,28: each pairs with exactly its twin
    val aTwins = Multimodal.perturbAudio(spark, media, 4, 16, 1000L)
    val aPairs = Multimodal.audioFpPairs(
        Multimodal.audioFingerprints(spark, media.union(aTwins)).toDF(), 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(aPairs === (1L until 30L by 3).map(i => (i, i + 1000L)).toSet)
    // video docs are 2,5,..,29 (nf >= 8): a twin differs only in frame
    // 0, so every pair shares >= nf-1 >= 7 frame hashes
    val vTwins = Multimodal.perturbVideos(spark, media, 4, 16, 1000L)
    val vPairs = Multimodal.videoPairs(
        Multimodal.videoFrameHashes(spark, media.union(vTwins)).toDF(), 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(vPairs === (2L until 30L by 3).map(i => (i, i + 1000L)).toSet)
  }
}
