package graft.pipeline

import java.nio.file.{Files, Paths}

/** Dumps JVM-encoded media fixtures for the cross-engine codec check:
  * `tools/mm_oracle.py` re-decodes these bytes with its own pure-Python
  * PNG/WAV readers and asserts the seeded-LCG content, so a bug in the
  * JVM ENCODE path (channel order, sample packing, row stride) is
  * caught by an implementation that shares no code with it. The reverse
  * direction (Python-encoded fixtures → JVM decode) lives in
  * MediaCodecsSpec.
  *
  * Usage: `runMain graft.pipeline.MediaFixtures <outDir>`; commit the
  * output under `tools/mm_fixtures/`.
  */
object MediaFixtures {

  /** (name, seed, params) for each fixture; mirrored in mm_oracle.py. */
  val PngW = 8;  val PngH = 6;  val PngSeed = 42L
  val WavN = 256; val WavRate = 16000; val WavSeed = 43L
  val VidFrames = 3; val VidSide = 4; val VidDoc = 7L

  def main(args: Array[String]): Unit = {
    val dir = Paths.get(if (args.nonEmpty) args(0) else "tools/mm_fixtures")
    Files.createDirectories(dir)

    Files.write(dir.resolve("jvm_gray.png"), MediaCodecs.encodePng(
      PngW, PngH, MediaCodecs.byteStream(PngSeed, PngW * PngH)))

    val pcm = MediaCodecs.byteStream(WavSeed, WavN)
      .map(b => ((b - 128) * 256).toShort)
    Files.write(dir.resolve("jvm_pcm.wav"), MediaCodecs.encodeWav(WavRate, pcm))

    val frames = (0 until VidFrames).map { f =>
      MediaCodecs.encodePng(VidSide, VidSide,
        MediaCodecs.byteStream(Multimodal.frameSeed(VidDoc, f), VidSide * VidSide))
    }
    Files.write(dir.resolve("jvm_frames.gfv"), MediaCodecs.encodeVideo(frames))

    println(s"wrote 3 fixtures to $dir")
  }
}
