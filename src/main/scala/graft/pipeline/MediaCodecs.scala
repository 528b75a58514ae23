package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real JDK media codecs for the multimodal pipeline: 8-bit grayscale
  * PNG via `javax.imageio`, 16-bit mono PCM WAV via
  * `javax.sound.sampled`, and a trivial length-prefixed frame container
  * for "video" payloads. All are headless and dependency-free — the
  * codecs every stock JVM executor ships.
  *
  * Content determinism: [[byteStream]] is the shared pseudo-content
  * generator — the same 64-bit LCG is implemented in
  * `tools/mm_oracle.py`, so a Python oracle can predict the decoded
  * content of every synthetic payload without sharing any code with the
  * JVM side. A feature mismatch therefore catches real codec bugs
  * (wrong color space, channel order, sample packing), not just
  * plumbing bugs.
  */
object MediaCodecs {

  // no temp-file ImageIO cache on executors — pure in-memory streams
  ImageIO.setUseCache(false)

  /** Deterministic byte stream (values 0..255): Knuth MMIX LCG, upper
    * bits. Mirrored byte-for-byte by `byte_stream` in
    * `tools/mm_oracle.py`. */
  def byteStream(seed: Long, n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var x = seed
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = ((x >>> 33) & 0xffL).toInt
      i += 1
    }
    out
  }

  // ======================= PNG (grayscale 8-bit) =======================

  def encodePng(width: Int, height: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == width * height,
      s"pixel count ${px.length} != ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, px(i)); i += 1; x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode any ImageIO-supported image (PNG/BMP/GIF/JPEG) to
    * `(width, height, luminance 0..255)`. Single-band images read
    * their band directly; RGB reduces via integer BT.601 luminance. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](w * h)
    val raster = img.getRaster
    if (raster.getNumBands == 1) {
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(i) = raster.getSample(x, y, 0); i += 1; x += 1 }
        y += 1
      }
    } else {
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          out(i) = (299 * r + 587 * g + 114 * b) / 1000
          i += 1; x += 1
        }
        y += 1
      }
    }
    (w, h, out)
  }

  /** One 2x2 box-filter halving (floor average). Even dimensions only —
    * the exact inverse-scale case; callers gate on that. */
  def resizeHalf(w: Int, h: Int, px: Array[Int]): (Int, Int, Array[Int]) = {
    require(w % 2 == 0 && h % 2 == 0, s"resizeHalf needs even dims, got ${w}x$h")
    val ow = w / 2
    val oh = h / 2
    val out = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val r0 = 2 * y * w + 2 * x
        val r1 = r0 + w
        out(y * ow + x) = (px(r0) + px(r0 + 1) + px(r1) + px(r1 + 1)) / 4
        x += 1
      }
      y += 1
    }
    (ow, oh, out)
  }

  /** 64-bit average-hash (aHash) of a grayscale image: the 8×8 grid of
    * cell means, each bit set iff its cell's mean ≥ the global mean.
    * ALL-INTEGER comparison (`cell_sum · w·h ≥ total · cell_px`), so a
    * pure-Python oracle reproduces every bit exactly; cell boundaries
    * are the floor partition `c·dim/8`, any dimensions ≥ 8. Bit i =
    * row-major cell `(i/8, i%8)`. The standard perceptual-dedup
    * primitive: near-identical images differ in a few borderline bits,
    * unrelated images land ~32 apart. */
  def aHash64(w: Int, h: Int, px: Array[Int]): Long = {
    require(w >= 8 && h >= 8, s"aHash64 needs dims >= 8, got ${w}x$h")
    var total = 0L
    var i = 0
    while (i < px.length) { total += px(i); i += 1 }
    val wh = w.toLong * h
    var hash = 0L
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
      var cx = 0
      while (cx < 8) {
        val x0 = cx * w / 8; val x1 = (cx + 1) * w / 8
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += px(y * w + x); x += 1 }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        if (s * wh >= total * n) hash |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    hash
  }

  /** 64-bit ENVELOPE hash of a 1-D intensity stream — [[aHash64]]'s
    * audio sibling: 64 floor-partition windows, bit i set iff window
    * i's mean ≥ the global mean (all-integer comparison, ties set).
    * Needs ≥ 64 values. */
  def eHash64(vals: Array[Int]): Long = {
    val n = vals.length
    require(n >= 64, s"eHash64 needs >= 64 values, got $n")
    var total = 0L
    var i = 0
    while (i < n) { total += vals(i); i += 1 }
    var hash = 0L
    var w = 0
    while (w < 64) {
      val i0 = w * n / 64; val i1 = (w + 1) * n / 64
      var s = 0L
      var j = i0
      while (j < i1) { s += vals(j); j += 1 }
      if (s * n >= total * (i1 - i0)) hash |= 1L << w
      w += 1
    }
    hash
  }

  // ==================== WAV (16-bit mono PCM, LE) =====================

  def encodeWav(sampleRate: Int, pcm: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](pcm.length * 2)
    var i = 0
    while (i < pcm.length) {
      bytes(2 * i) = (pcm(i) & 0xff).toByte
      bytes(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, pcm.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload to `(sampleRate, 16-bit samples)`. Accepts
    * only the 16-bit mono little-endian PCM profile the pipeline
    * writes; anything else fails loudly rather than mis-sampling. */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian && fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED,
        s"unsupported WAV profile: $fmt")
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        out(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
        i += 1
      }
      (fmt.getSampleRate.toInt, out)
    } finally ais.close()
  }

  // ============ frame container ("video": concatenated PNGs) ==========
  // Layout: magic "GFV1" | int32 frameCount | frameCount x (int32 len |
  // PNG bytes). Length prefixes make SELECTIVE decode possible: frame
  // sampling skips unwanted frames without inflating them.

  private val VideoMagic = Array[Byte]('G', 'F', 'V', '1')

  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.write(VideoMagic)
    out.writeInt(frames.size)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  def videoFrameCount(bytes: Array[Byte]): Int = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(magic.sameElements(VideoMagic), "not a GFV1 video payload")
    in.readInt()
  }

  /** Decode only the frames whose index satisfies `wanted`; others are
    * skipped by their length prefix (no decompression). Returns
    * `(frameIdx, width, height, pixels)` in index order. */
  def decodeVideoFrames(bytes: Array[Byte],
      wanted: Int => Boolean): Seq[(Int, Int, Int, Array[Int])] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(magic.sameElements(VideoMagic), "not a GFV1 video payload")
    val n = in.readInt()
    (0 until n).flatMap { i =>
      val len = in.readInt()
      if (wanted(i)) {
        val buf = new Array[Byte](len)
        in.readFully(buf)
        val (w, h, px) = decodeImage(buf)
        Some((i, w, h, px))
      } else {
        in.skipNBytes(len.toLong)
        None
      }
    }
  }
}
