package graft.pipeline

/** A pluggable media decoder for the multimodal operators: the seam
  * where a real codec (javax.imageio, a JNI ffmpeg binding, …) plugs
  * into the Spark-side plumbing without touching it.
  *
  * Contract:
  *  - implementations are constructed on the EXECUTOR, once per
  *    partition, via a `() => MediaDecoder` factory — the mapInPandas
  *    batch shape: expensive codec setup is amortized over the
  *    partition's rows, and non-serializable native handles never
  *    cross the driver/executor boundary (only the factory closure
  *    does);
  *  - `meta` returns (width, height, frames, perceptual-hash) for one
  *    payload; `frameHash` fingerprints one sampled frame.
  *
  * The default [[ImageIoDecoder]] is a REAL image codec: the JDK ships
  * PNG/BMP/GIF readers in `javax.imageio`, so decode needs zero external
  * dependencies. [[StubDecoder]] remains as the no-codec fallback and
  * the seam's original contract witness.
  */
trait MediaDecoder {
  def meta(bytes: Array[Byte]): MediaDecoder.Meta
  def frameHash(bytes: Array[Byte], frame: Int): String
}

object MediaDecoder {
  case class Meta(width: Int, height: Int, frames: Int, phash: String)

  /** The default factory: real javax.imageio decode. */
  val imageio: () => MediaDecoder = () => new ImageIoDecoder

  /** Deterministic no-codec stub (kept for the pluggability contract). */
  val stub: () => MediaDecoder = () => new StubDecoder
}

/** Real image decoder over the JDK's `javax.imageio` codecs (PNG, BMP,
  * GIF — no external dependencies). Interprets the image as a filmstrip
  * of [[MediaGen.FrameH]]-row frames (the flat video-as-image layout).
  *
  * Determinism: PNG is lossless, so decoded pixels are bit-identical on
  * every JVM regardless of encoder layout; the perceptual hash and frame
  * hashes are integer arithmetic over those exact pixels.
  *
  * One decode per payload, not per call: `meta` and the per-frame
  * `frameHash` calls for the same row arrive sequentially within a
  * partition, so an identity cache on the payload reference amortizes
  * the decode across the row's frame expansion.
  */
final class ImageIoDecoder extends MediaDecoder {
  private var lastBytes: Array[Byte] = _
  private var lastImg: java.awt.image.BufferedImage = _
  private val md = java.security.MessageDigest.getInstance("MD5")

  private def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    if (lastImg == null || (bytes ne lastBytes)) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"payload is not a decodable image (${bytes.length} bytes)")
      lastBytes = bytes
      lastImg = img
    }
    lastImg
  }

  override def meta(bytes: Array[Byte]): MediaDecoder.Meta = {
    val img = decode(bytes)
    val frames = math.max(1, img.getHeight / MediaGen.FrameH)
    MediaDecoder.Meta(img.getWidth, img.getHeight, frames, averageHash(img))
  }

  /** 8×8 average-luma perceptual hash: bit b set iff cell b's mean luma
    * exceeds the image mean. Long-exact sums; the two means are compared
    * as exact-long ratios lowered to double (deterministic IEEE ops).
    */
  private def averageHash(img: java.awt.image.BufferedImage): String = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = ((rgb >> 16) & 0xFF) * 299L + ((rgb >> 8) & 0xFF) * 587L + (rgb & 0xFF) * 114L
        val c = cy * 8 + x * 8 / w
        sums(c) += luma
        cnts(c) += 1
        x += 1
      }
      y += 1
    }
    var totalSum = 0L
    var totalCnt = 0L
    var i = 0
    while (i < 64) { totalSum += sums(i); totalCnt += cnts(i); i += 1 }
    val mean = totalSum.toDouble / totalCnt
    var bits = 0L
    i = 0
    while (i < 64) {
      if (cnts(i) > 0 && sums(i).toDouble / cnts(i) > mean) bits |= 1L << i
      i += 1
    }
    f"$bits%016x"
  }

  /** MD5 over the exact ARGB ints of the frame's pixel rows
    * ([frame·FrameH, (frame+1)·FrameH), clipped to the image).
    */
  override def frameHash(bytes: Array[Byte], frame: Int): String = {
    val img = decode(bytes)
    val w = img.getWidth
    val y0 = math.min(math.max(0, frame) * MediaGen.FrameH, img.getHeight)
    val y1 = math.min(y0 + MediaGen.FrameH, img.getHeight)
    md.reset()
    val row = java.nio.ByteBuffer.allocate(4 * w)
    var y = y0
    while (y < y1) {
      row.clear()
      var x = 0
      while (x < w) { row.putInt(img.getRGB(x, y)); x += 1 }
      md.update(row.array(), 0, 4 * w)
      y += 1
    }
    md.digest().map("%02x".format(_)).mkString
  }
}

/** Real audio decoder over the JDK's `javax.sound.sampled` (WAV/AIFF/AU
  * — no external dependencies): parses the container header into format
  * metadata and decodes the PCM stream to 16-bit samples. Same executor
  * contract as [[MediaDecoder]]: construct once per partition via the
  * `() => WavDecoder` factory; decode is one pass per payload.
  */
final class WavDecoder {
  /** (sample rate Hz, decoded 16-bit samples). */
  def read(bytes: Array[Byte]): (Int, Array[Short]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val f = ais.getFormat
      require(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
        s"expected PCM16LE mono, got $f")
      val raw = ais.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(raw)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Short](raw.length / 2)
      var i = 0
      while (i < out.length) { out(i) = bb.getShort(); i += 1 }
      (f.getSampleRate.toInt, out)
    } finally ais.close()
  }
}

object WavDecoder {
  val javasound: () => WavDecoder = () => new WavDecoder
}

/** Deterministic fake decoder — byte-content-derived metadata. Swap via
  * the factory parameter on the Multimodal operators when a real codec
  * is on the classpath.
  */
final class StubDecoder extends MediaDecoder {
  // one digest instance per decoder (= per partition), reset per call —
  // the same amortization a real codec context would want
  private val md = java.security.MessageDigest.getInstance("MD5")

  override def meta(bytes: Array[Byte]): MediaDecoder.Meta = {
    md.reset()
    val hash = md.digest(bytes).map("%02x".format(_)).mkString
    val n = bytes.length
    MediaDecoder.Meta(n % 640 + 1, (n * 7) % 480 + 1, n % 24 + 1, hash)
  }

  override def frameHash(bytes: Array[Byte], frame: Int): String = {
    md.reset()
    val off = frame % math.max(1, bytes.length)
    md.update(bytes, off, math.min(16, bytes.length - off))
    md.digest().map("%02x".format(_)).mkString
  }
}
