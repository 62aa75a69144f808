package graft.pipeline

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Deterministic real-PNG payload generator for the multimodal
  * operators. The testdata tables carry no binary media column, so the
  * pipeline synthesizes one ON THE EXECUTORS from the documents table:
  * each doc gets a real PNG "filmstrip" (javax.imageio encode — the JDK
  * ships the codec, zero external dependencies) whose width and frame
  * count are arithmetic in doc_id. That arithmetic is the point: it
  * makes the DECODE path oracle-checkable — DuckDB recomputes the
  * expected dimensions from doc_id, and a hash match on mm_decode_dims
  * proves the executor-side ImageIO decode returned exactly them.
  *
  * Filmstrip layout (the flat-file video-as-image shape frame samplers
  * consume): frame f occupies pixel rows [f·FrameH, (f+1)·FrameH);
  * total height = FrameH · frames.
  *
  * Pixel content is a deterministic function of (x, y, docId), so every
  * decode-derived value (phash, frame hashes, luma features) is stable
  * across partitionings, JVMs, and encoders — PNG is lossless, so the
  * decoded pixels are bit-identical regardless of how the encoder laid
  * out the file.
  */
object MediaGen {
  /** Pixel rows per filmstrip frame. */
  val FrameH = 8

  // Global JVM toggle, set ONCE per JVM (object init runs on each
  // executor at first use) — not inside the per-row hot path.
  ImageIO.setUseCache(false)

  // floorMod, not %: a negative docId must still yield positive dims
  // (the DuckDB oracle mirrors this as ((doc_id % m) + m) % m)
  def widthOf(docId: Long): Int = 16 + Math.floorMod(docId, 17L).toInt // 16..32
  def framesOf(docId: Long): Int = 1 + Math.floorMod(docId, 12L).toInt // 1..12
  def heightOf(docId: Long): Int = FrameH * framesOf(docId) // 8..96

  /** A real PNG with deterministic pixel content seeded by docId. */
  def pngPayload(docId: Long): Array[Byte] = {
    val w = widthOf(docId)
    val h = heightOf(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 31 + y * 17 + docId * 131) & 0xFFL).toInt
        val g = (((x ^ y) * 53 + docId * 7) & 0xFFL).toInt
        val b = ((x.toLong * y + docId) & 0xFFL).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ---- audio: 16-bit PCM mono WAV (javax.sound-decodable) ---------------
  // Same design as the filmstrip: rate/length/samples are arithmetic in
  // doc_id, so the DECODED stream is oracle-checkable — DuckDB recomputes
  // the expected PCM values and a hash match on the decode-derived
  // features proves the executor-side javax.sound decode returned
  // exactly the generated waveform.

  val SampleRates: Array[Int] = Array(8000, 16000, 22050)

  def rateOf(docId: Long): Int = SampleRates(Math.floorMod(docId, 3L).toInt)

  /** 256..704 samples — size-bounded like the filmstrip frames. */
  def nSamplesOf(docId: Long): Int = 256 + 64 * Math.floorMod(docId, 8L).toInt

  /** Sample i: a doc-seeded sawtooth in exact integer arithmetic,
    * scaled to the full 16-bit range (±2048·16 = ±32768 exactly).
    */
  def sampleOf(docId: Long, i: Int): Short = {
    val k = 31L + Math.floorMod(docId, 13L)
    ((Math.floorMod(i * k + docId * 7L, 4096L) - 2048L) * 16L).toShort
  }

  /** A real RIFF/WAVE file (canonical 44-byte header + PCM16LE data). */
  def wavPayload(docId: Long): Array[Byte] = {
    val rate = rateOf(docId)
    val n = nSamplesOf(docId)
    val dataLen = 2 * n
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { buf.putShort(sampleOf(docId, i)); i += 1 }
    buf.array()
  }
}
