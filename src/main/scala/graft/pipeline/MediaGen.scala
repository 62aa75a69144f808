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
}
