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
  * The default [[StubDecoder]] is a deterministic fake (this container
  * ships no codec libraries): metadata derived from the byte content
  * only, so results are stable across partitionings and engines.
  */
trait MediaDecoder {
  def meta(bytes: Array[Byte]): MediaDecoder.Meta
  def frameHash(bytes: Array[Byte], frame: Int): String
}

object MediaDecoder {
  case class Meta(width: Int, height: Int, frames: Int, phash: String)

  /** The default factory: deterministic stub. */
  val stub: () => MediaDecoder = () => new StubDecoder
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
