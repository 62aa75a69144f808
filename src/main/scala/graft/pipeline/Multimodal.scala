package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed per-media metadata produced by the (stubbed) decoder. */
case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                     frames: Int, phash: String)

/** Multimodal-column plumbing: media as opaque `binary` + typed metadata.
  *
  * The real decode (image/audio libs) is STUBBED with a deterministic
  * fake — this container has no codec libraries — but the Spark side is
  * real: a binary column flows through a typed Dataset, the decode runs
  * batched per partition (the Scala analogue of mapInPandas: one iterator
  * per partition, amortized setup), and the output schema is the typed
  * metadata a downstream pipeline would consume. At scale this is the
  * shape that matters: decode parallelism == partition count, no
  * driver-side collect, constant memory per task.
  */
object Multimodal {

  /** STUB decoder: deterministic fake metadata derived from the bytes.
    * Swap body for a real codec (e.g. javax.imageio) when available.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Int, String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hash = md.digest(bytes).map("%02x".format(_)).mkString
    val n = bytes.length
    (n % 640 + 1, (n * 7) % 480 + 1, n % 24 + 1, hash)
  }

  /** Binary payload → per-partition batched decode → typed metadata. */
  def decode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // One decoder instance per partition (mapInPandas batch shape).
        it.map { case (id, bytes) =>
          val (w, h, f, ph) = decodeStub(bytes)
          MediaMeta(id, bytes.length.toLong, w, h, f, ph)
        }
      }
      .toDF()
  }
}
