package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed per-media metadata produced by the decoder. */
case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                     frames: Int, phash: String)

/** Multimodal-column plumbing: media as opaque `binary` + typed metadata.
  *
  * The decode step is PLUGGABLE ([[MediaDecoder]]): operators take a
  * `() => MediaDecoder` factory, instantiated once per partition on the
  * executor — the Scala analogue of mapInPandas's per-batch setup. The
  * default is the deterministic [[StubDecoder]] (this container has no
  * codec libraries), but the Spark side is real either way: a binary
  * column flows through a typed Dataset, the decode runs batched per
  * partition, and the output schema is the typed metadata a downstream
  * pipeline would consume. At scale this is the shape that matters:
  * decode parallelism == partition count, no driver-side collect,
  * constant memory per task, codec setup amortized per partition.
  */
object Multimodal {

  /** Binary payload → per-partition batched decode → typed metadata. */
  def decode(s: SparkSession, dir: String,
             mkDecoder: () => MediaDecoder = MediaDecoder.stub): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // One decoder instance per partition (mapInPandas batch shape).
        val dec = mkDecoder()
        it.map { case (id, bytes) =>
          val m = dec.meta(bytes)
          MediaMeta(id, bytes.length.toLong, m.width, m.height, m.frames, m.phash)
        }
      }
      .toDF()
  }

  /** Feature extraction: binary payload → fixed-dim float vector.
    * STUB features (byte histogram folded to 16 dims, L1-normalized —
    * deterministic); the Spark shape is the real thing: batched
    * per-partition extraction emitting an Array[Float] column that
    * feeds directly into the Similarity operators.
    */
  def features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Float](16)
          bytes.foreach(b => hist((b & 0xFF) % 16) += 1f)
          val n = math.max(1, bytes.length)
          (id, hist.map(_ / n))
        }
      }
      .toDF("doc_id", "features")
  }

  /** Driver-checkable projection of [[features]]: the raw Array[Float]
    * column is unhashable for the correctness harness (pandas can't sort
    * ndarray cells), so the query surface emits a deterministic sortable
    * digest — each dim quantized to ⌊x·2²⁴⌋ (the same grid the decimal
    * vector kernel uses) and joined into one string — plus the dim count.
    * The Array[Float] variant above stays the internal API feeding
    * Similarity.
    */
  def featuresDigest(s: SparkSession, dir: String): DataFrame =
    features(s, dir).select(
      col("doc_id"),
      size(col("features")).as("dim"),
      // builtins (transform + concat_ws), not a typed lambda: the digest
      // projection stays inside whole-stage codegen above the decode
      concat_ws(",", transform(col("features"),
        x => floor(x.cast("double") * lit(1 << 24)).cast("long").cast("string")))
        .as("features_digest"))

  /** Frame sampling: one media payload → one row per sampled frame
    * (every k-th "frame" of the container), the batch-expansion shape
    * of video pipelines: flatMap per partition, output cardinality
    * = frames/stride, partitioning inherited — no shuffle.
    */
  def sampleFrames(s: SparkSession, dir: String, stride: Int = 8,
                   mkDecoder: () => MediaDecoder = MediaDecoder.stub): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = mkDecoder()
        it.flatMap { case (id, bytes) =>
          val frames = dec.meta(bytes).frames
          (0 until frames by stride).map(f => (id, f, dec.frameHash(bytes, f)))
        }
      }
      .toDF("doc_id", "frame_idx", "frame_hash")
  }
}
