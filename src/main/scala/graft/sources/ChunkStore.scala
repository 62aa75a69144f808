package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's chunk data model, Spark-first.
  *
  * tsdb-parquet stores one row per CHUNK: `__series__id, __mint, __maxt,
  * __chunk_bytes` plus one column per label, sorted by (mint, maxt,
  * labels) (reference: schema/chunk.go, db/writer.go:44-53). This module
  * reproduces that layout over the events table: samples are grouped
  * per (series, hour), encoded into a deterministic binary chunk
  * (16 bytes/sample: big-endian µs timestamp + IEEE-754 value bits),
  * and written range-partitioned + sorted so parquet min/max stats on
  * mint/maxt give readers the reference's page-skipping behavior.
  *
  * Chunk building is a single groupByKey→mapGroups shuffle (the
  * compactor's job in the reference); decode is a flatMap — both scale
  * linearly and never touch the driver.
  */
object ChunkStore {

  val UsPerHour: Long = 3600L * 1000000L

  case class Chunk(user_id: Long, event_type: String, mint: Long, maxt: Long,
                   n_samples: Int, chunk: Array[Byte])

  case class Sample(user_id: Long, event_type: String, us: Long, value: Double)

  /** Build one chunk per (series, hour) from the raw events. */
  def buildChunks(s: SparkSession, dir: String): Dataset[Chunk] = {
    import s.implicits._
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"), col("event_id"))
      .as[(Long, String, Long, Double, Long)]
      .groupByKey(r => (r._1, r._2, r._3 / UsPerHour))
      .mapGroups { (key: (Long, String, Long), rows: Iterator[(Long, String, Long, Double, Long)]) =>
        val (uid, et) = (key._1, key._2)
        val sorted = rows.toArray.sortBy(r => (r._3, r._5))
        val bb = java.nio.ByteBuffer.allocate(16 * sorted.length)
        sorted.foreach { r =>
          bb.putLong(r._3)
          bb.putLong(java.lang.Double.doubleToLongBits(r._4))
        }
        Chunk(uid, et, sorted.head._3, sorted.last._3, sorted.length, bb.array())
      }
  }

  /** Write the chunk table in the reference's sort order
    * (mint, maxt, labels) — reference: db/writer.go:44-53.
    */
  def writeChunks(s: SparkSession, dir: String, out: String): Unit =
    buildChunks(s, dir).toDF()
      .repartitionByRange(4, col("mint"))
      .sortWithinPartitions("mint", "maxt", "event_type", "user_id")
      .write.mode(SaveMode.Overwrite).parquet(out)

  private def chunkPath(dir: String) =
    s"/root/repo/target/tmp/chunks_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"

  private def ensureWritten(s: SparkSession, dir: String): String = {
    val out = chunkPath(dir)
    writeChunks(s, dir, out)
    out
  }

  /** Chunk-table metadata view — the reference's series/time index. */
  def chunkMeta(s: SparkSession, dir: String): DataFrame = {
    val out = ensureWritten(s, dir)
    s.read.parquet(out)
      .select("user_id", "event_type", "mint", "maxt", "n_samples")
  }

  /** Decode every chunk back to samples — round-trip must equal the
    * source table exactly.
    */
  def roundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = ensureWritten(s, dir)
    s.read.parquet(out)
      .select(col("user_id"), col("event_type"), col("chunk"))
      .as[(Long, String, Array[Byte])]
      .flatMap { case (uid, et, bytes) =>
        val bb = java.nio.ByteBuffer.wrap(bytes)
        Iterator.continually(bb).takeWhile(_.hasRemaining).map { b =>
          Sample(uid, et, b.getLong(),
            java.lang.Double.longBitsToDouble(b.getLong()))
        }
      }
      .toDF()
  }

  /** Time-range chunk selection — the reference's `Querier.Select`
    * overlap test `mint <= hi AND maxt >= lo`
    * (reference: prometheus/querier.go:71-74), pushed to parquet stats
    * over the sorted layout, then decoded and re-filtered per sample.
    */
  def rangeQuery(s: SparkSession, dir: String, loUs: Long, hiUs: Long): DataFrame = {
    import s.implicits._
    val out = ensureWritten(s, dir)
    s.read.parquet(out)
      .filter(col("mint") <= hiUs && col("maxt") >= loUs)
      .select(col("user_id"), col("event_type"), col("chunk"))
      .as[(Long, String, Array[Byte])]
      .flatMap { case (uid, et, bytes) =>
        val bb = java.nio.ByteBuffer.wrap(bytes)
        Iterator.continually(bb).takeWhile(_.hasRemaining).map { b =>
          Sample(uid, et, b.getLong(),
            java.lang.Double.longBitsToDouble(b.getLong()))
        }
      }
      .filter(r => r.us >= loUs && r.us <= hiUs)
      .toDF()
  }
}
