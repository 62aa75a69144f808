package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-Streaming ingestion — the online-writes side the reference
  * handles with its TSDB→parquet converter (reference: cmd/convert/main.go,
  * db/writer.go). Spark-first: a file-source stream, watermarked exact-once
  * dedup on event_id, date-partitioned parquet sink. At scale the sink
  * partitioning (by date) is what makes later time-range queries prune
  * whole directories, and the watermark bounds the dedup state store.
  */
object Ingest {

  /** Raw on-disk schema of the events stream (ts as long ns, matching the
    * TIMESTAMP(NANOS) layout the driver generated through round 8).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Raw schema of the TIMESTAMP(MICROS) layout (arrives as NTZ). */
  val rawSchemaUs: StructType = StructType(
    rawSchema.fields.map(f =>
      if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))

  /** Normalized events file-stream over `inDir`: `ts` TimestampType (µs,
    * UTC instants) whichever raw layout the files have — the streaming
    * twin of Tables.eventsNorm. A file stream needs its schema up front,
    * so the layout is probed with a one-off batch read; an empty/missing
    * dir (stream started before the first file lands) defaults to the
    * current driver layout (µs) — LOUDLY (a warning names the assumed
    * layout), because a fixed file-stream schema cannot re-probe: if
    * legacy long-ns files later land in that dir they would be misread
    * as NTZ µs, and the operator must know the assumption was made.
    */
  def eventsStream(s: SparkSession, inDir: String,
                   options: Map[String, String] = Map.empty): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val tsIsLong =
      try s.read.parquet(inDir).schema("ts").dataType == LongType
      catch {
        case _: Exception =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"eventsStream: no readable parquet at $inDir yet — assuming " +
              "the µs (TIMESTAMP_NTZ) layout; legacy TIMESTAMP(NANOS) " +
              "files landing later would be misread (restart the stream " +
              "after the first file if the layout is legacy-ns)")
          false
      }
    if (tsIsLong)
      s.readStream.schema(rawSchema).options(options).parquet(inDir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      s.readStream.schema(rawSchemaUs).options(options).parquet(inDir)
        .withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Run one AvailableNow ingest pass: inDir (parquet files) → outDir
    * (date-partitioned parquet), deduped by event_id within the watermark.
    */
  def runOnce(s: SparkSession, inDir: String, outDir: String,
              checkpoint: String): Unit = {
    val stream = eventsStream(s, inDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .withColumn("date", to_date(col("ts")))
    val q = stream.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .partitionBy("date")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  def readBack(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)

  /** Streaming convert — the reference's TSDB→parquet conversion
    * (reference: cmd/convert/main.go + db/writer.go) as a live pipeline:
    * each micro-batch's events are grouped per (series, hour), encoded
    * as Prometheus XOR chunks, and flushed as the next `part.N.parquet`
    * (+ metadata sidecar) via [[graft.sources.PartWriter]] — the
    * reference writer's buffered-flush lifecycle, driven by the stream.
    * Parts accumulate per batch; `PartWriter.compact` merges them into
    * one globally-sorted table, exactly the reference's Compact().
    */
  def chunkConvert(s: SparkSession, inDir: String, outDir: String,
                   checkpoint: String): Unit = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    new java.io.File(outDir).mkdirs()
    // batchId-keyed overwrite is only safe within ONE checkpoint
    // lineage: a fresh checkpoint restarts batch ids at 0 and would
    // silently clobber parts a previous stream wrote to this outDir
    val freshCheckpoint = !new java.io.File(checkpoint, "offsets").exists()
    require(!(freshCheckpoint && graft.sources.PartWriter.listParts(outDir).nonEmpty),
      s"$outDir already holds parts but checkpoint $checkpoint is fresh: " +
        "batch ids would restart at 0 and overwrite them — use a new " +
        "outDir, or keep the original checkpoint to resume")
    // one flush per arriving file
    val stream = eventsStream(s, inDir, Map("maxFilesPerTrigger" -> "1"))
      .withColumn("us", unix_micros(col("ts")))
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          // part id = batchId, overwrite mode: foreachBatch is
          // at-least-once, so a replayed batch rewrites ITS part
          // instead of appending a duplicate under a fresh id
          graft.sources.PartWriter.writePartAs(
            graft.sources.ChunkStore.chunksFrom(batch).toDF(), outDir,
            id = batchId.toInt,
            partitions = math.max(1, batch.rdd.getNumPartitions))
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
