package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** STREAMING ANN-index maintenance — the online half of the IVF family:
  * newly arriving vectors are assigned to their coarse-quantizer cell
  * the moment they land and appended to a cell-partitioned posting
  * store, so probe-side queries prune to their cells by directory
  * pruning alone (the same read path the batch index uses). Assignment
  * is the STATELESS shared kernel `Similarity.assignCells` — a pure map
  * over the stream, no streaming state store at all, which is what
  * makes the maintainer horizontally scalable: a 1000-executor cluster
  * ingests vectors embarrassingly parallel, and the only coordination
  * is the file-sink commit log.
  *
  * The reference has no online path (its converter is batch); this is
  * the similarity-search sibling of Ingest.runOnce's events pipeline.
  * AnnIngestSpec proves stream-built postings equal the batch
  * assignment row for row, and that a second micro-batch only appends
  * its own vectors (exactly-once per file via the sink commit log).
  */
object AnnIngest {

  /** Raw schema of arriving embedding files (the embeddings table). */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** One AvailableNow maintenance pass: assign every new vector to its
    * IVF cell and append to the cell-partitioned posting store.
    */
  def runOnce(s: SparkSession, inDir: String, outDir: String,
              checkpoint: String): Unit = {
    val stream = s.readStream.schema(embSchema).parquet(inDir)
    val assigned = graft.pipeline.Similarity.assignCells(stream)
      .select(col("vec_id"), col("embedding"), col("norm"), col("cell"))
    val q = assigned.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .partitionBy("cell")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The maintained posting store (cell is a partition column). */
  def readPostings(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir)
}
