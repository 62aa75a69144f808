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

  /** IVF top-k search SERVED FROM the stream-maintained store — the
    * read path that makes the maintainer an index rather than a copy:
    * each query probes only its own cell's directory partition (the
    * `cell === qc` equi-join prunes by partition value before any scan)
    * and ranks candidates by the exact quantized cosine. Because the
    * assignment kernel is shared with the batch build, this returns
    * row-for-row what `Similarity.ivf` returns over the same corpus —
    * AnnIngestSpec asserts that equality AND that the store's measured
    * recall@k equals the batch index's recall@k record, so the online
    * index sits behind the same quality gate as the batch one.
    */
  def search(s: SparkSession, outDir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val store = readPostings(s, outDir).select(
      col("vec_id"), col("embedding"), col("norm"),
      col("cell").cast("int").as("cell"))
    val q = store.filter(col("vec_id") < 5).select(
      col("vec_id").as("qid"), col("embedding").as("qe"),
      col("norm").as("qn"), col("cell").as("qc"))
    val pairs = broadcast(q)
      .join(store, col("cell") === col("qc") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (graft.functions.VectorOps.dot(col("qe"), col("embedding")) /
          (sqrt(col("qn")) * sqrt(col("norm")))).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
    pairs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("qid", "vec_id", "rnk", "cosine")
  }
}
