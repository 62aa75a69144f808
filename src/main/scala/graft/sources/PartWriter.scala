package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-part table layout — the reference's writer fidelity.
  *
  * tsdb-parquet's Writer flushes each full buffer as `part.N.parquet`
  * plus a `part.N.metadata` footer file (reference: db/writer.go:169-181
  * flushBuffer, :219-236 createMetadataFile, partRegex at :27), and
  * `Compact()` merge-sorts every part's row groups into
  * `compact.parquet` + `compact.metadata` (db/writer.go:97-159). Sort
  * order is CompareColumns (db/writer.go:238-258): metric name first,
  * then mint, maxt, then the remaining labels — for events-as-TSDB
  * that is (event_type, mint, maxt, user_id).
  *
  * Spark-first translation: each `part.N.parquet` is a Spark parquet
  * output (a directory of task files — the cluster-writable analogue of
  * the reference's single file), range-partitioned + sorted so row-group
  * stats carry the same pruning power. The `.metadata` sidecar holds the
  * footer facts a reader wants without opening the data files: row
  * count, file count, sort columns, per-sort-column min/max. Compaction
  * reads every live part and rewrites one globally-sorted table — one
  * range-shuffle, no driver-side row handling.
  */
object PartWriter {

  /** reference: db/writer.go:27 */
  val partRegex = """part\.(\d+)\.parquet""".r

  val defaultSortCols: Seq[String] = Seq("event_type", "mint", "maxt", "user_id")

  /** Live (id, path) parts under `dir`, ascending by id. */
  def listParts(dir: String): Seq[(Int, String)] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
    files.toSeq.flatMap { f =>
      f.getName match {
        case partRegex(n) if f.isDirectory => Some(n.toInt -> f.getPath)
        case _ => None
      }
    }.sortBy(_._1)
  }

  def nextPartId(dir: String): Int =
    listParts(dir).lastOption.map(_._1 + 1).getOrElse(0)

  /** Flush one buffer of rows as the next `part.N.parquet` +
    * `part.N.metadata`. Returns the part id.
    *
    * `partitions = 0` uses the session shuffle-partition default; pass
    * an explicit count for small buffers (a streaming micro-batch
    * shuffled into 200 range partitions is 200 near-empty files).
    */
  def writePart(df: DataFrame, dir: String,
                sortCols: Seq[String] = defaultSortCols,
                partitions: Int = 0): Int = {
    val id = nextPartId(dir)
    writePartAs(df, dir, id, sortCols, partitions, SaveMode.ErrorIfExists)
    id
  }

  /** Idempotent flush under a CALLER-OWNED id — the streaming
    * foreachBatch path (at-least-once delivery: a replayed batch must
    * overwrite its own part, never append a duplicate one).
    */
  def writePartAs(df: DataFrame, dir: String, id: Int,
                  sortCols: Seq[String] = defaultSortCols,
                  partitions: Int = 0,
                  mode: SaveMode = SaveMode.Overwrite): Unit = {
    val path = s"$dir/part.$id.parquet"
    val ranged =
      if (partitions > 0) df.repartitionByRange(partitions, sortCols.map(col): _*)
      else df.repartitionByRange(sortCols.map(col): _*)
    ranged
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(mode).parquet(path)
    writeMetadata(df.sparkSession, s"$dir/part.$id.metadata", path, sortCols)
  }

  /** All live parts as one DataFrame (reader side). */
  def readParts(s: SparkSession, dir: String): DataFrame = {
    val parts = listParts(dir).map(_._2)
    require(parts.nonEmpty, s"no part.N.parquet under $dir")
    s.read.parquet(parts: _*)
  }

  /** Merge-compact every live part into `compact.parquet` +
    * `compact.metadata` (reference: db/writer.go:97-159). One global
    * range-shuffle re-sorts all rows; parts stay in place, as in the
    * reference. Returns the compacted path.
    */
  def compact(s: SparkSession, dir: String,
              sortCols: Seq[String] = defaultSortCols): String = {
    val out = s"$dir/compact.parquet"
    readParts(s, dir)
      .repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(out)
    writeMetadata(s, s"$dir/compact.metadata", out, sortCols)
    out
  }

  /** Footer sidecar: what the reference serializes from the parquet
    * footer (db/writer.go:219-236), as JSON — row count, task-file
    * count, sort columns, and per-sort-column bounds.
    */
  private def writeMetadata(s: SparkSession, metaPath: String,
                            dataPath: String, sortCols: Seq[String]): Unit = {
    val df = s.read.parquet(dataPath)
    val aggs = count(lit(1)).as("rows") +:
      sortCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val nFiles = Option(new java.io.File(dataPath).listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    val bounds = sortCols.map { c =>
      s""""$c":["${row.getAs[Any](s"min_$c")}","${row.getAs[Any](s"max_$c")}"]"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"rows":${row.getAs[Long]("rows")},"files":$nFiles,""" +
        s""""sort_columns":${sortCols.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""bounds":$bounds}"""
    val w = new java.io.PrintWriter(metaPath, "UTF-8")
    try w.println(json) finally w.close()
  }
}
