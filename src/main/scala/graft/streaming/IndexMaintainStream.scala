package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** ONLINE content-index maintenance — the streaming leg of
  * [[graft.pipeline.Dedup.indexMaintain]] (round 12): the served
  * exact-dedup index GROWS as batches are admitted, materialized as a
  * queryable store other jobs join, not as opaque stream state. This
  * closes the loop [[NearDupStream]] leaves open: that guard serves a
  * FIXED index for the stream's life; this one is the job that
  * produces the next index generation continuously.
  *
  * Store layout: `base/` — the corpus (chash, min doc_id) index,
  * write-once from the reference corpus split — plus one
  * `delta/batch=<id>/` part per micro-batch holding the batch's NEW
  * contents only (first-arriving batch wins a content; within a batch
  * the min doc_id wins — the first-ingested contract of the batch
  * twin). Each append is O(batch's new contents): the arriving batch
  * collapses to its content minimum, left-anti joins the CURRENT index
  * (base + prior deltas), and writes only the survivors.
  *
  * Exactly-once: foreachBatch is at-least-once, so a replayed batch
  * OVERWRITES its own `batch=<id>` directory with the identical
  * deterministic rows instead of appending duplicates (the
  * streaming/Ingest.scala part discipline). Like Ingest, batch-id-keyed
  * paths are only safe within one checkpoint lineage — a fresh
  * checkpoint over a non-empty delta store is refused rather than
  * silently clobbered.
  */
object IndexMaintainStream {

  /** The queryable index as of now: base ∪ all appended deltas.
    * `excludeBatch` drops one batch's own part from the view — the
    * replay correctness hinge: a replayed foreachBatch must anti-join
    * against the index WITHOUT its own prior (possibly partial) output,
    * both so the recompute reproduces the identical rows and so the
    * overwrite never reads the directory it is about to replace.
    */
  def currentIndex(s: SparkSession, storeDir: String,
                   excludeBatch: Long = -1L): DataFrame = {
    // explicit columns on BOTH legs: the union below is positional, and
    // relying on the base parquet's physical column order would silently
    // swap chash/keep_id if a future writer reordered them (ADVICE r12)
    val base = s.read.parquet(s"$storeDir/base")
      .select("chash", "keep_id")
      .withColumn("since_version", lit(1))
    val deltaDir = new java.io.File(s"$storeDir/delta")
    val parts = Option(deltaDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch=") &&
        f.getName != s"batch=$excludeBatch")
      .map(_.getPath)
    if (parts.isEmpty) base
    else base.unionAll(
      s.read.parquet(parts.toSeq: _*).select("chash", "keep_id")
        .withColumn("since_version", lit(2)))
  }

  /** One AvailableNow pass: documents under `inDir` stream in; each
    * micro-batch's delta-split docs append their NEW contents to the
    * index store. The base index builds write-once from `refDir`'s
    * corpus split (same formula as the batch twin's v1).
    */
  def runOnce(s: SparkSession, inDir: String, storeDir: String,
              checkpoint: String, refDir: String,
              corpusPct: Int = 80): Unit = {
    val base = s"$storeDir/base"
    // the split percentage is part of the store's identity: a reuse
    // with a different corpusPct would silently serve the wrong split
    val pctMarker = java.nio.file.Paths.get(storeDir, "_corpus_pct")
    if (!new java.io.File(base, "_SUCCESS").isFile) {
      // marker BEFORE the base commit: a crash between the two can then
      // only leave a marker without a base (harmless — the next run
      // rebuilds both), never a committed base whose split identity is
      // unknowable (ADVICE r12)
      java.nio.file.Files.createDirectories(pctMarker.getParent)
      java.nio.file.Files.write(pctMarker,
        corpusPct.toString.getBytes("UTF-8"))
      graft.Tables.documents(s, refDir).select(
        col("doc_id"), md5(col("text")).as("chash"),
        graft.pipeline.Dedup.splitBucket(col("doc_id")).as("bucket"))
        .filter(col("bucket") < corpusPct)
        .groupBy("chash").agg(min("doc_id").as("keep_id"))
        .write.mode("overwrite").parquet(base)
    } else {
      // a committed base with no marker is a store this code did not
      // write (or a pre-marker layout): name the repair instead of
      // throwing a raw NoSuchFileException on every run
      require(java.nio.file.Files.exists(pctMarker),
        s"$storeDir has a committed base but no $pctMarker marker: the " +
          "store's corpus split is unknowable — rebuild the store or " +
          "restore the marker from the job that built it")
      val stored = new String(java.nio.file.Files.readAllBytes(pctMarker),
        "UTF-8").trim
      require(stored == corpusPct.toString,
        s"$storeDir was built with corpusPct=$stored, not $corpusPct")
    }
    val freshCheckpoint = !new java.io.File(checkpoint, "offsets").exists()
    val hasDeltas = Option(new java.io.File(s"$storeDir/delta").listFiles())
      .exists(_.nonEmpty)
    require(!(freshCheckpoint && hasDeltas),
      s"$storeDir/delta already holds parts but checkpoint $checkpoint is " +
        "fresh: batch ids would restart at 0 and overwrite them")
    val isDelta =
      graft.pipeline.Dedup.splitBucket(col("doc_id")) >= corpusPct
    val q = s.readStream.schema(CurationStream.docSchema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val fresh = batch.filter(isDelta)
          .select(col("doc_id"), md5(col("text")).as("chash"))
          .groupBy("chash").agg(min("doc_id").as("keep_id"))
          .join(currentIndex(s, storeDir, excludeBatch = batchId)
            .select("chash"), Seq("chash"), "left_anti")
        fresh.write.mode("overwrite")
          .parquet(s"$storeDir/delta/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
