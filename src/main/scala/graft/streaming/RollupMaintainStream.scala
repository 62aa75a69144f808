package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** STREAMING maintenance of the downsample rollup as a QUERYABLE STORE
  * (round 13; VERDICT r12 #2) — the near-real-time dashboard loop: the
  * batch MV (sources/DownsampleStore.scala) trails ingest by a nightly
  * build; this job keeps a rollup store trailing the live stream by
  * only the watermark delay, and the MV rewrite
  * (plans/RollupRewrite.scala) serves opted-in queries from it with an
  * EXPLICIT staleness bound in place of the write-once `_SUCCESS` gate.
  *
  * Mechanics: [[StreamAgg.downsampleStream]]'s aggregation — the same
  * (bucket × series) measures as the batch store, with the DECIMAL
  * partial sums kept decimal (the rewrite's bit-exactness hinges on
  * re-merging exact partials) — runs in APPEND mode, so a (bucket,
  * series) row is emitted exactly once, when the event-time watermark
  * passes the bucket's end and the row is FINAL. Emissions land in
  * batch-id-keyed parts (the streaming/Ingest.scala exactly-once
  * discipline: a replayed batch overwrites its own `parts/batch=<id>`
  * with the deterministic recompute; a fresh checkpoint over existing
  * parts is refused), so the served store is a plain parquet read —
  * no upsert resolution, every row final.
  *
  * Staleness as metadata: after each maintenance pass the pass's
  * event-time watermark is published atomically as the store's
  * `_watermark` marker. The marker is the store's completeness
  * contract — every bucket ending at or before it has been flushed —
  * and the rewrite serves ONLY query steps whose whole window closes
  * at or before the marker (a half-flushed hour must not serve as the
  * hour's total). Queries therefore trail live data by watermark +
  * one maintenance cadence, never silently under-count.
  *
  * 100 TB shape: the stream's state is open buckets only (watermark-
  * bounded); each part holds final rollup rows (series × buckets per
  * cadence), and the served store is rollup-sized regardless of ingest
  * volume — the same argument as the batch MV, made continuous.
  */
object RollupMaintainStream {

  /** The maintained store's rollup frame: identical columns to the
    * batch store's (DownsampleStore.rollup) — sum_dec STAYS DECIMAL so
    * the rewrite's re-aggregation merges exact partials.
    */
  private def rollupStream(s: SparkSession, inDir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val orderKey = struct(col("us"), col("event_id"))
    Ingest.eventsStream(s, inDir)
      .withColumn("us", unix_micros(col("ts")))
      .withWatermark("ts", "1 hour")
      // window width derived from the ONE resolution constant — a
      // hardcoded "5 minutes" here could silently drift from the edge
      // accounting and the serving math below (review r13)
      .groupBy(window(col("ts"), s"$ResolutionSec seconds"),
        col("user_id"), col("event_type"))
      .agg(
        count(lit(1)).as("n_samples"),
        sum(col("value").cast("decimal(30,6)")).as("sum_dec"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        min_by(col("value"), orderKey).as("first_value"),
        max_by(col("value"), orderKey).as("last_value"),
        // boundary-edge accounting for the stepped serving's soundness
        // gate: samples exactly on the bucket's first microsecond are
        // the one point an open-left (t−W, t] window excludes while
        // the bucket includes — counted per row, summed into the
        // store's _edge_count marker after each pass
        sum(when(col("us") % lit(ResolutionSec * 1000000L) === 0, 1L)
          .otherwise(0L)).as("n_edge"))
      .select(
        unix_timestamp(col("window.start")).as("bucket"),
        col("user_id"), col("event_type"), col("n_samples"),
        col("sum_dec"), col("min_value"), col("max_value"),
        col("first_value"), col("last_value"), col("n_edge"))
  }

  /** The downsample resolution (seconds) — same as the batch store's. */
  private val ResolutionSec: Long = graft.sources.DownsampleStore.ResolutionSec

  /** The store's completeness horizon (epoch seconds): every bucket
    * ending at or before it is flushed and final. Absent marker = no
    * completed maintenance pass = nothing servable.
    */
  def horizonSec(storeDir: String): Option[Long] =
    readMarker(storeDir, "_watermark")

  /** Count of flushed samples sitting exactly on a bucket boundary —
    * the stream store's sibling of DownsampleStore's `_edge_count`
    * (the stepped serving refuses a nonzero store). None until the
    * first maintenance pass publishes it.
    */
  def edgeCount(storeDir: String): Option[Long] =
    readMarker(storeDir, "_edge_count")

  private def readMarker(storeDir: String, name: String): Option[Long] = {
    val marker = new java.io.File(storeDir, name)
    if (!marker.isFile) None
    else Some(new String(java.nio.file.Files.readAllBytes(marker.toPath),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
  }

  private def writeMarker(storeDir: String, name: String,
                          value: Long): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(storeDir))
    val tmp = java.io.File.createTempFile("mrk", ".tmp",
      new java.io.File(storeDir))
    java.nio.file.Files.write(tmp.toPath,
      value.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(storeDir, name).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The events-table dir this store was maintained FROM — the binding
    * the rewrite checks so one session's StreamStoreConf can never
    * serve a DIFFERENT dataset's queries (review r13: the store must
    * carry its source identity, not trust the conf blindly).
    */
  def sourceDir(storeDir: String): Option[String] = {
    val marker = new java.io.File(storeDir, "_source_dir")
    if (!marker.isFile) None
    else Some(new String(java.nio.file.Files.readAllBytes(marker.toPath),
      java.nio.charset.StandardCharsets.UTF_8).trim)
  }

  /** True iff the store's endpoint picks were chosen under the current
    * struct (us, event_id) order key — serving refuses anything else.
    */
  def keyRevOk(storeDir: String): Boolean = {
    val marker = new java.io.File(storeDir, "_key_rev")
    marker.isFile && new String(
      java.nio.file.Files.readAllBytes(marker.toPath),
      java.nio.charset.StandardCharsets.UTF_8).trim == "struct1"
  }

  /** One AvailableNow maintenance pass: new event files under `inDir`
    * (a landing dir receiving `sourceDir`'s events) advance the rollup
    * store at `storeDir`; finalized bucket rows land exactly once under
    * `parts/batch=<id>`, then the pass's markers are published —
    * `_edge_count` BEFORE `_watermark`: a crash between the two leaves
    * a higher edge count with a lower horizon (refuses more, never
    * serves a boundary-dirty window), whereas the reverse order could
    * pass the stepped gate on a stale-low edge count.
    */
  def runOnce(s: SparkSession, inDir: String, storeDir: String,
              checkpoint: String, sourceDir: String): Unit = {
    val parts = s"$storeDir/parts"
    NearDupStream.guardFreshCheckpoint(parts, checkpoint)
    val srcMarker = new java.io.File(storeDir, "_source_dir")
    if (srcMarker.isFile) {
      val stored = this.sourceDir(storeDir).get
      require(stored == sourceDir,
        s"$storeDir was maintained from $stored, not $sourceDir")
    } else {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(storeDir))
      java.nio.file.Files.write(srcMarker.toPath,
        sourceDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // order-key revision: struct (us, event_id) picks (round 13).
      // Serving requires this marker, so a store whose endpoints were
      // chosen under the old overflow-prone packed key can never serve
      // (the batch store's _c1_ path bump, as a marker)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(storeDir, "_key_rev"),
        "struct1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val q = rollupStream(s, inDir).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$parts/batch=$batchId"); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // edge count first (see the ordering note above); coalesce covers
    // the empty-store first pass (sum over zero rows is NULL)
    if (Option(new java.io.File(parts).listFiles()).exists(_.nonEmpty)) {
      val edges = s.read.parquet(parts)
        .agg(coalesce(sum("n_edge"), lit(0L))).collect()(0).getLong(0)
      writeMarker(storeDir, "_edge_count", edges)
    }
    // then the pass's event-time watermark as the staleness bound:
    // append mode flushed every bucket ending at or before it. The
    // marker only ever advances (a drained pass reports no progress —
    // keep the previous horizon rather than regressing to None).
    val wm = Option(q.lastProgress)
      .flatMap(p => Option(p.eventTime.get("watermark")))
      .map(ts => java.time.Instant.parse(ts).getEpochSecond)
    wm.foreach { h =>
      val prev = horizonSec(storeDir).getOrElse(Long.MinValue)
      if (h > prev) writeMarker(storeDir, "_watermark", h)
    }
  }

  /** The parts path iff at least one maintenance batch actually landed
    * rows there — the gate every serving path resolves through (ADVICE
    * r13: a `_watermark` published on a zero-data pass, with no parts
    * on disk, must fall back to raw serving, not throw at plan time).
    */
  def servableParts(storeDir: String): Option[String] = {
    val parts = new java.io.File(storeDir, "parts")
    val entries = Option(parts.listFiles()).getOrElse(Array.empty)
    if (entries.exists(f => f.isDirectory || f.getName.endsWith(".parquet")))
      Some(parts.getPath)
    else None
  }

  /** The served store: all finalized rollup rows in the rollup's
    * serving schema (plain read — append mode means no upsert
    * resolution; `batch` partition column and n_edge dropped), through
    * the ONE shared reader (DownsampleStore.readServing) the rule and
    * the stepped front-end also use, so the projections cannot drift.
    */
  def table(s: SparkSession, storeDir: String): DataFrame =
    graft.sources.DownsampleStore.readServing(s,
      servableParts(storeDir).getOrElse(
        sys.error(s"$storeDir has no maintained parts to serve")))
}
