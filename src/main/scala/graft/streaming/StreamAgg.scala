package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming analytics over the events stream — the query side of the
  * online story (the reference serves reads from freshly-converted
  * blocks; Spark-first that's a watermarked streaming aggregation over
  * the same files the ingest sink writes).
  */
object StreamAgg {

  /** Hourly windowed per-type counts + exact sums with a 1-hour
    * watermark: the state store holds only open windows, so state is
    * bounded regardless of stream length — the property that matters at
    * production scale.
    */
  def windowedCounts(s: SparkSession, inDir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Ingest.eventsStream(s, inDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("step"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Streaming maintenance of the 5m downsampling rollup
    * ([[graft.sources.DownsampleStore]]): the same (series × bucket)
    * aggregates — count, DECIMAL sum, min, max, arg-first/arg-last by
    * the packed (µs, event_id) key — computed continuously as samples
    * arrive. The watermark bounds state to open buckets; a production
    * deployment upserts each emitted bucket row into the rollup store
    * (the [[graft.sources.UpsertStore]] arg-max-by-version merge), so
    * the downsample table trails the live stream by the watermark
    * delay instead of waiting for a nightly batch job.
    */
  def downsampleStream(s: SparkSession, inDir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val orderKey = struct(col("us"), col("event_id"))
    Ingest.eventsStream(s, inDir)
      .withColumn("us", unix_micros(col("ts")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "5 minutes"), col("user_id"), col("event_type"))
      .agg(
        count(lit(1)).as("n_samples"),
        sum(col("value").cast("decimal(30,6)")).as("sum_dec"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        min_by(col("value"), orderKey).as("first_value"),
        max_by(col("value"), orderKey).as("last_value"))
      .select(
        unix_timestamp(col("window.start")).as("bucket"),
        col("user_id"), col("event_type"), col("n_samples"),
        col("sum_dec").cast("double").as("sum_value"),
        col("min_value"), col("max_value"),
        col("first_value"), col("last_value"))
  }

  /** Streaming maintenance of the native-histogram table — the live
    * twin of [[graft.operators.TimeSeries.nhistBuild]]: the same
    * schema-0 bucket index computed inline, counted per (window,
    * metric, bucket) under the 1h watermark. State is bounded twice
    * over: open windows by the watermark, and ≤ 16 bucket rows per
    * open (window, metric) BY SCHEMA — a native-histogram stream's
    * state cannot grow with traffic shape, only with live series
    * count. A deployment upserts emitted rows into the histogram
    * store the same way the downsample stream feeds its rollup.
    */
  def nhistStream(s: SparkSession, inDir: String): DataFrame =
    Ingest.eventsStream(s, inDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"),
        graft.operators.TimeSeries.nhK(col("value")).as("k"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("step"),
        col("event_type"), col("k"), col("cnt"))

  /** Gap-based sessionization: consecutive events of a user belong to
    * one session while gaps stay under `gapUs`; a larger gap closes the
    * session and starts the next. State per user is the open session
    * only — O(1), the shape that survives unbounded streams.
    */
  case class Session(user_id: Long, session_start_us: Long,
                     session_end_us: Long, n_events: Long)

  /** Shared per-batch session fold: absorb this batch's (sorted) event
    * times into the open session, returning (closed sessions, open).
    */
  private def foldSessions(uid: Long, times: Array[Long], prior: Option[Session],
                           gapUs: Long): (Seq[Session], Option[Session]) = {
    var open = prior
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    times.foreach { us =>
      open match {
        case Some(sess) if us < sess.session_start_us - gapUs =>
          // delayed event from BEFORE the open session's own reach: it
          // belonged to an already-closed (already-emitted) region.
          // O(1) state cannot resurrect closed sessions, so this is
          // dropped late data — the bounded-state tradeoff every
          // watermarked sessionizer makes. Absorbing it instead would
          // stretch the open session across a silence > gapUs and
          // overlap the emitted history.
          ()
        case Some(sess) if us - sess.session_end_us <= gapUs =>
          // min/max, not assignment: a delayed (above-watermark)
          // out-of-order event from a later batch must never move the
          // session end backwards — that would corrupt the next gap
          // computation and could emit end < start
          open = Some(sess.copy(
            session_start_us = math.min(sess.session_start_us, us),
            session_end_us = math.max(sess.session_end_us, us),
            n_events = sess.n_events + 1))
        case Some(sess) =>
          out += sess // gap exceeded: close it
          open = Some(Session(uid, us, us, 1))
        case None =>
          open = Some(Session(uid, us, us, 1))
      }
    }
    (out.toSeq, open)
  }

  /** Live-stream sessionize (Append-correct): emits a session exactly
    * once, when it CLOSES — either a bigger-than-gap gap arrives, or the
    * event-time watermark passes session_end + gap and the state times
    * out (the flush for users who simply stop sending). Open sessions
    * are held in state, never emitted early, so a multi-batch stream
    * produces no duplicate rows — the property Append mode promises
    * downstream consumers.
    */
  def sessionize(s: SparkSession, inDir: String,
                 gapUs: Long = 30L * 60 * 1000000,
                 watermarkDelay: String = "1 hour"): Dataset[Session] = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = Ingest.eventsStream(s, inDir)
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Session, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's end + gap: flush it
            val out = state.getOption.toSeq
            state.remove()
            out.iterator
          } else {
            val times = rows.map(_._2).toArray.sorted
            val (closed, open) = foldSessions(uid, times, state.getOption, gapUs)
            open.foreach { sess =>
              state.update(sess)
              // fire once no on-time event can extend the session;
              // clamp above the current watermark (Spark requires it)
              state.setTimeoutTimestamp(math.max(
                sess.session_end_us / 1000L + gapUs / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            closed.iterator
          }
      }
  }

  /** Backlog sessionize (AvailableNow-ONLY): same session fold, but the
    * final open session is emitted at the end of the batch instead of
    * held for a timeout — correct only when the run is known to see the
    * whole backlog (one-shot batch-over-files), NOT on a live stream,
    * where re-emitting open sessions every batch duplicates Append rows;
    * use [[sessionize]] there.
    */
  def sessionizeBacklog(s: SparkSession, inDir: String,
                        gapUs: Long = 30L * 60 * 1000000): Dataset[Session] = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = Ingest.eventsStream(s, inDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Session, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          val times = rows.map(_._2).toArray.sorted
          val (closed, open) = foldSessions(uid, times, state.getOption, gapUs)
          open.foreach(state.update)
          (closed ++ open).iterator
      }
  }

  /** Sessionization via Spark's NATIVE session_window — the built-in
    * merging-window state operator, completing the family's triangle:
    * batch (Behavior.sessionize, one-shuffle running frames) ≡ custom
    * stream state machine (sessionizeBacklog) ≡ this. Gap semantics
    * align exactly by widening the native gap 1 µs: session_window
    * merges when diff < gap, the batch rule keeps the session when
    * diff <= gapUs, and gap = gapUs + 1 makes those the same predicate.
    * State per key is the set of OPEN windows only (the operator merges
    * and evicts on watermark advance on a live stream); the output
    * shape matches the batch operator minus the per-user index.
    */
  def sessionWindowNative(s: SparkSession, inDir: String,
                          gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Ingest.eventsStream(s, inDir)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${gapUs + 1} microseconds"))
      .agg(
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("value_sum"))
      .select(col("user_id"),
        unix_micros(col("min_ts")).as("start_us"),
        unix_micros(col("max_ts")).as("end_us"),
        col("n_events"), col("value_sum"))
  }

  /** Per-user running stats via explicit state (mapGroupsWithState) —
    * the KeyValueGroupedDataset custom-state path for logic windows
    * can't express. State per key is O(1); partitioning is by user_id
    * (hash, cardinality ≫ cores).
    */
  case class UserStats(user_id: Long, n_events: Long, last_us: Long)

  def userRunningStats(s: SparkSession, inDir: String): Dataset[UserStats] = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = Ingest.eventsStream(s, inDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
    events.groupByKey(_._1)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, Long.MinValue))
          var n = prev.n_events
          var last = prev.last_us
          rows.foreach { case (_, us) => n += 1; if (us > last) last = us }
          val next = UserStats(uid, n, last)
          state.update(next)
          next
      }
  }
}
