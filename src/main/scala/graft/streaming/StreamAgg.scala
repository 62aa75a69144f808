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
    s.readStream.schema(Ingest.rawSchema).parquet(inDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("step"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Gap-based sessionization via flatMapGroupsWithState: consecutive
    * events of a user belong to one session while gaps stay under
    * `gapUs`; a larger gap closes the session and starts the next. Emits
    * one row per closed-or-final session. State per user is the open
    * session only — O(1), the shape that survives unbounded streams.
    * (AvailableNow processes the backlog as one batch, so within-batch
    * events are sorted per group before splitting — deterministic.)
    */
  case class Session(user_id: Long, session_start_us: Long,
                     session_end_us: Long, n_events: Long)

  def sessionize(s: SparkSession, inDir: String,
                 gapUs: Long = 30L * 60 * 1000000): Dataset[Session] = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = s.readStream.schema(Ingest.rawSchema).parquet(inDir)
      .select(col("user_id"), expr("ts div 1000").as("us"))
      .as[(Long, Long)]
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Session, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          val times = rows.map(_._2).toArray.sorted
          var open = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          times.foreach { us =>
            open match {
              case Some(sess) if us - sess.session_end_us <= gapUs =>
                open = Some(sess.copy(session_end_us = us,
                  n_events = sess.n_events + 1))
              case Some(sess) =>
                out += sess // gap exceeded: close it
                open = Some(Session(uid, us, us, 1))
              case None =>
                open = Some(Session(uid, us, us, 1))
            }
          }
          open.foreach(state.update)
          // emit the still-open session too: with AvailableNow this is
          // the final state (a live stream would hold it for the next batch)
          (out ++ open).iterator
      }
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
    val events = s.readStream.schema(Ingest.rawSchema).parquet(inDir)
      .select(col("user_id"), expr("ts div 1000").as("us"))
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
