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
