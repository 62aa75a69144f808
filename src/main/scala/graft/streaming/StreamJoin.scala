package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream joins — the two-moving-sides case the batch interval
  * join (operators/Relational.intervalJoin) answers offline. Spark
  * buffers BOTH sides in the state store and matches incrementally; the
  * pieces that make that viable at scale are exactly the two this
  * operator pins:
  *
  *   - a TIME-RANGE condition relating the two event-time columns, so
  *     a row's match window is bounded, and
  *   - WATERMARKS on both sides, so state older than the watermark minus
  *     the band width is evicted.
  *
  * Without either, join state grows with the stream forever. With both,
  * state is O(rate × (watermark delay + band width)) — independent of
  * stream length, the property that survives an unbounded stream.
  */
object StreamJoin {

  /** Purchases ⋈ clicks of the same user within [purchase, purchase+W)
    * — the streaming twin of q_interval_join's pair-generation stage,
    * inner-joined so every matched pair emits as soon as both sides
    * have arrived (inner pairs never wait for the watermark; the
    * watermark only gates state EVICTION — and outer-side emission,
    * if this were an outer join).
    */
  def intervalPairs(s: SparkSession, inDir: String,
                    widthSec: Long = 3600L): DataFrame = {
    require(widthSec > 0, "interval width must be positive")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def stream = Ingest.eventsStream(s, inDir)
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("value"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") &&
        col("c_ts") < col("p_ts") + expr(s"INTERVAL $widthSec SECOND"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("p_us"),
        unix_micros(col("c_ts")).as("c_us"), col("value"))
  }
}
