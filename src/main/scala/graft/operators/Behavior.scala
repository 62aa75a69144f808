package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Ordered event-stream analytics over the events table — sessionization,
  * funnels, cohort retention. These are the per-entity ORDERED-state
  * operators the relational core lacks: each one is expressed as running
  * window frames over a single hash-partition of the entity key, so the
  * whole family holds the one-wide-shuffle posture at 100 TB (the
  * reference's per-series ordered iteration, prometheus/querier.go's
  * sorted-series walk, generalized to arbitrary per-key order logic).
  *
  * Numeric discipline matches the rest of the library: value sums
  * accumulate in decimal(30,6) (order-independent, oracle-mirrored) and
  * emit as double; timestamps are compared as epoch-µs longs.
  */
object Behavior {

  /** Default session gap: a new session starts after 2h of inactivity.
    * The DuckDB oracle interpolates THIS constant (OracleSql), so the
    * default-knob entry cannot drift; the 30m knob entry re-runs the
    * same parameterized oracle at 1800 s.
    */
  val DefaultSessionGapSec = 7200L

  private def exactCum(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast("decimal(30,6)")).over(w)

  /** Gap-based sessionization, ONE shuffle and ONE sort total: rows hash
    * to their user partition, every frame below is a running frame
    * (unboundedPreceding → currentRow — streaming-evaluable, O(1) state
    * per row), and the session row is emitted AT the session's last
    * event, carrying the session aggregate forward via running
    * `last(_, ignoreNulls)` anchors instead of a second groupBy on the
    * derived (user, session) key. The naive plan — flag, cumulative
    * session index, then groupBy(user_id, session_idx) — pays a second
    * exchange on a key that did not exist in storage; this plan never
    * leaves the user partition. Value sums are exact: the running
    * decimal cumsum minus the decimal anchor at session start equals the
    * session's own decimal sum (subtraction is exact in decimal), so the
    * emitted double matches the oracle's per-session decimal SUM.
    */
  def sessionize(s: SparkSession, dir: String,
                 gapSec: Long = Behavior.DefaultSessionGapSec): DataFrame = {
    require(gapSec > 0, "session gap must be positive")
    val gapUs = gapSec * 1000000L
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
    val flagged = ev
      .withColumn("prev_ts", lag("ts_us", 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1)
          .otherwise(0))
      .withColumn("rn", row_number().over(w))
      .withColumn("cum", exactCum(col("value"), run))
    val anchored = flagged
      .withColumn("session_idx", sum(col("is_new").cast("long")).over(run))
      .withColumn("start_us",
        last(when(col("is_new") === 1, col("ts_us")), ignoreNulls = true).over(run))
      .withColumn("first_rn",
        last(when(col("is_new") === 1, col("rn")), ignoreNulls = true).over(run))
      .withColumn("cum_before",
        last(when(col("is_new") === 1,
          col("cum") - col("value").cast("decimal(30,6)")), ignoreNulls = true).over(run))
      .withColumn("next_is_new", lead("is_new", 1).over(w))
    anchored
      .filter(col("next_is_new").isNull || col("next_is_new") === 1)
      .select(col("user_id"), col("session_idx"),
        col("start_us"), col("ts_us").as("end_us"),
        (col("rn") - col("first_rn") + 1).cast("long").as("n_events"),
        (col("cum") - col("cum_before")).cast("double").as("value_sum"))
  }

  /** Sessionization through Spark's NATIVE session_window TVF — the
    * q_topk_native convention: the same analysis as [[sessionize]]
    * expressed through the built-in operator so the engine's dynamic
    * gap-merge machinery (SessionWindowStateStore in streaming, merged
    * windows in batch) is on the record next to the composed
    * window-function form. One semantic difference, pinned by its own
    * oracle: the native window [t, t+gap) merges a successor only when
    * diff < gap (STRICT), while the composed form starts a new session
    * on diff > gap — at diff == gap exactly they disagree, so this
    * entry's oracle mirrors the strict rule rather than hash-sharing
    * q_sessionize's. Output end_us subtracts the gap Spark adds to the
    * window end (native end = last event + gap). Plan: one shuffle on
    * user_id, no window sort — the TVF aggregates directly.
    */
  def sessionizeNative(s: SparkSession, dir: String,
                       gapSec: Long = Behavior.DefaultSessionGapSec): DataFrame = {
    require(gapSec > 0, "session gap must be positive")
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSec seconds"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(30,6)")).as("vs"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        (unix_micros(col("session_window.end")) - lit(gapSec * 1000000L))
          .as("end_us"),
        col("n_events"), col("vs").cast("double").as("value_sum"))
  }

  /** Strictly-ordered conversion funnel view → click → purchase: a stage
    * counts only when an event of the PREVIOUS stage happened strictly
    * earlier in the user's (ts, event_id) order. Each stage predicate is
    * a running `min` over the frame (unboundedPreceding → -1 row), so
    * stage N's qualifying timestamp is known the moment stage N-1's
    * earliest qualifier has passed — one pass, no self-joins (the naive
    * form is a 3-way self-join on user_id, per-key quadratic on busy
    * users). The per-user reduction then reuses the window's hash
    * partitioning (groupBy(user_id) after partitionBy(user_id) adds NO
    * exchange), and the final stage-count fold is a scalar reduce.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
    val staged = ev
      .withColumn("first_view_before",
        min(when(col("event_type") === "view", col("ts_us"))).over(before))
      .withColumn("qual_click",
        when(col("event_type") === "click" && col("first_view_before").isNotNull,
          col("ts_us")))
      .withColumn("first_qual_click_before", min(col("qual_click")).over(before))
      .withColumn("qual_purchase",
        when(col("event_type") === "purchase" &&
          col("first_qual_click_before").isNotNull, col("ts_us")))
    staged.groupBy("user_id")
      .agg(
        max((col("event_type") === "view").cast("int")).as("v"),
        max(col("qual_click").isNotNull.cast("int")).as("vc"),
        max(col("qual_purchase").isNotNull.cast("int")).as("vcp"))
      .agg(
        sum(col("v")).cast("long").as("n_view"),
        sum(col("vc")).cast("long").as("n_view_click"),
        sum(col("vcp")).cast("long").as("n_view_click_purchase"))
  }

  /** Weekly cohort retention on pure integer day arithmetic (no calendar
    * functions — `unix day div 7` is bit-identical in every engine): a
    * user's cohort is the week of their first event, and each (cohort,
    * week-offset) cell counts the distinct users active that week.
    * first_day is a partition-wide window min (the user partition is
    * the only wide exchange for it); the cell count is Spark's two-phase
    * distinct aggregate — partial distinct per map side, so the shuffle
    * carries (cohort, offset, user) triples already deduplicated per
    * partition, not raw events.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    val withFirst = ev.withColumn("first_day",
      min("day").over(Window.partitionBy("user_id")))
    withFirst
      .withColumn("cohort_week", expr("first_day div 7"))
      .withColumn("week_offset", expr("(day - first_day) div 7"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
  }
}
