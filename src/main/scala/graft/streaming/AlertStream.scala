package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** ALERTING RULES MAINTAINED ONLINE — the streaming twin of
  * operators.Alerts: the pending→firing `for:` clock with
  * `keep_firing_for:` hysteresis, evaluated continuously over the
  * ingest stream as the watermark advances (the Prometheus ruler's
  * evaluation loop, re-expressed as one stateful operator).
  *
  * The rule shape is the streaming window-local subset's: a fused
  * per-(event_type, tumbling W) aggregate — count, sum (exact decimal
  * contract), min, or max over the window — compared against a
  * threshold; the batch twin is
  * `sum by (event_type)(<verb>_over_time({event_type=~re}[W])) > c`
  * under the tumbling evaluation. AlertStreamSpec proves the stream's
  * emissions row-for-row AND value-exactly equal to Alerts.alertStates
  * over the batch evaluation of the same condition, including
  * extension rows.
  *
  * State per series is O(1) + one (n, Σ, min, max) partial per open
  * bucket inside the watermark horizon — NOT samples (every supported
  * verb folds online), and never corpus- or history-sized. Evaluation is
  * timeout-driven: a bucket is processed once the watermark reaches its
  * end, INCLUDING buckets with no data (missed evals — where pending
  * drops and firing extends), which a pure aggregation could never
  * emit. Timeouts anchor at bucket-end − 1 ms so a watermark landing
  * exactly on a bucket boundary still fires (the
  * RollupMaintainStream boundary lesson).
  *
  * Append-exact: each (series, step) emits at most once, across
  * restarts (checkpointed state; the grid cursor is part of the state).
  */
object AlertStream {

  /** Per-series state: `cursor` = next grid step to evaluate (epoch
    * sec; MinValue sentinel = uninitialized), `mode` 0=inactive,
    * 1=pending, 2=firing, plus the open-bucket partial aggregates —
    * (n, exact decimal sum as a plain string, min, max) per bucket,
    * O(1) per open bucket whatever the verb. The sum partial is a
    * BigDecimal serialized via toPlainString, NOT a scaled long: the
    * batch contract is decimal(30,6) (exact up to 1e24), and a scaled
    * long would silently wrap past ~9.2e12 (ADVICE r15) — string state
    * keeps the accumulator exact over the full decimal range. (Public:
    * Spark's codegen'd encoders instantiate these from generated Java.)
    */
  case class AlState(cursor: Long, mode: Int, activeAt: Long,
                     lastHeld: Long, lastValue: Double,
                     open: Map[Long, (Long, String, Double, Double)])
  case class AlertOut(step: Long, event_type: String,
                      alertstate: String, value: Double)

  /** The condition's per-bucket aggregate — the fused streaming verb
    * set, each an O(1) online partial: `count` (count_over_time),
    * `sum` (sum_over_time, per-sample decimal(30,6) quantization
    * replicated as scaled-long arithmetic — the exactSum contract, so
    * the streamed value is BIT-EQUAL to the batch expr), `min`/`max`
    * (min/max_over_time).
    */
  val Verbs: Set[String] = Set("count", "sum", "min", "max")

  /** shortest-repr HALF_UP at 6 dp — the engine's decimal(30,6)
    * per-sample quantization on the JVM (PromqlStream.decimal6Sum's
    * op). Accumulated in BigDecimal (never a scaled long): exact over
    * the batch contract's full 1e24 range (ADVICE r15).
    */
  private def q6(v: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)

  /** Run the rule over the parquet file stream at `inDir`. Caller owns
    * the sink (Append). `metricRe` anchors like a PromQL =~ matcher;
    * `verb` picks the per-bucket aggregate the threshold compares
    * against (see [[Verbs]]).
    */
  def run(s: SparkSession, inDir: String, metricRe: String, wSec: Long,
          threshold: Double, forSec: Long, keepSec: Long,
          delay: String = "1 hour", verb: String = "count"): DataFrame = {
    import s.implicits._
    require(wSec > 0 && forSec >= 0 && keepSec >= 0, "bad rule params")
    require(Verbs.contains(verb), s"verb must be one of $Verbs, got $verb")
    // keep_firing_for ceiled to the grid — the exact KeepFiringSince
    // anchoring, in lockstep with the batch machine (operators.Alerts)
    val keepG =
      if (keepSec <= 0L) 0L else ((keepSec + wSec - 1L) / wSec) * wSec
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = Ingest.eventsStream(s, inDir)
      .filter(col("ts").isNotNull)
      .withWatermark("ts", delay)
      // the selector disjunct pins this filter ABOVE the watermark
      // node (never true for real rows): every ingested event drives
      // the global event clock, whatever the rule selects — a quiet
      // metric's open buckets must not starve (the PromqlStream
      // watermark-pinning lesson)
      .filter(col("event_type").rlike(s"^(?:$metricRe)$$") || col("ts").isNull)
      // ts rides along: the watermark column must survive projection
      // for EventTimeTimeout to resolve it
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("value").cast("double").as("value"), col("ts"))
      .as[(String, Long, Double, java.sql.Timestamp)]

    src.groupByKey(_._1)
      .flatMapGroupsWithState[AlState, AlertOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state) =>
          val W = wSec
          def bucketOf(us: Long): Long =
            Math.floorDiv(Math.floorDiv(us, 1000000L), W) * W
          var st = state.getOption.getOrElse(
            AlState(Long.MinValue, 0, 0L, 0L, 0.0, Map.empty))

          // fold arriving samples into open-bucket partial counts.
          // Cursor initialization must NOT trust the first batch's min
          // bucket: an admitted row's event time is >= the watermark,
          // so any bucket >= floor(wm/W)·W can still receive data — a
          // series first seen in a LATER bucket must keep earlier
          // still-open buckets admissible (initializing from the first
          // arrival would silently drop an in-watermark out-of-order
          // sample and diverge from the batch machine). After
          // initialization the invariant cursor <= floor(wm/W)·W holds
          // (processing stops at cursor + W <= wm), so the >= cursor
          // guard below never drops an admissible row — it only keeps
          // a stray late row from wedging a finalized bucket into
          // `open` forever.
          val arrived = rows.toSeq.groupBy(r => bucketOf(r._2))
            .view.mapValues { rs =>
              val vs = rs.map(_._3)
              (rs.size.toLong,
                vs.map(q6).reduce(_ add _).toPlainString, vs.min, vs.max)
            }.toMap
          if (arrived.nonEmpty) {
            val wmBucket = Math.floorDiv(
              Math.floorDiv(state.getCurrentWatermarkMs(), 1000L), W) * W
            val floor0 =
              if (st.cursor == Long.MinValue) math.min(arrived.keys.min, wmBucket)
              else st.cursor
            val open = arrived.filter(_._1 >= floor0).foldLeft(st.open) {
              case (m, (b, (n, s6, mn, mx))) =>
                val prev = m.getOrElse(b,
                  (0L, "0", Double.MaxValue, Double.MinValue))
                m.updated(b, (prev._1 + n,
                  new java.math.BigDecimal(prev._2)
                    .add(new java.math.BigDecimal(s6)).toPlainString,
                  math.min(prev._3, mn), math.max(prev._4, mx)))
            }
            st = st.copy(open = open,
              cursor = if (st.cursor == Long.MinValue) floor0 else st.cursor)
          }

          // evaluate every grid step whose bucket closed at or before
          // the watermark, in order — data-less steps included
          val wmSec = Math.floorDiv(state.getCurrentWatermarkMs(), 1000L)
          val out = scala.collection.mutable.ArrayBuffer.empty[AlertOut]
          var done = st.cursor == Long.MinValue
          while (!done && st.cursor + W <= wmSec) {
            if (st.mode == 0) {
              // inactive: empty buckets can emit nothing — jump the
              // cursor to the next bucket that has data
              val future = st.open.keys.filter(_ >= st.cursor)
              if (future.isEmpty) done = true
              else st = st.copy(cursor = math.max(st.cursor, future.min))
            }
            if (!done && st.cursor + W <= wmSec) {
              val step = st.cursor
              // a data-less bucket is NOT held whatever the verb and
              // threshold — the batch expr emits no row for it (an
              // absent instant vector), so no synthetic 0 compare
              val agg = st.open.get(step)
              val value = agg.map { case (n, s6, mn, mx) =>
                verb match {
                  case "count" => n.toDouble
                  case "sum" => new java.math.BigDecimal(s6).doubleValue
                  case "min" => mn
                  case "max" => mx
                }
              }
              val held = value.exists(_ > threshold)
              if (held) {
                val v = value.get
                if (st.mode == 0) st = st.copy(mode = 1, activeAt = step)
                if (st.mode == 1 && step - st.activeAt >= forSec)
                  st = st.copy(mode = 2)
                st = st.copy(lastHeld = step, lastValue = v)
                out += AlertOut(step, key,
                  if (st.mode == 2) "firing" else "pending", v)
              } else st.mode match {
                case 1 => st = st.copy(mode = 0) // pending drops at once
                case 2 =>
                  if (keepG > 0 && step - st.lastHeld <= keepG)
                    out += AlertOut(step, key, "firing", st.lastValue)
                  else st = st.copy(mode = 0) // resolved
                case _ => ()
              }
              st = st.copy(open = st.open - step, cursor = step + W)
            }
          }

          if (st.mode == 0 && st.open.isEmpty) state.remove()
          else {
            state.update(st)
            // next evaluation: the earliest bucket whose close we are
            // waiting for — cursor's own end while active (missed
            // evals matter), else the earliest open bucket's end;
            // −1 ms so wm == bucket end fires
            val nextEnd =
              if (st.mode != 0) st.cursor + W
              else st.open.keys.min + W
            state.setTimeoutTimestamp(math.max(nextEnd * 1000L - 1L,
              state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
      .toDF()
  }
}
