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
  * bucket inside the watermark horizon — NOT samples (the fused verbs
  * fold online; the counter verbs rate/increase and the distribution
  * verbs avg/stddev/stdvar/quantile keep open-bucket samples, the
  * honest price of exact order-dependent growth / per-series
  * distribution shape under out-of-order arrival — see [[Verbs]] and
  * [[DistVerbs]]) — and never corpus- or
  * history-sized. Evaluation is
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
                     open: Map[Long, (Long, String, Double, Double)],
                     samp: Map[Long, Seq[(Long, Long, Long, Double)]] =
                       Map.empty)
  case class AlertOut(step: Long, event_type: String,
                      alertstate: String, value: Double)

  /** The condition's per-bucket aggregate — the fused streaming verb
    * set: `count` (count_over_time), `sum` (sum_over_time, the exactSum
    * decimal contract — streamed values BIT-EQUAL to the batch expr),
    * `min`/`max` (min/max_over_time), each an O(1) online partial per
    * open bucket; plus the COUNTER verbs `rate`/`increase` (round 17 —
    * the Prometheus-standard error-rate alert shape,
    * `sum by (event_type)(rate({…}[W])) > c`). Counter verbs cannot
    * fold online under out-of-order arrival (sample ORDER decides the
    * reset-corrected growth), so their open buckets keep the SAMPLES
    * — (user_id, µs, event_id, value) — and evaluate at bucket close:
    * per-series lag growth with the stored-value baseline, per-pair
    * decimal(30,6) quantization, per-series rate = increase / W, then
    * the vector exactSum over series — the batch evaluator's chain
    * operation for operation, so streamed values stay bit-equal. State
    * for counter verbs is bounded by the samples inside the watermark
    * horizon (open buckets only — closed buckets drop their samples),
    * the same bound any stream-stream join carries; the other verbs
    * stay O(1) per bucket.
    */
  val Verbs: Set[String] = Set("count", "sum", "min", "max",
    "rate", "increase", "avg", "stddev", "stdvar", "quantile")
  private val CounterVerbs: Set[String] = Set("rate", "increase")

  /** DISTRIBUTION verbs (round 17): `avg` (avg_over_time), `stddev`/
    * `stdvar` (*_over_time), `quantile` (quantile_over_time at `q`) —
    * the alert shape `sum by (event_type)(<verb>(sel[W])) > c`. These
    * are per-SERIES verbs (avg of a series' window ≠ avg of the
    * bucket's pooled samples), so like the counters they cannot fold
    * from the event_type-grain quadruple; their open buckets ride the
    * SAME sample channel and evaluate the batch evaluator's exact
    * per-series chain at close ([[distBucketValue]]). One shared
    * channel serves rate/increase/avg/stddev/stdvar/quantile alerts —
    * state bounded by the samples inside the watermark horizon, the
    * stream-stream-join bound the counters already pay.
    */
  private[streaming] val DistVerbs: Set[String] =
    Set("avg", "stddev", "stdvar", "quantile")
  private[streaming] val SampleVerbs: Set[String] = CounterVerbs ++ DistVerbs

  /** shortest-repr HALF_UP at 6 dp — the engine's decimal(30,6)
    * per-sample quantization on the JVM (PromqlStream.decimal6Sum's
    * op). Accumulated in BigDecimal (never a scaled long): exact over
    * the batch contract's full 1e24 range (ADVICE r15).
    */
  private def q6(v: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)

  /** The counter-verb bucket value from the bucket's raw samples —
    * the batch evaluator's exact chain (Promql.rangeApply's
    * rate|increase case followed by the vector exactSum): per
    * (user_id) series, sort by (µs, event_id), reset-corrected growth
    * with the stored-value baseline (first in-window sample grows 0),
    * each pair's growth quantized at decimal(30,6) and decimal-summed;
    * rate divides the per-series increase by W in double; the vector
    * sum quantizes each per-series value at decimal(30,6) and
    * decimal-sums. Every operation mirrors the batch expression, so
    * the streamed value is bit-equal. Shared with AlertGroupStream.
    */
  private[streaming] def counterBucketValue(verb: String, wSec: Long,
      rows: Seq[(Long, Long, Long, Double)]): Double = {
    val perSeries = rows.groupBy(_._1).valuesIterator.map { rs =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      var acc = java.math.BigDecimal.ZERO
      var prev = 0.0
      var first = true
      for (r <- sorted) {
        if (!first) {
          val g = if (r._4 >= prev) r._4 - prev else r._4
          acc = acc.add(q6(g))
        }
        prev = r._4
        first = false
      }
      val inc = acc.doubleValue
      if (verb == "rate") inc / wSec.toDouble else inc
    }
    perSeries.map(q6).reduce(_ add _).doubleValue
  }

  /** The distribution-verb bucket value from the bucket's raw samples
    * — the batch evaluator's exact per-series chain (Promql.rangeApply)
    * followed by the vector exactSum, operation for operation:
    *   - avg: exactSum (per-value decimal(30,6) quantize, decimal
    *     accumulate, ONE double lowering) divided by the count in
    *     double — the `exactSum / count` expression;
    *   - stddev/stdvar: the ExactNum derivation — quantize at 6 dp,
    *     square IN DECIMAL (scale 12, exact), decimal-sum both
    *     accumulators, then `(qq − s·s/n)/n` in double with the
    *     negative clamp, sqrt for stddev;
    *   - quantile: the house DISCRETE quantile — sorted stored values
    *     picked at max(1, ceil(round(n·q, 9))), the ceilPos rounding
    *     guard included (0.95·20 must not ceil one position high).
    * Then each per-series value quantizes at decimal(30,6) and
    * decimal-sums (the vector exactSum). Shared with AlertGroupStream.
    */
  private[streaming] def distBucketValue(verb: String, q: Double,
      rows: Seq[(Long, Long, Long, Double)]): Double = {
    val perSeries = rows.groupBy(_._1).valuesIterator.map { rs =>
      val vs = rs.map(_._4)
      val n = vs.size
      verb match {
        case "avg" =>
          vs.map(q6).reduce(_ add _).doubleValue / n
        case "stddev" | "stdvar" =>
          val s = vs.map(q6).reduce(_ add _).doubleValue
          val qq = vs.map { v => val d = q6(v); d.multiply(d) }
            .reduce(_ add _).doubleValue
          val variance = (qq - s * s / n) / n
          val guarded = if (variance < 0.0) 0.0 else variance
          if (verb == "stddev") math.sqrt(guarded) else guarded
        case "quantile" =>
          val pos = math.max(1L, math.ceil(java.math.BigDecimal
            .valueOf(n.toDouble * q)
            .setScale(9, java.math.RoundingMode.HALF_UP)
            .doubleValue).toLong)
          vs.sorted.apply((pos - 1).toInt)
      }
    }
    perSeries.map(q6).reduce(_ add _).doubleValue
  }

  /** Run the rule over the parquet file stream at `inDir`. Caller owns
    * the sink (Append). `metricRe` anchors like a PromQL =~ matcher;
    * `verb` picks the per-bucket aggregate the threshold compares
    * against (see [[Verbs]]).
    */
  def run(s: SparkSession, inDir: String, metricRe: String, wSec: Long,
          threshold: Double, forSec: Long, keepSec: Long,
          delay: String = "1 hour", verb: String = "count",
          q: Double = 0.5): DataFrame = {
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
        col("value").cast("double").as("value"),
        col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"), col("ts"))
      .as[(String, Long, Double, Long, Long, java.sql.Timestamp)]
    val isCounter = CounterVerbs(verb)
    val isDist = DistVerbs(verb)
    val isSample = isCounter || isDist

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
          val byBucket = rows.toSeq.groupBy(r => bucketOf(r._2))
          if (byBucket.nonEmpty) {
            val wmBucket = Math.floorDiv(
              Math.floorDiv(state.getCurrentWatermarkMs(), 1000L), W) * W
            val floor0 =
              if (st.cursor == Long.MinValue) math.min(byBucket.keys.min, wmBucket)
              else st.cursor
            val admitted = byBucket.filter(_._1 >= floor0)
            val open =
              if (isSample) st.open // sample-verb buckets keep samples
              else admitted.view.mapValues { rs =>
                val vs = rs.map(_._3)
                (rs.size.toLong,
                  vs.map(q6).reduce(_ add _).toPlainString, vs.min, vs.max)
              }.foldLeft(st.open) {
                case (m, (b, (n, s6, mn, mx))) =>
                  val prev = m.getOrElse(b,
                    (0L, "0", Double.MaxValue, Double.MinValue))
                  m.updated(b, (prev._1 + n,
                    new java.math.BigDecimal(prev._2)
                      .add(new java.math.BigDecimal(s6)).toPlainString,
                    math.min(prev._3, mn), math.max(prev._4, mx)))
              }
            val samp =
              if (!isSample) st.samp
              else admitted.foldLeft(st.samp) { case (m, (b, rs)) =>
                m.updated(b, m.getOrElse(b, Seq.empty) ++
                  rs.map(r => (r._4, r._2, r._5, r._3)))
              }
            st = st.copy(open = open, samp = samp,
              cursor = if (st.cursor == Long.MinValue) floor0 else st.cursor)
          }

          // evaluate every grid step whose bucket closed at or before
          // the watermark, in order — data-less steps included
          val wmSec = Math.floorDiv(state.getCurrentWatermarkMs(), 1000L)
          val out = scala.collection.mutable.ArrayBuffer.empty[AlertOut]
          var done = st.cursor == Long.MinValue
          def dataKeys: Iterable[Long] =
            if (isSample) st.samp.keys else st.open.keys
          while (!done && st.cursor + W <= wmSec) {
            if (st.mode == 0) {
              // inactive: empty buckets can emit nothing — jump the
              // cursor to the next bucket that has data
              val future = dataKeys.filter(_ >= st.cursor)
              if (future.isEmpty) done = true
              else st = st.copy(cursor = math.max(st.cursor, future.min))
            }
            if (!done && st.cursor + W <= wmSec) {
              val step = st.cursor
              // a data-less bucket is NOT held whatever the verb and
              // threshold — the batch expr emits no row for it (an
              // absent instant vector), so no synthetic 0 compare
              val value =
                if (isCounter)
                  st.samp.get(step).map(counterBucketValue(verb, W, _))
                else if (isDist)
                  st.samp.get(step).map(distBucketValue(verb, q, _))
                else st.open.get(step).map { case (n, s6, mn, mx) =>
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
              st = st.copy(open = st.open - step, samp = st.samp - step,
                cursor = step + W)
            }
          }

          if (st.mode == 0 && st.open.isEmpty && st.samp.isEmpty)
            state.remove()
          else {
            state.update(st)
            // next evaluation: the earliest bucket whose close we are
            // waiting for — cursor's own end while active (missed
            // evals matter), else the earliest open bucket's end;
            // −1 ms so wm == bucket end fires
            val nextEnd =
              if (st.mode != 0) st.cursor + W
              else dataKeys.min + W
            state.setTimeoutTimestamp(math.max(nextEnd * 1000L - 1L,
              state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
      .toDF()
  }
}
