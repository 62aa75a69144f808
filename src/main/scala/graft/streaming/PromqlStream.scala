package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.operators.Promql
import graft.operators.Promql.{Agg, Expr, RangeFunc, Selector}

/** PromQL over Structured Streaming — the online leg of the query
  * engine (the reference's architecture converts live TSDB blocks and
  * serves reads from them; Spark-first, the same PromQL text compiles
  * to a watermarked streaming aggregation over the ingest directory).
  *
  * The STREAMABLE subset is the window-local, order-independent part of
  * the grammar, compiled to a SINGLE streaming aggregation:
  *
  *   - `rangefn(metric{matchers}[W])` for rangefn in count/sum/avg/min/
  *     max/last/present/stddev/stdvar_over_time — per-series tumbling
  *     windows (stddev/stdvar are exact Σv/Σv² decimal identities, so
  *     they fuse like the others);
  *   - `agg [by(labels)] (rangefn(metric{matchers}[W]))` where the
  *     cross-series agg FUSES with the per-series verb into one
  *     aggregation by an exact algebraic identity
  *     (sum∘sum_over_time = sum, sum∘count_over_time = count,
  *     min∘min_over_time = min, max∘max_over_time = max — decimal
  *     sums are associative/commutative, so the fusion is
  *     hash-identical to the batch two-level form);
  *   - a bare `metric{matchers}` instant vector (last sample per series
  *     per hourly step, a max_by aggregation);
  *   - the ORDER-DEPENDENT window-local verbs — rate/increase,
  *     quantile_over_time, delta, irate/idelta, changes/resets, deriv,
  *     predict_linear, holt_winters —
  *     via flatMapGroupsWithState: per-(series, window) state buffers
  *     the window's samples, and the batch evaluator's fold runs ONCE
  *     per window when the event-time watermark passes the window end
  *     (Append-exact: each window emits exactly once, with the samples
  *     sorted by (ts, event_id) exactly as the batch evaluator sorts
  *     them, the same decimal(30,6) HALF_UP accumulation, the same
  *     quantile position rule, the same <2-sample/zero-spread drops —
  *     proven row-for-row equal in StreamPromqlSpec).
  *
  * Fusing matters structurally: the naive translation is TWO chained
  * stateful aggregations (per-series window, then cross-series), which
  * Structured Streaming heavily restricts; the fused form is one
  * stateful operator with partial aggregation before the shuffle —
  * the same state bound as [[StreamAgg.windowedCounts]].
  *
  * Everything else (cross-series quantile/topk aggs, joins, subqueries,
  * offset/@) is cross-window-dependent or needs more state than a
  * window's own samples and raises — evaluate those in batch over the
  * ingested output instead (same files).
  *
  * Matchers compile to filters on the label cast to string (PromQL
  * labels are strings), `=~`/`!~` fully anchored as PromQL requires.
  * The tumbling windows are epoch-aligned exactly like the batch
  * evaluator's stepOf, so results are comparable row-for-row with
  * [[Promql.query]] over the same data — StreamPromqlSpec asserts
  * equality.
  */
object PromqlStream {

  private val verbValue: Map[String, Column] = {
    val exactSum = graft.functions.ExactNum.exactSum(col("value"))
    val tkey = struct(unix_micros(col("ts")), col("event_id"))
    // stddev/stdvar are window-local AND order-independent (exact
    // Σv/Σv² in decimal) — they stream as plain fused aggregations,
    // same formula as the batch evaluator's rangeOver case
    val variance =
      (graft.functions.ExactNum.exactSumSq(col("value"))
        - exactSum * exactSum / count(lit(1))) / count(lit(1))
    val guarded = when(variance < 0.0, lit(0.0)).otherwise(variance)
    // the ts_of_* family and first_over_time are arg-extremum picks
    // over the unique (value?, ts, event_id) key — order-independent,
    // so they stream as fused aggregations with the batch evaluator's
    // exact tie rules (latest extremum wins for ts_of_max/min)
    val us = unix_micros(col("ts"))
    Map(
      "count_over_time" -> count(lit(1)).cast("double"),
      "sum_over_time" -> exactSum,
      "avg_over_time" -> (exactSum / count(lit(1))),
      "min_over_time" -> min(col("value")),
      "max_over_time" -> max(col("value")),
      "last_over_time" -> max_by(col("value"), tkey),
      "first_over_time" -> min_by(col("value"), tkey),
      "ts_of_last_over_time" -> (max(us) / lit(1e6)),
      "ts_of_max_over_time" ->
        (max_by(us, struct(col("value"), us, col("event_id"))) / lit(1e6)),
      "ts_of_min_over_time" ->
        (min_by(us, struct(col("value"), negate(us), negate(col("event_id")))) / lit(1e6)),
      "present_over_time" -> max(lit(1.0)),
      "stddev_over_time" -> sqrt(guarded),
      "stdvar_over_time" -> guarded,
      // native-histogram HEADER verbs are plain fused aggregations;
      // the bucket-estimator pair (histogram_stddev/stdvar/fraction)
      // needs a two-level bucket agg — batch-only, rejected here
      "histogram_count" -> count(lit(1)).cast("double"),
      "histogram_sum" -> exactSum,
      "histogram_avg" -> (exactSum / count(lit(1))))
  }

  /** (outer agg, inner verb) → fused single-aggregation value column —
    * only the exact identities; anything else is rejected rather than
    * approximated.
    */
  private val fused: Map[(String, String), Column] = Map(
    ("sum", "sum_over_time") -> graft.functions.ExactNum.exactSum(col("value")),
    ("sum", "count_over_time") -> count(lit(1)).cast("double"),
    ("min", "min_over_time") -> min(col("value")),
    ("max", "max_over_time") -> max(col("value")))

  /** Parse + compile `q` to a streaming DataFrame over the parquet file
    * stream at `inDir` (the ingest layout: raw event rows). The caller
    * owns the sink: Append + the watermark for live runs, Complete +
    * AvailableNow for backlog proofs.
    */
  def query(s: SparkSession, inDir: String, q: String,
            watermarkDelay: String = "1 hour"): DataFrame =
    compile(stream(s, inDir, watermarkDelay), Promql.parse(q))

  private def stream(s: SparkSession, inDir: String, delay: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // null-ts rows are dropped BEFORE the watermark (they carry no
    // event time), so applySel's `ts IS NULL` pin-above disjunct can
    // never actually admit a row
    Ingest.eventsStream(s, inDir)
      .filter(col("ts").isNotNull)
      .withWatermark("ts", delay)
  }

  private def notStreamable(what: String): Nothing =
    throw new IllegalArgumentException(
      s"not streamable: $what — the streaming subset is " +
        "[sum|min|max by(...)] (count|sum|avg|min|max|last|first|" +
        "present|stddev|stdvar|ts_of_last|ts_of_max|ts_of_min" +
        "_over_time(metric{matchers}[W])), the buffered " +
        "window-local verbs (rate|increase|quantile_over_time|delta|" +
        "irate|idelta|changes|resets|deriv|predict_linear|" +
        "holt_winters), or a bare selector; run cross-window queries " +
        "in batch over the ingested files")

  /** Named-metric, unmodified selectors only: offsets/@/derived labels
    * belong to the batch evaluator.
    */
  private def checkSel(sel: Selector): Unit = {
    if (sel.metric.isEmpty) notStreamable("metric-less selector")
    if (sel.offsetSec != 0) notStreamable("offset")
    if (sel.atSec.isDefined) notStreamable("@ modifier")
    if (sel.extraLabels.nonEmpty) notStreamable("derived labels")
  }

  /** Selector filters, kept ABOVE the EventTimeWatermark node.
    *
    * The watermark is the stream's GLOBAL event clock: stats are
    * collected by the EventTimeWatermarkExec operator, and Catalyst's
    * PushPredicateThroughNonJoin pushes any predicate that doesn't
    * reference the watermark column below that operator — after which
    * only the selected metric's rows would advance the clock, and a
    * quiet metric's last open windows would starve FOREVER while other
    * events keep flowing (observed: delta(purchase[6h])'s final window
    * never fired with later click data present). A disjunct on the
    * watermark column itself (`ts IS NULL`, never true for real rows —
    * timestamp_micros of a non-null long) pins the filter above the
    * node, so every ingested event drives the clock, whatever the
    * query selects — the reference's convert pipeline tracks global
    * maxt the same way (db/writer.go compaction watermarks).
    */
  private def applySel(df: DataFrame, sel: Selector): DataFrame = {
    val base: Column = col("event_type") === sel.metric
    val pred = sel.matchers.foldLeft(base) { case (p, (name, op, v)) =>
      val c = col(name).cast("string")
      p && (op match {
        case "=" => c === v
        case "!=" => c.isNull || c =!= v
        case "=~" => c.rlike(s"^(?:$v)$$")
        case "!~" => c.isNull || !c.rlike(s"^(?:$v)$$")
        case other => notStreamable(s"matcher $other")
      })
    }
    df.filter(pred || col("ts").isNull)
  }

  private def windowed(df: DataFrame, rangeSec: Long, labels: Seq[String],
                       value: Column): DataFrame =
    df.groupBy(window(col("ts"), s"$rangeSec seconds") +: labels.map(col): _*)
      .agg(value.as("value"))
      .select(unix_timestamp(col("window.start")).as("step") +:
        (labels.map(col) :+ col("value")): _*)

  /** One buffered sample; `us` is epoch micros. (These state/output
    * case classes are public: Spark's codegen'd encoders instantiate
    * them from generated Java, which cannot see a private constructor.)
    */
  case class RateSample(us: Long, event_id: Long, value: Double)
  case class RateWindow(samples: Seq[RateSample])
  case class RateOut(step: Long, user_id: Long, value: Double)

  /** The batch evaluator's reset-aware window fold, replicated
    * bit-for-bit on the JVM: samples sorted by (ts, event_id); growth is
    * v − prev normally, v after a counter reset, 0 for the window's
    * first sample; each growth double is quantized to decimal scale 6
    * HALF_UP (Spark's cast(double as decimal(30,6)) on the shortest
    * decimal string, = BigDecimal.valueOf) and summed exactly; the
    * exact sum lowers to double (= cast(decimal as double)), and rate
    * divides by the window in double. Same formula, same roundings,
    * same order — StreamPromqlSpec asserts value-identical rows.
    */
  /** Spark SQL's double comparison semantics on the JVM: NaN equals
    * NaN and sorts greater than everything; -0.0 equals 0.0. Primitive
    * Java comparisons disagree on both (NaN != NaN is true, NaN >= x
    * is false), which would break the folds' row-for-row equality with
    * the batch evaluator on NaN samples.
    */
  private def sqlCmp(a: Double, b: Double): Int = {
    def norm(v: Double) = if (v == 0.0) 0.0 else v
    java.lang.Double.compare(norm(a), norm(b))
  }

  /** cast(double as decimal(30,6)) → sum → cast(double), replicated on
    * the JVM: Spark's decimal cast rounds the shortest decimal string
    * (BigDecimal.valueOf) HALF_UP — the exactSum contract.
    */
  private def decimal6Sum(vs: Iterator[Double]): Double = {
    var acc = java.math.BigDecimal.ZERO
    vs.foreach(v => acc = acc.add(java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)))
    acc.doubleValue
  }

  private def foldRate(samples: Seq[RateSample],
                       isRate: Boolean, rangeSec: Long): Option[Double] = {
    val sorted = samples.sortBy(r => (r.us, r.event_id))
    var prev = 0.0
    var first = true
    val inc = decimal6Sum(sorted.iterator.map { r =>
      val growth =
        if (first) 0.0
        else if (sqlCmp(r.value, prev) >= 0) r.value - prev
        else r.value
      first = false
      prev = r.value
      growth
    })
    Some(if (isRate) inc / rangeSec.toDouble else inc)
  }

  /** The batch evaluator's discrete stored-value quantile
    * (ExactNum.quantilePos): k-th smallest with
    * k = max(1, ceil(round(n·φ, 9))).
    */
  private[graft] def foldQuantile(samples: Seq[RateSample], q: Double): Option[Double] = {
    // normalize -0.0 to 0.0 BEFORE sorting: Scala's total ordering puts
    // -0.0 < 0.0, the batch evaluator's SQL comparisons don't — a window
    // holding both must emit the same representative as batch
    val sorted = samples.map(r => if (r.value == 0.0) 0.0 else r.value).sorted
    val pos = math.max(1L, math.ceil(
      java.math.BigDecimal.valueOf(sorted.length * q)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue).toLong)
    // φ > 1 puts pos past n; batch simply emits no row — mirror that
    // instead of letting the index throw and kill the streaming query
    if (pos > sorted.length) None else Some(sorted((pos - 1).toInt))
  }

  /** mad_over_time: the double discrete median (value median, then
    * |v − med| median) — both picks the ceil(0.5·n) rank statistic,
    * matching the batch evaluator's histogram picks exactly (ties
    * collapse by value in both; deviations are ≥ 0 so the −0.0 hazard
    * only touches the value pass, normalized like foldQuantile).
    */
  private[graft] def foldMad(samples: Seq[RateSample]): Option[Double] = {
    def pick(vs: Seq[Double]): Option[Double] = {
      val sorted = vs.sorted
      val pos = math.max(1L, math.ceil(
        java.math.BigDecimal.valueOf(sorted.length * 0.5)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue).toLong)
      if (pos > sorted.length) None else Some(sorted((pos - 1).toInt))
    }
    val vals = samples.map(r => if (r.value == 0.0) 0.0 else r.value)
    pick(vals).flatMap(m => pick(vals.map(v => math.abs(v - m))))
  }

  /** newest − oldest by (ts, event_id) — batch delta's max_by/min_by. */
  private def foldDelta(samples: Seq[RateSample]): Option[Double] = {
    val newest = samples.maxBy(r => (r.us, r.event_id))
    val oldest = samples.minBy(r => (r.us, r.event_id))
    Some(newest.value - oldest.value)
  }

  /** Last two samples of the window (batch irate/idelta): Prometheus
    * instantValue — needs two samples, drops zero-elapsed pairs, irate
    * is counter-reset aware.
    */
  private def foldInstant(samples: Seq[RateSample], isRate: Boolean): Option[Double] = {
    if (samples.size < 2) return None
    val d = samples.sortBy(r => (-r.us, -r.event_id))
    val (s1, s2) = (d(0), d(1)) // newest, second-newest
    if (s1.us == s2.us) None
    else if (!isRate) Some(s1.value - s2.value)
    else {
      val growth =
        if (sqlCmp(s1.value, s2.value) >= 0) s1.value - s2.value else s1.value
      Some(growth / ((s1.us - s2.us) / 1e6))
    }
  }

  /** changes()/resets(): lag comparisons in (ts, event_id) order. */
  private def foldChanges(samples: Seq[RateSample], resets: Boolean): Option[Double] = {
    val sorted = samples.sortBy(r => (r.us, r.event_id))
    var prev = Double.NaN
    var first = true
    var n = 0L
    sorted.foreach { r =>
      if (!first &&
        (if (resets) sqlCmp(r.value, prev) < 0 else sqlCmp(r.value, prev) != 0))
        n += 1
      first = false
      prev = r.value
    }
    Some(n.toDouble)
  }

  /** deriv / predict_linear: the batch lsqSums least-squares line —
    * x = epoch-second − step (integer), Σx/Σx² in longs, Σy/Σxy through
    * the decimal-6 contract; needs >= 2 points and nonzero time spread.
    * `predictAt` = None → the slope (deriv); Some(xp) → the line
    * evaluated at xp = window + horizon (predict_linear).
    */
  private def foldLsq(samples: Seq[RateSample], step: Long,
                      predictAt: Option[Double]): Option[Double] = {
    if (samples.size < 2) return None
    val xs = samples.map(r => Math.floorDiv(r.us, 1000000L) - step)
    val n = samples.size.toDouble
    val sx = xs.sum
    val sxx = xs.map(x => x * x).sum
    val den = n * sxx.toDouble - sx.toDouble * sx.toDouble
    if (den == 0.0) return None
    val sy = decimal6Sum(samples.iterator.map(_.value))
    val sxy = decimal6Sum(samples.iterator.zip(xs.iterator)
      .map { case (r, x) => x.toDouble * r.value })
    val slope = (n * sxy - sx.toDouble * sy) / den
    Some(predictAt match {
      case None => slope
      case Some(xp) => (sy - slope * sx.toDouble) / n + slope * xp
    })
  }

  /** holt_winters: the batch double-exponential fold (Prometheus
    * funcHoltWinters) replayed in the same IEEE sequence — samples in
    * (ts, event_id) order, s1 seeded from the first value, trend from
    * the first difference; needs >= 2 samples.
    */
  private def foldHolt(samples: Seq[RateSample], sf: Double, tf: Double): Option[Double] = {
    if (samples.size < 2) return None
    val xs = samples.sortBy(r => (r.us, r.event_id)).map(_.value)
    var s0 = 0.0
    var s1 = xs(0)
    var b = xs(1) - xs(0)
    var i = 0
    xs.drop(1).foreach { v =>
      val bNew = if (i == 0) b else tf * (s1 - s0) + (1.0 - tf) * b
      val y = (1.0 - sf) * (s1 + bNew)
      s0 = s1
      s1 = sf * v + y
      b = bNew
      i += 1
    }
    Some(s1)
  }

  /** Order-dependent verbs over the stream: per-(series, window)
    * buffered state + event-time timeout. State holds exactly one
    * window's samples per open window per series (the minimum any
    * exact order-dependent verb needs) and is dropped at emission;
    * windows emit exactly once, when the watermark proves them
    * complete — Append semantics with no approximation. The fold runs
    * the batch evaluator's formula bit-for-bit on the JVM (same sort
    * keys, same decimal-6 accumulation); folds returning None (irate
    * with < 2 samples, deriv with zero spread) emit nothing, exactly
    * like their batch filters. Late-beyond-watermark samples are
    * dropped by the engine before the state op, the same contract as
    * every watermarked aggregation here.
    */
  private def bufferedStream(in: DataFrame, sel: Selector, rangeSec: Long)
                            (fold: (Long, Seq[RateSample]) => Option[Double]): DataFrame = {
    val s = in.sparkSession
    import s.implicits._
    val samples = applySel(in, sel)
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"),
        col("event_id").cast("long"), col("value").cast("double"), col("ts"))
      .as[(Long, Long, Long, Double, java.sql.Timestamp)]
    samples
      .groupByKey { case (uid, us, _, _, _) =>
        // the batch evaluator's stepOf: floor(epochSec / W) * W
        (uid, Math.floorDiv(Math.floorDiv(us, 1000000L), rangeSec) * rangeSec)
      }
      .flatMapGroupsWithState[RateWindow, RateOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        case ((uid, step), rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed the window end: the window is complete
            val out = state.getOption
              .flatMap(w => fold(step, w.samples))
              .map(v => RateOut(step, uid, v))
            state.remove()
            out.iterator
          } else {
            val buf = state.getOption.map(_.samples).getOrElse(Seq.empty)
            state.update(RateWindow(
              buf ++ rows.map(r => RateSample(r._2, r._3, r._4))))
            // fire once the watermark passes the window end; Spark
            // requires the timestamp above the current watermark
            state.setTimeoutTimestamp(math.max((step + rangeSec) * 1000L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
      .toDF()
  }

  // `in` is by-name: rejection (including matcher/selector checks) must
  // happen before the streaming source is even constructed
  private def compile(in: => DataFrame, expr: Expr): DataFrame = expr match {
    case sel: Selector =>
      checkSel(sel)
      // instant vector: last sample per series per hourly step
      windowed(applySel(in, sel), 3600L, Seq("user_id"),
        max_by(col("value"), struct(unix_micros(col("ts")), col("event_id"))))

    case RangeFunc(fn @ ("rate" | "increase"), sel, rangeSec, _, _) =>
      checkSel(sel)
      bufferedStream(in, sel, rangeSec)(
        (_, ss) => foldRate(ss, isRate = fn == "rate", rangeSec))

    case RangeFunc("quantile_over_time", sel, rangeSec, q, _) =>
      checkSel(sel)
      bufferedStream(in, sel, rangeSec)((_, ss) => foldQuantile(ss, q))

    case RangeFunc("mad_over_time", sel, rangeSec, _, _) =>
      checkSel(sel)
      bufferedStream(in, sel, rangeSec)((_, ss) => foldMad(ss))

    case RangeFunc("delta", sel, rangeSec, _, _) =>
      checkSel(sel)
      bufferedStream(in, sel, rangeSec)((_, ss) => foldDelta(ss))

    case RangeFunc(fn @ ("irate" | "idelta"), sel, rangeSec, _, _) =>
      checkSel(sel)
      bufferedStream(in, sel, rangeSec)(
        (_, ss) => foldInstant(ss, isRate = fn == "irate"))

    case RangeFunc(fn @ ("changes" | "resets"), sel, rangeSec, _, _) =>
      checkSel(sel)
      bufferedStream(in, sel, rangeSec)(
        (_, ss) => foldChanges(ss, resets = fn == "resets"))

    case RangeFunc("deriv", sel, rangeSec, _, _) =>
      checkSel(sel)
      bufferedStream(in, sel, rangeSec)((step, ss) => foldLsq(ss, step, None))

    case RangeFunc("predict_linear", sel, rangeSec, q, _) =>
      checkSel(sel)
      // tumbling xp = (step + W) − step + horizon, exact in doubles
      bufferedStream(in, sel, rangeSec)(
        (step, ss) => foldLsq(ss, step, Some(rangeSec.toDouble + q)))

    case RangeFunc("holt_winters", sel, rangeSec, sf, tf) =>
      checkSel(sel)
      bufferedStream(in, sel, rangeSec)((_, ss) => foldHolt(ss, sf, tf))

    case RangeFunc(fn, sel, rangeSec, _, _) if verbValue.contains(fn) =>
      checkSel(sel)
      windowed(applySel(in, sel), rangeSec, Seq("user_id"), verbValue(fn))

    case Agg(op, by, RangeFunc(fn, sel, rangeSec, _, _), 0, false, _, _)
        if fused.contains((op, fn)) =>
      checkSel(sel)
      if (!by.forall(_ == "user_id")) notStreamable(s"by(${by.mkString(",")})")
      windowed(applySel(in, sel), rangeSec, by, fused((op, fn)))

    case other => notStreamable(other.getClass.getSimpleName)
  }
}
