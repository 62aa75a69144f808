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
  *     max/last/present_over_time — per-series tumbling windows;
  *   - `agg [by(labels)] (rangefn(metric{matchers}[W]))` where the
  *     cross-series agg FUSES with the per-series verb into one
  *     aggregation by an exact algebraic identity
  *     (sum∘sum_over_time = sum, sum∘count_over_time = count,
  *     min∘min_over_time = min, max∘max_over_time = max — decimal
  *     sums are associative/commutative, so the fusion is
  *     hash-identical to the batch two-level form);
  *   - a bare `metric{matchers}` instant vector (last sample per series
  *     per hourly step, a max_by aggregation);
  *   - `rate(metric[W])` / `increase(metric[W])` — the ORDER-DEPENDENT
  *     leg, via flatMapGroupsWithState: per-(series, window) state
  *     buffers the window's samples, and the reset-aware fold runs ONCE
  *     per window when the event-time watermark passes the window end
  *     (Append-exact: each window emits exactly once, with the samples
  *     sorted by (ts, event_id) exactly as the batch evaluator sorts
  *     them, and the same decimal(30,6) HALF_UP accumulation — proven
  *     row-for-row equal in StreamPromqlSpec).
  *
  * Fusing matters structurally: the naive translation is TWO chained
  * stateful aggregations (per-series window, then cross-series), which
  * Structured Streaming heavily restricts; the fused form is one
  * stateful operator with partial aggregation before the shuffle —
  * the same state bound as [[StreamAgg.windowedCounts]].
  *
  * Everything else (quantiles, joins, subqueries, cross-window verbs
  * like irate/delta-across-windows) is cross-window-dependent or needs
  * more state than a window's own samples and raises — evaluate those
  * in batch over the ingested output instead (same files).
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
    Map(
      "count_over_time" -> count(lit(1)).cast("double"),
      "sum_over_time" -> exactSum,
      "avg_over_time" -> (exactSum / count(lit(1))),
      "min_over_time" -> min(col("value")),
      "max_over_time" -> max(col("value")),
      "last_over_time" -> max_by(col("value"), tkey),
      "present_over_time" -> max(lit(1.0)))
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
    s.readStream.schema(Ingest.rawSchema).parquet(inDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", delay)
  }

  private def notStreamable(what: String): Nothing =
    throw new IllegalArgumentException(
      s"not streamable: $what — the streaming subset is " +
        "[sum|min|max by(...)] (count|sum|avg|min|max|last|present" +
        "_over_time(metric{matchers}[W])) or a bare selector; run " +
        "order-dependent verbs in batch over the ingested files")

  /** Named-metric, unmodified selectors only: offsets/@/derived labels
    * belong to the batch evaluator.
    */
  private def checkSel(sel: Selector): Unit = {
    if (sel.metric.isEmpty) notStreamable("metric-less selector")
    if (sel.offsetSec != 0) notStreamable("offset")
    if (sel.atSec.isDefined) notStreamable("@ modifier")
    if (sel.extraLabels.nonEmpty) notStreamable("derived labels")
  }

  private def applySel(df: DataFrame, sel: Selector): DataFrame = {
    val base = df.filter(col("event_type") === sel.metric)
    sel.matchers.foldLeft(base) { case (d, (name, op, v)) =>
      val c = col(name).cast("string")
      op match {
        case "=" => d.filter(c === v)
        case "!=" => d.filter(c.isNull || c =!= v)
        case "=~" => d.filter(c.rlike(s"^(?:$v)$$"))
        case "!~" => d.filter(c.isNull || !c.rlike(s"^(?:$v)$$"))
        case other => notStreamable(s"matcher $other")
      }
    }
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
  private def foldRate(uid: Long, step: Long, samples: Seq[RateSample],
                       isRate: Boolean, rangeSec: Long): RateOut = {
    val sorted = samples.sortBy(r => (r.us, r.event_id))
    var acc = java.math.BigDecimal.ZERO
    var prev = 0.0
    var first = true
    sorted.foreach { r =>
      val growth =
        if (first) 0.0
        else if (r.value >= prev) r.value - prev
        else r.value
      first = false
      prev = r.value
      acc = acc.add(java.math.BigDecimal.valueOf(growth)
        .setScale(6, java.math.RoundingMode.HALF_UP))
    }
    val inc = acc.doubleValue
    RateOut(step, uid, if (isRate) inc / rangeSec.toDouble else inc)
  }

  /** `rate`/`increase` over the stream: per-(series, window) buffered
    * state + event-time timeout. State holds exactly one window's
    * samples per open window per series (the minimum any exact
    * order-dependent verb needs) and is dropped at emission; windows
    * emit exactly once, when the watermark proves them complete —
    * Append semantics with no approximation. Late-beyond-watermark
    * samples are dropped by the engine before the state op, the same
    * contract as every watermarked aggregation here.
    */
  private def rateStream(in: DataFrame, sel: Selector, isRate: Boolean,
                         rangeSec: Long): DataFrame = {
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
              .map(w => foldRate(uid, step, w.samples, isRate, rangeSec))
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
      rateStream(in, sel, isRate = fn == "rate", rangeSec)

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
