package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  *     per hourly step, a max_by aggregation).
  *
  * Fusing matters structurally: the naive translation is TWO chained
  * stateful aggregations (per-series window, then cross-series), which
  * Structured Streaming heavily restricts; the fused form is one
  * stateful operator with partial aggregation before the shuffle —
  * the same state bound as [[StreamAgg.windowedCounts]].
  *
  * Everything else (rate's reset scan, quantiles, joins, subqueries)
  * is window-order- or cross-window-dependent and raises — evaluate
  * those in batch over the ingested output instead (same files).
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

  // `in` is by-name: rejection (including matcher/selector checks) must
  // happen before the streaming source is even constructed
  private def compile(in: => DataFrame, expr: Expr): DataFrame = expr match {
    case sel: Selector =>
      checkSel(sel)
      // instant vector: last sample per series per hourly step
      windowed(applySel(in, sel), 3600L, Seq("user_id"),
        max_by(col("value"), struct(unix_micros(col("ts")), col("event_id"))))

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
