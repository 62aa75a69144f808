package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** PromQL-style range-query operators over the `events` TSDB table.
  *
  * The reference delegates PromQL to thanos promql-engine on top of its
  * series selection (reference: prometheus/promql_test.go runs
  * `sum(http_requests_total)` as a range query with aligned steps;
  * prometheus/querier.go supplies the series). Here each PromQL verb is
  * re-expressed as a declarative Spark plan: step alignment is
  * `date_trunc`, per-series state is a window over (series key) ordered
  * by time, and cross-series aggregation is a groupBy on the step.
  *
  * Scale notes: groupBy(step, labels) has map-side partial aggregation,
  * so the shuffle carries one row per (step × group), not per sample.
  * Window functions partition by series key — cardinality ≫ cores, no
  * skew. All sums over double samples go through DECIMAL so results are
  * order-independent (floating addition is not associative; a 1000-way
  * cluster merge must not change the answer).
  */
object TimeSeries {

  /** Aligned step bucket as epoch seconds (BIGINT) — stable across
    * engines, unlike raw ns timestamps.
    */
  private def stepHour(c: Column): Column =
    unix_timestamp(date_trunc("hour", c)).as("step")

  // the shared determinism-contract kernels (one definition site:
  // graft.functions.ExactNum; the oracle SQL mirrors the formulas)
  private def exactSum(c: Column): Column = graft.functions.ExactNum.exactSum(c)
  private def exactSumSq(c: Column): Column = graft.functions.ExactNum.exactSumSq(c)
  private def ceilPos(n: Column, q: Double): Column =
    graft.functions.ExactNum.ceilPos(n, q)

  /** `sum(metric)` per step (reference: prometheus/promql_test.go:36-60). */
  def rangeSum(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(stepHour(col("ts")))
      .agg(exactSum(col("value")).as("sum_value"))

  /** `sum by (label)(metric)` per step. */
  def rangeSumBy(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(stepHour(col("ts")), col("event_type"))
      .agg(exactSum(col("value")).as("sum_value"))

  /** Hourly (count, min, max, exact sum) by event_type — the full
    * algebraic-measure family the downsample rollup answers losslessly;
    * `q_rollup_rewrite_stats` runs this same query with the MV rewrite
    * opted in and must hash-match its oracle (round 12).
    */
  def rangeStatsBy(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(stepHour(col("ts")), col("event_type"))
      .agg(count(lit(1)).as("n"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        exactSum(col("value")).as("sum_value"))

  /** PromQL `rate()`: per-series dValue/dt between consecutive samples.
    * Time deltas in microseconds (both engines agree at µs precision;
    * ns does not survive Spark's parquet read).
    */
  def rate(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_value", lag("value", 1).over(w))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("prev_value").isNotNull &&
        // rate over zero elapsed time is undefined — simultaneous
        // samples (dt = 0) would be an ANSI divide-by-zero at runtime
        unix_micros(col("ts")) =!= col("prev_us"))
      .select(
        col("user_id"), col("event_type"), col("event_id"),
        ((col("value") - col("prev_value")) /
          ((unix_micros(col("ts")) - col("prev_us")) / lit(1000000.0)))
          .as("rate"))
  }

  /** `count_over_time(metric[step])` per series. */
  def countOverTime(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(stepHour(col("ts")), col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_samples"))

  /** avg/min/max_over_time per series per day. avg = exact decimal sum /
    * count, divided in double (identical on any engine).
    */
  def avgMinMaxOverTime(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        unix_timestamp(date_trunc("day", col("ts"))).as("step"),
        col("user_id"), col("event_type"))
      .agg(
        (exactSum(col("value")) / count(lit(1))).as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"))

  /** `topk(3, sum by (user_id,event_type)(metric))` per step; ties broken
    * deterministically by (user_id, event_type).
    */
  def topk(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(s, dir)
      .groupBy(stepHour(col("ts")), col("user_id"), col("event_type"))
      .agg(exactSum(col("value")).as("sum_value"))
    val w = Window.partitionBy("step")
      .orderBy(col("sum_value").desc, col("user_id"), col("event_type"))
    per.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
  }

  /** topk via the custom TopKPerKey operator (graft.plans): identical
    * result to [[topk]], but planned as partial per-partition heaps →
    * shuffle of ≤ partitions×steps×k candidate rows → final ranked merge,
    * instead of a full-data shuffle + per-key sort. The 100 TB form.
    */
  def topkNative(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(s, dir)
      .groupBy(stepHour(col("ts")), col("user_id"), col("event_type"))
      .agg(exactSum(col("value")).as("sum_value"))
    graft.plans.TopK.perKey(per, Seq(col("step")),
      Seq(col("sum_value").desc, col("user_id"), col("event_type")), 3)
  }

  /** `last_over_time` / instant-vector lookup: most recent sample per
    * series (reference semantics: the newest chunk covering maxt).
    */
  def lastOverTime(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "value")
  }

  /** `quantile(0.95, metric)` per label group, computed as a discrete
    * quantile (element at ceil(q·n) in sort order) so the result is a raw
    * stored value — exact across engines, no interpolation-rounding drift.
    *
    * Two-phase for scale: phase 1 is a map-side-combinable
    * groupBy(event_type, value) histogram — the shuffle keys on
    * (type, value), so no hot reducers; phase 2 runs the cumulative pick
    * over the per-type histogram only. The naive alternative — a window
    * partitioned by the ~5 event_types over RAW samples — funnels the
    * whole table into 5 reducers that each sort everything; this shape
    * sorts only the distinct-value histogram.
    */
  def histogramQuantile(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(s, dir)
      .groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    val byType = Window.partitionBy("event_type")
    val wCum = byType.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(byType))
      // sort positions cum-cnt+1 .. cum all hold `value`; pick the one
      // covering ceil(q*n) — same element the row_number formulation finds
      .filter(col("cum") >= ceilPos(col("n"), 0.95) &&
        col("cum") - col("cnt") < ceilPos(col("n"), 0.95))
      .select(col("event_type"), col("value").as("p95"))
  }

  /** `increase(metric[6h])` ≈ per-series spread per 6h window (max-min;
    * exact double arithmetic).
    */
  def increase(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        (floor(unix_timestamp(col("ts")) / 21600) * 21600).as("step"),
        col("user_id"), col("event_type"))
      .agg((max("value") - min("value")).as("increase"))

  /** `stddev_over_time` per series per day: population stddev from the
    * exact decimal Σv and Σv² (order-independent), final arithmetic in
    * double (identical IEEE steps on any engine). max(0,·) clamps the
    * catastrophic-cancellation negatives.
    */
  def stddevOverTime(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        unix_timestamp(date_trunc("day", col("ts"))).as("step"),
        col("user_id"), col("event_type"))
      .agg(
        // negatives clamp to 0; null (decimal-sum overflow) propagates
        sqrt({
          val variance =
            (exactSumSq(col("value"))
              - exactSum(col("value")) * exactSum(col("value")) / count(lit(1)))
              ./(count(lit(1)))
          when(variance < 0.0, lit(0.0)).otherwise(variance)
        }).as("stddev_value"),
        count(lit(1)).as("n_samples"))

  /** PromQL `delta(metric[step])`: newest − oldest sample per series per
    * step. max_by/min_by on the unique (µs, event_id) tuple — a pure
    * aggregation (map-side combinable), no window sort, which is the
    * shape that survives 100 TB.
    */
  def delta(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(stepHour(col("ts")), col("user_id"), col("event_type"))
      .agg(
        (max_by(col("value"), struct(unix_micros(col("ts")), col("event_id")))
          - min_by(col("value"), struct(unix_micros(col("ts")), col("event_id"))))
          .as("delta"))

  /** PromQL `deriv(metric[step])`: per-series least-squares slope
    * (value/sec) per hour step. x is the second offset within the step —
    * small integers, so Σx and Σx² are exact BIGINTs; Σy and Σxy are
    * exact decimals; the closed-form slope is then a handful of identical
    * IEEE double ops on any engine. Groups need n ≥ 2 and x-variance > 0.
    */
  def deriv(s: SparkSession, dir: String): DataFrame = {
    val x = unix_timestamp(col("ts")) - unix_timestamp(date_trunc("hour", col("ts")))
    val g = Tables.events(s, dir)
      .withColumn("x", x)
      .groupBy(stepHour(col("ts")), col("user_id"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        exactSum(col("value")).as("sy"),
        exactSum(col("x").cast("double") * col("value")).as("sxy"))
    val n = col("n").cast("double")
    val den = n * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    g.filter(col("n") >= 2 && den =!= 0.0)
      .select(col("step"), col("user_id"), col("event_type"),
        ((n * col("sxy") - col("sx").cast("double") * col("sy")) / den).as("deriv"))
  }

  /** PromQL `changes(metric[1d])`: number of times the sample value
    * changed, per series per day — lag comparison over the series
    * window, counted per step.
    */
  def changes(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev", lag("value", 1).over(w))
      .groupBy(
        unix_timestamp(date_trunc("day", col("ts"))).as("step"),
        col("user_id"), col("event_type"))
      .agg(sum(when(col("prev").isNotNull && col("prev") =!= col("value"), 1L)
        .otherwise(0L)).as("n_changes"))
  }

  /** PromQL `resets(counter[1d])`: counter resets = strict decreases
    * between consecutive samples, per series per day.
    */
  def resets(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev", lag("value", 1).over(w))
      .groupBy(
        unix_timestamp(date_trunc("day", col("ts"))).as("step"),
        col("user_id"), col("event_type"))
      .agg(sum(when(col("prev").isNotNull && col("value") < col("prev"), 1L)
        .otherwise(0L)).as("n_resets"))
  }

  /** `quantile_over_time(0.5, metric[1d])` — per-series median per day,
    * as a discrete quantile (stored value at ceil(q·n) in sort order):
    * exact across engines, no interpolation drift.
    */
  def quantileOverTime(s: SparkSession, dir: String): DataFrame = {
    val part = Seq(
      unix_timestamp(date_trunc("day", col("ts"))).as("step"),
      col("user_id"), col("event_type"))
    val w = Window.partitionBy(part: _*).orderBy(col("value"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(part: _*)))
      .filter(col("rn") === ceilPos(col("n"), 0.5))
      .select(part :+ col("value").as("p50"): _*)
  }

  /** PromQL `count_values("v", metric)` per step: the distribution of
    * (rounded) sample values — groupBy on (step, bucketed value), one
    * partial-agg shuffle.
    */
  def countValues(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(stepHour(col("ts")), floor(col("value") / 10).cast("long").as("v_bucket"))
      .agg(count(lit(1)).as("n_samples"))

  /** PromQL vector matching — a binary operation between two instant
    * vectors joined `on(user_id)`: per-user purchase/click value ratio
    * per step. The two selectors share one scan lineage; the join keys
    * on (step, user_id) — equi hash join, no skew (users ≫ cores).
    */
  def vectorRatio(s: SparkSession, dir: String): DataFrame = {
    def side(t: String, as: String) =
      Tables.events(s, dir)
        .filter(col("event_type") === t)
        .groupBy(stepHour(col("ts")), col("user_id"))
        .agg(exactSum(col("value")).as(as))
    side("purchase", "v_purchase")
      .join(side("click", "v_click"), Seq("step", "user_id"))
      .filter(col("v_click") =!= 0.0)
      .select(col("step"), col("user_id"),
        (col("v_purchase") / col("v_click")).as("ratio"))
  }

  /** `absent()`: (step × event_type) combinations with no samples.
    * Dense step axis built with sequence(); presence anti-joined away.
    */
  def absent(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val bounds = ev.agg(
      unix_timestamp(date_trunc("hour", min("ts"))).as("lo"),
      unix_timestamp(date_trunc("hour", max("ts"))).as("hi"))
    val steps = bounds.select(
      explode(sequence(col("lo"), col("hi"), lit(3600))).as("step"))
    val types = ev.select("event_type").distinct()
    val present = ev.select(
      stepHour(col("ts")), col("event_type")).distinct()
    steps.crossJoin(broadcast(types))
      .join(present, Seq("step", "event_type"), "left_anti")
  }

  // ---- native histograms (schema 0) ------------------------------------

  /** Prometheus NATIVE histograms, schema 0: exponential buckets with
    * bucket k covering (2^(k−1), 2^k]. Power-of-two bounds are EXACT
    * doubles, which is what makes the whole family oracle-hashable —
    * the reason this entry fixes schema 0 rather than the upstream
    * default −4..8 range of schemas (whose 2^(1/2^s) bounds are
    * transcendental — but see the GENERALIZED family below, which
    * closes that restriction via a fixed double bound table: schemas
    * −4..3 are all oracle-hashable). The [−6, 9] index window spans the table's value
    * domain; out-of-range values clamp to the edge buckets, mirroring
    * upstream's span clamping. Bucket COUNT is bounded by the schema,
    * not the data — every per-histogram window below runs over ≤ 16
    * rows regardless of corpus size, so the family scales as a plain
    * partial-agg groupBy. Documented divergence: histogram_quantile
    * interpolates LINEARLY in value space inside the bucket (upstream
    * native histograms interpolate on the exponential scale).
    */
  val NhKLo: Int = -6
  val NhKHi: Int = 9

  private[graft] def nhK(v: Column): Column =
    (NhKLo to NhKHi).foldRight(lit(NhKHi + 1)) { (k, rest) =>
      when(v <= lit(math.pow(2.0, k)), lit(k)).otherwise(rest)
    }

  /** The ingest shape: one row per (step, metric, bucket) — the long
    * (relational) form of the native histogram's span/delta encoding.
    */
  def nhistBuild(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(stepHour(col("ts")), col("event_type"),
        nhK(col("value")).as("k"))
      .groupBy("step", "event_type", "k")
      .agg(count(lit(1)).as("cnt"))

  /** The histogram HEADER fields — histogram_count / histogram_sum /
    * histogram_avg. The sum rides as an exact decimal like every other
    * sum in the engine (native histograms carry sum explicitly; it is
    * not recoverable from buckets).
    */
  def nhistStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(stepHour(col("ts")), col("event_type"), col("value"))
      .groupBy("step", "event_type")
      .agg(count(lit(1)).as("hist_count"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("hist_sum"))
      .withColumn("hist_avg",
        round(col("hist_sum") / col("hist_count").cast("double"), 12))

  /** histogram_stddev / histogram_stdvar over the schema-0 native
    * histograms (the Prometheus experimental pair): variance estimated
    * from the bucket distribution — each bucket's mass sits at its
    * ARITHMETIC midpoint 3·2^(k−2) (the (lower+upper)/2 of the
    * (2^(k−1), 2^k] bucket, Prometheus's estimator shape) — about the
    * EXACT header mean hist_sum/hist_count. Per-bucket terms quantize
    * to decimal(28,12) before the order-independent decimal sum (the
    * nhistFraction contract); one shared final division rounded at 12,
    * then an IEEE sqrt both engines share.
    *
    * Scale shape: one partial-agg groupBy over the bucket table joined
    * to the header stats — both keyed (step, event_type), co-
    * partitioned; no windows at all.
    */
  def nhistStddev(s: SparkSession, dir: String): DataFrame = {
    val mid = lit(3.0) * pow(lit(2.0), col("k").cast("double") - lit(2.0))
    val stats = nhistStats(s, dir)
      .select(col("step"), col("event_type"), col("hist_count"),
        col("hist_avg"))
    // The whole term chain runs in EXACT decimal: rounding a double
    // dev² (magnitude up to ~6e5) at any dp either exceeds double
    // precision or hits shortest-repr tie divergence cross-engine (2
    // of 3385 rows flipped in the first cut). Here the only
    // double→decimal boundary is hist_avg's proven 12-dp quantization
    // (the entropy/lm round-12 contract); mid is an exact ≤8-dp
    // decimal, the difference and square are exact decimal ops, the
    // 12-dp re-scale is a DECIMAL rounding (no binary-double tie
    // surface), and cnt multiplies exactly. The final step is the one
    // decimal→double cast, an IEEE division and an IEEE sqrt — no
    // trailing round() at all: round(double, d) near a d-dp tie is
    // exactly where Spark's shortest-repr and DuckDB's binary
    // rounding disagree (measured: 2/3385, then 1/3385 rows flipped
    // with a trailing round at 6; zero without it).
    val avgD = col("hist_avg").cast("decimal(16,12)")
    val midD = mid.cast("decimal(16,12)")
    val devD = midD - avgD
    nhistBuild(s, dir).join(stats, Seq("step", "event_type"))
      .withColumn("term",
        (devD * devD).cast("decimal(20,12)") * col("cnt").cast("decimal(12,0)"))
      .groupBy("step", "event_type")
      // the 12-scale sum re-scales to 4 dp BEFORE the double cast: a
      // scale-12 decimal → double crosses 2⁵³ in the scaled-integer
      // representation, where DuckDB's int128→double conversion
      // double-rounds (measured: 44/3385 rows off by one ulp); at
      // scale 4 the scaled integer is exact in a double on both sides
      .agg(sum("term").cast("decimal(30,4)").as("t"),
        max("hist_count").as("n"))
      .select(col("step"), col("event_type"),
        (col("t").cast("double") / col("n").cast("double"))
          .as("hist_stdvar"))
      .withColumn("hist_stddev", sqrt(col("hist_stdvar")))
  }

  /** histogram_quantile(φ) over the native-histogram buckets: rank
    * ceil(round(φ·n, 9)) (the engine-wide discrete-position rule),
    * then linear interpolation between the exact bucket bounds. The
    * cumulative window partitions per histogram — ≤ 16 rows by schema.
    */
  def nhistQuantile(s: SparkSession, dir: String,
                    q: Double = 0.9): DataFrame = {
    val byH = Window.partitionBy("step", "event_type")
    val wCum = byH.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lower = pow(lit(2.0), col("k").cast("double") - lit(1.0))
    val upper = pow(lit(2.0), col("k").cast("double"))
    nhistBuild(s, dir)
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(byH))
      .withColumn("rnk", ceilPos(col("n"), q))
      .filter(col("cum") >= col("rnk") &&
        col("cum") - col("cnt") < col("rnk"))
      .select(col("step"), col("event_type"),
        round(lower + (upper - lower) *
          ((col("rnk") - col("cum") + col("cnt")).cast("double") /
            col("cnt").cast("double")), 12).as("q_value"))
  }

  /** histogram_fraction(lo, hi) over the native-histogram buckets — the
    * OTHER native-histogram query verb (SLO arithmetic: "what fraction
    * of requests landed between lo and hi?"). Per bucket, the overlap
    * of (lo, hi] with the bucket's exact power-of-two span gives an
    * interpolation weight in [0, 1]; the fraction is Σ cnt·w / n. Same
    * documented divergence as [[nhistQuantile]]: linear interpolation
    * in value space inside a bucket.
    *
    * Scale shape: NO window at all — the weight is a per-row
    * projection over the bucket table and the rest is one partial-agg
    * groupBy per histogram, strictly cheaper than the quantile's
    * (≤16-row) cumulative window. Determinism: per-bucket terms
    * quantize to decimal(28,12) before the order-independent decimal
    * sum; one shared final double division rounded at 12.
    */
  val NhFracLo = 0.3
  val NhFracHi = 3.0

  def nhistFraction(s: SparkSession, dir: String,
                    lo: Double = NhFracLo, hi: Double = NhFracHi): DataFrame = {
    val lower = pow(lit(2.0), col("k").cast("double") - lit(1.0))
    val upper = pow(lit(2.0), col("k").cast("double"))
    val ov = greatest(lit(0.0), least(lit(hi), upper) - greatest(lit(lo), lower))
    val w = least(lit(1.0), ov / (upper - lower))
    nhistBuild(s, dir)
      .withColumn("term",
        round(col("cnt").cast("double") * w, 12).cast("decimal(28,12)"))
      .groupBy("step", "event_type")
      .agg(sum("cnt").as("n"), sum("term").as("t"))
      .select(col("step"), col("event_type"),
        round(col("t").cast("double") / col("n").cast("double"), 12)
          .as("fraction"))
  }

  // ---- native histograms, GENERALIZED schema (−4..3) --------------------

  /** Exact bucket bound for ANY supported schema — closes the schema-0
    * restriction documented above. Prometheus native histograms put
    * bucket i at upper bound 2^(i / 2^schema) (histogram.proto's
    * sb_schema; schema 0 = powers of two, negative = coarser, positive
    * = finer). The published reason this family fixed schema 0 was that
    * non-zero schemas have "transcendental" bounds — but that is only
    * half true:
    *
    *  - schema ≤ 0: bound(i) = 2^(i·2^|s|) is an EXACT power of two,
    *    same as schema 0, just a wider stride.
    *  - schema > 0: 2^(i/2^s) is irrational, but the ENGINE does not
    *    need the real number — it needs ONE well-defined double both
    *    engines compare against. We define bound(i) :=
    *    exact2^floor(i/2^s) × subBound(i mod 2^s), where the 2^s
    *    sub-bounds are fixed doubles (StrictMath.pow of the rational
    *    exponent) and the power-of-two scaling is EXACT in IEEE — so
    *    every bound is one reproducible double, serialized into the
    *    oracle SQL via shortest-round-trip Double.toString (DuckDB's
    *    correctly-rounded strtod recovers the identical bits). This is
    *    exactly how upstream Prometheus implements positive schemas:
    *    frexp + a precomputed float64 sub-bucket bound table
    *    (model/histogram's exponential bounds), not live exp2 calls.
    *
    * Bucket membership is therefore a pure double comparison both
    * engines evaluate identically — the family stays oracle-hashable at
    * every schema.
    */
  def nhBound(schema: Int, i: Int): Double = {
    require(schema >= -4 && schema <= 8, s"unsupported schema $schema")
    if (schema <= 0) StrictMath.pow(2.0, (i.toLong << -schema).toDouble)
    else {
      val parts = 1 << schema
      val m = Math.floorDiv(i, parts)
      val j = Math.floorMod(i, parts)
      // exact scaling: multiplying a double by 2^m is exact in IEEE
      // (no rounding) for the in-range exponents this window spans
      StrictMath.pow(2.0, j.toDouble / parts) * StrictMath.pow(2.0, m.toDouble)
    }
  }

  /** Index window per schema, derived from the SAME value-domain octave
    * range [−6, 9] the schema-0 family fixed: bucket iLo absorbs
    * everything below (upstream's span clamp), iHi+1 is the overflow
    * bucket. Bucket COUNT stays bounded by the schema (≤ 16·2^s rows
    * per histogram), never by the data — the scale property.
    */
  private[graft] def nhIdx(schema: Int): (Int, Int) = {
    def cdiv(a: Int, b: Int): Int = -Math.floorDiv(-a, b)
    if (schema >= 0) (-6 << schema, 9 << schema)
    else (cdiv(-6, 1 << -schema), cdiv(9, 1 << -schema))
  }

  /** Bucket index at `schema`: smallest i in the window with
    * value ≤ bound(i) — the when-chain stays whole-stage-codegen'd
    * (≤ 61 branches at schema 2), zero joins, zero lookups.
    */
  private[graft] def nhKS(v: Column, schema: Int): Column = {
    val (lo, hi) = nhIdx(schema)
    (lo to hi).foldRight(lit(hi + 1)) { (i, rest) =>
      when(v <= lit(nhBound(schema, i)), lit(i)).otherwise(rest)
    }
  }

  /** k → bound(k) as a literal when-chain (the quantile's inverse
    * mapping; covers the clamp and overflow buckets too).
    */
  private def nhBoundCol(schema: Int, kc: Column): Column = {
    val (lo, hi) = nhIdx(schema)
    (lo - 1 to hi).foldRight(lit(nhBound(schema, hi + 1))) { (i, rest) =>
      when(kc === i, lit(nhBound(schema, i))).otherwise(rest)
    }
  }

  // ---- WIDE positive schemas (4..8) — upstream's full range ------------
  //
  // The when-chain index above is codegen-bounded: at schema 8 the
  // window spans 3,841 buckets, which would blow both the generated
  // Java and the oracle SQL. Wide schemas instead use exactly the
  // implementation upstream Prometheus documents for positive schemas
  // (model/histogram's exponential bounds): frexp-style decomposition —
  // a fixed 2^s-entry sub-bound double table per octave, the octave
  // scaling 2^m applied as an EXACT IEEE multiply — with the index
  // found by a guess-then-fix: g = ceil(2^s·log2 v) is within ±1 of the
  // true index on any engine (absolute log2 error ~1e-11 over this
  // domain), and four comparisons of v against the exact bound doubles
  // at g−2..g+1 settle it. Both engines compare against the SAME
  // literal doubles (shortest-round-trip serialized into the oracle
  // SQL), so the settled index is engine-identical even when the two
  // log2 guesses differ by an ulp.

  /** The fixed sub-bound table: bound of sub-bucket j within an octave. */
  private[graft] def nhSubBounds(schema: Int): IndexedSeq[Double] = {
    val parts = 1 << schema
    IndexedSeq.tabulate(parts)(j => StrictMath.pow(2.0, j.toDouble / parts))
  }

  /** bound(k) for a RUNTIME k at wide schemas: table lookup × exact
    * octave scaling — O(1) arithmetic, no when-chain.
    */
  private[graft] def nhBoundWide(schema: Int, kc: Column): Column = {
    val parts = 1 << schema
    val j = pmod(kc, lit(parts.toLong))
    val sub = element_at(array(nhSubBounds(schema).map(lit): _*),
      (j + 1L).cast("int"))
    // (kc − j)/parts is an exact integer ratio of longs ≪ 2^53, and
    // pow(2, m) for integer m is exact — the octave multiply rounds
    // nothing (IEEE scaling)
    sub * pow(lit(2.0), (kc - j).cast("double") / lit(parts.toDouble))
  }

  /** Bucket index at wide schemas: smallest i in the window with
    * v ≤ bound(i), via the guess-then-fix described above.
    */
  private[graft] def nhKSWide(v: Column, schema: Int): Column = {
    val (lo, hi) = nhIdx(schema)
    val parts = 1 << schema
    val g = ceil(log2(v) * lit(parts.toDouble)).cast("long")
    // smallest i in [g−2, g+2] with v ≤ bound(i):
    // (g−2) + #{d ∈ 0..3 : v > bound(g−2+d)}
    val fixed = (0 to 3).foldLeft(g - lit(2L)) { (acc, d) =>
      acc + when(v > nhBoundWide(schema, g - lit(2L) + lit(d.toLong)), 1L)
        .otherwise(0L)
    }
    // below-window absorbs into lo (upstream's span clamp — also the
    // guard that keeps log2 off v ≤ 0), above-window overflows to hi+1
    when(v <= lit(nhBound(schema, lo)), lit(lo.toLong))
      .otherwise(greatest(lit(lo.toLong), least(fixed, lit((hi + 1).toLong))))
      .cast("int")
  }

  /** The ingest shape at an arbitrary schema — one row per
    * (step, metric, bucket), same long form as [[nhistBuild]].
    */
  def nhistBuildSchema(s: SparkSession, dir: String, schema: Int): DataFrame =
    Tables.events(s, dir)
      .select(stepHour(col("ts")), col("event_type"),
        (if (schema <= 3) nhKS(col("value"), schema)
         else nhKSWide(col("value"), schema)).as("k"))
      .groupBy("step", "event_type", "k")
      .agg(count(lit(1)).as("cnt"))

  /** histogram_quantile over the generalized-schema buckets. Two
    * interpolation modes:
    *
    *  - linear (default): the engine contract shared with
    *    [[nhistQuantile]] — linear in value space between the exact
    *    bucket bounds.
    *  - exponential (`exponential = true`): UPSTREAM PARITY — since
    *    Prometheus 2.47 native-histogram quantiles interpolate on the
    *    exponential scale, q = lower·(upper/lower)^frac =
    *    2^((k−1+frac)/2^s). The exponent arithmetic is exact-IEEE on
    *    both engines ((k−1+frac) is double addition, /2^s an exact
    *    scaling); the one transcendental op is the final pow(2, e),
    *    rounded at 9 dp on both sides (measured flip-free at sf0.01
    *    and sf0.1 — see NhistSchemaSpec for the convexity contract
    *    exp ≤ linear that pins the semantics).
    *
    * Scale shape: identical to [[nhistQuantile]] — the cumulative
    * window is bounded per histogram BY SCHEMA (≤ 61 rows at schema 2).
    */
  def nhistQuantileSchema(s: SparkSession, dir: String, schema: Int,
                          q: Double = 0.9,
                          exponential: Boolean = false): DataFrame = {
    val byH = Window.partitionBy("step", "event_type")
    val wCum = byH.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundAt = (kc: Column) =>
      if (schema <= 3) nhBoundCol(schema, kc) else nhBoundWide(schema, kc)
    val lower = boundAt(col("k") - 1)
    val upper = boundAt(col("k"))
    val frac = (col("rnk") - col("cum") + col("cnt")).cast("double") /
      col("cnt").cast("double")
    val qv =
      if (exponential) {
        val parts = math.pow(2.0, schema.toDouble) // exact for |s| ≤ 8
        round(pow(lit(2.0),
          (col("k").cast("double") - lit(1.0) + frac) / lit(parts)), 9)
      } else if (schema <= 3) round(lower + (upper - lower) * frac, 12)
      // wide schemas: NO rounding — the operands (table doubles, exact
      // octave scaling, integer-ratio frac) are engine-identical by
      // construction, so the raw IEEE result already matches bit for
      // bit; a fixed-dp round can land exactly on a decimal TIE
      // (binary fractions with 2^-13 factors tie at the 12th digit)
      // and tie-breaking is the one op the engines implement
      // differently (measured: maxdiff 1e-12 at schema 8)
      else lower + (upper - lower) * frac
    nhistBuildSchema(s, dir, schema)
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(byH))
      .withColumn("rnk", ceilPos(col("n"), q))
      .filter(col("cum") >= col("rnk") &&
        col("cum") - col("cnt") < col("rnk"))
      .select(col("step"), col("event_type"), qv.as("q_value"))
  }

  /** SCRAPE-INTERVAL inference: per metric, the distribution of
    * inter-sample gaps within each series — what Prometheus derives to
    * pick staleness windows and what a TSDB compactor uses to size
    * chunks (the reference's writer buckets chunks by time for the
    * same reason). Gaps are integer µs (exact); median/p95 are
    * k-th-smallest RANK statistics (the quantilePos contract) over the
    * per-metric gap multiset, so every emitted number is an integer
    * both engines order identically.
    *
    * Scale shape: ONE window pass per series (lag over the series key
    * — cardinality ≫ cores), then the rank pick runs on a VALUE
    * HISTOGRAM, not raw gaps: scrape intervals repeat, so
    * groupBy(metric, gap) collapses N samples to |distinct gaps| rows
    * per metric, and the k-th smallest gap falls out of a cumulative
    * count over those distinct values (the q_promql_quantile_agg
    * two-phase pick). A per-metric row_number over raw gaps would park
    * N/|metrics| rows on one reducer — metric cardinality is tiny —
    * whereas the histogram window's reducer state is |distinct gaps|
    * at ANY corpus size.
    *
    * Gaps difference the µs-TRUNCATED timestamps ((ts div 1000) pairs,
    * ordered by truncated µs then event_id) so the arithmetic matches
    * the oracle's µs axis even on the legacy TIMESTAMP(NANOS) layout
    * with sub-µs residue.
    */
  def scrapeInterval(s: SparkSession, dir: String): DataFrame = {
    val bySeries = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(bySeries))
      .filter(col("prev_us").isNotNull)
      .select(col("event_type"), (col("ts_us") - col("prev_us")).as("gap_us"))
    val n = gaps.groupBy("event_type").agg(
      count(lit(1)).as("n_gaps"),
      min("gap_us").as("min_gap_us"),
      max("gap_us").as("max_gap_us"))
    // value histogram: |distinct gaps| rows per metric, never |samples|
    val hist = gaps.groupBy("event_type", "gap_us")
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("event_type").orderBy(col("gap_us").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picks = hist
      .withColumn("cum", sum("cnt").over(wCum))
      .join(n.select(col("event_type"), col("n_gaps")), "event_type")
      .withColumn("k50", graft.functions.ExactNum.quantilePos(col("n_gaps"), 0.5))
      .withColumn("k95", graft.functions.ExactNum.quantilePos(col("n_gaps"), 0.95))
      .groupBy("event_type").agg(
        max(when(col("cum") >= col("k50") &&
          col("cum") - col("cnt") < col("k50"), col("gap_us")))
          .as("median_gap_us"),
        max(when(col("cum") >= col("k95") &&
          col("cum") - col("cnt") < col("k95"), col("gap_us")))
          .as("p95_gap_us"))
    n.join(picks, "event_type")
      .select(col("event_type"), col("n_gaps"), col("min_gap_us"),
        col("median_gap_us"), col("p95_gap_us"), col("max_gap_us"))
  }

  /** Prometheus 3.x `mad_over_time(metric[1d])` — per-series median
    * absolute deviation about the median, the robust dispersion signal
    * alert rules reach for when outliers poison stddev. Both medians
    * are DISCRETE rank statistics (stored value at ceil(0.5·n) in sort
    * order — the [[quantileOverTime]] contract), so every emitted
    * number is either a stored sample or an IEEE `abs(a - b)` both
    * engines compute identically; no interpolation drift.
    *
    * Scale shape: two rank windows and one equi join, ALL keyed by the
    * same per-(day, series) partition — key cardinality ≫ cores, so no
    * reducer ever holds more than one series-day of samples, and the
    * median join is co-partitioned with the deviation window (one
    * shuffle lineage, AQE reuses the exchange).
    */
  def madOverTime(s: SparkSession, dir: String): DataFrame = {
    val keys = Seq("step", "user_id", "event_type")
    val base = Tables.events(s, dir).select(
      unix_timestamp(date_trunc("day", col("ts"))).as("step"),
      col("user_id"), col("event_type"), col("event_id"), col("value"))
    def pick(src: DataFrame, v: String, out: String): DataFrame = {
      val part = Window.partitionBy(keys.map(col): _*)
      val w = part.orderBy(col(v), col("event_id"))
      src.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(part))
        .filter(col("rn") === ceilPos(col("n"), 0.5))
        .select(keys.map(col) :+ col(v).as(out): _*)
    }
    val med = pick(base, "value", "med")
    val dev = base.join(med, keys)
      .select(keys.map(col) :+ col("event_id") :+
        abs(col("value") - col("med")).as("dev"): _*)
    pick(dev, "dev", "mad")
  }
}
