package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Promql
import graft.sources.DownsampleStore

/** STEPPED PromQL range queries served from the downsample rollup — the
  * Grafana-dashboard path (round 13; VERDICT r12 #1): a range query
  * evaluates `sum(click)` or `avg_over_time(click[1h])` at aligned
  * steps `start, start+step, …, end`, each step aggregating its own
  * lookback window `(t − W, t]`. When start/step/W are all multiples of
  * the store's 300 s resolution, every per-step window is an exact
  * UNION OF ROLLUP BUCKETS — the same alignment law the tumbling
  * rewrite (RollupRewrite.scala) uses — so the query re-aggregates
  * rollup rows (series × W/300 per step) instead of raw samples. This
  * is Thanos's downsampled-block serving posture for the single
  * highest-traffic query shape a dashboard issues.
  *
  * Why this lives in the FRONT-END and not the Catalyst rule: the
  * stepped evaluator's plan explodes each sample to its covering steps
  * (Generate over a computed k-range) before aggregating. A Generate
  * carries per-row multiplicities the algebraic matcher cannot safely
  * re-derive from the tree — the semantic form (verb, window, spec)
  * lives in the PromQL front-end, which therefore makes the access-path
  * choice itself, exactly where Thanos's query frontend picks a
  * downsampling resolution. Same opt-in flag, same staleness gate, same
  * bit-exactness contract as the rule.
  *
  * The boundary soundness gate: PromQL 3.x windows are (t − W, t] —
  * open at the left. Bucket [b, b+300) decomposes into such windows
  * exactly iff no sample sits at a bucket's first microsecond (u ≡ 0
  * mod 300 s), so serving additionally requires the store's
  * `_edge_count` marker to be zero (DownsampleStore.boundaryClean) —
  * a property recorded once per write-once store. A boundary-dirty
  * store falls back to the raw evaluator, never to a wrong answer.
  */
object SteppedRollup {

  /** Verbs the rollup answers losslessly over bucket partials — the
    * same algebraic family the tumbling rule serves: sums/counts merge
    * associatively (DECIMAL partials), order statistics compose, and
    * last/first are the extreme bucket's stored endpoint (exactly one
    * store row per series per bucket, and the evaluator always groups
    * by full series identity, so the arg-pick never ties). The
    * stored-value rate/increase serve too — via [[CounterFns]]'s
    * counter partials below; only the *_extrapolated parity variants
    * stay raw (edge extrapolation needs exact in-window first/last
    * sample TIMESTAMPS the partials lack).
    */
  val LosslessFns: Set[String] = Set(
    "sum_over_time", "count_over_time", "avg_over_time",
    "min_over_time", "max_over_time", "last_over_time", "first_over_time",
    // the native-histogram HEADER verbs (round 14; VERDICT r13 #6):
    // over the schema-0 histogram a window's samples implicitly form,
    // count/sum/avg ARE the window's count/exact-sum/avg — the same
    // n_samples / sum_dec fields the store carries
    "histogram_count", "histogram_sum", "histogram_avg")

  /** The counter family (round 13, Thanos's counter aggregate): the
    * stored-value rate/increase semantics decompose exactly over
    * buckets — a window's reset-corrected growth = Σ within-bucket
    * growths (the store's `inc_dec` partial, quantized per pair exactly
    * like the evaluator's exactSum) + Σ boundary growths between
    * consecutive non-empty covered buckets, reconstructed at query
    * time from the stored endpoints (last_value of the previous bucket
    * vs first_value of the next — the same (µs, event_id)-ordered
    * samples the raw lag pairs). Served from the batch store, and
    * (round 14) from stream stores whose parts carry the c1 revision:
    * RollupMaintainStream's buffered-state fold sees each bucket whole
    * when the watermark closes it, so inc_dec is computed online —
    * pre-c1 stream stores (windowed-agg parts without the column)
    * keep refusing via the `_schema_rev` gate.
    */
  val CounterFns: Set[String] = Set("rate", "increase")

  /** Coarsest-first BATCH store level pick — 1 d (round 15), then 1 h,
    * then 300 s (Thanos's auto-downsampling resolution pick): a level
    * serves only when the whole grid aligns to it (`alignedTo`), the
    * store is materialized (`_SUCCESS`), and it is boundary-clean; a
    * finer level is never refused because a coarser one is absent.
    * Shared between the stepped front-end and the rule-group compiler
    * (round 17) so both make the identical access-path choice.
    */
  def batchLevel(s: SparkSession, dir: String,
                 alignedTo: Long => Boolean): Option[(String, Long)] = {
    def pick(res: Long, p: String, clean: => Boolean): Option[(String, Long)] =
      if (!alignedTo(res)) None
      else if (new java.io.File(p, "_SUCCESS").isFile && clean) Some((p, res))
      else None
    pick(DownsampleStore.DayResolutionSec,
        DownsampleStore.storePath1d(s, dir),
        DownsampleStore.boundaryClean1d(s, dir))
      .orElse(pick(DownsampleStore.HourResolutionSec,
        DownsampleStore.storePath1h(s, dir),
        DownsampleStore.boundaryClean1h(s, dir)))
      .orElse(pick(DownsampleStore.ResolutionSec,
        DownsampleStore.storePath(s, dir),
        DownsampleStore.boundaryClean(s, dir)))
  }

  /** Serve `fn(sel[windowSec])` at `spec`'s aligned steps from the
    * rollup, or None when any soundness gate fails (caller falls back
    * to the raw evaluator):
    *   - session flag off, verb not lossless, or window/start/step not
    *     300 s-aligned (a misaligned window cuts within buckets);
    *   - selector pins a fixed @ time, carries a non-aligned offset, or
    *     references derived (payload) labels the store doesn't carry;
    *   - a matcher touches anything but the store's own label columns;
    *   - store not materialized (`_SUCCESS`) or not boundary-clean.
    */
  /** @param rawTail re-evaluates the SAME query raw over a narrowed
    *   spec — the hybrid fresh-tail hook (round 15; VERDICT r14 #3):
    *   when [[RollupRewrite.FreshTailConf]] is also on and a stream
    *   store's horizon splits the step grid, steps past the horizon
    *   evaluate raw over ONLY the tail's time range (the caller's
    *   scan-pushdown bounds derive from the narrowed spec) and union
    *   with the rollup-served closed steps into one grid.
    */
  def serve(s: SparkSession, dir: String, fn: String, sel: Promql.Selector,
            windowSec: Long, spec: Promql.EvalSpec,
            labels: Seq[String],
            rawTail: Promql.EvalSpec => DataFrame): Option[DataFrame] = {
    val R = DownsampleStore.ResolutionSec
    val counter = CounterFns.contains(fn)
    val shapeOk =
      s.conf.get(RollupRewrite.Flag, "false").toBoolean &&
        (LosslessFns.contains(fn) || counter) &&
        windowSec > 0 && windowSec % R == 0 &&
        spec.startSec % R == 0 && spec.stepSec % R == 0 &&
        sel.atSec.isEmpty && sel.offsetSec % R == 0 &&
        sel.extraLabels.isEmpty &&
        sel.matchers.forall(m => m._1 == "user_id" || m._1 == "event_type") &&
        labels.forall(l => l == "user_id" || l == "event_type")
    if (!shapeOk) return None
    // store resolution mirrors the tumbling rule's: the explicit
    // stream-maintained store (horizon = its watermark marker; only
    // steps whose whole window closes at or before it serve) when the
    // session names one, else the batch MV (freshness = existence).
    // Batch serving PICKS THE COARSEST aligned chain level (round 14,
    // Thanos's auto-downsampling resolution pick): an hour-aligned
    // query reads the 1 h store — 12× fewer rollup rows — and only
    // falls to the 300 s level when the hour level is absent, dirty,
    // or the grid is finer than an hour. The stream store is
    // 300 s-only (its maintenance loop targets freshness, not depth).
    def alignedTo(r: Long): Boolean =
      windowSec % r == 0 && spec.startSec % r == 0 &&
        spec.stepSec % r == 0 && sel.offsetSec % r == 0
    val streamDir = s.conf.get(RollupRewrite.StreamStoreConf, "")
    val resolved: Option[(Seq[String], Option[Long], Long)] =
      if (streamDir.nonEmpty) {
        import graft.streaming.{RollupMaintainStream => RMS}
        // the store's recorded source dataset must be the query's —
        // a session conf never serves another dataset's data
        for {
          src <- RMS.sourceDir(streamDir)
          if new java.io.File(src).getCanonicalPath ==
            new java.io.File(dir).getCanonicalPath
          if RMS.keyRevOk(streamDir)
          h <- RMS.horizonSec(streamDir)
          e <- RMS.edgeCount(streamDir) if e == 0L
          // markers can exist with no parts (zero-data pass) — fall
          // back to raw, never throw at plan time (ADVICE r13)
          paths <- RMS.servingPaths(streamDir)
        } yield (paths, Some(h), R)
      } else batchLevel(s, dir, alignedTo)
        .map { case (p, r) => (Seq(p), Option.empty[Long], r) }
    if (resolved.isEmpty) return None
    val (store, horizon, res) = resolved.get
    // counter verbs need the inc_dec partial: always present in the
    // batch store, present in stream stores from part-schema rev c1 on
    if (counter && horizon.isDefined && streamDir.nonEmpty &&
      !graft.streaming.RollupMaintainStream.counterRevOk(streamDir))
      return None
    // one store level's covered frame: matchers → offset shift → range
    // prune → covering-step explode, all parameterized by the level's
    // resolution (the kMin/kMax law holds at any aligned res)
    def coveredFor(paths: Seq[String], bres: Long) = {
      val t = DownsampleStore.readServingPaths(s, paths, counters = counter)
      val named =
        if (sel.metric.isEmpty) t else t.filter(col("event_type") === sel.metric)
      // label matchers replay verbatim on the store's own label columns
      // (whole-row selection — every store row carries both labels), via
      // the SAME matcher path the raw scan uses
      val matched = graft.operators.Scan.applyMatchers(named, sel.matchers)
      // offset shifts the sample axis by a bucket-aligned amount, so the
      // store serves it by shifting the bucket axis
      val shifted =
        if (sel.offsetSec == 0L) matched
        else matched.withColumn("bucket", col("bucket") + lit(sel.offsetSec))
      // bucket b (covering [b, b+res) on the shifted axis) lies wholly
      // inside step t's window (t − W, t] iff t − W <= b <= t − res — the
      // range prune reaches the store's parquet row groups (the store is
      // range-partitioned and sorted on bucket)
      val pruned = shifted.filter(
        col("bucket") >= lit(spec.startSec - windowSec) &&
          col("bucket") <= lit(spec.endSec - bres))
      // covering steps of a bucket: t = A + kS with
      //   kMin = ceil((b + res − A) / S), kMax = floor((b + W − A) / S),
      // clamped to the spec grid. Deltas stay far below 2^53, so the
      // double floor/ceil is exact (the raw evaluator's same argument).
      val delta = (col("bucket") - lit(spec.startSec)).cast("double")
      val kMin = greatest(lit(0L),
        ceil((delta + lit(bres.toDouble)) / lit(spec.stepSec.toDouble)).cast("long"))
      val kMax = least(lit(spec.maxK),
        floor((delta + lit(windowSec.toDouble)) / lit(spec.stepSec.toDouble)).cast("long"))
      pruned
        .withColumn("__sr_kmin", kMin).withColumn("__sr_kmax", kMax)
        .filter(col("__sr_kmin") <= col("__sr_kmax"))
        .withColumn("__sr_k", explode(sequence(col("__sr_kmin"), col("__sr_kmax"))))
        .withColumn("step", col("__sr_k") * spec.stepSec + spec.startSec)
    }
    // BANDS (round 16; VERDICT r15 #2): with a stream store, each step
    // is served by EXACTLY ONE level — closed days by the folded 1 d
    // level, then closed hours by the folded 1 h level, then the 300 s
    // parts up to the store horizon. Band bounds shift with the
    // selector offset exactly like the horizon gate did: step t's
    // window reads ORIGINAL-axis buckets up to t − offset, all folded
    // into level L iff t − offset ≤ L's horizon — later steps fall to
    // the next finer band, never serve partial. A fold level joins
    // only when the whole grid aligns to its resolution.
    val bands: Seq[(Seq[String], Long, Option[Long], Option[Long])] =
      if (horizon.isEmpty) Seq((store, res, None, None))
      else {
        import graft.streaming.{RollupMaintainStream => RMS}
        val off = sel.offsetSec
        val lev1d =
          if (alignedTo(DownsampleStore.DayResolutionSec))
            RMS.foldedLevel(streamDir, DownsampleStore.DayResolutionSec)
          else None
        val lev1h =
          if (alignedTo(DownsampleStore.HourResolutionSec))
            RMS.foldedLevel(streamDir, DownsampleStore.HourResolutionSec)
          else None
        val h1d = lev1d.map(_._2 + off)
        val h1h = lev1h.map(_._2 + off)
        Seq(
          lev1d.map { case (incs, _) =>
            (incs, DownsampleStore.DayResolutionSec, Option.empty[Long], h1d) },
          lev1h.map { case (incs, _) =>
            (incs, DownsampleStore.HourResolutionSec, h1d, h1h) },
          Some((store, res, h1h.orElse(h1d),
            Some(horizon.get + off)))
        ).flatten
      }
    // RETENTION floor gate (round 17; VERDICT r16 #1): raw buckets
    // below the store's `_compact` floor may have been dropped — every
    // step the raw band serves must read only retained buckets. The
    // earliest raw-band step is the first grid point above the band's
    // lower bound (the 1h/1d fold horizon when those bands joined);
    // its window reads original-axis buckets down to tMin − W − off.
    // A query reaching below the floor hands back to the raw events
    // evaluator — slower, never under-counted. Fold-band steps are
    // unaffected (those levels are never retention-dropped).
    if (horizon.isDefined && streamDir.nonEmpty) {
      val floor = graft.streaming.RollupCompactor.retainFloor(streamDir)
      if (floor != graft.streaming.RollupCompactor.NoFloor) {
        val rawLo = bands.last._3 // the raw band's step lower bound
        val tMin = rawLo.fold(spec.startSec) { l =>
          math.max(spec.startSec, spec.startSec +
            (Math.floorDiv(l - spec.startSec, spec.stepSec) + 1L) *
              spec.stepSec)
        }
        val rawHi = horizon.get + sel.offsetSec
        if (tMin <= math.min(spec.endSec, rawHi) &&
            tMin - windowSec - sel.offsetSec < floor) return None
      }
    }
    val covered = bands.map { case (paths, bres, lo, hi) =>
      val c = coveredFor(paths, bres)
      val c1 = hi.fold(c)(h => c.filter(col("step") <= lit(h)))
      lo.fold(c1)(l => c1.filter(col("step") > lit(l)))
    }.reduce(_ unionAll _)
    // hybrid fresh-tail (round 15; VERDICT r14 #3): with the opt-in on,
    // steps past the horizon re-evaluate RAW over only the tail's time
    // range instead of being withheld. hServable is the last servable
    // step value; the first open step is the next grid point after it.
    val hServable = horizon.map(_ + sel.offsetSec)
    val freshTail = horizon.isDefined &&
      s.conf.get(RollupRewrite.FreshTailConf, "false").toBoolean
    // nothing closed at all → the hybrid IS the raw evaluation; hand
    // the whole query back rather than planning an empty rollup side
    if (freshTail && hServable.exists(_ < spec.startSec)) return None
    val tailSpec: Option[Promql.EvalSpec] =
      hServable.filter(_ => freshTail).flatMap { hs =>
        if (hs >= spec.endSec) None // whole grid closed — no tail
        else {
          val firstOpen = spec.startSec +
            (Math.floorDiv(hs - spec.startSec, spec.stepSec) + 1L) *
              spec.stepSec
          if (firstOpen > spec.endSec) None
          else Some(spec.copy(startSec = firstOpen))
        }
      }
    val g = covered.groupBy(("step" +: labels).map(col): _*)
    // each measure mirrors the raw evaluator's arithmetic EXACTLY:
    // decimal partial sums re-merge (bit-equal through the double
    // cast), counts are sums of bucket row counts, avg is the same
    // double division of the same two operands, endpoints are the
    // extreme covering bucket's stored pick
    val out = fn match {
      case "rate" | "increase" =>
        // boundary growths: consecutive NON-EMPTY covered buckets per
        // (step, series) — lag over rollup rows reproduces exactly the
        // raw evaluator's consecutive-sample pairs that straddle a
        // bucket edge; within-bucket pairs are the stored inc_dec
        val bw = org.apache.spark.sql.expressions.Window
          .partitionBy(("step" +: labels).map(col): _*)
          .orderBy(col("bucket"))
        val dec = org.apache.spark.sql.types.DecimalType(30, 6)
        val zero = lit(java.math.BigDecimal.ZERO).cast(dec)
        val withPrev = covered
          .withColumn("__sr_prev_last", lag("last_value", 1).over(bw))
        val boundary = when(col("__sr_prev_last").isNull, lit(null))
          .otherwise(when(col("first_value") >= col("__sr_prev_last"),
            col("first_value") - col("__sr_prev_last"))
            .otherwise(col("first_value"))).cast(dec)
        val inc = withPrev.withColumn("__sr_binc", boundary)
          .groupBy(("step" +: labels).map(col): _*)
          .agg((coalesce(sum(col("inc_dec")), zero) +
            coalesce(sum(col("__sr_binc")), zero))
            .cast("double").as("value"))
        if (fn == "increase") inc
        else inc.withColumn("value",
          col("value") / lit(windowSec.toDouble))
      case "count_over_time" | "histogram_count" =>
        g.agg(sum("n_samples").cast("double").as("value"))
      case "sum_over_time" | "histogram_sum" =>
        g.agg(sum("sum_dec").cast("double").as("value"))
      case "avg_over_time" | "histogram_avg" =>
        g.agg((sum("sum_dec").cast("double") / sum("n_samples")).as("value"))
      case "min_over_time" => g.agg(min("min_value").as("value"))
      case "max_over_time" => g.agg(max("max_value").as("value"))
      case "last_over_time" =>
        g.agg(max_by(col("last_value"), col("bucket")).as("value"))
      case "first_over_time" =>
        g.agg(min_by(col("first_value"), col("bucket")).as("value"))
    }
    // union the raw-evaluated open tail onto the rollup-served closed
    // steps: one grid, each step answered by exactly one side (closed ≤
    // hServable from the store, open > hServable raw), columns aligned
    // by name — the raw evaluator and this serving share the
    // (step, labels…, value) shape by construction
    Some(tailSpec.fold(out)(tsp =>
      out.unionAll(rawTail(tsp).select(out.columns.map(col).toSeq: _*))))
  }
}
