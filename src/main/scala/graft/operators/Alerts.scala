package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prometheus ALERTING-RULE evaluation over the stepped PromQL
  * evaluator — the rule state machine users actually run on a TSDB
  * (the reference serves the Prometheus querier API,
  * prometheus/querier.go; rule evaluation is the standing consumer of
  * that API: an instant-vector expr evaluated on an aligned grid, fed
  * through the pending → firing `for:` clock, with `keep_firing_for:`
  * hysteresis on resolve).
  *
  * Semantics implemented (upstream rules/alerting.go behavior, restated
  * on the aligned step grid):
  *
  *  - the rule expr (usually a comparison-filtered vector) returns, at
  *    each evaluation step, the label sets for which the condition
  *    HOLDS;
  *  - a label set becomes PENDING at its first held step (active_at),
  *    and FIRING once it has held continuously for ≥ `for` seconds
  *    (step − active_at ≥ forSec);
  *  - a PENDING alert whose condition stops holding is dropped
  *    immediately;
  *  - a FIRING alert whose condition stops holding keeps firing while
  *    (step − lastHeldStep) ≤ keepG, then resolves; if the condition
  *    holds again inside that window the alert CONTINUES firing (no new
  *    pending phase) — hysteresis bridges gaps. keepG is keepFiringFor
  *    ROUNDED UP TO THE STEP GRID: upstream anchors KeepFiringSince at
  *    the first MISSED eval and fires while (now − since) < keep, i.e.
  *    it allows m missed evals iff (m−1)·step < keep ⟺
  *    m ≤ ceil(keep/step) — exactly the machine below run with
  *    keepG = ceil(keep/step)·step (the last-held anchor is one step
  *    before the first missed one). The ceil is therefore not an
  *    approximation: it reproduces rules/alerting.go's anchoring for
  *    EVERY keep, step-aligned or not (AlertsPropSpec's referee is
  *    written in the literal KeepFiringSince form and sweeps
  *    half-step keeps).
  *
  * Spark-first shape: NO sequential fold. The per-series recurrence
  * factors into window passes, each partitioned by the series label
  * set and bounded by the evaluation grid length (spec.maxK + 1 rows
  * per series — never sample count):
  *
  *  1. consecutive held runs via gaps-and-islands
  *     (step − row_number·stepSec);
  *  2. islands chain into hysteresis groups: a gap of g seconds
  *     bridges iff every missed eval stays within keep of the last
  *     held step, i.e. g ≤ keepFiringFor + stepSec;
  *  3. a chain IGNITES at the first island that holds long enough on
  *     its own (span ≥ forSec); its fire time is island_start + forSec.
  *     A running min over the chain gives each held row its governing
  *     fire time: firing iff step ≥ that time. Pre-ignition islands
  *     evaluate pending-only — exactly upstream's "pending alerts do
  *     not survive a missed eval, so they cannot seed hysteresis";
  *  4. resolve-side extension rows (firing emitted at steps where the
  *     expr did NOT hold) come from the dense grid of alerted series ×
  *     steps, a broadcast of the alerted label sets (alert cardinality,
  *     not series cardinality) against a sequence() of the grid.
  *
  * With keepFiringFor = 0 every gap breaks the chain and no extension
  * rows exist — the plain `for:` rule falls out of the same plan.
  */
object Alerts {

  /** Evaluate an alerting rule: `expr` (a PromQL string whose result is
    * the held-condition vector) on `spec`'s grid, with `for:` = forSec
    * and `keep_firing_for:` = keepSec. Returns one row per (step,
    * label set) where the alert is active: columns (step, labels...,
    * alertstate ∈ pending|firing, value) — the ALERTS synthetic series
    * plus the expr's value (last held value on extension steps,
    * upstream's Alert.Value behavior).
    */
  def rule(s: SparkSession, dir: String, expr: String,
           spec: Promql.EvalSpec, forSec: Long,
           keepSec: Long = 0L): DataFrame =
    alertStates(s, Promql.queryAt(s, dir, expr, spec), spec, forSec, keepSec)

  /** ALERTS AS SERIES (round 16; VERDICT r15 #8): persist a rule's
    * state-machine output as the synthetic `ALERTS{alertname=...,
    * alertstate=pending|firing, <rule labels>} = 1` series Prometheus
    * publishes, through the recorded-rules store — so PromQL can
    * aggregate over alert HISTORY (count firing per hour, join an
    * alert's activity against the raw metric that tripped it) like any
    * metric. alertname/alertstate ride the store's props payload (the
    * generalized label channel); a rule label named user_id keeps its
    * physical column, so `* on(user_id)` joins against raw metrics
    * need no relabeling. One store per alertname (`ALERTS__<name>`),
    * all wearing the metric name ALERTS — Prometheus's one-metric
    * posture, reconstituted through the union namespace.
    */
  def recordSeries(s: SparkSession, dir: String, alertname: String,
                   expr: String, spec: Promql.EvalSpec, forSec: Long,
                   keepSec: Long = 0L): String = {
    require(alertname.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"bad alert name $alertname")
    graft.sources.RecordedRules.recordSamples(s, dir, s"ALERTS__$alertname",
      s"$expr @${spec.startSec}/${spec.endSec}/${spec.stepSec}/" +
        s"${spec.lookbackSec} for=$forSec keep=$keepSec",
      graft.sources.RecordedRules.toSamples(
        rule(s, dir, expr, spec, forSec, keepSec)
          .withColumn("alertname", lit(alertname))
          .withColumn("value", lit(1.0)),
        "ALERTS"))
  }

  /** The SECOND synthetic series Prometheus publishes per active alert:
    * `ALERTS_FOR_STATE{alertname=..., <rule labels>} = ActiveAt` (epoch
    * sec) — the series upstream itself reads back to restore `for:`
    * clocks across restarts (rules/alerting.go QueryForStateSeries).
    * Carries alertname + the rule's labels but NOT alertstate (upstream
    * parity), one sample per active (step, series).
    */
  def recordForState(s: SparkSession, dir: String, alertname: String,
                     expr: String, spec: Promql.EvalSpec, forSec: Long,
                     keepSec: Long = 0L): String = {
    require(alertname.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"bad alert name $alertname")
    graft.sources.RecordedRules.recordSamples(s, dir,
      s"ALERTS_FOR_STATE__$alertname",
      s"$expr @${spec.startSec}/${spec.endSec}/${spec.stepSec}/" +
        s"${spec.lookbackSec} for=$forSec keep=$keepSec forstate",
      graft.sources.RecordedRules.toSamples(
        alertStatesAll(s, Promql.queryAt(s, dir, expr, spec),
            spec, forSec, keepSec)
          .withColumn("alertname", lit(alertname))
          .withColumn("value", col("active_at").cast("double"))
          .drop("active_at", "alertstate"),
        "ALERTS_FOR_STATE"))
  }

  /** The state machine alone, over any stepped held-condition frame
    * (columns: step, labels..., value). Exposed for the streaming twin
    * and specs.
    */
  def alertStates(s: SparkSession, held: DataFrame, spec: Promql.EvalSpec,
                  forSec: Long, keepSec: Long): DataFrame =
    alertStatesAll(s, held, spec, forSec, keepSec).drop("active_at")

  /** [[alertStates]] plus the `active_at` column — upstream's Alert
    * .ActiveAt, the timestamp the CURRENT episode became pending:
    * a pre-ignition (pending) island is its own episode (pending drops
    * at the first missed eval), so active_at = the island's start; a
    * firing row's episode began when its GOVERNING ignition became
    * pending, so active_at = fire_time − for — stable across bridged
    * hysteresis gaps exactly as upstream never resets ActiveAt while
    * the alert stays firing. Feeds the ALERTS_FOR_STATE synthetic
    * series ([[recordSeries]]) — the series Prometheus itself uses to
    * restore `for:` clocks across restarts.
    */
  private[graft] def alertStatesAll(s: SparkSession, held: DataFrame,
                                    spec: Promql.EvalSpec,
                                    forSec: Long, keepSec: Long): DataFrame = {
    require(forSec >= 0 && keepSec >= 0, "for/keep_firing_for must be >= 0")
    val labels = held.columns.filterNot(Set("step", "value")).toSeq
    val labCols = labels.map(col)
    val stepS = spec.stepSec
    // keep_firing_for on the grid: ceil to a step multiple — the exact
    // KeepFiringSince anchoring (see the object doc's derivation)
    val keepG =
      if (keepSec <= 0L) 0L
      else ((keepSec + stepS - 1L) / stepS) * stepS

    val bySeries = Window.partitionBy(labCols: _*)
    val wSteps = bySeries.orderBy("step")

    // 1. consecutive held runs
    val isl = held
      .withColumn("island",
        col("step") - row_number().over(wSteps) * lit(stepS))

    // 2+3. island spans → hysteresis chains → running ignition time.
    // Island metadata is one row per (series, island) — computed with
    // aggregations, then windows over islands (rows per series bounded
    // by the grid length).
    val spans = isl.groupBy((labCols :+ col("island")): _*)
      .agg(min("step").as("a_start"), max("step").as("a_end"))
    val wIsl = bySeries.orderBy("a_start")
    val chains = spans
      .withColumn("gap", col("a_start") - lag("a_end", 1).over(wIsl))
      .withColumn("brk",
        when(col("gap").isNull || col("gap") > lit(keepG + stepS), 1L)
          .otherwise(0L))
      .withColumn("chain", sum("brk").over(
        wIsl.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val byChain = Window.partitionBy((labCols :+ col("chain")): _*)
      .orderBy("a_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ignited = chains
      .withColumn("self_fire",
        when(col("a_end") - col("a_start") >= lit(forSec),
          col("a_start") + lit(forSec)))
      .withColumn("fire_time", min("self_fire").over(byChain))

    // held rows with their governing fire time + episode start
    val heldState = isl
      .join(ignited.select((labCols :+ col("island") :+ col("fire_time") :+
          col("a_start")): _*),
        labels :+ "island")
      .withColumn("alertstate",
        when(col("fire_time").isNotNull && col("step") >= col("fire_time"),
          lit("firing")).otherwise(lit("pending")))
      .withColumn("active_at",
        when(col("fire_time").isNotNull && col("step") >= col("fire_time"),
          col("fire_time") - lit(forSec)).otherwise(col("a_start")))

    val outCols = Seq(col("step")) ++ labCols ++
      Seq(col("alertstate"), col("value"), col("active_at"))
    if (keepSec <= 0L) return heldState.select(outCols: _*)

    // 4. extension rows: dense grid over ALERTED series only
    val steps = s.range(0, spec.maxK + 1)
      .select((lit(spec.startSec) + col("id") * lit(stepS)).as("step"))
    val series = heldState.select(labCols: _*).distinct()
    val grid = steps.crossJoin(broadcast(series))
    val wRun = bySeries.orderBy("step")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dense = grid
      .join(heldState, (Seq("step") ++ labels).toSeq, "left")
      .withColumn("last_held",
        last(when(col("alertstate").isNotNull, col("step")), ignoreNulls = true)
          .over(wRun))
      .withColumn("last_state",
        last(col("alertstate"), ignoreNulls = true).over(wRun))
      .withColumn("last_value",
        last(when(col("alertstate").isNotNull, col("value")),
          ignoreNulls = true).over(wRun))
      .withColumn("last_active",
        last(when(col("alertstate").isNotNull, col("active_at")),
          ignoreNulls = true).over(wRun))
    dense
      .withColumn("out_state",
        when(col("alertstate").isNotNull, col("alertstate"))
          .when(col("last_state") === "firing" &&
            col("step") - col("last_held") <= lit(keepG), lit("firing")))
      .filter(col("out_state").isNotNull)
      .select((Seq(col("step")) ++ labCols ++ Seq(
        col("out_state").as("alertstate"),
        coalesce(col("value"), col("last_value")).as("value"),
        coalesce(col("active_at"), col("last_active")).as("active_at"))): _*)
  }
}
