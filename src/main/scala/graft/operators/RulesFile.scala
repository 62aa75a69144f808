package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PROMETHEUS RULES-FILE FRONT-END (round 17) — the upstream ruler's
  * configuration surface (the rules .yml files: rule groups of `alert:` /
  * `record:` entries with `expr`, `for:`, `keep_firing_for:` —
  * prometheus rulefmt), compiled onto graft's rule-group engine:
  *
  *  - each rule's PromQL `expr` parses through the house parser; rules
  *    whose shape the GROUP COMPILER covers —
  *    `[outerAgg by (labels)] (verb(selector[W])) [cmp threshold]`
  *    with a plain metric / event_type-alternation selector — compile
  *    to [[RuleGroup.Rule]]s and evaluate as ONE shared pass (one
  *    scan; store-served under the rollup rewrite like any group);
  *  - every other expr (arbitrary PromQL: binary arithmetic,
  *    histogram_quantile, joins, ...) FALLS BACK to the generic
  *    evaluator — [[Alerts.rule]] for alerts (the full state machine
  *    over any held-vector expr), [[Promql.queryAt]] for recordings —
  *    one pass per fallback rule, exactly what the group compiler
  *    would cost anyway for a shape it cannot share.
  *
  * The YAML reader handles the rulefmt SUBSET those files actually
  * use: `groups:` → `- name:` / `interval:` / `rules:` →
  * `- alert:|record:` items with `expr`, `for`, `keep_firing_for`;
  * nested `labels:` / `annotations:` blocks are skipped (annotations
  * are presentation; rule labels ride the by() grain here). Durations
  * compose like Prometheus's (`1h30m`, `90s`, `2d`). `interval` is
  * parsed but the evaluation grid comes from the caller's EvalSpec —
  * the ruler owns its clock.
  *
  * 100 TB shape: a 30-rule production group file becomes one pruned
  * scan for its compilable majority plus one pass per irreducible
  * expr — the compile-or-fallback pick is exactly Thanos ruler's
  * query-frontend posture applied to rule evaluation.
  */
object RulesFile {

  case class RuleDef(name: String, expr: String, isAlert: Boolean,
                     forSec: Long = 0L, keepSec: Long = 0L)
  case class GroupDef(name: String, intervalSec: Long, rules: Seq[RuleDef])

  /** Prometheus duration literal: juxtaposed unit terms (`1h30m`),
    * units y/w/d/h/m/s/ms (ms truncates to whole seconds — the grid
    * is second-aligned).
    */
  def parseDuration(s: String): Long = {
    val m = "([0-9]+)(ms|y|w|d|h|m|s)".r
    val parts = m.findAllMatchIn(s.trim).toSeq
    require(parts.nonEmpty && parts.map(_.matched).mkString == s.trim,
      s"bad duration '$s'")
    parts.map { p =>
      val n = p.group(1).toLong
      p.group(2) match {
        case "y"  => n * 31536000L
        case "w"  => n * 604800L
        case "d"  => n * 86400L
        case "h"  => n * 3600L
        case "m"  => n * 60L
        case "s"  => n
        case "ms" => n / 1000L
      }
    }.sum
  }

  private val KeyLine = "^(\\s*)(- )?([A-Za-z_][A-Za-z0-9_]*):\\s*(.*)$".r

  private def unquote(v: String): String = {
    val t = v.trim
    if (t.length >= 2 &&
      ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  /** Parse the rulefmt subset. Indentation-scoped: a `- ` item opens a
    * map whose keys sit deeper than the dash; `labels:`/`annotations:`
    * open nested blocks that are skipped wholesale (every line deeper
    * than their key).
    */
  def parseYaml(text: String): Seq[GroupDef] = {
    val lines = text.split("\n").toSeq
      .filterNot(l => l.trim.isEmpty || l.trim.startsWith("#"))
    val groups = scala.collection.mutable.ArrayBuffer.empty[GroupDef]
    var gName = ""; var gInterval = 0L
    var gRules = scala.collection.mutable.ArrayBuffer.empty[RuleDef]
    var rName = ""; var rExpr = ""; var rAlert = false
    var rFor = 0L; var rKeep = 0L; var inRule = false
    var skipDeeper = -1 // inside labels:/annotations: while indent > this
    def flushRule(): Unit = if (inRule) {
      require(rExpr.nonEmpty, s"rule $rName has no expr")
      gRules += RuleDef(rName, rExpr, rAlert, rFor, rKeep)
      inRule = false; rFor = 0L; rKeep = 0L; rExpr = ""
    }
    def flushGroup(): Unit = {
      flushRule()
      if (gName.nonEmpty) {
        groups += GroupDef(gName, gInterval, gRules.toSeq)
        gRules = scala.collection.mutable.ArrayBuffer.empty[RuleDef]
        gName = ""; gInterval = 0L
      }
    }
    for (line <- lines) line match {
      case KeyLine(indent, dash, key, value) =>
        val depth = indent.length + (if (dash != null) 2 else 0)
        if (skipDeeper >= 0 && indent.length > skipDeeper) ()
        else {
          skipDeeper = -1
          (key, dash != null) match {
            case ("groups", _)   => ()
            case ("name", true)  => flushGroup(); gName = unquote(value)
            case ("name", false) if gName.isEmpty => gName = unquote(value)
            case ("interval", _) => gInterval = parseDuration(unquote(value))
            case ("rules", _)    => ()
            case ("alert", _)    =>
              flushRule(); inRule = true; rAlert = true; rName = unquote(value)
            case ("record", _)   =>
              flushRule(); inRule = true; rAlert = false; rName = unquote(value)
            case ("expr", _)     => rExpr = unquote(value)
            case ("for", _)      => rFor = parseDuration(unquote(value))
            case ("keep_firing_for", _) => rKeep = parseDuration(unquote(value))
            case ("labels", _) | ("annotations", _) =>
              skipDeeper = indent.length
            case (k, _) => sys.error(s"unsupported rules-file key '$k'")
          }
        }
      case l => sys.error(s"unparseable rules-file line: '$l'")
    }
    flushGroup()
    groups.toSeq
  }

  private val CmpOps = Set(">", ">=", "<", "<=", "==", "!=")
  private val GroupVerbs = Set("count_over_time", "sum_over_time",
    "avg_over_time", "min_over_time", "max_over_time", "rate", "increase",
    "stddev_over_time", "stdvar_over_time", "quantile_over_time")
  private val Grain = Seq("user_id", "event_type")

  /** The selector shapes whose metric set is a plain list: a named
    * metric, `event_type="x"`, or `event_type=~"a|b|c"` (a bare
    * alternation of literal names — anchored matching makes it an IN).
    */
  private def metricsOf(sel: Promql.Selector): Option[Seq[String]] = {
    if (sel.offsetSec != 0L || sel.atSec.nonEmpty) return None
    (sel.metric, sel.matchers) match {
      case (m, Seq()) if m.nonEmpty => Some(Seq(m))
      case ("", Seq(("event_type", "=", v))) => Some(Seq(v))
      case ("", Seq(("event_type", "=~", v)))
          if v.matches("[A-Za-z0-9_]+(\\|[A-Za-z0-9_]+)*") =>
        Some(v.split('|').toSeq)
      case _ => None
    }
  }

  /** Match a rule onto the group compiler's shape, or None → fallback.
    * Alerts must carry a scalar comparison; recordings must not.
    */
  private[graft] def compilable(r: RuleDef): Option[RuleGroup.Rule] = {
    val ast = try Promql.parse(r.expr) catch { case _: Throwable => return None }
    val (vec, cmp) = ast match {
      case b: Promql.BinOp if CmpOps(b.op) && !b.bool =>
        b.rhs match {
          case Promql.Scalar(t) => (b.lhs, Some((b.op, t)))
          case _                => (ast, Option.empty[(String, Double)])
        }
      case e => (e, Option.empty[(String, Double)])
    }
    if (r.isAlert != cmp.isDefined) return None
    def fromRange(rf: Promql.RangeFunc, by: Seq[String], outer: String)
        : Option[RuleGroup.Rule] =
      for {
        mets <- metricsOf(rf.sel)
        if GroupVerbs(rf.fn) && rf.rangeSec > 0 && by.nonEmpty
      } yield RuleGroup.Rule(r.name, rf.fn, mets, rf.rangeSec, by,
        cmp, r.forSec, r.keepSec, outer, rf.q)
    vec match {
      case a: Promql.Agg
          if Set("sum", "min", "max", "avg", "count", "group",
            "stddev", "stdvar")(a.op) && a.k == 0 && a.vlabel.isEmpty =>
        // `without (labels)` over the physical grain is the
        // complementary by(); payload labels can't be enumerated, so
        // a without() naming one falls back
        val by =
          if (!a.without) a.by
          else if (a.by.forall(Grain.contains))
            Grain.filterNot(a.by.contains)
          else Seq.empty
        a.child match {
          case rf: Promql.RangeFunc if by.nonEmpty =>
            fromRange(rf, by, a.op)
          case _ => None
        }
      case rf: Promql.RangeFunc => fromRange(rf, Grain, "sum")
      case _ => None
    }
  }

  /** Evaluate every rule of every group in `yaml` on `spec`'s grid:
    * compilable rules in shared passes (via [[RuleGroup.evaluate]] —
    * grain-partitioned, store-served under the rewrite), the rest
    * individually. Returns one frame per rule name.
    */
  def evaluate(s: SparkSession, dir: String, spec: Promql.EvalSpec,
               yaml: String): Map[String, DataFrame] = {
    val defs = parseYaml(yaml).flatMap(_.rules)
    require(defs.map(_.name).distinct.size == defs.size, "duplicate rule")
    val matched = defs.map(d => d -> compilable(d))
    val compiled = matched.collect { case (_, Some(r)) => r }
    val grouped =
      if (compiled.isEmpty) Map.empty[String, DataFrame]
      else RuleGroup.evaluate(s, dir, spec, compiled)
    val fallback = matched.collect { case (d, None) =>
      d.name -> (if (d.isAlert)
        Alerts.rule(s, dir, d.expr, spec, d.forSec, d.keepSec)
      else Promql.queryAt(s, dir, d.expr, spec))
    }.toMap
    grouped ++ fallback
  }

  /** The driver-entry shape, mirroring [[RuleGroup.evaluateUnion]]:
    * (rule, step, series, alertstate, value) for every rule — group
    * legs with their by() identity, fallback legs with their frame's
    * own label columns rendered the same way; compiled recording rules
    * persist through the recorded store exactly as group recordings
    * do.
    */
  def evaluateUnion(s: SparkSession, dir: String, spec: Promql.EvalSpec,
                    yaml: String): DataFrame = {
    val defs = parseYaml(yaml).flatMap(_.rules)
    val outs = evaluate(s, dir, spec, yaml)
    val byName = defs.map(d => d.name -> d).toMap
    val comp = defs.map(d => d.name -> compilable(d)).toMap
    defs.map { d =>
      val df = outs(d.name)
      comp(d.name).filter(_.cmp.isEmpty).foreach { r =>
        graft.sources.RecordedRules.recordGroupRule(s, dir, r.name,
          s"rulesfile:${d.expr} @${spec.startSec}/${spec.endSec}/" +
            s"${spec.stepSec}", df)
      }
      val labelCols = comp(d.name) match {
        case Some(r) => r.by
        case None => df.columns.toSeq
          .filterNot(Set("step", "alertstate", "value"))
      }
      val series = concat_ws(",", labelCols.map(l => col(l).cast("string")): _*)
      df.select(
        lit(d.name).as("rule"),
        col("step"),
        series.as("series"),
        (if (byName(d.name).isAlert) col("alertstate") else lit("none"))
          .as("alertstate"),
        col("value"))
    }.reduce(_ unionAll _)
  }
}
