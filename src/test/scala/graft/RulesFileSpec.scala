package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Alerts, Promql, RuleGroup, RulesFile}
import SparkFixture.spark

/** The Prometheus rules-file front-end: the rulefmt YAML subset parses,
  * group-compilable exprs land in the shared pass, irreducible exprs
  * fall back to the generic evaluator — and every leg is bit-equal to
  * its standalone evaluation.
  */
class RulesFileSpec extends AnyFunSuite {

  private val dir01 = "/root/testdata/sf0.01"
  private val spec = Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L)

  private val yaml =
    """groups:
      |  - name: service_rules
      |    interval: 1h
      |    rules:
      |      - alert: rf_hot
      |        expr: sum by (event_type) (count_over_time({event_type=~"click|view|purchase|signup|error"}[2h])) > 6
      |        for: 2h
      |        keep_firing_for: 1h
      |        labels:
      |          severity: page
      |      - alert: rf_rate
      |        expr: sum by (event_type) (rate({event_type=~"click|view"}[2h])) > 0.002
      |        for: 2h
      |      - record: rf_click_sum1h
      |        expr: sum by (user_id) (sum_over_time(click[1h]))
      |      - record: rf_view_avg2h
      |        expr: avg_over_time(view[2h])
      |      # an expr the group compiler cannot share — falls back to
      |      # the generic alert evaluator
      |      - alert: rf_ratio
      |        expr: sum by (event_type) (count_over_time({event_type=~"click|view"}[2h])) / 2 > 3
      |        annotations:
      |          summary: "irreducible expr"
      |""".stripMargin

  private def eq(a: org.apache.spark.sql.DataFrame,
                 b: org.apache.spark.sql.DataFrame, tag: String): Unit = {
    val bb = b.select(a.columns.map(col).toSeq: _*)
    assert(a.exceptAll(bb).count() === 0 && bb.exceptAll(a).count() === 0,
      s"$tag: rules-file leg must equal the standalone evaluation")
    assert(a.count() > 0, s"$tag must produce rows")
  }

  test("durations compose like Prometheus's") {
    assert(RulesFile.parseDuration("1h30m") === 5400L)
    assert(RulesFile.parseDuration("90s") === 90L)
    assert(RulesFile.parseDuration("2d") === 172800L)
    assert(RulesFile.parseDuration("1w") === 604800L)
    intercept[IllegalArgumentException](RulesFile.parseDuration("2 hours"))
  }

  test("the rulefmt subset parses: groups, alert/record items, for/keep, nested blocks skipped") {
    val gs = RulesFile.parseYaml(yaml)
    assert(gs.size === 1)
    val g = gs.head
    assert(g.name === "service_rules" && g.intervalSec === 3600L)
    assert(g.rules.map(_.name) ===
      Seq("rf_hot", "rf_rate", "rf_click_sum1h", "rf_view_avg2h", "rf_ratio"))
    val hot = g.rules.head
    assert(hot.isAlert && hot.forSec === 7200L && hot.keepSec === 3600L)
    assert(!g.rules(2).isAlert && g.rules(2).forSec === 0L)
    // the labels:/annotations: blocks were skipped, not mis-attached
    assert(g.rules(4).isAlert && g.rules(4).expr.contains("/ 2 >"))
  }

  test("compile-or-fallback: group shapes compile, irreducible exprs do not") {
    val defs = RulesFile.parseYaml(yaml).flatMap(_.rules)
    val comp = defs.map(d => d.name ->
      graft.operators.RulesFile.compilable(d)).toMap
    assert(comp("rf_hot").isDefined && comp("rf_rate").isDefined &&
      comp("rf_click_sum1h").isDefined && comp("rf_view_avg2h").isDefined)
    assert(comp("rf_ratio").isEmpty, "a binary-arithmetic expr must fall back")
    val hot = comp("rf_hot").get
    assert(hot.verb === "count_over_time" && hot.windowSec === 7200L &&
      hot.metrics.size === 5 && hot.by === Seq("event_type") &&
      hot.cmp === Some((">", 6.0)) && hot.forSec === 7200L &&
      hot.keepSec === 3600L)
    val avg = comp("rf_view_avg2h").get
    assert(avg.verb === "avg_over_time" &&
      avg.by === Seq("user_id", "event_type") && avg.cmp.isEmpty)
    // without() over the physical grain compiles to the complementary
    // by(); count/stddev outer aggs compile; a without() naming a
    // payload label cannot enumerate the grain and falls back
    def one(expr: String, isAlert: Boolean = false) =
      RulesFile.compilable(RulesFile.RuleDef("x", expr, isAlert))
    val wo = one("count without (user_id) (count_over_time(click[1h]))")
    assert(wo.isDefined && wo.get.by === Seq("event_type") &&
      wo.get.outerAgg === "count")
    val dev = one("stddev by (event_type) (count_over_time(click[2h]))")
    assert(dev.isDefined && dev.get.outerAgg === "stddev")
    assert(one("sum without (k) (count_over_time(click[1h]))").isEmpty,
      "without() over a payload label must fall back")
  }

  test("every leg bit-equal to its standalone evaluation; fallback leg included") {
    val outs = RulesFile.evaluate(spark, dir01, spec, yaml)
    eq(outs("rf_hot"), Alerts.rule(spark, dir01,
      """sum by (event_type) (count_over_time({event_type=~"click|view|purchase|signup|error"}[2h])) > 6""",
      spec, forSec = 7200L, keepSec = 3600L), "rf_hot")
    eq(outs("rf_rate"), Alerts.rule(spark, dir01,
      """sum by (event_type) (rate({event_type=~"click|view"}[2h])) > 0.002""",
      spec, forSec = 7200L), "rf_rate")
    eq(outs("rf_click_sum1h"), Promql.queryAt(spark, dir01,
      "sum by (user_id) (sum_over_time(click[1h]))", spec), "rf_click_sum1h")
    eq(outs("rf_view_avg2h").drop("event_type"), Promql.queryAt(spark, dir01,
      "avg_over_time(view[2h])", spec), "rf_view_avg2h")
    eq(outs("rf_ratio"), Alerts.rule(spark, dir01,
      """sum by (event_type) (count_over_time({event_type=~"click|view"}[2h])) / 2 > 3""",
      spec, forSec = 0L), "rf_ratio")
  }

  test("the union shape renders every rule; compiled recordings persist and serve back") {
    val union = RulesFile.evaluateUnion(spark, dir01, spec, yaml)
    val rules = union.select("rule").distinct()
      .collect().map(_.getString(0)).toSet
    assert(rules === Set("rf_hot", "rf_rate", "rf_click_sum1h",
      "rf_view_avg2h", "rf_ratio"))
    assert(union.filter(col("rule") === "rf_ratio")
      .filter(col("alertstate") =!= "firing").count() === 0)
    val back = Promql.query(spark, dir01, "sum(rf_click_sum1h)",
      graft.sources.RecordedRules.RecordedSource("rf_click_sum1h"))
    assert(back.count() > 0)
  }
}
