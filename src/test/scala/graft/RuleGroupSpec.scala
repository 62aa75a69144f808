package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Alerts, Promql, RuleGroup}
import SparkFixture.spark

/** Rule groups — N rules, one scan (round 17; VERDICT r16 #3): a group
  * of alerting + recording rules over one selector family compiles
  * into ONE shared pass (single events scan, multi-measure aggregate),
  * and each rule's output is bit-equal to its standalone evaluation.
  */
class RuleGroupSpec extends AnyFunSuite {

  private val dir01 = "/root/testdata/sf0.01"
  private val spec = Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L)
  private val mets = Seq("click", "view", "purchase", "signup", "error")

  private val rules = Seq(
    RuleGroup.Rule("hot_metric", "count_over_time", mets, 7200L,
      Seq("event_type"), Some((">", 6.0)), forSec = 7200L),
    RuleGroup.Rule("hot_metric_keep", "count_over_time", mets, 7200L,
      Seq("event_type"), Some((">", 6.0)), forSec = 7200L, keepSec = 3600L),
    RuleGroup.Rule("grp_click_cnt1h", "count_over_time", Seq("click"),
      3600L, Seq("user_id")))

  private def eq(a: org.apache.spark.sql.DataFrame,
                 b: org.apache.spark.sql.DataFrame, tag: String): Unit = {
    val bb = b.select(a.columns.map(col).toSeq: _*)
    assert(a.exceptAll(bb).count() === 0 && bb.exceptAll(a).count() === 0,
      s"$tag: group output must equal the standalone evaluation")
    assert(a.count() > 0, s"$tag must produce rows")
  }

  test("each group rule is bit-equal to its standalone evaluation") {
    val outs = RuleGroup.evaluate(spark, dir01, spec, rules)
    val expr = """sum by (event_type) (count_over_time({event_type=~"click|view|purchase|signup|error"}[2h])) > 6"""
    eq(outs("hot_metric"),
      Alerts.rule(spark, dir01, expr, spec, forSec = 7200L), "alert")
    eq(outs("hot_metric_keep"),
      Alerts.rule(spark, dir01, expr, spec, forSec = 7200L, keepSec = 3600L),
      "alert+keep")
    eq(outs("grp_click_cnt1h"),
      Promql.queryAt(spark, dir01,
        "sum by (user_id)(count_over_time(click[1h]))", spec), "recording")
    // the sum/avg verbs ride the same partial-merge law
    val more = Seq(
      RuleGroup.Rule("grp_purchase_sum", "sum_over_time", Seq("purchase"),
        7200L, Seq("user_id")),
      RuleGroup.Rule("grp_view_avg", "avg_over_time", Seq("view"),
        3600L, Seq("user_id", "event_type")))
    val outs2 = RuleGroup.evaluate(spark, dir01, spec, more)
    eq(outs2("grp_purchase_sum"),
      Promql.queryAt(spark, dir01,
        "sum by (user_id)(sum_over_time(purchase[2h]))", spec), "sum verb")
    // PromQL drops the metric-name label after a range function; the
    // group keeps the physical event_type column (pinned to one value
    // here) — align by dropping it
    eq(outs2("grp_view_avg").drop("event_type"),
      Promql.queryAt(spark, dir01, "avg_over_time(view[1h])", spec),
      "avg verb, series grain")
  }

  test("counter verbs in groups: rate/increase bit-equal to standalone through the shared lag pass") {
    val counters = Seq(
      RuleGroup.Rule("grp_rate_alert", "rate", Seq("click", "view"),
        7200L, Seq("event_type"), Some((">", 0.002)), forSec = 7200L),
      RuleGroup.Rule("grp_click_inc", "increase", Seq("click"), 7200L,
        Seq("user_id")),
      RuleGroup.Rule("grp_purchase_rate", "rate", Seq("purchase"), 3600L,
        Seq("user_id", "event_type")))
    val outs = RuleGroup.evaluate(spark, dir01, spec, counters)
    eq(outs("grp_rate_alert"),
      graft.operators.Alerts.rule(spark, dir01,
        """sum by (event_type)(rate({event_type=~"click|view"}[2h])) > 0.002""",
        spec, forSec = 7200L), "rate alert")
    eq(outs("grp_click_inc"),
      Promql.queryAt(spark, dir01,
        "sum by (user_id)(increase(click[2h]))", spec), "increase recording")
    eq(outs("grp_purchase_rate").drop("event_type"),
      Promql.queryAt(spark, dir01, "rate(purchase[1h])", spec),
      "per-series rate")
  }

  test("outer aggregations beyond sum: min/max/avg by() bit-equal to standalone") {
    val more = Seq(
      RuleGroup.Rule("grp_max_cnt", "count_over_time",
        Seq("click", "view", "purchase"), 7200L, Seq("event_type"),
        Some((">", 1.0)), outerAgg = "max"),
      RuleGroup.Rule("grp_min_cnt", "count_over_time", Seq("click"),
        3600L, Seq("event_type"), outerAgg = "min"),
      RuleGroup.Rule("grp_avg_sum", "sum_over_time", Seq("purchase"),
        7200L, Seq("event_type"), outerAgg = "avg"))
    val outs = RuleGroup.evaluate(spark, dir01, spec, more)
    eq(outs("grp_max_cnt"),
      graft.operators.Alerts.rule(spark, dir01,
        """max by (event_type)(count_over_time({event_type=~"click|view|purchase"}[2h])) > 1""",
        spec, forSec = 0L), "max-by alert")
    eq(outs("grp_min_cnt"),
      Promql.queryAt(spark, dir01,
        """min by (event_type)(count_over_time({event_type=~"click"}[1h]))""",
        spec), "min-by recording")
    eq(outs("grp_avg_sum"),
      Promql.queryAt(spark, dir01,
        """avg by (event_type)(sum_over_time({event_type=~"purchase"}[2h]))""",
        spec), "avg-by recording")
  }

  test("outer aggregations: count/group/stddev/stdvar by() bit-equal to standalone") {
    val more = Seq(
      RuleGroup.Rule("grp_cnt_series", "count_over_time",
        Seq("click", "view"), 3600L, Seq("event_type"), outerAgg = "count"),
      RuleGroup.Rule("grp_grp", "count_over_time", Seq("click"), 3600L,
        Seq("event_type"), outerAgg = "group"),
      RuleGroup.Rule("grp_dev_series", "count_over_time",
        Seq("click", "view"), 7200L, Seq("event_type"), outerAgg = "stddev"),
      RuleGroup.Rule("grp_var_series", "count_over_time",
        Seq("click", "view"), 7200L, Seq("event_type"), outerAgg = "stdvar"))
    val outs = RuleGroup.evaluate(spark, dir01, spec, more)
    eq(outs("grp_cnt_series"), Promql.queryAt(spark, dir01,
      """count by (event_type)(count_over_time({event_type=~"click|view"}[1h]))""",
      spec), "count-by")
    eq(outs("grp_grp"), Promql.queryAt(spark, dir01,
      """group by (event_type)(count_over_time({event_type=~"click"}[1h]))""",
      spec), "group-by")
    eq(outs("grp_dev_series"), Promql.queryAt(spark, dir01,
      """stddev by (event_type)(count_over_time({event_type=~"click|view"}[2h]))""",
      spec), "stddev-by")
    eq(outs("grp_var_series"), Promql.queryAt(spark, dir01,
      """stdvar by (event_type)(count_over_time({event_type=~"click|view"}[2h]))""",
      spec), "stdvar-by")
  }

  test("distribution verbs: stddev/stdvar/quantile bit-equal to standalone") {
    val more = Seq(
      RuleGroup.Rule("grp_dev", "stddev_over_time",
        Seq("click", "view", "purchase"), 7200L, Seq("event_type"),
        Some((">", 10.0)), outerAgg = "max"),
      RuleGroup.Rule("grp_var", "stdvar_over_time", Seq("purchase"),
        7200L, Seq("user_id", "event_type")),
      RuleGroup.Rule("grp_p90", "quantile_over_time", Seq("click"),
        3600L, Seq("user_id", "event_type"), q = 0.9))
    val outs = RuleGroup.evaluate(spark, dir01, spec, more)
    eq(outs("grp_dev"),
      graft.operators.Alerts.rule(spark, dir01,
        """max by (event_type)(stddev_over_time({event_type=~"click|view|purchase"}[2h])) > 10""",
        spec, forSec = 0L), "stddev max-by alert")
    eq(outs("grp_var"),
      Promql.queryAt(spark, dir01,
        """stdvar_over_time({event_type=~"purchase"}[2h])""",
        spec).select(col("step"), col("user_id"),
          col("event_type"), col("value")), "stdvar recording")
    eq(outs("grp_p90"),
      Promql.queryAt(spark, dir01,
        """quantile_over_time(0.9, {event_type=~"click"}[1h])""",
        spec).select(col("step"), col("user_id"),
          col("event_type"), col("value")), "p90 recording")
  }

  test("payload-label by(): k-grained rules compile in their own pass, bit-equal to standalone") {
    val more = Seq(
      RuleGroup.Rule("grp_k_alert", "count_over_time", Seq("click", "view"),
        7200L, Seq("k"), Some((">", 1.0))),
      // avg_over_time is grain-SENSITIVE: correct only because the k
      // pass evaluates per (user_id, event_type, k) — the standalone
      // evaluator's exact grain for a regex selector referencing k
      RuleGroup.Rule("grp_k_avg", "avg_over_time", Seq("click", "view"),
        7200L, Seq("k"), outerAgg = "avg"),
      RuleGroup.Rule("grp_phys", "count_over_time", Seq("click"), 3600L,
        Seq("user_id")))
    val outs = RuleGroup.evaluate(spark, dir01, spec, more)
    eq(outs("grp_k_alert"),
      graft.operators.Alerts.rule(spark, dir01,
        """sum by (k)(count_over_time({event_type=~"click|view"}[2h])) > 1""",
        spec, forSec = 0L), "k-grained alert")
    eq(outs("grp_k_avg"),
      Promql.queryAt(spark, dir01,
        """avg by (k)(avg_over_time({event_type=~"click|view"}[2h]))""",
        spec), "k-grained avg (grain-sensitive)")
    eq(outs("grp_phys"),
      Promql.queryAt(spark, dir01,
        "sum by (user_id)(count_over_time(click[1h]))", spec),
      "physical-grain pass in the same group")
  }

  test("one scan: the fan-out reads the shared pass from memory, never the events table") {
    val union = RuleGroup.evaluateUnion(spark, dir01, spec, rules)
    assert(union.count() > 0)
    val plan = union.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val leaves = plan.collectLeaves()
    val fileScans = leaves.filter(l =>
      l.getClass.getSimpleName.contains("FileSourceScan") &&
        l.toString.contains("events"))
    assert(fileScans.isEmpty,
      s"rule branches must not rescan events: ${fileScans.map(_.nodeName)}")
    val imr = leaves.count(_.getClass.getSimpleName
      .contains("InMemoryTableScan"))
    assert(imr >= rules.size,
      s"every rule branch must read the one materialized pass, got $imr")
    // the recording rule was persisted through the recorded store and
    // serves back through the evaluator like any standalone rule
    val back = Promql.query(spark, dir01, "sum(grp_click_cnt1h)",
      graft.sources.RecordedRules.RecordedSource("grp_click_cnt1h"))
    assert(back.count() > 0)
  }
}
