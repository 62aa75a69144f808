package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Alerts, Promql, RuleGroup}
import SparkFixture.spark

/** Property sweep for the group compiler: a seeded random rule set
  * spanning the full verb surface (count/sum/avg/min/max over-time,
  * rate/increase, stddev/stdvar, discrete quantile), both grains
  * (physical and payload-label k), all four outer aggregations, and
  * both rule kinds (alerting with random for:/keep:, recording) is
  * compiled as ONE group — and every rule must be BIT-EQUAL to its
  * standalone evaluation (Alerts.rule / Promql.queryAt). The sweep is
  * the compiler's whole matrix in one pass; the fixed seed keeps the
  * matrix reproducible.
  */
class RuleGroupPropSpec extends AnyFunSuite {

  private val dir01 = "/root/testdata/sf0.01"
  private val spec = Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L)

  private val verbs = Seq("count_over_time", "sum_over_time",
    "avg_over_time", "min_over_time", "max_over_time", "rate", "increase",
    "stddev_over_time", "stdvar_over_time", "quantile_over_time")
  private val metricPool = Seq("click", "view", "purchase", "signup", "error")

  test("a seeded random group across the full verb/grain/agg matrix equals standalone rule-by-rule") {
    val rnd = new scala.util.Random(42)
    val rules = verbs.zipWithIndex.map { case (verb, i) =>
      val w = Seq(3600L, 7200L, 10800L)(rnd.nextInt(3))
      val mets = rnd.shuffle(metricPool).take(1 + rnd.nextInt(3)).sorted
      val by = Seq(Seq("event_type"), Seq("user_id"),
        Seq("user_id", "event_type"), Seq("k"))(rnd.nextInt(4))
      val outer = Seq("sum", "min", "max", "avg")(rnd.nextInt(4))
      val alert = rnd.nextBoolean()
      // thresholds chosen per verb so SOME rule legs hold without all
      // holding; equality is asserted regardless of emptiness
      val thr = verb match {
        case "count_over_time"                         => 1.0
        case "rate"                                    => 0.0
        case "stddev_over_time" | "stdvar_over_time"   => 1.0
        case _                                         => 10.0
      }
      RuleGroup.Rule(s"prop_$i", verb, mets, w, by,
        cmp = if (alert) Some((">", thr)) else None,
        forSec = if (alert) Seq(0L, w)(rnd.nextInt(2)) else 0L,
        keepSec = if (alert) Seq(0L, w)(rnd.nextInt(2)) else 0L,
        outerAgg = outer, q = 0.9)
    }
    val outs = RuleGroup.evaluate(spark, dir01, spec, rules)

    var nonEmpty = 0
    for (r <- rules) {
      val sel = s"""{event_type=~"${r.metrics.mkString("|")}"}[${r.windowSec}s]"""
      val verbExpr =
        if (r.verb == "quantile_over_time") s"quantile_over_time(0.9, $sel)"
        else s"${r.verb}($sel)"
      // full-grain by() is the group's passthrough — its standalone
      // twin is the bare verb (an outer agg there would re-quantize)
      val fullGrain = r.by.sorted == Seq("event_type", "user_id")
      val expr =
        if (fullGrain) verbExpr
        else s"${r.outerAgg} by (${r.by.mkString(", ")}) ($verbExpr)"
      val want = r.cmp match {
        case Some((_, thr)) =>
          Alerts.rule(spark, dir01, s"$expr > $thr", spec,
            forSec = r.forSec, keepSec = r.keepSec)
        case None =>
          val q = Promql.queryAt(spark, dir01, expr, spec)
          if (fullGrain)
            q.select(col("step"), col("user_id"), col("event_type"),
              col("value"))
          else q
      }
      val got = outs(r.name)
      val w = want.select(got.columns.map(col).toSeq: _*)
      assert(got.exceptAll(w).count() === 0,
        s"${r.name} (${r.verb} by ${r.by} ${r.outerAgg}): group-only rows")
      assert(w.exceptAll(got).count() === 0,
        s"${r.name} (${r.verb} by ${r.by} ${r.outerAgg}): standalone-only rows")
      if (got.count() > 0) nonEmpty += 1
    }
    assert(nonEmpty >= verbs.size / 2,
      s"the sweep must exercise real data, only $nonEmpty/${rules.size} non-empty")
  }
}
