package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Promql
import graft.sources.RecordedRules
import SparkFixture.{sf, spark}

/** Recording rules: storage mapping, readback through the evaluator,
  * scan pruning on the recorded store, and the documented label
  * restriction.
  */
class RecordedRulesSpec extends AnyFunSuite {

  test("grouped rule round-trips: readback equals the direct evaluation") {
    RecordedRules.record(spark, sf, "rec_spec_sum1h",
      "sum by (user_id)(sum_over_time(purchase[1h]))")
    val back = Promql.query(spark, sf, "rec_spec_sum1h",
      RecordedRules.RecordedSource("rec_spec_sum1h"))
    val direct = Promql.query(spark, sf,
      "sum by (user_id)(sum_over_time(purchase[1h]))")
    val b = back.select("step", "user_id", "value")
    val d = direct.select("step", "user_id", "value")
    assert(b.exceptAll(d).count() === 0 && d.exceptAll(b).count() === 0)
    assert(b.count() > 0)
  }

  test("ungrouped rule records the synthetic series 0") {
    RecordedRules.record(spark, sf, "rec_spec_total",
      "sum(count_over_time(click[1h]))")
    val back = Promql.query(spark, sf, "rec_spec_total",
      RecordedRules.RecordedSource("rec_spec_total"))
    assert(back.count() > 0)
    assert(back.select("user_id").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("stepped readback prunes the recorded store's scan by time") {
    RecordedRules.record(spark, sf, "rec_spec_sum1h",
      "sum by (user_id)(sum_over_time(purchase[1h]))")
    val spec = Promql.EvalSpec(1704067200L, 1704110400L, 3600L, 7200L)
    val df = Promql.queryAt(spark, sf, "sum(rec_spec_sum1h)", spec,
      RecordedRules.RecordedSource("rec_spec_sum1h"))
    val plan = SparkFixture.planOf(df)
    assert(plan.contains("recorded_r2_rec_spec_sum1h"),
      "must scan the recorded store, not raw events:\n" + plan)
    assert(!plan.contains("events.parquet"))
    assert(plan.contains("GreaterThanOrEqual(ts_ns"),
      "time bounds must reach the recorded store's parquet scan:\n" + plan)
  }

  test("re-recording a rule name with a different expr fails loudly instead of serving the old data") {
    RecordedRules.record(spark, sf, "rec_spec_conflict",
      "sum by (user_id)(sum_over_time(purchase[1h]))")
    val e = intercept[IllegalArgumentException] {
      RecordedRules.record(spark, sf, "rec_spec_conflict",
        "sum by (user_id)(sum_over_time(click[1h]))")
    }
    assert(e.getMessage.contains("DIFFERENT expr"))
    // same expr re-record stays a no-op success
    RecordedRules.record(spark, sf, "rec_spec_conflict",
      "sum by (user_id)(sum_over_time(purchase[1h]))")
  }

  test("multi-label rule round-trips: the by(event_type, user_id) set survives the props channel") {
    RecordedRules.record(spark, sf, "rec_spec_multi",
      """sum by (event_type, user_id)(count_over_time({event_type=~"click|view"}[1h]))""")
    // grouping on the reconstituted payload label equals the raw
    // composition, and a MATCHER on it is an ordinary predicate
    val back = Promql.query(spark, sf, "sum by (src)(rec_spec_multi)",
      RecordedRules.RecordedSource("rec_spec_multi"))
    val direct = Promql.query(spark, sf,
      """sum by (event_type)(count_over_time({event_type=~"click|view"}[1h]))""")
      .withColumnRenamed("event_type", "src")
    val b = back.select("step", "src", "value")
    val d = direct.select("step", "src", "value")
    assert(b.exceptAll(d).count() === 0 && d.exceptAll(b).count() === 0)
    assert(b.count() > 0)
    val matched = Promql.query(spark, sf,
      """sum by (src)(rec_spec_multi{src="view"})""",
      RecordedRules.RecordedSource("rec_spec_multi"))
    assert(matched.select("src").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("view"))
  }

  test("union namespace serves a multi-label rule's payload beside raw metrics") {
    RecordedRules.record(spark, sf, "rec_spec_multi",
      """sum by (event_type, user_id)(count_over_time({event_type=~"click|view"}[1h]))""")
    val mixed = Promql.query(spark, sf,
      """sum(rec_spec_multi{src="click"}) / sum(count_over_time(click[1h]))""",
      RecordedRules.UnionSource(Seq("rec_spec_multi")))
    // per step: Σ per-user click counts / total click count = 1.0
    val vals = mixed.select("value").distinct().collect().map(_.getDouble(0))
    assert(vals.toSeq === Seq(1.0))
  }

  test("rules with reserved label names are rejected, not mis-stored") {
    val e = intercept[IllegalArgumentException] {
      RecordedRules.record(spark, sf, "rec_spec_bad",
        """sum by (k)(count_over_time({event_type=~"click|view"}[1h]))""")
    }
    assert(e.getMessage.contains("collides"))
  }
}
