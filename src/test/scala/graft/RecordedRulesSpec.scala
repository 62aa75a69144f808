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
    assert(plan.contains("recorded_rec_spec_sum1h"),
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

  test("rules with labels outside the sample schema are rejected, not mis-stored") {
    val e = intercept[IllegalArgumentException] {
      RecordedRules.record(spark, sf, "rec_spec_bad",
        "sum by (event_type)(count_over_time({event_type=~\"click|view\"}[1h]))")
    }
    assert(e.getMessage.contains("labels"))
  }
}
