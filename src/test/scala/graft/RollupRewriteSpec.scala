package graft

import org.scalatest.funsuite.AnyFunSuite
import SparkFixture.{sf, spark}

import graft.operators.TimeSeries
import graft.sources.DownsampleStore

/** MV rewrite (plans/RollupRewrite.scala): the hourly sum-by aggregate
  * over raw events is transparently served from the 5-minute rollup —
  * same bits, a fraction of the scan — and every soundness gate holds.
  */
class RollupRewriteSpec extends AnyFunSuite {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def optIn() = {
    DownsampleStore.table(spark, sf).count() // materialize the MV
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.rollup.rewrite", "true")
    s2
  }

  test("flag on + MV materialized: plan reads the rollup, bits unchanged") {
    val s2 = optIn()
    val rew = TimeSeries.rangeSumBy(s2, sf)
    val plan = rew.queryExecution.executedPlan.toString
    assert(plan.contains("downsample_"),
      s"rewritten plan must scan the rollup store:\n$plan")
    assert(!plan.contains("events.parquet"),
      s"rewritten plan must NOT scan raw events:\n$plan")
    // bit-for-bit: DECIMAL partial sums merge exactly, 300 | 3600
    assert(rows(rew) === rows(TimeSeries.rangeSumBy(spark, sf)))
  }

  test("session isolation: the sibling session's plan is untouched") {
    optIn()
    val raw = TimeSeries.rangeSumBy(spark, sf)
    assert(!raw.queryExecution.executedPlan.toString
      .contains("downsample_"))
  }

  test("shape gate: near-miss aggregates are not rewritten") {
    val s2 = optIn()
    import org.apache.spark.sql.functions._
    // same grouping, a measure the rollup CANNOT answer (stddev needs
    // Σv² which the store doesn't carry) — round 12 widened the matched
    // family to count/min/max/sum, so the non-member probe moved too
    val near = Tables.events(s2, sf)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
        col("event_type"))
      .agg(stddev("value").as("sd"))
    assert(!near.queryExecution.executedPlan.toString
      .contains("downsample_"))
    // different grouping (day, not hour) — windows don't align
    val day = Tables.events(s2, sf)
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("step"),
        col("event_type"))
      .agg(sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
    assert(!day.queryExecution.executedPlan.toString
      .contains("downsample_"))
  }

  test("driver entry q_rollup_rewrite opts in and reads the rollup") {
    val df = SparkEntry.queries("q_rollup_rewrite")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("downsample_"),
      s"q_rollup_rewrite must scan the rollup store:\n$plan")
    assert(!plan.contains("events.parquet"),
      s"q_rollup_rewrite must NOT scan raw events:\n$plan")
    assert(rows(df) === rows(TimeSeries.rangeSumBy(spark, sf)))
  }

  test("widened measures: count/min/max/sum all serve from the rollup, bit-equal") {
    val s2 = optIn()
    val rew = TimeSeries.rangeStatsBy(s2, sf)
    val plan = rew.queryExecution.executedPlan.toString
    assert(plan.contains("downsample_"),
      s"stats query must scan the rollup store:\n$plan")
    assert(!plan.contains("events.parquet"), plan)
    def statRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(statRows(rew) === statRows(TimeSeries.rangeStatsBy(spark, sf)))
  }

  test("count over a NULLABLE measure column is NOT matched") {
    val s2 = optIn()
    import org.apache.spark.sql.functions._
    // parquet-read columns are nullable: count(value) is the NON-NULL
    // count, which the rollup's row-count n_samples cannot answer the
    // moment a NULL lands — the gate must veto on schema nullability
    // (ADVICE r12), while the count(*) spelling keeps rewriting
    val ev = Tables.events(s2, sf)
    assert(ev.schema("value").nullable,
      "fixture premise: the parquet read reports value as nullable")
    val cntVal = ev
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
        col("event_type"))
      .agg(count(col("value")).as("n"))
    assert(!cntVal.queryExecution.executedPlan.toString
      .contains("downsample_"),
      "count(nullable value) must stay on the raw scan")
    val cntStar = ev
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(cntStar.queryExecution.executedPlan.toString
      .contains("downsample_"),
      "count(*) must keep rewriting")
  }

  test("avg-shaped queries are NOT matched (only lossless measures rewrite)") {
    val s2 = optIn()
    import org.apache.spark.sql.functions._
    val avgQ = Tables.events(s2, sf)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
        col("event_type"))
      .agg(avg("value").as("a"))
    assert(!avgQ.queryExecution.executedPlan.toString
      .contains("downsample_"))
  }

  test("label filters replay on the store; grain may drop store labels") {
    val s2 = optIn()
    import org.apache.spark.sql.functions._
    // the flagship filtered hourly sum: filter on event_type, grouping
    // drops both labels — finer store grain re-aggregates losslessly
    val rew = TimeSeries.rangeSum(s2, sf)
    val plan = rew.queryExecution.executedPlan.toString
    assert(plan.contains("downsample_"),
      s"filtered hourly sum must serve from the rollup:\n$plan")
    assert(!plan.contains("events.parquet"), plan)
    def sumRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(_._1).toSeq
    assert(sumRows(rew) === sumRows(TimeSeries.rangeSum(spark, sf)))
    // user-grain grouping with an IN filter
    val byUser = Tables.events(s2, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
    assert(byUser.queryExecution.executedPlan.toString
      .contains("downsample_"))
    val raw = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
    assert(byUser.exceptAll(raw).count() === 0 &&
      raw.exceptAll(byUser).count() === 0)
  }

  test("a ts or value filter vetoes the rewrite (cuts within buckets)") {
    val s2 = optIn()
    import org.apache.spark.sql.functions._
    val tsFiltered = Tables.events(s2, sf)
      .filter(col("ts") >= lit("2024-01-02 00:30:00").cast("timestamp"))
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
        col("event_type"))
      .agg(sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
    assert(!tsFiltered.queryExecution.executedPlan.toString
      .contains("downsample_"))
    val vFiltered = Tables.events(s2, sf)
      .filter(col("value") > 50.0)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
        col("event_type"))
      .agg(sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
    assert(!vFiltered.queryExecution.executedPlan.toString
      .contains("downsample_"))
  }

  test("PromQL window verbs serve from the rollup at any 300s-aligned width") {
    val s2 = optIn()
    import graft.operators.Promql
    for (q <- Seq("sum_over_time(click[1h])", "count_over_time(click[2h])",
      "min_over_time(purchase[1h])", "sum(count_over_time(click[1h]))",
      "avg_over_time(click[1h])", "last_over_time(purchase[1d])",
      "first_over_time(purchase[1d])")) {
      val rew = Promql.query(s2, sf, q)
      val plan = rew.queryExecution.executedPlan.toString
      assert(plan.contains("downsample_"),
        s"PromQL '$q' must serve from the rollup:\n${plan.take(1500)}")
      assert(!plan.contains("events.parquet"), q)
      val raw = Promql.query(spark, sf, q)
      assert(rew.exceptAll(raw).count() === 0 &&
        raw.exceptAll(rew).count() === 0, s"'$q' must stay bit-equal")
    }
    // a NON-aligned width must NOT rewrite (90s is not a bucket union)
    val odd = Promql.query(s2, sf, "sum_over_time(click[90s])")
    assert(!odd.queryExecution.executedPlan.toString
      .contains("downsample_"))
  }

  test("endpoint verbs veto when a label is neither grouped nor pinned") {
    val s2 = optIn()
    import org.apache.spark.sql.functions._
    // last-by-sample-key with user_id ungrouped and unpinned: two store
    // rows could share the extreme bucket, so the rewrite must refuse
    val loose = Tables.events(s2, sf)
      .filter(col("event_type") === "purchase")
      .groupBy((floor(unix_timestamp(col("ts")) / 86400L) * 86400L)
        .cast("long").as("step"))
      .agg(max_by(col("value"),
        struct(unix_micros(col("ts")), col("event_id"))).as("value"))
    assert(!loose.queryExecution.executedPlan.toString
      .contains("downsample_"))
    // the same query with user_id grouped rewrites (spec of the gate)
    val tight = Tables.events(s2, sf)
      .filter(col("event_type") === "purchase")
      .groupBy((floor(unix_timestamp(col("ts")) / 86400L) * 86400L)
        .cast("long").as("step"), col("user_id"))
      .agg(max_by(col("value"),
        struct(unix_micros(col("ts")), col("event_id"))).as("value"))
    assert(tight.queryExecution.executedPlan.toString
      .contains("downsample_"))
  }

  test("the promql table function inherits the rewrite in an opted-in session") {
    val s2 = optIn()
    val viaTvf = s2.sql(
      s"SELECT * FROM promql('sum_over_time(click[1h])', '$sf')")
    val plan = viaTvf.queryExecution.executedPlan.toString
    assert(plan.contains("downsample_"),
      s"TVF-compiled PromQL must serve from the rollup when opted in:\n${plan.take(1500)}")
    val raw = graft.operators.Promql.query(spark, sf, "sum_over_time(click[1h])")
    assert(viaTvf.exceptAll(raw).count() === 0 &&
      raw.exceptAll(viaTvf).count() === 0)
  }

  test("resolution picker: an hour-multiple step reads the 1h chain level") {
    DownsampleStore.table1h(spark, sf).count() // materialize the chain
    val s2 = optIn()
    // the hourly flagship: step 3600 is an hour multiple → 1h level
    val rew = TimeSeries.rangeSumBy(s2, sf)
    val plan = rew.queryExecution.executedPlan.toString
    assert(plan.contains("downsample_3600s"),
      s"hourly grouping must read the 1h level once it exists:\n$plan")
    assert(!plan.contains("downsample_300s") && !plan.contains("events.parquet"),
      plan)
    assert(rows(rew) === rows(TimeSeries.rangeSumBy(spark, sf)))
    // a 30-minute tumbling grid is 300s-aligned but NOT hour-aligned:
    // the rule must fall to the fine level, not refuse
    import graft.operators.Promql
    val fine = Promql.query(s2, sf, "sum_over_time(click[30m])")
    assert(fine.queryExecution.executedPlan.toString.contains("downsample_300s"),
      "a 30m tumbling window must fall to the 300s level")
    val fineRaw = Promql.query(spark, sf, "sum_over_time(click[30m])")
    assert(fine.exceptAll(fineRaw).count() === 0 &&
      fineRaw.exceptAll(fine).count() === 0)
    // the driver entry records exactly this pick (round 15; VERDICT
    // r14 #5): q_rollup_rewrite_1h must scan the 1h level and equal
    // its raw twin row-for-row
    val entry = SparkEntry.queries("q_rollup_rewrite_1h")(spark, sf)
    val eplan = entry.queryExecution.executedPlan.toString
    assert(eplan.contains("downsample_3600s") &&
      !eplan.contains("downsample_300s") && !eplan.contains("events.parquet"),
      s"driver entry must read the 1h level:\n${eplan.take(1200)}")
    assert(rows(entry) === rows(TimeSeries.rangeSumBy(spark, sf)))
    // the 1d level extends the same coarsest-first pick (round 15): a
    // day-tumbling window reads downsample_86400s once the level exists
    DownsampleStore.table1d(spark, sf).count()
    val daily = Promql.query(s2, sf, "sum_over_time(click[1d])")
    val dplan = daily.queryExecution.executedPlan.toString
    assert(dplan.contains("downsample_86400s") &&
      !dplan.contains("downsample_3600s") && !dplan.contains("downsample_300s"),
      s"a day-tumbling window must read the 1d level:\n${dplan.take(1200)}")
    val dailyRaw = Promql.query(spark, sf, "sum_over_time(click[1d])")
    assert(daily.exceptAll(dailyRaw).count() === 0 &&
      dailyRaw.exceptAll(daily).count() === 0)
  }

  test("SQL text hits the same rule (extension point, not API wrapper)") {
    val s2 = optIn()
    Tables.events(s2, sf).createOrReplaceTempView("ev_mv")
    val viaSql = s2.sql(
      """SELECT unix_timestamp(date_trunc('hour', ts)) AS step, event_type,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        |FROM ev_mv GROUP BY 1, 2""".stripMargin)
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("downsample_"),
      s"SQL-text query must rewrite too:\n$plan")
    assert(rows(viaSql) === rows(TimeSeries.rangeSumBy(spark, sf)))
  }
}
