package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Promql
import SparkFixture.{sf, spark}

class PromqlSpec extends AnyFunSuite {

  test("parser round-trips the supported grammar") {
    assert(Promql.parse("click") === Promql.Selector("click", Seq.empty))
    assert(Promql.parse("""click{user_id="5"}""") ===
      Promql.Selector("click", Seq(("user_id", "=", "5"))))
    assert(Promql.parse("""rate(click{user_id!="5"}[5m])""") ===
      Promql.RangeFunc("rate", Promql.Selector("click",
        Seq(("user_id", "!=", "5"))), 300))
    assert(Promql.parse("sum by (user_id)(count_over_time(view[1h]))") ===
      Promql.Agg("sum", Seq("user_id"),
        Promql.RangeFunc("count_over_time", Promql.Selector("view", Seq.empty), 3600)))
    assert(Promql.parse("topk(3, avg_over_time(purchase[1h]))") ===
      Promql.Agg("topk", Seq.empty,
        Promql.RangeFunc("avg_over_time", Promql.Selector("purchase", Seq.empty), 3600), 3))
  }

  test("garbage fails with a parse error, not a plan error") {
    Seq("sum(", "topk(x, click)", "click{user_id=5}", "rate(click[5x])")
      .foreach { bad =>
        val e = intercept[IllegalArgumentException](Promql.parse(bad))
        assert(e.getMessage.contains("parse error"))
      }
  }

  test("matcher filters restrict the series set") {
    val all = Promql.query(spark, sf, "count_over_time(click[1h])")
    val one = Promql.query(spark, sf, """count_over_time(click{user_id="5"}[1h])""")
    assert(one.count() < all.count())
    assert(one.select("user_id").distinct().collect().map(_.getLong(0)).toSeq === Seq(5L))
  }

  test("promql sum equals the direct operator formulation") {
    val viaPromql = Promql.query(spark, sf, "sum(count_over_time(click[1h]))")
    val direct = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("step"))
      .agg(count(lit(1)).cast("double").as("value"))
    assert(viaPromql.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(viaPromql).count() === 0)
  }

  test("promql topk returns at most k per step, ranked by value") {
    val df = Promql.query(spark, sf, "topk(2, max_over_time(error[1h]))")
    assert(df.groupBy("step").count().filter(col("count") > 2).count() === 0)
    assert(df.count() > 0)
  }
}
