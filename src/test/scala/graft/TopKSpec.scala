package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, TimeSeries}
import graft.plans.TopK
import SparkFixture.{sf, spark}

class TopKSpec extends AnyFunSuite {

  test("native topk equals the window formulation exactly") {
    val win = TimeSeries.topk(spark, sf)
    val nat = TimeSeries.topkNative(spark, sf)
    assert(nat.columns.toSeq === win.columns.toSeq)
    assert(nat.exceptAll(win).count() === 0)
    assert(win.exceptAll(nat).count() === 0)
  }

  test("native windowRank equals the window formulation exactly") {
    val win = Relational.windowRank(spark, sf)
    val nat = Relational.windowRankNative(spark, sf)
    assert(nat.exceptAll(win).count() === 0)
    assert(win.exceptAll(nat).count() === 0)
  }

  test("plan shape: partial heaps -> hash exchange on keys -> final merge") {
    val plan = TimeSeries.topkNative(spark, sf).queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("TopKPerKeyFinal"), s)
    assert(s.contains("TopKPerKeyPartial"), s)
    // the exchange must sit BETWEEN final and partial (map-side prune
    // happens before the shuffle)
    val iFinal = s.indexOf("TopKPerKeyFinal")
    val iEx = s.indexOf("Exchange hashpartitioning", iFinal)
    val iPartial = s.indexOf("TopKPerKeyPartial", iFinal)
    assert(iEx >= 0 && iEx < iPartial, s)
  }

  test("k larger than any group returns whole groups, ranked") {
    val df = TopK.perKey(
      Tables.nation(spark, sf).select("n_nationkey", "n_regionkey", "n_name"),
      Seq(col("n_regionkey")), Seq(col("n_name")), 1000)
    assert(df.count() === Tables.nation(spark, sf).count())
    // ranks within each region are 1..size with no gaps
    val maxRank = df.groupBy("n_regionkey")
      .agg(max("rnk").as("mx"), count(lit(1)).as("n"))
    assert(maxRank.filter(col("mx") =!= col("n")).count() === 0)
  }

  test("partial key budget: results are identical when (almost) every key passes through") {
    // budget 1: each partial task prunes only its first-seen key; every
    // other row streams through unpruned and the final exec must rank
    // it identically
    val keys = Seq(col("o_custkey"))
    val ord = Seq(col("o_totalprice").desc, col("o_orderkey"))
    val in = Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice")
    val base = TopK.perKey(in, keys, ord, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    spark.conf.set(graft.plans.TopKPerKeyStrategy.KeyBudgetConf, "1")
    try {
      val bounded = TopK.perKey(in, keys, ord, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(bounded === base)
    } finally spark.conf.unset(graft.plans.TopKPerKeyStrategy.KeyBudgetConf)
  }

  test("k = 1 picks each group's single best row") {
    val df = TopK.perKey(
      Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")), 1)
    val best = Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(max("o_totalprice").as("best"))
    val j = df.join(best, "o_custkey")
    assert(j.filter(col("o_totalprice") =!= col("best")).count() === 0)
    assert(df.groupBy("o_custkey").count().filter(col("count") > 1).count() === 0)
  }
}
