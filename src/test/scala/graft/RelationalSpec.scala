package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational
import SparkFixture.{sf, spark, planOf}

class RelationalSpec extends AnyFunSuite {

  test("q1Pricing counts cover the filtered lineitem exactly") {
    val df = Relational.q1Pricing(spark, sf)
    val total = df.agg(sum("count_order")).collect()(0).getLong(0)
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
      .count()
    assert(total === expected)
    // avg_qty must equal sum_qty / count_order (exact decimal path)
    val bad = df.filter(abs(col("avg_qty") - col("sum_qty") / col("count_order")) > 1e-9)
    assert(bad.count() === 0)
  }

  test("q3Shipping is a deterministic top-10 by revenue") {
    val rows = Relational.q3Shipping(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getDouble(2))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "revenue must be non-increasing")
  }

  test("q5Local uses broadcast joins for every dimension") {
    val plan = planOf(Relational.q5Local(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(Relational.q5Local(spark, sf).count() > 0)
  }

  test("windowRank keeps at most 3 orders per customer, rank-ordered by price") {
    val df = Relational.windowRank(spark, sf)
    assert(df.groupBy("o_custkey").count().filter(col("count") > 3).count() === 0)
    val viol = df.as("a").join(df.as("b"),
      col("a.o_custkey") === col("b.o_custkey") &&
        col("a.rnk") < col("b.rnk") && col("a.o_totalprice") < col("b.o_totalprice"))
    assert(viol.count() === 0)
  }

  test("ordersEnrich accounts for every order exactly once") {
    val total = Relational.ordersEnrich(spark, sf).agg(sum("n_orders")).collect()(0).getLong(0)
    assert(total === Tables.orders(spark, sf).count())
  }

  test("saltedJoin enriches every event exactly once via a shuffled join") {
    val df = Relational.saltedJoin(spark, sf)
    assert(df.count() === Tables.events(spark, sf).count())
    assert(df.select("event_id").distinct().count() === df.count())
    val plan = planOf(df)
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("semiAnti: tags are consistent with direct predicates") {
    val df = Relational.semiAnti(spark, sf)
    val pendingCust = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "P").select("o_custkey").distinct()
    val noPending = df.filter(col("tag") === "no_pending")
    assert(noPending.join(pendingCust,
      noPending("c_custkey") === pendingCust("o_custkey")).count() === 0)
    val plan = planOf(df)
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"), plan)
  }
}
