package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import SparkFixture.{sf, spark}

/** Schema-evolution store: merged read reconstructs the widened table
  * with NULLs exactly on pre-widening files; pushdown survives the
  * merged scan.
  */
class EvoStoreSpec extends AnyFunSuite {

  test("merged read equals the widened table with NULLs on old files") {
    val got = graft.sources.EvoStore.read(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_.toString)))
      .sortBy(r => (r._1, r._2))
    val want = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"),
        when(col("user_id") % 2 === 1, col("event_type")).as("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_.toString)))
      .sortBy(r => (r._1, r._2))
    assert(got.length === want.length)
    assert(got === want)
    // both generations genuinely contribute and the NULL column splits
    // exactly on the generation predicate
    assert(got.exists(_._4.isEmpty) && got.exists(_._4.nonEmpty))
    assert(got.forall(r => r._4.isEmpty == (r._2 % 2 == 0)))
  }

  test("predicate pushdown reaches the merged scan") {
    val plan = graft.sources.EvoStore.read(spark, sf)
      .filter(col("user_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)"),
      s"pushdown must survive mergeSchema:\n$plan")
  }
}
