package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches
import SparkFixture.{sf, spark}

/** Accuracy contracts for the sketch operators — the published bounds,
  * checked against exact computations on the same data.
  */
class SketchSpec extends AnyFunSuite {

  test("approxQuantiles meets the GK rank-error bound per group") {
    val rows = Sketches.approxQuantiles(spark, sf).collect()
    val exactByType = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for (r <- rows) {
      val tpe = r.getString(0)
      val n = r.getLong(1)
      val vals = exactByType(tpe)
      assert(n === vals.length.toLong)
      // GK guarantee: the returned value's rank is within n/accuracy of
      // the target rank
      val tol = math.max(1.0, n.toDouble / Sketches.QuantileAccuracy)
      for ((q, v) <- Seq(0.5 -> r.getDouble(2), 0.9 -> r.getDouble(3),
        0.99 -> r.getDouble(4))) {
        val rankLo = vals.count(_ < v)
        val rankHi = vals.count(_ <= v)
        val target = q * n
        assert(rankLo - tol <= target && target <= rankHi + tol,
          s"$tpe q=$q: value $v has rank [$rankLo,$rankHi], target $target ± $tol")
      }
    }
  }

  test("approxDistinct is within 5 sigma of the exact distinct count") {
    val approx = Sketches.approxDistinct(spark, sf)
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("exact_users"))
    val joined = approx.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    for (r <- joined) {
      val a = r.getAs[Long]("approx_users").toDouble
      val e = r.getAs[Long]("exact_users").toDouble
      val bound = math.max(2.0, 5 * Sketches.DistinctRsd * e)
      assert(math.abs(a - e) <= bound,
        s"${r.getString(0)}: approx $a vs exact $e (bound $bound)")
    }
  }

  test("sketches are deterministic across runs and partitionings") {
    val a1 = Sketches.approxQuantiles(spark, sf).collect().toSet
    val a2 = Sketches.approxQuantiles(spark, sf).collect().toSet
    assert(a1 === a2)
    val d1 = Sketches.approxDistinct(spark, sf).collect().toSet
    val d2 = Sketches.approxDistinct(spark, sf).collect().toSet
    assert(d1 === d2)
  }
}
