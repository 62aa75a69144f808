package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HeavyHitters
import SparkFixture.{sf, spark}

class HeavyHittersSpec extends AnyFunSuite {
  import spark.implicits._

  // adversarial corpus: two true heavy hitters over a wide tail, with
  // the tail INTERLEAVED so the decrement step fires constantly
  private def corpus(n: Int): Seq[String] = {
    val heavy = Seq.fill(n * 15 / 100)("h1") ++ Seq.fill(n * 12 / 100)("h2")
    val tail = (0 until n - heavy.length).map(i => s"t${i % (n / 3)}")
    // deterministic interleave (no Random: specs must not flake)
    heavy.zipAll(tail, "", "").flatMap { case (a, b) => Seq(a, b) }
      .filter(_.nonEmpty)
  }

  test("MisraGries never misses a value with count > n/(k+1), any partitioning") {
    val data = corpus(2000)
    val n = data.length.toLong
    val k = 9
    val truth = data.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val mustKeep = truth.filter { case (_, c) => c > n / (k + 1) }.keySet
    assert(mustKeep.nonEmpty, "test corpus must contain true heavy hitters")
    for (parts <- Seq(1, 4, 13)) {
      val sk = data.toDF("w").repartition(parts)
        .agg(HeavyHitters.mgSketch(col("w"), k)).head()
        .getMap[String, Long](0)
      assert(mustKeep.subsetOf(sk.keySet.toSet),
        s"parts=$parts lost a true heavy hitter: ${mustKeep -- sk.keySet}")
      // counters are lower bounds, within the n/(k+1) error envelope
      sk.foreach { case (w, c) =>
        assert(c <= truth(w), s"counter must never exceed the true count ($w)")
        assert(truth(w) - c <= n / (k + 1), s"error bound violated ($w)")
      }
      assert(sk.size <= k, "state is k-bounded")
    }
  }

  test("textHeavyHitters equals the brute-force exact recount") {
    val toks = Tables.documents(spark, sf)
      .select(explode(expr("filter(split(text, ' '), w -> w <> '')")).as("w"))
    val n = toks.count()
    val want = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") * HeavyHitters.ThreshDen > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = HeavyHitters.textHeavyHitters(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty, "stopwords must clear the 1% threshold")
  }

  test("sketch plan does partial aggregation (map-side combine of k-bounded state)") {
    val toks = Tables.documents(spark, sf)
      .select(explode(expr("filter(split(text, ' '), w -> w <> '')")).as("w"))
    val plan = SparkFixture.planOf(toks.agg(HeavyHitters.mgSketch(col("w"))))
    assert(plan.contains("ObjectHashAggregate"), s"typed agg must plan object-hash:\n$plan")
    assert(plan.contains("partial_misra_gries") || plan.contains("misra_gries"),
      s"sketch must appear as a partial aggregate:\n$plan")
  }
}
