package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries
import SparkFixture.{sf, spark}

/** Contracts for the GENERALIZED-schema native histograms (schemas −4..3;
  * closes the schema-0 restriction): bound exactness, schema refinement,
  * mass conservation, and the two quantile interpolation modes.
  */
class NhistSchemaSpec extends AnyFunSuite {

  test("bounds: schema<=0 bounds are exact powers of two; schema 0 matches the legacy family") {
    for (k <- -6 to 9) {
      assert(TimeSeries.nhBound(0, k) === math.pow(2.0, k))
      assert(TimeSeries.nhBound(-2, k) === math.pow(2.0, 4.0 * k))
    }
  }

  test("bounds: positive-schema octave scaling is exact (bound(i + 2^s) = 2 * bound(i))") {
    for (s <- 1 to 3; i <- -20 to 20) {
      val parts = 1 << s
      // power-of-two scaling of a double is exact in IEEE, so the
      // equality must be EXACT, not approximate
      assert(TimeSeries.nhBound(s, i + parts) === 2.0 * TimeSeries.nhBound(s, i))
    }
    // whole-octave indices are exact powers of two
    assert(TimeSeries.nhBound(2, 4) === 2.0)
    assert(TimeSeries.nhBound(2, 8) === 4.0)
    assert(TimeSeries.nhBound(2, -4) === 0.5)
    // sub-bounds strictly increase within an octave
    for (s <- 1 to 3; i <- 0 until (1 << s))
      assert(TimeSeries.nhBound(s, i) < TimeSeries.nhBound(s, i + 1))
  }

  test("refinement: the schema-2 bucket nests inside the schema-0 bucket for every event") {
    // value in fine bucket i (schema 2) must land in coarse bucket
    // ceil(i / 4) (schema 0), wherever both indices are in-window —
    // the defining property of the shared exponential grid
    val rows = Tables.events(spark, sf)
      .select(TimeSeries.nhKS(col("value"), 2).as("k2"),
        TimeSeries.nhKS(col("value"), 0).as("k0"))
      .distinct().collect()
    val (lo2, hi2) = TimeSeries.nhIdx(2)
    val (lo0, hi0) = TimeSeries.nhIdx(0)
    for (r <- rows) {
      val k2 = r.getInt(0); val k0 = r.getInt(1)
      if (k2 > lo2 && k2 <= hi2 && k0 > lo0 && k0 <= hi0) {
        val want = -Math.floorDiv(-k2, 4) // ceil(k2 / 4)
        assert(k0 === want, s"fine bucket $k2 should refine coarse $want, got $k0")
      }
    }
  }

  test("mass conservation: bucket counts sum to the corpus size at every schema") {
    val n = Tables.events(spark, sf).count()
    for (schema <- Seq(-2, 0, 2)) {
      val total = TimeSeries.nhistBuildSchema(spark, sf, schema)
        .agg(sum("cnt")).collect()(0).getLong(0)
      assert(total === n, s"schema $schema loses mass")
    }
  }

  test("bucket-count bound: rows per histogram are bounded by the schema, never the data") {
    for (schema <- Seq(-2, 0, 2)) {
      val (lo, hi) = TimeSeries.nhIdx(schema)
      val maxRows = TimeSeries.nhistBuildSchema(spark, sf, schema)
        .groupBy("step", "event_type").count()
        .agg(max("count")).collect()(0).getLong(0)
      assert(maxRows <= (hi - lo + 2).toLong,
        s"schema $schema: $maxRows rows > window ${hi - lo + 2}")
    }
  }

  test("quantile (linear, schema 2): the value lands inside its bucket's exact bounds") {
    val q = TimeSeries.nhistQuantileSchema(spark, sf, 2)
      .withColumnRenamed("q_value", "qv")
    val rows = q.collect()
    assert(rows.nonEmpty)
    val (lo, hi) = TimeSeries.nhIdx(2)
    for (r <- rows) {
      val v = r.getDouble(2)
      // some bucket's (lower, upper] must contain it (incl. clamp/overflow)
      val inSome = (lo - 1 to hi + 1).exists { i =>
        v > TimeSeries.nhBound(2, i - 1) - 1e-9 &&
          v <= TimeSeries.nhBound(2, i) + 1e-9
      }
      assert(inSome, s"quantile $v outside every schema-2 bucket")
    }
  }

  test("quantile: exponential interpolation is <= linear (convexity of 2^x), equal at bucket edges") {
    val lin = TimeSeries.nhistQuantileSchema(spark, sf, 0)
      .withColumnRenamed("q_value", "lin")
    val exp = TimeSeries.nhistQuantileSchema(spark, sf, 0, exponential = true)
      .withColumnRenamed("q_value", "exp")
    val joined = lin.join(exp, Seq("step", "event_type")).collect()
    assert(joined.nonEmpty)
    for (r <- joined) {
      val l = r.getDouble(2); val e = r.getDouble(3)
      assert(e <= l + 1e-9, s"exp-interp $e above linear $l")
      // both sit in the same bucket, so they differ by < one bucket span
      assert(e > l / 2.0 - 1e-9, s"exp-interp $e more than an octave below $l")
    }
  }

  test("wide schemas (4..8): guess-then-fix index equals the definitional smallest-i scan") {
    // the DEFINITION of the bucket index is the smallest i in the
    // window with v ≤ bound(i) (clamped/overflowed) — re-derived here
    // by a driver-side linear scan over the exact bound doubles, so
    // the arithmetic guess-then-fix is checked against the literal
    // spec on every distinct corpus value (a when-chain twin at these
    // widths would blow the column-conversion stack, which is exactly
    // why the engine uses the arithmetic form)
    for (s <- Seq(4, 8)) {
      val (lo, hi) = TimeSeries.nhIdx(s)
      val rows = Tables.events(spark, sf)
        .select(col("value"), TimeSeries.nhKSWide(col("value"), s).as("k"))
        .distinct().collect()
      assert(rows.nonEmpty)
      for (r <- rows) {
        val v = r.getDouble(0); val k = r.getInt(1)
        val want = (lo to hi).find(i => v <= TimeSeries.nhBound(s, i))
          .getOrElse(hi + 1)
        assert(k === want, s"schema $s value $v: got $k want $want")
      }
    }
  }

  test("wide schemas: octave exactness, strict sub-bound increase, refinement into schema 2") {
    for (s <- 4 to 8) {
      val parts = 1 << s
      for (i <- -300 to 300 by 7)
        assert(TimeSeries.nhBound(s, i + parts) === 2.0 * TimeSeries.nhBound(s, i))
      for (j <- 0 until parts - 1)
        assert(TimeSeries.nhSubBounds(s)(j) < TimeSeries.nhSubBounds(s)(j + 1))
    }
    // schema-8 bucket i refines schema-2 bucket ceil(i / 64) — the
    // shared exponential grid, one law for the whole −4..8 family
    val rows = Tables.events(spark, sf)
      .select(TimeSeries.nhKSWide(col("value"), 8).as("k8"),
        TimeSeries.nhKS(col("value"), 2).as("k2"))
      .distinct().collect()
    val (lo8, hi8) = TimeSeries.nhIdx(8)
    val (lo2, hi2) = TimeSeries.nhIdx(2)
    assert(rows.nonEmpty)
    for (r <- rows) {
      val k8 = r.getInt(0); val k2 = r.getInt(1)
      if (k8 > lo8 && k8 <= hi8 && k2 > lo2 && k2 <= hi2)
        assert(k2 === -Math.floorDiv(-k8, 64),
          s"fine bucket $k8 should refine ${-Math.floorDiv(-k8, 64)}, got $k2")
    }
  }

  test("wide schemas: mass conservation and schema-bounded bucket rows at schema 8") {
    val n = Tables.events(spark, sf).count()
    val built = TimeSeries.nhistBuildSchema(spark, sf, 8)
    assert(built.agg(sum("cnt")).collect()(0).getLong(0) === n)
    val (lo, hi) = TimeSeries.nhIdx(8)
    val maxRows = built.groupBy("step", "event_type").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxRows <= (hi - lo + 2).toLong)
  }

  test("finer schema tightens the quantile bracket: schema-2 bucket span contains the schema-2 estimate nearer truth") {
    // the schema-2 estimate's bucket is 4x narrower, so the linear
    // estimates at schema 2 and schema 0 must agree within one
    // schema-0 bucket span — and the schema-2 estimate's own bound
    // gap is strictly smaller
    val q0 = TimeSeries.nhistQuantileSchema(spark, sf, 0)
      .withColumnRenamed("q_value", "q0")
    val q2 = TimeSeries.nhistQuantileSchema(spark, sf, 2)
      .withColumnRenamed("q_value", "q2")
    val rows = q0.join(q2, Seq("step", "event_type")).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val a = r.getDouble(2); val b = r.getDouble(3)
      // same underlying distribution: estimates within a factor of 2
      // (one schema-0 bucket) of each other
      assert(b <= a * 2.0 + 1e-9 && b >= a / 2.0 - 1e-9,
        s"schema-0 $a vs schema-2 $b more than one octave apart")
    }
  }
}
