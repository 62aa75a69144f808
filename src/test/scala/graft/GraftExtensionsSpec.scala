package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import SparkFixture.{sf, spark}

/** SQL-surface test for the extension mechanism: the shared fixture
  * session is built with spark.sql.extensions=graft.GraftExtensions, so
  * the native expressions must be callable from plain SQL.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("decimal_dot is callable from SQL and equals the Column API") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      "SELECT vec_id, decimal_dot(embedding, embedding) AS n FROM emb_ext")
    val viaApi = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        graft.functions.VectorOps.dot(col("embedding"), col("embedding")).as("n"))
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("decimal_sq_dist is callable from SQL") {
    val n = spark.sql(
      "SELECT decimal_sq_dist(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)), array(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE))) AS d")
      .collect()(0).getDouble(0)
    assert(n === 5.0)
  }

  test("wrong arity fails with a clear message") {
    val err = intercept[Exception](
      spark.sql("SELECT decimal_dot(array(CAST(1.0 AS DOUBLE)))").collect())
    assert(err.getMessage.contains("2 arguments"))
  }

  test("promql_range TVF evaluates the stepped grid and inherits the rollup serving") {
    import graft.operators.Promql
    val spec = Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L)
    val viaSql = spark.sql(
      s"SELECT * FROM promql_range('sum(click)', '$sf', 1704067200, 1704153600, 3600, 7200)")
    val viaApi = Promql.queryAt(spark, sf, "sum(click)", spec)
    assert(viaSql.exceptAll(viaApi).count() === 0 &&
      viaApi.exceptAll(viaSql).count() === 0)
    assert(viaApi.count() > 0)
    // default lookback (300s) spelling works too
    assert(spark.sql(
      s"SELECT * FROM promql_range('sum(click)', '$sf', 1704067200, 1704153600, 3600)")
      .columns.toSeq === Seq("step", "value"))
    // an opted-in session serves the TVF's evaluation from the rollup
    graft.sources.DownsampleStore.table(spark, sf).count()
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.rollup.rewrite", "true")
    val served = s2.sql(
      s"SELECT * FROM promql_range('sum(click)', '$sf', 1704067200, 1704153600, 3600, 7200)")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("downsample_") && !plan.contains("events.parquet"),
      s"opted-in promql_range must serve from the rollup:\n${plan.take(1000)}")
    assert(served.exceptAll(viaApi).count() === 0 &&
      viaApi.exceptAll(served).count() === 0)
    val err = intercept[Exception](spark.sql(
      s"SELECT * FROM promql_range('sum(click)', '$sf', 1704067200)").collect())
    assert(err.getMessage.contains("promql_range expects"))
  }

  test("snapshot_at TVF serves each version's exact row set from its manifest") {
    val snap = graft.sources.SnapshotStore
    for (v <- Seq(1, 2, 3)) {
      val viaSql = spark.sql(s"SELECT * FROM snapshot_at('$sf', $v)")
      val viaApi = snap.readAt(spark, sf, v)
      assert(viaSql.exceptAll(viaApi).count() === 0 &&
        viaApi.exceptAll(viaSql).count() === 0, s"version $v must match")
      // the plan must touch ONLY the manifest's file groups: v1 never
      // reads a v2 group, v3 never reads a dropped 'error' group
      val scanned = viaSql.queryExecution.executedPlan.toString
      if (v == 1) assert(!scanned.contains("v2_"), scanned.take(800))
      if (v == 3) assert(!scanned.contains("_error"), scanned.take(800))
    }
    // version is an integer-literal contract, enforced at analysis
    val err = intercept[Exception](
      spark.sql(s"SELECT * FROM snapshot_at('$sf', 'one')").collect())
    assert(err.getMessage.contains("integer literal"))
  }

  test("snapshot_changes TVF equals the API incremental read") {
    val snap = graft.sources.SnapshotStore
    for ((f, t) <- Seq((1, 2), (2, 3), (1, 3))) {
      val viaSql = spark.sql(s"SELECT * FROM snapshot_changes('$sf', $f, $t)")
      val viaApi = snap.changesBetween(spark, sf, f, t)
      assert(viaSql.exceptAll(viaApi).count() === 0 &&
        viaApi.exceptAll(viaSql).count() === 0, s"$f -> $t must match")
    }
    // TVF output is a table: SQL can aggregate/join it like any other
    val counts = spark.sql(
      s"""SELECT change_type, COUNT(*) AS n
         |FROM snapshot_changes('$sf', 2, 3) GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("delete") && counts("delete") > 0)
  }

  test("xor_decode is callable from SQL and round-trips encoded samples") {
    import spark.implicits._
    val samples = Array((1000L, 1.5), (2000L, 2.5), (4000L, -3.25))
    val bytes = graft.sources.XorChunk.encode(samples)
    Seq(Tuple1(bytes)).toDF("chunk").createOrReplaceTempView("one_chunk")
    val rows = spark.sql(
      "SELECT s.us, s.value FROM one_chunk LATERAL VIEW explode(xor_decode(chunk)) t AS s")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq === samples.toSeq)
    // non-binary input fails analysis, not execution
    val err = intercept[Exception](
      spark.sql("SELECT xor_decode(1)").collect())
    assert(err.getMessage.toLowerCase.contains("binary"))
  }
}
