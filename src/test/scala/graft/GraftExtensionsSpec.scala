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
