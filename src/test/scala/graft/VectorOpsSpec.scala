package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorOps
import SparkFixture.{sf, spark}

/** The native DecimalDot/DecimalSquaredDistance expressions must be
  * BIT-identical to the quantized floor-sum formula — that formula is
  * what the DuckDB oracle runs (Pipelines.dot):
  * dot = Σ ⌊aᵢ·bᵢ·2²⁴⌋ / 2²⁴, all exact IEEE steps.
  */
class VectorOpsSpec extends AnyFunSuite {

  private val sqlDot =
    """aggregate(
      |  zip_with(a, b, (x, y) -> CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * CAST(16777216 AS DOUBLE)) AS BIGINT)),
      |  CAST(0 AS BIGINT), (acc, v) -> acc + v) / CAST(16777216 AS DOUBLE)""".stripMargin

  private val sqlSqDist =
    """aggregate(
      |  zip_with(a, b, (x, y) -> CAST(floor((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * CAST(16777216 AS DOUBLE)) AS BIGINT)),
      |  CAST(0 AS BIGINT), (acc, v) -> acc + v) / CAST(16777216 AS DOUBLE)""".stripMargin

  test("DecimalDot equals the SQL floor-sum on every embedding pair") {
    val emb = Tables.embeddings(spark, sf)
    val pairs = emb.select(col("vec_id").as("ida"), col("embedding").as("a"))
      .crossJoin(emb.limit(10).select(col("vec_id").as("idb"), col("embedding").as("b")))
    val cmp = pairs.select(
      VectorOps.dot(col("a"), col("b")).as("fast"), expr(sqlDot).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("DecimalSquaredDistance equals the SQL floor-sum") {
    val emb = Tables.embeddings(spark, sf)
    val pairs = emb.select(col("vec_id").as("ida"), col("embedding").as("a"))
      .crossJoin(emb.limit(10).select(col("vec_id").as("idb"), col("embedding").as("b")))
    val cmp = pairs.select(
      VectorOps.sqDist(col("a"), col("b")).as("fast"), expr(sqlSqDist).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("DecimalDot works against a double-literal vector (mixed float/double)") {
    val litVec = array((0 until 64).map(i => lit((i % 13 - 6).toDouble)): _*)
    val emb = Tables.embeddings(spark, sf)
      .select(col("embedding").as("a"), litVec.as("b"))
    val cmp = emb.select(
      VectorOps.dot(col("a"), col("b")).as("fast"), expr(sqlDot).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("DecimalDot participates in whole-stage codegen (no fallback)") {
    val df = Tables.embeddings(spark, sf)
      .select(VectorOps.dot(col("embedding"), col("embedding")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes a node inside WholeStageCodegen stage n
    assert(plan.contains("*(1) Project [decimal_dot"), plan)
    assert(df.agg(sum("n")).collect()(0).getDouble(0) > 0)
  }

  test("quantization error is bounded by 64/2^24 per dot") {
    val emb = Tables.embeddings(spark, sf)
    val plain = "aggregate(zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    val cmp = emb.select(col("embedding").as("a"))
      .select(VectorOps.dot(col("a"), col("a")).as("q"), expr(plain).as("t"))
    assert(cmp.filter(abs(col("q") - col("t")) > 64.0 / 16777216.0).count() === 0)
  }

  test("type mismatch fails analysis loudly") {
    intercept[Exception] {
      Tables.documents(spark, sf)
        .select(VectorOps.dot(col("text"), col("text"))).collect()
    }
  }
}
