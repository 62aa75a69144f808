package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DecimalDot, DecimalSquaredDistance, XorDecode}

/** Spark extension entry point: makes graft's native expressions available
  * to plain SQL users. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` (or `.withExtensions` on
  * the builder) — the idiomatic way to ship a Spark-native library
  * (same mechanism Delta/Iceberg use), no fork, no reflection.
  *
  *   SELECT decimal_dot(a.embedding, b.embedding) FROM ...
  *   SELECT decimal_sq_dist(embedding, array(...)) FROM ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def binary(fn: (Expression, Expression) => Expression, name: String)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => fn(a, b)
    case other => throw new IllegalArgumentException(
      s"$name expects exactly 2 arguments, got ${other.size}")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // MV rewrite: hourly sums over raw events re-planned onto the
    // downsample rollup when materialized; opt-in per session via
    // spark.graft.rollup.rewrite (see plans/RollupRewrite.scala)
    ext.injectOptimizerRule(graft.plans.RollupRewrite.apply)
    ext.injectFunction((
      FunctionIdentifier("decimal_dot"),
      info("decimal_dot",
        "decimal_dot(a, b) - order-independent quantized dot product of two float/double arrays"),
      binary(DecimalDot.apply, "decimal_dot")))
    ext.injectFunction((
      FunctionIdentifier("decimal_sq_dist"),
      info("decimal_sq_dist",
        "decimal_sq_dist(a, b) - order-independent quantized squared L2 distance"),
      binary(DecimalSquaredDistance.apply, "decimal_sq_dist")))
    ext.injectFunction((
      FunctionIdentifier("xor_decode"),
      info("xor_decode",
        "xor_decode(chunk) - decode Prometheus XOR chunk bytes to array<struct<us, value>>"),
      {
        case Seq(c) => XorDecode(c)
        case other => throw new IllegalArgumentException(
          s"xor_decode expects exactly 1 argument, got ${other.size}")
      }))
  }
}
