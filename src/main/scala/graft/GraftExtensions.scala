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
    // PromQL as a SQL TABLE FUNCTION (round 12): SQL users evaluate a
    // PromQL range query inline and JOIN/filter/aggregate the result
    // like any table — `SELECT * FROM promql('rate(click[1h])', dir)`.
    // The builder compiles the query text through the same front-end
    // the API uses, so the SQL surface inherits every verb, the
    // streaming-rejection rules, and (in an opted-in session) the
    // rollup rewrite. The dataset dir is the second literal arg, or the
    // session conf `spark.graft.data.dir` when omitted.
    ext.injectTableFunction((
      FunctionIdentifier("promql"),
      info("promql",
        "promql(query[, dir]) - evaluate a PromQL range query over the events table at `dir`"),
      (exprs: Seq[Expression]) => {
        def str(e: Expression, what: String): String = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
            v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
          case _ => throw new IllegalArgumentException(
            s"promql: $what must be a string literal")
        }
        val s = org.apache.spark.sql.SparkSession.active
        val (q, dir) = exprs match {
          case Seq(qe) =>
            val d = s.conf.getOption("spark.graft.data.dir").getOrElse(
              throw new IllegalArgumentException(
                "promql(query): set spark.graft.data.dir or pass the dir argument"))
            (str(qe, "query"), d)
          case Seq(qe, de) => (str(qe, "query"), str(de, "dir"))
          case other => throw new IllegalArgumentException(
            s"promql expects 1 or 2 arguments, got ${other.size}")
        }
        graft.operators.Promql.query(s, dir, q).queryExecution.analyzed
      }))
  }
}
