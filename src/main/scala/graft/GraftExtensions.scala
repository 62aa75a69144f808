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

  /** Table-function arguments must be literals: the builder runs at
    * analysis time, before any row exists.
    */
  private def strLit(e: Expression, fn: String, what: String): String =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
        v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
      case _ => throw new IllegalArgumentException(
        s"$fn: $what must be a string literal")
    }

  private def intLit(e: Expression, fn: String, what: String): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
        // a silent toInt would WRAP an out-of-range version onto a
        // valid small one and serve the wrong snapshot (review r13)
        if (v < Int.MinValue || v > Int.MaxValue)
          throw new IllegalArgumentException(
            s"$fn: $what $v is out of integer range")
        else v.toInt
      case _ => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal")
    }

  private def intLitLong(e: Expression, fn: String, what: String): Long =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
        v.toLong
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
      case _ => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal")
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
        val s = org.apache.spark.sql.SparkSession.active
        val (q, dir) = exprs match {
          case Seq(qe) =>
            val d = s.conf.getOption("spark.graft.data.dir").getOrElse(
              throw new IllegalArgumentException(
                "promql(query): set spark.graft.data.dir or pass the dir argument"))
            (strLit(qe, "promql", "query"), d)
          case Seq(qe, de) =>
            (strLit(qe, "promql", "query"), strLit(de, "promql", "dir"))
          case other => throw new IllegalArgumentException(
            s"promql expects 1 or 2 arguments, got ${other.size}")
        }
        graft.operators.Promql.query(s, dir, q).queryExecution.analyzed
      }))
    // TRUE RANGE QUERIES from SQL (round 13): Prometheus's
    // query_range API surface — aligned steps + per-step lookback —
    // as a table function. In an opted-in session the front-end's
    // stepped rollup serving applies transparently, so the SQL user
    // gets the Grafana path at rollup cost.
    //   SELECT * FROM promql_range('sum(click)', dir, start, end, step[, lookback])
    ext.injectTableFunction((
      FunctionIdentifier("promql_range"),
      info("promql_range",
        "promql_range(query, dir, start, end, step[, lookback]) - evaluate a PromQL range query at aligned steps with per-step lookback"),
      (exprs: Seq[Expression]) => {
        val s = org.apache.spark.sql.SparkSession.active
        def long(e: Expression, what: String): Long =
          intLitLong(e, "promql_range", what)
        val (q, dir, spec) = exprs match {
          case Seq(qe, de, st, en, sp) =>
            (strLit(qe, "promql_range", "query"),
              strLit(de, "promql_range", "dir"),
              graft.operators.Promql.EvalSpec(
                long(st, "start"), long(en, "end"), long(sp, "step")))
          case Seq(qe, de, st, en, sp, lb) =>
            (strLit(qe, "promql_range", "query"),
              strLit(de, "promql_range", "dir"),
              graft.operators.Promql.EvalSpec(
                long(st, "start"), long(en, "end"), long(sp, "step"),
                long(lb, "lookback")))
          case other => throw new IllegalArgumentException(
            "promql_range expects (query, dir, start, end, step[, lookback]), " +
              s"got ${other.size} arguments")
        }
        graft.operators.Promql.queryAt(s, dir, q, spec)
          .queryExecution.analyzed
      }))
    // ALERTING RULES from SQL (round 15): the rule state machine as a
    // table function — SQL users evaluate a rule's expr through the
    // same front-end and get the ALERTS rows (pending/firing, with
    // keep_firing_for hysteresis) as a joinable table.
    //   SELECT * FROM promql_alerts('expr > c', dir, start, end, step,
    //                               lookback, for[, keep])
    ext.injectTableFunction((
      FunctionIdentifier("promql_alerts"),
      info("promql_alerts",
        "promql_alerts(expr, dir, start, end, step, lookback, for[, keep]) - evaluate an alerting rule: pending/firing rows with for: and keep_firing_for: semantics"),
      (exprs: Seq[Expression]) => {
        val s = org.apache.spark.sql.SparkSession.active
        def long(e: Expression, what: String): Long =
          intLitLong(e, "promql_alerts", what)
        val (q, dir, spec, forS, keepS) = exprs match {
          case Seq(qe, de, st, en, sp, lb, fo) =>
            (strLit(qe, "promql_alerts", "expr"),
              strLit(de, "promql_alerts", "dir"),
              graft.operators.Promql.EvalSpec(long(st, "start"),
                long(en, "end"), long(sp, "step"), long(lb, "lookback")),
              long(fo, "for"), 0L)
          case Seq(qe, de, st, en, sp, lb, fo, ke) =>
            (strLit(qe, "promql_alerts", "expr"),
              strLit(de, "promql_alerts", "dir"),
              graft.operators.Promql.EvalSpec(long(st, "start"),
                long(en, "end"), long(sp, "step"), long(lb, "lookback")),
              long(fo, "for"), long(ke, "keep"))
          case other => throw new IllegalArgumentException(
            "promql_alerts expects (expr, dir, start, end, step, lookback, for[, keep]), " +
              s"got ${other.size} arguments")
        }
        graft.operators.Alerts.rule(s, dir, q, spec, forS, keepS)
          .queryExecution.analyzed
      }))
    // The snapshot store's TIME-TRAVEL surface as SQL table functions
    // (round 13): `SELECT * FROM snapshot_at(dir, v)` reads the table
    // as of version v — planning ONLY that manifest's file groups —
    // and `snapshot_changes(dir, v1, v2)` is the CDF incremental read
    // (Delta's table_changes / Iceberg's incremental scan, served
    // through the same injectTableFunction mechanism as promql()).
    ext.injectTableFunction((
      FunctionIdentifier("snapshot_at"),
      info("snapshot_at",
        "snapshot_at(dir, v) - read the snapshot-versioned events table as of version v"),
      (exprs: Seq[Expression]) => {
        val s = org.apache.spark.sql.SparkSession.active
        exprs match {
          case Seq(de, ve) =>
            graft.sources.SnapshotStore.readAt(s,
              strLit(de, "snapshot_at", "dir"),
              intLit(ve, "snapshot_at", "version"))
              .queryExecution.analyzed
          case other => throw new IllegalArgumentException(
            s"snapshot_at expects (dir, version), got ${other.size} arguments")
        }
      }))
    ext.injectTableFunction((
      FunctionIdentifier("snapshot_changes"),
      info("snapshot_changes",
        "snapshot_changes(dir, v_from, v_to) - row-level changes between two committed versions (manifest diff)"),
      (exprs: Seq[Expression]) => {
        val s = org.apache.spark.sql.SparkSession.active
        exprs match {
          case Seq(de, fe, te) =>
            graft.sources.SnapshotStore.changesBetween(s,
              strLit(de, "snapshot_changes", "dir"),
              intLit(fe, "snapshot_changes", "v_from"),
              intLit(te, "snapshot_changes", "v_to"))
              .queryExecution.analyzed
          case other => throw new IllegalArgumentException(
            s"snapshot_changes expects (dir, v_from, v_to), got ${other.size} arguments")
        }
      }))
  }
}
