package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A PromQL front-end for the engine — the reference's user-facing query
  * language (it delegates evaluation to thanos promql-engine on top of
  * its chunk selection; reference: prometheus/promql_test.go). This is a
  * recursive-descent parser for the practical subset the §2.C operators
  * implement, compiled straight to declarative Spark plans:
  *
  *   expr     := agg | func | selector
  *   agg      := ("sum"|"avg"|"min"|"max"|"count") [by-clause] "(" expr ")"
  *             | "topk" "(" int "," expr ")"
  *   func     := ("rate"|"increase"|"count_over_time"|"avg_over_time"|
  *                "min_over_time"|"max_over_time") "(" selector range ")"
  *   selector := metric [ "{" matcher ("," matcher)* "}" ]
  *   matcher  := label ("="|"!="|"=~") '"' value '"'
  *   range    := "[" int ("s"|"m"|"h") "]"
  *
  * Data-model mapping (the events table as TSDB): metric name ⇒
  * `event_type`, labels ⇒ the remaining identity columns (`user_id`),
  * sample value ⇒ `value`, timestamp ⇒ `ts`. The evaluation step is
  * fixed at 1h (a range query with hourly resolution); range windows
  * select per-step lookback like PromQL's `metric[1h]` semantics when
  * window == step.
  *
  * Scale shape is inherited from the operators: matchers push to the
  * parquet scan, per-step aggregation is partial-agg, topk is the rank
  * window (or TopKPerKey at the call site).
  */
object Promql {

  sealed trait Expr
  case class Selector(metric: String, matchers: Seq[(String, String, String)]) extends Expr
  case class RangeFunc(fn: String, sel: Selector, rangeSec: Long) extends Expr
  case class Agg(op: String, by: Seq[String], child: Expr, k: Int = 0) extends Expr

  // ---- parser ----------------------------------------------------------

  private class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def eof: Boolean = { ws(); i >= s.length }
    def peek(tok: String): Boolean = { ws(); s.startsWith(tok, i) }
    def eat(tok: String): Unit = {
      ws()
      if (!s.startsWith(tok, i)) fail(s"expected '$tok'")
      i += tok.length
    }
    def ident(): String = {
      ws()
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      if (i == start) fail("expected identifier")
      s.substring(start, i)
    }
    def quoted(): String = {
      eat("\"")
      val start = i
      while (i < s.length && s(i) != '"') i += 1
      if (i >= s.length) fail("unterminated string")
      val v = s.substring(start, i); i += 1; v
    }
    def int(): Int = {
      ws()
      val start = i
      while (i < s.length && s(i).isDigit) i += 1
      if (i == start) fail("expected integer")
      s.substring(start, i).toInt
    }
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PromQL parse error at ${i}: $msg in '$s'")
  }

  private val aggOps = Set("sum", "avg", "min", "max", "count")
  private val rangeFns = Set("rate", "increase", "count_over_time",
    "avg_over_time", "min_over_time", "max_over_time")

  def parse(q: String): Expr = {
    val p = new P(q)
    val e = parseExpr(p)
    if (!p.eof) p.fail("trailing input")
    e
  }

  private def parseExpr(p: P): Expr = {
    val name = p.ident()
    if (name == "topk") {
      p.eat("("); val k = p.int(); p.eat(","); val child = parseExpr(p); p.eat(")")
      Agg("topk", Seq.empty, child, k)
    } else if (aggOps(name)) {
      val by = if (p.peek("by")) {
        p.eat("by"); p.eat("(")
        val first = p.ident()
        val rest = scala.collection.mutable.Buffer(first)
        while (p.peek(",")) { p.eat(","); rest += p.ident() }
        p.eat(")")
        rest.toSeq
      } else Seq.empty
      p.eat("("); val child = parseExpr(p); p.eat(")")
      Agg(name, by, child)
    } else if (rangeFns(name)) {
      p.eat("(")
      val sel = parseSelector(p)
      p.eat("[")
      val n = p.int()
      val unit = p.ident()
      val secs = unit match {
        case "s" => n.toLong
        case "m" => n * 60L
        case "h" => n * 3600L
        case u => p.fail(s"unknown duration unit '$u'")
      }
      p.eat("]"); p.eat(")")
      RangeFunc(name, sel, secs)
    } else parseSelectorTail(p, name)
  }

  private def parseSelector(p: P): Selector = parseSelectorTail(p, p.ident())

  private def parseSelectorTail(p: P, metric: String): Selector = {
    val ms = scala.collection.mutable.Buffer.empty[(String, String, String)]
    if (p.peek("{")) {
      p.eat("{")
      while (!p.peek("}")) {
        val l = p.ident()
        val op = if (p.peek("!=")) { p.eat("!="); "!=" }
          else if (p.peek("=~")) { p.eat("=~"); "=~" }
          else { p.eat("="); "=" }
        ms += ((l, op, p.quoted()))
        if (p.peek(",")) p.eat(",")
      }
      p.eat("}")
    }
    Selector(metric, ms.toSeq)
  }

  // ---- evaluator -------------------------------------------------------

  private def stepHour(c: Column): Column =
    unix_timestamp(date_trunc("hour", c)).as("step")

  private def exactSum(c: Column): Column =
    sum(c.cast("decimal(30,6)")).cast("double")

  /** Samples matching a selector, with matchers as pushable filters. */
  private def select(s: SparkSession, dir: String, sel: Selector): DataFrame = {
    val base = Tables.events(s, dir).filter(col("event_type") === sel.metric)
    sel.matchers.foldLeft(base) { case (df, (label, op, v)) =>
      val c = col(label)
      op match {
        case "="  => df.filter(c.cast("string") === v)
        case "!=" => df.filter(c.cast("string") =!= v)
        case "=~" => df.filter(c.cast("string").rlike(v))
      }
    }
  }

  /** Evaluate a parsed expression as an hourly-step range query.
    * Output: (step, [labels...], value).
    */
  def eval(s: SparkSession, dir: String, expr: Expr): DataFrame = expr match {
    case sel: Selector =>
      // instant-vector per step: last sample per series per step
      val samples = select(s, dir, sel)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), stepHour(col("ts")))
        .orderBy(col("ts").desc, col("event_id").desc)
      samples.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(stepHour(col("ts")), col("user_id"), col("value"))

    case RangeFunc(fn, sel, _) =>
      val samples = select(s, dir, sel)
      val g = samples.groupBy(stepHour(col("ts")), col("user_id"))
      fn match {
        case "count_over_time" => g.agg(count(lit(1)).cast("double").as("value"))
        case "avg_over_time" => g.agg((exactSum(col("value")) / count(lit(1))).as("value"))
        case "min_over_time" => g.agg(min("value").as("value"))
        case "max_over_time" => g.agg(max("value").as("value"))
        case "increase" => g.agg((max("value") - min("value")).as("value"))
        case "rate" =>
          // increase over the window divided by the window span
          g.agg(((max("value") - min("value")) / lit(3600.0)).as("value"))
      }

    case Agg(op, by, child, k) =>
      val in = eval(s, dir, child)
      val labelCols = in.columns.filter(c => c != "step" && c != "value")
      op match {
        case "topk" =>
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("step")
            .orderBy(col("value").desc +: labelCols.map(col): _*)
          in.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
            .drop("rn")
        case _ =>
          val keys = col("step") +: by.map(col)
          val g = in.groupBy(keys: _*)
          op match {
            case "sum"   => g.agg(exactSum(col("value")).as("value"))
            case "avg"   => g.agg((exactSum(col("value")) / count(lit(1))).as("value"))
            case "min"   => g.agg(min("value").as("value"))
            case "max"   => g.agg(max("value").as("value"))
            case "count" => g.agg(count(lit(1)).cast("double").as("value"))
          }
      }
  }

  /** Parse + evaluate. */
  def query(s: SparkSession, dir: String, q: String): DataFrame =
    eval(s, dir, parse(q))
}
