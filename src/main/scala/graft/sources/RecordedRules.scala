package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Promql, SampleSource}

/** RECORDING RULES — the other half of the Prometheus ruler (alerting
  * rules are operators/Alerts): a PromQL expr evaluated on the aligned
  * grid and persisted as a NEW NAMED SERIES, queryable through the
  * evaluator like any ingested metric. Dashboards then aggregate the
  * precomputed series instead of re-scanning raw samples — at 100 TB
  * the recorded store is smaller than the raw table by the expr's
  * reduction factor (here: series-per-user-hour vs every raw sample).
  *
  * Storage: the recorded result maps onto the events sample schema the
  * [[SampleSource]] seam serves — `event_type` carries the rule name
  * (Prometheus sets `__name__` the same way), `user_id` carries the
  * rule's by-label (ungrouped rules record the synthetic series 0),
  * `ts` is the evaluation step, `event_id` 0 (one sample per series
  * per step — ties cannot arise). Build-once per (rule, dataset);
  * [[RecordedSource]] serves it back with time bounds applied at the
  * parquet scan.
  *
  * Restriction (documented, not silent): result labels must be ⊆
  * {user_id} — the sample schema has exactly one free label slot
  * beside the metric name, same shape the reference's chunk schema
  * carries (schema/chunk.go:25-37 — labels are the series key, the
  * metric name is a label).
  */
object RecordedRules {

  private val written =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def path(s: SparkSession, dir: String, name: String): String =
    s"${ChunkStore.storeRoot(s)}/recorded_${name}_${ChunkStore.pathTag(dir)}"

  /** Evaluate `expr` (default tumbling grid) and persist it as the
    * recorded series `name`. Idempotent per (rule, dataset) within a
    * session; overwrite semantics across sessions.
    */
  def record(s: SparkSession, dir: String, name: String,
             expr: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad rule name $name")
    val p = path(s, dir, name)
    // the memo value carries the expr AND the source fingerprint: a
    // name reused with a different expression must FAIL (silently
    // serving the first expr's data would be wrong numbers, no error),
    // and an in-place regenerated dataset must re-record rather than
    // serve stale rows for the session's lifetime
    val fp = ChunkStore.sourceFingerprint(
      java.nio.file.Paths.get(dir, "events.parquet"), "events.parquet")
    val tag = s"$expr|$fp"
    val prev = written.putIfAbsent(p, tag)
    if (prev == null)
      toSamples(Promql.query(s, dir, expr), name)
        .write.mode("overwrite").parquet(p)
    else if (prev != tag) {
      val sameExpr = prev.startsWith(s"$expr|")
      require(sameExpr,
        s"recording rule '$name' already recorded from a DIFFERENT expr")
      // same expr, regenerated source: re-record and refresh the memo
      toSamples(Promql.query(s, dir, expr), name)
        .write.mode("overwrite").parquet(p)
      written.put(p, tag)
    }
    p
  }

  /** (step, labels..., value) grid → the sample schema the seam serves.
    * Shared by the batch recorder and the streaming maintainer
    * (streaming/RecordingRuleStream) so the two write IDENTICAL rows.
    */
  private[graft] def toSamples(res: DataFrame, name: String): DataFrame = {
    val cols = res.columns.toSet
    require(cols.contains("step") && cols.contains("value"),
      s"recording rule must produce a (step, value) grid, got $cols")
    val labels = res.columns.filterNot(Set("step", "value")).toSeq
    require(labels.forall(_ == "user_id"),
      s"recording rule labels must be ⊆ {user_id}, got $labels")
    val keyed =
      if (labels.contains("user_id")) res
      else res.withColumn("user_id", lit(0L))
    keyed.select(
      timestamp_micros(col("step") * 1000000L).as("ts"),
      (col("step") * 1000000000L).as("ts_ns"),
      col("user_id").cast("long").as("user_id"),
      lit(name).as("event_type"),
      col("value").cast("double").as("value"),
      lit(0L).as("event_id"))
  }

  /** Serve a recorded rule's series back through the evaluator: the
    * rule name is the metric (`event_type`), time bounds prune at the
    * parquet scan on the raw ts_ns column.
    */
  case class RecordedSource(name: String) extends SampleSource {
    override def load(s: SparkSession, dir: String,
                      boundsNs: Option[(Long, Long)]): DataFrame = {
      val df = s.read.parquet(path(s, dir, name))
      boundsNs.fold(df) { case (lo, hi) =>
        df.filter(col("ts_ns") >= lo && col("ts_ns") <= hi)
      }
    }
  }

  /** ONE NAMESPACE for raw and recorded series — Prometheus's actual
    * posture (a recorded series is just another series in the TSDB): a
    * source that unions the raw events table with the dataset's
    * recorded stores, so a single PromQL expression can reference both
    * (e.g. a raw metric divided by a precomputed rule). Selectors pick
    * series by metric name after the union; time bounds prune each
    * leg's parquet scan independently, and a metric-name filter pushed
    * by the selector prunes the legs it cannot match via parquet
    * min/max stats on event_type.
    */
  case class UnionSource(names: Seq[String]) extends SampleSource {
    override def load(s: SparkSession, dir: String,
                      boundsNs: Option[(Long, Long)]): DataFrame = {
      val cols = Seq("ts", "ts_ns", "user_id", "event_type", "value", "event_id")
      // props rides along (null on recorded legs): the evaluator's
      // DERIVED labels project from props, so dropping it would make
      // any expr using a derived label on a RAW metric fail to analyze
      // under the one-namespace source
      val raw = graft.operators.EventsSource.load(s, dir, boundsNs)
      val rawLeg = raw.select((cols.map(col) :+ col("props")): _*)
      val legs = rawLeg +: names.map(n =>
        RecordedSource(n).load(s, dir, boundsNs)
          .select((cols.map(col) :+
            lit(null).cast("string").as("props")): _*))
      legs.reduce(_ unionAll _)
    }
  }
}
