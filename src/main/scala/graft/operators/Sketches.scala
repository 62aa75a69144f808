package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate-aggregate sketches — the 100 TB path for quantiles and
  * distinct counts. Exact forms (sort-based percentiles, two-phase
  * distinct) pay a shuffle proportional to the data or the key
  * cardinality; the sketch forms are single-pass, mergeable,
  * constant-size state per group, which is why every large-scale engine
  * ships them. Both entries are declared rows-only (a sketch has no
  * cross-engine SQL oracle — DuckDB's approx functions use different
  * algorithms); their accuracy contracts are spec-proven against the
  * exact computations instead (SketchSpec), which is the stronger check:
  * the GK rank-error bound and the HLL relative-error bound are the
  * published guarantees the operators must meet.
  */
object Sketches {

  /** GK accuracy knob: rank error is bounded by n / accuracy. */
  val QuantileAccuracy = 1000

  /** HLL relative standard deviation knob. */
  val DistinctRsd = 0.02

  /** Per-type approximate p50/p90/p99 of `value` via percentile_approx
    * (Greenwald-Khanna variant): one pass, mergeable partial sketches,
    * O(accuracy) state per group — vs the exact form's full sort or
    * per-group collect. Deterministic for fixed input + accuracy (the
    * sketch is data-order-independent after the merge discipline), so
    * the rows-only record is stable run to run.
    */
  def approxQuantiles(s: SparkSession, dir: String): DataFrame = {
    val pcts = array(lit(0.5), lit(0.9), lit(0.99))
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(percentile_approx(col("value"), pcts, lit(QuantileAccuracy))
        .as("qs"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        col("qs")(0).as("p50"), col("qs")(1).as("p90"), col("qs")(2).as("p99"))
  }

  /** Per-type approximate distinct users via approx_count_distinct
    * (HyperLogLog++): constant ~kilobytes of state per group at ANY
    * cardinality, vs exact distinct's shuffle of every (group, user)
    * pair. rsd 0.02 ⇒ ~1.04/√(2^p) standard error ≈ 2%. Deterministic:
    * HLL registers are a pure function of the value hashes.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), DistinctRsd)
        .as("approx_users"),
        count(lit(1)).as("n_events"))
  }
}
