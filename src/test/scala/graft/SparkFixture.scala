package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for every suite (suites run sequentially in
  * the single forked test JVM; creating a session per suite costs ~5s
  * each). sf0.001 keeps specs fast; correctness vs the DuckDB oracle at
  * sf0.01 is the driver's job, these specs assert invariants + physical
  * plan shape.
  */
object SparkFixture {
  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Formatted physical-plan text (same thing `.explain("formatted")`
    * prints) for plan-shape assertions.
    */
  def planOf(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Executes the frame and returns the parquet scan's OUTPUT row count
    * — rows the reader actually surfaced after row-group / page-level
    * skipping, before Spark's post-scan Filter. The IO-side metric for
    * bloom- and column-index-pruning assertions.
    */
  def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val executed = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    executed.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numOutputRows").value
    }.sum
  }
}
