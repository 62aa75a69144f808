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
}
