package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Curation

/** CCNet-style perplexity-band filter: tercile structure + keep gate. */
class PplFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  test("bands partition scored docs into ordered terciles; keep = head+middle") {
    val rows = Curation.pplFilter(spark, sf).collect()
    assert(rows.length === spark.read.parquet(s"$sf/documents.parquet").count())
    val byBand = rows.groupBy(_.getString(3)).view.mapValues(_.toSeq).toMap
    val (head, mid, tail) = (byBand.getOrElse("head", Nil),
      byBand.getOrElse("middle", Nil), byBand.getOrElse("tail", Nil))
    assert(head.nonEmpty && mid.nonEmpty && tail.nonEmpty)
    // ordering: every head lp > every middle lp > every tail lp
    def lps(rs: Seq[org.apache.spark.sql.Row]) = rs.map(_.getDouble(2))
    assert(lps(head).min > lps(mid).max)
    assert(lps(mid).min > lps(tail).max)
    // tercile sizes balanced within rank-rounding slack
    val n = (head.size + mid.size + tail.size).toDouble
    Seq(head, mid, tail).foreach(b =>
      assert(math.abs(b.size - n / 3) <= n / 10 + 2, s"skewed band ${b.size} of $n"))
    // keep flag mirrors the band
    rows.foreach { r =>
      val keep = r.getBoolean(4)
      val band = r.getString(3)
      assert(keep === (band == "head" || band == "middle"))
    }
  }

  test("threshold rank is distributed: no unpartitioned window in the plan") {
    // the round-9 plan ranked the whole scored corpus through a
    // no-partition row_number (single reducer at scale); the fix
    // range-partitions and ranks per partition + broadcast prefix —
    // every surviving WindowExec must carry a partitionSpec
    val plan = Curation.pplFilter(spark, sf).queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected the per-partition local-rank window")
    windows.foreach(w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned window (single-reducer corpus sort): ${w.simpleStringWithNodeId()}"))
  }
}
