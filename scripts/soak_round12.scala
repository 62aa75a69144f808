// Round-12 soak: the new operators at 20x (target/soak/sf2, staged by
// soak_stage.scala — documents keep content, so duplicate density grows
// 20x; events keep series, so per-series density grows 20x). The
// structural questions:
//  - dedup_admission / indexMaintain: work tracks the DELTA and the
//    index (hash-space-bounded), never the corpus — time should grow
//    ~linearly with the delta, and the admission join must not blow up
//    with 20x duplicate multiplicity (the index stays collapsed).
//  - rollup rewrite: the rewritten hourly stats should cost a fraction
//    of the raw aggregation at 20x density (rollup rows grow with
//    series x buckets, raw rows with samples).
//  - the TPC-H five: plan shapes hold (semi join, pushdown, broadcast).
import org.apache.spark.sql.functions._

val dir = sys.props.getOrElse("soak.dir", "/root/repo/target/soak/sf2")

def timed(name: String)(run: => Long): Unit = {
  val t0 = System.nanoTime()
  try {
    val n = run
    println(f"[r12] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  } catch {
    case e: Throwable =>
      println(s"[r12] $name FAILED: ${e.getMessage.take(200)}")
  }
}

timed("dedup_admission")(graft.pipeline.Dedup.nearDupAdmission(spark, dir).count())
timed("dedup_index_maintain")(graft.pipeline.Dedup.indexMaintain(spark, dir).count())
timed("dedup_incremental")(graft.pipeline.Dedup.incremental(spark, dir).count())

// raw vs rewritten hourly stats at 20x sample density
timed("range_stats_raw")(graft.operators.TimeSeries.rangeStatsBy(spark, dir).count())
val s2 = spark.newSession()
s2.conf.set("spark.graft.rollup.rewrite", "true")
graft.sources.DownsampleStore.table(spark, dir).count() // build MV untimed
timed("range_stats_rewritten") {
  val df = graft.operators.TimeSeries.rangeStatsBy(s2, dir)
  val plan = df.queryExecution.executedPlan.toString
  require(plan.contains("downsample_300s"), "rewrite must fire in the soak")
  df.count()
}
timed("range_sum_filtered_rewritten") {
  val df = graft.operators.TimeSeries.rangeSum(s2, dir)
  require(df.queryExecution.executedPlan.toString.contains("downsample_300s"))
  df.count()
}

timed("q4_priority")(graft.operators.Relational.q4Priority(spark, dir).count())
timed("q6_forecast")(graft.operators.Relational.q6Forecast(spark, dir).count())
timed("q12_priority")(graft.operators.Relational.q12Priority(spark, dir).count())
timed("q14_promo")(graft.operators.Relational.q14Promo(spark, dir).count())
timed("q19_discount")(graft.operators.Relational.q19Discount(spark, dir).count())
println("[r12] DONE")
sys.exit(0)
