package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamAgg
import org.scalatest.funsuite.AnyFunSuite
import SparkFixture.{sf, spark}

class StreamAggSpec extends AnyFunSuite {

  private def stageInput(tag: String): String = {
    val in = s"/root/repo/target/tmp/streamagg_$tag/in"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"/root/repo/target/tmp/streamagg_$tag"))
    Files.createDirectories(Paths.get(in))
    Files.copy(Paths.get(s"$sf/events.parquet"), Paths.get(s"$in/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    in
  }

  test("streaming windowed agg equals the batch computation") {
    val in = stageInput("win")
    val q = StreamAgg.windowedCounts(spark, in).writeStream
      .format("memory").queryName("wc_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("wc_stream")
    val want = Tables.events(spark, sf)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("mapGroupsWithState running stats equal the batch group stats") {
    val in = stageInput("state")
    import SparkFixture.spark.implicits._
    val q = StreamAgg.userRunningStats(spark, in).writeStream
      .format("memory").queryName("us_stream")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // one batch → the latest update per user is that user's total
    val got = spark.table("us_stream")
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("last_us").as("last_us"))
    val want = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max(unix_micros(col("ts"))).as("last_us"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }
}
