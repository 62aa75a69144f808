// Round-15 ALERT-STREAM soak at sf1: run the online alert evaluator
// over 1M events arriving in daily event-time waves, record max state
// rows/bytes, and assert the full emission set equals the batch state
// machine — the scale claim is that alert state is O(alerted series ×
// open buckets), never history- or corpus-sized.
//
//   sbt -batch compile && /opt/spark/bin/spark-shell --master local[32] \
//     --driver-memory 16g \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     -I scripts/soak_alert_r15.scala
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

{

val sp = SparkSession.builder().master("local[32]")
  .config("spark.sql.shuffle.partitions", "32")
  .config("spark.sql.session.timeZone", "UTC")
  .config("spark.ui.enabled", "false").getOrCreate()
sp.sparkContext.setLogLevel("ERROR")
sp.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
val sf1 = "/root/repo/target/soak/sf1"

@volatile var maxRows = 0L
@volatile var maxBytes = 0L
sp.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  override def onQueryStarted(e: QueryStartedEvent): Unit = {}
  override def onQueryProgress(e: QueryProgressEvent): Unit =
    e.progress.stateOperators.foreach { so =>
      maxRows = math.max(maxRows, so.numRowsTotal)
      maxBytes = math.max(maxBytes, so.memoryUsedBytes)
    }
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {}
})

val base = "/root/repo/target/tmp/soak_r15_alert"
org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
val in = s"$base/in"; val out = s"$base/out"; val chk = s"$base/chk"
java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

// rule: hourly per-metric sample count above its typical level — at
// sf1 the hourly count per event_type runs ~250-350, so > 300 flaps
val W = 3600L; val Thresh = 300.0; val For = 2 * W; val Keep = W
val Re = "click|view|purchase|signup|error"

def runOnce(): Unit = {
  val sq = graft.streaming.AlertStream.run(sp, in, Re, W, Thresh, For, Keep)
    .writeStream.format("parquet")
    .option("path", out).option("checkpointLocation", chk)
    .outputMode("append")
    .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    .start()
  sq.awaitTermination()
}

val ev = sp.read.parquet(s"$sf1/events.parquet")
val t0 = System.nanoTime
for (day <- 1 to 30) {
  val lo = java.time.LocalDateTime.of(2024, 1, day, 0, 0)
  val wave = ev.filter(col("ts") >= lit(lo) && col("ts") < lit(lo.plusDays(1)))
  val stage = s"$base/stage"
  wave.coalesce(1).write.mode("overwrite").parquet(stage)
  val part = new java.io.File(stage).listFiles()
    .find(_.getName.endsWith(".parquet")).get
  java.nio.file.Files.copy(part.toPath,
    java.nio.file.Paths.get(f"$in/w$day%02d.parquet"))
  runOnce()
}
// drain: two sentinel hops past the last real bucket ("other" type —
// outside the rule, drives only the event clock)
val maxUs = ev.agg(max(unix_micros(col("ts").cast("timestamp")))).collect()(0).getLong(0)
import sp.implicits._
def sentinel(id: Long, us: Long): Unit =
  Seq((id, java.time.LocalDateTime.ofEpochSecond(us / 1000000L,
      (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC),
      1L, "other", 1.0, "{}"))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    .coalesce(1).write.mode("append").parquet(in)
sentinel(9999999998L, maxUs + (2 * W + 7200L) * 1000000L)
runOnce()
sentinel(9999999999L, maxUs + (2 * W + 43200L) * 1000000L)
runOnce()
val wallSec = (System.nanoTime - t0) / 1e9

val got = sp.read.parquet(out)
val nGot = got.count()
val nFiring = got.filter(col("alertstate") === "firing").count()

// batch twin over the same 1M events
val cnt = ev
  .filter(col("event_type").rlike(s"^(?:$Re)$$"))
  .select(expr(s"((unix_micros(cast(ts as timestamp)) div 1000000) div $W) * $W")
    .as("step"), col("event_type"))
  .groupBy("step", "event_type").agg(count(lit(1)).cast("double").as("value"))
val held = cnt.filter(col("value") > Thresh)
val b = held.agg(min("step"), max("step")).collect()(0)
val spec = graft.operators.Promql.EvalSpec(b.getLong(0), b.getLong(1) + Keep + W, W)
val want = graft.operators.Alerts.alertStates(sp, held, spec, For, Keep)
val nWant = want.count()
val onlyS = got.exceptAll(want.select(got.columns.map(col): _*)).count()
val onlyB = want.select(got.columns.map(col): _*).exceptAll(got).count()
val dups = got.groupBy("step", "event_type").count().filter(col("count") > 1).count()

println(f"ALERT_STREAM sf1: ${wallSec}%.1f s for 30 daily passes + drain over 1M events; " +
  s"emitted=$nGot (firing=$nFiring) batch=$nWant stream_only=$onlyS batch_only=$onlyB dups=$dups " +
  s"max_state_rows=$maxRows max_state_bytes=$maxBytes")
assert(onlyS == 0 && onlyB == 0 && dups == 0 && nGot == nWant,
  "stream must equal batch with emit-once")
}
sys.exit(0)
