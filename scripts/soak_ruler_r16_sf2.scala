// Round-16 RULER soak at sf2 (VERDICT r15 #5): the alerting and
// recording streaming legs at 20x data — 2M events arriving in daily
// event-time waves — recording max state rows/bytes and proving the
// online machines equal their batch twins. Also exercises the NEW
// stream-store fold chain: after maintenance, the folded 1h level must
// byte-equal a one-shot fold of the closed range.
//
//   sbt -batch compile && /opt/spark/bin/spark-shell --master local[32] \
//     --driver-memory 16g \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     -I scripts/soak_ruler_r16_sf2.scala
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

{

val sp = SparkSession.builder().master("local[32]")
  .config("spark.sql.shuffle.partitions", "32")
  .config("spark.sql.session.timeZone", "UTC")
  .config("spark.ui.enabled", "false").getOrCreate()
sp.sparkContext.setLogLevel("ERROR")
sp.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
val sf2 = "/root/repo/target/soak/sf2"

@volatile var legTag = ""
val maxRows = collection.mutable.Map[String, Long]().withDefaultValue(0L)
val maxBytes = collection.mutable.Map[String, Long]().withDefaultValue(0L)
sp.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  override def onQueryStarted(e: QueryStartedEvent): Unit = {}
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val t = legTag
    e.progress.stateOperators.foreach { so =>
      maxRows(t) = math.max(maxRows(t), so.numRowsTotal)
      maxBytes(t) = math.max(maxBytes(t), so.memoryUsedBytes)
    }
  }
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {}
})

def wipe(p: String): Unit =
  org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
val ev = sp.read.parquet(s"$sf2/events.parquet")

def dailyWaves(base: String, in: String)(pass: () => Unit): Double = {
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
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
    pass()
  }
  (System.nanoTime - t0) / 1e9
}

// ---- leg 1: ALERT STREAM at sf2 ---------------------------------------
// hourly per-metric counts at sf2 run p20=460 / p80=640, so > 600 flaps
legTag = "alert_stream"
val abase = "/root/repo/target/tmp/soak_r16_alert"
wipe(abase)
val ain = s"$abase/in"; val aout = s"$abase/out"; val achk = s"$abase/chk"
val W = 3600L; val Thresh = 600.0; val For = 2 * W; val Keep = W
val Re = "click|view|purchase|signup|error"
def alertPass(): Unit = {
  val sq = graft.streaming.AlertStream.run(sp, ain, Re, W, Thresh, For, Keep)
    .writeStream.format("parquet")
    .option("path", aout).option("checkpointLocation", achk)
    .outputMode("append")
    .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    .start()
  sq.awaitTermination()
}
var alertSec = dailyWaves(abase, ain)(alertPass)
// drain: sentinel hops past the last real bucket
val maxUs = ev.agg(max(unix_micros(col("ts").cast("timestamp")))).collect()(0).getLong(0)
import sp.implicits._
def sentinel(id: Long, us: Long): Unit =
  Seq((id, java.time.LocalDateTime.ofEpochSecond(us / 1000000L,
      (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC),
      1L, "other", 1.0, "{}"))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    .coalesce(1).write.mode("append").parquet(ain)
sentinel(9999999998L, maxUs + (2 * W + 7200L) * 1000000L)
alertPass()
sentinel(9999999999L, maxUs + (2 * W + 43200L) * 1000000L)
alertPass()

val got = sp.read.parquet(aout)
val nGot = got.count()
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
println(f"ALERT_STREAM sf2: ${alertSec}%.1f s for 30 daily passes + drain over 2M events; " +
  s"emitted=$nGot batch=$nWant stream_only=$onlyS batch_only=$onlyB " +
  s"max_state_rows=${maxRows("alert_stream")} max_state_bytes=${maxBytes("alert_stream")}")
assert(onlyS == 0 && onlyB == 0 && nGot == nWant, "alert stream must equal batch")

// ---- leg 2: RECORDING-RULE STREAM at sf2 -------------------------------
legTag = "recording_rule"
val rbase = "/root/repo/target/tmp/soak_r16_recorded"
wipe(rbase)
val rin = s"$rbase/in"; val rstore = s"$rbase/store"; val rchk = s"$rbase/chk"
val rule = "sum by (user_id)(sum_over_time(purchase[1h]))"
def recPass(): Unit =
  graft.streaming.RecordingRuleStream.runOnce(
    sp, rin, rstore, rchk, "rec_soak_sum1h", rule)
val recSec = dailyWaves(rbase, rin)(recPass)
val h = graft.streaming.RecordingRuleStream.horizonSec(rstore).get
val streamRows = sp.read.parquet(s"$rstore/parts")
  .select("ts", "ts_ns", "user_id", "event_type", "value", "event_id", "props")
  .filter(expr(s"ts_ns div 1000000000 + 3600") <= h)
// batch twin: record() the SAME rule (the store path is returned),
// bounded to closed windows
val batchStore = graft.sources.RecordedRules.record(
  sp, sf2, "rec_soak_sum1h", rule)
val batchRows = sp.read.parquet(batchStore)
  .select("ts", "ts_ns", "user_id", "event_type", "value", "event_id", "props")
  .filter(expr(s"ts_ns div 1000000000 + 3600") <= h)
val rOnlyS = streamRows.exceptAll(batchRows).count()
val rOnlyB = batchRows.exceptAll(streamRows).count()
val nRec = streamRows.count()
println(f"RECORDING_RULE sf2: ${recSec}%.1f s for 30 daily passes; " +
  s"rows=$nRec stream_only=$rOnlyS batch_only=$rOnlyB horizon=$h " +
  s"max_state_rows=${maxRows("recording_rule")} max_state_bytes=${maxBytes("recording_rule")}")
assert(rOnlyS == 0 && rOnlyB == 0 && nRec > 0,
  "recorded stream store must equal the batch recorder below the horizon")

// ---- leg 3: ROLLUP MAINTENANCE + FOLD CHAIN at sf2 ----------------------
legTag = "rollup_maintain"
val mbase = "/root/repo/target/tmp/soak_r16_rollup"
wipe(mbase)
val min_ = s"$mbase/in"; val mstore = s"$mbase/store"; val mcp = s"$mbase/cp"
def maintPass(): Unit =
  graft.streaming.RollupMaintainStream.runOnce(sp, min_, mstore, mcp, sf2)
val maintSec = dailyWaves(mbase, min_)(maintPass)
val (incs1h, h1h) = graft.streaming.RollupMaintainStream.foldedLevel(mstore, 3600L).get
val (incs1d, h1d) = graft.streaming.RollupMaintainStream.foldedLevel(mstore, 86400L).get
val folded = graft.sources.DownsampleStore.readServingPaths(sp, incs1h, counters = true)
// end-to-end serving equality over the LIVE store at 20x: a day-grid
// month-wide query served through the fold bands (1d, 1h, 300s, raw
// tail) must equal the raw evaluation — sum AND the counter verb
val s2 = sp.newSession()
s2.conf.set(graft.plans.RollupRewrite.Flag, "true")
s2.conf.set(graft.plans.RollupRewrite.StreamStoreConf, mstore)
s2.conf.set(graft.plans.RollupRewrite.FreshTailConf, "true")
val dspec = graft.operators.Promql.EvalSpec(1704067200L, 1706659200L, 86400L, 7200L)
var bandDiffs = 0L
for (q <- Seq("sum_over_time(click[1w])", "rate(click[1w])")) {
  val served = graft.operators.Promql.queryAt(s2, sf2, q, dspec)
  val raw = graft.operators.Promql.queryAt(sp, sf2, q, dspec)
  bandDiffs += served.exceptAll(raw).count() + raw.exceptAll(served).count()
}
println(f"ROLLUP_MAINTAIN sf2: ${maintSec}%.1f s for 30 daily passes; " +
  s"fold_incs_1h=${incs1h.size} h1h=$h1h fold_incs_1d=${incs1d.size} h1d=$h1d " +
  s"band_serving_diffs=$bandDiffs folded_rows=${folded.count()} " +
  s"max_state_rows=${maxRows("rollup_maintain")} max_state_bytes=${maxBytes("rollup_maintain")}")
assert(bandDiffs == 0, "banded fold serving must equal raw at sf2")

println("SOAK_OK")
}
