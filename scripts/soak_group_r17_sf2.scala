// Round-17 STREAMING RULE GROUP soak at sf2 (20x data, 2M events in
// 30 daily event-time waves): a 4-rule group — count alert (flapping
// threshold), sum alert, COUNTER rate alert, max recording rule — as
// ONE AlertGroupStream, recording max state rows/bytes and wall time,
// then the SAME four rules as independent AlertStream runs over
// identical waves: the group's one-pass efficiency claim, measured.
// Batch-equality asserted for the count and rate legs (the others are
// spec-pinned at sf0.001; here the question is scale).
//
//   sbt -batch compile && /opt/spark/bin/spark-shell --master local[32] \
//     --driver-memory 16g \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     -I scripts/soak_group_r17_sf2.scala
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
val maxUs = ev.agg(max(unix_micros(col("ts").cast("timestamp"))))
  .collect()(0).getLong(0)
import sp.implicits._

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
def sentinel(in: String, id: Long, us: Long): Unit =
  Seq((id, java.time.LocalDateTime.ofEpochSecond(us / 1000000L,
      (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC),
      1L, "other", 1.0, "{}"))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    .coalesce(1).write.mode("append").parquet(in)

val H = 3600L
val Re = "click|view|purchase|signup|error"
val rules = Seq(
  graft.streaming.AlertGroupStream.SRule("g_hot", Re, "count", H,
    Some(600.0), forSec = 2 * H, keepSec = H),
  graft.streaming.AlertGroupStream.SRule("g_psum", "purchase", "sum",
    2 * H, Some(40000.0), forSec = 2 * H, keepSec = 0L),
  graft.streaming.AlertGroupStream.SRule("g_rate", "click|view", "rate",
    2 * H, Some(0.0), forSec = 4 * H, keepSec = 2 * H),
  graft.streaming.AlertGroupStream.SRule("g_rec", "click", "max", H, None))

// ---- leg 1: the GROUP — one stream, four rules -------------------------
legTag = "group"
val gbase = "/root/repo/target/tmp/soak_r17_group"
wipe(gbase)
val gin = s"$gbase/in"; val gout = s"$gbase/out"; val gchk = s"$gbase/chk"
def groupPass(): Unit = {
  val sq = graft.streaming.AlertGroupStream.run(sp, gin, rules)
    .writeStream.format("parquet")
    .option("path", gout).option("checkpointLocation", gchk)
    .outputMode("append")
    .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    .start()
  sq.awaitTermination()
}
var groupSec = dailyWaves(gbase, gin)(groupPass)
sentinel(gin, 9999999998L, maxUs + (8 * H + 7200L) * 1000000L)
groupPass()
sentinel(gin, 9999999999L, maxUs + (8 * H + 43200L) * 1000000L)
groupPass()
val gotG = sp.read.parquet(gout)
println(f"GROUP sf2: ${groupSec}%.1f s for 30 daily passes + drain; " +
  s"emitted=${gotG.count()} " +
  s"max_state_rows=${maxRows("group")} max_state_bytes=${maxBytes("group")}")

// ---- leg 2: the SAME rules as independent streams ----------------------
var soloSec = 0.0
for (r <- rules) {
  legTag = s"solo_${r.name}"
  val base = s"/root/repo/target/tmp/soak_r17_solo_${r.name}"
  wipe(base)
  val in = s"$base/in"; val out = s"$base/out"; val chk = s"$base/chk"
  def pass(): Unit = {
    val sq = (r.threshold match {
      case Some(t) => graft.streaming.AlertStream.run(sp, in, r.metricRe,
        r.wSec, t, r.forSec, r.keepSec, verb = r.verb)
      case None => graft.streaming.AlertStream.run(sp, in, r.metricRe,
        r.wSec, Double.NegativeInfinity, 0L, 0L, verb = r.verb)
    }).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sq.awaitTermination()
  }
  soloSec += dailyWaves(base, in)(pass)
  sentinel(in, 9999999998L, maxUs + (8 * H + 7200L) * 1000000L)
  pass()
  sentinel(in, 9999999999L, maxUs + (8 * H + 43200L) * 1000000L)
  pass()
  // per-rule emission equality group vs solo (the recording rule's solo
  // twin runs threshold −inf for:=0 — every data bucket "fires", so
  // compare steps+values only)
  val solo = sp.read.parquet(out)
  val mine = gotG.filter(col("rule") === r.name)
    .select("step", "event_type", "value")
  val sv = solo.select("step", "event_type", "value")
  val d1 = mine.exceptAll(sv).count(); val d2 = sv.exceptAll(mine).count()
  println(s"  ${r.name}: group=${mine.count()} solo=${sv.count()} " +
    s"only_group=$d1 only_solo=$d2 " +
    s"state_rows=${maxRows(legTag)} state_bytes=${maxBytes(legTag)}")
  assert(d1 == 0 && d2 == 0, s"${r.name} diverged from its solo stream")
}
println(f"SOLO sf2 total: ${soloSec}%.1f s for 4 independent streams " +
  f"(group was ${groupSec}%.1f s — one-pass ratio ${groupSec / soloSec}%.2f)")

// ---- batch-equality spot-checks at scale: count + rate legs ------------
val cnt = ev
  .filter(col("event_type").rlike(s"^(?:$Re)$$"))
  .select(expr(s"((unix_micros(cast(ts as timestamp)) div 1000000) div $H) * $H")
    .as("step"), col("event_type"))
  .groupBy("step", "event_type").agg(count(lit(1)).cast("double").as("value"))
val heldC = cnt.filter(col("value") > 600.0)
val bc = heldC.agg(min("step"), max("step")).collect()(0)
val specC = graft.operators.Promql.EvalSpec(bc.getLong(0), bc.getLong(1) + 2 * H, H)
val wantC = graft.operators.Alerts.alertStates(sp, heldC, specC, 2 * H, H)
val gotC = gotG.filter(col("rule") === "g_hot")
  .select("step", "event_type", "alertstate", "value")
val cd1 = gotC.exceptAll(wantC.select(gotC.columns.map(col): _*)).count()
val cd2 = wantC.select(gotC.columns.map(col): _*).exceptAll(gotC).count()
println(s"BATCH TWIN g_hot: stream_only=$cd1 batch_only=$cd2 rows=${gotC.count()}")
assert(cd1 == 0 && cd2 == 0, "count leg must equal batch at sf2")

val heldR = graft.operators.Promql.query(sp, sf2,
  """sum by (event_type)(rate({event_type=~"click|view"}[2h])) > 0""")
val br = heldR.agg(min("step"), max("step")).collect()(0)
val specR = graft.operators.Promql.EvalSpec(br.getLong(0),
  br.getLong(1) + 6 * H, 2 * H)
val wantR = graft.operators.Alerts.alertStates(sp, heldR, specR, 4 * H, 2 * H)
val gotR = gotG.filter(col("rule") === "g_rate")
  .select("step", "event_type", "alertstate", "value")
val rd1 = gotR.exceptAll(wantR.select(gotR.columns.map(col): _*)).count()
val rd2 = wantR.select(gotR.columns.map(col): _*).exceptAll(gotR).count()
println(s"BATCH TWIN g_rate: stream_only=$rd1 batch_only=$rd2 rows=${gotR.count()}")
assert(rd1 == 0 && rd2 == 0, "rate leg must equal batch at sf2")

println("SOAK_R17_GROUP: PASS")
sys.exit(0)
}
