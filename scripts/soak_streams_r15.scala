// Round-15 streaming soak at sf1 (VERDICT r14 #4): run the stateful /
// index-bounded streaming legs once at 10x data and record max state
// rows/bytes per leg — the load-bearing check since rev c1 made
// RollupMaintainStream buffer raw samples per open bucket.
//
//   sbt -batch compile && /opt/spark/bin/spark-shell --master local[32] \
//     --driver-memory 16g \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     -I scripts/soak_streams_r15.scala
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// one block: the -I REPL feeds lines one at a time, so the
// open brace keeps multi-line expressions parsing as a unit
{

val sp = SparkSession.builder().master("local[32]")
  .config("spark.sql.shuffle.partitions", "32")
  .config("spark.ui.enabled", "false").getOrCreate()
sp.sparkContext.setLogLevel("ERROR")
val sf1 = "/root/repo/target/soak/sf1"

// max state rows/bytes per leg, captured from streaming progress
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
def stageParts(srcDir: String, in: String): Unit = {
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
  val st = java.nio.file.Files.list(java.nio.file.Paths.get(srcDir))
  try st.filter(_.getFileName.toString.endsWith(".parquet")).forEach { p =>
    val dst = java.nio.file.Paths.get(s"$in/${p.getFileName}")
    if (!java.nio.file.Files.exists(dst)) java.nio.file.Files.copy(p, dst)
  } finally st.close()
}

// ---- leg 1: stream-maintained rollup, DAILY arrival waves ------------
// Hash-distributed part files all span the whole month, so bulk-staging
// them would open every bucket at once (a backlog, not a stream). Daily
// event-time waves emulate a bulk-daily ingest cadence: state is then
// bounded by one wave's open buckets + the 1h watermark tail —
// proportional to ARRIVAL CADENCE, never to corpus size.
legTag = "rollup_maintain"
val rbase = "/root/repo/target/tmp/soak_r15_rollup"
wipe(rbase)
val rin = s"$rbase/in"; val rstore = s"$rbase/store"; val rcp = s"$rbase/cp"
java.nio.file.Files.createDirectories(java.nio.file.Paths.get(rin))
val ev = sp.read.parquet(s"$sf1/events.parquet")
val t0 = System.nanoTime
for (day <- 1 to 30) {
  val lo = java.time.LocalDateTime.of(2024, 1, day, 0, 0)
  val wave = ev.filter(col("ts") >= lit(lo) && col("ts") < lit(lo.plusDays(1)))
  val stage = s"$rbase/stage"
  wave.coalesce(1).write.mode("overwrite").parquet(stage)
  val part = new java.io.File(stage).listFiles()
    .find(_.getName.endsWith(".parquet")).get
  java.nio.file.Files.copy(part.toPath,
    java.nio.file.Paths.get(f"$rin/w$day%02d.parquet"))
  graft.streaming.RollupMaintainStream.runOnce(sp, rin, rstore, rcp, sf1)
}
graft.streaming.RollupMaintainStream.runOnce(sp, rin, rstore, rcp, sf1)
val rollupSec = (System.nanoTime - t0) / 1e9
val h = graft.streaming.RollupMaintainStream.horizonSec(rstore).get
// integrity: every bucket ending at or before the horizon is flushed
// with exactly the raw sample count
val flushed = sp.read.parquet(s"$rstore/parts")
  .agg(coalesce(sum("n_samples"), lit(0L))).collect()(0).getLong(0)
val expect = ev.filter(expr(
  s"(unix_micros(cast(ts as timestamp)) div 1000000 div 300) * 300 + 300 <= $h")).count()
println(f"ROLLUP_MAINTAIN sf1: ${rollupSec}%.1f s for 30 daily passes + drain, " +
  s"horizon=$h flushed_samples=$flushed expected=$expect " +
  s"max_state_rows=${maxRows("rollup_maintain")} " +
  s"max_state_bytes=${maxBytes("rollup_maintain")}")
assert(flushed == expect, "flushed sample count must equal raw within horizon")

// ---- leg 2: near-dup admission streams (index-bounded, no state) ----
legTag = "neardup_doc"
val nbase = "/root/repo/target/tmp/soak_r15_neardup"
wipe(nbase)
stageParts(s"$sf1/documents.parquet", s"$nbase/docs_in")
var t1 = System.nanoTime
graft.streaming.NearDupStream.runOnce(sp,
  s"$nbase/docs_in", s"$nbase/docs_out", s"$nbase/docs_cp", sf1)
val docSec = (System.nanoTime - t1) / 1e9
val docN = sp.read.parquet(s"$nbase/docs_out").count()
println(f"NEARDUP_DOC sf1: ${docSec}%.1f s, verdicts=$docN " +
  s"max_state_rows=${maxRows("neardup_doc")} " +
  s"max_state_bytes=${maxBytes("neardup_doc")}")

legTag = "neardup_emb"
stageParts(s"$sf1/embeddings.parquet", s"$nbase/emb_in")
t1 = System.nanoTime
graft.streaming.NearDupStream.embRunOnce(sp,
  s"$nbase/emb_in", s"$nbase/emb_out", s"$nbase/emb_cp", sf1)
val embSec = (System.nanoTime - t1) / 1e9
val embOut = sp.read.parquet(s"$nbase/emb_out")
val embN = embOut.count()
val embDup = embOut.filter(col("verdict") === "dup_of_corpus").count()
println(f"NEARDUP_EMB sf1 (hamming default gate): ${embSec}%.1f s, " +
  s"verdicts=$embN dups=$embDup " +
  s"max_state_rows=${maxRows("neardup_emb")} " +
  s"max_state_bytes=${maxBytes("neardup_emb")}")

// ---- leg 3: curation stream (kept store over sf1 documents) ----------
legTag = "curation"
val ctag = graft.sources.ChunkStore.pathTag(sf1)
wipe(s"/root/repo/target/tmp/curstream_$ctag")
t1 = System.nanoTime
val kept = graft.streaming.CurationStream.keptStore(sp, sf1)
val keptN = kept.count()
val curSec = (System.nanoTime - t1) / 1e9
println(f"CURATION sf1: ${curSec}%.1f s, kept=$keptN " +
  s"max_state_rows=${maxRows("curation")} " +
  s"max_state_bytes=${maxBytes("curation")}")

println("SOAK_OK")
}

sys.exit(0)
