import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
val s = SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions","32").config("spark.sql.session.timeZone","UTC").config("spark.sql.adaptive.enabled","false").config("spark.ui.enabled","false").config("spark.sql.extensions","graft.GraftExtensions").getOrCreate()
s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
s.sparkContext.setLogLevel("WARN")
val base = s.read.parquet("/root/testdata/sf0.1/events.parquet")
val hot = (0 until 200).map { i => base.withColumn("event_id", col("event_id") + lit(i * 1000000000000L)).withColumn("event_type", lit("click")) }.reduce(_ unionAll _)
base.unionAll(hot).write.mode("overwrite").parquet("/root/repo/target/soak/skew/events.parquet")
println("RESULT staged " + s.read.parquet("/root/repo/target/soak/skew/events.parquet").count())
val taskTimes = scala.collection.concurrent.TrieMap[Int, scala.collection.mutable.Buffer[Long]]()
class L extends org.apache.spark.scheduler.SparkListener { override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = taskTimes.getOrElseUpdate(e.stageId, scala.collection.mutable.Buffer[Long]()) += e.taskInfo.duration }
s.sparkContext.addSparkListener(new L)
val dir = "/root/repo/target/soak/skew"
val ev = graft.Tables.events(s, dir)
val perType = ev.groupBy("event_type").agg(avg("value").as("type_avg"))
def naive = ev.join(perType.hint("shuffle_hash"), Seq("event_type")).select(col("event_id"), (col("value") - col("type_avg")).as("d"))
def salted = graft.operators.Relational.saltedJoin(s, dir)
def report(tag: String, f: => Unit): Unit = { taskTimes.clear(); val t0 = System.nanoTime(); f; val wall = (System.nanoTime()-t0)/1e9; val joinStage = taskTimes.toSeq.sortBy(-_._2.max).head; val ts = joinStage._2.sorted; println(f"RESULT $tag wall ${wall}%.1f s | join-stage tasks ${ts.length} max ${ts.last/1000.0}%.1f s p50 ${ts(ts.length/2)/1000.0}%.2f s skew-ratio ${ts.last.toDouble/math.max(ts(ts.length/2),1)}%.0f x") }
naive.write.format("noop").mode("overwrite").save()
report("naive ", naive.write.format("noop").mode("overwrite").save())
salted.write.format("noop").mode("overwrite").save()
report("salted", salted.write.format("noop").mode("overwrite").save())
sys.exit(0)
