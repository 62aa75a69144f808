// As-of / interval join soak: 20x per-series density (the regime that
// breaks naive range joins). Run with:
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes -I scripts/soak_joins.scala
//
// Staging: 20 copies of sf0.1 events with shifted event_id and FIXED
// (user_id, event_type, ts) — the series set stays constant, so each
// user's timeline densifies 20x. That is the adversarial shape for a
// range join: naive SortMergeJoin-on-user_id candidate pairs grow with
// density^2 (x400 here), while the banded equi-join's candidates are
// bounded by bin co-residency (x20-ish) and the as-of union keeps ONE
// shuffle + a running last regardless of density.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
val src = "/root/testdata/sf0.1"
val out = "/root/repo/target/soak/ev20"
val mult = 20
val SHIFT = 1000000000000L
val base = spark.read.parquet(s"$src/events.parquet")
(0 until mult).map(i => base.withColumn("event_id", col("event_id") + lit(i * SHIFT)))
  .reduce(_ unionAll _).write.mode("overwrite").parquet(s"$out/events.parquet")
println("[joinsoak] events x20 staged")

def time(name: String)(df: => DataFrame): Double = {
  val t0 = System.nanoTime
  df.write.format("noop").mode("overwrite").save()
  val sec = (System.nanoTime - t0) / 1e9
  println(f"[joinsoak] $name: $sec%.1f s")
  sec
}

// the naive formulation the banded join replaces: equi-join on user_id
// with the range as a post-filter — candidate pairs = clicks_u x
// purchases_u per user
def naiveInterval(dir: String): DataFrame = {
  val ev = graft.Tables.events(spark, dir)
  val p = ev.filter(col("event_type") === "purchase")
    .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
  val c = ev.filter(col("event_type") === "click")
    .select(col("user_id"), col("ts").as("c_ts"), col("value"))
  p.join(c, Seq("user_id"))
    .filter(col("c_ts") >= col("p_ts") &&
      col("c_ts") < col("p_ts") + expr("INTERVAL 3600 SECOND"))
    .groupBy("purchase_id", "user_id")
    .agg(count(lit(1)).as("n_clicks"),
      sum(col("value").cast("decimal(30,6)")).cast("double").as("click_value_sum"))
}

import graft.operators.Relational
time("asof_join_1x")(Relational.asofJoin(spark, src))
time("asof_tolerance_1x")(Relational.asofTolerance(spark, src))
time("interval_banded_1x")(Relational.intervalJoin(spark, src))
time("interval_naive_1x")(naiveInterval(src))
time("asof_join_20x")(Relational.asofJoin(spark, out))
time("asof_tolerance_20x")(Relational.asofTolerance(spark, out))
time("interval_banded_20x")(Relational.intervalJoin(spark, out))
// sanity: banded == naive at 1x (same result set)
val b = Relational.intervalJoin(spark, src)
val n = naiveInterval(src).select(b.columns.map(col): _*)
println(s"[joinsoak] banded-vs-naive diff rows: " +
  (b.exceptAll(n).count() + n.exceptAll(b).count()))
sys.exit(0)
