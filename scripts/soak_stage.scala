// Soak-dataset staging: an N-way self-union of an sf dir, fact tables
// only (dims stay fixed, like a real scale-up). Run with:
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     -I scripts/soak_stage.scala  (set SOAK_MULT / SOAK_OUT via -Dsoak.*)
//
// Key discipline: every copy shifts its table's unique keys by
// copy * SHIFT, and orders/lineitem shift o_orderkey/l_orderkey
// CONSISTENTLY — the order⋈lineitem join must stay 1:1 per copy
// (duplicating both sides with the same keys would make the join
// cardinality quadratic in the multiplier, which is a data bug, not a
// scale test). events keep (user_id, event_type, ts) so the series set
// is fixed and per-series density grows with the multiplier;
// documents/embeddings keep their content so duplicate density grows —
// the realistic dedup stress.
import org.apache.spark.sql.functions._

val mult = sys.props.getOrElse("soak.mult", "20").toInt
val src = sys.props.getOrElse("soak.src", "/root/testdata/sf0.1")
val out = sys.props.getOrElse("soak.out", s"/root/repo/target/soak/sf2")

spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
val SHIFT = 1000000000000L

def stage(name: String, keyShift: Map[String, Long]): Unit = {
  val base = spark.read.parquet(s"$src/$name.parquet")
  val copies = (0 until mult).map { i =>
    keyShift.foldLeft(base) { case (d, (k, unit)) =>
      d.withColumn(k, col(k) + lit(i * unit))
    }
  }
  copies.reduce(_ unionAll _)
    .write.mode("overwrite").parquet(s"$out/$name.parquet")
  println(s"[soak] $name x$mult staged")
}

stage("events", Map("event_id" -> SHIFT))
stage("orders", Map("o_orderkey" -> SHIFT))
stage("lineitem", Map("l_orderkey" -> SHIFT))
stage("documents", Map("doc_id" -> SHIFT))
stage("embeddings", Map("vec_id" -> SHIFT))
for (dim <- Seq("region", "nation", "customer", "supplier", "part")) {
  spark.read.parquet(s"$src/$dim.parquet")
    .write.mode("overwrite").parquet(s"$out/$dim.parquet")
  println(s"[soak] $dim copied")
}
println(s"[soak] DONE -> $out")
sys.exit(0)
