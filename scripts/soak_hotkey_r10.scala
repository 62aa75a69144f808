// Round-10 hot-key soak: the capped pair generators under a CRAFTED
// hot-key corpus. Run with:
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.sql.extensions=graft.GraftExtensions \
//     --driver-class-path target/scala-2.13/classes -I scripts/soak_hotkey_r10.scala
//
// The crafted corpus prepends one boilerplate run to EVERY document:
// a VARIED 40-word license-header-style sentence (distinct grams →
// ~2/(w+1) · 38 ≈ 15 winnow fingerprints whose posting lists span
// every DISTINCT content — each contributes C(|corpus|, 2) pairs)
// followed by "hotkey hotbee" x 15 (tf 15 makes (hotbee hotkey) the
// top-2 tf-idf block key of nearly every doc — one corpus-sized
// block). Collapse-first does NOT help here — contents stay distinct —
// this is exactly the failure mode the posting-list / block-size caps
// exist for: one ubiquitous key, quadratic pairs.
import org.apache.spark.sql.functions._

val varied = (0 until 40).map(i => s"lic$i").mkString(" ")
val boiler = varied + " " + Seq.fill(15)("hotkey hotbee").mkString(" ")
def stage(src: String, out: String): Unit = {
  spark.read.parquet(s"$src/documents.parquet")
    .withColumn("text", concat(lit(boiler + " "), col("text")))
    .write.mode("overwrite").parquet(s"$out/documents.parquet")
  println(s"[hotkey] staged $out from $src")
}
val h01 = "/root/repo/target/soak/hotkey001"
val h1 = "/root/repo/target/soak/hotkey01"
stage("/root/testdata/sf0.01", h01)
stage("/root/testdata/sf0.1", h1)

def time(name: String)(f: => Long): Unit = {
  val t0 = System.nanoTime()
  try {
    val n = f
    println(f"[hotkey] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  } catch {
    case e: Throwable =>
      println(s"[hotkey] $name FAILED: ${e.getMessage.take(200)}")
  }
}
import graft.pipeline.{TextAnalysis => TA, Retrieval => R}
// sf0.01-hot: uncapped is C(~500,2)-scale — feasible, shows the blow-up
time("winnow_pairs uncapped @hot0.01") { TA.winnowPairs(spark, h01).count() }
time("winnow_pairs capped   @hot0.01") { TA.winnowPairs(spark, h01, maxPostings = TA.WinnowMaxPostings).count() }
time("tfidf_knn    uncapped @hot0.01") { R.tfidfKnn(spark, h01).count() }
time("tfidf_knn    capped   @hot0.01") { R.tfidfKnn(spark, h01, maxBlock = R.KnnMaxBlock).count() }
// sf0.1-hot: uncapped is C(~5000,2) ~ 12M pairs per hot key — run it
// once to have the number on record; capped must stay flat
time("winnow_pairs uncapped @hot0.1 ") { TA.winnowPairs(spark, h1).count() }
time("winnow_pairs capped   @hot0.1 ") { TA.winnowPairs(spark, h1, maxPostings = TA.WinnowMaxPostings).count() }
time("tfidf_knn    uncapped @hot0.1 ") { R.tfidfKnn(spark, h1).count() }
time("tfidf_knn    capped   @hot0.1 ") { R.tfidfKnn(spark, h1, maxBlock = R.KnnMaxBlock).count() }
println("[hotkey] DONE")
sys.exit(0)
