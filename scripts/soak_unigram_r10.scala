// Round-10 unigram-trainer soak: corpus duplication must NOT grow the
// EM cost — training iterates the once-reduced (word, freq)
// vocabulary, so a 100x-duplicated corpus (same words, 100x freqs)
// pays only the one corpus-sized reduce pass. Run with:
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.sql.extensions=graft.GraftExtensions \
//     --driver-class-path target/scala-2.13/classes -I scripts/soak_unigram_r10.scala
import org.apache.spark.sql.functions._

val base = "/root/testdata/sf0.01"
val dup = "/root/repo/target/soak/unigram100x"
val d = spark.read.parquet(s"$base/documents.parquet")
d.crossJoin(spark.range(100).select(col("id").as("rep")))
  .withColumn("doc_id", col("doc_id") * 100 + col("rep")).drop("rep")
  .write.mode("overwrite").parquet(s"$dup/documents.parquet")
println(s"[unigram] staged 100x corpus at $dup")

def time[A](name: String)(f: => A): A = {
  val t0 = System.nanoTime()
  val r = f
  println(f"[unigram] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  r
}
import graft.pipeline.Unigram
val m1 = time("train @sf0.01") { Unigram.learnedPieces(spark, base) }
val m100 = time("train @sf0.01 x100") { Unigram.learnedPieces(spark, dup) }
// same pieces, 100x counts: the model is a pure function of the
// word DISTRIBUTION — duplication rescales counts, nothing else
assert(m1.map(_._1) == m100.map(_._1), "piece sets must match")
assert(m1.zip(m100).forall { case ((_, c1), (_, c100)) => c100 == 100 * c1 },
  "counts must scale exactly 100x")
println(s"[unigram] model invariance proven: ${m1.size} pieces, counts x100 exact")
val n1 = time("tokenCounts @sf0.01") { Unigram.tokenCounts(spark, base).count() }
val n100 = time("tokenCounts @sf0.01 x100") { Unigram.tokenCounts(spark, dup).count() }
println(s"[unigram] serving rows: $n1 -> $n100 (100x docs)")
sys.exit(0)
