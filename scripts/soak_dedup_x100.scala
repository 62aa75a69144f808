// 100x dedup/similarity stress: runs the shingle pipeline, clusters,
// simhash near-dup, and auto-scaled embedding near-dup against the
// 100x documents/embeddings self-union at target/soak/x100 (staged by
// soak_stage.scala with mult=100 on those two tables). Wall-clock per
// query, one line each — the structural question is growth SHAPE
// (candidates ~ duplicate density, never all-pairs), not absolute time.
import org.apache.spark.sql.functions._

val dir = sys.props.getOrElse("soak.dir", "/root/repo/target/soak/x100")
val qs: Seq[(String, () => Long)] = Seq(
  "dedup_exact" -> (() => graft.pipeline.Dedup.exact(spark, dir).count()),
  "dedup_minhash_lsh" -> (() => graft.pipeline.Dedup.minhashLsh(spark, dir).count()),
  "dedup_ngram_jaccard" -> (() => graft.pipeline.Dedup.ngramJaccard(spark, dir).count()),
  "dedup_simhash_near" -> (() => graft.pipeline.Dedup.simhashNearDup(spark, dir).count()),
  "dedup_embedding" -> (() => graft.pipeline.Dedup.embeddingNearDupAuto(spark, dir).count()),
  "dedup_clusters" -> (() => graft.pipeline.Dedup.clusters(spark, dir).count()))
qs.foreach { case (name, run) =>
  val t0 = System.nanoTime()
  try {
    val n = run()
    println(f"[x100] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  } catch {
    case e: Throwable =>
      println(s"[x100] $name FAILED: ${e.getMessage.take(200)}")
  }
}
println("[x100] DONE")
sys.exit(0)
