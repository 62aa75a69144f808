// 100x soak for the round-9 operator family: BPE training, sparse KNN,
// winnowing, perplexity filter — against the full 100x self-union at
// target/soak/sf10 (soak_stage.scala, mult=100). Growth SHAPE is the
// question: BPE rounds are vocabulary-sized (corpus-independent after
// the one word-count pass), tfidfKnn collapses to distinct contents
// BEFORE the pair machinery (duplicate density must NOT grow the
// candidate set), winnowing is per-doc linear, ppl terciles rank
// doc-count rows once.
import org.apache.spark.sql.functions._

val dir = sys.props.getOrElse("soak.dir", "/root/repo/target/soak/sf10")
val qs: Seq[(String, () => Long)] = Seq(
  "bpe_train" -> (() => graft.pipeline.Bpe.train(spark, dir).count()),
  "bpe_tokens" -> (() => graft.pipeline.Bpe.tokenCounts(spark, dir).count()),
  "bpe_vocab" -> (() => graft.pipeline.Bpe.vocabTop(spark, dir).count()),
  "doc_tfidf_knn" -> (() => graft.pipeline.Retrieval.tfidfKnn(spark, dir).count()),
  "text_winnow" -> (() => graft.pipeline.TextAnalysis.winnow(spark, dir).count()),
  "text_winnow_pairs" -> (() => graft.pipeline.TextAnalysis.winnowPairs(spark, dir).count()),
  "doc_ppl_filter" -> (() => graft.pipeline.Curation.pplFilter(spark, dir).count()))
qs.foreach { case (name, run) =>
  val t0 = System.nanoTime()
  try {
    val n = run()
    println(f"[x100] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  } catch {
    case e: Throwable =>
      println(s"[x100] $name FAILED: ${e.getMessage.take(200)}")
  }
}
println("[x100] DONE")
sys.exit(0)
