package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Keyword retrieval over the documents table: Okapi BM25 (Robertson &
  * Zaragoza 2009) — the lexical-search leg a data-curation stack needs
  * next to the embedding ANN operators (G.*): "find the documents about
  * X" without a vector index.
  *
  * Scale shape: term frequencies are computed INLINE on the scan
  * (array_size of a filtered split — no explode, no shuffle); the
  * corpus statistics (N, avgdl, per-term document frequencies) reduce
  * to ONE row that broadcasts back; the final top-k is a
  * TakeOrderedAndProject (per-partition heaps, no global sort). Total:
  * one scan + one single-row aggregate + one take — no shuffle at any
  * corpus size.
  *
  * Determinism contract: idf goes through ln() (libm — last-ulp risk),
  * so each term's idf is rounded to 12 decimals ONCE at the stats
  * level; everything after is IEEE arithmetic both engines perform
  * identically, and the final score is quantized to 9 decimals (the
  * trig/atan2 pattern) before ranking so the order-by key is the
  * hashed value itself.
  */
object Retrieval {

  val K1 = 1.2
  val B = 0.75
  val DefaultTerms: Seq[String] = Seq("dup", "spark", "merge")
  val DefaultK = 20

  private def tfCol(term: String): Column =
    expr(s"size(filter(split(text, ' '), w -> w = '$term'))").cast("long")

  /** BM25 top-k: (doc_id, dl, score) for the `k` highest-scoring
    * documents against `terms`, score quantized to 9 decimals, ties
    * broken by doc_id. Documents matching no term (score 0) are
    * excluded.
    */
  def bm25(s: SparkSession, dir: String,
           terms: Seq[String] = DefaultTerms, k: Int = DefaultK): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.matches("[A-Za-z0-9_]+")),
      "terms must be non-empty plain words")
    val d = Tables.documents(s, dir).select(
      col("doc_id") +:
        expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) => tfCol(t).as(s"tf$i") }: _*)
    val aggCols = sum("dl").as("sdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0L, 1L).otherwise(0L)).as(s"df$i"))
    val st = d.agg(count(lit(1)).as("n"), aggCols: _*)
    val withSt = d.crossJoin(broadcast(st))
    val avgdl = col("sdl").cast("double") / col("n").cast("double")
    def idf(i: Int): Column = round(
      log((col("n").cast("double") - col(s"df$i").cast("double") + lit(0.5))
        / (col(s"df$i").cast("double") + lit(0.5)) + lit(1.0)), 12)
    def leg(i: Int): Column = {
      val tf = col(s"tf$i").cast("double")
      // (K1 + 1) as an explicit IEEE add — Scala-side constant folding
      // of 1.2 + 1.0 lands a half-ulp from DuckDB's nearest(2.2); both
      // engines must perform the same addition
      idf(i) * (tf * (lit(K1) + lit(1.0))) /
        (tf + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("dl").cast("double") / avgdl))
    }
    val score = terms.indices.map(leg).reduce(_ + _)
    withSt
      .select(col("doc_id"), col("dl"), round(score, 9).as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
