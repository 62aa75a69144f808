package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-curation operators: the last-mile steps between a cleaned
  * corpus and a training run — eval-set decontamination and sequence
  * packing. Both are built on the deterministic hash split
  * ([[TextAnalysis.sampleSplit]]) so the whole chain is stable across
  * engines, runs, and partitionings.
  */
object Curation {

  /** Train/eval contamination: train documents sharing at least one
    * word-3-gram shingle with any val/test document — the n-gram
    * overlap decontamination every benchmark-hygienic pipeline runs
    * before training (the same shingle family the near-dup operators
    * use). Output per contaminated train doc: how many distinct eval
    * shingles it shares and how many eval docs it touches.
    *
    * Scale shape: one shuffle on the shingle hash. The join input is
    * (doc, distinct-shingle) incidence — bounded by corpus shingle
    * mass, not doc pairs — and the aggregation collapses immediately to
    * per-train-doc counts (no pair materialization in the output).
    * Ubiquitous shingles make hot keys; at 100 TB the standard moves
    * are dropping top-frequency shingles (they carry no contamination
    * signal) or salting the shingle key — both orthogonal to the
    * operator's semantics.
    */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val split = TextAnalysis.sampleSplit(s, dir).select("doc_id", "split")
    val shingles = Tables.documents(s, dir)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), w -> w <> '')").as("ws"))
      .select(col("doc_id"), explode(Dedup.shinglesOf("ws")).as("sh"))
      .select(col("doc_id"), md5(col("sh")).as("h"))
      .distinct()
    val tagged = shingles.join(split, "doc_id")
    val train = tagged.filter(col("split") === "train").select("doc_id", "h")
    val eval_ = tagged.filter(col("split") =!= "train").select(
      col("doc_id").as("eval_doc_id"), col("h"))
    train.join(eval_, "h")
      .groupBy("doc_id")
      .agg(countDistinct(col("h")).as("n_shared_shingles"),
        countDistinct(col("eval_doc_id")).as("n_eval_docs"))
  }

  /** Sequence packing: assign every document a (pack_id, pack_offset)
    * in a fixed token budget per pack — the packing step that turns a
    * corpus into fixed-length training sequences. Deterministic global
    * token order = doc_id order.
    *
    * Scale shape — a DISTRIBUTED PREFIX SUM, not a global window: a
    * single `sum over (order by doc_id)` collapses to one partition at
    * 100 TB. Instead docs are range-sharded (`doc_id div shardSize`,
    * monotonic in doc_id so shard-then-id order IS global id order),
    * the running sum is computed per shard in parallel, and the
    * per-shard totals (corpus/shardSize rows — tiny) get a driver-side
    * prefix via a broadcast join. The sequential formulation in the
    * DuckDB oracle must agree row-for-row — that equality is the proof
    * the two-level decomposition is exact.
    */
  def packTokens(s: SparkSession, dir: String,
                 seqLen: Long = 2048L, shardSize: Long = 1L << 17): DataFrame = {
    require(seqLen > 0 && shardSize > 0, "seqLen and shardSize must be positive")
    val d = Tables.documents(s, dir).select(
      col("doc_id"),
      size(expr("filter(split(text, ' '), w -> w <> '')")).cast("long")
        .as("n_tokens"),
      expr(s"doc_id div ${shardSize}L").as("shard"))
    val wLocal = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = d.withColumn("local_before",
      coalesce(sum("n_tokens").over(wLocal), lit(0L)))
    val wShard = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    // #shards rows total: the single-partition window is over a
    // metadata-sized frame, and the result broadcasts
    val prefix = d.groupBy("shard").agg(sum("n_tokens").as("shard_tokens"))
      .withColumn("shard_before", coalesce(sum("shard_tokens").over(wShard), lit(0L)))
      .select("shard", "shard_before")
    local.join(broadcast(prefix), "shard")
      .select(col("doc_id"), col("n_tokens"),
        (col("shard_before") + col("local_before")).as("off"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"off div ${seqLen}L").as("pack_id"),
        (col("off") % seqLen).as("pack_offset"))
  }
}
