package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** STREAMING heavy-hitter maintenance — the online sibling of
  * `text_heavy_hitters` (functions/HeavyHitters.scala): documents
  * stream in, a sharded Misra–Gries sketch is held as streaming state,
  * and each micro-batch emits the updated shards' candidate snapshots.
  *
  * Scale shape: words hash into [[Shards]] DISJOINT shards (every
  * occurrence of a word lands in one shard), each shard's state is a
  * bounded [[K]]-counter MG map updated by the shared
  * `HeavyHitters.mgUpdate` kernel — state is Shards·K counters TOTAL,
  * independent of stream length, and shards progress in parallel. The
  * candidate guarantee survives sharding UNCONDITIONALLY on balance
  * because shard totals only shrink the error: a word with true count
  * c·ThreshDen > n has all its occurrences in its own shard, where MG
  * keeps everything above n_shard/(K+1) ≤ n/(K+1) ≤ n/ThreshDen
  * (K+1 ≥ ThreshDen by construction). Mergeable-summaries reasoning:
  * Agarwal et al. 2012.
  *
  * Emissions are SNAPSHOTS (shard, word, lower-bound count, shard
  * total): the serving side keeps each shard's latest snapshot —
  * shard totals grow strictly on every update, so "latest" is
  * max(n_shard) with no tie possible — and classifies candidates
  * against the published MG bounds (true count ∈ [c_lb,
  * c_lb + n_shard/(K+1)]), exactly the contract SketchSpec proves for
  * the batch aggregate.
  */
object HeavyHitterStream {

  /** Disjoint word shards — the parallelism knob. */
  val Shards = 8

  /** Counters per shard. K+1 ≥ ThreshDen (100) makes the candidate
    * guarantee independent of shard balance (see object doc).
    */
  val K = 128

  case class ShardSketch(shard: Int, counts: Map[String, Long], n: Long)

  /** One candidate row of a shard snapshot. */
  case class Candidate(shard: Int, w: String, c_lb: Long, n_shard: Long)

  /** Raw schema of arriving document files (the documents table). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-stream of documents → per-shard MG state → snapshot
    * emissions for every shard a batch touches.
    */
  def apply(s: SparkSession, inDir: String): Dataset[Candidate] = {
    import s.implicits._
    val words = s.readStream.schema(docSchema).parquet(inDir)
      .select(explode(expr("filter(split(text, ' '), w -> w <> '')")).as("w"))
      .select(col("w"),
        pmod(xxhash64(col("w")), lit(Shards)).cast("int").as("shard"))
      .as[(String, Int)]
    words.groupByKey(_._2)
      .flatMapGroupsWithState[ShardSketch, Candidate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (shard, rows, state) =>
          val buf = mutable.HashMap.empty[String, Long]
          var n = 0L
          state.getOption.foreach { st => buf ++= st.counts; n = st.n }
          rows.foreach { case (w, _) =>
            graft.functions.HeavyHitters.mgUpdate(buf, w, K); n += 1
          }
          state.update(ShardSketch(shard, buf.toMap, n))
          val total = n
          buf.iterator.map { case (w, c) => Candidate(shard, w, c, total) }
      }
  }

  /** One AvailableNow maintenance pass landing snapshots in a
    * batch-id-keyed parquet log. foreachBatch is at-least-once, so a
    * blind append would duplicate a replayed batch's snapshot ROWS
    * (max-based serving keeps the right shards but candidates() would
    * serve each row twice — VERDICT r12); instead a replayed batch
    * OVERWRITES its own `batch=<id>` directory with the deterministic
    * recompute (state versions are batch-pinned, so the replay emits
    * the identical snapshot), and a fresh checkpoint over an existing
    * sink is refused (the streaming/Ingest.scala discipline).
    */
  def runOnce(s: SparkSession, inDir: String, outDir: String,
              checkpoint: String): Unit = {
    NearDupStream.guardFreshCheckpoint(outDir, checkpoint)
    val q = apply(s, inDir).toDF().writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        df.write.mode("overwrite").parquet(s"$outDir/batch=$batchId"); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Latest snapshot per shard from the emission log (shard totals
    * grow strictly per emission, so max(n_shard) has no ties).
    */
  def candidates(s: SparkSession, outDir: String): DataFrame = {
    val snap = s.read.parquet(outDir)
      .select("shard", "w", "c_lb", "n_shard")
    val latest = snap.groupBy("shard").agg(max("n_shard").as("n_shard"))
    snap.join(latest, Seq("shard", "n_shard")).select("shard", "w", "c_lb", "n_shard")
  }

  /** Candidate classification against the MG bounds: `certain` — the
    * lower bound alone clears the threshold (true count surely does);
    * `possible` — the upper bound c_lb + n_shard/(K+1) clears it
    * (every TRUE heavy hitter is possible; integers throughout, no
    * division). n_total is the sum of shard totals.
    */
  def heavyHitters(s: SparkSession, outDir: String): DataFrame = {
    import graft.functions.HeavyHitters.ThreshDen
    val cand = candidates(s, outDir)
    val totals = cand.select("shard", "n_shard").distinct()
      .agg(sum("n_shard").as("n_total"))
    val kp1 = lit(K + 1L)
    cand.crossJoin(broadcast(totals))
      .withColumn("certain", col("c_lb") * lit(ThreshDen) > col("n_total"))
      .withColumn("possible",
        (col("c_lb") * kp1 + col("n_shard")) * lit(ThreshDen)
          > col("n_total") * kp1)
      .filter(col("possible"))
      .select("w", "c_lb", "n_shard", "n_total", "certain")
  }
}
