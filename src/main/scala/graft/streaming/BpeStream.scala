package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** ONLINE tokenizer serving: documents stream in and are tokenized
  * with the BPE model learned ONCE from a reference corpus — the
  * train-once-tokenize-forever lifecycle a production tokenizer has
  * (the model is versioned and frozen; the corpus it tokenizes never
  * stops growing).
  *
  * Why this streams exactly: [[graft.pipeline.Bpe.learnedMerges]] is
  * memoized per corpus (the write-once model store), and applying the
  * merges is a STATELESS projection — every merge is a replace
  * literal folded into the plan, the only aggregation is doc-keyed
  * within the arriving document's own rows. Zero cross-batch state,
  * so each micro-batch is the batch operator's own plan over its
  * slice, and output ≡ batch `bpe_tokens` doc-for-doc (spec-proven).
  * At scale the model rides the closure as ≤ merges·2 short strings —
  * bytes, not an index.
  */
object BpeStream {

  /** One AvailableNow pass: documents under `inDir` tokenize with the
    * model trained on `refDir`; per-doc (n_words, n_bpe_tokens) rows
    * append to `outDir` (exactly-once via the checkpoint).
    */
  def runOnce(s: SparkSession, inDir: String, outDir: String,
              checkpoint: String, refDir: String,
              merges: Int = graft.pipeline.Bpe.Merges): Unit = {
    NearDupStream.guardFreshCheckpoint(outDir, checkpoint)
    val model = graft.pipeline.Bpe.learnedMerges(s, refDir, merges)
    val q = s.readStream.schema(CurationStream.docSchema).parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch-id-keyed overwrite (round 12, the Ingest discipline):
        // a replayed batch rewrites its own part, never double-appends
        graft.pipeline.Bpe.tokenCountsOf(batch, model)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
