package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types._

/** Streaming CDC APPLY — the consumer side of the change-data-feed
  * surface (`q_upsert_changelog` emits the feed; this maintains a
  * serving copy from it): change batches (insert/update/delete rows
  * tagged with a monotone version) stream in, `mapGroupsWithState`
  * keyed by the row key holds the latest-version resolution, and each
  * batch emits the keys it touched with their new resolved state — a
  * downstream index/cache applies exactly those.
  *
  * Semantics are LATEST-VERSION-WINS, identical to the batch
  * `UpsertStore.snapshotAt` groupBy: arrival order within or across
  * batches does not matter (out-of-order ingest is resolved by the
  * version compare, never by wall clock), so replaying the same feed —
  * or restarting mid-feed from the checkpoint — lands on the same
  * state. Tombstones stay IN state (`deleted = true`) exactly like the
  * batch store keeps them as data: a later lower-version straggler
  * must still lose to the delete, so forgetting the key would corrupt
  * the resolution. At 100 TB state is one small record per live key,
  * hash-partitioned by key (cardinality ≫ cores), and the state store
  * is RocksDB-backed executor-local — the same shape as any streaming
  * dedup.
  */
object CdcApply {

  /** On-disk schema of a change batch (what a CDC producer writes). */
  val changeSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("version", LongType),
    StructField("value", DoubleType),
    StructField("deleted", BooleanType)))

  /** Resolved per-key state after applying a change: the serving row. */
  case class Applied(event_id: Long, version: Long, value: Double,
                     deleted: Boolean)

  /** File-stream of change batches from `inDir` → per-key resolved
    * state, emitted for every key a batch touches (update semantics).
    */
  def apply(s: SparkSession, inDir: String): Dataset[Applied] = {
    import s.implicits._
    val changes = s.readStream.schema(changeSchema).parquet(inDir)
      .select(col("event_id"), col("version"), col("value"), col("deleted"))
      .as[(Long, Long, Double, Boolean)]
    changes.groupByKey(_._1)
      .mapGroupsWithState[Applied, Applied](GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          // fold the batch's changes into the held resolution: the
          // highest version wins; ties cannot occur (a producer never
          // reuses a version per key — the changelog contract)
          val candidates = state.getOption.map(a => (a.version, a.value, a.deleted)) ++
            rows.map { case (_, v, x, d) => (v, x, d) }
          val (ver, value, deleted) = candidates.maxBy(_._1)
          val next = Applied(key, ver, value, deleted)
          state.update(next)
          next
      }
  }
}
