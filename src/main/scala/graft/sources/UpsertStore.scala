package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Merge-on-read upsert: a base table plus a newer-version delta
  * resolve to latest-version rows at read time — the LSM/Delta-style
  * mutation path a parquet store needs once data stops being
  * append-only (the reference merge-compacts immutable parts,
  * db/writer.go Compact; upsert is the value-level generalization).
  *
  * Shape: union(base@v1, delta@v2) → one partial-aggregable groupBy on
  * the key picking arg-max-by-version. Single shuffle on event_id; no
  * window, no join. At 100 TB the base is the sorted store and the
  * delta is an ingest table, both range-partitioned on the key, and
  * this same groupBy IS the compaction job — run it incrementally per
  * key range and rewrite only the partitions a delta touches.
  *
  * The delta here is derived deterministically from the base (every
  * user_id % 7 == 0 row gets value+1000 at version 2) so the oracle
  * can rebuild the identical merge input.
  */
object UpsertStore {

  private def withUs(d: DataFrame): DataFrame =
    d.withColumn("us", unix_micros(col("ts")))

  /** Base at version 1. */
  def base(s: SparkSession, dir: String): DataFrame =
    withUs(Tables.events(s, dir))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("us"), col("value"), lit(1L).as("version"))

  /** The deterministic v2 delta: a stand-in for an ingest batch of
    * corrections (same keys, new values).
    */
  def delta(s: SparkSession, dir: String): DataFrame =
    base(s, dir)
      .filter(col("user_id") % 7 === 0)
      .withColumn("value", col("value") + 1000.0)
      .withColumn("version", lit(2L))

  /** Latest-version resolution. Version is unique per (key, version)
    * here (one v1, at most one v2), so arg-max never ties; key columns
    * the delta never mutates (user_id/event_type/us) ride along via
    * min — they are version-invariant by construction.
    */
  def upsertLatest(s: SparkSession, dir: String): DataFrame =
    base(s, dir).unionByName(delta(s, dir))
      .groupBy("event_id")
      .agg(
        min("user_id").as("user_id"),
        min("event_type").as("event_type"),
        min("us").as("us"),
        max_by(col("value"), col("version")).as("value"),
        max("version").as("version"))

  /** The deterministic v3 tombstone batch: deletes for every
    * user_id % 13 == 0 key. Keys divisible by both 7 and 13 see
    * update-then-delete — the multi-delta chain the resolution must
    * get right.
    */
  def tombstones(s: SparkSession, dir: String): DataFrame =
    base(s, dir)
      .filter(col("user_id") % 13 === 0)
      .withColumn("version", lit(3L))
      .withColumn("deleted", lit(true))

  /** Full merge semantics — insert/update/DELETE: latest version wins
    * and a winning tombstone drops the key. Same single
    * partial-aggregable groupBy (deleted rides the same arg-max);
    * at 100 TB tombstones stay this cheap precisely because they are
    * data, not file rewrites — the physical reclaim happens whenever
    * compaction next rewrites the key range.
    */
  def upsertTombstone(s: SparkSession, dir: String): DataFrame =
    base(s, dir).withColumn("deleted", lit(false))
      .unionByName(delta(s, dir).withColumn("deleted", lit(false)))
      .unionByName(tombstones(s, dir))
      .groupBy("event_id")
      .agg(
        min("user_id").as("user_id"),
        min("event_type").as("event_type"),
        min("us").as("us"),
        max_by(col("value"), col("version")).as("value"),
        max_by(col("deleted"), col("version")).as("deleted"),
        max("version").as("version"))
      .filter(!col("deleted"))
      .drop("deleted")

  /** Change-data-feed over the versioned store (Delta CDF / Debezium
    * shape): every key's full mutation history as typed change rows —
    * what an incremental consumer (a downstream index, a cache, a
    * training-data snapshot differ) tails instead of re-reading
    * snapshots. change_type is derived from per-key version order:
    * first version = insert, later tombstone = delete, later value
    * row = update.
    *
    * Scale shape: the one window partitions by event_id — key
    * cardinality ≫ cores and a key's chain is AT MOST the number of
    * ingest batches (3 here), so per-reducer state is chain-length,
    * never table-sized. No joins; the union is scan-aligned.
    */
  def changelog(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(col("version").asc)
    base(s, dir).withColumn("deleted", lit(false))
      .unionByName(delta(s, dir).withColumn("deleted", lit(false)))
      .unionByName(tombstones(s, dir))
      .withColumn("prev_version", lag(col("version"), 1).over(w))
      .select(col("event_id"), col("version"), col("value"),
        when(col("prev_version").isNull, lit("insert"))
          .when(col("deleted"), lit("delete"))
          .otherwise(lit("update")).as("change_type"))
  }

  /** Time-travel read: the store as of `version` — resolution over
    * only the batches with version ≤ asOf (Delta/Iceberg snapshot
    * semantics; every historical snapshot stays reproducible because
    * batches are immutable). asOf = 1 is the base, 2 applies the
    * update batch, 3 also applies the tombstone batch. Same single
    * partial-aggregable groupBy as the latest-version reads — time
    * travel costs a filter, not a different plan.
    */
  def snapshotAt(s: SparkSession, dir: String, asOf: Long): DataFrame =
    base(s, dir).withColumn("deleted", lit(false))
      .unionByName(delta(s, dir).withColumn("deleted", lit(false)))
      .unionByName(tombstones(s, dir))
      .filter(col("version") <= asOf)
      .groupBy("event_id")
      .agg(
        min("user_id").as("user_id"),
        min("event_type").as("event_type"),
        min("us").as("us"),
        max_by(col("value"), col("version")).as("value"),
        max_by(col("deleted"), col("version")).as("deleted"),
        max("version").as("version"))
      .filter(!col("deleted"))
      .drop("deleted")
}
