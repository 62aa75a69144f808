package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bucketed (pre-partitioned) layout — the co-located-join leg of the
  * 100 TB posture.
  *
  * A big⋈big join normally shuffles BOTH sides on the key. Writing the
  * table bucketed by the join key (`bucketBy` + catalog table: Spark
  * persists the hash-distribution in table metadata) makes every
  * downstream groupBy/join on that key exchange-free: the scan itself
  * is the required distribution. That is the Spark-native analogue of
  * the reference keeping its parquet sorted/partitioned so readers
  * never re-organize data (db/writer.go sorting columns) — but for the
  * JOIN axis rather than the time axis.
  *
  * The demo query computes each event's deviation from its user's
  * lifetime average: the per-user aggregate AND the join back both run
  * on the bucketed distribution — zero Exchange nodes in the plan
  * (spec-asserted).
  */
object BucketedStore {

  val DefaultBuckets = 16

  private def tag(dir: String) = dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Bucketed events table name for a dataset dir (catalog-scoped). */
  def tableName(dir: String): String = s"events_bucketed_${tag(dir)}"

  /** Write events bucketed by user_id as a catalog table, once per
    * (session, dataset). Bucket count is the no-shuffle parallelism
    * cap; at 100 TB size it as total-size / target-partition-size.
    */
  def ensureBucketed(s: SparkSession, dir: String,
                     buckets: Int = DefaultBuckets): String = {
    val name = tableName(dir)
    if (!s.catalog.tableExists(name)) {
      // the in-memory catalog forgets tables across JVMs but the
      // warehouse directory survives — clear a stale location first
      val warehouse = s.conf.get("spark.sql.warehouse.dir")
        .replaceFirst("^file:", "")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(warehouse, name.toLowerCase))
      Tables.events(s, dir).drop("ts_ns")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "user_id")
        .sortBy("user_id")
        .format("parquet")
        .saveAsTable(name)
    }
    name
  }

  /** Per-event deviation from the user's lifetime average — aggregate +
    * self-join on the bucketed key, both exchange-free.
    */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val t = s.table(ensureBucketed(s, dir))
    val userAvg = t.groupBy("user_id")
      .agg((sum(col("value").cast("decimal(30,6)")).cast("double") / count(lit(1)))
        .as("user_avg"))
    t.join(userAvg, "user_id")
      .select(col("event_id"), col("user_id"), col("value"), col("user_avg"),
        (col("value") - col("user_avg")).as("dev"))
  }
}
