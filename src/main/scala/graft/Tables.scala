package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated star schema at a given sf dir.
  *
  * Mirrors the reference's notion of "a parquet file is the database"
  * (reference: db/file_reader.go, pqtest/file.go) — Spark's vectorized
  * parquet reader replaces the hand-rolled section loader
  * (reference: db/section.go, storage/chunked_reader.go).
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader refuses. Read it as raw long ns (legacy conf) and truncate to
    * µs — the same truncation DuckDB applies on read, so both engines see
    * identical microsecond timestamps.
    *
    * The raw nanos survive as `ts_ns`: predicates on the rebuilt `ts`
    * cannot reach the parquet scan (the cast blocks pushdown), but
    * ns-converted bounds on `ts_ns` push down and prune row groups — the
    * reference's mint/maxt stats-selector behavior
    * (reference: dataset/predicate.go, prometheus/querier.go:71-74).
    */
  private def eventsNorm(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // `ts div 1000`, NOT `ts / 1000`: long/int is double division in
    // Spark, and doubles lose µs precision at 1.7e18 ns.
    t(spark, dir, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame   = eventsNorm(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
