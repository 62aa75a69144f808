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

  /** Append to an sf dir to make [[embeddings]] serve the CLUSTERED
    * derived corpus instead of the raw near-orthogonal table.
    */
  val ClusteredTag = "#clustered"

  // Clustered-corpus formula constants — interpolated into BOTH the
  // Spark expression below and the DuckDB oracle CTE (Pipelines), so a
  // knob change cannot desynchronize the two engines.
  val ClCentMulT = 71   // centroid: ((label·T + (j−1)·J) mod M − O) / D
  val ClCentMulJ = 29
  val ClCentMod  = 13
  val ClCentOff  = 6
  val ClCentDen  = 8    // centroid components ∈ [−6/8, 6/8]
  val ClNoiseMulI = 7919 // noise: ((vec_id·I + (j−1)·J) mod M − O) / D
  val ClNoiseMulJ = 104729
  val ClNoiseMod  = 4097
  val ClNoiseOff  = 2048
  val ClNoiseDen  = 4096 // noise components ∈ (−1/2, 1/2]

  /** Per-element formula of the clustered corpus, as a SQL fragment both
    * engines evaluate EXACTLY: every term is an integer over a power-of-
    * two denominator (common denominator 4096, |numerator| ≤ 4096), so
    * the double arithmetic is exact and the float narrowing lossless —
    * no cross-engine rounding surface at all. `label` keys the topic
    * centroid (a mixture around 10 topic directions), `(vec_id, j)` keys
    * the within-topic noise at 1/3 the centroid amplitude: cosine mass
    * concentrates on topic-mates, which is what makes recall@k a real
    * retrieval-quality signal (the raw table is near-orthogonal — ANN
    * recall over it is unmeasurable noise).
    */
  def clusteredComponentSql(j: String): String =
    s"CAST(CAST((label * $ClCentMulT + ($j - 1) * $ClCentMulJ) % $ClCentMod - $ClCentOff AS DOUBLE) / $ClCentDen.0 + " +
      s"CAST((vec_id * $ClNoiseMulI + ($j - 1) * $ClNoiseMulJ) % $ClNoiseMod - $ClNoiseOff AS DOUBLE) / $ClNoiseDen.0 AS FLOAT)"

  def embeddings(s: SparkSession, d: String): DataFrame =
    if (d.endsWith(ClusteredTag)) {
      val raw = t(s, d.stripSuffix(ClusteredTag), "embeddings")
      raw.select(
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.expr(
          s"transform(sequence(1, 64), j -> ${clusteredComponentSql("j")})")
          .as("embedding"),
        org.apache.spark.sql.functions.col("label"))
    } else t(s, d, "embeddings")
}
