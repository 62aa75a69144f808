package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Dedup
import SparkFixture.{sf, spark}

/** Persistent content-index maintenance (pipeline/Dedup.indexMaintain):
  * the versioned store behind dedup_incremental — v1 corpus index,
  * O(delta) v2 append, write-once both, and the maintained index
  * actually SERVES (everything already ingested verdicts dup).
  */
class DedupIndexSpec extends AnyFunSuite {

  test("v2 = v1 plus exactly the delta's new contents, first-ingested wins") {
    val idx = Dedup.indexMaintain(spark, sf)
    val b = spark.read.parquet(s"$sf/documents.parquet").select(
      col("doc_id"), md5(col("text")).as("chash"),
      (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100L).as("bucket"))
    val old = b.filter(col("bucket") < 80)
      .groupBy("chash").agg(min("doc_id").as("keep_id"))
    val fresh = b.filter(col("bucket") >= 80)
      .groupBy("chash").agg(min("doc_id").as("keep_id"))
      .join(old.select("chash"), Seq("chash"), "left_anti")
    val want = old.withColumn("since_version", lit(1))
      .unionAll(fresh.withColumn("since_version", lit(2)))
    assert(fresh.count() > 0, "fixture must add new contents in the delta")
    assert(idx.exceptAll(want).count() === 0 &&
      want.exceptAll(idx).count() === 0)
    // one row per content — versions never duplicate a chash
    assert(idx.count() === idx.select("chash").distinct().count())
  }

  test("maintenance is idempotent (write-once versions)") {
    val n1 = Dedup.indexMaintain(spark, sf).count()
    assert(Dedup.indexMaintain(spark, sf).count() === n1)
  }

  test("the maintained index serves: everything ingested verdicts dup") {
    val idx = Dedup.indexMaintain(spark, sf)
      .select(col("chash"), col("keep_id").as("corpus_id"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("chash"))
    // every document's content is in the maintained index...
    val joined = docs.join(idx, Seq("chash"), "left")
    assert(joined.filter(col("corpus_id").isNull).count() === 0)
    // ...and every index keep_id is a REAL document carrying that
    // content (provenance integrity)
    val anchored = idx.join(
      docs.withColumnRenamed("doc_id", "corpus_id"),
      Seq("chash", "corpus_id"), "left_semi")
    assert(anchored.count() === idx.count())
  }
}
