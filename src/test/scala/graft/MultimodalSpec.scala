package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Multimodal
import SparkFixture.{sf, spark}

class MultimodalSpec extends AnyFunSuite {

  test("decode emits one typed metadata row per document") {
    val df = Multimodal.decode(spark, sf)
    assert(df.count() === Tables.documents(spark, sf).count())
    assert(df.schema.fieldNames.toSeq ===
      Seq("doc_id", "n_bytes", "width", "height", "frames", "phash"))
  }

  test("decode is deterministic and byte-derived") {
    val a = Multimodal.decode(spark, sf).collect().sortBy(_.getLong(0))
    val b = Multimodal.decode(spark, sf).collect().sortBy(_.getLong(0))
    assert(a.sameElements(b))
    // n_bytes must equal utf-8 length of the source text
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    a.take(20).foreach { r =>
      assert(r.getLong(1) === texts(r.getLong(0)).getBytes("UTF-8").length.toLong)
    }
  }

  test("decode stays distributed (no driver-side collect in the plan)") {
    val df = Multimodal.decode(spark, sf)
    // SerializeFromObject/MapPartitions = per-partition batched decode
    assert(df.queryExecution.executedPlan.toString.contains("MapPartitions"))
  }
}
