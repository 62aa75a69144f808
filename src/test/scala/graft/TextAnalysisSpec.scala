package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TextAnalysis
import SparkFixture.{sf, spark}

class TextAnalysisSpec extends AnyFunSuite {

  test("tokens matches a Scala-side recount on a sample") {
    val docs = Tables.documents(spark, sf).limit(20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val got = TextAnalysis.tokens(spark, sf)
      .filter(col("doc_id").isin(docs.keys.toSeq: _*)).collect()
    got.foreach { r =>
      val text = docs(r.getLong(0))
      assert(r.getLong(1) === text.split(" ").count(_.nonEmpty).toLong)
      assert(r.getLong(2) ===
        "[A-Za-z0-9]+|[^A-Za-z0-9 ]".r.findAllIn(text).size.toLong, "bpe count")
      assert(r.getLong(3) === text.length.toLong)
    }
  }

  test("quality scores are in [0,1] and banded consistently") {
    val df = TextAnalysis.quality(spark, sf)
    assert(df.filter(col("score") < 0 || col("score") > 1).count() === 0)
    assert(df.filter(col("quality_band") === "high" && col("score") < 0.8).count() === 0)
    assert(df.filter(col("quality_band") === "low" && col("score") >= 0.5).count() === 0)
    assert(df.count() === Tables.documents(spark, sf).count())
  }

  test("langId predictions come from the known label set") {
    val df = TextAnalysis.langId(spark, sf)
    val langs = df.select("predicted").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "fr", "de", "es", "und")))
    // the synthetic corpus shares one vocabulary across langs, so accuracy
    // is meaningless here — verify the vote computation instead.
    val texts = Tables.documents(spark, sf).limit(10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val got = df.filter(col("doc_id").isin(texts.keys.toSeq: _*)).collect()
    got.foreach { r =>
      val words = texts(r.getLong(0)).split(" ").filter(_.nonEmpty)
      assert(r.getLong(1) === words.count(Set("the", "a", "of", "and")).toLong, "v_en")
      assert(r.getLong(2) === words.count(Set("le", "la", "et", "les")).toLong, "v_fr")
      assert(r.getBoolean(7) === (r.getString(5) == r.getString(6)), "correct flag")
    }
  }

  test("rolling fingerprint is edit-tolerant where whole-doc hash is not") {
    val fp = TextAnalysis.rollingFingerprint(spark, sf)
    assert(fp.count() === Tables.documents(spark, sf).count())
    assert(fp.filter(col("rolling_fp").isNull).count() === 0)
    // exact duplicates must share the rolling fingerprint too
    val dups = graft.pipeline.Dedup.exact(spark, sf).filter(col("n_copies") > 1)
    if (dups.count() > 0) {
      val sameText = Tables.documents(spark, sf)
        .groupBy("text").agg(collect_list("doc_id").as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(col("ids")).as("doc_id"), md5(col("text")).as("h"))
      val j = sameText.join(fp, "doc_id")
        .groupBy("h").agg(countDistinct("rolling_fp").as("nfp"))
      assert(j.filter(col("nfp") > 1).count() === 0)
    }
  }

  test("fingerprint clusters cover all docs; whitespace variants collapse") {
    val df = TextAnalysis.fingerprint(spark, sf)
    assert(df.agg(sum("n_docs")).collect()(0).getLong(0) ===
      Tables.documents(spark, sf).count())
  }
}
