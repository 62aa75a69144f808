package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TextAnalysis

/** Winnowing fingerprints: structural invariants on the real corpus +
  * the MOSS detection guarantee on a crafted shared-run fixture.
  */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  test("winnow emits bounded, deterministic per-doc fingerprints") {
    val rows = TextAnalysis.winnow(spark, sf).collect()
    assert(rows.length === spark.read.parquet(s"$sf/documents.parquet").count())
    rows.foreach { r =>
      val (grams, fps) = (r.getLong(1), r.getLong(2))
      assert(fps >= 1L && fps <= math.max(grams - TextAnalysis.WinnowW + 1, 1),
        s"doc ${r.getLong(0)}: $fps fps from $grams grams")
    }
    // determinism: a second evaluation produces identical digests
    val again = TextAnalysis.winnow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    rows.foreach(r => assert(again(r.getLong(0)) === r.getString(3)))
  }

  test("documents sharing a w+2-word run share a fingerprint (MOSS guarantee)") {
    val dir = "/root/repo/target/tmp/winnow_fixture"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    import spark.implicits._
    // a 6-word shared run (w + 2 = 6 at w = 4, 3-grams) embedded in
    // otherwise-disjoint documents
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (0L, s"one two three $shared four five six seven", "en", "a", 1L),
      (1L, s"red blue green $shared yellow purple orange pink", "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$dir/documents.parquet")
    val fp = TextAnalysis.winnowPairs(spark, dir).collect()
    assert(fp.exists(r => r.getLong(0) === 0L && r.getLong(1) === 1L &&
      r.getLong(2) >= 1L),
      s"no shared fingerprint: ${fp.mkString(",")}")
  }
}
