package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Bpe

/** BPE merge training: canonical-greedy semantics of the
  * prefix-delimited replace encoding, driver/distributed path equality,
  * and the learned model's consistency with the tokenized corpus.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  test("prefix-delimited replace is canonical greedy BPE on symbol runs") {
    // word 'aaaa': round 0 pairs (a,a)×3 + (a,<eow>) → merge (a,a)
    // must produce [aa, aa, <eow>] (left-to-right NON-overlapping,
    // both pairs merged in one pass), then round 1 ties (aa,aa) with
    // (aa,<eow>) and the lexicographic tie-break picks (aa,<eow>)
    // (<eow> =  sorts below 'a')
    val merges = Bpe.driverLoop(Array(("aaaa", 1L)), 2)
    assert(merges.map(m => (m.m, m.x, m.y, m.cnt)) ===
      Seq((0L, "a", "a", 3L), (1L, "aa", Bpe.Eow, 1L)))
    // 'aaa' must merge to [aa, a], not swallow the third symbol
    val m3 = Bpe.driverLoop(Array(("aaa", 1L)), 1)
    assert(m3.head.cnt === 2L) // pairs (a,a)×2
  }

  test("frequency weighting and tie-breaks are deterministic") {
    // 'ab'×3 outweighs 'cd'×2; round 1 pairs: (ab,<eow>)×3 beats
    // (c,d)×2 and (d,<eow>)×2
    val merges = Bpe.driverLoop(Array(("ab", 3L), ("cd", 2L)), 2)
    assert(merges(0).x === "a" && merges(0).y === "b" && merges(0).cnt === 3L)
    assert(merges(1) === Bpe.Merge(1L, "ab", Bpe.Eow, 3L))
  }

  test("driver loop and distributed loop learn identical merges") {
    val dist = Bpe.trainLoop(spark, sf, 6)
    val drv = Bpe.learnedMerges(spark, sf, 6)
    assert(dist === drv)
  }

  test("learned merges reduce the corpus token count consistently") {
    val toks = Bpe.tokenCounts(spark, sf).collect()
    assert(toks.nonEmpty)
    // BPE can only merge: per doc, token count is at least the word
    // count (every word keeps >= 1 symbol) and at most chars + words
    toks.foreach { r =>
      val (words, bpe) = (r.getLong(1), r.getLong(2))
      assert(bpe >= words, s"doc ${r.getLong(0)}: $bpe < $words")
    }
    // the merge table is monotone in round index and counts positive
    val ms = Bpe.learnedMerges(spark, sf)
    assert(ms.map(_.m) === (0L until Bpe.Merges.toLong))
    assert(ms.forall(_.cnt > 0L))
    // vocab head: top tokens cover the corpus head, counts descending
    val vt = Bpe.vocabTop(spark, sf).collect()
    assert(vt.length <= Bpe.VocabTopK && vt.length >= 20)
    val cnts = vt.map(_.getLong(1))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }
}
