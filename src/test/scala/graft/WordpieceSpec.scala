package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Bpe, Wordpiece}

/** WordPiece training: the likelihood-score argmax (quantized-rational
  * rank key), its divergence from BPE's raw-count argmax, and
  * driver/distributed path equality on the live corpus.
  */
class WordpieceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  test("likelihood score picks frequent-together over frequent-apart") {
    // pair counts: (a,x)=10 tops the table — BPE merges (a,x) first.
    // unigrams: a=15, x=10 vs c=4, d=4, so score(a,x) = 1e19/150 ~
    // 6.7e16 < score(c,d) = 4e18/16 = 2.5e17 — WordPiece merges the
    // four-count pair whose symbols occur NOWHERE else.
    val corpus = Array(("ab", 5L), ("cd", 4L), ("ax", 10L), ("by", 10L))
    val bpe = Bpe.driverLoop(corpus, 1)
    assert((bpe.head.x, bpe.head.y) === ("a", "x"))
    val wp = Wordpiece.driverLoop(corpus, 1)
    assert((wp.head.x, wp.head.y) === ("c", "d"))
    assert(wp.head.cnt === 4L)
    assert(wp.head.score === 4L * 1000000000000000000L / 16L)
  }

  test("rank-key quantization and tie-break are deterministic") {
    // two pairs with the same exact score: (a,b) and (c,d) both
    // appear once with unit unigrams -> score 1e18 each; the
    // lexicographic tie-break must pick (a,b)
    val wp = Wordpiece.driverLoop(Array(("ab", 1L), ("cd", 1L)), 1)
    assert((wp.head.x, wp.head.y) === ("a", "b"))
  }

  test("driver loop and distributed loop learn identical models") {
    val dist = Wordpiece.trainLoop(spark, sf, 5)
    val drv = Wordpiece.learnedMerges(spark, sf, 5)
    assert(dist === drv)
    assert(dist.map(_.m) === (0L until dist.length.toLong))
  }

  test("serving: merges only shrink token counts, never below words") {
    val toks = Wordpiece.tokenCounts(spark, sf).collect()
    assert(toks.nonEmpty)
    toks.foreach { r =>
      val (words, wp) = (r.getLong(1), r.getLong(2))
      assert(wp >= words, s"doc ${r.getLong(0)}: $wp < $words")
    }
  }
}
