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

  test("double-delimited replace is canonical greedy BPE on symbol runs") {
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

  test("tokenizer-realistic depth: 300-merge run, vocab trajectory sane") {
    import org.apache.spark.sql.functions._
    // the trainer's own one-pass vocabulary reduction, done inline so
    // the spec can replay the merge table round by round
    val words = graft.Tables.documents(spark, sf)
      .select(explode(expr("filter(split(text, ' '), w -> w <> '')")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val t0 = System.nanoTime()
    val ms = Bpe.driverLoop(words, 300)
    val trainMs = (System.nanoTime() - t0) / 1e6
    info(f"depth-300 driver train: ${ms.length} merges in $trainMs%.0f ms" +
      f" (${trainMs / math.max(ms.length, 1)}%.2f ms/round)")
    assert(ms.length <= 300)
    assert(ms.map(_.m) === (0L until ms.length.toLong))
    // BPE's classic invariant: the winning pair count never increases
    // (old pairs only shrink; a pair born of merge c has count <= c)
    val seq = ms.map(_.cnt)
    assert(seq.zip(seq.tail).forall { case (a, b) => a >= b },
      s"pair-count trajectory not non-increasing: $seq")
    assert(ms.forall(_.cnt > 0L))

    // replay the merge table over the vocabulary: each round adds ONE
    // new symbol, shrinks the weighted corpus token count by >0 and
    // <= cnt (greedy non-overlap can merge fewer than cnt pairs)
    val d = Bpe.D; val dd = Bpe.DD; val eow = Bpe.Eow
    var syms = words.map { case (w, f) =>
      (d + w.split("").mkString(dd) + dd + eow + d, f)
    }
    def tokenCount(ss: Array[(String, Long)]): Long =
      ss.map { case (str, f) => str.split(d).count(_.nonEmpty).toLong * f }.sum
    def vocabSize(ss: Array[(String, Long)]): Int =
      ss.flatMap(_._1.split(d)).filter(_.nonEmpty).distinct.length
    val alpha = vocabSize(syms)
    var prevTokens = tokenCount(syms)
    ms.zipWithIndex.foreach { case (mg, i) =>
      syms = syms.map { case (str, f) =>
        (str.replace(d + mg.x + dd + mg.y + d, d + mg.x + mg.y + d), f)
      }
      val t = tokenCount(syms)
      assert(t < prevTokens && prevTokens - t <= mg.cnt,
        s"round $i: tokens $prevTokens -> $t vs cnt ${mg.cnt}")
      prevTokens = t
      // one fresh symbol per merge; merged-away symbols may retire
      assert(vocabSize(syms) <= alpha + i + 1)
    }
    // if the loop stopped before 300, it stopped for the right reason:
    // every word is a single token (pair exhaustion)
    if (ms.length < 300)
      assert(syms.forall { case (str, _) => str.split(d).count(_.nonEmpty) == 1 },
        "early stop without pair exhaustion")
    // the shipped 12-round model is the PREFIX of the deep run — depth
    // is a training knob, not a semantics change
    assert(Bpe.learnedMerges(spark, sf).toList === ms.take(Bpe.Merges).toList)
  }
}
