package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Bpe, Unigram}
import SparkFixture.{sf, spark}

/** Contract for the unigram-LM tokenizer (the declared rows-only
  * entries unigram_train / unigram_tokens): exact-integer Viterbi-EM
  * determinism, segmentation optimality and coverage, the likelihood
  * trajectory, and driver ≡ distributed path equality.
  */
class UnigramSpec extends AnyFunSuite {

  private lazy val words: Array[(String, Long)] =
    Tables.documents(spark, sf)
      .select(explode(expr("filter(split(text, ' '), w -> w <> '')")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

  private lazy val model: Map[String, Long] =
    Unigram.learnedPieces(spark, sf).toMap

  test("segmentation covers and reassembles every corpus word") {
    val t = BigInt(model.values.sum)
    words.foreach { case (w, _) =>
      val path = Unigram.viterbi(w, model, t)
      assert(path.nonEmpty, s"'$w' unsegmentable")
      assert(path.mkString("") === w, s"'$w' reassembly")
      assert(path.forall(p => model.contains(p) || p.length == 1))
    }
  }

  test("the model learned multi-char pieces and they pay off vs char tokens") {
    val multi = model.keys.filter(_.length > 1)
    assert(multi.size >= 10, s"only ${multi.size} multi-char pieces")
    assert(multi.size <= Unigram.VocabTarget)
    val t = BigInt(model.values.sum)
    val charToks = words.map { case (w, f) => w.length.toLong * f }.sum
    val uniToks = words.map { case (w, f) =>
      Unigram.viterbi(w, model, t).length.toLong * f }.sum
    assert(uniToks < charToks,
      s"unigram $uniToks must beat char segmentation $charToks")
    assert(uniToks >= words.map(_._2).sum, "at least one token per word")
  }

  test("Viterbi is exactly optimal: beats every enumerated segmentation") {
    val t = BigInt(model.values.sum)
    def score(path: Seq[String]): (BigInt, Int) =
      (path.map(p => BigInt(model.getOrElse(p,
        if (p.length == 1) 1L else 0L))).product, path.length)
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(Unigram.MaxPieceLen, w.length)).flatMap { l =>
        val (h, rest) = w.splitAt(l)
        val c = model.getOrElse(h, if (h.length == 1) 1L else 0L)
        if (c > 0L) segs(rest).map(h +: _) else Seq.empty
      }
    val shortWords = words.map(_._1).filter(_.length <= 8).take(80)
    assert(shortWords.nonEmpty)
    shortWords.foreach { w =>
      val bestPath = Unigram.viterbi(w, model, t)
      val (bn, bk) = score(bestPath)
      segs(w).foreach { alt =>
        val (an, ak) = score(alt)
        // best >= alt under the exact cross-multiplied comparison
        val c = (bn * t.pow(ak)).compare(an * t.pow(bk))
        assert(c >= 0, s"'$w': ${alt.mkString("|")} beats ${bestPath.mkString("|")}")
      }
    }
  }

  test("Viterbi-EM best-path likelihood is non-decreasing per round") {
    var prev = Double.NegativeInfinity
    (0 to Unigram.EmRounds).foreach { r =>
      val m = Unigram.trainOn(words, rounds = r).toMap
      val ll = Unigram.pathLogLik(words, m)
      assert(ll >= prev - 1e-9, s"round $r: $ll < $prev")
      prev = ll
    }
  }

  test("driver and distributed EM paths produce the identical model") {
    val drv = Unigram.trainOn(words)
    val dist = Unigram.trainDistributed(spark, sf)
    assert(drv === dist)
  }

  test("train frame is deterministic; logprobs normalize") {
    val a = Unigram.train(spark, sf).collect()
    val b = Unigram.train(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
    // probs sum to 1 (counts / total), logprob is their round-12 ln
    val cnts = a.map(_.getLong(1))
    val t = cnts.sum.toDouble
    a.foreach { r =>
      val expect = BigDecimal(math.log(r.getLong(1) / t))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) === expect)
    }
    // count-descending order
    assert(cnts.sameElements(cnts.sortBy(-_)))
  }

  test("tokenCounts: collapse-first serving matches a driver recount") {
    val got = Unigram.tokenCounts(spark, sf)
    val bpe = Bpe.tokenCounts(spark, sf)
    assert(got.count() === bpe.count(), "same per-doc grid as bpe_tokens")
    // driver recount over 25 docs
    val t = BigInt(model.values.sum)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").limit(25).collect()
    val gotMap = got.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    docs.foreach { r =>
      val ws = r.getString(1).split(" ").filter(_.nonEmpty)
      if (ws.nonEmpty) {
        val toks = ws.map(w => Unigram.viterbi(w, model, t).length.toLong).sum
        assert(gotMap(r.getLong(0)) === ((ws.length.toLong, toks)),
          s"doc ${r.getLong(0)}")
      }
    }
  }

  test("serving plan is collapse-first: one broadcast join, no corpus-sized shuffle of text") {
    val plan = SparkFixture.planOf(Unigram.tokenCounts(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      "word -> n_tok map must broadcast-join the exploded corpus")
  }
}
