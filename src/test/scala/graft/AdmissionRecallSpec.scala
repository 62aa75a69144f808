package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Similarity}
import SparkFixture.{sf, spark}

/** The admission-gate recall record (Dedup.admissionRecall) and the
  * multi-probe knob (Similarity.planeProbeBuckets): completeness where
  * it is a theorem, monotonicity where it is a knob — the ann_recall
  * posture applied to the online gates (VERDICT r12 #6).
  */
class AdmissionRecallSpec extends AnyFunSuite {

  private lazy val rec = Dedup.admissionRecall(spark, sf).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)))

  test("the simhash pigeonhole generator is complete: recall identically 1") {
    val sim = rec.filter(_._1 == "simhash_block")
    assert(sim.nonEmpty, "fixture must have true near-hash pairs")
    assert(sim.forall(r => r._3 == r._4 && r._5 == 1.0),
      "every true hamming<=2 pair must be caught by the block join")
  }

  test("every leg is sound: the probe never claims an untrue pair") {
    assert(rec.forall(r => r._4 <= r._3), "n_hits must never exceed n_truth")
    assert(rec.forall(r => r._3 > 0), "the record keys on ids WITH truth")
  }

  test("embedding recall is monotone in probe width, per arrival and overall") {
    def byId(m: String) =
      rec.filter(_._1 == m).map(r => r._2 -> r._5).toMap
    val (p1, p2, p4) = (byId("emb_probe1"), byId("emb_probe2"), byId("emb_probe4"))
    assert(p1.keySet === p2.keySet && p2.keySet === p4.keySet,
      "every leg measures the same arrivals")
    p1.keySet.foreach { id =>
      assert(p1(id) <= p2(id) && p2(id) <= p4(id),
        s"arrival $id: recall must be monotone in nprobe")
    }
    def avg(m: Map[Long, Double]) = m.values.sum / m.size
    assert(avg(p1) < avg(p4),
      "widening the probe set must strictly help somewhere on the fixture")
  }

  test("the served default (hamming gate) is measured-adequate on the raw corpus") {
    // VERDICT r14 #1: the plane-LSH probe measured 0.045/0.082/0.142
    // recall at nprobe 1/2/4 on the raw corpus — not an adequate
    // default for an online duplicate gate. The served default is now
    // the hamming-sketch radius gate; its leg on the SAME record must
    // clear the adequacy bar and dominate every plane leg.
    def avg(m: String): Double = {
      val leg = rec.filter(_._1 == m)
      assert(leg.nonEmpty, s"leg $m must be on the record")
      leg.map(_._5).sum / leg.size
    }
    val ham = avg("emb_hamming")
    assert(ham >= 0.8, s"served-default recall $ham must be >= 0.8")
    Seq("emb_probe1", "emb_probe2", "emb_probe4").foreach { m =>
      assert(ham >= avg(m), s"hamming gate must dominate $m (${avg(m)})")
    }
    // per-arrival dominance is NOT a theorem (the hamming ball and a
    // probe-4 bucket set catch different pair geometries), so the
    // per-id assertion is only that every leg measures the SAME
    // arrivals — the adequacy claims above are the leg averages
    val byId = rec.filter(_._1 == "emb_hamming").map(r => r._2 -> r._5).toMap
    val p4 = rec.filter(_._1 == "emb_probe4").map(r => r._2 -> r._5).toMap
    assert(byId.keySet === p4.keySet, "legs measure the same arrivals")
  }

  test("the clustered record measures the realistic regime") {
    val cl = Dedup.admissionRecallClustered(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(cl.nonEmpty, "clustered corpus must have true pairs")
    val methods = cl.map(_._1).toSet
    assert(methods === Set("emb_probe1", "emb_probe2", "emb_probe4",
      "emb_hamming", "emb_ivf_hamming"), s"legs: $methods")
    // soundness on this record too
    assert(cl.forall(r => r._4 <= r._3 && r._3 > 0))
    def avg(m: String): Double = {
      val leg = cl.filter(_._1 == m); leg.map(_._5).sum / leg.size
    }
    // monotone in probe width, and the served default stays adequate
    assert(avg("emb_probe1") <= avg("emb_probe2") + 1e-12)
    assert(avg("emb_probe2") <= avg("emb_probe4") + 1e-12)
    assert(avg("emb_hamming") >= 0.8,
      s"served default on the clustered corpus: ${avg("emb_hamming")}")
  }

  test("IVF-cell-pruned gate (round 16): served floor, >=4x candidate reduction, picker selection") {
    val dirC = sf + Tables.ClusteredTag
    // 1. the leg's measured recall at its operating point clears the
    //    served floor on the clustered record
    val cl = Dedup.admissionRecallClustered(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(4)))
    val ivf = cl.filter(_._1 == "emb_ivf_hamming").map(_._2)
    assert(ivf.nonEmpty, "clustered record must measure the ivf leg")
    val avgIvf = ivf.sum / ivf.size
    assert(avgIvf >= 0.8, s"ivf-gate recall $avgIvf under the 0.8 floor")
    // ... and the raw record carries the leg as an EMPTY canary (the
    // semantic truth set is empty on the near-orthogonal corpus)
    assert(!rec.exists(_._1 == "emb_ivf_hamming"),
      "raw record's semantic truth set must be empty")
    // 2. candidate reduction >= 4x vs the flat radius scan, on the
    //    served split — the sublinearity claim as data
    val emb = Tables.embeddings(spark, dirC)
      .select(col("vec_id"), col("embedding"))
      .withColumn("split", Dedup.splitBucket(col("vec_id")))
    val idx = Dedup.embAdmissionIndex(
      emb.filter(col("split") < 80).select("vec_id", "embedding"))
    val delta = emb.filter(col("split") >= 80).select("vec_id", "embedding")
    val cents = Similarity.trainedCentroids(spark, dirC, Dedup.AdmissionCells)
    val idxC = idx.withColumn("icell",
      Similarity.cellColOf(col("iemb"), cents))
    val probes = delta.withColumn("icell", explode(
      Similarity.probeCellsColOf(col("embedding"), cents, Dedup.AdmissionNprobe)))
    val cand = probes.join(idxC, Seq("icell")).count()
    val flat = delta.count() * idx.count()
    assert(cand > 0 && flat > 0)
    assert(flat.toDouble / cand >= 4.0,
      s"cell pruning must cut candidates >= 4x: $cand of $flat pairs " +
        f"(${flat.toDouble / cand}%.1fx)")
    // 3. the PICKER serves this gate at the semantic threshold (a
    //    cell hash-join plan, no nested-loop scan) and keeps the flat
    //    radius scan below it (the completeness fallback)
    val picked = Dedup.embAdmission(spark, dirC,
      threshold = Dedup.SemThreshold)
    val pickedPlan = SparkFixture.planOf(picked)
    assert(!pickedPlan.contains("BroadcastNestedLoopJoin"),
      "semantic-threshold serve must be the cell-pruned hash join:\n" +
        pickedPlan)
    val flatPlan = SparkFixture.planOf(Dedup.embAdmission(spark, sf))
    assert(flatPlan.contains("BroadcastNestedLoopJoin"),
      "loose-threshold serve must stay the radius-complete flat scan")
  }

  test("probe sets nest: own bucket first, distinct, widening only adds") {
    val emb = Tables.embeddings(spark, sf).limit(50)
    val probes = emb.select(col("vec_id"),
      Similarity.planeBucket(col("embedding")).as("own"),
      Similarity.planeProbeBuckets(col("embedding"), nprobe = 1).as("b1"),
      Similarity.planeProbeBuckets(col("embedding"), nprobe = 2).as("b2"),
      Similarity.planeProbeBuckets(col("embedding"), nprobe = 4).as("b4"))
      .collect()
    probes.foreach { r =>
      val own = r.getInt(1)
      val (b1, b2, b4) = (r.getSeq[Int](2), r.getSeq[Int](3), r.getSeq[Int](4))
      assert(b1 === Seq(own), "nprobe=1 is exactly the own bucket")
      assert(b2.head == own && b4.head == own, "own bucket probes first")
      assert(b2.toSet.subsetOf(b4.toSet), "probe sets nest")
      assert(b4.distinct.length == b4.length, "no duplicate probes")
      // every extra probe is one sign flip away from the own bucket
      b4.tail.foreach(b =>
        assert(java.lang.Integer.bitCount(b ^ own) == 1))
    }
  }

  test("probe-2 verdicts only improve on probe-1: dups stay dups, cosine never drops") {
    val v1 = Dedup.embAdmissionPlanes(spark, sf)
      .select(col("vec_id"), col("verdict").as("v1"), col("cosine").as("c1"))
    val v2 = Dedup.embAdmissionPlanes(spark, sf, nprobe = 2)
      .select(col("vec_id"), col("verdict").as("v2"), col("cosine").as("c2"))
    val j = v1.join(v2, Seq("vec_id")).collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      // join column order: (vec_id, v1, c1, v2, c2)
      if (r.getString(1) == "dup_of_corpus") {
        assert(r.getString(3) == "dup_of_corpus",
          "a probe-1 dup must stay a dup under a wider probe")
        assert(r.getDouble(4) >= r.getDouble(2) - 1e-12,
          "the wider probe's best cosine can only improve")
      }
    }
    val n1 = j.count(_.getString(1) == "dup_of_corpus")
    val n2 = j.count(_.getString(3) == "dup_of_corpus")
    assert(n2 >= n1, "probe-2 verdicts a superset of arrivals as dups")
  }
}
