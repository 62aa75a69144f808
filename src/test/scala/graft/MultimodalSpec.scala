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

  test("decode is deterministic and reports the real filmstrip geometry") {
    val a = Multimodal.decode(spark, sf).collect().sortBy(_.getLong(0))
    val b = Multimodal.decode(spark, sf).collect().sortBy(_.getLong(0))
    assert(a.sameElements(b))
    // the decoded dimensions must be the GENERATED ones — this is the
    // real-codec proof: ImageIO read the PNG and returned its geometry
    a.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === graft.pipeline.MediaGen.pngPayload(id).length.toLong)
      assert(r.getInt(2) === graft.pipeline.MediaGen.widthOf(id))
      assert(r.getInt(3) === graft.pipeline.MediaGen.heightOf(id))
      assert(r.getInt(4) === graft.pipeline.MediaGen.framesOf(id))
    }
  }

  test("ImageIoDecoder decodes a generated PNG to its exact dimensions") {
    val dec = new graft.pipeline.ImageIoDecoder
    for (id <- Seq(0L, 5L, 16L, 123L, 499L)) {
      val m = dec.meta(graft.pipeline.MediaGen.pngPayload(id))
      assert(m.width === graft.pipeline.MediaGen.widthOf(id))
      assert(m.height === graft.pipeline.MediaGen.heightOf(id))
      assert(m.frames === graft.pipeline.MediaGen.framesOf(id))
      assert(m.phash.length === 16) // 64-bit average hash, hex
    }
    // frame hashes fingerprint DIFFERENT pixel regions per frame
    val bytes = graft.pipeline.MediaGen.pngPayload(11L) // 12 frames
    val hashes = (0 until 12).map(dec.frameHash(bytes, _))
    assert(hashes.distinct.length === 12)
    // and are stable across decoder instances (exact pixels, exact hash)
    val dec2 = new graft.pipeline.ImageIoDecoder
    assert((0 until 12).map(dec2.frameHash(bytes, _)) === hashes)
  }

  test("features are unit-L1 16-dim vectors compatible with Similarity ops") {
    val df = Multimodal.features(spark, sf)
    assert(df.count() === Tables.documents(spark, sf).count())
    val rows = df.limit(20).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.length === 16)
      assert(math.abs(v.map(_.toDouble).sum - 1.0) < 1e-5)
    }
    // the vector column must feed the dot-product kernel directly
    val dot = df.limit(5).select(
      graft.functions.VectorOps.dot(col("features"), col("features")).as("n"))
    assert(dot.collect().forall(_.getDouble(0) > 0))
  }

  test("frame sampling expands one row per sampled frame, no shuffle") {
    val df = Multimodal.sampleFrames(spark, sf, stride = 8)
    val meta = Multimodal.decode(spark, sf)
      .select(col("doc_id"), ceil(col("frames") / 8.0).as("expect"))
    val got = df.groupBy("doc_id").count()
    assert(got.join(meta, "doc_id").filter(col("count") =!= col("expect")).count() === 0)
    assert(!SparkFixture.planOf(df).contains("Exchange"), "frame explode must not shuffle")
  }

  test("decode stays distributed (no driver-side collect in the plan)") {
    val df = Multimodal.decode(spark, sf)
    // SerializeFromObject/MapPartitions = per-partition batched decode
    assert(df.queryExecution.executedPlan.toString.contains("MapPartitions"))
  }

  test("the decoder is pluggable: a custom codec swaps in via the factory") {
    // a "real codec" stand-in: fixed dims, payload-length hash — proves
    // the factory seam carries a different implementation end to end
    val fake: () => graft.pipeline.MediaDecoder = () =>
      new graft.pipeline.MediaDecoder {
        override def meta(bytes: Array[Byte]) =
          graft.pipeline.MediaDecoder.Meta(1920, 1080, 10, s"len:${bytes.length}")
        override def frameHash(bytes: Array[Byte], frame: Int) = s"f$frame"
      }
    val df = Multimodal.decode(spark, sf, fake)
    assert(df.select("width").distinct().collect().map(_.getInt(0)).toSeq === Seq(1920))
    assert(df.filter(col("phash").startsWith("len:")).count() === df.count())
    // frame sampling honors the plugged decoder's frame count (10/8 -> 2)
    val frames = Multimodal.sampleFrames(spark, sf, stride = 8, mkDecoder = fake)
    assert(frames.groupBy("doc_id").count()
      .filter(col("count") =!= 2).count() === 0)
    assert(frames.select("frame_hash").distinct().collect()
      .map(_.getString(0)).toSet === Set("f0", "f8"))
    // and the default (real ImageIO) output shape is unchanged by the
    // pluggability seam: 64-bit average hash as 16 hex chars
    val real = Multimodal.decode(spark, sf)
    assert(real.filter(length(col("phash")) =!= 16).count() === 0)
  }

  test("feature-space ANN: full deterministic ranking over decoded pixels") {
    val df = Multimodal.annByFeatures(spark, sf)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // 5 queries x top-5, every rank present, cosine within bounds
    val perQ = rows.groupBy(_._1)
    assert(perQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    perQ.values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      // luma histograms are non-negative vectors: cosine in [0, 1] + eps
      assert(g.forall(x => x._4 >= 0.0 && x._4 <= 1.0 + 1e-9))
      // ranks follow cosine desc with doc_id tiebreak
      val sorted = g.sortBy(_._3).map(x => (-x._4, x._2))
      assert(sorted.toSeq === sorted.sorted.toSeq)
      // a query never returns itself
      assert(g.forall(x => x._2 != x._1))
    }
    // deterministic: a second evaluation is identical
    val again = Multimodal.annByFeatures(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.sortBy(x => (x._1, x._3)).toSeq ===
      again.sortBy(x => (x._1, x._3)).toSeq)
    // query side broadcasts, like every ANN leg
    assert(SparkFixture.planOf(Multimodal.annByFeatures(spark, sf))
      .contains("Broadcast"))
  }

  test("WavDecoder round-trips the generated PCM stream sample-for-sample") {
    for (id <- Seq(0L, 1L, 2L, 7L, 11L, 123L)) {
      val (rate, samples) = new graft.pipeline.WavDecoder()
        .read(graft.pipeline.MediaGen.wavPayload(id))
      assert(rate === graft.pipeline.MediaGen.rateOf(id))
      assert(samples.length === graft.pipeline.MediaGen.nSamplesOf(id))
      samples.indices.foreach { i =>
        assert(samples(i) === graft.pipeline.MediaGen.sampleOf(id, i),
          s"doc $id sample $i")
      }
    }
  }

  test("audio decode is distributed and deterministic") {
    val a = Multimodal.audioMeta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = Multimodal.audioMeta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a === b)
    assert(a.size === Tables.documents(spark, sf).count())
    val plan = SparkFixture.planOf(Multimodal.audioFeatures(spark, sf))
    assert(!plan.contains("CollectLimit"), plan)
    // duration arithmetic holds row-for-row
    a.foreach { case (id, rate, n, us) =>
      assert(us === n * 1000000L / rate, s"doc $id")
    }
  }
}
