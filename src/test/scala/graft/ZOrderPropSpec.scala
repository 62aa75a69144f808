package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions.col
import graft.sources.ZOrderStore

/** Property tests for the Morton machinery: the interleave must be a
  * BIJECTION on the 16-bit grid pair (a collision would merge distant
  * (user, time) cells into one z range and silently weaken pruning),
  * and gridCoord must stay in [0, 65535] and be monotone for ANY
  * bounds — including the giant-span regime where the old
  * multiply-first formula overflowed Long.
  */
object ZOrderPropSpec extends Properties("ZOrder") {

  import SparkFixture.spark
  import spark.implicits._

  private def deinterleave(z: Long): (Long, Long) = {
    var a = 0L; var b = 0L
    (0 until ZOrderStore.Bits).foreach { i =>
      a |= ((z >> (2 * i)) & 1L) << i
      b |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (a, b)
  }

  private val genCoord: Gen[Long] = Gen.oneOf(
    Gen.choose(0L, 65535L),
    Gen.oneOf(0L, 1L, 65534L, 65535L))

  property("interleave is bijective on the grid (batch-checked in Spark)") =
    Prop.forAll(Gen.listOfN(50, Gen.zip(genCoord, genCoord))) { pairs =>
      val got = pairs.toDF("a", "b")
        .select(col("a"), col("b"),
          ZOrderStore.interleave(col("a"), col("b")).as("z"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      got.forall { case (a, b, z) => deinterleave(z) == (a, b) }
    }

  private val genBounds: Gen[(Long, Long)] = for {
    lo <- Gen.oneOf(Gen.choose(-(1L << 62), 1L << 62), Gen.const(0L))
    span <- Gen.oneOf(Gen.choose(0L, 100L), Gen.choose(0L, 1L << 20),
      Gen.choose(0L, 1L << 61)) // far past the old overflow point
  } yield (lo, if (lo > Long.MaxValue - span) Long.MaxValue else lo + span)

  property("gridCoord lands in [0, 65535] and is monotone for any bounds") =
    Prop.forAll(genBounds) { case (lo, hi) =>
      val vs = Seq(lo, lo + (hi - lo) / 2, hi).distinct // overflow-safe midpoint
      val got = vs.toDF("v")
        .select(ZOrderStore.gridCoord("v", lo, hi).as("g"))
        .collect().map(_.getLong(0)).toSeq
      got.forall(g => g >= 0L && g <= 65535L) && got == got.sorted
    }
}
