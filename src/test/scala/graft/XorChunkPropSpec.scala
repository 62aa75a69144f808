package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.sources.XorChunk

/** Property tests for the XOR chunk codec: ANY time-ordered sample
  * sequence — arbitrary deltas, arbitrary double bit patterns — must
  * round-trip bit-exactly, including many chunks encoded back-to-back
  * on one thread (the round-2 state-leak regression class).
  */
object XorChunkPropSpec extends Properties("XorChunk") {

  private val genValue: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e12, 1e12),
    Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, 42.0),
    Gen.choose(Long.MinValue, Long.MaxValue)
      .map(java.lang.Double.longBitsToDouble)) // any bit pattern, incl. NaN payloads

  /** Deltas biased toward the dod bucket edges. */
  private val genDelta: Gen[Long] = Gen.oneOf(
    Gen.choose(0L, 100L),
    Gen.choose(0L, 10000L),
    Gen.oneOf(0L, 1L, 8191L, 8192L, 8193L, 65535L, 65536L, 65537L,
      524287L, 524288L, 524289L, 1L << 40),
    Gen.choose(0L, 1L << 45))

  private val genChunk: Gen[Array[(Long, Double)]] = for {
    n <- Gen.choose(0, 300)
    t0 <- Gen.choose(0L, 1L << 50)
    deltas <- Gen.listOfN(n, genDelta)
    values <- Gen.listOfN(n, genValue)
  } yield {
    var t = t0
    deltas.zip(values).map { case (d, v) => t += d; (t, v) }.toArray
  }

  private def bitsEqual(a: Array[(Long, Double)], b: Array[(Long, Double)]): Boolean =
    a.length == b.length && a.zip(b).forall { case ((t1, v1), (t2, v2)) =>
      t1 == t2 && java.lang.Double.doubleToRawLongBits(v1) ==
        java.lang.Double.doubleToRawLongBits(v2)
    }

  property("roundtrip is bit-exact for any ordered samples") =
    Prop.forAll(genChunk) { samples =>
      bitsEqual(samples, XorChunk.decode(XorChunk.encode(samples)))
    }

  property("sequential chunks on one thread never interfere") =
    Prop.forAll(Gen.listOfN(5, genChunk)) { chunks =>
      // encode all first (stressing any cross-encode state), then decode
      val encoded = chunks.map(XorChunk.encode)
      chunks.zip(encoded).forall { case (samples, bytes) =>
        bitsEqual(samples, XorChunk.decode(bytes))
      }
    }

  property("header always carries the exact sample count") =
    Prop.forAll(genChunk) { samples =>
      val bytes = XorChunk.encode(samples)
      (((bytes(0) & 0xFF) << 8) | (bytes(1) & 0xFF)) == samples.length
    }
}
