package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.XorChunk

class XorChunkSpec extends AnyFunSuite {

  private def roundtrip(samples: Array[(Long, Double)]): Unit = {
    val bytes = XorChunk.encode(samples)
    val back = XorChunk.decode(bytes)
    assert(back.length === samples.length)
    samples.zip(back).zipWithIndex.foreach { case (((t, v), (t2, v2)), i) =>
      assert(t2 === t, s"timestamp mismatch at $i")
      assert(java.lang.Double.doubleToRawLongBits(v2)
        === java.lang.Double.doubleToRawLongBits(v), s"value bits mismatch at $i")
    }
  }

  test("single chunk round-trips exactly") {
    roundtrip(Array((1704067200000000L, 1.5), (1704067201000000L, 2.5),
      (1704067203000000L, 2.5), (1704067206000000L, -17.25)))
  }

  test("many chunks encoded sequentially on one thread all round-trip") {
    // The regression case: encoder XOR-window state leaking across
    // encode() calls corrupted every chunk after the first per thread.
    val rnd = new scala.util.Random(42)
    var t0 = 1704067200000000L
    (1 to 200).foreach { n =>
      val samples = Array.tabulate(1 + rnd.nextInt(50)) { i =>
        (t0 + i * 1000000L + rnd.nextInt(1000), rnd.nextDouble() * 1000 - 500)
      }
      roundtrip(samples)
      t0 += 3600L * 1000000L
    }
    // the exact ADVICE repro shape: a 4-sample chunk whose XOR window is
    // narrow, then a 2-sample chunk whose first delta fits inside it
    roundtrip(Array((100L, 1.0), (200L, 1.5), (300L, 1.25), (400L, 1.75)))
    roundtrip(Array((100L, 2.0), (200L, 2.000000001)))
  }

  test("empty and single-sample chunks") {
    roundtrip(Array.empty[(Long, Double)])
    roundtrip(Array((1704067200123456L, 3.14159)))
  }

  test("NaN payloads, infinities, signed zero survive bit-exactly") {
    val qnan = java.lang.Double.longBitsToDouble(0x7FF8000000000001L)
    val snan = java.lang.Double.longBitsToDouble(0x7FF0000000000042L)
    roundtrip(Array(
      (1000L, Double.NaN), (2000L, qnan), (3000L, snan),
      (4000L, Double.PositiveInfinity), (5000L, Double.NegativeInfinity),
      (6000L, 0.0), (7000L, -0.0), (8000L, Double.MinPositiveValue)))
  }

  test("constant values hit the zero-XOR branch and round-trip") {
    roundtrip(Array.tabulate(500)(i => (i * 15000L, 42.0)))
  }

  test("delta-of-delta bucket edges round-trip") {
    // craft timestamp sequences whose dod lands on every bucket boundary:
    // bitRange(x, n): -((1<<(n-1))-1) <= x <= 1<<(n-1)
    val edges = Seq(0L, 1L, -1L,
      8191L, 8192L, -8190L, -8191L,          // 14-bit in/edge
      8193L, 65535L, 65536L, -65534L, -65535L, // 17-bit
      65537L, 524287L, 524288L, -524286L, -524287L, // 20-bit
      524289L, 1L << 40, -(1L << 40))         // 64-bit raw
    edges.foreach { dod =>
      // t0, t1 = t0 + d, t2 = t1 + d + dod  (d chosen so all deltas >= 0)
      val d = math.max(1L << 41, -dod + 1)
      val t0 = 1704067200000000L
      roundtrip(Array((t0, 1.0), (t0 + d, 2.0), (t0 + d + d + dod, 3.0)))
    }
  }

  test("XOR window narrowing and widening mid-chunk") {
    // values chosen so the meaningful-bit window first narrows (reuse
    // branch) then widens (new-window branch) within one chunk
    val vals = Seq(1.0, 1.5, 1.25, 1.125, 1e300, -1e-300, 1.0625, 7.25)
    roundtrip(vals.zipWithIndex.map { case (v, i) => (i * 1000L, v) }.toArray)
  }

  test("known-bytes fixture: header + first sample layout") {
    // 2-byte big-endian count, then varint(t0) + raw 64-bit value — the
    // Prometheus bstream layout (tsdb/chunkenc/xor.go).
    val bytes = XorChunk.encode(Array((5L, 1.0)))
    assert(bytes(0) === 0x00.toByte)
    assert(bytes(1) === 0x01.toByte)
    assert(bytes(2) === 0x0A.toByte) // zig-zag varint of 5 = 10
    val vbits = java.nio.ByteBuffer.wrap(bytes, 3, 8).getLong
    assert(vbits === java.lang.Double.doubleToRawLongBits(1.0))
  }

  test("golden bytes: hand-derived multi-sample fixture pins the wire format") {
    // Derived bit-by-bit from the Gorilla §4.1 / Prometheus xor.go layout
    // (no code involved), so it pins encode() against both refactors and
    // spec-misreadings. Coverage: varint first ts, raw first value,
    // uvarint second delta, dod buckets '0' / '10'+14 / '1110'+20, and
    // value branches '0' (same), '10' (window reuse), '11' (new window).
    //
    //   header         00 05                     5 samples
    //   s0 t=1000      D0 0F                     varint zigzag(1000)=2000
    //      v=2.0       40 00 00 00 00 00 00 00   raw IEEE bits
    //   s1 Δ=60        3C                        uvarint
    //      v=3.0       '1''1' 01100 000001 1     xor=1<<51: lead 12, 1 sig bit
    //   s2 dod=0       '0'                       Δ stays 60
    //      v same      '0'
    //   s3 dod=10      '10' 00000000001010       Δ=70
    //      v=2.0       '1''0' 1                  same xor, window reused
    //   s4 dod=99930   '1110' 00011000011001011010   Δ=100000
    //      v=1.5       '1''1' 00001 001100 111111111111   lead 1, 12 sig bits
    //   → packed: D8 0C 80 0A BC 30 CB 58 4C FF F0 (4 pad bits)
    val samples = Array(
      (1000L, 2.0), (1060L, 3.0), (1120L, 3.0), (1190L, 2.0), (101190L, 1.5))
    val expected = Array(
      0x00, 0x05,
      0xD0, 0x0F, 0x40, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
      0x3C, 0xD8, 0x0C,
      0x80, 0x0A, 0xBC, 0x30, 0xCB, 0x58, 0x4C, 0xFF, 0xF0).map(_.toByte)
    assert(XorChunk.encode(samples).toSeq === expected.toSeq,
      "encoder must emit the hand-derived byte sequence exactly")
    assert(XorChunk.decode(expected).toSeq === samples.toSeq,
      "decoder must read the hand-derived byte sequence exactly")
  }

  test("time-ordered requirement rejects backwards first delta") {
    intercept[IllegalArgumentException] {
      XorChunk.encode(Array((2000L, 1.0), (1000L, 2.0)))
    }
  }
}
