package graft.sources

/** Prometheus XOR chunk codec (the Gorilla time-series compression).
  *
  * The reference's `__chunk_bytes` column holds raw Prometheus TSDB chunk
  * bytes (reference: schema/chunk.go:25-37; cmd/convert/main.go:24-152
  * copies them straight out of a TSDB block), so an engine that wants to
  * read data produced by the reference — or by Prometheus itself — must
  * speak this format. It is fully public: Facebook's Gorilla paper §4.1
  * (VLDB 2015) plus the Prometheus `tsdb/chunkenc/xor.go` bitstream
  * layout:
  *
  *   bytes 0..1  big-endian uint16 sample count
  *   sample 0    timestamp as signed varint, value as raw 64 bits
  *   sample 1    t-delta as uvarint, value XOR-encoded vs. previous
  *   sample n    delta-of-delta bucketed:
  *                 '0'                      dod == 0
  *                 '10'   + 14-bit signed   dod in (-8191,  8192]
  *                 '110'  + 17-bit signed   dod in (-65535, 65536]
  *                 '1110' + 20-bit signed   dod in (-524287, 524288]
  *                 '1111' + 64-bit raw
  *               value XOR-encoded: '0' if identical; '10' + meaningful
  *               bits in the previous leading/trailing window; '11' +
  *               5-bit leading-zero count + 6-bit significant-bit count
  *               (64 encoded as 0) + the significant bits.
  *
  * Timestamps are unit-agnostic int64s (Prometheus uses ms; graft's
  * event data is µs — the bitstream is identical either way). Values are
  * bit-exact through the round trip (raw IEEE-754 bits, XOR is lossless,
  * NaN payloads included).
  */
object XorChunk {

  final val MaxSamples = 0xFFFF // uint16 header, as in Prometheus

  // ---------------------------------------------------------------- write

  /** MSB-first bit writer over a growable buffer (Prometheus bstream). */
  private final class BitWriter {
    private var buf = new Array[Byte](64)
    private var byteLen = 0
    private var bitPos = 0 // bits used in the current (last) byte, 0..7

    private def ensure(): Unit =
      if (byteLen == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)

    def writeBit(b: Boolean): Unit = {
      if (bitPos == 0) { ensure(); byteLen += 1 }
      if (b) buf(byteLen - 1) = (buf(byteLen - 1) | (0x80 >>> bitPos)).toByte
      bitPos = (bitPos + 1) & 7
    }

    /** Write the low `n` bits of `v`, most significant first. */
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L) == 1L); i -= 1 }
    }

    def writeByte(b: Int): Unit = writeBits(b & 0xFFL, 8)

    /** Go binary.PutUvarint: LEB128, 7 bits per byte, little-endian groups. */
    def writeUvarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0L) { writeByte(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      writeByte(v.toInt)
    }

    /** Go binary.PutVarint: zig-zag then uvarint. */
    def writeVarint(v: Long): Unit = writeUvarint((v << 1) ^ (v >> 63))

    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, byteLen)
  }

  /** Encode time-ordered (timestamp, value) samples into chunk bytes. */
  def encode(samples: Array[(Long, Double)]): Array[Byte] = {
    require(samples.length <= MaxSamples, s"chunk overflow: ${samples.length}")
    val w = new BitWriter
    val st = new XorState // per-chunk XOR window, as Prometheus's xorAppender
    w.writeBits(samples.length.toLong, 16) // big-endian uint16 count
    var prevT = 0L; var prevDelta = 0L; var prevV = 0L
    var i = 0
    while (i < samples.length) {
      val (t, value) = samples(i)
      val vbits = java.lang.Double.doubleToRawLongBits(value)
      if (i == 0) {
        w.writeVarint(t)
        w.writeBits(vbits, 64)
      } else if (i == 1) {
        prevDelta = t - prevT
        require(prevDelta >= 0, "samples must be time-ordered")
        w.writeUvarint(prevDelta)
        writeXor(w, st, prevV, vbits)
      } else {
        val delta = t - prevT
        val dod = delta - prevDelta
        prevDelta = delta
        // Prometheus xor.go bucket boundaries (asymmetric: bitRange)
        if (dod == 0L) w.writeBit(false)
        else if (inBits(dod, 14)) { w.writeBits(0x2L, 2); w.writeBits(dod & 0x3FFFL, 14) }
        else if (inBits(dod, 17)) { w.writeBits(0x6L, 3); w.writeBits(dod & 0x1FFFFL, 17) }
        else if (inBits(dod, 20)) { w.writeBits(0xEL, 4); w.writeBits(dod & 0xFFFFFL, 20) }
        else { w.writeBits(0xFL, 4); w.writeBits(dod, 64) }
        writeXor(w, st, prevV, vbits)
      }
      prevT = t; prevV = vbits
      i += 1
    }
    w.result()
  }

  /** dod fits the Prometheus `bitRange(x, nbits)` check:
    * -((1<<(nbits-1))-1) <= x <= 1<<(nbits-1).
    */
  private def inBits(x: Long, nbits: Int): Boolean =
    -((1L << (nbits - 1)) - 1) <= x && x <= (1L << (nbits - 1))

  // The value-XOR window (leading/trailing) is cross-sample state scoped to
  // one chunk; a fresh XorState is allocated per encode() call and threaded
  // through writeXor, matching Prometheus's per-appender window.
  private final class XorState { var leading: Int = -1; var trailing: Int = 0 }

  private def writeXor(w: BitWriter, st: XorState, prevV: Long, vbits: Long): Unit = {
    val delta = prevV ^ vbits
    if (delta == 0L) { w.writeBit(false); return }
    w.writeBit(true)
    var leading = java.lang.Long.numberOfLeadingZeros(delta)
    if (leading >= 32) leading = 31 // 5-bit field, as in Prometheus
    val trailing = java.lang.Long.numberOfTrailingZeros(delta)
    if (st.leading != -1 && leading >= st.leading && trailing >= st.trailing) {
      w.writeBit(false)
      w.writeBits(delta >>> st.trailing, 64 - st.leading - st.trailing)
    } else {
      st.leading = leading; st.trailing = trailing
      w.writeBit(true)
      w.writeBits(leading.toLong, 5)
      val sigbits = 64 - leading - trailing
      w.writeBits((sigbits & 63).toLong, 6) // 64 sig bits encoded as 0
      w.writeBits(delta >>> trailing, sigbits)
    }
  }

  // ----------------------------------------------------------------- read

  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0 // absolute bit position

    def readBit(): Boolean = {
      val b = (bytes(pos >>> 3) >>> (7 - (pos & 7))) & 1
      pos += 1
      b == 1
    }

    def readBits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | (if (readBit()) 1L else 0L); i += 1 }
      v
    }

    def readByte(): Int = readBits(8).toInt

    def readUvarint(): Long = {
      var v = 0L; var shift = 0; var b = readByte()
      while ((b & 0x80) != 0) { v |= (b & 0x7FL) << shift; shift += 7; b = readByte() }
      v | ((b & 0x7FL) << shift)
    }

    def readVarint(): Long = { val u = readUvarint(); (u >>> 1) ^ -(u & 1L) }
  }

  /** Decode chunk bytes back to (timestamp, value) samples. */
  def decode(bytes: Array[Byte]): Array[(Long, Double)] = {
    val r = new BitReader(bytes)
    val n = r.readBits(16).toInt
    val out = new Array[(Long, Double)](n)
    var t = 0L; var delta = 0L; var vbits = 0L
    var leading = 0; var trailing = 0
    var i = 0
    while (i < n) {
      if (i == 0) {
        t = r.readVarint()
        vbits = r.readBits(64)
      } else {
        if (i == 1) delta = r.readUvarint()
        else {
          // delta-of-delta prefix: count leading 1-bits (max 4)
          var d = 0
          while (d < 4 && r.readBit()) d += 1
          val dod = d match {
            case 0 => 0L
            case 1 => signExtend(r.readBits(14), 14)
            case 2 => signExtend(r.readBits(17), 17)
            case 3 => signExtend(r.readBits(20), 20)
            case _ => r.readBits(64)
          }
          delta += dod
        }
        t += delta
        // value XOR
        if (r.readBit()) {
          if (r.readBit()) {
            leading = r.readBits(5).toInt
            var sig = r.readBits(6).toInt
            if (sig == 0) sig = 64
            trailing = 64 - leading - sig
          }
          val mbits = 64 - leading - trailing
          vbits ^= r.readBits(mbits) << trailing
        }
      }
      out(i) = (t, java.lang.Double.longBitsToDouble(vbits))
      i += 1
    }
    out
  }

  /** Prometheus sign reconstruction: a value above the positive bucket
    * edge wraps negative (`if x > (1 << (nbits-1)) { x -= 1 << nbits }`).
    */
  private def signExtend(u: Long, nbits: Int): Long =
    if (u > (1L << (nbits - 1))) u - (1L << nbits) else u
}
