package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** SpookyHash V2 (Bob Jenkins, public domain —
  * burtleburtle.net/bob/hash/spooky.html), reimplemented from the
  * published reference algorithm. Backs `spooky_hash_v2_32/64`
  * (reference: presto-main/src/main/java/com/facebook/presto/operator/
  * scalar/VarbinaryFunctions.java:280-297 — seed 0, big-endian output
  * bytes). Vector-checked against the reference's expected values
  * (TestVarbinaryFunctions.java:338-341).
  */
object SpookyHashV2 {
  private val SC = 0xdeadbeefdeadbeefL // sc_const
  private val NumVars = 12
  private val BlockSize = NumVars * 8 // 96
  private val BufSize = 2 * BlockSize // 192

  @inline private def rot(x: Long, k: Int): Long = (x << k) | (x >>> (64 - k))

  @inline private def le64(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | (b(o + 1) & 0xffL) << 8 | (b(o + 2) & 0xffL) << 16 |
      (b(o + 3) & 0xffL) << 24 | (b(o + 4) & 0xffL) << 32 |
      (b(o + 5) & 0xffL) << 40 | (b(o + 6) & 0xffL) << 48 |
      (b(o + 7) & 0xffL) << 56

  @inline private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | (b(o + 1) & 0xffL) << 8 | (b(o + 2) & 0xffL) << 16 |
      (b(o + 3) & 0xffL) << 24

  /** Short-message form (< 192 bytes). Returns (hash1, hash2). */
  private def shortHash(m: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    val length = m.length
    var remainder = length % 32
    var a = seed1; var b = seed2; var c = SC; var d = SC
    var off = 0
    if (length > 15) {
      val end = (length / 32) * 32
      while (off < end) {
        c += le64(m, off); d += le64(m, off + 8)
        // ShortMix
        c = rot(c, 50); c += d; a ^= c
        d = rot(d, 52); d += a; b ^= d
        a = rot(a, 30); a += b; c ^= a
        b = rot(b, 41); b += c; d ^= b
        c = rot(c, 54); c += d; a ^= c
        d = rot(d, 48); d += a; b ^= d
        a = rot(a, 38); a += b; c ^= a
        b = rot(b, 37); b += c; d ^= b
        c = rot(c, 62); c += d; a ^= c
        d = rot(d, 34); d += a; b ^= d
        a = rot(a, 5); a += b; c ^= a
        b = rot(b, 36); b += c; d ^= b
        a += le64(m, off + 16); b += le64(m, off + 24)
        off += 32
      }
      if (remainder >= 16) {
        c += le64(m, off); d += le64(m, off + 8)
        c = rot(c, 50); c += d; a ^= c
        d = rot(d, 52); d += a; b ^= d
        a = rot(a, 30); a += b; c ^= a
        b = rot(b, 41); b += c; d ^= b
        c = rot(c, 54); c += d; a ^= c
        d = rot(d, 48); d += a; b ^= d
        a = rot(a, 38); a += b; c ^= a
        b = rot(b, 37); b += c; d ^= b
        c = rot(c, 62); c += d; a ^= c
        d = rot(d, 34); d += a; b ^= d
        a = rot(a, 5); a += b; c ^= a
        b = rot(b, 36); b += c; d ^= b
        off += 16; remainder -= 16
      }
    }
    // last 0..15 bytes and the length (C switch falls through)
    d += length.toLong << 56
    if (remainder >= 12) {
      if (remainder >= 15) d += (m(off + 14) & 0xffL) << 48
      if (remainder >= 14) d += (m(off + 13) & 0xffL) << 40
      if (remainder >= 13) d += (m(off + 12) & 0xffL) << 32
      d += le32(m, off + 8)
      c += le64(m, off)
    } else if (remainder >= 8) {
      if (remainder >= 11) d += (m(off + 10) & 0xffL) << 16
      if (remainder >= 10) d += (m(off + 9) & 0xffL) << 8
      if (remainder >= 9) d += m(off + 8) & 0xffL
      c += le64(m, off)
    } else if (remainder >= 4) {
      if (remainder >= 7) c += (m(off + 6) & 0xffL) << 48
      if (remainder >= 6) c += (m(off + 5) & 0xffL) << 40
      if (remainder >= 5) c += (m(off + 4) & 0xffL) << 32
      c += le32(m, off)
    } else if (remainder >= 1) {
      if (remainder >= 3) c += (m(off + 2) & 0xffL) << 16
      if (remainder >= 2) c += (m(off + 1) & 0xffL) << 8
      c += m(off) & 0xffL
    } else {
      c += SC; d += SC
    }
    // ShortEnd
    d ^= c; c = rot(c, 15); d += c
    a ^= d; d = rot(d, 52); a += d
    b ^= a; a = rot(a, 26); b += a
    c ^= b; b = rot(b, 51); c += b
    d ^= c; c = rot(c, 28); d += c
    a ^= d; d = rot(d, 9); a += d
    b ^= a; a = rot(a, 47); b += a
    c ^= b; b = rot(b, 54); c += b
    d ^= c; c = rot(c, 32); d += c
    a ^= d; d = rot(d, 25); a += d
    b ^= a; a = rot(a, 63); b += a
    (a, b)
  }

  /** Full 128-bit hash; long form for >= 192 bytes. */
  def hash128(m: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    if (m.length < BufSize) return shortHash(m, seed1, seed2)

    val s = new Array[Long](NumVars)
    s(0) = seed1; s(3) = seed1; s(6) = seed1; s(9) = seed1
    s(1) = seed2; s(4) = seed2; s(7) = seed2; s(10) = seed2
    s(2) = SC; s(5) = SC; s(8) = SC; s(11) = SC

    def mix(d: Array[Long]): Unit = {
      s(0) += d(0); s(2) ^= s(10); s(11) ^= s(0); s(0) = rot(s(0), 11); s(11) += s(1)
      s(1) += d(1); s(3) ^= s(11); s(0) ^= s(1); s(1) = rot(s(1), 32); s(0) += s(2)
      s(2) += d(2); s(4) ^= s(0); s(1) ^= s(2); s(2) = rot(s(2), 43); s(1) += s(3)
      s(3) += d(3); s(5) ^= s(1); s(2) ^= s(3); s(3) = rot(s(3), 31); s(2) += s(4)
      s(4) += d(4); s(6) ^= s(2); s(3) ^= s(4); s(4) = rot(s(4), 17); s(3) += s(5)
      s(5) += d(5); s(7) ^= s(3); s(4) ^= s(5); s(5) = rot(s(5), 28); s(4) += s(6)
      s(6) += d(6); s(8) ^= s(4); s(5) ^= s(6); s(6) = rot(s(6), 39); s(5) += s(7)
      s(7) += d(7); s(9) ^= s(5); s(6) ^= s(7); s(7) = rot(s(7), 57); s(6) += s(8)
      s(8) += d(8); s(10) ^= s(6); s(7) ^= s(8); s(8) = rot(s(8), 55); s(7) += s(9)
      s(9) += d(9); s(11) ^= s(7); s(8) ^= s(9); s(9) = rot(s(9), 54); s(8) += s(10)
      s(10) += d(10); s(0) ^= s(8); s(9) ^= s(10); s(10) = rot(s(10), 22); s(9) += s(11)
      s(11) += d(11); s(1) ^= s(9); s(10) ^= s(11); s(11) = rot(s(11), 46); s(10) += s(0)
    }

    def endPartial(): Unit = {
      s(11) += s(1); s(2) ^= s(11); s(1) = rot(s(1), 44)
      s(0) += s(2); s(3) ^= s(0); s(2) = rot(s(2), 15)
      s(1) += s(3); s(4) ^= s(1); s(3) = rot(s(3), 34)
      s(2) += s(4); s(5) ^= s(2); s(4) = rot(s(4), 21)
      s(3) += s(5); s(6) ^= s(3); s(5) = rot(s(5), 38)
      s(4) += s(6); s(7) ^= s(4); s(6) = rot(s(6), 33)
      s(5) += s(7); s(8) ^= s(5); s(7) = rot(s(7), 10)
      s(6) += s(8); s(9) ^= s(6); s(8) = rot(s(8), 13)
      s(7) += s(9); s(10) ^= s(7); s(9) = rot(s(9), 38)
      s(8) += s(10); s(11) ^= s(8); s(10) = rot(s(10), 53)
      s(9) += s(11); s(0) ^= s(9); s(11) = rot(s(11), 42)
      s(10) += s(0); s(1) ^= s(10); s(0) = rot(s(0), 54)
    }

    val block = new Array[Long](NumVars)
    val wholeBlocks = m.length / BlockSize
    var b = 0
    while (b < wholeBlocks) {
      var i = 0
      while (i < NumVars) { block(i) = le64(m, b * BlockSize + i * 8); i += 1 }
      mix(block)
      b += 1
    }
    // trailing partial block, zero-padded, last byte = remainder length
    val remainder = m.length - wholeBlocks * BlockSize
    val tail = new Array[Byte](BlockSize)
    System.arraycopy(m, wholeBlocks * BlockSize, tail, 0, remainder)
    tail(BlockSize - 1) = remainder.toByte
    var i = 0
    while (i < NumVars) { block(i) = le64(tail, i * 8); i += 1 }
    // End: add the block, then three partial end rounds
    i = 0
    while (i < NumVars) { s(i) += block(i); i += 1 }
    endPartial(); endPartial(); endPartial()
    (s(0), s(1))
  }

  def hash64(m: Array[Byte], seed: Long): Long = hash128(m, seed, seed)._1
  def hash32(m: Array[Byte], seed: Int): Int = {
    val s = seed & 0xffffffffL
    hash128(m, s, s)._1.toInt
  }

  /** Big-endian bytes like the reference (it writes
    * Integer/Long.reverseBytes into a little-endian slice). */
  def hash32Bytes(m: Array[Byte]): Array[Byte] = {
    val h = hash32(m, 0)
    Array[Byte]((h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte)
  }

  def hash64Bytes(m: Array[Byte]): Array[Byte] = {
    val h = hash64(m, 0L)
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = (h >>> (56 - 8 * i)).toByte; i += 1 }
    out
  }
}

case class SpookyHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "spooky_hash_v2_32"
  override protected def nullSafeEval(v: Any): Any =
    SpookyHashV2.hash32Bytes(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpookyHashV2.hash32Bytes($c)")
  override protected def withNewChildInternal(newChild: Expression): SpookyHash32 =
    copy(child = newChild)
}

case class SpookyHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "spooky_hash_v2_64"
  override protected def nullSafeEval(v: Any): Any =
    SpookyHashV2.hash64Bytes(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpookyHashV2.hash64Bytes($c)")
  override protected def withNewChildInternal(newChild: Expression): SpookyHash64 =
    copy(child = newChild)
}
