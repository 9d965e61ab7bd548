package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-Scala Keccak-256 (the original Keccak padding 0x01, as used by
  * Ethereum — NOT NIST SHA3's 0x06), implemented from the public
  * Keccak-f[1600] specification. Zero dependencies (zero-egress env,
  * SURVEY.md §7.3.4). Verified against published test vectors:
  * keccak256("") = c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470.
  */
object KeccakCore {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808AL, 0x8000000080008000L,
    0x000000000000808BL, 0x0000000080000001L, 0x8000000080008081L, 0x8000000000008009L,
    0x000000000000008AL, 0x0000000000000088L, 0x0000000080008009L, 0x000000008000000AL,
    0x000000008000808BL, 0x800000000000008BL, 0x8000000000008089L, 0x8000000000008003L,
    0x8000000000008002L, 0x8000000000000080L, 0x000000000000800AL, 0x800000008000000AL,
    0x8000000080008081L, 0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  private val R: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18), Array(1, 44, 10, 45, 2), Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56), Array(27, 20, 39, 8, 14))

  private def rotl(x: Long, n: Int): Long = (x << n) | (x >>> (64 - n))

  private def keccakF(a: Array[Array[Long]]): Unit = {
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    val b = Array.ofDim[Long](5, 5)
    var round = 0
    while (round < 24) {
      var x = 0
      while (x < 5) { c(x) = a(x)(0) ^ a(x)(1) ^ a(x)(2) ^ a(x)(3) ^ a(x)(4); x += 1 }
      x = 0
      while (x < 5) { d(x) = c((x + 4) % 5) ^ rotl(c((x + 1) % 5), 1); x += 1 }
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) { a(x)(y) ^= d(x); y += 1 }
        x += 1
      }
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) { b(y)((2 * x + 3 * y) % 5) = rotl(a(x)(y), R(x)(y)); y += 1 }
        x += 1
      }
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) { a(x)(y) = b(x)(y) ^ ((~b((x + 1) % 5)(y)) & b((x + 2) % 5)(y)); y += 1 }
        x += 1
      }
      a(0)(0) ^= RC(round)
      round += 1
    }
  }

  /** keccak-256 digest of the input bytes. */
  def hash256(msg: Array[Byte]): Array[Byte] = {
    val rate = 136 // bytes, for 256-bit output
    val state = Array.ofDim[Long](5, 5)
    // pad: 0x01 ... 0x80 (original Keccak domain byte)
    val padLen = rate - (msg.length % rate)
    val padded = new Array[Byte](msg.length + padLen)
    System.arraycopy(msg, 0, padded, 0, msg.length)
    padded(msg.length) = 0x01.toByte
    padded(padded.length - 1) = (padded(padded.length - 1) | 0x80).toByte
    // absorb
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < rate / 8) {
        var lane = 0L
        var j = 0
        while (j < 8) {
          lane |= (padded(off + i * 8 + j).toLong & 0xFF) << (8 * j)
          j += 1
        }
        state(i % 5)(i / 5) ^= lane
        i += 1
      }
      keccakF(state)
      off += rate
    }
    // squeeze 32 bytes
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      val lane = state(i % 5)(i / 5)
      var j = 0
      while (j < 8) { out(i * 8 + j) = ((lane >>> (8 * j)) & 0xFF).toByte; j += 1 }
      i += 1
    }
    out
  }

  private val HEX = "0123456789abcdef".toCharArray

  def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach { b => sb.append(HEX((b >> 4) & 0xF)); sb.append(HEX(b & 0xF)) }
    sb.toString
  }

  /** EIP-55 mixed-case checksum encoding of a 20-byte hex address. */
  def toChecksumAddress(addr: String): String = {
    val lower = addr.toLowerCase.stripPrefix("0x")
    val digest = hex(hash256(lower.getBytes("US-ASCII")))
    val sb = new java.lang.StringBuilder("0x")
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (c.isDigit) sb.append(c)
      else if (Character.digit(digest.charAt(i), 16) >= 8) sb.append(c.toUpper)
      else sb.append(c)
      i += 1
    }
    sb.toString
  }
}

/** keccak256(string) → lowercase hex digest, as a Catalyst expression
  * (A4 decode path: event topic0 = keccak256 of the event signature). */
case class Keccak256(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      KeccakCore.hex(KeccakCore.hash256(input.asInstanceOf[UTF8String].getBytes)))

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** EIP-55 checksum normalization of a 0x-hex Ethereum address. */
case class ChecksumAddress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(KeccakCore.toChecksumAddress(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
