package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit contracts for the md5-keyed bloom (q166's screen filter) that the
  * operator specs don't reach: sizing-ceiling failure modes and the
  * Kirsch–Mitzenmacher position arithmetic at the word-array edge.
  */
class Md5BloomSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  test("no false negatives at the minimum (floor-64) bitset") {
    val numBits = Md5Bloom.bitsFor(0L)
    assert(numBits === 64L)
    val bits = new Array[Long](Md5Bloom.wordsFor(numBits))
    val keys = (1 to 10).map(i => md5hex(s"key-$i"))
    keys.foreach(Md5Bloom.put(bits, numBits, _))
    keys.foreach(k => assert(Md5Bloom.mightContain(bits, numBits, k), s"false negative for $k"))
  }

  test("oversized builds fail with the descriptive require, not an array exception") {
    // bitsFor: expected keys past what one Array[Long] bitset can hold at
    // 16 bits/key (~8.6 B keys) must throw the sizing message — previously
    // the 2^61 arithmetic ceiling passed and wordsFor(...).toInt silently
    // truncated the word count into a negative/garbled array size
    val tooManyKeys = Md5Bloom.MaxBits / Md5Bloom.BITS_PER_KEY + 1L
    val e1 = intercept[IllegalArgumentException](Md5Bloom.bitsFor(tooManyKeys))
    assert(e1.getMessage.contains("too large"), e1.getMessage)
    // wordsFor guards independently (a caller passing raw bits, not keys)
    val e2 = intercept[IllegalArgumentException](Md5Bloom.wordsFor(Md5Bloom.MaxBits + 64L))
    assert(e2.getMessage.contains("too large"), e2.getMessage)
    // the boundary itself sizes cleanly
    assert(Md5Bloom.wordsFor(Md5Bloom.MaxBits) === Int.MaxValue)
    assert(Md5Bloom.bitsFor(Md5Bloom.MaxBits / Md5Bloom.BITS_PER_KEY) === Md5Bloom.MaxBits)
  }

  test("K-M positions match the oracle's early-mod UBIGINT arithmetic") {
    // (h1 % m + i * (h2 % m)) % m over the digest's unsigned 64-bit halves
    // — replayed here with BigInt as the independent wide-arithmetic oracle
    val m = Md5Bloom.bitsFor(1000L)
    val big = BigInt(m)
    (1 to 50).foreach { i =>
      val h = md5hex(s"doc-$i")
      val h1 = BigInt(h.substring(0, 16), 16)
      val h2 = BigInt(h.substring(16, 32), 16)
      (0 until Md5Bloom.K).foreach { k =>
        val want = ((h1.mod(big)) + BigInt(k) * (h2.mod(big))).mod(big).toLong
        assert(Md5Bloom.position(h, k, m) === want, s"position $k of $h")
      }
    }
  }
}
