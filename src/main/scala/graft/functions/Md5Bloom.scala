package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}

/** Bloom filter whose probe positions are SEMANTIC, not implementation
  * detail: the k=4 bit positions of a key are Kirsch–Mitzenmacher
  * combinations p_i = (h1 + i*h2) mod numBits of the TWO 64-bit halves of
  * its md5 digest. Unlike `BloomSketch` (whose splitmix64 double-hashing
  * is a private engine choice), every position here is plain integer
  * arithmetic over a digest BOTH engines compute identically — so a query
  * whose OUTPUT includes the filter's false positives (q166's
  * decontamination screen audits exactly that) can still be hash-gated by
  * the DuckDB oracle: the approximation itself is reproducible, the q134
  * discipline applied to membership.
  *
  * Why halves, not the four 8-hex slices (the r13 design): a 32-bit slice
  * can never address a bit >= 2^32, so once the keyed set passes ~268M
  * distinct grams (numBits > 2^32 at 16 bits/key) the top of the bitset
  * went silently unreachable and the fpp degraded far past spec (~0.13 at
  * 1B keys) — exactly the 100 TB serving regime this filter exists for.
  * 64-bit halves address any practical bitset; Kirsch–Mitzenmacher
  * (k hashes from two) preserves the standard Bloom fpp analysis. The
  * overflow-safe form (h1 % m + i*(h2 % m)) % m keeps every intermediate
  * below 4m < 2^63, so signed 64-bit Scala and DuckDB's UBIGINT/HUGEINT
  * promotion agree bit-for-bit.
  *
  * Sizing: BITS_PER_KEY=16 with k=4 gives a scale-invariant fpp of
  * (1-e^(-1/4))^4 ~ 2.4e-3 — bits grow linearly with the keyed set, so
  * the rate holds at any corpus size. The bitset is word-wise-OR
  * mergeable (associative), so builds are one scan + one tiny exchange
  * and ingest ticks can contribute independent slices.
  */
object Md5Bloom {

  /** Probes per key: K Kirsch–Mitzenmacher combinations of the digest's
    * two independent 64-bit halves.
    */
  val K = 4

  val BITS_PER_KEY = 16

  /** Bits for an expected key count: 16 bits/key, floor 64 so an empty
    * build still has a valid (all-miss) bitset. NOT rounded to a power of
    * two — positions are `mod numBits` and plain modulo is what the SQL
    * twin can reproduce. The position ARITHMETIC is safe to 2^61 bits
    * (intermediates < 4*numBits stay in signed 64 bits), but the BITSET is
    * one JVM `Array[Long]`, so the enforced ceiling is what that array can
    * hold: `Int.MaxValue` 64-bit words ≈ 2^37 bits ≈ 8.6 B keys at 16
    * bits/key — far past any single-filter need (a 100-TB screen shards
    * the key space across filters before one filter sees 8 B keys). Both
    * `bitsFor` and [[wordsFor]] require it so an oversized build fails
    * with this message, not a negative-size array exception.
    */
  val MaxBits: Long = Int.MaxValue.toLong * 64L

  def bitsFor(expectedKeys: Long): Long = {
    val bits = math.max(BITS_PER_KEY * expectedKeys, 64L)
    require(
      bits <= MaxBits,
      s"md5 bloom bitset too large: $bits bits > $MaxBits (one JVM Array[Long]); shard the key space across filters"
    )
    bits
  }

  def wordsFor(numBits: Long): Int = {
    val words = (numBits + 63L) >>> 6
    require(
      words <= Int.MaxValue.toLong,
      s"md5 bloom bitset too large: $numBits bits needs $words words > Int.MaxValue (one JVM Array[Long])"
    )
    words.toInt
  }

  /** Position i (0..3) of a 32-hex md5 digest: the Kirsch–Mitzenmacher
    * combination (h1 + i*h2) mod numBits of the digest's unsigned 64-bit
    * halves, in the overflow-safe early-mod form — one shared arithmetic
    * with the oracle's
    * (('0x'||substring(h,1,16))::UBIGINT % m + i * (('0x'||substring(h,17,16))::UBIGINT % m)) % m.
    */
  def position(md5hex: String, i: Int, numBits: Long): Long = {
    val h1 = java.lang.Long.parseUnsignedLong(md5hex.substring(0, 16), 16)
    val h2 = java.lang.Long.parseUnsignedLong(md5hex.substring(16, 32), 16)
    (java.lang.Long.remainderUnsigned(h1, numBits) +
      i * java.lang.Long.remainderUnsigned(h2, numBits)) % numBits
  }

  def put(bits: Array[Long], numBits: Long, md5hex: String): Unit = {
    var i = 0
    while (i < K) {
      val pos = position(md5hex, i, numBits)
      bits((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** No false negatives ever (a keyed digest set all four of its own
    * positions); false positives at the sized fpp, and — because the
    * positions are md5 arithmetic — at exactly the rows the oracle's
    * position join also flags. Static so generated code calls it
    * directly.
    */
  def mightContain(bits: Array[Long], numBits: Long, md5hex: String): Boolean = {
    var i = 0
    while (i < K) {
      val pos = position(md5hex, i, numBits)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Typed aggregate building the bitset distributively over md5-hex keys
    * (the BloomSketch.aggregator shape: in-place partition buffers,
    * word-wise-OR merge).
    */
  def aggregator(numBits: Long): Aggregator[String, Array[Long], Array[Long]] = {
    val numWords = wordsFor(numBits)
    require(numWords > 0, s"md5 bloom needs numWords > 0, got $numWords")
    new Aggregator[String, Array[Long], Array[Long]] {
      override def zero: Array[Long] = new Array[Long](numWords)

      override def reduce(b: Array[Long], key: String): Array[Long] = {
        put(b, numBits, key); b
      }

      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      }

      override def finish(r: Array[Long]): Array[Long] = r

      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
  }

  /** `md5_bloom_contains(md5hex)` with the bitset bound at plan time as a
    * referenced object (the BloomContains shape). The child is the
    * 32-hex-char digest string the scan already carries.
    */
  case class Md5BloomContains(child: Expression, bits: Array[Long], numBits: Long)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_bloom_contains expects a STRING md5 digest, got ${child.dataType}"
        )

    override protected def nullSafeEval(key: Any): Any =
      mightContain(bits, numBits, key.toString)

    // fresh names — see VecDot.doGenCode for why fixed names break codegen
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("md5BloomBits", bits, "long[]")
      defineCodeGen(
        ctx,
        ev,
        key => s"graft.functions.Md5Bloom.mightContain($ref, ${numBits}L, $key.toString())"
      )
    }

    override protected def withNewChildInternal(newChild: Expression): Md5BloomContains =
      copy(child = newChild)
  }
}
