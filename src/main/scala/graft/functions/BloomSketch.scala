package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter sketch over LONG keys: a mergeable bitset aggregate plus a
  * codegen'd membership expression — the pair that implements semi-join
  * pruning (SURVEY §2.12 ★; same construction as Spark's own
  * `BloomFilterAggregate`/`BloomFilterMightContain` runtime-filter pair,
  * re-built here so the pruning is an explicit, testable operator instead
  * of an optimizer heuristic).
  *
  * Hashing is Kirsch–Mitzenmacher double hashing over two splitmix64
  * draws: `pos_i = (h1 + i·h2) mod numBits` — k probe positions from one
  * 64-bit key with published independence guarantees. The bitset is an
  * `Array[Long]`; `merge` is word-wise OR, so partial aggregates combine
  * associatively and the build is one scan + one tiny exchange regardless
  * of input size.
  */
object BloomSketch {

  /** Probes per key — ln(2) · bitsPerKey for the 10-bits/key sizing (~1%
    * false-positive rate).
    */
  val K = 7

  private val BITS_PER_KEY = 10

  /** splitmix64 finalizer (public-domain constants — Steele et al., JDK
    * SplittableRandom): a full-avalanche 64→64 mix.
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Bitset words for an expected key count at ~1% fpp, min 1 word. */
  def wordsFor(expectedKeys: Long): Int = {
    val bits = math.max(64L, expectedKeys * BITS_PER_KEY)
    ((bits + 63) >>> 6).toInt
  }

  private def h2of(key: Long): Long = mix64(key ^ 0x5851f42d4c957f2dL) | 1L

  def put(bits: Array[Long], key: Long): Unit = {
    val numBits = bits.length.toLong << 6
    val h1 = mix64(key)
    val h2 = h2of(key)
    var i = 0
    while (i < K) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % numBits
      bits((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** No false negatives ever; false positives at the sized fpp. Static so
    * generated code calls it directly (one invokestatic per row).
    */
  def mightContain(bits: Array[Long], key: Long): Boolean = {
    val numBits = bits.length.toLong << 6
    val h1 = mix64(key)
    val h2 = h2of(key)
    var i = 0
    while (i < K) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % numBits
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Typed aggregate building the bitset distributively: per-partition
    * buffers mutate in place (ObjectHashAggregate keeps the object buffer
    * live between rows), merge ORs word-wise, and only partial-output
    * boundaries pay serialization.
    */
  def aggregator(numWords: Int): Aggregator[Long, Array[Long], Array[Long]] = {
    require(numWords > 0, s"bloom needs numWords > 0, got $numWords")
    new Aggregator[Long, Array[Long], Array[Long]] {
      override def zero: Array[Long] = new Array[Long](numWords)

      override def reduce(b: Array[Long], key: Long): Array[Long] = { put(b, key); b }

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

  /** `bloom_contains(key)` with the bitset bound at plan time (the built
    * filter is a broadcast-sized constant — KBs for millions of keys — so
    * it rides into generated code as a referenced object, converted from
    * row format exactly once, not per row).
    */
  case class BloomContains(child: Expression, bits: Array[Long]) extends UnaryExpression {
    override def dataType: DataType = BooleanType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains expects a BIGINT key, got ${child.dataType}"
        )

    override protected def nullSafeEval(key: Any): Any =
      mightContain(bits, key.asInstanceOf[Long])

    // fresh names — see VecDot.doGenCode for why fixed names break codegen
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
      defineCodeGen(ctx, ev, key => s"graft.functions.BloomSketch.mightContain($ref, $key)")
    }

    override protected def withNewChildInternal(newChild: Expression): BloomContains =
      copy(child = newChild)
  }
}
