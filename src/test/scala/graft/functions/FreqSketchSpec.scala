package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries guarantee q127 builds its exactness on: a k-counter
  * summary over N items retains EVERY item with true count > N/k — across
  * arbitrary partition splits and merge orders, on adversarial and skewed
  * streams. If this holds, q127's exact verify pass can never miss a
  * qualifying bigram.
  */
class FreqSketchSpec extends AnyFunSuite {

  private def summarize(k: Int, partitions: Seq[Seq[String]]): Map[String, Long] = {
    val agg = FreqSketch.misraGries(k)
    val partials = partitions.map(p => p.foldLeft(agg.zero)(agg.reduce))
    agg.finish(partials.foldLeft(agg.zero)(agg.merge))
  }

  private def assertGuarantee(k: Int, stream: Seq[String], splits: Int, seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val shuffled = rnd.shuffle(stream)
    // random uneven partitioning
    val parts = shuffled.groupBy(_ => rnd.nextInt(splits)).values.toSeq
    val summary = summarize(k, parts)
    assert(summary.size <= k, s"summary must stay k-bounded, got ${summary.size}")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val mustKeep = exact.filter { case (_, c) => c * k > n }.keySet
    val missed = mustKeep -- summary.keySet
    assert(missed.isEmpty, s"MG must retain every item with count > N/k; missed $missed (k=$k, n=$n)")
  }

  test("guarantee holds on skewed zipf-ish streams across random splits and merge orders") {
    val rnd = new scala.util.Random(7L)
    for (trial <- 1 to 20) {
      // zipf-ish: item i appears ~ 2000/i times over 200 distinct items
      val stream = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"w$i"))
      assertGuarantee(k = 16 + rnd.nextInt(50), stream, splits = 1 + rnd.nextInt(8), seed = trial.toLong)
    }
  }

  test("guarantee holds on the adversarial all-distinct-then-heavy stream") {
    // k distinct singletons repeatedly force the shared decrement, trying
    // to evict the heavy item
    val heavy = Seq.fill(400)("HH")
    val noise = (1 to 5000).map(i => s"n$i")
    assertGuarantee(k = 32, rnd(heavy ++ noise, 3L), splits = 4, seed = 11L)
    assertGuarantee(k = 32, heavy ++ noise, splits = 1, seed = 13L) // heavy first, then eviction pressure
    assertGuarantee(k = 32, noise ++ heavy, splits = 1, seed = 17L) // eviction pressure first
  }

  private def rnd(xs: Seq[String], seed: Long): Seq[String] = new scala.util.Random(seed).shuffle(xs)

  test("merge cut preserves the combined-stream guarantee") {
    // two summaries whose union exceeds k force the (k+1)-th-largest cut
    val a = (1 to 60).flatMap(i => Seq.fill(i)(s"a$i"))
    val b = (1 to 60).flatMap(i => Seq.fill(i)(s"b$i")) ++ Seq.fill(500)("a60")
    val agg = FreqSketch.misraGries(40)
    val merged = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce)
    )
    assert(merged.size <= 40)
    val exact = (a ++ b).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = (a.size + b.size).toLong
    val mustKeep = exact.filter { case (_, c) => c * 40 > n }.keySet
    assert((mustKeep -- merged.keySet).isEmpty)
  }
}
