package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

class BloomSketchSpec extends AnyFunSuite {

  test("no false negatives: every inserted key is contained") {
    val gen = Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    (1 to 50).foreach { _ =>
      val keys = gen.sample.getOrElse(Nil)
      val bits = new Array[Long](BloomSketch.wordsFor(math.max(1, keys.length).toLong))
      keys.foreach(BloomSketch.put(bits, _))
      keys.foreach(k => assert(BloomSketch.mightContain(bits, k), s"false negative for $k"))
    }
  }

  test("false-positive rate stays near the 1% sizing on disjoint probes") {
    val n = 10000
    val bits = new Array[Long](BloomSketch.wordsFor(n.toLong))
    (0 until n).foreach(i => BloomSketch.put(bits, i.toLong))
    val probes = (1 to 20000).map(i => 1000000L + i)
    val fp = probes.count(BloomSketch.mightContain(bits, _))
    val rate = fp.toDouble / probes.length
    assert(rate < 0.03, f"fp rate $rate%.4f way above the 1%% sizing")
  }

  test("merge is word-wise OR: split build == whole build") {
    val keys = (0L until 2000L).map(BloomSketch.mix64) // arbitrary spread keys
    val whole = new Array[Long](BloomSketch.wordsFor(2000))
    keys.foreach(BloomSketch.put(whole, _))

    val agg = BloomSketch.aggregator(BloomSketch.wordsFor(2000))
    val (l, r) = keys.splitAt(700)
    val a = l.foldLeft(agg.zero)(agg.reduce)
    val b = r.foldLeft(agg.zero)(agg.reduce)
    assert(java.util.Arrays.equals(agg.finish(agg.merge(a, b)), whole))
  }

  test("empty bloom contains nothing") {
    val bits = new Array[Long](16)
    assert((1 to 1000).forall(i => !BloomSketch.mightContain(bits, i.toLong)))
  }
}
