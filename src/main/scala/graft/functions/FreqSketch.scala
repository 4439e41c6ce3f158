package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary as a MERGEABLE typed aggregate — the
  * bounded-memory frequent-items sketch (Misra & Gries 1982; mergeability
  * per Agarwal et al., "Mergeable Summaries", PODS'12). The guarantee the
  * caller builds on: a k-counter summary over a stream of N items retains
  * EVERY item whose true frequency exceeds N/k — decrements are shared
  * across all k counters, so an item can lose at most N/k total.
  * Merging two summaries then cutting back to k counters (subtract the
  * (k+1)-th largest counter, drop non-positives) preserves the same bound
  * over the combined stream.
  *
  * Why it exists here: exact corpus-wide n-gram counting shuffles the full
  * type table (vocabulary-sized — Heaps' law keeps it tractable but it is
  * the dominant exchange). The sketch pass finds candidate heavy hitters
  * in ONE scan with k-bounded state per partition and a k-sized merge —
  * no vocabulary shuffle — and an exact pass then counts ONLY the
  * candidates, so the final numbers carry no sketch error at all.
  */
object FreqSketch {

  /** k-counter Misra–Gries over strings. The buffer is an immutable Map —
    * per-item updates are effectively O(1) on the persistent HashMap, and
    * the O(k) decrement sweep amortizes (each sweep consumes k prior
    * increments' worth of credit, the textbook argument).
    */
  def misraGries(k: Int): Aggregator[String, Map[String, Long], Map[String, Long]] = {
    require(k > 0, s"misra-gries needs k > 0, got $k")
    new Aggregator[String, Map[String, Long], Map[String, Long]] {
      override def zero: Map[String, Long] = Map.empty

      override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
        b.get(x) match {
          case Some(c)              => b.updated(x, c + 1L)
          case None if b.size < k   => b.updated(x, 1L)
          case None                 =>
            // shared decrement: every counter pays 1, zeros drop — the
            // incoming item is absorbed by the same decrement
            b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
        }

      override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        val combined = b.foldLeft(a) { case (m, (x, c)) => m.updated(x, m.getOrElse(x, 0L) + c) }
        if (combined.size <= k) combined
        else {
          // cut back to <= k counters: subtract the (k+1)-th largest value
          // from all (Agarwal et al.'s merge rule)
          val cut = combined.valuesIterator.toArray.sortBy(-_).apply(k)
          combined.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
        }
      }

      override def finish(r: Map[String, Long]): Map[String, Long] = r

      override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
      override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
    }
  }
}
