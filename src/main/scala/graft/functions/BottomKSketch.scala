package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (UDAF via `Aggregator`, SURVEY §2.12: the
  * reference has none — added ★): a deterministic bottom-k sketch.
  *
  * Keeps the k rows whose `sortKey` (an md5 hex string of the row id) is
  * smallest. Because the selection is content-addressed it is
  * deterministic across engines, partitionings and re-runs — a mergeable,
  * fixed-memory "random but reproducible" sample per group (the classic
  * bottom-k / KMV sketch construction: a uniform hash makes the k smallest
  * hashes a uniform sample). reduce/merge keep at most k elements, so
  * memory is O(k) per group regardless of group size — safe at any scale.
  */
object BottomKSketch {

  final case class Entry(sortKey: String, id: Long)

  /** State: sorted ascending by sortKey, at most k entries. `sortKey`/`id`
    * project the dataset's row type into the sketch.
    */
  def aggregator[T](k: Int)(sortKey: T => String, id: T => Long): Aggregator[T, List[Entry], Array[Long]] = {
    require(k > 0, s"bottom-k sketch needs k > 0, got $k")
    new Aggregator[T, List[Entry], Array[Long]] {
      override def zero: List[Entry] = Nil

      private def trim(xs: List[Entry]): List[Entry] = xs.sortBy(_.sortKey).take(k)

      override def reduce(b: List[Entry], a: T): List[Entry] = {
        val e = Entry(sortKey(a), id(a))
        // avoid re-sorting when the candidate can't displace anything
        if (b.lengthCompare(k) >= 0 && b.last.sortKey <= e.sortKey) b
        else trim(e :: b)
      }

      override def merge(b1: List[Entry], b2: List[Entry]): List[Entry] = trim(b1 ::: b2)

      override def finish(r: List[Entry]): Array[Long] = r.map(_.id).toArray

      override def bufferEncoder: Encoder[List[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
  }
}
