package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.BloomSketch

/** Bloom-filter semi-join pruning — the shuffle-reduction pattern for the
  * selective-dim join at 100 TB: build a KB-sized bitset over the dim
  * side's surviving join keys (one scan, word-wise-OR merge), ship it to
  * every fact task as a plan constant, and drop non-matching fact rows AT
  * THE SCAN, before they pay the join shuffle. With a 20%-selective dim
  * filter and ~1% bloom fpp, ~79% of the fact table's shuffle volume
  * disappears; the exact join then removes the false positives, so the
  * result is bit-identical to the unpruned plan (which is exactly what the
  * oracle checks).
  *
  * Spark's optimizer has this move built in (`InjectRuntimeFilter`) but
  * only fires it on its own cost heuristics; this operator makes the
  * pruning an explicit, testable, always-on step — the same reasoning as
  * q43's explicit salting vs AQE.
  */
object BloomPrune {

  /** Session-bound `bloom_contains_<i>` registrations: one immutable name
    * per distinct bitset (same discipline as Similarity's
    * `centroid_ranks_<i>` — a mutable name would either spam re-codegen or
    * silently pin the first binding).
    */
  private val bloomBindings =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.ArrayBuffer[Array[Long]]]()

  /** Register (or find) the session function bound to this bitset and
    * return its name — callers splice the name into expressions.
    */
  def installBloom(spark: SparkSession, bits: Array[Long]): String =
    bloomBindings.synchronized {
      val list = {
        val l = bloomBindings.get(spark)
        if (l != null) l
        else {
          val fresh = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
          bloomBindings.put(spark, fresh)
          fresh
        }
      }
      val existing = list.indexWhere(b => (b eq bits) || java.util.Arrays.equals(b, bits))
      val i =
        if (existing >= 0) existing
        else {
          val idx = list.size
          val name = s"bloom_contains_$idx"
          spark.sessionState.functionRegistry.registerFunction(
            org.apache.spark.sql.catalyst.FunctionIdentifier(name),
            new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
              classOf[BloomSketch.BloomContains].getName,
              name
            ),
            (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
              BloomSketch.BloomContains(args.head, bits)
          )
          list += bits
          idx
        }
      s"bloom_contains_$i"
    }

  /** Session bindings for md5-position blooms (functions/Md5Bloom — the
    * oracle-reproducible variant q166 screens with). Unlike
    * `bloomBindings` this list is BOUNDED: the streaming maintainer
    * serves q166 after every ingest tick, and each tick's grown test set
    * yields a fresh bitset — an unbounded list (plus the function
    * registry's strong reference) would retain every historical
    * generation's multi-MB bits for the session's lifetime. Oldest
    * entries are deregistered past MaxMd5Blooms; a dropped NAME only
    * matters to a plan that has not been analyzed yet, and callers
    * analyze the expression in the same call that installed it.
    */
  private val MaxMd5Blooms = 8

  /** Per-session md5-bloom bindings, LRU-ordered (last = most recent): all
    * access holds the md5BloomBindings monitor, so plain fields suffice.
    */
  private final class Md5Blooms {
    var nextId = 0
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Long], Long)]
  }

  private val md5BloomBindings = new java.util.WeakHashMap[SparkSession, Md5Blooms]()

  /** Register (or find) the session function bound to this md5 bloom and
    * return its name. A dedup hit refreshes the entry's recency, so an
    * actively-served bloom is never the eviction victim — the residual
    * exposure is > MaxMd5Blooms DISTINCT blooms in flight between one
    * caller's install and its analysis, which fails loudly (undefined
    * function), never wrongly.
    */
  def installMd5Bloom(spark: SparkSession, bits: Array[Long], numBits: Long): String =
    md5BloomBindings.synchronized {
      val st = {
        val l = md5BloomBindings.get(spark)
        if (l != null) l
        else {
          val fresh = new Md5Blooms
          md5BloomBindings.put(spark, fresh)
          fresh
        }
      }
      val hit = st.entries.indexWhere { case (_, b, m) =>
        m == numBits && ((b eq bits) || java.util.Arrays.equals(b, bits))
      }
      if (hit >= 0) {
        val e = st.entries.remove(hit) // move to back: most-recently used
        st.entries += e
        e._1
      } else {
        val name = s"md5_bloom_contains_${st.nextId}"
        st.nextId += 1
        spark.sessionState.functionRegistry.registerFunction(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            classOf[graft.functions.Md5Bloom.Md5BloomContains].getName,
            name
          ),
          (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.Md5Bloom.Md5BloomContains(args.head, bits, numBits)
        )
        st.entries += ((name, bits, numBits))
        while (st.entries.size > MaxMd5Blooms) {
          val (old, _, _) = st.entries.remove(0)
          spark.sessionState.functionRegistry
            .dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(old))
          ()
        }
        name
      }
    }

  /** Build a bloom over `keys` (a 1-column BIGINT frame). Two actions: a
    * count to size the bitset (at 100 TB this is the dim-side scan — small
    * relative to the fact scan it saves) and the aggregate itself.
    */
  def buildBloom(spark: SparkSession, keys: DataFrame): Array[Long] = {
    import spark.implicits._
    val ds = keys.as[Long]
    val n = math.max(1L, ds.count())
    ds.select(BloomSketch.aggregator(BloomSketch.wordsFor(n)).toColumn).head()
  }

  // ---------------------------------------------------------------------------
  // q88 — urgent-order revenue with explicit bloom pruning: lineitem rows are
  // filtered by a bloom over the urgent orders' keys before the join. The
  // oracle is the plain unpruned SQL join — pruning must be invisible in the
  // result.
  // ---------------------------------------------------------------------------
  def q88BloomPrune(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    val fn = installBloom(spark, buildBloom(spark, urgent.select(col("o_orderkey"))))
    Tables
      .lineitem(spark, dir)
      .filter(expr(s"$fn(l_orderkey)"))
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue")
      )
      .orderBy(col("l_returnflag"))
  }

  val q88Oracle: String =
    """SELECT l_returnflag,
      |       count(*) AS n_items,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q88_bloom_prune" -> (q88BloomPrune _)
  )

  val oracles: Map[String, String] = Map(
    "q88_bloom_prune" -> q88Oracle
  )
}
