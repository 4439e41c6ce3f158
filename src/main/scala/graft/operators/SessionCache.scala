package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-scoped build-once artifact cache, keyed by (session, data dir):
  * a built artifact (ANN index, verified pair graph) outlives the query that
  * built it and is shared by every later call in the same session — the
  * "build once, query many" shape indexes exist for. Entries strongly retain
  * their session, so they are swept once the session's context is stopped
  * (checked on every access) — a static map that never evicted would pin
  * every historical session and its checkpoint blocks for the JVM lifetime.
  *
  * The key uses System.identityHashCode(session) for lookup plus an `eq`
  * check on the cached session: identity hashes can recur after GC, and a
  * hit from a DIFFERENT session must rebuild rather than serve another
  * session's artifact.
  */
private[graft] final class SessionCache[V] {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), (SparkSession, V)]()

  private def sweepStopped(): Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext) if (it.next().getValue._1.sparkContext.isStopped) it.remove()
  }

  def getOrBuild(spark: SparkSession, dir: String)(build: => V): V = {
    sweepStopped()
    m.compute(
      (System.identityHashCode(spark), dir),
      (_, v) => if (v != null && (v._1 eq spark)) v else (spark, build)
    )._2
  }

  /** Drop this session's entry so the next access rebuilds — used when the
    * backing artifact is rewritten (e.g. an index re-persisted over new
    * data) and a cached plan would keep reading the dropped files.
    */
  def invalidate(spark: SparkSession, dir: String): Unit =
    m.remove((System.identityHashCode(spark), dir))
}
