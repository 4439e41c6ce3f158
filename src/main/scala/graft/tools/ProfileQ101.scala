package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.Dedup

/** Stage decomposition of the q101 banded-MinHash graph build (the
  * `q101_graph` bench phase) and its q61 exact twin — the two biggest
  * remaining build phases after r16's first pass. Stages:
  *
  *   - `sigs`:    the tokenize + minhash_sigs16 stage build (session-cached
  *                after the first call — shared with q108/q113),
  *   - `cand`:    banded candidate mining (bucket self-join + distinct),
  *   - `n_cand`:  candidate count (for selectivity bookkeeping),
  *   - `verify`:  candidates + exact sorted-merge Jaccard verify — the full
  *                q101 graph build (delta over `cand` is the verify cost),
  *   - `n_edge`:  verified edge count,
  *   - `cc101`:   the registered q101 query over the WARM graph (the CC
  *                propagation loop — what the bench's timed number holds),
  *   - `pairs61`: the exact all-pairs miner (the `q61_graph` phase),
  *   - `cc61`:    the registered q61 query over the warm exact graph.
  *
  * Usage: `sbt "runMain graft.tools.ProfileQ101 /root/testdata/sf0.1 [reps]"`
  * Run IDLE — this is a measurement tool.
  */
object ProfileQ101 {
  private def sec[A](body: => A): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def medianOf(reps: Int)(body: => Unit): Double = {
    val xs = (1 to reps).map(_ => sec(body)).sorted
    xs(xs.size / 2)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQ101 <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.Sessions.local("graft-profile-q101")
    try {
      def drain(df: DataFrame): Unit = { df.write.format("noop").mode("overwrite").save(); () }
      val sigs = sec(Dedup.sigTokenFrame(spark, dir).count())
      def sigFrame = Dedup.sigTokenFrame(spark, dir)
      def candidates = Dedup.minhashCandidates(
        sigFrame.select(col("doc_id"), col("sig"), col("sz"), col("lang"))
      )
      val cand = medianOf(reps)(drain(candidates))
      val nCand = candidates.count()
      val verify = medianOf(reps)(drain(Dedup.verifyEdges(sigFrame, candidates)))
      val nEdge = Dedup.verifyEdges(sigFrame, candidates).count()
      val cc101 = medianOf(reps)(drain(Dedup.q101LshDupClusters(spark, dir)))
      val pairs61 = sec(Dedup.buildPairGraph(spark, dir).count())
      val cc61 = medianOf(reps)(drain(Dedup.q61DupClusters(spark, dir)))
      println(
        f"""{"tool":"profile_q101","dir":"$dir","reps":$reps,"sigs_build":$sigs%.3f,""" +
          f""""cand":$cand%.3f,"n_cand":$nCand,"verify":$verify%.3f,"n_edge":$nEdge,""" +
          f""""verify_delta":${verify - cand}%.3f,"cc101":$cc101%.3f,""" +
          f""""pairs61_build":$pairs61%.3f,"cc61":$cc61%.3f}"""
      )
    } finally spark.stop()
  }
}
