package graft.tools

import org.apache.spark.sql.DataFrame

import graft.operators.Dedup

/** Stage decomposition of q113's md5-affine path (the r15 watch item: the
  * promoted path costs ~2x the native xxhash64 twin at sf0.1 with the
  * signature build already staged — where does the residual go?).
  *
  * Times, on the given SF dir (run IDLE — this is a measurement tool):
  *   - `sigs`:   the md5 token-signature stage build (the `q113_sigs`
  *               bench phase; session-cached after the first call),
  *   - `cand`:   the train-probes-test band-TUPLE candidate join,
  *   - `verify`: candidates + the exact sorted-merge Jaccard verify
  *               (UNORDERED — the delta over `cand` is the verify cost),
  *   - `full`:   the registered query (delta over `verify` is the orderBy),
  *   - `native`: the xxhash64 twin end-to-end, for the constant-factor
  *               comparison (runs on a conf-cloned session so the serving
  *               session's conf is never mutated).
  *
  * Usage: `sbt "runMain graft.tools.ProfileQ113 /root/testdata/sf0.1 [reps]"`
  */
object ProfileQ113 {
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
    require(args.nonEmpty, "usage: ProfileQ113 <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.Sessions.local("graft-profile-q113")
    try {
      def drain(df: DataFrame): Unit = { df.collect(); () }
      val sigs = sec(Dedup.buildMd5TokenSigStage(spark, dir))
      val cand = medianOf(reps)(drain(Dedup.q113Md5Candidates(spark, dir)))
      val nCand = Dedup.q113Md5Candidates(spark, dir).count()
      val verify = medianOf(reps)(drain(Dedup.q113Md5Verified(spark, dir)))
      val full = medianOf(reps)(drain(Dedup.q113NeardupContamination(spark, dir)))
      val native = {
        val m = spark.newSession()
        m.conf.set("graft.dedup.minhash", "native")
        medianOf(reps)(drain(Dedup.q113NeardupContamination(m, dir)))
      }
      println(
        f"""{"tool":"profile_q113","dir":"$dir","reps":$reps,"sigs_build":$sigs%.3f,""" +
          f""""cand":$cand%.3f,"n_cand":$nCand,"verify":$verify%.3f,"full":$full%.3f,""" +
          f""""orderby_delta":${full - verify}%.3f,"verify_delta":${verify - cand}%.3f,"native_full":$native%.3f}"""
      )
    } finally spark.stop()
  }
}
