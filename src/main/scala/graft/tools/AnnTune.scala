package graft.tools

import org.apache.spark.sql.DataFrame

import graft.operators.{Dedup, Similarity}

/** ANN recall/scan-fraction sweep — the tuning companion to Bench's
  * `quality` numbers. Prints, for the uniform corpus AND the planted
  * clustered corpus, recall@10 vs the exact baseline at each multiprobe /
  * nprobe setting, with the measured candidate fraction. Run:
  *
  *   sbt "runMain graft.tools.AnnTune /root/testdata/sf0.1"
  *   (or SPARK_GRAFT_SF_DIR=... with no argument)
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Sessions.local("graft-ann-tune")

    def topkSet(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(got: Set[(Long, Long)], want: Set[(Long, Long)]): Double =
      if (want.isEmpty) Double.NaN else got.intersect(want).size.toDouble / want.size

    val n = graft.core.Tables.embeddings(spark, sfDir).count()
    println(s"corpus n=$n dir=$sfDir")

    val exactU = topkSet(Similarity.q34BruteForceTopK(spark, sfDir))
    val exactP = topkSet(Similarity.plantedBruteTopK(spark, sfDir))
    for (m <- 0 to 4) {
      spark.conf.set(Similarity.LshProbesConf, m.toString)
      val ru = recall(topkSet(Similarity.q35LshTopK(spark, sfDir)), exactU)
      val rp = recall(topkSet(Similarity.plantedLshTopK(spark, sfDir, m)), exactP)
      val frac = Similarity.plantedLshCandidateCount(spark, sfDir, m).toDouble / (5.0 * n)
      println(f"lsh m=$m uniform=$ru%.3f planted=$rp%.3f planted_cand_frac=$frac%.3f")
    }
    spark.conf.unset(Similarity.LshProbesConf)

    for (np <- 1 to 6) {
      spark.conf.set(Similarity.IvfNprobeConf, np.toString)
      val ru = recall(topkSet(Similarity.q36IvfTopK(spark, sfDir)), exactU)
      val rp = recall(topkSet(Similarity.plantedIvfTopK(spark, sfDir, np)), exactP)
      val frac = Similarity.plantedIvfCandidateCount(spark, sfDir, np).toDouble / (5.0 * n)
      println(f"ivf np=$np uniform=$ru%.3f planted=$rp%.3f planted_cand_frac=$frac%.3f")
    }
    spark.conf.unset(Similarity.IvfNprobeConf)

    val exactPairsP = pairSet(Dedup.plantedExactNearDup(spark, sfDir))
    val lshPairsP = pairSet(Dedup.plantedLshNearDup(spark, sfDir))
    println(f"q60 planted pairs exact=${exactPairsP.size} lsh_recall=${recall(lshPairsP, exactPairsP)}%.3f")
    val exactPairsU = pairSet(Dedup.q33EmbeddingNearDup(spark, sfDir))
    val lshPairsU = pairSet(Dedup.q60LshNearDup(spark, sfDir))
    println(f"q60 uniform pairs exact=${exactPairsU.size} lsh_recall=${recall(lshPairsU, exactPairsU)}%.3f")

    spark.stop()
  }
}
