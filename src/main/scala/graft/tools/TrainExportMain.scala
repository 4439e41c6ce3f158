package graft.tools

import graft.operators.TrainExport

/** Offline training-shard export — the terminal step of the curation
  * pipeline as a launcher command: write the corpus as N hash-assigned,
  * md5-order-shuffled shard files and print the manifest (q83) that a
  * loader or auditor checks against them.
  *
  *   bin/graft.sh train-export <dataDir> <outDir> [--curated]
  *   sbt "runMain graft.tools.TrainExportMain /root/testdata/sf0.01 /tmp/shards"
  *
  * `--curated` exports the q77 curation-build survivors instead of the raw
  * corpus — build → export end to end.
  */
object TrainExportMain {

  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    if (positional.length != 2 || flags.exists(_ != "--curated")) {
      System.err.println("usage: TrainExportMain <dataDir> <outDir> [--curated]")
      sys.exit(2)
    }
    val Array(dataDir, outDir) = positional
    val spark = graft.core.Sessions.local("graft-train-export")
    try {
      if (flags.contains("--curated")) TrainExport.writeCurated(spark, dataDir, outDir)
      else TrainExport.write(spark, dataDir, outDir)
      println(s"[train-export] wrote ${TrainExport.N_SHARDS} shards to $outDir (seed ${TrainExport.SEED}${if (flags.contains("--curated")) ", curated" else ""})")
      TrainExport.q83ShardPlan(spark, dataDir).collect().foreach { r =>
        println(
          s"[train-export] shard=${r.getInt(0)} docs=${r.getLong(1)} tokens=${r.getLong(2)} " +
            s"keys=[${r.getString(3).take(8)}.., ${r.getString(4).take(8)}..]"
        )
      }
    } finally spark.stop()
  }
}
