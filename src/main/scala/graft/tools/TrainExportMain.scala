package graft.tools

import graft.operators.TrainExport

/** Offline training-shard export — the terminal step of the curation
  * pipeline as a launcher command: write the corpus as N hash-assigned,
  * md5-order-shuffled shard files and print the manifest (q83) that a
  * loader or auditor checks against them.
  *
  *   bin/graft.sh train-export <dataDir> <outDir>
  *   sbt "runMain graft.tools.TrainExportMain /root/testdata/sf0.01 /tmp/shards"
  */
object TrainExportMain {

  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: TrainExportMain <dataDir> <outDir>")
      sys.exit(2)
    }
    val Array(dataDir, outDir) = args
    val spark = graft.core.Sessions.local("graft-train-export")
    try {
      TrainExport.write(spark, dataDir, outDir)
      println(s"[train-export] wrote ${TrainExport.N_SHARDS} shards to $outDir (seed ${TrainExport.SEED})")
      TrainExport.q83ShardPlan(spark, dataDir).collect().foreach { r =>
        println(
          s"[train-export] shard=${r.getInt(0)} docs=${r.getLong(1)} tokens=${r.getLong(2)} " +
            s"keys=[${r.getString(3).take(8)}.., ${r.getString(4).take(8)}..]"
        )
      }
    } finally spark.stop()
  }
}
