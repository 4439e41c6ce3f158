package graft.tools

import graft.streaming.{StreamingCorpus, StreamingDupClusters, StreamingScd2, StreamingSpanDedup}

/** CLI entry points for the incremental maintainers — one tick per
  * invocation (the cron / entrypoint shape; the file-stream variants run
  * the same tick per micro-batch).
  *
  *   bin/graft.sh scd2-maintain    <eventsDir> <historyDir>
  *   bin/graft.sh corpus-maintain  <docsDir>   <stateDir>
  *   bin/graft.sh cluster-maintain <docsDir>   <stateDir>
  *   bin/graft.sh span-maintain    <docsDir>   <stateDir>
  */
object Scd2MaintainMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: Scd2MaintainMain <eventsDir> <historyDir>")
      sys.exit(2)
    }
    val spark = graft.core.Sessions.local("graft-scd2-maintain")
    try {
      val o = StreamingScd2.tick(spark, args(0), args(1))
      println(s"[scd2-maintain] mode=${o.mode} history_rows=${o.historyRows} watermark=${o.watermark}")
    } finally spark.stop()
  }
}

object CorpusMaintainMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: CorpusMaintainMain <docsDir> <stateDir>")
      sys.exit(2)
    }
    val spark = graft.core.Sessions.local("graft-corpus-maintain")
    try {
      val o = StreamingCorpus.tick(spark, args(0), args(1))
      println(
        s"[corpus-maintain] mode=${o.mode} delta_docs=${o.nDelta} retro_contaminated=${o.retro} watermark=${o.watermark}"
      )
      StreamingCorpus
        .finalStages(spark, args(1))
        .groupBy("final_stage")
        .count()
        .orderBy("final_stage")
        .collect()
        .foreach(r => println(s"[corpus-maintain] ${r.getString(0)}=${r.getLong(1)}"))
    } finally spark.stop()
  }
}

object ClusterMaintainMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: ClusterMaintainMain <docsDir> <stateDir>")
      sys.exit(2)
    }
    val spark = graft.core.Sessions.local("graft-cluster-maintain")
    try {
      val n = StreamingDupClusters.tick(spark, args(0), args(1))
      val labels = StreamingDupClusters.readLabels(spark, args(1))
      val nClusters = labels.select("cluster").distinct().count()
      println(s"[cluster-maintain] delta_docs=$n labeled_docs=${labels.count()} clusters=$nClusters")
    } finally spark.stop()
  }
}

object SpanMaintainMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: SpanMaintainMain <docsDir> <stateDir>")
      sys.exit(2)
    }
    val spark = graft.core.Sessions.local("graft-span-maintain")
    try {
      val (n, retro) = StreamingSpanDedup.tick(spark, args(0), args(1))
      val stats = StreamingSpanDedup.readStats(spark, args(1))
      val dup = stats.filter(org.apache.spark.sql.functions.col("dup_tokens") > 0).count()
      println(s"[span-maintain] delta_docs=$n retro_recomputed=$retro tracked_docs=${stats.count()} docs_with_spans=$dup")
    } finally spark.stop()
  }
}
