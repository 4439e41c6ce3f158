package graft.tools

import graft.operators.{Retrieval, Similarity}

/** Offline BM25 inverted-index builder — the lexical sibling of
  * [[AnnBuild]]. Persists the posting-list table (term, doc_id, tf, dl),
  * bucketed by term, plus the corpus-stats slices for a data dir into an
  * index dir; query sessions then set `graft.bm25.indexDir` and q122 serves
  * retrieval off a few bucket files instead of a corpus scan.
  *
  *   bin/graft.sh bm25-build <dataDir> <indexDir> [--append | --compact]
  *   sbt "runMain graft.tools.Bm25Build /root/testdata/sf0.1 /tmp/bm25idx"
  *
  * Same contract as ann-build: idempotent (a current sidecar is skipped),
  * `--append` extends an append-only corpus change with delta postings +
  * a delta stats slice (exact — BM25's df/consts are derived at query
  * time, nothing is frozen), `--compact` folds accumulated append files
  * into one set per bucket.
  */
object Bm25Build {

  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    if (positional.length != 2 || flags.exists(f => f != "--append" && f != "--compact")) {
      System.err.println("usage: Bm25Build <dataDir> <indexDir> [--append | --compact]")
      sys.exit(2)
    }
    val Array(dataDir, indexDir) = positional
    val spark = graft.core.Sessions.local("graft-bm25-build")
    try {
      spark.conf.set(Retrieval.Bm25IndexDirConf, indexDir)
      if (flags.contains("--compact")) {
        val did = Retrieval.compactBm25Index(spark, dataDir, indexDir)
        println(s"[bm25-build] postings: ${if (did) "compacted" else "already compact / no index"}")
      } else {
        if (flags.contains("--append")) spark.conf.set(Retrieval.Bm25RefreshConf, "append")
        val what = Retrieval.persistBm25Index(spark, dataDir, indexDir) match {
          case Similarity.Current     => "current, skipped"
          case Similarity.Rebuilt     => "written"
          case Similarity.Appended(n) => s"appended $n new docs"
        }
        println(s"[bm25-build] postings: $what")
      }
      println(s"[bm25-build] index dir ready: $indexDir (serve with ${Retrieval.Bm25IndexDirConf}=$indexDir)")
    } finally spark.stop()
  }
}
