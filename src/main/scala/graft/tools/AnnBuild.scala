package graft.tools

import graft.operators.Similarity

/** Offline ANN index builder — the deployment entry point for the
  * build-once / serve-everywhere contract. Persists every index family
  * (LSH buckets, IVF centroids+assignments, PQ codebooks+codes, IVF-PQ)
  * for a data dir into an index dir; query sessions then set
  * `graft.ann.indexDir` and serve the persisted layout with zero build
  * work. Each persist is idempotent: a current index (matching data
  * fingerprint + geometry sidecar) is skipped, a stale one is rebuilt.
  *
  *   bin/graft.sh ann-build <dataDir> <indexDir> [--append | --compact] [profile ...]
  *   sbt "runMain graft.tools.AnnBuild /root/testdata/sf0.1 /tmp/annidx"
  *
  * Profiles default to `fast`; pass `fast quality` to materialize both
  * (profile-keyed artifacts coexist — a query session serves whichever
  * matches its own `graft.ann.profile`). PQ / IVF-PQ geometry is
  * profile-independent and is built once. `--append` sets
  * `graft.ann.refresh=append`: an ingest tick whose change is append-only
  * extends each index under its persisted geometry instead of retraining —
  * the refresh cadence a 100 TB corpus actually runs (periodic full
  * rebuilds remain one `ann-build` without the flag). `--compact` rewrites
  * each family's accumulated append files into one set per bucket without
  * touching geometry or content — the maintenance pass between rebuilds.
  */
object AnnBuild {

  /** Persist every family; returns (family -> outcome) in build order. */
  def run(
      spark: org.apache.spark.sql.SparkSession,
      dataDir: String,
      indexDir: String,
      profiles: Seq[String]
  ): Seq[(String, Similarity.PersistOutcome)] = {
    val prior = spark.conf.getOption(Similarity.ProfileConf)
    try {
      val perProfile = profiles.flatMap { prof =>
        spark.conf.set(Similarity.ProfileConf, prof)
        Seq(
          s"lsh($prof)" -> Similarity.persistLshIndex(spark, dataDir, indexDir),
          s"ivf($prof)" -> Similarity.persistIvfIndex(spark, dataDir, indexDir)
        )
      }
      perProfile ++ Seq(
        "pq" -> Similarity.persistPqIndex(spark, dataDir, indexDir),
        "ivfpq" -> Similarity.persistIvfPqIndex(spark, dataDir, indexDir)
      )
    } finally prior.fold(spark.conf.unset(Similarity.ProfileConf))(
      spark.conf.set(Similarity.ProfileConf, _)
    )
  }

  /** Geometry-preserving compaction of every family's persisted table —
    * the maintenance pass between rebuilds once append ticks have
    * accumulated multi-file buckets. Returns (family -> compacted?);
    * false = already one file set per bucket, or no current index.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      dataDir: String,
      indexDir: String,
      profiles: Seq[String]
  ): Seq[(String, Boolean)] = {
    val prior = spark.conf.getOption(Similarity.ProfileConf)
    try {
      val perProfile = profiles.flatMap { prof =>
        spark.conf.set(Similarity.ProfileConf, prof)
        Seq(
          s"lsh($prof)" -> Similarity.compactLshIndex(spark, dataDir, indexDir),
          s"ivf($prof)" -> Similarity.compactIvfIndex(spark, dataDir, indexDir)
        )
      }
      perProfile ++ Seq(
        "pq" -> Similarity.compactPqIndex(spark, dataDir, indexDir),
        "ivfpq" -> Similarity.compactIvfPqIndex(spark, dataDir, indexDir)
      )
    } finally prior.fold(spark.conf.unset(Similarity.ProfileConf))(
      spark.conf.set(Similarity.ProfileConf, _)
    )
  }

  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    if (positional.length < 2 || flags.exists(f => f != "--append" && f != "--compact")) {
      System.err.println("usage: AnnBuild <dataDir> <indexDir> [--append | --compact] [profile ...]")
      sys.exit(2)
    }
    val Array(dataDir, indexDir) = positional.take(2)
    val profiles = if (positional.length > 2) positional.drop(2).toSeq else Seq("fast")
    val spark = graft.core.Sessions.local("graft-ann-build")
    try {
      spark.conf.set(Similarity.IndexDirConf, indexDir)
      if (flags.contains("--compact")) {
        compact(spark, dataDir, indexDir, profiles).foreach { case (family, did) =>
          println(s"[ann-build] $family: ${if (did) "compacted" else "already compact / no index"}")
        }
      } else {
        if (flags.contains("--append")) spark.conf.set(Similarity.RefreshConf, "append")
        run(spark, dataDir, indexDir, profiles).foreach { case (family, outcome) =>
          val what = outcome match {
            case Similarity.Current     => "current, skipped"
            case Similarity.Rebuilt     => "written"
            case Similarity.Appended(n) => s"appended $n new rows"
          }
          println(s"[ann-build] $family: $what")
        }
      }
      println(s"[ann-build] index dir ready: $indexDir (serve with ${Similarity.IndexDirConf}=$indexDir)")
    } finally spark.stop()
  }
}
