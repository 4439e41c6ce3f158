package graft.tools

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Similarity

/** The offline index-builder entry point: one invocation materializes every
  * ANN family (both profiles' LSH/IVF geometry plus the profile-independent
  * PQ and IVF-PQ artifacts), a second invocation skips everything, and a
  * cold session pointed at the index dir serves the persisted layout.
  */
class AnnBuildSpec extends SparkSpec {

  test("ann-build persists every family once, then skips; cold session serves it") {
    val indexDir = Files.createTempDirectory("annbuild").toString

    val first = AnnBuild.run(spark, sfDir, indexDir, Seq("fast", "quality"))
    assert(
      first.map(_._1) === Seq("lsh(fast)", "ivf(fast)", "lsh(quality)", "ivf(quality)", "pq", "ivfpq"),
      first
    )
    assert(
      first.forall(_._2 == Similarity.Rebuilt),
      s"every family should be built on first run: $first"
    )

    val second = AnnBuild.run(spark, sfDir, indexDir, Seq("fast", "quality"))
    assert(
      second.forall(_._2 == Similarity.Current),
      s"re-build over a current index dir must skip everything: $second"
    )

    // the builder must leave the caller's profile conf untouched
    assert(spark.conf.getOption(Similarity.ProfileConf).isEmpty)

    // every family left a sidecar-committed artifact on disk, keyed by
    // family prefix (lsh/ivf per profile suffix, pq, ivfpq)
    val entries = new java.io.File(indexDir).listFiles().map(_.getName).toSeq
    for (prefix <- Seq("lsh_", "ivf_", "pq_", "ivfpq_"))
      assert(entries.exists(_.startsWith(prefix)), s"no $prefix artifact in $entries")
    assert(entries.count(_.startsWith("lsh_")) === 2, s"one LSH artifact per profile: $entries")

    // cold session (fresh caches/registry, index dir conf set) serves the
    // persisted geometry; SimilarityPersistSpec proves the served results
    // are identical — here we prove the builder's output is servable
    val s2 = spark.newSession()
    s2.conf.set(Similarity.IndexDirConf, indexDir)
    assert(Similarity.q35LshTopK(s2, sfDir).count() > 0)
    assert(Similarity.q76IvfPqTopK(s2, sfDir).count() > 0)
  }
}
