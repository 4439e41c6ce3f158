package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** Live index maintenance: file drops in the embeddings directory drive
  * append-only refresh ticks — a redundant tick is a no-op (`Current`), a
  * tick over newly landed rows appends exactly the delta under the frozen
  * geometry, and a cold session then serves the grown index.
  */
class StreamingIndexerSpec extends SparkSpec {

  test("ticks append newly landed embedding files; redelivery is a no-op") {
    val indexDir = Files.createTempDirectory("annidx").toString
    val dataDir = Files.createTempDirectory("anndata").toString
    val src = graft.core.Tables.embeddings(spark, sfDir)
    src
      .filter(col("vec_id") < 30)
      .write
      .mode("overwrite")
      .parquet(s"$dataDir/embeddings.parquet")

    // initial full build (the nightly ann-build)
    assert(
      graft.tools.AnnBuild.run(spark, dataDir, indexDir, Seq("fast")).forall(_._2 == Similarity.Rebuilt)
    )

    val outcomes = scala.collection.mutable.Buffer.empty[Seq[(String, Similarity.PersistOutcome)]]

    // drain 1: the initial file is an unseen batch, but the index already
    // covers those rows — the tick must be a no-op, not a double-index
    StreamingIndexer.start(spark, dataDir, indexDir, onTick = outcomes += _).awaitTermination()
    assert(outcomes.nonEmpty, "AvailableNow over existing files should fire one tick")
    assert(
      outcomes.last.forall(_._2 == Similarity.Current),
      s"already-indexed rows must tick to Current: ${outcomes.last}"
    )

    // 20 more rows land as new part files
    src
      .filter(col("vec_id") >= 30 && col("vec_id") < 50)
      .write
      .mode("append")
      .parquet(s"$dataDir/embeddings.parquet")

    StreamingIndexer.start(spark, dataDir, indexDir, onTick = outcomes += _).awaitTermination()
    assert(
      outcomes.last.forall(_._2 == Similarity.Appended(20)),
      s"a tick over 20 new rows must append exactly 20 everywhere: ${outcomes.last}"
    )

    // a cold session serves the grown index
    val s2 = spark.newSession()
    s2.conf.set(Similarity.IndexDirConf, indexDir)
    assert(Similarity.buildLshIndex(s2, dataDir).select("vec_id").distinct().count() === 50L)
    assert(Similarity.buildPqIndex(s2, dataDir)._2.count() === 50L)
  }

  test("bm25 ticks append newly landed document files; served == scan path; redelivery no-op") {
    import graft.operators.Retrieval
    val indexDir = Files.createTempDirectory("bm25idx").toString
    val dataDir = Files.createTempDirectory("bm25data").toString
    val src = graft.core.Tables.documents(spark, sfDir)
    src.filter(col("doc_id") < 300).write.mode("overwrite").parquet(s"$dataDir/documents.parquet")
    assert(Retrieval.persistBm25Index(spark.newSession(), dataDir, indexDir) === Similarity.Rebuilt)

    val outcomes = scala.collection.mutable.Buffer.empty[Similarity.PersistOutcome]
    StreamingIndexer.startBm25(spark, dataDir, indexDir, onTick = outcomes += _).awaitTermination()
    assert(outcomes.lastOption.contains(Similarity.Current), s"already-indexed docs must tick to Current: $outcomes")

    src
      .filter(col("doc_id") >= 300 && col("doc_id") < 450)
      .write
      .mode("append")
      .parquet(s"$dataDir/documents.parquet")
    StreamingIndexer.startBm25(spark, dataDir, indexDir, onTick = outcomes += _).awaitTermination()
    assert(outcomes.lastOption.contains(Similarity.Appended(150)), s"tick must append exactly the landed docs: $outcomes")

    // a cold session serves exactly what the scan path computes over the grown corpus
    val serve = spark.newSession()
    serve.conf.set(Retrieval.Bm25IndexDirConf, indexDir)
    assert(
      Retrieval.q122Bm25Indexed(serve, dataDir).collect().toSeq ===
        Retrieval.q103Bm25(spark.newSession(), dataDir).collect().toSeq
    )
  }
}
