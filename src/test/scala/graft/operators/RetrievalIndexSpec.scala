package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q122 — BM25 served from the persisted inverted index. The contract under
  * test: the index path is BIT-IDENTICAL to q103's corpus-scan path (same
  * integers into the shared score expression), the persisted table carries
  * the ANN families' sidecar/fingerprint/append protocol, and the probe
  * reads only the query terms' buckets — never the documents table.
  */
class RetrievalIndexSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** Regenerate the corpus at `dataDir` as the first `n` sf docs — growing
    * `n` is an append-only change (old rows byte-identical).
    */
  private def writeRows(dataDir: String, n: Int): Unit =
    graft.core.Tables
      .documents(spark, sfDir)
      .filter(col("doc_id") < n)
      .write
      .mode("overwrite")
      .parquet(s"$dataDir/documents.parquet")

  private def session(indexDir: String, refresh: Option[String]): SparkSession = {
    val s = spark.newSession()
    s.conf.set(Retrieval.Bm25IndexDirConf, indexDir)
    refresh.foreach(s.conf.set(Retrieval.Bm25RefreshConf, _))
    s
  }

  test("q122 in-session index path is bit-identical to the q103 scan path") {
    val scan = rowsOf(Retrieval.q103Bm25(spark, sfDir))
    val indexed = rowsOf(Retrieval.q122Bm25Indexed(spark.newSession(), sfDir))
    assert(indexed === scan, "indexed BM25 must reproduce the scan path exactly")
    assert(indexed.nonEmpty)
  }

  test("persisted index: sidecar-idempotent, serves exactly the scan path, probe is bucket-pruned off the index") {
    val indexDir = Files.createTempDirectory("bm25idx").toString
    val dataDir = Files.createTempDirectory("bm25data").toString
    writeRows(dataDir, 400)
    assert(Retrieval.persistBm25Index(session(indexDir, None), dataDir, indexDir) === Similarity.Rebuilt)
    assert(
      Retrieval.persistBm25Index(session(indexDir, None), dataDir, indexDir) === Similarity.Current,
      "a matching sidecar must be a no-op persist"
    )

    val serveSession = session(indexDir, None)
    val served = rowsOf(Retrieval.q122Bm25Indexed(serveSession, dataDir))
    val computed = rowsOf(Retrieval.q103Bm25(spark.newSession(), dataDir))
    assert(served === computed, "persisted index must serve exactly what the scan path computes")

    // the probe reads the bucketed index table with bucket-file pruning —
    // not the documents table. (The planner may mark the scan
    // `Bucketed: false` when no join needs the hash distribution, but
    // createReadRDD still drops non-matching bucket FILES whenever
    // optionalBucketSet is populated — that set is the pruning contract.)
    val probe = serveSession
      .table(Retrieval.bm25Table(dataDir))
      .filter(col("term").isin(Retrieval.QUERY_TERMS: _*))
    val scans = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, s"expected a file scan:\n${probe.queryExecution.executedPlan}")
    assert(
      scans.exists(_.optionalBucketSet.exists(bs => bs.cardinality() < 16 && bs.cardinality() > 0)),
      s"probe must prune to the query terms' buckets:\n${probe.queryExecution.executedPlan}"
    )
    assert(
      !probe.queryExecution.executedPlan.toString.contains("documents.parquet"),
      "serve probe must not scan the corpus"
    )
  }

  test("append refresh extends the index bit-identically; default policy rebuilds") {
    val indexDir = Files.createTempDirectory("bm25idx").toString
    val dataDir = Files.createTempDirectory("bm25data").toString
    writeRows(dataDir, 300)
    assert(Retrieval.persistBm25Index(session(indexDir, Some("append")), dataDir, indexDir) === Similarity.Rebuilt)

    writeRows(dataDir, 450)
    val s1 = session(indexDir, Some("append"))
    assert(Retrieval.persistBm25Index(s1, dataDir, indexDir) === Similarity.Appended(150))
    assert(Retrieval.persistBm25Index(s1, dataDir, indexDir) === Similarity.Current)

    // appended index == fresh scan: postings of old docs are untouched and
    // df/consts are derived/summed, so the append is exact, not approximate
    val served = rowsOf(Retrieval.q122Bm25Indexed(session(indexDir, None), dataDir))
    val computed = rowsOf(Retrieval.q103Bm25(spark.newSession(), dataDir))
    assert(served === computed, "appended BM25 index must serve exactly what a fresh build computes")

    // default rebuild policy retrains on the same kind of change
    // (sf0.001 holds 500 docs, so 480 is still a real grow step)
    writeRows(dataDir, 480)
    assert(Retrieval.persistBm25Index(session(indexDir, None), dataDir, indexDir) === Similarity.Rebuilt)
  }

  test("compaction folds append files to one set per bucket; serve unchanged") {
    val indexDir = Files.createTempDirectory("bm25idx").toString
    val dataDir = Files.createTempDirectory("bm25data").toString
    writeRows(dataDir, 200)
    assert(Retrieval.persistBm25Index(session(indexDir, Some("append")), dataDir, indexDir) === Similarity.Rebuilt)
    for (n <- Seq(300, 400, 500)) {
      writeRows(dataDir, n)
      assert(
        Retrieval
          .persistBm25Index(session(indexDir, Some("append")), dataDir, indexDir)
          .isInstanceOf[Similarity.Appended],
        s"grow to $n must append"
      )
    }
    // three appends accumulated multi-file buckets
    def dataFiles() = new java.io.File(indexDir)
      .listFiles()
      .filter(_.getName.startsWith("bm25_"))
      .filterNot(_.getName.endsWith("_stats"))
      .head
      .listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val before = dataFiles()
    val served0 = rowsOf(Retrieval.q122Bm25Indexed(session(indexDir, None), dataDir))
    assert(Retrieval.compactBm25Index(spark.newSession(), dataDir, indexDir), "multi-file buckets must compact")
    assert(dataFiles() < before, s"file count must drop (was $before)")
    assert(!Retrieval.compactBm25Index(spark.newSession(), dataDir, indexDir), "already compact")
    val served1 = rowsOf(Retrieval.q122Bm25Indexed(session(indexDir, None), dataDir))
    assert(served1 === served0, "compaction must not change served results")
  }

  test("switching index dirs re-points the catalog table — never the old location's postings") {
    val dirA = Files.createTempDirectory("bm25idxA").toString
    val dirB = Files.createTempDirectory("bm25idxB").toString
    val dataDir = Files.createTempDirectory("bm25data").toString
    writeRows(dataDir, 300)
    val s = session(dirA, None)
    assert(Retrieval.persistBm25Index(s, dataDir, dirA) === Similarity.Rebuilt)
    assert(Retrieval.q122Bm25Indexed(s, dataDir).collect().nonEmpty) // table now bound to dirA

    // corpus changes; a FRESH index lands at dirB and the session switches
    writeRows(dataDir, 500)
    assert(Retrieval.persistBm25Index(s, dataDir, dirB) === Similarity.Rebuilt)
    s.conf.set(Retrieval.Bm25IndexDirConf, dirB)
    val served = rowsOf(Retrieval.q122Bm25Indexed(s, dataDir))
    val computed = rowsOf(Retrieval.q103Bm25(spark.newSession(), dataDir))
    assert(
      served === computed,
      "dirB's validated sidecar must serve dirB's files — a refresh-only register would keep reading dirA"
    )
  }

  test("a stale index (non-append data change) is never served") {
    val indexDir = Files.createTempDirectory("bm25idx").toString
    val dataDir = Files.createTempDirectory("bm25data").toString
    writeRows(dataDir, 400)
    assert(Retrieval.persistBm25Index(session(indexDir, None), dataDir, indexDir) === Similarity.Rebuilt)

    // shrink the corpus: fingerprint mismatch — the serve session must fall
    // back to an in-session build over the CURRENT data
    writeRows(dataDir, 200)
    val served = rowsOf(Retrieval.q122Bm25Indexed(session(indexDir, None), dataDir))
    val computed = rowsOf(Retrieval.q103Bm25(spark.newSession(), dataDir))
    assert(served === computed, "stale persisted index must not be served")
  }
}
