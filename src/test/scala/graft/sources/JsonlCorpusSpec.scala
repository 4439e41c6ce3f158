package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JSONL source round-trip + quarantine: parquet documents written as
  * JSONL read back value-identical under the declared schema, and torn
  * lines land in the quarantine frame instead of killing the read.
  */
class JsonlCorpusSpec extends SparkSpec {

  test("documents round-trip parquet -> jsonl -> typed frame, value-identical") {
    val dir = Files.createTempDirectory("jsonl").toString
    val docs = graft.core.Tables.documents(spark, sfDir)
    docs.coalesce(1).write.mode("overwrite").json(s"$dir/docs")

    val (valid, quarantined) = JsonlCorpus.documents(spark, s"$dir/docs")
    assert(quarantined.count() === 0L, "clean input quarantines nothing")
    val a = docs.orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val b = valid
      .select(docs.columns.map(col).toSeq: _*)
      .orderBy("doc_id")
      .collect()
      .toSeq
      .map(_.toSeq)
    assert(b === a, "JSONL round-trip must be value-identical to the parquet source")
  }

  test("torn lines quarantine; valid rows still parse from the same file") {
    val dir = Files.createTempDirectory("jsonl").toString
    val file = Paths.get(dir, "mixed.jsonl")
    val good =
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "src1", "n_chars": 10}"""
    val torn = """{"doc_id": 2, "text": "gamma", "la"""
    val notJson = """<html>definitely not json</html>"""
    Files.write(file, s"$good\n$torn\n$notJson\n".getBytes("UTF-8"))

    val (valid, quarantined) = JsonlCorpus.documents(spark, file.toString)
    assert(valid.count() === 1L, "the one well-formed line parses")
    assert(valid.select("doc_id").collect().head.getLong(0) === 1L)
    val bad = quarantined.collect().map(_.getString(0)).toSet
    assert(bad === Set(torn, notJson), "every torn line lands in quarantine verbatim")
  }
}
