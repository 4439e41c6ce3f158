package graft.tools

import graft.SparkSpec

/** The report is a view over the oracle-gated inventory — assert every
  * section renders and carries real rows at sf0.001.
  */
class CorpusReportSpec extends SparkSpec {

  test("corpus report renders every section with data") {
    val r = CorpusReport.report(spark, sfDir)
    for (
      header <- Seq(
        "corpus:",
        "curation build (q77)",
        "dynamic quality floors (q80)",
        "source overlap (q81)",
        "source similarity sketch (q134)",
        "char entropy (q135)",
        "ingest saturation (q137)",
        "label purity (q136)",
        "vocabulary growth (q82)",
        "curriculum stages (q86)",
        "duplicate clusters (q99)",
        "dedup profile (q117)",
        "source drift (q128)",
        "quality signals: model AUC vs rules (q126), rank agreement rules~LM (q131)",
        "embedding topic map (q123) with outlier counts (q129)",
        "train shards (q83)"
      )
    ) assert(r.contains(header), s"missing section: $header\n$r")
    assert(r.contains("js="), "drift rows must render")
    assert(r.contains("rho="), "agreement rows must render")
    assert(r.contains("outliers="), "topic rows must render")
    assert(r.contains("jaccard_est="), "sketch rows must render")
    assert(r.contains("mean_entropy="), "entropy rows must render")
    assert(r.contains("mean_purity="), "purity rows must render")
    // per-source rows actually rendered (src0..src19 exist at every SF)
    assert(r.contains("src0"), r.take(500))
    // all 8 shards in the manifest
    (0 until graft.operators.TrainExport.N_SHARDS)
      .foreach(s2 => assert(r.contains(s"shard=$s2"), s"missing shard $s2"))
    // doc total in the corpus line matches the table
    val n = graft.core.Tables.documents(spark, sfDir).count()
    assert(r.contains(s"docs=$n"), "corpus overview doc count")
  }

  test("q151 report row survives a degenerate source (NULL slope renders '-', does not throw)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zipfdeg").toString
    // one source whose every token is the same term: single distinct term,
    // OLS variance 0 -> q151 emits a NULL slope by contract — exactly the
    // corpus the report's standalone q151 section used to throw on
    Seq((0L, "same same same same", "en", "degsrc", 19L), (1L, "a b c d e f g a a b", "en", "okgsrc", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write
      .parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextOps.q151ZipfFit(spark, dir).collect()
    val deg = rows.find(_.getString(0) == "degsrc").get
    assert(deg.isNullAt(2), "single-distinct-term source must carry a NULL slope")
    val rendered = rows.map(CorpusReport.zipfRow)
    assert(rendered.exists(l => l.startsWith("degsrc") && l.contains("slope=       -")), rendered.mkString("\n"))
    assert(rendered.exists(l => l.startsWith("okgsrc") && !l.contains("slope=       -")), rendered.mkString("\n"))
  }
}
