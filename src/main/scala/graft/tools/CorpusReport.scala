package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Cartography, Curation, Dedup, Importance, TextOps, TrainExport}

/** One-command corpus health report — the diagnostic battery a curator
  * reads before (and after) committing to a build: the q77 stage funnel,
  * per-language dynamic quality floors (q80), the cross-source mirror
  * matrix (q81) with its sketch-estimated twin (q134), vocabulary growth
  * (q82), char-entropy verdicts (q135), duplicate-cluster canon
  * decisions (q99), the per-source dedup profile (q117), source drift vs
  * the corpus mix (q128), quality-model AUC + signal agreement (q126/q131),
  * the embedding topic map with its outlier counts (q123/q129), kNN label
  * purity (q136), the ingest-saturation curve (q137), the phrase
  * blocklist screen (q140), embedding ingest drift (q141), quality-model
  * calibration (q143), the LSH band planner (q146), DoReMi mixture
  * weights (q147), the repetition budget (q149), distinct-n diversity
  * (q150), the Zipf fit (q151), the winnow contamination screen (q152),
  * the constraint audit (q153), class cohesion (q155), image dup
  * clusters (q156), the trained quality model trace + trained-vs-fixed
  * AUC (q159/q160), the image-text alignment screen (q161), the
  * verbatim-run length profile (q162), the per-source health scorecard
  * (q168), the bloom decontamination economics (q166) next to the
  * UniMax sampling plan (q167), the media dedup profile (q176) with its
  * boilerplate-fingerprint audit (q177), its per-key hot ledger (q183)
  * and the df-capped image mine
  * (q181), the image decontamination
  * screen (q178) with the cross-modal decontamination surface (q179),
  * its method-overlap matrix (q184),
  * and the decontamination mask export (q182),
  * the syndication centrality ranking (q185),
  * and the shard manifest (q83),
  * rendered as one text
  * page. Every number comes from the same oracle-gated queries the driver
  * checks — the report is a VIEW over the inventory, not a second
  * implementation.
  *
  *   bin/graft.sh corpus-report <dataDir>
  *   sbt "runMain graft.tools.CorpusReport /root/testdata/sf0.01"
  */
object CorpusReport {

  /** The rendered report. Collect sizes are all per-source / per-lang /
    * per-shard aggregates (dozens of rows) — never corpus rows.
    */
  /** q151's report row. slope is NULL for a degenerate single-distinct-term
    * source (OLS variance 0 — exactly the corpora the q151 null contract
    * exists for): render "-" like q168's d() instead of throwing on
    * getDouble(null).
    */
  private[tools] def zipfRow(r: org.apache.spark.sql.Row): String = {
    val slope = if (r.isNullAt(2)) "       -" else f"${r.getDouble(2)}%+8.4f"
    f"${r.getString(0)}%-8s k=${r.getLong(1)}%3d slope=$slope ${r.getString(3)}"
  }

  def report(spark: SparkSession, dir: String): String = {
    val sb = new StringBuilder
    def section(title: String): Unit = sb.append(s"\n== $title ==\n")
    def line(s: String): Unit = sb.append(s).append('\n')

    val docs = graft.core.Tables.documents(spark, dir)
    val o = docs
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("lang")).as("langs"),
        countDistinct(col("source")).as("sources"),
        sum(col("n_chars")).as("chars")
      )
      .head()
    section(s"corpus: $dir")
    line(s"docs=${o.getLong(0)} langs=${o.getLong(1)} sources=${o.getLong(2)} chars=${o.getLong(3)}")

    section("curation build (q77): docs per stage, by source")
    Curation.q77CorpusBuild(spark, dir).collect().foreach { r =>
      val kept = r.getLong(7)
      val in = r.getLong(1)
      line(
        f"${r.getString(0)}%-8s in=$in%5d rules=${r.getLong(2)}%4d held_out=${r.getLong(3)}%4d " +
          f"dup=${r.getLong(4)}%4d contam=${r.getLong(5)}%4d sampled_out=${r.getLong(6)}%4d " +
          f"kept=$kept%5d (${if (in == 0) 0.0 else 100.0 * kept / in}%5.1f%%)"
      )
    }

    section("dynamic quality floors (q80): per-language keep-top-90%")
    TextOps.q80DynamicThreshold(spark, dir).collect().foreach { r =>
      line(
        f"${r.getString(0)}%-4s threshold=${r.getDouble(2)}%8.4f kept=${r.getLong(3)}%5d/${r.getLong(1)}%-5d " +
          f"mean_kept=${r.getDouble(5)}%8.4f"
      )
    }

    section("source overlap (q81): top pairs by containment")
    val overlap = Curation.q81SourceOverlap(spark, dir).collect().sortBy(-_.getDouble(5))
    if (overlap.isEmpty) line("no overlapping source pairs")
    overlap.take(5).foreach { r =>
      line(
        f"${r.getString(0)}%-8s ~ ${r.getString(1)}%-8s shared=${r.getLong(2)}%6d " +
          f"containment=${r.getDouble(5)}%7.4f"
      )
    }

    section("source similarity sketch (q134): top pairs by estimated jaccard")
    val sketch = Curation.q134SourceSketch(spark, dir).collect().sortBy(-_.getDouble(4))
    if (sketch.isEmpty) line("no source pairs")
    sketch.take(5).foreach { r =>
      line(
        f"${r.getString(0)}%-8s ~ ${r.getString(1)}%-8s match=${r.getLong(2)}%2d/${r.getLong(3)} " +
          f"jaccard_est=${r.getDouble(4)}%7.4f"
      )
    }

    section("char entropy (q135): verdict distribution")
    TextOps
      .q135CharEntropy(spark, dir)
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n"), avg(col("entropy_nats")).as("mean_ent"))
      .orderBy(col("verdict"))
      .collect()
      .foreach(r => line(f"${r.getString(0)}%-6s docs=${r.getLong(1)}%5d mean_entropy=${r.getDouble(2)}%7.4f nats"))

    section("vocabulary growth (q82): type-token ratio per source")
    TextOps.q82VocabGrowth(spark, dir).collect().foreach { r =>
      line(
        f"${r.getString(0)}%-8s docs=${r.getLong(1)}%5d tokens=${r.getLong(2)}%8d " +
          f"distinct=${r.getLong(3)}%6d hapax=${r.getLong(4)}%5d ttr=${r.getDouble(5)}%8.6f"
      )
    }

    section("curriculum stages (q86): quality quartiles per language")
    Curation.q86Curriculum(spark, dir).collect().foreach { r =>
      line(
        f"${r.getString(0)}%-4s stage=${r.getInt(1)} docs=${r.getLong(2)}%5d tokens=${r.getLong(3)}%8d " +
          f"prob=[${r.getDouble(5)}%.4f, ${r.getDouble(6)}%.4f] mean=${r.getDouble(4)}%.4f"
      )
    }

    section("duplicate clusters (q99): quality-ranked canon keep/drop")
    val canon = Dedup.q99ClusterCanon(spark, dir).collect()
    if (canon.isEmpty) line("no duplicate clusters")
    else {
      canon.foreach { r =>
        line(
          f"cluster=${r.getLong(0)}%6d size=${r.getLong(1)}%3d keep=doc_${r.getLong(2)}%-6d " +
            f"prob=${r.getDouble(3)}%.4f dropped=${r.getLong(4)}%3d"
        )
      }
      line(f"total dropped: ${canon.map(_.getLong(4)).sum}")
    }

    section("syndication matrix (q142): top source pairs by shared dup clusters")
    val synd = Dedup.q142SyndicationMatrix(spark, dir).collect().sortBy(-_.getLong(2))
    if (synd.isEmpty) line("no cross-source dup clusters")
    synd.take(5).foreach { r =>
      line(
        f"${r.getString(0)}%-8s ~ ${r.getString(1)}%-8s clusters=${r.getLong(2)}%4d " +
          f"docs=${r.getLong(3)}%4d/${r.getLong(4)}%-4d"
      )
    }

    section("syndication centrality (q185): sources ranked by dup-flow PageRank")
    Dedup.q185SyndicationRank(spark, dir).collect().take(5).foreach { r =>
      line(
        f"#${r.getLong(0)}%2d ${r.getString(1)}%-8s centrality=${r.getLong(4)}%6d micro " +
          f"partners=${r.getLong(2)}%3d shared_clusters=${r.getLong(3)}%4d"
      )
    }

    section("dedup profile (q117): duplication by granularity, per source")
    Dedup.q117DedupProfile(spark, dir).collect().foreach { r =>
      line(
        f"${r.getString(0)}%-8s docs=${r.getLong(1)}%5d exact=${r.getDouble(2)}%8.6f " +
          f"clustered=${r.getDouble(3)}%8.6f passage=${r.getDouble(4)}%8.6f span=${r.getDouble(5)}%8.6f"
      )
    }

    section("source drift (q128): JS divergence vs the corpus mix")
    Importance.q128SourceDrift(spark, dir).collect().foreach { r =>
      line(
        f"${r.getString(0)}%-8s tokens=${r.getLong(1)}%8d js=${r.getDouble(2)}%8.6f" +
          (if (r.getInt(3) == 1) "  DRIFTED" else "")
      )
    }

    section("quality signals: model AUC vs rules (q126), rank agreement rules~LM (q131)")
    val auc = Curation.q126QualityAuc(spark, dir).collect().map(r =>
      r.getString(0) -> (if (r.isNullAt(3)) "null" else f"${r.getDouble(3)}%.4f")).toMap
    val rho = Curation.q131SignalAgreement(spark, dir).collect().map(r =>
      r.getString(0) -> (if (r.isNullAt(3)) "null" else f"${r.getDouble(3)}%.4f")).toMap
    (auc.keySet ++ rho.keySet).toSeq.sorted.foreach { lang =>
      line(f"$lang%-4s auc=${auc.getOrElse(lang, "-")}%-7s rho=${rho.getOrElse(lang, "-")}%-7s")
    }

    section("embedding topic map (q123) with outlier counts (q129)")
    val outliers = Cartography
      .q129EmbeddingOutliers(spark, dir)
      .groupBy(col("cluster"))
      .agg(sum(col("outlier")).as("n_out"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    Cartography.q123CorpusTopics(spark, dir).collect().foreach { r =>
      line(
        f"cluster=${r.getInt(0)} vecs=${r.getLong(1)}%5d share=${r.getDouble(2)}%7.4f " +
          f"top_lang=${r.getString(3)}%-4s msd=${r.getDouble(5)}%9.4f outliers=${outliers.getOrElse(r.getInt(0), 0L)}"
      )
    }

    section("ingest saturation (q137): novelty per ingest segment")
    Dedup.q137IngestSaturation(spark, dir).collect().foreach { r =>
      line(
        f"bucket=${r.getInt(0)}%2d docs=${r.getLong(1)}%5d novel=${r.getLong(2)}%5d " +
          f"novelty=${r.getDouble(3)}%6.4f cum_novelty=${r.getDouble(6)}%6.4f"
      )
    }

    section("blocklist screen (q140): per-source phrase-blocklist impact")
    Curation.q140BlocklistScreen(spark, dir).collect().foreach { r =>
      val top =
        if (r.isNullAt(5)) "-"
        else s"${r.getString(5)} (${r.getLong(6)})"
      line(
        f"${r.getString(0)}%-8s blocked=${r.getLong(2)}%4d/${r.getLong(1)}%-5d " +
          f"share=${r.getDouble(3)}%6.4f tokens=${r.getLong(4)}%7d top=$top"
      )
    }

    section("embedding ingest drift (q141): segment centroid vs corpus")
    Cartography.q141EmbeddingDrift(spark, dir).collect().foreach { r =>
      line(
        f"bucket=${r.getLong(0)}%2d vecs=${r.getLong(1)}%5d cos=${r.getDouble(2)}%8.4f" +
          (if (r.getString(3) == "drifted") "  DRIFTED" else "")
      )
    }

    section("label purity (q136): per-label kNN agreement")
    graft.operators.Similarity
      .q136KnnPurity(spark, dir)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        avg(col("purity")).as("mean_purity"),
        sum(when(col("suspect"), 1L).otherwise(0L)).as("n_suspect")
      )
      .orderBy(col("label"))
      .collect()
      .foreach { r =>
        line(
          f"label=${r.getInt(0)}%2d vecs=${r.getLong(1)}%5d mean_purity=${r.getDouble(2)}%6.4f " +
            f"suspect=${r.getLong(3)}%5d"
        )
      }

    section("quality-model calibration (q143): pass rate vs predicted, per prob bucket")
    Curation.q143QualityCalibration(spark, dir).collect().foreach { r =>
      line(
        f"bucket=${r.getLong(0)} docs=${r.getLong(1)}%5d pass_rate=${r.getDouble(3)}%6.4f " +
          f"mean_prob=${r.getDouble(4)}%6.4f gap=${r.getDouble(5)}%+7.4f" +
          (if (r.getString(6) == "miscalibrated") "  MISCALIBRATED" else "")
      )
    }

    section("LSH band planner (q146): expected recall per K=16 shape")
    Dedup.q146LshPlan(spark, dir).collect().foreach { r =>
      line(
        f"r=${r.getInt(0)}%2d b=${r.getInt(1)}%2d recall=${r.getDouble(3)}%8.6f " +
          f"nearmiss_mass=${r.getDouble(5)}%8.6f ${r.getString(6)}"
      )
    }

    section("DoReMi weights (q147): excess proxy loss -> mixture weight, per source")
    Curation.q147DoremiWeights(spark, dir).collect().foreach { r =>
      line(
        f"${r.getString(0)}%-8s nll=${r.getDouble(3)}%8.4f excess=${r.getDouble(4)}%8.6f " +
          f"natural=${r.getDouble(5)}%8.6f doremi=${r.getDouble(6)}%8.6f ${r.getString(7)}"
      )
    }

    section("repetition budget (q149): effective tokens at 4 epochs, per source")
    Curation.q149RepetitionBudget(spark, dir).filter(col("epochs") === 4).collect().foreach { r =>
      line(
        f"${r.getString(0)}%-8s unique=${r.getLong(3)}%8d read=${r.getLong(4)}%8d " +
          f"effective=${r.getLong(5)}%8d efficiency=${r.getDouble(6)}%6.4f ${r.getString(7)}"
      )
    }

    section("distinct-n diversity (q150): distinct-2 per source (collapse detector)")
    TextOps.q150DistinctN(spark, dir).filter(col("n") === 2).collect().foreach { r =>
      line(
        f"${r.getString(0)}%-8s grams=${r.getLong(2)}%7d distinct=${r.getLong(3)}%7d " +
          f"ratio=${r.getDouble(4)}%6.4f" + (if (r.getString(5) == "collapsed") "  COLLAPSED" else "")
      )
    }

    section("Zipf fit (q151): rank-frequency slope per source")
    TextOps.q151ZipfFit(spark, dir).collect().foreach(r => line(zipfRow(r)))

    section("constraint audit (q153): table-contract battery")
    Curation.q153ConstraintAudit(spark, dir).collect().foreach { r =>
      line(
        f"${r.getString(0)}%-28s violations=${r.getLong(2)}%5d (${100 * r.getDouble(3)}%5.1f%%) ${r.getString(4)}"
      )
    }

    section("class cohesion (q155): intra vs nearest-other cosine, per label")
    Cartography.q155ClassCohesion(spark, dir).collect().foreach { r =>
      line(
        f"label=${r.getInt(0)}%2d vecs=${r.getLong(1)}%5d intra=${r.getDouble(2)}%+8.5f " +
          f"vs label ${r.getInt(3)}%2d at ${r.getDouble(4)}%+8.5f margin=${r.getDouble(5)}%+8.5f ${r.getString(6)}"
      )
    }

    section("media dedup profile (q176): near-dup exposure per kind")
    graft.operators.Multimodal.q176MediaDedupProfile(spark, dir).collect().foreach { r =>
      line(
        f"${r.getString(0)}%6s n=${r.getLong(1)}%5d pairs=${r.getLong(2)}%6d " +
          f"paired=${r.getLong(3)}%5d (${r.getDouble(4)}%6.4f)"
      )
    }

    section("df-capped image mine (q181): pairs minable without hot band buckets")
    val q181Pairs = graft.operators.Multimodal.q181ImageNeardupCapped(spark, dir).count()
    line(s"capped pairs: $q181Pairs (any pair colliding only in >cap band buckets is excluded)")

    section("media boilerplate fingerprints (q177): what the df cap excluded")
    // the excluded-pair CONTEXT comes from the audit row, never from
    // running the uncapped q114 — on a boilerplate-heavy corpus that
    // comparison would itself be the quadratic blowup the cap avoids
    graft.operators.Multimodal.q177MediaBoilerplate(spark, dir).collect().foreach { r =>
      val maxDf = if (r.isNullAt(7)) "-" else r.getLong(7).toString
      val hotShare = if (r.isNullAt(4)) "-" else f"${r.getDouble(4)}%6.4f"
      line(
        f"${r.getString(0)}%6s items=${r.getLong(1)}%5d fps=${r.getLong(2)}%7d " +
          f"hot=${r.getLong(3)}%4d ($hotShare) affected=${r.getLong(5)}%5d max_df=$maxDf"
      )
    }

    section("media hot-key ledger (q183): hottest fingerprint keys, source attribution, dropped pair mass")
    graft.operators.Multimodal.q183MediaHotLedger(spark, dir).collect().take(12).foreach { r =>
      line(
        f"${r.getString(0)}%11s #${r.getInt(1)}%2d ${r.getString(2).take(16)}%-16s df=${r.getLong(3)}%5d " +
          f"sources=${r.getLong(4)}%3d top=${r.getString(5)}%-8s dropped_pairs=${r.getLong(6)}%d"
      )
    }

    section("image decontamination (q178): train images near-duplicating held-out eval images")
    val decon = graft.operators.Multimodal.q178ImageDecontam(spark, dir).collect()
    line(s"flagged train images: ${decon.length}")
    decon.take(8).foreach { r =>
      line(
        f"train=${r.getLong(0)}%7d matches=${r.getLong(1)}%3d " +
          f"closest eval=${r.getLong(3)}%7d at hamming ${r.getLong(2)}%d"
      )
    }

    section("decontamination surface (q179): method coverage across modalities")
    Dedup.q179DecontamSurface(spark, dir).collect().foreach { r =>
      val frac = if (r.isNullAt(5)) "-" else f"${r.getDouble(5)}%6.4f"
      val cfrac = if (r.isNullAt(6)) "-" else f"${r.getDouble(6)}%6.4f"
      line(
        f"${r.getString(0)}%-14s flagged=${r.getLong(3)}%5d/${r.getLong(1)}%5d ($frac) " +
          f"chars=${r.getLong(4)}%9d/${r.getLong(2)}%9d ($cfrac)"
      )
    }

    section("decontamination method overlap (q184): redundancy across screens")
    Dedup.q184DecontamOverlap(spark, dir).collect().foreach { r =>
      val jac = if (r.isNullAt(6)) "-" else f"${r.getDouble(6)}%6.4f"
      val cont = if (r.isNullAt(7)) "-" else f"${r.getDouble(7)}%6.4f"
      line(
        f"${r.getString(0)}%-14s ∩ ${r.getString(1)}%-14s both=${r.getLong(4)}%5d " +
          f"of ${r.getLong(2)}%5d/${r.getLong(3)}%5d jac=$jac contain=$cont"
      )
    }

    section("decontamination mask export (q182): leaked spans the loader masks")
    val masks = Dedup.q182DecontamMaskExport(spark, dir).collect()
    line(s"q182: ${masks.length} mask intervals over ${masks.map(_.getLong(0)).distinct.length} mask_spans docs")
    masks.take(5).foreach { r =>
      line(f"  doc=${r.getLong(0)}%6d span ${r.getLong(1)}: tokens ${r.getLong(2)}-${r.getLong(3)} (${r.getLong(4)} tokens)")
    }

    section("winnow contamination (q152) / image dup clusters (q156): screen summaries")
    val contam = Dedup.q152WinnowContamination(spark, dir).collect()
    line(s"q152: ${contam.length} train docs share a rare winnow fingerprint with the test split")
    contam.take(5).foreach { r =>
      line(f"  doc=${r.getLong(0)}%6d shared_fps=${r.getLong(1)}%3d test_docs=${r.getLong(2)}%3d")
    }
    val iclusters = graft.operators.Multimodal.q156ImageDupClusters(spark, dir).collect()
    line(
      s"q156: ${iclusters.map(_.getLong(1)).distinct.length} image dup clusters over " +
        s"${iclusters.length} images, max size ${if (iclusters.isEmpty) 0 else iclusters.map(_.getLong(2)).max}"
    )

    section("trained quality model (q159/q160): gradient trace tail + AUC vs fixed weights")
    val trace = Curation.q159QualityTrain(spark, dir).collect()
    trace.takeRight(3).foreach { r =>
      line(
        f"iter=${r.getInt(0)}%2d w=[${r.getDouble(1)}%+7.4f ${r.getDouble(2)}%+7.4f " +
          f"${r.getDouble(3)}%+7.4f ${r.getDouble(4)}%+7.4f] acc=${r.getDouble(5)}%6.4f"
      )
    }
    Curation.q160QualityTrainAuc(spark, dir).collect().foreach { r =>
      line(f"${r.getString(0)}%8s: auc=${r.getDouble(3)}%6.4f (pos=${r.getLong(1)} neg=${r.getLong(2)})")
    }

    section("image-text alignment (q161): mismatched-pair screen, per source")
    graft.operators.Multimodal.q161ImageTextAlign(spark, dir).collect().foreach { r =>
      line(
        f"${r.getString(0)}%12s pairs=${r.getLong(1)}%5d flagged=${r.getLong(2)}%5d " +
          f"(${r.getDouble(3)}%6.4f) mean=${r.getDouble(4)}%+8.5f min=${r.getDouble(5)}%+8.5f ${r.getString(6)}"
      )
    }

    section("verbatim runs (q162): longest-clone length buckets, per source")
    graft.operators.Dedup.q162VerbatimRunProfile(spark, dir).collect().foreach { r =>
      line(
        f"${r.getString(0)}%12s ${r.getString(1)}%-9s docs=${r.getLong(2)}%5d longest=${r.getInt(3)}%5d tokens"
      )
    }

    section("source health scorecard (q168): four audit signals per source")
    TextOps.q168SourceHealth(spark, dir).collect().foreach { r =>
      // leg columns are null for sources a leg cannot score (that absence
      // is itself a flag) — render them as "-" instead of crashing the report
      def d(i: Int, fmt: String): String = if (r.isNullAt(i)) "-" else fmt.format(r.getDouble(i))
      line(
        f"${r.getString(0)}%12s docs=${r.getLong(1)}%5d ent=${r.getDouble(3)}%6.4f " +
          f"(flag ${r.getDouble(4)}%5.3f) " +
          s"d2=${d(5, "%6.4f")} zipf=${d(6, "%+7.4f")} js=${d(7, "%6.4f")} " +
          f"flags=${r.getInt(8)} ${r.getString(9)}"
      )
    }

    section("decontamination economics (q166) / unimax plan (q167)")
    val bloom = Curation.q166BloomScreen(spark, dir).collect()
    line(
      s"q166: ${bloom.length} train docs bloom-flagged, " +
        s"${bloom.map(_.getLong(2)).sum} bloom hits vs ${bloom.map(_.getLong(3)).sum} exact " +
        s"(${bloom.map(_.getLong(4)).sum} false positives)"
    )
    Curation.q167UnimaxPlan(spark, dir).collect().foreach { r =>
      line(
        f"q167: ${r.getString(0)}%4s tokens=${r.getLong(2)}%8d ${r.getString(4)}%-7s " +
          f"alloc=${r.getLong(5)}%8d epochs=${r.getDouble(6)}%6.4f"
      )
    }

    section("embedding coreset (q171): farthest-point picks and the coverage radius curve")
    Cartography.q171CoresetSelect(spark, dir).collect().foreach { r =>
      val rad = if (r.isNullAt(3)) "seed" else s"r2=${r.getLong(3)}"
      line(f"pick ${r.getInt(0)}%2d: vec=${r.getLong(1)}%6d label=${r.getInt(2)}%2d $rad")
    }

    section("feature ablation (q174): AUC deficit per zeroed quality-model feature")
    Curation.q174FeatureAblation(spark, dir).collect().foreach { r =>
      line(
        f"${r.getString(0)}%8s auc=${r.getDouble(3)}%6.4f deficit=${r.getDouble(4)}%+8.4f " +
          f"(pos=${r.getLong(1)} neg=${r.getLong(2)})"
      )
    }

    section("mixture concentration (q173): how concentrated is the corpus across sources")
    Curation.q173MixtureConcentration(spark, dir).collect().foreach { r =>
      line(
        f"n=${r.getLong(0)} hhi=${r.getDouble(2)}%6.4f effHHI=${r.getDouble(3)}%6.2f " +
          f"gini=${r.getDouble(4)}%6.4f H=${r.getDouble(5)}%6.4f effHill=${r.getDouble(6)}%6.2f"
      )
    }

    section("decontamination ledger (q172): action cost per source over the train split")
    Dedup.q172DecontamLedger(spark, dir).collect().foreach { r =>
      line(
        f"${r.getString(0)}%12s ${r.getString(1)}%-13s docs=${r.getLong(2)}%5d " +
          f"tokens=${r.getLong(3)}%8d share=${r.getDouble(4)}%6.4f"
      )
    }

    section("quality-pruning sweep (q169): kept mass and mean score per keep fraction")
    graft.operators.Sampling.q169PruningSweep(spark, dir).collect().foreach { r =>
      line(
        f"${r.getString(0)}%12s keep=${r.getInt(1)}%3d%% docs=${r.getLong(2)}%5d " +
          f"tokens=${r.getLong(3)}%8d mean=${r.getDouble(4)}%6.4f cutoff=${r.getDouble(5)}%6.4f"
      )
    }

    section("tokenizer budget curve (q165): fertility/compression per merge checkpoint")
    TextOps.q165TokenizerBudget(spark, dir).collect().foreach { r =>
      line(
        f"merges=${r.getInt(0)}%2d vocab=${r.getLong(1)}%4d pieces=${r.getLong(2)}%8d " +
          f"fertility=${r.getDouble(3)}%7.4f compression=${r.getDouble(4)}%7.4f"
      )
    }

    section("train shards (q83): manifest")
    TrainExport.q83ShardPlan(spark, dir).collect().foreach { r =>
      line(
        f"shard=${r.getInt(0)} docs=${r.getLong(1)}%5d tokens=${r.getLong(2)}%8d " +
          s"keys=[${r.getString(3).take(8)}.., ${r.getString(4).take(8)}..]"
      )
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    if (args.length != 1) {
      System.err.println("usage: CorpusReport <dataDir>")
      sys.exit(2)
    }
    val spark = graft.core.Sessions.local("graft-corpus-report")
    try println(report(spark, args(0)))
    finally spark.stop()
  }
}
