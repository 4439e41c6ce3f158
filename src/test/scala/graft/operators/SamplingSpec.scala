package graft.operators

import graft.SparkSpec

/** Sampling invariants at sf0.001. */
class SamplingSpec extends SparkSpec {

  test("q48 stratified sample: proportions within a loose binomial envelope, reproducible") {
    val a = Sampling.q48Sample(spark, sfDir).orderBy("event_type").collect()
    val b = Sampling.q48Sample(spark, sfDir).orderBy("event_type").collect()
    assert(a.sameElements(b), "fixed seed must reproduce the sample")
    val totals = graft.core.Tables
      .events(spark, sfDir)
      .groupBy("event_type")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val want = Map("click" -> 0.5, "view" -> 0.5, "purchase" -> 0.1, "signup" -> 0.1, "error" -> 0.1)
    a.foreach { r =>
      val t = r.getString(0)
      val frac = r.getLong(1).toDouble / totals(t)
      assert(math.abs(frac - want(t)) < 0.15, s"$t sampled at $frac, wanted ~${want(t)}")
    }
  }

  test("q48 registered output: 5-sigma envelope verdict is 1 for every stratum") {
    val rows = Sampling.q48StratifiedSample(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("frac_ok") === 1, s"sampler left its envelope: $r"))
  }

  test("q51 bottom-k sketch: k per group, partition-invariant, content-addressed") {
    val a = Sampling.q51BottomKSample(spark, sfDir).collect()
    // repartitioning the input must not change a content-addressed sample
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sketch = graft.functions.BottomKSketch
      .aggregator[Sampling.LangDoc](5)(_.sortKey, _.id)
      .toColumn
    val b = graft.core.Tables
      .documents(spark, sfDir)
      .repartition(13)
      .select(col("lang"), md5(col("doc_id").cast("string")).as("sortKey"), col("doc_id").as("id"))
      .as[Sampling.LangDoc]
      .groupByKey(_.lang)
      .agg(sketch.name("sample"))
      .toDF("lang", "sample")
      .select(col("lang"), explode(col("sample")).as("doc_id"))
      .orderBy(col("lang"), col("doc_id"))
      .collect()
    assert(a.sameElements(b))
    a.groupBy(_.getString(0)).values.foreach(rs => assert(rs.length <= 5))
  }

  test("q49 hash split: partitions the corpus, deterministic, ~80/10/10") {
    val rows = Sampling.q49HashSplit(spark, sfDir).collect()
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    assert(n === graft.core.Tables.documents(spark, sfDir).count())
    val bySplit = rows.map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    assert(bySplit.keySet === Set("train", "validation", "test"))
    assert(bySplit("train").toDouble / n > 0.7, "train should dominate")
  }
}
