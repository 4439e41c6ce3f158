package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, 64-dim): brute-force cosine top-k as the exactness
  * baseline, plus two sub-linear scale paths — random-hyperplane LSH and
  * IVF (k-means coarse quantizer + cluster-probe).
  *
  * Scale design:
  *   - The query set is tiny and broadcast; the corpus is only ever scanned
  *     once per query batch (brute force) or partially (LSH/IVF). No
  *     corpus×corpus join anywhere.
  *   - All vector math is zip_with/aggregate higher-order expressions in
  *     double — codegen'd, no UDF, no driver collect of the corpus.
  *   - LSH/IVF candidate generation shuffles on (bucket) / (cluster) keys.
  *     On real clustered embeddings the probed fraction is small; on this
  *     driver-generated near-uniform data (max pairwise cos ≈ 0.51) recall
  *     of any sub-linear method necessarily tracks the scanned fraction —
  *     the specs therefore pin plumbing correctness (returned cosines are
  *     exact, ranks correct) and only loose recall bounds.
  *   - IVF centroids are learned with 3 Lloyd iterations over a bounded
  *     deterministic sample (corpus-size-independent); only the sample and
  *     k×dim centroid summaries ever reach the driver.
  *   - Indexes are session-cached AND persistable as bucketed tables
  *     (persistLshIndex/persistIvfIndex + spark conf `graft.ann.indexDir`):
  *     a cold session reads the table back instead of rebuilding — the
  *     100 TB shape, where an index is a materialized artifact, not a
  *     per-session computation.
  */
object Similarity {

  private val DIM = 64
  private val K = 10
  private val N_QUERIES = 5

  /** Attach a unit-normalized double copy of `vecCol` as `outCol`: cosine
    * then reduces to the codegen'd `vec_dot` (normalize once per row, O(d);
    * pair stage pays one primitive loop).
    */
  private def withUnit(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn(
      "__nrm",
      expr(s"sqrt(aggregate($vecCol, 0D, (a, e) -> a + cast(e AS double) * cast(e AS double)))")
    ).withColumn(outCol, expr(s"transform($vecCol, x -> cast(x AS double) / __nrm)"))
      .drop("__nrm")

  private def queriesDf(spark: SparkSession, dir: String): DataFrame =
    withUnit(Tables.embeddings(spark, dir).filter(col("vec_id") < N_QUERIES), "embedding", "va")
      .select(col("vec_id").as("query_id"), col("embedding").as("qraw"), col("va"))

  // ---------------------------------------------------------------------------
  // q34 — brute-force cosine top-k: broadcast queries × one corpus scan →
  // per-query row_number window → k rows. The exactness baseline every ANN
  // variant is measured against.
  // ---------------------------------------------------------------------------
  def q34BruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VecFunctions.install(spark)
    val corpus = withUnit(Tables.balanced(Tables.embeddings(spark, dir)), "embedding", "vb")
      .select(col("vec_id"), col("vb"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    broadcast(queriesDf(spark, dir).select(col("query_id"), col("va")))
      .join(corpus, col("query_id") =!= col("vec_id"))
      .withColumn("cosine", expr("vec_dot(va, vb)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val q34Oracle: String =
    s"""WITH u AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> x::DOUBLE / sqrt(list_sum(list_transform(embedding, e -> e::DOUBLE * e::DOUBLE)))) AS unit
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, unit AS va FROM u WHERE vec_id < $N_QUERIES),
       |scored AS (
       |  SELECT q.query_id, e.vec_id,
       |         list_sum(list_transform(list_zip(q.va, e.unit), z -> z[1] * z[2])) AS cosine
       |  FROM q JOIN u e ON e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, vec_id, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------------------
  // q35 — random-hyperplane LSH ANN: T tables × P sign-bits per table.
  // Hyperplane weights are splitmix64-derived (deterministic, no stored
  // model). Candidates = corpus vectors sharing any table-bucket with the
  // query; exact cosine re-rank on candidates only.
  //
  // Index/query separation: the bucketed corpus is an INDEX — built once per
  // (session, dir) into a localCheckpoint (executor storage, lineage
  // truncated) and reused by every subsequent call. The round-1 version
  // rebuilt it per run AND inlined T×P×DIM literal doubles into the SQL
  // expressions, which made Janino compile ~seconds of generated code per
  // run; `plane_buckets` holds the plane matrix as a reference object
  // instead (one tiny callback in codegen, like CentroidRanks below).
  // ---------------------------------------------------------------------------
  private val TABLES = 6
  private val PLANES = 6

  /** Deterministic hyperplane weights in [-1,1] (splitmix64-derived),
    * indexed [t * PLANES + p][dim].
    */
  private[operators] def planeMatrix(): Array[Array[Double]] =
    Array.tabulate(TABLES * PLANES) { tp =>
      val t = tp / PLANES
      val p = tp % PLANES
      val seed = t.toLong * 100003 + p.toLong * 1009
      Array.tabulate(DIM)(d => graft.functions.VecFunctions.mix64(seed * 8191 + d).toDouble / 9.223372036854776e18)
    }

  /** All T packed sign-bit buckets of a unit vector in ONE call:
    * element t = Σ_p (dot(plane[t,p], x) > 0 ? 2^p : 0). The plane matrix
    * rides along as a codegen reference object — constant-size generated
    * code regardless of T×P×DIM. (Sign bits are scale-invariant, so
    * hashing the unit vector equals hashing the raw vector.)
    */
  private[operators] case class PlaneBuckets(
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      planes: Array[Array[Double]],
      nTables: Int,
      nPlanes: Int
  ) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    private def buckets(x: ArrayData): Array[Int] = {
      val n = x.numElements()
      val out = new Array[Int](nTables)
      var t = 0
      while (t < nTables) {
        var packed = 0
        var p = 0
        while (p < nPlanes) {
          val w = planes(t * nPlanes + p)
          var d = 0.0
          var i = 0
          val lim = math.min(n, w.length)
          while (i < lim) { d += x.getDouble(i) * w(i); i += 1 }
          if (d > 0) packed |= (1 << p)
          p += 1
        }
        out(t) = packed
        t += 1
      }
      out
    }

    override protected def nullSafeEval(a: Any): Any =
      ArrayData.toArrayData(buckets(a.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("planeBuckets", this, classOf[PlaneBuckets].getName)
      nullSafeCodeGen(
        ctx,
        ev,
        a => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($a);"
      )
    }

    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression
    ): PlaneBuckets = copy(child = c)
  }

  private def installPlaneBuckets(spark: SparkSession): Unit = {
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("plane_buckets")
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      val planes = planeMatrix()
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[PlaneBuckets].getName,
          "plane_buckets"
        ),
        (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          PlaneBuckets(args.head, planes, TABLES, PLANES)
      )
    }
  }

  /** (t, b) bucket rows of `vcol`: one plane_buckets call, posexploded so
    * the table index IS the position. The full bucket array rides along as
    * `bsName` — downstream joins use it to dedup multi-table collisions
    * WITHOUT a shuffle (see firstCollision).
    */
  private[operators] def withBuckets(df: DataFrame, vcol: String, bsName: String = "bs"): DataFrame = {
    val withBs = df.withColumn(bsName, expr(s"plane_buckets($vcol)"))
    // posexplode_OUTER: a plain posexplode makes Catalyst push
    // `size(plane_buckets(...)) > 0 AND isnotnull(plane_buckets(...))`
    // guard conjuncts down into the scan filter, re-evaluating the whole
    // bucket computation per scanned row (measured 0.48 s -> 0.06 s on the
    // 5-query side at sf0.1). plane_buckets always returns a TABLES-length
    // non-null array, so outer vs inner explode is semantically identical.
    withBs.select(withBs.columns.map(col).toSeq :+ posexplode_outer(col(bsName)).as(Seq("t", "b")): _*)
  }

  /** True iff table `t` (0-based posexplode position) is the FIRST table
    * where the two bucket arrays collide. Filtering candidate pairs on this
    * keeps exactly one copy of every colliding pair — equivalent to
    * dropDuplicates over the pair key, but as a per-row predicate instead
    * of a full shuffle. The arrays are TABLES ints, so the interpreted
    * zip_with/exists lambdas touch candidates only, never the corpus.
    */
  private[operators] def firstCollision(aBs: String, bBs: String, tCol: String = "t"): Column =
    !expr(s"exists(zip_with(slice($aBs, 1, $tCol), slice($bBs, 1, $tCol), (x, y) -> x = y), v -> v)")

  // -- session-scoped ANN index cache (see SessionCache) -----------------------
  // localCheckpoint truncates lineage and parks the index blocks in executor
  // storage (MEMORY_AND_DISK); the SessionCache sweeps entries once their
  // session stops.
  private val lshIndexCache = new SessionCache[DataFrame]
  private val ivfIndexCache = new SessionCache[(Array[Array[Double]], DataFrame)]

  // -- persisted ANN indexes ---------------------------------------------------
  // The 100 TB shape: an index is a materialized TABLE, not a per-session
  // computation. persistLshIndex/persistIvfIndex write the index through
  // sources.Layouts.writeBucketed — LSH bucketed+sorted on (t, b), IVF on
  // (cluster) — so index-side joins on those keys plan shuffle-free, and a
  // COLD session (or a different JVM) reads the table back instead of
  // rebuilding. Discovery is via the spark conf `graft.ann.indexDir`:
  // when set, build*Index consults the persisted layout first (the session
  // cache stays on top as the read-through layer). A sidecar
  // `_graft_index.json` records the bucket spec so a fresh catalog can
  // re-register the table over the existing files.
  val IndexDirConf = "graft.ann.indexDir"
  private val LSH_BUCKETS = 16
  private val IVF_BUCKETS = 8

  /** Stable cross-JVM key for a data dir (first 8 md5 hex chars). */
  private def indexKey(dir: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(4)
      .map(b => f"$b%02x")
      .mkString

  private def confIndexDir(spark: SparkSession): Option[String] =
    spark.conf.getOption(IndexDirConf).filter(_.nonEmpty)

  private def lshPath(indexDir: String, dir: String) = s"$indexDir/lsh_${indexKey(dir)}"
  private def ivfPath(indexDir: String, dir: String) = s"$indexDir/ivf_${indexKey(dir)}"
  private def ivfCentroidsPath(indexDir: String, dir: String) = s"${ivfPath(indexDir, dir)}_centroids"
  private[operators] def lshTable(dir: String) = s"graft_lsh_${indexKey(dir)}"
  private[operators] def ivfTable(dir: String) = s"graft_ivf_${indexKey(dir)}"

  private def hadoopPath(spark: SparkSession, p: String) = {
    val path = new org.apache.hadoop.fs.Path(p)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** Sidecar marker: bucket spec + keys, written LAST so its presence means
    * the index files are complete (a crashed persist leaves no marker and
    * the reader falls back to building).
    */
  private def writeSidecar(spark: SparkSession, dataPath: String, buckets: Int, keys: Seq[String]): Unit = {
    val (fs, p) = hadoopPath(spark, s"$dataPath/_graft_index.json")
    val out = fs.create(p, true)
    try out.write(
      s"""{"buckets":$buckets,"keys":[${keys.map("\"" + _ + "\"").mkString(",")}]}""".getBytes("UTF-8")
    )
    finally out.close()
  }

  private def readSidecar(spark: SparkSession, dataPath: String): Option[(Int, Seq[String])] = {
    val (fs, p) = hadoopPath(spark, s"$dataPath/_graft_index.json")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val buckets = "\"buckets\":(\\d+)".r.findFirstMatchIn(text).map(_.group(1).toInt)
      val keys = "\"keys\":\\[([^\\]]*)\\]".r
        .findFirstMatchIn(text)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq)
      for (b <- buckets; k <- keys) yield (b, k)
    }
  }

  /** Serve the persisted bucketed index as a catalog table, re-registering
    * the metadata over the existing files when this session's catalog has
    * never seen it (the truly-cold path: bucket spec from the sidecar,
    * schema from the parquet footers — Spark then trusts the bucket-encoded
    * file names and plans (t, b)/(cluster) joins shuffle-free).
    */
  private def readPersisted(spark: SparkSession, table: String, dataPath: String): Option[DataFrame] =
    readSidecar(spark, dataPath).map { case (buckets, keys) =>
      if (!spark.catalog.tableExists(table)) {
        val schemaDdl = spark.read.parquet(dataPath).schema.toDDL
        val keyList = keys.map(k => s"`$k`").mkString(", ")
        spark.sql(
          s"CREATE TABLE `$table` ($schemaDdl) USING PARQUET " +
            s"CLUSTERED BY ($keyList) SORTED BY ($keyList) INTO $buckets BUCKETS " +
            s"LOCATION '$dataPath'"
        )
      }
      spark.table(table)
    }

  /** Materialize the LSH index as a bucketed table under
    * `indexDir` (default: the `graft.ann.indexDir` conf) — one write, then
    * every session (this JVM or another) reads it back via
    * [[buildLshIndex]] instead of rebuilding.
    */
  def persistLshIndex(spark: SparkSession, dir: String, indexDir: String): Unit = {
    val path = lshPath(indexDir, dir)
    graft.sources.Layouts.writeBucketed(
      buildLshIndex(spark, dir),
      lshTable(dir),
      Seq("t", "b"),
      LSH_BUCKETS,
      path
    )
    writeSidecar(spark, path, LSH_BUCKETS, Seq("t", "b"))
  }

  def persistLshIndex(spark: SparkSession, dir: String): Unit =
    persistLshIndex(spark, dir, confIndexDir(spark).getOrElse {
      throw new IllegalStateException(s"set $IndexDirConf or pass indexDir explicitly")
    })

  /** Build (or fetch) the LSH corpus index: (t, b, vec_id, vb-unit-vector),
    * materialized. Resolution order: session cache → persisted table (when
    * `graft.ann.indexDir` is set and holds one) → compute. Callers time
    * this separately from the query phase.
    */
  def buildLshIndex(spark: SparkSession, dir: String): DataFrame =
    lshIndexCache.getOrBuild(spark, dir) {
      graft.functions.VecFunctions.install(spark)
      installPlaneBuckets(spark)
      confIndexDir(spark)
        .flatMap(ix => readPersisted(spark, lshTable(dir), lshPath(ix, dir)))
        .getOrElse {
          val corpus = withUnit(Tables.balanced(Tables.embeddings(spark, dir)), "embedding", "vb")
            .select(col("vec_id"), col("vb"))
          withBuckets(corpus, "vb", bsName = "cbs").localCheckpoint()
        }
    }

  def q35LshTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VecFunctions.install(spark)
    installPlaneBuckets(spark)
    val corpusBuckets = buildLshIndex(spark, dir)
    val queryBuckets =
      withBuckets(queriesDf(spark, dir).select(col("query_id"), col("va")), "va", bsName = "qbs")
    val candidates = broadcast(queryBuckets)
      .join(corpusBuckets, Seq("t", "b"))
      .filter(col("query_id") =!= col("vec_id"))
      // multi-table collisions dedup'd by predicate, not by a shuffle
      .filter(firstCollision("qbs", "cbs"))
      .select(col("query_id"), col("va"), col("vec_id"), col("vb"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    candidates
      .withColumn("cosine", expr("vec_dot(va, vb)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------------------
  // q36 — IVF ANN: k-means coarse quantizer (C centroids; 3 Lloyd iterations
  // over a bounded deterministic hash-prefix sample, init = the sample's
  // first C), then probe the nprobe nearest cells per query and exact-rank
  // inside them. Only the bounded sample and centroid summaries touch the
  // driver.
  // ---------------------------------------------------------------------------
  private val C = 16
  private val NPROBE = 3

  /** Centroid indexes of `child` sorted by L2 distance, with the centroid
    * table held as a REFERENCE OBJECT: inlining 16×64 literal doubles into
    * the SQL expression made Janino compile ~10 s of generated code on
    * first use (dominating any single run); this expression generates a
    * one-line callback instead. Assignment = ranks[0]; probing = first
    * nprobe entries.
    */
  private[operators] case class CentroidRanks(
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      cents: Array[Array[Double]]
  ) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    private def ranks(x: ArrayData): Array[Int] = {
      val n = math.min(x.numElements(), DIM)
      val scored = cents.indices.map { ci =>
        val c = cents(ci)
        var d = 0.0
        var i = 0
        while (i < n) { val diff = x.getDouble(i) - c(i); d += diff * diff; i += 1 }
        (d, ci)
      }
      scored.sorted.map(_._2).toArray
    }

    override protected def nullSafeEval(a: Any): Any =
      ArrayData.toArrayData(ranks(a.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroidRanks", this, classOf[CentroidRanks].getName)
      nullSafeCodeGen(
        ctx,
        ev,
        a => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($a);"
      )
    }

    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression
    ): CentroidRanks = copy(child = c)
  }

  /** Register `centroid_ranks` bound to this centroid table (session-scoped;
    * re-registration replaces the binding).
    */
  private def installCentroidRanks(spark: SparkSession, cs: Array[Array[Double]]): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("centroid_ranks"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CentroidRanks].getName,
        "centroid_ranks"
      ),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => CentroidRanks(args.head, cs)
    )

  private val toDouble: String => String = v => s"transform($v, x -> cast(x AS double))"

  /** Training-sample size: O(C × oversample), INDEPENDENT of corpus size —
    * at 100 TB the sample is the same 4096 vectors (~2 MB), which is what
    * makes driver-side Lloyd below legitimate (mini-batch k-means shape:
    * the quantizer trains on a bounded sample; the corpus is only ever
    * touched by the single distributed assignment pass in buildIvfIndex).
    */
  private val TRAIN_SAMPLE = 4096

  def trainCentroids(spark: SparkSession, dir: String): Array[Array[Double]] = {
    graft.functions.VecFunctions.install(spark)
    // Deterministic hash-prefix sample: the TRAIN_SAMPLE vectors with the
    // smallest xxhash64(vec_id) — planned as a TakeOrdered top-k, ONE corpus
    // scan with no shuffle (vs the previous 3 full-corpus Lloyd iterations,
    // each a 65-aggregate scan: 5.6 s → <1 s build at sf0.1). vec_id
    // tiebreak keeps the sample total-ordered.
    val sample: Array[Array[Double]] = Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), expr(toDouble("embedding")).as("emb_d"))
      .orderBy(expr("xxhash64(vec_id)"), col("vec_id"))
      .limit(TRAIN_SAMPLE)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    // init = first C of the hash-ordered sample (deterministic); Lloyd on
    // the sample is microseconds of driver arithmetic
    var cents = sample.take(C).map(_.clone)
    for (_ <- 1 to 3) {
      val counts = Array.fill(cents.length)(0L)
      val sums = Array.fill(cents.length, DIM)(0.0)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          var d = 0.0
          var i = 0
          val lim = math.min(v.length, cents(c).length)
          while (i < lim) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        val lim = math.min(v.length, DIM)
        while (i < lim) { sums(best)(i) += v(i); i += 1 }
      }
      // empty cluster keeps its previous centroid (same rule as before)
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0L) cents(c)
        else Array.tabulate(DIM)(i => sums(c)(i) / counts(c))
      }
    }
    cents
  }

  /** Materialize the IVF index: the assigned corpus as a table bucketed on
    * (cluster) plus the centroid table (C rows — tiny) as plain parquet.
    * Cold sessions read both back via [[buildIvfIndex]].
    */
  def persistIvfIndex(spark: SparkSession, dir: String, indexDir: String): Unit = {
    val (cents, corpus) = buildIvfIndex(spark, dir)
    import spark.implicits._
    cents.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }
      .toSeq
      .toDF("cluster", "centroid")
      .coalesce(1)
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(ivfCentroidsPath(indexDir, dir))
    val path = ivfPath(indexDir, dir)
    graft.sources.Layouts.writeBucketed(corpus, ivfTable(dir), Seq("cluster"), IVF_BUCKETS, path)
    writeSidecar(spark, path, IVF_BUCKETS, Seq("cluster"))
  }

  def persistIvfIndex(spark: SparkSession, dir: String): Unit =
    persistIvfIndex(spark, dir, confIndexDir(spark).getOrElse {
      throw new IllegalStateException(s"set $IndexDirConf or pass indexDir explicitly")
    })

  private def readPersistedIvf(spark: SparkSession, dir: String): Option[(Array[Array[Double]], DataFrame)] =
    confIndexDir(spark).flatMap { ix =>
      readPersisted(spark, ivfTable(dir), ivfPath(ix, dir)).map { corpus =>
        val cents = spark.read
          .parquet(ivfCentroidsPath(ix, dir))
          .orderBy(col("cluster"))
          .collect()
          .map(_.getSeq[Double](1).toArray)
        (cents, corpus)
      }
    }

  /** Build (or fetch) the IVF index: the trained centroids + the corpus
    * with cluster assignment and unit vectors, materialized. Resolution
    * order: session cache → persisted table (when `graft.ann.indexDir` is
    * set and holds one) → train + assign. The quantizer is trained ONCE per
    * (session, dir) — queries only pay the probe join.
    */
  def buildIvfIndex(spark: SparkSession, dir: String): (Array[Array[Double]], DataFrame) =
    ivfIndexCache.getOrBuild(spark, dir) {
      graft.functions.VecFunctions.install(spark)
      readPersistedIvf(spark, dir).getOrElse {
        val cents = trainCentroids(spark, dir)
        // cluster assignment + probe distances in RAW space (matching the
        // trained centroids); exact re-rank on unit vectors via vec_dot.
        installCentroidRanks(spark, cents)
        val corpus = withUnit(Tables.balanced(Tables.embeddings(spark, dir)), "embedding", "vb")
          .withColumn("emb_d", expr(toDouble("embedding")))
          .withColumn("cluster", expr("element_at(centroid_ranks(emb_d), 1)"))
          .select(col("vec_id"), col("vb"), col("cluster"))
          .localCheckpoint()
        (cents, corpus)
      }
    }

  def q36IvfTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VecFunctions.install(spark)
    val (cents, corpus) = buildIvfIndex(spark, dir)
    installCentroidRanks(spark, cents)
    val probes = queriesDf(spark, dir)
      .withColumn("qraw_d", expr(toDouble("qraw")))
      .withColumn("cluster", explode(expr(s"slice(centroid_ranks(qraw_d), 1, $NPROBE)")))
      .select(col("query_id"), col("va"), col("cluster"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    broadcast(probes)
      .join(corpus, Seq("cluster"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine", expr("vec_dot(va, vb)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------------------
  // q64 — symmetric int8 quantization of the embedding column with
  // per-vector reconstruction-error stats: the compression step a training
  // pipeline applies before shipping embeddings to an ANN index or feature
  // store (4× smaller than float32, 8× than float64). Per-row expression
  // pipeline — embarrassingly parallel, no shuffle until the final sort.
  //
  // Determinism: scale/quantize/error arithmetic is written with IDENTICAL
  // double expressions in the oracle (floor-form rounding, exponent
  // literals); the guard `greatest(..., 1e-12)` keeps a zero vector from
  // dividing by zero in both engines.
  // ---------------------------------------------------------------------------
  def q64EmbeddingQuantize(spark: SparkSession, dir: String): DataFrame =
    Tables
      .balanced(Tables.embeddings(spark, dir))
      .withColumn("emb_d", expr("transform(embedding, x -> cast(x AS double))"))
      .withColumn("scale", expr("greatest(array_max(transform(emb_d, x -> abs(x))) / 127.0, 1e-12)"))
      .withColumn(
        "q",
        expr("transform(emb_d, x -> least(greatest(floor(x / scale + 5e-1), -127), 127))")
      )
      .withColumn("err", expr("zip_with(emb_d, q, (x, v) -> abs(x - v * scale))"))
      .select(
        col("vec_id"),
        expr("floor(scale * 1e9 + 5e-1) / 1e9").as("scale"),
        expr("floor(array_max(err) * 1e9 + 5e-1) / 1e9").as("max_err"),
        expr("floor(aggregate(err, 0D, (a, e) -> a + e) / size(err) * 1e9 + 5e-1) / 1e9").as("mean_err")
      )
      .orderBy(col("vec_id"))

  val q64Oracle: String =
    """WITH t AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> x::DOUBLE) AS emb_d,
      |         greatest(list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0, 1e-12) AS scale
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, scale,
      |         list_transform(list_zip(emb_d,
      |           list_transform(emb_d, x -> least(greatest(floor(x / scale + 5e-1), -127), 127))),
      |           z -> abs(z[1] - z[2] * scale)) AS err
      |  FROM t)
      |SELECT vec_id,
      |       floor(scale * 1e9 + 5e-1) / 1e9 AS scale,
      |       floor(list_max(err) * 1e9 + 5e-1) / 1e9 AS max_err,
      |       floor(list_sum(err) / len(err) * 1e9 + 5e-1) / 1e9 AS mean_err
      |FROM q
      |ORDER BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_bruteforce_topk" -> (q34BruteForceTopK _),
    "q35_lsh_topk" -> (q35LshTopK _),
    "q36_ivf_topk" -> (q36IvfTopK _),
    "q64_embedding_quantize" -> (q64EmbeddingQuantize _)
  )

  /** q35/q36 are hash/model-based — rows-only driver check. */
  val oracles: Map[String, String] = Map(
    "q34_bruteforce_topk" -> q34Oracle,
    "q64_embedding_quantize" -> q64Oracle
  )
}
