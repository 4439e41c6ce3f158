package graft.operators

import graft.SparkSpec

/** q123 — the corpus topic map must equal a single-node replay of the whole
  * algorithm from first principles (seeds → 3 exact integer Lloyd updates →
  * profile), because the entire point of the integer-micro design is that
  * the distributed run is bit-reproducible anywhere.
  */
class CartographySpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x")
      .mkString

  test("q123 equals a single-node integer-micro Lloyd replay; msd non-increasing over iterations") {
    val docs = graft.core.Tables
      .documents(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang"))
      .toMap
    val pts: Seq[(Long, Array[Long])] = graft.core.Tables
      .embeddings(spark, sfDir)
      .collect()
      .map { r =>
        val xm = r
          .getAs[Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
          .toArray
        r.getAs[Long]("vec_id") -> xm
      }
      .toSeq
      .filter(p => docs.contains(p._1))

    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(cents: Seq[Array[Long]]): Map[Long, (Int, Long)] =
      pts.map { case (id, xm) =>
        val (dist, j) = cents.zipWithIndex.map { case (c, j) => (d2(xm, c), j) }.min
        id -> (j, dist)
      }.toMap

    // seeds: K smallest by (md5(vec_id), vec_id)
    var cents: Seq[Array[Long]] = pts
      .sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(Cartography.K)
      .map(_._2)
    val msdPerIter = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to Cartography.ITERS) {
      val a = assign(cents)
      msdPerIter += a.values.map(_._2).sum.toDouble / a.size
      val byCluster = pts.groupBy(p => a(p._1)._1)
      cents = cents.zipWithIndex.map { case (old, j) =>
        byCluster.get(j).fold(old) { members =>
          Array.tabulate(64)(d => Math.floorDiv(members.map(_._2(d)).sum, members.size.toLong))
        }
      }
    }
    val fin = assign(cents)
    msdPerIter += fin.values.map(_._2).sum.toDouble / fin.size
    assert(
      msdPerIter.sliding(2).forall(w => w(1) <= w(0) + 1e-9),
      s"Lloyd must not diverge: $msdPerIter"
    )

    // expected profile
    val total = fin.size
    val expected = fin.toSeq
      .groupBy(_._2._1)
      .toSeq
      .map { case (cluster, rows) =>
        val n = rows.size
        val sd = rows.map(_._2._2).sum
        val (topLang, ln) =
          rows.groupBy(r => docs(r._1)).map { case (l, rs) => (l, rs.size) }.toSeq.sortBy { case (l, c) => (-c, l) }.head
        (cluster, n.toLong,
          math.floor(n.toDouble / total * 1e6 + 0.5) / 1e6,
          topLang,
          math.floor(ln.toDouble / n * 1e6 + 0.5) / 1e6,
          math.floor(sd.toDouble / n / 1e6 + 0.5) / 1e6)
      }
      .sortBy(_._1)

    val got = Cartography
      .q123CorpusTopics(spark, sfDir)
      .collect()
      .map(r =>
        (r.getAs[Int]("cluster"), r.getAs[Long]("n_vecs"), r.getAs[Double]("share"),
          r.getAs[String]("top_lang"), r.getAs[Double]("top_lang_share"), r.getAs[Double]("msd"))
      )
      .toSeq
    assert(got === expected, "distributed k-means profile must equal the single-node replay")
    assert(got.map(_._2).sum === total.toLong)
    info(s"sf0.001: ${got.size} clusters, msd trajectory ${msdPerIter.mkString(" -> ")}")
  }

  test("q123 is deterministic across fresh sessions") {
    val a = Cartography.q123CorpusTopics(spark.newSession(), sfDir).collect().toSeq.map(_.toSeq)
    val b = Cartography.q123CorpusTopics(spark.newSession(), sfDir).collect().toSeq.map(_.toSeq)
    assert(a === b)
  }

  test("q129 equals a single-node exact z-test replay AND float mean+2sigma semantics") {
    val pts: Seq[(Long, Array[Long])] = graft.core.Tables
      .embeddings(spark, sfDir)
      .collect()
      .map { r =>
        val xm = r
          .getAs[Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
          .toArray
        r.getAs[Long]("vec_id") -> xm
      }
      .toSeq

    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(cents: Seq[Array[Long]]): Map[Long, (Int, Long)] =
      pts.map { case (id, xm) =>
        val (dist, j) = cents.zipWithIndex.map { case (c, j) => (d2(xm, c), j) }.min
        id -> (j, dist)
      }.toMap

    var cents: Seq[Array[Long]] = pts
      .sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(Cartography.K)
      .map(_._2)
    for (_ <- 1 to Cartography.ITERS) {
      val a = assign(cents)
      val byCluster = pts.groupBy(p => a(p._1)._1)
      cents = cents.zipWithIndex.map { case (old, j) =>
        byCluster.get(j).fold(old) { members =>
          Array.tabulate(64)(d => Math.floorDiv(members.map(_._2(d)).sum, members.size.toLong))
        }
      }
    }
    val fin = assign(cents)

    // expected verdicts: exact BigInt z-test per cluster, cross-checked
    // against the float mean + 2*sigma reading it encodes
    val byCluster = fin.toSeq.groupBy(_._2._1)
    val expected = fin.toSeq.map { case (id, (cluster, dist)) =>
      val ds = byCluster(cluster).map(_._2._2)
      val n = BigInt(ds.size)
      val s = ds.map(BigInt(_)).sum
      val ss = ds.map(d => BigInt(d) * BigInt(d)).sum
      val lhs = n * BigInt(dist) - s
      val exact = ds.size >= 4 && lhs > 0 && lhs * lhs > 4 * (n * ss - s * s)
      val mean = s.toDouble / ds.size
      val sigma = math.sqrt(math.max(ss.toDouble / ds.size - mean * mean, 0.0))
      val float = ds.size >= 4 && dist.toDouble > mean + 2 * sigma
      assert(exact === float, s"integer z-test must encode mean+2sigma (vec $id)")
      (id, cluster, math.floor(dist.toDouble / 1e6 + 0.5) / 1e6, if (exact) 1 else 0)
    }.sortBy(_._1)

    val got = Cartography
      .q129EmbeddingOutliers(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"), r.getAs[Double]("sq_dist"), r.getAs[Int]("outlier")))
      .toSeq
    assert(got === expected, "distributed outlier screen must equal the single-node replay")
    info(s"sf0.001: ${got.size} vectors, ${got.count(_._4 == 1)} outliers")
  }

  test("q141 equals a single-node integer-micro centroid-cosine replay") {
    val vecs = graft.core.Tables
      .embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray))
    val (minId, maxId) = (vecs.map(_._1).min, vecs.map(_._1).max)
    val byBucket = vecs.groupBy { case (id, _) => (id - minId) * 20 / (maxId - minId + 1) }
    val corpus = vecs.map(_._2).transpose.map(_.sum)
    val nb2 = corpus.map(c => BigInt(c) * BigInt(c)).sum
    val expected = byBucket.toSeq
      .map { case (bucket, rs) =>
        val s = rs.map(_._2).transpose.map(_.sum)
        val dot = s.zip(corpus).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
        val na2 = s.map(a => BigInt(a) * BigInt(a)).sum
        val cosMicro =
          math.floor(dot.toDouble / (math.sqrt(na2.toDouble) * math.sqrt(nb2.toDouble)) * 1e6 + 0.5).toLong
        (bucket, rs.length.toLong, cosMicro / 1e6, if (cosMicro < 200000L) "drifted" else "ok")
      }
      .sortBy(_._1)
    val got = Cartography
      .q141EmbeddingDrift(spark, sfDir)
      .collect()
      .map(r =>
        (r.getAs[Long]("bucket"), r.getAs[Long]("n_vecs"), r.getAs[Double]("cos_to_corpus"), r.getAs[String]("verdict"))
      )
      .toSeq
    assert(got === expected, "distributed drift table must equal the single-node replay")
    assert(got.map(_._2).sum === vecs.length.toLong, "segments must partition the corpus")
    info(s"sf0.001: cos range [${got.map(_._3).min}, ${got.map(_._3).max}], ${got.count(_._4 == "drifted")} drifted")
  }

  test("q155 cohesion: equals the BRUTE pairwise means (the centroid identity, executed); synthetic labels read confusable") {
    val vecs = graft.core.Tables
      .embeddings(spark, sfDir)
      .select("label", "embedding")
      .collect()
      .map { r =>
        val xm = r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray
        val n2 = xm.map(v => v * v).sum
        val um = xm.map(v => math.floor(v.toDouble * 1e6 / math.sqrt(n2.toDouble) + 0.5).toLong)
        (r.getInt(0), um)
      }
    val byLabel = vecs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def dot(a: Array[Long], b: Array[Long]): Long = a.indices.map(i => a(i) * b(i)).sum
    // brute-force mean pairwise cosines — NOT the centroid identity the
    // query uses, so equality here executes the identity as a theorem
    val intraMicro = byLabel.map { case (l, us) =>
      val pairs = for (i <- us.indices; j <- us.indices if i < j) yield dot(us(i), us(j))
      l -> math.floor(pairs.map(BigInt(_)).sum.toDouble / pairs.length / 1e6 + 0.5).toLong
    }
    val crossMicro = for {
      (a, ua) <- byLabel; (b, ub) <- byLabel if a != b
    } yield {
      val s = ua.flatMap(x => ub.map(y => BigInt(dot(x, y)))).sum
      ((a, b), math.floor(s.toDouble / (ua.length.toLong * ub.length) / 1e6 + 0.5).toLong)
    }
    val expected = byLabel.keys.map { l =>
      val (worstL, worstC) = crossMicro.collect { case ((a, b), c) if a == l => (b, c) }
        .toSeq.sortBy { case (b, c) => (-c, b) }.head
      (l, byLabel(l).length.toLong, intraMicro(l) / 1e6, worstL, worstC / 1e6,
        (intraMicro(l) - worstC) / 1e6, if (intraMicro(l) > worstC) "cohesive" else "confusable")
    }.toSet
    val got = Cartography
      .q155ClassCohesion(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getDouble(4), r.getDouble(5), r.getString(6)))
      .toSet
    assert(got === expected, "centroid-trick audit must equal the brute pairwise means")
    // the synthetic embeddings are near-orthogonal noise: class structure
    // must be absent, and the audit must SAY so
    assert(got.count(_._7 == "confusable") >= got.size / 2, "random labels must read mostly confusable")
    info(s"sf0.001: ${got.size} labels, ${got.count(_._7 == "confusable")} confusable")
  }

  test("q171 coreset: equals the single-node farthest-point replay; radius curve non-increasing, picks distinct") {
    val got = Cartography
      .q171CoresetSelect(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSeq
    assert(got.map(_._1) === (1 to 8), "exactly K ranked picks")
    val pts: Seq[(Long, Array[Long])] = graft.core.Tables
      .embeddings(spark, sfDir)
      .collect()
      .map { r =>
        r.getAs[Long]("vec_id") ->
          r.getAs[Seq[Float]]("embedding").map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray
      }
      .toSeq
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byId = pts.toMap
    var minD = collection.mutable.Map[Long, Long]()
    val seedId = pts.map(_._1).min
    pts.foreach { case (id, xm) => minD(id) = d2(xm, byId(seedId)) }
    var expected = Vector[(Int, Long, Option[Long])]((1, seedId, None))
    for (i <- 2 to 8) {
      val (nid, nd) = minD.toSeq.map { case (id, d) => (id, d) }.maxBy { case (id, d) => (d, -id) }
      expected = expected :+ ((i, nid, Some(nd)))
      pts.foreach { case (id, xm) => minD(id) = math.min(minD(id), d2(xm, byId(nid))) }
    }
    assert(got === expected, "coreset must equal the greedy farthest-point replay")
    // curve shape: each later pick is at most as far from the set as the
    // previous (the set only grows), and picks never repeat
    got.flatMap(_._3).sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, "radius curve must be non-increasing")
      case _         => ()
    }
    assert(got.map(_._2).distinct.size === got.size, "picks must be distinct")
    // coverage: after all K picks, every vector is within r_K... of the set?
    // r_k only bounds coverage AFTER pick k-1; assert the final state: the
    // max remaining min-distance is <= the last radius (Gonzalez invariant)
    assert(minD.values.max <= got.last._3.get, "no vector may sit farther than the last pick did")
    info(s"sf0.001: picks ${got.map(_._2).mkString(",")}, radius curve ${got.flatMap(_._3).mkString(" >= ")}")
  }
}
