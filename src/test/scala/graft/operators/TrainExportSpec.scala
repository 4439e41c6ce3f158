package graft.operators

import java.security.MessageDigest

import graft.SparkSpec

/** Training-shard export at sf0.001: manifest exactness, file layout, and
  * the deterministic-permutation contract.
  */
class TrainExportSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def expected(): Map[Int, Seq[(Long, String, Long)]] = {
    // (shard -> rows of (doc_id, order_key, n_tokens)) from first principles
    val docs = graft.core.Tables
      .documents(spark, sfDir)
      .select("doc_id", "text")
      .collect()
      .map { r =>
        val id = r.getLong(0)
        val key = md5hex(s"${TrainExport.SEED}:$id")
        val shard = (java.lang.Long.parseLong(key.substring(0, 7), 16) % TrainExport.N_SHARDS).toInt
        val nTokens = r.getString(1).trim.split("\\s+").length.toLong
        (shard, (id, key, nTokens))
      }
    docs.groupBy(_._1).map { case (s2, rs) => (s2, rs.map(_._2).toSeq) }
  }

  test("q83 shard plan: matches an md5 first-principles recomputation") {
    val exp = expected()
    val rows = TrainExport.q83ShardPlan(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSet === exp.keySet)
    rows.foreach { r =>
      val rs = exp(r.getInt(0))
      assert(r.getLong(1) === rs.length.toLong, s"shard ${r.getInt(0)} n_docs")
      assert(r.getLong(2) === rs.map(_._3).sum, s"shard ${r.getInt(0)} n_tokens")
      assert(r.getString(3) === rs.map(_._2).min, s"shard ${r.getInt(0)} first_key")
      assert(r.getString(4) === rs.map(_._2).max, s"shard ${r.getInt(0)} last_key")
    }
    // hash assignment balances: no shard holds more than 2x the mean
    val counts = rows.map(_.getLong(1))
    assert(counts.max <= 2 * (counts.sum / counts.length), "shard skew")
  }

  test("export writes one ordered file per shard; re-export is identical") {
    val out = java.nio.file.Files.createTempDirectory("train_export").toString
    TrainExport.write(spark, sfDir, out)
    val exp = expected()
    val firstRun = exp.keySet.toSeq.sorted.map { s2 =>
      val dir = new java.io.File(s"$out/shard=$s2")
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"shard $s2 must be exactly one file, got ${files.length}")
      // single-file read: partitions follow file offsets, so collect()
      // preserves on-disk row order at this size (one row group)
      val rows = spark.read.parquet(files.head.getPath).collect()
      val keys = rows.map(_.getAs[String]("order_key"))
      assert(keys.sorted.sameElements(keys), s"shard $s2 rows not in order_key order")
      assert(rows.map(_.getAs[Long]("doc_id")).toSet === exp(s2).map(_._1).toSet, s"shard $s2 membership")
      (s2, keys.toSeq)
    }
    // the permutation is a function of (seed, doc_id) only: a second export
    // reproduces every shard's row order exactly
    val out2 = java.nio.file.Files.createTempDirectory("train_export2").toString
    TrainExport.write(spark, sfDir, out2)
    firstRun.foreach { case (s2, keys) =>
      val f = new java.io.File(s"$out2/shard=$s2").listFiles().filter(_.getName.endsWith(".parquet")).head
      val keys2 = spark.read.parquet(f.getPath).collect().map(_.getAs[String]("order_key"))
      assert(keys2.sameElements(keys), s"shard $s2 re-export changed the order")
    }
  }

  test("curated export ships exactly the q77 kept set, same contract") {
    val out = java.nio.file.Files.createTempDirectory("train_export_cur").toString
    TrainExport.writeCurated(spark, sfDir, out)
    val kept = Curation.corpusBuildKept(spark, sfDir).select("doc_id").collect().map(_.getLong(0)).toSet
    val shardDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
    val exported = shardDirs.flatMap { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${d.getName} must be one file")
      val rows = spark.read.parquet(files.head.getPath).collect()
      val keys = rows.map(_.getAs[String]("order_key"))
      assert(keys.sorted.sameElements(keys), s"${d.getName} rows not in order")
      rows.map(_.getAs[Long]("doc_id"))
    }
    assert(exported.length === exported.distinct.length, "a doc exported twice")
    assert(exported.toSet === kept, "exported set != q77 kept set")
  }

  test("q132 epoch shuffle: decomposed pos == window rank; epochs are distinct permutations") {
    val got = TrainExport
      .q132EpochShuffle(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Long]("pos")))
      .toSeq

    // single-node replay of the declared semantics: per-epoch md5 keys,
    // shard = first-7-hex % N, pos = plain rank by (key, doc_id) in shard
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val ids = graft.core.Tables.documents(spark, sfDir).select("doc_id").collect().map(_.getLong(0)).toSeq
    val expected = (0 until TrainExport.EPOCHS)
      .flatMap { e =>
        val keyed = ids.map { id =>
          val k = md5hex(s"${TrainExport.SEED}:$e:$id")
          (id, k, (java.lang.Long.parseLong(k.take(7), 16) % TrainExport.N_SHARDS).toInt)
        }
        keyed.groupBy(_._3).toSeq.flatMap { case (shard, grp) =>
          grp.sortBy(g => (g._2, g._1)).zipWithIndex.map { case ((id, _, _), i) => (e, id, shard, i + 1L) }
        }
      }
      .sortBy(t => (t._1, t._2))
    assert(got === expected, "distributed epoch shuffle must equal the single-node rank replay")

    // every (epoch, shard) position set is exactly 1..n
    got.groupBy(t => (t._1, t._3)).foreach { case (k, grp) =>
      assert(grp.map(_._4).sorted === (1L to grp.size).toSeq, s"$k positions must be a permutation")
    }
    // the epoch salt actually reshuffles: epoch 0 and 1 differ somewhere
    val byEpoch = got.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).toSet)
    assert(byEpoch(0) !== byEpoch(1), "epoch salt must produce a different permutation")
  }

  test("q139 length buckets: equals a single-node replay; buckets partition and bound") {
    val lens = graft.core.Tables
      .documents(spark, sfDir)
      .select("text")
      .collect()
      .map(r => r.getString(0).trim.split("\\s+").length.toLong)
    val maxTok = lens.max
    def bucketOf(n: Long): Int =
      if (n <= 1) 0 else java.lang.Long.toBinaryString(n - 1).length
    val expected = lens
      .groupBy(bucketOf)
      .toSeq
      .map { case (b, grp) =>
        val (nd, tt) = (grp.length.toLong, grp.sum)
        val cap = 1L << b
        (b, cap, nd, tt,
          math.floor((nd * cap - tt).toDouble * 1e6 / (nd * cap) + 0.5) / 1e6,
          math.floor((nd * maxTok - tt).toDouble * 1e6 / (nd * maxTok) + 0.5) / 1e6)
      }
      .sortBy(_._1)
    val got = TrainExport
      .q139LengthBuckets(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toSeq
    assert(got === expected, "bucket audit must equal the single-node replay")
    assert(got.map(_._3).sum === lens.length.toLong, "buckets partition the corpus")
    got.foreach { case (b, cap, nd, tt, bp, _) =>
      assert(tt <= nd * cap, s"bucket $b token mass exceeds its padded capacity")
      assert(bp >= 0 && bp < 1, s"bucket $b pad frac out of range")
    }
    info(s"sf0.001: ${got.length} buckets, bucketed-vs-global pad fracs " +
      got.map(g => f"${g._1}:${g._5}%.3f/${g._6}%.3f").mkString(" "))
  }
}
