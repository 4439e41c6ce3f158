package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet state tables for incremental maintainers (SCD2 history, corpus
  * build state): stage-then-swap commits (ParquetWarehouse's two-rename
  * shape — never zero copies on disk, `.old`/`.staging` recoverable on
  * crash) plus a plain-text high-watermark sidecar. The sidecar is written
  * AFTER the table swap: a crash between the two leaves an older watermark
  * and a newer table, and maintainers are built so re-applying the covered
  * delta is a no-op.
  */
private[streaming] object StateStore {

  def readTable(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    if (Files.isDirectory(Paths.get(dir))) spark.read.parquet(dir)
    else if (Files.isDirectory(Paths.get(dir + ".old")))
      // crash-window fallback: a crash between commit's retire and promote
      // renames leaves the complete pre-tick table in `.old` only
      spark.read.parquet(dir + ".old")
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Two-rename commit. The staging write reads the OLD table lazily —
    * distinct directories, safe self-reference.
    */
  def commit(df: DataFrame, dir: String): Unit = {
    df.write.mode("overwrite").parquet(dir + ".staging")
    promoteStaging(dir)
  }

  /** Swap a fully-written `<dir>.staging` into `<dir>` with no loss window.
    * Heals a prior crash first: if a crash struck between the retire and
    * promote renames (target missing, `.old` holding the complete pre-tick
    * table), the replayed commit restores `.old` to the canonical slot
    * BEFORE any delete. So `.old` is only ever deleted while the target
    * holds a complete table, and EVERY crash prefix leaves a complete copy
    * where [[readTable]] looks (target, or `.old` via its fallback) —
    * without the heal, the replay's first delete removed the only copy and
    * a second crash before the promote left none.
    *
    * `failAfterStep` is a test-only crash injection: throws after that many
    * filesystem steps completed, so a spec can assert the invariant on
    * every prefix.
    */
  private[streaming] def promoteStaging(dir: String, failAfterStep: Int = Int.MaxValue): Unit = {
    val staging = Paths.get(dir + ".staging")
    val old = Paths.get(dir + ".old")
    val target = Paths.get(dir)
    var done = 0
    def step(): Unit = {
      if (done >= failAfterStep) throw new IllegalStateException(s"injected crash after $done steps")
      done += 1
    }
    if (!Files.exists(target) && Files.exists(old)) {
      step(); Files.move(old, target, StandardCopyOption.ATOMIC_MOVE)
    }
    step(); delete(old)
    if (Files.exists(target)) { step(); Files.move(target, old, StandardCopyOption.ATOMIC_MOVE) }
    step(); Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    step(); delete(old)
  }

  def readWatermark(path: java.nio.file.Path): Long =
    if (Files.exists(path)) new String(Files.readAllBytes(path), "UTF-8").trim.toLong else -1L

  def writeWatermark(path: java.nio.file.Path, w: Long): Unit = {
    Files.write(path, w.toString.getBytes("UTF-8"))
    ()
  }

  def delete(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
}

/** A slice-accumulating state family: ticks append `<dir>/delta_<lo>/`
  * parquet slices (lo = the slice's first ingest id, strictly ascending
  * across ticks), and periodic compaction folds the accumulated slices into
  * one `<dir>/base/` table so per-tick reads stop paying O(total slices) in
  * file listings and scan setup.
  *
  * Compaction is crash-safe without ever double-reading a row: the base
  * carries a `_covered` sidecar INSIDE its directory (so the promote rename
  * moves data + coverage watermark atomically, and parquet readers skip the
  * `_`-prefixed file), and [[read]] only includes slices with `lo >
  * covered`. A crash after the base promote but before slice GC therefore
  * leaves folded slices on disk but EXCLUDED from every read; the next
  * compaction sweep deletes them. Slice ids make this sound: a slice's rows
  * all have ingest ids in [lo, that tick's hi], ticks never overlap ranges,
  * and a fold always covers a PREFIX of slices — so `lo > covered` is
  * exactly "not yet folded".
  *
  * At 100 TB the same structure holds with the base stored bucketed on the
  * probe key (`sources/Layouts`) and slice GC done by a manifest swap; the
  * read/compact contract here is unchanged.
  */
private[streaming] object SliceStore {
  import java.nio.file.Path

  import scala.jdk.CollectionConverters._

  /** Slices folded per compaction trigger — compaction runs once the live
    * slice count reaches this (overridable via `graft.stream.compactSlices`).
    */
  val DefaultCompactSlices = 16

  private def coveredOf(base: Path): Long = {
    val m = base.resolve("_covered")
    if (Files.exists(m)) new String(Files.readAllBytes(m), "UTF-8").trim.toLong else Long.MinValue
  }

  /** (picked base if any, its covered watermark, live slices sorted by lo,
    * dead slices already folded into the base).
    */
  private def layout(dir: String): (Option[Path], Long, Seq[(Long, Path)], Seq[Path]) = {
    val d = Paths.get(dir)
    val base = d.resolve("base")
    val baseOld = d.resolve("base.old")
    // same heal-first promote machinery as StateStore.commit: base, or the
    // retired base.old during the crash window
    val pick = if (Files.isDirectory(base)) Some(base)
    else if (Files.isDirectory(baseOld)) Some(baseOld)
    else None
    val covered = pick.map(coveredOf).getOrElse(Long.MinValue)
    val slices =
      if (!Files.isDirectory(d)) Seq.empty
      else {
        val s = Files.list(d)
        try
          s.iterator().asScala.toSeq.collect {
            case p if p.getFileName.toString.startsWith("delta_") =>
              p.getFileName.toString.stripPrefix("delta_").toLong -> p
          }
        finally s.close()
      }
    val (live, dead) = slices.partition(_._1 > covered)
    (pick, covered, live.sortBy(_._1), dead.map(_._2))
  }

  /** The family's full current contents: compacted base + unfolded slices. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val (pick, _, live, _) = layout(dir)
    val paths = pick.map(_.toString).toSeq ++ live.map(_._2.toString)
    spark.read.parquet(paths: _*)
  }

  /** Contents EXCLUDING the slice keyed `loExclusive` and above — "state as
    * of the previous watermark". The anti-join guard for append-only
    * accumulator families (corpus test-shingles, fp→canon): a tick derives
    * its append as `delta MINUS readBelow(lo)`, so a crashed tick's replay
    * never anti-joins against its own stale slice and overwrites it empty.
    * Falls back to an empty frame of `schema` before the first slice lands.
    */
  def readBelow(spark: SparkSession, dir: String, loExclusive: Long, schema: StructType): DataFrame = {
    val (pick, _, live, _) = layout(dir)
    val paths = pick.map(_.toString).toSeq ++ live.collect { case (lo, p) if lo < loExclusive => p.toString }
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(paths: _*)
  }

  /** Fold live slices into the base once their count reaches the threshold;
    * `coveredHi` is the tick's ingest watermark (every live slice's ids are
    * <= it). Always GCs slices a crashed prior fold left behind. Returns
    * true when a fold ran.
    */
  def maybeCompact(spark: SparkSession, dir: String, coveredHi: Long): Boolean = {
    val (pick, _, live, dead) = layout(dir)
    dead.foreach(StateStore.delete)
    val threshold = spark.conf
      .getOption("graft.stream.compactSlices")
      .map(_.toInt)
      .getOrElse(DefaultCompactSlices)
    if (live.size < threshold) return false

    val srcPaths = pick.map(_.toString).toSeq ++ live.map(_._2.toString)
    val merged = spark.read.parquet(srcPaths: _*)
    val staging = dir + "/base.staging"
    merged.write.mode("overwrite").parquet(staging)
    Files.write(Paths.get(staging, "_covered"), coveredHi.toString.getBytes("UTF-8"))
    StateStore.promoteStaging(dir + "/base")
    // GC the folded slices — a crash anywhere in this loop is safe, the
    // promoted _covered watermark already excludes them from every read
    live.foreach { case (_, p) => StateStore.delete(p) }
    true
  }
}
