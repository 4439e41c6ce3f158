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
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Two-rename commit. The staging write reads the OLD table lazily —
    * distinct directories, safe self-reference.
    */
  def commit(df: DataFrame, dir: String): Unit = {
    val staging = Paths.get(dir + ".staging")
    val old = Paths.get(dir + ".old")
    val target = Paths.get(dir)
    df.write.mode("overwrite").parquet(staging.toString)
    delete(old)
    if (Files.exists(target)) Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    delete(old)
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
