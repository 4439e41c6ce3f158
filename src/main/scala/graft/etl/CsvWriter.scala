package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Exact-name single-file CSV sink (SURVEY §2.1 S8): the reference coalesces
  * to 1 and writes `task1_output_<date>.csv` via pandas
  * (`data_processing.py:179`, `381-413`). The report is ≤24 rows by
  * construction, so a driver-side collect + java.io write is the right
  * tool — a distributed writer would produce part-files needing a rename,
  * for 24 rows. (For large frames use `df.write.csv`; this sink is
  * deliberately small-report-only.)
  */
object CsvWriter {

  val MaxCollectRows = 10000

  /** Writes df as a single CSV with header; returns the path. Refuses frames
    * larger than MaxCollectRows — this sink is for small final reports only.
    */
  def writeSingleFile(df: DataFrame, outPath: String): String = {
    val rows = df.limit(MaxCollectRows + 1).collect()
    require(rows.length <= MaxCollectRows, s"CsvWriter is a small-report sink; got > $MaxCollectRows rows")
    val header = df.columns.mkString(",")
    val body = rows.map(_.toSeq.map(csvCell).mkString(","))
    val content = (header +: body).mkString("", "\n", "\n")
    val p = Paths.get(outPath)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    outPath
  }

  private def csvCell(v: Any): String = v match {
    case null => ""
    case s: String if s.exists(c => c == ',' || c == '"' || c == '\n') =>
      "\"" + s.replace("\"", "\"\"") + "\""
    case other => other.toString
  }

  def taskOutputName(date: String): String = s"task1_output_$date.csv"
}
