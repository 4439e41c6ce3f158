package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** Crash-safety of the shared stage-then-swap commit: a crash after ANY
  * prefix of promoteStaging's filesystem steps must leave a complete table
  * where readTable looks (target or `.old`) — including the double-crash
  * case where a prior crash already left only `.old` and the REPLAYED
  * commit crashes mid-swap. The pre-fix ordering deleted `.old` before the
  * promote, so that exact sequence lost the whole table.
  */
class StateStoreSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))

  private def writeTable(path: String, rows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("k", "v").write.mode("overwrite").parquet(path)
  }

  private def readRows(dir: String): Set[(Long, Long)] =
    StateStore
      .readTable(spark, dir, schema)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  private val oldRows = Seq(1L -> 10L, 2L -> 20L, 3L -> 30L)
  private val newRows = Seq(1L -> 11L, 4L -> 40L)

  test("readTable falls back to .old during the retire/promote crash window") {
    val dir = Files.createTempDirectory("ss_fb").toString + "/t"
    writeTable(dir + ".old", oldRows)
    assert(readRows(dir) === oldRows.toSet)
  }

  test("every crash prefix of a replayed commit leaves a complete table (heal-first ordering)") {
    for (failAt <- 0 to 5) {
      // prior crash state: target gone, `.old` holds the complete pre-tick
      // table, and the crashed commit's staging survives with stale bytes
      val dir = Files.createTempDirectory(s"ss_crash$failAt").toString + "/t"
      writeTable(dir + ".old", oldRows)
      writeTable(dir + ".staging", Seq(9L -> 99L))

      // the replayed commit (fresh data) crashes after `failAt` fs steps:
      // re-stage (what commit's write does) then the injected-crash swap
      import spark.implicits._
      writeTable(dir + ".staging", newRows)
      val crashed =
        try { StateStore.promoteStaging(dir, failAt); false }
        catch { case _: IllegalStateException => true }

      val visible = readRows(dir)
      assert(
        visible === oldRows.toSet || visible === newRows.toSet,
        s"failAt=$failAt: crash prefix must leave the complete old or new table, got $visible"
      )

      if (crashed) {
        // the NEXT replay (no crash) must converge to the new table
        StateStore.commit(newRows.toDF("k", "v"), dir)
      }
      assert(readRows(dir) === newRows.toSet, s"failAt=$failAt: replay must converge")
      assert(!Files.exists(Paths.get(dir + ".old")), s"failAt=$failAt: clean commit retires .old")
    }
  }

  test("plain commit cycle: overwrite semantics, no leftover side dirs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ss_plain").toString + "/t"
    StateStore.commit(oldRows.toDF("k", "v"), dir)
    assert(readRows(dir) === oldRows.toSet)
    StateStore.commit(newRows.toDF("k", "v"), dir)
    assert(readRows(dir) === newRows.toSet)
    assert(!Files.exists(Paths.get(dir + ".old")) && !Files.exists(Paths.get(dir + ".staging")))
  }
}
