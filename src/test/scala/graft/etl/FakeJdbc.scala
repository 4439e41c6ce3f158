package graft.etl

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, ResultSet, SQLException, Statement, Timestamp}

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

/** In-memory stand-in for a SQL warehouse, exposed through real `java.sql`
  * interfaces via dynamic proxies — the container ships no JDBC driver, so
  * this plays the role SQLite plays in the reference's tests
  * (`tests/test_client_report_etl.py:48`). It interprets exactly the
  * statement shapes the [[SqlDialect]]s generate (DDL, batch insert,
  * `ON CONFLICT`/`MERGE` upsert, range delete, `NOT EXISTS` archive,
  * verify aggregate), with real value semantics: primary-key violations
  * throw, upserts replace, `BETWEEN` is closed, NULL keys never conflict.
  *
  * Executor threads share the JVM in local mode, so a named in-memory
  * database is reachable from `foreachPartition` tasks; mutations are
  * synchronized per database (matching a single-writer SQL engine closely
  * enough for these tests).
  */
object FakeJdbc {

  final class Table(val cols: Seq[String], initialKeys: Seq[String], val notNull: Seq[Boolean]) {
    // unique-key columns: from PRIMARY KEY at create time, or assigned later
    // by CREATE UNIQUE INDEX (the NULL-friendly upsert anchor)
    var keys: Seq[String] = initialKeys
    def keyIdx: Seq[Int] = keys.map(cols.indexOf)
    // rows in table-column order; keyed rows for unique-keyed tables,
    // appended rows for NULL-containing keys (SQL: NULLs are distinct, no
    // conflict fires)
    val keyed: mutable.LinkedHashMap[Seq[Any], Array[Any]] = mutable.LinkedHashMap()
    val nullKeyed: mutable.ArrayBuffer[Array[Any]] = mutable.ArrayBuffer()

    def allRows: Seq[Array[Any]] = keyed.values.toSeq ++ nullKeyed.toSeq

    def put(row: Array[Any], upsert: Boolean): Unit = {
      // enforce NOT NULL like a real engine — FakeJdbc must not be more
      // permissive than the warehouses it stands in for
      notNull.zipWithIndex.foreach { case (nn, i) =>
        if (nn && row(i) == null)
          throw new SQLException(s"null value in column ${cols(i)} violates not-null constraint")
      }
      val key = keyIdx.map(row(_))
      if (keyIdx.nonEmpty && key.contains(null)) { nullKeyed += row; return }
      if (keyIdx.isEmpty) { nullKeyed += row; return }
      if (!upsert && keyed.contains(key))
        throw new SQLException(s"duplicate key value violates unique constraint: $key")
      keyed(key) = row
    }
  }

  final class Db {
    val tables: TrieMap[String, Table] = TrieMap()
    def table(name: String): Table =
      tables.getOrElse(name, throw new SQLException(s"no such table: $name"))
  }

  private val dbs = TrieMap[String, Db]()
  def db(name: String): Db = dbs.getOrElseUpdate(name, new Db)
  def drop(name: String): Unit = dbs.remove(name)

  def factory(name: String): JdbcWarehouse.ConnectionFactory =
    new JdbcWarehouse.ConnectionFactory {
      override def apply(): Connection = connection(name)
    }

  // --- SQL interpretation ----------------------------------------------------

  private def norm(sql: String): String =
    sql.replace("\"", "").replaceAll("\\s+", " ").trim

  /** Strip the schema qualifier: the fake is schema-per-database. */
  private def bare(name: String): String = name.substring(name.lastIndexOf('.') + 1)

  private val CreateTable = """CREATE TABLE IF NOT EXISTS (\S+) \((.+)\)""".r
  private val CreateUniqueIndex = """CREATE UNIQUE INDEX IF NOT EXISTS \S+ ON (\S+) \(([^)]*)\)""".r
  private val InsertValues = """INSERT INTO (\S+) \(([^)]*)\) VALUES \(([^)]*)\)( ON CONFLICT \(([^)]*)\) DO UPDATE SET .+)?""".r
  private val MergeUpsert = """MERGE INTO (\S+) t USING \(VALUES \([^)]*\)\) AS s \(([^)]*)\) ON \((.+?)\) WHEN MATCHED .+""".r
  private val DeleteRange = """DELETE FROM (\S+) WHERE (\S+) BETWEEN \? AND \?""".r
  private val ArchiveRange =
    """INSERT INTO (\S+) \(([^)]*)\) SELECT .+ FROM (\S+) src WHERE src\.(\S+) BETWEEN \? AND \? AND NOT EXISTS \(SELECT 1 FROM \S+ dst WHERE dst\.(\S+) = src\.\S+\)""".r
  private val VerifyAgg =
    """SELECT COUNT\(\*\), MIN\((\S+)\), MAX\(\S+\), COALESCE\(SUM\(impression_count\), 0\), COALESCE\(SUM\(click_count\), 0\) FROM (\S+)( WHERE \S+ BETWEEN \? AND \?)?""".r

  private def splitTopLevel(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.toSeq
  }

  private def cmp(a: Any, b: Any): Int =
    a.asInstanceOf[Comparable[Any]].compareTo(b)

  private def inRange(v: Any, lo: Any, hi: Any): Boolean =
    v != null && cmp(v, lo) >= 0 && cmp(v, hi) <= 0

  /** Execute a (possibly parameterized) update statement; returns rowcount. */
  private def executeUpdate(d: Db, sql: String, params: IndexedSeq[Any]): Int = d.synchronized {
    norm(sql) match {
      case s if s.startsWith("CREATE SCHEMA") || s.startsWith("CREATE INDEX") => 0
      case CreateUniqueIndex(name, colList) =>
        val t = d.table(bare(name))
        if (t.keys.isEmpty) t.keys = colList.split(",").map(_.trim).toSeq
        0
      case CreateTable(name, body) =>
        val items = splitTopLevel(body)
        val keys = items
          .find(_.toUpperCase.startsWith("PRIMARY KEY"))
          .map(k => k.substring(k.indexOf('(') + 1, k.lastIndexOf(')')).split(",").map(_.trim).toSeq)
          .getOrElse(Nil)
        val colItems = items.filterNot(_.toUpperCase.startsWith("PRIMARY KEY"))
        val cols = colItems.map(_.split("\\s+")(0))
        val notNull = colItems.map(i => i.toUpperCase.endsWith("NOT NULL") || keys.contains(i.split("\\s+")(0)))
        d.tables.getOrElseUpdate(bare(name), new Table(cols, keys, notNull))
        0
      case ArchiveRange(dst, colList, src, tsCol, _) =>
        val to = d.table(bare(dst))
        val from = d.table(bare(src))
        val cols = colList.split(",").map(_.trim).toSeq
        val tsI = from.cols.indexOf(tsCol)
        val dstTsI = to.cols.indexOf(tsCol)
        val already = to.allRows.map(_(dstTsI)).toSet
        val moved = from.allRows.filter(r => inRange(r(tsI), params(0), params(1)) && !already.contains(r(tsI)))
        moved.foreach { r =>
          // project src order -> dst order through the statement's col list
          val out = new Array[Any](to.cols.length)
          cols.foreach(c => out(to.cols.indexOf(c)) = r(from.cols.indexOf(c)))
          to.put(out, upsert = false)
        }
        moved.size
      case InsertValues(name, colList, _, conflict, _) =>
        val t = d.table(bare(name))
        val cols = colList.split(",").map(_.trim).toSeq
        val row = new Array[Any](t.cols.length)
        cols.zipWithIndex.foreach { case (c, i) => row(t.cols.indexOf(c)) = params(i) }
        t.put(row, upsert = conflict != null)
        1
      case MergeUpsert(name, colList, _) =>
        val t = d.table(bare(name))
        val cols = colList.split(",").map(_.trim).toSeq
        val row = new Array[Any](t.cols.length)
        cols.zipWithIndex.foreach { case (c, i) => row(t.cols.indexOf(c)) = params(i) }
        t.put(row, upsert = true)
        1
      case DeleteRange(name, tsCol) =>
        val t = d.table(bare(name))
        val tsI = t.cols.indexOf(tsCol)
        val doomed = t.keyed.filter { case (_, r) => inRange(r(tsI), params(0), params(1)) }.keys.toSeq
        doomed.foreach(t.keyed.remove)
        val before = t.nullKeyed.size
        t.nullKeyed.filterInPlace(r => !inRange(r(tsI), params(0), params(1)))
        doomed.size + (before - t.nullKeyed.size)
      case other => throw new SQLException(s"fake jdbc: unsupported update: $other")
    }
  }

  private def executeQuery(d: Db, sql: String, params: IndexedSeq[Any]): Seq[Array[Any]] = d.synchronized {
    norm(sql) match {
      case VerifyAgg(tsCol, name, ranged) =>
        val t = d.table(bare(name))
        val tsI = t.cols.indexOf(tsCol)
        val impI = t.cols.indexOf("impression_count")
        val clkI = t.cols.indexOf("click_count")
        val rows =
          if (ranged != null) t.allRows.filter(r => inRange(r(tsI), params(0), params(1)))
          else t.allRows
        def longAt(r: Array[Any], i: Int): Long = r(i) match {
          case null => 0L
          case n: Number => n.longValue()
        }
        val ts = rows.map(_(tsI)).filter(_ != null)
        Seq(
          Array[Any](
            rows.size.toLong,
            if (ts.isEmpty) null else ts.minBy(_.asInstanceOf[Timestamp].getTime),
            if (ts.isEmpty) null else ts.maxBy(_.asInstanceOf[Timestamp].getTime),
            rows.map(longAt(_, impI)).sum,
            rows.map(longAt(_, clkI)).sum
          )
        )
      case other => throw new SQLException(s"fake jdbc: unsupported query: $other")
    }
  }

  // --- java.sql proxies ------------------------------------------------------

  private def proxy[T](cls: Class[T])(handle: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy
      .newProxyInstance(
        cls.getClassLoader,
        Array[Class[_]](cls),
        new InvocationHandler {
          override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
            val a = if (args == null) Array.empty[AnyRef] else args
            (m.getName, a) match {
              case x if handle.isDefinedAt(x) => handle(x)
              case ("toString", _) => s"Fake${cls.getSimpleName}"
              case ("hashCode", _) => Integer.valueOf(System.identityHashCode(p))
              case ("equals", Array(o)) => java.lang.Boolean.valueOf(p eq o)
              case ("close", _) | ("setAutoCommit", _) | ("commit", _) | ("rollback", _) => null
              case ("isClosed", _) => java.lang.Boolean.FALSE
              case (name, _) => throw new UnsupportedOperationException(s"fake jdbc: ${cls.getSimpleName}.$name")
            }
          }
        }
      )
      .asInstanceOf[T]

  def connection(dbName: String): Connection = {
    val d = db(dbName)
    proxy(classOf[Connection]) {
      case ("createStatement", _) => plainStatement(d)
      case ("prepareStatement", Array(sql: String)) => prepared(d, sql)
    }
  }

  private def plainStatement(d: Db): Statement =
    proxy(classOf[Statement]) {
      case ("execute", Array(sql: String)) =>
        executeUpdate(d, sql, IndexedSeq.empty)
        java.lang.Boolean.FALSE
      case ("executeUpdate", Array(sql: String)) =>
        Integer.valueOf(executeUpdate(d, sql, IndexedSeq.empty))
    }

  private def prepared(d: Db, sql: String): PreparedStatement = {
    val params = mutable.Map[Int, Any]()
    val batch = mutable.ArrayBuffer[IndexedSeq[Any]]()
    def bound: IndexedSeq[Any] =
      if (params.isEmpty) IndexedSeq.empty
      else (1 to params.keys.max).map(i => params.getOrElse(i, null))
    proxy(classOf[PreparedStatement]) {
      case ("setObject", Array(i: Integer, v)) => params(i.intValue) = v; null
      case ("setTimestamp", Array(i: Integer, v)) => params(i.intValue) = v; null
      case ("setNull", Array(i: Integer, _)) => params(i.intValue) = null; null
      case ("addBatch", Array()) => batch += bound; params.clear(); null
      case ("executeBatch", _) =>
        val counts = batch.map(p => executeUpdate(d, sql, p)).toArray
        batch.clear()
        counts
      case ("executeUpdate", Array()) => Integer.valueOf(executeUpdate(d, sql, bound))
      case ("executeQuery", Array()) => resultSet(executeQuery(d, sql, bound))
    }
  }

  private def resultSet(rows: Seq[Array[Any]]): ResultSet = {
    var cursor = -1
    proxy(classOf[ResultSet]) {
      case ("next", _) =>
        cursor += 1
        java.lang.Boolean.valueOf(cursor < rows.size)
      case ("getLong", Array(i: Integer)) =>
        java.lang.Long.valueOf(rows(cursor)(i.intValue - 1) match {
          case null => 0L
          case n: Number => n.longValue()
        })
      case ("getTimestamp", Array(i: Integer)) =>
        rows(cursor)(i.intValue - 1).asInstanceOf[Timestamp]
      case ("getObject", Array(i: Integer)) =>
        rows(cursor)(i.intValue - 1).asInstanceOf[AnyRef]
    }
  }
}
