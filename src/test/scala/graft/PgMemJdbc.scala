package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, Driver, DriverPropertyInfo,
  PreparedStatement, ResultSet, ResultSetMetaData, SQLException,
  SQLFeatureNotSupportedException, Statement, Types}
import java.util.Properties

import scala.collection.mutable

/** TEST DOUBLE: an in-memory JDBC engine registered under a
  * `jdbc:postgresql://graftmem` URL, so Spark resolves the REAL
  * PostgresDialect and the s4 writer/reader EXECUTE the pg code path —
  * DDL generation, identifier quoting, insert batching, and the
  * type-int/type-name metadata that getCatalystType maps back — without
  * a server (the sandbox has no Postgres and no H2 jar; Derby covers the
  * live-protocol leg in SourcesSpec). Dynamic proxies implement just the
  * JDBC surface Spark's JdbcUtils/JDBCRDD touch; any untouched method
  * throws, so a Spark-version drift surfaces as a named failure, not a
  * silent stub.
  *
  * This is deliberately test-scope: the engine ships no fake driver.
  */
object PgMemStore {

  case class Col(name: String, pgType: String, sqlType: Int,
      precision: Int, scale: Int)

  final class Table(val cols: Vector[Col]) {
    val rows = mutable.ArrayBuffer.empty[Array[Any]]
  }

  private val tables = mutable.HashMap.empty[String, Table]
  val ddlLog = mutable.ArrayBuffer.empty[String]

  def clear(): Unit = synchronized { tables.clear(); ddlLog.clear() }
  def table(name: String): Option[Table] = synchronized(tables.get(name))

  /** pg DDL type → (pg wire type name, java.sql.Types, precision, scale)
    * — the same mapping the real org.postgresql driver reports back in
    * ResultSetMetaData.
    */
  private def mapType(raw: String): (String, Int, Int, Int) = {
    val t = raw.trim.toUpperCase.replaceAll("\\s+NOT\\s+NULL$", "")
    val base = t.takeWhile(_ != '(').trim
    val args = "\\((\\d+)(?:\\s*,\\s*(\\d+))?\\)".r.findFirstMatchIn(t)
    base match {
      case "TEXT" => ("text", Types.VARCHAR, Int.MaxValue, 0)
      case "VARCHAR" | "CHARACTER VARYING" =>
        ("varchar", Types.VARCHAR,
          args.map(_.group(1).toInt).getOrElse(Int.MaxValue), 0)
      case "BIGINT" | "INT8" => ("int8", Types.BIGINT, 19, 0)
      case "INTEGER" | "INT4" | "INT" => ("int4", Types.INTEGER, 10, 0)
      case "SMALLINT" | "INT2" => ("int2", Types.SMALLINT, 5, 0)
      case "FLOAT8" | "DOUBLE PRECISION" => ("float8", Types.DOUBLE, 17, 0)
      case "FLOAT4" | "REAL" => ("float4", Types.REAL, 8, 0)
      case "TIMESTAMP" => ("timestamp", Types.TIMESTAMP, 29, 6)
      // the real org.postgresql driver reports timestamptz as
      // Types.TIMESTAMP + typeName "timestamptz"; PostgresDialect keys
      // its TimestampType mapping off exactly that pair
      case "TIMESTAMP WITH TIME ZONE" =>
        ("timestamptz", Types.TIMESTAMP, 35, 6)
      case "DATE" => ("date", Types.DATE, 13, 0)
      case "BOOLEAN" | "BIT" => ("bool", Types.BIT, 1, 0)
      case "NUMERIC" | "DECIMAL" =>
        ("numeric", Types.NUMERIC, args.map(_.group(1).toInt).getOrElse(38),
          args.flatMap(m => Option(m.group(2))).map(_.toInt).getOrElse(0))
      case "BYTEA" => ("bytea", Types.BINARY, Int.MaxValue, 0)
      case other => throw new SQLException(s"pgmem: unmapped DDL type $other")
    }
  }

  private def stripQ(s: String) =
    s.trim.stripPrefix("\"").stripSuffix("\"")

  /** Split a DDL column list on top-level commas (types like
    * NUMERIC(10,2) contain commas inside parens).
    */
  private def splitTop(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private val CreateRe = "(?is)\\s*CREATE\\s+TABLE\\s+(\\S+)\\s*\\((.*)\\)\\s*[^)]*".r
  private val DropRe = "(?is)\\s*DROP\\s+TABLE\\s+(\\S+)\\s*".r
  private val InsertRe =
    "(?is)\\s*INSERT\\s+INTO\\s+(\\S+)\\s*\\(([^)]*)\\)\\s*VALUES\\s*\\((.*)\\)\\s*".r
  private val SelectRe =
    "(?is)\\s*SELECT\\s+(.*?)\\s+FROM\\s+(\\S+)\\s*(?:WHERE\\s+(.*?))?\\s*".r

  def execUpdate(sql: String): Int = synchronized {
    sql match {
      case CreateRe(name, colsStr) =>
        val cols = splitTop(colsStr).map { cd =>
          val m = "\"([^\"]+)\"\\s+(.+)".r.findFirstMatchIn(cd).getOrElse(
            throw new SQLException(s"pgmem: unparsed column def '$cd'"))
          val (pg, tpe, prec, sc) = mapType(m.group(2))
          Col(m.group(1), pg, tpe, prec, sc)
        }.toVector
        if (tables.contains(stripQ(name)))
          throw new SQLException(s"pgmem: table $name already exists")
        tables(stripQ(name)) = new Table(cols)
        ddlLog += sql.trim
        0
      case DropRe(name) =>
        if (tables.remove(stripQ(name)).isEmpty)
          // 42P01 = undefined_table: the SQLState PostgresDialect's
          // isObjectNotFoundException matches (Spark 4 rethrows any
          // tableExists failure that is NOT an object-not-found)
          throw new SQLException(s"pgmem: no table $name", "42P01")
        ddlLog += sql.trim
        0
      case other => throw new SQLException(s"pgmem: unsupported update $other")
    }
  }

  private def runSelect(sql: String): ResultSet = synchronized {
    sql match {
      case SelectRe(colList, rawName, where) =>
        val name = stripQ(rawName)
        val tab = tables.getOrElse(name,
          throw new SQLException(s"pgmem: no table $name", "42P01"))
        val empty = where != null && where.replaceAll("\\s", "") == "1=0"
        val trimmed = colList.trim
        if (trimmed == "1") {
          resultSet(Vector(Col("1", "int4", Types.INTEGER, 10, 0)),
            if (empty) Vector.empty
            else tab.rows.toVector.map(_ => Array[Any](1)))
        } else {
          val cols =
            if (trimmed == "*") tab.cols
            else splitTop(trimmed).map(stripQ).map(n =>
              tab.cols.find(_.name == n).getOrElse(
                throw new SQLException(s"pgmem: no column $n in $name"))).toVector
          val idx = cols.map(c => tab.cols.indexWhere(_.name == c.name))
          val rows =
            if (empty) Vector.empty
            else tab.rows.toVector.map(r => idx.map(r(_)).toArray)
          resultSet(cols, rows)
        }
      case other => throw new SQLException(s"pgmem: unsupported query $other")
    }
  }

  // ---- dynamic proxies -------------------------------------------------

  private def mk[T](iface: Class[T])(h: (String, Array[AnyRef]) => Any): T =
    Proxy.newProxyInstance(getClass.getClassLoader, Array[Class[_]](iface),
      new InvocationHandler {
        def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = {
          val args = if (a == null) Array.empty[AnyRef] else a
          (m.getName match {
            case "toString" => "pgmem:" + iface.getSimpleName
            case "hashCode" => Int.box(System.identityHashCode(p))
            case "equals" => Boolean.box(p.asInstanceOf[AnyRef] eq args(0))
            case "isWrapperFor" => Boolean.box(false)
            case other => h(other, args)
          }).asInstanceOf[AnyRef]
        }
      }).asInstanceOf[T]

  def connection(url: String): Connection = {
    var closed = false
    var autoCommit = true
    mk(classOf[Connection]) { (name, args) => name match {
      case "prepareStatement" => prepared(args(0).asInstanceOf[String])
      case "createStatement" => statement()
      case "close" => closed = true; null
      case "isClosed" => Boolean.box(closed)
      case "setAutoCommit" =>
        autoCommit = args(0).asInstanceOf[java.lang.Boolean]; null
      case "getAutoCommit" => Boolean.box(autoCommit)
      case "commit" | "rollback" | "clearWarnings" | "setReadOnly"
         | "setNetworkTimeout" | "setTransactionIsolation" => null
      case "getWarnings" | "getCatalog" | "getSchema" => null
      case "getTransactionIsolation" =>
        Int.box(Connection.TRANSACTION_READ_COMMITTED)
      case "getMetaData" => dbMeta(url)
      case "isValid" => Boolean.box(!closed)
      case other => throw new SQLException(s"pgmem Connection.$other")
    }}
  }

  private def dbMeta(url: String): DatabaseMetaData =
    mk(classOf[DatabaseMetaData]) { (name, _) => name match {
      case "getDatabaseProductName" => "PostgreSQL"
      case "getDatabaseProductVersion" => "16.0 (pgmem)"
      case "getDriverName" => "graft pgmem"
      case "getDriverVersion" => "0.1"
      case "getURL" => url
      case "getUserName" => "graft"
      case "getDriverMajorVersion" => Int.box(0)
      case "getDriverMinorVersion" => Int.box(1)
      case "getJDBCMajorVersion" => Int.box(4)
      case "getJDBCMinorVersion" => Int.box(2)
      case "getDatabaseMajorVersion" => Int.box(16)
      case "getDatabaseMinorVersion" => Int.box(0)
      case "getMaxColumnNameLength" => Int.box(63)
      // savePartition: report no transaction support, so the writer's
      // plain autocommit path runs (commit/rollback stay no-ops)
      case "supportsTransactions"
         | "supportsDataManipulationTransactionsOnly"
         | "supportsDataDefinitionAndDataManipulationTransactions" =>
        Boolean.box(false)
      case "getDefaultTransactionIsolation" =>
        Int.box(Connection.TRANSACTION_READ_COMMITTED)
      case "supportsTransactionIsolationLevel" => Boolean.box(false)
      case other => throw new SQLException(s"pgmem DatabaseMetaData.$other")
    }}

  private def statement(): Statement =
    mk(classOf[Statement]) { (name, args) => name match {
      case "executeUpdate" => Int.box(execUpdate(args(0).asInstanceOf[String]))
      case "executeQuery" => runSelect(args(0).asInstanceOf[String])
      case "setQueryTimeout" | "close" | "cancel" | "setFetchSize" => null
      case "isClosed" => Boolean.box(false)
      case other => throw new SQLException(s"pgmem Statement.$other")
    }}

  private def prepared(sql: String): PreparedStatement = {
    val insert = InsertRe.findFirstMatchIn(sql)
    val (tabName, insCols) = insert match {
      case Some(m) =>
        (stripQ(m.group(1)), splitTop(m.group(2)).map(stripQ).toVector)
      case None => (null, Vector.empty[String])
    }
    val nParams = if (insert.isDefined) insCols.length else 0
    val params = new Array[Any](nParams)
    val batch = mutable.ArrayBuffer.empty[Array[Any]]
    mk(classOf[PreparedStatement]) { (name, args) => name match {
      case "executeQuery" => runSelect(sql)
      case "executeUpdate" => Int.box(execUpdate(sql))
      case "setNull" =>
        params(args(0).asInstanceOf[java.lang.Integer] - 1) = null; null
      case s if s.startsWith("set") && args.length == 2 &&
          args(0).isInstanceOf[java.lang.Integer] =>
        params(args(0).asInstanceOf[java.lang.Integer] - 1) = args(1); null
      case "addBatch" => batch += params.clone(); null
      case "executeBatch" => PgMemStore.synchronized {
        val tab = tables.getOrElse(tabName,
          throw new SQLException(s"pgmem: no table $tabName", "42P01"))
        // map insert-column order onto table order
        val idx = insCols.map(n => tab.cols.indexWhere(_.name == n))
        require(idx.forall(_ >= 0), s"pgmem: insert cols $insCols vs table")
        batch.foreach { b =>
          val row = new Array[Any](tab.cols.length)
          idx.zipWithIndex.foreach { case (to, from) => row(to) = b(from) }
          tab.rows += row
        }
        val n = batch.length
        batch.clear()
        Array.fill(n)(1)
      }
      case "clearBatch" => batch.clear(); null
      case "setQueryTimeout" | "close" | "cancel" | "setFetchSize" => null
      case "isClosed" => Boolean.box(false)
      case "getConnection" =>
        throw new SQLException("pgmem PreparedStatement.getConnection")
      case other => throw new SQLException(s"pgmem PreparedStatement.$other")
    }}
  }

  private def resultSet(cols: Vector[Col],
      rows: Vector[Array[Any]]): ResultSet = {
    var cursor = -1
    var nullSeen = false
    def cell(i: Int): Any = {
      val v = rows(cursor)(i - 1)
      nullSeen = v == null
      v
    }
    mk(classOf[ResultSet]) { (name, args) => name match {
      case "next" => cursor += 1; Boolean.box(cursor < rows.length)
      case "close" => null
      case "wasNull" => Boolean.box(nullSeen)
      case "getMetaData" => rsMeta(cols)
      case "getLong" => cell(args(0).asInstanceOf[java.lang.Integer]) match {
        case null => Long.box(0L)
        case n: java.lang.Number => Long.box(n.longValue)
      }
      case "getInt" => cell(args(0).asInstanceOf[java.lang.Integer]) match {
        case null => Int.box(0)
        case n: java.lang.Number => Int.box(n.intValue)
      }
      case "getShort" => cell(args(0).asInstanceOf[java.lang.Integer]) match {
        case null => Short.box(0.toShort)
        case n: java.lang.Number => Short.box(n.shortValue)
      }
      case "getDouble" => cell(args(0).asInstanceOf[java.lang.Integer]) match {
        case null => Double.box(0.0)
        case n: java.lang.Number => Double.box(n.doubleValue)
      }
      case "getFloat" => cell(args(0).asInstanceOf[java.lang.Integer]) match {
        case null => Float.box(0.0f)
        case n: java.lang.Number => Float.box(n.floatValue)
      }
      case "getBoolean" => cell(args(0).asInstanceOf[java.lang.Integer]) match {
        case null => Boolean.box(false)
        case b: java.lang.Boolean => b
      }
      case "getString" =>
        Option(cell(args(0).asInstanceOf[java.lang.Integer]))
          .map(_.toString).orNull
      case "getTimestamp" =>
        cell(args(0).asInstanceOf[java.lang.Integer])
          .asInstanceOf[java.sql.Timestamp]
      case "getDate" =>
        cell(args(0).asInstanceOf[java.lang.Integer])
          .asInstanceOf[java.sql.Date]
      case "getBigDecimal" =>
        cell(args(0).asInstanceOf[java.lang.Integer])
          .asInstanceOf[java.math.BigDecimal]
      case "getBytes" =>
        cell(args(0).asInstanceOf[java.lang.Integer])
          .asInstanceOf[Array[Byte]]
      case other => throw new SQLException(s"pgmem ResultSet.$other")
    }}
  }

  private def rsMeta(cols: Vector[Col]): ResultSetMetaData =
    mk(classOf[ResultSetMetaData]) { (name, args) =>
      def col = cols(args(0).asInstanceOf[java.lang.Integer] - 1)
      name match {
        case "getColumnCount" => Int.box(cols.length)
        case "getColumnName" | "getColumnLabel" => col.name
        case "getColumnType" => Int.box(col.sqlType)
        case "getColumnTypeName" => col.pgType
        case "getPrecision" => Int.box(col.precision)
        case "getScale" => Int.box(col.scale)
        case "isSigned" => Boolean.box(true)
        case "isNullable" => Int.box(ResultSetMetaData.columnNullable)
        case "getCatalogName" | "getSchemaName" | "getTableName" => ""
        case "getColumnDisplaySize" => Int.box(col.precision)
        case other => throw new SQLException(s"pgmem ResultSetMetaData.$other")
      }
    }
}

/** The java.sql.Driver face of [[PgMemStore]]. Accepts only the
  * graftmem pseudo-host, so a real Postgres driver elsewhere on the
  * classpath could never be shadowed.
  */
class PgMemDriver extends Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:postgresql://graftmem")
  override def connect(url: String, info: Properties): Connection =
    if (acceptsURL(url)) PgMemStore.connection(url) else null
  override def getPropertyInfo(url: String,
      info: Properties): Array[DriverPropertyInfo] = Array.empty
  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 1
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new SQLFeatureNotSupportedException()
}
