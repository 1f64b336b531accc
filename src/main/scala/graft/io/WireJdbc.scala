package graft.io

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{Connection, PreparedStatement, ResultSet, ResultSetMetaData, SQLException}

/** Shared JDBC facade for the built-in wire clients ([[PgJdbcDriver]],
  * [[MyJdbcDriver]]): both protocols deliver a result as typed column
  * metadata plus TEXT-format rows pulled off the socket on demand, so the
  * `java.sql` surface Spark's JDBC source consumes (Connection /
  * PreparedStatement / streamed forward-only ResultSet / metadata) is
  * protocol-independent and lives here once. Interfaces are served by
  * dynamic proxies: only the methods Spark actually calls are handled,
  * anything else fails loudly with the method name.
  */
private[io] object WireJdbc {

  /** One result column: JDBC type code + the metadata Spark's getSchema
    * reads (typeName, precision, scale, signedness).
    */
  final case class ColInfo(name: String, jdbcType: Int, typeName: String,
      precision: Int, scale: Int, signed: Boolean)

  /** The facade's lossless text carrier for binary values — PG's bytea hex
    * form ("\x" + lowercase pairs), shared by both wire clients and
    * [[PgWire.render]]. Table-driven: the per-byte format-interpolator
    * alternative allocates a Formatter per byte on the row-decode hot path.
    */
  private val hexDigits = "0123456789abcdef".toCharArray
  private[io] def hexBytea(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(2 + b.length * 2)
    sb.append('\\').append('x')
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xFF
      sb.append(hexDigits(v >> 4)).append(hexDigits(v & 0xF))
      i += 1
    }
    sb.toString
  }
  private[io] def unhexBytea(s: String): Array[Byte] = {
    val out = new Array[Byte]((s.length - 2) / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((Character.digit(s.charAt(2 + i * 2), 16) << 4) |
        Character.digit(s.charAt(3 + i * 2), 16)).toByte
      i += 1
    }
    out
  }

  private[io] def proxy[T](iface: Class[T])(
      pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    java.lang.reflect.Proxy.newProxyInstance(
      iface.getClassLoader, Array[Class[_]](iface),
      (proxyObj, method, argsOrNull) => {
        val args = if (argsOrNull == null) Array.empty[AnyRef] else argsOrNull
        val key = (method.getName, args)
        if (pf.isDefinedAt(key)) pf(key)
        else method.getName match {
          case "toString" => s"graft-wire-${iface.getSimpleName}"
          case "hashCode" => Int.box(System.identityHashCode(proxyObj))
          case "equals" => Boolean.box(args.headOption.exists(_ eq proxyObj))
          case "isWrapperFor" => Boolean.box(false)
          case other => throw new SQLException(
            s"graft wire-jdbc: ${iface.getSimpleName}.$other not implemented")
        }
      }).asInstanceOf[T]

  /** The protocol-specific half a wire client implements. */
  trait WireConnection {
    /** Issue one query; the returned result streams rows as pulled. */
    def wireQuery(sql: String): WireResult
    /** Protocol goodbye + socket close (idempotent). */
    def wireClose(): Unit
    def wireClosed: Boolean
    def jdbcUrl: String
    def dbName: String
    def userName: String
    def productName: String
    def productVersion: String

    private var autoCommit = true

    final def asConnection: Connection = proxy(classOf[Connection]) {
      case ("prepareStatement", args) => statement(args(0).asInstanceOf[String])
      case ("createStatement", _) => statement(null)
      case ("setAutoCommit", args) => autoCommit = args(0).asInstanceOf[Boolean]; null
      case ("getAutoCommit", _) => Boolean.box(autoCommit)
      case ("commit", _) | ("rollback", _) => null
      case ("close", _) => wireClose(); null
      case ("isClosed", _) => Boolean.box(wireClosed)
      case ("isValid", _) => Boolean.box(!wireClosed)
      case ("setReadOnly", _) | ("setTransactionIsolation", _) |
           ("clearWarnings", _) | ("setNetworkTimeout", _) => null
      case ("getTransactionIsolation", _) =>
        Int.box(Connection.TRANSACTION_READ_COMMITTED)
      case ("getWarnings", _) => null
      case ("getMetaData", _) => databaseMetaData
      case ("getCatalog", _) => dbName
      case ("getSchema", _) => "public"
    }

    private def databaseMetaData: java.sql.DatabaseMetaData =
      proxy(classOf[java.sql.DatabaseMetaData]) {
        case ("getDatabaseProductName", _) => productName
        case ("getDatabaseProductVersion", _) => productVersion
        case ("getDatabaseMajorVersion", _) =>
          Int.box(productVersion.takeWhile(_.isDigit).toIntOption.getOrElse(1))
        case ("getDatabaseMinorVersion", _) => Int.box(0)
        case ("getDriverName", _) => "graft-wire-jdbc"
        case ("getDriverVersion", _) => "1.0"
        case ("getDriverMajorVersion", _) => Int.box(1)
        case ("getDriverMinorVersion", _) => Int.box(0)
        case ("getJDBCMajorVersion", _) => Int.box(4)
        case ("getJDBCMinorVersion", _) => Int.box(2)
        case ("getURL", _) => jdbcUrl
        case ("getUserName", _) => userName
        case ("supportsTransactions", _) => Boolean.box(true)
      }

    private def statement(preparedSql: String): PreparedStatement = {
      var currentResult: WireResult = null
      var stmtClosed = false
      def run(sql: String): ResultSet = {
        val r = wireQuery(sql)
        currentResult = r
        r.asResultSet
      }
      proxy(classOf[PreparedStatement]) {
        case ("executeQuery", args) if args.nonEmpty =>
          run(args(0).asInstanceOf[String])
        case ("executeQuery", _) => run(preparedSql)
        case ("setQueryTimeout", _) | ("setFetchSize", _) | ("setMaxRows", _) |
             ("setEscapeProcessing", _) | ("clearWarnings", _) |
             ("cancel", _) => null
        case ("getWarnings", _) => null
        case ("close", _) =>
          if (!stmtClosed) {
            stmtClosed = true
            if (currentResult != null) currentResult.closeResult()
          }
          null
        case ("isClosed", _) => Boolean.box(stmtClosed)
        case ("getConnection", _) => asConnection
      }
    }
  }

  /** Streaming result of one wire query: `pull()` returns the next row's
    * text-format values (null entries = SQL NULL) or None at end-of-rows
    * (by then the protocol's own trailer has been consumed). Closing an
    * EXHAUSTED result is free; closing one with rows still on the wire
    * calls `abort` (closes the connection) instead of draining — a task
    * that stops early (take/limit) on a large table must not pull the
    * whole remainder over the socket, and Spark's JDBC connections are
    * per-operation, so the poisoned connection is being discarded anyway.
    */
  final class WireResult(fields: Array[ColInfo],
      pull: () => Option[Array[String]],
      abort: () => Unit = () => ()) {

    private var row: Array[String] = null
    private var done = fields.isEmpty
    private var nullFlag = false
    private var rsClosed = false

    private[io] def closeResult(): Unit = if (!rsClosed) {
      rsClosed = true
      if (!done) { abort(); done = true }
    }

    private def value(i: Int): String = {
      val v = row(i - 1)
      nullFlag = v == null
      v
    }
    private def num[T](i: Int, parse: String => T, zero: T): T = {
      val v = value(i)
      if (v == null) zero else parse(v)
    }

    def asResultSet: ResultSet = proxy(classOf[ResultSet]) {
      case ("next", _) =>
        if (done) Boolean.box(false)
        else pull() match {
          case Some(r) => row = r; Boolean.box(true)
          case None => done = true; Boolean.box(false)
        }
      case ("wasNull", _) => Boolean.box(nullFlag)
      case ("getString", args) => value(args(0).asInstanceOf[Int])
      case ("getInt", args) => Int.box(num(args(0).asInstanceOf[Int], _.toInt, 0))
      case ("getLong", args) => Long.box(num(args(0).asInstanceOf[Int], _.toLong, 0L))
      case ("getShort", args) =>
        Short.box(num(args(0).asInstanceOf[Int], _.toShort, 0.toShort))
      case ("getDouble", args) =>
        Double.box(num(args(0).asInstanceOf[Int], _.toDouble, 0.0))
      case ("getFloat", args) =>
        Float.box(num(args(0).asInstanceOf[Int], _.toFloat, 0.0f))
      case ("getBoolean", args) =>
        val v = value(args(0).asInstanceOf[Int])
        // PG text bool is 't'/'f'; MySQL TINY(1) is '1'/'0'
        Boolean.box(v != null && (v == "t" || v == "true" || v == "1"))
      case ("getBigDecimal", args) =>
        num(args(0).asInstanceOf[Int], new java.math.BigDecimal(_), null)
      case ("getDate", args) =>
        num(args(0).asInstanceOf[Int], java.sql.Date.valueOf, null)
      case ("getTimestamp", args) =>
        num(args(0).asInstanceOf[Int], java.sql.Timestamp.valueOf, null)
      case ("getBytes", args) =>
        val v = value(args(0).asInstanceOf[Int])
        if (v == null) null
        else if (v.startsWith("\\x")) unhexBytea(v) // PG bytea text form
        else v.getBytes(UTF_8)
      case ("getMetaData", _) => metaData
      case ("close", _) => closeResult(); null
      case ("isClosed", _) => Boolean.box(rsClosed)
      case ("getFetchSize", _) => Int.box(0)
      case ("setFetchSize", _) | ("clearWarnings", _) => null
      case ("getWarnings", _) => null
      case ("findColumn", args) =>
        val idx = fields.indexWhere(_.name == args(0).asInstanceOf[String])
        if (idx < 0) throw new SQLException( // JDBC contract: throw, not 0
          s"no such column '${args(0)}' (have: ${fields.map(_.name).mkString(", ")})")
        Int.box(idx + 1)
    }

    private def metaData: ResultSetMetaData = proxy(classOf[ResultSetMetaData]) {
      case ("getColumnCount", _) => Int.box(fields.length)
      case ("getColumnName", args) => fields(args(0).asInstanceOf[Int] - 1).name
      case ("getColumnLabel", args) => fields(args(0).asInstanceOf[Int] - 1).name
      case ("getColumnType", args) =>
        Int.box(fields(args(0).asInstanceOf[Int] - 1).jdbcType)
      case ("getColumnTypeName", args) =>
        fields(args(0).asInstanceOf[Int] - 1).typeName
      case ("getPrecision", args) =>
        Int.box(fields(args(0).asInstanceOf[Int] - 1).precision)
      case ("getScale", args) =>
        Int.box(fields(args(0).asInstanceOf[Int] - 1).scale)
      case ("isSigned", args) =>
        Boolean.box(fields(args(0).asInstanceOf[Int] - 1).signed)
      case ("isNullable", _) => Int.box(ResultSetMetaData.columnNullable)
    }
  }
}
