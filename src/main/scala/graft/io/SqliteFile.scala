package graft.io

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** SQLite database FILE format — reader and minimal writer, from the public
  * format spec (https://www.sqlite.org/fileformat2.html). The reference's
  * `sqlite(path, table)` table function (table_functions.py:772-807) opens
  * database files directly; this container has no sqlite JDBC jar, so the
  * Spark-first route is the file format itself: parse the table b-tree
  * (interior/leaf pages, varint cells, serial-type records, overflow-page
  * chains), map declared column types through SQLite's affinity rules, and
  * hand Spark a local relation.
  *
  * Scale contract: a .sqlite file is a single-machine artifact by
  * construction (one file, page-chained b-trees — not splittable the way
  * parquet row groups are); the reader materializes driver-side and
  * parallelizes, the same contract as [[org.apache.spark.sql.graftbridge
  * .ArrowBridge.fromArrowStream]]. The multi-TB path is parquet/lakehouse.
  *
  * Writer scope (the round-trip/oracle device, not a storage engine): one
  * or more tables of long/double/string/binary/bool/null cells, leaf pages
  * plus one interior level (~400 leaves ≈ 10^5 small rows), no overflow
  * spill (each row must fit a page; enforced), rowid = insertion order.
  * Files it writes are standard: any SQLite can open them.
  */
object SqliteFile {

  private val Magic: Array[Byte] = // 16 bytes, NUL-terminated
    "SQLite format 3".getBytes(UTF_8) :+ 0.toByte

  final case class TableInfo(name: String, rootPage: Int, sql: String)

  // ---------------------------------------------------------------- read

  private final class Db(bytes: Array[Byte]) {
    require(bytes.length >= 100 &&
      java.util.Arrays.equals(bytes.take(16), Magic), "not a SQLite 3 file")
    val pageSize: Int = {
      val raw = ((bytes(16) & 0xFF) << 8) | (bytes(17) & 0xFF)
      if (raw == 1) 65536 else raw
    }
    val reserved: Int = bytes(20) & 0xFF
    val usable: Int = pageSize - reserved
    require((bytes(56 + 3) & 0xFF) == 1, "only UTF-8 text encoding supported")

    def page(n: Int): ByteBuffer = // pages are numbered from 1
      ByteBuffer.wrap(bytes, (n - 1) * pageSize, pageSize).slice()

    private def varint(b: ByteBuffer): Long = {
      var v = 0L; var i = 0
      while (i < 8) {
        val x = b.get() & 0xFF
        v = (v << 7) | (x & 0x7F)
        if ((x & 0x80) == 0) return v
        i += 1
      }
      (v << 8) | (b.get() & 0xFF)
    }

    /** Full payload of a leaf-table cell, following overflow chains. */
    private def cellPayload(b: ByteBuffer): (Long, Array[Byte]) = {
      val p = varint(b) // payload length
      val rowid = varint(b)
      val x = usable - 35
      if (p <= x) {
        val out = new Array[Byte](p.toInt); b.get(out); (rowid, out)
      } else {
        val m = ((usable - 12) * 32 / 255) - 23
        val k = m + ((p - m) % (usable - 4)).toInt
        val local = if (k <= x) k else m
        val out = new Array[Byte](p.toInt)
        b.get(out, 0, local)
        var got = local
        var next = b.getInt() // first overflow page
        while (got < p && next != 0) {
          val ob = page(next)
          next = ob.getInt()
          val take = math.min(usable - 4, p.toInt - got)
          ob.get(out, got, take)
          got += take
        }
        require(got == p, s"truncated overflow chain (got $got of $p)")
        (rowid, out)
      }
    }

    /** Decode one record payload → column values (AnyRef or null):
      * java.lang.Long / java.lang.Double / String / Array[Byte].
      */
    private def record(payload: Array[Byte]): Array[AnyRef] = {
      val b = ByteBuffer.wrap(payload)
      val start = b.position()
      val hdrLen = varint(b)
      val types = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (b.position() - start < hdrLen) types += varint(b)
      types.map { t =>
        (t: @unchecked) match {
          case 0L => null
          case 1L => Long.box(b.get().toLong)
          case 2L => Long.box(b.getShort().toLong)
          case 3L =>
            val v = ((b.get() & 0xFFL) << 16) | ((b.get() & 0xFFL) << 8) | (b.get() & 0xFFL)
            Long.box((v << 40) >> 40) // sign-extend 24-bit
          case 4L => Long.box(b.getInt().toLong)
          case 5L =>
            var v = 0L; var i = 0
            while (i < 6) { v = (v << 8) | (b.get() & 0xFFL); i += 1 }
            Long.box((v << 16) >> 16) // sign-extend 48-bit
          case 6L => Long.box(b.getLong())
          case 7L => Double.box(b.getDouble())
          case 8L => Long.box(0L)
          case 9L => Long.box(1L)
          case n if n >= 13 && n % 2 == 1 =>
            val len = ((n - 13) / 2).toInt
            val s = new Array[Byte](len); b.get(s)
            new String(s, UTF_8)
          case n if n >= 12 && n % 2 == 0 =>
            val len = ((n - 12) / 2).toInt
            val blob = new Array[Byte](len); b.get(blob)
            blob
        }
      }.toArray
    }

    /** Walk a table b-tree from its root; calls f(rowid, columnValues). */
    def walk(rootPage: Int)(f: (Long, Array[AnyRef]) => Unit): Unit = {
      val b = page(rootPage)
      val headerOff = if (rootPage == 1) 100 else 0
      b.position(headerOff)
      val pageType = b.get() & 0xFF
      b.position(headerOff + 3)
      val cellCount = b.getShort() & 0xFFFF
      pageType match {
        case 13 => // leaf table
          val ptrBase = headerOff + 8
          var i = 0
          while (i < cellCount) {
            b.position(ptrBase + 2 * i)
            val off = b.getShort() & 0xFFFF
            b.position(off)
            val (rowid, payload) = cellPayload(b)
            f(rowid, record(payload))
            i += 1
          }
        case 5 => // interior table
          val ptrBase = headerOff + 12
          var i = 0
          while (i < cellCount) {
            b.position(ptrBase + 2 * i)
            val off = b.getShort() & 0xFFFF
            b.position(off)
            walk(b.getInt())(f)
            i += 1
          }
          b.position(headerOff + 8)
          walk(b.getInt())(f) // rightmost pointer
        case other =>
          throw new IllegalArgumentException(
            s"unsupported b-tree page type $other (index pages / corrupt file)")
      }
    }

    /** sqlite_master (root page 1): user tables. */
    def tables: Seq[TableInfo] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[TableInfo]
      walk(1) { (_, vals) =>
        // columns: type, name, tbl_name, rootpage, sql
        if (vals.length >= 5 && vals(0) == "table") {
          val name = vals(1).asInstanceOf[String]
          if (!name.startsWith("sqlite_"))
            out += TableInfo(name, vals(3).asInstanceOf[java.lang.Long].toInt,
              Option(vals(4)).map(_.asInstanceOf[String]).getOrElse(""))
        }
      }
      out.toSeq
    }
  }

  /** One parsed column: name, Spark type (via SQLite affinity), and
    * whether it is the INTEGER PRIMARY KEY rowid alias (stored as NULL in
    * records; the value IS the rowid — fileformat2.html §2.1).
    */
  final case class SqliteColumn(name: String, dataType: DataType,
      rowidAlias: Boolean)

  /** CREATE TABLE … parse: column names + SQLite type AFFINITY
    * (https://www.sqlite.org/datatype3.html §3.1): contains INT → integer;
    * CHAR/CLOB/TEXT → text; BLOB or empty → blob; REAL/FLOA/DOUB → real;
    * otherwise NUMERIC (surfaced as string — a NUMERIC cell is dynamically
    * typed per row and a rendered string is the total representation).
    */
  def parseColumns(createSql: String): Seq[SqliteColumn] = {
    val open = createSql.indexOf('(')
    val close = createSql.lastIndexOf(')')
    require(open > 0 && close > open, s"unparseable CREATE TABLE: $createSql")
    require(!createSql.substring(close + 1).toUpperCase.contains("WITHOUT ROWID"),
      "WITHOUT ROWID tables not supported")
    val body = createSql.substring(open + 1, close)
    // split top-level commas (parens nest in CHECK(...) / DECIMAL(p,s))
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var startIdx = 0; var inQuote = 0.toChar
    body.zipWithIndex.foreach { case (c, i) =>
      if (inQuote != 0.toChar) { if (c == inQuote) inQuote = 0.toChar }
      else c match {
        case '\'' | '"' | '`' => inQuote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => parts += body.substring(startIdx, i); startIdx = i + 1
        case _ =>
      }
    }
    parts += body.substring(startIdx)
    val constraintKw = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    // a table-level PRIMARY KEY(col) over a single INTEGER column is ALSO
    // the rowid alias (lang_createtable.html "ROWID and the INTEGER
    // PRIMARY KEY") — collect its bare column name
    val tablePkCol: Option[String] = parts.map(_.trim).collectFirst {
      case p if p.toUpperCase.startsWith("PRIMARY") && p.contains('(') &&
          p.lastIndexOf(')') > p.indexOf('(') =>
        val inner = p.substring(p.indexOf('(') + 1, p.lastIndexOf(')'))
        if (inner.contains(',')) "" // composite PK: never an alias
        else inner.trim.stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("`").stripSuffix("`").stripPrefix("[").stripSuffix("]")
          .split("\\s+")(0)
    }.filter(_.nonEmpty)
    parts.map(_.trim).filter(_.nonEmpty).flatMap { coldef =>
      // a quoted identifier may contain spaces: "my col" TEXT / [my col] / `x y`
      val firstTok = coldef.head match {
        case q @ ('"' | '`') =>
          val end = coldef.indexOf(q, 1)
          require(end > 0, s"unterminated quoted identifier: $coldef")
          coldef.substring(0, end + 1)
        case '[' =>
          val end = coldef.indexOf(']', 1)
          require(end > 0, s"unterminated [identifier]: $coldef")
          coldef.substring(0, end + 1)
        case _ => coldef.split("\\s+", 2)(0)
      }
      val bare = firstTok.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("`").stripSuffix("`").stripPrefix("[").stripSuffix("]")
      if (constraintKw.contains(bare.toUpperCase)) None
      else {
        val restU = coldef.substring(firstTok.length).toUpperCase
        val affinity =
          if (restU.contains("INT")) LongType
          else if (restU.contains("CHAR") || restU.contains("CLOB") ||
            restU.contains("TEXT")) StringType
          else if (restU.trim.isEmpty || restU.trim.startsWith("BLOB")) BinaryType
          else if (restU.contains("REAL") || restU.contains("FLOA") ||
            restU.contains("DOUB")) DoubleType
          else StringType // NUMERIC affinity, rendered
        // rowid-alias rule (lang_createtable.html): the declared type must
        // be EXACTLY "INTEGER" — INT/BIGINT PRIMARY KEY columns store real
        // values in the record — and "PRIMARY KEY DESC" is documented NOT
        // to alias (the historical quirk the format preserves). The column
        // is also an alias when a single-column table-level
        // PRIMARY KEY(col) names it.
        val typeTok = restU.trim.split("\\s+").headOption.getOrElse("")
        val exactInteger = typeTok == "INTEGER"
        val isRowidAlias = exactInteger && (
          (restU.contains("PRIMARY KEY") && !restU.contains("PRIMARY KEY DESC")) ||
            tablePkCol.exists(_.equalsIgnoreCase(bare)))
        Some(SqliteColumn(bare, affinity, isRowidAlias))
      }
    }.toSeq
  }

  /** Tables present in a .sqlite file. */
  def listTables(path: String): Seq[TableInfo] =
    new Db(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))).tables

  /** Read one table into a DataFrame (see the scale contract above). */
  def read(spark: SparkSession, path: String, table: String): DataFrame = {
    val db = new Db(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val info = db.tables.find(_.name.equalsIgnoreCase(table)).getOrElse(
      throw new IllegalArgumentException(
        s"table '$table' not in $path (have: ${db.tables.map(_.name).mkString(", ")})"))
    val cols = parseColumns(info.sql)
    val schema = StructType(cols.map(c => StructField(c.name, c.dataType)))
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    db.walk(info.rootPage) { (rowid, vals) =>
      val out = new Array[Any](cols.length)
      var i = 0
      while (i < cols.length) {
        val c = cols(i)
        // records may have FEWER columns than the schema (rows inserted
        // before an ALTER TABLE ADD COLUMN) — missing trailing cols = null
        val v: AnyRef = if (i < vals.length) vals(i) else null
        out(i) =
          // a TRUE alias column always stores NULL (the value IS the
          // rowid); preferring a non-null stored value makes an alias
          // misdetection harmless instead of silently wrong
          if (c.rowidAlias && v == null) Long.box(rowid)
          else coerce(v, c.dataType)
        i += 1
      }
      rows += Row.fromSeq(out.toSeq)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows.toSeq: _*), schema)
  }

  /** SQLite cells are dynamically typed; coerce to the column's affinity
    * type the way datatype3.html §4.2 converts on read.
    */
  private def coerce(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: java.lang.Long, LongType) => l
    case (d: java.lang.Double, LongType) => Long.box(d.toLong)
    case (s: String, LongType) => s.toLongOption.map(Long.box).orNull
    case (l: java.lang.Long, DoubleType) => Double.box(l.toDouble)
    case (d: java.lang.Double, DoubleType) => d
    case (s: String, DoubleType) => s.toDoubleOption.map(Double.box).orNull
    case (s: String, StringType) => s
    case (l: java.lang.Long, StringType) => l.toString
    case (d: java.lang.Double, StringType) => d.toString
    case (b: Array[Byte], StringType) => new String(b, UTF_8)
    case (b: Array[Byte], BinaryType) => b
    case (s: String, BinaryType) => s.getBytes(UTF_8)
    // a BLOB stored under INTEGER/REAL affinity is legal in SQLite's
    // dynamic typing and never converts numerically (datatype3.html §4.2
    // table, BLOB row) — surface NULL, consistent with unparseable strings
    case (_: Array[Byte], LongType) | (_: Array[Byte], DoubleType) => null
    case (other, _) => other.toString
  }

  // --------------------------------------------------------------- write

  /** Write `rows` as a standard single-file SQLite database (one table).
    * Cell types: Long/Int/Double/Float/String/Array[Byte]/Boolean/null.
    */
  def write(path: String, table: String, columns: Seq[(String, DataType)],
      rows: Seq[Seq[Any]]): Unit = {
    val pageSize = 4096
    val usable = pageSize
    val x = usable - 35

    def varintBytes(v0: Long): Array[Byte] = {
      require(v0 >= 0, "writer only emits non-negative varints")
      if (v0 == 0) return Array(0)
      var v = v0
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      while (v > 0) { out += (v & 0x7F).toByte; v >>>= 7 }
      val r = out.reverse.toArray
      (0 until r.length - 1).foreach(i => r(i) = (r(i) | 0x80).toByte)
      r
    }

    def recordBytes(vals: Seq[Any]): Array[Byte] = {
      val typed: Seq[(Long, Array[Byte])] = vals.map {
        case null => (0L, Array.empty[Byte])
        case b: Boolean => (if (b) 9L else 8L, Array.empty[Byte])
        case i: Int => intCell(i.toLong)
        case l: Long => intCell(l)
        case f: Float => (7L, ByteBuffer.allocate(8).putDouble(f.toDouble).array())
        case d: Double => (7L, ByteBuffer.allocate(8).putDouble(d).array())
        case s: String =>
          val b = s.getBytes(UTF_8); (13L + 2L * b.length, b)
        case b: Array[Byte] => (12L + 2L * b.length, b)
        case other =>
          val b = other.toString.getBytes(UTF_8); (13L + 2L * b.length, b)
      }
      val typeBytes = typed.map(t => varintBytes(t._1))
      // header length includes its own varint (always 1 byte at our sizes)
      val hdrLen = 1 + typeBytes.map(_.length).sum
      require(hdrLen < 128, "record header too wide for the minimal writer")
      val body = typed.map(_._2)
      val out = new java.io.ByteArrayOutputStream()
      out.write(hdrLen)
      typeBytes.foreach(out.write)
      body.foreach(out.write)
      out.toByteArray
    }
    def intCell(l: Long): (Long, Array[Byte]) =
      if (l == 0) (8L, Array.empty)
      else if (l == 1) (9L, Array.empty)
      else if (l >= Byte.MinValue && l <= Byte.MaxValue) (1L, Array(l.toByte))
      else if (l >= Short.MinValue && l <= Short.MaxValue)
        (2L, ByteBuffer.allocate(2).putShort(l.toShort).array())
      else if (l >= Int.MinValue && l <= Int.MaxValue)
        (4L, ByteBuffer.allocate(4).putInt(l.toInt).array())
      else (6L, ByteBuffer.allocate(8).putLong(l).array())

    def cellBytes(rowid: Long, rec: Array[Byte]): Array[Byte] = {
      require(rec.length <= x,
        s"row payload ${rec.length} exceeds one page ($x) — minimal writer has no overflow")
      val out = new java.io.ByteArrayOutputStream()
      out.write(varintBytes(rec.length.toLong))
      out.write(varintBytes(rowid))
      out.write(rec)
      out.toByteArray
    }

    /** Pack cells into a leaf-table page image (without deciding its page
      * number); returns (pageBytes, maxRowid).
      */
    def leafPage(cells: Seq[(Long, Array[Byte])], headerOff: Int): Array[Byte] = {
      val page = new Array[Byte](pageSize)
      val b = ByteBuffer.wrap(page)
      b.position(headerOff)
      b.put(13.toByte) // leaf table
      b.putShort(0) // no freeblocks
      b.putShort(cells.length.toShort)
      var content = pageSize
      val offsets = cells.map { case (_, cb) => content -= cb.length; content }
      b.putShort(content.toShort)
      b.put(0.toByte) // fragmented free bytes
      cells.zip(offsets).foreach { case ((_, cb), off) =>
        b.putShort(off.toShort)
        System.arraycopy(cb, 0, page, off, cb.length)
      }
      page
    }

    val dataType: Seq[DataType] = columns.map(_._2)
    def sqlType(dt: DataType): String = dt match {
      case LongType | IntegerType | BooleanType => "BIGINT"
      case DoubleType | FloatType => "DOUBLE"
      case BinaryType => "BLOB"
      case _ => "TEXT"
    }
    val createSql = s"CREATE TABLE $table (" +
      columns.map { case (n, dt) => s"$n ${sqlType(dt)}" }.mkString(", ") + ")"

    // data cells → leaf pages (capacity: 8B header + 2B ptr + cell)
    val cells = rows.zipWithIndex.map { case (r, i) =>
      ((i + 1).toLong, cellBytes((i + 1).toLong, recordBytes(r)))
    }
    val leaves = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Array[Byte])]]
    var current = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    var used = 8
    cells.foreach { case (rowid, cb) =>
      if (used + 2 + cb.length > usable && current.nonEmpty) {
        leaves += current.toSeq
        current = scala.collection.mutable.ArrayBuffer.empty
        used = 8
      }
      current += ((rowid, cb)); used += 2 + cb.length
    }
    if (current.nonEmpty || leaves.isEmpty) leaves += current.toSeq

    // page layout: 1 = header+sqlite_master, 2 = table root, 3.. = leaves
    // (root is itself the single leaf when the table fits one page)
    val multiLeaf = leaves.length > 1
    require(leaves.length <= 400, "minimal writer: one interior level only")
    val rootPage = 2
    val leafPageNums =
      if (multiLeaf) leaves.indices.map(_ + 3) else Seq(rootPage)
    val totalPages = if (multiLeaf) 2 + leaves.length else 2

    val file = new Array[Byte](totalPages * pageSize)
    def putPage(n: Int, img: Array[Byte]): Unit =
      System.arraycopy(img, 0, file, (n - 1) * pageSize, pageSize)

    if (multiLeaf) {
      // interior root: cell per leaf except the last (rightmost pointer)
      val page = new Array[Byte](pageSize)
      val b = ByteBuffer.wrap(page)
      b.put(5.toByte); b.putShort(0)
      b.putShort((leaves.length - 1).toShort)
      val interiorCells = leaves.init.zip(leafPageNums.init).map {
        case (leafCells, pageNum) =>
          val maxRowid = leafCells.last._1
          val out = new java.io.ByteArrayOutputStream()
          val pb = ByteBuffer.allocate(4).putInt(pageNum).array()
          out.write(pb); out.write(varintBytes(maxRowid))
          out.toByteArray
      }
      var content = pageSize
      val offs = interiorCells.map { cb => content -= cb.length; content }
      b.putShort(content.toShort)
      b.put(0.toByte)
      b.putInt(leafPageNums.last) // rightmost pointer
      interiorCells.zip(offs).foreach { case (cb, off) =>
        b.putShort(off.toShort)
        System.arraycopy(cb, 0, page, off, cb.length)
      }
      putPage(rootPage, page)
      leaves.zip(leafPageNums).foreach { case (ls, n) => putPage(n, leafPage(ls, 0)) }
    } else {
      putPage(rootPage, leafPage(leaves.head, 0))
    }

    // page 1: 100-byte header + sqlite_master leaf. Page 1 loses the
    // 100-byte file header PLUS the 8-byte leaf page header and one
    // 2-byte cell pointer, so the generic one-page bound (usable-35) is
    // not enough here — a CREATE TABLE near ~3.9KB (many/long column
    // names) would silently overlap the header and corrupt the file.
    val masterRec = recordBytes(Seq("table", table, table, rootPage.toLong, createSql))
    val masterCellMax = usable - 100 - 8 - 2 - 9 * 2 // varint headroom
    require(masterRec.length <= masterCellMax,
      s"sqlite_master record ${masterRec.length}B exceeds page-1 capacity " +
        s"($masterCellMax B after the 100-byte file header) — shorten the " +
        "table/column names; the minimal writer has no overflow pages")
    val masterPage = leafPage(Seq((1L, cellBytes(1L, masterRec))), 100)
    val h = ByteBuffer.wrap(masterPage)
    h.put(Magic)
    h.putShort(pageSize.toShort) // 4096
    h.put(1.toByte); h.put(1.toByte) // write/read format: legacy (no WAL)
    h.put(0.toByte) // reserved space
    h.put(64.toByte); h.put(32.toByte); h.put(32.toByte) // payload fractions
    h.putInt(1) // file change counter
    h.putInt(totalPages)
    h.putInt(0); h.putInt(0) // freelist head, count
    h.putInt(1) // schema cookie
    h.putInt(4) // schema format
    h.putInt(0) // default page cache
    h.putInt(0) // largest root (vacuum)
    h.putInt(1) // text encoding: UTF-8
    h.putInt(0); h.putInt(0) // user version, incremental vacuum
    h.putInt(0) // application id
    h.position(92)
    h.putInt(1) // version-valid-for = change counter
    h.putInt(3045000) // sqlite version number
    putPage(1, masterPage)

    java.nio.file.Files.write(java.nio.file.Paths.get(path), file)
  }
}
