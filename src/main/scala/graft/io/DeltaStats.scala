package graft.io

import java.time.{Instant, LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Cast, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or, StartsWith}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file column statistics for the native Delta tier — the Delta
  * protocol's `add.stats` JSON (PROTOCOL.md "Per-file Statistics"):
  * `{"numRecords":N,"minValues":{..},"maxValues":{..},"nullCount":{..}}`.
  *
  * Write side: [[fromFooter]] derives the JSON from the parquet footer the
  * file already carries (row-group statistics merged per column) — no
  * second pass over the data. Read side: [[skipper]] evaluates pushed data
  * filters against the stats CONSERVATIVELY — a file is dropped only when
  * the stats PROVE no row can match; unknown predicates, absent stats,
  * unparseable values and type mismatches all keep the file. This is the
  * mechanism that turns a point lookup on a clustered column from
  * "open every file" into "open the few whose [min,max] straddle the key"
  * — at 100 TB, the difference between a full scan and an index probe.
  *
  * Stats are emitted for top-level string / integral / floating / boolean /
  * date / timestamp columns. Skipped by design: nested fields, decimals
  * (scale lives in the logical type, not the footer value), binary, and
  * strings longer than 64 bytes (protocol truncation rules need
  * upper-bound padding; omitting is always safe).
  */
object DeltaStats {

  private val mapper = new ObjectMapper()
  private val maxStatsStringLen = 64

  // ------------------------------------------------------------- write side

  /** Raw merged footer statistics for one top-level primitive column:
    * min/max as the parquet-physical Java values (Integer/Long/Float/
    * Double/Boolean/Binary), nullCount when every chunk had it set.
    */
  final case class ColStats(min: Any, max: Any, nullCount: Option[Long])

  /** (numRecords, per-column stats) merged across row groups. Nested
    * columns are ignored. Throws on unreadable footers — callers decide
    * whether stats are optional.
    */
  def footerStats(conf: Configuration, file: Path): (Long, Map[String, ColStats]) = {
    val fr = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = fr.getFooter.getBlocks
      var numRecords = 0L
      blocks.forEach(b => numRecords += b.getRowCount)
      // merge row-group chunk statistics per top-level primitive column
      val merged = scala.collection.mutable.LinkedHashMap
        .empty[String, org.apache.parquet.column.statistics.Statistics[_]]
      val nulls = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      val nullsInvalid = scala.collection.mutable.Set.empty[String]
      blocks.forEach { b =>
        b.getColumns.forEach { c =>
          if (c.getPath.size == 1) {
            val name = c.getPath.iterator.next()
            val st = c.getStatistics
            if (st != null) {
              if (st.isNumNullsSet)
                nulls(name) = nulls.getOrElse(name, 0L) + st.getNumNulls
              else nullsInvalid += name
              if (st.hasNonNullValue)
                merged.get(name) match {
                  case Some(acc) =>
                    // parquet's Statistics[T] is invariant; merging two
                    // chunks of the SAME column is type-safe by construction
                    acc.asInstanceOf[org.apache.parquet.column.statistics.Statistics[Nothing]]
                      .mergeStatistics(st.asInstanceOf[org.apache.parquet.column.statistics.Statistics[Nothing]])
                  case None => merged(name) = st.copy()
                }
            } else nullsInvalid += name
          }
        }
      }
      val byCol = merged.keysIterator.++(nulls.keysIterator).toSeq.distinct.map { n =>
        n -> ColStats(
          merged.get(n).map(_.genericGetMin).orNull,
          merged.get(n).map(_.genericGetMax).orNull,
          nulls.get(n).filterNot(_ => nullsInvalid(n)))
      }.toMap
      (numRecords, byCol)
    } finally fr.close()
  }

  /** Delta stats JSON for one data file, from its parquet footer. None if
    * the footer yields nothing usable (still a valid add action).
    */
  def fromFooter(conf: Configuration, file: Path, schema: StructType): Option[String] =
    try {
      val (numRecords, byCol) = footerStats(conf, file)
      val root = mapper.createObjectNode()
      root.put("numRecords", numRecords)
      val minN = root.putObject("minValues")
      val maxN = root.putObject("maxValues")
      val nullN = root.putObject("nullCount")
      schema.fields.foreach { f =>
        byCol.get(f.name).foreach { cs =>
          cs.nullCount.foreach(nullN.put(f.name, _))
          for (mi <- render(cs.min, f.dataType);
               ma <- render(cs.max, f.dataType)) {
            minN.set[JsonNode](f.name, mi)
            maxN.set[JsonNode](f.name, ma)
          }
        }
      }
      Some(mapper.writeValueAsString(root))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Footer statistics value -> Delta stats JSON node, per the SPARK field
    * type (which disambiguates int32-as-date, int64-as-timestamp, …).
    */
  private def render(v: Any, dt: DataType): Option[JsonNode] = (v, dt) match {
    case (b: java.lang.Boolean, BooleanType) =>
      Some(mapper.getNodeFactory.booleanNode(b))
    case (i: java.lang.Integer, ByteType | ShortType | IntegerType) =>
      Some(mapper.getNodeFactory.numberNode(i.intValue))
    case (i: java.lang.Integer, DateType) =>
      Some(mapper.getNodeFactory.textNode(LocalDate.ofEpochDay(i.longValue).toString))
    case (l: java.lang.Long, LongType) =>
      Some(mapper.getNodeFactory.numberNode(l.longValue))
    case (l: java.lang.Long, TimestampType | TimestampNTZType) =>
      val inst = Instant.ofEpochSecond(Math.floorDiv(l, 1000000L),
        Math.floorMod(l, 1000000L) * 1000L)
      Some(mapper.getNodeFactory.textNode(
        DateTimeFormatter.ISO_INSTANT.format(inst)))
    case (f: java.lang.Float, FloatType) if !f.isNaN && !f.isInfinite =>
      Some(mapper.getNodeFactory.numberNode(f.floatValue))
    case (d: java.lang.Double, DoubleType) if !d.isNaN && !d.isInfinite =>
      Some(mapper.getNodeFactory.numberNode(d.doubleValue))
    case (b: org.apache.parquet.io.api.Binary, StringType) =>
      val bytes = b.getBytes
      if (bytes.length > maxStatsStringLen) None
      else Some(mapper.getNodeFactory.textNode(new String(bytes, "UTF-8")))
    case _ => None
  }

  // -------------------------------------------------------------- read side

  private final case class Parsed(numRecords: Option[Long],
      min: Map[String, String], max: Map[String, String],
      nullCount: Map[String, Long])

  private def parse(json: String): Option[Parsed] =
    try {
      val n = mapper.readTree(json)
      def strMap(field: String): Map[String, String] =
        Option(n.get(field)).map { o =>
          val b = Map.newBuilder[String, String]
          val it = o.fields()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue.isValueNode && !e.getValue.isNull)
              b += e.getKey -> e.getValue.asText
          }
          b.result()
        }.getOrElse(Map.empty)
      val nc = Option(n.get("nullCount")).map { o =>
        val b = Map.newBuilder[String, Long]
        val it = o.fields()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.isNumber) b += e.getKey -> e.getValue.asLong
        }
        b.result()
      }.getOrElse(Map.empty[String, Long])
      Some(Parsed(Option(n.get("numRecords")).filter(_.isNumber).map(_.asLong),
        strMap("minValues"), strMap("maxValues"), nc))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** A keep-predicate over AddFiles: false only when the file's stats prove
    * no row can satisfy ALL pushed data filters.
    */
  def skipper(dataSchema: StructType, dataFilters: Seq[Expression],
      zone: Option[String]): DeltaNative.AddFile => Boolean = {
    if (dataFilters.isEmpty) return _ => true
    val resolver: (String, String) => Boolean =
      (a, b) => a.equalsIgnoreCase(b)

    def field(name: String): Option[StructField] =
      dataSchema.fields.find(f => resolver(f.name, name))

    // stats text -> internal Catalyst value of the column type
    def statValue(s: String, dt: DataType): Option[Any] =
      Option(Cast(Literal(UTF8String.fromString(s), StringType), dt, zone)
        .eval(null))

    (af: DeltaNative.AddFile) => {
      af.stats.flatMap(parse) match {
        case None => true
        case Some(st) =>
          def ordering(dt: DataType) =
            TypeUtils.getInterpretedOrdering(dt).asInstanceOf[Ordering[Any]]

          def allNull(name: String): Option[Boolean] =
            for (nr <- st.numRecords; nc <- st.nullCount.get(name))
              yield nc >= nr

          // may a non-null value of `name` satisfy cmp against bound lit?
          def cmp(name: String, lit: Any, dt: DataType,
              test: (Int, Int) => Boolean): Boolean = {
            if (lit == null) return false // null-rejecting comparison
            if (allNull(name).contains(true)) return false
            (for (f <- field(name) if f.dataType == dt;
                  mnS <- st.min.get(f.name); mxS <- st.max.get(f.name);
                  mn <- statValue(mnS, dt); mx <- statValue(mxS, dt)) yield {
              val ord = ordering(dt)
              test(ord.compare(mn, lit), ord.compare(mx, lit))
            }).getOrElse(true)
          }

          def mayMatch(e: Expression): Boolean = e match {
            case And(l, r) => mayMatch(l) && mayMatch(r)
            case Or(l, r) => mayMatch(l) || mayMatch(r)
            case EqualTo(a: AttributeReference, Literal(v, dt)) =>
              cmp(a.name, v, dt, (mn, mx) => mn <= 0 && mx >= 0)
            case EqualTo(Literal(v, dt), a: AttributeReference) =>
              cmp(a.name, v, dt, (mn, mx) => mn <= 0 && mx >= 0)
            case EqualNullSafe(a: AttributeReference, Literal(v, dt)) =>
              if (v == null) st.nullCount.get(a.name).forall(_ > 0)
              else cmp(a.name, v, dt, (mn, mx) => mn <= 0 && mx >= 0)
            case LessThan(a: AttributeReference, Literal(v, dt)) =>
              cmp(a.name, v, dt, (mn, _) => mn < 0)
            case LessThan(Literal(v, dt), a: AttributeReference) =>
              cmp(a.name, v, dt, (_, mx) => mx > 0)
            case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
              cmp(a.name, v, dt, (mn, _) => mn <= 0)
            case LessThanOrEqual(Literal(v, dt), a: AttributeReference) =>
              cmp(a.name, v, dt, (_, mx) => mx >= 0)
            case GreaterThan(a: AttributeReference, Literal(v, dt)) =>
              cmp(a.name, v, dt, (_, mx) => mx > 0)
            case GreaterThan(Literal(v, dt), a: AttributeReference) =>
              cmp(a.name, v, dt, (mn, _) => mn < 0)
            case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
              cmp(a.name, v, dt, (_, mx) => mx >= 0)
            case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) =>
              cmp(a.name, v, dt, (mn, _) => mn <= 0)
            case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
              vs.exists { case Literal(v, dt) =>
                cmp(a.name, v, dt, (mn, mx) => mn <= 0 && mx >= 0) }
            case InSet(a: AttributeReference, hset) =>
              hset.exists(v =>
                cmp(a.name, v, a.dataType, (mn, mx) => mn <= 0 && mx >= 0))
            case IsNull(a: AttributeReference) =>
              st.nullCount.get(a.name).forall(_ > 0)
            case IsNotNull(a: AttributeReference) =>
              !allNull(a.name).contains(true)
            case StartsWith(a: AttributeReference, Literal(p: UTF8String, StringType)) =>
              // x startsWith p  =>  x >= p, so may-match iff max >= p;
              // and x < successor(p) when one exists
              cmp(a.name, p, StringType, (_, mx) => mx >= 0) &&
                successor(p).forall(up =>
                  cmp(a.name, up, StringType, (mn, _) => mn < 0))
            case Not(IsNull(a: AttributeReference)) =>
              !allNull(a.name).contains(true)
            case _ => true
          }

          dataFilters.forall(mayMatch)
      }
    }
  }

  /** Smallest string greater than every string with prefix `p`: bump the
    * last byte. None when not representable (0xFF tail) — caller keeps.
    */
  private def successor(p: UTF8String): Option[UTF8String] = {
    val bytes = p.getBytes.clone()
    var i = bytes.length - 1
    while (i >= 0 && bytes(i) == -1) i -= 1
    if (i < 0) None
    else {
      bytes(i) = (bytes(i) + 1).toByte
      Some(UTF8String.fromBytes(java.util.Arrays.copyOf(bytes, i + 1)))
    }
  }
}
