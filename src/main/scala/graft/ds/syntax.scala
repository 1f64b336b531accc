package graft.ds

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Column accessor namespaces — the reference's `.str` / `.dt` / `.arr`
  * accessor surface (reference: datastore/column_expr.py accessor blocks,
  * pandas `.str`/`.dt`; SURVEY §7.3 "accessor namespaces str/dt/arr/json/
  * url/ip"). Import `graft.ds.syntax._` and write
  * `col("name").str.upper`, `col("ts").dt.year`, `col("xs").arr.sum`.
  * Everything expands to codegen'd built-ins — no UDFs.
  */
object syntax {

  implicit final class RichGraftColumn(private val c: Column) extends AnyVal {
    def str: StrOps = new StrOps(c)
    def dt: DtOps = new DtOps(c)
    def arr: ArrOps = new ArrOps(c)
    def json: JsonOps = new JsonOps(c)
    def url: UrlOps = new UrlOps(c)

    /** pandas `Series.between(left, right, inclusive)` (reference
      * column_expr.py:3081) — all four inclusive modes.
      */
    def between(lo: Any, hi: Any, inclusive: String = "both"): Column =
      inclusive match {
        case "both" => c >= lit(lo) && c <= lit(hi)
        case "neither" => c > lit(lo) && c < lit(hi)
        case "left" => c >= lit(lo) && c < lit(hi)
        case "right" => c > lit(lo) && c <= lit(hi)
        case other => throw new IllegalArgumentException(
          s"between: inclusive must be both/neither/left/right (got '$other')")
      }

    /** pandas `Series.clip(lower, upper)` (reference lazy_result.py:811,
      * pandas_compat.py:863) — either bound optional. NULLs pass through
      * explicitly: Spark's greatest/least SKIP nulls (a NULL value would
      * silently become the bound), so the null case is guarded.
      */
    def clip(lower: Option[Any] = None, upper: Option[Any] = None): Column = {
      val lo = lower.map(v => greatest(c, lit(v))).getOrElse(c)
      val bounded = upper.map(v => least(lo, lit(v))).getOrElse(lo)
      when(c.isNull, c).otherwise(bounded)
    }
  }

  final class StrOps(private val c: Column) extends AnyVal {
    def len: Column = length(c)
    def upper: Column = org.apache.spark.sql.functions.upper(c)
    def lower: Column = org.apache.spark.sql.functions.lower(c)
    def strip: Column = trim(c)
    def lstrip: Column = ltrim(c)
    def rstrip: Column = rtrim(c)
    def slice(start: Int, n: Int): Column = substring(c, start, n)
    def contains(s: String): Column = c.contains(s)
    def startswith(s: String): Column = c.startsWith(s)
    def endswith(s: String): Column = c.endsWith(s)
    def replace(from: String, to: String): Column =
      call_function("replace", c, lit(from), lit(to))
    def extract(re: String, group: Int = 1): Column = regexp_extract(c, re, group)
    def matches(re: String): Column = c.rlike(re)
    def split(sep: String): Column = org.apache.spark.sql.functions.split(c, sep)
    def pad(width: Int, fill: String = " "): Column = lpad(c, width, fill)
    def zfill(width: Int): Column = lpad(c, width, "0")
    def tokens: Column = GraftFunctions.tokenize(c)
  }

  final class DtOps(private val c: Column) extends AnyVal {
    def year: Column = org.apache.spark.sql.functions.year(c)
    def quarter: Column = org.apache.spark.sql.functions.quarter(c)
    def month: Column = org.apache.spark.sql.functions.month(c)
    def day: Column = dayofmonth(c)
    def hour: Column = org.apache.spark.sql.functions.hour(c)
    def minute: Column = org.apache.spark.sql.functions.minute(c)
    def second: Column = org.apache.spark.sql.functions.second(c)
    def dayofweek: Column = call_function("weekday", c) + lit(1) // ISO Mon=1
    def dayofyear: Column = org.apache.spark.sql.functions.dayofyear(c)
    def week: Column = weekofyear(c)
    def date: Column = c.cast("date")
    def dayName: Column = date_format(c, "EEEE")
    def monthName: Column = date_format(c, "MMMM")
    def floor(unit: String): Column = date_trunc(unit, c)
    def epochSeconds: Column = unix_timestamp(c)
    def isMonthStart: Column = dayofmonth(c) === 1
    def isMonthEnd: Column = c.cast("date") === last_day(c)
  }

  final class ArrOps(private val c: Column) extends AnyVal {
    def len: Column = size(c)
    def sum: Column = aggregate(c, lit(0.0), (a, x) => a + x.cast("double"))
    def avg: Column = sum / greatest(size(c), lit(1))
    def min: Column = array_min(c)
    def max: Column = array_max(c)
    def distinct: Column = array_distinct(c)
    def sorted: Column = array_sort(c)
    def reversed: Column = reverse(c)
    def contains(v: Any): Column = array_contains(c, v)
    def join(sep: String): Column = array_join(c, sep)
    def get(i: Int): Column = element_at(c, i)
    def map(f: Column => Column): Column = transform(c, f)
    def filterBy(f: Column => Column): Column =
      org.apache.spark.sql.functions.filter(c, f)
  }

  final class JsonOps(private val c: Column) extends AnyVal {
    def get(path: String): Column = get_json_object(c, s"$$.$path")
    def getInt(path: String): Column = get(path).cast("bigint")
    def getDouble(path: String): Column = get(path).cast("double")
    def has(path: String): Column = get(path).isNotNull
  }

  final class UrlOps(private val c: Column) extends AnyVal {
    def host: Column = parse_url(c, lit("HOST"))
    def path: Column = parse_url(c, lit("PATH"))
    def protocol: Column = parse_url(c, lit("PROTOCOL"))
    def queryString: Column = parse_url(c, lit("QUERY"))
    def param(key: String): Column = parse_url(c, lit("QUERY"), lit(key))
  }
}
