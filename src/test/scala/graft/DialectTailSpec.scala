package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavior checks for the round-7 registry tail (DialectAliases /
  * MiscExpressions / MiscAgg): every family gets at least one known-value
  * assertion so the aliases are verified semantics, not resolve-only names.
  */
class DialectTailSpec extends SparkTestBase {

  private def one(q: String): org.apache.spark.sql.Row = sql(s"SELECT $q").head()
  private def d(q: String): Double = one(q).getDouble(0)
  private def l(q: String): Long = one(q).getLong(0)
  private def s(q: String): String = one(q).getString(0)

  test("rsplit preserves left-to-right element order (r7 advisor fix)") {
    val arr = one("rsplit('a,b,c', ',')").getSeq[String](0)
    assert(arr == Seq("a", "b", "c"))
  }

  // ---- pandas string accessors ----
  test("pandas string accessors behave") {
    assert(s("strip('  ab  ')") == "ab")
    assert(s("lstrip('xxab', 'x')") == "ab")
    assert(s("rstrip('abxx', 'x')") == "ab")
    assert(s("capitalize('hello WORLD')") == "Hello world")
    assert(s("swapcase('aBc')") == "AbC")
    assert(s("zfill('7', 3)") == "007")
    assert(s("center('ab', 6, '*')") == "**ab**")
    assert(s("ljust('ab', 4, '.')") == "ab..")
    assert(s("rjust('ab', 4, '.')") == "..ab")
    assert(one("find('hello', 'll')").getInt(0) == 2)
    assert(one("find('hello', 'zz')").getInt(0) == -1)
    assert(one("rfind('abcabc', 'bc')").getInt(0) == 4)
    assert(one("rfind('abcabc', 'zz')").getInt(0) == -1)
    assert(s("removeprefix('www.x.com', 'www.')") == "x.com")
    assert(s("removeprefix('x.com', 'www.')") == "x.com")
    assert(s("removesuffix('a.txt', '.txt')") == "a")
    assert(one("fullmatch('abc', 'a.c')").getBoolean(0))
    assert(!one("fullmatch('abcd', 'a.c')").getBoolean(0))
    assert(one("isalpha('abc')").getBoolean(0) && !one("isalpha('ab1')").getBoolean(0))
    assert(one("isdigit('123')").getBoolean(0) && !one("isdigit('12a')").getBoolean(0))
    assert(one("islower('abc')").getBoolean(0) && !one("islower('Abc')").getBoolean(0))
    assert(one("istitle('Hello World')").getBoolean(0))
    assert(s("slice_replace('abcdef', 1, 3, 'XY')") == "aXYdef")
    assert(s("format('{} + {} = {0}', 'a', 'b')") == "a + b = a")
    assert(s("wrap('aa bb cc', 5)") == "aa bb\ncc")
    assert(s("extract_func('key=42', 'key=(\\\\d+)')") == "42")
    assert(s("regex_extract('key=42', '\\\\d+')") == "42")
  }

  test("string similarity is real") {
    assert(d("jaroSimilarity('abc', 'abc')") == 1.0)
    assert(math.abs(d("jaroSimilarity('martha', 'marhta')") - 0.9444444) < 1e-6)
    assert(math.abs(d("jaroWinklerSimilarity('martha', 'marhta')") - 0.9611111) < 1e-6)
    assert(one("damerauLevenshteinDistance('ca', 'abc')").getInt(0) == 3)
    assert(one("damerau_levenshtein_distance('ab', 'ba')").getInt(0) == 1)
    assert(one("levenshteinDistance('kitten', 'sitting')").getInt(0) == 3)
  }

  test("hashes: crc64/javaHash real, others mapped") {
    assert(one("javaHash('abc')").getInt(0) == "abc".hashCode)
    assert(l("CRC64('')") == 0L)
    assert(l("CRC64('abc')") != 0L && l("crc64('abc')") == l("CRC64('abc')"))
    assert(l("wyHash64('x')") == l("xxhash64('x')")) // documented mapping
  }

  // ---- math ----
  test("math special functions") {
    assert(math.abs(d("erf(1.0)") - 0.8427007929) < 1e-9)
    assert(math.abs(d("erfc(1.0)") - 0.1572992070) < 1e-9)
    assert(math.abs(d("gamma(5.0)") - 24.0) < 1e-9)
    assert(math.abs(d("lgamma(5.0)") - math.log(24.0)) < 1e-9)
    assert(l("gcd(12, 18)") == 6L && l("lcm(4, 6)") == 12L)
    assert(one("clip(15, 0, 10)").getInt(0) == 10 && one("clip(-5, 0, 10)").getInt(0) == 0)
    assert(d("truncate(cast(-1.7 as double))") == -1.0 && d("truncate(cast(1.7 as double))") == 1.0)
    assert(l("roundToExp2(100)") == 64L && l("round_to_exp2(0)") == 0L)
    assert(one("roundAge(33)").getInt(0) == 25)
    assert(one("roundDuration(95)").getInt(0) == 60)
    assert(d("cast(roundDown(7.5, array(1.0, 5.0, 10.0)) as double)") == 5.0)
    assert(d("cast(roundDown(0.5, array(1.0, 5.0)) as double)") == 1.0)
    assert(one("popcount(7)").getInt(0) == 3)
    assert(d("cast(round_bankers(2.5, 0) as double)") == 2.0)
  }

  test("minSampleSize formulas") {
    val r = one("minSampleSizeConversion(0.25, 0.03, 0.80, 0.05)").getStruct(0)
    // unpooled two-proportion formula: (z_{1-a/2}+z_pow)^2 (p1q1+p2q2)/mde^2
    assert(math.abs(r.getDouble(0) - 3393.6) < 1.0)
    assert(math.abs(r.getDouble(1) - 0.22) < 1e-9 && math.abs(r.getDouble(2) - 0.28) < 1e-9)
  }

  // ---- datetime ----
  test("datetime tail functions") {
    assert(one("is_leap_year(date'2024-03-01')").getBoolean(0))
    assert(!one("is_leap_year(date'2023-03-01')").getBoolean(0))
    assert(one("days_in_month(date'2024-02-10')").getInt(0) == 29)
    assert(one("is_month_end(date'2024-02-29')").getBoolean(0))
    assert(one("is_quarter_start(date'2024-04-01')").getBoolean(0))
    assert(one("toISOYear(date'2021-01-01')").getInt(0) == 2020) // ISO week 53 of 2020
    assert(one("toYearWeek(date'2024-06-15')").getInt(0) == 202424)
    assert(l("toYYYYMMDDhhmmss(timestamp'2024-06-15 10:20:30')") == 20240615102030L)
    assert(one("microsecond(timestamp'2024-01-01 00:00:00.123456')").getInt(0) == 123456)
    assert(one("millisecond(timestamp'2024-01-01 00:00:00.123456')").getInt(0) == 123)
    assert(one("toDaysSinceYearZero(date'1970-01-01')").getInt(0) == 719528)
    assert(s("cast(fromDaysSinceYearZero(719528) as string)") == "1970-01-01")
    // snowflake round-trip (twitter epoch)
    assert(s("cast(snowflakeToDateTime(dateTimeToSnowflake(timestamp'2021-08-15 18:57:56')) as string)")
      == "2021-08-15 18:57:56")
    assert(s("cast(floor_dt(timestamp'2024-06-15 10:20:30', 'H') as string)") == "2024-06-15 10:00:00")
    assert(s("cast(ceil_dt(timestamp'2024-06-15 10:20:30', 'H') as string)") == "2024-06-15 11:00:00")
    assert(s("cast(ceil_dt(timestamp'2024-06-15 10:00:00', 'H') as string)") == "2024-06-15 10:00:00")
    assert(s("cast(round_datetime(timestamp'2024-06-15 10:40:00', 'H') as string)") == "2024-06-15 11:00:00")
    assert(s("cast(timestamp'2024-01-01 00:00:00' + toIntervalDay(2) as string)") == "2024-01-03 00:00:00")
    assert(s("cast(timestamp'2024-01-01 00:00:00' + toIntervalMonth(2) as string)") == "2024-03-01 00:00:00")
    assert(l("toUnixTimestamp64Nano(timestamp'1970-01-01 00:00:01')") == 1000000000L)
    assert(s("cast(fromUnixTimestamp64Milli(1000) as string)") == "1970-01-01 00:00:01")
    assert(s("toTime64(timestamp'2024-06-15 10:20:30.5')") == "10:20:30.500000")
  }

  // ---- JSON ----
  test("simpleJSON / case-insensitive / structural JSON") {
    val doc = """{"a": {"b": 7, "S": "x"}, "arr": [1, 2, 3]}"""
    assert(l(s"simpleJSONExtractInt('$doc', 'b')") == 7L) // any-depth scan
    assert(s(s"simpleJSONExtractString('$doc', 'S')") == "x")
    assert(one(s"simple_json_has('$doc', 'b')").getBoolean(0))
    assert(l(s"JSONExtractIntCaseInsensitive('$doc', 'A', 'B')") == 7L)
    assert(s(s"JSONExtractStringCaseInsensitive('$doc', 'a', 's')") == "x")
    assert(s(s"JSONType('$doc', 'arr')") == "Array")
    assert(s(s"JSONType('$doc')") == "Object")
    assert(l(s"JSONExtract('$doc', 'a', 'b', 'Int64')") == 7L)
    assert(one(s"JSONAllPaths('$doc')").getSeq[String](0).toSet == Set("a.b", "a.S", "arr"))
    assert(s("""JSONMergePatch('{"a":1,"b":2}', '{"b":null,"c":3}')""") == """{"a":1,"c":3}""")
    assert(one(s"JSON_EXISTS('$doc', '$$.a.b')").getBoolean(0))
    assert(one("""JSONExtractKeysAndValues('{"x": 1, "y": 2}', 'String')""")
      .getAs[Map[String, String]](0) == Map("x" -> "1", "y" -> "2"))
    assert(one("""values('{"x": 1}')""").getSeq[String](0) == Seq("1"))
  }

  // ---- aggregates ----
  test("entropy / product / rankCorr / cramersV aggregates") {
    assert(math.abs(d("entropy(x) FROM (SELECT explode(array(1,1,2,2)) AS x)") - 1.0) < 1e-9)
    assert(d("product(x) FROM (SELECT explode(array(2.0, 3.0, 4.0)) AS x)") == 24.0)
    assert(math.abs(d("rankCorr(x, x * 2 + 1) FROM (SELECT explode(array(1,5,2,8,3)) AS x)") - 1.0) < 1e-9)
    assert(math.abs(d("rankCorr(x, -x) FROM (SELECT explode(array(1,5,2,8,3)) AS x)") + 1.0) < 1e-9)
    // perfectly dependent categoricals → V = 1; independent → V = 0
    assert(math.abs(d("cramersV(x, x) FROM (SELECT explode(array(1,2,3,1,2,3)) AS x)") - 1.0) < 1e-9)
    assert(math.abs(d("cramersV(x, 1) FROM (SELECT explode(array(1,2,3)) AS x)")) < 1e-9)
    assert(math.abs(d("theilsU(x, x) FROM (SELECT explode(array(1,2,3,1,2,3)) AS x)") - 1.0) < 1e-9)
    assert(d("deltaSum(x) FROM (SELECT explode(array(1, 2, 5, 3, 9)) AS x)") == 10.0)
    assert(l("count_distinct(x) FROM (SELECT explode(array(1,1,2)) AS x)") == 2L)
    // CH moment aggregates, exact: [1,2,3,4,10] → m2=10, m3=36, m4=278.8,
    // varSamp=12.5 (CH kurt* does NOT subtract 3, unlike Spark's excess form)
    val sample = "FROM (SELECT explode(array(1.0, 2.0, 3.0, 4.0, 10.0)) AS x)"
    assert(math.abs(d(s"skewPop(x) $sample") - 36.0 / math.pow(10.0, 1.5)) < 1e-9)
    assert(math.abs(d(s"skewSamp(x) $sample") - 36.0 / math.pow(12.5, 1.5)) < 1e-9)
    assert(math.abs(d(s"kurtPop(x) $sample") - 2.788) < 1e-9)
    assert(math.abs(d(s"kurtSamp(x) $sample") - 278.8 / 156.25) < 1e-9)
    assert(d("cast(average(x) as double) FROM (SELECT explode(array(2.0, 4.0)) AS x)") == 3.0)
  }

  // ---- arrays / maps ----
  test("array fill/split and map lambdas") {
    assert(one("arrayFill(x -> x > 0, array(1, 0, 2, 0, 0, 3))").getSeq[Int](0)
      == Seq(1, 1, 2, 2, 2, 3))
    assert(one("arrayReverseFill(x -> x > 0, array(0, 1, 0, 2))").getSeq[Int](0)
      == Seq(1, 1, 2, 2))
    assert(one("arraySplit(x -> x = 0, array(1, 2, 0, 3, 0, 4))").getSeq[Seq[Int]](0)
      == Seq(Seq(1, 2), Seq(0, 3), Seq(0, 4)))
    assert(one("arrayReverseSplit(x -> x = 0, array(1, 2, 0, 3))").getSeq[Seq[Int]](0)
      == Seq(Seq(1, 2, 0), Seq(3)))
    assert(one("mapExists((k, v) -> v > 1, map('a', 1, 'b', 2))").getBoolean(0))
    assert(!one("mapExists((k, v) -> v > 5, map('a', 1, 'b', 2))").getBoolean(0))
    assert(one("mapAll((k, v) -> v > 0, map('a', 1, 'b', 2))").getBoolean(0))
    assert(one("map_values(mapApply((k, v) -> v * 10, map('a', 1)))").getSeq[Int](0) == Seq(10))
    assert(one("tuplePlus(array(1, 2), array(10, 20))").getSeq[Int](0) == Seq(11, 22))
    assert(one("bitmaskToArray(50)").getSeq[Long](0) == Seq(2L, 16L, 32L))
    assert(s("bitmaskToList(50)") == "2,16,32")
    assert(one("first_element(array(7, 8))").getInt(0) == 7)
    assert(one("last_element(array(7, 8))").getInt(0) == 8)
    assert(math.abs(d("LpDistance(array(1.0, 2.0), array(4.0, 6.0), 2.0)") - 5.0) < 1e-9)
    assert(one("L1Normalize(array(1.0, 3.0))").getSeq[Double](0) == Seq(0.25, 0.75))
  }

  // ---- type conversion / reinterpret ----
  test("reinterpret and conversions") {
    assert(l("reinterpretAsUInt32('abcd')") == // little-endian 'a'+256*'b'+...
      ('a'.toLong) + ('b'.toLong << 8) + ('c'.toLong << 16) + ('d'.toLong << 24))
    assert(l("reinterpretAsUInt8('a')") == 97L)
    assert(s("reinterpretAsString(97)") == "a") // LE bytes, NULs trimmed
    assert(d("reinterpretAsFloat64(reinterpretAsUInt64(cast(1.5 as double)))") == 1.5)
    assert(s("toDecimalString(3.14159, 2)") == "3.14")
    assert(one("accurateCastOrNull('x', 'Int64')").isNullAt(0))
    assert(l("accurateCastOrDefault('x', 'Int64', 42)") == 42L)
    assert(l("accurateCast('7', 'Int64')") == 7L)
    assert(s("toUUIDOrZero('bad')") == "00000000-0000-0000-0000-000000000000")
    assert(one("UUIDToNum('00112233-4455-6677-8899-aabbccddeeff')").getAs[Array[Byte]](0).length == 16)
    assert(s("generateUUIDv7()").matches("[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
  }

  // ---- URL / IP ----
  test("url and ip tail") {
    val u = "'https://www.example.com:8080/a/b?x=1&y=2#f'"
    assert(s(s"scheme($u)") == "https")
    assert(s(s"domainWithoutWWW($u)") == "example.com")
    assert(one(s"port($u)").getInt(0) == 8080)
    assert(one("port('https://example.com/a')").getInt(0) == 0)
    assert(s(s"tld($u)") == "com")
    val params = one(s"extractURLParameters($u)").getSeq[String](0)
    assert(params.size == 2 && params.head == "x=1")
    assert(one(s"extractURLParameterNames($u)").getSeq[String](0) == Seq("x", "y"))
    assert(s(s"cutURLParameter($u, 'x')") == "https://www.example.com:8080/a/b?y=2#f")
    assert(s("IPv6NumToString(toIPv6('2001:db8::1'))") == "2001:db8:0:0:0:0:0:1")
    assert(one("isIPv6String('::1')").getBoolean(0))
    assert(!one("isIPv6String('example.com')").getBoolean(0))
    val r = one("IPv4CIDRToRange(IPv4StringToNum('192.168.5.2'), 16)").getStruct(0)
    assert(r.getLong(0) == 0xC0A80000L && r.getLong(1) == 0xC0A8FFFFL)
  }

  // ---- misc ----
  test("misc tail functions") {
    assert(s("formatReadableTimeDelta(93784)") == "1 day, 2 hours, 3 minutes, 4 seconds")
    assert(one("extractAllGroups('a=1, b=2', '(\\\\w)=(\\\\d)')").getSeq[Seq[String]](0)
      == Seq(Seq("a", "1"), Seq("b", "2")))
    assert(one("multiMatchAny('hello', array('^x', 'l+o$'))").getInt(0) == 1)
    assert(l("multiSearchFirstIndex('hello world', array('zz', 'world'))") == 2L)
    assert(s("""normalizeQuery("SELECT a FROM t WHERE x = 7 AND s = 'p'")""")
      == "SELECT a FROM t WHERE x = ? AND s = ?")
    assert(one("pointInEllipses(1.0, 0.0, 0.0, 0.0, 2.0, 1.0)").getInt(0) == 1)
    assert(one("pointInEllipses(3.0, 0.0, 0.0, 0.0, 2.0, 1.0)").getInt(0) == 0)
    assert(one("ignore(1, 2, 3)").getInt(0) == 0)
    assert(one("isConstant(1 + 2)").getInt(0) == 1)
    assert(one("throwIf(false, 'nope')").getInt(0) == 0)
    intercept[Exception] { sql("SELECT throwIf(true, 'boom')").collect() }
    assert(s("format_row_no_newline('JSONEachRow', 1, 'a')").startsWith("{"))
    // window-context aliases
    val w = sql("SELECT cumsum(x) OVER (ORDER BY x) AS c FROM (SELECT explode(array(1,2,3)) AS x)")
      .collect().map(_.getLong(0)).toSeq
    assert(w == Seq(1L, 3L, 6L))
    val sh = sql("SELECT shift(x, 1) OVER (ORDER BY x) AS c FROM (SELECT explode(array(1,2,3)) AS x)")
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    assert(sh == Seq(-1, 1, 2))
    // random samplers: just shape/range checks (nondeterministic)
    val pois = sql("SELECT randPoisson(4.0) AS p FROM range(200)")
      .collect().map(_.getLong(0))
    assert(pois.forall(_ >= 0) && pois.sum > 200) // mean 4 → sum ≈ 800
    val bin = sql("SELECT randBinomial(10, 0.5) AS b FROM range(100)")
      .collect().map(_.getLong(0))
    assert(bin.forall(b => b >= 0 && b <= 10))
  }
}
