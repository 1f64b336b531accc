package graft.functions

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.commons.math3.distribution.PoissonDistribution
import org.apache.commons.math3.random.Well19937c
import org.apache.commons.math3.special.{Erf => M3Erf, Gamma => M3Gamma}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernels for the dialect tail (reference
  * datastore/function_definitions.py MATH / STRING / HASH sections) that have
  * no Spark-native counterpart. Pure static helpers so the expression classes
  * stay thin; all algorithms from public definitions (commons-math3 special
  * functions, the published Jaro/Winkler and Damerau–Levenshtein recurrences,
  * CRC-64/ECMA-182, java.lang.String#hashCode).
  */
object MathKernels {
  def erf(x: Double): Double = M3Erf.erf(x)
  def erfc(x: Double): Double = M3Erf.erfc(x)
  def tgamma(x: Double): Double = M3Gamma.gamma(x)
  def lgamma(x: Double): Double = M3Gamma.logGamma(x)
  /** Inverse standard-normal CDF via erfInv (for minSampleSize*). */
  def probit(p: Double): Double = math.sqrt(2.0) * M3Erf.erfInv(2.0 * p - 1.0)

  @annotation.tailrec
  def gcd(a: Long, b: Long): Long = if (b == 0L) math.abs(a) else gcd(b, a % b)
  def lcm(a: Long, b: Long): Long = if (a == 0L || b == 0L) 0L else math.abs(a / gcd(a, b) * b)

  /** Jaro similarity in [0,1] (public 1989 definition). */
  def jaro(s1: String, s2: String): Double = {
    val (a, b) = if (s1.length <= s2.length) (s1, s2) else (s2, s1)
    if (a.isEmpty) return if (b.isEmpty) 1.0 else 0.0
    val window = math.max(b.length / 2 - 1, 0)
    val aMatch = new Array[Boolean](a.length)
    val bMatch = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, b.length)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - transpositions / 2.0) / m) / 3.0
  }

  /** Jaro–Winkler with the standard 0.1 prefix scale, 4-char prefix cap. */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    var prefix = 0
    val n = math.min(math.min(s1.length, s2.length), 4)
    while (prefix < n && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  /** Damerau–Levenshtein (optimal string alignment variant, the published
    * textbook recurrence with adjacent-transposition case).
    */
  def damerauLevenshtein(s1: String, s2: String): Int = {
    val n = s1.length; val m = s2.length
    if (n == 0) return m
    if (m == 0) return n
    val d = Array.ofDim[Int](n + 1, m + 1)
    var i = 0
    while (i <= n) { d(i)(0) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j) = j; j += 1 }
    i = 1
    while (i <= n) {
      j = 1
      while (j <= m) {
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) 0 else 1
        var v = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), d(i - 1)(j - 1) + cost)
        if (i > 1 && j > 1 && s1.charAt(i - 1) == s2.charAt(j - 2) &&
            s1.charAt(i - 2) == s2.charAt(j - 1)) {
          v = math.min(v, d(i - 2)(j - 2) + cost)
        }
        d(i)(j) = v
        j += 1
      }
      i += 1
    }
    d(n)(m)
  }

  // CRC-64/ECMA-182 (poly 0x42F0E1EBA9EA3693, as published in ECMA-182)
  private val crc64Table: Array[Long] = {
    val poly = 0x42F0E1EBA9EA3693L
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var crc = i.toLong << 56
      var bit = 0
      while (bit < 8) {
        crc = if ((crc & Long.MinValue) != 0) (crc << 1) ^ poly else crc << 1
        bit += 1
      }
      t(i) = crc
      i += 1
    }
    t
  }

  def crc64(bytes: Array[Byte]): Long = {
    var crc = 0L
    var i = 0
    while (i < bytes.length) {
      crc = crc64Table(((crc >>> 56) ^ bytes(i)) .toInt & 0xFF) ^ (crc << 8)
      i += 1
    }
    crc
  }

  /** Seconds → "2 days, 3 hours, 4 minutes, 5 seconds" (CH
    * formatReadableTimeDelta shape; largest-to-smallest non-zero units).
    */
  def readableTimeDelta(secondsIn: Double): String = {
    val neg = secondsIn < 0
    var rem = math.abs(secondsIn)
    val units = Seq(
      ("year", 365.0 * 86400), ("month", 30.0 * 86400), ("day", 86400.0),
      ("hour", 3600.0), ("minute", 60.0))
    val parts = mutable.ArrayBuffer.empty[String]
    for ((name, span) <- units) {
      val n = math.floor(rem / span).toLong
      if (n > 0) { parts += s"$n $name${if (n == 1) "" else "s"}"; rem -= n * span }
    }
    val secs = math.rint(rem * 1e6) / 1e6
    if (secs != 0.0 || parts.isEmpty) {
      val s = if (secs == math.floor(secs)) secs.toLong.toString else secs.toString
      parts += s"$s second${if (s == "1") "" else "s"}"
    }
    (if (neg) "-" else "") + parts.mkString(", ")
  }
}

/** Unary double→double special functions (erf/erfc/tgamma/lgamma). */
case class MathUnary(name: String, child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(x: Any): Any = {
    val v = x.asInstanceOf[Double]
    name match {
      case "erf" => MathKernels.erf(v)
      case "erfc" => MathKernels.erfc(v)
      case "tgamma" => MathKernels.tgamma(v)
      case "lgamma" => MathKernels.lgamma(v)
      case "probit" => MathKernels.probit(v)
    }
  }
  override def prettyName: String = name
  override protected def withNewChildInternal(c: Expression): MathUnary = copy(child = c)
}

/** gcd/lcm over longs (CH gcd/lcm; Spark has no native). */
case class LongBinary(name: String, left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Number].longValue()
    val y = b.asInstanceOf[Number].longValue()
    if (name == "gcd") MathKernels.gcd(x, y) else MathKernels.lcm(x, y)
  }
  override def prettyName: String = name
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongBinary =
    copy(left = l, right = r)
}

/** String-similarity pair functions: jaroSimilarity / jaroWinklerSimilarity /
  * damerauLevenshteinDistance (reference STRING section; real algorithms, not
  * aliases — Spark only ships plain levenshtein).
  */
case class StringSimilarity(name: String, left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType =
    if (name == "damerauLevenshtein") IntegerType else DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val s1 = a.asInstanceOf[UTF8String].toString
    val s2 = b.asInstanceOf[UTF8String].toString
    name match {
      case "jaro" => MathKernels.jaro(s1, s2)
      case "jaroWinkler" => MathKernels.jaroWinkler(s1, s2)
      case "damerauLevenshtein" => MathKernels.damerauLevenshtein(s1, s2)
    }
  }
  override def prettyName: String = name
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StringSimilarity =
    copy(left = l, right = r)
}

/** CRC64 (ECMA-182) — a real CRC, unlike the xxhash64-mapped hash family. */
case class Crc64(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any): Any =
    MathKernels.crc64(x.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildInternal(c: Expression): Crc64 = copy(child = c)
}

/** javaHash — java.lang.String#hashCode, bit-compatible with the JVM (and
  * with ClickHouse's javaHash, which implements the same published formula).
  */
case class JavaHash(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(x: Any): Any = x.asInstanceOf[UTF8String].toString.hashCode
  override protected def withNewChildInternal(c: Expression): JavaHash = copy(child = c)
}

/** unbin('0011…') — bits string → the bytes it encodes, as a string. */
case class Unbin(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(x: Any): Any = {
    val s = x.asInstanceOf[UTF8String].toString
    val padded = if (s.length % 8 == 0) s else ("0" * (8 - s.length % 8)) + s
    val out = new Array[Byte](padded.length / 8)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(padded.substring(i * 8, i * 8 + 8), 2).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
  override protected def withNewChildInternal(c: Expression): Unbin = copy(child = c)
}

/** swapcase (pandas str.swapcase) — full-unicode per-char case flip. */
case class SwapCase(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(x: Any): Any = {
    val s = x.asInstanceOf[UTF8String].toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      sb.append(
        if (Character.isUpperCase(c)) Character.toLowerCase(c)
        else if (Character.isLowerCase(c)) Character.toUpperCase(c)
        else c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression): SwapCase = copy(child = c)
}

/** formatReadableTimeDelta(seconds) — humanized duration string. */
case class ReadableTimeDelta(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = StringType
  override def nullSafeEval(x: Any): Any =
    UTF8String.fromString(MathKernels.readableTimeDelta(x.asInstanceOf[Number].doubleValue()))
  override protected def withNewChildInternal(c: Expression): ReadableTimeDelta = copy(child = c)
}

/** extractAllGroups(s, regexp) — CH shape: one row of
  * array(array(group1...,groupN) per match). Spark's regexp_extract_all only
  * returns a single group, hence the custom expression.
  */
case class ExtractAllGroups(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(ArrayType(StringType))
  @transient private lazy val pattern =
    java.util.regex.Pattern.compile(right.eval().asInstanceOf[UTF8String].toString)
  override def nullSafeEval(s: Any, p: Any): Any = {
    val m = pattern.matcher(s.asInstanceOf[UTF8String].toString)
    val out = mutable.ArrayBuffer.empty[GenericArrayData]
    while (m.find()) {
      val groups = (1 to m.groupCount()).map(g =>
        if (m.group(g) == null) null else UTF8String.fromString(m.group(g)))
      out += new GenericArrayData(groups.toArray[Any])
    }
    new GenericArrayData(out.toArray[Any])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ExtractAllGroups =
    copy(left = l, right = r)
}

/** Jackson-backed JSON helpers shared by the json expressions below. */
object JsonKernel {
  val mapper = new ObjectMapper()
  def parse(s: String): JsonNode =
    try mapper.readTree(s) catch { case _: Exception => null }

  /** Walk `keys` (field names, or 1-based / negative array indices rendered
    * as integer strings) from the root; case-insensitive field match if `ci`.
    */
  def walk(root: JsonNode, keys: Seq[String], ci: Boolean): JsonNode = {
    var node = root
    val it = keys.iterator
    while (node != null && it.hasNext) {
      val k = it.next()
      node =
        if (node.isArray) {
          val n = node.size()
          val idx0 = try k.toInt catch { case _: NumberFormatException => 0 }
          val idx = if (idx0 > 0) idx0 - 1 else n + idx0 // CH 1-based; negative from end
          if (idx >= 0 && idx < n) node.get(idx) else null
        } else if (ci) {
          val fields = node.properties().iterator()
          var found: JsonNode = null
          while (found == null && fields.hasNext) {
            val e = fields.next()
            if (e.getKey.equalsIgnoreCase(k)) found = e.getValue
          }
          found
        } else node.get(k)
    }
    node
  }

  /** First occurrence of `field` at any depth (CH simpleJSON/visitParam
    * family semantics: a raw scan that ignores nesting).
    */
  def findFirst(root: JsonNode, field: String, ci: Boolean): JsonNode = {
    if (root == null) return null
    if (root.isObject) {
      val fields = root.properties().iterator()
      while (fields.hasNext) {
        val e = fields.next()
        if (if (ci) e.getKey.equalsIgnoreCase(field) else e.getKey == field) return e.getValue
      }
      val it2 = root.properties().iterator()
      while (it2.hasNext) {
        val r = findFirst(it2.next().getValue, field, ci)
        if (r != null) return r
      }
      null
    } else if (root.isArray) {
      var i = 0
      while (i < root.size()) {
        val r = findFirst(root.get(i), field, ci)
        if (r != null) return r
        i += 1
      }
      null
    } else null
  }

  def typeName(n: JsonNode): String =
    if (n == null) "Null"
    else if (n.isObject) "Object"
    else if (n.isArray) "Array"
    else if (n.isTextual) "String"
    else if (n.isBoolean) "Bool"
    else if (n.isIntegralNumber) "Int64"
    else if (n.isNumber) "Double"
    else "Null"

  def allPaths(n: JsonNode, prefix: String, out: mutable.ArrayBuffer[(String, String)]): Unit = {
    if (n == null) return
    if (n.isObject) {
      val fields = n.properties().iterator()
      while (fields.hasNext) {
        val e = fields.next()
        val p = if (prefix.isEmpty) e.getKey else prefix + "." + e.getKey
        if (e.getValue.isObject) allPaths(e.getValue, p, out)
        else out += ((p, typeName(e.getValue)))
      }
    }
  }

  /** RFC 7386 JSON merge patch over n documents, left to right. */
  def mergePatch(target: JsonNode, patch: JsonNode): JsonNode = {
    if (patch == null || !patch.isObject) return patch
    val result: ObjectNode =
      if (target != null && target.isObject) target.deepCopy[ObjectNode]()
      else mapper.createObjectNode()
    val fields = patch.properties().iterator()
    while (fields.hasNext) {
      val e = fields.next()
      if (e.getValue.isNull) result.remove(e.getKey)
      else result.set(e.getKey, mergePatch(result.get(e.getKey), e.getValue))
    }
    result
  }
}

/** One expression for the simpleJSON* / visitParam* family and the
  * CaseInsensitive JSONExtract* variants (reference JSON section). `keys`
  * empty → simpleJSON semantics (first occurrence of `field` at any depth);
  * non-empty → path walk. Modes: raw, string, int, float, bool, has, type,
  * arrayRaw, values, keysAndValues.
  */
case class JsonExtractBy(
    json: Expression,
    pathKeys: Seq[Expression],
    mode: String,
    ci: Boolean,
    scanAnyDepth: Boolean)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = json +: pathKeys
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = mode match {
    case "int" => LongType
    case "float" => DoubleType
    case "bool" => BooleanType
    case "has" => BooleanType
    case "arrayRaw" | "values" | "keys" => ArrayType(StringType)
    case "keysAndValues" | "keysAndValuesRaw" => MapType(StringType, StringType)
    case _ => StringType
  }

  private def render(n: JsonNode): String =
    if (n == null) null
    else if (n.isTextual && mode != "raw" && mode != "arrayRaw") n.asText()
    else n.toString

  override def eval(input: InternalRow): Any = {
    val js = json.eval(input)
    if (js == null) return null
    val root = JsonKernel.parse(js.asInstanceOf[UTF8String].toString)
    if (root == null) return if (mode == "has") false else null
    val keys = pathKeys.map { k =>
      val v = k.eval(input)
      if (v == null) return null
      String.valueOf(v match {
        case u: UTF8String => u.toString
        case other => other
      })
    }
    val node =
      if (keys.isEmpty) root
      else if (scanAnyDepth && keys.size == 1) JsonKernel.findFirst(root, keys.head, ci)
      else JsonKernel.walk(root, keys, ci)
    mode match {
      case "has" => node != null
      case "type" => if (node == null) null else UTF8String.fromString(JsonKernel.typeName(node))
      case "int" =>
        if (node == null || !node.isValueNode) null
        else if (node.isNumber) node.asLong()
        else try node.asText().trim.toDouble.toLong catch { case _: Exception => null }
      case "float" =>
        if (node == null || !node.isValueNode) null
        else if (node.isNumber) node.asDouble()
        else try node.asText().trim.toDouble catch { case _: Exception => null }
      case "bool" =>
        if (node == null) null
        else if (node.isBoolean) node.asBoolean()
        else if (node.isNumber) node.asDouble() != 0.0
        else null
      case "arrayRaw" =>
        if (node == null || !node.isArray) null
        else new GenericArrayData(
          (0 until node.size()).map(i => UTF8String.fromString(node.get(i).toString)).toArray[Any])
      case "values" =>
        if (node == null || !node.isObject) null
        else {
          val out = mutable.ArrayBuffer.empty[Any]
          val it = node.properties().iterator()
          while (it.hasNext) out += UTF8String.fromString(render(it.next().getValue))
          new GenericArrayData(out.toArray)
        }
      case "keys" =>
        if (node == null || !node.isObject) null
        else {
          val out = mutable.ArrayBuffer.empty[Any]
          val it = node.properties().iterator()
          while (it.hasNext) out += UTF8String.fromString(it.next().getKey)
          new GenericArrayData(out.toArray)
        }
      case "keysAndValues" | "keysAndValuesRaw" =>
        if (node == null || !node.isObject) null
        else {
          val ks = mutable.ArrayBuffer.empty[Any]
          val vs = mutable.ArrayBuffer.empty[Any]
          val it = node.properties().iterator()
          while (it.hasNext) {
            val e = it.next()
            ks += UTF8String.fromString(e.getKey)
            vs += UTF8String.fromString(
              if (mode == "keysAndValuesRaw") e.getValue.toString else render(e.getValue))
          }
          org.apache.spark.sql.catalyst.util.ArrayBasedMapData(ks.toArray, vs.toArray)
        }
      case _ => // raw / string
        if (node == null) null else UTF8String.fromString(render(node))
    }
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): JsonExtractBy =
    copy(json = cs.head, pathKeys = cs.tail)
}

/** JSONAllPaths[WithTypes] — dotted leaf paths of the document (objects
  * recursed, arrays treated as leaves, matching CH's path notion for the
  * JSON column type as far as it is observable from a text document).
  */
case class JsonAllPaths(child: Expression, withTypes: Boolean)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (withTypes) MapType(StringType, StringType) else ArrayType(StringType)
  override def nullSafeEval(x: Any): Any = {
    val root = JsonKernel.parse(x.asInstanceOf[UTF8String].toString)
    if (root == null) return null
    val out = mutable.ArrayBuffer.empty[(String, String)]
    JsonKernel.allPaths(root, "", out)
    if (withTypes) {
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        out.map(p => UTF8String.fromString(p._1)).toArray[Any],
        out.map(p => UTF8String.fromString(p._2)).toArray[Any])
    } else new GenericArrayData(out.map(p => UTF8String.fromString(p._1)).toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): JsonAllPaths = copy(child = c)
}

/** JSONMergePatch(j1, j2, …) — RFC 7386 merge, left to right. */
case class JsonMergePatch(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def eval(input: InternalRow): Any = {
    var acc: JsonNode = null
    for (c <- children) {
      val v = c.eval(input)
      if (v == null) return null
      val n = JsonKernel.parse(v.asInstanceOf[UTF8String].toString)
      if (n == null) return null
      acc = if (acc == null) n else JsonKernel.mergePatch(acc, n)
    }
    if (acc == null) null else UTF8String.fromString(acc.toString)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): JsonMergePatch =
    copy(children = cs)
}

/** randPoisson(lambda) / randBinomial(n, p) — real samplers (commons-math3),
  * seeded per partition for reproducible-within-a-run, distributed-safe
  * generation (the same contract as Spark's own rand()).
  */
case class RandPoisson(child: Expression, seed: Long)
  extends UnaryExpression with ImplicitCastInputTypes with Nondeterministic with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  @transient private var rng: Well19937c = _
  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new Well19937c(seed + partitionIndex)
  override def dataType: DataType = LongType
  override protected def evalInternal(input: InternalRow): Any = {
    val lam = child.eval(input)
    if (lam == null) null
    else new PoissonDistribution(rng, lam.asInstanceOf[Number].doubleValue(),
      PoissonDistribution.DEFAULT_EPSILON, PoissonDistribution.DEFAULT_MAX_ITERATIONS)
      .sample().toLong
  }
  override protected def withNewChildInternal(c: Expression): RandPoisson = copy(child = c)
}

case class RandBinomial(left: Expression, right: Expression, seed: Long)
  extends BinaryExpression with ImplicitCastInputTypes with Nondeterministic with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(IntegerType, DoubleType)
  @transient private var rng: Well19937c = _
  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new Well19937c(seed + partitionIndex)
  override def dataType: DataType = LongType
  override protected def evalInternal(input: InternalRow): Any = {
    val n = left.eval(input)
    val p = right.eval(input)
    if (n == null || p == null) null
    else {
      val trials = n.asInstanceOf[Number].intValue()
      val prob = p.asInstanceOf[Number].doubleValue()
      var hits = 0L
      var i = 0
      while (i < trials) { if (rng.nextDouble() < prob) hits += 1; i += 1 }
      hits
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RandBinomial =
    copy(left = l, right = r)
}

/** generateUUIDv7() — RFC 9562 v7: 48-bit unix-millis prefix, version and
  * variant bits, random tail. Time-ordered and cluster-safe (no coordination).
  */
case class UuidV7(seed: Long) extends Expression with Nondeterministic with CodegenFallback {
  @transient private var rng: java.util.Random = _
  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.Random(seed + partitionIndex)
  override def children: Seq[Expression] = Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override protected def evalInternal(input: InternalRow): Any = {
    val ms = System.currentTimeMillis()
    val hi = (ms << 16) | 0x7000L | (rng.nextInt(1 << 12) & 0xFFFL)
    val lo = (rng.nextLong() & 0x3FFFFFFFFFFFFFFFL) | Long.MinValue // variant 10
    UTF8String.fromString(new java.util.UUID(hi, lo).toString)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): UuidV7 = this
}

/** reinterpretAs<T>(x) — CH's bit-level reinterpret: the value's bytes
  * (strings as-is; numerics little-endian, CH's layout) re-read as the target.
  * Int128/256 and UInt64+ widths cap at the low 8 bytes / Long semantics
  * (SURVEY §1.3 UInt64→Long mapping) — documented divergence.
  */
case class Reinterpret(child: Expression, target: String)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = target match {
    case "Float32" => FloatType
    case "Float64" => DoubleType
    case "Date" => DateType
    case "DateTime" => TimestampType
    case "String" | "FixedString" | "UUID" => StringType
    case "Int8" => ByteType
    case "Int16" => ShortType
    case "Int32" => IntegerType
    case "UInt8" | "UInt16" | "UInt32" | "Int64" | "UInt64" | "Int128" | "Int256" |
         "UInt128" | "UInt256" => LongType
    case other => throw new IllegalArgumentException(s"reinterpretAs$other unsupported")
  }

  private def toBytes(v: Any): Array[Byte] = v match {
    case u: UTF8String => u.getBytes
    case b: Array[Byte] => b
    case d: java.lang.Double => // bit pattern, not numeric value
      java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putLong(java.lang.Double.doubleToRawLongBits(d)).array()
    case f: java.lang.Float =>
      java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(java.lang.Float.floatToRawIntBits(f)).array()
    case dec: Decimal => // CH DecimalN layout: unscaled integer, LE
      java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putLong(dec.toUnscaledLong).array()
    case n: java.lang.Number =>
      java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putLong(n.longValue()).array()
    case b: java.lang.Boolean => Array[Byte](if (b) 1 else 0)
    case other => other.toString.getBytes("UTF-8")
  }

  private def leLong(bytes: Array[Byte], width: Int): Long = {
    var out = 0L
    var i = math.min(width, bytes.length) - 1
    while (i >= 0) { out = (out << 8) | (bytes(i) & 0xFFL); i -= 1 }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = toBytes(input)
    target match {
      case "Int8" => leLong(bytes, 1).toByte
      case "UInt8" => leLong(bytes, 1) & 0xFFL
      case "Int16" => leLong(bytes, 2).toShort
      case "UInt16" => leLong(bytes, 2) & 0xFFFFL
      case "Int32" => leLong(bytes, 4).toInt
      case "UInt32" => leLong(bytes, 4) & 0xFFFFFFFFL
      case "Int64" | "UInt64" | "Int128" | "Int256" | "UInt128" | "UInt256" => leLong(bytes, 8)
      case "Float32" => java.lang.Float.intBitsToFloat(leLong(bytes, 4).toInt)
      case "Float64" => java.lang.Double.longBitsToDouble(leLong(bytes, 8))
      case "Date" => leLong(bytes, 4).toInt // days since epoch
      case "DateTime" => leLong(bytes, 4) * 1000000L // seconds -> micros
      case "UUID" =>
        val bb = java.nio.ByteBuffer.wrap(java.util.Arrays.copyOf(bytes, 16))
        UTF8String.fromString(new java.util.UUID(bb.getLong, bb.getLong).toString)
      case _ => // String / FixedString: bytes as-is, trailing NULs trimmed
        var end = bytes.length
        while (end > 0 && bytes(end - 1) == 0) end -= 1
        UTF8String.fromBytes(java.util.Arrays.copyOf(bytes, end))
    }
  }
  override def prettyName: String = s"reinterpretAs$target"
  override protected def withNewChildInternal(c: Expression): Reinterpret = copy(child = c)
}

/** IPv6 string → 16-byte binary (toIPv6). A character-class guard rejects
  * hostnames before InetAddress parses, so no resolver is ever consulted.
  */
case class Ipv6StringToNum(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (!s.matches("[0-9A-Fa-f:.]+") || !s.contains(":")) null
    else try {
      java.net.InetAddress.getByName(s) match {
        case v6: java.net.Inet6Address => v6.getAddress
        case v4 => // mapped form ::ffff:a.b.c.d parses as Inet4 — re-map
          val out = new Array[Byte](16)
          out(10) = -1; out(11) = -1
          System.arraycopy(v4.getAddress, 0, out, 12, 4)
          out
      }
    } catch { case _: Exception => null }
  }
  override protected def withNewChildInternal(c: Expression): Ipv6StringToNum = copy(child = c)
}

/** 16-byte binary → canonical IPv6 string (IPv6NumToString). */
case class Ipv6NumToString(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length != 16) null
    else try UTF8String.fromString(
      java.net.InetAddress.getByAddress(bytes).getHostAddress)
    catch { case _: Exception => null }
  }
  override protected def withNewChildInternal(c: Expression): Ipv6NumToString = copy(child = c)
}

/** isIPv6String — same guarded parse, as a predicate. */
case class IsIpv6String(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    s.matches("[0-9A-Fa-f:.]+") && s.contains(":") &&
      (try { java.net.InetAddress.getByName(s).isInstanceOf[java.net.Inet6Address] }
       catch { case _: Exception => false })
  }
  override protected def withNewChildInternal(c: Expression): IsIpv6String = copy(child = c)
}

/** sleep(seconds) — CH test helper; capped at 3 s so a stray call cannot
  * stall an executor. Returns 0 like the original.
  */
case class SleepExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with Nondeterministic with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override def dataType: DataType = IntegerType
  override protected def evalInternal(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v != null) {
      val ms = math.min(v.asInstanceOf[Number].doubleValue() * 1000.0, 3000.0).toLong
      if (ms > 0) Thread.sleep(ms)
    }
    0
  }
  override protected def withNewChildInternal(c: Expression): SleepExpr = copy(child = c)
}
