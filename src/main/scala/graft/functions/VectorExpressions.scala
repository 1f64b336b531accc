package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop vector kernels. The HOF formulation
  * (`aggregate(zip_with(...))`) evaluates its lambda interpreted PER ELEMENT
  * (CodegenFallback + per-element closure dispatch — the measured ~4× trap
  * from round 2); these expressions do one virtual call per ROW and a primitive
  * while-loop over the arrays. Accumulation order is the same sequential
  * left-to-right fold, so results are bit-identical to both the HOF form and
  * DuckDB's list_sum oracle.
  *
  * Codegen (r12): real `doGenCode` via the [[NearestCells]] pattern — the
  * generated code calls [[compute]] directly on the children's evaluated
  * ArrayData (`addReferenceObj` handle, primitive double return), so the
  * pair-dense paths (semDedup / embeddingNearDup / ANN scoring evaluate one
  * of these per CANDIDATE PAIR) skip the CodegenFallback toll of
  * materializing an InternalRow per row + interpreted dispatch.
  */
abstract class VectorKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType

  @inline protected final def get(d: ArrayData, et: DataType, i: Int): Double = et match {
    case DoubleType => d.getDouble(i)
    case FloatType => d.getFloat(i).toDouble
    case IntegerType => d.getInt(i).toDouble
    case LongType => d.getLong(i).toDouble
    case ShortType => d.getShort(i).toDouble
    case dt: DecimalType => d.getDecimal(i, dt.precision, dt.scale).toDouble
    case other => throw new IllegalArgumentException(s"non-numeric vector element: $other")
  }

  protected final def elemTypes: (DataType, DataType) = (
    left.dataType.asInstanceOf[ArrayType].elementType,
    right.dataType.asInstanceOf[ArrayType].elementType)

  /** The kernel — shared verbatim by interpreted eval and generated code. */
  def compute(va: ArrayData, vb: ArrayData): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("vectorKernel", this, classOf[VectorKernel].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.compute($l, $r);")
  }
}

/** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), one pass.
  *
  * r19: the float/float and double/double element types take a
  * monomorphic fast loop — the generic `get` pattern-matches the
  * DataType PER ELEMENT, which is the dominant cost when the kernel sits
  * inside a pair join evaluating millions of times (q146's within-cell
  * scan). Arithmetic is IDENTICAL (same `.toDouble` widening, same
  * accumulation order), so every hash-checked oracle stays bit-equal.
  */
case class CosineSim(left: Expression, right: Expression) extends VectorKernel {
  override def compute(va: ArrayData, vb: ArrayData): Double = {
    val (ta, tb) = elemTypes
    val n = math.min(va.numElements(), vb.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    if (ta == FloatType && tb == FloatType) {
      while (i < n) {
        val x = va.getFloat(i).toDouble; val y = vb.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    } else if (ta == DoubleType && tb == DoubleType) {
      while (i < n) {
        val x = va.getDouble(i); val y = vb.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    } else {
      while (i < n) {
        val x = get(va, ta, i); val y = get(vb, tb, i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Σ aᵢ·bᵢ (same monomorphic fast paths as [[CosineSim]], r19). */
case class DotProd(left: Expression, right: Expression) extends VectorKernel {
  override def compute(va: ArrayData, vb: ArrayData): Double = {
    val (ta, tb) = elemTypes
    val n = math.min(va.numElements(), vb.numElements())
    var dot = 0.0
    var i = 0
    if (ta == FloatType && tb == FloatType) {
      while (i < n) {
        dot += va.getFloat(i).toDouble * vb.getFloat(i).toDouble; i += 1
      }
    } else if (ta == DoubleType && tb == DoubleType) {
      while (i < n) { dot += va.getDouble(i) * vb.getDouble(i); i += 1 }
    } else {
      while (i < n) { dot += get(va, ta, i) * get(vb, tb, i); i += 1 }
    }
    dot
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProd =
    copy(left = l, right = r)
}

/** Cosine over int8 quantization codes — EXACT integer dot products (64·127²
  * per term fits long; accumulation over longs is order-free) with one final
  * double division, exactly the arithmetic of the HOF form it replaces
  * (`aggregate(zip_with(x*y))` ×3 — three interpreted per-element passes per
  * PAIR, the dominant q124 cost). Null when either norm is zero, matching
  * `when(na > 0 && nb > 0, …)`, and null when the two code arrays differ in
  * length — `zip_with` null-pads the shorter side and the products go null,
  * so the HOF form yields NULL there; a truncated dot product would silently
  * mask an upstream quantization bug.
  */
case class Int8Cosine(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @inline private def getL(d: ArrayData, et: DataType, i: Int): Long = et match {
    case ByteType => d.getByte(i).toLong
    case ShortType => d.getShort(i).toLong
    case IntegerType => d.getInt(i).toLong
    case LongType => d.getLong(i)
    case other => throw new IllegalArgumentException(s"non-integer code element: $other")
  }

  /** null = zero-norm or mismatched lengths (the zip_with null contract). */
  def compute(va: ArrayData, vb: ArrayData): java.lang.Double = {
    val ta = left.dataType.asInstanceOf[ArrayType].elementType
    val tb = right.dataType.asInstanceOf[ArrayType].elementType
    val n = va.numElements()
    if (n != vb.numElements()) return null
    var ab = 0L; var aa = 0L; var bb = 0L
    var i = 0
    while (i < n) {
      val x = getL(va, ta, i); val y = getL(vb, tb, i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    val na = math.sqrt(aa.toDouble)
    val nb = math.sqrt(bb.toDouble)
    if (na > 0 && nb > 0) ab.toDouble / (na * nb) else null
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("int8cos", this, classOf[Int8Cosine].getName)
    val tmp = ctx.freshName("int8cosRes")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""java.lang.Double $tmp = $ref.compute($l, $r);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int8Cosine =
    copy(left = l, right = r)
}

/** Symmetric per-vector int8 quantization in one pass — struct(scale, q)
  * with scale = max|v|/127 (1.0 for zero/empty/null vectors) and
  * q_i = round(v_i/scale) as tinyint. Bit-identical to the declarative
  * `struct(when(mx > 0, mx/127).otherwise(1), transform(v, round(x/scale)
  * .cast tinyint))` it replaces (two interpreted per-element passes):
  * the per-element round goes through the same BigDecimal HALF_UP Spark's
  * `round` uses (`math.floor(v + 0.5)` is NOT equivalent at double
  * tie-adjacent values, e.g. 0.49999999999999994), and the null contract
  * is preserved exactly — a NULL vector yields struct(1.0, null), not a
  * null struct. Non-finite elements follow the declarative form too:
  * `array_max` ranks NaN above everything, so a NaN element makes the
  * `when(mx > 0)` guard false → scale 1.0; Spark's `Round` passes NaN/±Inf
  * through untouched and the non-ANSI double→tinyint cast is Scala
  * `.toByte` (NaN→0, ±Inf→±Int.MaxValue truncation) — so NaN/Inf scaled
  * values skip the BigDecimal path (valueOf throws on non-finite) and cast
  * raw, bit-matching the `round(x/scale).cast(tinyint)` plan.
  */
case class Int8Quantize(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false))))

  override def nullable: Boolean = false

  @inline private def get(d: ArrayData, et: DataType, i: Int): Double = et match {
    case DoubleType => d.getDouble(i)
    case FloatType => d.getFloat(i).toDouble
    case IntegerType => d.getInt(i).toDouble
    case LongType => d.getLong(i).toDouble
    case other => throw new IllegalArgumentException(s"non-numeric vector element: $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    computeRow(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("int8quant", this, classOf[Int8Quantize].getName)
    val c = child.genCode(ctx)
    val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
    val adCls = "org.apache.spark.sql.catalyst.util.ArrayData"
    // a NULL vector yields struct(1.0, null), not a null struct — the
    // expression is non-nullable, so the child's null flows INTO computeRow
    ev.copy(
      code = code"""
        ${c.code}
        $rowCls ${ev.value} = ($rowCls) $ref.computeRow(
          ${c.isNull} ? null : ($adCls) ${c.value});""",
      isNull = FalseLiteral)
  }

  /** The kernel — shared by interpreted eval and generated code; accepts
    * null (the struct(1.0, null) contract).
    */
  def computeRow(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    if (arr == null)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](1.0, null))
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val n = arr.numElements()
    var mx = 0.0
    var sawNaN = false
    var i = 0
    while (i < n) {
      val a = math.abs(get(arr, et, i))
      if (a != a) sawNaN = true else if (a > mx) mx = a
      i += 1
    }
    val scale = if (!sawNaN && mx > 0) mx / 127.0 else 1.0
    val codes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val s = get(arr, et, i) / scale
      codes(i) =
        if (java.lang.Double.isNaN(s) || java.lang.Double.isInfinite(s)) s.toByte
        else java.math.BigDecimal.valueOf(s)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue().toByte
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, ArrayData.toArrayData(codes)))
  }

  override protected def withNewChildInternal(c: Expression): Int8Quantize =
    copy(child = c)
}

/** The `nProbe` nearest centroids of a vector as a (dist, cell)-sorted
  * array of structs — the contract of `Similarity.nearestCellsImpl`, as ONE
  * tight-loop kernel. Replaces the over-[[NearestCells]]-gate HOF form
  * (`transform(sequence(...), i -> struct(l2sq(v, element_at(lit, i))))` +
  * `array_sort`), whose per-element interpreted lambdas made assignment the
  * dominant cost at production k·dims (measured r11: k=800·64 dims over
  * 100 k rows pushed the sem_dedup 50× leg to ~531 s wall; the kernel's
  * k·dims primitive multiply-adds per row remove that wall entirely).
  *
  * Distances accumulate in the same sequential per-dimension fold order as
  * the HOF/inline forms (and DuckDB's list_sum oracle) → bit-identical;
  * ties select by (dist, cell) exactly like array_sort on the struct.
  * Centroids ride as constructor data — plan-embedded constants shipped
  * once per task with the serialized expression, rebuilt into a primitive
  * matrix per executor via the transient lazy (Seq fields keep case-class
  * equality structural for Catalyst; the matrix is eval-only).
  *
  * Codegen (r12): a real `doGenCode` — the generated projection calls
  * [[compute]] directly on the child's already-evaluated ArrayData via an
  * `addReferenceObj` handle, so the one kernel on every IVF/SemDeDup
  * assignment path at 100 TB no longer pays the CodegenFallback toll
  * (materializing an InternalRow per row + interpreted eval dispatch).
  * Interpreted eval and codegen share [[compute]] verbatim — bit-equality
  * between the two paths is spec-asserted.
  */
case class NearestCells(child: Expression, cells: Seq[Int],
    cents: Seq[Seq[Double]], nProbe: Int)
  extends UnaryExpression {
  require(cells.length == cents.length && cells.nonEmpty && nProbe >= 1)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("cell", IntegerType, nullable = false))), containsNull = false)

  @transient private lazy val cellIds: Array[Int] = cells.toArray
  @transient private lazy val matrix: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  @inline private def get(d: ArrayData, et: DataType, i: Int): Double = et match {
    case DoubleType => d.getDouble(i)
    case FloatType => d.getFloat(i).toDouble
    case IntegerType => d.getInt(i).toDouble
    case LongType => d.getLong(i).toDouble
    case other => throw new IllegalArgumentException(s"non-numeric vector element: $other")
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  /** The kernel — shared verbatim by interpreted eval and generated code. */
  def compute(v: ArrayData): ArrayData = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val k = matrix.length
    val m = math.min(nProbe, k)
    // selection buffer of the m smallest (dist, cell), (dist, cell)-ordered
    val bd = new Array[Double](m); val bc = new Array[Int](m)
    var filled = 0
    var c = 0
    while (c < k) {
      val cent = matrix(c)
      val n = math.min(v.numElements(), cent.length)
      var s = 0.0; var i = 0
      while (i < n) { val d = get(v, et, i) - cent(i); s += d * d; i += 1 }
      val cell = cellIds(c)
      if (filled < m || s < bd(m - 1) ||
          (s == bd(m - 1) && cell < bc(m - 1))) {
        var p = math.min(filled, m - 1)
        while (p > 0 && (bd(p - 1) > s || (bd(p - 1) == s && bc(p - 1) > cell))) {
          bd(p) = bd(p - 1); bc(p) = bc(p - 1); p -= 1
        }
        bd(p) = s; bc(p) = cell
        if (filled < m) filled += 1
      }
      c += 1
    }
    val rows = new Array[Any](filled)
    var j = 0
    while (j < filled) {
      rows(j) = org.apache.spark.sql.catalyst.InternalRow(bd(j), bc(j)); j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

/** 128-bit content digest of a numeric array — the fixed-width stand-in
  * for "group/join by the array VALUES" at scale (r20 verdict #2: semDedup's
  * collapse keyed its corpus-sized exchanges on the raw array<double> — 512 B
  * of key per row, hashed and compared element-wise; the digest
  * shuffles/sorts 16 bytes and lets the fan-back join drop the vector from
  * the shuffle entirely). Element bits are canonicalized exactly the way
  * Spark's NormalizeFloatingNumbers canonicalizes float grouping keys
  * (−0.0 → +0.0 via the ==0 check; every NaN → the canonical quiet NaN via
  * doubleToLongBits/floatToIntBits), and null elements occupy their own
  * position-slot domain, so digest-equality partitions rows exactly as
  * groupBy(<array>) does. Two independently-seeded murmur-finalizer lanes
  * over position-mixed element bits + the length → ~2⁻¹²⁸ pairwise collision
  * probability, the same class of guarantee as the md5(text) grouping key
  * the exact-dedup family already stands on (Dedup.exactKeepFirst).
  */
case class ArrayDigest128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("arrayDigest", this, classOf[ArrayDigest128].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  /** The kernel — shared verbatim by interpreted eval and generated code.
    * r21 perf note: the first cut allocated a boxed (slot, bits) Tuple2 and
    * pattern-matched the element type PER ELEMENT (64 allocations + matches
    * per row — measured in the q146 save-stage task time). The loop is now
    * allocation-free with the type dispatch hoisted to one branch per call;
    * the mixing arithmetic is unchanged, so every digest byte — and
    * therefore every grouping — is bit-identical.
    */
  def compute(v: ArrayData): Array[Byte] = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val n = v.numElements()
    var h1 = 0x87c37b91114253d5L
    var h2 = 0x4cf5ad432745937fL
    var i = 0
    val isDouble = et == DoubleType
    while (i < n) {
      // value slots are even, null slots odd — a null element can never
      // collide with any value's bit pattern
      var slot = 0L
      var bits = 0L
      if (v.isNullAt(i)) {
        slot = 2L * i + 1
      } else {
        slot = 2L * i
        bits =
          if (isDouble) {
            val x = v.getDouble(i)
            if (x == 0.0) 0L else java.lang.Double.doubleToLongBits(x)
          } else et match {
            case FloatType =>
              val x = v.getFloat(i)
              if (x == 0.0f) 0L else java.lang.Float.floatToIntBits(x).toLong
            case LongType => v.getLong(i)
            case IntegerType => v.getInt(i).toLong
            case ShortType => v.getShort(i).toLong
            case other =>
              throw new IllegalArgumentException(s"non-numeric vector element: $other")
          }
      }
      val m = mix64(bits + 0x9E3779B97F4A7C15L * slot)
      h1 = mix64(h1 ^ m)
      h2 = mix64(h2 + m)
      i += 1
    }
    h1 = mix64(h1 ^ n)
    h2 = mix64(h2 + n)
    val out = new Array[Byte](16)
    var j = 0
    while (j < 8) {
      out(j) = (h1 >>> (56 - 8 * j)).toByte
      out(j + 8) = (h2 >>> (56 - 8 * j)).toByte
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): ArrayDigest128 =
    copy(child = c)
}

/** √Σ(aᵢ−bᵢ)². */
case class L2Dist(left: Expression, right: Expression) extends VectorKernel {
  override def compute(va: ArrayData, vb: ArrayData): Double = {
    val (ta, tb) = elemTypes
    val n = math.min(va.numElements(), vb.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = get(va, ta, i) - get(vb, tb, i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Dist =
    copy(left = l, right = r)
}
