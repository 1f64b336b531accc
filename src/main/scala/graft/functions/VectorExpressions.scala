package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop vector kernels. The HOF formulation
  * (`aggregate(zip_with(...))`) evaluates its lambda interpreted PER ELEMENT
  * (CodegenFallback + per-element closure dispatch — the measured ~4× trap
  * from round 2); these expressions do one virtual call per ROW and a primitive
  * while-loop over the arrays. Accumulation order is the same sequential
  * left-to-right fold, so results are bit-identical to both the HOF form and
  * DuckDB's list_sum oracle.
  */
abstract class VectorKernel extends BinaryExpression with CodegenFallback {
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
}

/** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), one pass. */
case class CosineSim(left: Expression, right: Expression) extends VectorKernel {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (ta, tb) = elemTypes
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = math.min(va.numElements(), vb.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(va, ta, i); val y = get(vb, tb, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Σ aᵢ·bᵢ. */
case class DotProd(left: Expression, right: Expression) extends VectorKernel {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (ta, tb) = elemTypes
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = math.min(va.numElements(), vb.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += get(va, ta, i) * get(vb, tb, i); i += 1 }
    dot
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProd =
    copy(left = l, right = r)
}

/** √Σ(aᵢ−bᵢ)². */
case class L2Dist(left: Expression, right: Expression) extends VectorKernel {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (ta, tb) = elemTypes
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = math.min(va.numElements(), vb.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = get(va, ta, i) - get(vb, tb, i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Dist =
    copy(left = l, right = r)
}
