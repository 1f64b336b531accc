package graft.functions.agg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** stochasticLinearRegression(target, x1, …, xk) → array(w1…wk, bias)
  * (every argument after the target is a feature; the ridge strength is NOT
  * a trailing argument — it is only reachable through the LEADING-parameter
  * spelling `ridgeRegression(l2, target, x1…xk)`, which keeps the feature
  * arity unambiguous)
  * (reference registers stochasticLinearRegression / stochastic_linear_regression
  * in the AGGREGATE section of datastore/function_definitions.py:5194).
  *
  * DOCUMENTED DIVERGENCE: ClickHouse trains by per-row SGD inside each thread
  * and averages the partial models, so its weights depend on row order and
  * thread count — non-deterministic on a cluster by construction. A
  * distributed engine should not reproduce that; instead we solve the SAME
  * model (ridge / OLS linear regression) EXACTLY via the normal equations:
  * the aggregate accumulates the Gram matrix XᵀX and the moment vector Xᵀy
  * (bias handled as an always-1 augmented feature) and `eval` solves
  * (XᵀX + l2·I)·w = Xᵀy by Gaussian elimination with partial pivoting on the
  * driver (a (k+1)×(k+1) system — microseconds for any sane k).
  *
  * Scale: the buffer is O(k²) doubles regardless of row count, update is one
  * rank-1 accumulation per row, merge is elementwise add — fully associative
  * and commutative, so it partial-aggregates map-side like a sum and needs a
  * single shuffle of k²-sized states at 100 TB. The returned weights feed
  * `evalMLMethod(weights, x1…xk)` (GraftFunctions alias) for prediction.
  *
  * The optional foldable `l2` (supplied by the `ridgeRegression` spelling;
  * ClickHouse spells it as a parametric combinator — Spark has no parametric
  * aggregates, same convention as [[Ema]]) is the ridge strength; the bias
  * row is not penalized, matching the standard ridge formulation.
  * Default 0 = exact OLS.
  */
case class LinRegFit(
    targetExpr: Expression,
    features: Seq[Expression],
    l2Expr: Option[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val k = features.length      // features; augmented dim = k + 1 (bias)
  private val d = k + 1
  private val triN = d * (d + 1) / 2   // upper triangle of XᵀX
  // buffer = [count, tri(XᵀX) row-major upper, Xᵀy(d)]
  private val bufN = 1 + triN + d

  private lazy val l2: Double = l2Expr.map(e => num(e.eval())).getOrElse(0.0)

  override def children: Seq[Expression] = targetExpr +: features ++: l2Expr.toSeq
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // a non-foldable l2 used to surface only at EXECUTION as a misleading
  // "must be a non-null numeric literal" (or an attribute-binding error);
  // fail analysis instead, where the message lands on the query (ADVICE r10)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (l2Expr.exists(e => !e.foldable))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "ridgeRegression: the l2 strength must be a foldable numeric literal " +
          "(it parameterizes the aggregate; it cannot vary per row)")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufN)

  private def num(a: Any): Double = a match {
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case n: Number => n.doubleValue()
    case null => throw new IllegalArgumentException(
      "ridgeRegression: l2 must be a non-null numeric literal")
  }

  // index of (i,j), i<=j, in the row-major upper triangle of a d×d matrix
  @inline private def tri(i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val y = targetExpr.eval(input)
    if (y == null) return b
    val x = new Array[Double](d)
    var i = 0
    while (i < k) {
      val v = features(i).eval(input)
      if (v == null) return b // skip rows with any null feature
      x(i) = num(v)
      i += 1
    }
    x(k) = 1.0 // bias column
    val yv = num(y)
    b(0) += 1.0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        b(1 + tri(i, j)) += x(i) * x(j)
        j += 1
      }
      b(1 + triN + i) += x(i) * yv
      i += 1
    }
    b
  }

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufN) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Double]): Any = {
    if (b(0) == 0.0) return null
    // materialize the symmetric augmented system [A | rhs]
    val a = Array.ofDim[Double](d, d + 1)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        a(i)(j) = if (i <= j) b(1 + tri(i, j)) else b(1 + tri(j, i))
        j += 1
      }
      if (l2 != 0.0 && i < k) a(i)(i) += l2 // ridge; bias unpenalized
      a(i)(d) = b(1 + triN + i)
      i += 1
    }
    // Gaussian elimination with partial pivoting
    var col = 0
    while (col < d) {
      var piv = col
      var r = col + 1
      while (r < d) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (a(piv)(col) == 0.0) return null // singular (degenerate features)
      if (piv != col) { val t = a(piv); a(piv) = a(col); a(col) = t }
      r = col + 1
      while (r < d) {
        val f = a(r)(col) / a(col)(col)
        if (f != 0.0) {
          var c = col
          while (c <= d) { a(r)(c) -= f * a(col)(c); c += 1 }
        }
        r += 1
      }
      col += 1
    }
    val w = new Array[Double](d)
    i = d - 1
    while (i >= 0) {
      var s = a(i)(d)
      var j = i + 1
      while (j < d) { s -= a(i)(j) * w(j); j += 1 }
      w(i) = s / a(i)(i)
      i -= 1
    }
    new GenericArrayData(w) // [w1…wk, bias]
  }

  override def serialize(b: Array[Double]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 * bufN)
    b.foreach(buf.putDouble)
    buf.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bufN)(buf.getDouble())
  }

  override def withNewMutableAggBufferOffset(o: Int): LinRegFit = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LinRegFit = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): LinRegFit =
    copy(targetExpr = c.head,
      features = c.slice(1, 1 + k),
      l2Expr = if (l2Expr.isDefined) Some(c(1 + k)) else None)
}
