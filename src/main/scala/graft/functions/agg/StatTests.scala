package graft.functions.agg

import scala.collection.mutable.ArrayBuffer

import org.apache.commons.math3.distribution.{NormalDistribution, TDistribution}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Two-sample hypothesis-test aggregates — the reference's statistics family
  * (student_t_test / welch_t_test / mann_whitney_u_test /
  * kolmogorov_smirnov_test, registered in datastore/function_definitions.py
  * AGGREGATE section). Signature follows the reference:
  * `test(sample_data, sample_index)` with index 0/1, returning a struct of
  * (statistic, p_value) (+ degrees of freedom for the t-tests).
  *
  * Scale design: the t-tests fold into six moments — O(1) memory per group,
  * map-side partial merge, arbitrarily large samples. The rank tests (MW-U,
  * KS) buffer the group's values (ranking is inherently a sort), the same
  * memory contract the reference engine has for these functions; memory is
  * bounded by the largest single GROUP BY key, not the table.
  *
  * p-values use commons-math3 (on the Spark runtime classpath): Student-t CDF
  * for the t-tests, normal approximation with tie + continuity correction for
  * MW-U, and the asymptotic Kolmogorov Q(λ) series for KS.
  */
object StatTests {
  private[agg] def tTestPValue(t: Double, dof: Double): Double = {
    if (dof <= 0 || t.isNaN || t.isInfinite) return Double.NaN
    val dist = new TDistribution(dof)
    math.min(1.0, 2.0 * dist.cumulativeProbability(-math.abs(t)))
  }

  private[agg] def normPValueTwoSided(z: Double): Double = {
    if (z.isNaN || z.isInfinite) return Double.NaN
    val dist = new NormalDistribution()
    math.min(1.0, 2.0 * dist.cumulativeProbability(-math.abs(z)))
  }

  /** Asymptotic Kolmogorov survival Q(λ) = 2 Σ (-1)^{k-1} e^{-2k²λ²}. */
  private[agg] def ksPValue(d: Double, n0: Long, n1: Long): Double = {
    if (n0 == 0 || n1 == 0) return Double.NaN
    val en = math.sqrt(n0.toDouble * n1 / (n0.toDouble + n1))
    val lambda = (en + 0.12 + 0.11 / en) * d
    // the alternating series only converges for non-trivial λ; below that the
    // distribution mass is all above D, i.e. p = 1 (Numerical-Recipes guard)
    if (lambda < 0.2) return 1.0
    var sum = 0.0
    var k = 1
    var term = Double.MaxValue
    while (k <= 100 && math.abs(term) > 1e-12) {
      term = 2.0 * (if (k % 2 == 1) 1.0 else -1.0) * math.exp(-2.0 * k * k * lambda * lambda)
      sum += term
      k += 1
    }
    math.max(0.0, math.min(1.0, sum))
  }
}

/** Moments buffer: (n, Σx, Σx²) per sample. */
final class TTestBuffer extends Serializable {
  val n = new Array[Long](2)
  val sum = new Array[Double](2)
  val sumsq = new Array[Double](2)
  def add(idx: Int, v: Double): Unit = { n(idx) += 1; sum(idx) += v; sumsq(idx) += v * v }
  def mergeIn(o: TTestBuffer): Unit = {
    var i = 0
    while (i < 2) { n(i) += o.n(i); sum(i) += o.sum(i); sumsq(i) += o.sumsq(i); i += 1 }
  }
}

/** studentTTest / welchTTest(value, sampleIndex) →
  * struct(t_statistic, p_value, dof). Statistic sign is mean0 − mean1.
  */
case class TTestAgg(
    valueExpr: Expression,
    idxExpr: Expression,
    welch: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TTestBuffer] {

  override def children: Seq[Expression] = Seq(valueExpr, idxExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("t_statistic", DoubleType), StructField("p_value", DoubleType),
    StructField("dof", DoubleType)))

  override def createAggregationBuffer(): TTestBuffer = new TTestBuffer

  override def update(b: TTestBuffer, input: InternalRow): TTestBuffer = {
    val v = valueExpr.eval(input)
    val g = idxExpr.eval(input)
    if (v != null && g != null) {
      val idx = g.asInstanceOf[Number].intValue()
      require(idx == 0 || idx == 1, s"sample index must be 0 or 1, got $idx")
      b.add(idx, v.asInstanceOf[Number].doubleValue())
    }
    b
  }

  override def merge(b: TTestBuffer, o: TTestBuffer): TTestBuffer = { b.mergeIn(o); b }

  override def eval(b: TTestBuffer): Any = {
    val (n0, n1) = (b.n(0), b.n(1))
    if (n0 < 2 || n1 < 2)
      return InternalRow(Double.NaN, Double.NaN, Double.NaN)
    val m0 = b.sum(0) / n0
    val m1 = b.sum(1) / n1
    val var0 = (b.sumsq(0) - n0 * m0 * m0) / (n0 - 1)
    val var1 = (b.sumsq(1) - n1 * m1 * m1) / (n1 - 1)
    val (t, dof) =
      if (welch) {
        val se0 = var0 / n0
        val se1 = var1 / n1
        val tt = (m0 - m1) / math.sqrt(se0 + se1)
        val df = (se0 + se1) * (se0 + se1) /
          (se0 * se0 / (n0 - 1) + se1 * se1 / (n1 - 1))
        (tt, df)
      } else {
        val sp2 = ((n0 - 1) * var0 + (n1 - 1) * var1) / (n0 + n1 - 2)
        val tt = (m0 - m1) / math.sqrt(sp2 * (1.0 / n0 + 1.0 / n1))
        (tt, (n0 + n1 - 2).toDouble)
      }
    InternalRow(t, StatTests.tTestPValue(t, dof), dof)
  }

  override def serialize(b: TTestBuffer): Array[Byte] = SerDe.toBytes(b)
  override def deserialize(bytes: Array[Byte]): TTestBuffer = SerDe.fromBytes[TTestBuffer](bytes)
  override def withNewMutableAggBufferOffset(o: Int): TTestAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TTestAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TTestAgg =
    copy(valueExpr = c(0), idxExpr = c(1))
}

/** Value buffer for the rank-based tests. */
final class TwoSampleBuffer extends Serializable {
  val values: ArrayBuffer[Double] = ArrayBuffer.empty
  val idxs: ArrayBuffer[Byte] = ArrayBuffer.empty
  def add(idx: Int, v: Double): Unit = { values += v; idxs += idx.toByte }
  def mergeIn(o: TwoSampleBuffer): Unit = { values ++= o.values; idxs ++= o.idxs }
}

/** mannWhitneyUTest(value, sampleIndex) → struct(u_statistic, p_value).
  * U is the statistic of sample 0 (U₀ = R₀ − n₀(n₀+1)/2, average ranks on
  * ties); p is the two-sided normal approximation with tie correction and
  * 0.5 continuity correction — the reference's default mode.
  */
case class MannWhitneyUTest(
    valueExpr: Expression,
    idxExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TwoSampleBuffer] with TwoSampleRankTest {

  override def dataType: DataType = StructType(Seq(
    StructField("u_statistic", DoubleType), StructField("p_value", DoubleType)))

  override def eval(b: TwoSampleBuffer): Any = {
    val n = b.values.length
    val n0 = b.idxs.count(_ == 0).toLong
    val n1 = n - n0
    if (n0 == 0 || n1 == 0) return InternalRow(Double.NaN, Double.NaN)
    val order = (0 until n).sortBy(b.values)
    // average ranks with tie correction term Σ(t³−t)
    var r0 = 0.0
    var tieTerm = 0.0
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && b.values(order(j + 1)) == b.values(order(i))) j += 1
      val t = j - i + 1
      val avgRank = (i + 1 + j + 1) / 2.0
      var k = i
      while (k <= j) {
        if (b.idxs(order(k)) == 0) r0 += avgRank
        k += 1
      }
      tieTerm += t.toDouble * t * t - t
      i = j + 1
    }
    val u0 = r0 - n0 * (n0 + 1) / 2.0
    val mu = n0.toDouble * n1 / 2.0
    val nn = n.toDouble
    val sigma2 = n0.toDouble * n1 / 12.0 * ((nn + 1) - tieTerm / (nn * (nn - 1)))
    val p =
      if (sigma2 <= 0) Double.NaN
      else {
        // continuity correction shrinks |u − μ| by 0.5 but never past zero
        val d = u0 - mu
        val corrected = math.signum(d) * math.max(math.abs(d) - 0.5, 0.0)
        StatTests.normPValueTwoSided(corrected / math.sqrt(sigma2))
      }
    InternalRow(u0, p)
  }

  override def withNewMutableAggBufferOffset(o: Int): MannWhitneyUTest = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MannWhitneyUTest = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MannWhitneyUTest =
    copy(valueExpr = c(0), idxExpr = c(1))
}

/** kolmogorovSmirnovTest(value, sampleIndex) → struct(d_statistic, p_value).
  * Two-sample KS: D = max over observed values of |F₀(v) − F₁(v)|; p is the
  * asymptotic Kolmogorov series.
  */
case class KolmogorovSmirnovTest(
    valueExpr: Expression,
    idxExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TwoSampleBuffer] with TwoSampleRankTest {

  override def dataType: DataType = StructType(Seq(
    StructField("d_statistic", DoubleType), StructField("p_value", DoubleType)))

  override def eval(b: TwoSampleBuffer): Any = {
    val n = b.values.length
    val n0 = b.idxs.count(_ == 0).toLong
    val n1 = n - n0
    if (n0 == 0 || n1 == 0) return InternalRow(Double.NaN, Double.NaN)
    val order = (0 until n).sortBy(b.values)
    var c0 = 0L
    var c1 = 0L
    var d = 0.0
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && b.values(order(j + 1)) == b.values(order(i))) j += 1
      var k = i
      while (k <= j) {
        if (b.idxs(order(k)) == 0) c0 += 1 else c1 += 1
        k += 1
      }
      val diff = math.abs(c0.toDouble / n0 - c1.toDouble / n1)
      if (diff > d) d = diff
      i = j + 1
    }
    InternalRow(d, StatTests.ksPValue(d, n0, n1))
  }

  override def withNewMutableAggBufferOffset(o: Int): KolmogorovSmirnovTest = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KolmogorovSmirnovTest = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KolmogorovSmirnovTest =
    copy(valueExpr = c(0), idxExpr = c(1))
}

private[agg] trait TwoSampleRankTest extends TypedImperativeAggregate[TwoSampleBuffer] {
  def valueExpr: Expression
  def idxExpr: Expression

  override def children: Seq[Expression] = Seq(valueExpr, idxExpr)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TwoSampleBuffer = new TwoSampleBuffer

  override def update(b: TwoSampleBuffer, input: InternalRow): TwoSampleBuffer = {
    val v = valueExpr.eval(input)
    val g = idxExpr.eval(input)
    if (v != null && g != null) {
      val idx = g.asInstanceOf[Number].intValue()
      require(idx == 0 || idx == 1, s"sample index must be 0 or 1, got $idx")
      b.add(idx, v.asInstanceOf[Number].doubleValue())
    }
    b
  }

  override def merge(b: TwoSampleBuffer, o: TwoSampleBuffer): TwoSampleBuffer = { b.mergeIn(o); b }
  override def serialize(b: TwoSampleBuffer): Array[Byte] = SerDe.toBytes(b)
  override def deserialize(bytes: Array[Byte]): TwoSampleBuffer = SerDe.fromBytes[TwoSampleBuffer](bytes)
}
