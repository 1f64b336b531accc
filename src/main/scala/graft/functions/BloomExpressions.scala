package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership over a BROADCAST filter — the prefilter leg of
  * [[graft.operators.Curation.decontaminateBloom]].
  *
  * Why not Spark's `might_contain`: that expression wants the serialized
  * filter inline as a literal/scalar-subquery, so a multi-hundred-MB bloom
  * (a 10^9-gram eval set at 1% fpp is ~1.2 GB of bits) would ride the PLAN
  * into every task. Holding a `Broadcast` handle instead ships bytes to
  * each executor once through the torrent broadcast path, and codegen
  * reaches the filter via one reference-object hop — same pattern as the
  * repo's NearestCells/vector kernels (addReferenceObj + shared `compute`).
  */
case class BloomMightContain(
    child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  /** The kernel — shared by interpreted eval and generated code. */
  def compute(v: Long): Boolean = bloom.value.mightContainLong(v)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMc", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}
