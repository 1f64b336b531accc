package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
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

object Md5Prefix60 {
  // one digest per thread: MessageDigest.getInstance per value is the
  // dominant constant in the conv(substring(md5…)) spelling this replaces
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) — numerically IDENTICAL to the repo's
    * portable oracle device `conv(substring(md5(s), 1, 15), 16, 10)`:
    * 15 hex chars = the big-endian first-8-bytes value >>> 4.
    */
  def hash(bytes: Array[Byte]): Long = {
    val d = md.get(); d.reset()
    val o = d.digest(bytes)
    (((o(0) & 0xffL) << 56) | ((o(1) & 0xffL) << 48) | ((o(2) & 0xffL) << 40) |
      ((o(3) & 0xffL) << 32) | ((o(4) & 0xffL) << 24) | ((o(5) & 0xffL) << 16) |
      ((o(6) & 0xffL) << 8) | (o(7) & 0xffL)) >>> 4
  }
}

/** The 60-bit md5-prefix shingle/bucket hash as ONE native expression
  * (r18). Same value as the md5→hex→substring→conv→cast chain every
  * oracle-replayed hash device here uses — minus the 32-char hex render,
  * the substring, and the string base-16 parse, which dominate the gram
  * kernels of decontaminate/hashSplit at scale (these run per n-gram,
  * inside higher-order lambdas the optimizer cannot fuse).
  */
case class Md5Prefix60(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  def compute(s: UTF8String): Long = Md5Prefix60.hash(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5p60", this, classOf[Md5Prefix60].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Md5Prefix60 =
    copy(child = c)
}

/** All word-n-gram 60-bit md5-prefix hashes of a token array in ONE kernel
  * (r18): value-identical to
  * `transform(sequence(0, size(toks)-n), i -> Md5Prefix60(concat_ws(" ",
  * slice(toks, i+1, n))))` with the size(toks) >= n gate folded in (short
  * inputs yield the empty array). Higher-order lambdas evaluate their body
  * expression tree interpreted per element, re-slicing the token array per
  * gram — this loop joins each window once and hashes it, nothing else.
  */
case class GramHash60(child: Expression, n: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1, s"n-gram width must be >= 1 (got $n)")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    val len = arr.numElements()
    if (len < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    val space = UTF8String.fromString(" ")
    val out = new Array[Long](len - n + 1)
    i = 0
    while (i <= len - n) {
      val window = new Array[UTF8String](n)
      System.arraycopy(toks, i, window, 0, n)
      out(i) = Md5Prefix60.hash(
        UTF8String.concatWs(space, window: _*).getBytes)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramHash60", this, classOf[GramHash60].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): GramHash60 =
    copy(child = c)
}
