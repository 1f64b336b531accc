package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over whitespace-separated lowercased tokens — the classic
  * near-duplicate fingerprint (Charikar 2002): documents within small Hamming
  * distance of each other are near-duplicates. Part of the LLM-pipeline
  * dedup tier (SURVEY §7.5); the per-token hash is a xxhash64-style mix so
  * results are deterministic across the cluster.
  */
case class SimHash(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase
    val weights = new Array[Long](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || !Character.isLetterOrDigit(text.charAt(i))) {
        if (i > start) {
          val h = Mix64.hash(text, start, i)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) weights(b) += 1 else weights(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (weights(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
}

/** fingerprint(text, window) — winnowing-style document fingerprint
  * (Schleimer/Wilkerson/Aiken 2003, simplified): minimum of Karp–Rabin
  * rolling hashes over all `window`-char substrings of the normalized text.
  * Equal fingerprints strongly indicate shared content; used as a cheap
  * first-pass dedup key at scale.
  */
case class TextFingerprint(child: Expression, windowExpr: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = child
  override def right: Expression = windowExpr
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any, winAny: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString.toLowerCase
    // normalize: collapse non-alphanumerics
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    var lastSpace = true
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (Character.isLetterOrDigit(c)) { sb.append(c); lastSpace = false }
      else if (!lastSpace) { sb.append(' '); lastSpace = true }
      i += 1
    }
    val s = sb.toString
    val w = winAny.asInstanceOf[Int]
    if (s.length <= w) return Mix64.hash(s, 0, s.length)
    val B = 1000000007L
    var pow = 1L
    i = 0
    while (i < w - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * B + s.charAt(i); i += 1 }
    var min = Mix64.mix(h)
    i = w
    while (i < s.length) {
      h = (h - s.charAt(i - w) * pow) * B + s.charAt(i)
      val m = Mix64.mix(h)
      if (m < min) min = m
      i += 1
    }
    min
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): TextFingerprint =
    copy(child = l, windowExpr = r)
}

/** splitmix64-style finalizer + a simple string hash built on it. */
private[functions] object Mix64 {
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  def hash(s: CharSequence, from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) { h = (h ^ s.charAt(i)) * 0x100000001B3L; i += 1 }
    mix(h)
  }
}
