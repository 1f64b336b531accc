package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016 — the
  * subword vocabulary construction behind GPT-2/LLaMA tokenizers). The
  * reference's text tier counts whitespace/regex tokens
  * (function_definitions.py token helpers); a real curation pipeline
  * budgets in TOKENIZER units, so this closes that gap as a first-class
  * operator: train here, then encode at scale with the codegen'd
  * [[graft.functions.BpeEncode]] projection.
  *
  * 100 TB shape — the lmTrain pattern: training runs over the corpus WORD
  * FREQUENCY table, not the corpus. One map-side-combined word-count
  * shuffle, vocabulary bounded to `topWords` via TakeOrderedAndProject
  * (deterministic count-desc, word-asc tie-break), then the standard merge
  * loop runs driver-locally over that bounded table — O(topWords · avgLen)
  * per merge, ZERO further cluster work however big the corpus. Encoding
  * (the side that actually touches 100 TB) is a pure per-row projection
  * with the learned merges broadcast as a plan literal.
  */
object Tokenizer {

  /** Learn `numMerges` merges; returns them in application order. Pair
    * counting is the classic formulation: every adjacent symbol pair in
    * every vocabulary word, weighted by word frequency (overlapping pairs
    * both count — "aaa" contributes (a,a) twice); the applied merge is
    * left-to-right non-overlapping ([[graft.functions.BpeOps]] semantics,
    * which encode replays exactly). Ties break deterministically: highest
    * count, then lexicographically smallest (left, right).
    *
    * `byteLevel = true` trains in [[graft.functions.BpeEncodeBytes]]'s
    * regime instead: vocabulary entries are whitespace-prefix PIECES of the
    * raw text (case preserved, punctuation kept, a single leading space
    * attaches to its piece), initial symbols are the piece's UTF-8 bytes as
    * uppercase hex pairs — the learned merges feed `bpeEncodeBytes`, where
    * the default mode's feed `bpeEncode`.
    *
    * Driver-cost ceiling: the merge loop is
    * O(numMerges × topWords × avgSymbols) with no further cluster work —
    * at the documented defaults (e.g. 50k merges × 10k words × ~10
    * symbols ≈ 5·10^9 cheap ops) it is seconds to low minutes on the
    * driver; it is NOT sized for vocabularies in the 10^5-merges ×
    * 10^6-words regime. At that scale raise the corpus sample into
    * `topWords` rather than the merge count — token quality saturates in
    * the tens of thousands of merges (Sennrich et al. 2016 use 10k-90k).
    */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
      topWords: Int = 10000, byteLevel: Boolean = false): Seq[(String, String)] = {
    require(numMerges >= 0 && topWords > 0)
    val pieceCol =
      if (byteLevel) regexp_extract_all(col(textCol),
        lit(" ?[\\p{L}\\p{N}]+| ?[^\\p{L}\\p{N}\\s]+"), lit(0))
      else graft.functions.GraftFunctions.tokenize(col(textCol))
    def symbols(w: String): Array[String] =
      if (byteLevel) hexBytes(w) else codePoints(w)
    val wordFreq: Array[(Array[String], Long)] =
      df.select(explode(pieceCol).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), asc("w")).limit(topWords) // TakeOrderedAndProject
        .collect()
        .map(r => (symbols(r.getString(0)), r.getLong(1)))

    var vocab = wordFreq
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        vocab = vocab.map { case (syms, c) => (merge(syms, best._1, best._2), c) }
        round += 1
      }
    }
    merges.toSeq
  }

  /** Merge list → the literal [[graft.functions.BpeEncode]] accepts. */
  def mergesSpec(merges: Seq[(String, String)]): String =
    merges.map { case (l, r) => s"$l $r" }.mkString(",")

  /** Convenience: train on `trainDf`, attach `<outCol>` (token array) and
    * `<outCol>_count` to `df` via the codegen'd encode projection.
    * `byteLevel` must match how the merges were trained.
    */
  def bpeEncode(df: DataFrame, textCol: String, merges: Seq[(String, String)],
      outCol: String = "bpe", byteLevel: Boolean = false): DataFrame = {
    val enc = encodeColumn(col(textCol), mergesSpec(merges), byteLevel)
    df.withColumn(outCol, enc).withColumn(s"${outCol}_count", size(col(outCol)))
  }

  /** The encode expression as a Column (merges as a literal spec string). */
  def encodeColumn(text: Column, mergesSpec: String,
      byteLevel: Boolean = false): Column = {
    val t = org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)
    val m = org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(mergesSpec))
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      if (byteLevel) graft.functions.BpeEncodeBytes(t, m)
      else graft.functions.BpeEncode(t, m))
  }

  private def hexBytes(w: String): Array[String] = {
    val hex = "0123456789ABCDEF"
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8).map { b0 =>
      val b = b0 & 0xFF
      new String(Array(hex(b >>> 4), hex(b & 0xF)))
    }
  }

  private def codePoints(w: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val len = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + len)
      i += len
    }
    out.toArray
  }

  private def merge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }
}
