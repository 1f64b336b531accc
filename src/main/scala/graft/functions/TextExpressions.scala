package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** tokenize(text): lowercased word tokens in a single character-class scan.
  *
  * Drop-in replacement for the declarative
  * `filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)`
  * (r9 verdict: the regex tokenizer is the whole cost of q103_curation — a
  * java.util.regex scan per document dominated the curation pipeline). The
  * semantics are IDENTICAL by construction: lowercase first via the same
  * `UTF8String.toLowerCase` that Spark's `lower` uses, then emit maximal
  * runs of code points whose Unicode category is a Letter (Lu/Ll/Lt/Lm/Lo,
  * `\p{L}`) or Number (Nd/Nl/No, `\p{N}`) — exactly the complement of the
  * regex separator, decided by one `Character.getType` lookup per code
  * point instead of a regex engine. TokenizeFidelitySpec property-checks
  * equivalence against the regex pipeline over unicode inputs.
  *
  * Full codegen (one static call per row), so tokenize stays inside
  * whole-stage codegen in every pipeline that was already codegen'd.
  */
case class Tokenize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TokenizerOps.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizerOps.split($c)")

  override protected def withNewChildInternal(c: Expression): Tokenize = copy(child = c)
}

/** Static home for [[Tokenize]]'s scan (no companion class, so the
  * generated Java calls the static forwarder directly).
  */
object TokenizerOps {
  def split(s: UTF8String): GenericArrayData = {
    val lower = s.toLowerCase.toString
    val out = new java.util.ArrayList[AnyRef]
    val n = lower.length
    var i = 0
    var start = -1
    while (i < n) {
      val cp = lower.codePointAt(i)
      val t = Character.getType(cp)
      // Unicode categories Lu..Lo are types 1..5, Nd/Nl/No are 9..11
      val isTok = (t >= Character.UPPERCASE_LETTER && t <= Character.OTHER_LETTER) ||
        (t >= Character.DECIMAL_DIGIT_NUMBER && t <= Character.OTHER_NUMBER)
      if (isTok) { if (start < 0) start = i }
      else if (start >= 0) {
        out.add(UTF8String.fromString(lower.substring(start, i)))
        start = -1
      }
      i += Character.charCount(cp)
    }
    if (start >= 0) out.add(UTF8String.fromString(lower.substring(start, n)))
    new GenericArrayData(out.toArray)
  }
}

/** textStats(text): EVERY integer count the quality/language operators need,
  * in one fused scan — struct(n_chars, punct_cnt, digit_cnt, n_tokens,
  * tok_len_sum, distinct_tokens, hits: array<int> per language in
  * lang-sorted order (de, en, es, fr, zh)).
  *
  * Replaces the r10 feature pipeline's per-row passes (two java.util.regex
  * scans for punct/digit ratios + six interpreted higher-order-function
  * filters over the token array + array_distinct) with one scan of the
  * original text (code-point category counts) and one scan of the
  * lowercased text (the [[TokenizerOps]] token loop with per-token set
  * probes). The counts are BIT-IDENTICAL to the declarative forms by
  * construction:
  *   - n_chars = `length(t)` (code points, as `UTF8String.numChars`);
  *   - punct_cnt = code points Java regex `\p{Punct}` matches (POSIX =
  *     ASCII 33-47 / 58-64 / 91-96 / 123-126) — what
  *     `length(t) - length(regexp_replace(t, "[\p{Punct}]", ""))` counted;
  *   - digit_cnt = `[0-9]` matches;
  *   - tokens/lengths exactly [[TokenizerOps]] (lengths in code points,
  *     matching `length()` of each token);
  *   - hits(lang) = tokens (with duplicates) found in that language's
  *     stopword list — what `size(filter(toks, array_contains(...)))`
  *     counted; distinct_tokens = `size(array_distinct(toks))`.
  * The ratio ARITHMETIC stays in Column space (TextAnalysis) with the same
  * expression shapes, so q70/q71/q103/q136 oracles hold unchanged.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStatsOps.schema

  override protected def nullSafeEval(input: Any): Any =
    TextStatsOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsOps.compute($c)")

  override protected def withNewChildInternal(c: Expression): TextStats = copy(child = c)
}

object TextStatsOps {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** Tiny per-language stopword lists (single source of truth — the
    * operator layer's `TextAnalysis.stopwords` references this map).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "que", "por"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "ni", "ta", "men", "zai", "you"))

  /** Language order of the `hits` array (sorted keys, as the operator
    * layer iterates them).
    */
  val langs: IndexedSeq[String] = stopwords.keys.toIndexedSeq.sorted

  /** Index of "en" in [[langs]] (the stopword_ratio language). */
  val enIndex: Int = langs.indexOf("en")

  private val langSets: Array[java.util.HashSet[String]] = langs.map { l =>
    val s = new java.util.HashSet[String]()
    stopwords(l).foreach(s.add)
    s
  }.toArray

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("punct_cnt", IntegerType, nullable = false),
    StructField("digit_cnt", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("tok_len_sum", LongType, nullable = false),
    StructField("distinct_tokens", IntegerType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  // Java \p{Punct} (POSIX punct): ASCII 33-47, 58-64, 91-96, 123-126
  @inline private def isPunct(cp: Int): Boolean =
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)

  def compute(s: UTF8String): InternalRow = {
    // pass 1: original text — code-point count + punct/digit categories
    val orig = s.toString
    var nChars = 0
    var punct = 0
    var digit = 0
    var i = 0
    while (i < orig.length) {
      val cp = orig.codePointAt(i)
      nChars += 1
      if (isPunct(cp)) punct += 1
      else if (cp >= '0' && cp <= '9') digit += 1
      i += Character.charCount(cp)
    }
    // pass 2: lowercased text — the TokenizerOps token loop, with per-token
    // length (code points), distinct set, and stopword-set probes
    val lower = s.toLowerCase.toString
    var nTokens = 0
    var lenSum = 0L
    val distinct = new java.util.HashSet[String]()
    val hits = new Array[Int](langSets.length)
    val n = lower.length
    var start = -1
    var tokCp = 0
    i = 0
    def endToken(end: Int): Unit = {
      val tok = lower.substring(start, end)
      nTokens += 1
      lenSum += tokCp
      distinct.add(tok)
      var l = 0
      while (l < langSets.length) {
        if (langSets(l).contains(tok)) hits(l) += 1
        l += 1
      }
      start = -1
      tokCp = 0
    }
    while (i < n) {
      val cp = lower.codePointAt(i)
      val t = Character.getType(cp)
      val isTok = (t >= Character.UPPERCASE_LETTER && t <= Character.OTHER_LETTER) ||
        (t >= Character.DECIMAL_DIGIT_NUMBER && t <= Character.OTHER_NUMBER)
      if (isTok) {
        if (start < 0) start = i
        tokCp += 1
      } else if (start >= 0) endToken(i)
      i += Character.charCount(cp)
    }
    if (start >= 0) endToken(n)
    new GenericInternalRow(Array[Any](nChars, punct, digit, nTokens, lenSum,
      distinct.size, new GenericArrayData(hits)))
  }
}

/** shingleHashes(text, n): sorted distinct xxhash64 values of the space-
  * joined n-token shingles — the fused form of
  * `array_sort(array_distinct(transform(shingles(tokenize(text), n),
  * s => xxhash64(s))))`, the projection every dedup operator (minhash LSH,
  * ppjoin n-gram Jaccard) computes per document. The declarative pipeline
  * ran the slice/zip/concat_ws shingle assembly plus the hash transform as
  * interpreted per-element lambdas; this is one token scan + one XXH64 per
  * shingle (the same `XxHash64Function` with the same seed 42 Spark's
  * `xxhash64` uses, over the identical joined string — so the hash VALUES
  * are bit-identical, locked by DedupSpec/ShingleFidelitySpec).
  *
  * Shingle semantics replicated exactly: fewer than n tokens → ONE shingle
  * of all tokens joined (the empty string for a token-less text); n or
  * more → size−n+1 windows.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.hashes($c, $n)")

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

object ShingleOps {
  import org.apache.spark.sql.catalyst.expressions.XxHash64Function

  private def hashString(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)

  def hashes(text: UTF8String, n: Int): GenericArrayData = {
    // token scan — same loop as TokenizerOps, collecting String tokens
    val lower = text.toLowerCase.toString
    val toks = new java.util.ArrayList[String]
    val len = lower.length
    var i = 0
    var start = -1
    while (i < len) {
      val cp = lower.codePointAt(i)
      val t = Character.getType(cp)
      val isTok = (t >= Character.UPPERCASE_LETTER && t <= Character.OTHER_LETTER) ||
        (t >= Character.DECIMAL_DIGIT_NUMBER && t <= Character.OTHER_NUMBER)
      if (isTok) { if (start < 0) start = i }
      else if (start >= 0) { toks.add(lower.substring(start, i)); start = -1 }
      i += Character.charCount(cp)
    }
    if (start >= 0) toks.add(lower.substring(start, len))

    val k = toks.size
    val out: Array[Long] =
      if (k < n) Array(hashString(String.join(" ", toks)))
      else {
        val arr = new Array[Long](k - n + 1)
        val sb = new java.lang.StringBuilder
        var w = 0
        while (w <= k - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks.get(w + j))
            j += 1
          }
          arr(w) = hashString(sb.toString)
          w += 1
        }
        arr
      }
    // distinct + ascending sort (array_sort over longs)
    java.util.Arrays.sort(out)
    var m = 0
    var r = 0
    while (r < out.length) {
      if (m == 0 || out(r) != out(m - 1)) { out(m) = out(r); m += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Merge-intersect Jaccard over sorted distinct long arrays. */
  def jaccard(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}

/** jaccardSortedLongs(a, b): exact Jaccard over two SORTED DISTINCT long
  * arrays in one merge pass — the fused form of the verify step's
  * `size(array_intersect(a, b)) / (size(a) + size(b) − inter)`. The int
  * division operands are identical, so the double result is bit-identical;
  * one kernel call per candidate pair replaces an interpreted
  * array_intersect that predicate pushdown additionally duplicated into
  * the threshold filter.
  */
case class JaccardSortedLongs(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ShingleOps.jaccard(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ShingleOps.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaccardSortedLongs = copy(left = l, right = r)
}

/** qualityGate(text): the curation keep/drop decision (language ∈ allowed ∧
  * quality ≥ floor) as ONE boolean expression.
  *
  * Why it exists (r11 profiling): expressing the curation filter over
  * derived columns — `filter(pred_lang isin … && quality_score >= q)` above
  * the feature projection — lets Catalyst's predicate pushdown substitute
  * the FULL feature trees into the pushed condition (PushPredicateThrough-
  * Project inlines aliases unconditionally), so the filter re-evaluated the
  * fused scan ~12× per row: measured 11 s vs 0.7 s for the unfiltered
  * projection on a 100 k-row corpus. Pushing a single boolean leaves the
  * pushdown nothing to duplicate: the gate IS one scan, runs at the scan
  * site, and the feature projection then computes only for survivors.
  *
  * The score/argmax arithmetic replicates TextAnalysis.scoreMix /
  * languageIdFromStats operation-for-operation (same IEEE order), so the
  * gate keeps EXACTLY the rows the declarative filter kept — q103's oracle
  * is the lock, and CurationSpec asserts gate ≡ declarative filter.
  */
case class QualityGate(child: Expression, languages: Seq[String],
    minQuality: Double, floor: Double = 0.02)
  extends UnaryExpression with Predicate {

  override protected def nullSafeEval(input: Any): Any =
    keep(input.asInstanceOf[UTF8String])

  def keep(s: UTF8String): Boolean = {
    val r = TextStatsOps.compute(s)
    val nChars = r.getInt(0)
    val punctCnt = r.getInt(1)
    val nTokens = r.getInt(3)
    val distinctToks = r.getInt(5)
    val hits = r.getArray(6)
    val nTok = math.max(nTokens, 1).toDouble
    val nCh = math.max(nChars, 1).toDouble
    val punctRatio = punctCnt.toDouble / nCh
    val stopRatio = hits.getInt(TextStatsOps.enIndex).toDouble / nTok
    val repRatio = 1.0 - distinctToks.toDouble / nTok
    // scoreMix, replicated in evaluation order (left-assoc sums)
    val score = math.min(1.0, math.max(0.0,
      0.3 * math.min(nTokens.toDouble / 100.0, 1.0) +
        0.3 * (1.0 - repRatio) +
        0.2 * math.min(stopRatio * 5.0, 1.0) +
        0.2 * (1.0 - punctRatio)))
    if (score < minQuality) return false
    // languageIdFromStats: max (score, lang) over lang-sorted structs
    var bestScore = -1.0
    var bestLang = ""
    var i = 0
    while (i < TextStatsOps.langs.length) {
      val sc = hits.getInt(i).toDouble / nTok
      val l = TextStatsOps.langs(i)
      if (sc > bestScore || (sc == bestScore && l > bestLang)) {
        bestScore = sc; bestLang = l
      }
      i += 1
    }
    val pred = if (bestScore >= floor) bestLang else "und"
    languages.contains(pred)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualityGate", this, classOf[QualityGate].getName)
    defineCodeGen(ctx, ev, c => s"$ref.keep($c)")
  }

  override protected def withNewChildInternal(c: Expression): QualityGate =
    copy(child = c)
}

/** 64-bit SimHash over whitespace-separated lowercased tokens — the classic
  * near-duplicate fingerprint (Charikar 2002): documents within small Hamming
  * distance of each other are near-duplicates. Part of the LLM-pipeline
  * dedup tier (SURVEY §7.5); the per-token hash is a xxhash64-style mix so
  * results are deterministic across the cluster.
  */
case class SimHash(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  /** The kernel — shared by interpreted eval and generated code (r12). */
  def compute(input: UTF8String): Long = {
    val text = input.toString.toLowerCase
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
  extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = windowExpr
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any, winAny: Any): Any =
    compute(input.asInstanceOf[UTF8String], winAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textFp", this, classOf[TextFingerprint].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.compute($l, $r);")
  }

  /** The kernel — shared by interpreted eval and generated code (r12). */
  def compute(input: UTF8String, w0: Int): Long = {
    val raw = input.toString.toLowerCase
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
    val w = w0
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

/** Unicode normalization (reference normalizeUTF8NFC/NFD/NFKC/NFKD family) —
  * a direct wrap of java.text.Normalizer; was a silent no-op before r6.
  */
case class NormalizeUtf8(child: Expression, form: java.text.Normalizer.Form)
  extends UnaryExpression {

  override def dataType: DataType = StringType

  def compute(input: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(input.toString, form))

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normUtf8", this, classOf[NormalizeUtf8].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): NormalizeUtf8 = copy(child = c)
}

/** English stemmer (reference stem('en', s)) — Porter's 1980 algorithm,
  * transliterated from the published description (an open, public-domain
  * algorithm). Non-English languages raise at plan time rather than
  * silently returning the input (r5 verdict: silence is the only wrong
  * option).
  */
case class PorterStem(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = StringType

  def compute(input: UTF8String): UTF8String =
    UTF8String.fromString(Porter.stem(input.toString))

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("porter", this, classOf[PorterStem].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): PorterStem = copy(child = c)
}

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980). Classic five-step suffix stripper over
  * the measure m (count of VC sequences). Stateless entry point; one small
  * working buffer per call.
  */
private[functions] object Porter {
  def stem(word: String): String = {
    val w = word.toLowerCase(java.util.Locale.ROOT)
    if (w.length <= 2 || !w.forall(c => c >= 'a' && c <= 'z')) return w
    new Porter(w).run()
  }
}

private final class Porter(word: String) {
  private val b: Array[Char] = word.toCharArray ++ new Array[Char](8)
  private var k: Int = word.length - 1
  private var j: Int = 0

  private def cons(i: Int): Boolean = b(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => if (i == 0) true else !cons(i - 1)
    case _ => true
  }

  /** number of VC sequences in b[0..j] */
  private def m(): Int = {
    var n = 0; var i = 0
    while (i <= j && cons(i)) i += 1
    if (i > j) return n
    i += 1
    while (true) {
      while (i <= j && !cons(i)) i += 1
      if (i > j) return n
      i += 1; n += 1
      while (i <= j && cons(i)) i += 1
      if (i > j) return n
      i += 1
    }
    n
  }

  private def vowelInStem(): Boolean = (0 to j).exists(i => !cons(i))
  private def doublec(i: Int): Boolean = i >= 1 && b(i) == b(i - 1) && cons(i)
  private def cvc(i: Int): Boolean =
    i >= 2 && cons(i) && !cons(i - 1) && cons(i - 2) &&
      b(i) != 'w' && b(i) != 'x' && b(i) != 'y'

  private def ends(s: String): Boolean = {
    val l = s.length
    if (l > k + 1) return false
    var i = 0
    while (i < l) { if (b(k - l + 1 + i) != s.charAt(i)) return false; i += 1 }
    j = k - l
    true
  }

  private def setto(s: String): Unit = {
    var i = 0
    while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
    k = j + s.length
  }

  private def r(s: String): Unit = if (m() > 0) setto(s)

  private def step1ab(): Unit = {
    if (b(k) == 's') {
      if (ends("sses")) k -= 2
      else if (ends("ies")) setto("i")
      else if (b(k - 1) != 's') k -= 1
    }
    if (ends("eed")) { if (m() > 0) k -= 1 }
    else if ((ends("ed") || ends("ing")) && vowelInStem()) {
      k = j
      if (ends("at")) setto("ate")
      else if (ends("bl")) setto("ble")
      else if (ends("iz")) setto("ize")
      else if (doublec(k)) {
        k -= 1
        if (b(k) == 'l' || b(k) == 's' || b(k) == 'z') k += 1
      }
      else if (m() == 1 && cvc(k)) setto("e")
    }
  }

  private def step1c(): Unit =
    if (ends("y") && vowelInStem()) b(k) = 'i'

  private def step2(): Unit = if (k >= 1) (b(k - 1): @annotation.switch) match {
    case 'a' =>
      if (ends("ational")) r("ate")
      else if (ends("tional")) r("tion")
    case 'c' =>
      if (ends("enci")) r("ence")
      else if (ends("anci")) r("ance")
    case 'e' => if (ends("izer")) r("ize")
    case 'l' =>
      if (ends("bli")) r("ble")
      else if (ends("alli")) r("al")
      else if (ends("entli")) r("ent")
      else if (ends("eli")) r("e")
      else if (ends("ousli")) r("ous")
    case 'o' =>
      if (ends("ization")) r("ize")
      else if (ends("ation")) r("ate")
      else if (ends("ator")) r("ate")
    case 's' =>
      if (ends("alism")) r("al")
      else if (ends("iveness")) r("ive")
      else if (ends("fulness")) r("ful")
      else if (ends("ousness")) r("ous")
    case 't' =>
      if (ends("aliti")) r("al")
      else if (ends("iviti")) r("ive")
      else if (ends("biliti")) r("ble")
    case 'g' => if (ends("logi")) r("log")
    case _ =>
  }

  private def step3(): Unit = (b(k): @annotation.switch) match {
    case 'e' =>
      if (ends("icate")) r("ic")
      else if (ends("ative")) r("")
      else if (ends("alize")) r("al")
    case 'i' => if (ends("iciti")) r("ic")
    case 'l' =>
      if (ends("ical")) r("ic")
      else if (ends("ful")) r("")
    case 's' => if (ends("ness")) r("")
    case _ =>
  }

  private def step4(): Unit = {
    if (k < 1) return
    val matched = (b(k - 1): @annotation.switch) match {
      case 'a' => ends("al")
      case 'c' => ends("ance") || ends("ence")
      case 'e' => ends("er")
      case 'i' => ends("ic")
      case 'l' => ends("able") || ends("ible")
      case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
      case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
      case 's' => ends("ism")
      case 't' => ends("ate") || ends("iti")
      case 'u' => ends("ous")
      case 'v' => ends("ive")
      case 'z' => ends("ize")
      case _ => false
    }
    if (matched && m() > 1) k = j
  }

  private def step5(): Unit = {
    j = k
    if (b(k) == 'e') {
      val a = m()
      if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
    }
    if (b(k) == 'l' && doublec(k) && m() > 1) k -= 1
  }

  def run(): String = {
    step1ab(); step1c(); step2(); step3(); step4(); step5()
    new String(b, 0, k + 1)
  }
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

/** bpeEncode(text, merges): byte-pair-encoding tokenization with a FIXED
  * merge table — the encode half of a real subword tokenizer (Sennrich et
  * al. 2016, the GPT-2/LLaMA vocabulary construction; the reference's text
  * tier stops at whitespace/regex token counts, this goes one level
  * deeper to actual tokenizer units, the unit token budgets are priced in).
  *
  * `merges` is a foldable string: comma-separated ordered pairs, each pair
  * "left right" (space-separated), e.g. "t h,th e,i n". Encoding: the text
  * is tokenized to words ([[TokenizerOps.split]] semantics — lowercase,
  * letter/number runs), each word starts as its character symbols, and
  * each merge is applied IN TABLE ORDER over every word, merging
  * left-to-right without overlap (exactly java.lang.String.replace
  * semantics over a space-joined symbol string — what makes the kernel
  * replayable in SQL). Output: the document's symbols in word order.
  *
  * 100 TB shape: a pure projection — the merge table parses ONCE per
  * (expression instance) via the codegen reference object, never per row;
  * training ([[graft.operators.Tokenizer.bpeTrain]]) is a separate
  * sample-bounded step whose output string feeds this literal.
  */
case class BpeEncode(text: Expression, merges: Expression)
  extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = merges
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // the merge table is a query-constant: parse it once at plan time
  private lazy val table: Array[String] = {
    require(merges.foldable, "bpeEncode merges must be a literal")
    val m = merges.eval()
    require(m != null, "bpeEncode merges must not be null")
    BpeOps.parseMerges(m.toString)
  }

  override protected def nullSafeEval(t: Any, m: Any): Any =
    BpeOps.encode(t.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, "java.lang.String[]")
    defineCodeGen(ctx, ev, (t, _) => s"graft.functions.BpeOps.encode($t, $ref)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeEncode =
    copy(text = l, merges = r)
}

/** bpeEncodeBytes(text, merges): BYTE-LEVEL byte-pair encoding with a fixed
  * merge table — the GPT-2/LLaMA-class variant of [[BpeEncode]] (Radford et
  * al. 2019 tokenizer; Sennrich et al. 2016 merges). Where [[BpeEncode]]
  * tokenizes to lowercase letter/number runs (so budgets diverge from real
  * LLM tokenizers on punctuation/whitespace/case-heavy text), this one:
  *
  *  - pre-tokenizes with the whitespace-PREFIX convention: pieces are
  *    matches of `" ?[\p{L}\p{N}]+| ?[^\p{L}\p{N}\s]+"` over the RAW text
  *    (case preserved, punctuation kept; a single U+0020 attaches to the
  *    piece that follows it, so " the" and "the" learn different tokens —
  *    the GPT-2 'Ġ' convention; other whitespace separates and is dropped);
  *  - initial symbols are the piece's UTF-8 BYTES, rendered as two
  *    UPPERCASE hex chars each ("74" = 't', "20" = space, "C3 A9" = 'é') —
  *    every byte sequence is representable, nothing is un-encodable, and
  *    the hex alphabet keeps the kernel exactly replayable in SQL (DuckDB
  *    `hex()` emits the same uppercase pairs);
  *  - merges apply in table order, left-to-right non-overlapping — the
  *    identical [[BpeOps.applyMerge]] kernel as [[BpeEncode]].
  *
  * Output: the document's tokens in piece order, each token a hex string
  * of the bytes it covers (lossless; budgets count these units).
  * 100 TB shape: identical to [[BpeEncode]] — a pure codegen projection,
  * merge table parsed once at plan time.
  */
case class BpeEncodeBytes(text: Expression, merges: Expression)
  extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = merges
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val table: Array[String] = {
    require(merges.foldable, "bpeEncodeBytes merges must be a literal")
    val m = merges.eval()
    require(m != null, "bpeEncodeBytes merges must not be null")
    BpeOps.parseMerges(m.toString)
  }

  override protected def nullSafeEval(t: Any, m: Any): Any =
    BpeOps.encodeBytes(t.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, "java.lang.String[]")
    defineCodeGen(ctx, ev, (t, _) => s"graft.functions.BpeOps.encodeBytes($t, $ref)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeEncodeBytes =
    copy(text = l, merges = r)
}

/** Static kernels behind [[BpeEncode]] (static forwarders for codegen). */
object BpeOps {

  /** [[BpeEncodeBytes]]'s pre-tokenizer: optional single leading space +
    * a letter/number run, or optional single leading space + a
    * punctuation/symbol run. Compiled once per JVM.
    */
  private val piecePattern = java.util.regex.Pattern.compile(
    " ?[\\p{L}\\p{N}]+| ?[^\\p{L}\\p{N}\\s]+")

  private val HEX = "0123456789ABCDEF".toCharArray

  /** Byte-level encode: pieces → uppercase-hex byte symbols → merges. */
  def encodeBytes(s: UTF8String, merges: Array[String]): GenericArrayData = {
    val matcher = piecePattern.matcher(s.toString)
    val out = new java.util.ArrayList[AnyRef]
    while (matcher.find()) {
      val bytes = matcher.group().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var syms = new java.util.ArrayList[String](bytes.length)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xFF
        syms.add(new String(Array(HEX(b >>> 4), HEX(b & 0xF))))
        i += 1
      }
      var m = 0
      while (m < merges.length) {
        syms = applyMerge(syms, merges(m), merges(m + 1))
        m += 2
      }
      var j = 0
      while (j < syms.size) { out.add(UTF8String.fromString(syms.get(j))); j += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  /** "t h,th e" → flattened [left0, right0, left1, right1, …]. */
  def parseMerges(spec: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    spec.split(',').foreach { p =>
      val t = p.trim
      if (t.nonEmpty) {
        val sp = t.indexOf(' ')
        require(sp > 0 && sp < t.length - 1, s"malformed merge pair '$t' (want 'left right')")
        out += t.substring(0, sp)
        out += t.substring(sp + 1)
      }
    }
    out.toArray
  }

  /** One merge pass over a symbol list: left-to-right, non-overlapping
    * (String.replace semantics over the space-joined form).
    */
  private def applyMerge(syms: java.util.ArrayList[String], l: String, r: String)
      : java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String](syms.size)
    var i = 0
    val n = syms.size
    while (i < n) {
      if (i + 1 < n && syms.get(i) == l && syms.get(i + 1) == r) {
        out.add(l + r); i += 2
      } else { out.add(syms.get(i)); i += 1 }
    }
    out
  }

  def encode(s: UTF8String, merges: Array[String]): GenericArrayData = {
    val words = TokenizerOps.split(s)
    val out = new java.util.ArrayList[AnyRef]
    var w = 0
    while (w < words.numElements()) {
      val word = words.getUTF8String(w).toString
      var syms = new java.util.ArrayList[String](word.length)
      // split to code points (symbols start as single characters)
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val len = Character.charCount(cp)
        syms.add(word.substring(i, i + len))
        i += len
      }
      var m = 0
      while (m < merges.length) {
        syms = applyMerge(syms, merges(m), merges(m + 1))
        m += 2
      }
      var j = 0
      while (j < syms.size) { out.add(UTF8String.fromString(syms.get(j))); j += 1 }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}
