package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Text-analysis operators for training-data pipelines (builder brief):
  * language ID, quality scoring, token counting, fingerprinting. All are
  * pure column expressions — fully codegen'd, no UDFs, no shuffles beyond
  * whatever aggregation the caller adds.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic
    * (single source of truth lives beside the fused scan:
    * [[graft.functions.TextStatsOps.stopwords]]).
    */
  val stopwords: Map[String, Seq[String]] = graft.functions.TextStatsOps.stopwords

  /** The fused one-scan counts struct ([[graft.functions.TextStats]]) that
    * the quality/language operators below derive their ratios from.
    */
  def textStats(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.TextStats(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  private def langHit(st: Column, lang: String): Column =
    st.getField("hits").getItem(graft.functions.TextStatsOps.langs.indexOf(lang))

  /** Fraction of tokens found in `words` (deterministic double division). */
  def stopwordRatio(tokens: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(tokens, t => array_contains(set, t))).cast("double") /
      greatest(size(tokens), lit(1)).cast("double")
  }

  /** Heuristic language ID: the language whose stopword list matches the
    * largest token fraction; "und" (undetermined) if nothing beats `floor`.
    * Runs on the fused one-scan counts (r11) — same scores, same argmax.
    */
  def languageId(text: Column, floor: Double = 0.02): Column =
    languageIdFromStats(textStats(text), floor)

  /** languageId over a precomputed [[textStats]] struct — identical score
    * arithmetic to [[languageIdFromTokens]] (hit count / max(n_tokens, 1)),
    * deterministic tiebreak unchanged.
    */
  def languageIdFromStats(st: Column, floor: Double = 0.02): Column = {
    val nTok = greatest(st.getField("n_tokens"), lit(1)).cast("double")
    val scored = stopwords.keys.toSeq.sorted.map { lang =>
      struct((langHit(st, lang).cast("double") / nTok).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") >= floor, best.getField("lang")).otherwise(lit("und"))
  }

  /** languageId over a precomputed token column — use this form when the
    * caller already materialized tokens (each score references the tokens;
    * passing `tokenize(text)` directly re-tokenizes once per language).
    */
  def languageIdFromTokens(toks: Column, floor: Double = 0.02): Column = {
    // build struct array (score, lang), take max — deterministic tiebreak by lang desc then flipped
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordRatio(toks, words).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") >= floor, best.getField("lang")).otherwise(lit("und"))
  }

  def tokenCount(text: Column): Column = size(tokenize(text))

  /** BPE-ish subword count estimate: words + long words counted extra
    * (a whitespace+regex stand-in for a real tokenizer, as briefed).
    */
  def subwordCountEstimate(text: Column): Column = {
    val toks = tokenize(text)
    size(toks) + size(filter(toks, t => length(t) > 6))
  }

  /** Quality features: length, token stats, punctuation/digit/upper ratios,
    * stopword ratio, repetition (1 - distinct/total tokens).
    *
    * r11: derived from the FUSED one-scan counts ([[textStats]]) — the
    * per-row passes (two regex scans + six HOF filters + array_distinct)
    * collapse into one codegen'd scan; every ratio keeps the exact same
    * integer operands and division shapes, so results are bit-identical
    * (q70's oracle is the lock). The stats struct materializes ONCE into a
    * multi-use column (a multi-referenced non-cheap alias survives
    * CollapseProject as one evaluation).
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame =
    qualityFeaturesFromStats(
      df.withColumn("__st", textStats(col(textCol))), col("__st"))
      .drop("__st")

  /** Feature ratios over a precomputed [[textStats]] struct. */
  def qualityFeaturesFromStats(df: DataFrame, st: Column): DataFrame = {
    val nTok = greatest(st.getField("n_tokens"), lit(1)).cast("double")
    val nCh = greatest(st.getField("n_chars"), lit(1)).cast("double")
    df.withColumn("n_chars_q", st.getField("n_chars"))
      .withColumn("n_tokens", st.getField("n_tokens"))
      .withColumn("mean_token_len",
        st.getField("tok_len_sum").cast("double") / nTok)
      .withColumn("punct_ratio", st.getField("punct_cnt").cast("double") / nCh)
      .withColumn("digit_ratio", st.getField("digit_cnt").cast("double") / nCh)
      .withColumn("stopword_ratio", langHit(st, "en").cast("double") / nTok)
      .withColumn("repetition_ratio",
        lit(1.0) - st.getField("distinct_tokens").cast("double") / nTok)
  }

  /** Feature computation over a precomputed token column. */
  def qualityFeaturesFromTokens(df: DataFrame, textCol: String, toks: Column): DataFrame = {
    val t = col(textCol)
    val nTok = greatest(size(toks), lit(1)).cast("double")
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_tokens", size(toks))
      .withColumn("mean_token_len",
        aggregate(toks, lit(0L), (a, x) => a + length(x)).cast("double") / nTok)
      .withColumn("punct_ratio",
        (length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))).cast("double") /
          greatest(length(t), lit(1)).cast("double"))
      .withColumn("digit_ratio",
        (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("double") /
          greatest(length(t), lit(1)).cast("double"))
      .withColumn("stopword_ratio", stopwordRatio(toks, stopwords("en")))
      .withColumn("repetition_ratio",
        lit(1.0) - size(array_distinct(toks)).cast("double") / nTok)
  }

  private def scoreMix: Column =
    least(lit(1.0), greatest(lit(0.0),
      lit(0.3) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - col("repetition_ratio")) +
        lit(0.2) * least(col("stopword_ratio") * 5.0, lit(1.0)) +
        lit(0.2) * (lit(1.0) - col("punct_ratio"))))

  /** Composite [0,1] quality score from the features (simple monotone mix). */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    qualityFeatures(df, textCol).withColumn("quality_score", scoreMix)

  /** qualityScore over a precomputed token column (see qualityFeatures). */
  def qualityScoreFromTokens(df: DataFrame, textCol: String, toks: Column): DataFrame =
    qualityFeaturesFromTokens(df, textCol, toks).withColumn("quality_score", scoreMix)

  /** qualityScore over a precomputed [[textStats]] struct (fused path). */
  def qualityScoreFromStats(df: DataFrame, st: Column): DataFrame =
    qualityFeaturesFromStats(df, st).withColumn("quality_score", scoreMix)

  /** PII patterns for the scrub step every C4/Dolma-class curation
    * pipeline runs before training. Conservative, and valid in BOTH Java
    * regex and RE2 (no backreferences, no lookarounds) so a DuckDB oracle
    * replicates them verbatim. Order matters for [[scrubPii]]: email
    * before the numeric patterns, SSN before phone (disjoint shapes, but
    * scrubbing must be deterministic).
    */
  val piiPatterns: Seq[(String, String, String)] = Seq( // (name, regex, token)
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Per-category PII match counts (codegen'd regexp scans, no UDF). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (name, re, _) =>
      name -> size(regexp_extract_all(text, lit(re), lit(0))) }

  /** Redact all PII categories with typed placeholder tokens. */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, re, tok)) =>
      regexp_replace(c, re, tok) }

  /** Gopher-style repetition features (Rae et al. 2021 §A1.1, the standard
    * repetitious-document filters): over sentence units — duplicate
    * fraction by count and by character mass — and over token 2-grams —
    * the top 2-gram's occurrence count. Pure higher-order-function
    * compositions: codegen'd, no explode, no shuffle; cost is O(distinct
    * units x units) per document, fine for documents (vs. the corpus-level
    * dedup operators which handle CROSS-document repetition).
    */
  def repetitionFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val dfs = df
      .withColumn("__sents", filter(split(t, "\\. "), x => x =!= ""))
      .withColumn("__toks", tokenize(t))
    val sents = col("__sents")
    val toks = col("__toks")
    val nS = greatest(size(sents), lit(1)).cast("double")
    val dupChar = aggregate(array_distinct(sents), lit(0L), (acc, d) =>
      acc + (size(filter(sents, x => x === d)) - 1).cast("long") * length(d))
    val totChar = greatest(
      aggregate(sents, lit(0L), (acc, x) => acc + length(x)), lit(1L))
    // bigrams materialize as a column: the top_bigram_count lambda below
    // references the gram array per element, and a lambda-captured
    // EXPRESSION is re-evaluated per element (O(n²) concat/element_at per
    // doc) while a lambda-captured ATTRIBUTE is a plain read
    // guard: sequence(1, size-1) DESCENDS for size < 2 ([1,0,…]), so the
    // element_at probes must not run at all on 0/1-token docs
    val dfg = dfs.withColumn("__grams",
      when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>")))
    val grams = col("__grams")
    dfg
      .withColumn("dup_sent_frac",
        (size(sents) - size(array_distinct(sents))).cast("double") / nS)
      .withColumn("dup_sent_char_frac",
        dupChar.cast("double") / totChar.cast("double"))
      .withColumn("top_bigram_count",
        when(size(toks) >= 2,
          array_max(transform(array_distinct(grams),
            g => size(filter(grams, x => x === g)))))
          .otherwise(lit(0)))
      .drop("__sents", "__toks", "__grams")
  }

  /** Winnowing-style rolling-hash fingerprint (see TextFingerprint). */
  def fingerprint(text: Column, window: Int = 8): Column =
    call_function("fingerprint", text, lit(window))

  /** Portable winnowing fingerprint set: md5-hex hashes of the character
    * k-grams, lexicographic minimum per window of `w` consecutive k-grams,
    * deduplicated. Selecting by hex-string order makes the winnowing choice
    * reproducible in any engine with md5() — unlike [[fingerprint]]'s custom
    * rolling hash — so the semantics are oracle-checkable end to end (q104).
    * O(n·w) per document; [[fingerprint]] is the O(n) production path.
    * Returns an empty array for texts shorter than k + w − 1 chars (no full
    * window exists).
    */
  def winnowMd5(text: Column, k: Int = 8, w: Int = 4): Column = {
    val kgramHashes = transform(
      sequence(lit(1), length(text) - (k - 1)),
      i => md5(text.substr(i, lit(k)).cast("binary")))
    // window minima via the zip-of-slices idiom (see GraftFunctions.shingles):
    // an expression referenced from inside a higher-order-function lambda is
    // re-evaluated PER ELEMENT, so the naive transform(sequence(...),
    // i => array_min(slice(kgramHashes, i, w))) recomputes the ENTIRE md5
    // k-gram array once per window — O(n²) md5s per document (found as a
    // single-task stall at sf1). Slicing w times up front evaluates the
    // k-gram array a constant number of times; the lambda touches only its
    // zipped row.
    val m = greatest(size(kgramHashes) - (w - 1), lit(0))
    val parts = (0 until w).map(j =>
      slice(kgramHashes, lit(j + 1), m).as(s"w$j"))
    val windowMins = transform(arrays_zip(parts: _*),
      x => least((0 until w).map(j => x.getField(s"w$j")): _*))
    when(length(text) >= k + w - 1, array_distinct(windowMins))
      .otherwise(array().cast("array<string>"))
  }

  // ------------------------------------------------------------------
  // CCNet-style LM perplexity scoring (the quality filter large pipelines
  // run besides heuristics: score documents by how "expected" their tokens
  // are under a language model trained on a trusted corpus, then keep the
  // low-perplexity head / cut the gibberish tail).
  // ------------------------------------------------------------------

  /** Train a bounded unigram LM: the `vocabSize` most frequent tokens of
    * `corpus` with their counts — ties broken by token so the vocabulary is
    * deterministic and the whole model replays in SQL. Returns
    * (token, cnt); feed to [[lmScore]].
    *
    * Scale: one map-side-combined token count (the only shuffle), then a
    * top-`vocabSize` cut — `vocabSize` BOUNDS the model regardless of
    * corpus size, which is what makes the scoring side broadcastable at
    * 100 TB (CCNet's KenLM is similarly a fixed artifact, not corpus-sized).
    */
  def lmTrain(corpus: DataFrame, textCol: String,
      vocabSize: Int = 65536): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    corpus
      .select(explode(tokenize(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      // ordered limit plans as TakeOrderedAndProject: each partition keeps
      // its local top-vocabSize, the driver merges K-per-partition — no
      // single-partition sort over the (possibly billion-row) distinct
      // token table
      .orderBy(col("cnt").desc, col("token"))
      .limit(vocabSize)
  }

  /** Score each document under a trained unigram LM with add-alpha
    * smoothing: p(w) = (cnt(w) + alpha) / (N + alpha·(V+1)), OOV tokens get
    * the cnt=0 mass, avg_logprob = mean ln p over the document's tokens,
    * perplexity = exp(−avg_logprob). Returns
    * (id, n_tokens, oov_ratio, avg_logprob, perplexity); empty documents
    * get null scores (no tokens to average).
    *
    * Scale: N and V are two driver-sized scalars off the bounded model; the
    * model BROADCASTS into the token join (it is vocab-bounded by
    * construction); the only exchange is the per-id mean — map-side
    * combined. The corpus streams through once.
    */
  def lmScore(docs: DataFrame, lm: DataFrame, textCol: String, idCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    // r21 (perf): the model materializes to the DRIVER once and every
    // consumer builds from that LocalRelation. The old shape executed the
    // whole train pipeline TWICE per run — once under lm.agg(...).head()
    // for the N/V scalars and once more to build the broadcast join side
    // (q170's bench plan carried 7 corpus scans for this reason). The
    // model is vocab-bounded by construction — the same bounded-metadata
    // contract as ivfTrain's driver-side centroid table — and N, V, and
    // the broadcast relation carry the identical rows, so scores are
    // unchanged.
    val spark = docs.sparkSession
    import spark.implicits._
    val model = lm.select(col("token").cast("string"), col("cnt").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(model.nonEmpty,
      "lmScore: empty language model (lmTrain over an empty/token-less corpus?)")
    val nTotal = model.iterator.map(_._2).sum
    val vSize = model.size.toLong
    val denom = nTotal + alpha * (vSize + 1)
    val lmLocal = model.toDF("token", "cnt")
    docs.select(col(idCol).as("id"),
        explode_outer(tokenize(col(textCol))).as("token"))
      .join(broadcast(lmLocal), Seq("token"), "left")
      .groupBy("id").agg(
        count(col("token")).as("n_tokens"),
        // token-less documents get null here too (the documented contract:
        // empty docs have NO scores, not "0% OOV"); explicit when() rather
        // than 0/0 so the semantics hold under ANSI mode as well
        when(count(col("token")) > 0,
          count(when(col("token").isNotNull && col("cnt").isNull, 1)) /
            count(col("token")).cast("double")).as("oov_ratio"),
        // the when() guard keeps explode_outer's null row (empty document)
        // out of the mean — avg skips nulls, so empty docs score null
        avg(when(col("token").isNotNull,
          log((coalesce(col("cnt"), lit(0L)) + alpha) / denom))).as("avg_logprob"))
      .withColumn("perplexity", exp(-col("avg_logprob")))
  }

  /** BIGRAM language model (r14 — the n-gram regime CCNet's perplexity
    * filter actually runs in; [[lmTrain]] is the order-1 base). One model
    * frame (w1, w2, cnt): unigram rows carry w2 = null (top `vocabSize` by
    * count), bigram rows the top `bigramSize` adjacent pairs — BOTH cuts
    * ride TakeOrderedAndProject (partition-local top-K, driver merge), so
    * the model is bounded by construction and always broadcastable.
    * Deterministic tie-breaks: count desc, then token(s) asc.
    */
  def lmTrain2(corpus: DataFrame, textCol: String, vocabSize: Int = 65536,
      bigramSize: Int = 262144): DataFrame = {
    require(vocabSize > 0 && bigramSize > 0)
    val uni = lmTrain(corpus, textCol, vocabSize)
      .select(col("token").as("w1"), lit(null).cast("string").as("w2"), col("cnt"))
    // adjacent pairs built per row from array slices — zero shuffle before
    // the one count exchange
    val ts = tokenize(col(textCol))
    val bi = corpus
      .select(ts.as("ts"))
      .select(col("ts"), posexplode(col("ts")).as(Seq("pos", "w2")))
      .filter(col("pos") > 0)
      .select(element_at(col("ts"), col("pos")).as("w1"), col("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(bigramSize)
    uni.unionByName(bi)
  }

  /** Score documents under a [[lmTrain2]] bigram model: token 0 (and any
    * token whose predecessor is out-of-vocabulary) scores by the smoothed
    * UNIGRAM p(w) = (cnt(w)+α)/(N+α·(V+1)); every other token by the
    * smoothed conditional p(w|v) = (cnt(v,w)+α)/(cnt(v)+α·(V+1)) — the
    * standard add-alpha bigram with unigram backoff at vocabulary edges.
    * Output schema and empty-doc contract match [[lmScore]].
    *
    * Scale: the model is bounded (V+B rows) and broadcasts into all three
    * joins; pair construction is per-row (posexplode + element_at — no
    * window, no self-join); the only exchange is the per-id mean.
    */
  def lmScore2(docs: DataFrame, lm2: DataFrame, textCol: String, idCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    // r21 (perf): same driver-side materialization as [[lmScore]], with a
    // bigger payoff — the old shape executed the full lmTrain2 pipeline
    // (unigram top-K + bigram top-K, each a corpus tokenize) FOUR times
    // per run: once under the N/V head() and once per broadcast build
    // (three joins). The model is (V+B)-bounded by construction; the three
    // joins now build from LocalRelations carrying the identical rows.
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = lm2.select(col("w1").cast("string"), col("w2").cast("string"),
      col("cnt").cast("long")).collect()
    val uniLocal = rows.filter(_.isNullAt(1))
      .map(r => (r.getString(0), r.getLong(2))).toSeq
    val biLocal = rows.filterNot(_.isNullAt(1))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    require(uniLocal.nonEmpty,
      "lmScore2: empty language model (no unigram rows)")
    val uniModel = uniLocal.toDF("token", "cnt")
    val biModel = biLocal.toDF("w1", "w2", "bcnt")
    val nTotal = uniLocal.iterator.map(_._2).sum
    val vSize = uniLocal.size.toLong
    val denomU = nTotal + alpha * (vSize + 1)
    val condAdd = alpha * (vSize + 1)

    val base = docs
      .select(col(idCol).as("id"), tokenize(col(textCol)).as("ts"))
      .select(col("id"), col("ts"), posexplode_outer(col("ts")).as(Seq("pos", "cur")))
      .withColumn("prev", when(col("pos") > 0, element_at(col("ts"), col("pos"))))
      .drop("ts")
    val scored = base
      .join(broadcast(uniModel.select(col("token").as("cur"), col("cnt").as("c_cur"))),
        Seq("cur"), "left")
      .join(broadcast(uniModel.select(col("token").as("prev"), col("cnt").as("c_prev"))),
        Seq("prev"), "left")
      .join(broadcast(biModel.select(col("w1").as("prev"), col("w2").as("cur"), col("bcnt"))),
        Seq("prev", "cur"), "left")
      .withColumn("logp",
        when(col("cur").isNull, lit(null))
          .when(col("prev").isNull || col("c_prev").isNull,
            log((coalesce(col("c_cur"), lit(0L)) + alpha) / denomU))
          .otherwise(log((coalesce(col("bcnt"), lit(0L)) + alpha) /
            (col("c_prev") + condAdd))))
    scored.groupBy("id").agg(
        count(col("cur")).as("n_tokens"),
        when(count(col("cur")) > 0,
          count(when(col("cur").isNotNull && col("c_cur").isNull, 1)) /
            count(col("cur")).cast("double")).as("oov_ratio"),
        avg(col("logp")).as("avg_logprob"))
      .withColumn("perplexity", exp(-col("avg_logprob")))
  }

  /** Overlapping fixed-window document chunking (r16) — the window step a
    * RAG/pretraining corpus pipeline runs before embedding or packing.
    * Window i covers characters [i*stride, i*stride + chunkChars) with
    * stride = chunkChars - overlapChars; the last window may be shorter;
    * empty/null documents emit no chunks.
    *
    * Scale shape: a pure projection + explode — zero shuffles, fully
    * codegen'd, at most ceil(len/stride) rows per document. The reference
    * has no chunking operator (it ships text to pandas for this); windowed
    * substrings over a corpus ARE expressible as columns, so that is the
    * whole implementation.
    */
  def chunkFixed(df: DataFrame, textCol: String, idCol: String,
      chunkChars: Int, overlapChars: Int = 0): DataFrame = {
    require(chunkChars > 0, "chunkChars must be positive")
    require(overlapChars >= 0 && overlapChars < chunkChars,
      "overlapChars must be in [0, chunkChars)")
    val stride = chunkChars - overlapChars
    val len = length(col(textCol))
    val n = when(len.isNull || len === 0, lit(0)).otherwise(
      lit(1) + greatest(lit(0),
        ceil((len - lit(chunkChars)).cast("double") / lit(stride)).cast("int")))
    val idxs = when(n > 0, sequence(lit(0), n - 1))
      .otherwise(lit(Array.empty[Int]))
    df.select(col(idCol), col(textCol), explode(idxs).as("chunk_ix"))
      .select(col(idCol), col("chunk_ix"),
        expr(s"substring(`$textCol`, chunk_ix * $stride + 1, $chunkChars)")
          .as("chunk"))
  }

  /** Sentence-aware greedy chunking (r16): split at sentence boundaries
    * ([.!?] + whitespace), then pack consecutive sentences into chunks of
    * at most `maxChars` characters (joined with one space; a single
    * sentence longer than the budget becomes its own chunk — sentences are
    * never split). The boundary is marked with \u0001 and split on it
    * instead of a lookbehind so the exact same regex replays on RE2-based
    * engines (the DuckDB oracle).
    *
    * Scale shape: one aggregate() fold over the per-document sentence
    * array — a pure projection (no shuffle, no UDF); the greedy state
    * (packed chunks + current buffer) lives inside the higher-order
    * expression.
    */
  def chunkSentences(df: DataFrame, textCol: String, idCol: String,
      maxChars: Int): DataFrame = {
    require(maxChars > 0, "maxChars must be positive")
    val marked = regexp_replace(col(textCol), "([.!?])\\s+", "$1\u0001")
    val sents = filter(split(marked, "\u0001"), s => length(s) > 0)
    val zero = struct(lit(Array.empty[String]).as("chunks"), lit("").as("cur"))
    val packed = aggregate(sents, zero,
      (acc: Column, s: Column) => {
        val cur = acc.getField("cur")
        val chunks = acc.getField("chunks")
        val fits = length(cur) + lit(1) + length(s) <= lit(maxChars)
        when(length(cur) === 0, struct(chunks.as("chunks"), s.as("cur")))
          .when(fits,
            struct(chunks.as("chunks"), concat(cur, lit(" "), s).as("cur")))
          .otherwise(
            struct(array_append(chunks, cur).as("chunks"), s.as("cur")))
      },
      (acc: Column) => when(length(acc.getField("cur")) > 0,
          array_append(acc.getField("chunks"), acc.getField("cur")))
        .otherwise(acc.getField("chunks")))
    df.select(col(idCol), posexplode(packed).as(Seq("chunk_ix", "chunk")))
  }

  /** Corpus-level boilerplate removal (r17) — the CCNet/RefinedWeb line
    * dedup step: a line whose trimmed form appears in at least `minDocs`
    * DISTINCT documents (headers, footers, nav chrome, cookie banners) is
    * dropped from EVERY document; remaining lines are reassembled in their
    * original order. Blank lines never count as boilerplate (they are
    * structure, not content) and are kept.
    *
    * Scale shape (r21 — guide §2.4 remove shuffles outright): explode to
    * lines (outer, so every document row survives the regroup), ONE
    * count-distinct shuffle keyed on the trimmed line, a MARKING left join
    * back (line-keyed — the boilerplate set is the join's build side and is
    * corpus-frequency bounded; boilerplate lines are dropped inside the
    * regroup's conditional collect, the [[graft.operators.Dedup.dedupSpans]]
    * device, rather than by a separate anti-join pass), and one regroup by
    * document id. When the frame is just (id, text) — the common corpus
    * shape — the regroup IS the result and the old corpus-sized
    * rejoin-with-the-input (a second scan plus a join exchange) is gone;
    * wider frames still join the rebuilt text back so the payload columns
    * never ride the line-level shuffles. No driver collection; every stage
    * is key-partitioned. The reference has no such operator (its pipelines
    * run this step in pandas).
    *
    * Contract note for the (id, text) shape: `idCol` is treated as the
    * document key — duplicate ids collapse to one output row (their lines
    * were already pooled by the regroup; the old shape emitted that same
    * pooled text once per duplicate row).
    */
  def removeBoilerplate(df: DataFrame, textCol: String, idCol: String,
      minDocs: Int): DataFrame = {
    require(minDocs >= 2, "minDocs must be at least 2")
    val others = df.columns.filter(c => c != textCol)
    val lines = df.select(col(idCol),
      posexplode_outer(split(col(textCol), "\n")).as(Seq("__ix", "__line")))
    val boiler = lines
      .filter(length(trim(col("__line"))) > 0)
      .groupBy(trim(col("__line")).as("__key"))
      .agg(countDistinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select("__key")
    // boiler keys are unique (group keys) and non-blank, so the left join
    // preserves line multiplicity; a null match column marks a kept line
    // (blank and null lines never match — they are structure, kept)
    val keep = col("__key").isNull
    val rebuilt = lines
      .join(boiler, trim(lines("__line")) === boiler("__key"), "left")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(when(keep, struct(col("__ix"), col("__line"))))),
          x => x.getField("__line")), "\n").as(textCol))
    // docs whose every line was boilerplate keep an empty text, not a NULL
    // (array_join over an empty/all-null collect is ""); final column order
    // is the INPUT's (ADVICE r17)
    if (others.sameElements(Array(idCol)))
      // a null id never matched the old rejoin and came back as "" — keep
      // that exact behavior without the join
      rebuilt.withColumn(textCol,
          when(col(idCol).isNull, lit("")).otherwise(col(textCol)))
        .select(df.columns.map(col): _*)
    else
      df.select(others.map(col): _*)
        .join(rebuilt, Seq(idCol), "left")
        .na.fill(Map(textCol -> ""))
        .select(df.columns.map(col): _*)
  }
}
