package graft.ds

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lazy DataFrame facade — the Spark-native counterpart of the reference's
  * DataStore pandas surface (reference: datastore/core.py:72 lazy op chain,
  * datastore/pandas_compat.py method surface; SURVEY §2.B/D/F/G/I and §7.3).
  *
  * Deliberately a THIN builder over `Dataset`: every method returns a new
  * GraftFrame wrapping a transformed DataFrame, so the "lazy op chain" IS the
  * Catalyst logical plan and all of the reference's planner machinery
  * (segmentation, pushdown decisions, schema tracking — query_planner.py)
  * collapses into Catalyst. Row-order semantics follow the reference's
  * PERFORMANCE mode (datastore/config.py:268-285): unordered relational
  * results, order-dependent ops take explicit sort columns (SURVEY §1.5).
  */
final case class GraftFrame(df: DataFrame) {
  import GraftFrame._

  // ---- projection / mutation (pandas_compat select/assign/rename/drop) ----

  def select(cols: String*): GraftFrame = GraftFrame(df.select(cols.map(col): _*))
  def selectExpr(exprs: String*): GraftFrame = GraftFrame(df.selectExpr(exprs: _*))

  /** df.assign(x = expr, …) — computed columns; Catalyst resolves dependency
    * order (reference splits SQL segments for this, lazy_ops.py:153).
    */
  def assign(cols: (String, Column)*): GraftFrame =
    GraftFrame(cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) })

  def drop(cols: String*): GraftFrame = GraftFrame(df.drop(cols: _*))

  def rename(mapping: (String, String)*): GraftFrame =
    GraftFrame(df.withColumnsRenamed(mapping.toMap))

  def addPrefix(p: String): GraftFrame =
    GraftFrame(df.toDF(df.columns.map(p + _).toIndexedSeq: _*))
  def addSuffix(s: String): GraftFrame =
    GraftFrame(df.toDF(df.columns.map(_ + s).toIndexedSeq: _*))

  /** pandas df.replace({col: {old: new}}) — exact value substitution as a
    * chained CASE (reference lazy_ops.py:543 value-replace): unmatched
    * values pass through unchanged.
    */
  def replaceValues(column: String, mapping: Map[Any, Any]): GraftFrame =
    GraftFrame(df.withColumn(column,
      mapping.foldLeft(col(column)) { case (acc, (from, to)) =>
        when(col(column) === lit(from), lit(to)).otherwise(acc)
      }))

  /** astype: per-column casts (reference lazy_ops.py:720 LazyAsType). */
  def astype(casts: (String, String)*): GraftFrame =
    GraftFrame(casts.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) })

  // ---- filtering (conditions.py condition tree → Column) ----

  def filter(cond: Column): GraftFrame = GraftFrame(df.filter(cond))
  /** pandas df.query("a > 5 and b < 3") — Spark parses SQL natively. */
  def query(sqlCond: String): GraftFrame = GraftFrame(df.filter(sqlCond))
  def where(cond: Column): GraftFrame = filter(cond)

  /** where(cond, other): pandas value-replacement (reference WhereMaskCaseExpr,
    * sql_executor.py:47-225) — keep value where cond holds, else `other`.
    */
  def whereValue(cond: Column, other: Column, cols: Seq[String]): GraftFrame =
    GraftFrame(cols.foldLeft(df)((d, c) =>
      d.withColumn(c, when(cond, col(c)).otherwise(other))))
  def mask(cond: Column, other: Column, cols: Seq[String]): GraftFrame =
    whereValue(!cond, other, cols)

  /** pandas clip on one column (reference lazy_result.py:811 /
    * pandas_compat.py:863) — either bound optional, NULLs preserved.
    */
  def clip(c: String, lower: Option[Any] = None,
      upper: Option[Any] = None): GraftFrame = {
    import graft.ds.syntax._
    GraftFrame(df.withColumn(c, col(c).clip(lower, upper)))
  }

  /** pandas between_time — time-of-day filter on a timestamp column
    * (reference pandas_compat.py:2756). `start > end` selects the
    * wrap-around interval crossing midnight, exactly as pandas does;
    * inclusive = both/neither/left/right. Times accept HH:mm or HH:mm:ss.
    */
  def betweenTime(tsCol: String, start: String, end: String,
      inclusive: String = "both"): GraftFrame = {
    // Compare times at MICROSECOND precision (r20, surfaced by the sf0.1
    // full-oracle run): "HH:mm:ss" formatting truncated sub-seconds, so a
    // ts of 11:59:59.742 passed an inclusive 11:59:59 upper bound — pandas
    // between_time (and the DuckDB oracle's CAST(ts AS TIME)) exclude it.
    // Fixed-width "HH:mm:ss.SSSSSS" strings order exactly like the times.
    def norm(t: String): String = {
      val withSec = if (t.count(_ == ':') == 1) t + ":00" else t
      if (withSec.contains('.'))
        withSec.padTo(withSec.indexOf('.') + 7, '0')
      else withSec + ".000000"
    }
    val (s0, e0) = (norm(start), norm(end))
    val t = date_format(col(tsCol), "HH:mm:ss.SSSSSS")
    val (incLo, incHi) = inclusive match {
      case "both" => (true, true)
      case "neither" => (false, false)
      case "left" => (true, false)
      case "right" => (false, true)
      case other => throw new IllegalArgumentException(
        s"betweenTime: inclusive must be both/neither/left/right (got '$other')")
    }
    val lo = if (incLo) t >= lit(s0) else t > lit(s0)
    val hi = if (incHi) t <= lit(e0) else t < lit(e0)
    GraftFrame(df.filter(if (s0 <= e0) lo && hi else lo || hi))
  }

  // ---- null handling ----

  def fillna(value: Any, cols: Seq[String] = Nil): GraftFrame = {
    val target = if (cols.isEmpty) df.columns.toSeq else cols
    GraftFrame(value match {
      case d: Double => df.na.fill(d, target)
      case l: Long => df.na.fill(l, target)
      case i: Int => df.na.fill(i.toLong, target)
      case s: String => df.na.fill(s, target)
      case other => df.na.fill(other.toString, target)
    })
  }
  def dropna(subset: Seq[String] = Nil, how: String = "any"): GraftFrame =
    GraftFrame(if (subset.isEmpty) df.na.drop(how) else df.na.drop(how, subset))

  // ---- sorting / slicing (SURVEY §2.F) ----

  def sortValues(by: Seq[String], ascending: Seq[Boolean] = Nil): GraftFrame = {
    val asc = if (ascending.isEmpty) Seq.fill(by.size)(true) else ascending
    GraftFrame(df.orderBy(by.zip(asc).map { case (c, a) => if (a) col(c).asc else col(c).desc }: _*))
  }
  def head(n: Int): GraftFrame = GraftFrame(df.limit(n))
  def limit(n: Int): GraftFrame = head(n)
  def offset(n: Int): GraftFrame = GraftFrame(df.offset(n))
  def sample(fraction: Double, seed: Long = 42L): GraftFrame =
    GraftFrame(df.sample(fraction, seed))

  def nlargest(n: Int, by: Seq[String]): GraftFrame =
    GraftFrame(df.orderBy(by.map(col(_).desc): _*).limit(n))
  def nsmallest(n: Int, by: Seq[String]): GraftFrame =
    GraftFrame(df.orderBy(by.map(col(_).asc): _*).limit(n))

  // ---- dedup / set ops (SURVEY §2.G) ----

  def distinct(): GraftFrame = GraftFrame(df.distinct())

  /** drop_duplicates(subset, keep='first' by explicit order column) —
    * order-based keep needs an explicit ordering (PERFORMANCE-mode contract).
    */
  def dropDuplicates(subset: Seq[String], keepFirstBy: Seq[String] = Nil): GraftFrame =
    if (keepFirstBy.isEmpty) GraftFrame(df.dropDuplicates(subset))
    else {
      val w = Window.partitionBy(subset.map(col): _*).orderBy(keepFirstBy.map(col): _*)
      GraftFrame(df.withColumn("__gf_rn", row_number().over(w))
        .filter(col("__gf_rn") === 1).drop("__gf_rn"))
    }

  def union(other: GraftFrame, all: Boolean = false): GraftFrame = {
    val u = df.unionByName(other.df, allowMissingColumns = true)
    GraftFrame(if (all) u else u.distinct())
  }
  def intersect(other: GraftFrame): GraftFrame = GraftFrame(df.intersect(other.df))
  def except(other: GraftFrame): GraftFrame = GraftFrame(df.except(other.df))

  // ---- joins (SURVEY §2.C; pandas merge suffix semantics) ----

  /** pandas merge: overlapping non-key columns get suffixes (reference gate
    * pandas_compat.py:1680-1696 falls back to pandas for this; here it is
    * plain column renaming before a native join).
    */
  def merge(
      right: GraftFrame,
      on: Seq[String],
      how: String = "inner",
      suffixes: (String, String) = ("_x", "_y")): GraftFrame = {
    val overlap = (df.columns.toSet & right.df.columns.toSet) -- on.toSet
    val l = overlap.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + suffixes._1))
    val r = overlap.foldLeft(right.df)((d, c) => d.withColumnRenamed(c, c + suffixes._2))
    GraftFrame(l.join(r, on, how))
  }

  def join(right: GraftFrame, cond: Column, how: String = "inner"): GraftFrame =
    GraftFrame(df.join(right.df, cond, how))

  /** merge_ordered (reference pandas_api.py adjacent to merge_asof; SURVEY
    * §2.C: union + sort + window ffill): interleave both frames by `keys` +
    * `order`, forward-filling each side's exclusive columns across the other
    * side's rows.
    */
  def mergeOrdered(right: GraftFrame, keys: Seq[String], order: Seq[String]): GraftFrame = {
    val u = df.unionByName(right.df, allowMissingColumns = true)
    val exclusive = (df.columns.toSet ++ right.df.columns.toSet) --
      (df.columns.toSet & right.df.columns.toSet)
    GraftFrame(graft.operators.Fill.ffill(u, keys, order, exclusive.toSeq.sorted))
  }

  // ---- grouping (SURVEY §2.D) ----

  def groupby(cols: String*): GraftGroupBy = GraftGroupBy(df, cols)

  /** value_counts (reference pandas_compat.py:1039). */
  def valueCounts(c: String): GraftFrame =
    GraftFrame(df.groupBy(c).agg(org.apache.spark.sql.functions.count(lit(1)).as("count"))
      .orderBy(col("count").desc, col(c).asc))

  def nunique(c: String): GraftFrame =
    GraftFrame(df.agg(count_distinct(col(c)).as("nunique")))

  /** describe → Spark summary (8-stat table, reference core.py describe). */
  def describe(cols: String*): GraftFrame = GraftFrame(df.describe(cols: _*))

  // ---- reshaping (SURVEY §2.I — real Spark ops, not pandas fallback) ----

  def pivotTable(index: String, columns: String, values: Seq[String],
      agg: String = "count"): GraftFrame = {
    val g = df.groupBy(index).pivot(columns)
    GraftFrame(agg match {
      case "count" => g.agg(org.apache.spark.sql.functions.count(lit(1)))
      case "sum" => g.sum(values: _*)
      case "mean" | "avg" => g.avg(values: _*)
      case "min" => g.min(values: _*)
      case "max" => g.max(values: _*)
    })
  }

  def melt(ids: Seq[String], values: Seq[String],
      varName: String = "variable", valueName: String = "value"): GraftFrame =
    GraftFrame(df.unpivot(ids.map(col).toArray, values.map(col).toArray, varName, valueName))

  def explodeCol(c: String, outName: String = ""): GraftFrame = {
    val out = if (outName.isEmpty) c else outName
    GraftFrame(df.withColumn(out, explode(col(c))))
  }

  /** pandas json_normalize: parse a JSON string column and flatten nested
    * objects into `sep`-joined top-level columns. Schema is inferred from
    * the first non-null value (one driver-side head — the same contract
    * pandas has; pass explicit DDL via [[jsonNormalizeAs]] to avoid it).
    */
  def jsonNormalize(jsonCol: String, sep: String = "."): GraftFrame = {
    val sample = df.select(col(jsonCol)).na.drop().limit(1).collect()
    if (sample.isEmpty)
      throw new IllegalArgumentException(
        s"jsonNormalize: column '$jsonCol' has no non-null values to infer a " +
          "schema from — pass explicit DDL via jsonNormalizeAs")
    val ddl = df.sparkSession.range(1)
      .select(schema_of_json(lit(sample.head.getString(0))).as("s"))
      .head().getString(0)
    jsonNormalizeAs(jsonCol, ddl, sep)
  }

  /** json_normalize with an explicit schema (DDL or schema_of_json form). */
  def jsonNormalizeAs(jsonCol: String, schemaDdl: String, sep: String = "."): GraftFrame = {
    val parsed = df.withColumn("__j", from_json(col(jsonCol), schemaDdl, Map.empty[String, String]))
    def flatten(prefix: Seq[String], t: org.apache.spark.sql.types.DataType): Seq[Column] =
      t match {
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.toIndexedSeq.flatMap(f => flatten(prefix :+ f.name, f.dataType))
        case _ =>
          val path = ("__j" +: prefix).map(p => s"`$p`").mkString(".")
          Seq(col(path).as(prefix.mkString(sep)))
      }
    val jType = parsed.schema("__j").dataType
    GraftFrame(parsed.select(
      df.columns.filter(_ != jsonCol).map(col).toIndexedSeq ++ flatten(Nil, jType): _*))
  }

  // ---- training-data pipeline tier (SURVEY §7.5) ----
  // The dedup/similarity/curation/fit operators, reachable from the public
  // frame surface (r10 verdict "what's missing" #1: they were Scala objects
  // only — the reference exposes every operator through its two public APIs,
  // README.md:466-496 / datastore/core.py:72). Thin delegates: each method
  // IS the corresponding graft.operators.* call, so oracle coverage and
  // scale shape are inherited, not duplicated.

  import graft.operators.{Curation, Dedup, MLFit, Similarity, TextAnalysis}

  /** Exact dedup, keep smallest `idCol` per distinct `textCol` (q61 shape). */
  def dedupExact(textCol: String, idCol: String): GraftFrame =
    GraftFrame(Dedup.exactKeepFirst(df, textCol, idCol))

  /** Exact-duplicate groups (digest, n, ids), groups of ≥ 2 (q60 shape). */
  def dedupGroups(textCol: String, idCol: String): GraftFrame =
    GraftFrame(Dedup.exactGroups(df, textCol, idCol))

  /** Corpus-wide span-level exact dedup (Lee et al. 2021; q137 shape). */
  def dedupSpans(textCol: String, idCol: String, sep: String = "\\n+",
      joinSep: String = "\n", minChars: Int = 20): GraftFrame =
    GraftFrame(Dedup.dedupSpans(df, textCol, idCol, sep, joinSep, minChars))

  /** MinHash+LSH near-duplicate pairs, exact-Jaccard verified (q63 shape). */
  def minhashPairs(textCol: String, idCol: String, threshold: Double = 0.5,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 2): GraftFrame =
    GraftFrame(Dedup.minhashLsh(df, textCol, idCol, threshold, shingleSize,
      bands, rowsPerBand))

  /** Exact n-gram Jaccard pairs via prefix-filtered index (q62 shape). */
  def ngramJaccardPairs(textCol: String, idCol: String, threshold: Double = 0.3,
      shingleSize: Int = 5, maxDocFreq: Int = 1000): GraftFrame =
    GraftFrame(Dedup.ngramJaccard(df, textCol, idCol, threshold, shingleSize,
      maxDocFreq))

  /** All pairs within `maxHamming` of each other's 64-bit simhash (q64). */
  def simhashPairs(textCol: String, idCol: String,
      maxHamming: Int = 3): GraftFrame =
    GraftFrame(Dedup.simhashPairs(df, textCol, idCol, maxHamming))

  /** Embedding-cosine near-duplicate pairs via hyperplane LSH (q65 shape). */
  def embeddingNearDup(vecCol: String, idCol: String, threshold: Double = 0.95,
      bits: Int = 12, bands: Int = 1): GraftFrame =
    GraftFrame(Dedup.embeddingNearDup(df, vecCol, idCol, threshold, bits, bands))

  /** Keep one row per duplicate cluster, clusters = connected components of
    * `pairs` (q105 shape).
    */
  def dedupByPairs(pairs: GraftFrame, idCol: String,
      aCol: String = "id_a", bCol: String = "id_b"): GraftFrame =
    GraftFrame(Dedup.dedupByClusters(df, pairs.df, idCol, aCol, bCol))

  /** Quality features + composite [0,1] quality_score column (q70 shape). */
  def qualityScore(textCol: String): GraftFrame =
    GraftFrame(TextAnalysis.qualityScore(df, textCol))

  /** Heuristic language prediction column (q71 shape). */
  def languageId(textCol: String, outCol: String = "pred_lang"): GraftFrame =
    GraftFrame(df.withColumn(outCol, TextAnalysis.languageId(col(textCol))))

  /** Whitespace/unicode token count column (q69 shape). */
  def tokenCount(textCol: String, outCol: String = "n_tokens"): GraftFrame =
    GraftFrame(df.withColumn(outCol, TextAnalysis.tokenCount(col(textCol))))

  /** Overlapping fixed-window document chunking (r16, q200 shape). */
  def chunkText(textCol: String, idCol: String, chunkChars: Int,
      overlapChars: Int = 0): GraftFrame =
    GraftFrame(TextAnalysis.chunkFixed(df, textCol, idCol, chunkChars, overlapChars))

  /** Sentence-aware greedy chunking (r16, q201 shape). */
  def chunkSentences(textCol: String, idCol: String, maxChars: Int): GraftFrame =
    GraftFrame(TextAnalysis.chunkSentences(df, textCol, idCol, maxChars))

  /** CCNet-style corpus boilerplate removal (r17, q210 shape): lines seen
    * in >= minDocs distinct documents are dropped from every document.
    */
  def removeBoilerplate(textCol: String, idCol: String, minDocs: Int): GraftFrame =
    GraftFrame(TextAnalysis.removeBoilerplate(df, textCol, idCol, minDocs))

  /** Train a bounded unigram LM over this frame's text (token, cnt). */
  def lmTrain(textCol: String, vocabSize: Int = 65536): GraftFrame =
    GraftFrame(TextAnalysis.lmTrain(df, textCol, vocabSize))

  /** CCNet-style perplexity scoring of this frame's documents under a
    * trained LM: (id, n_tokens, oov_ratio, avg_logprob, perplexity).
    */
  def lmScore(lm: GraftFrame, textCol: String, idCol: String,
      alpha: Double = 0.5): GraftFrame =
    GraftFrame(TextAnalysis.lmScore(df, lm.df, textCol, idCol, alpha))

  /** Train a bounded BIGRAM LM (r14): unigram rows (w2 null) + top bigrams. */
  def lmTrain2(textCol: String, vocabSize: Int = 65536,
      bigramSize: Int = 262144): GraftFrame =
    GraftFrame(TextAnalysis.lmTrain2(df, textCol, vocabSize, bigramSize))

  /** Bigram perplexity scoring with unigram backoff at vocabulary edges. */
  def lmScore2(lm2: GraftFrame, textCol: String, idCol: String,
      alpha: Double = 0.5): GraftFrame =
    GraftFrame(TextAnalysis.lmScore2(df, lm2.df, textCol, idCol, alpha))

  /** BM25 relevance of every document to a seed query (r14 — quality-
    * targeted selection): (idCol, n_terms, bm25) for docs matching ≥1 term.
    */
  def bm25(textCol: String, idCol: String, query: String,
      k1: Double = 1.2, b: Double = 0.75): GraftFrame =
    GraftFrame(graft.operators.Retrieval.bm25(df, textCol, idCol, query, k1, b))

  /** Learn a BPE merge table from this frame's text (r14; sample-bounded —
    * see [[graft.operators.Tokenizer.bpeTrain]]'s scale contract).
    * `byteLevel = true` trains the GPT-2-class byte-level regime (r15).
    */
  def bpeTrain(textCol: String, numMerges: Int, topWords: Int = 10000,
      byteLevel: Boolean = false): Seq[(String, String)] =
    graft.operators.Tokenizer.bpeTrain(df, textCol, numMerges, topWords, byteLevel)

  /** Encode text to BPE subword tokens (`<outCol>` array + `<outCol>_count`)
    * with a trained merge table — a pure codegen'd projection. `byteLevel`
    * must match how the merges were trained.
    */
  def bpeEncode(textCol: String, merges: Seq[(String, String)],
      outCol: String = "bpe", byteLevel: Boolean = false): GraftFrame =
    GraftFrame(graft.operators.Tokenizer.bpeEncode(df, textCol, merges, outCol, byteLevel))

  /** Redact PII (emails/SSNs/phones/IPs) in place (q117 shape). */
  def scrubPii(textCol: String): GraftFrame =
    GraftFrame(df.withColumn(textCol, TextAnalysis.scrubPii(col(textCol))))

  /** Gopher-style repetition feature columns (q118 shape). */
  def repetitionFeatures(textCol: String): GraftFrame =
    GraftFrame(TextAnalysis.repetitionFeatures(df, textCol))

  /** Composed curation: language filter + quality floor + exact keep-first
    * dedup in one plan (q103 shape).
    */
  def curate(textCol: String, idCol: String, languages: Seq[String] = Seq("en"),
      minQuality: Double = 0.3): GraftFrame =
    GraftFrame(Curation.curate(df, textCol, idCol, languages, minQuality))

  /** Deterministic id-hash train/val/test split column (q120 shape). */
  def hashSplit(idCol: String, valFrac: Double = 0.05,
      testFrac: Double = 0.05): GraftFrame =
    GraftFrame(Curation.hashSplit(df, idCol, valFrac, testFrac))

  /** Deterministic domain-mixture downsampling (q123 shape). */
  def sampleMixture(idCol: String, domainCol: String,
      rates: Map[String, Double]): GraftFrame =
    GraftFrame(Curation.sampleMixture(df, idCol, domainCol, rates))

  /** Temperature-scaled (count^alpha) domain rebalancing (q138 shape). */
  def temperatureMixture(idCol: String, domainCol: String,
      alpha: Double): GraftFrame =
    GraftFrame(Curation.temperatureMixture(df, idCol, domainCol, alpha))

  /** Concat-and-chunk sequence packing (q121 shape). */
  def packSequences(idCol: String, tokenCol: String, budget: Int,
      shards: Int = 256): GraftFrame =
    GraftFrame(Curation.packSequences(df, idCol, tokenCol, budget, shards))

  /** Greedy first-fit no-split packing (q122 shape). */
  def packGreedy(idCol: String, tokenCol: String, budget: Int,
      shards: Int = 256): GraftFrame =
    GraftFrame(Curation.packGreedy(df, idCol, tokenCol, budget, shards))

  /** Benchmark decontamination: rows of THIS frame sharing ≥ `minShared`
    * word n-grams with `benchmark` (q135 shape).
    */
  def decontaminate(benchmark: GraftFrame, textCol: String, idCol: String,
      n: Int = 8, minShared: Int = 1): GraftFrame =
    GraftFrame(Curation.decontaminate(df, benchmark.df, textCol, idCol, n,
      minShared))

  /** [[decontaminate]]'s bloom-prefiltered scale path (row-identical output;
    * for benchmark gram sets too large to row-broadcast).
    */
  def decontaminateBloom(benchmark: GraftFrame, textCol: String,
      idCol: String, n: Int = 8, minShared: Int = 1,
      expectedGrams: Long = 0L, fpp: Double = 0.01): GraftFrame =
    GraftFrame(Curation.decontaminateBloom(df, benchmark.df, textCol, idCol,
      n, minShared, expectedGrams, fpp))

  /** SemDeDup cluster-scoped embedding dedup (q146 shape); kCells = 0
    * derives ≈√n cells from the corpus.
    */
  def semDedup(vecCol: String, idCol: String, tau: Double = 0.95,
      kCells: Int = 0, keep: String = "minId"): GraftFrame =
    GraftFrame(Dedup.semDedup(df, vecCol, idCol, tau, kCells, keep = keep))

  /** Per-group cap: best `cap` rows per `groupCol` by `order` (q144 shape). */
  def capPerGroup(groupCol: String, idCol: String, cap: Int,
      order: org.apache.spark.sql.Column): GraftFrame =
    GraftFrame(Curation.capPerGroup(df, groupCol, idCol, cap, order))

  /** Deterministic uniform k-per-group sample by id-hash (q145 shape). */
  def samplePerGroup(groupCol: String, idCol: String, cap: Int): GraftFrame =
    GraftFrame(Curation.samplePerGroup(df, groupCol, idCol, cap))

  /** Best-fraction-per-group adaptive filter (q148 shape). */
  def topFractionPerGroup(groupCol: String, idCol: String, fraction: Double,
      order: org.apache.spark.sql.Column): GraftFrame =
    GraftFrame(Curation.topFractionPerGroup(df, groupCol, idCol, fraction, order))

  /** [[topFractionPerGroup]] with the rank-safe approximate-quantile
    * prefilter — identical rows, hot-group reducer shrunk to
    * ~(fraction+eps)·n (numeric order keys).
    */
  def topFractionPerGroupPrefiltered(groupCol: String, idCol: String,
      fraction: Double, order: org.apache.spark.sql.Column,
      eps: Double = 0.02): GraftFrame =
    GraftFrame(Curation.topFractionPerGroupPrefiltered(
      df, groupCol, idCol, fraction, order, eps))

  /** Token-budget cap per group, hash-ordered draw (q147 shape). */
  def tokenBudgetPerGroup(groupCol: String, idCol: String, tokenCol: String,
      budget: Long): GraftFrame =
    GraftFrame(Curation.tokenBudgetPerGroup(df, groupCol, idCol, tokenCol, budget))

  /** Exact cosine top-k of each `queries` row against this corpus (q66). */
  def bruteForceTopK(queries: GraftFrame, vecCol: String, idCol: String,
      k: Int): GraftFrame =
    GraftFrame(Similarity.bruteForceTopK(df, queries.df, vecCol, idCol, k))

  /** Hyperplane-LSH approximate top-k (q67 shape). */
  def annTopK(queries: GraftFrame, vecCol: String, idCol: String, k: Int,
      bits: Int = 8, probes: Int = 1): GraftFrame =
    GraftFrame(Similarity.annTopK(df, queries.df, vecCol, idCol, k, bits, probes))

  /** IVF (k-means coarse quantizer) approximate top-k (q134 shape);
    * kCells = 0 derives ≈√n cells from the corpus.
    */
  def ivfTopK(queries: GraftFrame, vecCol: String, idCol: String, k: Int,
      kCells: Int = 0, iters: Int = 2, nProbe: Int = 2): GraftFrame =
    GraftFrame(Similarity.ivfTopK(df, queries.df, vecCol, idCol, k, kCells,
      iters, nProbe))

  /** Exact OLS/ridge linear fit → one row with array(w1…wk, bias) (q132
    * shape; normal-equations aggregate, one k²-state shuffle).
    */
  def linearFit(target: Column, features: Seq[Column],
      outCol: String = "weights"): GraftFrame =
    GraftFrame(df.agg(call_function("stochasticLinearRegression",
      target +: features: _*).as(outCol)))

  /** Deterministic full-batch logistic GD fit → driver-side weights
    * [w1…wk, bias] (q133/q136 shape). Eager: runs `epochs` aggregations.
    */
  def logisticFit(target: Column, features: Seq[Column], epochs: Int = 20,
      lr: Double = 0.5, l2: Double = 0.0): Array[Double] =
    MLFit.logisticFit(df, target, features, epochs, lr, l2)

  // ---- execution triggers ----

  def collect(): Array[org.apache.spark.sql.Row] = df.collect()
  def count(): Long = df.count()
  def show(n: Int = 20): Unit = df.show(n)
  def explain(): Unit = df.explain("formatted")
  def cache(): GraftFrame = GraftFrame(df.cache())
  def toDF: DataFrame = df

  /** Streamed result iteration (the reference's chunked-pull streaming
    * surface, docs/streaming.rst): partitions are fetched one at a time, so
    * driver memory holds one partition, not the result; stop consuming to
    * stop fetching (early close).
    */
  def toLocalIterator(): java.util.Iterator[org.apache.spark.sql.Row] =
    df.toLocalIterator()

  /** Run the query and report the reference's result metadata surface
    * (README rows_read()/bytes_read()/elapsed()): rows/bytes actually read
    * from storage (task input metrics), wall time, and rows returned.
    */
  def collectWithMetrics(): (Array[org.apache.spark.sql.Row], GraftFrame.QueryMetrics) = {
    import java.util.concurrent.atomic.AtomicLong
    val sc = df.sparkSession.sparkContext
    val bytes = new AtomicLong
    val rows = new AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val im = t.taskMetrics.inputMetrics
        bytes.addAndGet(im.bytesRead)
        rows.addAndGet(im.recordsRead)
      }
    }
    sc.addSparkListener(listener)
    val t0 = System.nanoTime()
    try {
      val out = df.collect()
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      // the listener bus is async — quiesce: wait until the counters stop
      // moving (bounded at 2 s) before reading them
      var prev = -1L
      var waited = 0
      while (waited < 20 && (bytes.get() + rows.get()) != prev) {
        prev = bytes.get() + rows.get()
        Thread.sleep(100)
        waited += 1
      }
      (out, GraftFrame.QueryMetrics(rows.get(), bytes.get(), elapsedMs, out.length))
    } finally sc.removeSparkListener(listener)
  }
}

object GraftFrame {

  /** Result metadata (reference README.md:266-268 rows_read/bytes_read/
    * elapsed): storage-side rows/bytes actually scanned for this query.
    */
  final case class QueryMetrics(
      rowsRead: Long, bytesRead: Long, elapsedMs: Long, rowsReturned: Long)

  /** Grouped surface (reference datastore/groupby.py LazyGroupBy). */
  final case class GraftGroupBy(df: DataFrame, keys: Seq[String]) {
    private def g = df.groupBy(keys.map(col): _*)

    /** agg("col" -> "func", …) with pandas→SQL name mapping
      * (reference utils.py:263-277 SQL_AGG_FUNC_MAP).
      */
    def agg(specs: (String, String)*): GraftFrame =
      GraftFrame(g.agg(
        aggExpr(specs.head._1, specs.head._2),
        specs.tail.map { case (c, f) => aggExpr(c, f) }: _*))

    def aggCols(exprs: Column*): GraftFrame = GraftFrame(g.agg(exprs.head, exprs.tail: _*))

    def count(): GraftFrame = GraftFrame(g.agg(org.apache.spark.sql.functions.count(lit(1)).as("count")))
    def size(): GraftFrame = count()
    def mean(cols: String*): GraftFrame = GraftFrame(g.avg(cols: _*))
    def sum(cols: String*): GraftFrame = GraftFrame(g.sum(cols: _*))
    def min(cols: String*): GraftFrame = GraftFrame(g.min(cols: _*))
    def max(cols: String*): GraftFrame = GraftFrame(g.max(cols: _*))
    def nunique(c: String): GraftFrame =
      GraftFrame(g.agg(count_distinct(col(c)).as(s"${c}_nunique")))

    /** groupby.transform: group aggregate broadcast back to every row
      * (reference groupby.py transform → window aggregate, SURVEY §2.D).
      */
    def transform(c: String, func: String, outName: String = ""): GraftFrame = {
      val w = Window.partitionBy(keys.map(col): _*)
      val out = if (outName.isEmpty) s"${c}_$func" else outName
      GraftFrame(df.withColumn(out, aggFn(func, c).over(w)))
    }

    /** groupby.filter: keep rows of groups satisfying a group-level predicate
      * on func(c) (reference groupby.py filter).
      */
    def filterGroups(c: String, func: String, pred: Column => Column): GraftFrame = {
      val w = Window.partitionBy(keys.map(col): _*)
      GraftFrame(df.withColumn("__gf_agg", aggFn(func, c).over(w))
        .filter(pred(col("__gf_agg"))).drop("__gf_agg"))
    }

    /** groupby.apply with an arbitrary per-group function (reference
      * datastore/lazy_ops.py:1620 `groupby.apply(lambda)`). The Spark-
      * native shape is `flatMapGroups` over a KeyValueGroupedDataset: the
      * group's rows arrive as one iterator on one executor, `f` returns
      * the group's output rows, `outSchema` declares their shape.
      *
      * This is the ESCAPE HATCH, deliberately last in the API: transform/
      * filterGroups/head above stay declarative (window aggregates,
      * codegen, no materialized groups) and should be preferred — a lambda
      * is opaque to Catalyst, so nothing prunes or pushes through it, and
      * a skewed group must fit its executor. Same trade the reference
      * makes (its apply() falls back to per-group pandas).
      */
    def applyGroups(outSchema: org.apache.spark.sql.types.StructType)(
        f: (Row, Iterator[Row]) => Iterator[Row]): GraftFrame = {
      val keyIdx = keys.map(df.columns.indexOf(_))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(org.apache.spark.sql.types.StructType(
          keys.map(k => df.schema(k))))
      val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(outSchema)
      GraftFrame(df.groupByKey(r => Row.fromSeq(keyIdx.map(r.get)))(enc)
        .flatMapGroups((k: Row, it: Iterator[Row]) => f(k, it))(outEnc))
    }

    /** head(n) per group with explicit order (LIMIT n BY analog). */
    def head(n: Int, orderBy: Seq[String]): GraftFrame = {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(col): _*)
      GraftFrame(df.withColumn("__gf_rn", row_number().over(w))
        .filter(col("__gf_rn") <= n).drop("__gf_rn"))
    }

    private def aggExpr(c: String, f: String): Column = aggFn(f, c).as(s"${c}_$f")

    /** pandas name → Spark aggregate (reference SQL_AGG_FUNC_MAP). */
    private def aggFn(f: String, c: String): Column = f match {
      case "mean" | "avg" => avg(col(c))
      case "sum" => org.apache.spark.sql.functions.sum(col(c))
      case "count" => org.apache.spark.sql.functions.count(col(c))
      case "min" => org.apache.spark.sql.functions.min(col(c))
      case "max" => org.apache.spark.sql.functions.max(col(c))
      case "std" => stddev_samp(col(c))
      case "var" => var_samp(col(c))
      case "first" | "any" => any_value(col(c))
      case "last" => org.apache.spark.sql.functions.last(col(c))
      case "nunique" => count_distinct(col(c))
      case "median" => org.apache.spark.sql.functions.median(col(c))
      case "prod" | "product" =>
        exp(org.apache.spark.sql.functions.sum(log(col(c)))) // positive domain
      case other => call_function(other, col(c))
    }
  }
}
