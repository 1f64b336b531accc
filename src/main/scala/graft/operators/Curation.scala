package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed training-data pipeline the
  * builder brief targets: exact dedup (keep first) → language filter →
  * quality floor, in one declarative plan. Each stage is the already-tested
  * operator; composing them keeps everything in a single Catalyst plan so
  * the scan is shared, filters run before the dedup shuffle where legal, and
  * column pruning drops the feature columns after the filter.
  *
  * Scale shape: ONE digest-keyed shuffle (the dedup window) — language and
  * quality are pure projections evaluated before it, shrinking the shuffle
  * to the surviving rows.
  */
object Curation {

  /** Curate `df`: keep rows whose language prediction is in `languages` and
    * quality score ≥ `minQuality`, then keep the first (smallest `idCol`)
    * row per exact-duplicate group of `textCol`.
    */
  def curate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      languages: Seq[String] = Seq("en"),
      minQuality: Double = 0.3): DataFrame = {
    // The keep/drop decision is ONE fused boolean pushed to the scan
    // (QualityGate) — filtering on derived pred_lang/quality_score columns
    // let predicate pushdown inline the whole feature tree ~12× into the
    // pushed condition (measured 11 s vs 0.7 s on 100 k rows, r11). The
    // feature columns are then computed once (fused TextStats scan) for
    // the survivors only; every kept row and value is identical — the
    // gate replicates the score/argmax arithmetic operation-for-operation.
    val gated = df.filter(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.QualityGate(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col(textCol)),
          languages, minQuality)))
    val scored = TextAnalysis.qualityScoreFromStats(
        gated.withColumn("__st", TextAnalysis.textStats(col(textCol))), col("__st"))
      .withColumn("pred_lang", TextAnalysis.languageIdFromStats(col("__st")))
      .drop("__st")
    Dedup.exactKeepFirst(scored, textCol, idCol)
  }

  /** The 60-bit md5-prefix value as a Column — numerically identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)` (KernelPropertySpec-locked),
    * via the native [[graft.functions.Md5Prefix60]] kernel (r18 — no hex
    * render / string base-16 parse per value).
    */
  private[operators] def md5Prefix60(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.Md5Prefix60(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** md5-derived bucket in [0, buckets) of `id` — the portable deterministic
    * hash every split/sampling op here keys on (same 60-bit md5-prefix
    * device as the simhash/LSH oracles, so DuckDB replicates assignments
    * bit-for-bit).
    */
  private def md5Bucket(id: Column, buckets: Int): Column =
    md5Prefix60(id.cast("string")) % buckets

  /** Deterministic train/val/test split by id-hash threshold. Stable under
    * reruns, repartitioning AND corpus growth — a document keeps its split
    * when more data arrives, the property a `randomSplit` lacks and the
    * reason every large corpus pipeline splits by hash. Pure projection:
    * no shuffle, no state, identical plan shape at any scale.
    */
  def hashSplit(df: DataFrame, idCol: String,
      valFrac: Double = 0.05, testFrac: Double = 0.05,
      buckets: Int = 10000): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac < 1,
      s"invalid split fractions: val=$valFrac test=$testFrac")
    val b = md5Bucket(col(idCol), buckets)
    val vHi = math.round(valFrac * buckets)
    val tHi = vHi + math.round(testFrac * buckets)
    df.withColumn("split",
      when(b < vHi, "val").when(b < tHi, "test").otherwise("train"))
  }

  /** Domain-mixture sampling (the Pile/Dolma mixing step): keep each row
    * of domain d with probability `rates(d)` (domains absent from `rates`
    * keep everything), decided by the SAME id-hash device as [[hashSplit]]
    * so the sample is deterministic and consistent across reruns. One
    * projection + filter; the rates map rides along as a broadcast-sized
    * CASE expression, so no join and no shuffle at any corpus size.
    */
  def sampleMixture(df: DataFrame, idCol: String, domainCol: String,
      rates: Map[String, Double], buckets: Int = 10000): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1), s"bad rates: $rates")
    val b = md5Bucket(col(idCol), buckets)
    // string-compare so non-string domain columns match their rates map
    // entries (and a null domain matches nothing → always kept)
    val thresh = rates.foldLeft(lit(buckets.toLong)) { case (acc, (d, r)) =>
      when(col(domainCol).cast("string") === d,
        lit(math.round(r * buckets))).otherwise(acc)
    }
    df.filter(b < thresh)
  }

  /** TEMPERATURE-scaled domain mixture — the standard multilingual /
    * multi-source rebalancing (sample domain d with probability
    * ∝ count_d^alpha, alpha < 1 flattening the head): computes per-domain
    * deterministic sampling rates r_d = (count_d^alpha / count_d)
    * normalized so the largest r_d = 1 (sampling WITHOUT replacement can
    * only downsample), then applies them through [[sampleMixture]]'s
    * md5-bucket device — so the draw is a pure function of the id,
    * reproducible anywhere (q138 oracle replays it).
    *
    * Scale: one map-side-combined count aggregation (domains are few),
    * rates computed on the driver from that bounded map, then a pure
    * projection filter — the corpus streams through once, unshuffled.
    */
  def temperatureMixture(df: DataFrame, idCol: String, domainCol: String,
      alpha: Double, buckets: Int = 10000): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0, 1]: $alpha")
    // cast to string (non-string domain columns used to ClassCastException)
    // and EXCLUDE nulls from the normalization: a null domain can never be
    // downsampled (sampleMixture's `=== d` never matches null — those rows
    // always keep), so counting it could make it the rate-1 anchor and
    // silently shrink every real domain's rate (ADVICE r10)
    val counts = df.groupBy(col(domainCol).cast("string").as("__d")).count()
      .collect().flatMap(r =>
        Option(r.getString(0)).map(_ -> r.getLong(1))).toMap
    if (counts.isEmpty) return df // no rows, no domains: nothing to rebalance
    val raw = counts.map { case (d, n) => d -> math.pow(n.toDouble, alpha - 1.0) }
    val mx = raw.values.max
    sampleMixture(df, idCol, domainCol,
      raw.map { case (d, r) => d -> r / mx }, buckets)
  }

  /** GPT-style concat-and-chunk sequence packing: within a shard, document
    * token streams are conceptually concatenated in `idCol` order and cut
    * every `budget` tokens; a document overlapping a cut belongs to every
    * sequence it spans (the training loader splits it). Emits one row per
    * (doc, spanned sequence) with the doc's [off_start, off_end) interval
    * INSIDE that sequence.
    *
    * Scale shape: documents shard by id-hash, so the cumulative-sum window
    * is per-shard — `shards` bounds every window partition (pick ~10k at
    * 100 TB for ~10 GB shards), never a global single-partition window.
    * The explode adds at most ceil(tokens/budget)+1 rows per doc.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      budget: Int, shards: Int = 256): DataFrame = {
    require(budget > 0 && shards > 0)
    val w = Window.partitionBy("shard").orderBy(col(idCol))
    df.withColumn("shard", md5Bucket(col(idCol), shards).cast("int"))
      .withColumn("__end", sum(col(tokenCol).cast("long")).over(w))
      .withColumn("__start", col("__end") - col(tokenCol))
      // zero-token docs still land in exactly one sequence (greatest guard:
      // sequence(hi, lo) would otherwise count DOWN and fabricate rows)
      .withColumn("seq_id", explode(sequence(
        floor(col("__start") / budget),
        greatest(floor((col("__end") - 1) / budget),
          floor(col("__start") / budget)))))
      .withColumn("off_start",
        greatest(col("__start") - col("seq_id") * budget, lit(0L)))
      .withColumn("off_end",
        least(col("__end") - col("seq_id") * budget, lit(budget.toLong)))
      .drop("__start", "__end")
  }

  /** Greedy first-fit no-split packing: documents are never cut — a new
    * pack opens when the next doc would overflow `budget` (docs larger than
    * the budget get a pack of their own). The sequential fold is inherently
    * order-dependent, so it runs per shard over the id-sorted rows via
    * SECONDARY SORT (r8 verdict #4): repartition by shard +
    * `sortWithinPartitions(shard, id)` puts the ordering in Spark's
    * spillable external sorter, and the `mapPartitions` fold streams rows
    * holding O(1) state — no shard is ever materialized on the heap (the
    * previous `it.toVector.sortBy` held corpus/shards rows at once).
    * Packs are (shard, pack_id) pairs, so shards never coordinate and the
    * op is one shuffle at any scale.
    */
  def packGreedy(df: DataFrame, idCol: String, tokenCol: String,
      budget: Int, shards: Int = 256): DataFrame = {
    require(budget > 0 && shards > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.withColumn("shard", md5Bucket(col(idCol), shards).cast("int"))
      .select(col("shard"), col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("tokens"))
      .as[(Int, Long, Long)]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .mapPartitions { it =>
        var curShard = Int.MinValue
        var started = false
        var pack = 0L
        var acc = 0L
        it.map { case (sh, id, t) =>
          if (!started || sh != curShard) {
            curShard = sh; started = true; pack = 0L; acc = t
          } else {
            if (acc + t > budget) { pack += 1; acc = 0L }
            acc += t
          }
          (sh, id, t, pack)
        }
      }
      .toDF("shard", "id", "tokens", "pack_id")
  }

  /** Benchmark DECONTAMINATION — the eval-overlap filter every LLM training
    * pipeline runs before training: flag corpus documents sharing ≥
    * `minShared` distinct word `n`-grams with the benchmark/eval corpus.
    *
    * Shingles are hashed with the portable 60-bit md5-prefix device (same
    * as hashSplit/the LSH oracles), so DuckDB replays the overlap join
    * bit-for-bit (q135). Returns (id, shared_ngrams) for contaminated
    * documents only.
    *
    * Scale shape: the benchmark gram set is DISTINCT'd and BROADCAST (eval
    * sets are small by nature — the asymmetry is the whole design); corpus
    * grams are per-document projections that meet the broadcast in a hash
    * join without shuffling, and the only exchange is the final per-id
    * count — map-side combined. A 100 TB corpus streams through once.
    */
  def decontaminate(
      corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String,
      n: Int = 8, minShared: Int = 1): DataFrame = {
    val grams = gramHashes(textCol, n)
    val bench = benchmark.select(explode(grams).as("g")).distinct()
    corpus.select(col(idCol).as("id"), explode(grams).as("g"))
      .join(broadcast(bench), "g")
      .groupBy("id").agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
  }

  /** Distinct word-n-gram hashes of `textCol` as one unresolved Column —
    * it binds to whichever frame selects it. Portable 60-bit md5-prefix
    * shingle device (replays in DuckDB), shared by [[decontaminate]] and
    * [[decontaminateBloom]].
    */
  private def gramHashes(textCol: String, n: Int): Column = {
    // one fused kernel per document: tokenize (codegen'd) → the n-gram
    // join+hash loop (GramHash60, r18 — value-identical to the lambda
    // spelling, KernelPropertySpec-locked) → distinct
    val toks = graft.functions.GraftFunctions.tokenize(col(textCol))
    array_distinct(org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.GramHash60(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(toks), n)))
  }

  /** [[decontaminate]]'s scale path for when the benchmark's distinct gram
    * set OUTGROWS a row broadcast (decontaminating against a large held-out
    * corpus, or the union of every eval suite with n-gram inflation): a
    * Bloom prefilter + exact verify.
    *
    * Phase 1 builds a Bloom filter over the benchmark grams (`fpp` sizes
    * it: 10^9 grams at 1% fpp ≈ 1.2 GB of bits — broadcast ONCE per
    * executor via [[graft.functions.BloomMightContain]], a codegen'd
    * membership expression over the broadcast handle, never inlined into
    * the plan). Phase 2 keeps only corpus grams the bloom admits — true
    * overlaps plus an fpp-fraction of noise — and EXACT-verifies the
    * survivors with a join against the real gram set, so the result is
    * ROW-IDENTICAL to [[decontaminate]] for ANY fpp (spec-locked): fpp
    * trades candidate-shuffle volume against bloom size, never
    * correctness. The 100 TB corpus still streams through exactly once,
    * and the verify join ships only the candidate slice.
    *
    * CONTRACT — EAGER, returns a persisted frame: unlike the rest of the
    * operator surface this method RUNS A JOB at call time (it must, to
    * release the GB-scale gram cache and broadcast bloom immediately after
    * the contaminated-id-sized result materializes — r13 advice trade,
    * SCALING.md). The returned DataFrame is persisted MEMORY_AND_DISK for
    * the caller; call `.unpersist()` on it when done to release the
    * (small) cached result. Callers composing lazy pipelines should treat
    * this call as the pipeline's execution point.
    */
  def decontaminateBloom(
      corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String,
      n: Int = 8, minShared: Int = 1,
      expectedGrams: Long = 0L, fpp: Double = 0.01): DataFrame = {
    val grams = gramHashes(textCol, n)
    // persisted: the gram pipeline (tokenize + md5 + explode + distinct
    // shuffle) feeds up to three consumers — the sizing count, the bloom
    // build, and the verify join — and at the very scale this path exists
    // for, recomputing it three times is the dominant cost. MEMORY_AND_DISK
    // so an over-RAM gram set spills instead of thrashing.
    val bench = benchmark.select(explode(grams).as("g")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // driver-sized scalar: the bloom must be sized before it is built
    val expected = if (expectedGrams > 0) expectedGrams
      else math.max(1L, bench.count())
    val bf = bench.stat.bloomFilter("g", expected, fpp)
    val bcast = corpus.sparkSession.sparkContext.broadcast(bf)
    val admits = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.BloomMightContain(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("g")),
        bcast))
    val out = corpus.select(col(idCol).as("id"), explode(grams).as("g"))
      .filter(admits)
      .join(bench, "g") // exact verify — fpp noise dies here
      .groupBy("id").agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Materialize the (contaminated-id-sized, i.e. small) result NOW so the
    // GB-scale inputs can be released immediately — on the very path sized
    // for huge blooms, leaving the gram cache + bloom broadcast pinned for
    // the session lifetime is a leak (r13 advice). unpersist, not destroy:
    // if a recompute is ever forced (executor loss evicting the cached
    // result), the bloom re-ships from the driver and the gram pipeline
    // re-derives — slower, still correct.
    out.foreach(_ => ())
    bench.unpersist(blocking = false)
    bcast.unpersist(blocking = false)
    out
  }

  /** Per-group cap — the crawl-curation "at most `cap` documents per domain"
    * step (RefinedWeb/C4-style host caps): keep the best `cap` rows of each
    * `groupCol` value, "best" = smallest `order` (pass e.g. `-quality` for
    * best-quality-first), ties broken by `idCol` so the kept set is
    * deterministic under any physical row order.
    *
    * Scale shape — two-phase VIA CATALYST (r11 verdict #2, investigated
    * r12): `row_number() OVER group-window <= literal` triggers Spark's
    * `InferWindowGroupLimit` rule, which plants a map-side
    * `WindowGroupLimit(..., Partial)` BEFORE the exchange — each input
    * partition forwards only its local top-`cap` per group (top-k
    * composes), so the group-keyed shuffle carries ≤ partitions·cap rows
    * per group and a mega-group (one domain with 10^8 pages) costs its
    * reducer O(partitions·cap) instead of O(|group|). A hand-rolled
    * mapPartitions pre-cap was measured redundant here (identical shuffle
    * bytes, pure ser/de overhead); the declarative form IS the mitigated
    * form, and PlanSpec locks the Partial node below the exchange so a
    * refactor can't silently lose it. (Contrast [[tokenBudgetPerGroup]],
    * whose running-sum cut Catalyst cannot infer — that one carries a
    * manual map-side phase.)
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      cap: Int, order: Column): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val w = Window.partitionBy(col(groupCol)).orderBy(order, col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap).drop("__rk")
  }

  /** Streaming partition-local per-group filter: `df` must already be
    * sorted within partitions so each group is one contiguous run; `step`
    * folds (state, row) → (state', keep), with state reset to `init` at
    * each group boundary. One pass, O(1) state, no shuffle — the map-side
    * half of the two-phase group operators.
    */
  private def localGroupScan[S](df: DataFrame, groupCol: String, init: S)(
      step: (S, org.apache.spark.sql.Row) => (S, Boolean)): DataFrame = {
    val gi = df.schema.fieldIndex(groupCol)
    df.mapPartitions { it =>
      var cur: Any = null
      var started = false
      var state = init
      it.filter { r =>
        val g = r.get(gi)
        if (!started || !java.util.Objects.equals(g, cur)) {
          started = true; cur = g; state = init
        }
        val (s2, keep) = step(state, r)
        state = s2
        keep
      }
    }(org.apache.spark.sql.Encoders.row(df.schema))
  }

  /** Deterministic uniform k-per-group sample — [[capPerGroup]] ordered by
    * the md5 id-hash: every group contributes its `cap` hash-smallest rows,
    * a fixed-size stratified sample that is stable under reruns and
    * repartitioning (the exact-k counterpart of [[sampleMixture]]'s
    * per-row rates; same portable hash, so DuckDB replays it).
    */
  def samplePerGroup(df: DataFrame, groupCol: String, idCol: String,
      cap: Int): DataFrame =
    capPerGroup(df, groupCol, idCol, cap, md5(col(idCol).cast("string")))

  /** Keep the best `fraction` of each group by `order` (smallest first —
    * pass e.g. `col("quality").desc` for best-quality-first): ADAPTIVE
    * per-domain quality filtering. A single global quality floor
    * over-prunes clean domains and under-prunes noisy ones; a per-domain
    * percentile cut self-calibrates to each domain's own distribution.
    * Deterministic via the id tie-break (cume_dist over a total order);
    * one group-keyed window shuffle, same skew profile as [[capPerGroup]].
    */
  def topFractionPerGroup(df: DataFrame, groupCol: String, idCol: String,
      fraction: Double, order: Column): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction in (0, 1]: $fraction")
    val w = Window.partitionBy(col(groupCol)).orderBy(order, col(idCol))
    df.withColumn("__cd", cume_dist().over(w))
      .filter(col("__cd") <= fraction).drop("__cd")
  }

  /** [[topFractionPerGroup]] with a rank-safe approximate-quantile
    * PREFILTER (r12) — the hot-group mitigation for percentile cuts.
    * Fraction cuts can't pre-aggregate the way top-k composes (a fraction
    * of an unknown group size licenses no local drop), but a VALUE
    * threshold does: rows whose order key is past the group's
    * `(fraction + eps)`-quantile can never be in the kept fraction, and
    * `percentile_approx` at accuracy `ceil(2/eps)` bounds the sketch's
    * rank error below `eps·n/2`, so no true keeper is ever prefiltered
    * (null keys, NaN keys, and groups whose sketch is empty are always
    * kept — the prefilter only ever passes a SUPERSET). The exact cut
    * then runs over the ~`(fraction + eps)·n` survivors, ranking against
    * the ORIGINAL group size, so the output is row-identical to
    * [[topFractionPerGroup]] (spec-locked on skewed/tied/null/NaN
    * fixtures, both directions). Two extra narrow passes (per-group
    * count+quantile agg, then a keyed join of that group-sized table);
    * the group window's reducer shrinks from `n` to `~(fraction + eps)·n`
    * rows — the win is exactly where the cut is aggressive (keep-top-2%
    * quality filtering of a 10^8-page domain).
    *
    * Descending order with null keys degrades that group to unfiltered
    * (nulls rank WORST under desc, so the non-null quantile under-counts
    * the digging depth — the per-group escape keeps correctness; asc is
    * proven safe with nulls ranked first). Requires a numeric order key
    * (the quantile sketch's domain).
    */
  def topFractionPerGroupPrefiltered(
      df: DataFrame, groupCol: String, idCol: String,
      fraction: Double, order: Column, eps: Double = 0.02): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction in (0, 1]: $fraction")
    require(eps > 0, s"eps must be positive: $eps")
    if (fraction + eps >= 1.0) return topFractionPerGroup(df, groupCol, idCol, fraction, order)
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val (key, desc) = ColumnBridge.expression(order) match {
      case SortOrder(child, Descending, _, _) => (ColumnBridge.column(child), true)
      case SortOrder(child, Ascending, _, _) => (ColumnBridge.column(child), false)
      case e => (ColumnBridge.column(e), false)
    }
    val q = if (desc) 1.0 - (fraction + eps) else fraction + eps
    val accuracy = math.max(100, math.ceil(2.0 / eps).toInt)
    val k = key.cast("double")
    val stats = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"),
      percentile_approx(when(!isnan(k), k), lit(q), lit(accuracy)).as("__tau"),
      (max(k.isNull.cast("int")) === 1).as("__hasnull"))
    val keep =
      if (desc)
        // desc + nulls: nulls sort last, so the non-null quantile would
        // under-estimate how deep the kept fraction digs — escape the group
        k.isNull || isnan(k) || col("__tau").isNull || col("__hasnull") ||
          k >= col("__tau")
      else k.isNull || isnan(k) || col("__tau").isNull || k <= col("__tau")
    val survivors = df.join(stats, Seq(groupCol)).filter(keep)
    val w = Window.partitionBy(col(groupCol)).orderBy(order, col(idCol))
    // every row ranked better than a survivor also survives (its key is on
    // the kept side of tau), so row_number over survivors == the global
    // rank — and rn/n over the ORIGINAL count is cume_dist's exact
    // arithmetic (double division), bit-matching the direct form's cut
    survivors.withColumn("__rn", row_number().over(w))
      .filter(col("__rn").cast("double") / col("__n").cast("double") <= fraction)
      .drop("__rn", "__n", "__tau", "__hasnull")
  }

  /** TOKEN-BUDGET cap per group — the budgeted-mixture step ("at most N
    * tokens of each source in the training set"): rows of each `groupCol`
    * value are taken in deterministic md5-id-hash order (an unbiased
    * uniform draw, same portable device as [[samplePerGroup]]) until the
    * group's RUNNING token total would exceed `budget`; the row that
    * crosses the line and everything after it are dropped. Token-exact
    * counterpart of document-count caps: domains with long documents
    * contribute fewer of them.
    *
    * Scale shape — TWO-PHASE like [[capPerGroup]]: phase 1 keeps, per
    * partition and group, the hash-order prefix whose PRECEDING token
    * total is ≤ `budget` — the local prefix every global survivor belongs
    * to (local running totals only undercount the global ones), INCLUDING
    * the first budget-crossing row. That sentinel row is what makes the
    * phase-2 running sums decide identically to the single-window form:
    * any survivor preceded by a phase-1-dropped row is also preceded by
    * that partition's sentinel, whose tokens alone already push the
    * phase-2 sum past the budget — so over-kept rows are always re-dropped,
    * and rows the direct form keeps see exactly their true prefix (token
    * counts are non-negative, so the kept set is a prefix and all its
    * predecessors survive phase 1). Each (partition, group) forwards at
    * most a budget's worth of tokens + one row; the hot-group reducer cost
    * drops from O(|group|) to O(partitions · budget/avgTokens).
    */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    // materialize the hash sort key and the long token count ONCE — sort
    // comparators re-evaluate ordering expressions per comparison, so an
    // inline md5 would hash O(n log n) times across the two sorts
    val withKeys = df
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__tk", coalesce(col(tokenCol).cast("long"), lit(0L)))
    val ti = withKeys.schema.fieldIndex("__tk")
    val pre = localGroupScan(
      withKeys.sortWithinPartitions(col(groupCol), col("__h"), col(idCol)),
      groupCol, 0L) { (cum, r) =>
      (cum + r.getLong(ti), cum <= budget) // keeps the first crossing row
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre.withColumn("__cum", sum(col(tokenCol).cast("long")).over(w))
      .filter(col("__cum") <= budget).drop("__cum", "__h", "__tk")
  }
}
