package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Deduplication suite for LLM training-data pipelines (builder brief +
  * SURVEY §7.5). All variants are shuffle-architected for 100 TB:
  *
  *  - exact: hash-groupBy on a content digest — one shuffle keyed by digest,
  *    no row ever compared to another row outside its digest bucket.
  *  - minhashLsh: shingle → k minhashes → b bands; candidate pairs come from
  *    an equi-join on (band index, band hash) — the classic MinHash+LSH
  *    banding so the cross-product never materializes; exact Jaccard is then
  *    verified only on candidates.
  *  - simhash: 64-bit simhash, combinatorial multi-index banding with an
  *    exact pigeonhole recall guarantee at ANY requested radius (see
  *    [[simhashPairs]]); candidates verified via popcount.
  *
  * Determinism: every hash is xxhash64/fingerprint-based — no RNG — so
  * results are stable across runs and cluster layouts.
  */
object Dedup {

  /** Exact duplicates: keep the smallest `idCol` per distinct `textCol`. */
  def exactKeepFirst(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact-duplicate groups: digest → ids, only groups with > 1 member. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("n") > 1)

  /** Candidate near-duplicate pairs via MinHash + LSH banding, verified with
    * exact Jaccard over token shingles. Returns (id_a, id_b, jaccard) with
    * id_a < id_b and jaccard >= threshold.
    *
    * @param shingleSize tokens per shingle
    * @param bands       LSH bands; signature length = bands * rowsPerBand
    * @param rowsPerBand minhashes per band
    */
  def minhashLsh(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.5,
      shingleSize: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 2): DataFrame = {
    val (hs, candidates) =
      minhashParts(df, textCol, idCol, shingleSize, bands, rowsPerBand)
    val withSets = candidates
      .join(hs.select(col("id").as("id_a"), col("hs").as("sh_a")), Seq("id_a"))
      .join(hs.select(col("id").as("id_b"), col("hs").as("sh_b")), Seq("id_b"))
    verifyJaccard(withSets, threshold)
  }

  /** The two stages of [[minhashLsh]] before verification — exposed so the
    * scale harness (DedupScaleBench) can measure the CANDIDATE set, the
    * quantity whose growth decides whether the scheme survives 100 TB.
    * Returns (persisted shingle-hash sets, deduped candidate id pairs).
    */
  private[graft] def minhashParts(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int,
      bands: Int,
      rowsPerBand: Int): (DataFrame, DataFrame) = {
    val k = bands * rowsPerBand
    // Tokenize → shingle → hash exactly ONCE — the fused shingleHashes
    // kernel (r11; was interpreted slice/zip/concat_ws + hash lambdas) —
    // into a sorted array of 64-bit shingle hashes, and PERSIST it: the
    // array feeds both the signature pass and the verification join, and
    // without the cache the whole pipeline re-runs over the full corpus
    // for each consumer (the r2 bench's top cost). Verification runs over
    // the long arrays directly — Jaccard over distinct 64-bit hashes
    // equals Jaccard over the string shingles up to ~n²/2⁶⁴ collisions,
    // and longs shuffle ~10× smaller than the shingle strings.
    val hs = df.select(
      col(idCol).as("id"),
      shingleHashes(col(textCol), shingleSize).as("hs"))
      .filter(size(col("hs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The k minhash permutations remix the base hash numerically (xxhash64
    // over (long, seed)) instead of re-hashing the string k times. The
    // signature is computed by explode → groupBy(id) with k min() aggregates
    // rather than k array_min(transform(...)) columns: projection collapse
    // would inline the shingle pipeline into each of the k signature
    // expressions, while the exploded aggregation evaluates it once per
    // shingle and shuffles only (id, 8-byte hash) — also the plan shape that
    // scales: map-side partial min makes the shuffle |corpus|-sized.
    val explodedHashes = hs.select(col("id"), explode(col("hs")).as("h"))
    val sig = explodedHashes.groupBy("id")
      .agg((0 until k).map(seed => min(xxhash64(col("h"), lit(seed))).as(s"m$seed")).head,
        (1 until k).map(seed => min(xxhash64(col("h"), lit(seed))).as(s"m$seed")): _*)

    // band keys: (band index, hash of that signature slice); candidates are
    // generated as bare (id_a, id_b) pairs — the shingle-hash arrays are
    // re-joined AFTER pair dedup so the wide arrays never ride the candidate
    // shuffle (at scale the candidate set is orders of magnitude larger than
    // the corpus, so this is the difference between GBs and TBs of shuffle).
    val bandCols = (0 until bands).map { b =>
      xxhash64(lit(b) +: (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"m$i")): _*)
    }
    val banded = sig.select(
      col("id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bh")))
    val candidates = banded.select(col("band"), col("bh"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bh"), col("id").as("id_b")), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    (hs, candidates)
  }

  /** Exact n-gram Jaccard pairs via a PREFIX-FILTERED inverted index (the
    * ppjoin family, Xiao et al. 2008 — public algorithm): under a global
    * total order (64-bit shingle hash), a pair with J >= t must share an
    * element inside each set's first n − ⌈t·n⌉ + 1 sorted elements, so only
    * that prefix is indexed — postings shrink by ~t and the candidate count
    * superlinearly. Hot shingles (> maxDocFreq docs) are dropped on top, the
    * standard stop-shingle guard against boilerplate at scale. Candidates are
    * verified with EXACT Jaccard over the full sorted-hash sets (longs, not
    * strings — 64-bit collisions are the only approximation, ~n²/2⁶⁴).
    */
  def ngramJaccard(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.3,
      shingleSize: Int = 5,
      maxDocFreq: Int = 1000): DataFrame = {
    val hs = df.select(
      col(idCol).as("id"),
      shingleHashes(col(textCol), shingleSize).as("hs"))
      .filter(size(col("hs")) > 0)

    // prefix = first (n − ⌈t·n⌉ + 1) sorted hashes; postings carry 16 bytes
    val prefLen = greatest(
      (size(col("hs")) - ceil(lit(threshold) * size(col("hs"))) + 1).cast("int"), lit(1))
    val index = hs.select(explode(slice(col("hs"), lit(1), prefLen)).as("g"), col("id"))
    val hot = index.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") > maxDocFreq)
    val cold = index.join(broadcast(hot), Seq("g"), "left_anti")

    val pairs = cold.select(col("g"), col("id").as("id_a"))
      .join(cold.select(col("g"), col("id").as("id_b")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
      .join(hs.select(col("id").as("id_a"), col("hs").as("sh_a")), Seq("id_a"))
      .join(hs.select(col("id").as("id_b"), col("hs").as("sh_b")), Seq("id_b"))

    verifyJaccard(pairs, threshold)
  }

  /** SimHash near-duplicates: ALL pairs within Hamming distance `maxHamming`
    * of each other — the recall guarantee is structural, not probabilistic.
    *
    * Candidate generation is combinatorial multi-index hashing (the
    * permute-and-block scheme of Manku et al. WWW'07 / Norouzi et al. MIH):
    * the 64-bit simhash is split into `blocks` bit-blocks; a pair differing
    * in ≤ h bits differs in ≤ h blocks, so at least blocks−h blocks agree —
    * therefore indexing every (blocks−h)-subset of blocks guarantees every
    * qualifying pair shares at least one index key (pigeonhole, exact).
    * `blocks` is chosen as the LARGEST count with C(blocks, h) ≤ tableCap:
    * more blocks → wider keys (64·(blocks−h)/blocks bits → exponentially
    * more buckets, the fix for r2's 65k-bucket quadratic blowup) at the cost
    * of C(blocks, h) index entries per row. Candidates are verified with an
    * exact popcount, so the output is exact for any radius — the r2 contract
    * violation (silent recall loss above hamming 3) is gone by construction.
    *
    * Cost grows combinatorially with maxHamming (h=3 at the default cap →
    * 56 keys/row of 40 bits; h beyond ~8 degenerates toward narrow keys) —
    * large radii are fundamentally expensive in any exact scheme.
    *
    * `tableCap` trades index entries for key width: the default 64 picks 8
    * blocks (56 keys/row, 40-bit keys) over r8's 32 (6 blocks, 20 keys,
    * 32-bit keys) — measured at 10× (50 k docs) the wider keys cut
    * candidates 2.35× (3.20 M → 1.36 M) at byte-identical output (recall
    * is pigeonhole-structural, not tuned), and at 50× the candidate term
    * dominates the whole tier (SCALING.md). 128 (10 blocks, 120 keys)
    * halves candidates again but trips the codegen method-size fallback.
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      tableCap: Int = 64): DataFrame = {
    val h = df.select(col(idCol).as("id"), expr(s"simHash($textCol)").as("h"))
    simhashPairsFromHashes(h, maxHamming, tableCap)
  }

  /** Banding + verification over precomputed (id, h: long) simhashes —
    * separated so specs can plant hashes at exact Hamming distances.
    */
  def simhashPairsFromHashes(
      h: DataFrame, maxHamming: Int, tableCap: Int = 64): DataFrame =
    simhashCandidatesFromHashes(h, maxHamming, tableCap)
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")

  /** Candidate pairs (pre popcount verification) — exposed for the scale
    * harness's candidate-growth measurements.
    */
  private[graft] def simhashCandidatesFromHashes(
      h: DataFrame, maxHamming: Int, tableCap: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    def choose(n: Int, r: Int): Long = {
      val rr = math.min(r, n - r)
      (1 to rr).foldLeft(1L)((acc, i) => acc * (n - rr + i) / i)
    }
    // largest block count whose subset count stays within tableCap
    val blocks = (maxHamming + 1 to 64)
      .takeWhile(k => choose(k, math.min(maxHamming, k)) <= tableCap)
      .lastOption.getOrElse(maxHamming + 1)
    // split 64 bits into `blocks` contiguous blocks (widths differ by ≤ 1)
    val bounds = (0 until blocks).map { i =>
      val off = i * 64 / blocks
      (off, (i + 1) * 64 / blocks - off)
    }
    val blockCols = bounds.map { case (off, w) =>
      val mask = if (w >= 64) -1L else (1L << w) - 1
      shiftrightunsigned(col("h"), off).bitwiseAND(lit(mask))
    }
    val keyCols = (0 until blocks).combinations(blocks - maxHamming).toSeq
      .zipWithIndex.map { case (combo, i) =>
        xxhash64(lit(i) +: combo.map(blockCols): _*)
      }
    val keyed = h.select(col("id"), col("h"), explode(array(keyCols: _*)).as("k"))
    val a = keyed.select(col("k"), col("id").as("id_a"), col("h").as("h_a"))
    val b = keyed.select(col("k"), col("id").as("id_b"), col("h").as("h_b"))
    a.join(b, Seq("k"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Embedding-cosine near-duplicates: pairs with cosine >= threshold,
    * candidates from coarse LSH buckets (see [[Similarity.hyperplaneLsh]]).
    *
    * The bucket join ships ONLY (bucket, id) — the r8 DedupScaleBench run
    * caught the previous shape (vectors riding the candidate join) at 2.5 GB
    * of shuffle for a 20 k-vector corpus; with the candidate set id-only and
    * vectors re-joined after pair dedup (the same device minhashLsh uses for
    * its shingle arrays), the candidate shuffle is 16 bytes per pair and the
    * vector shuffle is one row per SURVIVING distinct pair side.
    */
  def embeddingNearDup(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      bits: Int = 12,
      bands: Int = 1): DataFrame = {
    val keyed =
      if (bands <= 1)
        Similarity.hyperplaneSignature(df, vecCol, idCol, bits)
          .select(col("id"), col("v"), lit(0).as("band"), col("bucket").as("key"))
      else Similarity.hyperplaneBands(df, vecCol, idCol, bits, bands)
    val sig = keyed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vecs = sig.select("id", "v").dropDuplicates("id")
    val a = sig.select(col("band"), col("key"), col("id").as("id_a"))
    val b = sig.select(col("band"), col("key"), col("id").as("id_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cos", cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Connected components over a near-duplicate pair set: assigns every
    * vertex the MINIMUM id reachable through the pair graph, i.e. the
    * duplicate-cluster id — the step a production dedup pipeline runs AFTER
    * pair generation, so "A≈B, B≈C" collapses to one kept document even when
    * (A, C) was never emitted as a pair.
    *
    * Algorithm: iterative min-label propagation (the dataflow form of
    * label-propagation CC, cf. Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC 2014). Each round shuffles only the EDGE
    * set — for near-dup graphs that is orders of magnitude smaller than the
    * corpus — and rounds needed = cluster diameter, which for duplicate
    * clusters (dense, star-like) is almost always ≤ 3. The loop is
    * driver-controlled with per-round persist and an exact convergence check
    * (count of changed labels); lineage is cut every round by the persist,
    * so 100 iterations would not build a 100-deep plan.
    *
    * Input: pairs with (aCol, bCol); output: (id, cluster) with cluster =
    * min reachable id. Vertices not present in any pair are absent (they are
    * their own cluster by definition — join back with a coalesce for the
    * full corpus labeling, see [[dedupByClusters]]).
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxIter: Int = 25): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // symmetric edge list, cached once: both propagation directions
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id"), col("src").as("cluster"))
      .distinct()
      .persist(MEMORY_AND_DISK)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // candidate label for each dst: the smallest label of any neighbor
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("cluster"))
      val next = viaNeighbor.union(labels)
        .groupBy("id").agg(min("cluster").as("cluster"))
        .persist(MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("cluster", "old"), Seq("id"))
        .filter(col("cluster") < col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    edges.unpersist()
    labels
  }

  /** Full near-dup dedup: keep ONE document per duplicate cluster (the
    * smallest id), where clusters are the connected components of `pairs`.
    * Documents in no pair keep themselves. One broadcast-sized join against
    * the corpus when the pair set is small (the common case), no shuffle of
    * the document payload.
    */
  def dedupByClusters(
      df: DataFrame,
      pairs: DataFrame,
      idCol: String,
      aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    df.join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("__cluster", coalesce(col("cluster"), col(idCol)))
      .filter(col(idCol) === col("__cluster"))
      .drop("cluster", "__cluster")
  }

  /** SPAN-level exact dedup — drop repeated paragraphs/sentences CORPUS-WIDE,
    * keeping each span's first occurrence (smallest (id, position)): the
    * repeated-boilerplate removal of Lee et al. 2021 ("Deduplicating
    * Training Data Makes Language Models Better"), at span rather than
    * suffix granularity. Spans shorter than `minChars` are never deduped
    * (dropping every repeated "Thanks." would mangle text, and short spans
    * are exactly where cross-doc repetition is benign).
    *
    * Reassembly joins kept spans with `sep`, i.e. separator runs are
    * normalized — the standard contract for split-based span dedup.
    *
    * Scale shape: ONE shuffle keyed by the span digest (the keep-first
    * window — only (digest, id, pos, span) rows move, never whole
    * documents), then one per-id groupBy to reassemble; both map-side
    * combined. Returns (id, text, n_spans, n_kept).
    *
    * Skew note (ADVICE r10): the keep-first window partitions by span
    * digest, so EVERY occurrence of a dominant boilerplate span lands in
    * one partition — correctness is unaffected, but wall-clock degrades on
    * heavy-tailed span distributions (window partitions get no AQE skew
    * split). If a corpus is known to carry mega-duplicated spans, lift the
    * first-occurrence computation into a groupBy(digest).agg(min(struct(
    * id, pos))) — map-side combined, skew-immune — and join it back
    * (an AQE-skew-splittable join); at typical boilerplate frequencies
    * (≤ ~1e6 occurrences) the single-window form here is faster.
    */
  def dedupSpans(
      df: DataFrame, textCol: String, idCol: String,
      sep: String = "\\n+", joinSep: String = "\n",
      minChars: Int = 20): DataFrame = {
    val spans = df
      .select(col(idCol).as("id"),
        posexplode(filter(split(col(textCol), sep), x => x =!= ""))
          .as(Seq("pos", "span")))
    val w = Window.partitionBy(md5(col("span"))).orderBy(col("id"), col("pos"))
    val keep = length(col("span")) < minChars || col("__rn") === 1
    // ONE aggregation over the ranked spans: conditional counts/collects do
    // the kept/total split (collect_list drops the nulls `when` produces),
    // so the corpus is split and exploded once, with no second scan and no
    // rejoin — and a doc whose EVERY span was a known duplicate still
    // appears (empty text, n_kept 0)
    spans
      .withColumn("__rn", row_number().over(w))
      .groupBy("id")
      .agg(
        array_join(transform(
          array_sort(collect_list(when(keep, struct(col("pos"), col("span"))))),
          s => s.getField("span")), joinSep).as(textCol),
        count(lit(1)).as("n_spans"),
        count(when(keep, 1)).as("n_kept"))
      .select(col("id"), col(textCol), col("n_spans"), col("n_kept"))
  }

  /** Exact-Jaccard verification over the candidates' sorted hash arrays —
    * one merge-pass kernel per pair (r11; the array_intersect form was
    * interpreted AND duplicated into the pushed threshold filter), same
    * int operands and division → bit-identical jaccard values.
    */
  private[graft] def verifyJaccard(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("jaccard", jaccardSortedLongs(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** SemDeDup-style CLUSTER-SCOPED embedding dedup (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): k-means the embedding space, then compare pairs only
    * WITHIN a cluster and drop every row with a higher-similarity-than-τ
    * neighbor of smaller id. Complements [[embeddingNearDup]]: hyperplane
    * bands are data-oblivious (recall degrades on clustered corpora — the
    * r8 measurement), while the learned quantizer concentrates true
    * neighbors into the same cell by construction.
    *
    * Determinism: the quantizer is [[Similarity.ivfTrain]]'s data-ordered
    * deterministic Lloyd, assignment is a pure projection, and the drop
    * rule ("∃ ε-neighbor with smaller id in my cell") is order-free — the
    * kept set is a pure function of the corpus (the q146 oracle replays
    * quantizer, assignment, and drop rule in SQL). Divergence from the
    * paper noted: SemDeDup keeps the example with LOWEST similarity to the
    * cluster centroid; we keep the smallest id — any deterministic
    * representative satisfies the method's purpose, and id order is
    * engine-portable.
    *
    * Scale shape: one cell-keyed self-join, O(Σ cell_i²) pair work — the
    * SemDeDup design point (kCells chosen so cells stay pairwise-tractable;
    * the paper runs 50k clusters over 5B embeddings). The corpus is never
    * compared across cells; a skewed mega-cell is capped by raising kCells
    * (cells shrink ∝ k) or pre-splitting on a secondary hyperplane bit.
    * `kCells = 0` (default, r12) derives ≈√n cells from a corpus count
    * ([[Similarity.autoCells]]) so the O(Σ cell²) guarantee no longer
    * depends on the caller remembering the paper's tuning — Σ cell² stays
    * ~n^1.5 at any corpus size; pass kCells explicitly to pin it.
    * Returns (cell, id) of KEPT rows.
    */
  def semDedup(
      df: DataFrame, vecCol: String, idCol: String,
      tau: Double = 0.95, kCells: Int = 0, iters: Int = 2,
      trainFraction: Double = 1.0, keep: String = "minId"): DataFrame = {
    require(keep == "minId" || keep == "centroidFar",
      s"keep must be minId or centroidFar: $keep")
    val cent = Similarity.ivfTrain(df, vecCol, idCol,
      Similarity.resolveCells(df, kCells), iters, trainFraction)
    val idx0 = Similarity.ivfIndex(df, vecCol, idCol, cent)
    // keep="centroidFar" is the PAPER's rule (SemDeDup §2.2: within each
    // ε-ball keep the example with LOWEST cosine similarity to the cluster
    // centroid — the least-prototypical representative); the drop order
    // becomes (centroid_sim asc, id asc) lexicographic instead of plain id.
    // Ties (exact replicas have bit-equal sims) fall through to the id.
    val idx1 =
      if (keep == "minId") idx0
      else idx0.join(broadcast(cent.select(col("cell"), col("c"))), Seq("cell"))
        .withColumn("sim", cosineSimilarity(col("v"), col("c"))).drop("c")
    // r19 (q146 profile): two per-row costs were being paid per PAIR or per
    // REFERENCE instead of once.
    //  - The row norms were recomputed inside the cosine kernel for each of
    //    the O(Σ cell²) pairs; they are per-ROW quantities — computed here
    //    once, the pair filter reduces to one dot product and a division.
    //    sqrt(Σx²) sums in the same element order the fused kernel used, so
    //    dot/(sn_a·sn_b) is bit-equal to the old cosineSimilarity call and
    //    every hash-checked oracle stands.
    //  - The assignment index is consumed THREE times (both pair-join sides
    //    and the survivor anti-join); unpersisted, each reference re-ran the
    //    float→double cast + argmin assignment over the corpus (measured
    //    ~1.1 s of q146's 2.8 s at sf1). The operator is already eager
    //    (ivfTrain collects centroids per Lloyd iteration), and the paper's
    //    own pipeline materializes the cluster assignment, so persisting it
    //    is the intended shape — MEMORY_AND_DISK keeps the 100 TB case
    //    spillable, and the entry is GC-cleaned with the returned frame.
    val idx = idx1.withColumn("sn", l2Norm(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rank: Seq[Column] =
      if (keep == "minId") Seq(col("id")) else Seq(col("sim"), col("id"))
    def side(sfx: String) =
      idx.select(col("cell") +: col("id").as(s"id$sfx") +: col("v").as(s"v$sfx") +:
        col("sn").as(s"sn$sfx") +:
        (if (keep == "minId") Seq.empty[Column]
         else Seq(col("sim").as(s"sim$sfx"))): _*)
    val earlier = // a precedes b in the keep order
      if (keep == "minId") col("id_a") < col("id_b")
      else col("sim_a") < col("sim_b") ||
        (col("sim_a") === col("sim_b") && col("id_a") < col("id_b"))
    val dropped = side("_a").join(side("_b"), Seq("cell"))
      .filter(col("id_a") =!= col("id_b")).filter(earlier)
      .filter(dotProduct(col("v_a"), col("v_b")) /
        (col("sn_a") * col("sn_b")) >= tau)
      .select(col("id_b").as("id")).distinct()
    idx.join(dropped, Seq("id"), "left_anti").select(col("cell"), col("id"))
  }
}
