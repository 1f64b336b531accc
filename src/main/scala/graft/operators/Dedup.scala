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

  /** EXACT-DUPLICATE COLLAPSE (r19 verdict #1a). Rows whose content key
    * (`keyCols`: the shingle-hash set / simhash / embedding vector) is
    * identical are all mutual duplicates AND indistinguishable to every
    * candidate-generation scheme in this file — identical keys produce
    * identical signatures, band keys, buckets and cells, so an m-copy
    * cluster used to inject C(m,2) candidate pairs into ONE reducer's
    * bucket (the r19 sf10 curve: exact-replica fixtures pinned one cell at
    * 91.6 GB / 61 s). Collapsing each group to its MINIMUM-id
    * representative makes the pairwise stage's input one row per DISTINCT
    * content; member results are then fanned back: cross-group pairs
    * inherit their representatives' verified value (jaccard / cosine /
    * hamming is a pure function of the content keys), within-group pairs
    * are emitted directly with the self-value the verification kernel
    * yields on equal inputs — no candidate generation, no verification, no
    * wide arrays on the shuffle for any of them.
    *
    * One keyed window, no join. Scalar keys (the 64-bit simhash) partition
    * the window directly; ARRAY keys (shingle-hash sets, embedding
    * vectors) partition by their 16-byte canonical digest
    * ([[graft.functions.GraftFunctions.arrayDigest]], r21) — the window's
    * corpus-sized exchange then hashes/sorts a fixed-width key instead of
    * the raw array (a shingle set is hundreds of longs, an embedding 512 B;
    * at 100 TB the array-keyed sort dominates). Digest-equality partitions
    * rows exactly as the raw values do (the kernel canonicalizes ±0.0/NaN
    * the way Spark's own float-key normalization does; 128 bits is the
    * same collision class as the md5 key [[exactKeepFirst]] stands on).
    * Adds `rep` (group minimum id) and `grpn` (group size) to every row.
    */
  private def withExactGroups(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val parts = keyCols.map { c =>
      df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.ArrayType => arrayDigest(col(c))
        case _ => col(c)
      }
    }
    val w = Window.partitionBy(parts: _*)
    df.withColumn("rep", min(col(idCol)).over(w))
      .withColumn("grpn", count(lit(1)).over(w))
  }

  /** Fan representative-level verified pairs back to member-level pairs:
    * every (member of a, member of b) combination inherits the reps' value,
    * reordered so id_a < id_b (member ids of different groups interleave).
    * `members` is (rep, id); `repPairs` is (id_a, id_b, valueCol) over reps.
    */
  private def expandRepPairs(
      repPairs: DataFrame, members: DataFrame, valueCol: String): DataFrame =
    repPairs
      .join(members.select(col("rep").as("id_a"), col("id").as("__ma")), Seq("id_a"))
      .join(members.select(col("rep").as("id_b"), col("id").as("__mb")), Seq("id_b"))
      .select(least(col("__ma"), col("__mb")).as("id_a"),
        greatest(col("__ma"), col("__mb")).as("id_b"), col(valueCol))

  /** Within-group member pairs (id_a < id_b) of every duplicate group,
    * carrying `value` as the pair value — the clique the exact-duplicate
    * contract implies. Quadratic ONLY in output rows (which the true pair
    * set contains anyway); no shuffle carries anything wider than ids.
    */
  private def cliquePairs(
      groups: DataFrame, value: Column, valueName: String): DataFrame = {
    val m = groups.filter(col("grpn") > 1)
    m.select(col("rep"), col("id").as("id_a"))
      .join(m.select(col("rep"), col("id").as("id_b")), Seq("rep"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), value.as(valueName))
  }

  /** Default per-(band, bucket) membership cap for [[minhashLsh]]: a bucket
    * of B members emits C(B,2) candidate pairs from ONE reducer task, so an
    * UN-collapsible degenerate bucket (near-identical but not bit-identical
    * boilerplate — exact replicas never get here, [[withExactGroups]] folds
    * them first) must be bounded for the job to finish: 5 000 keeps the
    * worst single-task pair fan-out at ~12.5 M pairs. When the cap binds the
    * smallest-id members are kept and [[CapWarnings]] logs the cut loudly on
    * every materialization — no silent truncation (r19 verdict #1b).
    */
  val defaultBandBucketCap: Int = 5000

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
      rowsPerBand: Int = 2,
      maxBucketSize: Int = defaultBandBucketCap): DataFrame = {
    val (hs, candidates) =
      minhashParts(df, textCol, idCol, shingleSize, bands, rowsPerBand, maxBucketSize)
    minhashFanBack(hs, candidates, threshold)
  }

  /** Verification + member fan-back over [[minhashParts]] output — split
    * out so the scale harness can count candidates and build the final
    * pair set from ONE pipeline (and unpersist `hs` afterwards).
    *
    * Cross-group pairs inherit the reps' verified jaccard (a pure function
    * of the two shingle SETS); within-group pairs have identical sets —
    * intersection = union, so the kernel's value is exactly 1.0 and needs
    * no candidate generation, verification, or array shuffle. threshold >
    * 1.0 keeps even the cliques out (jaccard can never exceed 1.0),
    * matching the uncollapsed pipeline's behavior.
    */
  private[graft] def minhashFanBack(
      hs: DataFrame, candidates: DataFrame, threshold: Double): DataFrame = {
    val withSets = candidates
      .join(hs.select(col("id").as("id_a"), col("hs").as("sh_a")), Seq("id_a"))
      .join(hs.select(col("id").as("id_b"), col("hs").as("sh_b")), Seq("id_b"))
    val repPairs = verifyJaccard(withSets, threshold)
    val cross = expandRepPairs(repPairs, hs.select(col("rep"), col("id")), "jaccard")
    if (threshold > 1.0) cross
    else cross.unionByName(cliquePairs(hs, lit(1.0), "jaccard"))
  }

  /** The two stages of [[minhashLsh]] before verification — exposed so the
    * scale harness (DedupScaleBench) can measure the CANDIDATE set, the
    * quantity whose growth decides whether the scheme survives 100 TB.
    * Returns (persisted shingle-hash sets with rep/grpn group columns,
    * deduped candidate id pairs over exact-duplicate REPRESENTATIVES).
    */
  private[graft] def minhashParts(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int,
      bands: Int,
      rowsPerBand: Int,
      maxBucketSize: Int = defaultBandBucketCap): (DataFrame, DataFrame) = {
    val k = bands * rowsPerBand
    // Tokenize → shingle → hash exactly ONCE — the fused shingleHashes
    // kernel (r11; was interpreted slice/zip/concat_ws + hash lambdas) —
    // into a sorted array of 64-bit shingle hashes. Verification runs over
    // the long arrays directly — Jaccard over distinct 64-bit hashes
    // equals Jaccard over the string shingles up to ~n²/2⁶⁴ collisions,
    // and longs shuffle ~10× smaller than the shingle strings.
    // r20: [[withExactGroups]] marks each row's exact-duplicate group
    // (identical hs arrays) before anything else; signatures, banding, and
    // candidate pairs run over REPRESENTATIVES only. The frame carries
    // rep/grpn so [[minhashLsh]] can fan verified pairs back out.
    // r21 (verdict #6): NOT persisted. The r19/r20 shape cached this frame
    // MEMORY_AND_DISK and never unpersisted it — the exact cross-run cache
    // leak the r19 verdict ordered out of semDedup (warm bench runs re-hit
    // the previous run's blocks). Single-pass now comes from the plan
    // instead: every consumer (signature pass, the two verification-join
    // sides, the member fan-back, the cliques) contains the SAME
    // digest-keyed window subtree, so ReuseExchange materializes the
    // shingle kernel once and replays its exchange output; only the
    // post-exchange window/sort re-runs per consumer. A caller that wants
    // a checkpoint (the scale harness measures candidate counts mid-
    // pipeline) persists and unpersists at its own level.
    val hs = withExactGroups(
      df.select(
        col(idCol).as("id"),
        shingleHashes(col(textCol), shingleSize).as("hs"))
        .filter(size(col("hs")) > 0),
      "id", Seq("hs"))
    val repsOnly = hs.filter(col("id") === col("rep"))
    // The k minhash permutations remix the base hash numerically (xxhash64
    // over (long, seed)) instead of re-hashing the string k times. The
    // signature is computed by explode → groupBy(id) with k min() aggregates
    // rather than k array_min(transform(...)) columns: projection collapse
    // would inline the shingle pipeline into each of the k signature
    // expressions, while the exploded aggregation evaluates it once per
    // shingle and shuffles only (id, 8-byte hash) — also the plan shape that
    // scales: map-side partial min makes the shuffle |corpus|-sized.
    val explodedHashes = repsOnly.select(col("id"), explode(col("hs")).as("h"))
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
    // r20 per-bucket cap (verdict #1b): a (band, bh) bucket of B members
    // fans out C(B,2) pairs in ONE reducer task, so a degenerate bucket of
    // near-identical-but-not-bit-identical members (exact replicas never
    // reach here — collapsed above) is bounded to its `maxBucketSize`
    // smallest ids. Deterministic (id order), and every materialization of
    // a capped result logs the cut loudly via [[CapWarnings]].
    // ONE observed+capped frame self-joined (r20 perf): observing only one
    // join side puts a CollectMetrics node in that side's subtree and not
    // the other's, so the two sides stop canonicalizing identically and the
    // whole shingle→signature→banding pipeline materializes TWICE. The same
    // CollectMetrics node appearing on both sides of the self-join is one
    // observation, and exchange reuse keeps the pipeline single-pass.
    val wb = Window.partitionBy(col("band"), col("bh")).orderBy(col("id"))
    val capped = CapWarnings.observed(
        banded.withColumn("__brank", row_number().over(wb)), "__brank",
        maxBucketSize, "minhashLsh band bucket (members/bucket)")
      .filter(col("__brank") <= maxBucketSize)
    val candidates = capped.select(col("band"), col("bh"), col("id").as("id_a"))
      .join(capped.select(col("band"), col("bh"), col("id").as("id_b")), Seq("band", "bh"))
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
    // r20: exact-duplicate collapse, same device as [[minhashParts]]. One
    // semantic shift, documented: `maxDocFreq` now counts a shingle's
    // document frequency over DISTINCT shingle-sets — a 1 000-copy
    // boilerplate cluster no longer pushes its own shingles over the hot
    // threshold (which used to cost the ORIGINAL recall on exactly the
    // pairs a dedup pipeline exists to find).
    // r21 (verdict #6): un-persisted, same reasoning as [[minhashParts]] —
    // the digest-keyed window exchange is the single materialization point
    // shared by the index side, both verification-join sides, the fan-back
    // and the cliques.
    val hs = withExactGroups(
      df.select(
        col(idCol).as("id"),
        shingleHashes(col(textCol), shingleSize).as("hs"))
        .filter(size(col("hs")) > 0),
      "id", Seq("hs"))
    val repsOnly = hs.filter(col("id") === col("rep"))

    // prefix = first (n − ⌈t·n⌉ + 1) sorted hashes; postings carry 16 bytes
    val prefLen = greatest(
      (size(col("hs")) - ceil(lit(threshold) * size(col("hs"))) + 1).cast("int"), lit(1))
    val index = repsOnly.select(explode(slice(col("hs"), lit(1), prefLen)).as("g"), col("id"))
    val hot = index.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") > maxDocFreq)
    val cold = index.join(broadcast(hot), Seq("g"), "left_anti")

    val pairs = cold.select(col("g"), col("id").as("id_a"))
      .join(cold.select(col("g"), col("id").as("id_b")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
      .join(hs.select(col("id").as("id_a"), col("hs").as("sh_a")), Seq("id_a"))
      .join(hs.select(col("id").as("id_b"), col("hs").as("sh_b")), Seq("id_b"))

    val repPairs = verifyJaccard(pairs, threshold)
    val cross = expandRepPairs(repPairs, hs.select(col("rep"), col("id")), "jaccard")
    if (threshold > 1.0) cross
    else cross.unionByName(cliquePairs(hs, lit(1.0), "jaccard"))
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
    *
    * r20: rows with the SAME 64-bit simhash collapse to their min-id
    * representative before banding (identical hashes share every index key,
    * so an m-copy cluster used to put C(m,2) pairs in each of its
    * C(blocks, h) buckets); member pairs fan back with the inherited
    * hamming — within-group pairs at exactly h ⊕ h = 0.
    */
  def simhashPairsFromHashes(
      h: DataFrame, maxHamming: Int, tableCap: Int = 64): DataFrame = {
    val base = withExactGroups(h.select(col("id"), col("h")), "id", Seq("h"))
    val repPairs =
      simhashCandidatesFromHashes(base.filter(col("id") === col("rep"))
          .select("id", "h"), maxHamming, tableCap)
        .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
        .filter(col("hamming") <= maxHamming)
        .select("id_a", "id_b", "hamming")
    val cross = expandRepPairs(repPairs, base.select(col("rep"), col("id")), "hamming")
    // null hashes never pair in the uncollapsed scheme (null ⊕ null → null
    // fails `<= maxHamming`), so their groups emit no cliques either
    cross.unionByName(
      cliquePairs(base.filter(col("h").isNotNull), bit_count(lit(0L)), "hamming"))
  }

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
    // r20: exact-duplicate vectors collapse to representatives before the
    // signature pass — identical embeddings match EVERY band by
    // construction, so an m-copy cluster used to contribute C(m,2)
    // candidates per band to one bucket's reducer. Same fan-back contract
    // as [[minhashLsh]]; within-group pairs carry the value the kernel
    // itself yields on an identical pair (cosineSimilarity(v, v) — ≈1 but
    // NOT forced to literal 1.0: sqrt rounding keeps it bit-equal to what
    // the uncollapsed pipeline produced), evaluated once per group.
    // r21 (verdict #6): un-persisted — the r19/r20 persists (base AND the
    // signature frame) were never unpersisted, the cross-run cache-leak
    // shape the r19 verdict ordered out of semDedup. The digest-keyed
    // window exchange in [[withExactGroups]] is the shared materialization
    // point for every consumer of `base`, and the two bucket-join sides of
    // `sig` are projections of one identical subtree (ReuseExchange).
    val base = withExactGroups(
      df.select(col(idCol).as("id"), col(vecCol).as("v")), "id", Seq("v"))
    val repsDf = base.filter(col("id") === col("rep")).select("id", "v")
    val sig =
      if (bands <= 1)
        Similarity.hyperplaneSignature(repsDf, "v", "id", bits)
          .select(col("id"), col("v"), lit(0).as("band"), col("bucket").as("key"))
      else Similarity.hyperplaneBands(repsDf, "v", "id", bits, bands)
    // one row per rep id by construction (reps are distinct ids and every
    // sig row of an id carries the same v) — the old dropDuplicates("id")
    // over `sig` paid a corpus-sized aggregate exchange for a no-op
    val vecs = repsDf
    val a = sig.select(col("band"), col("key"), col("id").as("id_a"))
    val b = sig.select(col("band"), col("key"), col("id").as("id_b"))
    val repPairs = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cos", cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
    val cross = expandRepPairs(repPairs, base.select(col("rep"), col("id")), "cos")
    // per-group self-cosine through the SAME kernel and the SAME `>=`
    // comparison (Spark NaN-ordering included: a zero-norm group's NaN
    // self-cosine sorts above the threshold and pairs, exactly as the
    // uncollapsed pipeline paired its identical members), evaluated once
    // per group instead of once per member pair
    val selfQual = base.filter(col("grpn") > 1).filter(col("id") === col("rep"))
      .withColumn("selfcos", cosineSimilarity(col("v"), col("v")))
      .filter(col("selfcos") >= threshold)
      .select(col("rep"), col("selfcos"))
    val m = base.select(col("rep"), col("id"))
    val cliques = selfQual
      .join(m.select(col("rep"), col("id").as("id_a")), Seq("rep"))
      .join(m.select(col("rep"), col("id").as("id_b")), Seq("rep"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("selfcos").as("cos"))
    cross.unionByName(cliques)
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
      trainFraction: Double = 1.0, keep: String = "minId",
      maxCellReps: Int = 1 << 17): DataFrame = {
    require(keep == "minId" || keep == "centroidFar",
      s"keep must be minId or centroidFar: $keep")
    val paper = keep == "centroidFar"
    val cent = Similarity.ivfTrain(df, vecCol, idCol,
      Similarity.resolveCells(df, kCells), iters, trainFraction)

    // ---- r20 (verdict #1a): EXACT-DUPLICATE COLLAPSE, corpus-side FIRST. --
    // Same eligibility as ivfIndex (clean array<double>), but the corpus is
    // collapsed to one row per DISTINCT vector BEFORE any assignment work:
    // cell, sn, sim, and every pairwise cosine are pure functions of the
    // vector, so grouping by v alone partitions rows exactly as the old
    // (cell, v, sn[, sim]) keys did, and computing those columns on the
    // collapsed frame is bit-identical. This is value-preserving, not an
    // approximation: for any member m of group B the original rule "∃ row x
    // in the cell, x ≠ m, x earlier than m in the keep order, cos(x, m) ≥ τ"
    // decomposes exactly into
    //   (a) x inside B:  cos = B's self-cosine; an earlier x exists iff
    //       m is not B's min-id member (sims are bit-equal inside B, so
    //       the keep order falls through to the id either way);
    //   (b) x in another group A: cos(x, m) = cos(rep_A, rep_B), and A has
    //       an earlier-than-m member iff rep_A is earlier than m (rep is
    //       A's keep-order minimum — again because sims are bit-equal
    //       inside A).
    // So the survivor test needs only each group's self-cosine and the
    // keep-order MINIMUM over its τ-neighbor groups' representatives — the
    // witness is a min, so one aggregate per victim group replaces the
    // distinct-over-pairs, and fan-back to members is a linear join.
    // SemDeDup §2.2 collapses duplicates within ε-balls; representatives
    // are semantics-preserving for it (here: bit-exact, per the above).
    //
    // Why collapse-first (r20 perf, the mid-round 4× regression): grouping
    // AFTER assignment put the full k-means expression under every consumer
    // subtree — the un-persisted pipeline (r19 verdict #3 removed the
    // cache) re-ran the per-corpus-row assignment once per consumer, and
    // the join planner's inferred isnotnull(cell) pushed the WHOLE
    // assignment expression into one side's scan as a filter, breaking
    // exchange reuse between the pair sides. Collapse-first leaves ONE
    // corpus-sized exchange (keyed by v, map-side combined); assignment,
    // norms and windows run over distinct vectors only, the pair sides
    // share that subtree via ReuseExchange (cell is KnownNotNull — see
    // Similarity.withCell — so no inferred filter splits them), and the
    // fan-back re-reads the corpus WITHOUT any assignment work. Nothing is
    // persisted: no MEMORY_AND_DISK entry outlives the operator
    // (spec-asserted via getPersistentRDDs).
    // r21 (verdict #2): the collapse and the fan-back key on a 16-byte
    // CANONICAL DIGEST of the vector ([[graft.functions.GraftFunctions
    // .arrayDigest]]) instead of the raw array<double>. Digest-equality
    // partitions rows exactly as groupBy(v) did (the kernel canonicalizes
    // ±0.0/NaN the way Spark's NormalizeFloatingNumbers canonicalizes
    // array grouping keys; 128 bits ≈ the md5 key exactKeepFirst stands
    // on), so the grouping — and therefore every downstream value — is
    // unchanged, while the corpus-sized exchanges hash/sort/compare a
    // fixed-width key (at 100 TB the 512 B/row vector-keyed shuffle was
    // the dominant projected cost) and the fan-back exchange sheds the
    // vector payload entirely: it ships (id, digest) and nothing else.
    // knownNotNull on the digest, same device (and same reason) as
    // Similarity.withCell's assignment column: the digest of an already-
    // null-filtered vector can never be null, and leaving it nullable makes
    // join planning push an isnotnull(arraydigest128(cast(...))) filter
    // into both corpus scans — a second full digest+cast evaluation per row
    // that also breaks canonicalization between the collapse side and the
    // fan-back side (measured: +2 Exchange, −2 ReusedExchange).
    val e = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
      .select(col("id"), col("v"),
        org.apache.spark.sql.graftbridge.ColumnBridge.knownNotNull(
          arrayDigest(col("v"))).as("dig"))
    // minIdVec = struct(min(id), min_by(v, id)) in ONE typed-imperative
    // buffer. min_by, NOT first: First is flagged non-deterministic (order-
    // dependent), which poisons the whole subtree's canonicalization — the
    // grouped exchange stops being reused across the pair sides and the
    // fan-back (measured: +2 Exchange, −2 ReusedExchange, task time 2×).
    // min_by(v, id) is deterministic and picks the REPRESENTATIVE's vector,
    // which is also bit-wise the value the old groupBy(v) key carried for
    // the group (members are elementwise-equal by construction). And ONE
    // kernel aggregate, NOT min + min_by (r21 sf1 profile): min_by's
    // array-typed buffer cannot live in an UnsafeRow, so the plan fell back
    // to SortAggregate — a full corpus sort before the partial AND final
    // aggregation, with the final Sort+SortAggregate replayed once per
    // consumer of this frame (measured 2× total task time). The typed-
    // imperative form plans as hash-based ObjectHashAggregate.
    val g0 = e.groupBy("dig").agg(minIdVec(col("v"), col("id")).as("rv"))
      .select(col("dig"), col("rv.rep").as("rep"), col("rv.v").as("v"))
    val gCell = Similarity.withCell(g0, "v", cent)
    // keep="centroidFar" is the PAPER's rule (SemDeDup §2.2: within each
    // ε-ball keep the example with LOWEST cosine similarity to the cluster
    // centroid — the least-prototypical representative); the drop order
    // becomes (centroid_sim asc, id asc) lexicographic instead of plain id.
    // Ties (exact replicas have bit-equal sims) fall through to the id.
    val gSim =
      if (!paper) gCell
      else gCell.join(broadcast(cent.select(col("cell"), col("c"))), Seq("cell"))
        .withColumn("sim", cosineSimilarity(col("v"), col("c"))).drop("c")
    // Per-row norms hoisted out of the pair kernel (r19, q146 profile):
    // sqrt(Σx²) sums in the same element order the fused kernel used, so
    // dot/(sn_a·sn_b) is bit-equal to the old cosineSimilarity call and
    // every hash-checked oracle stands.
    // The group's own content drops its non-representatives iff the SAME
    // kernel expression the pair filter uses passes on (v, v) — usually
    // ≈1 ≥ τ, but NOT forced: sqrt rounding and NaN ordering must match
    // the uncollapsed pipeline bit-for-bit.
    val gSelf = gSim.withColumn("sn", l2Norm(col("v")))
      .withColumn("selfdup",
        dotProduct(col("v"), col("v")) / (col("sn") * col("sn")) >= tau)

    // r20 (verdict #1b): keep-order rank inside each cell bounds the pair
    // stage — pairs whose EARLIER side ranks beyond `maxCellReps` are
    // skipped (victims stay complete against every in-cap dropper), so a
    // cell of n distinct vectors does at most maxCellReps·n cosine checks
    // instead of C(n,2). Binding is loud ([[CapWarnings]]), never silent.
    // The observation wraps the SHARED ranked frame (not just the capped
    // side): both join sides then consume one identical subtree, so the
    // distinct-vector exchange materializes once (the same CollectMetrics
    // node appearing at several points of the DAG is one observation).
    val keepOrder: Seq[Column] =
      if (paper) Seq(col("sim"), col("rep")) else Seq(col("rep"))
    val wCell = Window.partitionBy(col("cell")).orderBy(keepOrder.map(_.asc): _*)
    val ranked = CapWarnings.observed(
      gSelf.withColumn("__crank", row_number().over(wCell)), "__crank",
      maxCellReps, "semDedup cell (distinct vectors/cell, earlier pair side)")
    val aSrc = ranked.filter(col("__crank") <= maxCellReps)
    def side(src: DataFrame, sfx: String) = src.select(
      col("cell") +: col("rep").as(s"rep$sfx") +: col("v").as(s"v$sfx") +:
        col("sn").as(s"sn$sfx") +: col("__crank").as(s"__crank$sfx") +:
        (if (paper) Seq(col("sim").as(s"sim$sfx")) else Seq.empty[Column]): _*)
    // each unordered group pair's cosine computed ONCE (rank_a < rank_b
    // enumerates it exactly once); both directions then feed the witness
    // aggregate, because a group later in the keep order can still drop a
    // HIGH-id member of an earlier group
    val cand = side(aSrc, "_a").join(side(ranked, "_b"), Seq("cell"))
      .filter(col("__crank_a") < col("__crank_b"))
      .filter(dotProduct(col("v_a"), col("v_b")) /
        (col("sn_a") * col("sn_b")) >= tau)
    val nbrs =
      if (!paper)
        cand.select(col("rep_b").as("rep"), col("rep_a").as("nbr"))
          .unionByName(cand.select(col("rep_a").as("rep"), col("rep_b").as("nbr")))
      else
        cand.select(col("rep_b").as("rep"),
            struct(col("sim_a").as("nsim"), col("rep_a").as("nid")).as("nbr"))
          .unionByName(cand.select(col("rep_a").as("rep"),
            struct(col("sim_b").as("nsim"), col("rep_b").as("nid")).as("nbr")))
    val minNbr =
      if (!paper) nbrs.groupBy("rep").agg(min(col("nbr")).as("nbrId"))
      else nbrs.groupBy("rep").agg(min(col("nbr")).as("n"))
        .select(col("rep"), col("n.nsim").as("nbrSim"), col("n.nid").as("nbrId"))

    // fan back: the keep-order-minimum τ-neighbor joins the GROUP-level
    // frame first (rep-keyed, one row per distinct vector — never the
    // corpus), then every corpus row picks up its group's verdict columns
    // BY DIGEST — one more plain corpus scan with no assignment work, and
    // the only corpus-sized exchange of the fan-back, carrying (id, 16 B
    // digest) and no vector; then one per-member comparison decides
    // survival; all linear, no distinct
    val meta = gSelf.select(
      col("dig") +: col("cell") +: col("rep") +: col("selfdup") +:
        (if (paper) Seq(col("sim")) else Seq.empty[Column]): _*)
      .join(minNbr, Seq("rep"), "left")
    val laterThanNbr =
      if (!paper) col("nbrId") < col("id")
      else col("nbrSim") < col("sim") ||
        (col("nbrSim") === col("sim") && col("nbrId") < col("id"))
    val droppedPred = (col("selfdup") && col("id") =!= col("rep")) ||
      (col("nbrId").isNotNull && laterThanNbr)
    e.select(col("id"), col("dig")).join(meta, Seq("dig"))
      .filter(!droppedPred)
      .select(col("cell"), col("id"))
  }
}
