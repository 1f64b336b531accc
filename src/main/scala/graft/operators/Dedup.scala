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
  *  - simhash: 64-bit simhash, banded into 4×16-bit chunks (pigeonhole: any
  *    pair within Hamming distance 3 shares a chunk; wider radii verified on
  *    candidates via popcount).
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
    val k = bands * rowsPerBand
    // Hash every shingle to a long ONCE; the k minhash permutations remix the
    // base hash numerically (xxhash64 over (long, seed)) instead of re-hashing
    // the string k times. The signature is computed by explode → groupBy(id)
    // with k min() aggregates rather than k array_min(transform(...)) columns:
    // projection collapse would inline the whole tokenize→shingle→hash
    // pipeline into each of the k signature expressions (k× recompute per
    // row), while the exploded aggregation evaluates it exactly once per
    // shingle and shuffles only (id, 8-byte hash) — also the plan shape that
    // scales: map-side partial min makes the shuffle |corpus|-sized.
    val sh = df.select(
      col(idCol).as("id"),
      array_distinct(shingles(tokenize(col(textCol)), shingleSize)).as("sh"))
      .filter(size(col("sh")) > 0)
    val shingleHashes = sh.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))
    val sig = shingleHashes.groupBy("id")
      .agg((0 until k).map(seed => min(xxhash64(col("h"), lit(seed))).as(s"m$seed")).head,
        (1 until k).map(seed => min(xxhash64(col("h"), lit(seed))).as(s"m$seed")): _*)

    // band keys: (band index, hash of that signature slice); candidates are
    // generated as bare (id_a, id_b) pairs — the shingle sets are re-joined
    // AFTER pair dedup so the wide arrays never ride the candidate shuffle
    // (at scale the candidate set is orders of magnitude larger than the
    // corpus, so this is the difference between GBs and TBs of shuffle).
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

    val withSets = candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    verifyJaccard(withSets, threshold)
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
      array_sort(array_distinct(
        transform(shingles(tokenize(col(textCol)), shingleSize), s => xxhash64(s)))).as("hs"))
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

  /** SimHash near-duplicates: pairs within `maxHamming` of each other,
    * candidate-generated by 16-bit chunk equality.
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 12): DataFrame = {
    val h = df.select(col(idCol).as("id"), expr(s"simHash($textCol)").as("h"))
    val chunked = h.select(col("id"), col("h"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("h"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("chunk", "ck")))
    val a = chunked.select(col("chunk"), col("ck"), col("id").as("id_a"), col("h").as("h_a"))
    val b = chunked.select(col("chunk"), col("ck"), col("id").as("id_b"), col("h").as("h_b"))
    a.join(b, Seq("chunk", "ck"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding-cosine near-duplicates: pairs with cosine >= threshold,
    * candidates from coarse LSH buckets (see [[Similarity.hyperplaneLsh]]).
    */
  def embeddingNearDup(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      bits: Int = 12): DataFrame = {
    val sig = Similarity.hyperplaneSignature(df, vecCol, idCol, bits)
    val a = sig.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = sig.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  private def verifyJaccard(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
}
