package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the dedup/ANN tier's scaling behavior (r7 verdict #2: the 100 TB
  * story was argued, not measured).
  *
  * `runMain graft.DedupScaleBench [srcDir] [factors]` replicates the sf0.1
  * documents/embeddings corpora in-memory at each factor (same scheme as
  * GenData: shifted ids; replica token appended to text → every source doc
  * gains factor−1 planted NEAR-duplicates; embeddings repeat exactly →
  * planted cosine-1 duplicates), then runs each operator end-to-end and
  * records wall time, total shuffle write bytes (stage-level task metrics),
  * CANDIDATE pair count, and verified output count.
  *
  * The claim under test is sub-quadratic candidate growth: an all-pairs
  * scheme grows candidates ∝ n², while the banded/blocked/bucketed schemes
  * should grow ∝ n · (planted duplicates per doc + collision rate). With
  * replication factor f over n₀ docs, true near-dup pairs grow ∝ n₀·f²/2
  * (every replica pair of the same source doc is a planted near-dup) — the
  * HONEST yardstick for candidates is therefore the true-pair count, not n
  * alone; sub-quadratic means candidates stay within a small multiple of
  * true pairs instead of tracking n²/2.
  *
  * Prints one JSON line per (operator, factor) and a summary table.
  */
object DedupScaleBench {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,10,50").split(",").map(_.toInt).toSeq
    // optional op filter (args(2), comma-separated) for re-running one leg
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-dedup-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    // worst single-stage execution-memory footprint (sum of task peaks per
    // stage, max over stages) — the number that blows up when a duplicate
    // cluster concentrates quadratic pair work in one reducer (r19 #1)
    val peakMem = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        peakMem.accumulateAndGet(
          sc.stageInfo.taskMetrics.peakExecutionMemory, (a, b) => math.max(a, b))
      }
    })
    // stage-completion events arrive asynchronously; drain before reading
    def drainAndRead(): Long = { Thread.sleep(400); shuffleBytes.get() }

    val results = scala.collection.mutable.ArrayBuffer.empty[String]

    def measure(op: String, factor: Int, n: Long)(body: => (Long, Long)): Unit = {
      if (!only.forall(_.contains(op))) return
      drainAndRead(); shuffleBytes.set(0); peakMem.set(0)
      val t0 = System.nanoTime()
      val (cand, out) = body
      val sec = (System.nanoTime() - t0) / 1e9
      val sb = drainAndRead()
      val line = f"""{"op":"$op","factor":$factor,"rows":$n,"candidates":$cand,""" +
        f""""output_pairs":$out,"sec":$sec%.3f,"shuffle_bytes":$sb,""" +
        f""""peak_stage_mem_bytes":${peakMem.get()}}"""
      println(line); results += line
    }

    for (f <- factors) {
      val docs0 = Tables.load(spark, src, "documents")
      val dSpan = docs0.agg(max("doc_id")).head().getLong(0) + 1
      val reps = broadcast(spark.range(f).toDF("__r"))
      val docs = (if (f == 1) docs0 else docs0.crossJoin(reps)
        .withColumn("doc_id", col("doc_id") + col("__r") * dSpan)
        .withColumn("text", when(col("__r") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("__r"))))
        .drop("__r"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = docs.count()

      val emb0 = Tables.load(spark, src, "embeddings")
      val vSpan = emb0.agg(max("vec_id")).head().getLong(0) + 1
      val emb = (if (f == 1) emb0 else emb0.crossJoin(reps)
        .withColumn("vec_id", col("vec_id") + col("__r") * vSpan)
        .drop("__r"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nEmb = emb.count()

      measure("minhash_lsh", f, nDocs) {
        // candidates are REPRESENTATIVE-level since r20 (exact-duplicate
        // collapse) — the honest pair-stage work metric; output counts the
        // fanned-back member pairs, the same set the uncollapsed pipeline
        // produced
        val (hs0, cand) = graft.operators.Dedup
          .minhashParts(docs, "text", "doc_id", 3, 8, 2)
        // minhashParts stopped persisting internally (r21 verdict #6) —
        // the harness checkpoints both halves itself, and unpersists
        val hs = hs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val c = cand.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nC = c.count()
        val out = graft.operators.Dedup.minhashFanBack(hs, c, 0.5).count()
        c.unpersist(); hs.unpersist()
        (nC, out)
      }

      measure("simhash_pairs", f, nDocs) {
        val h = docs.select(col("doc_id").as("id"), expr("simHash(text)").as("h"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cand = graft.operators.Dedup.simhashCandidatesFromHashes(h, 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nC = cand.count()
        val out = cand
          .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
          .filter(col("hamming") <= 3).count()
        cand.unpersist(); h.unpersist()
        (nC, out)
      }

      measure("ngram_jaccard", f, nDocs) {
        val out = graft.operators.Dedup
          .ngramJaccard(docs, "text", "doc_id", 0.8, 5, 1000).count()
        (-1L, out) // candidates internal; output + shuffle bytes still recorded
      }

      measure("embedding_near_dup", f, nEmb) {
        // banded hyperplane LSH (r8: the single-band scheme degenerated on
        // label-clustered corpora — see Similarity.hyperplaneBands). The
        // candidate metric is band-slot pairs (the join's actual output
        // volume, before cross-band dedup), the honest cost number.
        val (bitsPerBand, bands) = (24, 4)
        val keyed = graft.operators.Similarity
          .hyperplaneBands(emb, "embedding", "vec_id", bitsPerBand, bands)
        val nC = keyed.groupBy("band", "key").agg(count(lit(1)).as("n"))
          .agg(coalesce(sum(col("n") * (col("n") - 1)), lit(0L)).as("s"))
          .head().getLong(0) / 2
        val out = graft.operators.Dedup
          .embeddingNearDup(emb, "embedding", "vec_id", 0.95, bitsPerBand, bands)
          .count()
        (nC, out)
      }

      measure("sem_dedup", f, nEmb) {
        // the SemDeDup scale knob: kCells grows with the corpus so cells
        // stay ~constant-size (the paper's 50k clusters over 5B embeddings)
        // — with FIXED k, in-cell pairs would grow ∝ n²/k. Candidates =
        // within-cell pairs Σ c·(c−1)/2, the exact pairwise work bound.
        // f > 1 also exercises trainFraction (quantizer on a 1/f sample)
        // and, at kCells·dims > 2048, the NearestCells kernel-assignment gate.
        val kCells = 16 * f
        val cent = graft.operators.Similarity.ivfTrain(
          emb, "embedding", "vec_id", kCells, 2,
          trainFraction = if (f > 1) 1.0 / f else 1.0)
        val idx = graft.operators.Similarity
          .ivfIndex(emb, "embedding", "vec_id", cent)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nC = idx.groupBy("cell").agg(count(lit(1)).as("n"))
          .agg(coalesce(sum(col("n") * (col("n") - 1)), lit(0L)).as("s"))
          .head().getLong(0) / 2
        val a = idx.select(col("cell"), col("id").as("id_a"), col("v").as("v_a"))
        val b = idx.select(col("cell"), col("id").as("id_b"), col("v").as("v_b"))
        val dropped = a.join(b, Seq("cell"))
          .filter(col("id_a") < col("id_b"))
          .filter(graft.functions.GraftFunctions
            .cosineSimilarity(col("v_a"), col("v_b")) >= 0.95)
          .select(col("id_b")).distinct().count()
        idx.unpersist()
        (nC, dropped)
      }

      measure("sem_dedup_auto", f, nEmb) {
        // DEFAULT params (r12): kCells auto-derives ≈√n cells from the
        // corpus count — flat scaling must hold WITHOUT the caller tuning
        // kCells (the manual leg above pins 16·f); kept-count is the output
        val kept = graft.operators.Dedup
          .semDedup(emb, "embedding", "vec_id", 0.95).count()
        (-1L, kept)
      }

      measure("ann_topk", f, nEmb) {
        val queries = emb0.limit(100)
        val cSig = graft.operators.Similarity
          .hyperplaneSignature(emb, "embedding", "vec_id", 8)
          .groupBy("bucket").agg(count(lit(1)).as("cn"))
        val qSig = graft.operators.Similarity
          .hyperplaneSignature(queries, "embedding", "vec_id", 8)
          .groupBy("bucket").agg(count(lit(1)).as("qn"))
        val nC = cSig.join(qSig, Seq("bucket"))
          .agg(coalesce(sum(col("cn") * col("qn")), lit(0L))).head().getLong(0)
        val out = graft.operators.Similarity
          .annTopK(emb, queries, "embedding", "vec_id", 10, 8, 2).count()
        (nC, out)
      }

      measure("connected_components", f, nDocs) {
        val (hs0, cand) = graft.operators.Dedup
          .minhashParts(docs, "text", "doc_id", 3, 8, 2)
        val hs = hs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val withSets = cand
          .join(hs.select(col("id").as("id_a"), col("hs").as("sh_a")), Seq("id_a"))
          .join(hs.select(col("id").as("id_b"), col("hs").as("sh_b")), Seq("id_b"))
        val pairs = graft.operators.Dedup.verifyJaccard(withSets, 0.5)
        val comps = graft.operators.Dedup.connectedComponents(pairs)
        val out = comps.agg(countDistinct(col("cluster"))).head().getLong(0)
        hs.unpersist()
        (-1L, out)
      }

      // r12: hot-group curation caps — one host owns ~95% of the corpus
      // (the heavy-tailed crawl shape), so the group window funnels it
      // through ONE reducer. capPerGroup's mitigation is Catalyst's
      // InferWindowGroupLimit (map-side Partial group limit before the
      // exchange — only partitions·cap rows per group shuffle); the
      // no_partial_limit leg disables that rule to measure exactly what
      // it buys. tokenBudgetPerGroup's running-sum cut can't be inferred,
      // so it carries a manual map-side prefix phase — its leg is the
      // shuffle-bytes (the cluster-relevant cost) vs the direct window.
      val skewed = docs.withColumn("host",
          when(col("doc_id") % 20 < 19, lit("hot.example.com"))
            .otherwise(concat(lit("h"), col("doc_id") % 97)))
        .select("doc_id", "host", "n_chars")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      skewed.count()
      val EXCL = "spark.sql.optimizer.excludedRules"
      measure("hot_cap_no_partial_limit", f, nDocs) {
        spark.conf.set(EXCL,
          "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit")
        try {
          val out = graft.operators.Curation
            .capPerGroup(skewed, "host", "doc_id", 100, col("n_chars").desc)
            .count()
          (-1L, out)
        } finally spark.conf.unset(EXCL)
      }
      measure("hot_cap", f, nDocs) {
        val out = graft.operators.Curation
          .capPerGroup(skewed, "host", "doc_id", 100, col("n_chars").desc)
          .count()
        (-1L, out)
      }
      measure("hot_fraction_direct", f, nDocs) {
        // keep-top-2% quality cut — the aggressive-percentile shape where
        // the rank-safe quantile prefilter matters most
        val out = graft.operators.Curation
          .topFractionPerGroup(skewed, "host", "doc_id", 0.02,
            col("n_chars").desc).count()
        (-1L, out)
      }
      measure("hot_fraction_prefiltered", f, nDocs) {
        val out = graft.operators.Curation
          .topFractionPerGroupPrefiltered(skewed, "host", "doc_id", 0.02,
            col("n_chars").desc).count()
        (-1L, out)
      }
      measure("hot_budget_direct", f, nDocs) {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("host"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val out = skewed
          .withColumn("__cum", sum(col("n_chars").cast("long")).over(w))
          .filter(col("__cum") <= 200000L).count()
        (-1L, out)
      }
      measure("hot_budget_two_phase", f, nDocs) {
        val out = graft.operators.Curation
          .tokenBudgetPerGroup(skewed, "host", "doc_id", "n_chars", 200000L)
          .count()
        (-1L, out)
      }
      skewed.unpersist()

      docs.unpersist(); emb.unpersist()
    }

    // ---- r20 planted-cluster legs (verdict #1 "done" evidence) ----------
    // A 1 000-copy duplicate cluster planted into the sf0.1 corpora — the
    // boilerplate shape the replica fixtures exaggerate. EXACT copies must
    // be absorbed by the collapse (candidates stay corpus-shaped; the
    // C(1000,2)=499 500-pair clique appears only in the OUTPUT, generated
    // without verification); NEAR copies (distinct one-token suffixes, the
    // un-collapsible shape) must be bounded by the per-bucket cap, loudly.
    if (only.forall(s => s.exists(_.startsWith("cluster_")))) {
      val docs0 = Tables.load(spark, src, "documents")
      val dSpan = docs0.agg(max("doc_id")).head().getLong(0) + 1
      val boiler = "terms of service apply to all content on this site " +
        "please review the privacy policy before continuing to use this site"
      def planted(copies: Int, exact: Boolean): DataFrame = {
        val extra = spark.range(copies).select(
          (col("id") + dSpan).as("doc_id"),
          (if (exact) lit(boiler)
           else concat(lit(boiler), lit(" v"), col("id"))).as("text"))
        docs0.select("doc_id", "text").unionByName(extra)
      }
      val exactDocs = planted(1000, exact = true)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nE = exactDocs.count()
      measure("cluster_exact_minhash", 1, nE) {
        val (hs0, cand) = graft.operators.Dedup
          .minhashParts(exactDocs, "text", "doc_id", 3, 8, 2)
        val hs = hs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nC = cand.count() // rep-level: the 1 000-copy cluster is ONE rep
        val out = graft.operators.Dedup.minhashFanBack(hs, cand, 0.5).count()
        hs.unpersist()
        (nC, out)
      }
      exactDocs.unpersist()

      val nearDocs = planted(1000, exact = false)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nN = nearDocs.count()
      measure("cluster_near_uncapped", 1, nN) {
        val (hs0, cand) = graft.operators.Dedup
          .minhashParts(nearDocs, "text", "doc_id", 3, 8, 2, Int.MaxValue)
        val hs = hs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nC = cand.count()
        val out = graft.operators.Dedup.minhashFanBack(hs, cand, 0.5).count()
        hs.unpersist()
        (nC, out)
      }
      measure("cluster_near_capped100", 1, nN) {
        val (hs0, cand) = graft.operators.Dedup
          .minhashParts(nearDocs, "text", "doc_id", 3, 8, 2, 100)
        val hs = hs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nC = cand.count() // expect ≈ C(100,2)·families: the cap binds (and logs)
        val out = graft.operators.Dedup.minhashFanBack(hs, cand, 0.5).count()
        hs.unpersist()
        (nC, out)
      }
      nearDocs.unpersist()

      val emb0 = Tables.load(spark, src, "embeddings")
      val vSpan = emb0.agg(max("vec_id")).head().getLong(0) + 1
      val one = emb0.orderBy("vec_id").limit(1)
        .select(col("embedding")).head().getSeq[Float](0)
      val clusterEmb = emb0.select("vec_id", "embedding").unionByName(
        spark.range(1000).select((col("id") + vSpan).as("vec_id"),
          array(one.map(x => lit(x)): _*).as("embedding")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nV = clusterEmb.count()
      measure("cluster_exact_semdedup", 1, nV) {
        // kCells pinned small so the cluster's cell is ALSO dense with
        // distinct vectors — the adversarial layout; candidates = in-cell
        // DISTINCT-vector pairs (the post-collapse pair-stage work)
        val kept = graft.operators.Dedup
          .semDedup(clusterEmb, "embedding", "vec_id", 0.95, kCells = 8)
          .count()
        (-1L, kept)
      }
      clusterEmb.unpersist()
    }

    println("=== dedup-scale summary ===")
    results.foreach(println)
    spark.stop()
  }
}
