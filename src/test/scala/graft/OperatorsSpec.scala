package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, Similarity, TextAnalysis}

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, ts("2024-01-01 10:00:00"), "l1"),
    (1L, ts("2024-01-01 12:00:00"), "l2"),
    (2L, ts("2024-01-01 09:00:00"), "l3"))
    .toDF("uid", "ts", "tag")
  private lazy val right = Seq(
    (1L, ts("2024-01-01 09:30:00"), 10.0),
    (1L, ts("2024-01-01 12:00:00"), 20.0), // exact-ts match for l2
    (2L, ts("2024-01-01 09:30:00"), 30.0)) // after l3 → no backward match
    .toDF("uid", "ts", "price")

  test("backward: latest right row with ts <= left ts; exact ts matches") {
    val out = AsOfJoin.backward(left, right, Seq("uid"), "ts", "ts", Seq("price"), tsOut = "ts")
      .orderBy("uid", "ts").collect()
    assert(out.map(r => (r.getAs[String]("tag"), Option(r.getAs[Double]("price")))).toSeq ==
      Seq(("l1", Some(10.0)), ("l2", Some(20.0)), ("l3", None)))
  }

  test("forward: earliest right row with ts >= left ts") {
    val out = AsOfJoin.forward(left, right, Seq("uid"), "ts", "ts", Seq("price"), tsOut = "ts")
      .orderBy("uid", "ts").collect()
    assert(out.map(r => (r.getAs[String]("tag"), Option(r.getAs[Double]("price")))).toSeq ==
      Seq(("l1", Some(20.0)), ("l2", Some(20.0)), ("l3", Some(30.0))))
  }

  test("tolerance discards matches farther than the bound") {
    // l1 at 10:00 matches right 09:30 (30 min away) — a 10-min tolerance kills it
    val out = AsOfJoin.backward(left, right, Seq("uid"), "ts", "ts", Seq("price"),
        tsOut = "ts", toleranceMicros = 10L * 60 * 1000000)
      .orderBy("uid", "ts").collect()
    assert(out.map(r => (r.getAs[String]("tag"), Option(r.getAs[Double]("price")))).toSeq ==
      Seq(("l1", None), ("l2", Some(20.0)), ("l3", None)))
  }

  test("strict excludes exact-ts matches on every direction (r18)") {
    // pandas allow_exact_matches=False: l2 at 12:00 must skip the 12:00
    // quote — backward falls to 09:30's 10.0, forward finds nothing
    val b = AsOfJoin.backward(left, right, Seq("uid"), "ts", "ts",
        Seq("price"), tsOut = "ts", strict = true)
      .orderBy("uid", "ts").collect()
    assert(b.map(r => (r.getAs[String]("tag"), Option(r.getAs[Double]("price")))).toSeq ==
      Seq(("l1", Some(10.0)), ("l2", Some(10.0)), ("l3", None)))
    val f = AsOfJoin.forward(left, right, Seq("uid"), "ts", "ts",
        Seq("price"), tsOut = "ts", strict = true)
      .orderBy("uid", "ts").collect()
    assert(f.map(r => (r.getAs[String]("tag"), Option(r.getAs[Double]("price")))).toSeq ==
      Seq(("l1", Some(20.0)), ("l2", None), ("l3", Some(30.0))))
    val n = AsOfJoin.nearest(left, right, Seq("uid"), "ts", "ts",
        Seq("price"), tsOut = "ts", strict = true)
      .orderBy("uid", "ts").collect()
    assert(n.map(r => (r.getAs[String]("tag"), Option(r.getAs[Double]("price")))).toSeq ==
      Seq(("l1", Some(10.0)), ("l2", Some(10.0)), ("l3", Some(30.0))))
  }

  test("nearest picks the closer of backward/forward per row") {
    // l1 10:00: backward 09:30 (30m) vs forward 12:00 (2h) → backward 10.0
    // l3 09:00: no backward; forward 09:30 → 30.0
    val out = AsOfJoin.nearest(left, right, Seq("uid"), "ts", "ts", Seq("price"), tsOut = "ts")
      .orderBy("uid", "ts").collect()
    assert(out.map(r => (r.getAs[String]("tag"), Option(r.getAs[Double]("price")))).toSeq ==
      Seq(("l1", Some(10.0)), ("l2", Some(20.0)), ("l3", Some(30.0))))
  }
}

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river shore"), // near dup
    (4L, "completely different text about spark query engines and shuffles wide"))
    .toDF("id", "text")

  test("exactGroups finds exact duplicate groups only") {
    val g = Dedup.exactGroups(docs, "text", "id").collect()
    assert(g.length == 1)
    assert(g.head.getSeq[Long](g.head.fieldIndex("ids")).toSeq == Seq(1L, 2L))
  }

  test("exactKeepFirst keeps the smallest id per content group") {
    val kept = Dedup.exactKeepFirst(docs, "text", "id")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L))
  }

  test("minhashLsh finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "text", "id", threshold = 0.5,
        shingleSize = 3, bands = 8, rowsPerBand = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // exact dup pair has jaccard 1.0
    val j12 = Dedup.minhashLsh(docs, "text", "id", 0.5, 3, 8, 2)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .select("jaccard").as[Double].head()
    assert(j12 == 1.0)
  }

  test("ngramJaccard computes exact jaccard over shingle sets") {
    val pairs = Dedup.ngramJaccard(docs, "text", "id", threshold = 0.3, shingleSize = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs(((1L, 2L))) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhashPairs finds near duplicates within hamming radius") {
    val pairs = Dedup.simhashPairs(docs, "text", "id", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical text → hamming 0
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("pair operators leave NO persisted entries behind (r21 verdict #6)") {
    // the r19/r20 shape persisted the shingle-hash / signature frames and
    // never unpersisted them — the cross-run cache-leak shape the r19
    // verdict ordered out of semDedup; single-pass now comes from exchange
    // reuse, so nothing may outlive the operator
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(Dedup.minhashLsh(docs, "text", "id", 0.5, 3, 8, 2).collect().nonEmpty)
    assert(Dedup.ngramJaccard(docs, "text", "id", 0.3, 3).collect().nonEmpty)
    assert(Dedup.simhashPairs(docs, "text", "id", 3).collect().nonEmpty)
    val embs = Seq((0L, Array(1.0, 0.0)), (1L, Array(1.0, 0.0)),
      (2L, Array(0.0, 1.0))).toDF("vec_id", "embedding")
    assert(Dedup.embeddingNearDup(embs, "embedding", "vec_id", 0.95, 4)
      .collect() != null)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"pair operators left persisted RDDs behind: $leaked")
  }

  test("simhash banding has exact recall at hamming == maxHamming (pigeonhole)") {
    // plant pairs at EXACTLY the requested radius, with bit flips placed
    // adversarially (clustered low bits, spread bits, high bits) — every
    // planted pair must be recovered, for several radii including ones the
    // old fixed-4×16-chunk scheme silently lost (> 3)
    def flip(h: Long, bits: Seq[Int]): Long = bits.foldLeft(h)((a, b) => a ^ (1L << b))
    val base = 0x0123456789ABCDEFL
    for (radius <- Seq(1, 3, 5, 7)) {
      val placements = Seq(
        (0 until radius).map(identity),            // clustered at bit 0..r
        (0 until radius).map(_ * (63 / math.max(radius, 1))), // spread
        (0 until radius).map(63 - _))              // clustered at the top
      val rows = placements.zipWithIndex.flatMap { case (bits, i) =>
        val orig = base + i * 7919L
        Seq((i * 2L, orig), (i * 2L + 1, flip(orig, bits)))
      }
      val h = rows.toDF("id", "h")
      val got = Dedup.simhashPairsFromHashes(h, maxHamming = radius)
        .select("id_a", "id_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      placements.indices.foreach { i =>
        assert(got.get((i * 2L, i * 2L + 1)).contains(radius),
          s"radius=$radius pair ${i * 2L} missing or wrong hamming: $got")
      }
    }
  }

  test("simhash banding at radius 0 degenerates to exact-hash join") {
    val h = Seq((1L, 42L), (2L, 42L), (3L, 43L)).toDF("id", "h")
    val got = Dedup.simhashPairsFromHashes(h, maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("exact-duplicate collapse fans the full clique and cross pairs back (r20)") {
    // a 5-copy exact cluster + one near-dup of it + one unrelated doc: the
    // pair stage sees ONE representative for the cluster, but the member
    // pair set must be complete — C(5,2) clique at jaccard exactly 1.0 and
    // a (cluster member × near-dup) pair for EVERY member, with interleaved
    // ids reordered so id_a < id_b
    val boiler = "all rights reserved contact the site administrator for details"
    val c = (Seq(2L, 4L, 9L, 11L, 30L).map(i => (i, boiler)) ++ Seq(
      (7L, boiler + " thanks"), // near-dup INSIDE the id range of the cluster
      (50L, "unrelated text about catalyst optimizer rules and exchanges")))
      .toDF("id", "text")
    val pairs = Dedup.minhashLsh(c, "text", "id", threshold = 0.5,
        shingleSize = 3, bands = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val members = Seq(2L, 4L, 9L, 11L, 30L)
    for (Seq(a, b) <- members.combinations(2))
      assert(pairs.get((a, b)).contains(1.0), s"clique pair ($a,$b): $pairs")
    for (m <- members) {
      val key = (math.min(m, 7L), math.max(m, 7L))
      assert(pairs.contains(key) && pairs(key) < 1.0, s"cross pair $key: $pairs")
    }
    assert(pairs.size == 10 + 5) // nothing else — 50 pairs with no one
    // simhash path: identical texts collapse too, cliques at hamming 0
    val sh = Dedup.simhashPairs(c, "text", "id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    for (Seq(a, b) <- members.combinations(2))
      assert(sh.get((a, b)).contains(0), s"simhash clique ($a,$b): $sh")
    assert(!sh.keySet.exists(p => p._1 == 50L || p._2 == 50L))
  }

  test("minhash bucket cap binds LOUDLY on a near-dup cluster, never silently (r20)") {
    import org.apache.spark.sql.graftbridge.PlanBridge
    // 8 NEAR-copies (distinct suffixes — un-collapsible) all land in shared
    // band buckets; cap 3 truncates each bucket to its 3 smallest ids
    val boiler = "please accept cookies to continue browsing this website today"
    val near = (0 until 8).map(i => (i.toLong, s"$boiler v$i")).toDF("id", "text")
    graft.operators.CapWarnings.truncatedTotal.set(0)
    val capped = Dedup.minhashLsh(near, "text", "id", 0.5, 3, 8, 2, maxBucketSize = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    PlanBridge.waitForListenerBus(spark)
    assert(graft.operators.CapWarnings.truncatedTotal.get() > 0,
      "cap bound but no loud warning was observed")
    val full = Dedup.minhashLsh(near, "text", "id", 0.5, 3, 8, 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(full) && capped.nonEmpty && capped.size < full.size)
    // pairs among the kept (smallest-id) bucket members survive the cap
    assert(capped.contains((0L, 1L)))
    // and the default cap stays silent on a cap-free corpus
    graft.operators.CapWarnings.truncatedTotal.set(0)
    Dedup.minhashLsh(docs, "text", "id", 0.5, 3, 8, 2).count()
    PlanBridge.waitForListenerBus(spark)
    assert(graft.operators.CapWarnings.truncatedTotal.get() == 0)
  }
}

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  // 4 unit-ish vectors: 0≈1 (near), 2 orthogonal-ish, 3 opposite
  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.1f)),
    (1L, Array(0.9f, 0.1f, 0.1f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, -0.1f)))
    .toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by exact cosine") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0),
        "embedding", "vec_id", 3)
      .orderBy("rn").select("neighbor_id").as[Long].collect()
    assert(out.head == 1L)   // most similar
    assert(out.last == 3L)   // opposite direction last
  }

  test("annTopK returns bucket-mates ranked by cosine (near dup found)") {
    val out = Similarity.annTopK(vecs, vecs.filter(col("vec_id") === 0),
        "embedding", "vec_id", 3, bits = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out.contains(1L)) // 0 and 1 are nearly parallel → same hyperplane signs
  }

  test("embeddingNearDup: near-parallel pair passes threshold, opposite does not") {
    val pairs = Dedup.embeddingNearDup(vecs, "embedding", "vec_id", threshold = 0.95, bits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("semDedup: within-cell near-dup dropped (smallest id kept), distinct rows survive") {
    val kept = Dedup.semDedup(vecs, "embedding", "vec_id",
        tau = 0.95, kCells = 2, iters = 1)
      .select("id").as[Long].collect().sorted.toSeq
    // 0≈1 → same cell, cos ≈ 0.995 → 1 dropped; 2 and 3 are not τ-close to
    // any smaller id
    assert(!kept.contains(1L) && kept.contains(0L))
    assert(kept.contains(2L) && kept.contains(3L))
    // deterministic under physical row order
    val again = Dedup.semDedup(vecs.repartition(5), "embedding", "vec_id",
        tau = 0.95, kCells = 2, iters = 1)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == kept)
  }

  test("semDedup keep=centroidFar: keeps the ε-ball member least similar to its centroid") {
    // one cell (kCells=1, centroid = corpus mean): ids 10 and 11 are an
    // ε-ball (cos ≈ 0.963) where the LOWER id sits closer to the ball's
    // direction mass → higher centroid similarity → the paper rule keeps
    // 11 while minId keeps 10; the orthogonal vector 30 always survives
    val vs = Seq(
      (10L, Array(1.0f, 0.30f, 0.0f)),  // more prototypical (higher sim)
      (11L, Array(1.0f, 0.02f, 0.0f)),  // least prototypical of the ball
      (30L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val minId = Dedup.semDedup(vs, "embedding", "vec_id",
        tau = 0.95, kCells = 1, iters = 2)
      .select("id").as[Long].collect().sorted.toSeq
    val paper = Dedup.semDedup(vs, "embedding", "vec_id",
        tau = 0.95, kCells = 1, iters = 2, keep = "centroidFar")
      .select("id").as[Long].collect().sorted.toSeq
    assert(minId == Seq(10L, 30L))
    assert(paper.size == minId.size) // one survivor per ball either way
    // independently confirm 11 is the lower-centroid-sim member, then that
    // the paper rule kept exactly it
    val cent = Similarity.ivfTrain(vs, "embedding", "vec_id", 1, 2)
      .collect().map(r => r.getSeq[Double](1)).head
    def cos(a: Array[Float], c: Seq[Double]): Double = {
      val dot = a.zip(c).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(c.map(y => y * y).sum))
    }
    assert(cos(Array(1.0f, 0.02f, 0.0f), cent) < cos(Array(1.0f, 0.30f, 0.0f), cent))
    assert(paper == Seq(11L, 30L))
  }

  test("semDedup collapse: interleaved-id exact groups drop exactly per the pair rule (r20)") {
    // group A = {2, 40} (identical vectors), group B = {10} τ-close to A:
    //  - 2 survives (nothing earlier);
    //  - 10 is dropped by A (rep 2 < 10, cos ≥ τ);
    //  - 40 is dropped by its own group's representative;
    // and the asymmetric witness: B's rep (10) is LATER than A's rep but
    // EARLIER than member 40 — the min-neighbor fan-back must not lose
    // that direction either (here 40 is dropped by selfdup anyway, so add
    // group C = {5, 6} with B earlier than C's members but later than
    // nothing — 5 must fall to B's side of the witness)
    val v1 = Array(1.0f, 0.0f, 0.0f)
    val v2 = Array(0.99f, 0.10f, 0.0f)  // cos(v1,v2) ≈ 0.995 ≥ 0.95
    val vs = Seq((2L, v1), (40L, v1), (10L, v2))
      .toDF("vec_id", "embedding")
    val kept = Dedup.semDedup(vs, "embedding", "vec_id",
        tau = 0.95, kCells = 1, iters = 1)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L), s"kept $kept")
    // later-group drops earlier-group's high member: A = {3}, B = {5, 6}
    // with rep 5 > 3 — member 6 of B is dropped by A AND by its own rep;
    // A itself survives (5 > 3 so B cannot drop A's only member)
    val vs2 = Seq((3L, v2), (5L, v1), (6L, v1)).toDF("vec_id", "embedding")
    val kept2 = Dedup.semDedup(vs2, "embedding", "vec_id",
        tau = 0.95, kCells = 1, iters = 1)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept2 == Seq(3L), s"kept2 $kept2")
  }

  test("semDedup leaves NO persisted entries behind; cell cap binds loudly (r19 #3, r20)") {
    import org.apache.spark.sql.graftbridge.PlanBridge
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val outMin = Dedup.semDedup(vecs, "embedding", "vec_id",
      tau = 0.95, kCells = 2, iters = 1).collect()
    val outPaper = Dedup.semDedup(vecs, "embedding", "vec_id",
      tau = 0.95, kCells = 2, iters = 1, keep = "centroidFar").collect()
    assert(outMin.nonEmpty && outPaper.nonEmpty)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"semDedup left persisted RDDs behind: $leaked")
    // cap = 1: only the keep-order-first group of each cell participates as
    // the earlier pair side; with 0≈1 in one cell that still drops 1, but
    // the truncation is observed and warned
    graft.operators.CapWarnings.truncatedTotal.set(0)
    val capped = Dedup.semDedup(vecs, "embedding", "vec_id",
        tau = 0.95, kCells = 2, iters = 1, maxCellReps = 1)
      .select("id").as[Long].collect().sorted.toSeq
    PlanBridge.waitForListenerBus(spark)
    assert(graft.operators.CapWarnings.truncatedTotal.get() > 0,
      "cell cap bound but no loud warning was observed")
    assert(!capped.contains(1L) && capped.contains(0L))
    // uncapped runs stay silent
    graft.operators.CapWarnings.truncatedTotal.set(0)
    Dedup.semDedup(vecs, "embedding", "vec_id", 0.95, 2, 1).count()
    PlanBridge.waitForListenerBus(spark)
    assert(graft.operators.CapWarnings.truncatedTotal.get() == 0)
  }

  test("int8 quantization: codes bounded, round-trip error <= scale/2, cosine close") {
    val rnd = new scala.util.Random(7)
    val many = (0L until 200L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val qz = many.select(col("vec_id"), col("embedding"),
      Similarity.quantizeInt8(col("embedding")).as("qz"))
    val checked = qz.select(col("vec_id"),
        col("qz").getField("scale").as("scale"),
        array_max(transform(col("qz").getField("q"),
          q => abs(q.cast("int")))).as("qmax"),
        array_max(expr(
          "zip_with(embedding, qz.q, (v, q) -> abs(CAST(v AS DOUBLE) - q * qz.scale))"))
          .as("err"))
      .collect()
    checked.foreach { r =>
      assert(r.getAs[Int]("qmax") <= 127)
      assert(r.getAs[Double]("err") <= r.getAs[Double]("scale") / 2 + 1e-9)
    }
    // quantized cosine tracks float cosine within int8 resolution
    val a = qz.select(col("vec_id").as("ia"), col("embedding").as("va"),
      col("qz").getField("q").as("qa"))
    val b = qz.select(col("vec_id").as("ib"), col("embedding").as("vb"),
      col("qz").getField("q").as("qb"))
    val diffs = a.join(b, col("ib") === col("ia") + 1)
      .select(abs(Similarity.int8CosineSimilarity(col("qa"), col("qb")) -
        graft.functions.GraftFunctions.cosineSimilarity(col("va"), col("vb")))
        .as("d"))
      .agg(max("d")).collect()(0).getDouble(0)
    assert(diffs < 0.02, s"quantized cosine drift $diffs")
    // dequantize returns floats with the same shape
    val deq = qz.select(Similarity.dequantizeInt8(col("qz")).as("d"))
      .selectExpr("size(d) AS n").as[Int].collect()
    assert(deq.forall(_ == 64))
  }

  // two well-separated clusters + one planted near-duplicate pair
  private lazy val clustered = {
    val rnd = new scala.util.Random(11)
    val a = (0L until 40L).map(i =>
      (i, Array.tabulate(16)(d => (if (d < 8) 1.0f else 0.0f) + rnd.nextFloat() * 0.1f)))
    val b = (40L until 80L).map(i =>
      (i, Array.tabulate(16)(d => (if (d >= 8) 1.0f else 0.0f) + rnd.nextFloat() * 0.1f)))
    (a ++ b).toDF("vec_id", "embedding")
  }

  test("ivfTrain: centroids deterministic and partition-count invariant") {
    val c1 = Similarity.ivfTrain(clustered, "embedding", "vec_id", k = 4, iters = 2)
      .orderBy("cell").collect()
    val c2 = Similarity.ivfTrain(clustered.repartition(7), "embedding", "vec_id",
        k = 4, iters = 2)
      .orderBy("cell").collect()
    assert(c1.length == c2.length && c1.length <= 4)
    c1.zip(c2).foreach { case (x, y) =>
      assert(x.getInt(0) == y.getInt(0))
      x.getSeq[Double](1).zip(y.getSeq[Double](1)).foreach { case (u, v) =>
        assert(math.abs(u - v) < 1e-9)
      }
    }
  }

  test("ivfIndex separates the two clusters; ivfTopK finds in-cluster neighbors") {
    val cent = Similarity.ivfTrain(clustered, "embedding", "vec_id", k = 2, iters = 2)
    val idx = Similarity.ivfIndex(clustered, "embedding", "vec_id", cent)
    // with k=2 on two tight clusters, Lloyd lands one centroid per cluster:
    // cell assignment must be constant within each true cluster
    val cellsPerCluster = idx
      .withColumn("truth", (col("id") < 40).cast("int"))
      .groupBy("truth").agg(countDistinct("cell").as("nc"))
      .select("nc").as[Long].collect()
    assert(cellsPerCluster.forall(_ == 1L))
    val out = Similarity.ivfTopK(clustered, clustered.filter(col("vec_id") === 0),
      "embedding", "vec_id", k = 5, kCells = 2, iters = 2, nProbe = 1)
    val ns = out.select("neighbor_id").as[Long].collect()
    assert(ns.length == 5 && ns.forall(_ < 40)) // all from vec 0's cluster
  }

  test("ivfTopK probes rank by exact cosine and match bruteforce within cells") {
    val q = clustered.filter(col("vec_id") === 7)
    val ivf = Similarity.ivfTopK(clustered, q, "embedding", "vec_id",
        k = 3, kCells = 2, iters = 2, nProbe = 2)
      .orderBy("rn").select("neighbor_id").as[Long].collect()
    // nProbe=2 of kCells=2 = exhaustive → must equal bruteforce exactly
    val bf = Similarity.bruteForceTopK(clustered, q, "embedding", "vec_id", 3)
      .orderBy("rn").select("neighbor_id").as[Long].collect()
    assert(ivf.toSeq == bf.toSeq)
  }

  test("int8 quantize kernel ≡ declarative form, incl. null/empty contract (r11)") {
    val rnd = new scala.util.Random(13)
    val base = (0 until 200).map { i =>
      val n = if (i % 17 == 0) 0 else 64
      (i.toLong, Seq.fill(n)(((rnd.nextDouble() - 0.5) * 4).toFloat))
    }.toDF("id", "v")
      // null-vector rows exercise the struct(1.0, null) contract
      .withColumn("v", when(col("id") % 23 === 0, lit(null)).otherwise(col("v")))
    def declarative(vec: org.apache.spark.sql.Column) = {
      val mx = array_max(transform(vec, x => abs(x.cast("double"))))
      val scale = when(mx > 0, mx / lit(127.0)).otherwise(lit(1.0))
      struct(scale.as("scale"),
        transform(vec, x => round(x.cast("double") / scale).cast("tinyint")).as("q"))
    }
    val out = base.select(
      Similarity.quantizeInt8(col("v")).as("k"), declarative(col("v")).as("d"))
    assert(out.filter(!(col("k.scale") <=> col("d.scale")) ||
      !(col("k.q") <=> col("d.q"))).isEmpty)
  }

  test("int8 cosine kernel ≡ HOF aggregate form, bit-identical (r11)") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val n = if (i % 29 == 0) 0 else 64 // include empty codes (null contract)
      (i.toLong, Seq.fill(n)((rnd.nextInt(255) - 127).toByte),
        Seq.fill(n)((rnd.nextInt(255) - 127).toByte))
    }.toDF("id", "qa", "qb")
    def hofDot(u: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
      aggregate(zip_with(u, v, (x, y) => x.cast("long") * y.cast("long")),
        lit(0L), (acc, x) => acc + x)
    val d = hofDot(col("qa"), col("qb")).cast("double")
    val na = sqrt(hofDot(col("qa"), col("qa")).cast("double"))
    val nb = sqrt(hofDot(col("qb"), col("qb")).cast("double"))
    val out = rows.select(
      Similarity.int8CosineSimilarity(col("qa"), col("qb")).as("kernel"),
      when(na > 0 && nb > 0, d / (na * nb)).as("hof"))
    // bit-identical: exact equality including the zero-norm null contract
    assert(out.filter(!(col("kernel") <=> col("hof"))).isEmpty)
  }

  test("NearestCells doGenCode: generated projection ≡ interpreted eval, codegen real (r12)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(0.7, 0.7))
    val expr = graft.functions.NearestCells(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      Seq(0, 1, 2), cents, 2)
    // structural: the kernel is no longer a CodegenFallback — the one
    // expression on every IVF/SemDeDup assignment path generates real code
    assert(!expr.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws if broken
    val rnd = new scala.util.Random(5)
    (0 until 50).foreach { _ =>
      val v = Array.fill(2)(rnd.nextDouble() * 2 - 1)
      val row = InternalRow(ArrayData.toArrayData(v))
      val gen = proj(row).getArray(0)
      val interp = expr.eval(row).asInstanceOf[ArrayData]
      assert(gen.numElements() == interp.numElements())
      (0 until gen.numElements()).foreach { i =>
        val gs = gen.getStruct(i, 2); val is = interp.getStruct(i, 2)
        assert(gs.getDouble(0) == is.getDouble(0) && gs.getInt(1) == is.getInt(1))
      }
    }
    // the gated assignment stage stays inside whole-stage codegen
    val cent = Similarity.ivfTrain(clustered, "embedding", "vec_id", k = 4, iters = 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1).toSeq
    val assigned = clustered.repartition(2) // defeat local-relation folding
      .select(Similarity.nearestCellsImpl(
        col("embedding").cast("array<double>"), cent, 2, inline = false).as("p"))
    assigned.collect()
    val plan = assigned.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"assignment projection left codegen:\n$plan")
  }

  test("vector kernels doGenCode: generated ≡ interpreted incl. null contracts (r12)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, ByteType, DoubleType}
    import graft.functions.{CosineSim, DotProd, Int8Cosine, Int8Quantize, L2Dist}
    val a = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val b = BoundReference(1, ArrayType(DoubleType), nullable = true)
    val exprs = Seq(CosineSim(a, b), DotProd(a, b), L2Dist(a, b))
    val proj = GenerateUnsafeProjection.generate(exprs) // throws if codegen broken
    val rnd = new scala.util.Random(17)
    (0 until 30).foreach { _ =>
      val row = InternalRow(
        ArrayData.toArrayData(Array.fill(8)(rnd.nextDouble() * 2 - 1)),
        ArrayData.toArrayData(Array.fill(8)(rnd.nextDouble() * 2 - 1)))
      val out = proj(row)
      exprs.zipWithIndex.foreach { case (e, i) =>
        assert(out.getDouble(i) == e.eval(row).asInstanceOf[Double], e)
      }
    }
    // Int8Cosine: nullable return through generated code (zero norm,
    // mismatched lengths) must match interpreted
    val qa = BoundReference(0, ArrayType(ByteType), nullable = true)
    val qb = BoundReference(1, ArrayType(ByteType), nullable = true)
    val cosQ = Int8Cosine(qa, qb)
    val projQ = GenerateUnsafeProjection.generate(Seq(cosQ))
    val cases = Seq(
      (Array[Byte](1, 2, 3), Array[Byte](3, 2, 1)),
      (Array[Byte](1, 2, 3), Array[Byte](1, 2)), // mismatch → null
      (Array[Byte](0, 0), Array[Byte](1, 1))) // zero norm → null
    cases.foreach { case (x, y) =>
      val row = InternalRow(ArrayData.toArrayData(x), ArrayData.toArrayData(y))
      val gen = projQ(row)
      val interp = cosQ.eval(row)
      if (interp == null) assert(gen.isNullAt(0), x.toSeq)
      else assert(gen.getDouble(0) == interp.asInstanceOf[Double], x.toSeq)
    }
    // Int8Quantize: struct result + the struct(1.0, null) null-input contract
    val quant = Int8Quantize(a)
    val projS = GenerateUnsafeProjection.generate(Seq(quant))
    val vRow = InternalRow(ArrayData.toArrayData(Array(1.0, -2.0, 0.5)), null)
    val gs = projS(vRow).getStruct(0, 2)
    val is = quant.eval(vRow).asInstanceOf[InternalRow]
    assert(gs.getDouble(0) == is.getDouble(0))
    assert(gs.getArray(1).toByteArray.toSeq == is.getArray(1).toByteArray.toSeq)
    val nullRow = InternalRow(null, null)
    val gn = projS(nullRow).getStruct(0, 2)
    assert(gn.getDouble(0) == 1.0 && gn.isNullAt(1))
  }

  test("text kernels doGenCode: generated ≡ interpreted (SimHash/fingerprint/normalize/stem) (r12)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.{IntegerType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{NormalizeUtf8, PorterStem, SimHash, TextFingerprint}
    val t = BoundReference(0, StringType, nullable = true)
    val exprs = Seq(
      SimHash(t), TextFingerprint(t, Literal(8, IntegerType)),
      NormalizeUtf8(t, java.text.Normalizer.Form.NFC), PorterStem(t))
    val proj = GenerateUnsafeProjection.generate(exprs) // throws if codegen broken
    val samples = Seq(
      "The quick brown fox jumps over the lazy dog",
      "running runner ran easily connectedness", "", "héllo wörld – café",
      "a b", "ABBA abba ABBA abba 123 123")
    samples.foreach { s0 =>
      val row = InternalRow(UTF8String.fromString(s0))
      val out = proj(row)
      exprs.zipWithIndex.foreach { case (e, i) =>
        val interp = e.eval(row)
        val gen: Any = e.dataType match {
          case StringType => out.getUTF8String(i)
          case _ => out.getLong(i)
        }
        assert(gen == interp, s"${e.getClass.getSimpleName} on '$s0'")
      }
    }
  }

  test("auto-kCells: default derives ceil(√n) bounded at 16, explicit overrides (r12)") {
    // 80 vectors → √80 ≈ 9 → floor of 16; the O(Σ cell²) guarantee no
    // longer depends on the caller passing the paper's tuning
    assert(Similarity.autoCells(clustered) == 16)
    val big = spark.range(70000).toDF("vec_id")
      .withColumn("embedding", array(lit(1.0f)))
    assert(Similarity.autoCells(big) == math.ceil(math.sqrt(70000.0)).toInt)
    // default params ≡ explicit kCells at the derived value
    val auto = Dedup.semDedup(clustered, "embedding", "vec_id", 0.9)
      .select("id").as[Long].collect().sorted.toSeq
    val explicit = Dedup.semDedup(clustered, "embedding", "vec_id", 0.9, kCells = 16)
      .select("id").as[Long].collect().sorted.toSeq
    assert(auto == explicit && auto.nonEmpty)
    val q = clustered.filter(col("vec_id") === 7)
    val autoIvf = Similarity.ivfTopK(clustered, q, "embedding", "vec_id", k = 3)
      .orderBy("rn").select("neighbor_id").as[Long].collect().toSeq
    val explicitIvf = Similarity.ivfTopK(clustered, q, "embedding", "vec_id",
        k = 3, kCells = 16)
      .orderBy("rn").select("neighbor_id").as[Long].collect().toSeq
    assert(autoIvf == explicitIvf)
  }

  test("int8 cosine: mismatched code lengths yield NULL, not a truncated dot (r12)") {
    // zip_with null-pads the shorter side → the HOF form goes NULL; a
    // min-length truncation would return a plausible-looking similarity
    // that masks an upstream quantization bug
    val rows = Seq(
      (1L, Seq[Byte](1, 2, 3), Seq[Byte](1, 2)),
      (2L, Seq[Byte](5, 5), Seq[Byte](5, 5))).toDF("id", "qa", "qb")
    val got = rows.orderBy("id")
      .select(Similarity.int8CosineSimilarity(col("qa"), col("qb")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).isEmpty)
    assert(got(1).exists(v => math.abs(v - 1.0) < 1e-12))
  }

  test("int8 quantize: NaN/Inf elements follow Round+cast, never crash (r12)") {
    // NaN ranks highest in array_max → the when(mx > 0) guard is false →
    // scale 1.0; Round passes non-finite through and the non-ANSI
    // double→tinyint cast is Scala .toByte (NaN→0). Inf drives scale=Inf:
    // finite/Inf → 0, Inf/Inf = NaN → 0. The r11 kernel threw
    // NumberFormatException from BigDecimal.valueOf on any of these.
    val rows = Seq(
      (1L, Seq(1.0, Double.NaN, -2.0)),
      (2L, Seq(Double.PositiveInfinity, 3.0)),
      (3L, Seq(Double.NegativeInfinity))).toDF("id", "v")
    val got = rows.orderBy("id")
      .select(Similarity.quantizeInt8(col("v")).as("s"))
      .select(col("s.scale"), col("s.q")).collect()
    assert(got(0).getDouble(0) == 1.0 &&
      got(0).getSeq[Byte](1) == Seq[Byte](1, 0, -2))
    assert(got(1).getDouble(0).isPosInfinity &&
      got(1).getSeq[Byte](1) == Seq[Byte](0, 0))
    assert(got(2).getDouble(0).isPosInfinity &&
      got(2).getSeq[Byte](1) == Seq[Byte](0))
  }

  test("nearestCells: kernel path ≡ unrolled-literal path (r11 gate)") {
    // same centroids through both assignment shapes — the gated path (the
    // functions.NearestCells kernel, for k·dims above inlineCentroidLimit)
    // must produce bit-identical (dist, cell) pairs, ties included
    val cent = Similarity.ivfTrain(clustered, "embedding", "vec_id", k = 4, iters = 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1).toSeq
    val v = clustered.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    def assign(inline: Boolean) = v.select(col("vec_id"),
        Similarity.nearestCellsImpl(col("v"), cent, 2, inline).as("p"))
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (java.lang.Double.doubleToLongBits(p.getDouble(0)),
          p.getInt(1))))
    assert(assign(inline = true).toSeq == assign(inline = false).toSeq)
  }

  test("ivfTrain: trainFraction samples deterministically; search stays valid") {
    val cA = Similarity.ivfTrain(clustered, "embedding", "vec_id", k = 2,
      iters = 2, trainFraction = 0.6).orderBy("cell").collect()
    val cB = Similarity.ivfTrain(clustered.repartition(5), "embedding", "vec_id",
      k = 2, iters = 2, trainFraction = 0.6).orderBy("cell").collect()
    assert(cA.map(_.toString).toSeq == cB.map(_.toString).toSeq)
    // a sample-trained quantizer still separates the two tight clusters
    val out = Similarity.ivfTopK(clustered, clustered.filter(col("vec_id") === 0),
      "embedding", "vec_id", k = 5, kCells = 2, iters = 2, nProbe = 1,
      trainFraction = 0.6)
    assert(out.select("neighbor_id").as[Long].collect().forall(_ < 40))
  }

  test("ivfWrite/ivfProbe: persisted probe ≡ in-memory, reads only probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_spec_").toString
    Similarity.ivfWrite(clustered, "embedding", "vec_id", dir, kCells = 4, iters = 2)
    val q = clustered.filter(col("vec_id") === 7)
    val persisted = Similarity.ivfProbe(spark, dir, q, "embedding", "vec_id",
      k = 3, nProbe = 1)
    // equality with the in-memory path on the same centroids
    val cent = spark.read.parquet(dir + "/centroids")
    val mem = Similarity.ivfIndex(clustered, "embedding", "vec_id", cent)
    val cells = spark.read.parquet(dir + "/index").select("cell").distinct().count()
    assert(cells >= 2, "fixture must spread over multiple cells")
    assert(persisted.collect().map(_.toString).sorted.toSeq ==
      Similarity.ivfTopK(clustered, q, "embedding", "vec_id", k = 3,
        kCells = 4, iters = 2, nProbe = 1)
        .collect().map(_.toString).sorted.toSeq)
    // partition pruning: the probe scan lists only the probed cell dirs.
    // nProbe=1 → exactly one cell=N directory of the ≥2 present.
    val probedFiles = filesRead(persisted)
    val allFiles = filesRead(spark.read.parquet(dir + "/index"))
    assert(probedFiles < allFiles,
      s"probe read $probedFiles of $allFiles files — no partition pruning")
  }
}

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenCount and subword estimate") {
    val df = Seq("Hello, world! 42 times").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.subwordCountEstimate(col("text")).as("s")).head()
    assert(r.getInt(0) == 4)
    assert(r.getInt(1) == 4) // no token longer than 6 chars
  }

  test("languageId picks the language with the best stopword overlap") {
    val df = Seq(
      ("en", "the cat sat on the mat and it is a good day for the walk"),
      ("fr", "le chat est sur la table et il est un bon jour pour le parc"),
      ("de", "der hund ist ein guter freund und die katze ist auch von den tieren"))
      .toDF("lang", "text")
    val preds = df.select(col("lang"), TextAnalysis.languageId(col("text")).as("pred"))
      .as[(String, String)].collect().toMap
    assert(preds("en") == "en")
    assert(preds("fr") == "fr")
    assert(preds("de") == "de")
  }

  test("quality features are bounded and deterministic") {
    val df = Seq((1L, "good clean sentence with varied words here"),
      (2L, "spam spam spam spam spam spam")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df, "text")
      .select("doc_id", "repetition_ratio", "quality_score")
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r(1L)._1 < r(2L)._1)             // spam repeats more
    assert(r(1L)._2 > r(2L)._2)             // and scores lower
    assert(r.values.forall { case (rep, q) => rep >= 0 && rep <= 1 && q >= 0 && q <= 1 })
  }

  test("lmTrain/lmScore: perplexity orders in-domain below gibberish") {
    val train = Seq.tabulate(50)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val lm = TextAnalysis.lmTrain(train, "text", vocabSize = 8)
    // vocab bounded at 8 of the 11 distinct tokens; ties by token asc
    assert(lm.count() == 8)
    // top-8 of the 11 distinct train tokens by (cnt desc, token asc):
    // again/the (cnt 100), then and/brown/dog/fox/jumps/lazy — quick and
    // over fall out on the tie-break, so in-domain docs use kept tokens
    val docs = Seq(
      (1L, "the brown fox dog"),              // fully in-vocab
      (2L, "zyx wvu tsr qpo"),                // pure OOV gibberish
      (3L, "the brown zyx fox"),              // mixed
      (4L, "")).toDF("doc_id", "text")        // empty → null scores
    val out = TextAnalysis.lmScore(docs, lm, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    def ppl(id: Long) = out(id).getAs[Double]("perplexity")
    assert(ppl(1L) < ppl(3L) && ppl(3L) < ppl(2L))
    assert(out(2L).getAs[Double]("oov_ratio") == 1.0)
    assert(out(1L).getAs[Double]("oov_ratio") == 0.0)
    assert(out(4L).isNullAt(out(4L).fieldIndex("avg_logprob")))
    assert(out(4L).isNullAt(out(4L).fieldIndex("oov_ratio"))) // null, not "0% OOV"
    assert(out(4L).getAs[Long]("n_tokens") == 0L)
    // hand-check doc 1 against the closed form
    val n = lm.agg(org.apache.spark.sql.functions.sum("cnt")).head().getLong(0)
    val denom = n + 0.5 * (8 + 1)
    val cnts = lm.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Seq("the", "brown", "fox", "dog")
      .map(t => math.log((cnts(t) + 0.5) / denom)).sum / 4.0
    assert(math.abs(out(1L).getAs[Double]("avg_logprob") - expect) < 1e-12)
  }

  test("lm_train/lm_score SQL surface") {
    val g = graft.engine.GraftSession(spark)
    Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"))
      .toDF("doc_id", "text").createOrReplaceTempView("lm_docs")
    val out = g.sql(
      """SELECT id, perplexity FROM
         lm_score(lm_docs, lm_train(lm_docs, 'text', 3), 'text', 'doc_id')
         ORDER BY id""").collect()
    assert(out.length == 2)
    assert(out.forall(!_.isNullAt(1)))
  }

  test("lmTrain2/lmScore2: bigram conditional with unigram backoff, hand-checked") {
    val train = Seq.tabulate(10)(i => (i.toLong, "a b a b a c"))
      .toDF("doc_id", "text")
    val lm2 = TextAnalysis.lmTrain2(train, "text", vocabSize = 3, bigramSize = 4)
    // unigram: a=30, b=20, c=10; bigrams per doc: (a,b)x2 (b,a)x2 (a,c)x1
    val uni = lm2.filter("w2 IS NULL").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(uni == Map("a" -> 30L, "b" -> 20L, "c" -> 10L))
    val bi = lm2.filter("w2 IS NOT NULL").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi == Map(("a", "b") -> 20L, ("b", "a") -> 20L, ("a", "c") -> 10L))
    val docs = Seq((1L, "a b c"), (2L, "zz a b")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore2(docs, lm2, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val n = 60.0; val v = 3.0
    def pu(c: Double) = (c + 0.5) / (n + 0.5 * (v + 1))
    def pb(cb: Double, cp: Double) = (cb + 0.5) / (cp + 0.5 * (v + 1))
    // doc 1 "a b c": p(a) unigram, p(b|a) bigram, p(c|b) bigram-count-0
    val d1 = (math.log(pu(30)) + math.log(pb(20, 30)) + math.log(pb(0, 20))) / 3
    // doc 2 "zz a b": p(zz) unigram OOV; p(a|zz) backs off to unigram
    // (predecessor OOV); p(b|a) bigram
    val d2 = (math.log(pu(0)) + math.log(pu(30)) + math.log(pb(20, 30))) / 3
    assert(math.abs(out(1L).getAs[Double]("avg_logprob") - d1) < 1e-12)
    assert(math.abs(out(2L).getAs[Double]("avg_logprob") - d2) < 1e-12)
    assert(out(2L).getAs[Double]("oov_ratio") - 1.0 / 3 < 1e-12)
  }

  test("lmScore2 plan: all three model joins broadcast, corpus never shuffled against the model") {
    val train = Seq.tabulate(5)(i => (i.toLong, "a b c d e")).toDF("doc_id", "text")
    val lm2 = TextAnalysis.lmTrain2(train, "text", vocabSize = 8, bigramSize = 8)
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.lmScore2(docs, lm2, "text", "doc_id")
      .queryExecution.sparkPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
    assert(joins.size == 3, s"expected 3 broadcast model joins:\n$plan")
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }.isEmpty,
      "the vocab-bounded model must never force a corpus shuffle")
  }

  test("lm_train2/lm_score2 SQL surface composes like the unigram pair") {
    val g = graft.engine.GraftSession(spark)
    Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"))
      .toDF("doc_id", "text").createOrReplaceTempView("lm2_docs")
    val out = g.sql(
      """SELECT id, perplexity FROM
         lm_score2(lm2_docs, lm_train2(lm2_docs, 'text', 4, 8), 'text', 'doc_id')
         ORDER BY id""").collect()
    assert(out.length == 2)
    assert(out.forall(!_.isNullAt(1)))
  }
}

class CustomAggregatesSpec extends SparkTestBase {

  test("windowFunnel: longest in-window chain") {
    val df = sql("""SELECT * FROM VALUES
        (1, 100, 'signup'), (1, 200, 'click'), (1, 300, 'purchase'),
        (2, 100, 'signup'), (2, 200, 'purchase'),
        (3, 100, 'click')
      AS t(uid, ts, et)""")
    df.createOrReplaceTempView("fe")
    val lvls = sql("""SELECT uid, windowFunnel(1000, ts, et = 'signup', et = 'click', et = 'purchase') AS l
        FROM fe GROUP BY uid ORDER BY uid""").collect().map(_.getInt(1)).toSeq
    assert(lvls == Seq(3, 1, 0)) // uid2 skips click → level 1; uid3 never signs up
  }

  test("windowFunnel respects the time window") {
    sql("""SELECT * FROM VALUES (1, 0, 'a'), (1, 5000, 'b') AS t(uid, ts, et)""")
      .createOrReplaceTempView("fw")
    val l = sql("""SELECT windowFunnel(1000, ts, et = 'a', et = 'b') AS l FROM fw""")
      .head().getInt(0)
    assert(l == 1) // second step out of window
  }

  test("retention: first condition gates the rest") {
    sql("""SELECT * FROM VALUES (1, 'signup'), (1, 'click'), (2, 'click')
      AS t(uid, et)""").createOrReplaceTempView("re")
    val rows = sql("""SELECT uid, retention(et = 'signup', et = 'click') AS r
        FROM re GROUP BY uid ORDER BY uid""").collect()
    assert(rows(0).getSeq[Int](1) == Seq(1, 1))
    assert(rows(1).getSeq[Int](1) == Seq(0, 0)) // no signup → gated off
  }

  test("sequenceMatch / sequenceCount with .* gaps") {
    sql("""SELECT * FROM VALUES (1, 'a'), (2, 'x'), (3, 'b'), (4, 'a'), (5, 'b')
      AS t(ts, et)""").createOrReplaceTempView("se")
    val r = sql("""SELECT sequenceMatch('(?1).*(?2)', ts, et = 'a', et = 'b') AS m,
        sequenceCount('(?1).*(?2)', ts, et = 'a', et = 'b') AS c FROM se""").head()
    assert(r.getBoolean(0))
    assert(r.getLong(1) == 2L)
  }

  test("topK orders by frequency") {
    sql("""SELECT explode(array('a','a','a','b','b','c')) AS x""")
      .createOrReplaceTempView("tk")
    val top = sql("SELECT topK(x, 2) AS t FROM tk").head().getSeq[String](0)
    assert(top == Seq("a", "b"))
  }

  test("topKWeighted credits weights instead of counts") {
    sql("""SELECT * FROM VALUES ('a', 1), ('b', 10), ('a', 1), ('c', 3)
      AS t(x, w)""").createOrReplaceTempView("tkw")
    val top = sql("SELECT topKWeighted(x, 2, w) AS t FROM tkw").head().getSeq[String](0)
    assert(top == Seq("b", "c")) // b=10, c=3 outweigh a=2
  }

  test("bit aggregates") {
    sql("SELECT explode(array(6, 3)) AS x").createOrReplaceTempView("ba")
    val r = sql("""SELECT groupBitAnd(x) AS a, groupBitOr(x) AS o, groupBitXor(x) AS x3
      FROM ba""").head()
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == 7L)
    assert(r.getLong(2) == 5L)
  }
}

class MultiProbeSpec extends SparkTestBase {
  import spark.implicits._

  test("multi-probe ANN recall is at least single-probe recall") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 200L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 8)
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = resultSet(graft.operators.Similarity
      .bruteForceTopK(vecs, queries, "embedding", "vec_id", 5))
    val p1 = resultSet(graft.operators.Similarity
      .annTopK(vecs, queries, "embedding", "vec_id", 5, bits = 6, probes = 1))
    val p7 = resultSet(graft.operators.Similarity
      .annTopK(vecs, queries, "embedding", "vec_id", 5, bits = 6, probes = 7))
    val r1 = (p1 intersect exact).size.toDouble / exact.size
    val r7 = (p7 intersect exact).size.toDouble / exact.size
    assert(r7 >= r1, s"multi-probe recall $r7 must be >= single-probe $r1")
    assert(r7 > r1 || r1 == 1.0, s"probing 7/64 buckets should find more ($r1 -> $r7)")
  }
}

class SkewBucketSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin matches the plain join on skewed data") {
    // 90% of probe rows share one hot key
    val probe = (1 to 1000).map(i =>
      (if (i <= 900) 1L else i.toLong % 7, i.toLong)).toDF("k", "v")
    val build = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = probe.join(build, Seq("k")).select("k", "v", "name")
    val salted = graft.operators.Skew.saltedJoin(probe, build, Seq("k"), buckets = 8)
      .select("k", "v", "name")
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    assert(salted.count() == plain.count())
  }

  test("saltedJoin left join keeps unmatched probe rows") {
    val probe = Seq((1L, "x"), (9L, "y")).toDF("k", "v")
    val build = Seq((1L, "one")).toDF("k", "name")
    val out = graft.operators.Skew.saltedJoin(probe, build, Seq("k"), 4, "left")
      .orderBy("k").collect()
    assert(out.length == 2 && out(1).isNullAt(2))
  }

  test("keySkewReport surfaces the hot key share") {
    val df = (1 to 100).map(i => (if (i <= 80) "hot" else s"k$i", i)).toDF("k", "v")
    val top = graft.operators.Skew.keySkewReport(df, Seq("k"), 1).head()
    assert(top.getString(0) == "hot" && top.getDouble(2) == 0.8)
  }

  test("bucketed tables join without a shuffle exchange") {
    val a = (1L to 1000L).map(i => (i, i * 2)).toDF("id", "x")
    val b = (1L to 1000L).map(i => (i, s"n$i")).toDF("id", "name")
    graft.io.Sources.writeBucketed(a, "bkt_a", Seq("id"), 4, sortKeys = Seq("id"))
    graft.io.Sources.writeBucketed(b, "bkt_b", Seq("id"), 4, sortKeys = Seq("id"))
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("curate filters language and quality, then dedups keep-first") {
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog of the meadow run to it for fun in a field"),
      (2L, "the quick brown fox and the lazy dog of the meadow run to it for fun in a field"), // dup of 1
      (3L, "le renard brun rapide et le chien paresseux de la prairie est que pour une fois"), // fr
      (4L, "x")) // degenerate, low quality
      .toDF("doc_id", "text")
    val out = graft.operators.Curation.curate(docs, "text", "doc_id",
        languages = Seq("en"), minQuality = 0.3)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L)) // dup 2 dropped, fr 3 dropped, junk 4 dropped
  }

  test("QualityGate keeps exactly the declarative filter's rows (r11 fused gate)") {
    // the gate's JVM score/argmax arithmetic must replicate the Column
    // forms operation-for-operation — checked over the whole fixture, for
    // several (languages, minQuality) settings including boundary floors
    val docs = Tables.load(spark, SparkTestBase.sfDir, "documents")
    for ((langs, q) <- Seq(
        (Seq("en"), 0.3), (Seq("en", "fr"), 0.5), (Seq("de"), 0.0),
        (Seq("en"), 0.62), (Seq("und"), 0.3))) {
      val declarative = graft.operators.TextAnalysis.qualityScoreFromStats(
          docs.withColumn("__st",
            graft.operators.TextAnalysis.textStats(col("text"))), col("__st"))
        .withColumn("pred_lang",
          graft.operators.TextAnalysis.languageIdFromStats(col("__st")))
        .filter(col("pred_lang").isin(langs: _*) && col("quality_score") >= q)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val gated = docs.filter(
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.QualityGate(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("text")),
            langs, q)))
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(gated == declarative, s"gate mismatch for langs=$langs q=$q")
    }
  }
}

class DedupClusterSpec extends SparkTestBase {
  import spark.implicits._

  test("connectedComponents: transitive chain collapses to min id") {
    // 1-2, 2-3 (no 1-3 pair), plus isolated pair 7-9
    val pairs = Seq((1L, 2L), (2L, 3L), (9L, 7L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents: long path converges past one round") {
    // path 1-2-3-4-5-6: min label needs multiple propagation rounds
    val pairs = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(cc.values.toSet == Set(1L) && cc.keySet == (1L to 6L).toSet)
  }

  test("dedupByClusters keeps one doc per cluster and all unpaired docs") {
    val docs = Seq(
      (1L, "aa"), (2L, "bb"), (3L, "cc"), (4L, "dd"), (5L, "ee"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByClusters(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L)) // 2,3 fold into cluster 1
  }

  test("winnowMd5: deterministic, dedup'd, and guards short texts") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // identical → same set
      (3L, "short")) // < k + w - 1 chars → empty
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.winnowMd5(col("text"), 8, 4).as("fp"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) == rows(2L) && rows(1L).nonEmpty)
    assert(rows(1L).distinct == rows(1L)) // dedup'd
    assert(rows(3L).isEmpty)
    // every fingerprint is one of the k-gram md5s (a window min)
    val text = "the quick brown fox jumps over the lazy dog"
    val md = java.security.MessageDigest.getInstance("MD5")
    val all = (0 to text.length - 8).map { i =>
      md.digest(text.substring(i, i + 8).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.toSet
    assert(rows(1L).forall(all.contains))
  }

  test("scrubPii redacts every category; counts match; clean text untouched") {
    val df = Seq(
      (1L, "mail a.b+c@x.co.uk or 10.0.0.1, ssn 123-45-6789, tel 555-123-4567"),
      (2L, "no pii here, just 3-4 numbers like 12 and 3.14"),
      (3L, "")).toDF("id", "text")
    val out = df.select(col("id") +: TextAnalysis.piiCounts(col("text"))
        .map { case (n, c) => c.as(n) } :+
        TextAnalysis.scrubPii(col("text")).as("scrubbed"): _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 1 && out(1L).getInt(2) == 1 &&
      out(1L).getInt(3) == 1 && out(1L).getInt(4) == 1)
    val scrubbed = out(1L).getString(5)
    assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<SSN>") &&
      scrubbed.contains("<PHONE>") && scrubbed.contains("<IP>"))
    assert(!scrubbed.contains("@") && !scrubbed.contains("123-45"))
    assert(out(2L).toSeq.drop(1) == Seq(0, 0, 0, 0,
      "no pii here, just 3-4 numbers like 12 and 3.14"))
    assert(out(3L).getString(5) == "")
  }

  test("repetitionFeatures: duplicate sentences and top bigram counted exactly") {
    val df = Seq(
      (1L, "aa bb. cc dd. aa bb. ee"),       // "aa bb" twice of 4 sentences
      (2L, "x y x y x y"),                   // top bigram "x y" occurs 3x
      (3L, "")).toDF("id", "text")
    val out = TextAnalysis.repetitionFeatures(df, "text")
      .select("id", "dup_sent_frac", "dup_sent_char_frac", "top_bigram_count")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(1) == 0.25) // 4 sents, 3 distinct
    // dup char mass = 5 ("aa bb" once beyond first) / total 17 chars
    assert(math.abs(out(1L).getDouble(2) - 5.0 / 17.0) < 1e-12)
    assert(out(2L).getInt(3) == 3)
    assert(out(3L).getDouble(1) == 0.0 && out(3L).getInt(3) == 0)
  }

  test("hashSplit: deterministic, pure function of the id, fractions hold") {
    val docs = (1L to 2000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = graft.operators.Curation.hashSplit(docs, "doc_id", 0.1, 0.1)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // identical assignments on a repartitioned rerun (stability under layout)
    val b = graft.operators.Curation.hashSplit(docs.repartition(13), "doc_id", 0.1, 0.1)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // growth stability: a doc keeps its split when the corpus doubles
    val grown = (1L to 4000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val c = graft.operators.Curation.hashSplit(grown, "doc_id", 0.1, 0.1)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.forall { case (k, v) => c(k) == v })
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("val") - 0.1) < 0.03 && math.abs(frac("test") - 0.1) < 0.03)
    intercept[IllegalArgumentException] {
      graft.operators.Curation.hashSplit(docs, "doc_id", 0.6, 0.5)
    }
  }

  test("packSequences: intervals tile each shard's token stream exactly") {
    val docs = (1L to 300L).map(i => (i, (i % 37 + 1).toInt)).toDF("doc_id", "n_tok")
    val packed = graft.operators.Curation.packSequences(docs, "doc_id", "n_tok",
      budget = 64, shards = 4).cache()
    // every doc's pieces sum back to its token count
    val sums = packed.groupBy("doc_id")
      .agg(sum(col("off_end") - col("off_start")).as("s"))
      .join(docs, "doc_id").filter(col("s") =!= col("n_tok")).count()
    assert(sums == 0)
    // within a shard every sequence except the last is exactly full
    val seqFill = packed.groupBy("shard", "seq_id")
      .agg(sum(col("off_end") - col("off_start")).as("fill"))
    val lastSeq = seqFill.groupBy("shard").agg(max("seq_id").as("last"))
    val short = seqFill.join(lastSeq, "shard")
      .filter(col("seq_id") < col("last") && col("fill") =!= 64).count()
    assert(short == 0)
    // offsets always inside the budget window
    assert(packed.filter(col("off_start") < 0 || col("off_end") > 64 ||
      col("off_start") > col("off_end")).count() == 0)
    packed.unpersist()
  }

  test("packGreedy: no pack overflows unless a single doc does; all docs kept") {
    val docs = (1L to 500L).map(i => (i, (i % 97 + 1).toInt)).toDF("doc_id", "n_tok")
    val packed = graft.operators.Curation.packGreedy(docs, "doc_id", "n_tok",
      budget = 100, shards = 4).cache()
    assert(packed.count() == 500)
    assert(packed.select("id").distinct().count() == 500)
    val over = packed.groupBy("shard", "pack_id")
      .agg(sum("tokens").as("t"), count(lit(1)).as("n"))
      .filter(col("t") > 100 && col("n") > 1).count()
    assert(over == 0)
    // deterministic under input layout
    val again = graft.operators.Curation.packGreedy(docs.repartition(11),
      "doc_id", "n_tok", budget = 100, shards = 4)
    assert(packed.orderBy("shard", "id").collect().toSeq ==
      again.orderBy("shard", "id").collect().toSeq)
    packed.unpersist()
  }

  test("sampleMixture: rate-0 drops the domain, absent domains keep all") {
    val docs = (1L to 900L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val kept = graft.operators.Curation.sampleMixture(docs, "doc_id", "source",
      Map("src0" -> 0.0, "src1" -> 0.5))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("src0"))
    assert(kept("src2") == 300)
    assert(kept("src1") > 100 && kept("src1") < 200)
  }

  test("capPerGroup: keeps best-k per group with deterministic tie-break") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 5L), (6L, "c", 1L)
    ).toDF("doc_id", "source", "n_chars")
    val kept = graft.operators.Curation
      .capPerGroup(docs, "source", "doc_id", 2, col("n_chars").desc)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // group a: n_chars 30 (ids 2,4 — id tie-break keeps 2 then 4); b, c whole
    assert(kept == Seq(2L, 4L, 5L, 6L))
    // invariance under physical row order
    val again = graft.operators.Curation
      .capPerGroup(docs.repartition(7), "source", "doc_id", 2, col("n_chars").desc)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == kept)
  }

  test("samplePerGroup: exact k per group, stable under repartitioning") {
    val docs = (1L to 600L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val s1 = graft.operators.Curation.samplePerGroup(docs, "source", "doc_id", 25)
    val counts = s1.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet == Set(25L) && counts.size == 3)
    val s2 = graft.operators.Curation
      .samplePerGroup(docs.repartition(13), "source", "doc_id", 25)
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq ==
      s2.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("topFractionPerGroup: per-group percentile cut, deterministic ties") {
    val docs = Seq(
      (1L, "a", 9.0), (2L, "a", 8.0), (3L, "a", 7.0), (4L, "a", 1.0), (5L, "a", 1.0),
      (6L, "b", 2.0), (7L, "b", 3.0)
    ).toDF("doc_id", "source", "quality")
    val kept = graft.operators.Curation
      .topFractionPerGroup(docs, "source", "doc_id", 0.5, col("quality").desc)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // a: 5 rows, cume_dist <= 0.5 keeps positions 1-2 (9.0, 8.0);
    // b: 2 rows, keeps position 1 (3.0)
    assert(kept == Seq(1L, 2L, 7L))
    val again = graft.operators.Curation
      .topFractionPerGroup(docs.repartition(5), "source", "doc_id", 0.5,
        col("quality").desc)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == kept)
  }

  test("tokenBudgetPerGroup: budget binds per group, crossing row dropped, order-invariant") {
    val docs = Seq(
      (1L, "a", 50L), (2L, "a", 50L), (3L, "a", 50L), (4L, "a", 50L),
      (5L, "b", 90L), (6L, "b", 20L)
    ).toDF("doc_id", "source", "n_tok")
    val kept = graft.operators.Curation
      .tokenBudgetPerGroup(docs, "source", "doc_id", "n_tok", 100L)
    val bySrc = kept.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_tok").as("t"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // group a: exactly 2 of the 50-token docs fit; which two is hash-order
    assert(bySrc("a") == (2L, 100L))
    // group b: hash order decides whether 90 or 90+20… any prefix ≤ 100
    assert(bySrc("b")._2 <= 100L && bySrc("b")._1 >= 1L)
    val again = graft.operators.Curation
      .tokenBudgetPerGroup(docs.repartition(7), "source", "doc_id", "n_tok", 100L)
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("hot-group mitigation: cap keeps Catalyst's partial limit, budget two-phase ≡ direct (r12)") {
    // one mega-group (90% of rows), several small groups, heavy ties,
    // hot group deliberately scattered across partitions
    val rnd = new scala.util.Random(31)
    val rows = (1L to 4000L).map { i =>
      val g = if (i <= 3600) "hot" else s"g${i % 7}"
      (i, g, rnd.nextInt(40).toLong, rnd.nextInt(5).toDouble)
    }
    val docs = rows.toDF("doc_id", "source", "n_tok", "quality")
      .repartition(11)

    // capPerGroup relies on InferWindowGroupLimit planting a MAP-SIDE
    // Partial group limit below the group exchange — lock the plan so a
    // refactor (e.g. anything that hides the rank filter from the rule)
    // can't silently bring the hot-group reducer wall back
    val cap = graft.operators.Curation
      .capPerGroup(docs, "source", "doc_id", 37, col("quality").desc)
    cap.collect()
    val plan = cap.queryExecution.executedPlan.toString
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(source")
    assert(exchangeIdx >= 0, plan)
    val belowExchange = plan.substring(exchangeIdx)
    assert(belowExchange.contains("WindowGroupLimit")
        && belowExchange.contains("Partial"),
      s"no map-side WindowGroupLimit below the exchange:\n$plan")

    // tokenBudgetPerGroup's manual two-phase (Catalyst can't infer a
    // running-sum cut) must equal the direct single-window form row-for-row
    val ws = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val wb = ws.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val directBudget = docs.withColumn("__cum", sum(col("n_tok").cast("long")).over(wb))
      .filter(col("__cum") <= 700L).drop("__cum")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val twoPhaseBudget = graft.operators.Curation
      .tokenBudgetPerGroup(docs, "source", "doc_id", "n_tok", 700L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(twoPhaseBudget == directBudget && directBudget.nonEmpty)
    // tight budget: the sentinel (first crossing row) logic must not
    // resurrect rows the direct form drops
    val tight = graft.operators.Curation
      .tokenBudgetPerGroup(docs, "source", "doc_id", "n_tok", 41L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val directTight = docs.withColumn("__cum", sum(col("n_tok").cast("long")).over(wb))
      .filter(col("__cum") <= 41L).drop("__cum")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(tight == directTight)
  }

  test("topFractionPerGroupPrefiltered ≡ direct: skew, ties, nulls, NaN, both directions (r12)") {
    val rnd = new scala.util.Random(47)
    val rows = (1L to 5000L).map { i =>
      val g = if (i <= 4500) "hot" else s"g${i % 5}"
      // heavy ties (11 distinct values), planted NaNs everywhere; nulls
      // only in the small groups, so the hot group's desc prefilter stays
      // ACTIVE (desc + nulls escapes the group by design)
      val q: java.lang.Double =
        if (i % 97 == 0 && i > 4500) null
        else if (i % 131 == 0) Double.NaN
        else rnd.nextInt(11).toDouble
      (i, g, q)
    }
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3)), 9),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("quality",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
    for (f <- Seq(0.02, 0.3, 0.97); ord <- Seq(col("quality").desc, col("quality").asc_nulls_first)) {
      val direct = graft.operators.Curation
        .topFractionPerGroup(docs, "source", "doc_id", f, ord)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val pre = graft.operators.Curation
        .topFractionPerGroupPrefiltered(docs, "source", "doc_id", f, ord)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(pre == direct, s"fraction=$f order=$ord")
      assert(direct.nonEmpty)
    }
  }

  test("decontaminate: planted eval overlap flagged, clean docs pass, threshold honored") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // full containment of a benchmark 5-gram window (many shared 5-grams)
      (1L, "xx alpha beta gamma delta epsilon zeta yy"),
      // exactly one shared 5-gram
      (2L, "alpha beta gamma delta epsilon completely different tail here"),
      // no overlap
      (3L, "the quick brown fox jumps over the lazy dog"),
      // too short to shingle
      (4L, "tiny doc")).toDF("doc_id", "text")
    val hits = graft.operators.Curation.decontaminate(
        corpus, bench, "text", "doc_id", n = 5, minShared = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(1L) && hits(1L) >= 2)
    assert(hits(2L) == 1L)
    assert(!hits.contains(3L) && !hits.contains(4L))
    // raising the threshold drops the single-gram hit
    val strict = graft.operators.Curation.decontaminate(
        corpus, bench, "text", "doc_id", n = 5, minShared = 2)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L))
  }
  test("decontaminateBloom: row-identical to decontaminate at any fpp") {
    // larger corpus so the bloom actually prunes and (at the high fpp) also
    // admits false positives that MUST die in the exact-verify join
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ")
    val bench = Seq((100L, words.take(8).mkString(" ")),
      (101L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val corpus = (1L to 200L).map { i =>
      val body =
        if (i % 7 == 0) s"xx ${words.take(6).mkString(" ")} tail$i" // overlap
        else if (i % 11 == 0) s"one two three four five noise$i six seven"
        else s"doc $i " + (1 to 12).map(j => s"w${i}_$j").mkString(" ")
      (i, body)
    }.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (minShared <- Seq(1, 2); fpp <- Seq(0.01, 0.5)) {
      val exact = rows(graft.operators.Curation.decontaminate(
        corpus, bench, "text", "doc_id", n = 5, minShared = minShared))
      val bloom = rows(graft.operators.Curation.decontaminateBloom(
        corpus, bench, "text", "doc_id", n = 5, minShared = minShared,
        fpp = fpp))
      assert(bloom == exact, s"minShared=$minShared fpp=$fpp")
      assert(exact.nonEmpty)
    }
    // explicit sizing path (expectedGrams given: no driver count job)
    val sized = rows(graft.operators.Curation.decontaminateBloom(
      corpus, bench, "text", "doc_id", n = 5, minShared = 1,
      expectedGrams = 64, fpp = 0.01))
    assert(sized == rows(graft.operators.Curation.decontaminate(
      corpus, bench, "text", "doc_id", n = 5, minShared = 1)))
  }

  test("dedupSpans: corpus-wide keep-first, short spans exempt, empty-doc contract") {
    val docs = Seq(
      (1L, "this paragraph is repeated boilerplate text\nunique content of document one\nok"),
      (2L, "this paragraph is repeated boilerplate text\nunique content of document two"),
      (3L, "this paragraph is repeated boilerplate text"),
      (4L, "ok\nok\nok")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.dedupSpans(docs, "text", "doc_id",
        sep = "\n", joinSep = "\n", minChars = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1 owns the boilerplate (smallest id) and keeps everything
    assert(out(1L)._1 == "this paragraph is repeated boilerplate text\nunique content of document one\nok")
    // doc 2 loses the boilerplate, keeps its unique span
    assert(out(2L)._1 == "unique content of document two")
    assert(out(2L)._2 == 2L && out(2L)._3 == 1L)
    // doc 3 was ONLY boilerplate -> present with empty text, 0 kept
    assert(out(3L)._1 == "" && out(3L)._3 == 0L)
    // short spans ("ok" < minChars) are never deduped, even repeated
    assert(out(4L)._1 == "ok\nok\nok" && out(4L)._3 == 3L)
  }
  test("temperatureMixture: alpha=1 keeps everything, lower alpha flattens the head") {
    val docs = ((1L to 900L).map(i => (i, "big")) ++ (901L to 1000L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val all = graft.operators.Curation.temperatureMixture(docs, "doc_id", "source", 1.0)
    assert(all.count() == 1000L) // alpha=1: rates all 1
    val t = graft.operators.Curation.temperatureMixture(docs, "doc_id", "source", 0.5)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t("small") == 100L) // smallest domain is the rate-1 anchor
    // head downsampled toward sqrt ratio: expected rate sqrt(100/900) = 1/3
    assert(t("big") > 200L && t("big") < 400L)
    // deterministic under repartitioning
    val t2 = graft.operators.Curation.temperatureMixture(
        docs.repartition(7), "doc_id", "source", 0.5)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t == t2)
    intercept[IllegalArgumentException] {
      graft.operators.Curation.temperatureMixture(docs, "doc_id", "source", 0.0)
    }
  }
}
