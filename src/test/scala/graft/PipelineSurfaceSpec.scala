package graft

import org.apache.spark.sql.functions._

import graft.ds.GraftFrame
import graft.operators.{Curation, Dedup, Similarity}

/** The pipeline tier's PUBLIC surfaces (r10 verdict "what's missing" #1):
  * every dedup/similarity/curation/fit operator is reachable from (a)
  * GraftFrame methods and (b) GraftSession SQL table functions — and each
  * surface produces exactly the underlying operator's result (thin
  * delegation, no reimplementation).
  */
class PipelineSurfaceSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, SparkTestBase.sfDir, "documents")
  private lazy val embs = Tables.load(spark, SparkTestBase.sfDir, "embeddings")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // ------------------------------------------------ frame-method surface

  test("frame: chunkText fixed windows with overlap; empty/null docs drop") {
    val df = Seq((1L, "abcdefghij"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = GraftFrame(df).chunkText("text", "id", 6, 2)
      .df.orderBy("id", "chunk_ix").collect()
    // stride 4: windows [1..6], [5..10]
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1L, 0, "abcdef"), (1L, 1, "efghij")))
    // exact multiple: len 8, size 4, no overlap -> exactly 2 full windows
    val ex = GraftFrame(Seq((9L, "abcdefgh")).toDF("id", "text"))
      .chunkText("text", "id", 4).df.orderBy("chunk_ix").collect()
    assert(ex.map(_.getString(2)).toSeq == Seq("abcd", "efgh"))
  }

  test("frame: chunkSentences packs greedily, never splits a sentence") {
    val text =
      "One two. Three four five. Six! Seven eight nine ten eleven? Tail"
    val out = GraftFrame(Seq((1L, text)).toDF("id", "text"))
      .chunkSentences("text", "id", 26).df.orderBy("chunk_ix").collect()
    assert(out.map(_.getString(2)).toSeq == Seq(
      "One two. Three four five.", // 8 + 1 + 16 = 25 <= 26
      "Six!",                       // next sentence would overflow
      "Seven eight nine ten eleven?", // longer than budget: own chunk
      "Tail"))
    // one short sentence -> one chunk
    val single = GraftFrame(Seq((1L, "Hi there.")).toDF("id", "text"))
      .chunkSentences("text", "id", 100).df.collect()
    assert(single.length == 1 && single.head.getString(2) == "Hi there.")
  }

  test("sql: chunk_text / chunk_sentences table functions") {
    val gs = new graft.engine.GraftSession(spark)
    Seq((1L, "abcdefghij"), (2L, "One two. Three four five six seven."))
      .toDF("doc_id", "text").createOrReplaceTempView("__psurf_chunk")
    val fixed = gs.sql(
      "SELECT doc_id, chunk_ix, chunk FROM chunk_text(__psurf_chunk, 'text', 'doc_id', 6, 2) " +
        "WHERE doc_id = 1 ORDER BY chunk_ix").collect()
    assert(fixed.map(_.getString(2)).toSeq == Seq("abcdef", "efghij"))
    val sent = gs.sql(
      "SELECT chunk FROM chunk_sentences(__psurf_chunk, 'text', 'doc_id', 10) " +
        "WHERE doc_id = 2 ORDER BY chunk_ix").collect()
    assert(sent.map(_.getString(0)).toSeq ==
      Seq("One two.", "Three four five six seven."))
  }


  test("frame: replaceValues substitutes exact values, pass-through otherwise") {
    val f = GraftFrame(Seq(("O", 1), ("F", 2), ("X", 3), (null, 4))
      .toDF("st", "k"))
      .replaceValues("st", Map("O" -> "OPEN", "F" -> "FILLED"))
    val got = f.df.orderBy("k").collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("OPEN", "FILLED", "X", null))
    // numeric mapping too
    val g = GraftFrame(Seq(1, 2, 3).toDF("v"))
      .replaceValues("v", Map(2 -> 20))
      .df.orderBy("v").collect().map(_.getInt(0)).toSeq
    assert(g == Seq(1, 3, 20))
  }

  test("frame: dedupExact/dedupGroups delegate to Dedup") {
    val keyed = docs.withColumn("key", substring(col("text"), 1, 40))
    assert(rows(GraftFrame(keyed).dedupExact("key", "doc_id").df.select("doc_id"))
      == rows(Dedup.exactKeepFirst(keyed, "key", "doc_id").select("doc_id")))
    assert(rows(GraftFrame(keyed).dedupGroups("key", "doc_id").df)
      == rows(Dedup.exactGroups(keyed, "key", "doc_id")))
  }

  test("frame: minhashPairs matches operator output") {
    val sub = docs.filter(col("doc_id") < 200)
    assert(rows(GraftFrame(sub).minhashPairs("text", "doc_id", 0.5).df)
      == rows(Dedup.minhashLsh(sub, "text", "doc_id", 0.5)))
  }

  test("frame: curate matches Curation.curate (q103 shape)") {
    assert(rows(GraftFrame(docs).curate("text", "doc_id").df.select("doc_id"))
      == rows(Curation.curate(docs, "text", "doc_id").select("doc_id")))
  }

  test("frame: hashSplit/temperatureMixture/pack delegate") {
    assert(rows(GraftFrame(docs).hashSplit("doc_id", 0.1, 0.1).df
        .groupBy("split").count())
      == rows(Curation.hashSplit(docs, "doc_id", 0.1, 0.1)
        .groupBy("split").count()))
    assert(rows(GraftFrame(docs).packGreedy("doc_id", "n_chars", 2048).df)
      == rows(Curation.packGreedy(docs, "doc_id", "n_chars", 2048)))
  }

  test("frame: quality/language/tokens/pii columns appear") {
    val out = GraftFrame(docs.limit(50))
      .qualityScore("text").languageId("text").tokenCount("text", "ntk")
      .scrubPii("text").df
    assert(Seq("quality_score", "pred_lang", "ntk").forall(out.columns.contains))
    assert(out.count() == 50)
  }

  test("frame: decontaminate matches operator") {
    val bench = docs.filter(col("doc_id") % 37 === 0)
    assert(rows(GraftFrame(docs).decontaminate(GraftFrame(bench), "text", "doc_id").df)
      == rows(Curation.decontaminate(docs, bench, "text", "doc_id")))
  }

  test("frame: ANN topK surfaces match Similarity") {
    val queries = embs.filter(col("vec_id") < 3)
    assert(rows(GraftFrame(embs).bruteForceTopK(GraftFrame(queries), "embedding", "vec_id", 5).df)
      == rows(Similarity.bruteForceTopK(embs, queries, "embedding", "vec_id", 5)))
    assert(rows(GraftFrame(embs).ivfTopK(GraftFrame(queries), "embedding", "vec_id", 5).df)
      == rows(Similarity.ivfTopK(embs, queries, "embedding", "vec_id", 5)))
  }

  test("frame: linearFit/logisticFit return weight layouts") {
    val d = Seq((1.0, 2.0, 5.0), (2.0, 1.0, 4.0), (3.0, 3.0, 9.0), (4.0, 1.0, 6.0))
      .toDF("x1", "x2", "y")
    val w = GraftFrame(d).linearFit(col("y"), Seq(col("x1"), col("x2")))
      .df.head().getSeq[Double](0)
    assert(w.length == 3) // w1, w2, bias
    val lw = GraftFrame(d.withColumn("lbl", (col("y") > 5).cast("double")))
      .logisticFit(col("lbl"), Seq(col("x1"), col("x2")), epochs = 5)
    assert(lw.length == 3 && lw.exists(_ != 0.0))
  }

  // ------------------------------------------------ SQL-table-fn surface

  private def gs = new graft.engine.GraftSession(spark)

  test("sql: dedup_exact table function equals the operator") {
    docs.withColumn("key", substring(col("text"), 1, 40))
      .createOrReplaceTempView("__psurf_docs")
    val viaSql = gs.sql(
      "SELECT doc_id FROM dedup_exact(__psurf_docs, 'key', 'doc_id')")
    val direct = Dedup.exactKeepFirst(
      spark.table("__psurf_docs"), "key", "doc_id").select("doc_id")
    assert(rows(viaSql) == rows(direct))
  }

  test("sql: quality_score/token_count/language_id table functions") {
    docs.limit(100).createOrReplaceTempView("__psurf_small")
    val q = gs.sql("SELECT doc_id, quality_score FROM quality_score(__psurf_small, 'text')")
    assert(q.count() == 100)
    val tc = gs.sql("SELECT n_tokens FROM token_count(__psurf_small, 'text') WHERE n_tokens > 0")
    assert(tc.count() > 0)
    val li = gs.sql("SELECT DISTINCT pred_lang FROM language_id(__psurf_small, 'text')")
    assert(li.count() >= 1)
  }

  test("sql: hash_split respects fractions and is deterministic") {
    docs.createOrReplaceTempView("__psurf_docs2")
    val out = gs.sql("""SELECT split, COUNT(*) AS n
      FROM hash_split(__psurf_docs2, 'doc_id', 0.1, 0.1) GROUP BY split""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("train", "val", "test"))
    assert(out("train") > out("val") && out("train") > out("test"))
    // deterministic: same SQL, same counts
    val again = gs.sql("""SELECT split, COUNT(*) AS n
      FROM hash_split(__psurf_docs2, 'doc_id', 0.1, 0.1) GROUP BY split""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("sql: minhash_pairs and curate compose with plain SQL") {
    docs.filter(col("doc_id") < 200).createOrReplaceTempView("__psurf_sub")
    val pairs = gs.sql("""SELECT COUNT(*) AS n
      FROM minhash_pairs(__psurf_sub, 'text', 'doc_id', 0.5)""").head().getLong(0)
    assert(pairs == Dedup.minhashLsh(
      spark.table("__psurf_sub"), "text", "doc_id", 0.5).count())
    val curated = gs.sql(
      "SELECT COUNT(*) AS n FROM curate(__psurf_sub, 'text', 'doc_id')")
      .head().getLong(0)
    assert(curated == Curation.curate(
      spark.table("__psurf_sub"), "text", "doc_id").count())
  }

  test("sql: cap_per_group / sample_per_group equal the operators") {
    docs.createOrReplaceTempView("__psurf_cap")
    val viaSql = gs.sql("""SELECT doc_id
      FROM cap_per_group(__psurf_cap, 'source', 'doc_id', 30, 'n_chars')""")
      .as[Long].collect().sorted.toSeq
    // SQL form orders ASCENDING on the named column (best = smallest)
    val viaOp = Curation.capPerGroup(docs, "source", "doc_id", 30,
      col("n_chars")).select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaSql == viaOp && viaSql.nonEmpty)
    val sampSql = gs.sql("""SELECT doc_id
      FROM sample_per_group(__psurf_cap, 'source', 'doc_id', 15)""")
      .as[Long].collect().sorted.toSeq
    val sampOp = Curation.samplePerGroup(docs, "source", "doc_id", 15)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(sampSql == sampOp && sampSql.nonEmpty)
    val tbSql = gs.sql("""SELECT doc_id
      FROM token_budget_per_group(__psurf_cap, 'source', 'doc_id', 'n_chars', 2000)""")
      .as[Long].collect().sorted.toSeq
    val tbOp = Curation.tokenBudgetPerGroup(docs, "source", "doc_id", "n_chars", 2000L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(tbSql == tbOp && tbSql.nonEmpty)
  }

  test("sql: sem_dedup equals the operator") {
    embs.createOrReplaceTempView("__psurf_sem")
    val viaSql = gs.sql("""SELECT id
      FROM sem_dedup(__psurf_sem, 'embedding', 'vec_id', 0.9, 4)""")
      .as[Long].collect().sorted.toSeq
    val viaOp = Dedup.semDedup(embs, "embedding", "vec_id", 0.9, 4)
      .select("id").as[Long].collect().sorted.toSeq
    assert(viaSql == viaOp && viaSql.nonEmpty)
    val paperSql = gs.sql("""SELECT id
      FROM sem_dedup(__psurf_sem, 'embedding', 'vec_id', 0.9, 4, 'centroidFar')""")
      .as[Long].collect().sorted.toSeq
    val paperOp = Dedup.semDedup(embs, "embedding", "vec_id", 0.9, 4,
        keep = "centroidFar")
      .select("id").as[Long].collect().sorted.toSeq
    assert(paperSql == paperOp && paperSql.nonEmpty)
  }

  test("sql: top_fraction_per_group follows the numeric-tail convention (r12)") {
    docs.createOrReplaceTempView("__psurf_tf")
    val viaSql = gs.sql("""SELECT doc_id
      FROM top_fraction_per_group(__psurf_tf, 'source', 'doc_id', 0.4, 'n_chars')""")
      .as[Long].collect().sorted.toSeq
    val viaOp = Curation.topFractionPerGroup(docs, "source", "doc_id", 0.4,
      col("n_chars")).select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaSql == viaOp && viaSql.nonEmpty)
    // default order = id-hash (uniform per-group fraction)
    val dfl = gs.sql("""SELECT doc_id
      FROM top_fraction_per_group(__psurf_tf, 'source', 'doc_id', 0.4)""")
      .as[Long].collect().sorted.toSeq
    val dflOp = Curation.topFractionPerGroup(docs, "source", "doc_id", 0.4,
      md5(col("doc_id").cast("string"))).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(dfl == dflOp && dfl.nonEmpty)
  }

  test("sql: table-fn args parse quoted commas and nested parens (r12)") {
    // a column literally NAMED "a,b" — the r11 split(",") parser cut the
    // quoted arg in half; the tokenizer splits on top-level commas only
    docs.withColumn("a,b", substring(col("text"), 1, 40))
      .createOrReplaceTempView("__psurf_comma")
    val viaSql = gs.sql(
      "SELECT doc_id FROM dedup_exact(__psurf_comma, 'a,b', 'doc_id')")
    val direct = Dedup.exactKeepFirst(
      spark.table("__psurf_comma"), "a,b", "doc_id").select("doc_id")
    assert(rows(viaSql) == rows(direct) && viaSql.count() > 0)
    // nested pipeline call in table-argument position resolves inner-first
    docs.withColumn("key", substring(col("text"), 1, 40))
      .createOrReplaceTempView("__psurf_nest")
    val nested = gs.sql("""SELECT doc_id, n_tokens
      FROM token_count(dedup_exact(__psurf_nest, 'key', 'doc_id'), 'text')""")
    val composed = GraftFrame(spark.table("__psurf_nest"))
      .dedupExact("key", "doc_id").tokenCount("text", "n_tokens")
      .df.select("doc_id", "n_tokens")
    assert(rows(nested) == rows(composed))
  }

  test("sql: fn names inside string literals and comments stay verbatim (r12)") {
    docs.limit(5).createOrReplaceTempView("__psurf_lit")
    val lit = gs.sql(
      "SELECT 'curate(a, b)' AS s FROM __psurf_lit LIMIT 1").head().getString(0)
    assert(lit == "curate(a, b)")
    val commented = gs.sql(
      "-- curate(__psurf_lit, 'text', 'doc_id')\nSELECT COUNT(*) AS n FROM __psurf_lit")
      .head().getLong(0)
    assert(commented == 5)
    // the source table functions route through the same scanner: a file()
    // call inside a string literal is data, not a scan (the r11 regex
    // rewrote it into a view name mid-literal)
    val litFile = gs.sql(
      "SELECT 'file(''x.parquet'', Parquet)' AS s FROM __psurf_lit LIMIT 1")
      .head().getString(0)
    assert(litFile == "file('x.parquet', Parquet)")
    // shape mismatch stays with Spark: `hudi` as a plain column fn call
    intercept[Exception] { gs.sql("SELECT hudi(doc_id) FROM __psurf_lit") }
  }

  test("sql: arity and type violations fail with the signature (r12)") {
    docs.createOrReplaceTempView("__psurf_err")
    val missing = intercept[IllegalArgumentException] {
      gs.sql("SELECT * FROM dedup_exact(__psurf_err, 'key')")
    }
    assert(missing.getMessage.contains("usage:")
      && missing.getMessage.contains("idCol"))
    val extra = intercept[IllegalArgumentException] {
      gs.sql("SELECT * FROM token_count(__psurf_err, 'text', 'oops', 1, 2)")
    }
    assert(extra.getMessage.contains("at most"))
    val notNum = intercept[IllegalArgumentException] {
      gs.sql("SELECT * FROM cap_per_group(__psurf_err, 'source', 'doc_id', 'many')")
    }
    assert(notNum.getMessage.contains("must be numeric"))
  }

  test("sql: pipeline view rebinds after the input view changes") {
    docs.limit(10).createOrReplaceTempView("__psurf_rebind")
    val n1 = gs.sql("SELECT COUNT(*) AS n FROM token_count(__psurf_rebind, 'text')")
      .head().getLong(0)
    docs.limit(25).createOrReplaceTempView("__psurf_rebind")
    val n2 = gs.sql("SELECT COUNT(*) AS n FROM token_count(__psurf_rebind, 'text')")
      .head().getLong(0)
    assert(n1 == 10 && n2 == 25)
  }
}
