package graft

import graft.operators.Retrieval

/** BM25 corpus retrieval (r14). */
class RetrievalSpec extends SparkTestBase {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "fast fast join"),
    (2L, "join"),
    (3L, "slow scan sort")).toDF("doc_id", "text")

  test("bm25 matches the closed-form hand computation") {
    val got = Retrieval.bm25(corpus, "text", "doc_id", "fast join")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // N=3, dl = (3,1,3), avgdl = 7/3; df(fast)=1, df(join)=2
    val n = 3.0; val avgdl = 7.0 / 3.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double, idfV: Double) =
      idfV * (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    val d1 = w(2, 3, idf(1)) + w(1, 3, idf(2))
    val d2 = w(1, 1, idf(2))
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 2 && got(2L)._1 == 1)
    assert(math.abs(got(1L)._2 - d1) < 1e-12, s"${got(1L)._2} vs $d1")
    assert(math.abs(got(2L)._2 - d2) < 1e-12)
    assert(got(1L)._2 > got(2L)._2, "two matched terms must outrank one")
  }

  test("query terms absent from the corpus contribute nothing; all-absent is empty") {
    val some = Retrieval.bm25(corpus, "text", "doc_id", "join zzz")
      .collect().map(r => r.getLong(0)).toSet
    assert(some == Set(1L, 2L))
    assert(Retrieval.bm25(corpus, "text", "doc_id", "zzz qqq").count() == 0L)
  }

  test("SQL table-function surface agrees with the operator") {
    corpus.createOrReplaceTempView("retr_docs")
    val viaSql = sql(
      "SELECT doc_id, n_terms, bm25 FROM bm25(retr_docs, 'text', 'doc_id', 'fast join')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaOp = Retrieval.bm25(corpus, "text", "doc_id", "fast join")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaSql == viaOp)
  }

  test("only query terms reach the shuffle (prefiltered token stream)") {
    val plan = Retrieval.bm25(corpus, "text", "doc_id", "fast join")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("fast") && plan.contains("join"),
      "the tiny term set must appear as a pushed filter:\n" + plan)
  }

  test("exactly ONE corpus-side shuffle; no corpus join (r15 dl-carry)") {
    val plan = Retrieval.bm25(corpus, "text", "doc_id", "fast join")
      .queryExecution.executedPlan.toString
    // dl rides the single (id, dl) aggregation shuffle — the r14 design's
    // corpus-wide (id, dl) join exchange and third tokenize are gone
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      "bm25 scoring plan must have exactly one hash exchange:\n" + plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Join"),
      "bm25 scoring must be join-free (idf folds in as literals):\n" + plan)
  }

  test("null-text rows are excluded from the corpus (no NPE, clean N/avgdl)") {
    val withNulls = corpus.union(
      Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val got = Retrieval.bm25(withNulls, "text", "doc_id", "fast join")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val clean = Retrieval.bm25(corpus, "text", "doc_id", "fast join")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == clean, "a null-text row must not change any score")
    // all-null corpus: clear error, not an NPE
    val allNull = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25(allNull, "text", "doc_id", "fast")
    }
    assert(e.getMessage.contains("empty corpus"))
  }
}
