package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus retrieval scoring — BM25 (Robertson et al.; the Lucene
  * `k1`/`b` practical form with the non-negative
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf). In a training-data pipeline
  * this is the "select documents similar to a high-quality seed query"
  * primitive (quality-targeted sampling / domain boosting), one level
  * above the bag-of-heuristics quality scores.
  *
  * 100 TB shape: the query's term set is DRIVER-TINY and prefilters the
  * exploded token stream BEFORE the only shuffle (per-(doc, term) counts
  * of query terms only — the full token stream is never shuffled);
  * corpus scalars (N, avgdl) come from one map-side-combined aggregate
  * over a zero-shuffle per-row token-count projection; per-term document
  * frequencies are bounded by |query| and come back to the driver, where
  * idf is computed and re-broadcast as a literal frame into the scoring
  * join. Scoring itself is a small-key aggregation over ≤ |query| rows
  * per matched document.
  */
object Retrieval {

  /** Per-document BM25 score for `query` over `textCol`; returns
    * (idCol, n_terms, bm25) for documents matching ≥1 query term.
    * Tokenization is the engine-wide [[graft.functions.GraftFunctions
    * .tokenize]] (lowercase letter/number runs).
    */
  def bm25(df: DataFrame, textCol: String, idCol: String, query: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = query.toLowerCase.split("[^\\p{L}\\p{N}]+")
      .filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "bm25: query has no tokens")
    val spark = df.sparkSession

    val toks = graft.functions.GraftFunctions.tokenize(col(textCol))
    val withDl = df.select(col(idCol).as("id"), size(toks).as("dl"))
    // corpus scalars: one aggregate over a zero-shuffle projection
    val meta = withDl.agg(count(lit(1)).as("n"), sum("dl").as("sumdl")).head()
    val n = meta.getLong(0)
    require(n > 0, "bm25: empty corpus")
    val avgdl = meta.getLong(1).toDouble / n

    // the ONLY shuffle: (doc, term) counts restricted to the query's terms
    val tf = df
      .select(col(idCol).as("id"), explode(toks).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy("id", "t").agg(count(lit(1)).as("tf"))

    // per-term document frequency: bounded by |query|, driver-side idf
    val dfByTerm = tf.groupBy("t").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // terms absent from the corpus simply have no idf row — the join drops
    // them, and an all-absent query yields an empty, correctly-typed result
    val idfRows = terms.flatMap { t =>
      dfByTerm.get(t).map { d =>
        (t, math.log(1.0 + (n - d + 0.5) / (d + 0.5)))
      }
    }
    import spark.implicits._
    val idf = broadcast(idfRows.toDF("t", "idf"))

    tf.join(idf, "t")
      .join(withDl, "id")
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + col("dl") * b / avgdl)))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms"), sum("contrib").as("bm25"))
      .withColumnRenamed("id", idCol)
  }
}
