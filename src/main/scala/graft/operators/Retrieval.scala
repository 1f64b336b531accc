package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus retrieval scoring — BM25 (Robertson et al.; the Lucene
  * `k1`/`b` practical form with the non-negative
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf). In a training-data pipeline
  * this is the "select documents similar to a high-quality seed query"
  * primitive (quality-targeted sampling / domain boosting), one level
  * above the bag-of-heuristics quality scores.
  *
  * 100 TB shape (r15): ONE corpus-side shuffle total. The query's term
  * set is DRIVER-TINY; it prefilters the exploded token stream, and the
  * surviving (query-term occurrence) rows are aggregated straight to one
  * row per matched document — `groupBy(id, dl)` with one conditional
  * `sum` per query term — so the document length rides the same shuffle
  * (no corpus-wide (id, dl) join, no second tokenize of the scored side).
  * Corpus scalars (N, avgdl) AND the |query|-bounded per-term document
  * frequencies (array_contains over the unexploded token array) come from
  * ONE map-side-combined aggregate over a zero-shuffle projection (r21 —
  * the old shape collected df from a second execution of the per-doc
  * pipeline, a full extra corpus pass plus its shuffle); idf folds into
  * the final scoring PROJECTION as literals. Nothing corpus-sized is ever
  * joined or re-shuffled after the single (id, dl) aggregation.
  */
object Retrieval {

  /** Per-document BM25 score for `query` over `textCol`; returns
    * (idCol, n_terms, bm25) for documents matching ≥1 query term.
    * Tokenization is the engine-wide [[graft.functions.GraftFunctions
    * .tokenize]] (lowercase letter/number runs). Rows with NULL `textCol`
    * are excluded from the corpus entirely (they can match no term and
    * would otherwise skew N/avgdl while contributing nothing).
    */
  def bm25(df: DataFrame, textCol: String, idCol: String, query: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = query.toLowerCase.split("[^\\p{L}\\p{N}]+")
      .filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "bm25: query has no tokens")

    val toks = graft.functions.GraftFunctions.tokenize(col(textCol))
    val tokenized = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), size(toks).as("dl"), toks.as("toks"))

    // corpus scalars AND per-term document frequencies in ONE map-side-
    // combined aggregate, zero shuffle (r21). df_i = #docs whose token
    // array contains term i — array_contains over the unexploded array is
    // the same integer the old shape derived from the per-doc tf frame
    // (tf_i > 0 ⟺ the array contains the term), so every idf literal and
    // therefore every score is bit-identical; what's gone is the SECOND
    // full corpus pass (tokenize → explode → groupBy shuffle) the old
    // dfRow collection re-executed before the real scoring pass ran it
    // again (guide §1.2: don't compute things twice; §2.4 remove shuffles).
    val statCols = sum("dl").as("sumdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)).as(s"df_$i")
      }
    val meta = tokenized.agg(count(lit(1)).as("n"), statCols: _*).head()
    val n = meta.getLong(0)
    require(n > 0, "bm25: empty corpus")
    val avgdl = meta.getLong(1).toDouble / n

    // the ONLY corpus-side shuffle: explode → keep query terms only →
    // straight to one row per matched doc, dl riding the grouping key
    // (dl is functionally dependent on id). |terms| conditional sums —
    // bounded by the query, map-side combined.
    def tfc(i: Int) = col(s"tf_$i")
    val perDoc = tokenized
      .select(col("id"), col("dl"), explode(col("toks")).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy("id", "dl")
      .agg(
        sum(when(col("t") === terms.head, 1L).otherwise(0L)).as("tf_0"),
        terms.tail.zipWithIndex.map { case (t, i) =>
          sum(when(col("t") === t, 1L).otherwise(0L)).as(s"tf_${i + 1}")
        }: _*)

    // terms absent from the corpus have df_i = 0 and tf_i = 0 everywhere:
    // the when(tf > 0) guards below make them contribute nothing to either
    // n_terms or the score, so their idf value is irrelevant (an
    // all-absent query yields an empty, correctly-typed result).
    val idf = terms.indices.map { i =>
      val d = meta.getLong(2 + i)
      math.log(1.0 + (n - d + 0.5) / (d + 0.5))
    }

    // scoring is a pure projection over the per-doc frame
    val nTerms: Column = terms.indices
      .map(i => when(tfc(i) > 0, 1L).otherwise(0L)).reduce(_ + _)
    val score: Column = terms.indices.map { i =>
      when(tfc(i) > 0,
        lit(idf(i)) * (tfc(i) * (k1 + 1.0)) /
          (tfc(i) + lit(k1) * (lit(1.0 - b) + col("dl") * b / avgdl)))
        .otherwise(lit(0.0))
    }.reduce(_ + _)

    perDoc.select(col("id").as(idCol), nTerms.as("n_terms"),
      score.as("bm25"))
  }
}
