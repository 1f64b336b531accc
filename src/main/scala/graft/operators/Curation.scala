package graft.operators

import org.apache.spark.sql.DataFrame
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
    // tokens materialize once and feed BOTH the quality features and the
    // language scores (repeating tokenize() would re-split per feature —
    // the projection-collapse trap)
    val scored = TextAnalysis.qualityScoreFromTokens(
        df.withColumn("__toks", graft.functions.GraftFunctions.tokenize(col(textCol))),
        textCol, col("__toks"))
      .withColumn("pred_lang", TextAnalysis.languageIdFromTokens(col("__toks")))
      .drop("__toks")
    val filtered = scored
      .filter(col("pred_lang").isin(languages: _*) && col("quality_score") >= minQuality)
    Dedup.exactKeepFirst(filtered, textCol, idCol)
  }
}
