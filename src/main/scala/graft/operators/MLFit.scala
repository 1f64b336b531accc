package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine model fitting — the Spark-first re-expression of the reference's
  * stochastic{Linear,Logistic}Regression aggregates
  * (datastore/function_definitions.py:5194, :5213 registers both;
  * ClickHouse pairs the fitted state with evalMLMethod for prediction —
  * mirrored by the evalMLMethod alias in GraftFunctions).
  *
  * DOCUMENTED DIVERGENCE: ClickHouse trains by per-thread SGD and averages
  * partial models — weights depend on row order and thread count, which is
  * non-deterministic by construction on a distributed engine. Both fits here
  * are DETERMINISTIC:
  *   - linear: exact ridge/OLS via the normal equations — the one-pass
  *     [[graft.functions.agg.LinRegFit]] aggregate (associative Gram-matrix
  *     accumulation, single k²-state shuffle at any scale).
  *   - logistic: full-batch gradient descent, one distributed aggregation per
  *     epoch. The gradient avg((σ(w·x)−y)·x) is a plain codegen'd SUM/COUNT
  *     over a projection — no per-row state, no order dependence beyond fp
  *     rounding of the partial sums. Weights live on the driver (k+1 doubles)
  *     and re-enter each epoch as literals, so the loop ships O(k) bytes per
  *     epoch and scans the data `epochs` times — at 100 TB you cache the
  *     (projected) feature frame once and each epoch is a map-side-partial
  *     aggregation with a k-sized shuffle. No collect of data rows ever.
  */
object MLFit {

  /** σ(z) as a Column (codegen'd, no UDF). */
  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  private def dot(w: Array[Double], feats: Seq[Column]): Column =
    feats.zip(w).map { case (f, wi) => f * lit(wi) }
      .reduceOption(_ + _).getOrElse(lit(0.0)) + lit(w.last)

  /** Full-batch logistic regression: minimize mean log-loss (+ l2/2·|w|² on
    * the non-bias weights) by `epochs` steps of gradient descent from w = 0.
    * `target` must evaluate to 0.0/1.0. Returns [w1…wk, bias] — same layout
    * as LinRegFit, so the same evalMLMethod applies (with a sigmoid for
    * probability).
    */
  def logisticFit(
      df: DataFrame,
      target: Column,
      features: Seq[Column],
      epochs: Int = 20,
      lr: Double = 0.5,
      l2: Double = 0.0): Array[Double] = {
    val k = features.length
    // project once: the per-epoch scan reads only k+1 doubles per row
    val cols = features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"x$i") } :+
      target.cast("double").as("y")
    // persist the k+1-column projection: every epoch re-aggregates it, and
    // without this the FULL upstream feature pipeline (e.g. q136's
    // tokenize+quality features) would re-execute once per epoch
    val proj = df.select(cols: _*).na.drop()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var w = new Array[Double](k + 1) // [w1…wk, bias] = 0
      val xCols = (0 until k).map(i => col(s"x$i"))
      var e = 0
      while (e < epochs) {
        val margin = dot(w, xCols) // w·x + b with current weights as literals
        val err = (sigmoid(margin) - col("y")).as("err")
        val gradCols = (0 until k).map(i => avg(col("err") * col(s"x$i")).as(s"g$i")) :+
          avg(col("err")).as("gb")
        val g = proj.withColumn("err", err).agg(gradCols.head, gradCols.tail: _*)
          .head()
        if (g.isNullAt(0)) return w // empty input: gradient undefined, w stays 0
        val next = new Array[Double](k + 1)
        var i = 0
        while (i < k) {
          next(i) = w(i) - lr * (g.getDouble(i) + l2 * w(i))
          i += 1
        }
        next(k) = w(k) - lr * g.getDouble(k) // bias unpenalized
        w = next
        e += 1
      }
      w
    } finally proj.unpersist()
  }

  /** Prediction margin w·x + bias for fitted weights (linear prediction;
    * wrap in a `> 0` for the logistic class or `sigmoid` for probability).
    */
  def predictMargin(w: Array[Double], features: Seq[Column]): Column =
    dot(w, features)

  /** P(y=1|x) under fitted logistic weights. */
  def predictProba(w: Array[Double], features: Seq[Column]): Column =
    sigmoid(dot(w, features))
}
