package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the reference's `merge_asof` (reference:
  * datastore/pandas_api.py:1176-1240, which materializes both sides into
  * pandas; SURVEY §2.C flags it as one of the few genuinely custom operators).
  *
  * Spark-first design (scales where the reference's fallback cannot): instead
  * of a nested-loop or per-key collect, we UNION the two sides tagged with a
  * side marker, hash-partition by the `by` keys, sort within each partition by
  * (key, ts, side), and forward-fill the right side's columns with
  * `last(ignoreNulls)` over an unbounded-preceding window. One shuffle, no
  * broadcast requirement, no skew beyond the key distribution itself — the
  * same plan shape a 1000-executor cluster wants for a 100 TB as-of join.
  *
  * Direction "backward" (the pandas default): each left row gets the most
  * recent right row with rightTs <= leftTs. "forward" is the mirror (ordering
  * reversed). Ties on ts: the right row sorts before the left row, so an
  * exactly-equal timestamp matches (pandas allow_exact_matches=True).
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      byKeys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tsOut: String = "__asof_ts"): DataFrame =
    join(left, right, byKeys, leftTs, rightTs, rightCols, tsOut, forward = false)

  def forward(
      left: DataFrame,
      right: DataFrame,
      byKeys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tsOut: String = "__asof_ts"): DataFrame =
    join(left, right, byKeys, leftTs, rightTs, rightCols, tsOut, forward = true)

  private def join(
      left: DataFrame,
      right: DataFrame,
      byKeys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tsOut: String,
      forward: Boolean): DataFrame = {

    // left's payload columns (ts itself travels as tsOut, so it is excluded
    // here — this also makes tsOut == leftTs legal)
    val leftCols = left.columns.toSeq.filterNot(c => byKeys.contains(c) || c == leftTs)
    // tagged union: side 0 = right (sorts before left on ts ties → exact match wins)
    val rightTagged = right.select(
      (byKeys.map(col) :+ col(rightTs).as(tsOut) :+ lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
    val leftTagged = left.select(
      (byKeys.map(col) :+ col(leftTs).as(tsOut) :+ lit(1).as("__side")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)

    val unioned = rightTagged.unionByName(leftTagged)
    val ord =
      if (forward) Seq(col(tsOut).desc, col("__side").asc)
      else Seq(col(tsOut).asc, col("__side").asc)
    val w = Window.partitionBy(byKeys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__f_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("__side") === 1)
      .select((byKeys.map(col) :+ col(tsOut)) ++
        leftCols.map(col) ++
        rightCols.map(c => col(s"__f_$c").as(c)): _*)
  }
}
