package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered gap-filling — the reference's `merge_ordered`/ffill surface
  * (reference: datastore/pandas_api.py merge_ordered, pandas_compat fillna
  * method='ffill'; SURVEY §2.C "merge_ordered" → union + sort + window ffill).
  *
  * One hash shuffle by `keys`, then a sorted window per partition — the same
  * plan an as-of join uses, and the shape that scales: no driver collection,
  * no cross-partition ordering beyond the per-key window sort.
  */
object Fill {

  /** Forward-fill nulls in `cols`, per `keys` group, in `order` order. */
  def ffill(df: DataFrame, keys: Seq[String], order: Seq[String], cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Backward-fill: first non-null at or after the current row. */
  def bfill(df: DataFrame, keys: Seq[String], order: Seq[String], cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cols.foldLeft(df)((d, c) => d.withColumn(c, first(col(c), ignoreNulls = true).over(w)))
  }

  /** Linear interpolation over a NUMERIC order column (pandas
    * interpolate(method='values'); reference pandas_compat interpolate —
    * a pure pandas fallback there, a pair of windows here): each null gets
    * prev + (next − prev) · (t − tPrev)/(tNext − tPrev); leading/trailing
    * runs fall back to bfill/ffill respectively.
    */
  def interpolate(df: DataFrame, keys: Seq[String], orderCol: String, cols: Seq[String]): DataFrame = {
    val wb = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cols.foldLeft(df) { (d, c) =>
      val t = col(orderCol).cast("double")
      val prevV = last(col(c), ignoreNulls = true).over(wb)
      val prevT = last(when(col(c).isNotNull, t), ignoreNulls = true).over(wb)
      val nextV = first(col(c), ignoreNulls = true).over(wf)
      val nextT = first(when(col(c).isNotNull, t), ignoreNulls = true).over(wf)
      d.withColumn(c,
        when(col(c).isNotNull, col(c))
          .when(prevV.isNull, nextV)
          .when(nextV.isNull, prevV)
          .otherwise(prevV + (nextV - prevV) * (t - prevT) / (nextT - prevT)))
    }
  }
}
