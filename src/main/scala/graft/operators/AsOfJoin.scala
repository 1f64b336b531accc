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
  *
  * `strict = true` (r18 — ClickHouse `ASOF JOIN … ON l.ts > r.ts` /
  * pandas allow_exact_matches=False) excludes equal timestamps: the tie
  * order flips so the left row sorts BEFORE same-ts right rows, putting them
  * outside its unbounded-preceding carry frame — no second shuffle, same plan.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      byKeys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tsOut: String = "__asof_ts",
      toleranceMicros: Long = -1L,
      keepMatchTs: Boolean = false,
      strict: Boolean = false): DataFrame =
    join(left, right, byKeys, leftTs, rightTs, rightCols, tsOut,
      forward = false, toleranceMicros, keepMatchTs, strict)

  def forward(
      left: DataFrame,
      right: DataFrame,
      byKeys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tsOut: String = "__asof_ts",
      toleranceMicros: Long = -1L,
      keepMatchTs: Boolean = false,
      strict: Boolean = false): DataFrame =
    join(left, right, byKeys, leftTs, rightTs, rightCols, tsOut,
      forward = true, toleranceMicros, keepMatchTs, strict)

  /** direction="nearest": per left row, whichever of the backward/forward
    * match is closer in time (ties → the earlier/backward one, pandas
    * contract). Both directions come from the SAME hash partitioning — the
    * second window adds a sort, not a shuffle.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      byKeys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tsOut: String = "__asof_ts",
      toleranceMicros: Long = -1L,
      strict: Boolean = false): DataFrame = {
    val lid = "__asof_lid"
    // Correlation key must be DETERMINISTIC: the backward and forward join
    // subtrees evaluate `tagged` independently, so monotonically_increasing_id
    // would renumber rows between the two evaluations whenever `left` contains
    // a shuffle (or AQE re-plans) — pairing row A's backward match with row
    // B's forward match (ADVICE r2, medium). row_number over (byKeys, leftTs)
    // is stable: rows tied on (key, ts) have identical as-of matches by
    // construction, so any tie-break among them is interchangeable. The key is
    // unique only within a byKeys group, so the b/f correlation joins on
    // byKeys :+ lid.
    val wLid = Window.partitionBy(byKeys.map(col): _*).orderBy(col(leftTs).asc)
    val tagged = left.withColumn(lid, row_number().over(wLid))
    val b = join(tagged, right, byKeys, leftTs, rightTs, rightCols, tsOut,
        forward = false, toleranceMicros, keepMatchTs = true, strict = strict)
      .withColumnRenamed("__asof_match_ts", "__bts")
    val bCols = rightCols.map(c => col(s"$c").as(s"__b_$c"))
    val f = join(tagged, right, byKeys, leftTs, rightTs, rightCols, tsOut,
        forward = true, toleranceMicros, keepMatchTs = true, strict = strict)
      .select((byKeys.map(col) :+ col(lid) :+ col("__asof_match_ts").as("__fts")) ++
        rightCols.map(c => col(c).as(s"__f2_$c")): _*)
    val joined = b.select((b.columns.filterNot(rightCols.contains).map(col) ++ bCols): _*)
      .join(f, byKeys :+ lid)
    val t = col(tsOut)
    val db = abs(unix_micros(t.cast("timestamp")) - unix_micros(col("__bts").cast("timestamp")))
    val dfw = abs(unix_micros(t.cast("timestamp")) - unix_micros(col("__fts").cast("timestamp")))
    val useBackward = col("__fts").isNull || (col("__bts").isNotNull && db <= dfw)
    val out = rightCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, when(useBackward, col(s"__b_$c")).otherwise(col(s"__f2_$c")))
    }
    out.drop((rightCols.map(c => s"__b_$c") ++ rightCols.map(c => s"__f2_$c") ++
      Seq("__bts", "__fts", lid)): _*)
  }

  private def join(
      left: DataFrame,
      right: DataFrame,
      byKeys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tsOut: String,
      forward: Boolean,
      toleranceMicros: Long = -1L,
      keepMatchTs: Boolean = false,
      strict: Boolean = false): DataFrame = {

    // left's payload columns (ts itself travels as tsOut, so it is excluded
    // here — this also makes tsOut == leftTs legal)
    val leftCols = left.columns.toSeq.filterNot(c => byKeys.contains(c) || c == leftTs)
    // tagged union: side 0 = right (sorts before left on ts ties → exact match wins).
    // The matched right row's own ts travels as one more filled column — it
    // drives the tolerance cut and the nearest() distance compare.
    val rightTagged = right.select(
      (byKeys.map(col) :+ col(rightTs).as(tsOut) :+ lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        (rightCols.map(c => col(c).as(s"__r_$c")) :+
          col(rightTs).as("__r___mts")): _*)
    val leftTagged = left.select(
      (byKeys.map(col) :+ col(leftTs).as(tsOut) :+ lit(1).as("__side")) ++
        leftCols.map(col) ++
        (rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) :+
          lit(null).cast(right.schema(rightTs).dataType).as("__r___mts")): _*)

    val unioned = rightTagged.unionByName(leftTagged)
    // strict: left (side 1) sorts before same-ts right rows (side 0), so an
    // exactly-equal right timestamp falls outside the left row's carry frame
    val sideOrd = if (strict) col("__side").desc else col("__side").asc
    val ord =
      if (forward) Seq(col(tsOut).desc, sideOrd)
      else Seq(col(tsOut).asc, sideOrd)
    val w = Window.partitionBy(byKeys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val fillCols = rightCols :+ "__mts"
    val filled = fillCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__f_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    // tolerance (pandas merge_asof tolerance=, timestamps only): a match
    // farther than toleranceMicros from the left ts is discarded
    val matchTs = col("__f___mts")
    val withinTol =
      if (toleranceMicros < 0) matchTs.isNotNull
      else matchTs.isNotNull &&
        abs(unix_micros(col(tsOut).cast("timestamp")) -
          unix_micros(matchTs.cast("timestamp"))) <= toleranceMicros
    val matchTsOut =
      if (keepMatchTs) Seq(when(withinTol, matchTs).as("__asof_match_ts")) else Nil
    filled
      .filter(col("__side") === 1)
      .select((byKeys.map(col) :+ col(tsOut)) ++
        leftCols.map(col) ++
        rightCols.map(c => when(withinTol, col(s"__f_$c")).as(c)) ++
        matchTsOut: _*)
  }
}
