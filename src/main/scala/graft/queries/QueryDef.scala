package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One driver-checked operator query: Spark implementation + (when ANSI-SQL-
  * expressible) a DuckDB oracle over the same tables. `bench = true` marks it
  * part of the headline Bench set run at sf0.1. `benchOnly = true` keeps it
  * OUT of the correctness gate (SparkEntry.queries/Verify): for timing a
  * production parameterization whose CORRECTNESS is already pinned by a
  * fixture-shaped sibling (q183 times SemDeDup's auto-√n defaults; q146
  * holds its oracle).
  */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false,
    benchOnly: Boolean = false)

/** Shared helpers for cross-engine float determinism.
  *
  * Sums of doubles are order-dependent, and Spark's partial aggregation order
  * differs from DuckDB's sequential scan — so money aggregates go through
  * exact decimals: double → DECIMAL(12,2) (exact: source values are 2-dp) →
  * exact decimal sum → double. Both engines then produce bit-identical
  * doubles. `l_quantity` is integer-valued, so plain double sums are already
  * exact. Statistical aggregates (stddev/corr) are rounded instead.
  */
object Q {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  /** Size-gated broadcast hint for join build sides that GROW with scale
    * factor (customer/orders/part/supplier slices).
    *
    * An unconditional `broadcast()` that wins at sf0.1 is the wrong plan at
    * 100 TB: the forced build side no longer fits executor memory and the
    * hint denies Catalyst its sort-merge fallback — an OOM, not a slow
    * query. `dim` hints only when the optimizer's plan-time size estimate
    * fits the session's autoBroadcastJoinThreshold; above it the frame is
    * returned unhinted and the decision is left to Catalyst and AQE, whose
    * runtime statistics can still pick a broadcast when the post-filter
    * build side turns out small. Genuinely constant-size tables (nation: 25
    * rows, region: 5, single-row scalar aggregates, per-nation rollups) keep
    * their unconditional `broadcast()` — those are safe at any scale.
    *
    * The gate is plan-time conservative: without CBO column statistics a
    * Filter's estimate is its scan's file size, so a narrow slice of a huge
    * table stays unhinted and relies on AQE — the scale-safe default.
    */
  def dim(df: DataFrame): DataFrame = {
    val thresholdStr = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val threshold =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(thresholdStr)
      catch { case _: Exception => -1L }
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && est <= threshold) broadcast(df) else df
  }

  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  def rate(c: Column): Column = c.cast(DecimalType(3, 2))
  def dsum(c: Column): Column = sum(money(c)).cast("double")

  /** The same trick, spelled in DuckDB SQL. */
  def dsumSql(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE)"
}
