package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One driver-checked operator query: Spark implementation + (when ANSI-SQL-
  * expressible) a DuckDB oracle over the same tables. `bench = true` marks it
  * part of the headline Bench set run at sf0.1.
  */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

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

  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  def rate(c: Column): Column = c.cast(DecimalType(3, 2))
  def dsum(c: Column): Column = sum(money(c)).cast("double")

  /** The same trick, spelled in DuckDB SQL. */
  def dsumSql(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE)"
}
