package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual inventory lives in [[graft.queries.Queries]]; one entry per
  * implemented operator family from SURVEY.md §2, each paired with a DuckDB
  * oracle when ANSI-SQL-expressible.
  */
object SparkEntry {
  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.byName("q01_tpch_q1").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (benchOnly
    * entries time production parameterizations and stay out of the gate —
    * their correctness twin carries the oracle).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.filterNot(_.benchOnly).map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (custom aggregates, LSH/ANN) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
