package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins (builder brief: "skewed keys → salting or AQE
  * skew-join"). AQE's skew-join split handles sort-merge skew adaptively;
  * this operator is the explicit form for the case AQE cannot fix — a
  * broadcast-sized-but-hot build side against a fact table whose hot keys
  * concentrate in few partitions, or engines/configs where AQE is off.
  *
  * Classic salting: the probe (large, skewed) side gets a deterministic salt
  * in [0, buckets) derived from a hash of the whole row; the build side is
  * replicated `buckets`× with every salt value. The join key becomes
  * (key, salt), spreading each hot key over `buckets` reducers. Replication
  * multiplies the build side — use for dimension-sized builds only (the same
  * contract broadcast has, without requiring it to fit in one task's memory
  * all at once).
  */
object Skew {

  /** Inner/left equi-join with salted keys.
    *
    * @param buckets salt fan-out: hot keys spread over this many reducers
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting preserves $joinType semantics only for inner/left joins")
    // deterministic salt: hash of ALL probe columns → stable across retries
    // and runs (a random salt would break speculative-execution idempotence)
    val salt = pmod(xxhash64(probe.columns.map(col).toIndexedSeq: _*), lit(buckets))
    val salted = probe.withColumn("__salt", salt)
    val replicated = build
      .withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Per-key frequency report to decide whether salting is needed: top-n
    * keys by row count with their share of the table.
    */
  def keySkewReport(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / total)
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
