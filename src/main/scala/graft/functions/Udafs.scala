package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Concrete `Aggregator`-based UDAFs — the SURVEY §2.K custom-aggregate
  * surface (the reference explicitly rejects UDAFs, docs/udf.rst; Spark's
  * typed `Aggregator` + `functions.udaf` registration exceeds it). These are
  * library API, not test fixtures: register with
  * `GraftSession.createFunction(name, functions.udaf(SumOfSquares))` and the
  * aggregate participates in partial (map-side) aggregation like any native —
  * `reduce` runs pre-shuffle per partition, `merge` combines the per-partition
  * states, so the shuffle carries one Long per group, not the rows.
  */
object Udafs {

  /** Exact Σx² over integer inputs. Long state ⇒ order-independent and
    * bit-exact under any partitioning — oracle-comparable (q160).
    */
  object SumOfSquares extends Aggregator[java.lang.Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: java.lang.Long): Long =
      if (a == null) b else b + a.longValue * a.longValue
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
