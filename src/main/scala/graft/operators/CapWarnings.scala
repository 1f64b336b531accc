package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loud-logging channel for bounded-work truncations (r19 verdict #1b: a
  * cap that binds must never truncate silently).
  *
  * Operators that cap degenerate duplicate-cluster work ([[Dedup.minhashLsh]]'s
  * per-band-bucket cap, [[Dedup.semDedup]]'s per-cell dropper cap) attach an
  * `observe` node over the rows the cap evaluates. The per-session
  * QueryExecutionListener registered here reads those metrics after EVERY
  * action that executes the plan and emits a WARN naming the operator, the
  * cap value, and how many rows it cut — zero extra Spark jobs (the metrics
  * ride the caller's own execution, the same device as `Observation`), and
  * the warning repeats on every materialization so a capped result can never
  * masquerade as a complete one.
  *
  * Count semantics (r21, ADVICE): the truncated count is PER
  * MATERIALIZATION of the observed subtree. Operators deliberately share
  * one observed frame across both sides of a self-join so the subtree
  * materializes (and counts) once via exchange reuse — but if the planner
  * ever fails to reuse it (AQE variations, future plan changes), the
  * subtree executes twice and the warning OVERCOUNTS the cut rows. The
  * "loud, never silent" contract is unaffected: a cap that binds always
  * warns; only the row count may be a small multiple.
  */
private[graft] object CapWarnings {
  private val seq = new AtomicLong()
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())
  private val log = org.slf4j.LoggerFactory.getLogger("graft.operators.CapWarnings")

  // the spec hook: total truncated-row count observed on this JVM (tests
  // assert the cap both binds loudly and stays silent when it shouldn't)
  private[graft] val truncatedTotal = new AtomicLong()

  /** Wrap `df` with an observation counting rows whose `rankCol` exceeds
    * `cap`; the session listener logs loudly whenever that count is > 0.
    * Call BEFORE the `rankCol <= cap` filter so the cut rows are seen.
    */
  def observed(df: DataFrame, rankCol: String, cap: Int, what: String): DataFrame = {
    ensureListener(df.sparkSession)
    df.observe(s"graft.cap.${seq.incrementAndGet()}|$what|$cap",
      sum(when(col(rankCol) > cap, 1L)).as("truncated"),
      max(col(rankCol)).as("worst"))
  }

  private def ensureListener(spark: SparkSession): Unit = registered.synchronized {
    if (registered.get(spark) == null) {
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft.cap.")) {
              val truncated = if (row.isNullAt(0)) 0L else row.getLong(0)
              if (truncated > 0) {
                truncatedTotal.addAndGet(truncated)
                val parts = name.split('|')
                val msg = s"graft cap BOUND: ${parts(1)} cap=${parts(2)} cut " +
                  s"$truncated row(s), largest group ${row.get(1)} — the result " +
                  "is TRUNCATED; raise the cap parameter to recover completeness"
                log.warn(msg)
                System.err.println(s"WARN $msg")
              }
            }
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
      })
      registered.put(spark, java.lang.Boolean.TRUE)
    }
  }
}
