package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Physical-plan introspection over Spark's `private[sql]`/execution
  * machinery, backing [[graft.engine.GraftSession]]'s explain + result-
  * metadata surface (reference core.py:707 explain printer;
  * README.md:266-268 rows_read/bytes_read/elapsed).
  */
object PlanBridge {

  /** Every node of the FINAL plan — AQE wrappers and materialized query
    * stages unwrapped, so metric extraction sees the scans that actually
    * ran rather than the adaptive placeholder. Stops AT a
    * ReusedExchangeExec: its referenced exchange subtree is already
    * visited at its own position in the plan, so recursing into it would
    * double-count scans/exchanges in [[scanTotals]]/[[planCounts]]
    * (e.g. a self-join with exchange reuse would report 2× rowsRead).
    */
  def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case q: QueryStageExec => nodes(q.plan)
    case r: ReusedExchangeExec => Seq(r)
    case o => o +: o.children.flatMap(nodes)
  }

  /** Post-execution scan totals for the reference's result metadata:
    * (rowsRead, bytesRead). Rows = sum of leaf-scan numOutputRows (rows
    * surviving parquet pushdown, the reference's rows_read semantics);
    * bytes = sum of scan file sizes (filesSize / staticFilesSize metrics).
    */
  def scanTotals(p: SparkPlan): (Long, Long) = {
    val all = nodes(p)
    val rows = all.filter(_.children.isEmpty)
      .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
    val bytes = all.flatMap(_.metrics.collect {
      case (name, m) if name == "filesSize" || name == "staticFilesSize" ||
        name == "bytesRead" => m.value
    }).sum
    (rows, bytes)
  }

  /** Block until queued listener-bus events (QueryExecutionListener posts
    * asynchronously) have been delivered — lastQueryMetrics reads after
    * this are up to date with the action that just returned.
    */
  def waitForListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** One compact line per plan node — operator name plus the decision that
    * matters at scale (pushed filters + read schema for scans, partitioning
    * for exchanges, strategy + keys for joins, mode + keys for aggregates),
    * the way the reference's explain renders segment plans. Returns
    * (depth, line) pairs in pre-order.
    */
  def describe(p: SparkPlan): Seq[(Int, String)] = {
    def short(s: String, max: Int = 160): String =
      if (s.length <= max) s else s.take(max - 1) + "…"
    def line(n: SparkPlan): String = n match {
      case f: FileSourceScanExec =>
        val pushed = f.metadata.getOrElse("PushedFilters", "[]")
        val schema = f.metadata.getOrElse("ReadSchema", "")
        short(s"Scan ${f.relation.fileFormat} ${f.tableIdentifier.map(_.unquotedString).getOrElse("")} " +
          s"pushed=$pushed read=$schema")
      case m: InMemoryTableScanExec =>
        short(s"InMemoryScan [${m.output.map(_.name).mkString(", ")}]")
      case e: ShuffleExchangeExec =>
        s"Exchange(shuffle) ${short(e.outputPartitioning.toString, 100)}"
      case e: BroadcastExchangeExec =>
        s"Exchange(broadcast) ${short(e.mode.toString, 100)}"
      case r: ReusedExchangeExec => "ReusedExchange"
      case j: BroadcastHashJoinExec =>
        short(s"Join(broadcast-hash) ${j.joinType} keys=${j.leftKeys.mkString(",")} = ${j.rightKeys.mkString(",")}")
      case j: SortMergeJoinExec =>
        short(s"Join(sort-merge) ${j.joinType} keys=${j.leftKeys.mkString(",")} = ${j.rightKeys.mkString(",")}")
      case j: ShuffledHashJoinExec =>
        short(s"Join(shuffled-hash) ${j.joinType} keys=${j.leftKeys.mkString(",")} = ${j.rightKeys.mkString(",")}")
      case j: BroadcastNestedLoopJoinExec => s"Join(broadcast-nested-loop) ${j.joinType}"
      case _: CartesianProductExec => "Join(cartesian)"
      case a: HashAggregateExec =>
        val mode = a.aggregateExpressions.headOption.map(_.mode.toString).getOrElse("complete")
        short(s"HashAggregate($mode) keys=[${a.groupingExpressions.map(_.name).mkString(", ")}] " +
          s"aggs=[${a.aggregateExpressions.map(_.aggregateFunction.prettyName).distinct.mkString(", ")}]")
      case a: ObjectHashAggregateExec =>
        val mode = a.aggregateExpressions.headOption.map(_.mode.toString).getOrElse("complete")
        short(s"ObjectHashAggregate($mode) keys=[${a.groupingExpressions.map(_.name).mkString(", ")}]")
      case a: SortAggregateExec =>
        val mode = a.aggregateExpressions.headOption.map(_.mode.toString).getOrElse("complete")
        short(s"SortAggregate($mode) keys=[${a.groupingExpressions.map(_.name).mkString(", ")}]")
      case s: SortExec =>
        short(s"Sort ${if (s.global) "(global)" else "(partition-local)"} [${s.sortOrder.mkString(", ")}]")
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        short(s"Window partitionBy=[${w.partitionSpec.mkString(", ")}] orderBy=[${w.orderSpec.mkString(", ")}]")
      case c: WholeStageCodegenExec => s"WholeStageCodegen (id=${c.codegenStageId})"
      case _: InputAdapter => "InputAdapter"
      case t: TakeOrderedAndProjectExec => short(s"TakeOrderedAndProject limit=${t.limit}")
      case other => short(other.nodeName)
    }
    def walk(n: SparkPlan, depth: Int): Seq[(Int, String)] = n match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth)
      case q: QueryStageExec => walk(q.plan, depth)
      case o => (depth, line(o)) +: o.children.flatMap(walk(_, depth + 1))
    }
    walk(p, 0)
  }

  /** Header counts for [[describe]]'s plan: exchanges split by kind, whole-
    * stage codegen spans, scans.
    */
  def planCounts(p: SparkPlan): Map[String, Int] = {
    val all = nodes(p)
    Map(
      "shuffleExchanges" -> all.count(_.isInstanceOf[ShuffleExchangeExec]),
      "broadcastExchanges" -> all.count(_.isInstanceOf[BroadcastExchangeExec]),
      "codegenSpans" -> all.count(_.isInstanceOf[WholeStageCodegenExec]),
      "scans" -> all.count(n =>
        n.isInstanceOf[FileSourceScanExec] || n.isInstanceOf[InMemoryTableScanExec]))
  }

  /** Spark's own formatted explain (stages, codegen ids, pushed filters) —
    * the `verbose` tail of [[graft.engine.GraftSession]].explain.
    */
  def formatted(qe: QueryExecution): String =
    qe.explainString(ExplainMode.fromString("formatted"))
}
