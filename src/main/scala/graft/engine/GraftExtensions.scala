package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** Config-driven injection of the whole ClickHouse dialect — the idiomatic
  * Spark deployment path (SURVEY §2 custom-operator preference list:
  * "registered via SparkSessionExtensions"). On any cluster:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.engine.GraftExtensions …
  * }}}
  *
  * gives every session the dialect without touching GraftSession — the same
  * 295-function registry [[GraftFunctions.register]] installs per-session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.dialectFunctions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, s"ClickHouse-dialect $name", ""),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.NanosTimestampPushdown)
  }
}
