package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate → one JVM-wide session). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  def sql(q: String): org.apache.spark.sql.DataFrame =
    new graft.engine.GraftSession(spark).sql(q)

  /** Files a scan actually LISTED (post partition-pruning + stats
    * skipping): the FileSourceScanExec numFiles metric after an action.
    * Counting distinct input_file_name would be vacuous — filtered rows
    * always come from matching files whether or not the listing shrank.
    */
  protected def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case other =>
        other.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }
}
