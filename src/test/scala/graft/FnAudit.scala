package graft
import org.apache.spark.sql.SparkSession

/** Dev audit: which reference function names resolve in our session
  * (registry + Spark natives)? Reads names from args(0) (one per line),
  * prints the unresolvable ones. With `--dump-all` instead of a file,
  * prints every resolvable function name (for offline alias matching). */
object FnAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    if (args(0) == "--dump-all") {
      spark.sessionState.functionRegistry.listFunction()
        .map(_.funcName).distinct.sorted.foreach(n => println(s"HAVE $n"))
    } else {
      val names = scala.io.Source.fromFile(args(0)).getLines().map(_.trim).filter(_.nonEmpty)
      val missing = names.filterNot(n => spark.catalog.functionExists(n)).toSeq
      println(s"UNRESOLVED ${missing.size}")
      missing.foreach(n => println(s"MISS $n"))
    }
    spark.stop()
  }
}
