package graft

/** Ad-hoc forked smoke tests during development (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val g = graft.engine.GraftSession.build("local[8]", 8)
    g.sql("""SELECT arrayCount(x -> x > 1, array(1, 2, 3)) AS c2,
        arrayCount(array(1, 2)) AS c1,
        arrayCount(x -> x > 0, array()) AS c0""").show()
    g.registerParquet("lineitem", "/root/testdata/sf0.001/lineitem.parquet")
    g.sql("SELECT l_returnflag, arrayCount(x -> x > 2, collect_list(l_linenumber)) AS n FROM lineitem GROUP BY 1 ORDER BY 1").show()
    g.spark.stop()
  }
}
