package graft

/** Ad-hoc forked smoke tests during development (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val g = graft.engine.GraftSession.build("local[8]", 8)
    val spark = g.spark
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq("q78_ch_datetime")
    names.foreach { n =>
      println(s"=== $n ===")
      try graft.queries.Queries.byName(n).fn(spark, dir).show(5, false)
      catch { case e: Throwable => e.printStackTrace() }
    }
    spark.stop()
  }
}
