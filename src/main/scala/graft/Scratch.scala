package graft

/** Ad-hoc forked smoke tests during development (not part of the library).
  * Pass query names as args to run them at sf0.001 and show plans/results.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val g = graft.engine.GraftSession.build("local[8]", 8)
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_tpch_q1")
    names.foreach { n =>
      println(s"=== $n ===")
      val df = graft.queries.Queries.byName(n).fn(g.spark, "/root/testdata/sf0.001")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
      else df.show(10, false)
    }
    g.spark.stop()
  }
}
