package graft

/** Ad-hoc forked smoke tests during development (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val g = graft.engine.GraftSession.build("local[8]", 8)
    val spark = g.spark
    val dir = "/root/testdata/sf0.01"
    val names = Seq("q01_tpch_q1", "q10_join3_tpch_q3", "q18_join5_tpch_q5",
      "q19_tpch_q6", "q72_asof_join", "q66_ann_bruteforce")
    names.foreach { n =>
      println(s"########## $n")
      val df = graft.queries.Queries.byName(n).fn(spark, dir)
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
