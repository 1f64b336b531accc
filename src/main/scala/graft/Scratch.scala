package graft

/** Ad-hoc forked smoke tests during development (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val g = graft.engine.GraftSession.build("local[32]", 32)
    val spark = g.spark
    val dir = "/root/testdata/sf0.1"
    def time(n: String): Unit = {
      val t0 = System.nanoTime()
      val c = graft.queries.Queries.byName(n).fn(spark, dir).count()
      println(s"STRESS $n rows=$c t=${(System.nanoTime() - t0) / 1e9}s")
    }
    Seq("q62_ngram_jaccard", "q62_ngram_jaccard").foreach(time)
    spark.stop()
  }
}
