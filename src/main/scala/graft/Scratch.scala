package graft

import org.apache.spark.sql.functions._

/** Ad-hoc forked smoke tests during development (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val g = graft.engine.GraftSession.build("local[32]", 32)
    val spark = g.spark
    val dir = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(s"$label: ${(System.nanoTime() - t0) / 1e9}s")
      r
    }

    val docs = Tables.load(spark, dir, "documents")
    val out = graft.operators.Dedup.minhashLsh(docs, "text", "doc_id",
      threshold = 0.4, shingleSize = 3, bands = 8, rowsPerBand = 2)
    time("q63 run1")(println("rows=" + out.count()))
    time("q63 run2")(println("rows=" + out.count()))

    val ng = graft.operators.Dedup.ngramJaccard(docs, "text", "doc_id",
      threshold = 0.2, shingleSize = 5, maxDocFreq = 1000000)
    time("q62 run1")(println("rows=" + ng.count()))
    time("q62 run2")(println("rows=" + ng.count()))
    spark.stop()
  }
}
