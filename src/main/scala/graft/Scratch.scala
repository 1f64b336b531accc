package graft

import org.apache.spark.sql.functions._

/** Ad-hoc forked smoke tests during development (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val g = graft.engine.GraftSession.build("local[8]", 8)
    val spark = g.spark
    val dir = "/root/testdata/sf0.001"

    // ds facade end-to-end over real test data
    val li = graft.ds.GraftFrame(Tables.load(spark, dir, "lineitem"))
    li.query("l_quantity > 45")
      .groupby("l_returnflag").agg("l_quantity" -> "mean", "l_orderkey" -> "nunique")
      .sortValues(Seq("l_returnflag")).show()
    li.groupby("l_returnflag").transform("l_quantity", "sum")
      .select("l_returnflag", "l_quantity_sum").distinct().show()

    // io registry
    graft.io.Sources.file(spark, s"$dir/nation.parquet").show(3)
    graft.io.Sources.generateRandom(spark, 3, Seq("x" -> "double", "s" -> "string")).show()

    spark.stop()
  }
}
