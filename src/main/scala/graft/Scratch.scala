package graft

import org.apache.spark.sql.functions._

/** Ad-hoc forked smoke tests during development (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val g = graft.engine.GraftSession.build("local[32]", 32)
    val spark = g.spark
    val dir = "/root/testdata/sf0.1"
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"T $l ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val e = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val planted = e.filter(col("vec_id") < 20).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
    val aug = e.unionByName(planted)
    time("0 aug")(println(aug.count()))
    val sig = graft.operators.Similarity.hyperplaneSignature(aug, "embedding", "vec_id", 12)
    time("1 sig")(println(sig.count()))
    sig.cache(); sig.count()
    val a = sig.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = sig.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    val cand = a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
    time("2 cand (cached sig)")(println(cand.count()))
    val verified = cand.withColumn("cos",
      graft.functions.GraftFunctions.cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cos") >= 0.99)
    time("3 verify")(println(verified.count()))
    spark.stop()
  }
}
