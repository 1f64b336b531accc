package graft

import org.apache.spark.sql.functions._

/** Ad-hoc forked smoke tests during development (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val g = graft.engine.GraftSession.build()
    val spark = g.spark
    import spark.implicits._

    // 1. events ns-timestamp read
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    ev.printSchema()
    ev.select(col("ts"), unix_micros(col("ts"))).show(3, false)

    // 2. dialect shim
    g.registerParquet("lineitem", "/root/testdata/sf0.001/lineitem.parquet")
    g.sql("SELECT toYear(l_shipdate) AS y, uniqExact(l_orderkey) AS u, countIf(l_quantity > 25) AS hi FROM lineitem GROUP BY y ORDER BY y").show(5)

    // 3. greatest over structs (languageId)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.select(col("lang"), graft.operators.TextAnalysis.languageId(col("text")).as("pred"))
      .groupBy("lang", "pred").count().orderBy("lang", "pred").show()

    // 4. custom aggregates
    graft.Tables.load(spark, "/root/testdata/sf0.001", "events").createOrReplaceTempView("events")
    g.sql("""SELECT user_id,
        windowFunnel(604800000000, unix_micros(ts), event_type='signup', event_type='click', event_type='purchase') AS lvl
        FROM events GROUP BY user_id ORDER BY user_id LIMIT 5""").show()
    g.sql("SELECT topK(event_type, 3) AS top FROM events").show(false)

    // 5. simHash + fingerprint expressions
    g.registerParquet("documents", "/root/testdata/sf0.001/documents.parquet")
    g.sql("SELECT doc_id, simHash(text) AS sh, fingerprint(text, 8) AS fp FROM documents ORDER BY doc_id LIMIT 3").show(false)

    spark.stop()
  }
}
