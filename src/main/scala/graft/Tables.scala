package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Test-table loader (TESTDATA.md). Handles the one physical-type wrinkle in
  * the driver data: `events.ts` is parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects (PARQUET_TYPE_ILLEGAL) — we read it as raw nanos
  * (legacy.parquet.nanosAsLong) and truncate to a microsecond timestamp,
  * matching DuckDB's epoch_us() truncation for oracle parity.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    GraftFunctions.register(spark)
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
