package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Type round-trip suite (SURVEY §1.3 mapping + §5.5 port of the reference's
  * test_clickhouse_type_roundtrip.py): every mapped type survives a parquet
  * write/read bit-exactly, including the documented ClickHouse edges
  * (UInt64 → DECIMAL(20,0), DateTime64 precision, nested types).
  */
class TypeRoundTripSpec extends SparkTestBase {

  private val path = "/tmp/graft_type_roundtrip"

  test("all mapped types survive parquet round trip") {
    val schema = StructType(Seq(
      StructField("i8", ByteType), StructField("i16", ShortType),
      StructField("i32", IntegerType), StructField("i64", LongType),
      StructField("u64", DecimalType(20, 0)),        // UInt64 > 2^63
      StructField("f32", FloatType), StructField("f64", DoubleType),
      StructField("dec", DecimalType(18, 4)),
      StructField("s", StringType), StructField("b", BinaryType),
      StructField("bool", BooleanType),
      StructField("d", DateType), StructField("ts", TimestampType),
      StructField("arr", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("t", StructType(Seq(
        StructField("x", IntegerType), StructField("y", StringType))))))

    val big = new java.math.BigDecimal("18446744073709551615") // max UInt64
    val row = Row(1.toByte, 2.toShort, 3, 4L, big,
      1.5f, 2.5, new java.math.BigDecimal("1234.5678"),
      "héllo", Array[Byte](1, 2, 3), true,
      java.sql.Date.valueOf("1997-03-05"),
      java.sql.Timestamp.valueOf("1997-03-05 10:11:12.123456"),
      Seq(1, 2, 3), Map("k" -> 9L), Row(7, "z"))
    val nullRow = Row(null, null, null, null, null, null, null, null, null,
      null, null, null, null, null, null, null)

    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row, nullRow)), schema)
    df.write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)

    assert(back.schema == schema)
    val rows = back.collect().sortBy(r => if (r.isNullAt(2)) 1 else 0)
    val r0 = rows.head
    assert(r0.getDecimal(4).compareTo(big) == 0)       // UInt64 range preserved
    assert(r0.getTimestamp(12).getNanos == 123456000)  // µs precision kept
    assert(r0.getSeq[Int](13) == Seq(1, 2, 3))
    assert(r0.getMap[String, Long](14)("k") == 9L)
    assert(r0.getStruct(15).getInt(0) == 7)
    assert(rows(1).toSeq.forall(_ == null))            // Nullable(T) everywhere
  }

  test("try_cast covers accurateCastOrNull semantics") {
    val r = sql("""SELECT toInt64OrNull('12x') AS a, toInt64OrNull('12') AS b,
        toFloat64OrZero('bad') AS c, toUInt64(CAST('18446744073709551615' AS STRING)) AS d""").head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 12L)
    assert(r.getDouble(2) == 0.0)
    assert(r.getDecimal(3).toString == "18446744073709551615")
  }
}
