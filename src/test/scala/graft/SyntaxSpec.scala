package graft

import org.apache.spark.sql.functions._

import graft.ds.syntax._

class SyntaxSpec extends SparkTestBase {
  import spark.implicits._

  test("str accessor namespace") {
    val r = Seq("  Hello World  ").toDF("s").select(
      col("s").str.strip.str.upper.as("u"),
      col("s").str.strip.str.len.as("n"),
      col("s").str.contains("World").as("c"),
      col("s").str.strip.str.split(" ").arr.len.as("k"),
      col("s").str.extract("(\\w+)$", 1).as("last")).head()
    assert(r.getString(0) == "HELLO WORLD")
    assert(r.getInt(1) == 11)
    assert(r.getBoolean(2))
    assert(r.getInt(3) == 2)
  }

  test("dt accessor namespace") {
    val r = Seq(java.sql.Timestamp.valueOf("1997-03-05 10:11:12")).toDF("t").select(
      col("t").dt.year.as("y"), col("t").dt.dayofweek.as("dow"),
      col("t").dt.monthName.as("mn"), col("t").dt.isMonthStart.as("ms")).head()
    assert(r.getInt(0) == 1997)
    assert(r.getInt(1) == 3) // 1997-03-05 was a Wednesday (ISO 3)
    assert(r.getString(2) == "March")
    assert(!r.getBoolean(3))
  }

  test("arr and json accessor namespaces") {
    val r = Seq((Seq(3, 1, 2), """{"k": {"x": 7}}""")).toDF("a", "j").select(
      col("a").arr.sorted.arr.join(",").as("s"),
      col("a").arr.sum.as("sum"),
      col("a").arr.map(_ * 10).arr.max.as("mx"),
      col("j").json.getInt("k.x").as("kx")).head()
    assert(r.getString(0) == "1,2,3")
    assert(r.getDouble(1) == 6.0)
    assert(r.getInt(2) == 30)
    assert(r.getLong(3) == 7L)
  }

  test("url accessor namespace") {
    val r = Seq("https://example.com/p/q?k=v").toDF("u").select(
      col("u").url.host.as("h"), col("u").url.param("k").as("k")).head()
    assert(r.getString(0) == "example.com")
    assert(r.getString(1) == "v")
  }
}
