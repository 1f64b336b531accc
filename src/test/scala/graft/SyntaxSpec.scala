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

  test("between: all four inclusive modes (reference column_expr.py:3081)") {
    val df = Seq(1, 2, 3, 4, 5).toDF("x")
    def got(mode: String): Seq[Int] =
      df.filter(col("x").between(2, 4, mode)).collect().map(_.getInt(0)).toSeq
    assert(got("both") == Seq(2, 3, 4))
    assert(got("neither") == Seq(3))
    assert(got("left") == Seq(2, 3))
    assert(got("right") == Seq(3, 4))
    intercept[IllegalArgumentException](got("sideways"))
  }

  test("clip: bounds optional, NULLs preserved (not turned into the bound)") {
    val df = Seq(Some(-5.0), Some(0.5), Some(99.0), None).toDF("v")
    val r = df.select(col("v").clip(Some(0.0), Some(50.0)).as("c"))
      .collect().map(x => if (x.isNullAt(0)) null else x.getDouble(0))
    assert(r.toSeq == Seq(0.0, 0.5, 50.0, null))
    val lowerOnly = df.select(col("v").clip(lower = Some(0.0)).as("c"))
      .collect().map(x => if (x.isNullAt(0)) null else x.getDouble(0))
    assert(lowerOnly.toSeq == Seq(0.0, 0.5, 99.0, null))
  }

  test("betweenTime: in-day window and the pandas wrap-around interval") {
    import graft.ds.GraftFrame
    val df = Seq("2024-01-01 05:00:00", "2024-01-01 08:30:00",
        "2024-01-01 13:00:00", "2024-01-01 23:30:00")
      .toDF("t0").selectExpr("CAST(t0 AS TIMESTAMP) AS ts")
    val morning = GraftFrame(df).betweenTime("ts", "06:00", "12:00")
      .df.count()
    assert(morning == 1) // only 08:30
    // start > end selects the interval crossing midnight (pandas contract)
    val night = GraftFrame(df).betweenTime("ts", "22:00", "06:00")
      .df.count()
    assert(night == 2) // 23:30 and 05:00
  }
}
