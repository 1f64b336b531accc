package graft

import org.apache.spark.sql.Row

/** Geo tail + moving-array family (SURVEY §2.H gap closure, r2 verdict #8). */
class GeoMovingSpec extends SparkTestBase {
  import spark.implicits._

  private def one(expr: String): Row =
    spark.sql(s"SELECT $expr").head()

  test("geohashEncode matches the canonical test vector") {
    // the classic geohash example: (lat 42.605, lon −5.603) → ezs42
    assert(one("geohashEncode(-5.60302734375D, 42.60498046875D, 5) AS r")
      .getString(0) == "ezs42")
    assert(one("geohashEncode(-5.6D, 42.6D) AS r").getString(0).length == 12)
  }

  test("geohashDecode returns the cell center, round-trips encode") {
    val r = one("geohashDecode('ezs42') AS r").getStruct(0)
    assert(math.abs(r.getDouble(0) - (-5.603)) < 0.03)
    assert(math.abs(r.getDouble(1) - 42.605) < 0.03)
    val rt = one("geohashEncode(geohashDecode('u4pruydqqvj').longitude, " +
      "geohashDecode('u4pruydqqvj').latitude, 11) AS r").getString(0)
    assert(rt == "u4pruydqqvj")
  }

  test("pointInPolygon ray casting on a square and a concave polygon") {
    val square = "array(struct(0D,0D), struct(10D,0D), struct(10D,10D), struct(0D,10D))"
    assert(one(s"pointInPolygon(struct(5D,5D), $square) AS r").getBoolean(0))
    assert(!one(s"pointInPolygon(struct(15D,5D), $square) AS r").getBoolean(0))
    assert(!one(s"pointInPolygon(struct(-1D,-1D), $square) AS r").getBoolean(0))
    // concave L-shape: (0,0)(4,0)(4,2)(2,2)(2,4)(0,4) — (3,3) is OUTSIDE
    val ell = "array(struct(0D,0D), struct(4D,0D), struct(4D,2D), struct(2D,2D), struct(2D,4D), struct(0D,4D))"
    assert(one(s"pointInPolygon(struct(1D,3D), $ell) AS r").getBoolean(0))
    assert(!one(s"pointInPolygon(struct(3D,3D), $ell) AS r").getBoolean(0))
  }

  test("arrayMovingSum / arrayMovingAvg scalar forms") {
    assert(one("arrayMovingSum(array(1, 2, 3, 4), 2) AS r").getSeq[Double](0)
      == Seq(1.0, 3.0, 5.0, 7.0))
    assert(one("arrayMovingSum(array(1, 2, 3, 4)) AS r").getSeq[Double](0)
      == Seq(1.0, 3.0, 6.0, 10.0)) // no window → running sum
    assert(one("arrayMovingAvg(array(2, 4, 6), 2) AS r").getSeq[Double](0)
      == Seq(2.0, 3.0, 5.0))
  }

  test("groupArrayMovingSum over a single sorted partition") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("v").repartition(1).sortWithinPartitions("v")
    df.createOrReplaceTempView("mv")
    val r = spark.sql("SELECT groupArrayMovingSum(v, 2) AS r FROM mv")
      .head().getSeq[Double](0)
    assert(r == Seq(1.0, 3.0, 5.0, 7.0))
    val ra = spark.sql("SELECT groupArrayMovingAvg(v) AS r FROM mv")
      .head().getSeq[Double](0)
    assert(ra == Seq(1.0, 1.5, 2.0, 2.5))
  }

  test("sparkBar renders bucketed heights") {
    Seq((1, 10), (2, 20), (3, 40), (4, 80)).toDF("x", "y")
      .createOrReplaceTempView("sb")
    val bar = spark.sql("SELECT sparkBar(4, x, y) AS r FROM sb").head().getString(0)
    assert(bar.length == 4)
    assert(bar.last == '█') // max bucket renders full block
    assert(bar.head < bar.last)
  }

  test("groupBitmap counts distinct integers") {
    Seq(1, 2, 2, 3, 3, 3).toDF("v").createOrReplaceTempView("gb")
    assert(spark.sql("SELECT groupBitmap(v) AS r FROM gb").head().getLong(0) == 3L)
  }
}

/** groupArraySample (deterministic hash-order) + groupArrayInsertAt. */
class GroupArrayTailSpec extends SparkTestBase {
  import spark.implicits._

  test("groupArraySample is a stable n-subset of the group") {
    Seq(1, 2, 3, 4, 5, 6, 7, 8).toDF("v").createOrReplaceTempView("gs")
    val a = spark.sql("SELECT groupArraySample(v, 3) AS r FROM gs").head().getSeq[Int](0)
    val b = spark.sql("SELECT groupArraySample(v, 3) AS r FROM gs").head().getSeq[Int](0)
    assert(a == b && a.size == 3 && a.forall((1 to 8).contains))
    val s2 = spark.sql("SELECT groupArraySample(v, 3, 7) AS r FROM gs").head().getSeq[Int](0)
    assert(s2.size == 3) // different seed still sizes correctly
  }

  test("groupArrayInsertAt places values with null gaps") {
    Seq((10, 0), (30, 2), (50, 4)).toDF("v", "p").createOrReplaceTempView("ia")
    val r = spark.sql("SELECT groupArrayInsertAt(v, p) AS r FROM ia").head().getSeq[Any](0)
    assert(r == Seq(10, null, 30, null, 50))
  }
}
