package graft

import org.apache.spark.sql.functions._

import graft.operators.Fill

class FillSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 1, Some(10.0)), (1L, 2, None), (1L, 3, None), (1L, 4, Some(40.0)),
    (2L, 1, None), (2L, 2, Some(5.0)))
    .toDF("uid", "seq", "v")

  test("ffill carries the last non-null forward per key") {
    val out = Fill.ffill(df, Seq("uid"), Seq("seq"), Seq("v"))
      .orderBy("uid", "seq").select("v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(10.0), Some(10.0), Some(10.0), Some(40.0), None, Some(5.0)))
  }

  test("bfill carries the next non-null backward per key") {
    val out = Fill.bfill(df, Seq("uid"), Seq("seq"), Seq("v"))
      .orderBy("uid", "seq").select("v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(10.0), Some(40.0), Some(40.0), Some(40.0), Some(5.0), Some(5.0)))
  }
}

class InterpolateSpec extends SparkTestBase {
  import spark.implicits._

  test("interpolate fills nulls linearly over the order column") {
    val df = Seq(
      (1L, 0.0, Some(10.0)), (1L, 1.0, None), (1L, 3.0, None), (1L, 4.0, Some(50.0)),
      (1L, 5.0, None), // trailing → ffill
      (2L, 0.0, None), (2L, 1.0, Some(7.0))) // leading → bfill
      .toDF("uid", "t", "v")
    val out = graft.operators.Fill.interpolate(df, Seq("uid"), "t", Seq("v"))
      .orderBy("uid", "t").collect().map(_.getAs[Double]("v"))
    assert(out.toSeq == Seq(10.0, 20.0, 40.0, 50.0, 50.0, 7.0, 7.0))
  }
}

class DeltaSumSpec extends SparkTestBase {

  test("deltaSumTimestamp sums positive deltas in ts order regardless of input order") {
    // values by ts: 1 → 3 → 2 → 5: positive deltas 2 + 3 = 5
    sql("""SELECT * FROM VALUES (5.0, 40), (1.0, 10), (2.0, 30), (3.0, 20)
      AS t(v, ts)""").createOrReplaceTempView("dst")
    assert(sql("SELECT deltaSumTimestamp(v, ts) AS d FROM dst").head().getDouble(0) == 5.0)
  }
}

class EmaSpec extends SparkTestBase {

  test("ema equals the closed-form time-decayed average") {
    // values 1,2,3 at t = 0, 1, 2 with halfLife 1 → weights 1/4, 1/2, 1
    sql("SELECT * FROM VALUES (1.0, 0.0), (2.0, 1.0), (3.0, 2.0) AS t(v, ts)")
      .createOrReplaceTempView("ema_in")
    val r = sql("SELECT exponentialMovingAverage(v, ts, 1.0) AS e FROM ema_in").head().getDouble(0)
    val expected = (1.0 * 0.25 + 2.0 * 0.5 + 3.0 * 1.0) / (0.25 + 0.5 + 1.0)
    assert(math.abs(r - expected) < 1e-12)
  }

  test("ema is order-independent (merge rescaling is associative)") {
    sql("SELECT * FROM VALUES (3.0, 2.0), (1.0, 0.0), (2.0, 1.0) AS t(v, ts)")
      .createOrReplaceTempView("ema_shuf")
    val a = sql("SELECT exponentialMovingAverage(v, ts, 1.0) AS e FROM ema_shuf").head().getDouble(0)
    val expected = (1.0 * 0.25 + 2.0 * 0.5 + 3.0) / 1.75
    assert(math.abs(a - expected) < 1e-12)
  }

  test("ema of empty / all-null input is null") {
    sql("SELECT * FROM VALUES (CAST(NULL AS DOUBLE), 1.0) AS t(v, ts)")
      .createOrReplaceTempView("ema_null")
    assert(sql("SELECT exponentialMovingAverage(v, ts, 1.0) AS e FROM ema_null").head().isNullAt(0))
  }
}
