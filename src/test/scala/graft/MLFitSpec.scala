package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.MLFit

/** LinRegFit (stochasticLinearRegression's deterministic normal-equations
  * fit) + MLFit.logisticFit (full-batch GD) + evalMLMethod.
  */
class MLFitSpec extends SparkTestBase {
  import spark.implicits._

  test("linear fit recovers exact coefficients of a noiseless linear target") {
    // y = 3x1 - 2x2 + 7, exactly
    val df = (1 to 200).map { i =>
      val x1 = i * 0.1; val x2 = (i % 13) * 1.5
      (x1, x2, 3.0 * x1 - 2.0 * x2 + 7.0)
    }.toDF("x1", "x2", "y")
    df.createOrReplaceTempView("lin_exact")
    val w = spark.sql(
      "SELECT stochasticLinearRegression(y, x1, x2) w FROM lin_exact")
      .head().getSeq[Double](0)
    assert(math.abs(w(0) - 3.0) < 1e-9)
    assert(math.abs(w(1) - (-2.0)) < 1e-9)
    assert(math.abs(w(2) - 7.0) < 1e-9)
    // evalMLMethod reproduces the target
    val bad = spark.sql(
      """SELECT count(*) FROM lin_exact
        |WHERE abs(evalMLMethod(
        |  (SELECT stochasticLinearRegression(y, x1, x2) FROM lin_exact),
        |  x1, x2) - y) > 1e-6""".stripMargin).head().getLong(0)
    assert(bad == 0L)
  }

  test("linear fit matches OLS on noisy data (vs regr_slope single-feature)") {
    // single feature: closed form slope/intercept must agree with Spark's
    // own regr_slope/regr_intercept to fp precision
    val df = (1 to 500).map { i =>
      val x = i * 0.01
      (x, 2.5 * x + 1.0 + math.sin(i) * 0.3) // deterministic "noise"
    }.toDF("x", "y")
    df.createOrReplaceTempView("lin_noisy")
    val r = spark.sql(
      """SELECT stochasticLinearRegression(y, x) w,
        |       regr_slope(y, x) s, regr_intercept(y, x) b
        |FROM lin_noisy""".stripMargin).head()
    val w = r.getSeq[Double](0)
    assert(math.abs(w(0) - r.getDouble(1)) < 1e-8)
    assert(math.abs(w(1) - r.getDouble(2)) < 1e-8)
  }

  test("ridge shrinks weights toward zero, bias unpenalized") {
    val df = (1 to 100).map { i => (i * 0.1, 5.0 * (i * 0.1) + 2.0) }
      .toDF("x", "y")
    df.createOrReplaceTempView("lin_ridge")
    val r = spark.sql(
      """SELECT stochasticLinearRegression(y, x) w0,
        |       ridgeRegression(100.0, y, x) wr
        |FROM lin_ridge""".stripMargin).head()
    val w0 = r.getSeq[Double](0); val wr = r.getSeq[Double](1)
    assert(math.abs(w0(0) - 5.0) < 1e-9)
    assert(wr(0) < w0(0) - 0.01) // visibly shrunk
    assert(wr(0) > 0.0)
  }

  test("fit is partition-count invariant (associative merge)") {
    val data = (1 to 300).map { i =>
      (i * 0.01, (i % 7).toDouble, 1.5 * i * 0.01 - 0.5 * (i % 7) + 3.0)
    }
    val w1 = data.toDF("x1", "x2", "y").repartition(1)
      .selectExpr("stochasticLinearRegression(y, x1, x2) w").head().getSeq[Double](0)
    val w8 = data.toDF("x1", "x2", "y").repartition(8)
      .selectExpr("stochasticLinearRegression(y, x1, x2) w").head().getSeq[Double](0)
    // same Gram sums up to fp re-association → weights equal to ~1e-12
    w1.zip(w8).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("degenerate (constant) feature yields null, not garbage") {
    val df = (1 to 50).map(i => (1.0, i.toDouble)).toDF("x", "y")
    df.createOrReplaceTempView("lin_degen")
    // x column identical to the bias column → singular normal equations
    val r = spark.sql("SELECT stochasticLinearRegression(y, x) FROM lin_degen").head()
    assert(r.isNullAt(0))
  }

  test("logisticFit separates a linearly separable set and is deterministic") {
    // class 1 iff x1 + x2 > 0 (centered features), generous margin
    val df = (1 to 400).map { i =>
      val x1 = (i % 20).toDouble - 9.5; val x2 = ((i * 7) % 20).toDouble - 9.5
      (x1, x2, if (x1 + x2 > 0.0) 1.0 else 0.0)
    }.filter { case (a, b2, _) => math.abs(a + b2) > 1.5 } // margin gap
      .toDF("x1", "x2", "y")
    val w = MLFit.logisticFit(df, col("y"), Seq(col("x1"), col("x2")),
      epochs = 60, lr = 0.3)
    val pred = df.withColumn("p",
      (MLFit.predictMargin(w, Seq(col("x1"), col("x2"))) > 0).cast("double"))
    assert(pred.filter(col("p") =!= col("y")).count() == 0L)
    // determinism across runs and partitionings (full-batch GD)
    val w2 = MLFit.logisticFit(df.repartition(7), col("y"),
      Seq(col("x1"), col("x2")), epochs = 60, lr = 0.3)
    w.zip(w2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("logistic l2 keeps weights bounded on separable data") {
    val df = (1 to 200).map { i =>
      val x = (i % 10).toDouble
      (x, if (x > 4.5) 1.0 else 0.0)
    }.toDF("x", "y")
    val w0 = MLFit.logisticFit(df, col("y"), Seq(col("x")), epochs = 200, lr = 0.5)
    val wr = MLFit.logisticFit(df, col("y"), Seq(col("x")), epochs = 200, lr = 0.5, l2 = 0.1)
    assert(math.abs(wr(0)) < math.abs(w0(0))) // regularized stays smaller
    assert(w0(0) > 0 && wr(0) > 0)
  }
}
