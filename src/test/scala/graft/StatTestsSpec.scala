package graft

import org.apache.spark.sql.Row

/** Hypothesis-test aggregates: statistics against hand-computed closed forms,
  * p-values against textbook values (t CDF / normal approx / Kolmogorov Q).
  */
class StatTestsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(sql: String): Row = {
    Seq((1.0, 0), (2.0, 0), (3.0, 0), (4.0, 0), (5.0, 0),
        (2.0, 1), (3.0, 1), (4.0, 1), (5.0, 1), (6.0, 1))
      .toDF("v", "idx").createOrReplaceTempView("two_samples")
    spark.sql(sql).head()
  }

  test("studentTTest: exact statistic, textbook p-value") {
    // means 3 vs 4, both vars 2.5 → sp² = 2.5, t = -1/√(2.5·0.4) = -1, ν = 8
    val r = run("SELECT studentTTest(v, idx) AS t FROM two_samples")
      .getStruct(0)
    assert(r.getDouble(0) == -1.0)
    assert(math.abs(r.getDouble(1) - 0.34659) < 1e-4) // 2·P(T₈ ≤ −1)
    assert(r.getDouble(2) == 8.0)
  }

  test("welchTTest: equal n and var degenerates to student") {
    val r = run("SELECT welchTTest(v, idx) AS t FROM two_samples").getStruct(0)
    assert(r.getDouble(0) == -1.0)
    assert(r.getDouble(2) == 8.0) // Welch dof == pooled dof when vars equal
  }

  test("mannWhitneyUTest: separated samples, continuity-corrected p") {
    Seq((1.0, 0), (2.0, 0), (3.0, 0), (4.0, 1), (5.0, 1), (6.0, 1))
      .toDF("v", "idx").createOrReplaceTempView("sep")
    val r = spark.sql("SELECT mannWhitneyUTest(v, idx) AS t FROM sep")
      .head().getStruct(0)
    assert(r.getDouble(0) == 0.0) // R₀ = 1+2+3 = 6 → U₀ = 6 − 6 = 0
    // z = (0 − 4.5 + 0.5)/√5.25 = −1.74574…, p = 2Φ(z) ≈ 0.08086
    assert(math.abs(r.getDouble(1) - 0.08086) < 1e-4)
  }

  test("mannWhitneyUTest: tie handling uses average ranks") {
    Seq((1.0, 0), (2.0, 0), (2.0, 1), (3.0, 1))
      .toDF("v", "idx").createOrReplaceTempView("tied")
    val r = spark.sql("SELECT mannWhitneyUTest(v, idx) AS t FROM tied")
      .head().getStruct(0)
    // ranks: 1, 2.5, 2.5, 4 → R₀ = 3.5 → U₀ = 3.5 − 3 = 0.5
    assert(r.getDouble(0) == 0.5)
  }

  test("kolmogorovSmirnovTest: disjoint supports give D = 1") {
    Seq((1.0, 0), (2.0, 0), (3.0, 0), (4.0, 1), (5.0, 1), (6.0, 1))
      .toDF("v", "idx").createOrReplaceTempView("sep")
    val r = spark.sql("SELECT kolmogorovSmirnovTest(v, idx) AS t FROM sep")
      .head().getStruct(0)
    assert(r.getDouble(0) == 1.0)
    // λ = (√1.5 + 0.12 + 0.11/√1.5)·1 ≈ 1.43446, Q(λ) ≈ 0.03258
    assert(math.abs(r.getDouble(1) - 0.03258) < 1e-3)
  }

  test("identical samples: t = 0, p = 1, D = 0") {
    Seq((1.0, 0), (2.0, 0), (3.0, 0), (1.0, 1), (2.0, 1), (3.0, 1))
      .toDF("v", "idx").createOrReplaceTempView("same")
    val t = spark.sql("SELECT studentTTest(v, idx) AS t FROM same").head().getStruct(0)
    assert(t.getDouble(0) == 0.0 && t.getDouble(1) == 1.0)
    val ks = spark.sql("SELECT kolmogorovSmirnovTest(v, idx) AS t FROM same").head().getStruct(0)
    assert(ks.getDouble(0) == 0.0 && ks.getDouble(1) > 0.99)
  }

  test("degenerate groups return NaN instead of throwing") {
    Seq((1.0, 0), (2.0, 0)).toDF("v", "idx").createOrReplaceTempView("one_side")
    val r = spark.sql("SELECT studentTTest(v, idx) AS t FROM one_side").head().getStruct(0)
    assert(r.getDouble(0).isNaN && r.getDouble(1).isNaN)
    val mw = spark.sql("SELECT mannWhitneyUTest(v, idx) AS t FROM one_side").head().getStruct(0)
    assert(mw.getDouble(0).isNaN)
  }
}

class StatTestEdgeSpec extends SparkTestBase {
  import spark.implicits._

  test("MW-U continuity correction never crosses zero (balanced samples → p = 1)") {
    // interleaved identical-distribution samples: U₀ ≈ μ, so the corrected z
    // must be 0 and p exactly 1 (an overshooting correction would flip sign)
    // sample0 = {1,4} (ranks 1,4), sample1 = {2,3}: U₀ = 5 − 3 = 2 = μ
    Seq((1.0, 0), (2.0, 1), (3.0, 1), (4.0, 0)).toDF("v", "idx")
      .createOrReplaceTempView("bal")
    val r = spark.sql("SELECT mannWhitneyUTest(v, idx) AS t FROM bal")
      .head().getStruct(0)
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 1.0)
  }
}
