package graft

import org.apache.spark.sql.functions._

import graft.functions.agg.ThetaSketch

/** The real KMV theta sketch behind uniqTheta (r8): exactness below k,
  * bounded error above it, mergeability across partitions, and the set
  * algebra (union/intersect/difference) that distinguishes theta sketches
  * from HLL in kind.
  */
class ThetaSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("uniqTheta is EXACT below the sketch capacity") {
    val df = (1 to 1000).map(i => s"v$i").toDF("x")
      .union((1 to 500).map(i => s"v$i").toDF("x")) // duplicates
    val got = df.agg(expr("uniqTheta(x)")).head().getLong(0)
    assert(got == 1000L, s"below k=2048 the sketch holds every hash: $got")
  }

  test("uniqTheta error stays within ~3 RSE above capacity") {
    val n = 100000
    val df = (1 to n).map(i => s"value_$i").toDF("x").repartition(8)
    val got = df.agg(expr("uniqTheta(x)")).head().getLong(0)
    // RSE ≈ 1/sqrt(k-2) ≈ 2.2% at k=2048; allow 3x
    assert(math.abs(got - n).toDouble / n < 0.066, s"estimate $got vs $n")
  }

  test("sketch merge across partitions equals single-partition estimate") {
    val df = (1 to 50000).map(i => s"m$i").toDF("x")
    val many = df.repartition(16).agg(expr("uniqTheta(x)")).head().getLong(0)
    val one = df.coalesce(1).agg(expr("uniqTheta(x)")).head().getLong(0)
    assert(many == one, "KMV union is order-insensitive: estimates must agree")
  }

  test("theta set algebra: union / intersect / difference estimates") {
    // A = 1..60000, B = 40001..100000 → |A∪B| = 100k, |A∩B| = 20k, |A\B| = 40k
    val a = (1 to 60000).map(i => s"k$i").toDF("x")
      .agg(expr("uniqThetaState(x)")).head().getAs[Array[Byte]](0)
    val b = (40001 to 100000).map(i => s"k$i").toDF("x")
      .agg(expr("uniqThetaState(x)")).head().getAs[Array[Byte]](0)
    val un = ThetaSketch.unionEstimate(a, b)
    val in = ThetaSketch.intersectEstimate(a, b)
    val diff = ThetaSketch.differenceEstimate(a, b)
    assert(math.abs(un - 100000) / 100000.0 < 0.10, s"union $un")
    assert(math.abs(in - 20000) / 20000.0 < 0.15, s"intersect $in")
    assert(math.abs(diff - 40000) / 40000.0 < 0.12, s"difference $diff")
    // inclusion-exclusion coherence: |A∩B| + |A\B| ≈ |A|
    val aOnly = ThetaSketch.fromBytes(a).estimate
    assert(math.abs((in + diff) - aOnly) / aOnly < 0.12)
  }

  test("nulls are ignored; empty input estimates zero") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("x")
    assert(df.agg(expr("uniqTheta(x)")).head().getLong(0) == 2L)
    assert(df.filter(lit(false)).agg(expr("uniqTheta(x)")).head().getLong(0) == 0L)
  }
}
