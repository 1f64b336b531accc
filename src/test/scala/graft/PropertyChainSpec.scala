package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ds.GraftFrame

/** Property-based op-chain sweep — the port of the reference's hypothesis
  * strategy (SURVEY §5.3: random filter/sort/head/select/agg chains of depth
  * 3-6 must agree with the oracle). Here the invariant is facade-vs-direct:
  * a random chain applied through GraftFrame must equal the same chain
  * applied directly to the DataFrame — the facade may never change semantics.
  */
class PropertyChainSpec extends SparkTestBase {

  private lazy val base = Tables.load(spark, SparkTestBase.sfDir, "lineitem")
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
    .cache()

  // join side (r8: chains include joins) — key + one payload column, cached
  private lazy val ordersSide = Tables.load(spark, SparkTestBase.sfDir, "orders")
    .select(col("o_orderkey"), col("o_orderpriority")).cache()

  sealed trait Op
  case class FilterOp(cond: Int) extends Op
  case class SortLimitOp(by: Int, n: Int) extends Op
  case class AssignOp(which: Int) extends Op
  case object DistinctFlagOp extends Op
  case class JoinOp(how: Int) extends Op
  case class WindowOp(which: Int) extends Op

  private val genOp: Gen[Op] = Gen.oneOf(
    Gen.choose(0, 3).map(FilterOp),
    Gen.zip(Gen.choose(0, 2), Gen.choose(10, 500)).map { case (b, n) => SortLimitOp(b, n) },
    Gen.choose(0, 2).map(AssignOp),
    Gen.const(DistinctFlagOp),
    Gen.choose(0, 2).map(JoinOp),
    Gen.choose(0, 2).map(WindowOp))

  private val genChain: Gen[List[Op]] = for {
    depth <- Gen.choose(3, 6)
    ops <- Gen.listOfN(depth, genOp)
  } yield ops

  private def cond(i: Int): Column = i match {
    case 0 => col("l_quantity") > 25
    case 1 => col("l_returnflag") === "A"
    case 2 => col("l_extendedprice") < 30000
    case _ => col("l_linenumber") <= 3
  }
  private def sortCols(i: Int): Seq[String] = i match {
    case 0 => Seq("l_orderkey", "l_linenumber", "l_quantity")
    case 1 => Seq("l_quantity", "l_orderkey", "l_linenumber")
    case _ => Seq("l_extendedprice", "l_orderkey", "l_linenumber")
  }
  private def assignCol(i: Int): (String, Column) = i match {
    case 0 => "x" -> (col("l_quantity") * 2)
    case 1 => "x" -> when(col("l_quantity") > 30, "hi").otherwise("lo")
    case _ => "x" -> floor(col("l_extendedprice") / 1000)
  }

  private def joinHow(i: Int): String = i match {
    case 0 => "inner"
    case 1 => "left"
    case _ => "left_semi"
  }
  // window columns partition by a key every chain retains (l_orderkey) with
  // a deterministic in-partition order
  private def windowCol(i: Int): (String, Column) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey")
      .orderBy(col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
    i match {
      case 0 => "wv" -> row_number().over(w)
      case 1 => "wv" -> sum(col("l_quantity")).over(w)
      case _ => "wv" -> lag(col("l_extendedprice"), 1).over(w)
    }
  }
  // joins / windows reference base columns — a prior join or window may have
  // already consumed the name; guard by only applying when the columns exist
  private def canApply(df: DataFrame, op: Op): Boolean = op match {
    case JoinOp(_) => !df.columns.contains("o_orderpriority")
    case WindowOp(_) => !df.columns.contains("wv") &&
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .forall(df.columns.contains)
    case _ => true
  }

  private def applyFacade(gf: GraftFrame, op: Op): GraftFrame = op match {
    case FilterOp(i) => gf.filter(cond(i))
    case SortLimitOp(b, n) => gf.sortValues(sortCols(b)).head(n)
    case AssignOp(i) => val (n, c) = assignCol(i); gf.assign(n -> c)
    case DistinctFlagOp => gf.distinct()
    case JoinOp(h) => gf.join(GraftFrame(ordersSide),
      gf.df("l_orderkey") === ordersSide("o_orderkey"), joinHow(h))
    case WindowOp(i) => val (n, c) = windowCol(i); gf.assign(n -> c)
  }
  private def applyDirect(df: DataFrame, op: Op): DataFrame = op match {
    case FilterOp(i) => df.filter(cond(i))
    case SortLimitOp(b, n) => df.orderBy(sortCols(b).map(col): _*).limit(n)
    case AssignOp(i) => val (n, c) = assignCol(i); df.withColumn(n, c)
    case DistinctFlagOp => df.distinct()
    case JoinOp(h) => df.join(ordersSide,
      df("l_orderkey") === ordersSide("o_orderkey"), joinHow(h))
    case WindowOp(i) => val (n, c) = windowCol(i); df.withColumn(n, c)
  }

  private def runChains(seeds: Range): Unit = chainsFor(seeds).foreach { ops =>
    withClue(s"chain: $ops") {
      val viaFacade = ops.foldLeft(GraftFrame(base)) { (gf, op) =>
        if (canApply(gf.df, op)) applyFacade(gf, op) else gf
      }.df
      val direct = ops.foldLeft(base) { (df, op) =>
        if (canApply(df, op)) applyDirect(df, op) else df
      }
      assert(viaFacade.schema == direct.schema)
      // multiset equality (sort-limit ties make row order unstable)
      val a = viaFacade.collect().map(_.toString).sorted
      val b = direct.collect().map(_.toString).sorted
      assert(a.sameElements(b))
    }
  }

  private def chainsFor(seeds: Range): Seq[List[Op]] =
    seeds.flatMap(i => genChain(Gen.Parameters.default, Seed(42L + i)))

  test("random op chains: facade == direct DataFrame semantics") {
    // scalacheck generators driven by a fixed seed (no scalatestplus bridge
    // in the offline cache) — failing chain printed for replay
    runChains(0 until 8)
  }

  test("200-chain sweep incl. joins and windows (r7 verdict #7)") {
    // r8: the op alphabet now includes inner/left/semi joins against orders
    // and row_number/sum/lag windows; 200 generated chains must hold the
    // facade == direct invariant (nondeterministic-tie shapes are normalized
    // by the multiset compare; sort-limit inside a chain stays deterministic
    // because every sort key list ends in the (orderkey, linenumber) pk)
    runChains(100 until 300)
  }
}
