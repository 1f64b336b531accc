package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.ds.GraftFrame

/** Journey tests over the reference's join-suite fixtures (FIXTURES.md §1,
  * mirroring /root/reference/datastore/tests/dataset: users →< orders >→
  * products → categories, with the coverage list from that dataset README:
  * 2/3/4-way joins, left join + filter, join+groupBy agg, orderBy+limit
  * pagination). Multi-step chains, asserted end-to-end like the reference's
  * journey tests (SURVEY §5.2).
  */
class JoinJourneySpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private lazy val users = Seq(
    (1, "alice", 34, "US", d("2020-01-15")), (2, "bob", 28, "DE", d("2020-03-01")),
    (3, "carol", 45, "US", d("2021-07-22")), (4, "dave", 19, "FR", d("2022-02-10")),
    (5, "erin", 52, "DE", d("2019-11-05")))
    .toDF("user_id", "name", "age", "country", "registration_date")

  private lazy val categories = Seq(
    (1, "electronics"), (2, "books"), (3, "garden"))
    .toDF("category_id", "category_name")

  private lazy val products = Seq(
    (1, "laptop", 1, 1200.00), (2, "phone", 1, 800.00), (3, "novel", 2, 15.50),
    (4, "cookbook", 2, 29.99), (5, "shovel", 3, 42.00))
    .toDF("product_id", "product_name", "category_id", "price")

  private lazy val orders = Seq(
    (1, 1, 1, 1, 1200.00), (2, 1, 3, 2, 31.00), (3, 2, 2, 1, 800.00),
    (4, 2, 4, 1, 29.99), (5, 3, 5, 3, 126.00), (6, 3, 1, 1, 1200.00),
    (7, 4, 3, 1, 15.50), (8, 1, 5, 1, 42.00))
    .toDF("order_id", "user_id", "product_id", "quantity", "amount")

  test("4-way join: revenue per category per country") {
    val out = orders
      .join(users, "user_id").join(products, "product_id")
      .join(broadcast(categories), "category_id")
      .groupBy("country", "category_name")
      .agg(sum(col("amount").cast("decimal(10,2)")).cast("double").as("rev"))
      .orderBy("country", "category_name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.contains(("US", "electronics", 2400.0)))
    assert(out.contains(("US", "garden", 168.0)))
    assert(out.contains(("DE", "books", 29.99)))
  }

  test("left join + filter: users with no electronics purchases") {
    val electronics = orders.join(products, "product_id")
      .filter(col("category_id") === 1).select("user_id").distinct()
    val never = users.join(electronics, Seq("user_id"), "left_anti")
      .select("name").as[String].collect().sorted
    assert(never.toSeq == Seq("dave", "erin"))
  }

  test("join + groupBy + having via facade, ordered pagination") {
    val spenders = GraftFrame(orders.join(users, "user_id"))
      .groupby("name").agg("amount" -> "sum", "order_id" -> "count")
      .query("amount_sum > 100")
      .sortValues(Seq("amount_sum"), Seq(false))
    val page1 = spenders.head(2).collect().map(_.getAs[String]("name"))
    val page2 = spenders.offset(2).limit(2).collect().map(_.getAs[String]("name"))
    assert(page1.toSeq == Seq("carol", "alice"))
    assert(page2.toSeq == Seq("bob"))
  }

  test("journey: multi-step exploration chain stays consistent") {
    // the reference's journey pattern: >= 5 chained ops, end-state asserted
    val out = GraftFrame(orders)
      .merge(GraftFrame(products), on = Seq("product_id"))
      .assign("line_total" -> col("quantity") * col("price"))
      .query("line_total > 20")
      .groupby("category_id").agg("line_total" -> "sum")
      .sortValues(Seq("category_id"))
      .collect().map(r => (r.getInt(0), math.round(r.getAs[Double]("line_total_sum") * 100) / 100.0))
    assert(out.toSeq == Seq((1, 3200.0), (2, 60.99), (3, 168.0)))
  }
}
