package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The full TPC-H query-shape suite, adapted to the driver's reduced schema
  * (no partsupp, no commit/receipt dates, no comment/phone/address columns —
  * substitutions noted per query). Q1/Q3/Q5/Q6 already exist as
  * q01/q10/q18/q19; this file adds the remaining 18 shapes, all oracle-gated
  * and all in the bench set (r2 verdict #9).
  *
  * Plan-shape conventions: constant-size dimensions (nation/region, scalar
  * aggregates) broadcast unconditionally; SF-scaling build sides (customer/
  * orders/part/supplier slices) go through the size-gated [[Q.dim]] so the
  * hint never forces a build side that would not fit executor memory at
  * 100 TB (r7 verdict #1). Money math through exact decimals (see [[Q]]),
  * every query ends in a total order.
  */
object TpchQueries {

  private val D30: Int = 30

  val all: Seq[QueryDef] = Seq(

    // Q2: min-cost supplier per part (partsupp → the distinct lineitem
    // part-supplier link; supplycost → s_acctbal as the minimized measure)
    QueryDef("tpch02_min_supplier", (s, dir) => {
      val eu = Q.t(s, dir, "supplier")
        .join(broadcast(Q.t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Q.t(s, dir, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      // part filter BEFORE the link distinct: dedup runs over the few
      // matching parts' lines, not the whole fact table
      val cand = Q.t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(Q.dim(Q.t(s, dir, "part")
            .filter(col("p_size") === 15 && col("p_type") === "LARGE")),
          col("l_partkey") === col("p_partkey"))
        .select("p_partkey", "p_brand", "l_suppkey").distinct()
        .join(Q.dim(eu), col("l_suppkey") === col("s_suppkey"))
        .select("p_partkey", "p_brand", "s_name", "s_acctbal", "n_name")
      // per-part min via a partition window, NOT groupBy + self-join: the
      // self-join would evaluate the lineitem-distinct subtree twice (Spark
      // does not share unmarked common subplans)
      cand.withColumn("mb", min("s_acctbal").over(
          org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")))
        .filter(col("s_acctbal") === col("mb"))
        .select("p_partkey", "p_brand", "s_name", "s_acctbal", "n_name")
        .orderBy(col("s_acctbal").desc, col("p_partkey").asc, col("s_name").asc)
        .limit(100)
    }, Some("""WITH link AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
      cand AS (SELECT p_partkey, p_brand, s_name, s_acctbal, n_name FROM part
        JOIN link ON p_partkey = l_partkey JOIN eu ON l_suppkey = s_suppkey
        WHERE p_size = 15 AND p_type = 'LARGE'),
      m AS (SELECT p_partkey AS mk, MIN(s_acctbal) AS mb FROM cand GROUP BY 1)
      SELECT p_partkey, p_brand, s_name, s_acctbal, n_name FROM cand
      JOIN m ON p_partkey = mk AND s_acctbal = mb
      ORDER BY s_acctbal DESC, p_partkey, s_name LIMIT 100"""),
      bench = true),

    // Q4: order-priority checking (commitdate/receiptdate → "shipped more
    // than 30 days after ordering" as the lateness witness). Inverted from
    // the textbook orders-semi-lineitem: the 3-month orders filter keeps a
    // dimension-sized slice, so probe lineitem against the orders slice and
    // count DISTINCT surviving orders per priority — lineitem never shuffles
    // on the join (only the final count_distinct exchanges (priority, key)
    // pairs). The semi-join formulation forced an SMJ shuffling all of
    // lineitem. The slice still scales with SF, so the broadcast goes
    // through the size-gated Q.dim — above the threshold AQE decides.
    QueryDef("tpch04_priority_check", (s, dir) => {
      val o = Q.t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      Q.t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
        .join(Q.dim(o), col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate").cast("date") > date_add(col("o_orderdate").cast("date"), D30))
        .groupBy("o_orderpriority")
        .agg(count_distinct(col("o_orderkey")).as("order_count"))
        .orderBy("o_orderpriority")
    }, Some(s"""SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
          AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + $D30)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      bench = true),

    // Q7: volume shipping between two nations, by direction and year
    QueryDef("tpch07_volume_shipping", (s, dir) => {
      val n1 = Q.t(s, dir, "nation").select(
        col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Q.t(s, dir, "nation").select(
        col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      Q.t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
        .join(Q.t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Q.t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(Q.dim(Q.t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
          || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(Q.money(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(3, 2)) - Q.rate(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }, Some("""SELECT supp_nation, cust_nation, l_year,
        CAST(SUM(vol) AS DOUBLE) AS revenue FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS INT) AS l_year,
          CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) AS vol
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),
      bench = true),

    // Q8: national market share within a region for one product type
    QueryDef("tpch08_market_share", (s, dir) => {
      val supN = Q.t(s, dir, "nation").select(
        col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val custN = Q.t(s, dir, "nation").select(
        col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
      val america = Q.t(s, dir, "region").filter(col("r_name") === "AMERICA")
      Q.t(s, dir, "lineitem")
        .join(Q.dim(Q.t(s, dir, "part").filter(col("p_type") === "ECONOMY")),
          col("l_partkey") === col("p_partkey"))
        .join(Q.t(s, dir, "orders").filter(col("o_orderdate").between(
            lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(Q.t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(custN), col("c_nationkey") === col("c_nk"))
        .join(broadcast(america), col("c_rk") === col("r_regionkey"))
        .join(Q.dim(Q.t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(supN), col("s_nationkey") === col("s_nk"))
        .withColumn("vol", Q.money(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(3, 2)) - Q.rate(col("l_discount"))))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          coalesce(sum(when(col("supp_nation") === "NATION_3", col("vol"))), lit(0))
            .cast("double") / sum(col("vol")).cast("double"), 6).as("mkt_share"))
        .orderBy("o_year")
    }, Some("""SELECT o_year, ROUND(CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_3'
          THEN vol END), 0) AS DOUBLE) / CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share
      FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year, n2.n_name AS supp_nation,
          CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) AS vol
        FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
      GROUP BY o_year ORDER BY o_year"""),
      bench = true),

    // Q9: product-type profit (ps_supplycost → 20% of retail price as the
    // synthetic unit cost; p_name filter → brand substring)
    QueryDef("tpch09_product_profit", (s, dir) => {
      val supN = Q.t(s, dir, "nation").select(
        col("n_nationkey").as("s_nk"), col("n_name").as("nation"))
      Q.t(s, dir, "lineitem")
        .join(Q.dim(Q.t(s, dir, "part").filter(col("p_brand").like("%1%"))),
          col("l_partkey") === col("p_partkey"))
        .join(Q.t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Q.dim(Q.t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(supN), col("s_nationkey") === col("s_nk"))
        .withColumn("profit",
          Q.money(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(3, 2)) - Q.rate(col("l_discount")))
          - Q.money(col("p_retailprice")) * col("l_quantity").cast(DecimalType(4, 0))
            * lit(0.2).cast(DecimalType(2, 1)))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(col("profit")).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }, Some("""SELECT nation, o_year, CAST(SUM(profit) AS DOUBLE) AS sum_profit FROM (
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
          CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))
            - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(4,0))
              * CAST(0.2 AS DECIMAL(2,1)) AS profit
        FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE p_brand LIKE '%1%')
      GROUP BY nation, o_year ORDER BY nation, o_year DESC"""),
      bench = true),

    // Q10: returned-item reporting
    QueryDef("tpch10_returned_items", (s, dir) =>
      Q.t(s, dir, "customer")
        .join(Q.t(s, dir, "orders").filter(
            col("o_orderdate") >= lit("1996-10-01").cast("timestamp")
            && col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(Q.t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Q.t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(Q.money(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(3, 2)) - Q.rate(col("l_discount"))))
          .cast("double").as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey").asc).limit(20),
      Some("""SELECT c_custkey, c_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        c_acctbal, n_name
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""),
      bench = true),

    // Q11: important stock (partsupp value → Σ retail·qty shipped by ASIA
    // suppliers per part, thresholded by a fraction of the global total)
    QueryDef("tpch11_important_stock", (s, dir) => {
      val asiaSupp = Q.t(s, dir, "supplier")
        .join(broadcast(Q.t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Q.t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey")
      // vals feeds both the output and the threshold scalar. r21 (the r19
      // semDedup leak lesson): NOT persisted — a query-definition persist is
      // never unpersisted, so warm bench runs re-hit the previous run's
      // cache (cross-run result caching, which the brief forbids). The two
      // consumers contain the SAME aggregate subtree, so its shuffle is
      // materialized once and replayed via ReuseExchange; only the cheap
      // post-exchange final agg runs per consumer.
      val vals = Q.t(s, dir, "lineitem")
        .join(Q.dim(asiaSupp), col("l_suppkey") === col("s_suppkey"))
        .join(Q.dim(Q.t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_partkey")
        .agg(sum(Q.money(col("p_retailprice")) * col("l_quantity").cast(DecimalType(4, 0)))
          .cast("double").as("value"))
      val total = vals.agg(sum(Q.money(col("value"))).cast("double").as("t"))
      vals.crossJoin(broadcast(total))
        .filter(col("value") > col("t") * 0.001)
        .select("p_partkey", "value")
        .orderBy(col("value").desc, col("p_partkey").asc)
    }, Some("""WITH vals AS (SELECT p_partkey,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) AS value
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN part ON l_partkey = p_partkey
      WHERE r_name = 'ASIA' GROUP BY p_partkey)
      SELECT p_partkey, value FROM vals
      WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) FROM vals) * 0.001
      ORDER BY value DESC, p_partkey"""),
      bench = true),

    // Q12: shipping modes (l_shipmode → l_returnflag) and priority counts
    QueryDef("tpch12_ship_priority", (s, dir) =>
      Q.t(s, dir, "orders")
        .join(Q.t(s, dir, "lineitem").filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
            .as("low_line_count"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
      bench = true),

    // Q13: customer order-count distribution (comment filter → priority)
    QueryDef("tpch13_cust_distribution", (s, dir) =>
      Q.t(s, dir, "customer")
        .join(Q.t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""),
      bench = true),

    // Q14: promo revenue share in a month
    QueryDef("tpch14_promo_revenue", (s, dir) =>
      Q.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .join(Q.dim(Q.t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .withColumn("vol", Q.money(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(3, 2)) - Q.rate(col("l_discount"))))
        .agg(round(lit(100.0) *
          coalesce(sum(when(col("p_type") === "PROMO", col("vol"))), lit(0)).cast("double")
          / sum(col("vol")).cast("double"), 6).as("promo_revenue")),
      Some("""SELECT ROUND(100.0 * CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN vol END), 0) AS DOUBLE)
          / CAST(SUM(vol) AS DOUBLE), 6) AS promo_revenue
      FROM (SELECT p_type,
          CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) AS vol
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01')"""),
      bench = true),

    // Q15: top supplier(s) by quarterly revenue (the view + max subquery)
    QueryDef("tpch15_top_supplier", (s, dir) => {
      // rev feeds both the join and the max scalar. r21: NOT persisted (the
      // never-unpersisted query persist is the r19 cross-run cache-leak
      // shape); the two consumers share the aggregate's exchange via
      // ReuseExchange, so the fact scan + partial agg still run once.
      // knownNotNull on the group key (the r20 semDedup device): without it
      // the supplier equi-join infers isnotnull(l_suppkey) into ONE
      // consumer's scan only, the subtrees canonicalize differently, and
      // the fact aggregate runs twice. l_suppkey is a TPC-H FK (never
      // null); the oracle hash-checks the assertion.
      val rev = Q.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(org.apache.spark.sql.graftbridge.ColumnBridge
          .knownNotNull(col("l_suppkey")).as("supplier_no"))
        .agg(sum(Q.money(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(3, 2)) - Q.rate(col("l_discount"))))
          .cast("double").as("total_revenue"))
      val top = rev.agg(max("total_revenue").as("mr"))
      Q.t(s, dir, "supplier")
        .join(rev, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(top), col("total_revenue") === col("mr"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    }, Some("""WITH rev AS (SELECT l_suppkey AS supplier_no,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1)
      SELECT s_suppkey, s_name, total_revenue FROM supplier JOIN rev ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev) ORDER BY s_suppkey"""),
      bench = true),

    // Q16: supplier counts per part attribute triple (partsupp → lineitem
    // link; complaint-comment exclusion → negative-balance suppliers)
    QueryDef("tpch16_parts_suppliers", (s, dir) => {
      val badSupp = Q.t(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("bad_key"))
      // filtered part (8 sizes, ~1/3 of a dimension table) broadcasts only
      // while the size estimate fits (Q.dim) so lineitem joins map-side at
      // bench scale; above the threshold AQE decides and SMJ stays available
      // — at 100 TB a third of `part` would exceed executor memory.
      Q.t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(Q.dim(Q.t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO"
            && col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))),
          col("p_partkey") === col("l_partkey"))
        .join(Q.dim(badSupp), col("l_suppkey") === col("bad_key"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc, col("p_type").asc,
          col("p_size").asc)
    }, Some("""SELECT p_brand, p_type, p_size,
        CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM part JOIN lineitem ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""),
      bench = true),

    // Q17: small-quantity-order revenue (brand+container → brand+size;
    // correlated avg → broadcast per-part aggregate)
    QueryDef("tpch17_small_qty", (s, dir) => {
      // correlated per-part average as a WINDOW over l_partkey — one hash
      // shuffle of lineitem, no broadcast of a per-part aggregate (which at
      // 100 TB is itself huge) and no second scan of lineitem
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
      Q.t(s, dir, "lineitem")
        .join(Q.dim(Q.t(s, dir, "part")
            .filter(col("p_brand") === "Brand#3" && col("p_size") < 10)),
          col("l_partkey") === col("p_partkey"))
        .withColumn("half_avg", avg(col("l_quantity")).over(w) * 0.5)
        .filter(col("l_quantity") < col("half_avg"))
        .agg(round(Q.dsum(col("l_extendedprice")) / 7.0, 6).as("avg_yearly"))
    }, Some("""SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
      FROM lineitem JOIN part ON l_partkey = p_partkey
      JOIN (SELECT l_partkey AS pk, AVG(l_quantity) * 0.5 AS half_avg
        FROM lineitem GROUP BY 1) a ON l_partkey = pk
      WHERE p_brand = 'Brand#3' AND p_size < 10 AND l_quantity < half_avg"""),
      bench = true),

    // Q18: large-volume customers
    QueryDef("tpch18_large_orders", (s, dir) =>
      // HAVING-IN as a single groupBy: the per-order quantity sum both
      // filters and projects, so lineitem is scanned and shuffled ONCE
      // (the textbook formulation scans it twice and broadcasts an
      // unbounded order-id set)
      Q.t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 150)
        .join(Q.t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Q.t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(100), Some("""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        SUM(l_quantity) AS sum_qty
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY 1
        HAVING SUM(l_quantity) > 150)
      GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
      bench = true),

    // Q19: disjunctive brand/size/quantity predicate blocks
    QueryDef("tpch19_disjunctive", (s, dir) =>
      Q.t(s, dir, "lineitem")
        .join(Q.dim(Q.t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
            && col("l_quantity").between(1, 11))
          || (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
            && col("l_quantity").between(10, 20))
          || (col("p_brand") === "Brand#24" && col("p_size").between(1, 15)
            && col("l_quantity").between(20, 30)))
        .agg(sum(Q.money(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(3, 2)) - Q.rate(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""),
      bench = true),

    // Q20: suppliers with excess movement of small parts in a year
    QueryDef("tpch20_excess_stock", (s, dir) => {
      val heavy = Q.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Q.dim(Q.t(s, dir, "part").filter(col("p_type") === "SMALL")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(col("l_quantity")).as("sq")).filter(col("sq") > 50)
        .select("l_suppkey").distinct()
      Q.t(s, dir, "supplier")
        .join(broadcast(Q.t(s, dir, "nation").filter(col("n_regionkey") === 2)),
          col("s_nationkey") === col("n_nationkey"))
        .join(Q.dim(heavy), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    }, Some("""SELECT s_name, n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_regionkey = 2 AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'SMALL'
          AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey HAVING SUM(l_quantity) > 50)
      ORDER BY s_name"""),
      bench = true),

    // Q21: waiting orders (commit/receipt lateness → shipped > 30 days after
    // order; EXISTS/NOT-EXISTS pair → per-order distinct/late supplier counts)
    QueryDef("tpch21_waiting_orders", (s, dir) => {
      // EXISTS/NOT-EXISTS pair as per-order distinct counts computed in a
      // WINDOW over l_orderkey: one shuffle of the fact join, no
      // aggregate-then-self-join (which re-scans and re-joins the fact)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
      Q.t(s, dir, "lineitem")
        .join(Q.t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate").cast("date") > date_add(col("o_orderdate").cast("date"), D30))
        .withColumn("n_supp", size(collect_set(col("l_suppkey")).over(w)))
        .withColumn("n_late", size(collect_set(when(col("late"), col("l_suppkey"))).over(w)))
        .filter(col("late") && col("n_supp") > 1 && col("n_late") === 1)
        .join(Q.dim(Q.t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc).limit(100)
    }, Some(s"""WITH j AS (SELECT l_orderkey, l_suppkey,
          CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + $D30 AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'),
      po AS (SELECT l_orderkey AS ok, COUNT(DISTINCT l_suppkey) AS n_supp,
          COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
        FROM j GROUP BY 1)
      SELECT s_name, COUNT(*) AS numwait
      FROM j JOIN po ON l_orderkey = ok JOIN supplier ON l_suppkey = s_suppkey
      WHERE late AND n_supp > 1 AND n_late = 1
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""),
      bench = true),

    // Q22: global sales opportunity (phone country codes → nationkey mod
    // groups; above-average positive balance, never ordered)
    QueryDef("tpch22_sales_opportunity", (s, dir) => {
      val c = Q.t(s, dir, "customer")
        .withColumn("code", (col("c_nationkey") % 5).cast("string"))
      val inCodes = c.filter(col("code").isin("0", "1", "2"))
      val avgBal = inCodes.filter(col("c_acctbal") > 0)
        .agg((Q.dsum(col("c_acctbal")) / count(lit(1))).as("ab"))
      // "has not placed an order recently" (the original's 7-year dormancy)
      inCodes
        .join(Q.t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .groupBy("code")
        .agg(count(lit(1)).as("numcust"), Q.dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("code")
    }, Some("""WITH c AS (SELECT c_custkey, c_acctbal,
          CAST(c_nationkey % 5 AS VARCHAR) AS code FROM customer
        WHERE CAST(c_nationkey % 5 AS VARCHAR) IN ('0', '1', '2')),
      ab AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS ab
        FROM c WHERE c_acctbal > 0)
      SELECT code, COUNT(*) AS numcust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      FROM c, ab
      WHERE c_acctbal > ab
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY code ORDER BY code"""),
      bench = true)
  )
}
