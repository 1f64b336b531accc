package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.GraftFunctions
import graft.operators.{AsOfJoin, Dedup, Similarity, TextAnalysis}

/** The driver-checked operator inventory: one QueryDef per implemented
  * operator family from SURVEY.md §2, each with a DuckDB oracle where the
  * semantics are ANSI-SQL-expressible (custom aggregates / LSH / ANN are
  * rows-only checks per the driver contract).
  *
  * Cross-engine determinism rules used throughout (see [[Q]]):
  *  - money/value columns are exactly 2-decimal → decimal-sum → double cast
  *    gives bit-identical results regardless of aggregation order;
  *  - every query ends in an ORDER BY over a unique key set, mirrored in the
  *    oracle (Spark ASC = NULLS FIRST vs DuckDB NULLS LAST → sort keys are
  *    kept non-null);
  *  - integer-valued doubles (l_quantity) sum exactly in double;
  *  - statistical aggregates (stddev/corr) are rounded to 6 decimals;
  *  - counts are BIGINT on both sides (DuckDB SUM(int)→HUGEINT is cast).
  */
object Queries {

  private def v(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(n))

  /** The q134 IVF oracle (8 cells, 2 Lloyd iterations, nProbe 2, k 3,
    * queries = vec_id % 50 = 0) — shared verbatim by q142, whose Spark
    * side runs the SAME search through the PERSISTED cell-partitioned
    * index: identical output is exactly the claim under test.
    */
  /** Shared DuckDB replay of the deterministic 8-cell / 2-iteration Lloyd
    * quantizer over `embeddings` (init = 8 smallest ids, the exact
    * iterations Similarity.ivfTrain runs) — ends at `c2`, the final
    * centroid table; q134/q142 (IVF search) and q146 (SemDeDup) append
    * their own assignment + downstream CTEs.
    */
  private def lloydPrefix8x2(src: String = "embeddings"): String =
    s"""WITH e AS (SELECT vec_id AS id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM $src WHERE embedding IS NOT NULL AND len(embedding) > 0),
      dims AS (SELECT UNNEST(range(1, 65)) AS i),
      c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) AS INT) - 1 AS cell, v AS c
             FROM (SELECT id, v FROM e ORDER BY id LIMIT 8)),
      a1 AS (SELECT id, v, cell FROM (
              SELECT e.id, e.v, c0.cell, ROW_NUMBER() OVER (PARTITION BY e.id
                ORDER BY list_sum(list_transform(range(1, 65),
                  i -> (e.v[i] - c0.c[i]) * (e.v[i] - c0.c[i]))), c0.cell) AS rn
              FROM e CROSS JOIN c0) WHERE rn = 1),
      c1 AS (SELECT cell, list(m ORDER BY d) AS c FROM (
              SELECT cell, i - 1 AS d, AVG(v[i]) AS m
              FROM a1 CROSS JOIN dims GROUP BY cell, i) GROUP BY cell),
      a2 AS (SELECT id, v, cell FROM (
              SELECT e.id, e.v, c1.cell, ROW_NUMBER() OVER (PARTITION BY e.id
                ORDER BY list_sum(list_transform(range(1, 65),
                  i -> (e.v[i] - c1.c[i]) * (e.v[i] - c1.c[i]))), c1.cell) AS rn
              FROM e CROSS JOIN c1) WHERE rn = 1),
      c2 AS (SELECT cell, list(m ORDER BY d) AS c FROM (
              SELECT cell, i - 1 AS d, AVG(v[i]) AS m
              FROM a2 CROSS JOIN dims GROUP BY cell, i) GROUP BY cell)"""

  private val ivfOracle8x2: String = lloydPrefix8x2() + """,
      idx AS (SELECT id AS neighbor_id, v AS cv, cell FROM (
              SELECT e.id, e.v, c2.cell, ROW_NUMBER() OVER (PARTITION BY e.id
                ORDER BY list_sum(list_transform(range(1, 65),
                  i -> (e.v[i] - c2.c[i]) * (e.v[i] - c2.c[i]))), c2.cell) AS rn
              FROM e CROSS JOIN c2) WHERE rn = 1),
      qs AS (SELECT id AS query_id, v AS qv, cell FROM (
              SELECT e.id, e.v, c2.cell, ROW_NUMBER() OVER (PARTITION BY e.id
                ORDER BY list_sum(list_transform(range(1, 65),
                  i -> (e.v[i] - c2.c[i]) * (e.v[i] - c2.c[i]))), c2.cell) AS rn
              FROM e CROSS JOIN c2 WHERE e.id % 50 = 0) WHERE rn <= 2),
      scored AS (SELECT query_id, neighbor_id, MAX(
            list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i]))
            / (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])))
             * sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))))) AS cos
          FROM idx JOIN qs USING (cell)
          WHERE query_id <> neighbor_id GROUP BY query_id, neighbor_id)
      SELECT query_id, rn, neighbor_id, ROUND(cos, 6) AS cos FROM (
        SELECT query_id, neighbor_id, cos, CAST(ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rn
        FROM scored) WHERE rn <= 3 ORDER BY query_id, rn"""

  /** SemDeDup oracle: same quantizer replay, then the within-cell drop rule
    * (drop any id with a smaller-id cosine-≥-τ neighbor in its cell).
    */
  private val semDedupOracle8x2: String = lloydPrefix8x2(
    // the q65 planted-copy device: random 64-dim embeddings have no natural
    // τ=0.95 pairs (max pairwise cos ≈ 0.51 at sf0.01), so scaled copies of
    // the first 20 vectors are planted — direction-preserving, cos ≈ 1 with
    // their original — and the drop rule MUST remove exactly the copies
    """(SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x * 1.5 AS FLOAT))
        FROM embeddings WHERE vec_id < 20)""") + """,
      asgn AS (SELECT id, v, cell FROM (
              SELECT e.id, e.v, c2.cell, ROW_NUMBER() OVER (PARTITION BY e.id
                ORDER BY list_sum(list_transform(range(1, 65),
                  i -> (e.v[i] - c2.c[i]) * (e.v[i] - c2.c[i]))), c2.cell) AS rn
              FROM e CROSS JOIN c2) WHERE rn = 1),
      dropped AS (SELECT DISTINCT b.id AS id
              FROM asgn a JOIN asgn b ON a.cell = b.cell AND a.id < b.id
              WHERE list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
                / (sqrt(list_sum(list_transform(range(1, 65), i -> a.v[i] * a.v[i])))
                 * sqrt(list_sum(list_transform(range(1, 65), i -> b.v[i] * b.v[i])))) >= 0.95)
      SELECT cell, id FROM asgn WHERE id NOT IN (SELECT id FROM dropped)
      ORDER BY id"""

  /** Paper-faithful SemDeDup oracle (keep = lowest centroid similarity,
    * id tie-break): same quantizer replay, drop order (sim asc, id asc).
    */
  private val semDedupPaperOracle8x2: String = lloydPrefix8x2(
    """(SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x * 1.5 AS FLOAT))
        FROM embeddings WHERE vec_id < 20)""") + """,
      asgn AS (SELECT id, v, cell, c FROM (
              SELECT e.id, e.v, c2.cell, c2.c, ROW_NUMBER() OVER (PARTITION BY e.id
                ORDER BY list_sum(list_transform(range(1, 65),
                  i -> (e.v[i] - c2.c[i]) * (e.v[i] - c2.c[i]))), c2.cell) AS rn
              FROM e CROSS JOIN c2) WHERE rn = 1),
      sims AS (SELECT id, v, cell,
          list_sum(list_transform(range(1, 65), i -> v[i] * c[i]))
            / (sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
             * sqrt(list_sum(list_transform(range(1, 65), i -> c[i] * c[i])))) AS sim
        FROM asgn),
      dropped AS (SELECT DISTINCT b.id AS id
              FROM sims a JOIN sims b ON a.cell = b.cell AND a.id <> b.id
                AND (a.sim < b.sim OR (a.sim = b.sim AND a.id < b.id))
              WHERE list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
                / (sqrt(list_sum(list_transform(range(1, 65), i -> a.v[i] * a.v[i])))
                 * sqrt(list_sum(list_transform(range(1, 65), i -> b.v[i] * b.v[i])))) >= 0.95)
      SELECT cell, id FROM sims WHERE id NOT IN (SELECT id FROM dropped)
      ORDER BY id"""

  val all: Seq[QueryDef] = Seq(

    // ================= relational core (SURVEY §2.B/F/G) =================

    QueryDef("q01_tpch_q1", (s, dir) => {
      val l = Q.t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      l.groupBy("l_returnflag", "l_linestatus").agg(
          sum(col("l_quantity")).as("sum_qty"),
          Q.dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(Q.money(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(3, 2)) - Q.rate(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          (Q.dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (sum(Q.rate(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some("""SELECT l_returnflag, l_linestatus,
      SUM(l_quantity) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
      AVG(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
      bench = true),

    QueryDef("q02_filter_pred", (s, dir) =>
      Q.t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
            lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
          && col("l_returnflag").isin("A", "R") && col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice").as("price"))
        // (l_orderkey, l_linenumber) is NOT unique in the test data — order by
        // every output column so the LIMIT cut is engine-independent
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "price").limit(500),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice AS price
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
          AND l_returnflag IN ('A','R') AND l_quantity > 30
        ORDER BY l_orderkey, l_linenumber, l_quantity, price LIMIT 500""")),

    QueryDef("q03_case_when", (s, dir) =>
      Q.t(s, dir, "lineitem")
        .select(when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid").otherwise("high").as("bucket"),
          col("l_quantity"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        .orderBy("bucket"),
      Some("""SELECT CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid'
          ELSE 'high' END AS bucket, COUNT(*) AS n, SUM(l_quantity) AS qty
        FROM lineitem GROUP BY 1 ORDER BY bucket""")),

    QueryDef("q04_arith", (s, dir) =>
      Q.t(s, dir, "lineitem").filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity") / 7).cast("long").as("idiv"),
          (col("l_linenumber") % 3).as("m3"),
          abs(col("l_quantity") - 25).as("dist"),
          pow(col("l_linenumber"), 2).cast("long").as("sq"),
          ceil(col("l_quantity") / 7).cast("long").as("cdiv"))
        .orderBy("l_orderkey", "l_linenumber", "dist"),
      Some("""SELECT l_orderkey, l_linenumber,
        CAST(FLOOR(l_quantity / 7) AS BIGINT) AS idiv, l_linenumber % 3 AS m3,
        ABS(l_quantity - 25) AS dist, CAST(POWER(l_linenumber, 2) AS BIGINT) AS sq,
        CAST(CEIL(l_quantity / 7) AS BIGINT) AS cdiv
        FROM lineitem WHERE l_orderkey < 200 ORDER BY l_orderkey, l_linenumber, dist""")),

    QueryDef("q05_topk_orders", (s, dir) =>
      Q.t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice").limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""),
      bench = true),

    QueryDef("q06_distinct", (s, dir) =>
      Q.t(s, dir, "customer").select("c_mktsegment", "c_nationkey").distinct()
        .orderBy("c_mktsegment", "c_nationkey"),
      Some("""SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        ORDER BY c_mktsegment, c_nationkey""")),

    QueryDef("q07_union", (s, dir) => {
      val a = Q.t(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_orderkey").as("k"))
      val b = Q.t(s, dir, "lineitem").filter(col("l_quantity") === 50)
        .select(col("l_orderkey").as("k"))
      a.union(b).distinct().orderBy("k")
    }, Some("""SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 300000
      UNION SELECT l_orderkey FROM lineitem WHERE l_quantity = 50 ORDER BY k""")),

    QueryDef("q08_intersect_except", (s, dir) => {
      val cn = Q.t(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
      val sn = Q.t(s, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
      cn.intersect(sn).withColumn("op", lit("intersect"))
        .union(cn.except(sn).withColumn("op", lit("except")))
        .orderBy("op", "nk")
    }, Some("""SELECT nk, 'intersect' AS op FROM
        (SELECT DISTINCT c_nationkey AS nk FROM customer INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
      UNION ALL
      SELECT nk, 'except' AS op FROM
        (SELECT DISTINCT c_nationkey AS nk FROM customer EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
      ORDER BY op, nk""")),

    // ========================= joins (SURVEY §2.C) =======================

    QueryDef("q10_join3_tpch_q3", (s, dir) => {
      val c = Q.t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Q.t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Q.t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        // customer scales with SF: size-gated hint, never a forced broadcast
        .join(Q.dim(c), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(Q.money(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(3, 2)) - Q.rate(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc).limit(20)
    }, Some("""SELECT l_orderkey, o_orderdate,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate ORDER BY revenue DESC, l_orderkey LIMIT 20"""),
      bench = true),

    QueryDef("q11_join_left", (s, dir) =>
      Q.t(s, dir, "customer")
        .join(Q.t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(Q.dsum(col("o_totalprice")), lit(0.0)).as("total_spend"))
        .orderBy("c_custkey").limit(1000),
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 0.0) AS total_spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey LIMIT 1000""")),

    QueryDef("q12_join_right", (s, dir) =>
      Q.t(s, dir, "lineitem")
        .join(Q.t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"), "right")
        .groupBy("o_orderkey")
        .agg(count(col("l_linenumber")).as("n_items"))
        .orderBy("o_orderkey").limit(2000),
      Some("""SELECT o_orderkey, COUNT(l_linenumber) AS n_items
      FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderkey ORDER BY o_orderkey LIMIT 2000""")),

    QueryDef("q13_join_full", (s, dir) => {
      val a = Q.t(s, dir, "customer").select(col("c_nationkey").as("nk1"))
        .groupBy("nk1").agg(count(lit(1)).as("c_cnt"))
      val b = Q.t(s, dir, "supplier").select(col("s_nationkey").as("nk2"))
        .groupBy("nk2").agg(count(lit(1)).as("s_cnt"))
      a.join(b, col("nk1") === col("nk2"), "full")
        .select(coalesce(col("nk1"), col("nk2")).as("nk"),
          coalesce(col("c_cnt"), lit(0L)).as("c_cnt"),
          coalesce(col("s_cnt"), lit(0L)).as("s_cnt"))
        .orderBy("nk")
    }, Some("""SELECT COALESCE(a.nk1, b.nk2) AS nk, COALESCE(a.c_cnt, 0) AS c_cnt,
        COALESCE(b.s_cnt, 0) AS s_cnt
      FROM (SELECT c_nationkey AS nk1, COUNT(*) AS c_cnt FROM customer GROUP BY 1) a
      FULL JOIN (SELECT s_nationkey AS nk2, COUNT(*) AS s_cnt FROM supplier GROUP BY 1) b
        ON a.nk1 = b.nk2
      ORDER BY nk""")),

    QueryDef("q14_join_semi", (s, dir) =>
      Q.t(s, dir, "customer")
        .join(Q.t(s, dir, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey").limit(1000),
      Some("""SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      ORDER BY c_custkey LIMIT 1000""")),

    QueryDef("q15_join_anti", (s, dir) =>
      Q.t(s, dir, "customer")
        .join(Q.t(s, dir, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey").limit(1000),
      Some("""SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      ORDER BY c_custkey LIMIT 1000""")),

    QueryDef("q16_join_cross", (s, dir) => {
      val r = Q.t(s, dir, "region")
      r.select(col("r_name").as("r1")).crossJoin(r.select(col("r_name").as("r2")))
        .orderBy("r1", "r2")
    }, Some("""SELECT a.r_name AS r1, b.r_name AS r2 FROM region a CROSS JOIN region b
      ORDER BY r1, r2""")),

    QueryDef("q17_join_nonequi", (s, dir) => {
      val r = Q.t(s, dir, "region")
      val a = r.select(col("r_regionkey").as("k1"), col("r_name").as("r1"))
      val b = r.select(col("r_regionkey").as("k2"), col("r_name").as("r2"))
      a.join(b, col("k1") < col("k2")).select("r1", "r2").orderBy("r1", "r2")
    }, Some("""SELECT a.r_name AS r1, b.r_name AS r2 FROM region a
      JOIN region b ON a.r_regionkey < b.r_regionkey ORDER BY r1, r2""")),

    QueryDef("q18_join5_tpch_q5", (s, dir) => {
      val r = Q.t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = Q.t(s, dir, "nation")
      val c = Q.t(s, dir, "customer")
      val o = Q.t(s, dir, "orders")
      val l = Q.t(s, dir, "lineitem")
      val sup = Q.t(s, dir, "supplier")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey")
          && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(Q.money(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(3, 2)) - Q.rate(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }, Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""),
      bench = true),

    QueryDef("q19_tpch_q6", (s, dir) =>
      Q.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(Q.money(col("l_extendedprice")) * Q.rate(col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""),
      bench = true),

    // ===================== aggregations (SURVEY §2.D) ====================

    QueryDef("q20_agg_stats", (s, dir) =>
      Q.t(s, dir, "lineitem").groupBy("l_returnflag").agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd"),
          round(var_samp(col("l_quantity")), 6).as("vr"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("cr"),
          min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, ROUND(STDDEV_SAMP(l_quantity), 6) AS sd,
        ROUND(VAR_SAMP(l_quantity), 6) AS vr,
        ROUND(CORR(l_quantity, l_extendedprice), 6) AS cr,
        MIN(l_quantity) AS mn, MAX(l_quantity) AS mx, COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef("q21_count_distinct", (s, dir) =>
      Q.t(s, dir, "lineitem").groupBy("l_returnflag").agg(
          count_distinct(col("l_partkey")).as("u_part"),
          count_distinct(col("l_suppkey")).as("u_supp"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS u_part,
        CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS u_supp, COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      bench = true),

    QueryDef("q22_agg_conditional", (s, dir) =>
      Q.t(s, dir, "lineitem").groupBy("l_linestatus").agg(
          count(when(col("l_quantity") > 25, 1)).as("n_hi"),
          coalesce(sum(when(col("l_returnflag") === "A", Q.money(col("l_extendedprice"))))
            .cast("double"), lit(0.0)).as("sum_a"),
          avg(when(col("l_quantity") > 25, col("l_quantity"))).as("avg_hi"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus, COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_hi,
        COALESCE(CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE), 0.0) AS sum_a,
        AVG(CASE WHEN l_quantity > 25 THEN l_quantity END) AS avg_hi
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    QueryDef("q23_quantiles", (s, dir) =>
      Q.t(s, dir, "lineitem").groupBy("l_returnflag").agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.95)").as("p95"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, QUANTILE_CONT(l_quantity, 0.25) AS p25,
        QUANTILE_CONT(l_quantity, 0.5) AS p50, QUANTILE_CONT(l_quantity, 0.95) AS p95
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef("q24_argminmax", (s, dir) =>
      Q.t(s, dir, "orders").groupBy("o_orderpriority").agg(
          max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("max_ok"),
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("min_ok"))
        .orderBy("o_orderpriority"),
      Some("""WITH r AS (SELECT o_orderpriority, o_orderkey,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        FROM orders)
      SELECT o_orderpriority, MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS max_ok,
        MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS min_ok
      FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    QueryDef("q25_collect_list", (s, dir) =>
      Q.t(s, dir, "nation")
        .join(broadcast(Q.t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy("r_name"),
      Some("""SELECT r_name, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations, COUNT(*) AS n
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""")),

    QueryDef("q26_having", (s, dir) =>
      Q.t(s, dir, "customer").groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .filter(col("n") > 40).orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, COUNT(*) AS n FROM customer GROUP BY c_nationkey
      HAVING COUNT(*) > 40 ORDER BY c_nationkey""")),

    QueryDef("q27_rollup", (s, dir) =>
      Q.t(s, dir, "lineitem").rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls"),
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        SUM(l_quantity) AS sum_qty, COUNT(*) AS n
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls""")),

    QueryDef("q28_value_counts", (s, dir) =>
      Q.t(s, dir, "events").groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type").asc),
      Some("""SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
      ORDER BY n DESC, event_type""")),

    QueryDef("q29_cube", (s, dir) =>
      Q.t(s, dir, "orders").cube("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"), col("n"))
        .orderBy("pri", "st"),
      Some("""SELECT COALESCE(o_orderpriority, 'ALL') AS pri, COALESCE(o_orderstatus, 'ALL') AS st,
        COUNT(*) AS n
      FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus) ORDER BY pri, st""")),

    QueryDef("q30_avg_weighted", (s, dir) =>
      Q.t(s, dir, "lineitem").groupBy("l_returnflag").agg(
          (sum(Q.money(col("l_extendedprice")) * col("l_quantity").cast(DecimalType(4, 0)))
            .cast("double") / sum(col("l_quantity"))).as("wavg_price"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE)
          / SUM(l_quantity) AS wavg_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ==================== window functions (SURVEY §2.E) =================

    QueryDef("q31_window_rank", (s, dir) => {
      val wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
      val wr = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      Q.t(s, dir, "lineitem").filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"),
          rank().over(wq).as("rk"), dense_rank().over(wq).as("drk"),
          row_number().over(wr).as("rn"))
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
    }, Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        CAST(RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS INT) AS rk,
        CAST(DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS INT) AS drk,
        CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS INT) AS rn
      FROM lineitem WHERE l_orderkey < 1000
      ORDER BY l_returnflag, l_orderkey, l_linenumber, l_quantity""")),

    QueryDef("q32_window_lag_lead", (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Q.t(s, dir, "events").filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"),
          lag("value", 1).over(w).as("prev_value"),
          lead("value", 1).over(w).as("next_value"))
        .orderBy("event_id")
    }, Some("""SELECT event_id, user_id, value,
        LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
      FROM events WHERE event_type = 'purchase' ORDER BY event_id""")),

    QueryDef("q33_window_cumsum", (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Q.t(s, dir, "orders")
        .select(col("o_orderkey"),
          sum(Q.money(col("o_totalprice"))).over(w).cast("double").as("run_total"))
        .orderBy("o_orderkey")
    }, Some("""SELECT o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
      FROM orders ORDER BY o_orderkey"""),
      bench = true),

    QueryDef("q34_window_ntile", (s, dir) =>
      // scale-safe global ranking: range-bucketed two-pass rank (ONE data
      // shuffle, no single-partition Window) — see operators/Ranking.scala
      graft.operators.Ranking.globalRankings(
          Q.t(s, dir, "orders"), col("o_totalprice"), Seq(col("o_orderkey")), tiles = 4)
        .select("o_orderkey", "tile", "pr", "cd")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS tile,
        PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) AS pr,
        CUME_DIST() OVER (ORDER BY o_totalprice, o_orderkey) AS cd
      FROM orders ORDER BY o_orderkey""")),

    QueryDef("q35_window_rolling", (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
      Q.t(s, dir, "events")
        .select(col("event_id"),
          sum(Q.money(col("value"))).over(w).cast("double").as("msum"),
          (sum(Q.money(col("value"))).over(w).cast("double") /
            count(lit(1)).over(w)).as("mavg"))
        .orderBy("event_id")
    }, Some("""SELECT event_id,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS msum,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) / COUNT(*) OVER w AS mavg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""")),

    QueryDef("q36_window_first_last", (s, dir) => {
      val w = Window.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Q.t(s, dir, "orders")
        .select(col("o_orderpriority"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(w).as("last_ok"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
        .distinct().orderBy("o_orderpriority")
    }, Some("""SELECT DISTINCT o_orderpriority,
        FIRST_VALUE(o_orderkey) OVER w AS first_ok,
        LAST_VALUE(o_orderkey) OVER w AS last_ok,
        NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_orderpriority""")),

    QueryDef("q37_limit_by", (s, dir) => {
      // ClickHouse `LIMIT 3 BY o_orderpriority` — top-n per group
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Q.t(s, dir, "orders")
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    }, Some("""SELECT o_orderpriority, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 3
      ORDER BY o_orderpriority, rn""")),

    QueryDef("q38_grouping_sets", (s, dir) => {
      v(s, dir, "lineitem")
      s.sql("""SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
          COUNT(*) AS n
        FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY rf, ls""")
    }, Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        COUNT(*) AS n
      FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY rf, ls""")),

    // ======================= datetime (SURVEY §2.H) ======================

    QueryDef("q40_date_parts", (s, dir) =>
      Q.t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"), quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"), dayofmonth(col("o_orderdate")).as("d"),
          (call_function("weekday", col("o_orderdate")) + 1).as("isodow"),
          weekofyear(col("o_orderdate")).as("wk"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .orderBy("o_orderkey").limit(2000),
      Some("""SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y,
        CAST(quarter(o_orderdate) AS INT) AS q, CAST(month(o_orderdate) AS INT) AS m,
        CAST(day(o_orderdate) AS INT) AS d, CAST(isodow(o_orderdate) AS INT) AS isodow,
        CAST(weekofyear(o_orderdate) AS INT) AS wk, strftime(o_orderdate, '%Y-%m') AS ym
      FROM orders ORDER BY o_orderkey LIMIT 2000""")),

    QueryDef("q41_date_trunc_agg", (s, dir) =>
      Q.t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("mon"))
        .agg(count(lit(1)).as("n"), Q.dsum(col("o_totalprice")).as("rev"))
        .orderBy("mon"),
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1 ORDER BY mon""")),

    QueryDef("q42_date_arith", (s, dir) =>
      Q.t(s, dir, "lineitem").filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
          date_add(col("l_shipdate").cast("date"), 30).as("plus30"),
          add_months(col("l_shipdate").cast("date"), 2).as("plus2m"))
        .orderBy("l_orderkey", "l_linenumber", "days_since"),
      Some("""SELECT l_orderkey, l_linenumber,
        CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS INT) AS days_since,
        CAST(l_shipdate AS DATE) + 30 AS plus30,
        CAST(CAST(l_shipdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m
      FROM lineitem WHERE l_orderkey < 500 ORDER BY l_orderkey, l_linenumber, days_since""")),

    QueryDef("q43_epoch", (s, dir) =>
      Q.t(s, dir, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("us"),
          col("ts").cast("date").as("d"))
        .orderBy("event_id").limit(5000),
      Some("""SELECT event_id, epoch_us(ts) AS us, CAST(ts AS DATE) AS d
      FROM events ORDER BY event_id LIMIT 5000""")),

    // ======================== strings (SURVEY §2.H) ======================

    QueryDef("q44_string_funcs", (s, dir) =>
      Q.t(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("up"), lower(col("c_name")).as("lo"),
          length(col("c_name")).as("len"), substring(col("c_name"), 1, 8).as("sub"),
          concat_ws("-", col("c_name"), col("c_mktsegment")).as("cat"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
          reverse(col("c_name")).as("rev"))
        .orderBy("c_custkey").limit(1000),
      Some("""SELECT c_custkey, UPPER(c_name) AS up, LOWER(c_name) AS lo,
        CAST(LENGTH(c_name) AS INT) AS len, SUBSTR(c_name, 1, 8) AS sub,
        c_name || '-' || c_mktsegment AS cat,
        LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded, REVERSE(c_name) AS rev
      FROM customer ORDER BY c_custkey LIMIT 1000""")),

    QueryDef("q45_regexp", (s, dir) =>
      Q.t(s, dir, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"),
          col("p_type").like("%E%").as("has_e"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("novowels"))
        .orderBy("p_partkey").limit(1000),
      Some("""SELECT p_partkey,
        CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
        p_type LIKE '%E%' AS has_e, regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels
      FROM part ORDER BY p_partkey LIMIT 1000""")),

    QueryDef("q46_split_part", (s, dir) =>
      Q.t(s, dir, "documents")
        .select(col("doc_id"),
          element_at(split(col("text"), " "), 1).as("first_tok"),
          size(split(col("text"), " ")).as("n_raw"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, split_part(text, ' ', 1) AS first_tok,
        CAST(len(string_split(text, ' ')) AS INT) AS n_raw
      FROM documents ORDER BY doc_id""")),

    // ======================= reshaping (SURVEY §2.I) =====================

    QueryDef("q47_pivot", (s, dir) => {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      val p = Q.t(s, dir, "customer")
        .groupBy("c_nationkey").pivot("c_mktsegment", segs).agg(count(lit(1)))
      p.select(col("c_nationkey") +:
          segs.map(g => coalesce(col(g), lit(0L)).as(g.toLowerCase)): _*)
        .orderBy("c_nationkey")
    }, Some("""SELECT c_nationkey,
        COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS automobile,
        COUNT(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS building,
        COUNT(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 END) AS furniture,
        COUNT(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 END) AS household,
        COUNT(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS machinery
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")),

    QueryDef("q48_unpivot", (s, dir) =>
      Q.t(s, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "metric", "value")
        .orderBy("p_partkey", "metric").limit(4000),
      Some("""SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice FROM part
      ORDER BY p_partkey, metric LIMIT 4000""")),

    QueryDef("q49_explode_tokens", (s, dir) =>
      Q.t(s, dir, "documents")
        .select(explode(split(lower(col("text")), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc).limit(30),
      Some("""SELECT token, COUNT(*) AS n FROM
        (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
      GROUP BY token ORDER BY n DESC, token LIMIT 30"""),
      bench = true),

    // ==================== JSON + events (SURVEY §2.H/J) ==================

    QueryDef("q50_json_extract", (s, dir) =>
      Q.t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, COUNT(*) AS n
      FROM events GROUP BY 1 ORDER BY k""")),

    QueryDef("q51_time_bucket", (s, dir) =>
      Q.t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"),
          sum(Q.money(col("value"))).cast("double").as("sum_value"))
        .orderBy("h"),
      Some("""SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1 ORDER BY h"""),
      bench = true),

    QueryDef("q52_sessionize", (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Q.t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull
            || (unix_micros(col("ts")) - col("prev_us")) > 1800L * 1000000L, 1).otherwise(0))
        .groupBy("user_id")
        .agg(sum("new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }, Some("""SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      FROM (SELECT user_id,
          CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
        FROM (SELECT user_id, ts,
            LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
          FROM events))
      GROUP BY user_id ORDER BY user_id""")),

    // ============ custom aggregates (SURVEY §4.3 — rows-only) ============

    QueryDef("q55_window_funnel", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT lvl, COUNT(*) AS n_users FROM
          (SELECT user_id, windowFunnel(604800000000, unix_micros(ts),
             event_type = 'signup', event_type = 'click', event_type = 'purchase') AS lvl
           FROM events GROUP BY user_id)
        GROUP BY lvl ORDER BY lvl""")
    },
      // The funnel's greedy chain-tracking (chainStart carries the most recent
      // qualifying predecessor) is equivalent to plain existence of an ordered
      // (signup ≤ click ≤ purchase) triple with both gaps measured from the
      // signup within the window: the most-recent-predecessor choice dominates
      // any other witness, so ∃-any ⟺ ∃-algorithmic. Ties process in cond
      // order (mask asc), so equality at a shared timestamp still chains.
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
        su AS (SELECT user_id, t FROM e WHERE event_type = 'signup'),
        cl AS (SELECT user_id, t FROM e WHERE event_type = 'click'),
        pu AS (SELECT user_id, t FROM e WHERE event_type = 'purchase'),
        u AS (SELECT DISTINCT user_id FROM events),
        l1 AS (SELECT DISTINCT user_id FROM su),
        l2 AS (SELECT DISTINCT su.user_id FROM su JOIN cl ON su.user_id = cl.user_id
               AND cl.t >= su.t AND cl.t - su.t <= 604800000000),
        l3 AS (SELECT DISTINCT su.user_id FROM su
               JOIN cl ON su.user_id = cl.user_id AND cl.t >= su.t AND cl.t - su.t <= 604800000000
               JOIN pu ON pu.user_id = su.user_id AND pu.t >= cl.t AND pu.t - su.t <= 604800000000)
      SELECT lvl, COUNT(*) AS n_users FROM (
        SELECT u.user_id, CASE WHEN l3.user_id IS NOT NULL THEN 3
          WHEN l2.user_id IS NOT NULL THEN 2
          WHEN l1.user_id IS NOT NULL THEN 1 ELSE 0 END AS lvl
        FROM u LEFT JOIN l1 USING (user_id) LEFT JOIN l2 USING (user_id)
          LEFT JOIN l3 USING (user_id))
      GROUP BY lvl ORDER BY lvl""")),

    QueryDef("q56_retention", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT CAST(SUM(r[0]) AS BIGINT) AS d0, CAST(SUM(r[1]) AS BIGINT) AS d1,
          CAST(SUM(r[2]) AS BIGINT) AS d2
        FROM (SELECT retention(event_type = 'signup', event_type = 'click',
            event_type = 'purchase') AS r
          FROM events GROUP BY user_id)""")
    }, Some("""SELECT CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS d0,
        CAST(SUM(CASE WHEN s AND c THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        CAST(SUM(CASE WHEN s AND p THEN 1 ELSE 0 END) AS BIGINT) AS d2
      FROM (SELECT user_id, bool_or(event_type = 'signup') AS s,
          bool_or(event_type = 'click') AS c, bool_or(event_type = 'purchase') AS p
        FROM events GROUP BY user_id)""")),

    QueryDef("q57_sequence_match", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT COUNT(*) AS n_matched FROM
          (SELECT user_id,
             sequenceMatch('(?1).*(?2)', unix_micros(ts),
               event_type = 'signup', event_type = 'purchase') AS m
           FROM events GROUP BY user_id)
        WHERE m""")
    },
      // '(?1).*(?2)' over (ts, condIndex)-sorted events ⟺ some signup at or
      // before some purchase (ties: signup's mask sorts first, so an equal-ts
      // purchase still matches) ⟺ min(signup ts) <= max(purchase ts)
      Some("""SELECT COUNT(*) AS n_matched FROM (
        SELECT user_id,
          min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS ms,
          max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS mp
        FROM events GROUP BY user_id)
      WHERE ms IS NOT NULL AND mp IS NOT NULL AND ms <= mp""")),

    QueryDef("q58_topk_agg", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT user_id % 10 AS grp, array_join(topK(event_type, 3), ',') AS top3
        FROM events GROUP BY user_id % 10 ORDER BY grp""")
    },
      // SpaceSaving is exact while distinct keys ≤ capacity (256 here vs a
      // handful of event types), and its output order is (count desc, string
      // asc) — both reproducible in plain SQL at this cardinality
      Some("""SELECT grp, string_agg(event_type, ',' ORDER BY n DESC, event_type) AS top3
      FROM (SELECT user_id % 10 AS grp, event_type, COUNT(*) AS n,
          ROW_NUMBER() OVER (PARTITION BY user_id % 10 ORDER BY COUNT(*) DESC, event_type) AS rn
        FROM events GROUP BY 1, 2)
      WHERE rn <= 3 GROUP BY grp ORDER BY grp""")),

    QueryDef("q59_bit_agg", (s, dir) => {
      v(s, dir, "lineitem")
      s.sql("""SELECT l_returnflag, groupBitAnd(l_linenumber) AS band,
          groupBitOr(l_linenumber) AS bor, groupBitXor(l_linenumber) AS bxor
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    }, Some("""SELECT l_returnflag, CAST(BIT_AND(l_linenumber) AS BIGINT) AS band,
        CAST(BIT_OR(l_linenumber) AS BIGINT) AS bor, CAST(BIT_XOR(l_linenumber) AS BIGINT) AS bxor
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ======== dedup / text / similarity (training-data pipeline) =========

    QueryDef("q60_dedup_exact", (s, dir) => {
      // content key = 40-char prefix so the synthetic corpus has real groups
      val docs = Q.t(s, dir, "documents")
        .withColumn("key", substring(col("text"), 1, 40))
      Dedup.exactGroups(docs, "key", "doc_id")
        .select(col("digest"), col("n"),
          element_at(col("ids"), 1).as("min_id"),
          element_at(col("ids"), size(col("ids"))).as("max_id"))
        .orderBy("digest")
    }, Some("""SELECT md5(substr(text, 1, 40)) AS digest, COUNT(*) AS n,
        MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      FROM documents GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY digest"""),
      bench = true),

    QueryDef("q61_dedup_keepfirst", (s, dir) => {
      val docs = Q.t(s, dir, "documents")
        .withColumn("key", substring(col("text"), 1, 40))
      Dedup.exactKeepFirst(docs, "key", "doc_id")
        .select("doc_id", "lang").orderBy("doc_id")
    }, Some("""SELECT doc_id, lang FROM (SELECT doc_id, lang,
        ROW_NUMBER() OVER (PARTITION BY md5(substr(text, 1, 40)) ORDER BY doc_id) AS rn
      FROM documents) WHERE rn = 1 ORDER BY doc_id""")),

    QueryDef("q62_ngram_jaccard", (s, dir) =>
      Dedup.ngramJaccard(Q.t(s, dir, "documents"), "text", "doc_id",
          threshold = 0.2, shingleSize = 5, maxDocFreq = 1000000)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id_a", "id_b"),
      // exact all-pairs oracle: Jaccard over string 5-gram shingle sets ==
      // Jaccard over the operator's 64-bit hash sets (collisions ~n²/2⁶⁴)
      Some("""WITH toks AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '') AS t
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
          ELSE list_transform(range(1, len(t) - 3), i -> array_to_string(t[i:i+4], ' ')) END) AS s
        FROM toks),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard FROM pairs WHERE jaccard >= 0.2
      ORDER BY id_a, id_b""")),

    QueryDef("q63_minhash_pairs", (s, dir) =>
      Dedup.minhashLsh(Q.t(s, dir, "documents"), "text", "doc_id",
          threshold = 0.4, shingleSize = 3, bands = 8, rowsPerBand = 2)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id_a", "id_b"),
      // Exact all-pairs oracle is valid because LSH + exact-verify output ⊆
      // true pairs always, and recall here is deterministic-complete: the
      // corpus's near-dup pairs all sit at J ≥ 0.9 (verified: no pair exists
      // in [0.3, 0.9)), where the 8-band/2-row S-curve's miss probability is
      // (1-0.81)^8 ≈ 2e-6 per pair — and the hashes are seed-fixed, so the
      // outcome is a constant of the dataset, not a per-run coin flip.
      Some("""WITH toks AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '') AS t
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
          ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) END) AS s
        FROM toks),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard FROM pairs WHERE jaccard >= 0.4
      ORDER BY id_a, id_b"""),
      bench = true),

    QueryDef("q64_simhash_pairs", (s, dir) => {
      v(s, dir, "documents")
      // The PRODUCTION simhash pair pipeline — multi-index pigeonhole
      // buckets + popcount verification (Dedup.simhashPairsFromHashes,
      // the 100 TB path; recall at any radius is structurally exact) —
      // fed md5-portable 60-bit signatures (q106's device) instead of the
      // engine-native Mix64 token hash, so the OPERATOR's full output
      // (pairs + hamming) replays bit-for-bit in DuckDB: r12 retires this
      // row's rows-only status. The Mix64 hash stays simhashPairs'
      // default (spec-locked); only the hash source is swapped here.
      val sig = s.sql("""WITH th AS (
          SELECT doc_id,
            CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT) AS h
          FROM (SELECT doc_id,
                  explode(filter(split(lower(text), '[^a-z0-9]+'),
                                 t -> length(t) > 0)) AS tok
                FROM documents)
        ), bits AS (
          SELECT doc_id, b,
            SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS w
          FROM th LATERAL VIEW explode(sequence(0, 59)) AS b
          GROUP BY doc_id, b
        )
        SELECT doc_id AS id,
          SUM(CASE WHEN w > 0 THEN shiftleft(CAST(1 AS BIGINT), b)
              ELSE CAST(0 AS BIGINT) END) AS h
        FROM bits GROUP BY doc_id""")
      Dedup.simhashPairsFromHashes(sig, maxHamming = 4)
        .orderBy("id_a", "id_b")
    }, Some("""WITH th AS (
        SELECT doc_id,
          CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id, UNNEST(list_filter(
                regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                t -> t <> '')) AS tok
              FROM documents)
      ), bits AS (
        SELECT doc_id, b,
          SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS w
        FROM th CROSS JOIN (SELECT UNNEST(range(0, 60)) AS b) bb
        GROUP BY doc_id, b
      ), sh AS (
        SELECT doc_id,
          SUM(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS s
      FROM bits GROUP BY doc_id
      )
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.s, b.s)) <= 4
      ORDER BY id_a, id_b""")),

    QueryDef("q65_embed_neardup", (s, dir) => {
      // random embeddings contain no natural near-dups (pairwise cosine
      // ~N(0, 1/64)), so plant scaled copies of the first 20 vectors —
      // scaling preserves direction, so each (orig, copy) pair has cos ≈ 1
      // and MUST be recovered by the LSH path
      val e = Q.t(s, dir, "embeddings").select("vec_id", "embedding")
      val planted = e.filter(col("vec_id") < 20).select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
      // 12 bits → ~|corpus|/4096 per bucket; planted scaled copies share ALL
      // sign bits with their original, so recall on true near-dups is exact
      Dedup.embeddingNearDup(e.unionByName(planted), "embedding", "vec_id",
          threshold = 0.99, bits = 12)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    },
      // id-pairs only (no cos column): the pair SET is deterministic — planted
      // scaled copies share every sign bit with their original (scaling
      // preserves direction) so LSH recall on true pairs is structural, and
      // random 64-dim pairs sit ~N(0, 1/64) away from cos 0.99. The float
      // scaling matches bit-for-bit: x*1.5f in float == round(double(x)*1.5)
      // since the double product is exact (24+1 mantissa bits < 53).
      Some("""WITH u AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x * 1.5 AS FLOAT))
        FROM embeddings WHERE vec_id < 20),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
           * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))) AS cos
        FROM u a JOIN u b ON a.vec_id < b.vec_id)
      SELECT id_a, id_b FROM p WHERE cos >= 0.99 ORDER BY id_a, id_b""")),

    QueryDef("q66_ann_bruteforce", (s, dir) => {
      val emb = Q.t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "embedding", "vec_id", 5)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rn")
    },
      // exact top-k is fully SQL-expressible: same sequential-fold cosine
      // (list_sum evaluates left-to-right like the Spark aggregate() fold),
      // same (cos desc, neighbor_id) tie order
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
      s AS (SELECT query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
             * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))) AS cos
        FROM embeddings c CROSS JOIN q WHERE c.vec_id <> query_id),
      r AS (SELECT query_id, neighbor_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        FROM s)
      SELECT query_id, CAST(rn AS INT) AS rn, neighbor_id, ROUND(cos, 6) AS cos
      FROM r WHERE rn <= 5 ORDER BY query_id, rn"""),
      bench = true),

    QueryDef("q67_ann_lsh", (s, dir) => {
      val emb = Q.t(s, dir, "embeddings")
      Similarity.annTopK(emb, emb.filter(col("vec_id") < 10), "embedding", "vec_id", 5, bits = 8)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rn")
    }, Some("""WITH dot AS (
        SELECT e.vec_id, j.p,
          list_sum(list_transform(range(1, 65),
            i -> CAST(e.embedding[i] AS DOUBLE) * sin(j.p * 78.233 + (i - 1) * 12.9898))) AS d
        FROM embeddings e CROSS JOIN (SELECT unnest(range(0, 8)) AS p) j
      ), bkt AS (
        SELECT vec_id,
          SUM(CASE WHEN d >= 0 THEN CAST(POW(2, p) AS BIGINT) ELSE 0 END) AS bucket
        FROM dot GROUP BY vec_id
      ), q AS (
        SELECT b.vec_id AS query_id, b.bucket, e.embedding AS qv
        FROM bkt b JOIN embeddings e ON b.vec_id = e.vec_id WHERE b.vec_id < 10
      ), c AS (
        SELECT b.vec_id AS neighbor_id, b.bucket, e.embedding AS cv
        FROM bkt b JOIN embeddings e ON b.vec_id = e.vec_id
      ), sc AS (
        SELECT q.query_id, c.neighbor_id,
          list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
             * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))) AS cos
        FROM q JOIN c ON q.bucket = c.bucket AND q.query_id <> c.neighbor_id
      ), r AS (
        SELECT query_id, neighbor_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        FROM sc WHERE cos IS NOT NULL
      )
      SELECT query_id, CAST(rn AS INT) AS rn, neighbor_id, ROUND(cos, 6) AS cos
      FROM r WHERE rn <= 5 ORDER BY query_id, rn""")),

    QueryDef("q68_cosine_pairs", (s, dir) => {
      val e = Q.t(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"),
          round(GraftFunctions.cosineSimilarity(col("va"), col("vb")), 6).as("cos"),
          round(GraftFunctions.l2Distance(col("va"), col("vb")), 6).as("l2"))
        .orderBy("id_a")
    }, Some("""SELECT a.vec_id AS id_a,
        ROUND(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
           * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 6) AS cos,
        ROUND(sqrt(list_sum(list_transform(range(1, 65),
          i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 6) AS l2
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      ORDER BY id_a""")),

    QueryDef("q69_token_count", (s, dir) =>
      Q.t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.subwordCountEstimate(col("text")).as("n_subwords"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        CAST(len(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '')) AS INT) AS n_tokens,
        CAST(len(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> ''))
          + len(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> len(x) > 6)) AS INT) AS n_subwords
      FROM documents ORDER BY doc_id""")),

    QueryDef("q70_quality", (s, dir) =>
      TextAnalysis.qualityScore(Q.t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_chars_q"), col("n_tokens"),
          round(col("mean_token_len"), 6).as("mean_token_len"),
          round(col("stopword_ratio"), 6).as("stopword_ratio"),
          round(col("repetition_ratio"), 6).as("repetition_ratio"),
          round(col("quality_score"), 6).as("quality_score"))
        .orderBy("doc_id"),
      // every feature is a pure arithmetic composition over token counts —
      // both engines divide the same exact integers, and the score's
      // left-associated double mix is replicated term-for-term ([[:punct:]]
      // in RE2 == Java \p{Punct} for this ASCII corpus)
      Some("""WITH f AS (
        SELECT doc_id, length(text) AS nc,
          list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '') AS toks,
          CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
            / CAST(greatest(length(text), 1) AS DOUBLE) AS punct
        FROM documents),
      r AS (
        SELECT doc_id, nc, len(toks) AS nt, punct,
          CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS DOUBLE)
            / CAST(greatest(len(toks), 1) AS DOUBLE) AS mtl,
          CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x))) AS DOUBLE)
            / CAST(greatest(len(toks), 1) AS DOUBLE) AS stop,
          1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS rep
        FROM f)
      SELECT doc_id, CAST(nc AS INT) AS n_chars_q, CAST(nt AS INT) AS n_tokens,
        ROUND(mtl, 6) AS mean_token_len, ROUND(stop, 6) AS stopword_ratio,
        ROUND(rep, 6) AS repetition_ratio,
        ROUND(least(1.0, greatest(0.0,
          0.3 * least(CAST(nt AS DOUBLE) / 100.0, 1.0) + 0.3 * (1.0 - rep)
          + 0.2 * least(stop * 5.0, 1.0) + 0.2 * (1.0 - punct))), 6) AS quality_score
      FROM r ORDER BY doc_id""")),

    QueryDef("q71_lang_id", (s, dir) =>
      Q.t(s, dir, "documents")
        .select(col("lang"), TextAnalysis.languageId(col("text")).as("pred"))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred"),
      // the heuristic is 5 exact integer-ratio scores + a lexicographic
      // (score, lang) argmax — the descending CASE chain reproduces the
      // max-lang tie-break of Spark's greatest(struct(score, lang))
      Some("""WITH t AS (SELECT lang,
          list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '') AS toks
        FROM documents),
      sc AS (SELECT lang,
          CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein','eine','zu','den','von'], x))) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS s_de,
          CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x))) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS s_en,
          CAST(len(list_filter(toks, x -> list_contains(['el','la','los','de','y','un','una','es','que','por'], x))) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS s_es,
          CAST(len(list_filter(toks, x -> list_contains(['le','la','les','de','et','un','une','est','que','pour'], x))) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS s_fr,
          CAST(len(list_filter(toks, x -> list_contains(['de','shi','le','bu','wo','ni','ta','men','zai','you'], x))) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS s_zh
        FROM t),
      p AS (SELECT lang, greatest(s_de, s_en, s_es, s_fr, s_zh) AS m,
          s_de, s_en, s_es, s_fr, s_zh FROM sc)
      SELECT lang, CASE WHEN m < 0.02 THEN 'und'
          WHEN s_zh = m THEN 'zh' WHEN s_fr = m THEN 'fr' WHEN s_es = m THEN 'es'
          WHEN s_en = m THEN 'en' ELSE 'de' END AS pred, COUNT(*) AS n
      FROM p GROUP BY lang, pred ORDER BY lang, pred""")),

    QueryDef("q72_asof_join", (s, dir) => {
      val ev = Q.t(s, dir, "events")
      val left = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val right = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max(col("value")).as("click_value"))
      AsOfJoin.backward(left, right, Seq("user_id"), "ts", "ts",
          Seq("click_value"), tsOut = "ts")
        .orderBy("event_id")
    }, Some("""SELECT l.user_id, l.ts, l.event_id, l.value, r.click_value
      FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') l
      ASOF LEFT JOIN (SELECT user_id, ts, MAX(value) AS click_value FROM events
        WHERE event_type = 'click' GROUP BY user_id, ts) r
      ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id"""),
      bench = true),

    QueryDef("q73_array_label_stats", (s, dir) =>
      Q.t(s, dir, "embeddings").groupBy("label").agg(
          count(lit(1)).as("n"),
          min(element_at(col("embedding"), 1)).cast("double").as("min_e1"),
          max(element_at(col("embedding"), 1)).cast("double").as("max_e1"))
        .orderBy("label"),
      Some("""SELECT label, COUNT(*) AS n, CAST(MIN(embedding[1]) AS DOUBLE) AS min_e1,
        CAST(MAX(embedding[1]) AS DOUBLE) AS max_e1
      FROM embeddings GROUP BY label ORDER BY label""")),

    QueryDef("q74_hash_funcs", (s, dir) =>
      Q.t(s, dir, "customer").filter(col("c_custkey") < 200)
        .select(col("c_custkey"), md5(col("c_name").cast("binary")).as("h_md5"),
          sha2(col("c_name").cast("binary"), 256).as("h_sha256"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256
      FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""")),

    QueryDef("q75_fingerprints", (s, dir) => {
      v(s, dir, "documents")
      s.sql("""SELECT doc_id, simHash(text) AS sh, fingerprint(text, 8) AS fp,
          hammingDistance(simHash(text), 0) AS bits
        FROM documents ORDER BY doc_id""")
    },
    // r13: direct oracle — the engine kernels (SimHash, TextFingerprint,
    // both Mix64/FNV-1a based) replayed bit-for-bit in DuckDB via HUGEINT
    // mod-2^64 arithmetic (64x64 multiplies split hi/lo so the product
    // stays inside HUGEINT; winnow min compared over SIGNED longs exactly
    // as the Java kernel does). Validated against an independent Python
    // reference on the empty/punctuation-only/short-string edges.
    Some("""WITH docs AS (
  SELECT doc_id, lower(text) AS lt FROM documents
),
-- ======== simHash: Mix64(FNV-1a(token)) per token, 64 bit votes ========
toks AS (
  SELECT doc_id, tok FROM docs,
    UNNEST(list_filter(regexp_split_to_array(lt, '[^a-z0-9]+'), t -> t <> '')) AS u(tok)
),
tokf AS (  -- FNV-1a over UTF-16 units (ASCII corpus: = codepoints)
  SELECT doc_id,
    list_reduce(
      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        list_transform(split(tok, ''), c -> CAST(unicode(c) AS HUGEINT))),
      (h, c) -> (xor(h, c) * CAST(1099511628211 AS HUGEINT))
                % CAST(18446744073709551616 AS HUGEINT)) AS f
  FROM toks
),
-- splitmix64 finalizer, staged; mulmod splits the 64x64 product so the
-- intermediate stays inside HUGEINT
tm1 AS (SELECT doc_id, (f + 11400714819323198485) % CAST(18446744073709551616 AS HUGEINT) AS x FROM tokf),
tm2 AS (SELECT doc_id, xor(x, x >> 30) AS x FROM tm1),
tm3 AS (SELECT doc_id,
  ((x % 4294967296) * CAST(13787848793156543929 AS HUGEINT)
   + (((x >> 32) * 484763065) % 4294967296) * 4294967296)
  % CAST(18446744073709551616 AS HUGEINT) AS x FROM tm2),
tm4 AS (SELECT doc_id, xor(x, x >> 27) AS x FROM tm3),
tm5 AS (SELECT doc_id,
  ((x % 4294967296) * CAST(10723151780598845931 AS HUGEINT)
   + (((x >> 32) * 321982955) % 4294967296) * 4294967296)
  % CAST(18446744073709551616 AS HUGEINT) AS x FROM tm4),
tokh AS (SELECT doc_id, xor(x, x >> 31) AS h FROM tm5),
votes AS (
  SELECT doc_id, b, SUM(CASE WHEN (h >> b) % 2 = 1 THEN 1 ELSE -1 END) AS w
  FROM tokh, UNNEST(range(0, 64)) AS rb(b)
  GROUP BY doc_id, b
),
shu AS (
  SELECT doc_id,
    SUM(CASE WHEN w > 0 THEN (CAST(1 AS HUGEINT) << b) ELSE CAST(0 AS HUGEINT) END) AS sh_u
  FROM votes GROUP BY doc_id
),
-- ======== fingerprint(text, 8): winnowed min of Mix64(rolling hash) ========
norm AS (
  SELECT doc_id, ltrim(regexp_replace(lt, '[^a-z0-9]+', ' ', 'g')) AS s FROM docs
),
chars AS (
  SELECT doc_id, s,
    CASE WHEN length(s) = 0 THEN CAST([] AS HUGEINT[])
         ELSE list_transform(split(s, ''), c -> CAST(unicode(c) AS HUGEINT)) END AS cs,
    length(s) AS n
  FROM norm
),
-- short path (n <= 8): Mix64(FNV over the whole normalized string)
shortf AS (
  SELECT doc_id,
    list_reduce(
      list_prepend(CAST(14695981039346656037 AS HUGEINT), cs),
      (h, c) -> (xor(h, c) * CAST(1099511628211 AS HUGEINT))
                % CAST(18446744073709551616 AS HUGEINT)) AS x
  FROM chars WHERE n <= 8
),
-- long path: every window's polynomial hash mod 2^64 (closed form of the
-- Java slide), B = 1e9+7, powers precomputed mod 2^64
wins AS (
  SELECT doc_id,
    ( cs[i+1] * CAST(9015250055358150391 AS HUGEINT) % CAST(18446744073709551616 AS HUGEINT)
    + cs[i+2] * CAST(1423083718267137937 AS HUGEINT) % CAST(18446744073709551616 AS HUGEINT)
    + cs[i+3] * CAST(7232439895113528231 AS HUGEINT) % CAST(18446744073709551616 AS HUGEINT)
    + cs[i+4] * CAST(2173964608407773537 AS HUGEINT) % CAST(18446744073709551616 AS HUGEINT)
    + cs[i+5] * CAST(14069101319555514199 AS HUGEINT) % CAST(18446744073709551616 AS HUGEINT)
    + cs[i+6] * CAST(1000000014000000049 AS HUGEINT) % CAST(18446744073709551616 AS HUGEINT)
    + cs[i+7] * CAST(1000000007 AS HUGEINT)
    + cs[i+8] ) % CAST(18446744073709551616 AS HUGEINT) AS x
  FROM chars, UNNEST(range(0, n - 7)) AS r(i)
  WHERE n > 8
),
allx AS (SELECT doc_id, x FROM shortf UNION ALL SELECT doc_id, x FROM wins),
fm1 AS (SELECT doc_id, (x + 11400714819323198485) % CAST(18446744073709551616 AS HUGEINT) AS x FROM allx),
fm2 AS (SELECT doc_id, xor(x, x >> 30) AS x FROM fm1),
fm3 AS (SELECT doc_id,
  ((x % 4294967296) * CAST(13787848793156543929 AS HUGEINT)
   + (((x >> 32) * 484763065) % 4294967296) * 4294967296)
  % CAST(18446744073709551616 AS HUGEINT) AS x FROM fm2),
fm4 AS (SELECT doc_id, xor(x, x >> 27) AS x FROM fm3),
fm5 AS (SELECT doc_id,
  ((x % 4294967296) * CAST(10723151780598845931 AS HUGEINT)
   + (((x >> 32) * 321982955) % 4294967296) * 4294967296)
  % CAST(18446744073709551616 AS HUGEINT) AS x FROM fm4),
fmix AS (SELECT doc_id, xor(x, x >> 31) AS m FROM fm5),
fp AS (  -- min over SIGNED longs, as the Java kernel compares
  SELECT doc_id,
    MIN(CAST(CASE WHEN m >= 9223372036854775808
        THEN m - 18446744073709551616 ELSE m END AS BIGINT)) AS fp
  FROM fmix GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(coalesce(CASE WHEN s.sh_u >= 9223372036854775808
       THEN s.sh_u - 18446744073709551616 ELSE s.sh_u END, 0) AS BIGINT) AS sh,
  fp.fp AS fp,
  CAST(bit_count(CAST(coalesce(CASE WHEN s.sh_u >= 9223372036854775808
       THEN s.sh_u - 18446744073709551616 ELSE s.sh_u END, 0) AS BIGINT)) AS INT) AS bits
FROM docs d LEFT JOIN shu s USING (doc_id) LEFT JOIN fp USING (doc_id)
ORDER BY d.doc_id""")),

    // ============== ClickHouse-dialect SQL shim (SURVEY §3.1) ============

    QueryDef("q76_uniq_upto", (s, dir) => {
      v(s, dir, "lineitem")
      s.sql("""SELECT l_returnflag, CAST(uniqUpTo(l_partkey, 5) AS BIGINT) AS u5,
          CAST(uniqUpTo(l_linenumber, 10) AS BIGINT) AS u10
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    }, Some("""SELECT l_returnflag, LEAST(COUNT(DISTINCT l_partkey), 6) AS u5,
        LEAST(COUNT(DISTINCT l_linenumber), 11) AS u10
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef("q77_ch_agg_dialect", (s, dir) => {
      v(s, dir, "lineitem")
      s.sql("""SELECT CAST(toYear(l_shipdate) AS INT) AS y,
          CAST(toYYYYMM(l_shipdate) AS INT) AS ym,
          uniqExact(l_orderkey) AS u, countIf(l_quantity > 25) AS hi,
          CAST(argMax(l_partkey, (l_orderkey * 100 + l_linenumber) * 100000 + l_partkey) AS BIGINT) AS am
        FROM lineitem GROUP BY y, ym ORDER BY y, ym""")
    }, Some("""SELECT CAST(year(l_shipdate) AS INT) AS y,
        CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS ym,
        CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS u,
        COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS hi,
        CAST(ARG_MAX(l_partkey, (l_orderkey * 100 + l_linenumber) * 100000 + l_partkey) AS BIGINT) AS am
      FROM lineitem GROUP BY 1, 2 ORDER BY y, ym""")),

    QueryDef("q78_ch_datetime", (s, dir) => {
      v(s, dir, "orders")
      new graft.engine.GraftSession(s).sql(
        """SELECT o_orderkey, toStartOfMonth(o_orderdate) AS som,
          CAST(toDayOfWeek(o_orderdate) AS INT) AS dow,
          addDays(CAST(o_orderdate AS DATE), 10) AS plus10,
          CAST(dateDiff('day', TIMESTAMP '1995-06-15', o_orderdate) AS BIGINT) AS dd,
          CAST(dateDiff('month', TIMESTAMP '1995-06-15', o_orderdate) AS BIGINT) AS dm
        FROM orders ORDER BY o_orderkey LIMIT 2000""")
    }, Some("""SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS som,
        CAST(isodow(o_orderdate) AS INT) AS dow,
        CAST(o_orderdate AS DATE) + 10 AS plus10,
        date_diff('day', TIMESTAMP '1995-06-15', o_orderdate) AS dd,
        date_diff('month', TIMESTAMP '1995-06-15', o_orderdate) AS dm
      FROM orders ORDER BY o_orderkey LIMIT 2000""")),

    QueryDef("q79_ch_string", (s, dir) => {
      v(s, dir, "customer")
      s.sql("""SELECT c_custkey, CAST(lengthUTF8(c_name) AS INT) AS len8,
          trimBoth(concatWithSeparator('-', c_name, c_mktsegment)) AS cat,
          leftPad(toString(c_custkey), 8, '0') AS pad,
          arrayElement(splitByChar('#', c_name), 1) AS tok
        FROM customer ORDER BY c_custkey LIMIT 1000""")
    }, Some("""SELECT c_custkey, CAST(LENGTH(c_name) AS INT) AS len8,
        TRIM(c_name || '-' || c_mktsegment) AS cat,
        LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
        split_part(c_name, '#', 1) AS tok
      FROM customer ORDER BY c_custkey LIMIT 1000""")),

    QueryDef("q80_ch_array", (s, dir) => {
      v(s, dir, "lineitem")
      s.sql("""SELECT l_orderkey, l_linenumber,
          arraySum(arrayMap(x -> x * x, range(1, l_linenumber + 1))) AS sumsq,
          CAST(size(arrayPopBack(range(l_linenumber))) AS INT) AS popn,
          arraySum(range(l_linenumber - 1)) AS sumr
        FROM lineitem WHERE l_orderkey < 200 ORDER BY l_orderkey, l_linenumber""")
    }, Some("""SELECT l_orderkey, l_linenumber,
        CAST(COALESCE(list_sum(list_transform(range(1, CAST(l_linenumber AS BIGINT) + 1), x -> x * x)), 0) AS DOUBLE) AS sumsq,
        CAST(l_linenumber - 1 AS INT) AS popn,
        CAST(COALESCE(list_sum(range(CAST(l_linenumber AS BIGINT) - 1)), 0) AS DOUBLE) AS sumr
      FROM lineitem WHERE l_orderkey < 200 ORDER BY l_orderkey, l_linenumber""")),

    QueryDef("q81_ch_conditional", (s, dir) => {
      v(s, dir, "orders")
      s.sql("""SELECT o_orderkey,
          multiIf(o_totalprice < 100000, 'small', o_totalprice < 300000, 'mid', 'big') AS sz,
          ifNull(nullif(o_orderstatus, 'O'), 'open') AS st
        FROM orders ORDER BY o_orderkey LIMIT 2000""")
    }, Some("""SELECT o_orderkey,
        CASE WHEN o_totalprice < 100000 THEN 'small' WHEN o_totalprice < 300000 THEN 'mid'
          ELSE 'big' END AS sz,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st
      FROM orders ORDER BY o_orderkey LIMIT 2000""")),

    QueryDef("q82_above_avg", (s, dir) => {
      val c = Q.t(s, dir, "customer")
      val nav = c.groupBy(col("c_nationkey").as("nk"))
        .agg((sum(Q.money(col("c_acctbal"))).cast("double") / count(lit(1))).as("nav"))
      c.join(broadcast(nav), col("c_nationkey") === col("nk"))
        .filter(col("c_acctbal") > col("nav"))
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_above"))
        .orderBy("c_nationkey")
    }, Some("""SELECT c_nationkey, COUNT(*) AS n_above
      FROM customer JOIN (SELECT c_nationkey AS nk,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS nav
        FROM customer GROUP BY 1) a ON c_nationkey = nk
      WHERE c_acctbal > nav
      GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ============ null handling / slicing / binning (SURVEY §2.B/F/I) =====

    QueryDef("q83_fillna", (s, dir) => {
      val j = Q.t(s, dir, "customer")
        .join(Q.t(s, dir, "orders").filter(col("o_totalprice") > 400000)
            .select("o_custkey", "o_orderkey", "o_totalprice"),
          col("c_custkey") === col("o_custkey"), "left")
      j.na.fill(Map("o_totalprice" -> 0.0))
        .na.fill(Map("o_orderkey" -> -1L))
        .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("c_custkey", "o_orderkey")
    }, Some("""SELECT c_custkey, COALESCE(o_orderkey, -1) AS o_orderkey,
        COALESCE(o_totalprice, 0.0) AS o_totalprice
      FROM customer LEFT JOIN
        (SELECT o_custkey, o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000) o
        ON c_custkey = o_custkey
      ORDER BY c_custkey, o_orderkey""")),

    QueryDef("q84_dropna", (s, dir) => {
      val j = Q.t(s, dir, "customer")
        .join(Q.t(s, dir, "orders").filter(col("o_totalprice") > 400000)
            .select("o_custkey", "o_totalprice"),
          col("c_custkey") === col("o_custkey"), "left")
      j.na.drop("any", Seq("o_totalprice"))
        .agg(count(lit(1)).as("n_kept"),
          Q.dsum(col("o_totalprice")).as("kept_sum"))
    }, Some("""SELECT COUNT(*) AS n_kept,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS kept_sum
      FROM customer LEFT JOIN
        (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 400000) o
        ON c_custkey = o_custkey
      WHERE o_totalprice IS NOT NULL""")),

    QueryDef("q85_offset", (s, dir) =>
      Q.t(s, dir, "orders").orderBy("o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(100).limit(50),
      Some("""SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey
      LIMIT 50 OFFSET 100""")),

    QueryDef("q86_width_bucket_hist", (s, dir) =>
      // cut()/histogram shape: fixed-width binning + count per bin
      Q.t(s, dir, "orders")
        .groupBy(width_bucket(col("o_totalprice"), lit(0), lit(500000), lit(10)).as("bin"))
        .agg(count(lit(1)).as("n"), Q.dsum(col("o_totalprice")).as("s"))
        .orderBy("bin"),
      Some("""SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) + 1 AS bin, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s
      FROM orders GROUP BY 1 ORDER BY bin""")),

    QueryDef("q87_entropy", (s, dir) => {
      val c = Q.t(s, dir, "events").groupBy("event_type")
        .agg(count(lit(1)).cast("double").as("c"))
        .withColumn("t", sum(col("c")).over(Window.partitionBy()))
      c.agg(round(-sum((col("c") / col("t")) * log2(col("c") / col("t"))), 6).as("entropy"),
        count(lit(1)).as("n_types"))
    }, Some("""SELECT ROUND(-SUM((c / t) * log2(c / t)), 6) AS entropy, COUNT(*) AS n_types
      FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS c,
          CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS t
        FROM events GROUP BY event_type)""")),

    QueryDef("q88_ffill", (s, dir) => {
      // null out 'view' values, forward-fill per user in time order
      val ev = Q.t(s, dir, "events")
        .withColumn("v", when(col("event_type") === "view", lit(null)).otherwise(col("value")))
      graft.operators.Fill.ffill(ev, Seq("user_id"), Seq("ts", "event_id"), Seq("v"))
        .select("event_id", "v").orderBy("event_id")
    }, Some("""SELECT event_id,
        LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
      FROM (SELECT event_id, user_id, ts,
          CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v FROM events)
      ORDER BY event_id"""),
      bench = true),

    QueryDef("q89_ema", (s, dir) => {
      v(s, dir, "events")
      // half-life 1 hour in microseconds; closed form is order-independent
      s.sql("""SELECT user_id,
          ROUND(exponentialMovingAverage(value, CAST(unix_micros(ts) AS DOUBLE), 3.6e9), 6) AS ema
        FROM events GROUP BY user_id ORDER BY user_id""")
    }, Some("""SELECT user_id, ROUND(SUM(value * POW(2, (tt - mt) / 3.6e9))
          / SUM(POW(2, (tt - mt) / 3.6e9)), 6) AS ema
      FROM (SELECT user_id, value, CAST(epoch_us(ts) AS DOUBLE) AS tt,
          CAST(MAX(epoch_us(ts)) OVER (PARTITION BY user_id) AS DOUBLE) AS mt
        FROM events)
      GROUP BY user_id ORDER BY user_id""")),

    // ===== multimodal + streaming-shape operators (brief extensions) =====

    QueryDef("q90_multimodal_decode", (s, dir) => {
      // image leg: documents' text bytes stand in for image payloads (the
      // deterministic fallback path); audio leg: per-doc synthesized WAV
      // driven through the REAL javax.sound.sampled decode (r7).
      // r14: promoted to a DIRECT oracle via two devices — (1) the image
      // fallback's bytesHash (FNV-1a + splitmix-style finalizer) replays in
      // DuckDB with q75's HUGEINT mod-2^64 arithmetic; (2) the audio
      // fixture switched from sineWav to lcgWav (integer PCM), making the
      // decoder's RMS/ZCR exact dyadic arithmetic both engines reproduce
      // bit-for-bit (libm sin was the only non-replayable step).
      val media = graft.operators.Multimodal.withMedia(
        Q.t(s, dir, "documents").select(col("doc_id"), col("text").cast("binary").as("content")),
        "content", "image", "jpeg", width = 640, height = 480)
      val image = graft.operators.Multimodal.decodeImageFeatures(media, "content", batchSize = 64)
        .select(col("doc_id"), col("media_meta.size_bytes").as("size_bytes"),
          col("image_features.phash").as("phash"),
          round(element_at(col("image_features.mean_rgb"), 1).cast("double"), 6).as("mean_r"))
      val ids = Q.t(s, dir, "documents").select(col("doc_id"))
      val wavSchema = org.apache.spark.sql.types.StructType(ids.schema.fields :+
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType))
      val wavEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(wavSchema)
      val wavs = ids.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          org.apache.spark.sql.Row(id, graft.operators.Multimodal.lcgWav(
            id, 40 + (id % 5).toInt * 10))
        }
      }(wavEnc)
      val audio = graft.operators.Multimodal.decodeAudioFeatures(wavs, "content", batchSize = 64)
        .select(col("doc_id"),
          col("audio_features.sample_rate").as("sample_rate"),
          col("audio_features.duration_ms").as("audio_ms"),
          round(col("audio_features.rms"), 6).as("rms"),
          round(col("audio_features.zero_crossing_rate"), 6).as("zcr"))
      image.join(audio, "doc_id").orderBy("doc_id")
    }, Some("""WITH docs AS (SELECT doc_id, text FROM documents),
      -- image fallback features: FNV-1a over the UTF-8 bytes (ASCII corpus:
      -- = codepoints) + the splitmix-style finalizer, mod-2^64 in HUGEINT
      -- (q75's device; 64x64 multiplies split hi/lo 32-bit)
      fnv AS (SELECT doc_id,
          list_reduce(
            list_prepend(CAST(14695981039346656037 AS HUGEINT),
              list_transform(split(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
            (h, c) -> (xor(h, c) * CAST(1099511628211 AS HUGEINT))
                      % CAST(18446744073709551616 AS HUGEINT)) AS x
        FROM docs),
      m1 AS (SELECT doc_id, xor(x, x >> 30) AS x FROM fnv),
      m2 AS (SELECT doc_id,
        ((x % 4294967296) * CAST(13787848793156543929 AS HUGEINT)
         + (((x >> 32) * 484763065) % 4294967296) * 4294967296)
        % CAST(18446744073709551616 AS HUGEINT) AS x FROM m1),
      m3 AS (SELECT doc_id, xor(x, x >> 27) AS x FROM m2),
      m4 AS (SELECT doc_id,
        ((x % 4294967296) * CAST(10723151780598845931 AS HUGEINT)
         + (((x >> 32) * 321982955) % 4294967296) * 4294967296)
        % CAST(18446744073709551616 AS HUGEINT) AS x FROM m3),
      ph AS (SELECT doc_id, xor(x, x >> 31) AS h FROM m4),
      img AS (SELECT d.doc_id,
          octet_length(encode(d.text)) AS size_bytes,
          CAST(CASE WHEN p.h >= CAST(9223372036854775808 AS HUGEINT)
            THEN p.h - CAST(18446744073709551616 AS HUGEINT) ELSE p.h END AS BIGINT) AS phash,
          ROUND(CAST(CAST(CAST(p.h % 65536 AS INTEGER) AS REAL)
            / CAST(65535 AS REAL) AS DOUBLE), 6) AS mean_r
        FROM docs d JOIN ph p USING (doc_id)),
      -- audio: replay the integer-PCM synth (lcgWav) sample by sample;
      -- every v = k/32768 is an exact dyadic and sum(v^2) < 2^10 with
      -- 30 fractional bits -> exact in ANY summation order
      au AS (SELECT doc_id, 320 + (doc_id % 5) * 80 AS n FROM documents),
      sm AS (SELECT doc_id, n, UNNEST(range(0, n)) AS i FROM au),
      kv AS (SELECT doc_id, n, i,
          ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS k FROM sm),
      lg AS (SELECT doc_id, n, i, k,
          LAG(k) OVER (PARTITION BY doc_id ORDER BY i) AS pk FROM kv),
      aagg AS (SELECT doc_id, MAX(n) AS n,
          SUM((k / 32768.0) * (k / 32768.0)) AS ss,
          SUM(CASE WHEN pk IS NOT NULL AND ((pk < 0) <> (k < 0))
              THEN 1 ELSE 0 END) AS cr
        FROM lg GROUP BY doc_id)
      SELECT i.doc_id, i.size_bytes, i.phash, i.mean_r,
        CAST(8000 AS INT) AS sample_rate,
        CAST(a.n / 8 AS BIGINT) AS audio_ms,
        ROUND(sqrt(a.ss / a.n), 6) AS rms,
        ROUND(CAST(a.cr AS DOUBLE) / a.n, 6) AS zcr
      FROM img i JOIN aagg a USING (doc_id) ORDER BY i.doc_id""")),

    QueryDef("q91_stream_window_batch", (s, dir) =>
      // Structured-Streaming windowed aggregation run on the bounded frame —
      // identical plan to the readStream path (EventStreams.windowedCounts)
      graft.streaming.EventStreams.windowedCounts(
          Q.t(s, dir, "events"), "1 hour", "1 minute")
        .select(col("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS w_start, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"""),
      bench = true),

    QueryDef("q139_stream_join", (s, dir) => {
      // Stream-stream inner join shape (EventStreams.streamJoin) on the
      // bounded frame — watermarks no-op in batch but the range-bounded
      // join predicate is exactly what keeps state finite on the real
      // stream (StreamingSpec drives the same operator through
      // readStream). Views join clicks of the same user within 1 h.
      val ev = Q.t(s, dir, "events")
      graft.streaming.EventStreams.streamJoin(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "click"),
          "user_id", watermark = "1 minute", rangeSeconds = 3600)
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("event_id") + col("r_event_id")).as("id_sum"))
    }, Some("""SELECT COUNT(*) AS n_pairs, COUNT(DISTINCT v.user_id) AS n_users,
        CAST(SUM(v.event_id + c.event_id) AS BIGINT) AS id_sum
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON v.user_id = c.user_id
        AND epoch_us(c.ts) >= epoch_us(v.ts)
        AND epoch_us(c.ts) - epoch_us(v.ts) <= 3600000000""")),

    QueryDef("q140_sql_dedup_surface", (s, dir) => {
      // the pipeline tier through the SQL surface (r10 verdict "missing"
      // #1): dedup_exact as a FROM-position table function, rewritten by
      // GraftSession into the same operator plan q61 proves — so a SQL
      // user reaches the dedup tier without importing graft.operators
      v(s, dir, "documents")
      val gs = graft.engine.GraftSession(s)
      gs.createView("docs_k40",
        "SELECT doc_id, lang, substr(text, 1, 40) AS key FROM documents")
      gs.sql("""SELECT doc_id, lang
        FROM dedup_exact(docs_k40, 'key', 'doc_id') ORDER BY doc_id""")
    }, Some("""SELECT doc_id, lang FROM (SELECT doc_id, lang,
        ROW_NUMBER() OVER (PARTITION BY md5(substr(text, 1, 40)) ORDER BY doc_id) AS rn
      FROM documents) WHERE rn = 1 ORDER BY doc_id""")),

    QueryDef("q141_sql_split_surface", (s, dir) => {
      // hash_split through the SQL table-function surface (q120's operator
      // and oracle, reached from SQL)
      v(s, dir, "documents")
      graft.engine.GraftSession(s).sql(
        """SELECT split, COUNT(*) AS n, SUM(doc_id) AS id_sum
          FROM hash_split(documents, 'doc_id', 0.1, 0.1)
          GROUP BY split ORDER BY split""")
    }, Some("""WITH b AS (SELECT doc_id,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            % 10000 AS bk
        FROM documents)
        SELECT CASE WHEN bk < 1000 THEN 'val' WHEN bk < 2000 THEN 'test'
                    ELSE 'train' END AS split,
          COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM b GROUP BY 1 ORDER BY split""")),

    QueryDef("q144_domain_cap", (s, dir) => {
      // per-domain cap (RefinedWeb/C4-style host caps): keep the 10 longest
      // documents per source, deterministic tie-break on doc_id (10 < the
      // 25-docs-per-source sf0.01 fixture, so the cap BINDS at the driver
      // gate). ONE group-keyed window shuffle (Curation.capPerGroup)
      graft.operators.Curation.capPerGroup(
          Q.t(s, dir, "documents"), "source", "doc_id", 10,
          col("n_chars").desc) // .desc = NULLS LAST, same as DuckDB DESC
        .select("doc_id", "source", "n_chars").orderBy("doc_id")
    }, Some("""SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents) WHERE rn <= 10 ORDER BY doc_id"""),
      bench = true),

    QueryDef("q145_group_sample", (s, dir) => {
      // deterministic uniform 20-per-source sample by md5 id-hash, through
      // the SQL table-function surface (same portable hash as hash_split,
      // so DuckDB replays the kept set bit-for-bit)
      v(s, dir, "documents")
      graft.engine.GraftSession(s).sql(
        """SELECT doc_id, source
          FROM sample_per_group(documents, 'source', 'doc_id', 20)
          ORDER BY doc_id""")
    }, Some("""SELECT doc_id, source FROM (
        SELECT doc_id, source,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents) WHERE rn <= 20 ORDER BY doc_id""")),

    QueryDef("q146_semdedup", (s, dir) => {
      // SemDeDup (Abbas et al. 2023): cluster-scoped embedding dedup —
      // deterministic 8-cell Lloyd quantizer (q134's), then within-cell
      // pairwise cosine with the smaller-id-ε-neighbor drop rule. Planted
      // scaled copies (q65's device) make the rule BIND: each copy lands in
      // its original's cell (direction-preserving) and must be dropped.
      // DuckDB replays quantizer + assignment + drop rule end to end.
      val e = Q.t(s, dir, "embeddings").select("vec_id", "embedding")
      val planted = e.filter(col("vec_id") < 20).select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
      graft.operators.Dedup.semDedup(
          e.unionByName(planted), "embedding", "vec_id",
          tau = 0.95, kCells = 8, iters = 2)
        .orderBy("id")
    }, Some(semDedupOracle8x2), bench = true),

    QueryDef("q183_semdedup_auto", (s, dir) => {
      // BENCH-ONLY (r15 verdict #5): SemDeDup at its PRODUCTION
      // parameterization — kCells = 0 → auto ≈ √n cells (resolveCells),
      // the shape users actually run and the one whose pair work scales
      // ~n^1.5 instead of q146's oracle-pinned kCells=8 (~n²/8 by
      // construction — a fixture artifact that was the most expensive
      // bench query). Same planted copies so the ε-rule still binds;
      // correctness of the kernel is q146/q149's oracle, this entry only
      // puts the auto shape on the per-round record.
      val e = Q.t(s, dir, "embeddings").select("vec_id", "embedding")
      val planted = e.filter(col("vec_id") < 20).select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
      graft.operators.Dedup.semDedup(
          e.unionByName(planted), "embedding", "vec_id",
          tau = 0.95, kCells = 0, iters = 2)
        .orderBy("id")
    }, None, bench = true, benchOnly = true),

    QueryDef("q149_semdedup_paper", (s, dir) => {
      // the PAPER's keep rule (SemDeDup §2.2: per ε-ball keep the example
      // LEAST similar to its cluster centroid — the least-prototypical
      // representative); drop order (centroid_sim asc, id) replayed by
      // DuckDB end to end. Same planted copies as q146 — the kept set may
      // legitimately differ from q146's (different representative), but
      // its SIZE matches: one survivor per ε-ball.
      val e = Q.t(s, dir, "embeddings").select("vec_id", "embedding")
      val planted = e.filter(col("vec_id") < 20).select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
      graft.operators.Dedup.semDedup(
          e.unionByName(planted), "embedding", "vec_id",
          tau = 0.95, kCells = 8, iters = 2, keep = "centroidFar")
        .orderBy("id")
    }, Some(semDedupPaperOracle8x2)),

    QueryDef("q147_token_budget", (s, dir) => {
      // budgeted mixture: at most 2000 chars of each source, drawn in
      // deterministic md5-id-hash order (running-sum window, one
      // group-keyed shuffle) — Curation.tokenBudgetPerGroup
      graft.operators.Curation.tokenBudgetPerGroup(
          Q.t(s, dir, "documents"), "source", "doc_id", "n_chars", 2000L)
        .select("doc_id", "source", "n_chars").orderBy("doc_id")
    }, Some("""SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars,
          SUM(n_chars) OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM documents) WHERE cum <= 2000 ORDER BY doc_id"""),
      bench = true),

    QueryDef("q148_top_fraction", (s, dir) => {
      // adaptive per-domain filter: longest 40% of each source
      // (cume_dist over a total order — deterministic; one group-keyed
      // window shuffle) — Curation.topFractionPerGroup
      graft.operators.Curation.topFractionPerGroup(
          Q.t(s, dir, "documents"), "source", "doc_id", 0.4,
          col("n_chars").desc)
        .select("doc_id", "source", "n_chars").orderBy("doc_id")
    }, Some("""SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars,
          CUME_DIST() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id) AS cd
        FROM documents) WHERE cd <= 0.4 ORDER BY doc_id""")),

    QueryDef("q93_rank_corr", (s, dir) => {
      // Spearman rank correlation (reference AGGREGATE rank_corr): Pearson
      // corr over per-group ranks — two windows + one aggregate, no collect
      val wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
      val wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
      Q.t(s, dir, "lineitem")
        .withColumn("rq", rank().over(wq).cast("double"))
        .withColumn("rp", rank().over(wp).cast("double"))
        .groupBy("l_returnflag")
        .agg(round(corr(col("rq"), col("rp")), 6).as("rank_corr"))
        .orderBy("l_returnflag")
    }, Some("""SELECT l_returnflag, ROUND(CORR(rq, rp), 6) AS rank_corr FROM
        (SELECT l_returnflag,
          CAST(RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS DOUBLE) AS rq,
          CAST(RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS DOUBLE) AS rp
        FROM lineitem)
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef("q94_skew_kurt", (s, dir) =>
      // Spark skewness/kurtosis are population moments (m3/m2^1.5,
      // m4/m2²−3); DuckDB's are sample-adjusted, so the oracle computes the
      // population moments explicitly
      Q.t(s, dir, "lineitem").groupBy("l_returnflag").agg(
          round(skewness(col("l_quantity")), 6).as("sk"),
          round(kurtosis(col("l_quantity")), 6).as("ku"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        ROUND(AVG(POW(l_quantity - m, 3)) / POW(AVG(POW(l_quantity - m, 2)), 1.5), 6) AS sk,
        ROUND(AVG(POW(l_quantity - m, 4)) / POW(AVG(POW(l_quantity - m, 2)), 2) - 3, 6) AS ku
      FROM lineitem JOIN
        (SELECT l_returnflag AS rf, AVG(l_quantity) AS m FROM lineitem GROUP BY 1) s
        ON l_returnflag = rf
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef("q100_ttests", (s, dir) => {
      v(s, dir, "lineitem")
      // statistics + dof are moment compositions — deterministic here because
      // l_quantity is integer-valued (every Σx, Σx² is exact in double);
      // p-values (commons-math3 t CDF) are spec-tested, not oracle-checkable
      s.sql("""SELECT l_linestatus,
          ROUND(st.t_statistic, 6) AS t_student, ROUND(st.dof, 6) AS dof_student,
          ROUND(wt.t_statistic, 6) AS t_welch, ROUND(wt.dof, 6) AS dof_welch
        FROM (SELECT l_linestatus,
            studentTTest(l_quantity, IF(l_returnflag = 'A', 0, 1)) AS st,
            welchTTest(l_quantity, IF(l_returnflag = 'A', 0, 1)) AS wt
          FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY l_linestatus)
        ORDER BY l_linestatus""")
    }, Some("""WITH m AS (SELECT l_linestatus,
          COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS n0,
          COUNT(CASE WHEN l_returnflag <> 'A' THEN 1 END) AS n1,
          SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END) AS s0,
          SUM(CASE WHEN l_returnflag <> 'A' THEN l_quantity ELSE 0 END) AS s1,
          SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity * l_quantity ELSE 0 END) AS q0,
          SUM(CASE WHEN l_returnflag <> 'A' THEN l_quantity * l_quantity ELSE 0 END) AS q1
        FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY l_linestatus),
      d AS (SELECT l_linestatus, n0, n1, s0 / n0 AS m0, s1 / n1 AS m1,
          (q0 - n0 * (s0 / n0) * (s0 / n0)) / (n0 - 1) AS v0,
          (q1 - n1 * (s1 / n1) * (s1 / n1)) / (n1 - 1) AS v1
        FROM m)
      SELECT l_linestatus,
        ROUND((m0 - m1) / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2) * (1.0 / n0 + 1.0 / n1)), 6) AS t_student,
        ROUND(CAST(n0 + n1 - 2 AS DOUBLE), 6) AS dof_student,
        ROUND((m0 - m1) / sqrt(v0 / n0 + v1 / n1), 6) AS t_welch,
        ROUND((v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1) /
          ((v0 / n0) * (v0 / n0) / (n0 - 1) + (v1 / n1) * (v1 / n1) / (n1 - 1)), 6) AS dof_welch
      FROM d ORDER BY l_linestatus""")),

    QueryDef("q101_rank_tests", (s, dir) => {
      v(s, dir, "lineitem")
      // U is a sum of average ranks (half-integers — exact in double); KS D is
      // a max of exact-count ratios: both bit-reproducible cross-engine
      s.sql("""SELECT l_linestatus,
          ROUND(mw.u_statistic, 4) AS u_stat, ROUND(ks.d_statistic, 6) AS d_stat
        FROM (SELECT l_linestatus,
            mannWhitneyUTest(l_quantity, IF(l_returnflag = 'A', 0, 1)) AS mw,
            kolmogorovSmirnovTest(l_quantity, IF(l_returnflag = 'A', 0, 1)) AS ks
          FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY l_linestatus)
        ORDER BY l_linestatus""")
    }, Some("""WITH x AS (SELECT l_linestatus AS g, l_quantity AS v,
          CASE WHEN l_returnflag = 'A' THEN 0 ELSE 1 END AS idx
        FROM lineitem WHERE l_returnflag IN ('A', 'R')),
      r AS (SELECT g, idx, v,
          RANK() OVER (PARTITION BY g ORDER BY v) + (COUNT(*) OVER (PARTITION BY g, v) - 1) / 2.0 AS ar
        FROM x),
      u AS (SELECT g, SUM(CASE WHEN idx = 0 THEN ar END)
          - COUNT(CASE WHEN idx = 0 THEN 1 END) * (COUNT(CASE WHEN idx = 0 THEN 1 END) + 1) / 2.0 AS u0
        FROM r GROUP BY g),
      cnt AS (SELECT g, COUNT(CASE WHEN idx = 0 THEN 1 END) AS n0,
          COUNT(CASE WHEN idx = 1 THEN 1 END) AS n1 FROM x GROUP BY g),
      cum AS (SELECT g, v, SUM(CASE WHEN idx = 0 THEN 1 ELSE 0 END) AS c0,
          SUM(CASE WHEN idx = 1 THEN 1 ELSE 0 END) AS c1 FROM x GROUP BY g, v),
      fd AS (SELECT g, MAX(ABS(CAST(cc0 AS DOUBLE) / n0 - CAST(cc1 AS DOUBLE) / n1)) AS d FROM (
          SELECT cum.g AS g, SUM(c0) OVER (PARTITION BY cum.g ORDER BY v) AS cc0,
            SUM(c1) OVER (PARTITION BY cum.g ORDER BY v) AS cc1, n0, n1
          FROM cum JOIN cnt ON cum.g = cnt.g) GROUP BY g)
      SELECT u.g AS l_linestatus, ROUND(u.u0, 4) AS u_stat, ROUND(fd.d, 6) AS d_stat
      FROM u JOIN fd ON u.g = fd.g ORDER BY l_linestatus""")),

    QueryDef("q102_moving_arrays", (s, dir) => {
      v(s, dir, "lineitem")
      // deterministic scalar moving-window forms over an ordered array; the
      // oracle uses the closed forms of windowed sums over 1..n. Arrays are
      // exploded to scalar rows — the driver's pandas compare cannot sort or
      // hash list cells (round-4 q102 error: "unhashable type: numpy.ndarray")
      s.sql("""SELECT l_orderkey, l_linenumber, pos + 1 AS i, z.ms AS ms_v, z.ma AS ma_v
        FROM (SELECT l_orderkey, l_linenumber,
            arrayMovingSum(sequence(1, l_linenumber), 3) AS ms,
            arrayMovingAvg(sequence(1, l_linenumber), 2) AS ma
          FROM lineitem WHERE l_orderkey < 300)
        LATERAL VIEW posexplode(arrays_zip(ms, ma)) AS pos, z
        ORDER BY l_orderkey, l_linenumber, i""")
    }, Some("""SELECT l_orderkey, l_linenumber, i,
        CAST(CASE WHEN i < 3 THEN i * (i + 1) / 2 ELSE 3 * i - 3 END AS DOUBLE) AS ms_v,
        CAST(CASE WHEN i = 1 THEN 1.0 ELSE (2 * i - 1) / 2.0 END AS DOUBLE) AS ma_v
      FROM (SELECT l_orderkey, l_linenumber,
          UNNEST(range(1, CAST(l_linenumber AS BIGINT) + 1)) AS i
        FROM lineitem WHERE l_orderkey < 300)
      ORDER BY l_orderkey, l_linenumber, i""")),

    QueryDef("q103_curation", (s, dir) =>
      // flagship composed pipeline: quality floor + language filter + exact
      // keep-first dedup in ONE plan (operators/Curation.scala), routed
      // through the PUBLIC frame surface (GraftFrame.curate — r10 verdict
      // "missing" #1); the oracle assembles the proven q70/q71/q61 replicas
      graft.ds.GraftFrame(Q.t(s, dir, "documents"))
        .curate("text", "doc_id", languages = Seq("en"), minQuality = 0.3).df
        .select(col("doc_id"), col("pred_lang"),
          round(col("quality_score"), 6).as("quality_score"))
        .orderBy("doc_id"),
      Some("""WITH f AS (SELECT doc_id, text, length(text) AS nc,
          list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '') AS toks,
          CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
            / CAST(greatest(length(text), 1) AS DOUBLE) AS punct
        FROM documents),
      r AS (SELECT doc_id, text, len(toks) AS nt, punct,
          CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x))) AS DOUBLE)
            / CAST(greatest(len(toks), 1) AS DOUBLE) AS stop,
          1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS rep,
          CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein','eine','zu','den','von'], x))) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS s_de,
          CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x))) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS s_en,
          CAST(len(list_filter(toks, x -> list_contains(['el','la','los','de','y','un','una','es','que','por'], x))) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS s_es,
          CAST(len(list_filter(toks, x -> list_contains(['le','la','les','de','et','un','une','est','que','pour'], x))) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS s_fr,
          CAST(len(list_filter(toks, x -> list_contains(['de','shi','le','bu','wo','ni','ta','men','zai','you'], x))) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS s_zh
        FROM f),
      q AS (SELECT doc_id, text,
          least(1.0, greatest(0.0, 0.3 * least(CAST(nt AS DOUBLE) / 100.0, 1.0)
            + 0.3 * (1.0 - rep) + 0.2 * least(stop * 5.0, 1.0) + 0.2 * (1.0 - punct))) AS qs,
          greatest(s_de, s_en, s_es, s_fr, s_zh) AS m, s_de, s_en, s_es, s_fr, s_zh
        FROM r),
      l AS (SELECT doc_id, text, qs,
          CASE WHEN m < 0.02 THEN 'und' WHEN s_zh = m THEN 'zh' WHEN s_fr = m THEN 'fr'
            WHEN s_es = m THEN 'es' WHEN s_en = m THEN 'en' ELSE 'de' END AS pred
        FROM q),
      flt AS (SELECT * FROM l WHERE pred IN ('en') AND qs >= 0.3),
      d AS (SELECT doc_id, pred AS pred_lang, qs,
          ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM flt)
      SELECT doc_id, pred_lang, ROUND(qs, 6) AS quality_score
      FROM d WHERE rn = 1 ORDER BY doc_id"""),
      bench = true),

    QueryDef("q104_winnow_fp", (s, dir) => {
      // winnowing document fingerprints, md5-portable selection (the custom
      // rolling-hash form is q75; this variant's window minima reproduce in
      // DuckDB, closing fingerprinting's oracle gap): per doc, the distinct
      // set of per-window (w=4) minima over character 8-gram md5 hashes
      Q.t(s, dir, "documents")
        .filter(length(col("text")) >= 11)
        .select(col("doc_id"),
          explode(TextAnalysis.winnowMd5(col("text"), 8, 4)).as("fp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nfp"), min("fp").as("fp_lo"), max("fp").as("fp_hi"))
        .orderBy("doc_id")
    }, Some("""WITH g AS (SELECT doc_id, i, md5(substr(text, CAST(i AS INT), 8)) AS h
        FROM (SELECT doc_id, text, UNNEST(range(1, length(text) - 6)) AS i
              FROM documents WHERE length(text) >= 11)),
      w AS (SELECT doc_id, i, MIN(h) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
            MAX(i) OVER (PARTITION BY doc_id) AS mx FROM g),
      f AS (SELECT DISTINCT doc_id, fp FROM w WHERE i <= mx - 3)
      SELECT doc_id, COUNT(*) AS nfp, MIN(fp) AS fp_lo, MAX(fp) AS fp_hi
      FROM f GROUP BY doc_id ORDER BY doc_id""")),

    QueryDef("q105_dedup_clusters", (s, dir) =>
      // duplicate CLUSTERS: connected components over the exact-Jaccard pair
      // graph (operators/Dedup.connectedComponents), so A≈B≈C collapses to
      // one cluster even when (A, C) was never a pair. Oracle: transitive
      // closure by recursive CTE over the same q62-proven pair set.
      Dedup.connectedComponents(
          Dedup.ngramJaccard(Q.t(s, dir, "documents"), "text", "doc_id",
            threshold = 0.2, shingleSize = 5, maxDocFreq = 1000000))
        .orderBy("id"),
      Some("""WITH RECURSIVE toks AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '') AS t
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
          ELSE list_transform(range(1, len(t) - 3), i -> array_to_string(t[i:i+4], ' ')) END) AS s
        FROM toks),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.2),
      e AS (SELECT id_a AS s, id_b AS d FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      r AS (SELECT s AS node, d AS reach FROM e
        UNION SELECT r.node, e.d FROM r JOIN e ON r.reach = e.s)
      SELECT node AS id, LEAST(node, MIN(reach)) AS cluster FROM r
      GROUP BY node ORDER BY id""")),

    QueryDef("q106_simhash_portable", (s, dir) => {
      v(s, dir, "documents")
      // simhash with md5-portable token hashes (the custom Mix64 form is
      // q64; this variant's 60-bit per-token hashes reproduce in DuckDB,
      // closing simhash's oracle gap the way q104 did for winnowing).
      // The all-pairs self-join is the ORACLE-SCOPE device (bounded fixture);
      // the 100 TB path is q64's combinatorial multi-index buckets:
      // lowercase token MULTISET (occurrences weight the bit votes — the
      // classic Charikar form; distinct-set voting measured ~40x less
      // selective on shared-vocabulary corpora) → md5[0:15] token hash →
      // near-dup pairs at Hamming distance ≤ 4
      s.sql("""WITH th AS (
          SELECT doc_id,
            CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT) AS h
          FROM (SELECT doc_id,
                  explode(filter(split(lower(text), '[^a-z0-9]+'),
                                 t -> length(t) > 0)) AS tok
                FROM documents)
        ), bits AS (
          SELECT doc_id, b,
            SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS w
          FROM th LATERAL VIEW explode(sequence(0, 59)) AS b
          GROUP BY doc_id, b
        ), sh AS (
          SELECT doc_id,
            SUM(CASE WHEN w > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE 0 END) AS s
          FROM bits GROUP BY doc_id
        )
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(bit_count(a.s ^ b.s) AS INT) AS dist
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(a.s ^ b.s) <= 4
        ORDER BY a_id, b_id""")
    }, Some("""WITH th AS (
        SELECT doc_id,
          CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id, UNNEST(list_filter(
                regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                t -> t <> '')) AS tok
              FROM documents)
      ), bits AS (
        SELECT doc_id, b,
          SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS w
        FROM th CROSS JOIN (SELECT UNNEST(range(0, 60)) AS b) bb
        GROUP BY doc_id, b
      ), sh AS (
        SELECT doc_id,
          SUM(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS s
      FROM bits GROUP BY doc_id
      )
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        CAST(bit_count(xor(a.s, b.s)) AS INT) AS dist
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.s, b.s)) <= 4
      ORDER BY a_id, b_id""")),

    QueryDef("q107_audio_decode_oracle", (s, dir) => {
      // the REAL audio decode path (javax.sound.sampled), oracle-gated:
      // per-doc WAVs are synthesized with doc_id-derived duration, so the
      // decoder's sample_rate / channels / duration_ms outputs are
      // independently recomputable by DuckDB from doc_id alone — the audio
      // analogue of q104's portable fingerprints (q90 keeps the rows-only
      // full feature set incl. RMS/ZCR)
      val ids = Q.t(s, dir, "documents").select(col("doc_id"))
      val wavSchema = org.apache.spark.sql.types.StructType(ids.schema.fields :+
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType))
      val wavEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(wavSchema)
      val wavs = ids.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          org.apache.spark.sql.Row(id, graft.operators.Multimodal.sineWav(
            200.0 + (id % 20) * 40.0, 40 + (id % 5).toInt * 10))
        }
      }(wavEnc)
      graft.operators.Multimodal.decodeAudioFeatures(wavs, "content", batchSize = 64)
        .select(col("doc_id"),
          col("audio_features.sample_rate").as("sample_rate"),
          col("audio_features.channels").as("channels"),
          col("audio_features.duration_ms").as("audio_ms"))
        .orderBy("doc_id")
    }, Some("""SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
        CAST(1 AS INT) AS channels,
        CAST(40 + (doc_id % 5) * 10 AS BIGINT) AS audio_ms
      FROM documents ORDER BY doc_id""")),

    QueryDef("q108_video_meta_oracle", (s, dir) => {
      // the REAL AVI header parse, oracle-gated like q107: per-doc synthetic
      // RIFF/avih headers carry doc_id-derived frame counts and dimensions,
      // so the parser's outputs are recomputable by DuckDB from doc_id alone
      val ids = Q.t(s, dir, "documents").select(col("doc_id"))
      val aviSchema = org.apache.spark.sql.types.StructType(ids.schema.fields :+
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType))
      val aviEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(aviSchema)
      val avis = ids.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          org.apache.spark.sql.Row(id, graft.operators.Multimodal.synthAvi(
            totalFrames = 100 + id % 50, usPerFrame = 40000,
            width = 320 + (id % 4).toInt * 160, height = 240 + (id % 4).toInt * 120))
        }
      }(aviEnc)
      graft.operators.Multimodal.decodeVideoMeta(avis, "content", batchSize = 64)
        .select(col("doc_id"),
          col("video_meta.container").as("container"),
          col("video_meta.width").as("w"),
          col("video_meta.height").as("h"),
          col("video_meta.duration_ms").as("dur_ms"),
          col("video_meta.total_frames").as("frames"))
        .orderBy("doc_id")
    }, Some("""SELECT doc_id, 'avi' AS container,
        CAST(320 + (doc_id % 4) * 160 AS INT) AS w,
        CAST(240 + (doc_id % 4) * 120 AS INT) AS h,
        (100 + doc_id % 50) * 40 AS dur_ms,
        100 + doc_id % 50 AS frames
      FROM documents ORDER BY doc_id""")),

    QueryDef("q109_image_decode_oracle", (s, dir) => {
      // the REAL ImageIO decode path, oracle-gated (r7 verdict #5): per-doc
      // PNGs are encoded in-JDK with doc_id-derived dimensions and a solid
      // doc_id-derived fill, so the decoder's width/height and mean-RGB
      // outputs (solid fill → mean = fill exactly) are recomputable by
      // DuckDB from doc_id alone. The phash stays out of the oracle: cell
      // means of a solid image tie with the global average, and >= on
      // 1-ulp-apart doubles is not cross-engine-stable (q90 keeps the full
      // feature set as the rows-only run).
      val ids = Q.t(s, dir, "documents").select(col("doc_id"))
        .orderBy("doc_id").limit(500)
      val pngSchema = org.apache.spark.sql.types.StructType(ids.schema.fields :+
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType))
      val pngEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(pngSchema)
      val pngs = ids.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          org.apache.spark.sql.Row(id, graft.operators.Multimodal.synthPng(
            width = 16 + (id % 8).toInt * 16, height = 16 + (id % 6).toInt * 16,
            r = (id % 8).toInt * 30, g = (id % 5).toInt * 50, b = (id % 3).toInt * 100))
        }
      }(pngEnc)
      graft.operators.Multimodal.decodeImageFeatures(pngs, "content", batchSize = 64)
        .select(col("doc_id"),
          col("image_features.width").as("w"),
          col("image_features.height").as("h"),
          round(element_at(col("image_features.mean_rgb"), 1) * 255).cast("int").as("mean_r"),
          round(element_at(col("image_features.mean_rgb"), 2) * 255).cast("int").as("mean_g"),
          round(element_at(col("image_features.mean_rgb"), 3) * 255).cast("int").as("mean_b"))
        .orderBy("doc_id")
    }, Some("""SELECT doc_id,
        CAST(16 + (doc_id % 8) * 16 AS INT) AS w,
        CAST(16 + (doc_id % 6) * 16 AS INT) AS h,
        CAST((doc_id % 8) * 30 AS INT) AS mean_r,
        CAST((doc_id % 5) * 50 AS INT) AS mean_g,
        CAST((doc_id % 3) * 100 AS INT) AS mean_b
      FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 500)
      ORDER BY doc_id""")),

    QueryDef("q110_delta_scan", (s, dir) => {
      // Native Delta Lake reader end-to-end (r7 verdict: lakehouse reads
      // were the "most user-visible gap", blocked only by the connector jar
      // the container can't have). The query builds a REAL multi-commit,
      // partitioned Delta table from nation via the spec-conformant writer,
      // then reads it back through the from-scratch log replay
      // (io/DeltaNative.scala) — partition values come from the log, not
      // the data files. Content equals nation exactly, so DuckDB re-derives
      // the expected output from the plain parquet fixture.
      val nation = Q.t(s, dir, "nation")
      val path = s"/tmp/graft_delta_${new java.io.File(dir).getName}/nation"
      graft.io.DeltaNative.write(nation.filter(col("n_nationkey") < 10), path,
        partitionBy = Seq("n_regionkey"), mode = "overwrite")
      graft.io.DeltaNative.write(nation.filter(col("n_nationkey") >= 10), path,
        partitionBy = Seq("n_regionkey"), mode = "append")
      graft.io.Sources.deltaLake(s, path)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }, Some("""SELECT n_nationkey, n_name, n_regionkey
      FROM nation ORDER BY n_nationkey""")),

    QueryDef("q111_hudi_scan", (s, dir) => {
      // Native Hudi CoW reader end-to-end (io/HudiNative.scala): build a
      // real two-commit partitioned CoW table from region + nation-like
      // slices of nation, then snapshot-read it back through the timeline
      // replay. Latest-file-slice selection and replacecommit handling are
      // spec-tested; here the DRIVER-checked path proves the read returns
      // exactly the committed rows.
      val nation = Q.t(s, dir, "nation")
      val path = s"/tmp/graft_hudi_${new java.io.File(dir).getName}/nation"
      graft.io.HudiNative.write(nation.filter(col("n_nationkey") < 12), path,
        partitionBy = Seq("n_regionkey"), mode = "overwrite")
      graft.io.HudiNative.write(nation.filter(col("n_nationkey") >= 12), path,
        partitionBy = Seq("n_regionkey"), mode = "append")
      graft.io.Sources.hudi(s, path)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }, Some("""SELECT n_nationkey, n_name, n_regionkey
      FROM nation ORDER BY n_nationkey""")),

    QueryDef("q112_iceberg_scan", (s, dir) => {
      // Native Iceberg reader end-to-end (io/IcebergNative.scala): commit
      // region as a real v2 table (metadata json + Avro manifest list +
      // manifest), then read back through the metadata walk.
      val region = Q.t(s, dir, "region")
      val path = s"/tmp/graft_ice_${new java.io.File(dir).getName}/region"
      graft.io.IcebergNative.write(region.filter(col("r_regionkey") < 2), path,
        mode = "overwrite")
      graft.io.IcebergNative.write(region.filter(col("r_regionkey") >= 2), path,
        mode = "append")
      graft.io.Sources.iceberg(s, path)
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey")
    }, Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    QueryDef("q113_lakehouse_federation", (s, dir) => {
      // One SQL statement joining THREE table formats — parquet nation via
      // the dialect's file(), the native-written Delta copy of nation, and
      // the native-written Iceberg copy of region — through the table
      // functions the reference exposes (deltaLake()/iceberg()). Exercises
      // the GraftSession rewrite + both native readers inside a single
      // Catalyst plan (joins, pushdown and pruning all cross formats).
      val nation = Q.t(s, dir, "nation")
      val region = Q.t(s, dir, "region")
      val dPath = s"/tmp/graft_delta_${new java.io.File(dir).getName}/nation_fed"
      val iPath = s"/tmp/graft_ice_${new java.io.File(dir).getName}/region_fed"
      graft.io.DeltaNative.write(nation, dPath, mode = "overwrite")
      graft.io.IcebergNative.write(region, iPath, mode = "overwrite")
      val g = new graft.engine.GraftSession(s)
      g.sql(s"""SELECT r.r_name, COUNT(*) AS n_nations,
          MIN(d.n_name) AS first_nation
        FROM deltaLake('$dPath') d
        JOIN iceberg('$iPath') r ON d.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY r.r_name""")
    }, Some("""SELECT r.r_name, COUNT(*) AS n_nations,
        MIN(d.n_name) AS first_nation
      FROM nation d JOIN region r ON d.n_regionkey = r.r_regionkey
      GROUP BY r.r_name ORDER BY r.r_name""")),

    QueryDef("q114_stream_ingest_delta", (s, dir) => {
      // The full streaming-ingestion loop, driver-checked: a bounded file
      // STREAM over events (Trigger.AvailableNow) flows through
      // EventStreams.deltaSink (one atomic Delta commit per micro-batch,
      // SetTransaction-idempotent), the landed table is compacted
      // (OPTIMIZE, dataChange=false), then read back through the native
      // log replay and aggregated. Exactly-once delivery means the result
      // equals the same aggregate over the source parquet — which is the
      // DuckDB oracle.
      val sfName = new java.io.File(dir).getName
      val tbl = s"/tmp/graft_delta_$sfName/events_ingest"
      val ckpt = s"/tmp/graft_delta_$sfName/events_ingest_ckpt"
      // fresh table per run: the checkpoint is deleted, so batch ids reset
      val fs = new org.apache.hadoop.fs.Path(tbl)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(tbl), true)
      fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
      // schema EXCLUDES ts: the raw parquet carries TIMESTAMP(NANOS) which
      // only Tables.load normalizes; the ingest doesn't need it
      val cols = Q.t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value").schema
      // FileStreamSource watches a DIRECTORY; the fixture is a single file,
      // so stage it into an arrival dir (what a real ingest tree looks like)
      val arrivals = s"/tmp/graft_delta_$sfName/events_ingest_src"
      fs.delete(new org.apache.hadoop.fs.Path(arrivals), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(arrivals))
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(s"$dir/events.parquet"),
        fs, new org.apache.hadoop.fs.Path(s"$arrivals/events.parquet"),
        false, s.sessionState.newHadoopConf())
      val stream = s.readStream.schema(cols)
        .option("maxFilesPerTrigger", "1")
        .parquet(arrivals)
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          graft.io.DeltaNative.write(batch, tbl, mode = "append",
            txn = Some(("q114-ingest", batchId)))
          ()
        }.start()
      q.awaitTermination()
      graft.io.DeltaNative.optimizeCompact(s, tbl)
      graft.io.Sources.deltaLake(s, tbl)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_v"))
        .orderBy("event_type")
    }, Some("""SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v
      FROM events GROUP BY event_type ORDER BY event_type""")),

    QueryDef("q115_groupby_apply", (s, dir) => {
      // groupby.apply(lambda) escape hatch (reference lazy_ops.py:1620),
      // Spark-shaped as flatMapGroups: the per-group function computes each
      // order's price delta from the group minimum. Subtraction of exact
      // doubles is deterministic, so DuckDB recomputes it with a window.
      import org.apache.spark.sql.types._
      val orders = Q.t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      val out = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_orderpriority", StringType),
        StructField("delta", DoubleType)))
      graft.ds.GraftFrame(orders).groupby("o_orderpriority")
        .applyGroups(out) { (_, it) =>
          val rows = it.toVector
          val lo = rows.iterator.map(_.getDouble(2)).min
          rows.iterator.map(r =>
            org.apache.spark.sql.Row(r.getLong(0), r.getString(1),
              r.getDouble(2) - lo))
        }.df.orderBy("o_orderkey")
    }, Some("""SELECT o_orderkey, o_orderpriority,
        o_totalprice - MIN(o_totalprice)
          OVER (PARTITION BY o_orderpriority) AS delta
      FROM orders ORDER BY o_orderkey""")),

    QueryDef("q116_delta_skipping", (s, dir) => {
      // Delta data skipping, ORACLE-GATED INCLUDING THE SKIP COUNT: six
      // appends with disjoint o_orderkey ranges (width w = ceil(max/6))
      // produce six files whose add-action stats carry tight [min,max];
      // a range predicate straddling exactly buckets 1 and 2 must LIST
      // exactly 2 files. files_opened comes from the executed scan's
      // numFiles metric, so DuckDB's literal 2 fails the compare if
      // skipping ever regresses — not just if the row content drifts.
      val orders = Q.t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val maxKey = orders.agg(max("o_orderkey")).collect()(0).getLong(0)
      val w = (maxKey + 5) / 6
      val path = s"/tmp/graft_delta_${new java.io.File(dir).getName}/orders_skip"
      (0 until 6).foreach { b =>
        graft.io.DeltaNative.write(
          orders.filter(col("o_orderkey").between(b * w + 1, (b + 1) * w))
            .coalesce(1),
          path, mode = if (b == 0) "overwrite" else "append")
      }
      val filtered = graft.io.Sources.deltaLake(s, path)
        .filter(col("o_orderkey").between(w + 1, 3 * w))
      filtered.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case other => other.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      }
      val opened = scans(filtered.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
      filtered.agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
        .withColumn("files_opened", lit(opened))
    }, Some("""WITH m AS (SELECT CAST(CEIL(MAX(o_orderkey)/6.0) AS BIGINT) AS w
        FROM orders)
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        CAST(2 AS BIGINT) AS files_opened
      FROM orders, m WHERE o_orderkey BETWEEN w + 1 AND 3 * w""")),

    QueryDef("q117_pii_scrub", (s, dir) => {
      // PII scrubbing (the C4/Dolma curation step): detect + redact
      // emails/SSNs/phones/IPv4s with patterns valid in both Java regex
      // and RE2, so DuckDB replicates detection, counts AND the scrubbed
      // text (compared via md5) verbatim. PII is planted deterministically
      // per doc_id so every category actually fires.
      val planted = Q.t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com tel 555-867-5309 ip 10.2.3.4 ssn 123-45-6789"))
          .as("t2"))
      val counts = TextAnalysis.piiCounts(col("t2"))
        .map { case (n, c) => c.as(s"n_$n") }
      planted.select(Seq(col("doc_id")) ++ counts :+
        md5(TextAnalysis.scrubPii(col("t2")).cast("binary")).as("scrub_md5"): _*)
        .orderBy("doc_id")
    }, Some("""WITH p AS (
        SELECT doc_id,
          text || ' contact user' || CAST(doc_id AS VARCHAR) ||
            '@example.com tel 555-867-5309 ip 10.2.3.4 ssn 123-45-6789' AS t2
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
        CAST(len(regexp_extract_all(t2, '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_ssn,
        CAST(len(regexp_extract_all(t2, '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phone,
        CAST(len(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
        md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t2,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
          '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS scrub_md5
      FROM p ORDER BY doc_id""")),

    QueryDef("q118_repetition", (s, dir) => {
      // Gopher-style repetition filters (Rae et al. 2021 §A1.1): duplicate
      // sentence fraction (by count and char mass) + top token-2-gram
      // repeat count. Every feature is an exact integer/HOF composition
      // replicated term-for-term in the oracle.
      TextAnalysis.repetitionFeatures(Q.t(s, dir, "documents"), "text")
        .select(col("doc_id"),
          round(col("dup_sent_frac"), 6).as("dup_sent_frac"),
          round(col("dup_sent_char_frac"), 6).as("dup_sent_char_frac"),
          col("top_bigram_count"))
        .orderBy("doc_id")
    }, Some("""WITH f AS (
        SELECT doc_id,
          list_filter(string_split(text, '. '), x -> x <> '') AS s,
          list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '') AS toks
        FROM documents),
      g AS (
        SELECT doc_id, s, toks,
          CASE WHEN len(toks) >= 2 THEN
            list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
          ELSE [] END AS grams
        FROM f)
      SELECT doc_id,
        ROUND(CAST(len(s) - len(list_distinct(s)) AS DOUBLE)
          / CAST(greatest(len(s), 1) AS DOUBLE), 6) AS dup_sent_frac,
        ROUND(CAST(COALESCE(list_sum(list_transform(list_distinct(s),
            d -> (len(list_filter(s, x -> x = d)) - 1) * length(d))), 0) AS DOUBLE)
          / CAST(greatest(COALESCE(list_sum(list_transform(s, x -> length(x))), 0), 1)
              AS DOUBLE), 6) AS dup_sent_char_frac,
        CAST(CASE WHEN len(toks) >= 2 THEN
          list_max(list_transform(list_distinct(grams),
            x -> len(list_filter(grams, y -> y = x))))
        ELSE 0 END AS INT) AS top_bigram_count
      FROM g ORDER BY doc_id""")),

    QueryDef("q119_delta_cluster", (s, dir) => {
      // OPTIMIZE ... CLUSTER BY, oracle-gated INCLUDING both file counts:
      // six round-robin appends (o_orderkey % 6) make six files that EACH
      // span the whole key range — per-file [min,max] stats are useless and
      // a point lookup must list all 6. optimizeCluster rewrites them into
      // range-DISJOINT files; the same lookup then lists exactly 1. Both
      // counts come from executed-scan numFiles metrics, so DuckDB's
      // literals 6 and 1 fail the compare if clustering or skipping ever
      // regresses. The probe key is mid-range (largest key <= max/2) so it
      // sits inside every interleaved file's [min,max].
      val orders = Q.t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val path =
        s"/tmp/graft_delta_${new java.io.File(dir).getName}/orders_cluster"
      (0 until 6).foreach { b =>
        graft.io.DeltaNative.write(
          orders.filter(col("o_orderkey") % 6 === b).coalesce(1),
          path, mode = if (b == 0) "overwrite" else "append")
      }
      val maxKey = orders.agg(max("o_orderkey")).collect()(0).getLong(0)
      val probe = orders.filter(col("o_orderkey") * 2 <= maxKey)
        .agg(max("o_orderkey")).collect()(0).getLong(0)
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case other => other.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      }
      def listedFiles(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        scans(df.queryExecution.executedPlan)
          .map(_.metrics("numFiles").value).sum
      }
      val before = listedFiles(
        graft.io.Sources.deltaLake(s, path).filter(col("o_orderkey") === probe))
      graft.io.DeltaNative.optimizeCluster(s, path,
        clusterBy = Seq("o_orderkey"), filesPerPartition = 6)
      val clustered =
        graft.io.Sources.deltaLake(s, path).filter(col("o_orderkey") === probe)
      val after = listedFiles(clustered)
      clustered.agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
        .withColumn("files_before", lit(before))
        .withColumn("files_after", lit(after))
    }, Some("""WITH k AS (SELECT MAX(o_orderkey) AS pk FROM orders
          WHERE o_orderkey * 2 <= (SELECT MAX(o_orderkey) FROM orders))
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        CAST(6 AS BIGINT) AS files_before, CAST(1 AS BIGINT) AS files_after
      FROM orders, k WHERE o_orderkey = k.pk""")),

    QueryDef("q120_hash_split", (s, dir) =>
      // deterministic train/val/test split by md5-bucket threshold — the
      // assignment device every large corpus pipeline uses (stable under
      // reruns and corpus growth, unlike randomSplit). Pure projection, no
      // shuffle; the oracle replays the same md5 arithmetic.
      graft.operators.Curation.hashSplit(
          Q.t(s, dir, "documents"), "doc_id", valFrac = 0.1, testFrac = 0.1)
        .groupBy("split")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("split"),
      Some("""WITH b AS (SELECT doc_id,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            % 10000 AS bk
        FROM documents)
        SELECT CASE WHEN bk < 1000 THEN 'val' WHEN bk < 2000 THEN 'test'
                    ELSE 'train' END AS split,
          COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM b GROUP BY 1 ORDER BY split""")),

    QueryDef("q121_pack_sequences", (s, dir) => {
      // GPT-style concat-and-chunk sequence packing: per-shard cumulative
      // token offsets cut every 256 tokens; docs spanning a cut belong to
      // each sequence they overlap. The window is PER SHARD (md5 bucket) —
      // bounded partitions at any corpus size — and the oracle replays
      // shard, cumsum, chunk arithmetic exactly (generate_series mirrors
      // the explode(sequence(...))).
      val docs = Q.t(s, dir, "documents")
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      graft.operators.Curation.packSequences(
          docs, "doc_id", "n_tok", budget = 256, shards = 8)
        .select(col("doc_id"), col("shard"), col("seq_id"),
          col("off_start"), col("off_end"))
        .orderBy("doc_id", "seq_id")
    }, Some("""WITH d AS (SELECT doc_id,
          CAST(len(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '')) AS BIGINT) AS n_tok,
          CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS INT) AS shard
        FROM documents),
      c AS (SELECT doc_id, shard, n_tok,
          CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS e
        FROM d),
      u AS (SELECT doc_id, shard, e - n_tok AS st, e,
          UNNEST(generate_series((e - n_tok) // 256,
            greatest((e - 1) // 256, (e - n_tok) // 256))) AS seq_id
        FROM c)
      SELECT doc_id, shard, seq_id,
        CAST(greatest(st - seq_id * 256, 0) AS BIGINT) AS off_start,
        CAST(least(e - seq_id * 256, 256) AS BIGINT) AS off_end
      FROM u ORDER BY doc_id, seq_id"""), bench = true),

    QueryDef("q122_pack_greedy", (s, dir) => {
      // greedy first-fit no-split packing (docs are never cut; a new pack
      // opens on overflow). The sequential fold runs per md5-shard via
      // flatMapGroups — bounded groups, one shuffle — and the oracle
      // replays the SAME fold with a per-shard recursive CTE, so even the
      // imperative escape hatch is hash-checked row-for-row.
      val docs = Q.t(s, dir, "documents")
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      graft.operators.Curation.packGreedy(
          docs, "doc_id", "n_tok", budget = 256, shards = 8)
        .orderBy("shard", "id")
    }, Some("""WITH RECURSIVE d AS (
        SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS INT) AS shard,
          doc_id AS id,
          CAST(len(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '')) AS BIGINT) AS tokens,
          ROW_NUMBER() OVER (PARTITION BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 ORDER BY doc_id) AS rn
        FROM documents),
      g AS (
        SELECT shard, id, tokens, rn, CAST(0 AS BIGINT) AS pack_id, tokens AS acc
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.shard, d.id, d.tokens, d.rn,
          CASE WHEN g.acc + d.tokens > 256 THEN g.pack_id + 1 ELSE g.pack_id END,
          CASE WHEN g.acc + d.tokens > 256 THEN d.tokens ELSE g.acc + d.tokens END
        FROM g JOIN d ON d.shard = g.shard AND d.rn = g.rn + 1)
      SELECT shard, id, tokens, pack_id FROM g ORDER BY shard, id""")),

    QueryDef("q123_domain_mixture", (s, dir) =>
      // Pile/Dolma-style domain mixing: per-source keep rates decided by
      // the same md5 bucket as the split — deterministic, no join, no
      // shuffle before the verifying aggregate. src0 halved, src1
      // quartered, src2 dropped, the rest kept.
      graft.operators.Curation.sampleMixture(
          Q.t(s, dir, "documents"), "doc_id", "source",
          Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.0),
          buckets = 1000)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("source"),
      Some("""SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            % 1000 <
          CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 250
            WHEN 'src2' THEN 0 ELSE 1000 END
        GROUP BY source ORDER BY source""")),

    QueryDef("q124_int8_quantize", (s, dir) => {
      // int8 embedding quantization (the 4x ANN memory shrink): scale =
      // max|v|/127, codes = round(v/scale). Cosine over codes is EXACT
      // integer arithmetic until one double division (scales cancel), so
      // DuckDB replays quantization AND the quantized cosine bit-for-bit
      // alongside the float cosine it approximates.
      val qz = Q.t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          Similarity.quantizeInt8(col("embedding")).getField("q").as("q"))
      val a = qz.select(col("vec_id").as("id_a"),
        col("embedding").as("va"), col("q").as("qa"))
      val b = qz.select(col("vec_id").as("id_b"),
        col("embedding").as("vb"), col("q").as("qb"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"),
          round(Similarity.int8CosineSimilarity(col("qa"), col("qb")), 6)
            .as("cos8"),
          round(GraftFunctions.cosineSimilarity(col("va"), col("vb")), 6)
            .as("cosf"))
        .orderBy("id_a")
    }, Some("""WITH qz AS (
        SELECT vec_id, embedding,
          list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) /
            (CASE WHEN mx > 0 THEN mx / 127.0 ELSE 1.0 END)) AS BIGINT)) AS q
        FROM (SELECT vec_id, embedding,
            list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
          FROM embeddings))
      SELECT a.vec_id AS id_a,
        ROUND(CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS DOUBLE)
          / (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * a.q[i])) AS DOUBLE))
           * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> b.q[i] * b.q[i])) AS DOUBLE))), 6) AS cos8,
        ROUND(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
           * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 6) AS cosf
      FROM qz a JOIN qz b ON b.vec_id = a.vec_id + 1
      ORDER BY id_a"""), bench = true),

    QueryDef("q125_delta_incremental", (s, dir) => {
      // incremental (streaming-source-style) Delta consumption: three
      // appends of disjoint key thirds with an OPTIMIZE in between;
      // readSince(v0) must return EXACTLY the rows of appends 2+3, skip
      // the compaction commit (dataChange=false is invisible), and scan
      // only the tail's 2 files — the listed-file count is oracle-gated
      // alongside the row content.
      val orders = Q.t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val maxKey = orders.agg(max("o_orderkey")).collect()(0).getLong(0)
      val w = (maxKey + 2) / 3
      val path =
        s"/tmp/graft_delta_${new java.io.File(dir).getName}/orders_incr"
      def slice(b: Int) =
        orders.filter(col("o_orderkey").between(b * w + 1, (b + 1) * w))
          .coalesce(1)
      val v0 = graft.io.DeltaNative.write(slice(0), path, mode = "overwrite")
      graft.io.DeltaNative.write(slice(1), path, mode = "append")
      graft.io.DeltaNative.optimizeCompact(s, path) // dataChange=false: invisible
      graft.io.DeltaNative.write(slice(2), path, mode = "append")
      val inc = graft.io.DeltaNative.readSince(s, path, v0)
      inc.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case other => other.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      }
      val listed = scans(inc.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
      inc.agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
        .withColumn("files_listed", lit(listed))
    }, Some("""WITH m AS (SELECT CAST(CEIL(MAX(o_orderkey)/3.0) AS BIGINT) AS w
          FROM orders)
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        CAST(2 AS BIGINT) AS files_listed
      FROM orders, m WHERE o_orderkey > w AND o_orderkey <= 3 * w""")),

    QueryDef("q126_iceberg_incremental", (s, dir) => {
      // Iceberg incremental append scan (same contract as q125's Delta
      // readSince, proven on the second format): snapshot ancestry from the
      // metadata json, manifests attributed by added_snapshot_id, only
      // ADDED entries of post-anchor snapshots scanned. Row content AND the
      // 2-file listed count are oracle-gated.
      val orders = Q.t(s, dir, "orders").select("o_orderkey", "o_totalprice")
      val maxKey = orders.agg(max("o_orderkey")).collect()(0).getLong(0)
      val w = (maxKey + 2) / 3
      val path =
        s"/tmp/graft_iceberg_${new java.io.File(dir).getName}/orders_incr"
      def slice(b: Int) =
        orders.filter(col("o_orderkey").between(b * w + 1, (b + 1) * w))
          .coalesce(1)
      // fresh table per run: overwrite resets the current snapshot lineage
      val s1 = graft.io.IcebergNative.write(slice(0), path, mode = "overwrite")
      graft.io.IcebergNative.write(slice(1), path, mode = "append")
      graft.io.IcebergNative.write(slice(2), path, mode = "append")
      val inc = graft.io.IcebergNative.readSince(s, path, s1)
      inc.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case other => other.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      }
      val listed = scans(inc.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
      inc.agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
        .withColumn("files_listed", lit(listed))
    }, Some("""WITH m AS (SELECT CAST(CEIL(MAX(o_orderkey)/3.0) AS BIGINT) AS w
          FROM orders)
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        CAST(2 AS BIGINT) AS files_listed
      FROM orders, m WHERE o_orderkey > w AND o_orderkey <= 3 * w""")),

    QueryDef("q127_delta_deletion_vectors", (s, dir) => {
      // Deletion-vector delete + read (r8 verdict's top real-user gap, now
      // native): DV-delete every 7th doc (merge-on-read — a roaring bitmap
      // of row indexes per file, ZERO data files rewritten), then read
      // through the scan's `_metadata.row_index` filter. A second delete
      // proves bitmap MERGE. The oracle replays both predicates on the raw
      // parquet. At 100 TB the delete cost is O(matched rows) bitmap bytes,
      // not an O(table) rewrite — the reason modern writers default to DVs.
      val docs = Q.t(s, dir, "documents").select("doc_id", "source")
      val path = s"/tmp/graft_dv_${new java.io.File(dir).getName}/documents"
      graft.io.DeltaNative.write(docs, path, mode = "overwrite")
      graft.io.DeltaNative.deleteWhereDV(s, path, col("doc_id") % 7 === 0)
      graft.io.DeltaNative.deleteWhereDV(s, path, col("doc_id") % 11 === 0)
      graft.io.Sources.deltaLake(s, path)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("source")
    }, Some("""SELECT source, COUNT(*) AS n,
        CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 11 <> 0
      GROUP BY source ORDER BY source""")),

    QueryDef("q128_delta_column_mapping", (s, dir) => {
      // Column-mapping reads end-to-end: renameColumn upgrades the table
      // to `name` mode (every field keeps its current name as
      // physicalName) and renames ONLY the logical metaData — zero data
      // rewritten; the scan resolves physical file columns back to the new
      // logical names, and a post-rename append + DV delete both compose.
      // The oracle replays content with the renamed projection.
      val docs = Q.t(s, dir, "documents").select("doc_id", "source")
      val path = s"/tmp/graft_cm_${new java.io.File(dir).getName}/documents"
      val half = docs.agg(max("doc_id")).collect()(0).getLong(0) / 2
      graft.io.DeltaNative.write(docs.filter(col("doc_id") <= half), path,
        mode = "overwrite")
      graft.io.DeltaNative.renameColumn(s, path, "source", "src")
      graft.io.DeltaNative.write(
        docs.filter(col("doc_id") > half).withColumnRenamed("source", "src"),
        path, mode = "append")
      graft.io.DeltaNative.deleteWhereDV(s, path, col("doc_id") % 5 === 0)
      graft.io.Sources.deltaLake(s, path)
        .groupBy("src")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("src")
    }, Some("""SELECT source AS src, COUNT(*) AS n,
        CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM documents WHERE doc_id % 5 <> 0
      GROUP BY source ORDER BY src""")),

    QueryDef("q129_iceberg_rename", (s, dir) => {
      // Iceberg field-id column resolution end-to-end (r8 verdict #5):
      // write, RENAME a column (id-preserving metadata-only commit, the
      // spec's whole point — names are metadata, ids are identity), append
      // under the new name, read back. Pre-rename files carry the OLD
      // parquet column name and resolve purely by field id.
      val docs = Q.t(s, dir, "documents").select("doc_id", "source")
      val path = s"/tmp/graft_icer_${new java.io.File(dir).getName}/documents"
      val half = docs.agg(max("doc_id")).collect()(0).getLong(0) / 2
      graft.io.IcebergNative.write(docs.filter(col("doc_id") <= half), path,
        mode = "overwrite")
      graft.io.IcebergNative.renameColumn(s, path, "source", "src")
      graft.io.IcebergNative.write(
        docs.filter(col("doc_id") > half).withColumnRenamed("source", "src"),
        path, mode = "append")
      graft.io.Sources.iceberg(s, path)
        .groupBy("src")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("src")
    }, Some("""SELECT source AS src, COUNT(*) AS n,
        CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM documents GROUP BY source ORDER BY src""")),

    QueryDef("q130_iceberg_v2_deletes", (s, dir) => {
      // Iceberg v2 row-level delete files end-to-end (r9 verdict #5):
      // POSITIONAL deletes (sorted (file_path, pos) — the DV analog) and
      // EQUALITY deletes (delete-by-key), both sequence-number-gated per
      // the spec: rows appended AFTER a delete survive even when they
      // match it. Composed across a rename, so the equality delete file's
      // column resolves by field id like any data file.
      val docs = Q.t(s, dir, "documents").select("doc_id", "source")
      val path = s"/tmp/graft_icev2_${new java.io.File(dir).getName}/documents"
      val mx = docs.agg(max("doc_id")).collect()(0).getLong(0)
      val (t1, t2) = (mx / 3, 2 * mx / 3)
      graft.io.IcebergNative.write(docs.filter(col("doc_id") <= t1), path,
        mode = "overwrite")
      graft.io.IcebergNative.renameColumn(s, path, "source", "src")
      val renamed = docs.withColumnRenamed("source", "src")
      graft.io.IcebergNative.write(
        renamed.filter(col("doc_id") > t1 && col("doc_id") <= t2),
        path, mode = "append")
      // positional: drop doc_id % 7 == 0 from everything committed so far
      graft.io.IcebergNative.deleteWhere(s, path, col("doc_id") % 7 === 0)
      // equality: drop src = 'src3' from files strictly BEFORE this commit
      graft.io.IcebergNative.deleteWhereEquality(s, path, Seq("src"),
        s.createDataFrame(Seq(Tuple1("src3"))).toDF("src"))
      // the late append's rows survive BOTH deletes (its %7 and 'src3'
      // rows included) — the sequence-gating proof
      graft.io.IcebergNative.write(renamed.filter(col("doc_id") > t2),
        path, mode = "append")
      graft.io.Sources.iceberg(s, path)
        .groupBy("src")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("src")
    }, Some("""SELECT source AS src, COUNT(*) AS n,
        CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM documents, (SELECT (2 * MAX(doc_id)) // 3 AS t2 FROM documents) m
      WHERE doc_id > m.t2 OR (doc_id % 7 <> 0 AND source <> 'src3')
      GROUP BY source ORDER BY src""")),

    QueryDef("q131_hudi_mor", (s, dir) => {
      // Hudi MERGE_ON_READ end-to-end (r9 verdict #9): base parquet files
      // plus Avro log blocks (io/HudiLog.scala, public log-format spec),
      // merged at read by one hash aggregation on the record key — log
      // bytes shuffle, base data never does. The fixture UPSERTS through a
      // data block (zero base files rewritten — the point of MOR), then
      // DELETES through tombstone blocks; the delete lands at a later
      // instant, so it also shadows rows the upsert just touched.
      val docs = Q.t(s, dir, "documents").select("doc_id", "source")
      val path = s"/tmp/graft_hudimor_${new java.io.File(dir).getName}/documents"
      graft.io.HudiNative.write(docs, path, mode = "overwrite",
        recordKeyField = "doc_id", tableType = "MERGE_ON_READ")
      graft.io.HudiNative.upsert(
        docs.filter(col("doc_id") % 10 === 0)
          .withColumn("source", lit("upserted")), path)
      graft.io.HudiNative.deleteWhere(s, path, col("doc_id") % 7 === 0)
      graft.io.Sources.hudi(s, path)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("source")
    }, Some("""SELECT CASE WHEN doc_id % 10 = 0 THEN 'upserted' ELSE source END AS source,
        COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM documents WHERE doc_id % 7 <> 0
      GROUP BY 1 ORDER BY source""")),

    QueryDef("q132_linreg_fit", (s, dir) => {
      v(s, dir, "lineitem")
      // stochasticLinearRegression, deterministically: the LinRegFit
      // aggregate accumulates XᵀX/Xᵀy map-side (k²-sized state, one
      // shuffle at any scale) and solves the normal equations at eval;
      // the oracle solves the SAME system via Cramer's rule in SQL.
      // evalMLMethod applies the fitted weights back over the data —
      // the mean |residual| pins prediction, not just coefficients.
      s.sql("""WITH w AS (SELECT stochasticLinearRegression(
            l_extendedprice, l_quantity, l_discount) AS wv FROM lineitem)
        SELECT ROUND(MIN(wv[0]), 4) AS w_qty, ROUND(MIN(wv[1]), 4) AS w_disc,
          ROUND(MIN(wv[2]), 4) AS bias,
          ROUND(AVG(ABS(evalMLMethod(wv, l_quantity, l_discount)
            - l_extendedprice)), 2) AS mae,
          COUNT(*) AS n
        FROM lineitem CROSS JOIN w""")
    }, Some("""WITH s AS (
        SELECT SUM(l_quantity*l_quantity) AS a11, SUM(l_quantity*l_discount) AS a12,
          SUM(l_quantity) AS a13, SUM(l_discount*l_discount) AS a22,
          SUM(l_discount) AS a23, CAST(COUNT(*) AS DOUBLE) AS a33,
          SUM(l_quantity*l_extendedprice) AS b1,
          SUM(l_discount*l_extendedprice) AS b2, SUM(l_extendedprice) AS b3
        FROM lineitem),
      sd AS (SELECT *, a11*(a22*a33-a23*a23) - a12*(a12*a33-a23*a13)
          + a13*(a12*a23-a22*a13) AS det FROM s),
      w AS (SELECT
        (b1*(a22*a33-a23*a23) - a12*(b2*a33-a23*b3) + a13*(b2*a23-a22*b3)) / det AS w1,
        (a11*(b2*a33-a23*b3) - b1*(a12*a33-a23*a13) + a13*(a12*b3-b2*a13)) / det AS w2,
        (a11*(a22*b3-b2*a23) - a12*(a12*b3-b2*a13) + b1*(a12*a23-a22*a13)) / det AS w3
        FROM sd)
      SELECT ROUND(MIN(w1), 4) AS w_qty, ROUND(MIN(w2), 4) AS w_disc,
        ROUND(MIN(w3), 4) AS bias,
        ROUND(AVG(ABS(w1*l_quantity + w2*l_discount + w3 - l_extendedprice)), 2) AS mae,
        COUNT(*) AS n
      FROM lineitem CROSS JOIN w"""), bench = true),

    QueryDef("q133_logreg_fit", (s, dir) => {
      // full-batch logistic GD (MLFit.logisticFit): one distributed
      // gradient aggregation per epoch, weights = k+1 doubles on the
      // driver, no data collect. The oracle replays the IDENTICAL three
      // epochs as unrolled CTEs in DuckDB — same init (w=0), same lr —
      // then both sides score the fit: weights (round 6) + integer
      // prediction counts (bit-stable across engines).
      val li = Q.t(s, dir, "lineitem")
      val x1 = (col("l_quantity") / 50.0).as("x1")
      val x2 = (col("l_discount") * 10.0).as("x2")
      val y = when(col("l_quantity") + lit(100.0) * col("l_discount") > 30.0, 1.0)
        .otherwise(0.0).as("y")
      val d = li.select(x1, x2, y)
      val w = graft.operators.MLFit.logisticFit(
        d, col("y"), Seq(col("x1"), col("x2")), epochs = 3, lr = 1.0)
      val margin = graft.operators.MLFit.predictMargin(
        w, Seq(col("x1"), col("x2")))
      d.agg(
        round(lit(w(0)), 6).as("w1"), round(lit(w(1)), 6).as("w2"),
        round(lit(w(2)), 6).as("b"),
        sum(when(margin > 0, 1L).otherwise(0L)).as("pred_pos"),
        sum(when((margin > 0) === (col("y") === 1.0), 1L).otherwise(0L)).as("correct"),
        sum(col("y")).cast("long").as("actual_pos"))
    }, Some("""WITH d AS (SELECT l_quantity/50.0 AS x1, l_discount*10.0 AS x2,
          CASE WHEN l_quantity + 100.0*l_discount > 30.0 THEN 1.0 ELSE 0.0 END AS y
        FROM lineitem),
      e0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS b),
      g1 AS (SELECT AVG((1/(1+EXP(-(w1*x1+w2*x2+b))) - y)*x1) AS d1,
                    AVG((1/(1+EXP(-(w1*x1+w2*x2+b))) - y)*x2) AS d2,
                    AVG( 1/(1+EXP(-(w1*x1+w2*x2+b))) - y    ) AS db
             FROM d CROSS JOIN e0),
      e1 AS (SELECT w1 - d1 AS w1, w2 - d2 AS w2, b - db AS b FROM e0 CROSS JOIN g1),
      g2 AS (SELECT AVG((1/(1+EXP(-(w1*x1+w2*x2+b))) - y)*x1) AS d1,
                    AVG((1/(1+EXP(-(w1*x1+w2*x2+b))) - y)*x2) AS d2,
                    AVG( 1/(1+EXP(-(w1*x1+w2*x2+b))) - y    ) AS db
             FROM d CROSS JOIN e1),
      e2 AS (SELECT w1 - d1 AS w1, w2 - d2 AS w2, b - db AS b FROM e1 CROSS JOIN g2),
      g3 AS (SELECT AVG((1/(1+EXP(-(w1*x1+w2*x2+b))) - y)*x1) AS d1,
                    AVG((1/(1+EXP(-(w1*x1+w2*x2+b))) - y)*x2) AS d2,
                    AVG( 1/(1+EXP(-(w1*x1+w2*x2+b))) - y    ) AS db
             FROM d CROSS JOIN e2),
      e3 AS (SELECT w1 - d1 AS w1, w2 - d2 AS w2, b - db AS b FROM e2 CROSS JOIN g3)
      SELECT ROUND(MIN(w1), 6) AS w1, ROUND(MIN(w2), 6) AS w2,
        ROUND(MIN(b), 6) AS b,
        CAST(SUM(CASE WHEN w1*x1+w2*x2+b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pred_pos,
        CAST(SUM(CASE WHEN (w1*x1+w2*x2+b > 0) = (y = 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS correct,
        CAST(SUM(y) AS BIGINT) AS actual_pos
      FROM d CROSS JOIN e3"""), bench = true),

    QueryDef("q134_ann_ivf", (s, dir) => {
      // IVF ANN with a DETERMINISTIC k-means coarse quantizer: init = the
      // 8 smallest vec_ids' vectors, 2 full-batch Lloyd iterations, probe
      // the 2 nearest cells per query. Every step is a pure function of
      // the corpus, so DuckDB replays the identical iterations (the same
      // device as q133's unrolled GD epochs) and the inverted-list search
      // is oracle-checked end to end — not just its invariants.
      val emb = Q.t(s, dir, "embeddings")
      graft.operators.Similarity.ivfTopK(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "embedding", "vec_id", k = 3, kCells = 8, iters = 2, nProbe = 2)
        .select(col("query_id"), col("rn"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy("query_id", "rn")
    }, Some(ivfOracle8x2)),

    QueryDef("q142_ivf_persisted", (s, dir) => {
      // the SAME IVF search as q134 through the PERSISTED index: ivfWrite
      // lays the inverted lists out as cell-partitioned parquet, ivfProbe
      // computes the probed cell set driver-side and pushes it as a
      // partition filter (only probed cell=N dirs are listed/read —
      // SimilaritySpec asserts the file counts). Sharing q134's oracle IS
      // the claim: persisted-index probe ≡ in-memory probe.
      val emb = Q.t(s, dir, "embeddings")
      val path = java.nio.file.Files.createTempDirectory("graft_ivf_")
        .toString
      graft.operators.Similarity.ivfWrite(
        emb, "embedding", "vec_id", path, kCells = 8, iters = 2)
      graft.operators.Similarity.ivfProbe(
          s, path, emb.filter(col("vec_id") % 50 === 0),
          "embedding", "vec_id", k = 3, nProbe = 2)
        .select(col("query_id"), col("rn"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy("query_id", "rn")
    }, Some(ivfOracle8x2)),

    QueryDef("q143_incremental_matview", (s, dir) => {
      // engine-maintained materialized view (r10 verdict missing #3): base
      // Delta table built from a THIRD of lineitem, two appends folded in
      // by refreshMatView — each refresh reads ONLY the commit tail
      // (readSince, q125-proven) + the view-sized state. The oracle
      // aggregates the FULL table: equality proves the appends are
      // reflected without any full recompute having run. Sums stay exact
      // (l_quantity integer-valued; min/max order-free), so the
      // incremental merge is bit-identical to the one-shot aggregation.
      val li = Q.t(s, dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice", "l_orderkey")
      val base = java.nio.file.Files.createTempDirectory("graft_mv_")
        .toString + "/base"
      graft.io.DeltaNative.write(li.filter(col("l_orderkey") % 3 === 0), base)
      val gs = graft.engine.GraftSession(s)
      gs.registerDelta("mv_base_q143", base)
      gs.createIncrementalMatView("mv_li_q143", "mv_base_q143",
        Seq("l_returnflag"),
        Seq(("count", "*", "n"), ("sum", "l_quantity", "sum_qty"),
          ("min", "l_extendedprice", "min_price"),
          ("max", "l_extendedprice", "max_price"),
          ("avg", "l_quantity", "avg_qty")))
      graft.io.DeltaNative.write(
        li.filter(col("l_orderkey") % 3 === 1), base, mode = "append")
      gs.refreshMatView("mv_li_q143")
      graft.io.DeltaNative.write(
        li.filter(col("l_orderkey") % 3 === 2), base, mode = "append")
      gs.refreshMatView("mv_li_q143")
      s.table("mv_li_q143").orderBy("l_returnflag")
    }, Some("""SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS sum_qty,
        MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
        SUM(l_quantity) / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef("q135_decontaminate", (s, dir) => {
      // Benchmark decontamination (eval-overlap filter): corpus docs
      // sharing >= 2 distinct word 5-grams with a held-out "benchmark"
      // slice are flagged. The 60-bit md5-prefix shingle hash is the
      // repo's portable device, so the oracle replays the identical
      // overlap join. Benchmark grams broadcast; the corpus is never
      // shuffled except the final per-id count.
      val docs = Q.t(s, dir, "documents")
      graft.operators.Curation.decontaminate(
          docs.filter(col("doc_id") % 37 =!= 0),
          docs.filter(col("doc_id") % 37 === 0),
          "text", "doc_id", n = 5, minShared = 2)
        .orderBy("id")
    }, Some("""WITH tb AS (SELECT doc_id,
          list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
            x -> x <> '') AS t
        FROM documents),
      gr AS (SELECT doc_id, CASE WHEN len(t) >= 5 THEN
            list_distinct(list_transform(range(0, len(t) - 5 + 1),
              i -> CAST(('0x' || substr(md5(array_to_string(t[i+1:i+5], ' ')), 1, 15)) AS BIGINT)))
          ELSE CAST([] AS BIGINT[]) END AS gs
        FROM tb),
      bg AS (SELECT DISTINCT UNNEST(gs) AS g FROM gr WHERE doc_id % 37 = 0),
      cg AS (SELECT doc_id, UNNEST(gs) AS g FROM gr WHERE doc_id % 37 <> 0)
      SELECT doc_id AS id, COUNT(*) AS shared_ngrams
      FROM cg JOIN bg USING (g)
      GROUP BY doc_id HAVING COUNT(*) >= 2 ORDER BY id""")),

    QueryDef("q136_quality_classifier", (s, dir) => {
      // Trained quality/language classifier over the corpus — the
      // fasttext-style curation step, composed from two oracle-verified
      // parts: q70's exact integer-ratio text features and q133's
      // deterministic full-batch GD. Label = (lang = 'en'); features =
      // stopword ratio, repetition ratio, mean token length / 10.
      val feat = graft.operators.TextAnalysis
        .qualityScore(Q.t(s, dir, "documents"), "text")
        .select(col("stopword_ratio").as("x1"),
          col("repetition_ratio").as("x2"),
          (col("mean_token_len") / 10.0).as("x3"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      val w = graft.operators.MLFit.logisticFit(feat, col("y"),
        Seq(col("x1"), col("x2"), col("x3")), epochs = 3, lr = 1.0)
      val margin = graft.operators.MLFit.predictMargin(
        w, Seq(col("x1"), col("x2"), col("x3")))
      feat.agg(
        round(lit(w(0)), 6).as("w1"), round(lit(w(1)), 6).as("w2"),
        round(lit(w(2)), 6).as("w3"), round(lit(w(3)), 6).as("b"),
        sum(when(margin > 0, 1L).otherwise(0L)).as("pred_pos"),
        sum(when((margin > 0) === (col("y") === 1.0), 1L).otherwise(0L)).as("correct"),
        sum(col("y")).cast("long").as("actual_pos"))
    }, Some("""WITH f AS (
        SELECT lang,
          list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '') AS toks
        FROM documents),
      d AS (SELECT
          CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x))) AS DOUBLE)
            / CAST(greatest(len(toks), 1) AS DOUBLE) AS x1,
          1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS x2,
          CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS DOUBLE)
            / CAST(greatest(len(toks), 1) AS DOUBLE) / 10.0 AS x3,
          CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        FROM f),
      e0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS b),
      g1 AS (SELECT AVG((1/(1+EXP(-(w1*x1+w2*x2+w3*x3+b))) - y)*x1) AS d1,
                    AVG((1/(1+EXP(-(w1*x1+w2*x2+w3*x3+b))) - y)*x2) AS d2,
                    AVG((1/(1+EXP(-(w1*x1+w2*x2+w3*x3+b))) - y)*x3) AS d3,
                    AVG( 1/(1+EXP(-(w1*x1+w2*x2+w3*x3+b))) - y    ) AS db
             FROM d CROSS JOIN e0),
      e1 AS (SELECT w1 - d1 AS w1, w2 - d2 AS w2, w3 - d3 AS w3, b - db AS b
             FROM e0 CROSS JOIN g1),
      g2 AS (SELECT AVG((1/(1+EXP(-(w1*x1+w2*x2+w3*x3+b))) - y)*x1) AS d1,
                    AVG((1/(1+EXP(-(w1*x1+w2*x2+w3*x3+b))) - y)*x2) AS d2,
                    AVG((1/(1+EXP(-(w1*x1+w2*x2+w3*x3+b))) - y)*x3) AS d3,
                    AVG( 1/(1+EXP(-(w1*x1+w2*x2+w3*x3+b))) - y    ) AS db
             FROM d CROSS JOIN e1),
      e2 AS (SELECT w1 - d1 AS w1, w2 - d2 AS w2, w3 - d3 AS w3, b - db AS b
             FROM e1 CROSS JOIN g2),
      g3 AS (SELECT AVG((1/(1+EXP(-(w1*x1+w2*x2+w3*x3+b))) - y)*x1) AS d1,
                    AVG((1/(1+EXP(-(w1*x1+w2*x2+w3*x3+b))) - y)*x2) AS d2,
                    AVG((1/(1+EXP(-(w1*x1+w2*x2+w3*x3+b))) - y)*x3) AS d3,
                    AVG( 1/(1+EXP(-(w1*x1+w2*x2+w3*x3+b))) - y    ) AS db
             FROM d CROSS JOIN e2),
      e3 AS (SELECT w1 - d1 AS w1, w2 - d2 AS w2, w3 - d3 AS w3, b - db AS b
             FROM e2 CROSS JOIN g3)
      SELECT ROUND(MIN(w1), 6) AS w1, ROUND(MIN(w2), 6) AS w2,
        ROUND(MIN(w3), 6) AS w3, ROUND(MIN(b), 6) AS b,
        CAST(SUM(CASE WHEN w1*x1+w2*x2+w3*x3+b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pred_pos,
        CAST(SUM(CASE WHEN (w1*x1+w2*x2+w3*x3+b > 0) = (y = 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS correct,
        CAST(SUM(y) AS BIGINT) AS actual_pos
      FROM d CROSS JOIN e3""")),

    QueryDef("q137_dedup_spans", (s, dir) => {
      // Span-level exact dedup (Lee et al. 2021 boilerplate removal):
      // repeated spans dropped corpus-wide keeping the first (id, pos)
      // occurrence, short spans exempt. The fixture has no natural
      // paragraph breaks, so spans are derived deterministically by
      // breaking before every 'table' token (a groupless regexp_replace —
      // identical in both engines). Output = per-doc digest of the
      // deduplicated text + span counts.
      val docs = Q.t(s, dir, "documents")
        .withColumn("text", regexp_replace(col("text"), " table", "\ntable"))
      graft.operators.Dedup.dedupSpans(docs, "text", "doc_id",
          sep = "\n", joinSep = "\n", minChars = 20)
        .select(col("id"), md5(col("text")).as("digest"),
          col("n_spans"), col("n_kept"))
        .orderBy("id")
    }, Some("""WITH base AS (SELECT doc_id AS id,
          regexp_replace(text, ' table', chr(10) || 'table', 'g') AS t
        FROM documents),
      lists AS (SELECT id,
          list_filter(string_split(t, chr(10)), x -> x <> '') AS l
        FROM base),
      spans AS (SELECT id, pos, l[pos] AS span FROM (
        SELECT id, l, UNNEST(range(1, len(l) + 1)) AS pos FROM lists)),
      k AS (SELECT id, pos, span,
          ROW_NUMBER() OVER (PARTITION BY md5(span) ORDER BY id, pos) AS rn
        FROM spans),
      kept AS (SELECT id, pos, span FROM k WHERE length(span) < 20 OR rn = 1),
      agg AS (SELECT id, string_agg(span, chr(10) ORDER BY pos) AS txt,
          COUNT(*) AS n_kept FROM kept GROUP BY id),
      tot AS (SELECT id, COUNT(*) AS n_spans FROM spans GROUP BY id)
      SELECT tot.id, md5(COALESCE(agg.txt, '')) AS digest, tot.n_spans,
        COALESCE(agg.n_kept, 0) AS n_kept
      FROM tot LEFT JOIN agg USING (id) ORDER BY id""")),

    QueryDef("q138_temperature_mixture", (s, dir) =>
      // temperature-scaled domain rebalancing (alpha = 0.5): rates
      // sqrt-flatten the head domain; the oracle recomputes the same
      // counts → pow → normalize → round thresholds and replays the
      // md5-bucket draw (structurally identical arithmetic both sides)
      graft.operators.Curation.temperatureMixture(
          Q.t(s, dir, "documents"), "doc_id", "source", alpha = 0.5)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("source"),
      Some("""WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
        mn AS (SELECT MIN(n) AS n0 FROM c),
        th AS (SELECT source,
            CAST(ROUND(POW(n, -0.5) / POW(n0, -0.5) * 10000) AS BIGINT) AS t
          FROM c CROSS JOIN mn)
      SELECT d.source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM documents d JOIN th USING (source)
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          % 10000 < t
      GROUP BY d.source ORDER BY d.source""")),

    QueryDef("q97_histogram_adaptive", (s, dir) => {
      v(s, dir, "orders")
      // adaptive-bin histogram sketch (custom agg). Bin EDGES are sketch-
      // dependent, but the sketch's conservation laws are exact, so the
      // query emits the DuckDB-checkable invariants (r6 verdict #4): bin
      // count <= cap, sum(height) = group count, first lower = exact MIN,
      // last upper = exact MAX, and lower <= upper in every bin
      s.sql("""SELECT o_orderpriority,
          CAST(CASE WHEN size(h) <= 5 THEN 1 ELSE 0 END AS INT) AS bins_ok,
          CAST(ROUND(aggregate(h, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.height)) AS BIGINT) AS total_n,
          ROUND(array_min(transform(h, x -> x.lower)), 2) AS min_lo,
          ROUND(array_max(transform(h, x -> x.upper)), 2) AS max_hi,
          CAST(CASE WHEN size(filter(h, x -> x.lower > x.upper)) = 0 THEN 1 ELSE 0 END AS INT) AS bounds_ok
        FROM (SELECT o_orderpriority, histogram(5, o_totalprice) AS h
              FROM orders GROUP BY o_orderpriority)
        ORDER BY o_orderpriority""")
    }, Some("""SELECT o_orderpriority, CAST(1 AS INT) AS bins_ok, COUNT(*) AS total_n,
        ROUND(MIN(o_totalprice), 2) AS min_lo, ROUND(MAX(o_totalprice), 2) AS max_hi,
        CAST(1 AS INT) AS bounds_ok
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    QueryDef("q95_delta_sum", (s, dir) => {
      v(s, dir, "events")
      // positive deltas of value per user in (ts, event_id)-implied order;
      // ts ties are broken by max() aggregation per (user, ts) first so both
      // engines see the same sequence
      s.sql("""SELECT user_id, ROUND(deltaSumTimestamp(v, tt), 4) AS ds FROM
          (SELECT user_id, MAX(value) AS v, unix_micros(ts) AS tt
           FROM events GROUP BY user_id, unix_micros(ts))
        GROUP BY user_id ORDER BY user_id""")
    }, Some("""SELECT user_id, ROUND(SUM(GREATEST(d, 0)), 4) AS ds FROM
        (SELECT user_id, v - LAG(v) OVER (PARTITION BY user_id ORDER BY tt) AS d FROM
          (SELECT user_id, MAX(value) AS v, epoch_us(ts) AS tt
           FROM events GROUP BY user_id, epoch_us(ts)))
      GROUP BY user_id ORDER BY user_id""")),

    QueryDef("q96_interpolate", (s, dir) => {
      val ev = Q.t(s, dir, "events")
        .withColumn("v", when(col("event_type").isin("view", "click"), lit(null))
          .otherwise(col("value")))
        .withColumn("tt", unix_micros(col("ts")))
        // unique numeric order key per user: deterministic dup winner (same
        // row_number rule as the oracle)
        .withColumn("dup", row_number().over(
          Window.partitionBy("user_id", "tt").orderBy("event_id")))
        .filter(col("dup") === 1).drop("dup")
      graft.operators.Fill.interpolate(ev, Seq("user_id"), "tt", Seq("v"))
        .select(col("event_id"), round(col("v"), 4).as("v"))
        .orderBy("event_id")
    }, Some("""WITH base AS (
        SELECT event_id, user_id, CAST(epoch_us(ts) AS DOUBLE) AS tt,
          CASE WHEN event_type IN ('view','click') THEN NULL ELSE value END AS v
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts) ORDER BY event_id) AS dup
              FROM events) WHERE dup = 1),
      w AS (SELECT event_id, v, tt,
        LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tt
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN tt END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tt
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tt
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN tt END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tt
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM base)
      SELECT event_id, ROUND(CASE
          WHEN v IS NOT NULL THEN v
          WHEN pv IS NULL THEN nv
          WHEN nv IS NULL THEN pv
          ELSE pv + (nv - pv) * (tt - pt) / (nt - pt) END, 4) AS v
      FROM w ORDER BY event_id""")),

    QueryDef("q98_frame_pipeline", (s, dir) =>
      // the ds facade end-to-end through the driver contract: query → assign
      // → groupby(name-mapped aggs) → having → sort (SURVEY §7.3)
      graft.ds.GraftFrame(Q.t(s, dir, "lineitem"))
        .query("l_quantity > 10 AND l_returnflag != 'N'")
        .assign("disc_price" ->
          (Q.money(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(3, 2)) - Q.rate(col("l_discount")))))
        .groupby("l_returnflag", "l_linestatus")
        .aggCols(avg(col("l_quantity")).as("avg_qty"),
          sum(col("disc_price")).cast("double").as("rev"),
          count(lit(1)).as("n"))
        .query("n > 100")
        .sortValues(Seq("l_returnflag", "l_linestatus"))
        .toDF,
      Some("""SELECT l_returnflag, l_linestatus, AVG(l_quantity) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS rev,
        COUNT(*) AS n
      FROM lineitem WHERE l_quantity > 10 AND l_returnflag != 'N'
      GROUP BY l_returnflag, l_linestatus HAVING COUNT(*) > 100
      ORDER BY l_returnflag, l_linestatus""")),

    QueryDef("q99_accessors", (s, dir) => {
      import graft.ds.syntax._
      Q.t(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority").str.slice(1, 1).as("pri_code"),
          col("o_orderpriority").str.lower.as("pri_lo"),
          col("o_orderdate").dt.year.as("y"),
          col("o_orderdate").dt.monthName.as("mn"))
        .orderBy("o_orderkey").limit(2000)
    }, Some("""SELECT o_orderkey, SUBSTR(o_orderpriority, 1, 1) AS pri_code,
        LOWER(o_orderpriority) AS pri_lo, CAST(year(o_orderdate) AS INT) AS y,
        strftime(o_orderdate, '%B') AS mn
      FROM orders ORDER BY o_orderkey LIMIT 2000""")),

    QueryDef("q92_sessionize_stateful", (s, dir) => {
      // mapGroupsWithState sessionization (bounded-frame mode)
      val ev = graft.streaming.EventStreams.readEvents(s, dir)
      graft.streaming.EventStreams.sessionize(ev, gapMs = 30 * 60 * 1000L)
        .toDF().select(col("user_id"), col("n_events"),
          round(col("total_value"), 4).as("total_value"))
        .orderBy("user_id")
    },
      // bounded-frame sessionize reports the LAST session per user — classic
      // gaps-and-islands in SQL: same ms-precision timestamps (getTime ==
      // epoch_ms), same (t, event_id) order, same strict > gap test
      Some("""WITH o AS (SELECT user_id, event_id, value, epoch_ms(ts) AS t FROM events),
      g AS (SELECT user_id, value, t, event_id,
          CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
            OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > 1800000
          THEN 1 ELSE 0 END AS ns
        FROM o),
      s AS (SELECT user_id, value,
          SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid
        FROM g),
      m AS (SELECT user_id, MAX(sid) AS msid FROM s GROUP BY user_id)
      SELECT s.user_id, COUNT(*) AS n_events, ROUND(SUM(s.value), 4) AS total_value
      FROM s JOIN m ON s.user_id = m.user_id AND s.sid = m.msid
      GROUP BY s.user_id ORDER BY s.user_id"""),
      bench = true)
  ) ++ TpchQueries.all ++ ClickBenchQueries.all ++ CoverageQueries.all

  val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
