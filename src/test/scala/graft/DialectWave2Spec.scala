package graft

import org.apache.spark.sql.Row

/** ClickHouse SQL dialect tail, wave 2 (r16): GLOBAL hints, join strictness
  * (ALL/ANY/SEMI/ANTI order), ASOF JOIN on the raw-SQL surface, star
  * transformers (* REPLACE / * APPLY), GROUP BY … WITH TOTALS and
  * ORDER BY … WITH FILL. A chdb user pasting these ClickHouse constructs
  * gets the documented semantics, not a parse error.
  */
class DialectWave2Spec extends SparkTestBase {
  import spark.implicits._

  private def g = new graft.engine.GraftSession(spark)

  private def views(): Unit = {
    Seq((1, "ASIA"), (2, "EUROPE")).toDF("rk", "rname")
      .createOrReplaceTempView("w2_region")
    Seq((10, 1, "alpha"), (11, 1, "beta"), (12, 2, "gamma"), (13, 3, "delta"))
      .toDF("nk", "rk2", "nname").createOrReplaceTempView("w2_nation")
    Seq((1, "x", 5.0), (1, "a", 9.0), (2, "b", 3.0)).toDF("k", "tag", "v")
      .createOrReplaceTempView("w2_dup")
    Seq((1, "L1"), (2, "L2"), (3, "L3")).toDF("k", "lab")
      .createOrReplaceTempView("w2_left")
    Seq((1, 10, "T1"), (1, 25, "T2"), (2, 5, "T3")).toDF("uid", "t", "trade")
      .createOrReplaceTempView("w2_trades")
    Seq((1, 8, 100.0), (1, 20, 110.0), (2, 50, 90.0)).toDF("uid", "qt", "px")
      .createOrReplaceTempView("w2_quotes")
  }

  // ---- GLOBAL / strictness keywords ----

  test("GLOBAL IN is the identity (dropped)") {
    views()
    val rows = g.sql(
      """SELECT nk FROM w2_nation WHERE rk2 GLOBAL IN
         (SELECT rk FROM w2_region WHERE rname = 'ASIA') ORDER BY nk""").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(10, 11))
  }

  test("GLOBAL ALL INNER JOIN drops both hint words") {
    views()
    val rows = g.sql(
      """SELECT nk, rname FROM w2_nation n GLOBAL ALL INNER JOIN w2_region r
         ON n.rk2 = r.rk ORDER BY nk""").collect()
    assert(rows.length == 3 && rows.head.getString(1) == "ASIA")
  }

  test("SEMI LEFT JOIN / ANTI LEFT JOIN reorder to Spark's spelling") {
    views()
    val semi = g.sql(
      """SELECT k FROM w2_left SEMI LEFT JOIN w2_dup ON w2_left.k = w2_dup.k
         ORDER BY k""").collect().map(_.getInt(0)).toSeq
    assert(semi == Seq(1, 2))
    val anti = g.sql(
      """SELECT k FROM w2_left ANTI LEFT JOIN w2_dup ON w2_left.k = w2_dup.k
         ORDER BY k""").collect().map(_.getInt(0)).toSeq
    assert(anti == Seq(3))
  }

  test("SEMI RIGHT JOIN with a subquery side is refused loudly") {
    views()
    // named-relation sides swap to the LEFT form (see the r17 test below);
    // a subquery side cannot be swapped textually and still refuses
    val e = intercept[UnsupportedOperationException] {
      g.sql("""SELECT 1 FROM (SELECT * FROM w2_left) x SEMI RIGHT JOIN w2_dup
               ON x.k = w2_dup.k""")
    }
    assert(e.getMessage.contains("temp views"))
  }

  // ---- ANY JOIN ----

  test("ANY LEFT JOIN keeps one right row per key (lexicographic-min pick)") {
    views()
    val rows = g.sql(
      """SELECT l.k, l.lab, d.tag, d.v FROM w2_left l ANY LEFT JOIN w2_dup d
         ON l.k = d.k ORDER BY l.k""").collect()
    // key 1 has ("a",9.0) and ("x",5.0): "a" sorts first → deterministic pick
    assert(rows(0) == Row(1, "L1", "a", 9.0))
    assert(rows(1) == Row(2, "L2", "b", 3.0))
    assert(rows(2) == Row(3, "L3", null, null))
  }

  test("bare ANY JOIN is inner; USING form works") {
    views()
    val on = g.sql(
      """SELECT l.k, d.tag FROM w2_left l ANY JOIN w2_dup d ON l.k = d.k
         ORDER BY l.k""").collect()
    assert(on.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
    val using = g.sql(
      """SELECT k, tag FROM w2_left ANY JOIN w2_dup USING (k) ORDER BY k""")
      .collect()
    assert(using.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
  }

  test("ANY RIGHT JOIN keeps all right rows, at most one left match (r18)") {
    views()
    // w2_dup has two k=1 rows (tag x and a); the deterministic dedup picks
    // the lexicographically smallest non-key row → tag 'a'. k=3 has no
    // match and survives with NULLs (right rows are all kept).
    val rows = g.sql(
      """SELECT l.k, l.lab, d.tag FROM w2_dup d ANY RIGHT JOIN w2_left l
         ON d.k = l.k ORDER BY l.k""").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1),
      if (r.isNullAt(2)) null else r.getString(2))).toSeq ==
      Seq((1, "L1", "a"), (2, "L2", "b"), (3, "L3", null)))
    // SELECT * keeps ClickHouse's left-columns-first order (the dedup is
    // in place, not a side swap — r18 review fix)
    val star = g.sql(
      "SELECT * FROM w2_dup d ANY RIGHT JOIN w2_left l ON d.k = l.k")
    assert(star.columns.toSeq == Seq("k", "tag", "v", "k", "lab"))
  }

  test("ANY FULL JOIN dedups BOTH sides, keeps unmatched both ways (r19)") {
    views()
    // left (subquery — proves the r19 lift) keys {2,3}; right keys {1,1,2}:
    // k=2 matches, k=3 is left-only, k=1 is right-only deduped to the
    // lexicographically smallest non-key row → tag 'a'
    val rows = g.sql(
      """SELECT l.k, l.lab, d.k AS dk, d.tag
         FROM (SELECT k, lab FROM w2_left WHERE k >= 2) l
         ANY FULL JOIN w2_dup d ON l.k = d.k""").collect()
    def n(r: org.apache.spark.sql.Row, i: Int): Any =
      if (r.isNullAt(i)) null else r.get(i)
    assert(rows.map(r => (n(r, 0), n(r, 1), n(r, 2), n(r, 3))).toSet ==
      Set((2, "L2", 2, "b"), (3, "L3", null, null), (null, null, 1, "a")))
  }

  // ---- ASOF JOIN on the SQL surface ----

  test("ASOF JOIN (inner, backward) matches most recent right row") {
    views()
    val rows = g.sql(
      """SELECT tr.uid, tr.t, tr.trade, q.qt, q.px FROM w2_trades tr
         ASOF JOIN w2_quotes q ON tr.uid = q.uid AND tr.t >= q.qt
         ORDER BY tr.trade""").collect()
    // T3 (uid 2, t=5) has no quote at-or-before → dropped by inner strictness
    assert(rows.map(r => (r.getString(2), r.getInt(3), r.getDouble(4))).toSeq ==
      Seq(("T1", 8, 100.0), ("T2", 20, 110.0)))
  }

  test("ASOF LEFT JOIN keeps unmatched rows with NULLs") {
    views()
    val rows = g.sql(
      """SELECT trade, px FROM w2_trades tr ASOF LEFT JOIN w2_quotes q
         ON tr.uid = q.uid AND tr.t >= q.qt ORDER BY trade""").collect()
    assert(rows.length == 3 && rows(2).getString(0) == "T3" && rows(2).isNullAt(1))
  }

  test("ASOF JOIN <= is the forward direction") {
    views()
    val rows = g.sql(
      """SELECT trade, qt FROM w2_trades tr ASOF JOIN w2_quotes q
         ON tr.uid = q.uid AND tr.t <= q.qt ORDER BY trade""").collect()
    // T1 t=10 → qt=20; T2 t=25 → none; T3 t=5 → qt=50
    assert(rows.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("T1", 20), ("T3", 50)))
  }

  test("ASOF JOIN USING: last column is the >= ordering key (r18)") {
    views()
    // USING (uid, t): equality on uid, backward >= on t — same rows as the
    // explicit ON form. Quote columns share the left's names (t ~ qt), so
    // rename the right ts into a same-named view first.
    spark.sql("SELECT uid, qt AS t, px FROM w2_quotes")
      .createOrReplaceTempView("w2_quotes_using")
    val rows = g.sql(
      """SELECT trade, px FROM w2_trades tr
         ASOF JOIN w2_quotes_using q USING (uid, t) ORDER BY trade""").collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("T1", 100.0), ("T2", 110.0)))
    val left = g.sql(
      """SELECT trade, px FROM w2_trades tr
         ASOF LEFT JOIN w2_quotes_using q USING (uid, t) ORDER BY trade""").collect()
    assert(left.length == 3 && left(2).isNullAt(1))
  }

  test("strict ASOF inequality excludes exact-equal timestamps (r18)") {
    views()
    // quote exactly at T1's t=10: non-strict >= matches it, strict > skips
    // back to qt=8
    Seq((1, 8, 100.0), (1, 10, 105.0), (1, 20, 110.0))
      .toDF("uid", "qt", "px").createOrReplaceTempView("w2_quotes_tie")
    val lax = g.sql(
      """SELECT trade, qt FROM w2_trades tr ASOF JOIN w2_quotes_tie q
         ON tr.uid = q.uid AND tr.t >= q.qt ORDER BY trade""").collect()
    assert(lax.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("T1", 10), ("T2", 20)))
    val strict = g.sql(
      """SELECT trade, qt FROM w2_trades tr ASOF JOIN w2_quotes_tie q
         ON tr.uid = q.uid AND tr.t > q.qt ORDER BY trade""").collect()
    assert(strict.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("T1", 8), ("T2", 20)))
    // forward strict: t < qt — T1 t=10 skips the tie at 10, lands on 20
    val fwd = g.sql(
      """SELECT trade, qt FROM w2_trades tr ASOF JOIN w2_quotes_tie q
         ON tr.uid = q.uid AND tr.t < q.qt ORDER BY trade""").collect()
    assert(fwd.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("T1", 20)))
  }

  // ---- review-pass regressions (r16 self-review) ----

  test("ASOF: correlated subquery references through the left alias survive") {
    views()
    // tr.uid inside EXISTS must keep resolving to the join output (the view
    // is aliased tr), not get stripped into the inner scope
    val rows = g.sql(
      """SELECT tr.trade, tr.px FROM w2_trades tr ASOF JOIN w2_quotes q
         ON tr.uid = q.uid AND tr.t >= q.qt
         WHERE EXISTS (SELECT 1 FROM w2_left x WHERE x.k = tr.uid)
         ORDER BY tr.trade""").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("T1", "T2"))
  }

  test("ASOF: alias reused by another relation is refused, not corrupted") {
    views()
    val e = intercept[IllegalArgumentException] {
      g.sql("""SELECT tr.trade FROM w2_trades tr ASOF JOIN w2_quotes q
               ON tr.uid = q.uid AND tr.t >= q.qt
               WHERE tr.uid IN (SELECT k FROM w2_dup q WHERE q.v > 0)""")
    }
    assert(e.getMessage.contains("bound to more than one relation"))
  }

  test("ASOF: ON-clause key case differing from the schema still works") {
    views()
    val rows = g.sql(
      """SELECT trade, px FROM w2_trades tr ASOF JOIN w2_quotes q
         ON tr.UID = q.Uid AND tr.T >= q.QT ORDER BY trade""").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("T1", "T2"))
  }

  test("ASOF: a string-literal decoy does not abort the real rewrite") {
    views()
    val rows = g.sql(
      """SELECT 'x FROM a ASOF JOIN b ON c' AS note, tr.trade
         FROM w2_trades tr ASOF JOIN w2_quotes q
         ON tr.uid = q.uid AND tr.t >= q.qt ORDER BY tr.trade""").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("T1", "T2"))
  }

  test("ANY JOIN: non-equality conditions (!=) are refused, not mis-keyed") {
    views()
    val e = intercept[IllegalArgumentException] {
      g.sql("""SELECT l.k FROM w2_left l ANY LEFT JOIN w2_dup d
               ON l.k = d.k AND l.lab != d.tag""")
    }
    assert(e.getMessage.contains("equality"))
  }

  test("ANY JOIN: subquery right side is lifted into a view and dedups (r19)") {
    views()
    val rows = g.sql(
      """SELECT l.k, d.tag FROM w2_left l ANY LEFT JOIN
         (SELECT k, tag FROM w2_dup) d ON l.k = d.k ORDER BY l.k""").collect()
    assert(rows.map(r => (r.getInt(0),
      if (r.isNullAt(1)) null else r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, null)))
  }

  test("WITH TOTALS binds to the outer GROUP BY past a subquery's inner one") {
    views()
    val rows = g.sql(
      """SELECT s.k, COUNT(*) AS n FROM
         (SELECT k FROM w2_dup GROUP BY k, tag) s
         GROUP BY s.k WITH TOTALS ORDER BY s.k""").collect()
    // inner groups: (1,x),(1,a),(2,b) → s rows k=1,1,2; outer: 1→2, 2→1, totals 3
    assert(rows.head.isNullAt(0) && rows.head.getLong(1) == 3L)
    assert(rows.map(_.getLong(1)).toSeq == Seq(3L, 2L, 1L))
  }

  // ---- star transformers ----

  test("* REPLACE rewrites onto Spark's * EXCEPT") {
    views()
    val df = g.sql("SELECT * REPLACE(upper(lab) AS lab) FROM w2_left ORDER BY k")
    assert(df.columns.toSet == Set("k", "lab"))
    assert(df.collect().map(_.getAs[String]("lab")).toSeq == Seq("L1", "L2", "L3"))
  }

  test("* EXCEPT(…) REPLACE(…) composes") {
    views()
    val df = g.sql(
      "SELECT * EXCEPT(v) REPLACE(concat(tag, '!') AS tag) FROM w2_dup WHERE k = 2")
    assert(df.columns.toSet == Set("k", "tag"))
    assert(df.collect().head.getAs[String]("tag") == "b!")
  }

  test("* APPLY expands per column with ClickHouse naming") {
    views()
    val df = g.sql("SELECT * APPLY(max) FROM w2_dup")
    assert(df.columns.toSet == Set("max(k)", "max(tag)", "max(v)"))
    val r = df.collect().head
    assert(r.getAs[Int]("max(k)") == 2 && r.getAs[String]("max(tag)") == "x" &&
      r.getAs[Double]("max(v)") == 9.0)
  }

  test("* EXCEPT(…) REPLACE(…) APPLY(fn) composes in ClickHouse order") {
    views()
    val df = g.sql("SELECT * EXCEPT(tag) REPLACE(v * 2 AS v) APPLY(sum) FROM w2_dup")
    val r = df.collect().head
    assert(r.getAs[Long]("sum(k)") == 4L)
    assert(r.getAs[Double]("sum(v)") == 34.0)
  }

  test("* APPLY lambda substitutes the star column per output (r18)") {
    views()
    val df = g.sql("SELECT * EXCEPT(tag) APPLY(x -> x * 2 + 1) FROM w2_dup")
    assert(df.columns.toSet == Set("k * 2 + 1", "v * 2 + 1"))
    val sums = df.collect().map(r => r.getAs[Int]("k * 2 + 1")).sorted.toSeq
    assert(sums == Seq(3, 3, 5))
    // the lambda variable never captures string literals or dotted refs
    val lit = g.sql("SELECT * APPLY(x -> concat(tag, 'x')) FROM " +
      "(SELECT tag FROM w2_dup WHERE k = 2) s").collect()
    assert(lit.head.getString(0) == "bx")
  }

  test("* APPLY lambda composes with REPLACE in transformer order (r18)") {
    views()
    val df = g.sql(
      "SELECT * EXCEPT(tag) REPLACE(v * 10 AS v) APPLY(y -> y + 1) FROM w2_dup")
    assert(df.columns.toSet == Set("k + 1", "v + 1"))
    val vs = df.collect().map(r => r.getAs[Double]("v + 1")).sorted.toSeq
    assert(vs == Seq(31.0, 51.0, 91.0))
  }

  test("APPLY chains compose left to right (r18)") {
    views()
    val df = g.sql("SELECT * EXCEPT(tag) APPLY(x -> x * 2) APPLY(sum) FROM w2_dup")
    assert(df.columns.toSet == Set("sum(k * 2)", "sum(v * 2)"))
    val r = df.collect().head
    assert(r.getAs[Long]("sum(k * 2)") == 8L &&
      r.getAs[Double]("sum(v * 2)") == 34.0)
  }

  test("COLUMNS('re') selects matching columns, with transformer tail (r18)") {
    views()
    val plain = g.sql("SELECT COLUMNS('^n') FROM w2_nation ORDER BY nk")
    assert(plain.columns.toSeq == Seq("nk", "nname"))
    assert(plain.collect().map(_.getInt(0)).toSeq == Seq(10, 11, 12, 13))
    val ap = g.sql("SELECT COLUMNS('k') APPLY(max) FROM w2_nation")
    assert(ap.columns.toSet == Set("max(nk)", "max(rk2)"))
    assert(ap.collect().head.getAs[Int]("max(nk)") == 13)
    val e = intercept[IllegalArgumentException] {
      g.sql("SELECT COLUMNS('^zzz') FROM w2_nation")
    }
    assert(e.getMessage.contains("matched no columns"))
    // EXCEPT-only tail must still expand (a leftover EXCEPT would read as
    // a set operator — r18 review fix)
    val exc = g.sql("SELECT COLUMNS('^n') EXCEPT(nname) FROM w2_nation ORDER BY nk")
    assert(exc.columns.toSeq == Seq("nk"))
    assert(exc.collect().map(_.getInt(0)).toSeq == Seq(10, 11, 12, 13))
  }

  test("multiplication before a function call is never a star transformer") {
    views()
    val r = g.sql(
      "SELECT k * length(replace(tag, 'a', 'aa')) AS r FROM w2_dup WHERE tag = 'a'")
      .collect().head
    assert(r.getInt(0) == 2)
  }

  // ---- WITH TOTALS ----

  test("GROUP BY … WITH TOTALS adds a NULL-keyed grand-total row") {
    views()
    val rows = g.sql(
      """SELECT tag, COUNT(*) AS n FROM w2_dup GROUP BY tag WITH TOTALS
         ORDER BY tag""").collect()
    // Spark ASC puts NULLs first: totals row leads
    assert(rows.head.isNullAt(0) && rows.head.getLong(1) == 3L)
    assert(rows.map(_.getLong(1)).sum == 6L && rows.length == 4)
  }

  test("WITH TOTALS over ROLLUP adds one MORE grand row (r18)") {
    views()
    val rows = g.sql(
      """SELECT tag, COUNT(*) AS n FROM w2_dup
         GROUP BY ROLLUP(tag) WITH TOTALS ORDER BY tag, n""").collect()
    // 3 per-tag rows + ROLLUP's own () + the totals row = 5
    assert(rows.length == 5)
    assert(rows.count(r => r.isNullAt(0) && r.getLong(1) == 3L) == 2)
  }

  test("WITH TOTALS over GROUPING SETS appends the totals set (r18)") {
    views()
    val rows = g.sql(
      """SELECT tag, COUNT(*) AS n FROM w2_dup
         GROUP BY GROUPING SETS ((tag)) WITH TOTALS ORDER BY tag, n""").collect()
    assert(rows.length == 4 &&
      rows.count(r => r.isNullAt(0) && r.getLong(1) == 3L) == 1)
  }

  // ---- WITH FILL ----

  test("ORDER BY … WITH FILL FROM/TO/STEP inserts missing grid rows") {
    views()
    val rows = g.sql(
      """SELECT k AS kk, COUNT(*) AS n FROM w2_dup GROUP BY k
         ORDER BY kk WITH FILL FROM 1 TO 6 STEP 2""").collect()
    // grid 1,3,5 (TO exclusive); src has kk=1,2 → fill adds 3 and 5 with n=0
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 2L), (2, 1L), (3, 0L), (5, 0L)))
  }

  test("WITH FILL without bounds fills between min and max inclusive") {
    views()
    val rows = g.sql(
      """SELECT k * 2 AS kk, MAX(tag) AS t, COUNT(*) AS n FROM w2_dup
         GROUP BY k * 2 ORDER BY kk WITH FILL""").collect()
    // src kk = 2, 4 → fill adds 3 with string default '' and count default 0
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((2, "x", 2L), (3, "", 0L), (4, "b", 1L)))
  }

  test("WITH FILL over a timestamp column with STEP INTERVAL") {
    views()
    Seq(("2024-01-01 00:00:00", 5.0), ("2024-01-04 00:00:00", 8.0))
      .toDF("d0", "v")
      .selectExpr("CAST(d0 AS TIMESTAMP) AS d", "v")
      .createOrReplaceTempView("w2_days")
    val rows = g.sql(
      """SELECT d, SUM(v) AS s FROM w2_days GROUP BY d
         ORDER BY d WITH FILL STEP INTERVAL 1 DAY""").collect()
    assert(rows.length == 4) // Jan 1..4, gaps Jan 2 and 3 filled
    assert(rows.map(_.getDouble(1)).toSeq == Seq(5.0, 0.0, 0.0, 8.0))
    assert(rows(1).getTimestamp(0).toString.startsWith("2024-01-02"))
  }

  test("WITH FILL INTERPOLATE carries the previous source value into gaps") {
    views()
    val rows = g.sql(
      """SELECT k AS kk, MAX(tag) AS t, COUNT(*) AS n FROM w2_dup GROUP BY k
         ORDER BY kk WITH FILL FROM 1 TO 5 INTERPOLATE (t)""").collect()
    // src kk=1 (t=x), kk=2 (t=b); gaps 3,4 carry t='b' forward, n default 0
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "x", 2L), (2, "b", 1L), (3, "b", 0L), (4, "b", 0L)))
  }

  test("bare INTERPOLATE () carries every non-fill column") {
    views()
    val rows = g.sql(
      """SELECT k AS kk, MAX(tag) AS t, COUNT(*) AS n FROM w2_dup GROUP BY k
         ORDER BY kk WITH FILL FROM 1 TO 5 INTERPOLATE ()""").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "x", 2L), (2, "b", 1L), (3, "b", 1L), (4, "b", 1L)))
  }

  test("INTERPOLATE rewrites gap rows ONLY — source NULLs are preserved") {
    views()
    Seq((1, Some("x")), (3, None), (6, Some("y")))
      .toDF("kk", "t").createOrReplaceTempView("w2_srcnull")
    val rows = g.sql(
      """SELECT kk, t FROM w2_srcnull
         ORDER BY kk WITH FILL FROM 1 TO 7 INTERPOLATE (t)""").collect()
    val got = rows.map(r => (r.getInt(0),
      if (r.isNullAt(1)) null else r.getString(1))).toSeq
    // kk=3 is a SOURCE row with a legitimate NULL — it must stay NULL;
    // gaps 2 carry 'x', gaps 4,5 carry 'x' (ignore-nulls past the NULL
    // source row — the documented divergence), kk=6 keeps 'y'
    assert(got == Seq((1, "x"), (2, "x"), (3, null), (4, "x"), (5, "x"), (6, "y")))
  }

  test("temporal WITH FILL TO that is not step-aligned keeps the last grid point") {
    views()
    Seq(("2024-01-01 00:00:00", 1.0)).toDF("d0", "v")
      .selectExpr("CAST(d0 AS TIMESTAMP) AS d", "v")
      .createOrReplaceTempView("w2_unaligned")
    val rows = g.sql(
      """SELECT d, SUM(v) AS s FROM w2_unaligned GROUP BY d
         ORDER BY d WITH FILL FROM TIMESTAMP '2024-01-01 00:00:00'
         TO TIMESTAMP '2024-01-06 00:00:00' STEP INTERVAL 2 DAY""").collect()
    // grid Jan 1, 3, 5 (all < Jan 6): TO - step would have dropped Jan 5
    assert(rows.map(_.getTimestamp(0).toString.substring(0, 10)).toSeq ==
      Seq("2024-01-01", "2024-01-03", "2024-01-05"))
  }

  test("STEP INTERVAL on an integral column is refused loudly") {
    views()
    val e = intercept[IllegalArgumentException] {
      g.sql("SELECT k FROM w2_dup ORDER BY k WITH FILL STEP INTERVAL 1 DAY")
    }
    assert(e.getMessage.contains("DATE/TIMESTAMP"))
  }

  test("self-referential INTERPOLATE folds the chain per gap row (r19)") {
    views()
    // classic ClickHouse counter chain: each inserted row's v = previous
    // OUTPUT v + 1, restarting from every source row
    Seq((1, 10.0), (4, 100.0), (7, 50.0)).toDF("k", "v")
      .createOrReplaceTempView("w2_chain")
    val rows = g.sql(
      """SELECT k, v FROM w2_chain ORDER BY k WITH FILL
         INTERPOLATE (v AS v + 1)""").collect()
    assert(rows.map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      Seq((1, 10.0), (2, 11.0), (3, 12.0), (4, 100.0), (5, 101.0),
        (6, 102.0), (7, 50.0)))
    // geometric chain + a chain referencing a CARRIED column
    Seq((1, 2.0, 5.0), (5, 3.0, 7.0)).toDF("k", "v", "c")
      .createOrReplaceTempView("w2_chain2")
    val rows2 = g.sql(
      """SELECT k, v, c FROM w2_chain2 ORDER BY k WITH FILL
         INTERPOLATE (v AS v * 2 + c, c)""").collect()
    // gap rows: c carries (5.0), v chains v*2+5 from the anchor v=2
    assert(rows2.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq((1, 2.0, 5.0), (2, 9.0, 5.0), (3, 23.0, 5.0), (4, 51.0, 5.0),
        (5, 3.0, 7.0)))
    // a chain referencing a PLAIN result column keeps the loud refusal
    val e2 = intercept[UnsupportedOperationException] {
      g.sql("""SELECT k, v, c FROM w2_chain2 ORDER BY k WITH FILL
               INTERPOLATE (v AS v + c)""")
    }
    assert(e2.getMessage.contains("interpolated columns"))
  }

  test("ORDER BY … DESC WITH FILL walks the grid downward (r17)") {
    views()
    Seq((1, "a"), (4, "d")).toDF("kk", "t").createOrReplaceTempView("w2_descf")
    // default bounds: FROM = max (4) down to min (1) inclusive
    val rows = g.sql(
      "SELECT kk, t FROM w2_descf ORDER BY kk DESC WITH FILL").collect()
    assert(rows.map(r => (r.getInt(0),
      if (r.isNullAt(1)) "" else r.getString(1))).toSeq ==
      Seq((4, "d"), (3, ""), (2, ""), (1, "a")))
    // explicit FROM/TO: TO is exclusive at the BOTTOM (grid 6,5,4,3);
    // INTERPOLATE carries the previous (larger-kk) source value downward;
    // SOURCE rows outside the bounds are KEPT (ClickHouse bounds only the
    // inserted rows) — kk=1 stays with its own value
    val r2 = g.sql(
      """SELECT kk, t FROM w2_descf
         ORDER BY kk DESC WITH FILL FROM 6 TO 2 INTERPOLATE (t)""").collect()
    assert(r2.map(r => (r.getInt(0),
      if (r.isNullAt(1)) null else r.getString(1))).toSeq ==
      Seq((6, null), (5, null), (4, "d"), (3, "d"), (1, "a")))
  }

  test("SEMI/ANTI RIGHT JOIN swap to the LEFT form (r17)") {
    views()
    // SEMI RIGHT = the RIGHT side's rows that have a match in the left
    val semi = g.sql(
      """SELECT k, lab FROM w2_dup d SEMI RIGHT JOIN w2_left l
         ON d.k = l.k ORDER BY k""").collect()
    assert(semi.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "L1"), (2, "L2")))
    val anti = g.sql(
      """SELECT k, lab FROM w2_dup d ANTI RIGHT JOIN w2_left l
         ON d.k = l.k ORDER BY k""").collect()
    assert(anti.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((3, "L3")))
  }

  test("grouped WITH FILL: leading sort columns make a per-group fill (r17)") {
    views()
    Seq(("a", 1, 10L), ("a", 4, 40L), ("b", 7, 70L), ("b", 9, 90L))
      .toDF("g", "kk", "n").createOrReplaceTempView("w2_gfill")
    // default bounds are PER GROUP (a: 1..4, b: 7..9); gap rows carry the
    // group's value and type defaults elsewhere
    val rows = g.sql(
      "SELECT g, kk, n FROM w2_gfill ORDER BY g, kk WITH FILL").collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq(("a", 1, 10L), ("a", 2, 0L), ("a", 3, 0L), ("a", 4, 40L),
        ("b", 7, 70L), ("b", 8, 0L), ("b", 9, 90L)))
    // INTERPOLATE windows partition by the prefix: the carry never crosses
    // from group a into group b
    val r2 = g.sql(
      """SELECT g, kk, n FROM w2_gfill
         ORDER BY g, kk WITH FILL INTERPOLATE (n)""").collect()
    assert(r2.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq(("a", 1, 10L), ("a", 2, 10L), ("a", 3, 10L), ("a", 4, 40L),
        ("b", 7, 70L), ("b", 8, 70L), ("b", 9, 90L)))
    // explicit FROM/TO apply to every group
    val r3 = g.sql(
      """SELECT g, kk, n FROM w2_gfill
         ORDER BY g, kk WITH FILL FROM 8 TO 11""").collect()
    assert(r3.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 1), ("a", 4), ("a", 8), ("a", 9), ("a", 10),
        ("b", 7), ("b", 8), ("b", 9), ("b", 10)))
  }

  test("expression WITH FILL: ORDER BY <expr> WITH FILL materializes and fills (r17)") {
    views()
    Seq((2, "a"), (8, "d")).toDF("kk", "t").createOrReplaceTempView("w2_efill")
    // expr = kk/2 → source points 1 and 4; grid fills 2,3; original
    // columns carry type defaults in gap rows (the expr is not a SELECT col)
    val rows = g.sql(
      "SELECT kk, t FROM w2_efill ORDER BY kk DIV 2 WITH FILL").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((2, "a"), (0, ""), (0, ""), (8, "d")))
    // with bounds + DESC on the expression: grid 5..1 (TO 0 exclusive),
    // source expr-values 4 (kk=8) and 1 (kk=2) anti-join away their grid
    // points → fill order 5(gap),4(src),3(gap),2(gap),1(src)
    val r2 = g.sql(
      "SELECT kk FROM w2_efill ORDER BY kk DIV 2 DESC WITH FILL FROM 5 TO 0")
      .collect()
    assert(r2.map(_.getInt(0)).toSeq == Seq(0, 8, 0, 0, 2), r2.mkString(","))
  }

  test("grouped WITH FILL refuses interpolating a leading sort column") {
    views()
    Seq(("a", 1, 10L)).toDF("g", "kk", "n").createOrReplaceTempView("w2_gfill2")
    val e = intercept[IllegalArgumentException] {
      g.sql("""SELECT g, kk, n FROM w2_gfill2
               ORDER BY g, kk WITH FILL INTERPOLATE (g)""")
    }
    assert(e.getMessage.contains("leading sort column"))
  }

  test("scalar WITH: ClickHouse `WITH expr AS ident` inlines (r17)") {
    views()
    // constants, function calls, later-entry references, scalar subqueries
    val r1 = g.sql(
      """WITH 2 AS mult, mult + 1 AS mult3
         SELECT k, v * mult AS v2, v * mult3 AS v3 FROM w2_dup
         WHERE tag = 'b'""").collect()
    assert(r1.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq((2, 6.0, 9.0)))
    val r2 = g.sql(
      """WITH (SELECT MAX(v) FROM w2_dup) AS vmax
         SELECT k, tag FROM w2_dup WHERE v = vmax""").collect()
    assert(r2.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a")))
  }

  test("scalar WITH mixes with standard CTEs; alias positions are protected") {
    views()
    val rows = g.sql(
      """WITH 10 AS base, big AS (SELECT k, v * base AS vb FROM w2_dup)
         SELECT k, vb, base AS base FROM big WHERE vb > 40 ORDER BY vb""").collect()
    // `AS base` keeps the alias name; references inline to (10)
    assert(rows.map(r => (r.getInt(0), r.getDouble(1), r.getInt(2))).toSeq ==
      Seq((1, 50.0, 10), (1, 90.0, 10)))
    // a pure standard-CTE WITH is untouched
    val std = g.sql(
      "WITH t AS (SELECT 7 AS x) SELECT x FROM t").collect()
    assert(std.head.getInt(0) == 7)
    // a column-list CTE entry is standard, not a scalar alias
    val cl = g.sql(
      "WITH t(a, b) AS (SELECT 1, 2) SELECT a + b FROM t").collect()
    assert(cl.head.getInt(0) == 3)
  }

  test("ASOF JOIN subquery sides are lifted into views (r17)") {
    views()
    val rows = g.sql(
      """SELECT tr.trade, q.px FROM (SELECT uid, t, trade FROM w2_trades) tr
         ASOF JOIN (SELECT uid, qt, px * 2 AS px FROM w2_quotes) q
         ON tr.uid = q.uid AND tr.t >= q.qt
         ORDER BY tr.trade""").collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("T1", 200.0), ("T2", 220.0)))
  }

  test("INTERPOLATE (col AS expr) computes expr over the previous output row") {
    views()
    Seq((1, 10L), (4, 40L)).toDF("kk", "n").createOrReplaceTempView("w2_iexpr")
    val rows = g.sql(
      """SELECT kk, n, CAST(n AS DOUBLE) AS d FROM w2_iexpr
         ORDER BY kk WITH FILL FROM 1 TO 6 INTERPOLATE (d AS n * 2.0)""").collect()
    // gap kk=2: prev row is SOURCE kk=1 (n=10) → d=20; gap kk=3: prev row is
    // GAP kk=2 whose OUTPUT n is the type default 0 → d=0 (ClickHouse's
    // previous-output-row semantics, not carry-forward); kk=5: prev is
    // source kk=4 (n=40) → 80. Source rows keep their own d.
    assert(rows.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1, 10L, 10.0), (2, 0L, 20.0), (3, 0L, 0.0),
        (4, 40L, 40.0), (5, 0L, 80.0)))
  }

  test("INTERPOLATE expr may mix carry-forward and expr columns") {
    views()
    val rows = g.sql(
      """SELECT k AS kk, MAX(tag) AS t, COUNT(*) AS n FROM w2_dup GROUP BY k
         ORDER BY kk WITH FILL FROM 1 TO 5
         INTERPOLATE (t, n AS 7)""").collect()
    // t carries forward; n's expr is a literal → every gap row gets 7
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "x", 2L), (2, "b", 1L), (3, "b", 7L), (4, "b", 7L)))
  }

  test("INTERPOLATE expr referencing another interpolated column chains (r19)") {
    views()
    // `n AS length(t)` references the CARRIED column t — previously
    // refused, now a chain: each gap row's n = length(previous output t),
    // and t's previous output is its carried value
    val rows = g.sql(
      """SELECT k AS kk, MAX(tag) AS t, COUNT(*) AS n FROM w2_dup
         GROUP BY k ORDER BY kk WITH FILL FROM 1 TO 5
         INTERPOLATE (t, n AS length(t))""").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "x", 2L), (2, "b", 1L), (3, "b", 1L), (4, "b", 1L)))
  }

  test("ASOF JOIN same-name right timestamp: r.ts resolves to the MATCHED value") {
    views()
    // quotes carry the ts under the LEFT column's name `t` — the common
    // `ON l.k=r.k AND l.t >= r.t` spelling. q.t must be the matched RIGHT
    // timestamp, not silently the left one (r16 ADVICE medium).
    Seq((1, 8, 100.0), (1, 20, 110.0), (2, 50, 90.0)).toDF("uid", "t", "px")
      .createOrReplaceTempView("w2_quotes_same")
    val rows = g.sql(
      """SELECT tr.trade, tr.t, q.t AS qt, q.px FROM w2_trades tr
         ASOF JOIN w2_quotes_same q ON tr.uid = q.uid AND tr.t >= q.t
         ORDER BY tr.trade""").collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .toSeq == Seq(("T1", 10, 8, 100.0), ("T2", 25, 20, 110.0)))
  }

  test("ASOF JOIN same-name right ts without references still drops cleanly") {
    views()
    Seq((1, 8, 100.0), (1, 20, 110.0), (2, 50, 90.0)).toDF("uid", "t", "px")
      .createOrReplaceTempView("w2_quotes_same")
    val rows = g.sql(
      """SELECT tr.trade, q.px FROM w2_trades tr
         ASOF JOIN w2_quotes_same q ON tr.uid = q.uid AND tr.t >= q.t
         ORDER BY tr.trade""").collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("T1", 100.0), ("T2", 110.0)))
  }
}
