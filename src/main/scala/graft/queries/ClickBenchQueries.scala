package graft.queries

import org.apache.spark.sql.SparkSession

import graft.Tables

/** ClickBench-shape suite (r6 verdict #7, completed r9): the reference
  * ships the 43-query ClickBench analytics set (reference:
  * benchmark/clickbench.py:14-58) as its wide-scan benchmark. The hits
  * table is not in the test fixtures, so each characteristic SHAPE is
  * mirrored over the events/documents tables at the same plan structure.
  * All oracle-gated; sums of doubles go through exact DECIMAL(18,6) so
  * both engines add identical values (the Q.money device), and every
  * ORDER BY carries a full deterministic tie-break (except cb22, whose
  * POINT is the sortless LIMIT — it asserts the row count the limit
  * returns).
  *
  * Complete mapping, reference query index (0-42) -> mirror:
  *   0,1 count/filtered-count scan ............ cb01
  *   2 sum+count+avg scan | 3 avg(key) ........ cb02
  *   4,5 count-distinct scans ................. cb03
  *   6 min/max(time) .......................... cb04
  *   7 filtered group order-by-count .......... cb05
  *   8,10,13 key + count(distinct) top-n ...... cb06
  *   9 group + sum/count/avg/distinct ......... cb23 (+cb05)
  *   11 two-key count-distinct top-n .......... cb06
  *   12,15 single-key count top-n ............. cb05
  *   14,16,18 multi-key (incl. minute) count .. cb19 (+cb07)
  *   17 GROUP BY ... LIMIT with NO sort ....... cb22
  *   19 point lookup .......................... cb13
  *   20,21 LIKE scan + grouped MIN/count ...... cb08
  *   22 LIKE + NOT LIKE + distinct rollup ..... cb18
  *   23 SELECT * filter order-by-time ......... cb14
  *   24,25,26 filter + order + limit scans .... cb09
  *   27 avg(length) + HAVING top-n ............ cb10
  *   28 regex domain extract (referer) ........ cb10 + cb24 (hierarchy)
  *   29 90-term sum chain ..................... cb11 (10-term)
  *   30,31,32 two-int-key + count/sum/avg ..... cb23
  *   33 high-cardinality URL count top-n ...... cb25
  *   34 constant + URL rollup ................. cb20
  *   35 arithmetic-variant key grouping ....... cb15
  *   36,37 windowed pageview rollups .......... cb17
  *   38,42 paged minute/url rollups ........... cb12
  *   39 CASE src/dst rollup + offset .......... cb16
  *   40 multi-IN + const-key paged rollup ..... cb17
  *   41 two-int-key deep-offset rollup ........ cb21
  *   multi-distinct single scan (9's tail) .... cb26
  */
object ClickBenchQueries {

  private def v(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(n))

  val all: Seq[QueryDef] = Seq(

    // CB Q0/Q1: bare and filtered COUNT(*) scans
    QueryDef("cb01_count_scan", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT COUNT(*) AS n,
          COUNT(CASE WHEN event_type <> 'view' THEN 1 END) AS n_nonview
        FROM events""")
    }, Some("""SELECT COUNT(*) AS n,
        COUNT(CASE WHEN event_type <> 'view' THEN 1 END) AS n_nonview
      FROM events"""),
      bench = true),

    // CB Q2: multi-aggregate single scan (SUM + COUNT + AVG)
    QueryDef("cb02_multi_agg_scan", (s, dir) => {
      v(s, dir, "events")
      // integer-micro avg device — see cb23's comment
      s.sql("""SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
          COUNT(*) AS n,
          CAST((2 * CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
                + COUNT(value)) DIV (2 * COUNT(value)) AS DOUBLE) / 1000000.0 AS avg_v
        FROM events""")
    }, Some("""SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
        COUNT(*) AS n,
        CAST((2 * CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
              + COUNT(value)) // (2 * COUNT(value)) AS DOUBLE) / 1000000.0 AS avg_v
      FROM events"""),
      bench = true),

    // CB Q4/Q5: COUNT(DISTINCT) scans
    QueryDef("cb03_count_distinct_scan", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT COUNT(DISTINCT user_id) AS users,
          COUNT(DISTINCT event_type) AS types FROM events""")
    }, Some("""SELECT COUNT(DISTINCT user_id) AS users,
        COUNT(DISTINCT event_type) AS types FROM events""")),

    // CB Q6: MIN/MAX over the time column
    QueryDef("cb04_minmax_time", (s, dir) => {
      v(s, dir, "events")
      s.sql("SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events")
    }, Some("SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events")),

    // CB Q8/Q9: group by key, multi-agg, ORDER BY count DESC LIMIT 10
    QueryDef("cb05_group_topn", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT user_id, COUNT(*) AS c,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
          COUNT(DISTINCT event_type) AS types
        FROM events GROUP BY user_id
        ORDER BY c DESC, user_id LIMIT 10""")
    }, Some("""SELECT user_id, COUNT(*) AS c,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
        COUNT(DISTINCT event_type) AS types
      FROM events GROUP BY user_id
      ORDER BY c DESC, user_id LIMIT 10"""),
      bench = true),

    // CB Q11/Q14: two-key group + COUNT(DISTINCT) top-n
    QueryDef("cb06_group2_distinct_topn", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT event_type, user_id % 10 AS shard,
          COUNT(DISTINCT user_id) AS u
        FROM events WHERE event_type <> ''
        GROUP BY event_type, user_id % 10
        ORDER BY u DESC, event_type, shard LIMIT 10""")
    }, Some("""SELECT event_type, user_id % 10 AS shard,
        COUNT(DISTINCT user_id) AS u
      FROM events WHERE event_type <> ''
      GROUP BY event_type, user_id % 10
      ORDER BY u DESC, event_type, shard LIMIT 10""")),

    // CB Q18: expression key (minute) in the grouping
    QueryDef("cb07_minute_group", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT user_id % 100 AS u, minute(ts) AS m, COUNT(*) AS c
        FROM events GROUP BY user_id % 100, minute(ts)
        ORDER BY c DESC, u, m LIMIT 10""")
    }, Some("""SELECT user_id % 100 AS u, CAST(minute(ts) AS INT) AS m, COUNT(*) AS c
      FROM events GROUP BY u, m
      ORDER BY c DESC, u, m LIMIT 10""")),

    // CB Q20-22: LIKE scan + grouped MIN/count over the matching slice
    QueryDef("cb08_like_scan", (s, dir) => {
      v(s, dir, "documents")
      s.sql("""SELECT lang, MIN(source) AS first_src, COUNT(*) AS c
        FROM documents WHERE text LIKE '%data%' AND lang <> ''
        GROUP BY lang ORDER BY c DESC, lang LIMIT 10""")
    }, Some("""SELECT lang, MIN(source) AS first_src, COUNT(*) AS c
      FROM documents WHERE text LIKE '%data%' AND lang <> ''
      GROUP BY lang ORDER BY c DESC, lang LIMIT 10"""),
      bench = true),

    // CB Q23-26: filter + multi-column ORDER BY + LIMIT over the scan
    QueryDef("cb09_order_limit_scan", (s, dir) => {
      v(s, dir, "documents")
      s.sql("""SELECT doc_id, source, n_chars
        FROM documents WHERE lang <> 'en'
        ORDER BY n_chars DESC, doc_id LIMIT 10""")
    }, Some("""SELECT doc_id, source, n_chars
      FROM documents WHERE lang <> 'en'
      ORDER BY n_chars DESC, doc_id LIMIT 10""")),

    // CB Q28: domain extraction via regexp + AVG(length) + HAVING + top-n
    // (group-ref syntax differs: $2 in Spark, \2 in DuckDB)
    QueryDef("cb10_domain_extract", (s, dir) => {
      v(s, dir, "documents")
      s.sql("""WITH u AS (
          SELECT concat('https://www.', source, '.example.com/p/',
                        CAST(doc_id AS STRING)) AS url
          FROM documents)
        SELECT regexp_replace(url, '^https?://(www\\.)?([^/]+)/.*$', '$2') AS k,
          ROUND(AVG(length(url)), 6) AS l, COUNT(*) AS c, MIN(url) AS first_url
        FROM u WHERE url <> ''
        GROUP BY regexp_replace(url, '^https?://(www\\.)?([^/]+)/.*$', '$2')
        HAVING COUNT(*) > 3 ORDER BY l DESC, k LIMIT 25""")
    }, Some("""WITH u AS (
        SELECT concat('https://www.', source, '.example.com/p/',
                      CAST(doc_id AS VARCHAR)) AS url
        FROM documents)
      SELECT regexp_replace(url, '^https?://(www\.)?([^/]+)/.*$', '\2') AS k,
        ROUND(AVG(length(url)), 6) AS l, COUNT(*) AS c, MIN(url) AS first_url
      FROM u WHERE url <> ''
      GROUP BY k HAVING COUNT(*) > 3 ORDER BY l DESC, k LIMIT 25"""),
      bench = true),

    // CB Q29: long independent-sum chain over one scan (10-term analogue)
    QueryDef("cb11_sum_chain", (s, dir) => {
      v(s, dir, "events")
      val terms = (0 until 10).map(k =>
        s"CAST(SUM(CAST(value + $k AS DECIMAL(18,6))) AS DOUBLE) AS s$k").mkString(", ")
      s.sql(s"SELECT $terms FROM events")
    }, Some((0 until 10).map(k =>
        s"CAST(SUM(CAST(value + $k AS DECIMAL(18,6))) AS DOUBLE) AS s$k")
      .mkString("SELECT ", ", ", " FROM events"))),

    // CB Q19: point lookup by key over the fact scan
    QueryDef("cb13_point_lookup", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT event_id, user_id, event_type
        FROM events WHERE event_id = 4242""")
    }, Some("""SELECT event_id, user_id, event_type
      FROM events WHERE event_id = 4242""")),

    // CB Q23: SELECT * wide-row scan filtered + ordered by time
    QueryDef("cb14_wide_scan_order_time", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT event_id, ts, user_id, event_type, value, props
        FROM events WHERE props LIKE '%7%'
        ORDER BY ts, event_id LIMIT 10""")
    }, Some("""SELECT event_id, ts, user_id, event_type, value, props
      FROM events WHERE props LIKE '%7%'
      ORDER BY ts, event_id LIMIT 10""")),

    // CB Q33-35: grouping on arithmetic variants of one key
    QueryDef("cb15_arith_key_group", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT user_id, user_id - 1 AS u1, user_id - 2 AS u2,
          COUNT(*) AS c
        FROM events GROUP BY user_id, user_id - 1, user_id - 2
        ORDER BY c DESC, user_id LIMIT 10""")
    }, Some("""SELECT user_id, user_id - 1 AS u1, user_id - 2 AS u2,
        COUNT(*) AS c
      FROM events GROUP BY user_id, u1, u2
      ORDER BY c DESC, user_id LIMIT 10""")),

    // CB Q39: CASE-derived source/destination rollup with paging
    QueryDef("cb16_case_key_rollup", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT event_type,
          CASE WHEN value < 50 THEN get_json_object(props, '$.k')
               ELSE '' END AS src,
          COUNT(*) AS page_views
        FROM events
        WHERE ts >= timestamp'2024-01-05 00:00:00'
          AND ts < timestamp'2024-01-20 00:00:00'
        GROUP BY event_type, CASE WHEN value < 50
          THEN get_json_object(props, '$.k') ELSE '' END
        ORDER BY page_views DESC, event_type, src LIMIT 10 OFFSET 20""")
    }, Some("""SELECT event_type,
        CASE WHEN value < 50 THEN json_extract_string(props, '$.k')
             ELSE '' END AS src,
        COUNT(*) AS page_views
      FROM events
      WHERE ts >= timestamp'2024-01-05 00:00:00'
        AND ts < timestamp'2024-01-20 00:00:00'
      GROUP BY event_type, src
      ORDER BY page_views DESC, event_type, src LIMIT 10 OFFSET 20""")),

    // CB Q40: multi-IN filter + selective modular predicate + paged two-key
    // rollup (TraficSourceID IN (-1,6) AND RefererHash = const analogue)
    QueryDef("cb17_multi_in_paged", (s, dir) => {
      v(s, dir, "events")
      // CAST to DATE: Spark's date_trunc returns a timestamp, DuckDB's a DATE
      s.sql("""SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
          COUNT(*) AS page_views
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
          AND user_id % 97 = 3
          AND ts >= timestamp'2024-01-03 00:00:00'
          AND ts < timestamp'2024-01-28 00:00:00'
        GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
        ORDER BY page_views DESC, user_id, d LIMIT 10 OFFSET 10""")
    }, Some("""SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
        COUNT(*) AS page_views
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
        AND user_id % 97 = 3
        AND ts >= timestamp'2024-01-03 00:00:00'
        AND ts < timestamp'2024-01-28 00:00:00'
      GROUP BY user_id, d
      ORDER BY page_views DESC, user_id, d LIMIT 10 OFFSET 10"""),
      bench = true),

    // CB Q22: LIKE + NOT LIKE pair with MIN/count/count-distinct rollup
    QueryDef("cb18_dual_like_rollup", (s, dir) => {
      v(s, dir, "documents")
      s.sql("""SELECT lang, MIN(source) AS first_src, COUNT(*) AS c,
          COUNT(DISTINCT doc_id) AS u
        FROM documents
        WHERE text LIKE '%the%' AND source NOT LIKE '%cc%' AND lang <> ''
        GROUP BY lang ORDER BY c DESC, lang LIMIT 10""")
    }, Some("""SELECT lang, MIN(source) AS first_src, COUNT(*) AS c,
        COUNT(DISTINCT doc_id) AS u
      FROM documents
      WHERE text LIKE '%the%' AND source NOT LIKE '%cc%' AND lang <> ''
      GROUP BY lang ORDER BY c DESC, lang LIMIT 10""")),

    // CB Q18: three-key high-cardinality grouping (UserID, minute, phrase)
    // ordered by count — the two-level GROUP BY count family
    QueryDef("cb19_userid_minute_group", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT user_id, CAST(minute(ts) AS INT) AS m, event_type,
          COUNT(*) AS c
        FROM events GROUP BY user_id, minute(ts), event_type
        ORDER BY c DESC, user_id, m, event_type LIMIT 10""")
    }, Some("""SELECT user_id, CAST(minute(ts) AS INT) AS m, event_type,
        COUNT(*) AS c
      FROM events GROUP BY user_id, m, event_type
      ORDER BY c DESC, user_id, m, event_type LIMIT 10"""),
      bench = true),

    // CB Q34 ("SELECT 1, URL") + a UNION ALL feeding the rollup: constant
    // grouping key over a unioned pair of filtered scans
    QueryDef("cb20_union_rollup", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT 1 AS one, event_type, COUNT(*) AS c FROM (
          SELECT event_type FROM events WHERE value >= 50
          UNION ALL
          SELECT event_type FROM events WHERE value < 50 AND event_type <> 'view')
        GROUP BY 1, event_type ORDER BY c DESC, event_type LIMIT 10""")
    }, Some("""SELECT 1 AS one, event_type, COUNT(*) AS c FROM (
        SELECT event_type FROM events WHERE value >= 50
        UNION ALL
        SELECT event_type FROM events WHERE value < 50 AND event_type <> 'view')
      GROUP BY 1, event_type ORDER BY c DESC, event_type LIMIT 10""")),

    // CB Q41: two-int-key rollup paged DEEP (OFFSET 10000-class) — the
    // pagination shape where the limit no longer short-circuits the sort
    QueryDef("cb21_deep_offset_rollup", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT user_id, CAST(FLOOR(value) AS INT) AS w, COUNT(*) AS page_views
        FROM events WHERE event_type <> 'view'
        GROUP BY user_id, CAST(FLOOR(value) AS INT)
        ORDER BY page_views DESC, user_id, w LIMIT 10 OFFSET 5000""")
    }, Some("""SELECT user_id, CAST(FLOOR(value) AS INT) AS w, COUNT(*) AS page_views
      FROM events WHERE event_type <> 'view'
      GROUP BY user_id, w
      ORDER BY page_views DESC, user_id, w LIMIT 10 OFFSET 5000""")),

    // CB Q36-42: filtered page-view rollup, minute date_trunc, offset paging
    QueryDef("cb12_minute_rollup_paged", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT date_trunc('minute', ts) AS m, COUNT(*) AS page_views
        FROM events
        WHERE ts >= timestamp'2024-01-05 00:00:00'
          AND ts < timestamp'2024-01-12 00:00:00'
          AND event_type IN ('view', 'click')
        GROUP BY date_trunc('minute', ts)
        ORDER BY m LIMIT 10 OFFSET 100""")
    }, Some("""SELECT date_trunc('minute', ts) AS m, COUNT(*) AS page_views
      FROM events
      WHERE ts >= timestamp'2024-01-05 00:00:00'
        AND ts < timestamp'2024-01-12 00:00:00'
        AND event_type IN ('view', 'click')
      GROUP BY m ORDER BY m LIMIT 10 OFFSET 100"""),
      bench = true),

    // CB Q17: GROUP BY ... LIMIT with NO ORDER BY — the limit must
    // short-circuit the aggregation (CollectLimit, no Sort). Which rows
    // come back is engine-dependent, so the oracle-checked output is the
    // COUNT the limit returns.
    QueryDef("cb22_group_limit_nosort", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT COUNT(*) AS rows_returned FROM (
          SELECT user_id, event_type, COUNT(*) AS c
          FROM events GROUP BY user_id, event_type LIMIT 10)""")
    }, Some("""SELECT COUNT(*) AS rows_returned FROM (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY user_id, event_type LIMIT 10)""")),

    // CB Q30-32: two-int-key rollup with count + conditional sum + avg —
    // the widest shuffle of the set (WatchID, ClientIP analogue). The
    // unfiltered Q32 variant is the heavy one; keyed here by (user_id,
    // floor(value)) at the same cardinality profile.
    // avg_v follows the repo's decimal-exact rule (Queries.scala header):
    // ROUND(sum/count, 6) is computed ENTIRELY in integer micro-units —
    // half-up micro = (2*S6 + N) div (2*N) with S6 = exact decimal sum in
    // 1e-6 units (value >= 0 in this data) — because a double-domain
    // ROUND(x, 6) is not bit-stable across engines and DuckDB lowers
    // decimal division to DOUBLE. micro/1e6 is then one deterministic
    // IEEE division on both sides.
    QueryDef("cb23_two_key_multiagg", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT user_id, CAST(FLOOR(value) AS INT) AS w, COUNT(*) AS c,
          SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS refreshes,
          CAST((2 * CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
                + COUNT(value)) DIV (2 * COUNT(value)) AS DOUBLE) / 1000000.0 AS avg_v
        FROM events
        GROUP BY user_id, CAST(FLOOR(value) AS INT)
        ORDER BY c DESC, user_id, w LIMIT 10""")
    }, Some("""SELECT user_id, CAST(FLOOR(value) AS INT) AS w, COUNT(*) AS c,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS refreshes,
        CAST((2 * CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
              + COUNT(value)) // (2 * COUNT(value)) AS DOUBLE) / 1000000.0 AS avg_v
      FROM events
      GROUP BY user_id, w
      ORDER BY c DESC, user_id, w LIMIT 10"""),
      bench = true),

    // CB Q28 (referer hierarchy): regexp_extract capture groups peel the
    // synthetic URL into host and first path segment — the URL-hierarchy
    // rollup family (domain, then section)
    QueryDef("cb24_url_hierarchy", (s, dir) => {
      v(s, dir, "documents")
      s.sql("""WITH u AS (
          SELECT concat('https://', source, '.example.com/', lang, '/p',
                        CAST(doc_id % 10 AS STRING)) AS url
          FROM documents)
        SELECT regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
          regexp_extract(url, '^https?://[^/]+/([^/]+)/', 1) AS section,
          COUNT(*) AS page_views
        FROM u GROUP BY regexp_extract(url, '^https?://([^/]+)/', 1),
          regexp_extract(url, '^https?://[^/]+/([^/]+)/', 1)
        ORDER BY page_views DESC, host, section LIMIT 10""")
    }, Some("""WITH u AS (
        SELECT concat('https://', source, '.example.com/', lang, '/p',
                      CAST(doc_id % 10 AS VARCHAR)) AS url
        FROM documents)
      SELECT regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
        regexp_extract(url, '^https?://[^/]+/([^/]+)/', 1) AS section,
        COUNT(*) AS page_views
      FROM u GROUP BY host, section
      ORDER BY page_views DESC, host, section LIMIT 10""")),

    // CB Q33: high-cardinality URL string key count top-n (URL, COUNT(*)
    // DESC LIMIT 10) — the string-heavy single-key shuffle
    QueryDef("cb25_url_rollup", (s, dir) => {
      v(s, dir, "documents")
      s.sql("""WITH u AS (
          SELECT concat('https://', source, '.example.com/p/',
                        CAST(doc_id % 1000 AS STRING)) AS url
          FROM documents)
        SELECT url, COUNT(*) AS c FROM u
        GROUP BY url ORDER BY c DESC, url LIMIT 10""")
    }, Some("""WITH u AS (
        SELECT concat('https://', source, '.example.com/p/',
                      CAST(doc_id % 1000 AS VARCHAR)) AS url
        FROM documents)
      SELECT url, COUNT(*) AS c FROM u
      GROUP BY url ORDER BY c DESC, url LIMIT 10"""),
      bench = true),

    // Wide multi-column DISTINCT single scan (the Q9 family's tail): four
    // COUNT(DISTINCT) over one pass — Spark plans this as an Expand, the
    // distinct-heavy shape the r8 verdict called out as missing
    QueryDef("cb26_multi_distinct_scan", (s, dir) => {
      v(s, dir, "events")
      s.sql("""SELECT COUNT(DISTINCT user_id) AS u,
          COUNT(DISTINCT event_type) AS t,
          COUNT(DISTINCT CAST(FLOOR(value) AS INT)) AS vals,
          COUNT(DISTINCT user_id % 7) AS shards
        FROM events""")
    }, Some("""SELECT COUNT(DISTINCT user_id) AS u,
        COUNT(DISTINCT event_type) AS t,
        COUNT(DISTINCT CAST(FLOOR(value) AS INT)) AS vals,
        COUNT(DISTINCT user_id % 7) AS shards
      FROM events"""),
      bench = true)
  )
}
