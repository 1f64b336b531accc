package graft.engine

import java.util.Locale
import java.util.concurrent.atomic.AtomicInteger

import scala.annotation.tailrec
import scala.util.matching.Regex

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.operators.AsOfJoin

/** ClickHouse SQL dialect tail, wave 2 (r16) — the join-strictness and
  * column-transformer constructs a chdb user pastes from existing ClickHouse
  * SQL. The reference executes full ClickHouse SQL verbatim (its engine IS
  * ClickHouse — reference chdb/__init__.py:145 `query(sql)`), so these forms
  * are part of the drop-in surface even though the reference's own pandas
  * layer never emits them (sql_executor.py emits only the wave-1 clauses:
  * LIMIT BY, `* EXCEPT`). Everything here rewrites onto plain Spark SQL /
  * the existing Spark-first operators — no new execution machinery:
  *
  *  - `GLOBAL IN` / `GLOBAL … JOIN` → hint dropped (ClickHouse's
  *    broadcast-the-subquery distribution hint; Catalyst+AQE own that
  *    decision here, so GLOBAL is the identity)
  *  - `ALL INNER/LEFT/… JOIN` → `ALL` dropped (ClickHouse's default
  *    strictness IS SQL join semantics)
  *  - `SEMI|ANTI LEFT JOIN` → `LEFT SEMI|ANTI JOIN` (keyword-order swap;
  *    identical semantics, Spark spells strictness after the direction)
  *  - `ANY [LEFT|INNER] JOIN` → the right side deduplicated to one row per
  *    join key before a plain join (one window shuffle on the keys)
  *  - `ASOF [LEFT] JOIN` → the existing [[graft.operators.AsOfJoin]]
  *    union+window operator (single shuffle, no row explosion)
  *  - `SELECT * REPLACE(expr AS col)` / `* [EXCEPT(…)] APPLY(fn)` →
  *    projection-list expansion
  *  - `GROUP BY … WITH TOTALS` → `GROUPING SETS ((keys), ())`
  *  - `ORDER BY col WITH FILL [FROM a] [TO b] [STEP s]` → grid UNION ALL
  *    anti-join (gap rows generated from `sequence()`, never on the driver)
  *
  * All scanners are literal-aware (a keyword inside '…'/`…` is data) via the
  * shared GraftSession helpers. Documented divergences from ClickHouse are
  * called out per rewrite below.
  */
private[engine] trait DialectWave2 { self: GraftSession =>

  private def qr(s: String): String = Regex.quoteReplacement(s)
  // ASOF rewrite builds the replacement text before the view name is minted
  // (reference rewriting must inspect it first); this token marks the slot.
  private val vnPlaceholder = "__graft_asof_vn__"

  // ---- GLOBAL hint -------------------------------------------------------
  // `GLOBAL IN` / `GLOBAL NOT IN` / `GLOBAL <strictness/direction> JOIN`:
  // ClickHouse's "ship the right side to every node" distribution hint. On
  // Spark the broadcast-vs-shuffle decision belongs to Catalyst + AQE
  // (autoBroadcastJoinThreshold, runtime size re-plan), so the hint is the
  // identity — accepted and dropped. `x.global IN (…)` (a column literally
  // named global) is protected by the lookbehind.
  private val globalRe =
    ("(?i)(?<![.\\w])GLOBAL\\s+(?=(?:ANY|ALL|ASOF|SEMI|ANTI|INNER|LEFT|RIGHT" +
      "|FULL|CROSS|JOIN|IN|NOT)\\b)").r
  private[engine] def dropGlobal(q: String): String =
    globalRe.replaceAllIn(q, m => if (inLiteralAt(q, m.start)) qr(m.matched) else "")

  // ---- strictness keyword normalization -----------------------------------
  // ClickHouse spells strictness BEFORE the direction (`SEMI LEFT JOIN`);
  // Spark spells it after (`LEFT SEMI JOIN`). Same semantics, keyword swap.
  // `ALL` is ClickHouse's explicit default strictness = plain SQL join.
  // SEMI/ANTI RIGHT JOIN (r17): ClickHouse's right-semi returns the RIGHT
  // side's matching rows — Spark has no RIGHT SEMI, but swapping the two
  // relation references turns it into the LEFT form with identical output
  // (the result carries only right-side columns, and the ON condition is
  // side-symmetric text). The swap needs both sides as named relations; a
  // subquery side still refuses with guidance.
  private val semiAntiRightRe =
    ("(?is)\\bFROM\\s+([A-Za-z_][\\w.]*|`[^`]+`)" +
      "((?:\\s+(?:AS\\s+)?(?!(?:SEMI|ANTI|LEFT|INNER|CROSS|JOIN|WHERE|GROUP" +
      "|ORDER|LIMIT|HAVING|UNION|ON|USING|SAMPLE|FINAL)\\b)[A-Za-z_]\\w*)?)" +
      "\\s+(SEMI|ANTI)\\s+RIGHT\\s+JOIN\\s+([A-Za-z_][\\w.]*|`[^`]+`)" +
      "((?:\\s+(?:AS\\s+)?(?!ON\\b)[A-Za-z_]\\w*)?)\\s+(ON|USING)\\b").r
  private val semiAntiRe = "(?i)\\b(SEMI|ANTI)\\s+(LEFT|RIGHT)\\s+JOIN\\b".r
  private val allJoinRe = "(?i)\\bALL\\s+(?=(?:INNER|LEFT|RIGHT|FULL|JOIN)\\b)".r
  private[engine] def normalizeJoinStrictness(q: String): String = {
    val s0 = semiAntiRightRe.replaceAllIn(q, { m =>
      if (inLiteralAt(q, m.start)) qr(m.matched)
      else qr(s"FROM ${m.group(4)}${m.group(5)} " +
        s"LEFT ${m.group(3).toUpperCase(Locale.ROOT)} JOIN " +
        s"${m.group(1)}${m.group(2)} ${m.group(6).toUpperCase(Locale.ROOT)}")
    })
    val s1 = semiAntiRe.replaceAllIn(s0, { m =>
      if (inLiteralAt(s0, m.start)) qr(m.matched)
      else if (m.group(2).equalsIgnoreCase("RIGHT"))
        throw new UnsupportedOperationException(
          s"${m.group(1).toUpperCase(Locale.ROOT)} RIGHT JOIN is supported " +
            "only with named relations on both sides (the rewrite swaps " +
            "them to the LEFT form) — wrap subquery sides in temp views")
      else qr(s"${m.group(2).toUpperCase(Locale.ROOT)} " +
        s"${m.group(1).toUpperCase(Locale.ROOT)} JOIN")
    })
    allJoinRe.replaceAllIn(s1, m => if (inLiteralAt(s1, m.start)) qr(m.matched) else "")
  }

  // ---- shared join-clause scanning ----------------------------------------
  /** Clause keywords that terminate a join condition / FROM extent when seen
    * at the scanning scope's own paren depth. LEFT/RIGHT/ANY double as
    * function names — a bound word immediately followed by '(' is a call,
    * not a clause.
    */
  private val joinCondBounds = Seq("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT",
    "WINDOW", "UNION", "INTERSECT", "EXCEPT", "SETTINGS", "FORMAT", "JOIN",
    "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "SEMI", "ANTI", "ANY", "ASOF",
    "ARRAY", "USING", "ON")
  private val fromBounds = Seq("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT",
    "WINDOW", "UNION", "INTERSECT", "EXCEPT", "SETTINGS", "FORMAT")

  /** Exclusive end of the clause starting at `from`: the first bound keyword
    * at the SAME paren depth (skipping string/backtick literals and bound
    * words that open a call), or the enclosing scope's ')' position, or EOS.
    * `from` must itself be outside literals.
    */
  private[engine] def clauseExtent(s: String, from: Int, bounds: Seq[String]): Int = {
    val u = s.toUpperCase(Locale.ROOT)
    def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    var d = 0; var i = from; var inStr = false; var inTick = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inTick) { if (c == '`') inTick = false }
      else c match {
        case '\'' => inStr = true
        case '`' => inTick = true
        case '(' => d += 1
        case ')' => d -= 1; if (d < 0) return i
        case _ =>
          if (d == 0 && (i == 0 || !isWordChar(s.charAt(i - 1)))) {
            var bi = 0
            while (bi < bounds.length) {
              val k = bounds(bi)
              if (u.startsWith(k, i) &&
                  (i + k.length >= u.length || !isWordChar(u.charAt(i + k.length)))) {
                // a bound word opening a call (`left('x', 2)`) is a function
                var j = i + k.length
                while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
                if (j >= s.length || s.charAt(j) != '(') return i
              }
              bi += 1
            }
          }
      }
      i += 1
    }
    s.length
  }

  /** Split on a top-level keyword (outside parens/literals), e.g. AND. */
  private def splitTopLevelWord(s: String, word: String): Seq[String] = {
    val u = s.toUpperCase(Locale.ROOT)
    val k = word.toUpperCase(Locale.ROOT)
    def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    val out = Seq.newBuilder[String]
    var d = 0; var i = 0; var start = 0; var inStr = false; var inTick = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inTick) { if (c == '`') inTick = false }
      else c match {
        case '\'' => inStr = true
        case '`' => inTick = true
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
          if (d == 0 && u.startsWith(k, i) &&
              (i == 0 || !isWordChar(u.charAt(i - 1))) &&
              (i + k.length >= u.length || !isWordChar(u.charAt(i + k.length)))) {
            out += s.substring(start, i); start = i + k.length; i += k.length - 1
          }
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def unquoteIdent(s: String): String = {
    val t = s.trim
    if (t.startsWith("`") && t.endsWith("`") && t.length > 1)
      t.substring(1, t.length - 1)
    else t.replace("\"", "")
  }

  /** Schema of `SELECT * FROM <fromText>` — analysis only, no job. The probe
    * goes through the table-function rewrite so `file('x.parquet')` sources
    * resolve like they do in the main pipeline.
    */
  private def probeSchema(fromText: String): StructType =
    spark.sql(rewriteTableFns(s"SELECT * FROM $fromText")).schema

  // ---- ANY JOIN -----------------------------------------------------------
  // ClickHouse `ANY [LEFT|INNER] JOIN`: each left row matches AT MOST ONE
  // right row. ClickHouse's pick among duplicates is documented
  // non-deterministic; this engine refines it to a deterministic contract —
  // the lexicographically smallest right row (non-key columns compared
  // left-to-right in schema order, ASC NULLS FIRST) — so results are stable
  // and oracle-checkable. Spark-first shape: ONE row_number window shuffle
  // on the join keys dedups the right side, then a plain join; at 100 TB
  // that is strictly cheaper than the join it guards (same keys, right side
  // only, and AQE still picks broadcast when the deduped side is small).
  // Map-typed columns are unorderable and excluded from the tie-break.
  // `ANY RIGHT JOIN` (r18): all right rows kept, each matching at most one
  // LEFT row — the LEFT side is deduped IN PLACE (one row_number window
  // keyed on its join keys, same deterministic lexicographic-min contract
  // as ANY LEFT) and the join becomes a plain RIGHT JOIN, so `SELECT *`
  // keeps ClickHouse's left-columns-first order (a side swap would
  // reverse it — r18 review). `ANY FULL JOIN` (r19): BOTH sides deduped in
  // place with the same contract, then a plain FULL JOIN — each surviving
  // left row meets at most one right row and vice versa, which refines
  // ClickHouse's non-deterministic any-pick to the stable lexicographic
  // minimum on each side. Subquery sides of either form are lifted into
  // temp views first (the ASOF lifting device, r19).
  private val anyRightNamedRe =
    ("(?is)\\bFROM\\s+([A-Za-z_][\\w.]*|`[^`]+`)" +
      "((?:\\s+(?:AS\\s+)?(?!(?:SEMI|ANTI|ANY|LEFT|INNER|CROSS|JOIN|WHERE|GROUP" +
      "|ORDER|LIMIT|HAVING|UNION|ON|USING|SAMPLE|FINAL)\\b)[A-Za-z_]\\w*)?)" +
      "\\s+ANY\\s+(RIGHT|FULL)\\s+JOIN\\s+([A-Za-z_][\\w.]*|`[^`]+`)" +
      "((?:\\s+(?:AS\\s+)?(?!(?:ON|USING)\\b)[A-Za-z_]\\w*)?)\\s+(ON|USING)\\b").r
  private val anyRightRe = "(?i)\\bANY\\s+(RIGHT|FULL)\\s+JOIN\\b".r
  private val anyJoinRe =
    ("(?is)\\bANY\\s+((?:LEFT|INNER)\\s+)?JOIN\\s+([A-Za-z_][\\w.]*|`[^`]+`)" +
      "((?:\\s+(?:AS\\s+)?(?!(?:ON|USING)\\b)[A-Za-z_]\\w*)?)\\s+(ON|USING)\\b").r
  private val anyLeftoverRe =
    "(?i)\\bANY\\s+((?:LEFT|INNER)\\s+)?JOIN\\b".r
  /** `(SELECT …)` text deduplicating `rel` to one row per `keys` — the ANY
    * contract: keep the lexicographically smallest non-key row per key
    * (schema order, ASC NULLS FIRST; map columns excluded as unorderable).
    */
  private def anyDedupSub(rel: String, keys: Seq[String], tag: String): String = {
    val keysLower = keys.map(_.toLowerCase(Locale.ROOT)).toSet
    val schema = probeSchema(rel)
    val ordCols = schema.fields.toSeq
      .filterNot(f => keysLower(f.name.toLowerCase(Locale.ROOT)) ||
        f.dataType.isInstanceOf[MapType])
      .map(f => s"`${f.name}` ASC NULLS FIRST")
    val ord =
      if (ordCols.nonEmpty) ordCols.mkString(", ")
      else keys.map(k => s"`$k`").mkString(", ")
    val part = keys.map(k => s"`$k`").mkString(", ")
    s"(SELECT * EXCEPT (__graft_any_rn) FROM (SELECT *, " +
      s"row_number() OVER (PARTITION BY $part ORDER BY $ord) AS " +
      s"__graft_any_rn FROM $rel) __graft_$tag WHERE __graft_any_rn = 1)"
  }

  /** Join keys on `alias`'s side of an ON condition: each AND-ed term must
    * be a plain equality with exactly one side qualified by `alias`.
    */
  private def anyKeysFor(alias: String, cond: String, joinName: String): Seq[String] =
    splitTopLevelWord(cond, "AND").map { c =>
      require(c.matches("(?s)^[^=<>!]+=[^=<>!]+$"),
        s"$joinName supports only AND-chained equality conditions (got '$c')")
      val refs = c.split("=", 2).map(_.trim)
      val ref = refs.find { r =>
        val p = r.split("\\.", 2)
        p.length == 2 && unquoteIdent(p(0)).equalsIgnoreCase(alias)
      }.getOrElse(throw new IllegalArgumentException(
        s"$joinName ON condition '$c' has no side qualified by the " +
          s"alias '$alias' — qualify the column"))
      unquoteIdent(ref.split("\\.", 2)(1))
    }

  /** One ANY RIGHT/FULL JOIN occurrence → dedup-left (+ dedup-right for
    * FULL) + plain RIGHT/FULL JOIN; recurses until none remain.
    */
  private def rewriteAnyRightOnce(q: String): String =
    anyRightNamedRe.findAllMatchIn(q).find(m => !inLiteralAt(q, m.start)) match {
      case Some(m) =>
        val lt = m.group(1)
        val laRaw = m.group(2).trim
        val la =
          if (laRaw.isEmpty) unquoteIdent(lt).split('.').last
          else laRaw.replaceFirst("(?i)^AS\\s+", "")
        val full = m.group(3).equalsIgnoreCase("FULL")
        val jn = if (full) "ANY FULL JOIN" else "ANY RIGHT JOIN"
        val rt = m.group(4)
        val raRaw = m.group(5).trim
        val ra =
          if (raRaw.isEmpty) unquoteIdent(rt).split('.').last
          else raRaw.replaceFirst("(?i)^AS\\s+", "")
        val kind = m.group(6).toUpperCase(Locale.ROOT)
        val condEnd = clauseExtent(q, m.end, joinCondBounds)
        val cond = q.substring(m.end, condEnd).trim
        // dedup keys: USING names them directly (same spelling both sides);
        // ON takes each equality's alias-qualified ref per side
        val usingKeys: Seq[String] =
          if (kind == "USING") {
            val inner =
              if (cond.startsWith("(")) cond.stripPrefix("(").reverse
                .dropWhile(_ != ')').drop(1).reverse
              else cond
            splitTopLevel(inner).map(unquoteIdent)
          } else Nil
        val lKeys = if (kind == "USING") usingKeys else anyKeysFor(la, cond, jn)
        val lSub = anyDedupSub(lt, lKeys, "anyr_i")
        val rightText =
          if (full) {
            val rKeys = if (kind == "USING") usingKeys else anyKeysFor(ra, cond, jn)
            s"${anyDedupSub(rt, rKeys, "anyf_i")} $ra"
          } else s"${m.group(4)}${m.group(5)}"
        val jw = if (full) "FULL JOIN" else "RIGHT JOIN"
        rewriteAnyRightOnce(q.substring(0, m.start) +
          s"FROM $lSub $la $jw $rightText ${m.group(6)}" +
          q.substring(m.end))
      case None => q
    }

  @tailrec
  private[engine] final def rewriteAnyJoin(qIn: String): String = {
    val q = rewriteAnyRightOnce(liftAnySubqueries(qIn))
    anyRightRe.findAllMatchIn(q).find(m => !inLiteralAt(q, m.start)).foreach { m =>
      throw new UnsupportedOperationException(
        s"ANY ${m.group(1).toUpperCase(Locale.ROOT)} JOIN is supported as: " +
          "FROM <table|(subquery)> [alias] ANY RIGHT|FULL JOIN " +
          "<table|(subquery)> [alias] ON <equalities>/USING (cols) — " +
          "an unaliased subquery side needs an alias for the lift")
    }
    anyJoinRe.findAllMatchIn(q).find(m => !inLiteralAt(q, m.start)) match {
      case Some(m) =>
        val joinWord =
          Option(m.group(1)).map(_.trim.toUpperCase(Locale.ROOT)).getOrElse("INNER")
        val rt = m.group(2)
        val raRaw = m.group(3).trim
        val ra =
          if (raRaw.isEmpty) unquoteIdent(rt).split('.').last
          else raRaw.replaceFirst("(?i)^AS\\s+", "")
        val kind = m.group(4).toUpperCase(Locale.ROOT)
        val condEnd = clauseExtent(q, m.end, joinCondBounds)
        val cond = q.substring(m.end, condEnd).trim
        val keys: Seq[String] =
          if (kind == "USING") {
            val inner =
              if (cond.startsWith("(")) cond.stripPrefix("(").reverse
                .dropWhile(_ != ')').drop(1).reverse
              else cond
            splitTopLevel(inner).map(unquoteIdent)
          } else {
            splitTopLevelWord(cond, "AND").map { c =>
              // exactly one bare '=' — a '!='/'<='/'>' condition is not a
              // dedup key and would silently break the at-most-one contract
              require(c.matches("(?s)^[^=<>!]+=[^=<>!]+$"),
                s"ANY JOIN supports only AND-chained equality conditions (got '$c')")
              val refs = c.split("=", 2).map(_.trim)
              val rRef = refs.find { r =>
                val parts = r.split("\\.", 2)
                parts.length == 2 && unquoteIdent(parts(0)).equalsIgnoreCase(ra)
              }.getOrElse(throw new IllegalArgumentException(
                s"ANY JOIN ON condition '$c' has no side qualified by the right " +
                  s"table's alias '$ra' — qualify the right-side column"))
              unquoteIdent(rRef.split("\\.", 2)(1))
            }
          }
        val keysLower = keys.map(_.toLowerCase(Locale.ROOT)).toSet
        val schema = probeSchema(rt)
        val ordCols = schema.fields.toSeq
          .filterNot(f => keysLower(f.name.toLowerCase(Locale.ROOT)) ||
            f.dataType.isInstanceOf[MapType])
          .map(f => s"`${f.name}` ASC NULLS FIRST")
        val ord =
          if (ordCols.nonEmpty) ordCols.mkString(", ")
          else keys.map(k => s"`$k`").mkString(", ")
        val part = keys.map(k => s"`$k`").mkString(", ")
        val jw = if (joinWord == "INNER") "JOIN" else s"$joinWord JOIN"
        val aliasText = if (raRaw.isEmpty) ra else raRaw
        val sub = s"(SELECT * EXCEPT (__graft_any_rn) FROM (SELECT *, " +
          s"row_number() OVER (PARTITION BY $part ORDER BY $ord) AS " +
          s"__graft_any_rn FROM $rt) __graft_any_i WHERE __graft_any_rn = 1)"
        rewriteAnyJoin(q.substring(0, m.start) +
          s"$jw $sub $aliasText ${m.group(4)}" + q.substring(m.end))
      case _ =>
        // leftover ANY JOIN = a shape the rewriter does not parse (subquery
        // or quoted right side). Spark would silently read `ANY` as a table
        // alias and run a plain join — fail with the contract instead.
        anyLeftoverRe.findAllMatchIn(q).find(m => !inLiteralAt(q, m.start))
          .foreach { _ =>
            throw new UnsupportedOperationException(
              "ANY JOIN is supported as: ANY [LEFT|INNER] JOIN <table> [alias] " +
                "ON <equalities>/USING (cols) — wrap subquery sides in named " +
                "temp views first (a relation literally aliased `any` must be " +
                "renamed on this surface)")
          }
        q
    }
  }

  // ---- ASOF JOIN ----------------------------------------------------------
  // ClickHouse `ASOF [LEFT] JOIN r ON l.k = r.k AND l.ts >= r.ts`: per left
  // row, the closest right row at-or-before (>= — backward) / at-or-after
  // (<= — forward) the left timestamp within each key group. Routed onto the
  // existing AsOfJoin operator (same surface as q72's merge_asof): ONE
  // union+window shuffle on the keys, no pair explosion — the same plan a
  // 1000-executor cluster wants. ClickHouse's default strictness is INNER
  // (unmatched left rows dropped); `ASOF LEFT JOIN` keeps them with NULLs.
  // Scope: both sides are named tables/views or lifted subqueries; all four
  // bounds (>=/<=/>/<) accepted — strict bounds (r18) exclude exact-equal
  // timestamps via the carry window's tie order; right-side non-key columns that
  // collide with left column names are refused (project/rename first). The
  // matched right timestamp is exposed under its own column name when it
  // differs from the left's (ClickHouse exposes r.ts the same way).
  private val asofRe =
    ("(?is)\\bFROM\\s+([A-Za-z_][\\w.]*|`[^`]+`)" +
      "((?:\\s+(?:AS\\s+)?(?!(?:ASOF|LEFT|INNER|CROSS|JOIN|WHERE|GROUP|ORDER" +
      "|LIMIT|HAVING|UNION|ON|USING|SAMPLE|FINAL)\\b)[A-Za-z_]\\w*)?)" +
      "\\s+ASOF\\s+(LEFT\\s+)?JOIN\\s+([A-Za-z_][\\w.]*|`[^`]+`)" +
      "((?:\\s+(?:AS\\s+)?(?!ON\\b)[A-Za-z_]\\w*)?)\\s+ON\\b").r
  private val asofLeftoverRe = "(?i)\\bASOF\\s+(LEFT\\s+)?JOIN\\b".r
  // `ASOF [LEFT] JOIN t USING (k1, …, kn, ts)` (r18 — the ClickHouse
  // shorthand; DuckDB spells it identically): the LAST listed column is the
  // inequality column with >= (backward) semantics, the rest are equality
  // keys. Rewritten textually to the ON form; both sides then share the
  // key/ts names, so the ON machinery's same-name handling applies.
  private val asofUsingRe =
    ("(?is)\\bFROM\\s+([A-Za-z_][\\w.]*|`[^`]+`)" +
      "((?:\\s+(?:AS\\s+)?(?!(?:ASOF|LEFT|INNER|CROSS|JOIN|WHERE|GROUP|ORDER" +
      "|LIMIT|HAVING|UNION|ON|USING|SAMPLE|FINAL)\\b)[A-Za-z_]\\w*)?)" +
      "\\s+ASOF\\s+(LEFT\\s+)?JOIN\\s+([A-Za-z_][\\w.]*|`[^`]+`)" +
      "((?:\\s+(?:AS\\s+)?(?!(?:ON|USING)\\b)[A-Za-z_]\\w*)?)" +
      "\\s+USING\\s*\\(([^)]*)\\)").r
  private def rewriteAsofUsing(q: String): String =
    asofUsingRe.replaceAllIn(q, { m =>
      if (inLiteralAt(q, m.start)) qr(m.matched)
      else {
        def aliasOf(name: String, aliasGrp: String): String = {
          val a = aliasGrp.trim.replaceFirst("(?i)^AS\\s+", "")
          if (a.isEmpty) unquoteIdent(name).split('.').last else a
        }
        val lAlias = aliasOf(m.group(1), m.group(2))
        val rAlias = aliasOf(m.group(4), m.group(5))
        val cols = splitTopLevel(m.group(6)).map(unquoteIdent)
        require(cols.length >= 2,
          "ASOF JOIN USING needs at least one key and the trailing ordering column")
        val ts = cols.last
        val conds = cols.init.map(k => s"$lAlias.`$k` = $rAlias.`$k`") :+
          s"$lAlias.`$ts` >= $rAlias.`$ts`"
        qr(s"FROM ${m.group(1)}${m.group(2)} ASOF " +
          s"${Option(m.group(3)).getOrElse("")}JOIN ${m.group(4)}${m.group(5)} " +
          s"ON ${conds.mkString(" AND ")}")
      }
    })
  private[engine] def rewriteAsofJoin(q: String): String = {
    val lifted = rewriteAsofUsing(liftAsofSubqueries(q))
    val out = rewriteAsofJoinOnce(lifted)
    if (out eq lifted) {
      // leftover ASOF JOIN (any depth) = a shape v1 does not parse; fail
      // with the contract instead of Spark's opaque parse error
      asofLeftoverRe.findAllMatchIn(lifted).find(m => !inLiteralAt(lifted, m.start))
        .foreach { _ =>
          throw new UnsupportedOperationException(
            "ASOF JOIN is supported as: FROM <table|(subquery)> [alias] ASOF " +
              "[LEFT] JOIN <table|(subquery)> [alias] ON <equi-conditions " +
              "AND one >=/<=/>/< condition>")
        }
      lifted
    } else rewriteAsofJoin(out)
  }

  /** Subquery sides of an ASOF JOIN (r17): `FROM (SELECT …) a ASOF JOIN
    * (SELECT …) b ON …` — each parenthesized side is materialized as a temp
    * VIEW (a name the operator rewrite can `spark.table()`), and the text is
    * rewritten to reference it. The subquery runs through the full dialect
    * chain (self.sql), so nested ClickHouse constructs inside it work too.
    * View registration is analysis-only — no job runs until the result is
    * consumed.
    */
  private def liftAsofSubqueries(q: String): String =
    liftJoinSubqueries(q, s => asofLeftoverRe.findAllMatchIn(s)
      .find(m => !inLiteralAt(s, m.start)).map(_.start))

  /** ANY-join flavor of the same lift (r19) — closes the r18 refusal on
    * subquery-sided ANY RIGHT and enables subquery sides for ANY FULL.
    */
  private val anyAnyRe =
    "(?i)\\bANY\\s+(?:(?:RIGHT|FULL|LEFT|INNER)\\s+)?JOIN\\b".r
  private def liftAnySubqueries(q: String): String =
    liftJoinSubqueries(q, s => anyAnyRe.findAllMatchIn(s)
      .find(m => !inLiteralAt(s, m.start)).map(_.start))

  private def liftJoinSubqueries(q: String,
      findKw: String => Option[Int]): String = {
    val asofAt = findKw(q).getOrElse(return q)
    def matchForward(open: Int): Int = { // index of the matching ')'
      var d = 0; var i = open; var inStr = false; var inTick = false
      while (i < q.length) {
        val c = q.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else if (inTick) { if (c == '`') inTick = false }
        else c match {
          case '\'' => inStr = true
          case '`' => inTick = true
          case '(' => d += 1
          case ')' => d -= 1; if (d == 0) return i
          case _ =>
        }
        i += 1
      }
      -1
    }
    def mkView(sub: String): String = {
      val vn = s"__graft_asof_sub_${DialectWave2.viewCounter.incrementAndGet() & 63}"
      self.sql(sub).createOrReplaceTempView(vn)
      vn
    }
    // RIGHT side: "(…)" directly after the JOIN keyword
    val joinEnd = q.toUpperCase(Locale.ROOT).indexOf("JOIN", asofAt) + 4
    var out = q
    var i = joinEnd
    while (i < out.length && Character.isWhitespace(out.charAt(i))) i += 1
    if (i < out.length && out.charAt(i) == '(') {
      val close = matchForward(i)
      require(close > 0, "join subquery lift: unbalanced parenthesis in right side")
      val vn = mkView(out.substring(i + 1, close))
      out = out.substring(0, i) + vn + out.substring(close + 1)
    }
    // LEFT side: "… FROM (…) [AS] alias ASOF/ANY" — walk back over the alias
    val asofAt2 = findKw(out).getOrElse(return out)
    var j = asofAt2 - 1
    while (j >= 0 && Character.isWhitespace(out.charAt(j))) j -= 1
    val aliasEnd = j
    while (j >= 0 && (Character.isLetterOrDigit(out.charAt(j)) || out.charAt(j) == '_')) j -= 1
    val hasAlias = j < aliasEnd
    // optional AS before the alias
    var k = j
    while (k >= 0 && Character.isWhitespace(out.charAt(k))) k -= 1
    if (hasAlias && k >= 1 &&
        out.substring(k - 1, k + 1).equalsIgnoreCase("AS") &&
        (k - 2 < 0 || !Character.isLetterOrDigit(out.charAt(k - 2)))) k -= 2
    while (k >= 0 && Character.isWhitespace(out.charAt(k))) k -= 1
    if (hasAlias && k >= 0 && out.charAt(k) == ')') {
      // find the '(' matching the ')' at k with one literal-aware forward
      // scan (a reverse count would miscount parens inside string literals)
      var open = -1
      val stack = new java.util.ArrayDeque[Integer]()
      var p = 0; var inStr = false; var inTick = false
      while (p <= k) {
        val c = out.charAt(p)
        if (inStr) { if (c == '\'') inStr = false }
        else if (inTick) { if (c == '`') inTick = false }
        else c match {
          case '\'' => inStr = true
          case '`' => inTick = true
          case '(' => stack.push(p)
          case ')' =>
            val o = if (stack.isEmpty) -1 else stack.pop().intValue
            if (p == k) open = o
          case _ =>
        }
        p += 1
      }
      require(open >= 0, "join subquery lift: unbalanced parenthesis in left side")
      val vn = mkView(out.substring(open + 1, k))
      out = out.substring(0, open) + vn + out.substring(k + 1)
    }
    out
  }
  private def rewriteAsofJoinOnce(q: String): String =
    asofRe.findAllMatchIn(q).find(m => !inLiteralAt(q, m.start)) match {
      case Some(m) =>
        val lName = unquoteIdent(m.group(1))
        val lAlias = {
          val a = m.group(2).trim.replaceFirst("(?i)^AS\\s+", "")
          if (a.isEmpty) lName.split('.').last else a
        }
        val leftOuter = m.group(3) != null
        val rName = unquoteIdent(m.group(4))
        val rAlias = {
          val a = m.group(5).trim.replaceFirst("(?i)^AS\\s+", "")
          if (a.isEmpty) rName.split('.').last else a
        }
        require(!lAlias.equalsIgnoreCase(rAlias),
          s"ASOF JOIN: both sides resolve to the alias '$lAlias' — alias one")
        // the textual rewrite re-homes `rAlias.` refs onto the joined view;
        // that is only sound when neither alias is ALSO bound to another
        // relation in the statement (same-named aliases in subqueries/UNION
        // branches would be corrupted — refuse instead)
        Seq(lAlias, rAlias).foreach { a =>
          require(aliasBindings(q, a) <= 1,
            s"ASOF JOIN: alias '$a' is bound to more than one relation in " +
              "the statement — the textual rewrite cannot scope qualifiers; " +
              "rename one of them")
        }
        val condEnd = clauseExtent(q, m.end, joinCondBounds)
        val cond = q.substring(m.end, condEnd).trim
        val lDf = spark.table(lName)
        val rDf0 = spark.table(rName)
        val lColsLower = lDf.columns.map(_.toLowerCase(Locale.ROOT)).toSet
        val rColsLower = rDf0.columns.map(_.toLowerCase(Locale.ROOT)).toSet
        // ON-clause spellings are case-insensitive SQL; the operator works on
        // exact names — canonicalize to each side's schema spelling
        def canonL(c: String): String =
          lDf.columns.find(_.equalsIgnoreCase(c)).getOrElse(c)
        def canonR(c: String): String =
          rDf0.columns.find(_.equalsIgnoreCase(c)).getOrElse(c)

        // classify each AND-ed condition: (leftRef, op, rightRef)
        case class Cmp(lCol: String, op: String, rCol: String)
        val opRe = "(?s)^(.*?)(>=|<=|>|<|=)(.*)$".r
        def resolve(ref0: String): (String, String) = { // (side, col)
          val ref = ref0.trim
          val parts = ref.split("\\.", 2).map(unquoteIdent)
          require(ref.matches("[A-Za-z_`][\\w.`]*"),
            s"ASOF JOIN ON conditions must be plain column references (got '$ref')")
          if (parts.length == 2) {
            if (parts(0).equalsIgnoreCase(lAlias)) ("l", canonL(parts(1)))
            else if (parts(0).equalsIgnoreCase(rAlias)) ("r", canonR(parts(1)))
            else throw new IllegalArgumentException(
              s"ASOF JOIN: qualifier '${parts(0)}' is neither side's alias")
          } else {
            val c = parts(0).toLowerCase(Locale.ROOT)
            (lColsLower(c), rColsLower(c)) match {
              case (true, false) => ("l", canonL(parts(0)))
              case (false, true) => ("r", canonR(parts(0)))
              case (true, true) => throw new IllegalArgumentException(
                s"ASOF JOIN: unqualified column '$ref' exists on both sides")
              case _ => throw new IllegalArgumentException(
                s"ASOF JOIN: column '$ref' not found on either side")
            }
          }
        }
        val cmps = splitTopLevelWord(cond, "AND").map { c =>
          opRe.findFirstMatchIn(c) match {
            case Some(cm) =>
              val (s1, c1) = resolve(cm.group(1))
              val (s2, c2) = resolve(cm.group(3))
              require(s1 != s2, s"ASOF JOIN condition '$c' references one side twice")
              val op = cm.group(2)
              if (s1 == "l") Cmp(c1, op, c2)
              else Cmp(c2, op match { // normalize to left-op-right
                case ">=" => "<="
                case "<=" => ">="
                case ">" => "<"
                case "<" => ">"
                case "=" => "="
              }, c1)
            case None => throw new IllegalArgumentException(
              s"ASOF JOIN: cannot parse condition '$c'")
          }
        }
        val (ineqs, eqs) = cmps.partition(_.op != "=")
        require(ineqs.length == 1,
          s"ASOF JOIN needs exactly one inequality condition (got ${ineqs.length})")
        val ineq = ineqs.head
        // strict bounds (r18): ClickHouse accepts all four of >=/<=/>/<;
        // `l.ts > r.ts` = backward match excluding exact-equal timestamps
        val strict = ineq.op == ">" || ineq.op == "<"
        val forward = ineq.op == "<=" || ineq.op == "<"
        val leftTs = ineq.lCol
        val rightTs = ineq.rCol
        require(eqs.nonEmpty, "ASOF JOIN needs at least one equality (key) condition")
        require(!eqs.exists(e => e.rCol.equalsIgnoreCase(rightTs)),
          "ASOF JOIN: the inequality column cannot also be an equality key")

        // rename right keys onto the left key names (operator contract)
        val rDf = eqs.foldLeft(rDf0) { (d, e) =>
          if (e.lCol == e.rCol) d else d.withColumnRenamed(e.rCol, e.lCol)
        }
        val byKeys = eqs.map(_.lCol)
        val rightCols = rDf.columns.toSeq
          .filterNot(c => byKeys.exists(_.equalsIgnoreCase(c)) ||
            c.equalsIgnoreCase(rightTs))
        val collisions = rightCols.filter(c => lColsLower(c.toLowerCase(Locale.ROOT)))
        require(collisions.isEmpty,
          s"ASOF JOIN: right-side columns ${collisions.mkString(", ")} collide " +
            "with left column names — project or rename them in a view first")

        val joined0 =
          if (forward)
            AsOfJoin.forward(lDf, rDf, byKeys, leftTs, rightTs, rightCols,
              tsOut = leftTs, keepMatchTs = true, strict = strict)
          else
            AsOfJoin.backward(lDf, rDf, byKeys, leftTs, rightTs, rightCols,
              tsOut = leftTs, keepMatchTs = true, strict = strict)
        val joined1 =
          if (leftOuter) joined0
          else joined0.filter(col("__asof_match_ts").isNotNull)
        val exposeRts = !rightTs.equalsIgnoreCase(leftTs) &&
          !lColsLower(rightTs.toLowerCase(Locale.ROOT))
        val replaced0 = q.substring(0, m.start) + s"FROM $vnPlaceholder $lAlias " +
          q.substring(condEnd)
        // When the right timestamp shares its name with a left column (the
        // common `ON l.k=r.k AND l.ts >= r.ts` same-name shape), dropping
        // the match ts and letting mapQualifier re-home `rAlias.ts` onto the
        // LEFT alias would silently return the left timestamp where
        // ClickHouse returns the matched right value (r16 ADVICE). Instead:
        // if the statement still references `rAlias.<rightTs>`, expose the
        // match ts under a disambiguated name and rewrite those references
        // to it BEFORE the blanket qualifier re-homing.
        val rtsRefRe = ("(?i)(?<![\\w.`])" + Regex.quote(rAlias) +
          "\\s*\\.\\s*(`" + Regex.quote(rightTs) + "`|" + Regex.quote(rightTs) +
          ")(?![\\w`])").r
        val rtsReferenced = !exposeRts && rtsRefRe.findAllMatchIn(replaced0)
          .exists(mm => !inLiteralAt(replaced0, mm.start))
        val disamb = s"__asof_r_${rightTs.toLowerCase(Locale.ROOT)}"
        val (joined, replaced1) =
          if (exposeRts)
            (joined1.withColumnRenamed("__asof_match_ts", rightTs), replaced0)
          else if (rtsReferenced)
            (joined1.withColumnRenamed("__asof_match_ts", disamb),
              rtsRefRe.replaceAllIn(replaced0, mm =>
                if (inLiteralAt(replaced0, mm.start)) qr(mm.matched)
                else qr(s"`$disamb`")))
          else (joined1.drop("__asof_match_ts"), replaced0)

        // rotating view-name pool: createOrReplaceTempView overwrites the
        // slot, so a long-lived session does not leak one catalog entry per
        // ASOF statement. An already-returned DataFrame is unaffected (its
        // plan was resolved at parse time); a collision would need 64
        // statements in flight between rewrite and parse simultaneously.
        val vn = s"__graft_asof_${DialectWave2.viewCounter.incrementAndGet() & 63}"
        joined.createOrReplaceTempView(vn)
        // the view carries BOTH sides' columns; aliasing it with the LEFT
        // alias keeps `lAlias.col` refs (including correlated ones in
        // subqueries) resolving unchanged — only `rAlias.` is re-homed
        mapQualifier(replaced1.replace(vnPlaceholder, vn), rAlias, lAlias)
      case _ => q
    }

  /** Number of places the statement binds `alias` to a relation: after a
    * FROM/JOIN table reference or a subquery's closing paren. Literal-aware.
    * Used to refuse ASOF rewrites whose qualifier re-homing would leak into
    * another scope that reuses the alias name.
    */
  private def aliasBindings(q: String, alias: String): Int = {
    val re = ("(?is)(?:\\bFROM\\s+[A-Za-z_`][\\w.`]*|\\bJOIN\\s+[A-Za-z_`]" +
      "[\\w.`]*|\\))\\s+(?:AS\\s+)?" + Regex.quote(alias) + "\\b").r
    re.findAllMatchIn(q).count(m => !inLiteralAt(q, m.start))
  }

  /** Re-home `from.` qualifiers onto `to.` (the asof view carries both
    * sides' columns under the `to` alias). Word-anchored and literal-aware;
    * `t.from.x` chains are untouched.
    */
  private def mapQualifier(q: String, from: String, to: String): String = {
    val re = ("(?i)(?<![\\w.`])" + Regex.quote(from) + "\\s*\\.").r
    re.replaceAllIn(q, m => if (inLiteralAt(q, m.start)) qr(m.matched) else s"$to.")
  }

  private val identRe = "`[^`]+`|[A-Za-z_]\\w*".r

  /** Lower-cased column-shaped identifiers in a scalar expression: bare or
    * backtick-quoted names that are not function calls (no following paren),
    * not qualified (no adjacent dot), and not inside string literals.
    * Keywords fall out naturally — they never match a result column name.
    */
  private def exprColumnRefs(expr: String): Set[String] =
    identRe.findAllMatchIn(expr).filter { m =>
      !inLiteralAt(expr, m.start) &&
        (m.start == 0 || expr.charAt(m.start - 1) != '.') && {
          var j = m.end
          while (j < expr.length && Character.isWhitespace(expr.charAt(j))) j += 1
          !(j < expr.length && (expr.charAt(j) == '(' || expr.charAt(j) == '.'))
        }
    }.map(m => unquoteIdent(m.matched).toLowerCase(Locale.ROOT)).toSet

  /** Replace each reference to a column in `cols` (lower-cased names) with
    * `lag(col) <lagW>` — turning "expr over this row" into "expr over the
    * previous output row". Same identifier discipline as [[exprColumnRefs]].
    */
  private def rewriteExprRefs(expr: String, cols: Set[String], lagW: String): String =
    rewriteExprRefsTo(expr, cols, u => s"lag(`$u`) $lagW")

  /** Generalized form (r19): each reference to a column in `cols` is
    * replaced by `f(name)` — the lag-window device above and the chain
    * fold's `acc.`col`` both ride this.
    */
  private def rewriteExprRefsTo(expr: String, cols: Set[String],
      f: String => String): String =
    identRe.replaceAllIn(expr, m => {
      val isRef = !inLiteralAt(expr, m.start) &&
        (m.start == 0 || expr.charAt(m.start - 1) != '.') && {
          var j = m.end
          while (j < expr.length && Character.isWhitespace(expr.charAt(j))) j += 1
          !(j < expr.length && (expr.charAt(j) == '(' || expr.charAt(j) == '.'))
        }
      val u = unquoteIdent(m.matched)
      if (isRef && cols(u.toLowerCase(Locale.ROOT)))
        qr(f(u)) else qr(m.matched)
    })

  // ---- scalar WITH (ClickHouse CTE extension) -------------------------------
  // `WITH <expr> AS <ident>[, …] SELECT …` — ClickHouse's scalar alias form
  // (expr may be a constant, a function call, or a scalar subquery), which
  // ANSI/Spark SQL cannot parse (Spark's WITH needs `ident AS (subquery)`).
  // Rewrite: each scalar entry is INLINED as `(expr)` at every unqualified,
  // non-alias-position reference in the statement (and in later scalar
  // entries); standard `ident AS (subquery)` entries in the same list are
  // kept as a normal WITH prefix. Documented divergence: ClickHouse lets a
  // real column of the same name shadow the alias — inlining always wins
  // here, so name your aliases distinctly. Only the statement-level leading
  // WITH is handled; an inner scalar WITH still fails Spark's parser loudly.
  private val leadingWithRe = "(?is)^\\s*WITH\\b".r
  // a standard CTE entry: `ident [(col, …)] AS ( subquery )`
  private val stdCteRe =
    "(?is)^\\s*(?:[A-Za-z_]\\w*|`[^`]+`)\\s*(?:\\([^)]*\\))?\\s*AS\\s*\\(.*\\)\\s*$".r
  private val scalarTailRe = "(?is)^([A-Za-z_]\\w*|`[^`]+`)\\s*$".r

  private[engine] def rewriteScalarWith(q: String): String = {
    val m = leadingWithRe.findFirstMatchIn(q).getOrElse(return q)
    // the WITH list ends at the first top-level SELECT after it
    val selAt = clauseExtent(q, m.end, Seq("SELECT"))
    if (selAt >= q.length) return q
    val listText = q.substring(m.end, selAt)
    if (!parenBalanced(listText)) return q
    val entries = splitTopLevel(listText)
    if (entries.forall(e => stdCteRe.pattern.matcher(e).matches())) return q
    // classify each entry: standard CTE kept; `expr AS ident` inlined
    var rest = q.substring(selAt)
    val kept = Seq.newBuilder[String]
    val scalars = Seq.newBuilder[(String, String)] // (ident, expr)
    entries.foreach { e =>
      if (stdCteRe.pattern.matcher(e).matches()) kept += e.trim
      else {
        // the LAST top-level AS splits expr from the alias ident
        val u = e.toUpperCase(Locale.ROOT)
        var d = 0; var i = 0; var inStr = false; var inTick = false
        var lastAs = -1
        while (i < e.length - 1) {
          val c = e.charAt(i)
          if (inStr) { if (c == '\'') inStr = false }
          else if (inTick) { if (c == '`') inTick = false }
          else c match {
            case '\'' => inStr = true
            case '`' => inTick = true
            case '(' => d += 1
            case ')' => d -= 1
            case _ =>
              if (d == 0 && u.startsWith("AS", i) &&
                  (i == 0 || !Character.isLetterOrDigit(u.charAt(i - 1)) && u.charAt(i - 1) != '_') &&
                  (i + 2 >= u.length || !Character.isLetterOrDigit(u.charAt(i + 2)) && u.charAt(i + 2) != '_'))
                lastAs = i
          }
          i += 1
        }
        require(lastAs > 0, s"WITH: cannot parse entry '$e' — expected " +
          "`expr AS ident` (ClickHouse scalar alias) or `ident AS (subquery)`")
        val ident = e.substring(lastAs + 2).trim
        require(scalarTailRe.pattern.matcher(ident).matches(),
          s"WITH: '$e' does not end in a plain alias identifier")
        scalars += ((unquoteIdent(ident), e.substring(0, lastAs).trim))
      }
    }
    // inline each scalar into LATER scalar exprs and the statement body —
    // unqualified references only, never in alias-definition position
    var resolved = Seq.empty[(String, String)]
    scalars.result().foreach { case (ident, expr0) =>
      val expr = resolved.foldLeft(expr0) { case (e, (n, v)) =>
        inlineIdent(e, n, v)
      }
      resolved :+= ((ident, expr))
    }
    resolved.foreach { case (n, v) => rest = inlineIdent(rest, n, v) }
    // standard CTE bodies in the same list may reference the scalars too
    val keptList = kept.result().map(e =>
      resolved.foldLeft(e) { case (t, (n, v)) => inlineIdent(t, n, v) })
    val prefix = if (keptList.isEmpty) "" else keptList.mkString("WITH ", ", ", " ")
    q.substring(0, m.start) + prefix + rest.trim
  }

  /** Replace unqualified, non-call, non-alias-position references to
    * `ident` with `(expr)` — word-anchored and literal-aware.
    */
  private def inlineIdent(text: String, ident: String, expr: String): String = {
    val re = ("(?i)(?<![\\w.`])(?:" + Regex.quote(ident) + "|`" +
      Regex.quote(ident) + "`)(?![\\w`])").r
    re.replaceAllIn(text, mm => {
      val before = text.substring(0, mm.start)
      // alias-definition position: immediately preceded by AS
      val isAliasDef = "(?is).*\\bAS\\s*$".r.pattern.matcher(before).matches()
      var j = mm.end
      while (j < text.length && Character.isWhitespace(text.charAt(j))) j += 1
      val isCall = j < text.length && text.charAt(j) == '('
      if (inLiteralAt(text, mm.start) || isAliasDef || isCall) qr(mm.matched)
      else qr(s"($expr)")
    })
  }

  // ---- GROUP BY … WITH TOTALS ---------------------------------------------
  // ClickHouse's extra grand-total row → ANSI `GROUPING SETS ((keys), ())`.
  // Documented divergence: the totals row carries NULL group keys (the
  // ANSI/Spark grouping-sets convention) where ClickHouse fills type
  // defaults (0/''); the aggregate values are identical.
  // scanner-based, not one lazy regex: the keys span is the text between
  // this TOTALS and the NEAREST preceding GROUP BY with a paren-balanced
  // span — a lazy (.+?) anchored on the leftmost GROUP BY would latch onto
  // a subquery's inner GROUP BY and consume (and so never rewrite) the
  // real outer clause.
  private val totalsWordRe = "(?i)\\bWITH\\s+TOTALS\\b".r
  private val groupByRe = "(?i)\\bGROUP\\s+BY\\b".r
  private[engine] def rewriteWithTotals(q: String): String =
    totalsWordRe.findAllMatchIn(q).find(m => !inLiteralAt(q, m.start)) match {
      case Some(m) =>
        val gb = groupByRe.findAllMatchIn(q.substring(0, m.start)).toSeq
          .filter(g => !inLiteralAt(q, g.start))
          .reverse.find(g => parenBalanced(q.substring(g.end, m.start)))
          .getOrElse(throw new IllegalArgumentException(
            "WITH TOTALS without a matching GROUP BY"))
        val keys = q.substring(gb.end, m.start).trim
        // ROLLUP/CUBE/GROUPING SETS + TOTALS (r18): the totals row is one
        // MORE grand-aggregate row on top of whatever () set the analytic
        // form already emits (ClickHouse prints it in its separate totals
        // block; flattened here, so rollup+totals carries two all-NULL-key
        // rows — the ClickHouse row multiset, minus the block framing).
        // Spark accepts duplicate grouping sets (Expand emits one
        // projection per set), so appending () is the whole rewrite.
        val totalsForm =
          if (keys.matches("(?is)^(ROLLUP|CUBE)\\s*\\(.*\\)\\s*$"))
            s"GROUP BY GROUPING SETS ($keys, ())"
          else if (keys.matches("(?is)^GROUPING\\s+SETS\\s*\\(.*\\)\\s*$")) {
            val close = keys.lastIndexOf(')')
            s"GROUP BY ${keys.substring(0, close)}, ()${keys.substring(close)}"
          } else if (keys.matches("(?is).*\\b(ROLLUP|CUBE|GROUPING)\\b.*"))
            throw new UnsupportedOperationException(
              "WITH TOTALS supports plain keys, ROLLUP(…), CUBE(…), or " +
                "GROUPING SETS(…) — not mixed/concatenated analytic forms")
          else s"GROUP BY GROUPING SETS (($keys), ())"
        rewriteWithTotals(q.substring(0, gb.start) + totalsForm + q.substring(m.end))
      case None => q
    }

  // ---- ORDER BY col WITH FILL ---------------------------------------------
  // ClickHouse's gap-filling ORDER BY modifier: emit a row for every grid
  // point FROM..TO (TO exclusive; defaults = the column's min/max, max
  // inclusive) STEP s that has no source row. Spark-first shape: the grid
  // comes from `sequence()` (generated in executors), missing points are
  // found with ONE anti-join against the source, and the union re-sorts —
  // no driver loop, no collect. Gap rows carry ClickHouse-style type
  // defaults (0 for numbers, '' for strings, false for booleans) and NULL
  // for other types. Fill columns: integral (numeric grid, integer STEP) or
  // DATE/TIMESTAMP (`STEP INTERVAL n unit`, default INTERVAL 1 DAY; FROM/TO
  // accept DATE/TIMESTAMP literals). `INTERPOLATE (c1[, c2…])` carries each
  // listed column's most recent NON-NULL source value into GAP ROWS ONLY —
  // source rows keep their own values, including legitimate NULLs
  // (ClickHouse computes INTERPOLATE only for inserted rows; a NULL-valued
  // source row is carried as the older non-null value in following gaps —
  // the one documented ignore-nulls divergence). `col AS expr` (r17)
  // computes expr over the previous OUTPUT row via lag() when expr
  // references only non-interpolated columns; SELF-referential chains stay
  // refused — they recur on their own previous OUTPUT, which no
  // fixed-depth window expresses; bare `INTERPOLATE ()` carries every
  // non-fill column. The
  // interpolation window is a global last_value IGNORE NULLS over the fill
  // order — sized for the ordered, presentation-bound results WITH FILL
  // produces, like ClickHouse's own single-stream fill — EXCEPT grouped
  // fills (below), whose windows partition by the prefix. Scope: one fill
  // column (the LAST sort key), ASC or DESC (r17 — DESC walks FROM
  // (default max) downward to TO (default min; explicit TO exclusive at
  // the bottom)), optionally preceded by plain sort columns
  // (`ORDER BY key, ts WITH FILL`, r17): those become a PER-GROUP fill —
  // per-group default bounds from one grouped aggregate, a grid
  // co-partitioned with the keys, gap rows carrying the group's values
  // (ClickHouse copies the prefix from the previous row — identical within
  // a sorted group), and prefix-PARTITIONed interpolation windows.
  private val fillRe =
    ("(?is)^(.*\\S)\\s+ORDER\\s+BY\\s+" +
      "((?:(?:[A-Za-z_]\\w*|`[^`]+`)(?:\\s+(?:ASC|DESC))?\\s*,\\s*)*)" +
      "([A-Za-z_]\\w*|`[^`]+`)(\\s+(?:ASC|DESC))?" +
      "\\s+WITH\\s+FILL" +
      "(\\s+FROM\\s+(-?\\d+|DATE\\s+'[^']+'|TIMESTAMP\\s+'[^']+'))?" +
      "(\\s+TO\\s+(-?\\d+|DATE\\s+'[^']+'|TIMESTAMP\\s+'[^']+'))?" +
      "(\\s+STEP\\s+(-?\\d+|INTERVAL\\s+\\d+\\s+[A-Za-z]+))?" +
      "(\\s+INTERPOLATE\\s*\\((.*)\\))?\\s*;?\\s*$").r
  private[engine] def rewriteWithFill(q: String): String =
    fillRe.findFirstMatchIn(q) match {
      case Some(m) if parenBalanced(m.group(1)) &&
          !inLiteralAt(q, q.toUpperCase(Locale.ROOT).lastIndexOf("WITH FILL")) =>
        val base = m.group(1)
        val fcName = unquoteIdent(m.group(3))
        val schema = probeSchema(s"( $base ) __graft_fill_probe")
        val f = schema.fields.find(_.name.equalsIgnoreCase(fcName)).getOrElse(
          throw new IllegalArgumentException(
            s"WITH FILL column '$fcName' is not in the result " +
              s"(${schema.fieldNames.mkString(", ")})"))
        val temporal = f.dataType match {
          case ByteType | ShortType | IntegerType | LongType => false
          case DateType | TimestampType | TimestampNTZType => true
          case other => throw new UnsupportedOperationException(
            s"WITH FILL supports integral and DATE/TIMESTAMP fill columns " +
              s"(got ${other.sql})")
        }
        val stepRaw = Option(m.group(10))
        // DESC fill (r17): the grid runs downward — FROM defaults to the
        // MAX (the start of a descending order), TO to the MIN; an explicit
        // TO is exclusive at the BOTTOM; the step is applied negatively.
        val desc = Option(m.group(4)).exists(_.trim.equalsIgnoreCase("DESC"))
        // grouped fill (r17): leading sort columns before the fill column
        // (`ORDER BY key, ts WITH FILL`) become a PER-GROUP fill — gap rows
        // carry the group's values (ClickHouse copies the prefix from the
        // previous row, which within a sorted group is the same thing), the
        // default bounds are per-group min/max, and every window is
        // PARTITIONed by the prefix, so the fill distributes across groups.
        val prefix: Seq[(String, String)] = // (schema-canonical name, dir)
          splitTopLevel(m.group(2).trim.stripSuffix(",")).filter(_.nonEmpty)
            .map { ent =>
              val mm = "(?is)^\\s*([A-Za-z_]\\w*|`[^`]+`)(\\s+(?:ASC|DESC))?\\s*$".r
                .findFirstMatchIn(ent).getOrElse(throw new IllegalArgumentException(
                  s"WITH FILL: cannot parse leading sort column '$ent'"))
              val u = unquoteIdent(mm.group(1))
              val name = schema.fields.find(_.name.equalsIgnoreCase(u)).getOrElse(
                throw new IllegalArgumentException(
                  s"WITH FILL: leading sort column '$u' is not in the result"))
                .name
              (name, Option(mm.group(2)).map(_.trim.toUpperCase(Locale.ROOT))
                .getOrElse("ASC"))
            }
        require(!prefix.exists(_._1.equalsIgnoreCase(f.name)),
          "WITH FILL: the fill column cannot also be a leading sort column")
        val grouped = prefix.nonEmpty
        val pRefs = prefix.map(p => s"`${p._1}`")
        val pSel = pRefs.mkString(", ")
        // grid cell type + expressions, by fill-column family. `gridCut` is
        // the explicit-TO exclusivity filter: the grid is generated through
        // TO inclusive and cut strictly-inside, so a TO that is NOT a whole
        // number of steps from FROM still yields every grid point before TO
        // (adjusting TO by one step would silently drop the last point).
        val (gridT, fromE, toI, stepE, gridCut) =
          if (temporal) {
            val step = stepRaw.getOrElse("INTERVAL 1 DAY")
            require(step.toUpperCase(Locale.ROOT).startsWith("INTERVAL"),
              "WITH FILL on a DATE/TIMESTAMP column needs STEP INTERVAL n unit")
            val stepSigned =
              if (desc) step.replaceFirst("(?i)^INTERVAL\\s+", "INTERVAL -")
              else step
            // grouped default bounds come from the per-group aggregate row
            val srcEdge = (agg: String) =>
              if (grouped) (if (agg == "MIN") "__graft_min" else "__graft_max")
              else s"(SELECT $agg(CAST(`${f.name}` AS TIMESTAMP)) FROM __graft_fill_src)"
            val fromE = Option(m.group(6)).map(l => s"CAST($l AS TIMESTAMP)")
              .getOrElse(srcEdge(if (desc) "MAX" else "MIN"))
            // ClickHouse TO is exclusive; implicit far bound is inclusive
            val toI = Option(m.group(8)).map(l => s"CAST($l AS TIMESTAMP)")
              .getOrElse(srcEdge(if (desc) "MIN" else "MAX"))
            val cut = Option(m.group(8)).map { l =>
              val cmp = if (desc) ">" else "<"
              s" WHERE __graft_fx $cmp CAST($l AS TIMESTAMP)"
            }.getOrElse("")
            ("TIMESTAMP", fromE, toI, stepSigned, cut)
          } else {
            require(stepRaw.forall(_.matches("-?\\d+")),
              "STEP INTERVAL requires a DATE/TIMESTAMP fill column — use a " +
                "plain integer STEP on integral columns")
            val step = stepRaw.map(_.toLong).getOrElse(1L)
            require(step > 0, "WITH FILL STEP must be positive")
            val srcEdge = (agg: String) =>
              if (grouped) (if (agg == "MIN") "__graft_min" else "__graft_max")
              else s"(SELECT $agg(CAST(`${f.name}` AS BIGINT)) FROM __graft_fill_src)"
            val fromE = Option(m.group(6)).map { l =>
              require(l.matches("-?\\d+"),
                "WITH FILL FROM on an integral column must be an integer")
              l
            }.getOrElse(srcEdge(if (desc) "MAX" else "MIN"))
            val toI = Option(m.group(8)).map { l =>
              require(l.matches("-?\\d+"),
                "WITH FILL TO on an integral column must be an integer")
              (if (desc) l.toLong + 1 else l.toLong - 1).toString
            }.getOrElse(srcEdge(if (desc) "MIN" else "MAX"))
            ("BIGINT", fromE, toI, (if (desc) -step else step).toString, "")
          }
        // INTERPOLATE list: `col` carries the last non-null source value
        // forward; `col AS expr` (r17) computes expr over the PREVIOUS
        // OUTPUT row when inserting each gap row — ClickHouse's semantics —
        // expressed as lag() over the fill order after every referenced
        // column's output value is materialized in the tagged union. A
        // SELF-REFERENTIAL chain (expr referencing interpolated columns,
        // r19) instead folds the expression k times from the gap run's
        // anchor row via the aggregate() HOF — see the chain block below.
        // () = every non-fill column carried forward.
        val asItemRe = "(?is)^\\s*([A-Za-z_]\\w*|`[^`]+`)\\s+AS\\s+(.+?)\\s*$".r
        val interpItems: Seq[(String, Option[String])] = Option(m.group(12)) match {
          case None => Seq.empty
          case Some(items) =>
            def resolve(n: String): String = {
              val u = unquoteIdent(n)
              schema.fields.find(_.name.equalsIgnoreCase(u)).getOrElse(
                throw new IllegalArgumentException(
                  s"INTERPOLATE column '$u' is not in the result")).name
            }
            val parsed = splitTopLevel(items).map {
              case asItemRe(n, e) => (resolve(n), Some(e))
              case n => (resolve(n), None)
            }
            val all =
              if (parsed.isEmpty)
                schema.fieldNames.toSeq.filterNot(n =>
                  n.equalsIgnoreCase(f.name) ||
                    prefix.exists(_._1.equalsIgnoreCase(n)))
                  .map(n => (n, None: Option[String]))
              else parsed
            require(!all.exists(_._1.equalsIgnoreCase(f.name)),
              "the WITH FILL column cannot be INTERPOLATEd")
            require(!all.exists(a => prefix.exists(_._1.equalsIgnoreCase(a._1))),
              "a leading sort column cannot be INTERPOLATEd — gap rows carry " +
                "the group's own values")
            all
        }
        val interp: Set[String] = interpItems.map(_._1).toSet
        val interpExpr: Map[String, String] =
          interpItems.collect { case (n, Some(e)) => n -> e }.toMap
        val interpLower = interp.map(_.toLowerCase(Locale.ROOT))
        // Self-referential chains (r19, closes the last wave-2 refusal):
        // `INTERPOLATE (pos AS pos + 1)` recurs on its own previous OUTPUT
        // — no fixed-depth window expresses it, but the k-th gap row after
        // a source row is exactly the k-fold iteration of the expression
        // from that source row's state, so an `aggregate(sequence(1, k),
        // anchorState, step)` HOF computes it row-locally. Supported when
        // every column the chain references is itself interpolated (the
        // state struct then evolves deterministically: chained targets
        // step through their expressions, carried columns stay at their
        // carried value). A chain referencing a PLAIN result column (whose
        // previous-output value is a per-step type default) or a
        // non-chained expression column keeps the loud refusal — those
        // recur on state the fold cannot track. Cost note: each gap row
        // folds O(k) steps (k = its offset in the gap run), so a run of
        // length L costs O(L^2) expression evaluations — fine for the
        // short gap runs WITH FILL exists for, documented here because
        // ClickHouse streams it in O(L).
        interpExpr.foreach { case (n, e) =>
          val refs = exprColumnRefs(e)
          val unknown = refs.filterNot(r =>
            schema.fieldNames.exists(_.equalsIgnoreCase(r)))
          if (unknown.nonEmpty) throw new IllegalArgumentException(
            s"INTERPOLATE ($n AS expr): unknown column(s) " +
              unknown.mkString(", "))
          val bad = refs.filter(interpLower)
          if (bad.nonEmpty) {
            val outside = refs.filterNot(interpLower)
            if (outside.nonEmpty) throw new UnsupportedOperationException(
              s"INTERPOLATE ($n AS expr): a self-referential chain may " +
                s"reference only interpolated columns (it references " +
                s"${outside.mkString(", ")} too) — the previous-output " +
                "value of a plain column on a gap row is a type default " +
                "the chain state cannot track")
          }
        }
        // chained = expr references at least one interpolated column
        val chainedCols: Map[String, String] = interpExpr.filter { case (_, e) =>
          exprColumnRefs(e).exists(interpLower) }
        // every interpolated column a chain references must be chained or a
        // plain carry — a NON-chained expression column's gap values vary
        // with lag state the fold cannot carry
        chainedCols.foreach { case (n, e) =>
          val mixed = exprColumnRefs(e).filter(r =>
            interpExpr.keys.exists(_.equalsIgnoreCase(r)) &&
              !chainedCols.keys.exists(_.equalsIgnoreCase(r)))
          if (mixed.nonEmpty) throw new UnsupportedOperationException(
            s"INTERPOLATE ($n AS expr): the chain references non-chained " +
              s"expression column(s) ${mixed.mkString(", ")} — their gap " +
              "values derive from the previous plain row, which the chain " +
              "state cannot track")
        }
        val proj = schema.fields.map { fd =>
          if (fd.name.equalsIgnoreCase(f.name))
            s"CAST(__graft_fx AS ${fd.dataType.sql}) AS `${fd.name}`"
          else if (prefix.exists(_._1.equalsIgnoreCase(fd.name)))
            s"__graft_fill_g.`${fd.name}` AS `${fd.name}`" // the group's value
          else if (interp(fd.name)) // NULL here; the outer window fills it
            s"CAST(NULL AS ${fd.dataType.sql}) AS `${fd.name}`"
          else {
            val dflt = fd.dataType match {
              case ByteType | ShortType | IntegerType | LongType |
                   FloatType | DoubleType => "0"
              case _: DecimalType => "0"
              case StringType => "''"
              case BooleanType => "false"
              case _ => "NULL"
            }
            s"CAST($dflt AS ${fd.dataType.sql}) AS `${fd.name}`"
          }
        }.mkString(", ")
        // empty source / inverted bounds → CASE falls to the empty array.
        // With INTERPOLATE the union carries a source/gap tag so the
        // carry-forward window rewrites ONLY gap rows — a source row's own
        // NULL stays a NULL (ClickHouse computes INTERPOLATE values only
        // for inserted rows).
        val tagCols =
          if (interp.isEmpty) ("", "")
          else (", 1 AS __graft_fill_tag", ", 0 AS __graft_fill_tag")
        // inverted-bounds guard follows the fill direction (empty grid when
        // the bounds cross); DESC walks fromE downward to toI
        val guard =
          if (desc) s"CAST(($fromE) AS $gridT) >= CAST(($toI) AS $gridT)"
          else s"CAST(($toI) AS $gridT) >= CAST(($fromE) AS $gridT)"
        val gridExplode =
          s"""explode(CASE WHEN $guard
             |  THEN sequence(CAST(($fromE) AS $gridT), CAST(($toI) AS $gridT), $stepE)
             |  ELSE CAST(array() AS ARRAY<$gridT>) END) AS __graft_fx""".stripMargin
        // global: one sequence(); grouped: a per-group sequence over the
        // group's own (or the explicit) bounds, generated from ONE grouped
        // aggregate over the source — still zero driver work, and the grid
        // is co-partitioned with the group keys
        val gridSel =
          if (!grouped)
            s"(SELECT __graft_fx FROM\n  (SELECT $gridExplode)$gridCut)"
          else
            s"""(SELECT $pSel, __graft_fx FROM
               |  (SELECT $pSel, $gridExplode FROM
               |    (SELECT $pSel, MIN(CAST(`${f.name}` AS $gridT)) AS __graft_min,
               |       MAX(CAST(`${f.name}` AS $gridT)) AS __graft_max
               |     FROM __graft_fill_src GROUP BY $pSel))$gridCut)""".stripMargin
        val antiOn = (Seq(
          s"__graft_fill_g.__graft_fx = CAST(__graft_fill_src.`${f.name}` AS $gridT)") ++
          prefix.map(p =>
            s"__graft_fill_g.`${p._1}` <=> __graft_fill_src.`${p._1}`"))
          .mkString(" AND ")
        val unioned =
          s"""SELECT *${tagCols._1} FROM __graft_fill_src
             |UNION ALL
             |SELECT $proj${tagCols._2} FROM $gridSel __graft_fill_g
             |LEFT ANTI JOIN __graft_fill_src
             |  ON $antiOn""".stripMargin
        val ordDir = if (desc) "DESC NULLS LAST" else "ASC NULLS FIRST"
        val ordPrefix = prefix.map(p => s"`${p._1}` ${p._2}, ").mkString
        val ordTail = s"ORDER BY $ordPrefix`${f.name}` $ordDir"
        if (interp.isEmpty)
          s"WITH __graft_fill_src AS ( $base )\n$unioned\n$ordTail"
        else {
          // Ungrouped fill: the carry-forward/lag window is deliberately
          // UNPARTITIONED (global ORDER BY over the fill column) — WITH FILL
          // output is by construction a final, result-sized, totally-ordered
          // set, the same bound as the ORDER BY it decorates. GROUPED fill
          // (leading sort columns) PARTITIONs every window by the prefix, so
          // the fill distributes like any keyed window.
          val part =
            if (grouped) s"PARTITION BY $pSel " else ""
          val w = s"OVER (${part}ORDER BY `${f.name}` $ordDir " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
          val lagW = s"OVER (${part}ORDER BY `${f.name}` $ordDir)"
          // chain state machinery (r19): the fold needs, per row, the
          // nearest source row's values of every state column (the chain's
          // anchor) and the row's offset k inside its gap run — both are
          // ordinary windows over the tagged union, so the chain stays as
          // distributed as the fill itself (grouped fills partition all of
          // it by the prefix).
          val chainedLower = chainedCols.keySet.map(_.toLowerCase(Locale.ROOT))
          val stateCols: Seq[String] = {
            val refd = chainedCols.values.flatMap(exprColumnRefs).toSet
            schema.fieldNames.toSeq.filter(n =>
              chainedLower(n.toLowerCase(Locale.ROOT)) ||
                (interpLower(n.toLowerCase(Locale.ROOT)) &&
                  refd(n.toLowerCase(Locale.ROOT))))
          }
          def stType(s: String): String =
            schema.fields.find(_.name == s).get.dataType.sql
          // anchor per state column: chained targets take the nearest
          // SOURCE value (struct-wrapped so a legitimately-NULL source
          // value still anchors); carried columns take their carried value
          // (last non-null source — exactly what the previous output row
          // shows)
          val stExtra = (Seq(s"SUM(__graft_fill_tag) $w AS __graft_fill_run") ++
            stateCols.map { s =>
              if (chainedLower(s.toLowerCase(Locale.ROOT)))
                s"last_value(CASE WHEN __graft_fill_tag = 1 THEN " +
                  s"named_struct('v', `$s`) END) IGNORE NULLS $w " +
                  s"AS `__graft_anchor_$s`"
              else
                s"last_value(`$s`) IGNORE NULLS $w AS `__graft_anchor_$s`"
            }).mkString(", ")
          val kPart =
            if (grouped) s"PARTITION BY $pSel, __graft_fill_run "
            else "PARTITION BY __graft_fill_run "
          val kExpr = s"ROW_NUMBER() OVER (${kPart}ORDER BY `${f.name}` " +
            s"$ordDir) - 1 AS __graft_fill_k"
          lazy val fold: String = {
            val init = stateCols.map { s =>
              val v =
                if (chainedLower(s.toLowerCase(Locale.ROOT)))
                  s"`__graft_anchor_$s`.v"
                else s"`__graft_anchor_$s`"
              s"'$s', CAST($v AS ${stType(s)})"
            }.mkString(", ")
            val step = stateCols.map { s =>
              val upd =
                if (chainedLower(s.toLowerCase(Locale.ROOT)))
                  rewriteExprRefsTo(chainedCols(s), interpLower,
                    u => s"__graft_acc.`$u`")
                else s"__graft_acc.`$s`"
              s"'$s', CAST(($upd) AS ${stType(s)})"
            }.mkString(", ")
            s"aggregate(sequence(1, GREATEST(__graft_fill_k, 1)), " +
              s"named_struct($init), " +
              s"(__graft_acc, __graft_i) -> named_struct($step))"
          }
          val outer = schema.fields.map { fd =>
            if (chainedCols.contains(fd.name))
              s"CASE WHEN __graft_fill_tag = 1 THEN `${fd.name}` ELSE " +
                s"CAST(($fold).`${fd.name}` AS ${fd.dataType.sql}) END " +
                s"AS `${fd.name}`"
            else if (interpExpr.contains(fd.name)) {
              // gap rows: expr over the previous OUTPUT row — every
              // referenced column's output value already sits in
              // __graft_fill_all (source value on source rows, type default
              // on gap rows), so lag(col) IS the previous row's value
              val e = rewriteExprRefs(interpExpr(fd.name), schema.fieldNames
                .map(_.toLowerCase(Locale.ROOT)).toSet, lagW)
              s"CASE WHEN __graft_fill_tag = 1 THEN `${fd.name}` ELSE " +
                s"CAST(($e) AS ${fd.dataType.sql}) END AS `${fd.name}`"
            } else if (interp(fd.name))
              s"CASE WHEN __graft_fill_tag = 1 THEN `${fd.name}` ELSE " +
                s"last_value(`${fd.name}`) IGNORE NULLS $w END AS `${fd.name}`"
            else s"`${fd.name}`"
          }.mkString(", ")
          if (chainedCols.isEmpty)
            s"WITH __graft_fill_src AS ( $base ),\n__graft_fill_all AS (\n" +
              s"$unioned\n)\nSELECT $outer FROM __graft_fill_all\n$ordTail"
          else
            s"WITH __graft_fill_src AS ( $base ),\n__graft_fill_all AS (\n" +
              s"$unioned\n),\n__graft_fill_st AS (\n" +
              s"SELECT *, $stExtra FROM __graft_fill_all\n),\n" +
              s"__graft_fill_k2 AS (\nSELECT *, $kExpr FROM __graft_fill_st\n)\n" +
              s"SELECT $outer FROM __graft_fill_k2\n$ordTail"
        }
      case _ =>
        val at = q.toUpperCase(Locale.ROOT).indexOf("WITH FILL")
        if (at >= 0 && !inLiteralAt(q, at) &&
            q.substring(at).matches("(?is)WITH\\s+FILL\\b.*")) {
          rewriteExprFill(q).foreach(return _)
          throw new UnsupportedOperationException(
            "WITH FILL is supported as a trailing `ORDER BY [key, …,] " +
              "<col|expr> [ASC|DESC] WITH FILL [FROM v] [TO v] " +
              "[STEP n|INTERVAL n unit] [INTERPOLATE (col [AS expr], …)]` " +
              "over an integral or DATE/TIMESTAMP fill column (leading " +
              "plain sort columns make it a per-group fill; expression " +
              "fill columns cannot be combined with leading sort columns) " +
              "— an INTERPOLATE expr may reference only non-interpolated " +
              "result columns")
        }
        q
    }

  /** Expression fill columns (r17): `ORDER BY <expr> WITH FILL …` — the
    * reference accepts any sort expression. Rewrite: materialize the
    * expression as a synthetic column over the base, run the ordinary
    * ident-keyed fill on it, then project the original columns back off
    * (the outer projection is narrow — no exchange — so the fill's sort
    * order carries through; same presentation contract as WITH FILL
    * itself). Gap rows carry type defaults in every original column,
    * exactly ClickHouse's behavior for a fill expression that is not a
    * SELECT column. Scope: a single expression (no leading sort columns).
    */
  private def rewriteExprFill(q: String): Option[String] = {
    val m = exprFillRe.findFirstMatchIn(q).getOrElse(return None)
    if (!parenBalanced(m.group(1))) return None
    var expr = m.group(2).trim
    var dir = ""
    val dirM = "(?is)\\s+(ASC|DESC)$".r.findFirstMatchIn(expr)
    dirM.foreach { dm => dir = " " + dm.group(1); expr = expr.substring(0, dm.start).trim }
    // a bare ident (the normal path's shape) or a comma'd list is not ours
    if (expr.matches("(?s)[A-Za-z_]\\w*|`[^`]+`")) return None
    if (!parenBalanced(expr) || splitTopLevel(expr).lengthCompare(1) != 0)
      return None
    val base = m.group(1)
    val schema = probeSchema(s"( $base ) __graft_fill_probe")
    require(!schema.fieldNames.exists(_.equalsIgnoreCase("__graft_fill_x")),
      "WITH FILL: the result already has a __graft_fill_x column")
    val inner = s"SELECT *, ($expr) AS __graft_fill_x FROM ( $base ) __graft_fill_eb"
    val filled = rewriteWithFill(
      s"SELECT * FROM ( $inner ) __graft_fill_ei " +
        s"ORDER BY __graft_fill_x$dir WITH FILL${m.group(3)}")
    val outCols = schema.fieldNames.map(n => s"`$n`").mkString(", ")
    Some(s"SELECT $outCols FROM (\n$filled\n) __graft_fill_eo")
  }

  private val exprFillRe =
    "(?is)^(.*\\S)\\s+ORDER\\s+BY\\s+(.+?)\\s+WITH\\s+FILL(.*)$".r

  // ---- SELECT * REPLACE(…) / * [EXCEPT(…)] APPLY(fn) ------------------------
  // ClickHouse column-transformer modifiers on the star (SELECT grammar:
  // `* [EXCEPT(cols)] [REPLACE(expr AS col, …)] [APPLY(fn)]`).
  //  - REPLACE rewrites textually onto Spark's native `* EXCEPT (col), expr
  //    AS col`. Documented divergence: the replaced column moves to the END
  //    of the projection (ClickHouse keeps its position); the name-keyed
  //    result is identical.
  //  - APPLY expands to `fn(col) AS `fn(col)`` per star column (ClickHouse's
  //    output naming), resolved from the FROM clause's analyzed schema —
  //    analysis only, no job. REPLACE composes into APPLY's input exprs
  //    (ClickHouse transformer order: EXCEPT → REPLACE → APPLY).
  //  - APPLY lambdas (r18): `* APPLY (x -> <body>)` substitutes each star
  //    column for the bound variable in the body (case-sensitive,
  //    word-boundary, literal-aware — the ClickHouse lambda contract);
  //    output name = the body with the bare column name substituted.
  // Only a SELECT-position star (after SELECT/DISTINCT, a comma, or an
  // opening paren) is a candidate — `price * replace(code,'X','')` is
  // multiplication followed by a function call and is never touched.
  /** applies: the APPLY chain in order — Left(fnName) or
    * Right((lambdaVar, body)); colFilter: COLUMNS('re') regex when the
    * selector is COLUMNS rather than `*`.
    */
  private case class StarMods(exceptCols: Seq[String],
      replaces: Seq[(String, String)],
      applies: Seq[Either[String, (String, String)]], end: Int,
      colFilter: Option[String] = None)

  /** Replace word-boundary occurrences of identifier `v` in `body` with
    * `replacement`, skipping string/backtick literals and dotted refs
    * (`t.v` is a qualified column, not the lambda variable).
    */
  private def substIdent(body: String, v: String, replacement: String): String = {
    def isW(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    val sb = new StringBuilder
    var i = 0; var inStr = false; var inTick = false
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) { sb += c; if (c == '\'') inStr = false; i += 1 }
      else if (inTick) { sb += c; if (c == '`') inTick = false; i += 1 }
      else if (c == '\'') { sb += c; inStr = true; i += 1 }
      else if (c == '`') { sb += c; inTick = true; i += 1 }
      else if (isW(c) &&
          (i == 0 || (!isW(body.charAt(i - 1)) && body.charAt(i - 1) != '.')) &&
          body.regionMatches(false, i, v, 0, v.length) &&
          (i + v.length >= body.length || !isW(body.charAt(i + v.length)))) {
        sb ++= replacement; i += v.length
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private[engine] def rewriteStarModifiers(q: String): String = {
    var i = 0; var inStr = false; var inTick = false
    while (i < q.length) {
      val c = q.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inTick) { if (c == '`') inTick = false }
      else if (c == '\'') inStr = true
      else if (c == '`') inTick = true
      else if (c == '*' && isSelectStarAt(q, i)) {
        parseStarMods(q, i) match {
          case Some(sm) => return rewriteStarModifiers(applyStarMods(q, i, sm))
          case None =>
        }
      }
      else if ((c == 'C' || c == 'c') && isSelectStarAt(q, i)) {
        parseColumnsSelector(q, i) match {
          case Some(sm) => return rewriteStarModifiers(applyStarMods(q, i, sm))
          case None =>
        }
      }
      i += 1
    }
    q
  }

  /** `COLUMNS('re') [EXCEPT(…)] [REPLACE(…)] [APPLY(…)]*` (r18): the
    * ClickHouse dynamic-column selector — expands to the FROM schema's
    * columns whose names match the regex (unanchored search, like
    * ClickHouse's RE2 match), then the same transformer tail as `*`.
    */
  private def parseColumnsSelector(q: String, at: Int): Option[StarMods] = {
    if (!q.regionMatches(true, at, "COLUMNS", 0, 7)) return None
    val after = at + 7
    if (after < q.length &&
        (Character.isLetterOrDigit(q.charAt(after)) || q.charAt(after) == '_'))
      return None
    var i = after
    while (i < q.length && Character.isWhitespace(q.charAt(i))) i += 1
    if (i >= q.length || q.charAt(i) != '(') return None
    val e = matchParen(q, i)
    if (e < 0) return None
    val content = q.substring(i + 1, e - 1).trim
    "^'(.*)'$".r.findFirstMatchIn(content).map { m =>
      // parseStarMods scans the transformer tail from skipWs(star + 1):
      // pass e - 1 so it starts right after the closing paren. The tail
      // may be empty or EXCEPT-only — COLUMNS always expands (an EXCEPT
      // left in the text would read as a set operator).
      parseStarMods(q, e - 1, requireTransform = false)
        .getOrElse(StarMods(Nil, Nil, Nil, e))
        .copy(colFilter = Some(m.group(1)))
    }
  }

  /** The star is a projection star iff the previous non-ws token is SELECT,
    * DISTINCT, a comma, or an opening paren.
    */
  private def isSelectStarAt(q: String, star: Int): Boolean = {
    var i = star - 1
    while (i >= 0 && Character.isWhitespace(q.charAt(i))) i -= 1
    if (i < 0) false
    else q.charAt(i) match {
      case ',' | '(' => true
      case ch if Character.isLetterOrDigit(ch) || ch == '_' =>
        var j = i
        while (j >= 0 && (Character.isLetterOrDigit(q.charAt(j)) || q.charAt(j) == '_')) j -= 1
        val w = q.substring(j + 1, i + 1).toUpperCase(Locale.ROOT)
        w == "SELECT" || w == "DISTINCT"
      case _ => false
    }
  }

  /** End index (exclusive) of the balanced paren group opening at `open`. */
  private def matchParen(q: String, open: Int): Int = {
    var d = 0; var i = open; var inStr = false; var inTick = false
    while (i < q.length) {
      val c = q.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inTick) { if (c == '`') inTick = false }
      else c match {
        case '\'' => inStr = true
        case '`' => inTick = true
        case '(' => d += 1
        case ')' => d -= 1; if (d == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** `requireTransform = false` (the COLUMNS path) returns the parsed mods
    * even when the tail is empty or EXCEPT-only — COLUMNS must always be
    * expanded, while a bare `* EXCEPT` stays on Spark's native form.
    */
  private def parseStarMods(q: String, star: Int,
      requireTransform: Boolean = true): Option[StarMods] = {
    def skipWs(i0: Int): Int = {
      var i = i0; while (i < q.length && Character.isWhitespace(q.charAt(i))) i += 1; i
    }
    def wordAt(i: Int, w: String): Boolean =
      q.regionMatches(true, i, w, 0, w.length) &&
        (i + w.length >= q.length ||
          !(Character.isLetterOrDigit(q.charAt(i + w.length)) || q.charAt(i + w.length) == '_'))
    def group(i0: Int): Option[(String, Int)] = { // (content, endExclusive)
      val i = skipWs(i0)
      if (i < q.length && q.charAt(i) == '(') {
        val e = matchParen(q, i)
        if (e < 0) None else Some((q.substring(i + 1, e - 1), e))
      } else None
    }
    var i = skipWs(star + 1)
    var exceptCols = Seq.empty[String]
    if (wordAt(i, "EXCEPT")) {
      group(i + 6) match {
        case Some((content, e)) => exceptCols = splitTopLevel(content); i = skipWs(e)
        case None => return None // `* EXCEPT SELECT` set-op or malformed — not ours
      }
    }
    var replaces = Seq.empty[(String, String)]
    var sawReplace = false
    if (wordAt(i, "REPLACE")) {
      group(i + 7) match {
        case Some((content, e)) =>
          val aliasRe = "(?is)^(.+?)\\s+AS\\s+([A-Za-z_]\\w*|`[^`]+`)\\s*$".r
          val items = splitTopLevel(content).map { it =>
            aliasRe.findFirstMatchIn(it).map(x => (x.group(1).trim, unquoteIdent(x.group(2))))
          }
          if (items.exists(_.isEmpty)) return None // not `expr AS col` — not a transformer
          replaces = items.flatten
          sawReplace = true
          i = skipWs(e)
        case None => return None
      }
    }
    // APPLY chains (r18): ClickHouse accepts any number of APPLY
    // transformers, composing left to right — `* APPLY(f) APPLY(g)` is
    // g(f(col))
    var applies = Seq.empty[Either[String, (String, String)]]
    val lambdaRe = "(?s)^\\s*([A-Za-z_]\\w*)\\s*->\\s*(.+)$".r
    var more = wordAt(i, "APPLY")
    while (more) {
      group(i + 5) match {
        case Some((content, e)) if content.trim.matches("[A-Za-z_]\\w*") =>
          applies :+= Left(content.trim); i = skipWs(e)
        case Some((content, e)) if lambdaRe.findFirstMatchIn(content).isDefined =>
          val m = lambdaRe.findFirstMatchIn(content).get
          applies :+= Right((m.group(1), m.group(2).trim)); i = skipWs(e)
        case Some((content, _)) => throw new UnsupportedOperationException(
          s"* APPLY supports a bare function name or a single-argument " +
            s"lambda `x -> expr` (got '${content.trim}')")
        case None => return None
      }
      more = wordAt(i, "APPLY")
    }
    if (requireTransform && !sawReplace && applies.isEmpty) None
    else Some(StarMods(exceptCols, replaces, applies, i))
  }

  /** one APPLY transformer applied to (exprText, outputName) */
  private def applyOne(t: Either[String, (String, String)],
      expr: String, name: String): (String, String) = t match {
    case Left(fn) => (s"$fn($expr)", s"$fn($name)")
    case Right((v, body)) =>
      (substIdent(body, v, s"($expr)"), substIdent(body, v, name))
  }

  private def applyStarMods(q: String, star: Int, sm: StarMods): String = {
    val needSchema = sm.applies.nonEmpty || sm.colFilter.isDefined
    val repl =
      if (needSchema) {
        // need the selector's source columns: the FROM clause at this depth
        val fromAt = topLevelKeyword(q, "FROM", sm.end)
        require(fromAt >= 0, "* APPLY / COLUMNS(…) requires a FROM clause")
        val fromEnd = clauseExtent(q, fromAt + 4, fromBounds)
        val schema = probeSchema(q.substring(fromAt + 4, fromEnd))
        val exceptLower = sm.exceptCols.map(c => unquoteIdent(c).toLowerCase(Locale.ROOT)).toSet
        val replMap = sm.replaces.map { case (e, n) => n.toLowerCase(Locale.ROOT) -> e }.toMap
        // COLUMNS('re') filters by unanchored regex search, like ClickHouse
        val filter: String => Boolean = sm.colFilter match {
          case Some(re) =>
            val p = java.util.regex.Pattern.compile(re)
            (n: String) => p.matcher(n).find()
          case None => _ => true
        }
        val cols = schema.fieldNames.toSeq
          .filter(filter)
          .filterNot(n => exceptLower(n.toLowerCase(Locale.ROOT)))
        require(sm.colFilter.isEmpty || cols.nonEmpty,
          s"COLUMNS('${sm.colFilter.getOrElse("")}') matched no columns")
        cols.map { n =>
          val base = replMap.getOrElse(n.toLowerCase(Locale.ROOT), s"`$n`")
          val (expr, name) = sm.applies.foldLeft((base, n)) {
            case ((e, nm), t) => applyOne(t, e, nm)
          }
          if (expr == s"`$n`" && name == n) s"`$n`"
          else s"$expr AS `$name`"
        }.mkString(", ")
      } else {
        val dropped = (sm.exceptCols ++ sm.replaces.map(r => s"`${r._2}`")).mkString(", ")
        val extras = sm.replaces.map { case (e, n) => s"$e AS `$n`" }.mkString(", ")
        s"* EXCEPT ($dropped), $extras"
      }
    // sm.end sits past the whitespace after the last transformer group
    // (skipWs advanced it during the APPLY-chain lookahead), so the
    // replacement would abut the next clause token — re-emit one space
    // (r19, advisor: the old text only lexed because every replacement
    // happened to end in a backtick)
    q.substring(0, star) + repl + " " + q.substring(sm.end)
  }

}

private[engine] object DialectWave2 {
  val viewCounter = new AtomicInteger(0)
}
