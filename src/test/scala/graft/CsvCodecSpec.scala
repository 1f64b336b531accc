package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.PgWire

/** Pure property tests for the COPY csv codec (r18): render → parse is the
  * identity over random field matrices, including the NULL vs empty-string
  * distinction, embedded delimiters/quotes/newlines, and CRLF input.
  */
class CsvCodecSpec extends AnyFunSuite {

  private val alphabet = "ab,\"\n\r 'é\\x0"

  private def randomField(rng: scala.util.Random): String =
    if (rng.nextInt(5) == 0) null
    else Seq.fill(rng.nextInt(8))(alphabet(rng.nextInt(alphabet.length))).mkString

  test("csv render -> parse round-trips random field matrices") {
    val rng = new scala.util.Random(181818L)
    (1 to 300).foreach { _ =>
      val nCols = 1 + rng.nextInt(4)
      val rows = Seq.fill(1 + rng.nextInt(6))(
        Seq.fill(nCols)(randomField(rng)))
      val text = rows.map(_.map(PgWire.csvField).mkString(","))
        .mkString("", "\n", "\n")
      val back = PgWire.csvParse(text)
      assert(back == rows, s"round trip diverged on:\n$text")
    }
  }

  test("NULL is empty unquoted; empty string is quoted") {
    assert(PgWire.csvField(null) == "")
    assert(PgWire.csvField("") == "\"\"")
    assert(PgWire.csvParse("a,,\"\"\n") == Seq(Seq("a", null, "")))
  }

  test("CRLF and bare CR line endings both end rows") {
    assert(PgWire.csvParse("a,b\r\nc,d\r\n") == Seq(Seq("a", "b"), Seq("c", "d")))
    // classic-Mac endings: \r alone is a row terminator (PG end-of-line)
    assert(PgWire.csvParse("a,b\rc,d\r") == Seq(Seq("a", "b"), Seq("c", "d")))
  }

  test("the \\. end marker terminates a row stream; a \\. VALUE is quoted") {
    assert(PgWire.csvParse("a,b\n\\.\n") == Seq(Seq("a", "b")))
    // the data value "\." must round-trip, not truncate the stream — PG
    // quotes it on output for exactly this reason
    assert(PgWire.csvField("\\.") == "\"\\.\"")
    assert(PgWire.csvParse("\"\\.\"\nafter\n") == Seq(Seq("\\."), Seq("after")))
  }

  test("data after a closing quote is a COPY syntax error, not glued (r19)") {
    // PG raises `syntax error` on `"ab"c`; silently parsing it as `abc`
    // ingested mangled values (advisor r18)
    val e = intercept[IllegalArgumentException] {
      PgWire.csvParse("\"ab\"c,d\n")
    }
    assert(e.getMessage.contains("closing quote"))
    // a delimiter or EOL directly after the quote stays legal
    assert(PgWire.csvParse("\"ab\",c\n") == Seq(Seq("ab", "c")))
    assert(PgWire.csvParse("\"ab\"\n\"cd\"\r\n") == Seq(Seq("ab"), Seq("cd")))
  }

  test("quoted fields carry delimiters, quotes, and newlines") {
    assert(PgWire.csvParse("\"a,b\",\"q\"\"q\",\"l1\nl2\"\n") ==
      Seq(Seq("a,b", "q\"q", "l1\nl2")))
  }
}
