package graft

import org.apache.spark.sql.functions._

import graft.operators.Tokenizer

/** BPE tokenizer (r14): sample-bounded training + codegen'd encode. */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  test("bpeTrain learns the expected merges on a known corpus") {
    // "low lower lowest newest newest" — classic Sennrich toy shape
    val df = Seq("low lower low lowest", "newest newest lowest low").toDF("text")
    val merges = Tokenizer.bpeTrain(df, "text", numMerges = 4)
    // pair counts round 1: (l,o) 5, (o,w) 5, (e,s) 3, (s,t) 3, (w,e) 3 …
    // tie (l,o) vs (o,w) breaks to the lexicographically smaller left
    assert(merges.head == ("l", "o"), merges.toString)
    assert(merges(1) == ("lo", "w"), merges.toString)
    // after low: (e,s)=3, (s,t)=3, (w,e)=3 -> (e,s) first, then (es,t)
    assert(merges(2) == ("e", "s"), merges.toString)
    assert(merges(3) == ("es", "t"), merges.toString)
  }

  test("encode applies merges in order, left-to-right non-overlapping") {
    val df = Seq(("aaa bcbc", 1)).toDF("text", "id")
    val enc = Tokenizer.bpeEncode(df, "text", Seq(("a", "a"), ("b", "c")))
    val row = enc.select("bpe", "bpe_count").head()
    // "aaa" with a+a: leftmost pair merges, no overlap -> [aa, a]
    // "bcbc" with b+c: both occurrences merge -> [bc, bc]
    assert(row.getSeq[String](0) == Seq("aa", "a", "bc", "bc"))
    assert(row.getInt(1) == 4)
  }

  test("merged symbols participate in later merges; SQL surface agrees") {
    val out = sql(
      """SELECT bpeEncode('the theme', 't h,th e') AS bpe,
                bpeTokenCount('the theme', 't h,th e') AS n""").head()
    // the -> t h e -> th e -> the; theme -> the m e
    assert(out.getSeq[String](0) == Seq("the", "the", "m", "e"))
    assert(out.getInt(1) == 4)
    // plan stays codegen'd: the merge table rides a reference object, so
    // the projection compiles into a whole-stage span (printed as "*(n)")
    val exec = Tables.load(spark, SparkTestBase.sfDir, "documents")
      .select(Tokenizer.encodeColumn(col("text"), "t h").as("b"))
      .queryExecution.executedPlan
    val spans = org.apache.spark.sql.graftbridge.PlanBridge.nodes(exec).collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, exec.toString)
  }

  test("train-then-encode round trip compresses trained words") {
    val docs = Tables.load(spark, SparkTestBase.sfDir, "documents").limit(50)
    val merges = Tokenizer.bpeTrain(docs, "text", numMerges = 30)
    assert(merges.size == 30)
    val enc = Tokenizer.bpeEncode(docs, "text", merges)
    val (bpeTokens, charTokens) = enc
      .agg(sum("bpe_count"), sum(size(graft.functions.GraftFunctions.tokenize(col("text")))))
      .as[(Long, Long)].head()
    // 30 merges must strictly compress vs 0 merges (chars >= bpe > words)
    val chars = docs.agg(sum(length(regexp_replace(lower(col("text")), "[^\\p{L}\\p{N}]", ""))))
      .as[Long].head()
    assert(bpeTokens < chars, s"bpe=$bpeTokens chars=$chars")
    assert(bpeTokens > charTokens, s"bpe=$bpeTokens words=$charTokens")
  }

  test("empty and non-alphanumeric docs encode to zero tokens") {
    val out = sql("SELECT bpeTokenCount('', 't h') AS a, bpeTokenCount('!!! ...', 't h') AS b").head()
    assert(out.getInt(0) == 0 && out.getInt(1) == 0)
  }

  test("byte-level encode: GPT-2-style hand-computed example (r15)") {
    // pieces of "The cat, the cat!": "The", " cat", ",", " the", " cat", "!"
    // (whitespace-prefix convention; case preserved, punctuation kept)
    // hex: The=54 68 65 | " cat"=20 63 61 74 | ","=2C | " the"=20 74 68 65
    // merges: t+h, space+c, " c"+a, " ca"+t  ->  " cat" fuses to ONE token,
    // "The" stays 3 (capital T: no 74 68), " the" keeps its space symbol
    val merges = Seq(("74", "68"), ("20", "63"), ("2063", "61"), ("206361", "74"))
    val df = Seq("The cat, the cat!").toDF("text")
    val got = Tokenizer.bpeEncode(df, "text", merges, byteLevel = true)
      .select("bpe", "bpe_count").head()
    assert(got.getSeq[String](0) == Seq(
      "54", "68", "65",      // The
      "20636174",            // " cat" — one merged token
      "2C",                  // ,
      "20", "7468", "65",    // " the" — th merged, space separate
      "20636174",            // " cat"
      "21"),                 // !
      got.getSeq[String](0).toString)
    assert(got.getInt(1) == 10)
  }

  test("byte-level training learns whitespace-prefixed pieces") {
    // pieces: "aa" ×1, " aa" ×3 -> pair counts (61,61)=4, (20,61)=3
    // round 1 merges (61,61); round 2 the only remaining pair is (20,6161)
    val df = Seq("aa aa aa aa").toDF("text")
    val merges = Tokenizer.bpeTrain(df, "text", numMerges = 2, byteLevel = true)
    assert(merges == Seq(("61", "61"), ("20", "6161")), merges.toString)
  }

  test("byte-level SQL surface agrees with the operator; multi-byte UTF-8 splits") {
    val merges = Seq(("74", "68"), ("20", "63"), ("2063", "61"), ("206361", "74"))
    val spec = Tokenizer.mergesSpec(merges)
    val viaSql = sql(s"SELECT bpeEncodeBytes('The cat, the cat!', '$spec') AS b, " +
      s"bpeTokenCountBytes('The cat, the cat!', '$spec') AS n").head()
    val viaOp = Tokenizer.bpeEncode(Seq("The cat, the cat!").toDF("text"),
      "text", merges, byteLevel = true).select("bpe", "bpe_count").head()
    assert(viaSql.getSeq[String](0) == viaOp.getSeq[String](0))
    assert(viaSql.getInt(1) == viaOp.getInt(1))
    // 'é' is two UTF-8 bytes (C3 A9): with no merges each byte is a symbol
    val acc = sql("SELECT bpeEncodeBytes('é', '74 68') AS b").head()
    assert(acc.getSeq[String](0) == Seq("C3", "A9"))
  }
}
