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
}
