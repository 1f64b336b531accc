package graft

import graft.queries.Queries

/** Smoke: every driver-contract query runs at sf0.001 and returns a schema.
  * (Value-level correctness is the DuckDB oracle gate — scripts/local_verify.py
  * replicates it; this spec guards against analysis/runtime regressions.)
  */
class QueriesSpec extends SparkTestBase {
  Queries.all.foreach { q =>
    test(s"${q.name} runs") {
      val df = q.fn(spark, SparkTestBase.sfDir)
      assert(df.schema.nonEmpty)
      val n = df.count()
      assert(n >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
