package graft

/** Locks the function-registry coverage that FNAUDIT.md reports: every name
  * the reference registers (src/test/resources/reference_function_names.txt —
  * the 1,449 `name=`/`aliases=` entries extracted from the reference's
  * datastore/function_definitions.py) must resolve in a dialect session,
  * EXCEPT the 15 documented deliberate skips. A new alias must never
  * silently fall out of the registry, and a new skip must be added here (and
  * to FNAUDIT.md) explicitly.
  */
class RegistryCoverageSpec extends SparkTestBase {

  private val deliberateSkips: Set[String] = Set(
    // stochastic LINEAR regression resolves since r10 (deterministic exact
    // normal-equations fit — agg.LinRegFit); the LOGISTIC aggregate stays a
    // documented skip: training is iterative, so a one-pass aggregate would
    // be a lie — operators.MLFit.logisticFit is the deterministic device
    "stochasticLogisticRegression",
    "stochastic_logistic_regression", "stochasticlogistic_regression",
    // needs the h3 library (not on the classpath, zero egress)
    "geoToH3", "h3ToGeo", "geo_to_h3", "h3_to_geo",
    // no Spark analogue for CH's block size
    "blockSize", "block_size",
    // window-frame semantics can't hide behind a scalar name (FNAUDIT.md)
    "runningDifference", "runningDifferenceStartingWithFirstValue",
    "running_difference", "running_difference_starting_with_first_value",
    "diff", "pct_change")

  test("every reference registry name resolves, minus the documented skips") {
    val names = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/reference_function_names.txt"))
      .getLines().map(_.trim).filter(_.nonEmpty).toSeq
    assert(names.size == 1449, "the extracted reference name list is fixed")
    val missing = names.filterNot(n => spark.catalog.functionExists(n)).toSet
    val unexpected = missing -- deliberateSkips
    val resolvedSkips = deliberateSkips -- missing
    assert(unexpected.isEmpty,
      s"names fell out of the registry: ${unexpected.toSeq.sorted.mkString(", ")}")
    assert(resolvedSkips.isEmpty,
      s"documented skips now resolve — update FNAUDIT.md: ${resolvedSkips.toSeq.sorted.mkString(", ")}")
  }
}
