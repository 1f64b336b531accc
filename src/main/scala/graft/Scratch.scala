package graft

/** Ad-hoc forked smoke tests during development (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val g = graft.engine.GraftSession.build("local[4]", 4)
    g.sql("""SELECT JSONLength('[1,2,3]') AS a,
        JSONLength('{"k": [1,2]}', 'k') AS b,
        JSONExtractKeys('{"x":1,"y":2}') AS c,
        JSONExtractArrayRaw('{"k": ["a","b"]}', 'k') AS d,
        visitParamHas('{"k": 1}', 'k') AS e,
        visitParamHas('{"k": 1}', 'z') AS f""").show(false)
    g.spark.stop()
  }
}
