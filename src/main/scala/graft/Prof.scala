package graft

/** Scratch probing main — repurposed per investigation; not part of the library. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Dev.session(8)
    val store0 = model.Tpch.store(spark, "/root/testdata/sf0.001")
    val store = engine.Update(store0,
      """INSERT DATA { << <urn:s:1> <urn:p:a> 5 >> <urn:p:conf> 0.9 . }""")
    // expression-built sid must EQUAL the pattern-parsed sid of the same triple
    val df = engine.Engine.query(store,
      """SELECT ?c WHERE {
        |  BIND(<< <urn:s:1> <urn:p:a> 5 >> AS ?sid)
        |  ?sid <urn:p:conf> ?c }""".stripMargin)
    df.show(5, truncate = false)
    println("ROWS " + df.count())
    spark.stop()
  }
}
