package graft

/** Scratch probing main — repurposed per investigation; not part of the library. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Dev.session(8)
    val store = model.Tpch.store(spark, "/root/testdata/sf0.001")
    def one(q: String): String =
      try engine.Engine.query(store, q).collect().map(_.toString).mkString(" | ")
      catch { case e: Exception => "ERR " + e.getMessage.take(80) }
    println("TZ        " + one("""SELECT ?x WHERE { BIND(TZ("2011-01-10T14:45:13.815-05:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>) AS ?x) }"""))
    println("TIMEZONE  " + one("""SELECT ?x WHERE { BIND(TIMEZONE("2011-01-10T14:45:13.815-05:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>) AS ?x) }"""))
    println("VAL-EQ    " + one("""SELECT ?x WHERE { BIND(("05"^^<http://www.w3.org/2001/XMLSchema#integer> = 5) AS ?x) }"""))
    println("DT-CMP    " + one("""SELECT ?x WHERE { BIND(("2020-01-01T00:00:00"^^<http://www.w3.org/2001/XMLSchema#dateTime> < "2021-01-01T00:00:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>) AS ?x) }"""))
    println("STR-IRI   " + one("""SELECT ?x WHERE { BIND(STR(<urn:a:b>) AS ?x) }"""))
    println("HOURS     " + one("""SELECT ?x WHERE { BIND(HOURS("2011-01-10T14:45:13"^^<http://www.w3.org/2001/XMLSchema#dateTime>) AS ?x) }"""))
    spark.stop()
  }
}
