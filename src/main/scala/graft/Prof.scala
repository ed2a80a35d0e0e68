package graft

/** Scratch probing main — repurposed per investigation; not part of the library. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Dev.session(8)
    val store = model.Tpch.store(spark, "/root/testdata/sf0.001")
    def one(q: String): String = {
      val r = engine.Engine.query(store, q).collect()
      r.map(_.toString).mkString(" | ")
    }
    // CONCAT lang rules: both same lang -> lang kept; mixed -> plain
    println("CONCAT-same  " + one("""SELECT ?x WHERE { BIND(CONCAT("a"@en, "b"@en) AS ?x) }"""))
    println("CONCAT-mixed " + one("""SELECT ?x WHERE { BIND(CONCAT("a"@en, "b") AS ?x) }"""))
    println("SUBSTR-lang  " + one("""SELECT ?x WHERE { BIND(SUBSTR("foo"@en, 1, 2) AS ?x) }"""))
    println("UCASE-lang   " + one("""SELECT ?x WHERE { BIND(UCASE("foo"@en) AS ?x) }"""))
    // op:numeric-divide: integer / integer -> decimal (5/2 = 2.5, not 2)
    println("INT-DIV      " + one("""SELECT ?x WHERE { BIND(5/2 AS ?x) }"""))
    println("DIV-TYPE     " + one("""SELECT ?t WHERE { BIND(DATATYPE(5/2) AS ?t) }"""))
    // REPLACE with regex specials
    println("REPLACE      " + one("""SELECT ?x WHERE { BIND(REPLACE("a.b.c", "\\.", "-") AS ?x) }"""))
    // STR of typed literal
    println("STRDT-RT     " + one("""SELECT ?x WHERE { BIND(STRDT("5", <http://www.w3.org/2001/XMLSchema#integer>) AS ?x) }"""))
    spark.stop()
  }
}
