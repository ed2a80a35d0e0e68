package graft.tools

import graft.engine.{Engine, SparqlResults}
import graft.model.GraftStore
import graft.sparql.{Algebra, Parser}

/** Scratch TCK-case debugger: prints the lowered algebra and the result TSV for
  * a query/data pair given inline. Not part of the library API.
  */
object TDbg {
  def main(args: Array[String]): Unit = {
    val spark = graft.Dev.session(8)
    val data = """@prefix : <http://www.bigdata.com/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
: {
    :s :untypedString "untypedString" .
    :s :typedString "typedString"^^xsd:unsignedByte .
    :s :int "10"^^xsd:int .
    :s :integer "10"^^xsd:integer .
    :s :double "10.0"^^xsd:double .
    :s :boolean "true"^^xsd:boolean .
    :c :p5 "5"^^xsd:integer .
}"""
    val q = """SELECT * { OPTIONAL { OPTIONAL { BIND ("3" as ?x) } BIND ("4" as ?x) } }"""
    val st = new GraftStore(spark, graft.sources.Rio.readTrig(spark, data))
    val parsed = Parser.parseQuery(q)
    parsed match {
      case sq: graft.sparql.Ast.SelectQuery =>
        println("ALGEBRA " + Algebra.lower(sq.where))
        println("VALUES " + sq.values)
      case other => println("OTHER " + other)
    }
    println("RESULT\n" + SparqlResults.toTsv(Engine.query(st, q)))
    spark.stop()
  }
}
