package graft

import graft.model.{GraftStore, Term}
import graft.sources.{Rio, RdfXml}
import graft.engine.Engine
import org.apache.spark.sql.functions._

class RdfXmlSpec extends GraftSuite {
  private val ss = SharedSpark.spark

  private val doc =
    """<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:ex="http://example.org/" xml:base="http://base.org/">
      |  <rdf:Description rdf:about="http://example.org/item1">
      |    <ex:name xml:lang="en">Widget</ex:name>
      |    <ex:price rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">42</ex:price>
      |    <ex:maker rdf:resource="http://example.org/acme"/>
      |  </rdf:Description>
      |  <ex:Company rdf:about="http://example.org/acme" ex:ticker="ACME">
      |    <ex:address rdf:parseType="Resource">
      |      <ex:city>Springfield</ex:city>
      |    </ex:address>
      |    <ex:products rdf:parseType="Collection">
      |      <rdf:Description rdf:about="http://example.org/item1"/>
      |      <rdf:Description rdf:about="http://example.org/item2"/>
      |    </ex:products>
      |  </ex:Company>
      |  <rdf:Description rdf:about="rel">
      |    <ex:link rdf:resource="other"/>
      |    <ex:partner rdf:nodeID="b1"/>
      |  </rdf:Description>
      |  <rdf:Description rdf:nodeID="b1"><ex:n>7</ex:n></rdf:Description>
      |  <rdf:Seq rdf:about="http://example.org/seq">
      |    <rdf:li>one</rdf:li>
      |    <rdf:li>two</rdf:li>
      |  </rdf:Seq>
      |  <rdf:Description rdf:about="http://example.org/r">
      |    <ex:weight rdf:ID="w1">heavy</ex:weight>
      |  </rdf:Description>
      |</rdf:RDF>""".stripMargin

  private lazy val xstore = new GraftStore(ss, Rio.readRdfXml(ss, doc))

  private def ask(q: String): Boolean =
    Engine.query(xstore, q).first().getBoolean(0)

  test("literals: lang, datatype, typed node, property attribute") {
    assert(ask("""ASK { <http://example.org/item1> <http://example.org/name> "Widget"@en }"""))
    assert(ask("""ASK { <http://example.org/item1> <http://example.org/price> 42 }"""))
    assert(ask("""ASK { <http://example.org/acme> a <http://example.org/Company> }"""))
    assert(ask("""ASK { <http://example.org/acme> <http://example.org/ticker> "ACME" }"""))
  }

  test("resource objects and parseType=Resource bnodes") {
    assert(ask("""ASK { <http://example.org/item1> <http://example.org/maker> <http://example.org/acme> }"""))
    assert(ask("""ASK { <http://example.org/acme> <http://example.org/address> ?b .
                 |      ?b <http://example.org/city> "Springfield" }""".stripMargin))
  }

  test("parseType=Collection builds an rdf:List") {
    val items = Engine.query(xstore,
      """SELECT ?x WHERE { <http://example.org/acme> <http://example.org/products>
        |  ?l . ?l <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>*
        |  ?c . ?c <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> ?x }""".stripMargin)
      .collect().map(_.getStruct(0).getAs[String]("str")).toSet
    assert(items == Set("http://example.org/item1", "http://example.org/item2"))
  }

  test("xml:base resolution and nodeID coreference") {
    assert(ask("""ASK { <http://base.org/rel> <http://example.org/link> <http://base.org/other> }"""))
    assert(ask("""ASK { <http://base.org/rel> <http://example.org/partner> ?b . ?b <http://example.org/n> "7" }"""))
  }

  test("rdf:li containers number members") {
    assert(ask("""ASK { <http://example.org/seq> <http://www.w3.org/1999/02/22-rdf-syntax-ns#_1> "one" }"""))
    assert(ask("""ASK { <http://example.org/seq> <http://www.w3.org/1999/02/22-rdf-syntax-ns#_2> "two" }"""))
  }

  test("property-element rdf:ID reifies the statement") {
    assert(ask("""ASK { <http://base.org/#w1> a <http://www.w3.org/1999/02/22-rdf-syntax-ns#Statement> ;
                 |  <http://www.w3.org/1999/02/22-rdf-syntax-ns#subject> <http://example.org/r> ;
                 |  <http://www.w3.org/1999/02/22-rdf-syntax-ns#predicate> <http://example.org/weight> ;
                 |  <http://www.w3.org/1999/02/22-rdf-syntax-ns#object> "heavy" }""".stripMargin))
    assert(ask("""ASK { <http://example.org/r> <http://example.org/weight> "heavy" }"""))
  }

  test("round-trip through N-Quads lines keeps the statement count") {
    val lines = Rio.toNQuadLines(xstore.statements).collect().map(_.getString(0))
    import ss.implicits._
    val back = Rio.statementsFromLines(ss.createDataset(lines.toSeq))
    assert(back.count() == xstore.statements.count())
  }

  test("parse count and determinism") {
    val a = RdfXml.parse(doc)
    val b = RdfXml.parse(doc)
    assert(a == b)
    assert(a.nonEmpty)
  }
}
