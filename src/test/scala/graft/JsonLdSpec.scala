package graft

import graft.model.GraftStore
import graft.sources.{JsonLd, Rio}
import graft.engine.Engine

class JsonLdSpec extends GraftSuite {
  private val ss = SharedSpark.spark

  private val doc =
    """{
      |  "@context": {
      |    "ex": "http://example.org/",
      |    "name": "http://example.org/name",
      |    "knows": {"@id": "http://example.org/knows", "@type": "@id"},
      |    "born": {"@id": "http://example.org/born",
      |              "@type": "http://www.w3.org/2001/XMLSchema#date"}
      |  },
      |  "@graph": [
      |    {"@id": "ex:alice", "@type": "ex:Person",
      |     "name": {"@value": "Alice", "@language": "en"},
      |     "knows": ["ex:bob", "_:carol"],
      |     "born": "1990-05-04",
      |     "ex:age": 33,
      |     "ex:score": 4.5,
      |     "ex:active": true,
      |     "ex:tags": {"@list": ["x", "y"]}},
      |    {"@id": "ex:bob", "name": "Bob",
      |     "ex:address": {"ex:city": "Springfield"}},
      |    {"@id": "_:carol", "name": "Carol"}
      |  ]
      |}""".stripMargin

  private lazy val jstore = new GraftStore(ss, Rio.readJsonLd(ss, doc))

  private def ask(q: String): Boolean = Engine.query(jstore, q).first().getBoolean(0)

  test("context terms, types, lang values, and id coercion") {
    assert(ask("""ASK { <http://example.org/alice> a <http://example.org/Person> }"""))
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/name> "Alice"@en }"""))
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/knows> <http://example.org/bob> }"""))
  }

  test("datatype coercion and JSON primitives") {
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/born>
                 |  "1990-05-04"^^<http://www.w3.org/2001/XMLSchema#date> }""".stripMargin))
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/age> 33 }"""))
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/score> ?s .
                 |  FILTER(?s > 4.4 && ?s < 4.6) }""".stripMargin))
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/active> true }"""))
  }

  test("bnode coreference and nested node objects") {
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/knows> ?c .
                 |  ?c <http://example.org/name> "Carol" }""".stripMargin))
    assert(ask("""ASK { <http://example.org/bob> <http://example.org/address> ?a .
                 |  ?a <http://example.org/city> "Springfield" }""".stripMargin))
  }

  test("@list builds an rdf:List") {
    val items = Engine.query(jstore,
      """SELECT ?x WHERE { <http://example.org/alice> <http://example.org/tags>
        |  ?l . ?l <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>*
        |  ?c . ?c <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> ?x }""".stripMargin)
      .collect().map(_.getStruct(0).getAs[String]("str")).toSet
    assert(items == Set("x", "y"))
  }

  test("unsupported 1.1 features fail loudly") {
    val e = intercept[IllegalArgumentException](
      JsonLd.parse("""{"@context": "http://remote/ctx", "@id": "ex:x"}"""))
    assert(e.getMessage.contains("unsupported"))
    val e2 = intercept[IllegalArgumentException](
      JsonLd.parse("""{"@id": "urn:x", "@reverse": {"urn:p": {"@id": "urn:y"}}}"""))
    assert(e2.getMessage.contains("unsupported"))
  }
}
