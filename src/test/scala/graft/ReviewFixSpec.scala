package graft

import graft.engine.{Engine, Update}
import org.apache.spark.sql.functions._

/** Regressions for the round-2 code-review findings. */
class ReviewFixSpec extends GraftSuite {

  test("closure path whose only shared var is the graph var does not crash") {
    val df = Engine.query(store,
      """SELECT ?c ?t WHERE { GRAPH ?g { ?c <urn:p:n_name> ?v } .
        |  ?s (<urn:fk:n_regionkey>)+ ?t . }""".stripMargin)
    assert(df.count() > 0) // cross-joins the closure relation; previously AnalysisException
  }

  test("deleting an RDF-star annotation keeps the annotated statement") {
    val s0 = Update(store,
      "INSERT DATA { << <urn:rf:a> <urn:p:v> 1 >> <urn:p:src> \"x\" . }")
    assert(Engine.query(s0, "ASK { <urn:rf:a> <urn:p:v> 1 }").first().getBoolean(0))
    val s1 = Update(s0,
      "DELETE DATA { << <urn:rf:a> <urn:p:v> 1 >> <urn:p:src> \"x\" . }")
    // annotation gone, base statement survives
    assert(!Engine.query(s1,
      "ASK { << <urn:rf:a> <urn:p:v> 1 >> <urn:p:src> \"x\" }").first().getBoolean(0))
    assert(Engine.query(s1, "ASK { <urn:rf:a> <urn:p:v> 1 }").first().getBoolean(0))
  }

  test("bnodes in INSERT DATA are scoped per update execution") {
    val s0 = Update(store, "INSERT DATA { _:x <urn:rf:b> 1 . }")
    val s1 = Update(s0, "INSERT DATA { _:x <urn:rf:b> 1 . }")
    assert(Engine.query(s1, "SELECT ?s WHERE { ?s <urn:rf:b> 1 }").count() == 2)
    // generated [ ] bnodes don't collide with user labels in the same update
    val s2 = Update(store,
      "INSERT DATA { _:bn1 <urn:rf:c> 1 . <urn:rf:s> <urn:rf:d> [ <urn:rf:c> 2 ] . }")
    assert(Engine.query(s2, "SELECT ?s WHERE { ?s <urn:rf:c> ?v }").count() == 2)
  }

  test("division by negative zero yields negative infinity") {
    // IEEE-754 signed-zero semantics belong to xsd:double (exponent-form literals);
    // plain `-0.0` is xsd:decimal, which has no negative zero and errors on ÷0
    val df = Engine.query(store,
      """SELECT ?a ?b ?decErr WHERE { <urn:t:nation:5> <urn:p:n_nationkey> ?k .
        |  BIND(1.5e0/(-0.0e0) AS ?a) BIND(-2.5e0/(-0.0e0) AS ?b)
        |  BIND(1.5/(-0.0) AS ?decErr) }""".stripMargin)
    val r = df.select(col("a")("num"), col("b")("num"), col("decErr")).first()
    assert(r.getDouble(0).isNegInfinity && r.getDouble(1).isPosInfinity)
    assert(r.isNullAt(2)) // decimal ÷ 0 → type error
  }

  test("HTTP SELECT projecting ?s ?p ?o still gets a bindings format") {
    val srv = new graft.server.SparqlServer(store).start()
    try {
      val q = java.net.URLEncoder.encode(
        "SELECT ?s ?p ?o WHERE { ?s ?p ?o } LIMIT 3", "UTF-8")
      val resp = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${srv.boundPort}/sparql?query=$q")).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.headers().firstValue("Content-Type").orElse("")
        .contains("sparql-results+json"))
    } finally srv.stop()
  }

  test("distinct embedded triples with quote-bearing literals get distinct sids") {
    val s0 = Update(store,
      """INSERT DATA {
        |  << <urn:rf:q1> <urn:p:v> "a\" <urn:x> \"b" >> <urn:p:src> "m" .
        |  << <urn:rf:q2> <urn:p:v> "c" >> <urn:p:src> "m" .
        |}""".stripMargin)
    val sids = Engine.query(s0,
      "SELECT ?sid WHERE { ?sid <urn:p:src> \"m\" }")
    assert(sids.select(col("sid")("id")).distinct().count() == 2)
  }
}
