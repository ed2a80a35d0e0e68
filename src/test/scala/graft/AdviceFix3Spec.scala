package graft

import graft.engine.{Engine, Update}
import org.apache.spark.sql.functions._

/** Regression specs for the round-3 ADVICE items: the pathTermPairs PAlt gap
  * (closure-free alternations threw and Verify swallowed it), NAMED-only
  * dataset clauses, and WITH + DELETE WHERE grammar rejection.
  */
class AdviceFix3Spec extends GraftSuite {

  test("bare alternation path evaluates (closure-free PAlt term pairs)") {
    // ?x (c_nationkey|s_nationkey) ?n — both branches contribute, bag semantics
    val df = Engine.query(store,
      """SELECT ?x ?n WHERE { ?x (<urn:fk:c_nationkey>|<urn:fk:s_nationkey>) ?n }""")
    val cust = Engine.query(store,
      "SELECT ?x ?n WHERE { ?x <urn:fk:c_nationkey> ?n }").count()
    val supp = Engine.query(store,
      "SELECT ?x ?n WHERE { ?x <urn:fk:s_nationkey> ?n }").count()
    assert(cust > 0 && supp > 0)
    assert(df.count() == cust + supp)
  }

  test("alternation keeps duplicate pairs (multiset union, not distinct)") {
    val s0 = Update(store,
      """INSERT DATA { <urn:alt:a> <urn:alt:p> <urn:alt:b> .
        |  <urn:alt:a> <urn:alt:q> <urn:alt:b> . }""".stripMargin)
    val df = Engine.query(s0,
      "SELECT ?s ?o WHERE { ?s (<urn:alt:p>|<urn:alt:q>) ?o }")
    assert(df.count() == 2) // one row per branch — SPARQL path alt is bag union
  }

  test("{n,m} range over an alternation evaluates (PSeq of PAlt legs)") {
    val df = Engine.query(store,
      """SELECT ?s ?t WHERE { ?s a <urn:c:Lineitem> .
        |  ?s (<urn:fk:l_orderkey>|<urn:fk:o_custkey>){2,2} ?t . }""".stripMargin)
    // lineitem --l_orderkey--> orders --o_custkey--> customer: every lineitem
    // reaches exactly one customer in 2 hops
    val nLineitem = Engine.query(store,
      "SELECT ?s WHERE { ?s a <urn:c:Lineitem> }").count()
    assert(df.count() == nLineitem)
  }

  test("alternation with a bound endpoint pushes the constant into leg scans") {
    val df = Engine.query(store,
      """SELECT ?x WHERE { ?x (<urn:fk:c_nationkey>|<urn:fk:s_nationkey>) <urn:t:nation:3> }""")
    val byBranch = Engine.query(store,
      """SELECT ?x WHERE { { ?x <urn:fk:c_nationkey> <urn:t:nation:3> }
        |  UNION { ?x <urn:fk:s_nationkey> <urn:t:nation:3> } }""".stripMargin)
    assert(df.count() == byBranch.count())
  }

  test("FROM NAMED-only query has an empty default graph") {
    val s0 = Update(store,
      """INSERT DATA { GRAPH <urn:fn:g> { <urn:fn:a> <urn:fn:p> <urn:fn:b> } }""")
    // bare pattern + FROM NAMED only → default graph is empty → 0 solutions
    val bare = Engine.query(s0,
      "SELECT ?s FROM NAMED <urn:fn:g> WHERE { ?s <urn:fn:p> ?o }")
    assert(bare.count() == 0)
    // but the named graph is still reachable through GRAPH
    val named = Engine.query(s0,
      "SELECT ?s FROM NAMED <urn:fn:g> WHERE { GRAPH <urn:fn:g> { ?s <urn:fn:p> ?o } }")
    assert(named.count() == 1)
  }

  test("USING NAMED-only update sees an empty default graph in WHERE") {
    val s0 = Update(store,
      """INSERT DATA { GRAPH <urn:un:g> { <urn:un:a> <urn:un:p> <urn:un:b> }
        |  <urn:un:c> <urn:un:p> <urn:un:d> . }""".stripMargin)
    // bare WHERE pattern under USING NAMED only matches nothing → no insert
    val s1 = Update(s0,
      """INSERT { ?s <urn:un:hit> "bare" } USING NAMED <urn:un:g>
        |WHERE { ?s <urn:un:p> ?o }""".stripMargin)
    assert(Engine.query(s1,
      """SELECT ?s WHERE { ?s <urn:un:hit> "bare" }""").count() == 0)
    // GRAPH-scoped WHERE still reaches the USING NAMED graph
    val s2 = Update(s0,
      """INSERT { ?s <urn:un:hit> "graph" } USING NAMED <urn:un:g>
        |WHERE { GRAPH <urn:un:g> { ?s <urn:un:p> ?o } }""".stripMargin)
    assert(Engine.query(s2,
      """SELECT ?s WHERE { ?s <urn:un:hit> "graph" }""").count() == 1)
  }

  test("WITH before DELETE WHERE is rejected (SPARQL 1.1 grammar)") {
    val ex = intercept[Exception] {
      graft.sparql.Parser.parseUpdate(
        "WITH <urn:g> DELETE WHERE { <urn:a> <urn:p> ?v }")
    }
    assert(ex.getMessage.contains("WITH"))
  }
}
