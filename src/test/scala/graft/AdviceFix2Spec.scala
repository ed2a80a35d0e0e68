package graft

import graft.engine.{Engine, Update}
import org.apache.spark.sql.functions._

/** Regression specs for the round-2 ADVICE items plus the UPDATE-grammar
  * completions (WITH / USING / USING NAMED / DELETE WHERE shorthand,
  * AST2BOpUpdate.java:474-512).
  */
class AdviceFix2Spec extends GraftSuite {

  test("INSERT template bnodes mint a fresh bnode per solution") {
    val s0 = Update(store,
      """INSERT { ?n <urn:adv2:hasBox> [ <urn:adv2:boxOf> ?n ] }
        |WHERE { ?n <urn:fk:n_regionkey> <urn:t:region:1> }""".stripMargin)
    val df = Engine.query(s0,
      """SELECT ?n ?b WHERE { ?n <urn:adv2:hasBox> ?b . ?b <urn:adv2:boxOf> ?n }""")
    val rows = df.collect()
    assert(rows.length == 5) // 5 nations in region 1
    // all 5 bnodes are distinct (fresh per solution, not one shared node)
    assert(df.select(col("b")("id")).distinct().count() == 5)
  }

  test("seeded path with both endpoints bound preserves multiplicity") {
    val s0 = Update(store,
      """INSERT DATA { <urn:m:a> <urn:m:p> <urn:m:x> . <urn:m:a> <urn:m:p> <urn:m:y> .
        |  <urn:m:x> <urn:m:q> <urn:m:b> . <urn:m:y> <urn:m:q> <urn:m:b> . }""".stripMargin)
    // :a (:p)*/:q :b relates a→b via x AND via y → 2 solutions, and the seeded
    // evaluation (endpoints pre-bound through VALUES) must agree
    val seeded = Engine.query(s0,
      """SELECT ?s ?o WHERE { VALUES (?s ?o) { (<urn:m:a> <urn:m:b>) }
        |  ?s (<urn:m:p>)*/<urn:m:q> ?o }""".stripMargin)
    assert(seeded.count() == 2)
  }

  test("hint:optimizer None keeps closure paths at their source position") {
    // with keepOrder the var-var closure path is NOT deferred behind plain triples;
    // correctness must be unchanged
    val df = Engine.query(store,
      """PREFIX hint: <http://www.bigdata.com/queryHints#>
        |SELECT ?a ?b WHERE {
        |  hint:Query hint:optimizer "None" .
        |  ?a (<urn:fk:n_regionkey>)+ ?b .
        |  ?a <urn:p:n_name> "NATION_5" }""".stripMargin)
    assert(df.count() == 1)
  }

  test("FROM-scoped zero-length path stays inside the dataset's graphs") {
    val s0 = Update(store,
      """INSERT DATA {
        |  GRAPH <urn:zg:1> { <urn:z:a> <urn:z:p> <urn:z:b> . }
        |  GRAPH <urn:zg:2> { <urn:z:c> <urn:z:p> <urn:z:d> . } }""".stripMargin)
    val df = Engine.query(s0,
      """SELECT ?x ?y FROM <urn:zg:1> WHERE { ?x (<urn:z:p>)? ?y }""")
    val nodes = df.select(col("x")("str")).collect().map(_.getString(0)).toSet
    // zero-length pairs only over {a,b}: c/d live in the other graph
    assert(nodes == Set("urn:z:a", "urn:z:b"))
    assert(df.count() == 3) // (a,a) (b,b) (a,b)
  }

  test("AVG/SUM over an all-unbound non-empty group is an error, empty group is 0") {
    val df = Engine.query(store,
      """SELECT ?r (AVG(?v) AS ?avg) (SUM(?v) AS ?sum) WHERE {
        |  ?n <urn:fk:n_regionkey> ?r .
        |  OPTIONAL { ?n <urn:adv2:noSuchProp> ?v }
        |} GROUP BY ?r""".stripMargin)
    val rows = df.select(col("avg"), col("sum")).collect()
    assert(rows.nonEmpty)
    // every group is non-empty with ?v unbound on all rows → aggregate errors (null)
    assert(rows.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("WITH <g> scopes both WHERE and bare template quads") {
    val s0 = Update(store,
      """INSERT DATA {
        |  GRAPH <urn:wg:1> { <urn:w:s> <urn:w:p> "old" . }
        |  <urn:w:s> <urn:w:p> "default" . }""".stripMargin)
    val s1 = Update(s0,
      """WITH <urn:wg:1>
        |DELETE { <urn:w:s> <urn:w:p> ?v } INSERT { <urn:w:s> <urn:w:p> "new" }
        |WHERE { <urn:w:s> <urn:w:p> ?v }""".stripMargin)
    // named graph rewritten; default graph untouched
    assert(Engine.query(s1,
      "ASK { GRAPH <urn:wg:1> { <urn:w:s> <urn:w:p> \"new\" } }").first().getBoolean(0))
    assert(!Engine.query(s1,
      "ASK { GRAPH <urn:wg:1> { <urn:w:s> <urn:w:p> \"old\" } }").first().getBoolean(0))
    assert(Engine.query(s1,
      "ASK { <urn:w:s> <urn:w:p> \"default\" }").first().getBoolean(0))
  }

  test("USING selects the WHERE dataset and overrides WITH") {
    val s0 = Update(store,
      """INSERT DATA {
        |  GRAPH <urn:ug:src> { <urn:u:x> <urn:u:p> "v1" . }
        |  GRAPH <urn:ug:other> { <urn:u:y> <urn:u:p> "v2" . } }""".stripMargin)
    val s1 = Update(s0,
      """WITH <urn:ug:other>
        |INSERT { <urn:u:out> <urn:u:got> ?v }
        |USING <urn:ug:src>
        |WHERE { ?s <urn:u:p> ?v }""".stripMargin)
    // WHERE ran against USING graph (src), not the WITH graph; insert targeted WITH
    val df = Engine.query(s1,
      "SELECT ?v WHERE { GRAPH <urn:ug:other> { <urn:u:out> <urn:u:got> ?v } }")
    val vs = df.select(col("v")("str")).collect().map(_.getString(0)).toSet
    assert(vs == Set("v1"))
  }

  test("USING NAMED restricts GRAPH ?g iteration in the WHERE") {
    val s0 = Update(store,
      """INSERT DATA {
        |  GRAPH <urn:un:1> { <urn:un:a> <urn:un:p> "one" . }
        |  GRAPH <urn:un:2> { <urn:un:b> <urn:un:p> "two" . } }""".stripMargin)
    val s1 = Update(s0,
      """INSERT { ?s <urn:un:seen> ?v }
        |USING NAMED <urn:un:1>
        |WHERE { GRAPH ?g { ?s <urn:un:p> ?v } }""".stripMargin)
    val df = Engine.query(s1, "SELECT ?v WHERE { ?s <urn:un:seen> ?v }")
    assert(df.select(col("v")("str")).collect().map(_.getString(0)).toSet == Set("one"))
  }

  test("DELETE WHERE shorthand deletes the matched pattern including GRAPH blocks") {
    val s0 = Update(store,
      """INSERT DATA {
        |  <urn:dw:a> <urn:dw:p> 1 . <urn:dw:a> <urn:dw:q> 2 .
        |  GRAPH <urn:dwg:1> { <urn:dw:b> <urn:dw:p> 3 . } }""".stripMargin)
    val s1 = Update(s0,
      """DELETE WHERE { <urn:dw:a> <urn:dw:p> ?v .
        |  GRAPH <urn:dwg:1> { ?s <urn:dw:p> ?w } }""".stripMargin)
    assert(!Engine.query(s1, "ASK { <urn:dw:a> <urn:dw:p> ?v }").first().getBoolean(0))
    assert(!Engine.query(s1,
      "ASK { GRAPH <urn:dwg:1> { ?s <urn:dw:p> ?w } }").first().getBoolean(0))
    // untouched sibling predicate survives
    assert(Engine.query(s1, "ASK { <urn:dw:a> <urn:dw:q> 2 }").first().getBoolean(0))
  }
}
