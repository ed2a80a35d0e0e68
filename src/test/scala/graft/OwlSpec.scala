package graft

import graft.engine.{Engine, Update}
import graft.inference.Rdfs
import org.apache.spark.sql.functions._

/** OWL-subset rules (rdf/rules/RuleOwl*.java): inverseOf, TransitiveProperty,
  * sameAs, equivalentClass/Property — staged broadcast rules over the fact base.
  */
class OwlSpec extends GraftSuite {

  private val owl = "http://www.w3.org/2002/07/owl#"

  test("owl:inverseOf derives reversed statements (both directions)") {
    val s0 = Update(store,
      s"""INSERT DATA {
         |  <urn:o:hasPart> <${owl}inverseOf> <urn:o:partOf> .
         |  <urn:o:w1> <urn:o:hasPart> <urn:o:p1> .
         |  <urn:o:p2> <urn:o:partOf> <urn:o:w2> . }""".stripMargin)
    val c = Rdfs.closure(s0)
    assert(Engine.query(c, "ASK { <urn:o:p1> <urn:o:partOf> <urn:o:w1> }").first().getBoolean(0))
    assert(Engine.query(c, "ASK { <urn:o:w2> <urn:o:hasPart> <urn:o:p2> }").first().getBoolean(0))
  }

  test("owl:TransitiveProperty closes chains") {
    val s0 = Update(store,
      s"""INSERT DATA {
         |  <urn:o:anc> a <${owl}TransitiveProperty> .
         |  <urn:o:a> <urn:o:anc> <urn:o:b> .
         |  <urn:o:b> <urn:o:anc> <urn:o:c> .
         |  <urn:o:c> <urn:o:anc> <urn:o:d> . }""".stripMargin)
    val c = Rdfs.closure(s0)
    assert(Engine.query(c, "ASK { <urn:o:a> <urn:o:anc> <urn:o:d> }").first().getBoolean(0))
    assert(Engine.query(c, "SELECT ?y WHERE { <urn:o:a> <urn:o:anc> ?y }").count() == 3)
  }

  test("owl:sameAs closes symmetric/transitive and substitutes subjects/objects") {
    val s0 = Update(store,
      s"""INSERT DATA {
         |  <urn:o:x1> <${owl}sameAs> <urn:o:x2> .
         |  <urn:o:x2> <${owl}sameAs> <urn:o:x3> .
         |  <urn:o:x1> <urn:o:likes> <urn:o:z> .
         |  <urn:o:y> <urn:o:knows> <urn:o:x3> . }""".stripMargin)
    val c = Rdfs.closure(s0)
    // sameAs closure: x3 sameAs x1 (symmetry + transitivity)
    assert(Engine.query(c, s"ASK { <urn:o:x3> <${owl}sameAs> <urn:o:x1> }").first().getBoolean(0))
    // subject substitution: x3 likes z
    assert(Engine.query(c, "ASK { <urn:o:x3> <urn:o:likes> <urn:o:z> }").first().getBoolean(0))
    // object substitution: y knows x1
    assert(Engine.query(c, "ASK { <urn:o:y> <urn:o:knows> <urn:o:x1> }").first().getBoolean(0))
  }

  test("owl:equivalentClass/Property behave as mutual sub-relations") {
    val s0 = Update(store,
      s"""INSERT DATA {
         |  <urn:o:Car> <${owl}equivalentClass> <urn:o:Automobile> .
         |  <urn:o:drives> <${owl}equivalentProperty> <urn:o:operates> .
         |  <urn:o:v> a <urn:o:Car> .
         |  <urn:o:d> <urn:o:operates> <urn:o:v> . }""".stripMargin)
    val c = Rdfs.closure(s0)
    assert(Engine.query(c, "ASK { <urn:o:v> a <urn:o:Automobile> }").first().getBoolean(0))
    assert(Engine.query(c, "ASK { <urn:o:d> <urn:o:drives> <urn:o:v> }").first().getBoolean(0))
    // symmetric schema statements derived
    assert(Engine.query(c,
      s"ASK { <urn:o:Automobile> <${owl}equivalentClass> <urn:o:Car> }").first().getBoolean(0))
  }

  test("owl:SymmetricProperty derives the reversed statement") {
    val s0 = Update(store,
      s"""INSERT DATA {
         |  <urn:o:adjacent> a <${owl}SymmetricProperty> .
         |  <urn:o:r1> <urn:o:adjacent> <urn:o:r2> . }""".stripMargin)
    val c = Rdfs.closure(s0)
    assert(Engine.query(c, "ASK { <urn:o:r2> <urn:o:adjacent> <urn:o:r1> }").first().getBoolean(0))
  }

  test("owl:FunctionalProperty and owl:InverseFunctionalProperty derive sameAs") {
    val s0 = Update(store,
      s"""INSERT DATA {
         |  <urn:o:hasMother> a <${owl}FunctionalProperty> .
         |  <urn:o:kid> <urn:o:hasMother> <urn:o:m1> .
         |  <urn:o:kid> <urn:o:hasMother> <urn:o:m2> .
         |  <urn:o:m1> <urn:o:bornIn> <urn:o:berlin> .
         |  <urn:o:ssn> a <${owl}InverseFunctionalProperty> .
         |  <urn:o:pA> <urn:o:ssn> <urn:o:s123> .
         |  <urn:o:pB> <urn:o:ssn> <urn:o:s123> . }""".stripMargin)
    val c = Rdfs.closure(s0)
    // FP: the two mothers unify, and sameAs substitution propagates facts
    assert(Engine.query(c, s"ASK { <urn:o:m1> <${owl}sameAs> <urn:o:m2> }").first().getBoolean(0))
    assert(Engine.query(c, "ASK { <urn:o:m2> <urn:o:bornIn> <urn:o:berlin> }").first().getBoolean(0))
    // IFP: shared ssn value unifies the subjects (both directions via CC)
    assert(Engine.query(c, s"ASK { <urn:o:pB> <${owl}sameAs> <urn:o:pA> }").first().getBoolean(0))
  }

  test("owl:hasValue restriction derives the property value from the type") {
    val s0 = Update(store,
      s"""INSERT DATA {
         |  <urn:o:Electric> a <${owl}Restriction> .
         |  <urn:o:Electric> <${owl}onProperty> <urn:o:fuel> .
         |  <urn:o:Electric> <${owl}hasValue> <urn:o:battery> .
         |  <urn:o:tesla> a <urn:o:Electric> . }""".stripMargin)
    val c = Rdfs.closure(s0)
    assert(Engine.query(c, "ASK { <urn:o:tesla> <urn:o:fuel> <urn:o:battery> }").first().getBoolean(0))
  }

  test("owl:hasValue fires on types derived by rdfs9 (second application)") {
    // x a C, C subClassOf R (a Restriction) — membership in R is DERIVED by
    // rdfs9, so the first (pre-type-rules) hasValue pass never sees it; the
    // staged re-application must
    val s0 = Update(store,
      s"""INSERT DATA {
         |  <urn:o:EV> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:o:Plugin> .
         |  <urn:o:Plugin> a <${owl}Restriction> .
         |  <urn:o:Plugin> <${owl}onProperty> <urn:o:charge> .
         |  <urn:o:Plugin> <${owl}hasValue> <urn:o:socket> .
         |  <urn:o:bolt> a <urn:o:EV> . }""".stripMargin)
    val c = Rdfs.closure(s0)
    assert(Engine.query(c, "ASK { <urn:o:bolt> <urn:o:charge> <urn:o:socket> }").first().getBoolean(0))
  }

  test("closureFixpoint cascades FP merges that the staged pass misses") {
    // f, g functional; x f y1, x f y2 → y1 sameAs y2. Substituting y2 for y1
    // gives y2 g z1 alongside y2 g z2 — a NEW functional violation, so
    // z1 sameAs z2 derives only on a second rule pass.
    val s0 = Update(store,
      s"""INSERT DATA {
         |  <urn:fx:f> a <${owl}FunctionalProperty> .
         |  <urn:fx:g> a <${owl}FunctionalProperty> .
         |  <urn:fx:x> <urn:fx:f> <urn:fx:y1> .
         |  <urn:fx:x> <urn:fx:f> <urn:fx:y2> .
         |  <urn:fx:y1> <urn:fx:g> <urn:fx:z1> .
         |  <urn:fx:y2> <urn:fx:g> <urn:fx:z2> . }""".stripMargin)
    val cascade = s"ASK { <urn:fx:z1> <${owl}sameAs> <urn:fx:z2> }"
    // staged single pass: merge-of-merges absent (documented trade)
    assert(!Engine.query(Rdfs.closure(s0), cascade).first().getBoolean(0))
    // fixpoint driver: quiescence reached, cascade present
    assert(Engine.query(Rdfs.closureFixpoint(s0), cascade).first().getBoolean(0))
  }

  test("rdfs closure still green after owl staging (regression)") {
    val closed = Rdfs.closure(store)
    val n = Engine.query(closed, "SELECT (COUNT(*) AS ?c) WHERE { ?x a <urn:c:Any> }")
      .first().getStruct(0).getAs[Long]("lng")
    assert(n > 8000) // every typed subject is an Any via subclass axioms (sf0.001 ≈ 9.4k)
  }
}
