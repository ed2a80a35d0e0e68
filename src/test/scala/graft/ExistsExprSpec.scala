package graft

import graft.engine.Engine

/** Round-6 differential-probe fixes: EXISTS in expression position
  * (ExistsNode/NotExistsNode as askable subqueries anywhere an expression
  * appears), IN/NOT IN error propagation (§17.4.1.9/10), fn:round half-to-+∞.
  */
class ExistsExprSpec extends GraftSuite {

  test("EXISTS under IF in a SELECT expression") {
    val y = Engine.query(store,
      """SELECT (IF(EXISTS { ?r a <urn:c:Region> }, "y", "n") AS ?v) WHERE {}""")
      .first().getStruct(0).getAs[String]("str")
    assert(y == "y")
    val n = Engine.query(store,
      """SELECT (IF(EXISTS { ?r a <urn:c:Nope> }, "y", "n") AS ?v) WHERE {}""")
      .first().getStruct(0).getAs[String]("str")
    assert(n == "n")
  }

  test("BIND(EXISTS) correlated with outer bindings") {
    // correlated: per-region flag on whether any nation links to it
    val rows = Engine.query(store,
      """SELECT ?r ?has WHERE { ?r a <urn:c:Region> .
        |  BIND(EXISTS { ?n <urn:fk:n_regionkey> ?r } AS ?has) }""".stripMargin)
      .collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getStruct(1).getAs[String]("str") == "true"))
    // and a correlated NOT EXISTS flag is the negation
    val none = Engine.query(store,
      """SELECT ?r ?no WHERE { ?r a <urn:c:Region> .
        |  BIND(NOT EXISTS { ?n <urn:fk:n_regionkey> ?r } AS ?no) }""".stripMargin)
      .collect()
    assert(none.forall(_.getStruct(1).getAs[String]("str") == "false"))
  }

  test("EXISTS composed inside a FILTER expression (non-root)") {
    val rows = Engine.query(store,
      """SELECT ?r WHERE { ?r a <urn:c:Region> .
        |  FILTER(EXISTS { ?n <urn:fk:n_regionkey> ?r } && true) }""".stripMargin)
      .count()
    assert(rows == 5)
  }

  test("NOT IN with an erroring member poisons the row; IN short-circuits on match") {
    val in = Engine.query(store,
      "SELECT ?v WHERE { VALUES ?v { 2 } FILTER(?v IN (1/0, 2)) }").count()
    assert(in == 1) // a true disjunct wins over the error
    val notIn = Engine.query(store,
      "SELECT ?v WHERE { VALUES ?v { 3 } FILTER(?v NOT IN (1/0, 2)) }").count()
    assert(notIn == 0) // error || false = error; !error = error -> dropped
    val notInNoErr = Engine.query(store,
      "SELECT ?v WHERE { VALUES ?v { 3 } FILTER(?v NOT IN (1, 2)) }").count()
    assert(notInNoErr == 1)
  }

  test("fn:round rounds half toward positive infinity") {
    def rnd(l: String): String = Engine.query(store,
      s"SELECT (ROUND($l) AS ?r) WHERE {}").first().getStruct(0).getAs[String]("str")
    assert(rnd("-2.5") == "-2")
    assert(rnd("2.5") == "3")
    assert(rnd("-2.6") == "-3")
    // a DOUBLE rounds to an INTEGRAL numeric, matching the reference
    // (MathUtility.java:427 Math.round → long)
    assert(rnd("\"-2.5\"^^<http://www.w3.org/2001/XMLSchema#double>") == "-2")
  }
}
