package graft

import graft.engine.{Engine, Update}
import org.apache.spark.sql.functions._

/** Iterative Concise Bounded Description (CBD.java): DESCRIBE must chase
  * bnode-valued properties transitively — the one-round expansion truncated
  * anything past the first bnode hop.
  */
class DescribeCbdSpec extends GraftSuite {

  // address structured as a 2-deep bnode chain + a bnode cycle for termination
  private lazy val cbdStore = Update(store,
    """INSERT DATA {
      |  <urn:cbd:alice> <urn:cbd:name> "Alice" .
      |  <urn:cbd:alice> <urn:cbd:addr> _:a .
      |  _:a <urn:cbd:street> "Main St 1" .
      |  _:a <urn:cbd:geo> _:g .
      |  _:g <urn:cbd:lat> "52.5" .
      |  _:g <urn:cbd:backref> _:a .
      |  <urn:cbd:alice> <urn:cbd:knows> <urn:cbd:bob> .
      |  <urn:cbd:bob> <urn:cbd:name> "Bob" .
      |}""".stripMargin)

  test("DESCRIBE includes transitive bnode closure, not just one hop") {
    val df = Engine.query(cbdStore, "DESCRIBE <urn:cbd:alice>")
    val preds = df.select(col("p")("str")).collect().map(_.getString(0)).toSet
    // hop 0: name/addr/knows; hop 1: street/geo; hop 2: lat/backref
    assert(preds.contains("urn:cbd:street"), "first bnode hop missing")
    assert(preds.contains("urn:cbd:lat"), "second bnode hop missing (iterative CBD)")
    assert(preds.contains("urn:cbd:backref"), "cycle edge missing")
    // bnode cycle terminates; IRI-valued knows is NOT expanded (bob stays undescribed)
    assert(!df.select(col("s")("str")).collect().map(_.getString(0))
      .contains("urn:cbd:bob"))
    assert(df.count() == 7)
  }

  test("DESCRIBE ?x WHERE picks targets from solutions and still closes over bnodes") {
    val df = Engine.query(cbdStore,
      """DESCRIBE ?x WHERE { ?x <urn:cbd:name> "Alice" }""")
    assert(df.count() == 7)
  }
}
