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

  // ---- DescribeModeEnum selection via hint:describeMode (QueryHints.java:587) ----

  private def describeAlice(mode: String) = Engine.query(cbdStore,
    s"""PREFIX hint: <http://www.bigdata.com/queryHints#>
       |DESCRIBE ?x WHERE { hint:Query hint:describeMode "$mode" .
       |  ?x <urn:cbd:name> "Alice" }""".stripMargin)

  private def spo(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    df.select(coalesce(col("s")("str"), col("s")("id").cast("string")),
        col("p")("str"), coalesce(col("o")("str"), col("o")("id").cast("string")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("describeMode ForwardOneStep: attributes and forward links only, no bnode recursion") {
    val got = describeAlice("ForwardOneStep")
    val preds = got.select(col("p")("str")).collect().map(_.getString(0)).toSet
    assert(preds == Set("urn:cbd:name", "urn:cbd:addr", "urn:cbd:knows"))
    assert(got.count() == 3) // the _:a subgraph is NOT chased
  }

  test("describeMode SymmetricOneStep: forward plus backward one-step links") {
    // give alice an inbound edge to make the reverse half observable
    val s2 = Update(cbdStore,
      "INSERT DATA { <urn:cbd:carol> <urn:cbd:knows> <urn:cbd:alice> . }")
    val got = Engine.query(s2,
      """PREFIX hint: <http://www.bigdata.com/queryHints#>
        |DESCRIBE ?x WHERE { hint:Query hint:describeMode "SymmetricOneStep" .
        |  ?x <urn:cbd:name> "Alice" }""".stripMargin)
    val triples = spo(got)
    assert(triples.exists { case (s, p, _) => s == "urn:cbd:carol" && p == "urn:cbd:knows" },
      "backward link missing in SymmetricOneStep")
    assert(got.count() == 4) // 3 forward + 1 backward, still no bnode recursion
  }

  test("describeMode CBD explicitly matches the default") {
    assert(spo(describeAlice("CBD")) == spo(Engine.query(cbdStore,
      """DESCRIBE ?x WHERE { ?x <urn:cbd:name> "Alice" }""")))
  }

  test("describeMode SCBD: CBD plus reverse closure through bnode subjects") {
    // inbound chain: _:r1 -> alice with a bnode SUBJECT, and a further statement
    // pointing at _:r1 (reverse recursion must chase it); plus an IRI inbound edge
    // that must NOT recurse further (up-to-but-not-beyond a URIref subject)
    val s2 = Update(cbdStore,
      """INSERT DATA {
        |  _:r1 <urn:scbd:mentions> <urn:cbd:alice> .
        |  _:r2 <urn:scbd:partOf> _:r1 .
        |  <urn:cbd:carol> <urn:cbd:knows> <urn:cbd:alice> .
        |  <urn:cbd:dave> <urn:cbd:knows> <urn:cbd:carol> .
        |}""".stripMargin)
    val got = Engine.query(s2,
      """PREFIX hint: <http://www.bigdata.com/queryHints#>
        |DESCRIBE ?x WHERE { hint:Query hint:describeMode "SCBD" .
        |  ?x <urn:cbd:name> "Alice" }""".stripMargin)
    val preds = got.select(col("p")("str")).collect().map(_.getString(0)).toSet
    assert(preds.contains("urn:scbd:mentions"), "reverse one-step missing")
    assert(preds.contains("urn:scbd:partOf"), "reverse bnode-subject recursion missing")
    assert(preds.contains("urn:cbd:lat"), "SCBD must include the full forward CBD")
    // the inbound IRI edge is included, but carol herself is not reverse-expanded
    val triples = spo(got)
    assert(triples.exists { case (s, _, _) => s == "urn:cbd:carol" })
    assert(!triples.exists { case (s, _, o) => s == "urn:cbd:dave" && o == "urn:cbd:carol" },
      "reverse expansion must stop at URIref subjects")
    assert(got.count() == 7 + 3) // forward CBD (7) + mentions/partOf/carol-knows
  }

  test("unknown describeMode is rejected with the mode vocabulary") {
    val e = intercept[IllegalArgumentException](describeAlice("Nope").collect())
    assert(e.getMessage.contains("describeMode") && e.getMessage.contains("SCBD"))
  }
}
