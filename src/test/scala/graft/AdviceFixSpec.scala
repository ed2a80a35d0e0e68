package graft

import graft.engine.{Engine, Update}
import graft.sources.Rio
import org.apache.spark.sql.functions._

/** Regression specs for the round-1 ADVICE items. */
class AdviceFixSpec extends GraftSuite {
  private val ss = SharedSpark.spark
  import ss.implicits._

  test("CLEAR DEFAULT removes only default-graph triples; CLEAR NAMED the inverse") {
    val s0 = Update(store,
      """INSERT DATA { <urn:adv:1> <urn:p:v> 1 .
        |  GRAPH <urn:g:adv> { <urn:adv:2> <urn:p:v> 2 . } }""".stripMargin)
    val cleared = Update(s0, "CLEAR DEFAULT")
    assert(cleared.statements.filter(col("g").isNull).count() == 0)
    assert(Engine.query(cleared,
      "ASK { GRAPH <urn:g:adv> { <urn:adv:2> <urn:p:v> 2 } }").first().getBoolean(0))
    val clearedNamed = Update(s0, "CLEAR NAMED")
    assert(clearedNamed.statements.filter(col("g").isNotNull).count() == 0)
    assert(Engine.query(clearedNamed,
      "ASK { <urn:adv:1> <urn:p:v> 1 }").first().getBoolean(0))
  }

  test("OPTIONAL with FILTER matches rows whose shared var is maybe-unbound") {
    // left side: UNION where ?r is bound in one arm only; OPTIONAL { ?r :r_name ?rn
    // FILTER(...) } must still join the arm where ?r was unbound on the left? No —
    // SPARQL compatibility: a row with unbound ?r is compatible with every ?r, so the
    // OPTIONAL matches and binds ?r from the right side.
    val df = Engine.query(store,
      """SELECT ?n ?r ?rn WHERE {
        |  { <urn:t:nation:5> <urn:fk:n_regionkey> ?r . BIND(<urn:t:nation:5> AS ?n) }
        |  UNION
        |  { BIND(<urn:t:nation:7> AS ?n) }
        |  OPTIONAL { ?r <urn:p:r_name> ?rn . FILTER(STRLEN(?rn) > 0) }
        |}""".stripMargin)
    val rows = df.select(col("n")("str"), col("r").isNotNull, col("rn").isNotNull).collect()
    // arm 1: ?r bound on left, joined to its name
    val arm1 = rows.filter(_.getString(0) == "urn:t:nation:5")
    assert(arm1.length == 1 && arm1.head.getBoolean(1) && arm1.head.getBoolean(2))
    // arm 2: ?r unbound on left → compatible with all 5 regions
    val arm2 = rows.filter(_.getString(0) == "urn:t:nation:7")
    assert(arm2.length == 5 && arm2.forall(r => r.getBoolean(1) && r.getBoolean(2)))
  }

  test("integer arithmetic survives long overflow (promotes, not aborts)") {
    val df = Engine.query(store,
      """SELECT ?x WHERE { <urn:t:nation:5> <urn:p:n_nationkey> ?k .
        |  BIND(9223372036854775807 + ?k AS ?x) }""".stripMargin)
    val r = df.select(col("x")("num"), col("x")("dt")).first()
    assert(!r.isNullAt(0) && r.getDouble(0) > 9.2e18) // promoted to double, not error
  }

  test("double division by zero yields INF/NaN; integer by zero is a type error") {
    val df = Engine.query(store,
      """SELECT ?inf ?nan ?err WHERE { <urn:t:nation:5> <urn:p:n_nationkey> ?k .
        |  BIND(1.5e0/0.0e0 AS ?inf) BIND(0.0e0/0.0e0 AS ?nan) BIND(1/0 AS ?err) }""".stripMargin)
    val r = df.select(col("inf")("num"), col("nan")("num"), col("err")).first()
    assert(r.getDouble(0).isPosInfinity)
    assert(r.getDouble(1).isNaN)
    assert(r.isNullAt(2)) // BIND error → unbound
  }

  test("N-Triples bnode label does not swallow the statement terminator") {
    val st = Rio.statementsFromLines(Seq(
      "<urn:s:x> <urn:p:e> _:b.",
      "_:c1 <urn:p:e> _:c2 _:gb .").toDS())
    val bn = st.filter(col("p")("str") === "urn:p:e")
    val labels = bn.select(col("o")("str")).as[String].collect().toSet
    assert(labels == Set("b", "c2"))
    // bnode in graph position is kept, as a bnode term
    val g = st.filter(col("g").isNotNull).select(col("g")("kind"), col("g")("str")).first()
    assert(g.getByte(0) == graft.model.Term.KIND_BNODE && g.getString(1) == "gb")
  }
}
