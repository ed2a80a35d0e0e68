package graft

import org.apache.spark.sql.functions._

import graft.engine.Engine
import graft.model.GraftStore
import graft.sources.Rio

/** Turtle-star (`.ttlx`) loading and the RDR BIND-sid lookup semantics
  * (TestReificationDoneRightEval.java — the reif/ TCK suite runs the corpus
  * itself; this spec pins the unit-level contracts).
  */
class TurtleStarSpec extends GraftSuite {

  private val ttlx =
    """@prefix :   <http://ex.com/> .
      |@prefix dc: <http://purl.org/dc/terms/> .
      |:a :b :c .
      |:a2 :b :c .
      |<< :a :b :c >> dc:source :news ;
      |               dc:created "2011-04-05T12:00:00Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> .
      |""".stripMargin

  test("ttlx load: annotation asserts inner statement once (set semantics)") {
    val st = new GraftStore(spark, Rio.readTurtle(spark, ttlx).localCheckpoint())
    // :a :b :c appears both plainly and as the annotation's inner statement —
    // exactly one stored row
    val inner = Engine.query(st,
      "SELECT ?s WHERE { ?s <http://ex.com/b> <http://ex.com/c> }")
    assert(inner.count() == 2) // :a and :a2, no duplicate for :a
    // the annotation is queryable through the SPARQL* pattern
    val ann = Engine.query(st,
      """SELECT ?src WHERE { << ?s <http://ex.com/b> <http://ex.com/c> >>
        |  <http://purl.org/dc/terms/source> ?src }""".stripMargin)
    assert(ann.select(col("src")("str")).collect().map(_.getString(0)).toSeq ==
      Seq("http://ex.com/news"))
  }

  test("BIND(<< >> AS ?sid) is a statement-pattern lookup, not a constructor") {
    val st = new GraftStore(spark, Rio.readTurtle(spark, ttlx).localCheckpoint())
    // unbound inner var: matches the annotated statement and binds it
    val df = Engine.query(st,
      """SELECT ?s ?src WHERE {
        |  BIND(<< ?s <http://ex.com/b> <http://ex.com/c> >> AS ?sid)
        |  ?sid <http://purl.org/dc/terms/source> ?src }""".stripMargin)
    val rows = df.select(col("s")("str"), col("src")("str")).collect()
    assert(rows.length == 1 && rows.head.getString(0) == "http://ex.com/a")
    // the sid exists only for ASSERTED statements: :a2 :b :c is asserted but
    // unannotated, :zz is neither — no phantom rows either way
    val none = Engine.query(st,
      """SELECT ?sid WHERE {
        |  BIND(<< <http://ex.com/zz> <http://ex.com/b> <http://ex.com/c> >> AS ?sid) }""".stripMargin)
    assert(none.count() == 0)
  }

  test("wildcard ?p over a sid subject hides the virtual decomposition") {
    val st = new GraftStore(spark, Rio.readTurtle(spark, ttlx).localCheckpoint())
    val df = Engine.query(st,
      """SELECT ?p WHERE { << <http://ex.com/a> <http://ex.com/b> <http://ex.com/c> >> ?p ?o }""")
    val ps = df.select(col("p")("str")).collect().map(_.getString(0)).toSet
    assert(ps == Set("http://purl.org/dc/terms/source", "http://purl.org/dc/terms/created"))
  }
}
