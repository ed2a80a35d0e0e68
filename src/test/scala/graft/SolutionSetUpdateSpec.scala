package graft

import org.apache.spark.sql.functions._

import graft.engine.{Engine, Update}
import graft.model.GraftStore
import graft.sources.Rio

/** Solution-set UPDATE extension (`INSERT INTO %set` / `DELETE FROM %set` —
  * the reference's ssets surface, BigdataSPARQLUpdateTest2.java; the ssets
  * TCK suite in SubTck runs the corpus's own 6 cases, this spec pins the
  * unit-level contracts).
  */
class SolutionSetUpdateSpec extends GraftSuite {

  private def freshStore: GraftStore = new GraftStore(spark, Rio.readTurtle(spark,
    """@prefix : <urn:ss:> .
      |:a :label "A" . :b :label "B" . :c :label "C" .
      |""".stripMargin).localCheckpoint())

  test("INSERT INTO builds a named set; INCLUDE joins it") {
    val st = Update(freshStore,
      "INSERT INTO %s1 SELECT ?x ?n WHERE { ?x <urn:ss:label> ?n }")
    val rows = Engine.query(st, "SELECT ?x ?n WHERE { INCLUDE %s1 }")
      .select(col("n")("str")).collect().map(_.getString(0)).sorted.toSeq
    assert(rows == Seq("A", "B", "C"))
    // second INSERT INTO appends (bag union)
    val st2 = Update(st,
      """INSERT INTO %s1 SELECT ?x ?n WHERE { ?x <urn:ss:label> ?n . FILTER(?n = "A") }""")
    assert(Engine.query(st2, "SELECT ?x ?n WHERE { INCLUDE %s1 }").count() == 4)
  }

  test("DELETE FROM removes matching solutions; combined form moves them") {
    val st = Update(freshStore,
      """INSERT INTO %s1 SELECT ?x ?n WHERE { ?x <urn:ss:label> ?n } ;
        |DELETE FROM %s1 SELECT ?x ?n
        |INSERT INTO %s2 SELECT ?x ?n
        |WHERE { ?x <urn:ss:label> ?n . FILTER(?n = "B") }""".stripMargin)
    val s1 = Engine.query(st, "SELECT ?n WHERE { INCLUDE %s1 }")
      .select(col("n")("str")).collect().map(_.getString(0)).sorted.toSeq
    val s2 = Engine.query(st, "SELECT ?n WHERE { INCLUDE %s2 }")
      .select(col("n")("str")).collect().map(_.getString(0)).toSeq
    assert(s1 == Seq("A", "C") && s2 == Seq("B"))
  }

  test("DELETE FROM with SELECT * uses the full binding") {
    val st = Update(freshStore,
      """INSERT INTO %s1 SELECT ?x ?n WHERE { ?x <urn:ss:label> ?n } ;
        |DELETE FROM %s1 SELECT * WHERE { BIND(<urn:ss:a> as ?x) BIND("A" as ?n) }""".stripMargin)
    val left = Engine.query(st, "SELECT ?n WHERE { INCLUDE %s1 }")
      .select(col("n")("str")).collect().map(_.getString(0)).sorted.toSeq
    assert(left == Seq("B", "C"))
  }
}
