package graft

import graft.engine.{Engine, TermIds}
import graft.model.{GraftStore, SubjectIndex}
import graft.engine.Update
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subject access path (SubjectIndex): bound-subject probes must route to the
  * s_b-bucketed sidecar (bucket-dir pruning + pushed s.id filter) instead of
  * scanning every p_id partition's s-column — the SPO-index analog
  * (`rdf/spo/SPOKeyOrder.java:112-127`), the r15 concurrency scale-killer.
  * Durable commits maintain the sidecar O(delta) via the `-sidx-delta` side
  * dir; in-session mutation segments layer on top.
  */
class SubjectIndexSpec extends GraftSuite {

  private def memTwin: GraftStore =
    GraftStore.cached(spark, store.statements.select("s", "p", "o", "g", "stype"))

  private def pv(df: DataFrame, p: String = "p", v: String = "v"): Set[(Long, Long)] =
    df.select(col(p)("id"), col(v)("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("constant-subject star scans the sidecar: s_b partition pruning + pushed s.id") {
    val q = "SELECT ?p ?v WHERE { <urn:t:region:0> ?p ?v }"
    val df = Engine.query(store, q)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("-sidx"), s"expected the subject sidecar in the scan:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("s_b"),
      s"expected s_b partition pruning:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("s.id"),
      s"expected pushed s.id filter:\n$plan")
    // correctness: identical solutions to a store with no sidecar
    assert(pv(df) === pv(Engine.query(memTwin, q)))
    assert(pv(df).nonEmpty)
  }

  test("seeded subject-star (BSBM Q11 shape): var subject bound by a prior pattern") {
    val q = "SELECT ?pr ?v WHERE { ?l <urn:p:l_orderkey> 1 ; ?pr ?v }"
    val df = Engine.query(store, q)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("-sidx"), s"expected the seeded sidecar route:\n$plan")
    assert(pv(df, "pr", "v") === pv(Engine.query(memTwin, q), "pr", "v"))
    assert(pv(df, "pr", "v").nonEmpty)
  }

  test("seeded route respects graph scoping and multiplicity") {
    // GRAPH-constant scoping on the wildcard triple must hold on the sidecar view
    val q = """SELECT ?pr ?v WHERE { ?l <urn:p:l_orderkey> 1 .
              |  GRAPH <urn:g:lineitem> { ?l ?pr ?v } }""".stripMargin
    val df = Engine.query(store, q)
    assert(pv(df, "pr", "v") === pv(Engine.query(memTwin, q), "pr", "v"))
    // row multiplicity (not just distinct pairs) must match too
    val qc = "SELECT (COUNT(*) AS ?n) WHERE { ?l <urn:p:l_orderkey> 1 ; ?pr ?v }"
    val n1 = Engine.query(store, qc).select(col("n")("lng")).first().getLong(0)
    val n2 = Engine.query(memTwin, qc).select(col("n")("lng")).first().getLong(0)
    assert(n1 === n2 && n1 > 0)
  }

  // ---- durable-commit maintenance ----

  val base = """
    @prefix : <urn:sx:> .
    :g {
      :u1 :name "one" .
      :u1 :likes :u2 .
      :u2 :name "two" .
      :u2 :age 7 .
      :u9 :solo :u1 .
    }
  """

  private def freshStore(tag: String): (GraftStore, String) = {
    val p = s"/tmp/graft-sidx-$tag"
    GraftStore.save(graft.sources.Rio.readTrig(spark, base), p)
    SubjectIndex.ensure(spark, p)
    (GraftStore.load(spark, p), p)
  }

  private def keys(df: DataFrame): Set[(Long, Long, Long, Byte)] =
    df.select(col("s")("id"), col("p")("id"), col("o")("id"), col("stype"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getByte(3))).toSet

  private def sidxFiles(p: String): Set[(String, Long, Long)] = {
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).iterator.flatten.flatMap(walk)
      else Iterator(f)
    walk(new java.io.File(SubjectIndex.dir(p)))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getPath, f.length(), f.lastModified())).toSet
  }

  test("saveInPlace maintains the sidecar O(delta): base files untouched, delta folds") {
    val (st, p) = freshStore("t1")
    val before = sidxFiles(p)
    val mutated = graft.sparql.Parser.parseUpdate(
      """INSERT DATA { GRAPH <urn:sx:g> { <urn:sx:u3> <urn:sx:name> "three" } } ;
        |DELETE DATA { GRAPH <urn:sx:g> { <urn:sx:u1> <urn:sx:name> "one" } }""".stripMargin)
      .foldLeft(st)(Update.applyOp)
    val expected = keys(mutated.statements)
    val reopened = GraftStore.saveInPlace(mutated, p)
    // the sidecar base was NOT rewritten (O(delta) commit budget)
    assert(sidxFiles(p) === before, "sidecar base files were rewritten")
    assert(new java.io.File(SubjectIndex.deltaDir(p)).exists(), "expected delta side dir")
    // every subject's slice now matches the committed statements
    val all = reopened.statements.select(col("s")("id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val slice = reopened.subjectSlice(all)
    assert(slice.isDefined, "sidecar must remain valid across the commit")
    assert(keys(slice.get) === expected)
    // the added subject is served from the delta; the deleted row is folded away
    val u3 = reopened.subjectSlice(Seq(TermIds.iriId("urn:sx:u3"))).get
    assert(keys(u3).nonEmpty)
    val u1 = keys(reopened.subjectSlice(Seq(TermIds.iriId("urn:sx:u1"))).get)
    assert(!u1.exists(_._2 == TermIds.iriId("urn:sx:name")), "deleted row resurrected")
    assert(u1.exists(_._2 == TermIds.iriId("urn:sx:likes")), "surviving row lost")
  }

  test("in-session mutation segments layer over the sidecar slice") {
    val (st, p) = freshStore("t2")
    val mutated = graft.sparql.Parser.parseUpdate(
      """INSERT DATA { GRAPH <urn:sx:g> { <urn:sx:u2> <urn:sx:name> "zwei" } }""")
      .foldLeft(st)(Update.applyOp)
    val sid = TermIds.iriId("urn:sx:u2")
    val slice = mutated.subjectSlice(Seq(sid))
    assert(slice.isDefined)
    assert(keys(slice.get) ===
      keys(mutated.statements.filter(col("s")("id") === sid)))
  }

  test("a full save() drops derived dirs so a stale sidecar is never served") {
    val (st, p) = freshStore("t3")
    assert(st.hasSubjectIndex)
    // rebuild the statements at the same path OUTSIDE the maintained path
    // (fresh frame — a plan reading `p` itself can't overwrite it)
    GraftStore.save(graft.sources.Rio.readTrig(spark, base), p)
    assert(!new java.io.File(SubjectIndex.dir(p)).exists(),
      "save() must drop the orphaned sidecar")
    assert(!GraftStore.load(spark, p).hasSubjectIndex)
  }
}
