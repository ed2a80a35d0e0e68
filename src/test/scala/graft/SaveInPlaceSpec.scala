package graft

import graft.model.GraftStore
import graft.inference.Rdfs
import graft.engine.Update
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Durable O(delta) write-back (`GraftStore.saveInPlace`): a mutated store's
  * touched partitions fold back into its own at-rest parquet as a dynamic-
  * partition overwrite; untouched partition directories keep their exact
  * files, emptied partitions disappear, and the reopened store matches the
  * full-recompute result.
  */
class SaveInPlaceSpec extends AnyFunSuite {
  lazy val spark = Dev.session(8)

  val RDFS = "http://www.w3.org/2000/01/rdf-schema#"

  val base = s"""
    @prefix : <urn:sv:> .
    @prefix rdfs: <$RDFS> .
    :g {
      :B rdfs:subClassOf :A .
      :u1 a :B .
      :u2 a :B .
      :u1 :name "one" .
      :u2 :name "two" .
      :u1 :likes :u2 .
      :only :solo :u1 .
    }
  """

  def freshStore(tag: String): (GraftStore, String) = {
    val p = s"/tmp/graft-sip-$tag"
    val st = new GraftStore(spark, graft.sources.Rio.readTrig(spark, base))
    GraftStore.save(Rdfs.closure(st).statements, p)
    (GraftStore.load(spark, p), p)
  }

  def keys(st: GraftStore): Set[(Long, Long, Long, Long, Byte)] =
    st.statements.select(col("s")("id"), col("p")("id"), col("o")("id"),
      coalesce(col("g")("id"), lit(0L)), col("stype")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getByte(4))).toSet

  /** data files (not _SUCCESS) under each p_id dir → (name, size, mtime). */
  def fileState(path: String): Map[String, Set[(String, Long, Long)]] = {
    val root = new java.io.File(path)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("p_id="))
      .map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      }.toMap
  }

  test("TM delete folds back as a touched-partition overwrite; reopen matches") {
    val (st, p) = freshStore("t1")
    val before = fileState(p)
    val mutated = Update.withTruthMaintenance(st,
      "DELETE DATA { GRAPH <urn:sv:g> { <urn:sv:u1> a <urn:sv:B> . } }")
    assert(Rdfs.lastTmPath === "delta")
    assert(mutated.layoutOpt.exists(_.segs.nonEmpty), "mutation must be layout-kept")
    val expected = keys(mutated)
    // recompute baseline BEFORE the write-back: st's lazy plan reads the very
    // files the save replaces
    val fullKeys = keys(Rdfs.truthMaintain(graft.sparql.Parser
      .parseUpdate("DELETE DATA { GRAPH <urn:sv:g> { <urn:sv:u1> a <urn:sv:B> . } }")
      .foldLeft(st)(Update.applyOp)))
    val reopened = GraftStore.saveInPlace(mutated, p)
    assert(keys(reopened) === expected)
    assert(keys(reopened) === fullKeys)
    // untouched partitions kept their exact files (same name/size/mtime)
    val after = fileState(p)
    val touched = mutated.layoutOpt.get.segPids.map(v => s"p_id=$v")
    val untouched = before.keySet -- touched
    assert(untouched.nonEmpty, "scenario must leave some partitions untouched")
    untouched.foreach { d => assert(after(d) === before(d), s"$d was rewritten") }
    // and at least one touched dir actually changed
    assert(touched.exists(d => before.get(d) != after.get(d)))
  }

  test("emptied partition directory is dropped on write-back") {
    val (st, p) = freshStore("t2")
    val mutated = Update.withTruthMaintenance(st,
      "DELETE DATA { GRAPH <urn:sv:g> { <urn:sv:only> <urn:sv:solo> <urn:sv:u1> . } }")
    val soloPid = st.statements
      .filter(col("p")("str") === "urn:sv:solo")
      .select(col("p_id")).head().getLong(0)
    val expected = keys(mutated)
    val reopened = GraftStore.saveInPlace(mutated, p)
    assert(keys(reopened) === expected)
    assert(!new java.io.File(p, s"p_id=$soloPid").exists(),
      "emptied partition dir must be deleted, not left to resurrect rows")
  }

  test("recompute-path TM result saves back to its OWN path (staged swap)") {
    // A characteristic re-declaration (owl:SymmetricProperty delete) forces
    // the fixpoint-recompute TM path, whose result drops layout AND
    // atRestPath via withStatements but still SCANS the original parquet.
    // saveInPlace's fallback must stage-write + swap, not overwrite-in-place
    // (a direct mode=overwrite here is Spark's overwrite-while-read error).
    val p = s"/tmp/graft-sip-t5"
    val trig = s"""
      @prefix : <urn:sv:> .
      @prefix owl: <http://www.w3.org/2002/07/owl#> .
      :g {
        :knows a owl:SymmetricProperty .
        :u1 :knows :u2 .
        :u1 :name "one" .
      }
    """
    val st0 = new GraftStore(spark, graft.sources.Rio.readTrig(spark, trig))
    GraftStore.save(Rdfs.closureFixpoint(st0).statements, p)
    val st = GraftStore.load(spark, p)
    val mutated = Update.withTruthMaintenance(st,
      "DELETE DATA { GRAPH <urn:sv:g> { <urn:sv:knows> a <http://www.w3.org/2002/07/owl#SymmetricProperty> . } }")
    assert(Rdfs.lastTmPath === "full",
      "scenario must exercise the recompute path, not the delta path")
    val expected = keys(mutated) // collected BEFORE the write replaces the files
    val reopened = GraftStore.saveInPlace(mutated, p)
    assert(keys(reopened) === expected)
    // the symmetric-derived inverse must be gone from the durable store
    val knows = reopened.statements.filter(col("p")("str") === "urn:sv:knows")
    assert(knows.count() === 1L)
    assert(!new java.io.File(p + ".staging").exists(), "staging dir must be swapped away")
  }

  test("store not loaded from the target path falls back to a full save") {
    val (st, p) = freshStore("t3")
    val other = s"/tmp/graft-sip-t3b"
    val reopened = GraftStore.saveInPlace(st, other)
    assert(keys(reopened) === keys(st))
  }

  test("reopened store keeps partition pruning (bare parquet scan)") {
    val (st, p) = freshStore("t4")
    val mutated = Update.withTruthMaintenance(st,
      "DELETE DATA { GRAPH <urn:sv:g> { <urn:sv:u2> a <urn:sv:B> . } }")
    val reopened = GraftStore.saveInPlace(mutated, p)
    val namePid = reopened.statements
      .filter(col("p")("str") === "urn:sv:name")
      .select(col("p_id")).head().getLong(0)
    val scan = reopened.statements.filter(col("p_id") === namePid)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p_id"),
      s"p_id filter must reach the scan as a partition filter:\n${plan.take(2000)}")
    assert(scan.count() === 2L) // the two :name rows survive the unrelated delete
  }
}
