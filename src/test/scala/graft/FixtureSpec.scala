package graft

import graft.engine.{Engine, SparqlResults}
import graft.model.GraftStore
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Data-driven golden-query tests — the AbstractDataDrivenSPARQLTestCase convention
  * (`bigdata-rdf-test/.../AbstractDataDrivenSPARQLTestCase.java:111`): each fixture
  * directory holds `query.rq` + `data.ttl` (Turtle/TriG) + `expected.tsv` (W3C SPARQL
  * TSV results), compared with multiset semantics. Fixtures are OUR OWN, written for
  * the bottom-up-semantics / TCK-style edge cases SURVEY §5 calls out.
  */
class FixtureSpec extends GraftSuite {

  private val root = Paths.get("src/test/resources/fixtures")

  private def tsvRows(tsv: String): (Seq[String], Seq[Seq[String]]) = {
    val lines = tsv.split("\n").toSeq.filter(_.nonEmpty)
    val header = lines.head.split("\t", -1).toSeq
    (header, lines.tail.map(_.split("\t", -1).toSeq))
  }

  /** Multiset compare, column order per expected header, bnode-insensitive. */
  private def compare(name: String, got: String, want: String): Unit = {
    val (gh, gr) = tsvRows(got)
    val (wh, wr) = tsvRows(want)
    assert(gh.sorted == wh.sorted, s"$name: vars ${gh.sorted} != ${wh.sorted}")
    val perm = wh.map(gh.indexOf)
    def norm(rows: Seq[Seq[String]], reorder: Boolean): Seq[Seq[String]] = rows
      .map(r => if (reorder) perm.map(r) else r)
      .map(_.map(c => if (c.startsWith("_:")) "_:b" else c))
    val g = norm(gr, reorder = true).sortBy(_.mkString(""))
    val w = norm(wr, reorder = false).sortBy(_.mkString(""))
    assert(g == w, s"$name:\n--- got ---\n${g.mkString("\n")}\n--- want ---\n${w.mkString("\n")}")
  }

  private val dirs: Seq[Path] =
    Files.list(root).iterator().asScala.toSeq.filter(Files.isDirectory(_)).sortBy(_.toString)

  assert(dirs.nonEmpty, s"no fixtures under $root")

  dirs.foreach { dir =>
    val name = dir.getFileName.toString
    test(s"fixture: $name") {
      val data = Files.readString(dir.resolve("data.ttl"))
      val query = Files.readString(dir.resolve("query.rq"))
      val want = Files.readString(dir.resolve("expected.tsv"))
      val st = new GraftStore(spark, graft.sources.Rio.readTurtle(spark, data))
      val got = SparqlResults.toTsv(Engine.query(st, query))
      compare(name, got, want)
    }
  }
}
