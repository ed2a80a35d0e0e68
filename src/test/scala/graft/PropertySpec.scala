package graft

import graft.model.Term
import graft.sources.Rio
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants (scalacheck driven): serializer/parser round
  * trips over adversarial lexicals, term-id injectivity, ORDER BY totality.
  * Each property runs a bounded number of Spark jobs (small minSuccessful) —
  * these hunt escaping/canonicalization bugs, not throughput.
  */
class PropertySpec extends GraftSuite {
  private val ss = SharedSpark.spark
  import ss.implicits._

  private def check(p: Prop, cases: Int = 12): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  // adversarial literal lexicals: quotes, backslashes, control chars, unicode
  private val genLex: Gen[String] = Gen.frequency(
    5 -> Gen.asciiPrintableStr.map(_.take(18)),
    3 -> Gen.oneOf("say \"hi\"", "back\\slash", "line\nbreak", "tab\there",
      "cr\rreturn", "mixed \"\\\n\t", "ünïcödé ✓ 中文", ""),
    2 -> Gen.listOfN(8, Gen.oneOf('"', '\\', '\n', '\t', 'a', ' ')).map(_.mkString))
  private val genIri: Gen[String] =
    Gen.alphaNumStr.map(s => "urn:t:" + s.take(12))
  private val genLang: Gen[Option[String]] = Gen.frequency(
    3 -> Gen.const(None),
    1 -> Gen.oneOf("en", "de", "en-GB", "pt-BR").map(Some(_)))

  private case class T(s: String, p: String, o: Either[String, (String, Option[String])])
  private val genTriple: Gen[T] = for {
    s <- genIri; p <- genIri
    o <- Gen.frequency(
      2 -> genIri.map(Left(_): Either[String, (String, Option[String])]),
      5 -> (for { l <- genLex; la <- genLang } yield Right((l, la))))
  } yield T(s, p, o)

  test("N-Quads serialize∘parse is the identity over adversarial lexicals") {
    check(Prop.forAllNoShrink(Gen.listOfN(6, genTriple)) { ts =>
      val df = ts.map { t =>
        val o = t.o match {
          case Left(i) => Term.iri(i)
          case Right((l, Some(la))) => Term.strLit(lit(l), lit(la))
          case Right((l, None)) => Term.strLit(lit(l))
        }
        ss.range(1).select(Term.iri(t.s).as("s"), Term.iri(t.p).as("p"), o.as("o"))
      }.reduce(_.unionByName(_))
      val lines = Rio.toNQuadLines(df).as[String].collect().toSeq
      val back = Rio.statementsFromLines(lines.toDS())
      def key(r: org.apache.spark.sql.Row) = {
        def tok(i: Int) = { val t = r.getStruct(i)
          // language tags are case-insensitive (RDF 1.1 §3.3) — the parser
          // canonicalizes to lowercase, so the compare key does too
          (t.getAs[Byte]("kind"), t.getAs[String]("str"),
            t.getAs[String]("dt"), Option(t.getAs[String]("lang")).map(_.toLowerCase).orNull) }
        (tok(0), tok(1), tok(2))
      }
      val a = df.collect().map(key).toSeq.sorted(Ordering.by((x: Any) => x.toString))
      val b = back.select("s", "p", "o").collect().map(key).toSeq
        .sorted(Ordering.by((x: Any) => x.toString))
      a == b
    }, cases = 10)
  }

  test("term ids are injective on distinct lexical identities") {
    // id = xxhash64(lexical identity): distinct (kind, str, dt, lang) must get
    // distinct ids; equal identities the same id — on a generated sample
    check(Prop.forAllNoShrink(Gen.listOfN(12, genLex), Gen.listOfN(12, genLang)) { (ls, las) =>
      val terms = ls.zip(las).map { case (l, la) =>
        la match { case Some(x) => Term.strLit(lit(l), lit(x)); case None => Term.strLit(lit(l)) }
      }
      val rows = terms.map(t => ss.range(1).select(t.as("t")))
        .reduce(_.unionByName(_))
        .select(col("t")("id").as("id"), col("t")("str").as("s"), col("t")("lang").as("la"))
        .collect().map(r => (r.getLong(0), (r.getString(1), Option(r.getString(2)))))
      rows.groupBy(_._2).forall(_._2.map(_._1).distinct.size == 1) &&
        rows.groupBy(_._1).forall(_._2.map(_._2).distinct.size == 1)
    }, cases = 10)
  }

  test("ORDER BY term sort is total and permutation-invariant") {
    // sorting any permutation of a VALUES list produces one canonical order
    val genVal: Gen[String] = Gen.oneOf(
      "1", "2.5", "\"09\"^^<http://www.w3.org/2001/XMLSchema#integer>", "\"b\"",
      "\"a\"", "\"a\"@en", "<urn:a>", "<urn:b>", "true", "\"2024-01-01T00:00:00Z\"^^<http://www.w3.org/2001/XMLSchema#dateTime>")
    check(Prop.forAllNoShrink(Gen.listOfN(7, genVal), Gen.long) { (vs, seed) =>
      def run(order: Seq[String]) = graft.engine.Engine.query(store,
        s"SELECT ?x WHERE { VALUES ?x { ${order.mkString(" ")} } } ORDER BY ?x")
        .collect().map { r =>
          val t = r.getStruct(0)
          (t.getAs[Byte]("kind"), t.getAs[String]("str"), t.getAs[String]("dt"), t.getAs[String]("lang"))
        }.toSeq
      val shuffled = new scala.util.Random(seed).shuffle(vs)
      run(vs) == run(shuffled)
    }, cases = 8)
  }
}
