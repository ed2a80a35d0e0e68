package graft.sources

import graft.model.{GraftStore, Term}
import graft.sparql.Parser
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed N-Triples / N-Quads load + dump — the RIO bulk-load analog
  * (`rdf/rio/StatementBuffer.java`, `rdf/store/DataLoader.java`, own parsers under
  * `rdf/rio/ntriples/`).
  *
  * Line-oriented formats are trivially splittable: `spark.read.text` distributes the
  * parse (one executor-side regex-free scanner per line); term-struct construction stays
  * columnar so the inline-value encoding and xxhash64 ids are identical to every other
  * ingestion path. Turtle/TriG (multi-line grammars) would parse single-node →
  * `parallelize`, as SURVEY §2.1 notes — not needed for the driver data.
  */
object Rio {

  /** One parsed line: flat fields per position (kind 0=iri 1=bnode 2=literal). */
  final case class ParsedQuad(
      sKind: Byte, sStr: String,
      pStr: String,
      oKind: Byte, oStr: String, oDt: String, oLang: String,
      gKind: Byte, gStr: String)

  /** Executor-side scanner for one N-Triples/N-Quads line. Returns null for blank or
    * comment lines; throws on malformed input (surfaced as task failure = load error).
    */
  def parseLine(line0: String): ParsedQuad = {
    val line = line0.trim
    if (line.isEmpty || line.startsWith("#")) return null
    var i = 0
    def ws(): Unit = { while (i < line.length && (line(i) == ' ' || line(i) == '\t')) i += 1 }
    def unescape(s: String): String = {
      if (!s.contains('\\')) return s
      val sb = new StringBuilder
      var j = 0
      while (j < s.length) {
        val c = s(j)
        if (c == '\\' && j + 1 < s.length) {
          s(j + 1) match {
            case 'n' => sb += '\n'; j += 2
            case 't' => sb += '\t'; j += 2
            case 'r' => sb += '\r'; j += 2
            case '"' => sb += '"'; j += 2
            case '\\' => sb += '\\'; j += 2
            case 'u' => sb += Integer.parseInt(s.substring(j + 2, j + 6), 16).toChar; j += 6
            case 'U' => sb.appendAll(Character.toChars(Integer.parseInt(s.substring(j + 2, j + 10), 16))); j += 10
            case other => sb += other; j += 2
          }
        } else { sb += c; j += 1 }
      }
      sb.toString
    }
    def term(): (Byte, String, String, String) = {
      ws()
      line(i) match {
        case '<' =>
          val j = line.indexOf('>', i)
          val v = line.substring(i + 1, j); i = j + 1
          (Term.KIND_IRI, unescape(v), null, null)
        case '_' =>
          var j = i + 2
          while (j < line.length && line(j) != ' ' && line(j) != '\t') j += 1
          // PN_CHARS can't end a label with '.' — trailing dots are the statement
          // terminator ('<s> <p> _:b.' is valid N-Triples)
          while (j > i + 2 && line(j - 1) == '.') j -= 1
          val v = line.substring(i + 2, j); i = j
          (Term.KIND_BNODE, v, null, null)
        case '"' =>
          var j = i + 1
          // closing quote = '"' preceded by an even number of backslashes
          while (line(j) != '"' || {
            var k = j - 1; var n = 0
            while (k >= 0 && line(k) == '\\') { n += 1; k -= 1 }
            n % 2 == 1
          }) j += 1
          val lex = unescape(line.substring(i + 1, j)); i = j + 1
          if (i < line.length && line(i) == '@') {
            var k = i + 1
            while (k < line.length && (line(k).isLetterOrDigit || line(k) == '-')) k += 1
            val lang = line.substring(i + 1, k).toLowerCase; i = k
            (Term.KIND_LITERAL, lex, null, lang)
          } else if (i + 1 < line.length && line(i) == '^' && line(i + 1) == '^') {
            i += 2
            val j2 = line.indexOf('>', i)
            val dt = line.substring(i + 1, j2); i = j2 + 1
            // canonicalize numeric datatypes exactly like the query parser
            val n = Parser.canonicalLit(lex, Some(dt), None)
            (Term.KIND_LITERAL, n.lex, n.dt.orNull, null)
          } else (Term.KIND_LITERAL, lex, null, null)
        case other =>
          throw new IllegalArgumentException(
            s"malformed N-Triples term at char $i ('$other'): $line")
      }
    }
    val s = term()
    val p = term()
    val o = term()
    ws()
    // graph position (N-Quads): IRI or blank node
    val g = if (i < line.length && (line(i) == '<' || line(i) == '_')) term()
            else (Term.KIND_IRI, null, null, null)
    ParsedQuad(s._1, s._2, p._2, o._1, o._2, o._3, o._4, g._1, g._2)
  }

  /** Parse a Dataset of N-Triples/N-Quads lines into the statements layout. */
  def statementsFromLines(lines: org.apache.spark.sql.Dataset[String]): DataFrame =
    statementsFromParsed(lines
      .map(parseLine)(org.apache.spark.sql.Encoders.product[ParsedQuad])
      .filter(_ != null)
      .toDF())

  private def statementsFromParsed(parsed: DataFrame): DataFrame = {
    // s/g ride the resource-only builder: three full fromParts literal trees in
    // one projection overflowed janino's 64 KB method ceiling (whole-stage
    // codegen fell back to interpreted on the bulk parse path); subjects and
    // graphs are IRI/bnode in every producer, so only the object keeps the
    // literal mint (see Term.fromPartsResource)
    GraftStore.assemble(parsed.select(
      Term.fromPartsResource(col("sKind"), col("sStr"), lit(null).cast("string"), lit(null).cast("string")).as("s"),
      Term.iri(col("pStr")).as("p"),
      Term.fromParts(col("oKind"), col("oStr"), col("oDt"), col("oLang")).as("o"),
      when(col("gStr").isNotNull,
        Term.fromPartsResource(col("gKind"), col("gStr"), lit(null).cast("string"), lit(null).cast("string")))
        .otherwise(Term.nullTerm).as("g"),
      lit(GraftStore.STYPE_EXPLICIT).cast("byte").as("stype")))
  }

  /** RDF/XML: single document string → statements. */
  def readRdfXml(spark: SparkSession, xml: String, base: String = ""): DataFrame = {
    import spark.implicits._
    statementsFromParsed(RdfXml.parse(xml, base).toDF())
  }

  /** RDF/XML file(s): one parse task per file (the format is not line-splittable;
    * dump corpora are many files, which is exactly whole-file parallelism).
    */
  def readRdfXmlFiles(spark: SparkSession, path: String): DataFrame = {
    val quads = spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (name, content) => RdfXml.parse(content, name) }
    statementsFromParsed(spark.createDataFrame(quads))
  }

  /** JSON-LD: single document string → statements. */
  def readJsonLd(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    statementsFromParsed(JsonLd.parse(json).toDF())
  }

  /** JSON-LD file(s): one parse task per file (same shape as RDF/XML). */
  def readJsonLdFiles(spark: SparkSession, path: String): DataFrame = {
    val quads = spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) => JsonLd.parse(content) }
    statementsFromParsed(spark.createDataFrame(quads))
  }

  /** Load RDF file(s) into a statements DataFrame, dispatching the parser on
    * extension (LOAD &lt;file:…&gt; entry point): .rdf/.owl/.xml → RDF/XML,
    * .jsonld/.json → JSON-LD, anything else → line-oriented N-Triples/N-Quads.
    */
  def readStatements(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".rdf") || lower.endsWith(".owl") || lower.endsWith(".xml"))
      readRdfXmlFiles(spark, path)
    else if (lower.endsWith(".jsonld") || lower.endsWith(".json"))
      readJsonLdFiles(spark, path)
    else statementsFromLines(spark.read.textFile(path))
  }

  def load(spark: SparkSession, path: String): GraftStore =
    new GraftStore(spark, readStatements(spark, path))

  /** Turtle subset loader (single-node parse → distributed encode, the SURVEY §2.1
    * Turtle/TriG strategy): supports @prefix/@base, prefixed names, `a`, `;`/`,` lists,
    * typed/lang literals, numeric shorthand, labeled bnodes, and Turtle-star
    * (`.ttlx` — `<< s p o >>` terms; the reference's RDR data interchange,
    * `rdf/rio/turtle/BigdataTurtleParser.java`). Rides the SPARQL grammar's
    * quad-data production (`INSERT DATA`), which shares Turtle's triples syntax —
    * embedded triples assert the inner statement plus its reification
    * decomposition, like the INSERT DATA SIDs mode.
    */
  def readTurtle(spark: SparkSession, turtle: String): DataFrame = {
    val lines = turtle.linesIterator.toSeq.map { l =>
      val t = l.trim
      if (t.toLowerCase.startsWith("@prefix"))
        t.stripSuffix(".").trim.replaceFirst("(?i)@prefix", "PREFIX")
      else if (t.toLowerCase.startsWith("@base"))
        t.stripSuffix(".").trim.replaceFirst("(?i)@base", "BASE")
      else l
    }
    val (pfx, body) = lines.partition { l =>
      val u = l.trim.toUpperCase // Turtle 1.1 also allows sparql-style lowercase decls
      u.startsWith("PREFIX") || u.startsWith("BASE")
    }
    val ops = Parser.parseUpdate(
      pfx.mkString("\n") + "\nINSERT DATA {\n" + body.mkString("\n") + "\n}")
    import graft.sparql.Ast._
    def flat(n: Node): (Byte, String, String, String) = n match {
      case IriNode(i) => (Term.KIND_IRI, i, null, null)
      case VarNode(v) => (Term.KIND_BNODE, v, null, null) // parser's bnode placeholder
      case LitNode(lex, dt, lang) => (Term.KIND_LITERAL, lex, dt.orNull, lang.orNull)
    }
    val all = ops.collect { case InsertData(q) => q }.flatten
    // embedded-triple terms need the full Column-space term builder (a sid's id
    // derives from its canonicalized components — Term.sid); the flat ParsedQuad
    // row path stays the bulk route for everything else
    def isSid(n: Node): Boolean = n.isInstanceOf[SidNode]
    val (sidful, plainQ) = all.partition(q => isSid(q.s) || isSid(q.o) || q.g.exists(isSid))
    val quads = plainQ.map { q =>
      val s = flat(q.s); val o = flat(q.o)
      val p = q.p match { case IriNode(i) => i
        case other => throw new IllegalArgumentException(s"predicate must be IRI: $other") }
      val g = q.g.map { case IriNode(i) => i
        case other => throw new IllegalArgumentException(s"graph must be IRI: $other") }
      ParsedQuad(s._1, s._2, p, o._1, o._2, o._3, o._4, Term.KIND_IRI, g.orNull)
    }
    import spark.implicits._
    val plainDf = statementsFromParsed(quads.toDF())
    if (sidful.isEmpty) plainDf
    else {
      // RDF set semantics across the two routes: an annotation's inner-statement
      // assertion usually repeats a triple the document also states plainly
      // (and two annotations on one statement repeat its decomposition)
      plainDf.unionByName(sidStatements(spark, sidful))
        .withColumn("__sid", col("s")("id")).withColumn("__oid", col("o")("id"))
        .withColumn("__gid", col("g")("id"))
        .dropDuplicates("__sid", "p_id", "__oid", "__gid", "stype")
        .drop("__sid", "__oid", "__gid")
    }
  }

  /** Quads whose terms include `<< s p o >>` (Turtle-star / SIDs): terms are built
    * recursively in Column space so the sid's canonical string — and therefore its
    * id — matches `Term.sid` on every other path (query patterns, INSERT DATA).
    * Batched array-explode keeps the plan literal count bounded; annotation
    * statements are a small fraction of any corpus, the bulk rides ParsedQuad.
    */
  private def sidStatements(spark: SparkSession,
                            quads: Seq[graft.sparql.Ast.QuadData]): DataFrame = {
    import graft.sparql.Ast._
    def term(n: Node): Column = n match {
      case SidNode(s, p, o) => Term.sid(term(s), term(p), term(o))
      case VarNode(v) => Term.bnode(lit(v)) // parser's bnode placeholder, stable per doc
      case other => graft.engine.Exprs.constTerm(other)
    }
    quads.grouped(512).map { batch =>
      val rows = batch.map { q =>
        struct(term(q.s).as("s"), term(q.p).as("p"), term(q.o).as("o"),
          q.g.map(term).getOrElse(Term.nullTerm).as("g"))
      }
      GraftStore.assemble(spark.range(1).select(explode(array(rows: _*)).as("q"))
        .select(col("q.s").as("s"), col("q.p").as("p"), col("q.o").as("o"),
          col("q.g").as("g"), lit(GraftStore.STYPE_EXPLICIT).cast("byte").as("stype")))
    }.reduce(_.unionByName(_))
  }

  /** TriG document string → statements. TriG wraps Turtle triples in graph blocks —
    * `<g> { … }`, `:g { … }`, `GRAPH <g> { … }`, or an unlabeled `{ … }` for the
    * default graph — with the label on the same line or the one before the `{`.
    * Normalizes to the SPARQL quad-data form readTurtle accepts (`GRAPH <g> { … }`;
    * default-graph braces dropped). Graph blocks do not nest in TriG, so one
    * open-block state suffices.
    */
  def readTrig(spark: SparkSession, trig: String): DataFrame =
    readTurtle(spark, trigToQuads(trig))

  private[sources] def trigToQuads(text: String): String = {
    val lines = text.linesIterator.toIndexedSeq
    val labelRe = "^(<[^>\\s]*>|[A-Za-z0-9_][A-Za-z0-9_.-]*:[A-Za-z0-9_.-]*|:[A-Za-z0-9_.-]*)$".r
    val out = Seq.newBuilder[String]
    var openDefault = false
    var i = 0
    while (i < lines.length) {
      val l = lines(i); val t = l.trim
      def nextNonEmpty: Option[String] = lines.drop(i + 1).map(_.trim)
        .find(s => s.nonEmpty && !s.startsWith("#"))
      t match {
        case _ if labelRe.matches(t) && nextNonEmpty.exists(_.startsWith("{")) =>
          // graph label alone on its line: fold into the `{` line
          val j = lines.indexWhere(s => s.trim.startsWith("{"), i + 1)
          out += ("GRAPH " + t + " " + lines(j).trim)
          i = j
        case _ if t.startsWith("{") =>
          out += t.stripPrefix("{"); openDefault = true // unlabeled default-graph block
        case _ if t.endsWith("{") && !t.toUpperCase.startsWith("GRAPH") && !t.startsWith("#") =>
          out += ("GRAPH " + t)
        case "}" if openDefault =>
          out += ""; openDefault = false
        case _ => out += l
      }
      i += 1
    }
    out.result().mkString("\n")
  }

  // ---- dump (SPARQL result sinks analog for RDF output) ----
  private def escapeNt(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(c,
      "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r")

  /** Serialize one term column to its N-Triples token. */
  def ntToken(t: Column): Column =
    when(t("kind") === Term.KIND_IRI, concat(lit("<"), t("str"), lit(">")))
      .when(t("kind") === Term.KIND_BNODE, concat(lit("_:"), t("str")))
      .when(t("kind") === Term.KIND_SID, t("str")) // canonical '<< s p o >>' form
      .otherwise(concat(lit("\""), escapeNt(t("str")), lit("\""),
        when(t("lang").isNotNull, concat(lit("@"), t("lang")))
          .when(t("dt").isNotNull, concat(lit("^^<"), t("dt"), lit(">")))
          .otherwise(lit(""))))

  /** statements/CONSTRUCT triples → N-Quads text lines (write with df.write.text). */
  def toNQuadLines(df: DataFrame): DataFrame = {
    val gTok =
      if (df.columns.contains("g"))
        when(col("g").isNotNull, ntToken(col("g"))).otherwise(lit(""))
      else lit("")
    df.select(concat_ws(" ",
      ntToken(col("s")), ntToken(col("p")), ntToken(col("o")), gTok, lit(".")).as("value"))
  }
}
