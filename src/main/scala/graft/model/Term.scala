package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RDF term representation.
  *
  * The reference dictionary-encodes every term into a variable-length `IV`
  * (`bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/internal/IV.java:53`) with small
  * literals inlined directly into B+Tree keys (`rdf/internal/DTE.java:90-224`) so that
  * filters/aggregates run without a lexicon join. The Spark-native analog used here is a
  * *self-describing columnar term struct*: every term is a struct whose typed shadow
  * fields (`num`, `lng`, `ts`) carry the inline value, and whose `str` field carries the
  * lexical form. Parquet's per-column dictionary encoding plays the role of the explicit
  * TERM2ID/ID2TERM lexicon (`rdf/lexicon/LexiconRelation.java:450-452`); a 64-bit
  * `xxhash64` id gives the compact join/frontier key.
  *
  * Field layout (all nullable except kind/str):
  *   - id:   LONG  xxhash64(kind, str, dt, lang) — compact identity for frontiers/GAS
  *   - kind: BYTE  0=IRI, 1=bnode, 2=literal
  *   - str:  STRING lexical form (IRI string, bnode label, literal lexical form)
  *   - dt:   STRING datatype IRI for typed literals (null = plain string literal)
  *   - lang: STRING language tag (lower-cased) or null
  *   - num:  DOUBLE numeric value for any numeric literal (cross-type compares)
  *   - lng:  LONG   exact value for integer-family literals
  *   - ts:   TIMESTAMP value for xsd:dateTime/xsd:date literals
  *
  * Numeric-datatype normalization: all integer-family datatypes normalize to
  * `xsd:integer`, all floating-family to `xsd:double`, so term equality coincides with
  * value equality for numerics (the practical effect of the reference's inline-IV
  * equality).
  */
object Term {
  val XSD = "http://www.w3.org/2001/XMLSchema#"
  val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val RDFS = "http://www.w3.org/2000/01/rdf-schema#"

  val XSD_INTEGER = XSD + "integer"
  val XSD_DOUBLE = XSD + "double"
  val XSD_DECIMAL = XSD + "decimal"
  val XSD_BOOLEAN = XSD + "boolean"
  val XSD_STRING = XSD + "string"
  val XSD_DATETIME = XSD + "dateTime"
  val XSD_DATE = XSD + "date"
  val RDF_TYPE = RDF + "type"
  val RDF_FIRST = RDF + "first"
  val RDF_REST = RDF + "rest"
  val RDF_NIL = RDF + "nil"
  val RDFS_SUBCLASSOF = RDFS + "subClassOf"
  val RDFS_SUBPROPERTYOF = RDFS + "subPropertyOf"
  val RDFS_DOMAIN = RDFS + "domain"
  val RDFS_RANGE = RDFS + "range"

  val KIND_IRI: Byte = 0
  val KIND_BNODE: Byte = 1
  val KIND_LITERAL: Byte = 2
  val KIND_SID: Byte = 3 // embedded statement (RDF* / SIDs — rdf/internal/impl/bnode/SidIV.java:82)

  val RDF_SUBJECT = RDF + "subject"
  val RDF_PREDICATE = RDF + "predicate"
  val RDF_OBJECT = RDF + "object"

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("kind", ByteType, nullable = true),
    StructField("str", StringType, nullable = true),
    StructField("dt", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("num", DoubleType, nullable = true),
    StructField("lng", LongType, nullable = true),
    StructField("ts", TimestampType, nullable = true)
  ))

  val fieldNames: Seq[String] = schema.fieldNames.toSeq

  private val nullStr = lit(null).cast(StringType)
  private val nullDbl = lit(null).cast(DoubleType)
  private val nullLng = lit(null).cast(LongType)
  private val nullTs = lit(null).cast(TimestampType)

  /** Identity hash over the term's lexical identity. */
  private def idOf(kind: Column, str: Column, dt: Column, lang: Column): Column =
    xxhash64(kind, str, coalesce(dt, lit(" ")), coalesce(lang, lit(" ")))

  private def mk(kind: Column, str: Column, dt: Column, lang: Column,
                 num: Column, lng: Column, ts: Column): Column =
    struct(
      idOf(kind, str, dt, lang).as("id"), kind.as("kind"), str.as("str"),
      dt.as("dt"), lang.as("lang"), num.as("num"), lng.as("lng"), ts.as("ts"))

  /** IRI term from a string column. */
  def iri(s: Column): Column =
    mk(lit(KIND_IRI), s, nullStr, nullStr, nullDbl, nullLng, nullTs)

  def iri(s: String): Column = iri(lit(s))

  /** Blank node with a label. */
  def bnode(label: Column): Column =
    mk(lit(KIND_BNODE), label, nullStr, nullStr, nullDbl, nullLng, nullTs)

  /** Plain string literal (optionally language-tagged). */
  def strLit(s: Column, lang: Column = nullStr): Column =
    mk(lit(KIND_LITERAL), s, nullStr, lang, nullDbl, nullLng, nullTs)

  /** Integer-family literal from an integral column (canonical dt = xsd:integer). */
  def intLit(v: Column): Column = {
    val l = v.cast(LongType)
    mk(lit(KIND_LITERAL), l.cast(StringType), lit(XSD_INTEGER), nullStr,
      l.cast(DoubleType), l, nullTs)
  }

  /** Bounded integer-family XSD types and their value ranges (None = unbounded).
    * Constructor casts to these preserve the TARGET datatype on the minted
    * literal (XsdLongBOp & friends: `datatype(xsd:long("0"))` is xsd:long), and
    * out-of-range values are a cast error.
    */
  val INT_RANGES: Map[String, (Option[BigDecimal], Option[BigDecimal])] = Map(
    "long" -> (Some(BigDecimal(Long.MinValue)), Some(BigDecimal(Long.MaxValue))),
    "int" -> (Some(BigDecimal(Int.MinValue)), Some(BigDecimal(Int.MaxValue))),
    "short" -> (Some(BigDecimal(-32768)), Some(BigDecimal(32767))),
    "byte" -> (Some(BigDecimal(-128)), Some(BigDecimal(127))),
    "unsignedLong" -> (Some(BigDecimal(0)), Some(BigDecimal("18446744073709551615"))),
    "unsignedInt" -> (Some(BigDecimal(0)), Some(BigDecimal("4294967295"))),
    "unsignedShort" -> (Some(BigDecimal(0)), Some(BigDecimal(65535))),
    "unsignedByte" -> (Some(BigDecimal(0)), Some(BigDecimal(255))),
    "nonNegativeInteger" -> (Some(BigDecimal(0)), None),
    "positiveInteger" -> (Some(BigDecimal(1)), None),
    "nonPositiveInteger" -> (None, Some(BigDecimal(0))),
    "negativeInteger" -> (None, Some(BigDecimal(-1))))

  /** Integer-family literal with an EXPLICIT datatype IRI from an exact
    * decimal(38,0) column. `lng` carries the long value when it fits (unsigned
    * longs past 2^63-1 keep lng null and still compare via `num`).
    */
  def intLitAs(dtIri: String, d: Column): Column =
    mk(lit(KIND_LITERAL), d.cast(StringType), lit(dtIri), nullStr,
      d.cast(DoubleType), d.try_cast(LongType), nullTs)

  /** Floating-family literal (canonical dt = xsd:double). */
  def doubleLit(v: Column): Column = {
    val d = v.cast(DoubleType)
    mk(lit(KIND_LITERAL), d.cast(StringType), lit(XSD_DOUBLE), nullStr, d, nullLng, nullTs)
  }

  /** Exact-decimal storage type: 20 integer + 18 fraction digits. */
  val DECIMAL_TYPE: DecimalType = DecimalType(38, 18)

  /** xsd:decimal literal from an exact decimal column. The canonical lexical form
    * (scale-18 rendering with trailing zeros trimmed) is the value carrier — exact
    * arithmetic re-derives the decimal from `str`, while `num` holds the double
    * approximation for cross-type compares. This is the BigDecimal inline-IV analog
    * (rdf/internal/DTE.java:90-224 `decimal (BigDecimal)`).
    */
  def decimalLit(v: Column): Column = {
    val d = v.cast(DECIMAL_TYPE)
    val s = regexp_replace(d.cast(StringType), "\\.?0+$", "")
    mk(lit(KIND_LITERAL), s, lit(XSD_DECIMAL), nullStr, d.cast(DoubleType), nullLng, nullTs)
  }

  def boolLit(v: Column): Column = {
    val b = v.cast(BooleanType)
    mk(lit(KIND_LITERAL), b.cast(StringType), lit(XSD_BOOLEAN), nullStr,
      b.cast(DoubleType), b.cast(LongType), nullTs)
  }

  /** xsd:dateTime literal from a timestamp column (UTC lexical form with exactly
    * three fractional digits for milli-precision values — the reference inlines
    * dateTimes as epoch-millis and rematerializes through XMLGregorianCalendar,
    * which always prints ".SSS" (`DateTimeExtension.java:232` asValue), so
    * `STR(?date)` observably carries ".000"). Sub-milli precision (ours, not the
    * reference's) keeps its extra digits — the lexical identity must carry the
    * full value or two sub-second-distinct timestamps would collide into one
    * term id with ambiguous payload.
    */
  /** Canonical UTC lexical of a timestamp — the reference's materialized form
    * (XMLGregorianCalendar print, milli digits always, sub-milli kept).
    */
  def tsLex(t: Column): Column = concat(
    regexp_replace(date_format(t, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
      "(\\.\\d{3}(?:\\d*[1-9])?)0*$", "$1"),
    lit("Z"))

  def tsLit(v: Column): Column = {
    val t = v.cast(TimestampType)
    mk(lit(KIND_LITERAL), tsLex(t), lit(XSD_DATETIME), nullStr, nullDbl, nullLng, t)
  }

  /** xsd:date lexical shape: optional '-', year digits, -MM-DD, optional zone. */
  val DATE_RE = "^(-?)([0-9]{1,9})-([0-9]{2})-([0-9]{2})(Z|[+-][0-9]{2}:[0-9]{2})?$"

  /** xsd:date literal from its lexical, canonicalized the way the reference's
    * DateTimeExtension does (date inlined as the start-of-day instant, then
    * REMATERIALIZED as the UTC calendar date — `TestTicket_BG1748`:
    * "-523-12-31+01:00" loads as "-0523-12-30": the +01:00 midnight falls on
    * the previous UTC day, and the year pads to 4 digits). `ts` carries the
    * canonical date's midnight so dates compare/sort in the value space.
    * A lexical that does not match the shape yields null (caller falls back
    * to an opaque literal).
    */
  def dateTerm(str: Column): Column = {
    val sign = regexp_extract(str, DATE_RE, 1)
    val y0 = regexp_extract(str, DATE_RE, 2).try_cast(IntegerType)
    val y = when(sign === "-", -y0).otherwise(y0)
    val m = regexp_extract(str, DATE_RE, 3).try_cast(IntegerType)
    val dd = regexp_extract(str, DATE_RE, 4).try_cast(IntegerType)
    val zone = regexp_extract(str, DATE_RE, 5)
    // exact day-in-month guard: ANSI make_date raises on an invalid date, and a
    // malformed literal must fall back to opaque, not kill the load
    val leap = (y % 4 === 0 && y % 100 =!= 0) || y % 400 === 0
    val maxDay = when(m.isin(1, 3, 5, 7, 8, 10, 12), 31)
      .when(m.isin(4, 6, 9, 11), 30)
      .otherwise(when(leap, 29).otherwise(28))
    val d0 = when(m.between(1, 12) && dd.between(1, maxDay), make_date(y, m, dd))
    // a POSITIVE zone offset puts the local midnight on the previous UTC day;
    // negative/none stays on the same calendar date
    val utc = when(zone.rlike("^\\+"), date_sub(d0, 1)).otherwise(d0)
    val canon = concat(
      when(year(utc) < 0, lit("-")).otherwise(lit("")),
      lpad(abs(year(utc)).cast(StringType), 4, "0"), lit("-"),
      lpad(month(utc).cast(StringType), 2, "0"), lit("-"),
      lpad(dayofmonth(utc).cast(StringType), 2, "0"))
    when(utc.isNotNull,
      mk(lit(KIND_LITERAL), canon, lit(XSD_DATE), nullStr, nullDbl, nullLng,
        utc.cast(TimestampType)))
  }

  /** Custom-datatype inline-value extension point (the `IExtension` analog,
    * `rdf/internal/IExtension.java` + extension IVs): a registered handler maps a
    * datatype IRI's lexical Column to its inline numeric value, which lands in the
    * term's `num` field at MINT time — so literals of that datatype filter, compare,
    * and sort as numbers (sargable range predicates), exactly what the reference's
    * extension IVs buy. Register before loading/querying; the dispatch is static in
    * the plan (one extra `when` branch per registered datatype).
    */
  object Datatypes {
    private[Term] val reg =
      scala.collection.concurrent.TrieMap.empty[String, Column => Column]
    def register(dtIri: String, lexToNum: Column => Column): Unit = reg(dtIri) = lexToNum
    def unregister(dtIri: String): Unit = { reg.remove(dtIri); lngReg.remove(dtIri) }
    def isRegistered(dtIri: String): Boolean = reg.contains(dtIri)
    private[Term] def numFor(dtIri: String, lex: Column): Column =
      reg.get(dtIri).map(f => f(lex)).getOrElse(lit(null).cast(DoubleType))

    /** Packed-long datatypes (the `PackedLongIV`-delegate extension shape,
      * e.g. CompressedTimestampExtension): the lexical is a long, the literal
      * participates in numeric compare/sort via `num` AND in integer-family
      * arithmetic via `lng` (integer + compressedTimestamp = xsd:integer —
      * `internal/constraints/MathUtility.java` routes extension numerics
      * through the delegate's number space).
      */
    private[Term] val lngReg = scala.collection.concurrent.TrieMap.empty[String, Unit]
    def registerPackedLong(dtIri: String): Unit = {
      reg(dtIri) = (_.try_cast(DoubleType))
      lngReg(dtIri) = ()
    }
    private[Term] def lngFor(dtIri: String, lex: Column): Column =
      if (lngReg.contains(dtIri)) lex.try_cast(LongType) else lit(null).cast(LongType)
    private[Term] def lngForCol(dt: Column, lex: Column): Column =
      lngReg.keys.foldLeft(lit(null).cast(LongType))((acc, iri) =>
        when(dt === iri, lex.try_cast(LongType)).otherwise(acc))

    // Built-in: the reference's core vocabulary registers the compressed
    // timestamp extension by default (vocab/core/BigdataCoreVocabulary_v20151106
    // + CompressedTimestampExtensionFactory).
    registerPackedLong("http://www.bigdata.com/rdf/datatype#compressedTimestamp")

    /** Lexical canonicalizers: a registered handler REWRITES the lexical of its
      * datatype's literals at mint time — the term's identity becomes the
      * canonical form, exactly what the reference's extension IVs do when they
      * store only the encoded value and rematerialize the literal from it
      * (e.g. `GeoSpatialLiteralExtension.asValue`). Register before loading.
      */
    private[Term] val lexReg =
      scala.collection.concurrent.TrieMap.empty[String, Column => Column]
    def registerLex(dtIri: String, canon: Column => Column): Unit = lexReg(dtIri) = canon
    def unregisterLex(dtIri: String): Unit = lexReg.remove(dtIri)
  }

  /** Typed literal with an arbitrary datatype IRI (inline value via any registered
    * datatype handler).
    */
  def typedLit(s0: Column, dt: String): Column = {
    graft.search.GeoDatatypes.init // builtin geo configs register their canonicalizers
    val s = Datatypes.lexReg.get(dt).map(f => f(s0)).getOrElse(s0)
    mk(lit(KIND_LITERAL), s, lit(dt), nullStr, Datatypes.numFor(dt, s),
      Datatypes.lngFor(dt, s), nullTs)
  }

  /** Typed literal whose datatype/lang are *columns* (loader path): inline-value
    * construction dispatches on the datatype at runtime.
    */
  def literalFromParts(str: Column, dt: Column, lang: Column): Column = {
    graft.search.GeoDatatypes.init // builtin geo configs register their canonicalizers
    // try_cast everywhere: an ILL-TYPED literal ("xyz"^^xsd:integer) must load as an
    // opaque typed literal (the `otherwise` branch), not abort the job under ANSI mode
    val base = when(dt === XSD_INTEGER && str.try_cast(LongType).isNotNull,
        intLit(str.try_cast(LongType)))
      .when(dt === XSD_DOUBLE && str.try_cast(DoubleType).isNotNull,
        doubleLit(str.try_cast(DoubleType)))
      .when(dt === XSD_DECIMAL && str.try_cast(DECIMAL_TYPE).isNotNull,
        decimalLit(str.try_cast(DECIMAL_TYPE)))
      .when(dt === XSD_BOOLEAN, boolLit(str === "true"))
      .when(dt === XSD_DATETIME && try_to_timestamp(regexp_replace(str, "Z$", "")).isNotNull,
        // keep the AUTHORED lexical (zone token included — identity/sameTerm and
        // fn:TZ read it); ts carries the instant for all value-space operations.
        // Spark's cast-style parser reads "±hh:mm" offsets and zoneless forms
        // (session TZ = UTC) directly; only a trailing Z needs stripping.
        mk(lit(KIND_LITERAL), str, lit(XSD_DATETIME), nullStr, nullDbl, nullLng,
          try_to_timestamp(regexp_replace(str, "Z$", ""))))
      .when(dt === XSD_DATE && str.rlike(DATE_RE) && dateTerm(str).isNotNull, dateTerm(str))
    // bounded integer-family types (xsd:long/int/short/byte + unsigned +
    // non/positive variants) keep their authored datatype but inline num/lng so
    // they compare, sort, and compute as numbers; out-of-range or ill-formed
    // lexicals fall through to the opaque branch. ONE shared branch (bounds via
    // compact per-type whens) — a per-type fold duplicated the mk() struct 12×
    // and pushed load projections past janino's 64 KB method ceiling.
    val intFam = {
      val d36 = DecimalType(38, 0)
      val nullDec = lit(null).cast(d36)
      val d = when(str.rlike("^[+-]?[0-9]+$"), str.try_cast(d36))
      def boundCol(pick: ((Option[BigDecimal], Option[BigDecimal])) => Option[BigDecimal]) =
        INT_RANGES.foldLeft(nullDec) { case (acc, (local, r)) =>
          pick(r).map(b => when(dt === (XSD + local), lit(b.underlying)).otherwise(acc))
            .getOrElse(acc)
        }
      val lo = boundCol(_._1)
      val hi = boundCol(_._2)
      val ok = d.isNotNull && (lo.isNull || d >= lo) && (hi.isNull || d <= hi)
      // dt list includes unbounded xsd:integer: beyond-long integers (missed by
      // the base branch's long cast) load with an exact decimal(38,0)-derived
      // num and a NULL lng — they sort/compare by value like constTerm's
      // beyond-long mint instead of falling into the opaque bucket. The lexical
      // is CANONICALIZED to match constTerm's minting, so authored forms like
      // "+10"^^xsd:int / "010"^^xsd:int share one term id with the canonical
      // query constant (the reference inlines these by value). Canonicalization
      // is a cheap anchored regex on the AUTHORED string, NOT d.cast(String):
      // each extra reference to `d` duplicates the whole try_cast subtree in
      // codegen and this projection sits just under janino's 64 KB ceiling.
      val canonLex = regexp_replace(
        regexp_replace(str, "^\\+?(-?)0*(?=[0-9])", "$1"), "^-0$", "0")
      (dt.isin(XSD_INTEGER +: INT_RANGES.keys.map(XSD + _).toSeq: _*) && ok,
        mk(lit(KIND_LITERAL), canonLex, dt, lang,
          d.cast(DoubleType), d.try_cast(LongType), nullTs))
    }
    val withIntFamily = base.when(intFam._1, intFam._2)
    // lexical canonicalizers dispatch first (the rewritten lexical also feeds any
    // registered inline-num handler for the same datatype), then num-only handlers
    val withLex = Datatypes.lexReg.foldLeft(withIntFamily) { case (acc, (iri, g)) =>
      acc.when(dt === iri,
        mk(lit(KIND_LITERAL), g(str), dt, lang, Datatypes.numFor(iri, g(str)),
          nullLng, nullTs))
    }
    Datatypes.reg.filter { case (k, _) => !Datatypes.lexReg.contains(k) }.foldLeft(withLex) {
      case (acc, (iri, f)) =>
        acc.when(dt === iri,
          mk(lit(KIND_LITERAL), str, dt, lang, f(str), Datatypes.lngFor(iri, str), nullTs))
    }.otherwise(mk(lit(KIND_LITERAL), str, dt, lang, nullDbl, nullLng, nullTs))
  }

  /** N-Triples-style token of a term (for the SID canonical form). Literal lexical
    * forms are escaped like Rio's N-Triples writer — otherwise a quote/angle
    * injection in a literal could make two distinct embedded triples share one
    * canonical string (and one id).
    */
  private def ntTok(t: Column): Column = {
    val esc = regexp_replace(regexp_replace(regexp_replace(regexp_replace(t("str"),
      "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r")
    when(t("kind") === KIND_IRI, concat(lit("<"), t("str"), lit(">")))
      .when(t("kind") === KIND_BNODE, concat(lit("_:"), t("str")))
      .when(t("kind") === KIND_SID, t("str"))
      .otherwise(concat(lit("\""), esc, lit("\""),
        when(t("lang").isNotNull, concat(lit("@"), t("lang")))
          .when(t("dt").isNotNull, concat(lit("^^<"), t("dt"), lit(">")))
          .otherwise(lit(""))))
  }

  /** Statement term `<< s p o >>` (RDF* / Blazegraph SIDs mode,
    * `rdf/internal/impl/bnode/SidIV.java:82`): a statement-about-a-statement is a
    * first-class term whose identity derives canonically from its components, so
    * equal embedded triples get equal ids with no dictionary round-trip.
    */
  def sid(s: Column, p: Column, o: Column): Column =
    mk(lit(KIND_SID),
      concat(lit("<< "), ntTok(s), lit(" "), ntTok(p), lit(" "), ntTok(o), lit(" >>")),
      nullStr, nullStr, nullDbl, nullLng, nullTs)

  /** Term from flat parsed fields (kind + lexical + datatype + lang), loader path. */
  def fromParts(kind: Column, str: Column, dt: Column, lang: Column): Column =
    when(kind === KIND_IRI, iri(str))
      .when(kind === KIND_BNODE, bnode(str))
      .otherwise(literalFromParts(str, dt, lang))

  /** fromParts for positions whose grammar admits only IRI/bnode (subject,
    * graph): every ParsedQuad producer (N-Triples scanner, RDF/XML, JSON-LD,
    * Turtle) emits only those kinds there, so inlining the full literal mint —
    * a several-thousand-node when-tree (datatype dispatch, int-family bounds,
    * date canonicalization) — is pure codegen weight. Three fromParts copies
    * in one load projection pushed the generated method past janino's 64 KB
    * ceiling and the whole parse stage fell back to interpreted eval; using
    * this builder for s/g keeps exactly one literal tree (the object's) in
    * the projection. A malformed literal-in-subject line (accepted silently
    * before) still mints an opaque literal term; only its would-be inline
    * num/lng/ts canonicalization differs, a domain no producer reaches.
    */
  def fromPartsResource(kind: Column, str: Column, dt: Column, lang: Column): Column =
    when(kind === KIND_IRI, iri(str))
      .when(kind === KIND_BNODE, bnode(str))
      .otherwise(mk(lit(KIND_LITERAL), str, dt, lang, nullDbl, nullLng, nullTs))

  /** A term column that is NULL (unbound). */
  def nullTerm: Column = lit(null).cast(schema)
}
