package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Geospatial datatype configurations — the `GEO_SPATIAL_DATATYPE_CONFIG`
  * property analog (`rdf/store/AbstractTripleStore.java` Options, field
  * semantics `service/geospatial/GeoSpatialDatatypeFieldConfiguration.java`,
  * lexical codec `rdf/internal/impl/extensions/GeoSpatialLiteralExtension.java`).
  *
  * A configured datatype packs "v1#v2#…" literals whose DOUBLE fields live on a
  * 1/multiplier grid: encode = trunc(BigDecimal(lex) × multiplier) to long
  * (`GeoSpatialLiteralExtension.componentsAsLongArr`, :264-272 — BigDecimal
  * multiply then longValue), decode = long/multiplier printed Java-Double style
  * (`longArrAsComponentArr` :560 + the '#' serializer). The reference stores
  * only the encoded z-order key and REMATERIALIZES literals from it, so a
  * loaded literal's identity is its truncated form; registering a config here
  * installs the equivalent load-time lexical canonicalizer (via
  * `Term.Datatypes.registerLex`) and hands geo:search the multipliers for
  * snapping query bounds onto the same grid. minVal range-shifts only affect
  * the reference's unsigned index packing, not the value space — ignored here.
  */
object GeoDatatypes {

  val GeoLiteral = "http://www.bigdata.com/rdf/geospatial#geoSpatialLiteral"

  /** One packed slot: valueType DOUBLE|LONG, storage grid 1/multiplier,
    * serviceMapping LATITUDE|LONGITUDE|TIME (others positional).
    */
  final case class Field(valueType: String, multiplier: Long, mapping: String)

  final case class Config(uri: String, fields: Seq[Field]) {
    def idx(mapping: String): Option[Int] =
      Some(fields.indexWhere(_.mapping == mapping)).filter(_ >= 0)

    /** Snap a constant query bound onto the field's storage grid (encode∘decode,
      * truncation toward zero like BigDecimal.longValue) — the reference reaches
      * the same effect by encoding search bounds with the literal codec before
      * the z-order range scan.
      */
    def truncBound(i: Int, lex: String): Double = {
      val f = fields(i)
      if (f.valueType == "DOUBLE")
        (BigDecimal(lex) * BigDecimal(f.multiplier)).toLong.toDouble / f.multiplier
      else lex.toDouble
    }

    /** Load-time lexical canonicalizer: each configured slot is encoded to the
      * grid and reprinted (DOUBLE → Java Double.toString of enc/multiplier,
      * LONG verbatim); slots BEYOND the configured fields (custom dimensions)
      * pass through untouched; a literal that does not parse into all
      * configured slots keeps its original lexical (and simply never matches a
      * spatial filter).
      */
    def canonLex(lex: Column): Column = {
      val parts = split(lex, "#")
      val n = fields.size
      // One HOF pass dispatching on the slot index. Higher-order functions
      // reach the generated row code as a single call (no inlining), so the
      // per-field arithmetic never bloats the literal-minting CaseWhen it is
      // embedded in — the previous flat per-field column trees (inlined once
      // for the value and once for the validity guard) pushed RIO-load
      // projections past the JVM's 64 KB method ceiling and dropped the whole
      // load stage out of codegen. Interpreted eval here is fine: only
      // literals OF this datatype ever evaluate the lambda.
      val canon = transform(parts, (x, i) => {
        val perSlot = fields.zipWithIndex.foldLeft(lit(null).cast("string")) {
          case (acc, (f, j)) =>
            val enc =
              if (f.valueType == "DOUBLE")
                ((x.try_cast(DecimalType(38, 18)) * lit(f.multiplier)).cast(LongType)
                  .cast(DoubleType) / lit(f.multiplier.toDouble)).cast("string")
              else x.try_cast(LongType).cast("string")
            when(i === lit(j), enc).otherwise(acc)
        }
        // slots beyond the configured fields (custom dimensions) pass verbatim
        when(i < lit(n), perSlot).otherwise(x)
      })
      // valid = enough slots and every configured slot parsed; otherwise the
      // literal keeps its authored lexical (and never matches a spatial filter)
      when(size(parts) >= n && forall(slice(canon, 1, n), c => c.isNotNull),
        array_join(canon, "#")).otherwise(lex)
    }
  }

  private val reg = scala.collection.concurrent.TrieMap.empty[String, Config]
  @volatile private var defaultUri: Option[String] = Some(GeoLiteral)

  def register(c: Config): Unit = {
    reg(c.uri) = c
    graft.model.Term.Datatypes.registerLex(c.uri, c.canonLex)
  }
  def unregister(uri: String): Unit = {
    reg.remove(uri)
    graft.model.Term.Datatypes.unregisterLex(uri)
  }
  def get(uri: String): Option[Config] = reg.get(uri)
  def defaultConfig: Option[Config] = defaultUri.flatMap(reg.get)
  def setDefault(uri: Option[String]): Unit = defaultUri = uri

  // Built-in default (the reference's documented default schema: lat/lon at
  // 5-decimal precision + a LONG time slot — GeoSpatialConfig defaults, and the
  // exact config TestGeoSpatialServiceEvaluation.getProperties registers).
  register(Config(GeoLiteral, Seq(
    Field("DOUBLE", 100000L, "LATITUDE"),
    Field("DOUBLE", 100000L, "LONGITUDE"),
    Field("LONG", 1L, "TIME"))))

  // The v1 built-ins every store registers on startup
  // (GeoSpatialConfigOptions.java:82-98: lat-lon at 5-decimal precision, and
  // lat-lon-time adding a LONG time slot).
  private val V1 = "http://www.bigdata.com/rdf/geospatial/literals/v1#"
  register(Config(V1 + "lat-lon", Seq(
    Field("DOUBLE", 100000L, "LATITUDE"),
    Field("DOUBLE", 100000L, "LONGITUDE"))))
  register(Config(V1 + "lat-lon-time", Seq(
    Field("DOUBLE", 100000L, "LATITUDE"),
    Field("DOUBLE", 100000L, "LONGITUDE"),
    Field("LONG", 1L, "TIME"))))

  /** Force object construction (builtin registration) from load paths. */
  val init: Unit = ()
}
