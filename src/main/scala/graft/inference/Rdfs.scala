package graft.inference

import graft.model.{GraftStore, Term}
import graft.engine.TermIds
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RDFS forward-chaining closure as a semi-naive datalog fixpoint.
  *
  * The reference runs rule programs (`rdf/rules/FullClosure.java`, `FastClosure.java`,
  * engine `rdf/rules/InferenceEngine.java`; individual rules RuleRdfs02…RuleRdfs11) over
  * its B+Tree indexes at load time, marking entailments `StatementEnum.Inferred`. Here
  * each rule is one join template over the statements DataFrame; the delta loop runs
  * until no new statements appear (the classic Spark semi-naive pattern, same skeleton
  * as the property-path fixpoint). Backchaining (`rdf/rules/BackchainAccessPath.java`)
  * becomes materialize-all — cheap at rest in columnar storage.
  *
  * Implemented rules (the ones with non-empty support in any vocabulary):
  *   rdfs5  (subPropertyOf transitivity), rdfs7  (subPropertyOf entailment),
  *   rdfs9  (subClassOf instance propagation), rdfs11 (subClassOf transitivity),
  *   rdfs2  (domain), rdfs3 (range).
  */
object Rdfs {

  private val typeId = TermIds.iriId(Term.RDF_TYPE)
  private val subClassId = TermIds.iriId(Term.RDFS_SUBCLASSOF)
  private val subPropId = TermIds.iriId(Term.RDFS_SUBPROPERTYOF)
  private val domainId = TermIds.iriId(Term.RDFS_DOMAIN)
  private val rangeId = TermIds.iriId(Term.RDFS_RANGE)

  /** One rule application over the full statement set: returns candidate statements. */
  private def applyRules(all: DataFrame): DataFrame = {
    val spo = all.select("s", "p", "o")
    def byP(id: Long) = spo.filter(col("p")("id") === id)

    // rdfs11: (a subClassOf b), (b subClassOf c) → (a subClassOf c)
    val sc = byP(subClassId)
    val rdfs11 = sc.select(col("s"), col("o").as("m"))
      .join(sc.select(col("s").as("m"), col("o").as("o2")), Seq("m"))
      .select(col("s"), Term.iri(Term.RDFS_SUBCLASSOF).as("p"), col("o2").as("o"))

    // rdfs9: (x type a), (a subClassOf b) → (x type b)
    val types = byP(typeId)
    val rdfs9 = types.select(col("s"), col("o").as("m"))
      .join(sc.select(col("s").as("m"), col("o").as("cls")), Seq("m"))
      .select(col("s"), Term.iri(Term.RDF_TYPE).as("p"), col("cls").as("o"))

    // rdfs5: subPropertyOf transitivity
    val sp = byP(subPropId)
    val rdfs5 = sp.select(col("s"), col("o").as("m"))
      .join(sp.select(col("s").as("m"), col("o").as("o2")), Seq("m"))
      .select(col("s"), Term.iri(Term.RDFS_SUBPROPERTYOF).as("p"), col("o2").as("o"))

    // rdfs7: (x p y), (p subPropertyOf q) → (x q y)
    val rdfs7 = spo.select(col("s"), col("p")("id").as("pid"), col("o"))
      .join(sp.select(col("s")("id").as("pid"), col("o").as("q")), Seq("pid"))
      .select(col("s"), col("q").as("p"), col("o"))

    // rdfs2: (p domain c), (x p y) → (x type c)
    val dom = byP(domainId)
    val rdfs2 = spo.select(col("s"), col("p")("id").as("pid"))
      .join(dom.select(col("s")("id").as("pid"), col("o").as("cls")), Seq("pid"))
      .select(col("s"), Term.iri(Term.RDF_TYPE).as("p"), col("cls").as("o"))

    // rdfs3: (p range c), (x p y) → (y type c)
    val rng = byP(rangeId)
    val rdfs3 = spo.select(col("o").as("s2"), col("p")("id").as("pid"))
      .join(rng.select(col("s")("id").as("pid"), col("o").as("cls")), Seq("pid"))
      .filter(col("s2")("kind") =!= Term.KIND_LITERAL)
      .select(col("s2").as("s"), Term.iri(Term.RDF_TYPE).as("p"), col("cls").as("o"))

    // rule branches share the `spo` lineage — reid each before the union
    Seq(rdfs11, rdfs9, rdfs5, rdfs7, rdfs2, rdfs3)
      .map(graft.engine.DfOps.reid).reduce(_.unionByName(_))
  }

  /** Materialize the closure; derived rows get stype=Inferred and the default graph. */
  def closure(store: GraftStore, maxRounds: Int = 20): GraftStore = {
    var all = store.statements.select("s", "p", "o").dropDuplicates("s", "p", "o")
      .localCheckpoint()
    var derived: DataFrame = null
    var round = 0
    var newCount = 1L
    while (newCount > 0 && round < maxRounds) {
      val candidates = applyRules(all).dropDuplicates("s", "p", "o")
      val fresh = candidates.join(all, Seq("s", "p", "o"), "left_anti").localCheckpoint()
      newCount = fresh.count()
      if (newCount > 0) {
        all = all.unionByName(graft.engine.DfOps.reid(fresh)).localCheckpoint()
        derived = if (derived == null) fresh else derived.unionByName(graft.engine.DfOps.reid(fresh)).localCheckpoint()
      }
      round += 1
    }
    if (derived == null) store
    else {
      val inferred = GraftStore.assemble(derived
        .withColumn("g", Term.nullTerm)
        .withColumn("stype", lit(GraftStore.STYPE_INFERRED).cast("byte")))
      store.withStatements(store.statements.unionByName(inferred))
    }
  }
}
