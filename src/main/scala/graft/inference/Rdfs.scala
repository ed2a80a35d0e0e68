package graft.inference

import graft.model.{GraftStore, Term}
import graft.engine.TermIds
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** RDFS forward-chaining closure — the FastClosure strategy.
  *
  * The reference offers two rule programs (`rdf/rules/FullClosure.java` = generic
  * fixpoint, `rdf/rules/FastClosure.java` = staged): FastClosure first computes the
  * *schema-level* closures (subClassOf/subPropertyOf transitive closure — tiny,
  * vocabulary-sized) and then derives instance-level entailments in a fixed small number
  * of single-pass joins. That shape is exactly right for Spark at scale: the schema
  * closures are collected to the driver (bounded by vocabulary size, not data size) and
  * broadcast, so every instance-level rule is ONE map-side broadcast join over the
  * statements — no iterative shuffling of the 100 TB fact table.
  *
  * Rules: rdfs5/rdfs11 (schema transitivity, driver-side), rdfs7 (subPropertyOf
  * entailment), rdfs2/rdfs3 (domain/range), rdfs9 (subClassOf type propagation).
  * Entailments get `StatementEnum.Inferred` (rdf/model/StatementEnum.java:42-59).
  */
object Rdfs {

  val OWL = "http://www.w3.org/2002/07/owl#"
  val OWL_SAMEAS: String = OWL + "sameAs"
  val OWL_INVERSEOF: String = OWL + "inverseOf"
  val OWL_TRANSITIVE: String = OWL + "TransitiveProperty"
  val OWL_EQCLASS: String = OWL + "equivalentClass"
  val OWL_EQPROP: String = OWL + "equivalentProperty"
  val OWL_SYMMETRIC: String = OWL + "SymmetricProperty"
  val OWL_FUNCTIONAL: String = OWL + "FunctionalProperty"
  val OWL_INVFUNCTIONAL: String = OWL + "InverseFunctionalProperty"
  val OWL_RESTRICTION: String = OWL + "Restriction"
  val OWL_ONPROPERTY: String = OWL + "onProperty"
  val OWL_HASVALUE: String = OWL + "hasValue"

  private val typeId = TermIds.iriId(Term.RDF_TYPE)
  private val subClassId = TermIds.iriId(Term.RDFS_SUBCLASSOF)
  private val subPropId = TermIds.iriId(Term.RDFS_SUBPROPERTYOF)
  private val domainId = TermIds.iriId(Term.RDFS_DOMAIN)
  private val rangeId = TermIds.iriId(Term.RDFS_RANGE)
  private val sameAsId = TermIds.iriId(OWL_SAMEAS)
  private val inverseOfId = TermIds.iriId(OWL_INVERSEOF)
  private val transitiveId = TermIds.iriId(OWL_TRANSITIVE)
  private val eqClassId = TermIds.iriId(OWL_EQCLASS)
  private val eqPropId = TermIds.iriId(OWL_EQPROP)
  private val symmetricId = TermIds.iriId(OWL_SYMMETRIC)
  private val functionalId = TermIds.iriId(OWL_FUNCTIONAL)
  private val invFunctionalId = TermIds.iriId(OWL_INVFUNCTIONAL)
  private val restrictionId = TermIds.iriId(OWL_RESTRICTION)
  private val onPropertyId = TermIds.iriId(OWL_ONPROPERTY)
  private val hasValueId = TermIds.iriId(OWL_HASVALUE)

  /** Driver-side transitive closure of a vocabulary-sized relation. */
  private def transitiveRows(rows: Array[(Row, Row)]): Seq[(Row, Row)] = {
    def key(r: Row) = r.getAs[Long]("id")
    val adj = rows.groupBy(p => key(p._1))
    val out = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
    val rep = scala.collection.mutable.HashMap.empty[Long, Row]
    rows.foreach { case (a, b) => rep(key(a)) = a; rep(key(b)) = b }
    def dfs(start: Long): Unit = {
      val seen = scala.collection.mutable.HashSet.empty[Long]
      var frontier = List(start)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Array.empty[(Row, Row)])
          .map(p => key(p._2))).filterNot(seen)
        next.foreach { m => seen += m; out += ((start, m)) }
        frontier = next
      }
    }
    rows.map(p => key(p._1)).distinct.foreach(dfs)
    out.toSeq.map { case (a, b) => (rep(a), rep(b)) }
  }

  /** Truth maintenance (rdf/inf/TruthMaintenance.java): after retraction of explicit
    * statements, drop ALL materialized entailments and re-run the closure from the
    * remaining Explicit+Axiom statements. The reference computes incremental
    * retraction proofs against its indexes; at rest in columnar storage the
    * recompute is a bounded number of broadcast joins (FastClosure) and is always
    * correct — no proof bookkeeping to maintain.
    */
  def truthMaintain(store: GraftStore): GraftStore =
    closure(store.withStatements(
      store.statements.filter(col("stype") =!= GraftStore.STYPE_INFERRED)))

  /** Rule-program FIXPOINT: re-run the staged closure until no new statements
    * derive (the reference's InferenceEngine runs its rule set to quiescence;
    * `rdf/rules/InferenceEngine.java` computeClosure). One round = one full
    * staged pass, so this is the opt-in for ontologies whose derivations
    * cascade across the stage order — hasValue output re-feeding domain/range,
    * FP/IFP sameAs merge-of-merges (see SCALE.md §OWL). Each round's
    * entailments are checkpointed, so plan depth stays bounded by one pass.
    */
  def closureFixpoint(store: GraftStore, maxRounds: Int = 8): GraftStore = {
    var cur = store
    var prev = -1L
    var rounds = 0
    while (rounds < maxRounds) {
      val mat = closure(cur).statements.localCheckpoint()
      val n = mat.count()
      if (n == prev) return cur
      cur = cur.withStatements(mat)
      prev = n
      rounds += 1
    }
    cur
  }

  /** Materialize the closure; derived rows get stype=Inferred and the default graph. */
  def closure(store: GraftStore): GraftStore = {
    val spark = store.spark
    val stmts = store.statements
    // ONE pruned scan collects every (vocabulary-sized) schema relation AND the
    // property-characteristic/restriction-marker rows — a single driver action, not
    // one per vocabulary family (each action re-evaluates the statement plan, which
    // after updates/closures is more than a bare parquet scan)
    val schemaPids = Seq(subClassId, subPropId, domainId, rangeId,
      inverseOfId, eqClassId, eqPropId, onPropertyId, hasValueId)
    val charIds = Seq(transitiveId, symmetricId, functionalId, invFunctionalId)
    val vocabRows: Array[Row] = stmts
      .filter(col("p_id").isin(schemaPids: _*) ||
        (col("p_id") === typeId && col("o")("id").isin(charIds :+ restrictionId: _*)))
      .select(col("p_id"), col("s"), col("o"), col("o")("id").as("o_id")).collect()
    val schemaRows: Map[Long, Array[(Row, Row)]] = vocabRows
      .filter(r => r.getLong(0) != typeId)
      .groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(r => (r.getStruct(1), r.getStruct(2))) }
    def schema(pid: Long): Array[(Row, Row)] = schemaRows.getOrElse(pid, Array.empty)

    // owl:equivalentClass/Property fold into the subClass/subProperty closures
    // (RuleOwlEquivalentClass/Property: a ≡ b ⇔ a ⊑ b ∧ b ⊑ a)
    val eqc = schema(eqClassId)
    val eqp = schema(eqPropId)
    val sc = schema(subClassId) ++ eqc ++ eqc.map(_.swap)
    val sp = schema(subPropId) ++ eqp ++ eqp.map(_.swap)
    val dom = schema(domainId)
    val rng = schema(rangeId)
    val inv = schema(inverseOfId)
    // property-characteristic declarations (transitive/symmetric/(inverse-)functional)
    // come from the same combined vocabulary scan, keyed by the type object
    val propChars: Map[Long, Array[Row]] = vocabRows
      .filter(r => r.getLong(0) == typeId && r.getLong(3) != restrictionId)
      .groupBy(_.getLong(3)).map { case (k, rs) => k -> rs.map(_.getStruct(1)) }
    val transProps = propChars.getOrElse(transitiveId, Array.empty[Row])
    val symProps = propChars.getOrElse(symmetricId, Array.empty[Row])
    val funcProps = propChars.getOrElse(functionalId, Array.empty[Row])
    val invFuncProps = propChars.getOrElse(invFunctionalId, Array.empty[Row])
    // owl:hasValue restrictions (RuleOwlHasValue): a type owl:Restriction,
    // a owl:onProperty p, a owl:hasValue v — vocabulary-sized, keyed by a.id
    val restrictions: Seq[(Long, Row, Row)] = {
      val onP = schema(onPropertyId).map { case (a, p) => a.getAs[Long]("id") -> p }.toMap
      val hv = schema(hasValueId).map { case (a, v) => a.getAs[Long]("id") -> v }.toMap
      if (onP.isEmpty || hv.isEmpty) Nil
      else {
        val isRestriction = vocabRows
          .filter(r => r.getLong(0) == typeId && r.getLong(3) == restrictionId)
          .map(_.getStruct(1).getAs[Long]("id")).toSet
        (onP.keySet intersect hv.keySet).toSeq.filter(isRestriction)
          .map(a => (a, onP(a), hv(a)))
      }
    }
    val hasSameAs = stmts.filter(col("p_id") === sameAsId).limit(1).count() > 0 ||
      funcProps.nonEmpty || invFuncProps.nonEmpty
    if (sc.isEmpty && sp.isEmpty && dom.isEmpty && rng.isEmpty && inv.isEmpty &&
        transProps.isEmpty && symProps.isEmpty && restrictions.isEmpty && !hasSameAs)
      return store

    val termType = Term.schema
    def pairsDf(pairs: Seq[(Row, Row)], an: String, bn: String): DataFrame = {
      val rows = pairs.map { case (a, b) => Row(a, b) }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(an, termType),
          org.apache.spark.sql.types.StructField(bn, termType))))
    }

    val scC = transitiveRows(sc)
    val spC = transitiveRows(sp)
    val spo = stmts.select(col("s"), col("p"), col("o"), col("p_id"))

    var derived = Seq.empty[DataFrame]
    // rdfs5/11 (+owl equivalence): schema closures themselves (vocabulary-sized)
    if ((sc ++ scC).nonEmpty) derived :+= pairsDf((sc ++ scC).toSeq, "s", "o")
      .select(col("s"), Term.iri(Term.RDFS_SUBCLASSOF).as("p"), col("o"))
    if ((sp ++ spC).nonEmpty) derived :+= pairsDf((sp ++ spC).toSeq, "s", "o")
      .select(col("s"), Term.iri(Term.RDFS_SUBPROPERTYOF).as("p"), col("o"))
    if (eqc.nonEmpty) derived :+= pairsDf(eqc.map(_.swap).toSeq, "s", "o")
      .select(col("s"), Term.iri(OWL_EQCLASS).as("p"), col("o"))
    if (eqp.nonEmpty) derived :+= pairsDf(eqp.map(_.swap).toSeq, "s", "o")
      .select(col("s"), Term.iri(OWL_EQPROP).as("p"), col("o"))

    // rdfs7: (x p y), (p subPropertyOf* q) → (x q y) — one broadcast join.
    // Materialized ONCE like dInv2: the delta feeds `facts`, which fans out to
    // domain/range, rdfs9, FP/IFP, transitive, hasValue AND the novelty union —
    // a consumer's p_id filter cannot prune this branch (the derived p comes from
    // the broadcast side), so lazily it re-runs the data-sized join per consumer.
    val rdfs7 = if (sp.isEmpty) None else {
      val spAll = pairsDf(sp.toSeq ++ spC, "sp_s", "sp_o").dropDuplicates("sp_s", "sp_o")
        .select(col("sp_s")("id").as("p_id"), col("sp_o").as("q"))
      Some(spo.join(broadcast(spAll), Seq("p_id"))
        .select(col("s"), col("q").as("p"), col("o")).localCheckpoint())
    }
    rdfs7.foreach(d => derived :+= d)

    def withPid(d: DataFrame): DataFrame =
      d.select(col("s"), col("p"), col("o"), col("p")("id").as("p_id"))
    var facts = (spo +: rdfs7.map(withPid).toSeq)
      .map(graft.engine.DfOps.reid).reduce(_.unionByName(_))

    // RuleOwlInverseOf1/2: (p owl:inverseOf q), (x p y) → (y q x) (and symmetric)
    if (inv.nonEmpty) {
      val invBoth = pairsDf(inv.toSeq, "i_p", "i_q")
        .select(col("i_p")("id").as("p_id"), col("i_q").as("q"))
        .unionByName(pairsDf(inv.toSeq, "i_p", "i_q")
          .select(col("i_q")("id").as("p_id"), col("i_p").as("q")))
        .dropDuplicates("p_id", "q")
      // (y q x): subject = old object, object = old subject. Materialized ONCE:
      // the inverse delta feeds ≥3 downstream consumers (domain/range, rdfs9, the
      // novelty anti-join) which would otherwise each recompute the data-sized join
      val dInv2 = facts.join(broadcast(invBoth), Seq("p_id"))
        .filter(col("o")("kind") =!= Term.KIND_LITERAL)
        .select(col("o").as("s"), col("q").as("p"), col("s").as("o"))
        .localCheckpoint()
      derived :+= dInv2
      facts = facts.unionByName(withPid(graft.engine.DfOps.reid(dInv2)))
    }

    // RuleOwlSymmetricProperty: (p a owl:SymmetricProperty), (x p y) → (y p x) —
    // the self-inverse special case, same single pruned-scan shape as inverseOf
    if (symProps.nonEmpty) {
      val sIds = symProps.map(_.getAs[Long]("id")).toSeq
      val dSym = facts.filter(col("p_id").isin(sIds: _*) &&
          col("o")("kind") =!= Term.KIND_LITERAL)
        .select(col("o").as("s"), col("p"), col("s").as("o"))
        .localCheckpoint()
      derived :+= dSym
      facts = facts.unionByName(withPid(graft.engine.DfOps.reid(dSym)))
    }

    // RuleOwlHasValue: (x rdf:type a), (a rdf:type owl:Restriction),
    // (a owl:onProperty p), (a owl:hasValue v) → (x p v). Restrictions are
    // vocabulary-sized → broadcast onto the type partition scan.
    if (restrictions.nonEmpty) {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val rRows = restrictions.map { case (a, p, v) => Row(a, p, v) }
      val rDf = spark.createDataFrame(spark.sparkContext.parallelize(rRows, 1),
        StructType(Seq(StructField("tid", LongType),
          StructField("hp", termType), StructField("hv", termType))))
      val dHas = facts.filter(col("p_id") === typeId)
        .join(broadcast(rDf), col("o")("id") === col("tid"))
        .select(col("s"), col("hp").as("p"), col("hv").as("o"))
        .localCheckpoint()
      derived :+= dHas
      facts = facts.unionByName(withPid(graft.engine.DfOps.reid(dHas)))
    }

    // RuleOwlTransitiveProperty1/2: per transitive property, id-space fixpoint
    if (transProps.nonEmpty) {
      val tIds = transProps.map(_.getAs[Long]("id")).toSeq
      val tEdges = facts.filter(col("p_id").isin(tIds: _*))
      val dict = tEdges.select(col("s").as("n")).unionByName(tEdges.select(col("o").as("n")))
        .withColumn("nid", col("n")("id")).dropDuplicates("nid").localCheckpoint()
      val pDict = pairsDf(transProps.map(r => (r, r)).toSeq, "pt", "pt2")
        .select(col("pt")("id").as("p_id"), col("pt").as("pterm")).dropDuplicates("p_id")
      val edges0 = tEdges
        .select(col("p_id"), col("s")("id").as("a"), col("o")("id").as("b"))
        .dropDuplicates("p_id", "a", "b").localCheckpoint()
      var acc = edges0
      var frontier = edges0
      var n = frontier.count()
      while (n > 0) {
        val stepped = frontier.select(col("p_id"), col("a"), col("b").as("m"))
          .join(edges0.select(col("p_id"), col("a").as("m"), col("b")), Seq("p_id", "m"))
          .select("p_id", "a", "b").dropDuplicates("p_id", "a", "b")
        frontier = stepped.join(acc, Seq("p_id", "a", "b"), "left_anti").localCheckpoint()
        n = frontier.count()
        if (n > 0) acc = acc.unionByName(graft.engine.DfOps.reid(frontier))
      }
      val dTrans = acc
        .join(dict.select(col("nid").as("a"), col("n").as("s")), Seq("a"))
        .join(dict.select(col("nid").as("b"), col("n").as("o")), Seq("b"))
        .join(broadcast(pDict), Seq("p_id"))
        .select(col("s"), col("pterm").as("p"), col("o"))
        .localCheckpoint() // multi-consumer delta (see dInv2)
      derived :+= dTrans
      facts = facts.unionByName(withPid(graft.engine.DfOps.reid(dTrans)))
    }

    // RuleOwlSameAs1/2/3: equivalence classes (CC in id space), all-pairs sameAs,
    // then subject/object substitution over the fact base. `sameAsActive` records
    // whether substitution actually RAN: FP/IFP declarations with clean data (the
    // common case) derive zero pairs, and the derived-predicate partition pruning
    // of the novelty anti-join below must not be forfeited for them.
    var sameAsActive = false
    var saPairs: Option[DataFrame] = None
    if (hasSameAs) {
      val explicitSa = stmts.filter(col("p_id") === sameAsId).select(col("s"), col("o"))
      // RuleOwlFunctionalProperty: (p a owl:FunctionalProperty), (a p b), (a p c),
      // b≠c → (b sameAs c). Self-join keyed on (p_id, subject id) — shuffles only
      // the functional-property facts, linear in their count.
      val fpSa = if (funcProps.isEmpty) None else {
        val ids = funcProps.map(_.getAs[Long]("id")).toSeq
        val f = facts.filter(col("p_id").isin(ids: _*) &&
            col("o")("kind") =!= Term.KIND_LITERAL)
          .select(col("p_id"), col("s")("id").as("k"), col("o"))
        Some(f.select(col("p_id"), col("k"), col("o").as("b"))
          .join(f.select(col("p_id"), col("k"), col("o").as("c")), Seq("p_id", "k"))
          .filter(col("b")("id") =!= col("c")("id"))
          .select(col("b").as("s"), col("c").as("o")))
      }
      // RuleOwlInverseFunctionalProperty: (a p b), (c p b), a≠c → (a sameAs c) —
      // the mirror image, keyed on (p_id, object id)
      val ifpSa = if (invFuncProps.isEmpty) None else {
        val ids = invFuncProps.map(_.getAs[Long]("id")).toSeq
        val f = facts.filter(col("p_id").isin(ids: _*))
          .select(col("p_id"), col("o")("id").as("k"), col("s"))
        Some(f.select(col("p_id"), col("k"), col("s").as("b"))
          .join(f.select(col("p_id"), col("k"), col("s").as("c")), Seq("p_id", "k"))
          .filter(col("b")("id") =!= col("c")("id"))
          .select(col("b").as("s"), col("c").as("o")))
      }
      val saStmts = (Seq(explicitSa) ++ fpSa ++ ifpSa)
        .map(graft.engine.DfOps.reid).reduce(_.unionByName(_)).localCheckpoint()
      // the checkpoint above already materialized the pair set — the emptiness
      // probe is a metadata-cheap scan of it, not a recompute
      sameAsActive = saStmts.limit(1).count() > 0
      if (sameAsActive) saPairs = Some(saStmts)
    }
    saPairs.foreach { saStmts =>
      val comp = graft.gas.Gas.connectedComponents(
        saStmts.select(col("s")("id").as("src"), col("o")("id").as("dst")))
      val saDict = saStmts.select(col("s").as("n")).unionByName(saStmts.select(col("o").as("n")))
        .withColumn("nid", col("n")("id")).dropDuplicates("nid")
      val members = comp.join(saDict, col("vertex") === col("nid"))
        .select(col("component"), col("nid"), col("n")).localCheckpoint()
      val aliasPairs = members.select(col("component"), col("nid").as("xid"), col("n").as("x"))
        .join(members.select(col("component"), col("nid").as("yid"), col("n").as("y")),
          Seq("component"))
        .filter(col("xid") =!= col("yid"))
      derived :+= aliasPairs.select(col("x").as("s"), Term.iri(OWL_SAMEAS).as("p"), col("y").as("o"))
      val aliasOf = aliasPairs.select(col("xid"), col("y").as("alias")).localCheckpoint()
      val subjSub = facts.filter(col("p_id") =!= sameAsId)
        .join(broadcast(aliasOf), col("s")("id") === col("xid"))
        .select(col("alias").as("s"), col("p"), col("o"))
        .localCheckpoint() // multi-consumer delta (see dInv2)
      val objSub = facts.filter(col("p_id") =!= sameAsId &&
          col("o")("kind") =!= Term.KIND_LITERAL)
        .join(broadcast(aliasOf), col("o")("id") === col("xid"))
        .select(col("s"), col("p"), col("alias").as("o"))
        .localCheckpoint()
      derived :+= subjSub
      derived :+= objSub
      facts = facts.unionByName(withPid(graft.engine.DfOps.reid(subjSub)))
        .unionByName(withPid(graft.engine.DfOps.reid(objSub)))
    }

    // facts incl. property/owl entailments feed domain/range/type rules
    val factsForTypes = facts.select(col("s"), col("p_id").as("pid"), col("o"))

    // rdfs2/rdfs3: domain/range → type triples (broadcast joins)
    var typeCandidates = Seq.empty[DataFrame]
    if (dom.nonEmpty) {
      val dm = pairsDf(dom.toSeq, "d_p", "d_c")
        .select(col("d_p")("id").as("pid"), col("d_c").as("cls"))
      typeCandidates :+= factsForTypes.join(broadcast(dm), Seq("pid"))
        .select(col("s"), col("cls"))
    }
    if (rng.nonEmpty) {
      val rn = pairsDf(rng.toSeq, "r_p", "r_c")
        .select(col("r_p")("id").as("pid"), col("r_c").as("cls"))
      typeCandidates :+= factsForTypes.join(broadcast(rn), Seq("pid"))
        .filter(col("o")("kind") =!= Term.KIND_LITERAL)
        .select(col("o").as("s"), col("cls"))
    }
    typeCandidates.foreach(tc => derived :+=
      tc.select(col("s"), Term.iri(Term.RDF_TYPE).as("p"), col("cls").as("o")))

    // rdfs9: (x type a), (a subClassOf* b) → (x type b) — over explicit + derived types
    var lateTypes = typeCandidates // (s, cls) pairs derived AFTER the property rules
    if (sc.nonEmpty) {
      val scAll = pairsDf(sc.toSeq ++ scC, "c_a", "c_b").dropDuplicates("c_a", "c_b")
        .select(col("c_a")("id").as("tid"), col("c_b").as("cls"))
      val allTypes = (facts.filter(col("p_id") === typeId).select(col("s"), col("o")) +:
        typeCandidates.map(_.select(col("s"), col("cls").as("o"))))
        .map(graft.engine.DfOps.reid).reduce(_.unionByName(_))
      val r9 = allTypes.select(col("s"), col("o")("id").as("tid"))
        .join(broadcast(scAll), Seq("tid"))
        .select(col("s"), col("cls"))
      derived :+= r9.select(col("s"), Term.iri(Term.RDF_TYPE).as("p"), col("cls").as("o"))
      lateTypes :+= r9
    }

    // RuleOwlHasValue, second application: the first firing runs BEFORE the type
    // rules, so restriction membership derived by rdfs2/rdfs3/rdfs9 (x type R from
    // domain/range/subclass) never met the hasValue check. The reference's rule
    // program iterates to fixpoint; this staged re-application (one more broadcast
    // join over the late type delta) covers the derived-type → restriction case.
    // Deeper chains — hasValue output re-feeding rdfs2/3, FP/IFP sameAs cascades
    // over substituted facts — remain staged-incomplete: see SCALE.md §OWL.
    if (restrictions.nonEmpty && lateTypes.nonEmpty) {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val rRows2 = restrictions.map { case (a, p, v) => Row(a, p, v) }
      val rDf2 = spark.createDataFrame(spark.sparkContext.parallelize(rRows2, 1),
        StructType(Seq(StructField("tid", LongType),
          StructField("hp", termType), StructField("hv", termType))))
      val late = lateTypes.map(graft.engine.DfOps.reid).reduce(_.unionByName(_))
      derived :+= late.join(broadcast(rDf2), col("cls")("id") === col("tid"))
        .select(col("s"), col("hp").as("p"), col("hv").as("o"))
    }

    if (derived.isEmpty) return store
    // dedup + novelty anti-join in id space: 24-byte keys, not wide term structs
    val keyed = derived.map(d => graft.engine.DfOps.reid(d.select("s", "p", "o")))
      .reduce(_.unionByName(_))
      .withColumn("sk", col("s")("id")).withColumn("pk", col("p")("id"))
      .withColumn("ok", col("o")("id"))
      .dropDuplicates("sk", "pk", "ok")
    // Without sameAs substitution every derived predicate is KNOWN (schema constants,
    // rdfs7 superproperties, inverses, transitive props), so the anti-join's existing-
    // statements side prunes to those p_id partitions instead of scanning the store.
    // Keyed on sameAsActive, not hasSameAs: FP/IFP vocabulary with zero derived
    // pairs keeps the pruning.
    val derivedPids: Option[Seq[Long]] =
      if (sameAsActive) None
      else Some((Seq(subClassId, subPropId, eqClassId, eqPropId, typeId) ++
        (sp ++ spC).map(_._2.getAs[Long]("id")) ++
        inv.flatMap(p => Seq(p._1.getAs[Long]("id"), p._2.getAs[Long]("id"))) ++
        transProps.map(_.getAs[Long]("id")) ++
        symProps.map(_.getAs[Long]("id")) ++
        restrictions.map(_._2.getAs[Long]("id"))).distinct)
    val existing = derivedPids match {
      case Some(pids) => stmts.filter(col("p_id").isin(pids: _*))
      case None => stmts
    }
    val allDerived = keyed.join(
      existing.select(col("s")("id").as("sk"), col("p_id").as("pk"), col("o")("id").as("ok")),
      Seq("sk", "pk", "ok"), "left_anti")
      .drop("sk", "pk", "ok")
    val inferred = GraftStore.assemble(allDerived
      .withColumn("g", Term.nullTerm)
      .withColumn("stype", lit(GraftStore.STYPE_INFERRED).cast("byte")))
    // the union stays LAZY: a downstream query's p_id filter pushes into the
    // derivation branches and prunes most of the closure work (measured faster than
    // eagerly materializing the delta — single-consumer closures dominate)
    store.withStatements(store.statements.unionByName(inferred))
  }
}
