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

  /** Bump when closure SEMANTICS change — keys the on-disk at-rest closed-store
    * cache (SparkEntry.closedStore) so a stale materialization is never reused.
    */
  val CLOSURE_VERSION = 2 // r13: sameAs substitution closes the full orbit

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

  /** Vocabulary-sized (term, term) pair frame for broadcast rule joins. */
  private def pairsDf(spark: org.apache.spark.sql.SparkSession,
                      pairs: Seq[(Row, Row)], an: String, bn: String): DataFrame = {
    val termType = Term.schema
    val rows = pairs.map { case (a, b) => Row(a, b) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(an, termType),
        org.apache.spark.sql.types.StructField(bn, termType))))
  }

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

  /** DELTA-RESTRICTED truth maintenance (DRed, delete-rederive): instead of the
    * drop-all + full-closure recompute above, propagate the retraction through
    * the rule program to an over-approximate SUSPECT set (entailments with ≥1
    * derivation touching the delta), then re-derive suspects against the
    * remaining facts under the new schema; suspects that fail re-derivation are
    * retracted. Every scan is pruned to the delta's predicates or semi-joined by
    * the (broadcast, delta-sized) suspect keys, so a small DELETE costs
    * O(affected partitions), not O(corpus) — the reference computes the same
    * incremental retraction with proof bookkeeping (`rdf/inf/TruthMaintenance
    * .java:1`); at rest in columnar storage the taint/re-derive joins replace
    * the proofs. The insert side of a Modify runs the SAME staged delta pass
    * forward (added facts/schema as taint) so mixed updates stay incremental.
    *
    * Returns None when the delta interacts with the non-local rule families —
    * sameAs/FP/IFP equivalence classes, transitive-property reachability, or
    * restriction/characteristic re-declarations — where only the fixpoint
    * recompute is safely incremental; the caller falls back to truthMaintain.
    */
  /** Is the store's entailment table AT REST (a scan — parquet, checkpoint
    * blocks, committed deltas — rather than a lazy derivation pipeline)? The
    * delta TM path probes the inferred rows several times; against a lazy
    * closure plan each probe would re-evaluate the derivation joins, making
    * the "incremental" path slower than the full recompute (which rebuilds
    * from cheap pruned parquet). Joins/aggregates in the inferred rows' plan
    * mean un-materialized derivations → route to the fixpoint recompute.
    */
  def inferredAtRest(store: GraftStore): Boolean =
    tombstoneDepth(store).isDefined

  /** None = not at rest (derivation joins/aggregates in the inferred plan);
    * Some(n) = at rest with n stacked delta-tombstone layers. A LEFT ANTI /
    * LEFT SEMI join whose right side reads only committed delta leaves
    * (LogicalRDD / LocalRelation — checkpointed retraction keys) is a
    * TOMBSTONE, not a derivation: probing through it costs one broadcast of
    * a delta-sized frame, so the store still counts as at rest. Mutations
    * therefore stay O(delta) — the delta TM result leaves the touched
    * partitions lazy behind tombstones instead of rewriting them — and the
    * TM pass compacts (commits the touched partitions) only when the stack
    * passes its depth bound. INNER joins (rule derivations) and aggregates
    * still mean a lazy closure pipeline → full recompute.
    *
    * Known approximation (accepted): "leaf is LogicalRDD" conflates
    * MATERIALIZED with DELTA-SIZED — a store-scale checkpoint reused as an
    * anti-join right side would still classify as a tombstone. Every right
    * side OUR mutation paths construct is a freshLeaf'd delta key frame, and
    * layout stores additionally track genuine rewrite layers explicitly
    * (LayoutSeg.layers, bounded at write time), so the approximation is only
    * reachable from hand-built store plans.
    */
  private[graft] def tombstoneDepth(store: GraftStore): Option[Int] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LocalRelation}
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    import org.apache.spark.sql.execution.LogicalRDD
    val plan = store.statements
      .filter(col("stype") === GraftStore.STYPE_INFERRED)
      .queryExecution.optimizedPlan
    def deltaLeaf(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collectLeaves().forall {
        case _: LogicalRDD | _: LocalRelation => true
        case _ => false
      }
    var tombs = 0
    var bad = false
    plan.foreach {
      case _: Aggregate => bad = true
      case j: Join
        if (j.joinType == LeftAnti || j.joinType == LeftSemi) && deltaLeaf(j.right) =>
        tombs += 1
      case _: Join => bad = true
      case _ => ()
    }
    if (bad) None else Some(tombs)
  }

  /** Commit the store's materialized entailments: checkpoint the Inferred rows
    * so later queries (and delta truth maintenance) read a table instead of
    * re-evaluating the derivation pipeline — the at-rest posture in-session.
    * (GraftStore.save achieves the same durably.)
    */
  def materialize(store: GraftStore): GraftStore =
    if (inferredAtRest(store)) store
    else graft.engine.DfOps.noConstraints(store.spark)(store.withStatements(
      store.statements.filter(col("stype") =!= GraftStore.STYPE_INFERRED)
        .unionByName(store.statements
          .filter(col("stype") === GraftStore.STYPE_INFERRED).localCheckpoint())))

  /** Which TM path the last Update.withTruthMaintenance took ("delta" |
    * "full" | "none") — test/diagnostic instrumentation only. Thread-local:
    * every reader (Dev probes, TmAB, the TM suites) inspects it on the thread
    * that just performed the update, and suites now run concurrently in one
    * test JVM — a process-global would race across suites.
    */
  private val lastTmPathTl: ThreadLocal[String] =
    ThreadLocal.withInitial(() => "none")
  def lastTmPath: String = lastTmPathTl.get()
  def lastTmPath_=(v: String): Unit = lastTmPathTl.set(v)

  /** Thread-local overlay for the `graft.tm.*` tuning valves (deltaCap,
    * cone.driverMax, sa.driverMax, sa.pairCap). The TM suites force specific
    * code paths by shrinking a valve for one scenario; with suites running
    * concurrently in one JVM, a `sys.props` mutation would reroute every
    * OTHER in-flight scenario too. The valves are read on the mutating
    * thread (driver-side plan construction), so a thread-confined overlay is
    * exact; `sys.props` stays honored as the process-wide default.
    */
  private val tmPropsTl: ThreadLocal[Map[String, String]] =
    ThreadLocal.withInitial(() => Map.empty[String, String])
  def withTmProps[A](kv: (String, String)*)(f: => A): A = {
    val prev = tmPropsTl.get()
    tmPropsTl.set(prev ++ kv)
    try f finally tmPropsTl.set(prev)
  }
  private def tmProp(name: String): Option[String] =
    tmPropsTl.get().get(name).orElse(sys.props.get(name))

  /** sameAs delta state for truthMaintainDelta: alias maps (xid → alias term;
    * OLD for the over-delete pass, NEW for re-derivation and the insert side)
    * plus the class-diff products when the delta touched sameAs edges.
    */
  private final case class SaDelta(
      aliasOld: DataFrame, aliasNew: DataFrame,
      lostTaint: Option[DataFrame], addSpo: Option[DataFrame],
      addAlias: Option[DataFrame], promSpo: Option[DataFrame])

  // -Dgraft.tm.prof counter: ONE listener for the JVM's lifetime (re-registering
  // per invocation leaked listeners and double-counted recordsRead)
  private val tmProfCtr = new java.util.concurrent.atomic.AtomicLong()
  private val tmProfRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)

  def truthMaintainDelta(next: GraftStore,
                         removed0: DataFrame, added0: DataFrame): Option[GraftStore] =
    graft.engine.DfOps.noConstraints(next.spark)(
      truthMaintainDeltaImpl(next, removed0, added0))

  private def truthMaintainDeltaImpl(next: GraftStore,
                         removed0: DataFrame, added0: DataFrame): Option[GraftStore] = {
    val spark = next.spark
    lazy val profRows = {
      if (tmProfRegistered.compareAndSet(false, true))
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (te.taskMetrics != null)
                tmProfCtr.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
          })
      tmProfCtr
    }
    def t[A](label: String)(f: => A): A =
      if (!sys.props.contains("graft.tm.prof")) f else {
        val t0 = System.nanoTime()
        val r0 = profRows.get()
        val r = f
        Thread.sleep(200)
        println(f"TMDELTA $label ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"rows=${profRows.get() - r0}")
        r
      }
    // ONE job materializes both sides of the delta (tagged union); freshLeaf
    // (not bare localCheckpoint) because the buffers often share upstream
    // lineage (a Modify's delete and insert both instantiate from one
    // solution checkpoint) and every downstream union re-splits them
    val delta0 = t("diff")(graft.engine.DfOps.freshLeaf(removed0
      .select(col("s"), col("p"), col("o"), col("g"), col("stype"))
      .withColumn("__r", lit(true))
      .unionByName(added0
        .select(col("s"), col("p"), col("o"), col("g"), col("stype"))
        .withColumn("__r", lit(false)))))
    val removed = delta0.filter(col("__r")).drop("__r")
    val added = delta0.filter(!col("__r")).drop("__r")
    // delta-size valve: the retraction/novelty key sets below ride broadcast
    // hash joins sized by the delta — a bulk mutation past broadcastable size
    // is better served by the recompute (count on the checkpointed frame is
    // metadata-cheap). -Dgraft.tm.deltaCap overrides for tests.
    val deltaCap = tmProp("graft.tm.deltaCap")
      .map(_.toLong).getOrElse(10000000L)

    // ---- bounded delta probes + non-local-family fallback guards ----
    // ONE probe job: the delta's predicate set AND whether it re-declares a
    // property characteristic / restriction marker (type rows with char
    // objects). An empty pid set means an empty delta — no separate
    // emptiness job.
    val charMarks = Seq(transitiveId, symmetricId, functionalId,
      invFunctionalId, restrictionId)
    val isMark = col("p")("id") === typeId && col("o")("id").isin(charMarks: _*)
    val pidRows = t("delta-pids")(delta0
      .select(col("p")("id").as("pid"), isMark.as("chr"),
        when(isMark, col("o")("id")).as("moid"),
        when(isMark, col("s")).as("mprop"),
        when(isMark, col("__r")).as("mrem"))
      .distinct().limit(1001).collect())
    if (pidRows.isEmpty) return Some(next)
    val deltaPids = pidRows.map(_.getLong(0)).toSet
    if (pidRows.length > 1000) return None
    // delta-size valve, AFTER the pid probe: empty/tiny deltas exit above on
    // the single probe job without paying a separate count action
    if (delta0.count() > deltaCap) return None
    if (deltaPids(onPropertyId) || deltaPids(hasValueId))
      return None
    // characteristic re-declarations: TRANSITIVE marks are delta-maintainable
    // (the cone treats an en/de-declared property as a whole-property
    // effective-edge delta — see transOldIds below), SYMMETRIC marks land
    // in the dIb schema diff as a (p,p) self-pair (r15 — the dIb arm's
    // premise expansion mirrors the closure's accumulated-edge flip stage),
    // and FP/IFP marks feed the sameAs class diff with the pairs they mint
    // (r16 — see the fpBase section below); RESTRICTION markers re-wire rule
    // machinery the delta arms don't model → recompute
    val markRows = pidRows.filter(_.getBoolean(1))
    if (markRows.exists(r => r.getLong(2) == restrictionId))
      return None
    // sameAs edges in the delta: handled by the equivalence-class diff pass
    // below (saDelta) — no longer an automatic recompute
    val saTouched = deltaPids(sameAsId)

    // The caller routes here only when the entailment table is AT REST
    // (inferredAtRest) — a committed table, not a lazy derivation pipeline —
    // so every probe below reads delta- or partition-sized data directly.
    val exp = next.statements.filter(col("stype") =!= GraftStore.STYPE_INFERRED)
    val inf = next.statements.filter(col("stype") === GraftStore.STYPE_INFERRED)
    def key3(df: DataFrame): DataFrame = df
      .withColumn("__sk", col("s")("id")).withColumn("__pk", col("p")("id"))
      .withColumn("__ok", col("o")("id"))
    // old-state views reconstructed from (next ∪ removed) − added: the lazy
    // pre-update plan is never re-evaluated (collectVocab needs p_id, s, o).
    // The buffers are ACTUAL deltas (insert's post-novelty rows, delete's
    // purged rows — Update.insertCapture/deleteCapture), and the subtraction
    // is keyed on (s,p,o,g) — insert novelty is per quad, so an (s,p,o)-keyed
    // anti-join would wrongly drop a pre-existing copy of the triple living
    // in another graph from the old view
    def key4(df: DataFrame): DataFrame = key3(df)
      .withColumn("__gk", coalesce(col("g")("id"), lit(0L)))
    def vocabView(df: DataFrame): DataFrame =
      df.select(col("p_id"), col("s"), col("o"))
    val newExp = vocabView(exp)
    val oldExp = key4(exp)
      .join(broadcast(key4(added).select("__sk", "__pk", "__ok", "__gk")),
        Seq("__sk", "__pk", "__ok", "__gk"), "left_anti")
      .select(col("p_id"), col("s"), col("o"))
      .unionByName(removed.filter(col("stype") =!= GraftStore.STYPE_INFERRED)
        .select(col("p")("id").as("p_id"), col("s"), col("o")))
    // ONE driver action: both vocab views AND the explicit-side sameAs
    // presence probe (inferred sameAs rows can only derive from explicit
    // sameAs or FP/IFP declarations, the latter guarded via the vocabs; a
    // removed-side sameAs row is already caught by the deltaPids guard above)
    val (vOld, vNew, expHasSameAs) = t("vocab")(collectVocab2(oldExp, newExp))
    // materialized sameAs state (explicit pairs in the new view, or a delta
    // touching the sameAs partition): no longer an automatic recompute — the
    // alias map IS the at-rest all-pairs sameAs partition (Case A: classes
    // unchanged), and a sameAs-edge delta rebuilds the affected classes and
    // diffs the all-pairs sets (Case B). Interactions with the OTHER non-local
    // families (directly-touched transitive properties) still fall back
    // below. `saPresent` (final form) is derived in the fpBase section once
    // the FP/IFP minted-pair state is known.

    def idOf(r: Row): Long = r.getAs[Long]("id")
    def ids(ps: Seq[(Row, Row)]): Set[(Long, Long)] =
      ps.map(p => (idOf(p._1), idOf(p._2))).toSet
    def minus(a: Seq[(Row, Row)], b: Seq[(Row, Row)]): Seq[(Row, Row)] = {
      val bIds = ids(b); a.filterNot(p => bIds((idOf(p._1), idOf(p._2))))
    }
    def closed(base: Array[(Row, Row)]): Seq[(Row, Row)] =
      (base ++ transitiveRows(base))
        .map(p => (idOf(p._1), idOf(p._2)) -> p).toMap.values.toSeq
    val scOld = closed(vOld.sc); val scNew = closed(vNew.sc)
    val spOld = closed(vOld.sp); val spNew = closed(vNew.sp)
    // Characteristic re-declarations (the r14/r15 mark-delta pattern,
    // generalized): collectVocab2 shares one characteristic-marker scan
    // between the views (vOld.<char>Props == vNew.<char>Props == the NEW
    // table's truth), so each OLD characteristic set derives from the mark
    // delta plus one pruned old-view probe (re-asserts and multi-graph copies
    // keep the schema unchanged).
    // SYMMETRIC: the en/de-declared property lands in dIbDel/dIbAdd as a
    // (p,p) self-pair — the dIb arm's premise expansion (sp*-into flips +
    // inverse-partner straight copies) mirrors the closure's accumulated-edge
    // flip. FP/IFP (r16): the old/new sets gate the minted-pair class-diff
    // work in the fpBase section below.
    def oldCharRows(charId: Long, newRows: Array[Row], tag: String): Array[Row] = {
      val mk = markRows.filter(_.getLong(2) == charId)
      if (mk.isEmpty) newRows
      else {
        val newIdSet = newRows.map(idOf).toSet
        val touchedP = mk.map(_.getStruct(3)).map(idOf).distinct
        val oldHas = t(tag)(oldExp
          .filter(col("p_id") === typeId && col("o")("id") === charId &&
            col("s")("id").isin(touchedP: _*))
          .select(col("s")("id")).distinct().collect().map(_.getLong(0)).toSet)
        val oldIds = (newIdSet -- touchedP) ++ touchedP.filter(oldHas)
        val oldOnly = mk.map(_.getStruct(3))
          .filter(r => oldIds(idOf(r)) && !newIdSet(idOf(r)))
          .map(r => idOf(r) -> r).toMap.values.toArray
        newRows.filter(r => oldIds(idOf(r))) ++ oldOnly
      }
    }
    val symOldRows: Array[Row] =
      oldCharRows(symmetricId, vNew.symProps, "sym-mark-old-probe")
    val funcOldRows: Array[Row] =
      oldCharRows(functionalId, vNew.funcProps, "fp-mark-old-probe")
    val invFuncOldRows: Array[Row] =
      oldCharRows(invFunctionalId, vNew.invFuncProps, "ifp-mark-old-probe")
    def invBoth(inv: Array[(Row, Row)], syms: Array[Row]): Seq[(Row, Row)] =
      ((inv ++ inv.map(_.swap)).toSeq ++ syms.map(r => (r, r)))
        .map(p => (idOf(p._1), idOf(p._2)) -> p).toMap.values.toSeq
    val ibOld = invBoth(vOld.inv, symOldRows)
    val ibNew = invBoth(vNew.inv, vNew.symProps)

    // FEEDER CLOSURE: the set of predicates whose facts can (through any
    // chain of rdfs7 subproperty steps and inverse/symmetric flips) become
    // facts of a target predicate. Vocabulary-sized driver fixpoint; sp is
    // already transitively closed, but sp and ib compose (r ⊑ q, inv(q)=p),
    // so the closure iterates to quiescence.
    def feederClosure(targets: Set[Long]): Set[Long] = {
      val sps = (spOld ++ spNew).map(p => (idOf(p._1), idOf(p._2)))
      val ibs = (ibOld ++ ibNew).map(p => (idOf(p._1), idOf(p._2)))
      var f = targets
      var grown = true
      while (grown) {
        val next = f ++ sps.collect { case (p, q) if f(q) => p } ++
          ibs.flatMap { case (p, q) => if (f(p) || f(q)) Seq(p, q) else Nil }
        grown = next.size > f.size
        f = next
      }
      f
    }
    def restrictionMintsInto(closureF: Set[Long]): Boolean =
      (vOld.restrictions ++ vNew.restrictions).exists(r => closureF(idOf(r._2)))

    // (FP/IFP handling moved below the feeder-state definitions — the minted-
    // pair machinery needs the materializer grammar.)

    // Transitive reachability is non-local. The delta-cone pass handles a
    // transitive property t touched directly OR through a FEEDER partition —
    // any predicate whose facts become t-edges through a chain of rdfs7
    // subproperty steps (parity kept) and inverse/symmetric flips (parity
    // flipped). The cone then runs over t's EFFECTIVE base edge set: the
    // union of the feeder partitions' explicit rows, translated per the
    // path's parity. Still recompute: schema deltas that alter a feeder
    // structure, restrictions minting into the cone, rdf:type in the cone,
    // sameAs classes overlapping the effective partitions (substituted edge
    // copies would be invisible to the translation).
    // collectVocab2 shares ONE characteristic-marker scan between the views
    // (vOld.transProps == vNew.transProps == the NEW table's truth), so the
    // OLD transitive set is derived from the mark delta: for each touched
    // property, one pruned probe of the OLD explicit view decides whether a
    // mark copy predated the delta (re-asserts and multi-graph copies keep
    // the schema unchanged). Untouched properties carry over from the new
    // view. A newly-transitive property gets statesOld = ∅ (all its effective
    // edges are bulk-ADDED); a de-declared one gets statesNew = ∅ (reach
    // collapses, rederive keeps the rdfs7/inverse copies that remain
    // derivable).
    val transNewIdSet = vNew.transProps.map(idOf).toSet
    val (transOldIdSet, oldOnlyTransRows): (Set[Long], Array[Row]) =
      if (markRows.isEmpty) (transNewIdSet, Array.empty[Row])
      else {
        val touched = markRows.map(_.getStruct(3)).map(idOf).distinct
        val oldHas = t("mark-old-probe")(oldExp
          .filter(col("p_id") === typeId && col("o")("id") === transitiveId &&
            col("s")("id").isin(touched: _*))
          .select(col("s")("id")).distinct().collect().map(_.getLong(0)).toSet)
        val oldIds = (transNewIdSet -- touched) ++ touched.filter(oldHas)
        val rows = markRows.map(_.getStruct(3))
          .filter(r => oldIds(idOf(r)) && !transNewIdSet(idOf(r)))
          .map(r => idOf(r) -> r).toMap.values.toArray
        (oldIds, rows)
      }
    val transIds = transNewIdSet ++ transOldIdSet
    if (transIds.nonEmpty) {
      val cone = feederClosure(transIds) // includes transIds
      // r14: sp/inverseOf SCHEMA deltas into the cone no longer recompute —
      // the state-diff below treats a feeder partition whose (pid, parity)
      // state appears/disappears as a bulk effective-edge delta (its rows
      // enter deltaT/remPairs wholesale), so the same reachability
      // maintenance covers ontology edits on a live store. Restrictions
      // minting into the cone and rdf:type cones still recompute.
      if (restrictionMintsInto(cone)) return None
      if (cone(typeId)) return None
    }
    // (source pid, flipped) states whose explicit rows are base edges of t.
    // NOT a free backward closure: closure() materializes t-edges in a FIXED
    // stage order — rdfs7 over EXPLICIT rows only, then one inverseOf flip
    // over (explicit ∪ rdfs7 output), then one symmetric flip of t's own
    // accumulated edges. The materialized feeder grammar is therefore
    // sp* → inv? → sym(t)?. A flip BEFORE an rdfs7 copy (a symmetric feeder
    // under a subPropertyOf chain, or q inverseOf p with p ⊑ t) produces NO
    // t-edge in the materializer; admitting such states would feed phantom
    // effective edges into the delta cone and break the delta-vs-recompute
    // invariant. Enumerated exactly; driver-side, schema-sized. Computed
    // under BOTH schema views: an sp/inverseOf delta that adds or removes a
    // state turns that partition's rows into a bulk effective-edge delta
    // (see the cone's statesAdd/statesRem arms).
    def feederStatesOf(t0: Long, spC: Seq[(Row, Row)], invArr: Array[(Row, Row)],
                       syms: Array[Row]): Set[(Long, Boolean)] = {
      val sps = spC.map(p => (idOf(p._1), idOf(p._2))).filter(p => p._1 != p._2)
      // inverseOf pairs ONLY (both directions): symmetric is a separate,
      // LATER stage in closure() and is handled as the final flip below —
      // treating a symProp self-pair as an inverse step here would mint the
      // phantom flip-then-rdfs7 paths this enumeration exists to exclude
      val invs = (invArr ++ invArr.map(_.swap))
        .map(p => (idOf(p._1), idOf(p._2))).toSet
      def spInto(r: Long): Set[Long] =
        sps.collect { case (p, q) if q == r => p }.toSet
      val straight: Set[(Long, Boolean)] =
        (spInto(t0) + t0).map(p => (p, false))
      val flipped: Set[(Long, Boolean)] =
        invs.collect { case (p, q) if q == t0 => p }
          .flatMap(p => spInto(p) + p).map(p => (p, true))
      val base = straight ++ flipped
      if (syms.exists(r => idOf(r) == t0))
        base ++ base.map { case (p, f) => (p, !f) }
      else base
    }
    def feederStates(t0: Long): Set[(Long, Boolean)] =
      feederStatesOf(t0, spNew, vNew.inv, vNew.symProps)
    def feederStatesOld(t0: Long): Set[(Long, Boolean)] =
      feederStatesOf(t0, spOld, vOld.inv, symOldRows)

    // ---- FP/IFP (r16): minted-pair deltas ride the sameAs class diff ----
    // The rules derive owl:sameAs from two facts of a functional property
    // ((x p y),(x p z) → y sameAs z; IFP the mirror). Their entire effect on
    // the entailment set flows THROUGH the equivalence classes, and the
    // at-rest sameAs partition already encodes the OLD classes (closure()
    // materializes all pairs, minted or explicit). So a delta that
    // re-declares FP/IFP marks or lands facts in an FP/IFP property's feeder
    // partitions no longer recomputes: the NEW minted pairs (premise frames
    // translated per the materializer grammar, exactly the transitive cone's
    // discipline) join the explicit pairs as class-connectivity inputs, and
    // the existing class diff (saDelta Case B) derives the lost/new pairs and
    // their substitution cascades. What still recomputes: rdf:type or
    // restriction outputs feeding the premise cone, transitive pairs in the
    // cone (premises would include fixpoint output), trans/sym re-declarations
    // on cone members, and sp/inverseOf schema deltas into the cone (the
    // premise translation below is computed under the NEW view only).
    val fpNewIds = vNew.funcProps.map(idOf).toSet
    val fpOldIds = funcOldRows.map(idOf).toSet
    val ifpNewIds = vNew.invFuncProps.map(idOf).toSet
    val ifpOldIds = invFuncOldRows.map(idOf).toSet
    val fpBase = fpNewIds ++ fpOldIds ++ ifpNewIds ++ ifpOldIds
    val fpMarksChanged =
      fpNewIds != fpOldIds || ifpNewIds != ifpOldIds
    var fpFeederTouched = false
    if (fpBase.nonEmpty) {
      val fpCone = feederClosure(fpBase)
      if (fpCone(typeId)) return None
      if (restrictionMintsInto(fpCone)) return None
      if ((vOld.transProps ++ vNew.transProps).exists(r => fpCone(idOf(r))) ||
          markRows.exists(r => (r.getLong(2) == transitiveId ||
            r.getLong(2) == symmetricId) && fpCone(idOf(r.getStruct(3)))))
        return None
      if (minus(spOld, spNew).exists(p => fpCone(idOf(p._2))) ||
          minus(spNew, spOld).exists(p => fpCone(idOf(p._2)))) return None
      if (minus(ibOld, ibNew).exists(p => fpCone(idOf(p._1)) || fpCone(idOf(p._2))) ||
          minus(ibNew, ibOld).exists(p => fpCone(idOf(p._1)) || fpCone(idOf(p._2))))
        return None
      fpFeederTouched = fpBase.exists(p =>
        feederStates(p).exists(s => deltaPids(s._1)))
      // plan-width valve on the minted-pair premise scans (cf. the transitive
      // cone's 256-state valve) — applies whenever the class diff will run
      // and therefore compute the minted pairs
      if ((fpMarksChanged || fpFeederTouched || saTouched) &&
          fpBase.iterator.map(p => feederStates(p).size).sum > 64)
        return None
    }
    // the class diff must re-run whenever FP/IFP minting may have changed
    val fpClassWork = fpBase.nonEmpty && (fpMarksChanged || fpFeederTouched)
    // inferred sameAs rows can only stem from explicit sameAs (guarded via
    // expHasSameAs/saTouched) or FP/IFP minting — probe only when FP vocab
    // exists, pruned to the sameAs partition
    val infHasSameAs = fpBase.nonEmpty && t("inf-sameas-probe")(
      !inf.filter(col("p_id") === sameAsId).limit(1).isEmpty)
    val saPresent = expHasSameAs || saTouched || infHasSameAs || fpClassWork

    /** FP/IFP-minted sameAs id pairs under the NEW view over the NEW facts,
      * plus a term dictionary for the minted endpoints (they may never have
      * appeared in a sameAs partition). Premise frames follow closure()'s
      * materialization: feeder partitions translated per parity, flips drop
      * literal objects (dInv2/dSym), FP keys on subject and requires resource
      * objects, IFP keys on object. Pruned to the feeder partitions.
      */
    def mintedNewPairs(): (DataFrame, DataFrame) = {
      val fams = Seq((fpNewIds, true), (ifpNewIds, false))
      val parts = fams.flatMap { case (pids, isFp) =>
        pids.toSeq.flatMap { p =>
          feederStates(p).toSeq.map { case (src, flip) =>
            val part = newExp.filter(col("p_id") === src)
            val eff =
              if (!flip) part.select(col("s"), col("o"))
              else part.filter(col("o")("kind") =!= Term.KIND_LITERAL)
                .select(col("o").as("s"), col("s").as("o"))
            val f = if (isFp)
              eff.filter(col("o")("kind") =!= Term.KIND_LITERAL)
                .select(col("s")("id").as("k"), col("o").as("v"))
            else eff.select(col("o")("id").as("k"), col("s").as("v"))
            f.select(lit(p).as("__fp"), col("k"), col("v"))
          }
        }
      }
      if (parts.isEmpty) {
        val e = newExp.select(col("s")("id").as("a"), col("o")("id").as("b"))
          .filter(lit(false))
        return (e, newExp.select(col("s")("id").as("nid"), col("s").as("n"))
          .filter(lit(false)))
      }
      val f = parts.reduce(_.unionByName(_)).withColumn("vid", col("v")("id"))
      val keys = f.select("__fp", "k", "vid")
        .dropDuplicates("__fp", "k", "vid").localCheckpoint()
      val pairs = keys.join(keys.withColumnRenamed("vid", "vid2"), Seq("__fp", "k"))
        .filter(col("vid") =!= col("vid2"))
        .select(col("vid").as("a"), col("vid2").as("b"))
        .dropDuplicates("a", "b")
      val dict = f.select(col("vid").as("nid"), col("v").as("n"))
        .dropDuplicates("nid")
      (pairs, dict)
    }
    // touched = a data delta lands in an (old or new) feeder partition, OR
    // the schema delta changed the state set itself (ontology edit)
    val transStates: Map[Long, (Set[(Long, Boolean)], Set[(Long, Boolean)])] =
      transIds.iterator.map(t0 => t0 -> ((
          if (transNewIdSet(t0)) feederStates(t0) else Set.empty[(Long, Boolean)],
          if (transOldIdSet(t0)) feederStatesOld(t0) else Set.empty[(Long, Boolean)])))
        .filter { case (_, (sn, so)) =>
          (sn ++ so).exists(s => deltaPids(s._1)) || sn != so }
        .toMap
    val transTouched: Set[Long] = transStates.keySet
    // plan-width valve: each state is a pruned-partition scan in the
    // effective-edge union — a pathological schema fans out past it
    if (transStates.valuesIterator.map(p => (p._1 ++ p._2).size).sum > 256)
      return None
    // a touched transitive property whose EFFECTIVE partitions' nodes
    // intersect the sameAs classes breaks the translation's explicit-rows
    // assumption (substituted edge copies live as entailments) → recompute.
    // DISJOINT classes compose fine — gated on one pruned overlap probe.
    if (saPresent && transTouched.nonEmpty) {
      val effPids = transStates.valuesIterator
        .flatMap(p => p._1 ++ p._2).map(_._1).toSeq.distinct
      val tNodes = next.statements.filter(col("p_id").isin(effPids: _*))
        .select(col("s")("id").as("n"))
        .unionByName(next.statements.filter(col("p_id").isin(effPids: _*))
          .select(col("o")("id").as("n")))
        .unionByName(removed.filter(col("p")("id").isin(effPids: _*))
          .select(col("s")("id").as("n")))
        .unionByName(removed.filter(col("p")("id").isin(effPids: _*))
          .select(col("o")("id").as("n")))
      val saMembers = next.statements.filter(col("p_id") === sameAsId)
        .select(col("s")("id").as("n"))
        .unionByName(removed.filter(col("p")("id") === sameAsId)
          .select(col("s")("id").as("n")))
      if (t("sa-trans-overlap")(
          !tNodes.join(saMembers, Seq("n"), "left_semi").limit(1).isEmpty))
        return None
    }

    // ---- schema-closure diffs (driver-side, vocabulary-sized) ----
    val dScDel = minus(scOld, scNew); val dScAdd = minus(scNew, scOld)
    val dSpDel = minus(spOld, spNew); val dSpAdd = minus(spNew, spOld)
    val dDomDel = minus(vOld.dom.toSeq, vNew.dom.toSeq)
    val dDomAdd = minus(vNew.dom.toSeq, vOld.dom.toSeq)
    val dRngDel = minus(vOld.rng.toSeq, vNew.rng.toSeq)
    val dRngAdd = minus(vNew.rng.toSeq, vOld.rng.toSeq)
    val dIbDel = minus(ibOld, ibNew); val dIbAdd = minus(ibNew, ibOld)

    // derived schema STATEMENTS (rdfs5/11 + eq swaps) lost/gained outright: the
    // new closures are already transitively complete, so no re-derivation check
    def schemaStmts(sc2: Seq[(Row, Row)], sp2: Seq[(Row, Row)],
                    eqcSwap: Seq[(Row, Row)], eqpSwap: Seq[(Row, Row)]): DataFrame = {
      def f(ps: Seq[(Row, Row)], pred: String) =
        pairsDf(spark, ps, "s", "o")
          .select(col("s"), Term.iri(pred).as("p"), col("o"))
      f(sc2, Term.RDFS_SUBCLASSOF)
        .unionByName(f(sp2, Term.RDFS_SUBPROPERTYOF))
        .unionByName(f(eqcSwap, OWL_EQCLASS))
        .unionByName(f(eqpSwap, OWL_EQPROP))
    }
    val lostSchemaStmts = schemaStmts(dScDel, dSpDel,
      minus(vOld.eqc.map(_.swap).toSeq, vNew.eqc.map(_.swap).toSeq),
      minus(vOld.eqp.map(_.swap).toSeq, vNew.eqp.map(_.swap).toSeq))
    val newSchemaStmts = schemaStmts(dScAdd, dSpAdd,
      minus(vNew.eqc.map(_.swap).toSeq, vOld.eqc.map(_.swap).toSeq),
      minus(vNew.eqp.map(_.swap).toSeq, vOld.eqp.map(_.swap).toSeq))

    def keyed(df: DataFrame): DataFrame = df
      .withColumn("__sk", col("s")("id")).withColumn("__pk", col("p")("id"))
      .withColumn("__ok", col("o")("id"))
    def dedupK(df: DataFrame): DataFrame =
      keyed(df).dropDuplicates("__sk", "__pk", "__ok").drop("__sk", "__pk", "__ok")

    // ---- over-delete: suspects = delta-tainted derivations under the OLD schema
    // old facts = (remaining ∪ removed); the pre-update lazy plan is never touched
    val oldFacts = exp.select(col("s"), col("p"), col("o"), col("p_id"))
      .unionByName(inf.select(col("s"), col("p"), col("o"), col("p_id")))
      .unionByName(removed.select(col("s"), col("p"), col("o"),
        col("p")("id").as("p_id")))

    // ---- transitive delta cone (touched transitive properties) ----
    // EXACT per-property reachability maintenance in id space over the
    // EFFECTIVE base edge set (feeder partitions translated per parity).
    // Affected sources X = nodes that can reach a delta edge's tail (backward
    // BFS over new∪removed effective edges); a forward BFS from X over the
    // NEW effective edges yields their exact new reach. Then
    //   lost     = inferred pairs from X not in the new reach
    //   new      = new-reach pairs that did not previously hold
    //   promoted = removed explicit t-edges still in the new reach
    //   reach    = returned for suspect retention (a rule-arm t-suspect in
    //              the new reach is derivable by transitivity)
    // Everything prunes to the effective partitions; frontiers are cone-sized
    // and checkpointed — the shape of seededPathIds, keyed by p_id.
    val (lostTransSpo, newTransSpo, promTransSpo, transReach) =
      if (transTouched.isEmpty) (None, None, None, None)
      else t("trans-cone") {
        val tSeq = transTouched.toSeq
        val statesNewL = transStates.toSeq.flatMap { case (t0, (sn, _)) =>
          sn.toSeq.map(s => (t0, s._1, s._2)) }
        val statesOldL = transStates.toSeq.flatMap { case (t0, (_, so)) =>
          so.toSeq.map(s => (t0, s._1, s._2)) }
        // schema-delta state diff: a state present only in the NEW view makes
        // that partition's surviving rows bulk-ADDED effective edges; only in
        // the OLD view, bulk-REMOVED (rows unchanged, their translation gone)
        val statesAdd = (statesNewL.toSet -- statesOldL.toSet).toSeq
        val statesRem = (statesOldL.toSet -- statesNewL.toSet).toSeq
        val srcAll = (statesNewL ++ statesOldL).map(_._2).distinct
        def ckpt(df: DataFrame): DataFrame = df.localCheckpoint()
        // effective translation: each (t, src, flip) state contributes src's
        // rows — flipped when the feeder path's inverse-parity is odd — as
        // t-edges; paths of mixed feeder edges compose under t's transitivity
        def effOver(sts: Seq[(Long, Long, Boolean)])(idsDf: DataFrame): DataFrame =
          if (sts.isEmpty) idsDf.select(col("p_id"), col("a"), col("b")).filter(lit(false))
          else sts.map { case (t0, src, flip) =>
            val part = idsDf.filter(col("p_id") === src)
            if (!flip) part.select(lit(t0).as("p_id"), col("a"), col("b"))
            else part.select(lit(t0).as("p_id"), col("b").as("a"),
              col("a").as("b"))
          }.reduce(_.unionByName(_)).dropDuplicates("p_id", "a", "b")
        def effT(idsDf: DataFrame): DataFrame = effOver(statesNewL)(idsDf)
        def expAB(pids: Seq[Long]): DataFrame =
          exp.filter(col("p_id").isin(pids: _*))
            .select(col("p_id"), col("s")("id").as("a"), col("o")("id").as("b"))
        def remAB(pids: Seq[Long]): DataFrame =
          removed.filter(col("p")("id").isin(pids: _*))
            .select(col("p")("id").as("p_id"), col("s")("id").as("a"),
              col("o")("id").as("b"))
        val eNew = ckpt(effT(expAB(statesNewL.map(_._2).distinct)))
        val oldT = oldFacts.filter(col("p_id").isin(tSeq: _*))
          .select(col("p_id"), col("s")("id").as("a"), col("o")("id").as("b"))
          .dropDuplicates("p_id", "a", "b")
        val deltaT = effT(delta0.filter(col("p")("id").isin(srcAll: _*))
          .select(col("p")("id").as("p_id"), col("s")("id").as("a"),
            col("o")("id").as("b")))
          .unionByName(effOver(statesAdd)(expAB(statesAdd.map(_._2).distinct)))
          .unionByName(effOver(statesRem)(
            expAB(statesRem.map(_._2).distinct)
              .unionByName(remAB(statesRem.map(_._2).distinct))))
        val dTails = ckpt(deltaT.select(col("p_id"), col("a").as("b")).distinct())
        // remPairs feeds ONLY the backward-BFS edge superset (old ∪ new):
        // data-removed rows under the new states, plus whole partitions whose
        // state was schema-removed (their translated edges were in the old
        // graph and are absent from eNew)
        val remPairs = effT(remAB(srcAll))
          .unionByName(effOver(statesRem)(
            expAB(statesRem.map(_._2).distinct)
              .unionByName(remAB(statesRem.map(_._2).distinct))))
        // Affected sources X are computed by ONE backward BFS over
        // eNew ∪ removedPairs — a superset of both the old and the new edge
        // sets (an old edge either survived into eNew or was purged into the
        // removed buffer), so the ancestor set over-approximates both graphs;
        // extra sources only cost forward-BFS work, the final reach stays
        // exact (it runs on eNew alone).
        import org.apache.spark.sql.types.{LongType, StructField, StructType}
        val nodeT = StructType(Seq(StructField("p_id", LongType),
          StructField("n", LongType)))
        val pairT = StructType(Seq(StructField("p_id", LongType),
          StructField("x", LongType), StructField("y", LongType)))
        // DRIVER FAST PATH: a targeted retraction's pruned edge partition is
        // usually driver-bounded; collecting it turns ~2·diameter iteration
        // JOBS into zero (the sf0.1→x10 A/B showed fixed job overhead, not
        // data volume, dominating the distributed loop: 9.3M rows read but
        // 76 s wall). Distributed loops remain for partitions past the bound.
        val eCnt = eNew.count()
        // -Dgraft.tm.cone.driverMax overrides the collect bound (tests set 0
        // to force the distributed loops; default 2M edges)
        val driverMax = tmProp("graft.tm.cone.driverMax")
          .map(_.toLong).getOrElse(2000000L)
        val driverBfs: Option[(DataFrame, DataFrame)] =
          if (eCnt > driverMax) None else {
            val eArr = eNew.collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
            val remArr = remPairs.collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
            val tails = dTails.collect().map(r => (r.getLong(0), r.getLong(1)))
            val revAll = (eArr ++ remArr).groupBy(e => (e._1, e._3))
              .map { case (k, es) => k -> es.map(_._2) }
            val xs = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
            var bfr: Seq[(Long, Long)] = tails.toSeq.distinct
            bfr.foreach(xs += _)
            while (bfr.nonEmpty) {
              bfr = bfr.flatMap { case (p, n) =>
                revAll.getOrElse((p, n), Array.empty[Long]).map(a => (p, a)) }
                .distinct.filterNot(xs)
              bfr.foreach(xs += _)
            }
            // per-source forward BFS is O(|X|·E) worst case — keep it on the
            // driver only for small source sets; larger cones go distributed
            if (xs.size > 20000) None else {
              val fwd = eArr.groupBy(e => (e._1, e._2))
                .map { case (k, es) => k -> es.map(_._3) }
              // packed primitive (p,x,y) triples — ~24 B/pair vs ~120 B for
              // Row objects — with the cap derived from the heap actually
              // free RIGHT NOW (≤1/8 of it), so the valve bounds memory
              // consumed, not just pair count: modest driver configs no
              // longer OOM at the threshold
              val rt = Runtime.getRuntime
              val heapRoom = (rt.maxMemory - (rt.totalMemory - rt.freeMemory)) / 8 / 24
              val pairCap = math.min(10000000L, math.max(1000000L, heapRoom))
              val reachB = scala.collection.mutable.ArrayBuffer.empty[Long]
              var overflow = false
              xs.foreach { case (p, x) =>
                if (!overflow) {
                  val seen = scala.collection.mutable.HashSet.empty[Long]
                  var fr: Seq[Long] =
                    fwd.getOrElse((p, x), Array.empty[Long]).toSeq.distinct
                  fr.foreach(seen += _)
                  while (fr.nonEmpty && !overflow) {
                    fr = fr.flatMap(m => fwd.getOrElse((p, m), Array.empty[Long]))
                      .distinct.filterNot(seen)
                    fr.foreach(seen += _)
                    if (reachB.size / 3 + seen.size > pairCap) overflow = true
                  }
                  seen.foreach { y => reachB += p; reachB += x; reachB += y }
                }
              }
              if (overflow) None
              else {
                val packed = reachB.toArray
                val nPairs = packed.length / 3
                // ship the packed array ONCE per executor (broadcast), mint
                // Rows distributed — the driver never holds Row objects
                val bc = spark.sparkContext.broadcast(packed)
                val pairsRdd = spark.sparkContext
                  .parallelize(0 until nPairs, (nPairs / 500000 + 1))
                  .map(i => Row(bc.value(3 * i), bc.value(3 * i + 1),
                    bc.value(3 * i + 2)))
                Some((
                  spark.createDataFrame(spark.sparkContext.parallelize(
                    xs.toSeq.map { case (p, n) => Row(p, n) }, 1), nodeT),
                  spark.createDataFrame(pairsRdd, pairT)))
              }
            }
          }
        val (xSrc, reach) = driverBfs.getOrElse {
          val eAll = ckpt(eNew.unionByName(remPairs)
            .dropDuplicates("p_id", "a", "b"))
          var backAcc = dTails.select(col("p_id"), col("b").as("n")).distinct()
          var backFrontier = backAcc
          var nb = backFrontier.count()
          while (nb > 0) {
            backFrontier = ckpt(eAll
              .join(backFrontier.select(col("p_id"), col("n").as("b")),
                Seq("p_id", "b"), "left_semi")
              .select(col("p_id"), col("a").as("n")).distinct()
              .join(backAcc, Seq("p_id", "n"), "left_anti"))
            nb = backFrontier.count()
            if (nb > 0) backAcc = backAcc.unionByName(
              graft.engine.DfOps.reid(backFrontier))
          }
          val xS = ckpt(backAcc.dropDuplicates("p_id", "n"))
          // forward BFS: exact new reach of every affected source
          var rch = ckpt(eNew
            .join(xS.select(col("p_id"), col("n").as("a")),
              Seq("p_id", "a"), "left_semi")
            .select(col("p_id"), col("a").as("x"), col("b").as("y")))
          var frontier = rch
          var nf = frontier.count()
          while (nf > 0) {
            frontier = ckpt(frontier.select(col("p_id"), col("x"), col("y").as("a"))
              .join(eNew, Seq("p_id", "a"))
              .select(col("p_id"), col("x"), col("b").as("y")).distinct()
              .join(rch, Seq("p_id", "x", "y"), "left_anti"))
            nf = frontier.count()
            if (nf > 0) rch = rch.unionByName(graft.engine.DfOps.reid(frontier))
          }
          (xS, rch)
        }
        // id → term dictionary from the effective partitions (old view:
        // includes removed rows' nodes — a fresh reach pair may involve nodes
        // seen only in a feeder partition); property terms are vocabulary-side
        val tNodes = oldFacts.filter(
          col("p_id").isin((tSeq ++ srcAll).distinct: _*))
        val dict = ckpt(tNodes.select(col("s").as("n"))
          .unionByName(tNodes.select(col("o").as("n")))
          .withColumn("nid", col("n")("id")).dropDuplicates("nid"))
        val transRows = (vOld.transProps ++ vNew.transProps ++ oldOnlyTransRows)
          .filter(r => transTouched(idOf(r)))
          .map(r => idOf(r) -> r).toMap.values.toSeq
        val pDict = pairsDf(spark, transRows.map(r => (r, r)), "pt", "pt2")
          .select(col("pt")("id").as("p_id"), col("pt").as("pterm"))
          .dropDuplicates("p_id")
        def toSpo(ids: DataFrame): DataFrame = ids
          .join(dict.select(col("nid").as("x"), col("n").as("s")), Seq("x"))
          .join(dict.select(col("nid").as("y"), col("n").as("o")), Seq("y"))
          .join(broadcast(pDict), Seq("p_id"))
          .select(col("s"), col("pterm").as("p"), col("o"))
        val infT = inf.filter(col("p_id").isin(tSeq: _*))
          .select(col("p_id"), col("s")("id").as("x"), col("o")("id").as("y"))
        val lostIds = infT
          .join(xSrc.select(col("p_id"), col("n").as("x")),
            Seq("p_id", "x"), "left_semi")
          .join(reach, Seq("p_id", "x", "y"), "left_anti")
        val newIds = reach.join(
          oldT.select(col("p_id"), col("a").as("x"), col("b").as("y")),
          Seq("p_id", "x", "y"), "left_anti")
        val remT = removed.filter(col("p")("id").isin(tSeq: _*))
          .select(col("s"), col("p"), col("o"),
            col("p")("id").as("p_id"), col("s")("id").as("x"),
            col("o")("id").as("y"))
          .join(reach, Seq("p_id", "x", "y"), "left_semi")
          .select(col("s"), col("p"), col("o"))
        (Some(ckpt(toSpo(lostIds))), Some(ckpt(toSpo(newIds))),
          Some(ckpt(remT.dropDuplicates())), Some(reach))
      }
    // cone-size safety valve: the suspect machinery broadcasts the lost set —
    // a hub-edge delete whose cone approaches corpus scale is better served
    // by the recompute than by a corpus-sized broadcast. The frames are
    // already checkpointed; the counts are metadata-cheap.
    if (lostTransSpo.exists(_.count() + newTransSpo.get.count() > 10000000L))
      return None

    // ---- sameAs delta state (materialized equivalence classes) ----
    // Case A — the delta never touches sameAs: classes are unchanged, and the
    // at-rest sameAs partition IS the exact all-pairs alias map (the closure
    // materializes all pairs of every class); the substitution arms in
    // deltaDerive/rederive read it directly — O(delta) joins, no class work.
    // Case B — the delta adds/removes sameAs edges: rebuild the classes from
    // the NEW explicit pairs (driver union-find over the collected partition,
    // bounded like the transitive cone's fast path), diff the all-pairs sets,
    // and treat lost/new pairs like lost/new transitive reach: member-fact
    // substitutions through the LOST aliases become suspects; substitutions
    // onto the NEW aliases become conclusions + forward taint. The reference
    // computes the same retraction with per-statement proof chains
    // (RDF/inf/TruthMaintenance.java:1); at rest in columnar storage the
    // class diff + substitution joins replace the proofs.
    val saDelta: Option[SaDelta] =
      if (!saPresent) None
      else if (!saTouched && !fpClassWork) {
        // Case A: classes unchanged (no sameAs-edge delta, no FP/IFP minting
        // change) — the at-rest partition IS the alias map, whether its pairs
        // came from explicit edges or FP/IFP minting
        val alias = next.statements.filter(col("p_id") === sameAsId)
          .select(col("s")("id").as("xid"), col("o").as("alias"))
        Some(SaDelta(alias, alias, None, None, None, None))
      } else {
        val saCur = next.statements.filter(col("p_id") === sameAsId)
        val remSaRows = removed.filter(col("p")("id") === sameAsId)
        val remSaIds = remSaRows
          .select(col("s")("id").as("a"), col("o")("id").as("b"))
          .dropDuplicates("a", "b")
        // the OLD pair view: current partition (post-mutation) minus the
        // edges THIS delta added, plus the ones it removed. An added edge
        // coinciding with a previously-inferred pair is harmlessly excluded —
        // it then shows up in dAdd and novelty drops its re-derivations.
        val addSaIds = added.filter(col("p")("id") === sameAsId)
          .select(col("s")("id").as("a"), col("o")("id").as("b"))
          .dropDuplicates("a", "b")
        val oldIdsDf = saCur
          .select(col("s")("id").as("a"), col("o")("id").as("b"))
          .join(addSaIds, Seq("a", "b"), "left_anti")
          .unionByName(remSaIds).dropDuplicates("a", "b")
        // NEW-view class connectivity: explicit pairs ∪ FP/IFP-minted pairs
        // (the minted endpoints' terms extend the dictionary below — they may
        // never have appeared in a sameAs partition before)
        val minted: Option[(DataFrame, DataFrame)] =
          if (fpBase.isEmpty) None else Some(mintedNewPairs())
        val newExpIdsDf = (exp.filter(col("p_id") === sameAsId)
          .select(col("s")("id").as("a"), col("o")("id").as("b"))
          +: minted.map(_._1).toSeq)
          .reduce(_.unionByName(_))
          .dropDuplicates("a", "b")
        import org.apache.spark.sql.types.{LongType, StructField, StructType}
        val pairT = StructType(Seq(StructField("a", LongType), StructField("b", LongType)))
        def idPairs(ps: Seq[(Long, Long)]): DataFrame = spark.createDataFrame(
          spark.sparkContext.parallelize(ps.map(p => Row(p._1, p._2)),
            (ps.size / 500000 + 1)), pairT)
        // DRIVER FAST PATH up to `cap` rows per pair frame: collected arrays +
        // union-find (one probe job, zero shuffles). Past the cap — plain data
        // growth, e.g. an all-pairs partition of a few thousand-member classes
        // — the SAME class diff runs distributed: pointer-jumping CC over the
        // explicit pairs (gas/Gas.connectedComponents), all-pairs as a
        // per-class self-join, diffs as anti/semi joins. The recompute is no
        // longer the fallback for sheer class size; only the all-pairs
        // ESTIMATE blowing past its own valve (a mega-class whose pair set
        // approaches corpus scale) still routes there.
        // -Dgraft.tm.sa.driverMax overrides the collect bound (tests set 0 to
        // force the distributed class diff)
        val cap = tmProp("graft.tm.sa.driverMax")
          .map(_.toInt).getOrElse(2000000)
        val (oldArr, newArr, remArr) = t("sa-collect")((
          oldIdsDf.limit(cap + 1).collect().map(r => (r.getLong(0), r.getLong(1))),
          newExpIdsDf.limit(cap + 1).collect().map(r => (r.getLong(0), r.getLong(1))),
          remSaIds.limit(cap + 1).collect().map(r => (r.getLong(0), r.getLong(1)))))
        val driverFits =
          oldArr.length <= cap && newArr.length <= cap && remArr.length <= cap
        // (dDelDf, dAddDf, promDf, nDel, nAdd, nProm, lost-side member heads)
        val (dDelDf, dAddDf, promDf, nDel, nAdd, nProm, mIdsOpt) =
          if (driverFits) {
            // union-find over the new explicit pairs → components → all-pairs
            val parent = scala.collection.mutable.HashMap.empty[Long, Long]
            def find(x: Long): Long = {
              var r = x
              while (parent.getOrElse(r, r) != r) r = parent(r)
              var c = x
              while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
              r
            }
            newArr.foreach { case (a, b) =>
              val ra = find(a); val rb = find(b); if (ra != rb) parent(ra) = rb
            }
            val membersByRoot = newArr.flatMap(p => Seq(p._1, p._2)).distinct
              .groupBy(find)
            val nPairs = membersByRoot.valuesIterator
              .map(ms => ms.length.toLong * (ms.length - 1)).sum
            if (nPairs > 4000000L) return None // driver all-pairs blowup → recompute
            val newAll = membersByRoot.valuesIterator.flatMap(ms =>
              for (x <- ms.iterator; y <- ms if x != y) yield (x, y)).toSet
            val oldPairs = oldArr.toSet
            val dDel = (oldPairs diff newAll).toSeq
            val dAdd = (newAll diff oldPairs).toSeq
            val promPairs = remArr.filter(newAll).toSeq
            (idPairs(dDel), idPairs(dAdd), idPairs(promPairs),
              dDel.size.toLong, dAdd.size.toLong, promPairs.size.toLong,
              Some(dDel.map(_._1).distinct))
          } else t("sa-dist-cc") {
            val comps = graft.gas.Gas.connectedComponents(
              newExpIdsDf.select(col("a").as("src"), col("b").as("dst")))
            val members = comps
              .select(col("component").as("__c"), col("vertex").as("nid"))
            // pair-count valve on the ESTIMATE (Σ size²) before the self-join
            // mints a quadratic frame; -Dgraft.tm.sa.pairCap overrides
            val pairCap = tmProp("graft.tm.sa.pairCap")
              .map(_.toLong).getOrElse(64000000L)
            val est = members.groupBy("__c").count()
              .agg(sum(col("count") * col("count")).as("e"))
              .head().getAs[Long]("e")
            if (est > pairCap) return None
            val newAllDf = members.join(
                members.withColumnRenamed("nid", "nid2"), Seq("__c"))
              .filter(col("nid") =!= col("nid2"))
              .select(col("nid").as("a"), col("nid2").as("b"))
              .localCheckpoint()
            val dDelDf0 = oldIdsDf.join(newAllDf, Seq("a", "b"), "left_anti")
              .localCheckpoint()
            val dAddDf0 = newAllDf.join(oldIdsDf, Seq("a", "b"), "left_anti")
              .localCheckpoint()
            val promDf0 = remSaIds.join(newAllDf, Seq("a", "b"), "left_semi")
              .localCheckpoint()
            (dDelDf0, dAddDf0, promDf0,
              dDelDf0.count(), dAddDf0.count(), promDf0.count(), None)
          }
        // id → term dictionary from the sameAs partitions (old view), plus
        // the FP/IFP-minted endpoints' terms from the premise scan
        val saNodes = (saCur.select(col("s").as("n"))
          .unionByName(saCur.select(col("o").as("n")))
          .unionByName(remSaRows.select(col("s").as("n")))
          .unionByName(remSaRows.select(col("o").as("n")))
          .withColumn("nid", col("n")("id"))
          +: minted.map(_._2.select(col("n"), col("nid"))).toSeq)
          .map(_.select(col("n"), col("nid")))
          .reduce(_.unionByName(_))
          .dropDuplicates("nid").localCheckpoint()
        def toSpo(ids: DataFrame): DataFrame = ids
          .join(saNodes.select(col("nid").as("a"), col("n").as("s")), Seq("a"))
          .join(saNodes.select(col("nid").as("b"), col("n").as("o")), Seq("b"))
          .select(col("s"), Term.iri(OWL_SAMEAS).as("p"), col("o"))
        def toAlias(ids: DataFrame): DataFrame = ids
          .join(saNodes.select(col("nid").as("b"), col("n").as("alias")), Seq("b"))
          .select(col("a").as("xid"), col("alias"))
        // alias maps: OLD = the materialized all-pairs (plus removed edges —
        // the pre-delete view); NEW = old ∪ added, minus lost (built by
        // delta-sized anti-joins rather than re-materializing all pairs)
        val aliasOld = toAlias(oldIdsDf)
        val aliasNew = toAlias(oldIdsDf.unionByName(dAddDf)
          .dropDuplicates("a", "b")
          .join(dDelDf, Seq("a", "b"), "left_anti"))
        // lost-pair taint: the pair rows themselves + member-fact
        // substitutions through the lost aliases (ONE pruned-by-broadcast
        // pass over the fact table; output is cone-sized)
        val lostTaint =
          if (nDel == 0) None
          else t("sa-lost") {
            val dDelAlias = toAlias(dDelDf).localCheckpoint()
            val aliasOldO = aliasOld.withColumnRenamed("alias", "alias2")
              .withColumnRenamed("xid", "yid")
            // one pre-filtered, committed member-fact slice instead of two
            // full passes when the split classes are small — member facts
            // span every partition, no pruning. Driver path supplies the
            // head ids for free; the distributed path probes bounded.
            val mIds = mIdsOpt.getOrElse(
              dDelDf.select("a").distinct().limit(2049).collect()
                .map(_.getLong(0)).toSeq)
            val f0 =
              if (mIds.size > 2048) oldFacts.filter(col("p_id") =!= sameAsId)
              else graft.engine.DfOps.freshLeaf(
                oldFacts.filter(col("p_id") =!= sameAsId &&
                  (col("s")("id").isin(mIds: _*) ||
                    col("o")("id").isin(mIds: _*))))
            // size-guarded broadcast: a distributed-scale lost-pair set must
            // not be forced through the driver (same 4M-key policy as the
            // mutation paths' hints)
            def hinted(df: DataFrame): DataFrame =
              if (nDel <= 4000000L) broadcast(df) else df
            val subj = f0.join(hinted(dDelAlias), col("s")("id") === col("xid"))
              .select(col("alias").as("s"), col("p"), col("o"))
            val obj = f0.filter(col("o")("kind") =!= Term.KIND_LITERAL)
              .join(hinted(dDelAlias.withColumnRenamed("alias", "alias2")
                .withColumnRenamed("xid", "yid")), col("o")("id") === col("yid"))
              .select(col("s"), col("p"), col("alias2").as("o"))
            // both-sided orbit members whose derivation used a lost pair on
            // EITHER side (over-approximate; re-derivation decides retention)
            val bothA = subj.filter(col("o")("kind") =!= Term.KIND_LITERAL)
              .join(aliasOldO, col("o")("id") === col("yid"))
              .select(col("s"), col("p"), col("alias2").as("o"))
            val bothB = obj.join(aliasOld, col("s")("id") === col("xid"))
              .select(col("alias").as("s"), col("p"), col("o"))
            Some(toSpo(dDelDf).unionByName(subj).unionByName(obj)
              .unionByName(bothA).unionByName(bothB)
              .localCheckpoint())
          }
        val addSpo = if (nAdd == 0) None
          else Some(toSpo(dAddDf).localCheckpoint())
        val addAlias = if (nAdd == 0) None
          else Some(toAlias(dAddDf).localCheckpoint())
        val promSpo = if (nProm == 0) None
          else Some(toSpo(promDf).localCheckpoint())
        Some(SaDelta(aliasOld, aliasNew, lostTaint, addSpo, addAlias, promSpo))
      }

    val removedTaint0 = removed.select(col("s"), col("p"), col("o"))
    val removedTaint = saDelta.flatMap(_.lostTaint) match {
      case Some(lt) => removedTaint0.unionByName(lt)
      case None => removedTaint0
    }
    // lost transitive pairs are POST-TRANSITIVE taint: closure() derives the
    // transitive fixpoint after rdfs7/inverse/hasValue, so their downstream
    // entailments live only in sameAs/dom/rng/rdfs9 — feeding them to the
    // earlier arms would suspect rows the materializer never derived
    val delSuspects = t("delta-derive-del")(deltaDerive(spark, oldFacts, removedTaint,
      scOld, spOld, vOld.dom.toSeq, vOld.rng.toSeq, ibOld, vOld.restrictions,
      dScDel, dSpDel, dDomDel, dRngDel, dIbDel, saDelta.map(_.aliasOld),
      lateTaint = lostTransSpo,
      // old EXPLICIT view for the schema arms (closure premises)
      explicitFacts = Some(exp.select(col("s"), col("p"), col("o"), col("p_id"))
        .unionByName(removed.filter(col("stype") =!= GraftStore.STYPE_INFERRED)
          .select(col("s"), col("p"), col("o"), col("p")("id").as("p_id"))))))
    // The removed rows THEMSELVES are suspects too: an entailment whose
    // materialization was novelty-suppressed by an explicit copy must be
    // PROMOTED to Inferred when that copy is deleted but it stays derivable
    // (the reference's TM re-asserts still-provable retracted statements), and
    // such rows are also the intermediates multi-step re-derivations pass
    // through — without them a suspect supported only via a suppressed
    // entailment would be wrongly lost.
    // the lost transitive pairs themselves enter the suspect set (they are
    // retracted unless the reach retains them); their downstream entailments
    // were suspected via the lateTaint arms above
    val suspects = t("suspects")(graft.engine.DfOps.freshLeaf(
      dedupK(delSuspects.unionByName(lostSchemaStmts)
        .unionByName(removedTaint)
        .unionByName(lostTransSpo.getOrElse(lostSchemaStmts.limit(0))))))
    // mega-cone valve: the suspect keys broadcast into every re-derivation
    // arm — a delta whose taint cone reaches corpus scale (a mega equivalence
    // class, a hub-heavy schema) is better served by the recompute than by a
    // corpus-sized broadcast (count on the checkpointed frame is metadata-cheap)
    // ONE action serves both valves: the mega-cone bound and the emptiness
    // gate below (a separate isEmpty probe was a whole extra job per pass)
    val nSuspects = t("suspects-count")(suspects.count())
    if (nSuspects > 10000000L) return None
    val sKeys = keyed(suspects).select("__sk", "__pk", "__ok")

    // ---- re-derive suspects from (explicit ∪ non-suspect inferred), NEW schema
    val lostKeys = if (nSuspects == 0) sKeys else t("rederive+lost") {
      val keptInf = keyed(inf)
        .join(broadcast(sKeys), Seq("__sk", "__pk", "__ok"), "left_anti")
        .drop("__sk", "__pk", "__ok")
      // a rule-arm t-suspect (e.g. an rdfs7/inverse copy whose feeder premise
      // was deleted) still in the new effective reach is derivable by
      // transitivity — the arms cannot see that, the cone's reach can. All
      // arm-minted t-suspects stem from delta tails, which are affected
      // sources by construction, so the X-restricted reach is decisive.
      // Materialized as SPO (delta-sized): both the retained-key set and a
      // premise re-entry (a dom/rng/rdfs9 suspect supported only through a
      // surviving t-pair must see it in the premise base).
      val reachKeptSpo: Option[DataFrame] = transReach.map { reach =>
        graft.engine.DfOps.freshLeaf(
          keyed(suspects.filter(col("p")("id").isin(transTouched.toSeq: _*)))
            .join(reach.select(col("x").as("__sk"), col("p_id").as("__pk"),
              col("y").as("__ok")), Seq("__sk", "__pk", "__ok"), "left_semi")
            .drop("__sk", "__pk", "__ok"))
      }
      // promoted-to-be transitive edges (removed explicit, still in the new
      // reach) and reach-retained t-suspects re-enter the premise base: an
      // entailment supported only through such a row — dom(t) on a surviving
      // (a t b) — must survive with it
      def asInf(pt: DataFrame): DataFrame = pt
        .withColumn("p_id", col("p")("id"))
        .withColumn("g", Term.nullTerm)
        .withColumn("stype", lit(GraftStore.STYPE_INFERRED).cast("byte"))
        .select(exp.columns.map(col): _*)
      val base = (Seq(exp.unionByName(keptInf)) ++ promTransSpo.map(asInf) ++
        reachKeptSpo.map(asInf)).reduce(_.unionByName(_))
      // premise base for the PRE-TRANSITIVE arms (rdfs7/inverse/hasValue):
      // closure() runs those stages before the transitive fixpoint, so a
      // transitive-partition row is a legitimate early premise ONLY when it is
      // an effective base EDGE (explicit, or a feeder copy) — transitive-
      // fixpoint pairs must not feed them (an inverse flip of a reach pair is
      // a row the materializer never derives). Inferred t-rows are kept iff
      // their id-triple matches the feeder-translated explicit edge set.
      val basePre =
        if (transIds.isEmpty) base
        else {
          val tAll = transIds.toSeq
          val statesAll = tAll.flatMap(t0 =>
            feederStates(t0).toSeq.map(s => (t0, s._1, s._2)))
          val edgeKeys = statesAll.map { case (t0, src, flip) =>
            val part = exp.filter(col("p_id") === src)
              .select(col("s")("id").as("a"), col("o")("id").as("b"))
            if (!flip) part.select(col("a").as("__sk"), lit(t0).as("__pk"),
              col("b").as("__ok"))
            else part.select(col("b").as("__sk"), lit(t0).as("__pk"),
              col("a").as("__ok"))
          }.reduce(_.unionByName(_))
          val keptEdges = keyed(keptInf.filter(col("p_id").isin(tAll: _*)))
            .join(edgeKeys, Seq("__sk", "__pk", "__ok"), "left_semi")
            .drop("__sk", "__pk", "__ok")
          exp.unionByName(keptInf.filter(!col("p_id").isin(tAll: _*)))
            .unionByName(keptEdges)
        }
      val retained = rederive(spark, base, basePre, suspects, sKeys,
        scNew, spNew, vNew.dom.toSeq, vNew.rng.toSeq, ibNew, vNew.restrictions,
        saDelta.map(_.aliasNew))
      // schema statements are re-derivable iff in the NEW driver-side closures
      // (rdfs5/11 run on the driver, not in rederive) — a removed-but-still-
      // derivable axiom must survive to be promoted below
      val retainedSchema = keyed(schemaStmts(scNew, spNew,
        vNew.eqc.map(_.swap).toSeq, vNew.eqp.map(_.swap).toSeq))
        .select("__sk", "__pk", "__ok")
      // transitive retention is decided by the cone pass, not the rule arms:
      // removed t-edges still in the new reach are retained (→ promotion)
      val retainedTrans = promTransSpo match {
        case Some(pt) => keyed(pt).select("__sk", "__pk", "__ok")
        case None => retainedSchema.limit(0)
      }
      // sameAs retention is decided by the class diff: removed sameAs edges
      // whose endpoints remain connected in the new classes are retained
      val retainedSa = saDelta.flatMap(_.promSpo) match {
        case Some(ps) => keyed(ps).select("__sk", "__pk", "__ok")
        case None => retainedSchema.limit(0)
      }
      val retainedReach = reachKeptSpo match {
        case Some(rk) => keyed(rk).select("__sk", "__pk", "__ok")
        case None => retainedSchema.limit(0)
      }
      graft.engine.DfOps.freshLeaf(
        sKeys.join(broadcast(retained.unionByName(retainedSchema)
            .unionByName(retainedTrans).unionByName(retainedSa)
            .unionByName(retainedReach)),
          Seq("__sk", "__pk", "__ok"), "left_anti"))
    }

    // ---- apply the loss: only materialized entailments are retracted ----
    // an explicit copy just inserted supersedes a materialized entailment:
    // drop inferred rows whose (s,p,o) is in the added buffer too (the full
    // recompute's novelty check does this implicitly)
    val addedKeys = key3(added).select("__sk", "__pk", "__ok")
    // Retraction applies as a delta-sized TOMBSTONE (lazy broadcast anti-join
    // over the inferred branch): the mutation itself stays O(delta) — no
    // partition rewrite — and tombstoneDepth counts these layers as still at
    // rest, so the NEXT mutation keeps the delta path. When the stack passes
    // its depth bound (chained-mutation streams), the pass COMPACTS: the
    // retraction keys' predicate set is delta-bounded (probed ≤1001), so only
    // those partitions re-materialize and the stack resets to zero. At 100 TB
    // a per-mutation partition rewrite would be O(partition) — measured
    // +1.8 s even at sf0.1 — so compaction is amortized, not per-mutation.
    def tombstoned(src: DataFrame): DataFrame = keyed(src)
      .join(broadcast(lostKeys), Seq("__sk", "__pk", "__ok"), "left_anti")
      .join(broadcast(addedKeys), Seq("__sk", "__pk", "__ok"), "left_anti")
      .drop("__sk", "__pk", "__ok")
    // layout stores bound tombstone layers PER SEGMENT at application time
    // (below) — the legacy whole-inferred-branch compaction applies only to
    // stores without a partition-keyed layout
    val depth =
      if (next.layoutOpt.isDefined) 0 else tombstoneDepth(next).getOrElse(0)
    val afterLoss0 =
      if (depth < 6) exp.unionByName(tombstoned(inf))
      // accumulated layers live across ALL partitions, so compaction folds the
      // whole inferred branch once (delta-bounded layers over pruned scans);
      // one materialization per ~6 mutations, amortized O(inferred)/6
      else exp.unionByName(t("commit-compact")(graft.engine.DfOps.freshLeaf(
        tombstoned(inf))))
    // promotion: removed rows that remain derivable come back as Inferred
    // (novelty against the post-loss store keeps explicit copies
    // authoritative). Presence is checked delta-side: the p_id-pruned store
    // scan SEMI-joins the broadcast removed keys — never shuffling the store —
    // and the delta-sized hit set broadcasts back into the anti-join.
    // dedup: the delete of one triple from two graphs (or a Modify whose WHERE
    // hits it twice) yields multiple purged copies of the same (s,p,o) — the
    // promotion below must mint ONE Inferred row, like the full recompute
    val rKeys = keyed(removed.select(col("s"), col("p"), col("o")))
      .dropDuplicates("__sk", "__pk", "__ok")
    val stillPresent = graft.engine.DfOps.freshLeaf(
      keyed(afterLoss0.filter(col("p_id").isin(deltaPids.toSeq: _*))
          .select("s", "p", "o"))
        .select("__sk", "__pk", "__ok")
        .join(broadcast(rKeys.select("__sk", "__pk", "__ok")),
          Seq("__sk", "__pk", "__ok"), "left_semi"))
    val promoted = rKeys
      .join(broadcast(lostKeys), Seq("__sk", "__pk", "__ok"), "left_anti")
      .join(broadcast(stillPresent), Seq("__sk", "__pk", "__ok"), "left_anti")
      .drop("__sk", "__pk", "__ok")
    val promStmts = graft.engine.DfOps.freshLeaf(
      GraftStore.assemble(promoted
        .withColumn("g", Term.nullTerm)
        .withColumn("stype", lit(GraftStore.STYPE_INFERRED).cast("byte"))))
    val afterLoss = afterLoss0.unionByName(promStmts)

    // ---- insert side: same staged pass FORWARD (added facts/schema as taint)
    val hasInsertWork = !added.isEmpty || dScAdd.nonEmpty || dSpAdd.nonEmpty ||
      dDomAdd.nonEmpty || dRngAdd.nonEmpty || dIbAdd.nonEmpty ||
      saDelta.exists(_.addSpo.isDefined)
    val freshStmts: Option[DataFrame] =
      if (!hasInsertWork) None
      else {
        // new transitive pairs from the cone (reach gained via added edges)
        // are conclusions AND taint: dom/rng/rdfs9 must fire on them. A
        // delete-only update cannot gain reach, so the None arm covers it.
        // Likewise new sameAs pairs from a class merge: the pairs themselves
        // plus the substitutions of the merged classes' surviving facts onto
        // the new aliases (one pruned-by-broadcast pass over the fact table).
        val saAdds: Seq[DataFrame] = saDelta.toSeq.flatMap { sd =>
          sd.addSpo.toSeq.flatMap { aSpo =>
            val subs = sd.addAlias.toSeq.flatMap { aAl =>
              val aliasNewO = sd.aliasNew.withColumnRenamed("alias", "alias2")
                .withColumnRenamed("xid", "yid")
              // the subject- and object-side substitution arms each scan the
              // store (member facts span every predicate partition — no p_id
              // pruning possible). When the merged members are few (the
              // common merge), ONE pre-filtered, committed scan replaces
              // both full passes; the arms then join the delta-sized slice.
              val memberRows = aAl.select(col("xid")).distinct()
                .limit(2049).collect()
              val f0 =
                if (memberRows.length > 2048)
                  afterLoss.filter(col("p_id") =!= sameAsId)
                    .select(col("s"), col("p"), col("o"))
                else {
                  val ids = memberRows.map(_.getLong(0)).toSeq
                  graft.engine.DfOps.freshLeaf(
                    afterLoss.filter(col("p_id") =!= sameAsId &&
                        (col("s")("id").isin(ids: _*) ||
                          col("o")("id").isin(ids: _*)))
                      .select(col("s"), col("p"), col("o")))
                }
              val subjNew = f0.join(broadcast(aAl), col("s")("id") === col("xid"))
                .select(col("alias").as("s"), col("p"), col("o"))
              val objNew = f0.filter(col("o")("kind") =!= Term.KIND_LITERAL)
                .join(broadcast(aAl.withColumnRenamed("alias", "alias2")
                  .withColumnRenamed("xid", "yid")), col("o")("id") === col("yid"))
                .select(col("s"), col("p"), col("alias2").as("o"))
              // both-sided orbit members involving ≥1 new alias (the full
              // class×class orbit is what closure() materializes)
              val bothA = subjNew.filter(col("o")("kind") =!= Term.KIND_LITERAL)
                .join(aliasNewO, col("o")("id") === col("yid"))
                .select(col("s"), col("p"), col("alias2").as("o"))
              val bothB = objNew.join(sd.aliasNew, col("s")("id") === col("xid"))
                .select(col("alias").as("s"), col("p"), col("o"))
              Seq(subjNew, objNew, bothA, bothB)
            }
            aSpo +: subs
          }
        }
        // newTransSpo is POST-TRANSITIVE taint (lateTaint): closure() never
        // re-inverts / rdfs7-copies / hasValue-fires on transitive
        // conclusions — they feed only sameAs/dom/rng/rdfs9
        val addedTaint = (Seq(added.select(col("s"), col("p"), col("o"))) ++
          saAdds).reduce(_.unionByName(_))
        val newDerived = deltaDerive(spark, afterLoss, addedTaint,
          scNew, spNew, vNew.dom.toSeq, vNew.rng.toSeq, ibNew, vNew.restrictions,
          dScAdd, dSpAdd, dDomAdd, dRngAdd, dIbAdd, saDelta.map(_.aliasNew),
          lateTaint = newTransSpo,
          // new EXPLICIT view (added rows live in exp) for the schema arms
          explicitFacts = Some(
            exp.select(col("s"), col("p"), col("o"), col("p_id"))))
          .unionByName(newSchemaStmts)
          .unionByName(newTransSpo.getOrElse(newSchemaStmts.limit(0)))
          .unionByName(saAdds.reduceOption(_.unionByName(_))
            .getOrElse(newSchemaStmts.limit(0)))
        // novelty: keep only entailments not already present (any stype).
        // Same delta-side shape as promotion: prune the store scan to the new
        // conclusions' predicates, SEMI-join it against the broadcast
        // conclusion keys, and anti-join the delta-sized hit set back — the
        // store is scanned (pruned), never shuffled.
        val ndKeys = graft.engine.DfOps.freshLeaf(keyed(dedupK(newDerived)))
        val ndPidRows = ndKeys.select(col("__pk")).distinct().limit(1001).collect()
        val presentScan =
          if (ndPidRows.length > 1000) afterLoss
          else afterLoss.filter(
            col("p_id").isin(ndPidRows.map(_.getLong(0)).toSeq: _*))
        val already = graft.engine.DfOps.freshLeaf(
          keyed(presentScan.select("s", "p", "o"))
            .select("__sk", "__pk", "__ok")
            .join(broadcast(ndKeys.select("__sk", "__pk", "__ok")),
              Seq("__sk", "__pk", "__ok"), "left_semi"))
        val fresh = ndKeys
          .join(broadcast(already), Seq("__sk", "__pk", "__ok"), "left_anti")
          .drop("__sk", "__pk", "__ok")
        Some(graft.engine.DfOps.freshLeaf(
          GraftStore.assemble(fresh
            .withColumn("g", Term.nullTerm)
            .withColumn("stype", lit(GraftStore.STYPE_INFERRED).cast("byte")))))
      }

    // ---- apply: partition-keyed when the store carries a layout ----
    // Only the partitions holding a tombstone key, a promotion, or a fresh
    // conclusion change; their segments are replaced wholesale (untouched
    // partitions keep their pruned scans and their existing segment plans —
    // no dead branches, no stacking). Per-segment layer depth folds
    // partition-sized past FOLD_LAYERS. Falls back to the legacy whole-frame
    // result when the touched-pid probe overflows (cone spanning >256
    // predicates — all touched pids land in ONE segment, so the cap guards
    // the isin literal width, not the segment count; a sameAs-merge
    // substituting member facts routinely touches ~100 predicates and must
    // keep the layout's pruned scans) or the store has no layout.
    val laidOut: Option[GraftStore] = next.layoutOpt.flatMap { lay =>
      val touchedRows = t("touched-pids")(
        lostKeys.select(col("__pk"))
          .unionByName(addedKeys.select(col("__pk")))
          .unionByName(promStmts.select(col("p_id").as("__pk")))
          .unionByName(freshStmts.map(_.select(col("p_id").as("__pk")))
            .getOrElse(promStmts.select(col("p_id").as("__pk")).limit(0)))
          .distinct().limit(257).collect())
      if (touchedRows.length > 256) None
      else if (touchedRows.isEmpty) Some(next)
      else {
        val touched = touchedRows.map(_.getLong(0)).toSeq
        val slice = lay.slice(touched)
        val cols = GraftStore.columns.map(col)
        val sliceNew0 = graft.engine.DfOps.reid(
            slice.filter(col("stype") =!= GraftStore.STYPE_INFERRED))
          .unionByName(tombstoned(graft.engine.DfOps.reid(
            slice.filter(col("stype") === GraftStore.STYPE_INFERRED))))
          .select(cols: _*)
          .unionByName(promStmts.select(cols: _*))
        val sliceNew = freshStmts.fold(sliceNew0)(f =>
          sliceNew0.unionByName(f.select(cols: _*)))
        val layers = lay.layersAt(touched) + 1
        val (frame2, layers2) =
          if (layers >= graft.engine.Update.FOLD_LAYERS)
            (graft.engine.DfOps.freshLeaf(sliceNew), 0)
          else (sliceNew, layers)
        // graph-probe hint: the TM result's multi-graph set is contained in
        // the pre-TM store's plus the touched pids (entailments are excluded
        // from the probes anyway; explicit rows only changed in `touched`)
        Some(next.withLayout(lay.replace(touched, frame2, layers2),
          gdelta = Some(touched.toSet)))
      }
    }
    Some(laidOut.getOrElse {
      val result = freshStmts.fold(afterLoss)(afterLoss.unionByName)
      next.withStatements(result.select(GraftStore.columns.map(col): _*))
    })
  }

  /** Staged DELTA derivation: conclusions with ≥1 derivation (under the given
    * schema closures, which must be pre-closed) using a fact from `taint0` or a
    * schema pair from the `d*` diffs. Mirrors closure()'s stage order (rdfs7 →
    * inverse/symmetric → hasValue → domain/range → rdfs9 → hasValue₂); the
    * transitive and sameAs families are excluded by the caller's guards. Each
    * stage's output re-feeds later stages, exactly like closure()'s fact
    * accumulation. Facts-side scans are pruned to the diff pairs' predicate
    * partitions; taint-side joins are broadcast over the delta. Returns (s,p,o).
    */
  private def deltaDerive(spark: org.apache.spark.sql.SparkSession,
      allFacts0: DataFrame, taint0: DataFrame,
      sc: Seq[(Row, Row)], sp: Seq[(Row, Row)],
      dom: Seq[(Row, Row)], rng: Seq[(Row, Row)], ib: Seq[(Row, Row)],
      restrictions: Seq[(Long, Row, Row)],
      dSc: Seq[(Row, Row)], dSp: Seq[(Row, Row)], dDom: Seq[(Row, Row)],
      dRng: Seq[(Row, Row)], dIb: Seq[(Row, Row)],
      sa: Option[DataFrame] = None,
      lateTaint: Option[DataFrame] = None,
      explicitFacts: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    def idOf(r: Row): Long = r.getAs[Long]("id")
    val allFacts = allFacts0.select(col("s"), col("p"), col("o"), col("p_id"))
    // premise frame for the dSp/dIb SCHEMA arms: closure() runs rdfs7 over
    // EXPLICIT rows only and the inverse flip over (explicit ∪ rdfs7 output),
    // so a schema-delta arm fed from allFacts would copy/flip inferred rows
    // (transitive pairs, dom-derived types) the materializer never touches —
    // phantoms on the insert side. Callers pass the side's explicit view;
    // None falls back to allFacts (over-approximation, delete-side safe).
    val expFacts = explicitFacts
      .map(_.select(col("s"), col("p"), col("o"), col("p_id")))
      .getOrElse(allFacts)
    def spo(df: DataFrame): DataFrame =
      df.select(col("s"), col("p"), col("o"), col("p")("id").as("p_id"))
    // fresh LocalRelation, not allFacts.limit(0): an empty frame sharing the
    // fact scan's attribute ids poisons the sibling-union constraint rewrite
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[Row](),
      StructType(Seq("s", "p", "o").map(n => StructField(n, Term.schema))))
    def dedup(df: DataFrame): DataFrame = df
      .withColumn("__sk", col("s")("id")).withColumn("__pk", col("p")("id"))
      .withColumn("__ok", col("o")("id"))
      .dropDuplicates("__sk", "__pk", "__ok").drop("__sk", "__pk", "__ok")
    def pd(ps: Seq[(Row, Row)], an: String, bn: String): DataFrame =
      pairsDf(spark, ps, an, bn)
    def pruned(ps: Seq[(Row, Row)]): DataFrame =
      allFacts.filter(col("p_id").isin(ps.map(p => idOf(p._1)).distinct: _*))
    def prunedE(ps: Seq[(Row, Row)]): DataFrame =
      expFacts.filter(col("p_id").isin(ps.map(p => idOf(p._1)).distinct: _*))

    var taint = spo(taint0)
    var stages = List.empty[DataFrame]
    def addStage(d: DataFrame): Unit = {
      val dd = graft.engine.DfOps.freshLeaf(dedup(d))
      stages ::= dd
      taint = taint.unionByName(spo(dd))
    }
    def asQ(ps: Seq[(Row, Row)]): DataFrame =
      pd(ps, "a", "b").select(col("a")("id").as("p_id"), col("b").as("q"))

    // rdfs7: (x p y), p ⊑* q → (x q y)
    if (sp.nonEmpty || dSp.nonEmpty) {
      val viaFact = if (sp.isEmpty) empty else
        taint.join(broadcast(asQ(sp)), Seq("p_id"))
          .select(col("s"), col("q").as("p"), col("o"))
      val viaSchema = if (dSp.isEmpty) empty else
        prunedE(dSp).join(broadcast(asQ(dSp)), Seq("p_id"))
          .select(col("s"), col("q").as("p"), col("o"))
      addStage(viaFact.unionByName(viaSchema))
    }
    // inverse/symmetric: (x p y) → (y q x), object must be a resource
    if (ib.nonEmpty || dIb.nonEmpty) {
      def flip(facts: DataFrame, ps: Seq[(Row, Row)]) =
        facts.join(broadcast(asQ(ps)), Seq("p_id"))
          .filter(col("o")("kind") =!= Term.KIND_LITERAL)
          .select(col("o").as("s"), col("q").as("p"), col("s").as("o"))
      val viaFact = if (ib.isEmpty) empty else flip(taint, ib)
      // dInv2's input is explicit ∪ rdfs7 OUTPUT: a changed (q inv tgt) flips
      // q's explicit rows AND the rdfs7 copies into q — expand each dIb pair
      // over the (side-closed) sp-into set so those copies flip too, all from
      // the EXPLICIT premise frame
      val dIbX: Seq[(Row, Row)] = if (dIb.isEmpty) Nil else {
        val spPairs = sp.map(p => (idOf(p._1), idOf(p._2)))
        val rowsById = (sp.flatMap(p => Seq(p._1, p._2)) ++
          dIb.flatMap(p => Seq(p._1, p._2))).map(r => idOf(r) -> r).toMap
        dIb.flatMap { case (q, tgt) =>
          val qid = idOf(q)
          val srcs = qid +: spPairs.collect { case (a, b) if b == qid && a != qid => a }
          srcs.distinct.map(a => (rowsById(a), tgt))
        }.distinct
      }
      // a dIb SELF-pair is a SYMMETRIC mark delta (r15): closure()'s
      // symmetric stage flips the property's ACCUMULATED rows — explicit ∪
      // rdfs7 copies (the sp*-expanded FLIPS above) ∪ inverseOf outputs. The
      // inverse partners' rows were flipped once by the earlier stage, so the
      // symmetric flip lands them as STRAIGHT copies — mint those from the
      // explicit premise expanded over each partner's own sp-into set. The
      // non-literal filter carries the inverse stage's resource constraint.
      val dIbStraight: Seq[(Row, Row)] = if (dIb.isEmpty) Nil else {
        val spPairs = sp.map(p => (idOf(p._1), idOf(p._2)))
        val rowsById = (sp.flatMap(p => Seq(p._1, p._2)) ++
          ib.flatMap(p => Seq(p._1, p._2)) ++
          dIb.flatMap(p => Seq(p._1, p._2))).map(r => idOf(r) -> r).toMap
        def spInto(qid: Long): Seq[Long] =
          qid +: spPairs.collect { case (a, b) if b == qid && a != qid => a }
        dIb.filter(p => idOf(p._1) == idOf(p._2)).flatMap { case (p0, tgt) =>
          val pid = idOf(p0)
          val partners = ib.collect {
            case (q, t2) if idOf(t2) == pid && idOf(q) != pid => idOf(q) }
          partners.flatMap(spInto).distinct.map(a => (rowsById(a), tgt))
        }.distinct
      }
      def copyS(facts: DataFrame, ps: Seq[(Row, Row)]) =
        facts.join(broadcast(asQ(ps)), Seq("p_id"))
          .filter(col("o")("kind") =!= Term.KIND_LITERAL)
          .select(col("s"), col("q").as("p"), col("o"))
      val viaSchema = if (dIbX.isEmpty) empty else flip(prunedE(dIbX), dIbX)
      val viaSchemaS =
        if (dIbStraight.isEmpty) empty else copyS(prunedE(dIbStraight), dIbStraight)
      addStage(viaFact.unionByName(viaSchema).unionByName(viaSchemaS))
    }
    // hasValue over tainted restriction membership (restriction set itself is
    // delta-invariant per the caller's guards)
    def hasValueOf(types: DataFrame): DataFrame = {
      val rRows = restrictions.map { case (a, p, v) => Row(a, p, v) }
      val rDf = spark.createDataFrame(spark.sparkContext.parallelize(rRows, 1),
        StructType(Seq(StructField("tid", LongType),
          StructField("hp", Term.schema), StructField("hv", Term.schema))))
      types.join(broadcast(rDf), col("o")("id") === col("tid"))
        .select(col("s"), col("hp").as("p"), col("hv").as("o"))
    }
    if (restrictions.nonEmpty)
      addStage(hasValueOf(taint.filter(col("p_id") === typeId)))
    // POST-TRANSITIVE taint (the cone's lost/new reach pairs) joins here:
    // closure() runs the transitive fixpoint after hasValue, so transitive
    // conclusions feed sameAs/dom/rng/rdfs9 but are never re-inverted,
    // re-copied by rdfs7, or re-fed to hasValue — feeding them to the earlier
    // arms would derive rows the materializer does not (e.g. inverse flips of
    // reach pairs), de-syncing the delta result from the at-rest closure.
    lateTaint.foreach(lt => taint = taint.unionByName(spo(lt)))
    // owl:sameAs substitution (RuleOwlSameAs2/3): tainted facts substituted
    // through the materialized all-pairs alias map — subject side then object
    // side (non-literal), mirroring closure()'s one-pass stage order (the
    // substituted copies then feed dom/rng/rdfs9 below, like the closure's
    // factsForTypes). The taint is delta-sized; the alias map is a pruned
    // partition scan keyed on node id.
    sa.foreach { aliasOf =>
      val aliasO = aliasOf.withColumnRenamed("alias", "alias2")
        .withColumnRenamed("xid", "yid")
      val t0 = taint.filter(col("p_id") =!= sameAsId)
      val subj = t0.join(aliasOf, col("s")("id") === col("xid"))
        .select(col("alias").as("s"), col("p"), col("o"))
      val obj = t0.filter(col("o")("kind") =!= Term.KIND_LITERAL)
        .join(aliasO, col("o")("id") === col("yid"))
        .select(col("s"), col("p"), col("alias2").as("o"))
      // both-sided orbit member (closure() derives the full class×class orbit)
      val both = subj.filter(col("o")("kind") =!= Term.KIND_LITERAL)
        .join(aliasO, col("o")("id") === col("yid"))
        .select(col("s"), col("p"), col("alias2").as("o"))
      addStage(subj.unionByName(obj).unionByName(both))
    }
    // rdfs2/rdfs3: domain/range → type triples
    if (dom.nonEmpty || rng.nonEmpty || dDom.nonEmpty || dRng.nonEmpty) {
      def asCls(ps: Seq[(Row, Row)]): DataFrame =
        pd(ps, "a", "c").select(col("a")("id").as("p_id"), col("c").as("cls"))
      def domJ(facts: DataFrame, ps: Seq[(Row, Row)]) =
        facts.join(broadcast(asCls(ps)), Seq("p_id"))
          .select(col("s"), Term.iri(Term.RDF_TYPE).as("p"), col("cls").as("o"))
      def rngJ(facts: DataFrame, ps: Seq[(Row, Row)]) =
        facts.join(broadcast(asCls(ps)), Seq("p_id"))
          .filter(col("o")("kind") =!= Term.KIND_LITERAL)
          .select(col("o").as("s"), Term.iri(Term.RDF_TYPE).as("p"), col("cls").as("o"))
      val parts = Seq(
        if (dom.nonEmpty) Some(domJ(taint, dom)) else None,
        if (dDom.nonEmpty) Some(domJ(pruned(dDom), dDom)) else None,
        if (rng.nonEmpty) Some(rngJ(taint, rng)) else None,
        if (dRng.nonEmpty) Some(rngJ(pruned(dRng), dRng)) else None).flatten
      addStage(parts.reduce(_.unionByName(_)))
    }
    // rdfs9: (x type a), a ⊑* b → (x type b)
    if (sc.nonEmpty || dSc.nonEmpty) {
      def r9(types: DataFrame, ps: Seq[(Row, Row)]) =
        types.join(broadcast(pd(ps, "a", "b")
            .select(col("a")("id").as("tid"), col("b").as("cls"))),
          col("o")("id") === col("tid"))
          .select(col("s"), Term.iri(Term.RDF_TYPE).as("p"), col("cls").as("o"))
      val viaFact = if (sc.isEmpty) empty
        else r9(taint.filter(col("p_id") === typeId), sc)
      // the dSc arm is the pass's one data-sized scan (the whole rdf:type
      // partition); the join immediately keys o.id to the dSc SOURCE classes,
      // a driver-known vocabulary-sized set — pre-filtering on it is implied
      // by the inner join and reaches the parquet scan (row-group skipping +
      // rows never decoded), so the pass reads the affected classes' type
      // rows, not the partition
      val viaSchema = if (dSc.isEmpty) empty
        else r9(allFacts.filter(col("p_id") === typeId &&
          col("o")("id").isin(dSc.map(p => idOf(p._1)).distinct: _*)), dSc)
      addStage(viaFact.unionByName(viaSchema))
    }
    // hasValue second firing over the late (dom/rng/rdfs9-derived) type taint
    if (restrictions.nonEmpty)
      addStage(hasValueOf(taint.filter(col("p_id") === typeId)))
    if (stages.isEmpty) empty else dedup(stages.reduce(_.unionByName(_)))
  }

  /** Staged re-derivation RESTRICTED to the suspect set: which suspects remain
    * derivable from `base0` under the (pre-closed) NEW schema? Premise scans are
    * pruned to the rule's predicate partitions AND semi-joined against the
    * broadcast suspect keys, so cost tracks the delta, not the corpus. Retained
    * suspects re-feed later stages (a re-derived (x q y) can support a suspect
    * domain type, etc.). Returns the retained keys (__sk,__pk,__ok).
    */
  private def rederive(spark: org.apache.spark.sql.SparkSession,
      base0: DataFrame, basePre0: DataFrame,
      suspects: DataFrame, sKeys: DataFrame,
      sc: Seq[(Row, Row)], sp: Seq[(Row, Row)],
      dom: Seq[(Row, Row)], rng: Seq[(Row, Row)], ib: Seq[(Row, Row)],
      restrictions: Seq[(Long, Row, Row)],
      sa: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    def idOf(r: Row): Long = r.getAs[Long]("id")
    def keyed(df: DataFrame): DataFrame = df
      .withColumn("__sk", col("s")("id")).withColumn("__pk", col("p")("id"))
      .withColumn("__ok", col("o")("id"))
    var base = base0.select(col("s"), col("p"), col("o"), col("p_id"))
    // premise base for the pre-transitive arms (see the caller's basePre):
    // grows with arm-retained conclusions exactly like `base` — an arm's
    // retention is available to every LATER arm, mirroring closure()'s staging
    var basePre = basePre0.select(col("s"), col("p"), col("o"), col("p_id"))
    // fresh LocalRelation (see deltaDerive's `empty` note)
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[Row](),
      StructType(Seq("s", "p", "o").map(n => StructField(n, Term.schema))))
    def pd(ps: Seq[(Row, Row)], an: String, bn: String): DataFrame =
      pairsDf(spark, ps, an, bn)
    // suspect-key probes for premise pruning (all delta-sized, broadcast)
    val suspPairs = suspects
      .select(col("s")("id").as("__sk"), col("o")("id").as("__ok")).distinct()
    val suspTypeSubj = suspects.filter(col("p")("id") === typeId)
      .select(col("s")("id").as("__sid")).distinct()
    val suspSubj = suspects.select(col("s")("id").as("__sid")).distinct()
    // vocabulary-bounded driver probes: the suspect PREDICATES and TYPE CLASSES
    // restrict each rule's schema pairs to those whose conclusions can hit a
    // suspect at all — partitions of irrelevant predicates are never scanned
    // (caps fall back to unrestricted pairs, never to a wrong answer).
    // ONE tagged job collects both sets (each side capped at 1001 pre-union)
    val suspProbe = suspects.select(col("p")("id").as("v"), lit(true).as("isPk"))
      .distinct().limit(1001)
      .unionByName(suspects.filter(col("p")("id") === typeId)
        .select(col("o")("id").as("v"), lit(false).as("isPk"))
        .distinct().limit(1001))
      .collect()
    val (suspPkRows, suspClsRows) = suspProbe.partition(_.getBoolean(1))
    val suspPks: Option[Set[Long]] =
      if (suspPkRows.length > 1000) None else Some(suspPkRows.map(_.getLong(0)).toSet)
    val suspCls: Option[Set[Long]] =
      if (suspClsRows.length > 1000) None
      else Some(suspClsRows.map(_.getLong(0)).toSet)
    def byConcl(ps: Seq[(Row, Row)], rel: Option[Set[Long]]): Seq[(Row, Row)] =
      rel match {
        case Some(ids) => ps.filter(p => ids(idOf(p._2)))
        case None => ps
      }
    val sp2 = byConcl(sp, suspPks)
    val ib2 = byConcl(ib, suspPks)
    val dom2 = byConcl(dom, suspCls)
    val rng2 = byConcl(rng, suspCls)
    val sc2 = byConcl(sc, suspCls)
    val restrictions2 = suspPks match {
      case Some(ids) => restrictions.filter(r => ids(idOf(r._2)))
      case None => restrictions
    }

    def prunedBy(ps: Seq[(Row, Row)]): DataFrame =
      base.filter(col("p_id").isin(ps.map(p => idOf(p._1)).distinct: _*))
    def prunedByPre(ps: Seq[(Row, Row)]): DataFrame =
      basePre.filter(col("p_id").isin(ps.map(p => idOf(p._1)).distinct: _*))
    def asQ(ps: Seq[(Row, Row)]): DataFrame =
      pd(ps, "a", "b").select(col("a")("id").as("p_id"), col("b").as("q"))

    // Staged keeps in closure()'s exact rule order: each retained conclusion
    // re-enters `base` before the stages it can support (dom before rdfs9
    // before hasValue2), which mirrors the materializer's derivation power —
    // a suspect supported only through a promoted intermediate is found at
    // stage depth, no fixpoint needed.
    var retainedAcc = keyed(empty).select("__sk", "__pk", "__ok")
    def keep(concl: DataFrame): Unit = {
      val hit = graft.engine.DfOps.freshLeaf(keyed(concl)
        .join(broadcast(sKeys), Seq("__sk", "__pk", "__ok"), "left_semi")
        .dropDuplicates("__sk", "__pk", "__ok"))
      retainedAcc = retainedAcc.unionByName(hit.select("__sk", "__pk", "__ok"))
      val hitSpo = hit.select(col("s"), col("p"), col("o"),
        col("p")("id").as("p_id"))
      base = base.unionByName(hitSpo)
      basePre = basePre.unionByName(hitSpo)
    }
    def stages(): Seq[Option[DataFrame]] = {
      val arms = Seq(
        // rdfs7: premise (x p y) relevant iff some suspect shares (x, y).
        // PRE-TRANSITIVE arm — premises from basePre (no transitive-fixpoint
        // pairs; closure() runs rdfs7/inverse/hasValue before transitivity)
        if (sp2.isEmpty) None else Some(
          prunedByPre(sp2)
            .join(broadcast(suspPairs),
              col("s")("id") === col("__sk") && col("o")("id") === col("__ok"),
              "left_semi")
            .join(broadcast(asQ(sp2)), Seq("p_id"))
            .select(col("s"), col("q").as("p"), col("o"))),
        // inverse/symmetric: premise (y p x) vs suspect (x q y) — flipped probe
        if (ib2.isEmpty) None else Some(
          prunedByPre(ib2)
            .join(broadcast(suspPairs),
              col("o")("id") === col("__sk") && col("s")("id") === col("__ok"),
              "left_semi")
            .join(broadcast(asQ(ib2)), Seq("p_id"))
            .filter(col("o")("kind") =!= Term.KIND_LITERAL)
            .select(col("o").as("s"), col("q").as("p"), col("s").as("o"))),
        // hasValue: premise (x type R) relevant iff x is a suspect subject
        if (restrictions2.isEmpty) None else Some {
          val rRows = restrictions2.map { case (a, p, v) => Row(a, p, v) }
          val rDf = spark.createDataFrame(spark.sparkContext.parallelize(rRows, 1),
            StructType(Seq(StructField("tid", LongType),
              StructField("hp", Term.schema), StructField("hv", Term.schema))))
          basePre.filter(col("p_id") === typeId)
            .join(broadcast(suspSubj), col("s")("id") === col("__sid"), "left_semi")
            .join(broadcast(rDf), col("o")("id") === col("tid"))
            .select(col("s"), col("hp").as("p"), col("hv").as("o"))
        },
        // sameAs substitution: a suspect (x' p y) is retained iff a surviving
        // fact (x p y) has x' among x's NEW aliases (mirror for the object
        // side). Premises are pruned to the suspects' predicate partitions AND
        // semi-joined by the suspects' (p,o) / (s,p) key pairs BEFORE the
        // alias join, so cost tracks the suspects, not the partitions.
        sa.map { aliasOf =>
          val s0 = suspects.filter(col("p")("id") =!= sameAsId)
          val po = s0.select(col("p")("id").as("__qpk"), col("o")("id").as("__qok"))
            .distinct()
          val sp0 = s0.select(col("s")("id").as("__qsk"), col("p")("id").as("__qpk2"))
            .distinct()
          val prem = (suspPks match {
            case Some(ids) => base.filter(col("p_id").isin(ids.toSeq: _*))
            case None => base
          }).filter(col("p_id") =!= sameAsId)
          val subj = prem.join(broadcast(po),
              col("p")("id") === col("__qpk") && col("o")("id") === col("__qok"),
              "left_semi")
            .join(aliasOf, col("s")("id") === col("xid"))
            .select(col("alias").as("s"), col("p"), col("o"))
          val aliasO = aliasOf.withColumnRenamed("alias", "alias2")
            .withColumnRenamed("xid", "yid")
          val obj = prem.filter(col("o")("kind") =!= Term.KIND_LITERAL)
            .join(broadcast(sp0),
              col("s")("id") === col("__qsk") && col("p")("id") === col("__qpk2"),
              "left_semi")
            .join(aliasO, col("o")("id") === col("yid"))
            .select(col("s"), col("p"), col("alias2").as("o"))
          // both-sided orbit: premise pruned to the suspect predicates only
          // (neither endpoint key survives the double substitution)
          val both = prem.filter(col("o")("kind") =!= Term.KIND_LITERAL)
            .join(aliasOf, col("s")("id") === col("xid"))
            .select(col("alias").as("s"), col("p"), col("o"))
            .join(aliasO, col("o")("id") === col("yid"))
            .select(col("s"), col("p"), col("alias2").as("o"))
          subj.unionByName(obj).unionByName(both)
        },
        // rdfs2/3: premise relevance keyed on the suspect TYPE subjects
        if (dom2.isEmpty) None else Some(
          prunedBy(dom2)
            .join(broadcast(suspTypeSubj), col("s")("id") === col("__sid"), "left_semi")
            .join(broadcast(pd(dom2, "a", "c")
              .select(col("a")("id").as("p_id"), col("c").as("cls"))), Seq("p_id"))
            .select(col("s"), Term.iri(Term.RDF_TYPE).as("p"), col("cls").as("o"))),
        if (rng2.isEmpty) None else Some(
          prunedBy(rng2)
            .join(broadcast(suspTypeSubj), col("o")("id") === col("__sid"), "left_semi")
            .join(broadcast(pd(rng2, "a", "c")
              .select(col("a")("id").as("p_id"), col("c").as("cls"))), Seq("p_id"))
            .filter(col("o")("kind") =!= Term.KIND_LITERAL)
            .select(col("o").as("s"), Term.iri(Term.RDF_TYPE).as("p"),
              col("cls").as("o"))),
        // rdfs9: premise (x type a) relevant iff x is a suspect type subject.
        // The o.id pre-filter (the sc2 SOURCE classes, driver-known and
        // vocabulary-sized) is implied by the tid join below but reaches the
        // parquet scan — without it this arm re-reads the whole rdf:type
        // partition, the re-derivation pass's one data-sized scan
        if (sc2.isEmpty) None else Some(
          base.filter(col("p_id") === typeId &&
              col("o")("id").isin(sc2.map(p => idOf(p._1)).distinct: _*))
            .join(broadcast(suspTypeSubj), col("s")("id") === col("__sid"), "left_semi")
            .join(broadcast(pd(sc2, "a", "b")
              .select(col("a")("id").as("tid"), col("b").as("cls"))),
              col("o")("id") === col("tid"))
            .select(col("s"), Term.iri(Term.RDF_TYPE).as("p"), col("cls").as("o")))
      )
      arms
    }
    // closure() stage order: rdfs7 → inverse/symmetric → hasValue → sameAs →
    // dom → rng → rdfs9; arms are rebuilt against the grown `base` at each
    // step, and the hasValue arm re-fires once more at the end (the second
    // firing over re-derived types, like the materializer)
    for (i <- 0 until 7) stages()(i).foreach(keep)
    stages()(2).foreach(keep)
    retainedAcc
  }

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

  /** The vocabulary-sized schema relations + property characteristics of a
    * statement frame — ONE pruned driver action (see collectVocab).
    * `sc`/`sp` are already eq-folded (RuleOwlEquivalentClass/Property:
    * a ≡ b ⇔ a ⊑ b ∧ b ⊑ a).
    */
  private[inference] final case class Vocab(
      sc: Array[(Row, Row)], sp: Array[(Row, Row)],
      eqc: Array[(Row, Row)], eqp: Array[(Row, Row)],
      dom: Array[(Row, Row)], rng: Array[(Row, Row)], inv: Array[(Row, Row)],
      transProps: Array[Row], symProps: Array[Row],
      funcProps: Array[Row], invFuncProps: Array[Row],
      restrictions: Seq[(Long, Row, Row)])

  /** ONE pruned scan collects every (vocabulary-sized) schema relation AND the
    * property-characteristic/restriction-marker rows — a single driver action, not
    * one per vocabulary family (each action re-evaluates the statement plan, which
    * after updates/closures is more than a bare parquet scan).
    */
  // the two vocabulary sub-scans have very different costs: the schema-pid part
  // prunes to a handful of vocabulary-sized partitions, while the
  // characteristic/restriction-marker part (type rows with owl:* class objects)
  // must read the whole rdf:type partition — callers that KNOW the marker rows
  // are unchanged share one marker scan across both vocab views
  private def vocabSchemaPart(df: DataFrame): DataFrame = {
    val schemaPids = Seq(subClassId, subPropId, domainId, rangeId,
      inverseOfId, eqClassId, eqPropId, onPropertyId, hasValueId)
    df.filter(col("p_id").isin(schemaPids: _*))
      .select(col("p_id"), col("s"), col("o"), col("o")("id").as("o_id"))
  }
  private def vocabCharPart(df: DataFrame): DataFrame = {
    val charIds = Seq(transitiveId, symmetricId, functionalId, invFunctionalId)
    df.filter(col("p_id") === typeId &&
        col("o")("id").isin(charIds :+ restrictionId: _*))
      .select(col("p_id"), col("s"), col("o"), col("o")("id").as("o_id"))
  }
  /** Cheap emptiness probe for the characteristic/restriction markers: the
    * full charPart scan decodes the WHOLE rdf:type partition's s/o term
    * structs (strings included) just to find marker rows that are absent on
    * schema-less data (TMPROF measured the vocab action at 0.75–1.4 s, almost
    * all of it this decode). Projecting only the 8-byte id fields lets the
    * parquet reader skip every string column; one extra tiny job buys the
    * skip of the expensive one whenever the probe comes back empty.
    */
  private def hasCharMarks(df: DataFrame): Boolean = {
    val charIds = Seq(transitiveId, symmetricId, functionalId, invFunctionalId)
    !df.filter(col("p_id") === typeId &&
        col("o")("id").isin(charIds :+ restrictionId: _*))
      .select(col("p_id")).limit(1).isEmpty
  }
  private def vocabFilter(df: DataFrame): DataFrame =
    if (hasCharMarks(df)) vocabSchemaPart(df).unionByName(vocabCharPart(df))
    else vocabSchemaPart(df)

  private[inference] def collectVocab(stmts: DataFrame): Vocab =
    vocabFromRows(vocabFilter(stmts).collect())

  /** Two vocabularies (old/new views of a store) in ONE tagged driver action,
    * plus the new view's explicit-sameAs presence (folded into the same job —
    * a separate limit(1) probe was one more round-trip per TM pass).
    * PRECONDITION (guaranteed by truthMaintainDelta's charMarks guard): the
    * characteristic/restriction-marker rows are identical in both views, so the
    * expensive type-partition marker scan runs ONCE and is shared.
    */
  private[inference] def collectVocab2(oldStmts: DataFrame,
                                       newStmts: DataFrame): (Vocab, Vocab, Boolean) = {
    // char-marker arm gated by the id-only probe (see hasCharMarks): on
    // marker-free data the tagged action skips the type-partition struct
    // decode entirely
    val charArm =
      if (hasCharMarks(newStmts)) Some(vocabCharPart(newStmts).withColumn("__old", lit(null)))
      else None
    val rows = (Seq(
      vocabSchemaPart(oldStmts).withColumn("__old", lit(true)),
      vocabSchemaPart(newStmts).withColumn("__old", lit(false))) ++ charArm)
      .reduce(_.unionByName(_))
      .unionByName(newStmts.filter(col("p_id") === sameAsId).limit(1)
        .select(col("p_id"), col("s"), col("o"), col("o")("id").as("o_id"))
        .withColumn("__old", lit(null)))
      .collect()
    val (sameAs, tagged) = rows.partition(_.getLong(0) == sameAsId)
    val char = tagged.filter(_.isNullAt(4))
    (vocabFromRows(tagged.filter(r => !r.isNullAt(4) && r.getBoolean(4)) ++ char),
      vocabFromRows(tagged.filter(r => !r.isNullAt(4) && !r.getBoolean(4)) ++ char),
      sameAs.nonEmpty)
  }

  private def vocabFromRows(vocabRows: Array[Row]): Vocab = {
    val schemaRows: Map[Long, Array[(Row, Row)]] = vocabRows
      .filter(r => r.getLong(0) != typeId)
      .groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(r => (r.getStruct(1), r.getStruct(2))) }
    def schema(pid: Long): Array[(Row, Row)] = schemaRows.getOrElse(pid, Array.empty)
    val eqc = schema(eqClassId)
    val eqp = schema(eqPropId)
    // property-characteristic declarations (transitive/symmetric/(inverse-)functional)
    // come from the same combined vocabulary scan, keyed by the type object
    val propChars: Map[Long, Array[Row]] = vocabRows
      .filter(r => r.getLong(0) == typeId && r.getLong(3) != restrictionId)
      .groupBy(_.getLong(3)).map { case (k, rs) => k -> rs.map(_.getStruct(1)) }
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
    Vocab(
      sc = schema(subClassId) ++ eqc ++ eqc.map(_.swap),
      sp = schema(subPropId) ++ eqp ++ eqp.map(_.swap),
      eqc = eqc, eqp = eqp,
      dom = schema(domainId), rng = schema(rangeId), inv = schema(inverseOfId),
      transProps = propChars.getOrElse(transitiveId, Array.empty[Row]),
      symProps = propChars.getOrElse(symmetricId, Array.empty[Row]),
      funcProps = propChars.getOrElse(functionalId, Array.empty[Row]),
      invFuncProps = propChars.getOrElse(invFunctionalId, Array.empty[Row]),
      restrictions = restrictions)
  }

  /** Materialize the closure; derived rows get stype=Inferred and the default graph. */
  def closure(store: GraftStore): GraftStore =
    graft.engine.DfOps.noConstraints(store.spark)(closureImpl(store))

  private def closureImpl(store: GraftStore): GraftStore = {
    val spark = store.spark
    val stmts = store.statements
    val v = collectVocab(stmts)
    val eqc = v.eqc
    val eqp = v.eqp
    val sc = v.sc
    val sp = v.sp
    val dom = v.dom
    val rng = v.rng
    val inv = v.inv
    val transProps = v.transProps
    val symProps = v.symProps
    val funcProps = v.funcProps
    val invFuncProps = v.invFuncProps
    val restrictions = v.restrictions
    val hasSameAs = stmts.filter(col("p_id") === sameAsId).limit(1).count() > 0 ||
      funcProps.nonEmpty || invFuncProps.nonEmpty
    if (sc.isEmpty && sp.isEmpty && dom.isEmpty && rng.isEmpty && inv.isEmpty &&
        transProps.isEmpty && symProps.isEmpty && restrictions.isEmpty && !hasSameAs)
      return store

    val termType = Term.schema
    def pairsDf(pairs: Seq[(Row, Row)], an: String, bn: String): DataFrame =
      Rdfs.pairsDf(spark, pairs, an, bn)

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
      // BOTH-sided substitution (the full class×class orbit): the reference's
      // RuleOwlSameAs2/3 run inside an iterative rule engine to quiescence, so
      // (x' p y') derives whenever x'~x AND y'~y — one more join off the
      // already-substituted subjects closes the orbit in a single pass, and
      // makes the materialized state CLOSED under substitution (which the
      // delta TM pass relies on: substituting a materialized copy must never
      // leave the orbit).
      val bothSub = subjSub.filter(col("o")("kind") =!= Term.KIND_LITERAL)
        .join(broadcast(aliasOf.withColumnRenamed("xid", "yid")
          .withColumnRenamed("alias", "alias2")), col("o")("id") === col("yid"))
        .select(col("s"), col("p"), col("alias2").as("o"))
        .localCheckpoint()
      derived :+= subjSub
      derived :+= objSub
      derived :+= bothSub
      facts = facts.unionByName(withPid(graft.engine.DfOps.reid(bothSub)))
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
