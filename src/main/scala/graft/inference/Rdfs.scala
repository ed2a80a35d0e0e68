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

  private val typeId = TermIds.iriId(Term.RDF_TYPE)
  private val subClassId = TermIds.iriId(Term.RDFS_SUBCLASSOF)
  private val subPropId = TermIds.iriId(Term.RDFS_SUBPROPERTYOF)
  private val domainId = TermIds.iriId(Term.RDFS_DOMAIN)
  private val rangeId = TermIds.iriId(Term.RDFS_RANGE)

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

  /** Materialize the closure; derived rows get stype=Inferred and the default graph. */
  def closure(store: GraftStore): GraftStore = {
    val spark = store.spark
    val stmts = store.statements
    def schema(pid: Long): Array[(Row, Row)] =
      stmts.filter(col("p_id") === pid).select("s", "o")
        .collect().map(r => (r.getStruct(0), r.getStruct(1)))

    val sc = schema(subClassId)
    val sp = schema(subPropId)
    val dom = schema(domainId)
    val rng = schema(rangeId)
    if (sc.isEmpty && sp.isEmpty && dom.isEmpty && rng.isEmpty) return store

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
    // rdfs5/11: schema transitivity itself (vocabulary-sized)
    if (scC.nonEmpty) derived :+= pairsDf(scC, "s", "o")
      .select(col("s"), Term.iri(Term.RDFS_SUBCLASSOF).as("p"), col("o"))
    if (spC.nonEmpty) derived :+= pairsDf(spC, "s", "o")
      .select(col("s"), Term.iri(Term.RDFS_SUBPROPERTYOF).as("p"), col("o"))

    // rdfs7: (x p y), (p subPropertyOf* q) → (x q y) — one broadcast join
    val rdfs7 = if (sp.isEmpty) None else {
      val spAll = pairsDf(sp.toSeq ++ spC, "sp_s", "sp_o").dropDuplicates("sp_s", "sp_o")
        .select(col("sp_s")("id").as("pid"), col("sp_o").as("q"))
      Some(spo.join(broadcast(spAll), Seq("pid"))
        .select(col("s"), col("q").as("p"), col("o")))
    }
    rdfs7.foreach(d => derived :+= d)

    // facts incl. property entailments feed domain/range/type rules
    val factsForTypes = rdfs7 match {
      case Some(d) => spo.select("s", "p", "o")
        .unionByName(d.select(col("s"), col("p"), col("o")))
        .select(col("s"), col("p")("id").as("pid"), col("o"))
      case None => spo.select(col("s"), col("p")("id").as("pid"), col("o"))
    }

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
    if (sc.nonEmpty) {
      val scAll = pairsDf(sc.toSeq ++ scC, "c_a", "c_b").dropDuplicates("c_a", "c_b")
        .select(col("c_a")("id").as("tid"), col("c_b").as("cls"))
      val allTypes = (spo.filter(col("p_id") === typeId).select(col("s"), col("o")) +:
        typeCandidates.map(_.select(col("s"), col("cls").as("o"))))
        .map(graft.engine.DfOps.reid).reduce(_.unionByName(_))
      derived :+= allTypes.select(col("s"), col("o")("id").as("tid"))
        .join(broadcast(scAll), Seq("tid"))
        .select(col("s"), Term.iri(Term.RDF_TYPE).as("p"), col("cls").as("o"))
    }

    if (derived.isEmpty) return store
    // dedup + novelty anti-join in id space: 24-byte keys, not wide term structs
    val keyed = derived.map(d => graft.engine.DfOps.reid(d.select("s", "p", "o")))
      .reduce(_.unionByName(_))
      .withColumn("sk", col("s")("id")).withColumn("pk", col("p")("id"))
      .withColumn("ok", col("o")("id"))
      .dropDuplicates("sk", "pk", "ok")
    val allDerived = keyed.join(
      stmts.select(col("s")("id").as("sk"), col("p_id").as("pk"), col("o")("id").as("ok")),
      Seq("sk", "pk", "ok"), "left_anti")
      .drop("sk", "pk", "ok")
    val inferred = GraftStore.assemble(allDerived
      .withColumn("g", Term.nullTerm)
      .withColumn("stype", lit(GraftStore.STYPE_INFERRED).cast("byte")))
    store.withStatements(store.statements.unionByName(inferred))
  }
}
