package graft.engine

import graft.model.{GraftStore, Term}
import graft.sparql.{Algebra, Parser}
import graft.sparql.Ast._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SPARQL 1.1 UPDATE evaluation (rdf/sparql/ast/eval/AST2BOpUpdate.java:400-450).
  *
  * The reference mutates B+Tree indexes under a group-commit
  * (`rbop/rdf/update/{InsertStatementsOp,RemoveStatementsOp}.java`, `CommitOp`); here a
  * store is an immutable statements DataFrame and each operation produces a NEW store —
  * the Delta-style copy-on-write shape. `DELETE/INSERT WHERE` evaluates its WHERE clause
  * through the full query compiler, instantiates templates per solution, and applies
  * removals via an id-keyed anti-join (the MERGE analog).
  */
object Update {

  def apply(store: GraftStore, updateText: String): GraftStore =
    Parser.parseUpdate(updateText).foldLeft(store)(applyOp)

  def applyOp(store: GraftStore, op: UpdateOp): GraftStore = op match {
    case InsertData(quads) => insert(store, constQuads(store, quads))
    case DeleteData(quads) => delete(store, constQuads(store, quads))
    case ClearGraph(None) => store.withStatements(store.statements.limit(0))
    case ClearDefault =>
      store.withStatements(store.statements.filter(col("g").isNotNull))
    case ClearNamed =>
      store.withStatements(store.statements.filter(col("g").isNull))
    case ClearGraph(Some(g)) =>
      store.withStatements(store.statements.filter(
        col("g").isNull || col("g")("id") =!= TermIds.iriId(g)))
    case Modify(del, ins, where) =>
      val c = new Compiler(store, DatasetSpec.all)
      val sol = c.compile(Algebra.lower(where)).localCheckpoint()
      val s1 = if (del.isEmpty) store else delete(store, instantiate(sol, del))
      if (ins.isEmpty) s1 else insert(s1, instantiate(sol, ins))
  }

  /** Ground quads (no variables) → statements DataFrame. */
  private def constQuads(store: GraftStore, quads: Seq[QuadData]): DataFrame = {
    val rows = quads.map { q =>
      val g = q.g.map(Exprs.constTerm).getOrElse(Term.nullTerm)
      store.spark.range(1).select(
        Exprs.constTerm(q.s).as("s"), Exprs.constTerm(q.p).as("p"),
        Exprs.constTerm(q.o).as("o"), g.as("g"))
    }
    rows.reduce(_.unionByName(_))
  }

  /** Instantiate quad templates once per solution; drop rows with unbound vars. */
  private def instantiate(sol: DataFrame, quads: Seq[QuadData]): DataFrame = {
    val env = Exprs.Env(sol.columns.toSet)
    def nodeCol(n: Node): Column = n match {
      case VarNode(v) => env.termOf(v)
      case other => Exprs.constTerm(other)
    }
    quads.map { q =>
      val g = q.g.map(nodeCol).getOrElse(Term.nullTerm)
      sol.select(nodeCol(q.s).as("s"), nodeCol(q.p).as("p"),
        nodeCol(q.o).as("o"), g.as("g"))
        .filter(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull &&
          col("s")("kind") =!= Term.KIND_LITERAL && col("p")("kind") === Term.KIND_IRI)
    }.map(DfOps.reid).reduce(_.unionByName(_))
  }

  private def statementKey(df: DataFrame): DataFrame =
    df.withColumn("__k", xxhash64(col("s")("id"), col("p")("id"), col("o")("id"),
      coalesce(col("g")("id"), lit(0L))))

  /** Distinct predicate ids of a quad delta — small by construction (an UPDATE touches
    * few predicates); capped so a pathological delta falls back to the full-store path.
    */
  private def deltaPids(quads: DataFrame): Option[Seq[Long]] = {
    val pids = quads.select(col("p")("id")).distinct().limit(1001)
      .collect().map(_.getLong(0)).toSeq
    if (pids.size > 1000) None else Some(pids)
  }

  /** Mutations touch only the delta's p_id partitions: the untouched partitions pass
    * through as plain pruned parquet scans (no hashing, no join), so both the mutation
    * and every later query on other predicates keep partition pruning — the columnar
    * analog of the reference writing only the affected index ranges
    * (`rbop/rdf/update/InsertStatementsOp.java`).
    */
  private def insert(store: GraftStore, quads: DataFrame): GraftStore = {
    val existing = deltaPids(quads) match {
      case Some(pids) => store.statements.filter(col("p_id").isin(pids: _*))
      case None => store.statements
    }
    val fresh = statementKey(quads.dropDuplicates())
      .join(statementKey(existing.select("s", "p", "o", "g")).select("__k"),
        Seq("__k"), "left_anti")
      .drop("__k")
      .withColumn("stype", lit(GraftStore.STYPE_EXPLICIT).cast("byte"))
    store.withStatements(
      store.statements.unionByName(GraftStore.assemble(fresh)))
  }

  private def delete(store: GraftStore, quads: DataFrame): GraftStore = {
    val victims = statementKey(quads).select("__k").dropDuplicates()
    def purge(df: DataFrame): DataFrame =
      statementKey(df).join(victims, Seq("__k"), "left_anti").drop("__k")
    val kept = deltaPids(quads) match {
      case Some(pids) =>
        store.statements.filter(!col("p_id").isin(pids: _*))
          .unionByName(purge(store.statements.filter(col("p_id").isin(pids: _*))))
      case None => purge(store.statements)
    }
    store.withStatements(kept.select(GraftStore.columns.map(col): _*))
  }
}
