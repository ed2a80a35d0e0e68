package graft.sparql

import Ast._

/** Lowering from parsed graph patterns to the SPARQL algebra (W3C SPARQL 1.1 §18.2.2),
  * the same translation the reference performs over its AST
  * (`rdf/sparql/ast/eval/AST2BOpUtility.java:230`, join-group conversion :3113): group
  * elements fold left into joins, OPTIONAL → LeftJoin, MINUS → Minus, FILTERs collect to
  * the end of their group, BIND → Extend, GRAPH pushes a context onto each triple.
  */
object Algebra {

  /** Generalized triple: predicate is a path; graph context resolved. */
  final case class Triple(s: Node, p: Path, o: Node, g: Option[Node])

  sealed trait Op
  case object OpUnit extends Op
  final case class OpBgp(triples: Seq[Triple]) extends Op
  final case class OpJoin(l: Op, r: Op) extends Op
  final case class OpLeftJoin(l: Op, r: Op, cond: Seq[Expr]) extends Op
  final case class OpUnion(l: Op, r: Op) extends Op
  final case class OpMinus(l: Op, r: Op) extends Op
  final case class OpFilter(exprs: Seq[Expr], child: Op) extends Op
  final case class OpExtend(child: Op, name: String, expr: Expr) extends Op
  final case class OpValues(values: ValuesGP) extends Op
  final case class OpSubquery(q: SelectQuery) extends Op
  final case class OpService(iri: Node, inner: Op, silent: Boolean) extends Op
  final case class OpInclude(name: String) extends Op

  def lower(gp: GP): Op = lower(gp, None)

  def lower(gp: GP, ctx: Option[Node]): Op = gp match {
    case t: TripleGP => OpBgp(Seq(Triple(t.s, t.p, t.o, ctx)))
    case GroupGP(elems) => lowerGroup(elems, ctx)
    case OptionalGP(inner) => // handled by lowerGroup; standalone OPTIONAL = LeftJoin(unit,…)
      OpLeftJoin(OpUnit, lower(inner, ctx), Nil)
    case UnionGP(alts) => alts.map(lower(_, ctx)).reduce(OpUnion(_, _))
    case MinusGP(inner) => OpMinus(OpUnit, lower(inner, ctx))
    case FilterGP(e) => OpFilter(Seq(e), OpUnit)
    case BindGP(e, v) => OpExtend(OpUnit, v.name, e)
    case v: ValuesGP => OpValues(v)
    case GraphGP(g, inner) => lower(inner, Some(g))
    case SubSelectGP(q) => OpSubquery(q)
    case ServiceGP(iri, inner, silent) => OpService(iri, lower(inner, ctx), silent)
    case IncludeGP(name) => OpInclude(name)
  }

  private def join(l: Op, r: Op): Op =
    if (l == OpUnit) r else if (r == OpUnit) l else (l, r) match {
      case (OpBgp(a), OpBgp(b)) => OpBgp(a ++ b)
      case _ => OpJoin(l, r)
    }

  private def lowerGroup(elems: Seq[GP], ctx: Option[Node]): Op = {
    var g: Op = OpUnit
    val filters = Seq.newBuilder[Expr]
    elems.foreach {
      case t: TripleGP => g = join(g, lower(t, ctx))
      case FilterGP(e) => filters += e
      case OptionalGP(inner) =>
        lower(inner, ctx) match {
          case OpFilter(fs, a) => g = OpLeftJoin(g, a, fs)
          case a => g = OpLeftJoin(g, a, Nil)
        }
      case MinusGP(inner) => g = OpMinus(g, lower(inner, ctx))
      case BindGP(e, v) =>
        // grammar note 12 (§10.1): the BIND target must not be in-scope from the
        // preceding elements of this group — Blazegraph raises the same error
        if (vars(g).contains(v.name))
          throw new IllegalArgumentException(
            s"BIND(… AS ?${v.name}): variable ?${v.name} already in scope")
        g = OpExtend(g, v.name, e)
      case other => g = join(g, lower(other, ctx))
    }
    val fs = filters.result()
    if (fs.nonEmpty) OpFilter(fs, g) else g
  }

  /** Free variables an Op can bind (for join planning / projection *). */
  def vars(op: Op): Set[String] = op match {
    case OpUnit => Set.empty
    case OpBgp(ts) => ts.flatMap(tripleVars).toSet
    case OpJoin(l, r) => vars(l) ++ vars(r)
    case OpLeftJoin(l, r, _) => vars(l) ++ vars(r)
    case OpUnion(l, r) => vars(l) ++ vars(r)
    case OpMinus(l, _) => vars(l)
    case OpFilter(_, c) => vars(c)
    case OpExtend(c, n, _) => vars(c) + n
    case OpValues(v) => v.vars.map(_.name).toSet
    case OpSubquery(q) => q.projection match {
      case Star => vars(lower(q.where))
      case ProjVars(items) => items.flatMap {
        case (EVar(n), None) => Some(n)
        case (_, a) => a
      }.toSet
    }
    case OpService(_, inner, _) => vars(inner)
    case OpInclude(_) => Set.empty // resolved at compile time from the named set
  }

  /** Vars that may be UNBOUND in some solution of `op` (StaticAnalysis's
    * "maybe produced" vs "definitely produced" distinction,
    * `rdf/sparql/ast/StaticAnalysis.java`). Drives the solution-compatibility join:
    * SPARQL joins rows when shared vars are equal OR unbound on either side; the fast
    * equi-join is only sound for definitely-bound vars. Conservative (over-approximate).
    */
  def maybeUnbound(op: Op): Set[String] = op match {
    case OpUnit => Set.empty
    case OpBgp(_) => Set.empty // triple patterns bind their vars in every row
    case OpJoin(l, r) =>
      (maybeUnbound(l) ++ maybeUnbound(r)) --
        ((vars(l) -- maybeUnbound(l)) ++ (vars(r) -- maybeUnbound(r)))
    case OpLeftJoin(l, r, _) => maybeUnbound(l) ++ (vars(r) -- (vars(l) -- maybeUnbound(l)))
    case OpUnion(l, r) =>
      maybeUnbound(l) ++ maybeUnbound(r) ++
        (vars(l) diff vars(r)) ++ (vars(r) diff vars(l))
    case OpMinus(l, _) => maybeUnbound(l)
    case OpFilter(_, c) => maybeUnbound(c)
    case OpExtend(c, n, e) =>
      // a constant BIND cannot error → definitely bound; anything else may
      e match {
        case EConst(_) => maybeUnbound(c)
        case _ => maybeUnbound(c) + n
      }
    case OpValues(v) =>
      v.vars.map(_.name).zipWithIndex.collect {
        case (n, i) if v.rows.exists(r => r.lift(i).flatten.isEmpty) => n
      }.toSet
    case OpSubquery(q) => q.projection match {
      case Star => maybeUnbound(lower(q.where))
      case ProjVars(items) =>
        val inner = maybeUnbound(lower(q.where))
        items.flatMap {
          case (EVar(n), None) => if (inner(n)) Some(n) else None
          case (EVar(n), Some(a)) => if (inner(n)) Some(a) else None
          case (_, Some(a)) => Some(a) // computed projection may error
          case _ => None
        }.toSet
    }
    case OpService(_, inner, _) => maybeUnbound(inner)
    case OpInclude(_) => Set.empty // named sets: resolved by the compiler's own analysis
  }

  def tripleVars(t: Triple): Seq[String] = {
    val sv = t.s match { case VarNode(n) => Seq(n); case _ => Nil }
    val pv = t.p match { case PLink(i) if i.startsWith("?") => Seq(i.substring(1)); case _ => Nil }
    val ov = t.o match { case VarNode(n) => Seq(n); case _ => Nil }
    val gv = t.g match { case Some(VarNode(n)) => Seq(n); case _ => Nil }
    sv ++ pv ++ ov ++ gv
  }

  /** Collect aggregate sub-expressions (left-to-right). */
  def collectAggs(e: Expr): Seq[EAgg] = e match {
    case a: EAgg => Seq(a)
    case EBinary(_, l, r) => collectAggs(l) ++ collectAggs(r)
    case EUnary(_, x) => collectAggs(x)
    case ECall(_, args) => args.flatMap(collectAggs)
    case EIn(x, list, _) => collectAggs(x) ++ list.flatMap(collectAggs)
    case ESid(a, b, c) => collectAggs(a) ++ collectAggs(b) ++ collectAggs(c)
    case _ => Nil
  }

  /** Substitute variable references by expression (SELECT-alias resolution in HAVING). */
  def substVars(e: Expr, m: Map[String, Expr]): Expr = e match {
    case EVar(n) if m.contains(n) => m(n)
    case EBinary(op, l, r) => EBinary(op, substVars(l, m), substVars(r, m))
    case EUnary(op, x) => EUnary(op, substVars(x, m))
    case ECall(f, args) => ECall(f, args.map(substVars(_, m)))
    case EIn(x, list, not) => EIn(substVars(x, m), list.map(substVars(_, m)), not)
    case ESid(a, b, c) => ESid(substVars(a, m), substVars(b, m), substVars(c, m))
    case other => other
  }

  /** Replace aggregate sub-expressions with variable references (post-grouping eval). */
  def replaceAggs(e: Expr, mapping: Map[EAgg, String]): Expr = e match {
    case a: EAgg => EVar(mapping(a))
    case EBinary(op, l, r) => EBinary(op, replaceAggs(l, mapping), replaceAggs(r, mapping))
    case EUnary(op, x) => EUnary(op, replaceAggs(x, mapping))
    case ECall(f, args) => ECall(f, args.map(replaceAggs(_, mapping)))
    case EIn(x, list, not) => EIn(replaceAggs(x, mapping), list.map(replaceAggs(_, mapping)), not)
    case ESid(a, b, c) => ESid(replaceAggs(a, mapping), replaceAggs(b, mapping), replaceAggs(c, mapping))
    case other => other
  }
}
