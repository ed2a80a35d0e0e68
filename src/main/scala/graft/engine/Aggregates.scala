package graft.engine

import graft.model.Term
import graft.sparql.Ast._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SPARQL aggregates over term structs (rbop/rdf/aggregate/{COUNT,SUM,AVERAGE,MIN,MAX,
  * SAMPLE,GROUP_CONCAT}.java). Spark computes partial+final automatically
  * (HashAggregateExec) — the reference's MemoryGroupByOp vs PipelinedAggregationOp split
  * is free. Error semantics: a group whose input contains a non-numeric value *voids*
  * the SUM/AVG (null term), matching SPARQL "type error voids the aggregate".
  * MIN/MAX/SAMPLE use the SPARQL total order via sort-key structs; GROUP_CONCAT sorts
  * its operands for determinism (SPARQL leaves the order implementation-defined).
  */
object Aggregates {
  import Exprs._

  /** Custom aggregate extension point (the `IAggregate` analog,
    * `bop/aggregate/IAggregate.java`, registered like `FunctionRegistry` factories):
    * an IRI-named builder maps the staged argument term Column (+ DISTINCT flag) to
    * an aggregate term Column, so registered aggregates run inside the same
    * HashAggregateExec partial/final machinery as the built-ins.
    */
  type Builder = (Column, Boolean) => Column
  private val reg = scala.collection.concurrent.TrieMap.empty[String, Builder]
  def register(uri: String, f: Builder): Unit = reg(uri) = f
  def unregister(uri: String): Unit = reg.remove(uri)
  def isRegistered(uri: String): Boolean = reg.contains(uri)

  /** Pre-pass over projection/HAVING/ORDER BY expressions: an IRI function call whose
    * IRI names a registered aggregate becomes an EAgg node (so the grouping machinery
    * sees it); DISTINCT-marked IRI calls were already parsed as EAgg and resolve at
    * compile. Unregistered IRI calls stay scalar (cast/function semantics).
    */
  def resolveCustom(e: Expr): Expr = e match {
    case ECall(fn, args) if fn.startsWith("CAST:") && reg.contains(fn.stripPrefix("CAST:")) =>
      EAgg("CUSTOM:" + fn.stripPrefix("CAST:"), distinct = false,
        args.headOption.map(resolveCustom))
    case ECall(fn, args) => ECall(fn, args.map(resolveCustom))
    case EBinary(op, l, r) => EBinary(op, resolveCustom(l), resolveCustom(r))
    case EUnary(op, x) => EUnary(op, resolveCustom(x))
    case EIn(x, list, not) => EIn(resolveCustom(x), list.map(resolveCustom), not)
    case EAgg(fn, d, arg, sep) => EAgg(fn, d, arg.map(resolveCustom), sep)
    case other => other
  }

  def compile(a: EAgg, env: Exprs.Env, allCols: Seq[String]): Column = a.fn match {
    case "COUNT" => a.arg match {
      case None =>
        val c =
          if (a.distinct) countDistinct(struct(allCols.map(col): _*))
          else count(lit(1))
        Term.intLit(c)
      case Some(e) =>
        val t = Exprs.term(e, env)
        Term.intLit(if (a.distinct) countDistinct(t) else count(t))
    }

    case "SUM" =>
      val t = Exprs.term(a.arg.get, env)
      val bad = coalesce(max(when(t.isNotNull && fNum(t).isNull, 1).otherwise(0)), lit(0)) === 1
      // xsd promotion over the whole group (SUM.java:53): all-integer → integer;
      // integer/decimal mix → exact decimal; any float-family (or boolean) → double.
      // Sum({}) = "0"^^xsd:integer per SPARQL — the empty group takes the integer path.
      val nonInt = coalesce(
        max(when(t.isNotNull && (fDt(t).isNull || fDt(t) =!= Term.XSD_INTEGER), 1)
          .otherwise(0)), lit(0)) === 1
      val nonExact = coalesce(
        max(when(t.isNotNull && fNum(t).isNotNull && !isExact(t), 1).otherwise(0)),
        lit(0)) === 1
      val sumL = if (a.distinct) sum_distinct(fLng(t)) else sum(fLng(t))
      val sumDec = if (a.distinct) sum_distinct(fDec(t)) else sum(fDec(t))
      val sumD = if (a.distinct) sum_distinct(fNum(t)) else sum(fNum(t))
      when(bad, Term.nullTerm)
        // non-empty group where the argument is unbound on EVERY row: a multiset of
        // errors, so the aggregate errors (≠ the empty group, which is 0)
        .when(count(lit(1)) > 0 && count(t) === 0, Term.nullTerm)
        .when(!nonInt, Term.intLit(coalesce(sumL, lit(0L))))
        .when(!nonExact, Term.decimalLit(coalesce(sumDec, lit(0).cast(Term.DECIMAL_TYPE))))
        .otherwise(Term.doubleLit(coalesce(sumD, lit(0.0))))

    case "AVG" =>
      val t = Exprs.term(a.arg.get, env)
      val bad = coalesce(max(when(t.isNotNull && fNum(t).isNull, 1).otherwise(0)), lit(0)) === 1
      val nonExact = coalesce(
        max(when(t.isNotNull && fNum(t).isNotNull && !isExact(t), 1).otherwise(0)),
        lit(0)) === 1
      val v =
        if (a.distinct) sum_distinct(fNum(t)) / countDistinct(fNum(t))
        else avg(fNum(t))
      // exact path: AVG over integers/decimals is an exact decimal (the sum is
      // order-independent; the final ÷count rounds once at scale 18)
      val vDec =
        if (a.distinct) sum_distinct(fDec(t)) / countDistinct(fDec(t))
        else avg(fDec(t))
      when(bad, Term.nullTerm)
        .when(count(lit(1)) === 0, Term.intLit(lit(0L))) // Avg({}) = 0 per SPARQL
        .when(count(t) === 0, Term.nullTerm) // non-empty but all-unbound: error
        .when(!nonExact, Term.decimalLit(vDec))
        .otherwise(Term.doubleLit(v))

    case "MIN" | "MAX" | "SAMPLE" =>
      val t = Exprs.term(a.arg.get, env)
      val kv = when(t.isNotNull, struct(Exprs.sortKey(t).as("k"), t.as("t")))
        .otherwise(lit(null))
      val picked = if (a.fn == "MAX") max(kv) else min(kv)
      picked.getField("t")

    case "GROUP_CONCAT" =>
      val t = Exprs.term(a.arg.get, env)
      val strs = if (a.distinct) collect_set(fStr(t)) else collect_list(fStr(t))
      Term.strLit(array_join(array_sort(strs), a.sep.getOrElse(" ")))

    case custom if custom.startsWith("CUSTOM:") =>
      val uri = custom.stripPrefix("CUSTOM:")
      val f = reg.getOrElse(uri,
        throw new UnsupportedOperationException(s"no aggregate registered for <$uri>"))
      f(Exprs.term(a.arg.getOrElse(
        throw new IllegalArgumentException(s"<$uri> needs an argument")), env), a.distinct)

    case other => throw new UnsupportedOperationException(s"aggregate $other")
  }
}
