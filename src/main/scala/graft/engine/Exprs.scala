package graft.engine

import graft.model.Term
import graft.sparql.Ast._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SPARQL value-expression compiler: AST expression → Catalyst Column over term structs.
  *
  * Replaces the reference's ~80 `IVValueExpression` classes
  * (`rdf/internal/constraints/` — CompareBOp.java:59, MathBOp.java, StrBOp.java, …) with
  * builders over built-in codegen'd Catalyst expressions. The pervasive SPARQL rule
  * (`SparqlTypeErrorBOp.java`): a *type error* is not an exception — in FILTER it makes
  * the condition false, in BIND it leaves the var unbound, in aggregates it voids the
  * value. Here: error = NULL term / NULL boolean; FILTER wraps with
  * `coalesce(ebv, false)` (the EBVBOp analog).
  */
/** Custom scalar-function registry — the `FunctionRegistry.add(URI, Factory)`
  * extension point (`rdf/sparql/ast/FunctionRegistry.java`): an IRI-named function in
  * a query resolves here first, then falls back to the xsd-cast built-ins. A builder
  * maps term-struct argument Columns to a term-struct result Column, so registered
  * functions stay inside Catalyst codegen like every built-in.
  */
object Functions {
  private val reg =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Column] => Column]
  def register(uri: String, f: Seq[Column] => Column): Unit = reg(uri) = f
  def unregister(uri: String): Unit = reg.remove(uri)
  private[engine] def get(uri: String): Option[Seq[Column] => Column] = reg.get(uri)
}

object Exprs {

  private def nullB: Column = lit(null).cast(BooleanType)

  // ---- term field accessors ----
  def fId(t: Column): Column = t.getField("id")
  def fKind(t: Column): Column = t.getField("kind")
  def fStr(t: Column): Column = t.getField("str")
  def fDt(t: Column): Column = t.getField("dt")
  def fLang(t: Column): Column = t.getField("lang")
  def fNum(t: Column): Column = t.getField("num")
  def fLng(t: Column): Column = t.getField("lng")
  def fTs(t: Column): Column = t.getField("ts")

  def isLiteral(t: Column): Column = fKind(t) === Term.KIND_LITERAL
  // num is populated for xsd:boolean too (the 0/1 value mirrors lng) — but
  // booleans are NOT numeric operands (MathUtility raises a type error;
  // SPARQL isNumeric(true) is false), so the arithmetic/ISNUMERIC gate
  // excludes them while value-compare paths (bothNum) keep the raw check
  def isNumericT(t: Column): Column =
    fNum(t).isNotNull && !(fDt(t) <=> lit(Term.XSD_BOOLEAN))
  private def isPlainStr(t: Column): Column = isLiteral(t) && fDt(t).isNull && fLang(t).isNull
  private def isStringy(t: Column): Column = isLiteral(t) && fDt(t).isNull
  /** fn argument compatibility (SPARQL §17.4.3.1.1): (simple,simple), (lang,simple),
    * (lang@X,lang@X) are compatible; (simple,lang) and (lang@X,lang@Y) are type errors.
    */
  private def argCompat(l: Column, r: Column): Column =
    isStringy(l) && isStringy(r) && (fLang(r).isNull || fLang(r) === fLang(l))
  private def isBool(t: Column): Column = fDt(t) === Term.XSD_BOOLEAN
  private def isDateTime(t: Column): Column = fTs(t).isNotNull
  // lng is populated for the integer family — xsd:integer literals and
  // packed-long extension datatypes (compressedTimestamp), which join integer
  // arithmetic/promotion through their delegate's number space — but ALSO for
  // xsd:boolean (lng mirrors the 0/1 value), which the reference's MathUtility
  // rejects from arithmetic; guard it out of the exact paths explicitly
  private def isInt(t: Column): Column =
    fLng(t).isNotNull && !(fDt(t) <=> lit(Term.XSD_BOOLEAN))
  private[engine] def isDec(t: Column): Column = fDt(t) === Term.XSD_DECIMAL
  /** Exact-arithmetic types (xsd:integer / xsd:decimal) — BigDecimal-promoted in the
    * reference's MathUtility; here they compute in DecimalType(38,18).
    */
  private[engine] def isExact(t: Column): Column = isInt(t) || isDec(t)
  /** Exact decimal value of an integer/decimal literal (null for other terms).
    * Decimals re-derive from the canonical lexical form — `num` is only the
    * double approximation.
    */
  private[engine] def fDec(t: Column): Column =
    when(isInt(t), fLng(t).cast(Term.DECIMAL_TYPE))
      .when(isDec(t), fStr(t).try_cast(Term.DECIMAL_TYPE))
      .otherwise(lit(null).cast(Term.DECIMAL_TYPE))

  /** Constant node → term Column (canonical construction — see Term scaladoc). */
  def constTerm(n: Node): Column = n match {
    case IriNode(i) => Term.iri(i)
    case LitNode(lex, Some(Term.XSD_INTEGER), _) if scala.util.Try(lex.toLong).isSuccess =>
      Term.intLit(lit(lex.toLong))
    case LitNode(lex, Some(Term.XSD_INTEGER), _)
        if lex.replaceFirst("^[+-]", "").length <= 38 =>
      // beyond-long xsd:integer (arbitrary precision per XSD): carries its exact
      // lexical + a double approximation for compares; exact arithmetic re-derives
      // a decimal from the lexical when it fits decimal(38). Wider than 38 digits
      // falls to the opaque typed-literal branch (a lit() of a >38-digit
      // BigDecimal is a plan-time error), matching the loader's d36 bound.
      Term.intLitAs(Term.XSD_INTEGER, lit(new java.math.BigDecimal(lex)))
    case LitNode(lex, Some(Term.XSD_DOUBLE), _) => Term.doubleLit(lit(lex.toDouble))
    case LitNode(lex, Some(Term.XSD_DECIMAL), _) =>
      Term.decimalLit(lit(new java.math.BigDecimal(lex)).cast(Term.DECIMAL_TYPE))
    case LitNode(lex, Some(Term.XSD_BOOLEAN), _) => Term.boolLit(lit(lex == "true"))
    case LitNode(lex, Some(Term.XSD_DATETIME), _) =>
      Term.tsLit(to_timestamp(regexp_replace(lit(lex), "Z$", "")))
    case LitNode(lex, Some(Term.XSD_DATE), _) if lex.matches(Term.DATE_RE) =>
      Term.dateTerm(lit(lex))
    case LitNode(lex, Some(dt), _)
        if dt.startsWith(Term.XSD) && Term.INT_RANGES.contains(dt.substring(Term.XSD.length)) &&
           lex.matches("[+-]?[0-9]+") && {
             val (lo, hi) = Term.INT_RANGES(dt.substring(Term.XSD.length))
             val v = BigDecimal(lex)
             lo.forall(v >= _) && hi.forall(v <= _)
           } =>
      // bounded integer-family constant keeps its authored datatype with
      // inlined num/lng (out-of-range falls through to the opaque branch)
      Term.intLitAs(dt, lit(new java.math.BigDecimal(lex)))
    case LitNode(lex, Some(dt), _) => Term.typedLit(lit(lex), dt)
    case LitNode(lex, None, Some(lang)) => Term.strLit(lit(lex), lit(lang))
    case LitNode(lex, None, None) => Term.strLit(lit(lex))
    case SidNode(s, p, o) => Term.sid(constTerm(s), constTerm(p), constTerm(o))
    case VarNode(n2) => throw new IllegalArgumentException(s"variable ?$n2 is not a constant")
  }

  /** Effective boolean value of a term column (EBVBOp.java semantics). */
  def ebvOfTerm(t: Column): Column =
    when(t.isNull, nullB)
      .when(isBool(t), fNum(t) =!= 0.0)
      .when(isNumericT(t), !isnan(fNum(t)) && (fNum(t) =!= 0.0))
      .when(isStringy(t), length(fStr(t)) > 0)
      .otherwise(nullB)

  /** Boolean → boolean-literal term (null-propagating). */
  def boolTerm(b: Column): Column = when(b.isNotNull, Term.boolLit(b)).otherwise(Term.nullTerm)

  // ---- comparison (CompareBOp.java:59 — type promotion; type error ≠ false) ----
  private def bothNum(l: Column, r: Column) = fNum(l).isNotNull && fNum(r).isNotNull
  private def bothStr(l: Column, r: Column) = isStringy(l) && isStringy(r)
  private def bothTs(l: Column, r: Column) = isDateTime(l) && isDateTime(r)
  private def bothBool(l: Column, r: Column) = isBool(l) && isBool(r)

  // value presence required: an ILL-TYPED "xyz"^^xsd:integer has an exact datatype
  // but no value — it must fall through to the term-identity/type-error branches
  private def bothExact(l: Column, r: Column) =
    isExact(l) && isExact(r) && fDec(l).isNotNull && fDec(r).isNotNull

  def eqTerm(l: Column, r: Column): Column =
    when(l.isNull || r.isNull, nullB)
      // integer/decimal pairs compare exactly (no double round-trip: 2^53+1 ≠ 2^53)
      .when(bothExact(l, r), fDec(l) === fDec(r))
      .when(bothNum(l, r), fNum(l) === fNum(r))
      .when(bothTs(l, r), fTs(l) === fTs(r))
      .when(bothStr(l, r), fStr(l) === fStr(r) && coalesce(fLang(l), lit("")) === coalesce(fLang(r), lit("")))
      .when(fId(l) === fId(r), lit(true)) // identical terms (any kind)
      .when(fKind(l) =!= Term.KIND_LITERAL || fKind(r) =!= Term.KIND_LITERAL, lit(false))
      // a lang-tagged literal equals only the identical term — plain FALSE against
      // anything else, never a type error (Sesame compareLiterals via CompareBOp;
      // W3C open-eq-12 errors only on ill-typed/unknown-datatype comparisons)
      .when(fLang(l).isNotNull || fLang(r).isNotNull, lit(false))
      .when(fDt(l) === fDt(r), fStr(l) === fStr(r)) // same unknown datatype: compare lexical
      .otherwise(nullB) // incomparable literal datatypes → type error

  /** Three-way compare for <,<=,>,>=: null = type error / incomparable. */
  def cmpTerm(l: Column, r: Column): Column = {
    val nullI = lit(null).cast(IntegerType)
    def sgn(c: Column): Column = when(c < 0, -1).when(c > 0, 1).otherwise(0)
    when(l.isNull || r.isNull, nullI)
      .when(bothExact(l, r),
        when(fDec(l) === fDec(r), 0).when(fDec(l) < fDec(r), -1).otherwise(1))
      .when(bothNum(l, r), sgn(fNum(l) - fNum(r)).cast(IntegerType))
      .when(bothTs(l, r), sgn(fTs(l).cast(LongType) - fTs(r).cast(LongType)).cast(IntegerType))
      .when(bothStr(l, r),
        when(fStr(l) === fStr(r), 0).when(fStr(l) < fStr(r), -1).otherwise(1))
      .when(bothBool(l, r), sgn(fNum(l) - fNum(r)).cast(IntegerType))
      .otherwise(nullI)
  }

  // ---- arithmetic (MathBOp.java / MathUtility.java xsd promotion) ----
  /** IEEE-754 double arithmetic over the operands' `num` fields: x/0 → ±INF,
    * 0/0 → NaN (ANSI-mode Divide throws DIVIDE_BY_ZERO for every numeric type,
    * so the INF/NaN results are reconstructed from the operand signs around
    * try_divide). Shared by the general promotion chain and the static-double
    * fast path.
    */
  private def arithNum(op: String, l: Column, r: Column): Column = op match {
    case "+" => fNum(l) + fNum(r)
    case "-" => fNum(l) - fNum(r)
    case "*" => fNum(l) * fNum(r)
    case "/" =>
      // CAST(-0.0 AS STRING) = "-0.0": the sign bit of a zero divisor survives the
      // string cast (Spark's atan2 normalizes -0.0 away, so that trick fails)
      val divNeg = fNum(r).cast(StringType).startsWith("-")
      when(fNum(r) =!= 0.0, try_divide(fNum(l), fNum(r)))
        .when(fNum(l) > 0.0,
          when(divNeg, lit(Double.NegativeInfinity)).otherwise(lit(Double.PositiveInfinity)))
        .when(fNum(l) < 0.0,
          when(divNeg, lit(Double.PositiveInfinity)).otherwise(lit(Double.NegativeInfinity)))
        .otherwise(lit(Double.NaN))
  }

  /** xsd promotion (MathBOp): when EITHER operand is statically an xsd:double,
    * a successful result is an xsd:double — the integer (`bothInt`) and exact
    * (`bothExact`) branches of the general chain are statically false, so this
    * emits ONLY the double branch. Catalyst tree ~3× smaller per arithmetic
    * node (the three-way mint when-chain is the bulk of a BIND's plan), and
    * the per-row `bothExact` probe — which parses the operands' lexical forms
    * as decimals — never runs. Error/unbound outcomes are identical to the
    * general chain: non-numeric or null operands → nullTerm either way.
    */
  def arithDouble(op: String, l: Column, r: Column): Column = {
    val num = arithNum(op, l, r)
    when(l.isNull || r.isNull || !(isNumericT(l) && isNumericT(r)), Term.nullTerm)
      .when(num.isNotNull, Term.doubleLit(num))
      .otherwise(Term.nullTerm)
  }

  def arith(op: String, l: Column, r: Column): Column = {
    val bothInt = isInt(l) && isInt(r)
    val num = arithNum(op, l, r)
    // long path must not abort the query under ANSI mode: try_* yields NULL on
    // overflow, which falls through to the double (promoted) result
    val lngOp = op match {
      case "+" => try_add(fLng(l), fLng(r))
      case "-" => try_subtract(fLng(l), fLng(r))
      case "*" => try_multiply(fLng(l), fLng(r))
      case "/" => lit(null).cast(LongType) // int/int → xsd:decimal (exact path below)
    }
    val intCase = if (op == "/") lit(false) else bothInt && lngOp.isNotNull
    // exact path: integer/decimal operands compute in DecimalType(38,18) — the
    // MathUtility BigDecimal promotion (note: Spark's decimal division/multiply
    // reduce the result scale to keep 38 digits of precision; ÷0 and overflow
    // fall out of try_* as NULL → SPARQL type error)
    val decRes = (op match {
      case "+" => try_add(fDec(l), fDec(r))
      case "-" => try_subtract(fDec(l), fDec(r))
      case "*" => try_multiply(fDec(l), fDec(r))
      case "/" => try_divide(fDec(l), fDec(r))
    }).try_cast(Term.DECIMAL_TYPE)
    val exactCase = bothExact(l, r)
    // isNumericT (not bothNum): xsd:boolean operands are a type error here
    when(l.isNull || r.isNull || !(isNumericT(l) && isNumericT(r)), Term.nullTerm)
      .when(intCase, Term.intLit(lngOp))
      .when(exactCase && decRes.isNotNull, Term.decimalLit(decRes))
      .when(exactCase, Term.nullTerm) // exact-type ÷0 / overflow → type error
      .when(num.isNotNull, Term.doubleLit(num))
      .otherwise(Term.nullTerm)
  }

  /** `hint:Query hint:regexMatchNonString "true"` (QueryHints.java
    * REGEX_MATCH_NON_STRING): scoped per-query around plan construction.
    */
  val regexMatchNonString = new scala.util.DynamicVariable[Boolean](false)

  // ---- the SPARQL total order (bop/solutions/IVComparator.java:68) ----
  private val calendarDts: Seq[String] =
    Seq("dateTime", "date", "time", "gYearMonth", "gMonthDay", "gYear", "gMonth", "gDay")
      .map(Term.XSD + _)

  /** Sort-key struct: unbound < bnode < IRI < literal. Literal sub-order follows
    * the reference IVComparator (bop/solutions/IVComparator.java:207, the Sesame
    * ValueComparator fallback): null-datatype literals (simple + lang-tagged,
    * simple first, then by lang tag) < numerics by value < calendar types by
    * instant < other datatyped literals by datatype IRI then label — so e.g.
    * MAX over {"bigdata"@en, 3} is 3 (TestTickets aggregate-max2: plain/lang
    * sort BEFORE datatyped, numerics before non-numeric datatypes). DataFrames
    * take no custom comparator, so the order is materialized as a
    * lexicographically-ordered struct column.
    */
  def sortKey(t: Column): Column = {
    val isCal = fTs(t).isNotNull || fDt(t).isin(calendarDts: _*)
    val r1 = when(isStringy(t), 0).when(fNum(t).isNotNull, 1)
      .when(isCal, 2).otherwise(3)
    struct(
      when(t.isNull, 0).when(fKind(t) === Term.KIND_BNODE, 1)
        .when(fKind(t) === Term.KIND_IRI, 2).otherwise(3).as("r0"),
      r1.as("r1"),
      // bucket-local primary key: lang tag for the plain/lang bucket (simple
      // literals first), datatype IRI for the other-datatyped bucket
      when(isStringy(t), coalesce(fLang(t), lit("")))
        .when(r1 === 3, coalesce(fDt(t), lit(""))).otherwise("").as("k"),
      coalesce(fNum(t), fTs(t).cast(DoubleType)).as("v"),
      fStr(t).as("s"),
      fDt(t).as("d"),
      // language tag completes the total order: "a" vs "a"@en must not tie —
      // a tie would leave ORDER BY free to interleave them differently across runs
      fLang(t).as("l"))
  }

  // ======== expression compilation ========
  /** `kinds` carries statically-inferred result kinds for staged temp columns
    * (see staticDouble / stageSubexprs) — "double" means: if the column is a
    * non-error result, it is an xsd:double literal.
    */
  final case class Env(columns: Set[String], overrides: Map[String, Column] = Map.empty,
                       kinds: Map[String, String] = Map.empty) {
    def termOf(name: String): Column =
      overrides.getOrElse(name,
        if (columns(name)) col(quoted(name)) else Term.nullTerm)
  }
  private def quoted(name: String): String = "`" + name + "`"

  /** Statically-known double-ness of an expression's SUCCESSFUL result: true
    * means "if this evaluates without a type error, the value is an xsd:double
    * literal" (errors/unbound are unaffected — callers keep their guards).
    * Drives the slim arithmetic mint: per MathBOp promotion, one double
    * operand fixes the result type regardless of the other operand's runtime
    * kind. FLOOR/CEIL/ABS preserve the argument's type; ROUND does NOT (a
    * double rounds to an INTEGRAL numeric here — MathUtility Math.round →
    * long), so it must not propagate.
    */
  private def staticDouble(e: Expr, env: Env): Boolean = e match {
    case EConst(LitNode(_, Some(Term.XSD_DOUBLE), _)) => true // xsd:float is NOT double
    case EVar(n) => env.kinds.get(n).contains("double")
    case EBinary("+" | "-" | "*" | "/", l, r) =>
      staticDouble(l, env) || staticDouble(r, env)
    case EUnary("-", x) => staticDouble(x, env)
    case ECall("FLOOR" | "CEIL" | "ABS", Seq(a)) => staticDouble(a, env)
    case _ => false
  }

  /** Compile to a term-struct Column. */
  def term(e: Expr, env: Env): Column = e match {
    case EVar(n) => env.termOf(n)
    case EConst(n) => constTerm(n)
    case EBinary("&&" | "||" | "=" | "!=" | "<" | "<=" | ">" | ">=", _, _) =>
      boolTerm(bool(e, env))
    case EBinary(op, l, r) =>
      if (staticDouble(e, env)) arithDouble(op, term(l, env), term(r, env))
      else arith(op, term(l, env), term(r, env))
    case EUnary("!", _) => boolTerm(bool(e, env))
    case EUnary("-", x) if staticDouble(x, env) =>
      val t = term(x, env)
      when(isNumericT(t), Term.doubleLit(-fNum(t))).otherwise(Term.nullTerm)
    case EUnary("-", x) =>
      val t = term(x, env)
      val negLng = try_subtract(lit(0L), fLng(t)) // Long.MinValue negation overflows under ANSI
      when(isNumericT(t),
        when(isInt(t) && negLng.isNotNull, Term.intLit(negLng))
          .when(isDec(t), Term.decimalLit(-fDec(t)))
          .otherwise(Term.doubleLit(-fNum(t))))
        .otherwise(Term.nullTerm)
    case EIn(_, _, _) => boolTerm(bool(e, env))
    case ESid(s, p, o) => Term.sid(term(s, env), term(p, env), term(o, env))
    case ECall(fn, args) => call(fn, args, env)
    case EExists(_, _) =>
      throw new UnsupportedOperationException("EXISTS only supported directly under FILTER")
    case _: EAgg =>
      throw new IllegalStateException("aggregate outside aggregation context")
  }

  /** Compile to a nullable Boolean Column (null = error). */
  def bool(e: Expr, env: Env): Column = e match {
    case EBinary("&&", l, r) => bool(l, env) && bool(r, env)
    case EBinary("||", l, r) => bool(l, env) || bool(r, env)
    case EUnary("!", x) => !bool(x, env)
    case EBinary("=", l, r) => eqTerm(term(l, env), term(r, env))
    case EBinary("!=", l, r) => !eqTerm(term(l, env), term(r, env))
    case EBinary("<", l, r) => cmpTerm(term(l, env), term(r, env)) < 0
    case EBinary("<=", l, r) => cmpTerm(term(l, env), term(r, env)) <= 0
    case EBinary(">", l, r) => cmpTerm(term(l, env), term(r, env)) > 0
    case EBinary(">=", l, r) => cmpTerm(term(l, env), term(r, env)) >= 0
    case EIn(x, list, not) =>
      // IN = (t=e1) || (t=e2) || … with SPARQL || error semantics (Kleene null):
      // any true → true, else any error → error, else false. NOT IN negates, so
      // an erroring member with no match poisons the row (17.4.1.9/10).
      val t = term(x, env)
      val anyEq = list.map(i => eqTerm(t, term(i, env)))
        .reduceOption(_ || _).getOrElse(lit(false))
      if (not) !anyEq else anyEq
    case other => ebvOfTerm(term(other, env))
  }

  /** FILTER predicate: errors become false (SPARQLConstraint + EBVBOp). */
  def filterPred(e: Expr, env: Env): Column = coalesce(bool(e, env), lit(false))

  // ---- nested-expression staging ----
  /** Result of staging: the augmented frame, the rewritten AST (nested heavy nodes
    * replaced by temp-column vars), the env that resolves them, and the temp names
    * to drop once the outer expression is applied.
    */
  final case class Staged(df: org.apache.spark.sql.DataFrame, expr: Expr, env: Env,
                          temps: Seq[String])

  private val stageIds = new java.util.concurrent.atomic.AtomicLong()

  /** Heavy = compiles to a term-struct `when`-chain that references each operand
    * many times (arith ~20×, casts/functions ~5×). Inlining such nodes inside one
    * another multiplies Catalyst tree size per nesting level (a 4-deep arithmetic
    * BIND exceeds an 8 GB driver heap at PLAN time); staging keeps it linear.
    */
  private def isHeavy(e: Expr): Boolean = e match {
    case EBinary("&&" | "||" | "=" | "!=" | "<" | "<=" | ">" | ">=", _, _) => false
    case _: EBinary => true
    case EUnary("-", _) => true
    case _: ECall => true
    case _ => false
  }

  /** Rewrite `e` so every NESTED heavy sub-expression is materialized as an
    * intermediate projection column on `df` (bottom-up, so temps may reference
    * earlier temps). Downstream Projects reference temps by name — Catalyst's
    * CollapseProject keeps multi-use non-cheap aliases staged, so the final plan
    * is a short pipeline of narrow Projects instead of one multiplicative tree.
    * Eager evaluation of staged IF/COALESCE branches is semantics-preserving:
    * every error path here is a NULL (try_* arithmetic), never an exception.
    */
  def stageSubexprs(df0: org.apache.spark.sql.DataFrame, e: Expr, env0: Env): Staged = {
    var df = df0; var env = env0; var temps = List.empty[String]
    def alias(x: Expr): Expr = {
      val name = s"__stg${stageIds.incrementAndGet()}"
      // static kind survives the temp-column rewrite: the outer expression's
      // EVar(name) resolves the staged node's double-ness through env.kinds,
      // so a BIND chain of double arithmetic plans slim mints end to end
      val k = if (staticDouble(x, env)) Map(name -> "double") else Map.empty[String, String]
      df = df.withColumn(name, term(x, env))
      env = env.copy(columns = env.columns + name, kinds = env.kinds ++ k)
      temps ::= name
      EVar(name)
    }
    def walk(x: Expr, root: Boolean): Expr = x match {
      case EBinary(op, l, r) =>
        val x2 = EBinary(op, walk(l, root = false), walk(r, root = false))
        if (!root && isHeavy(x2)) alias(x2) else x2
      case EUnary(op, v) =>
        val x2 = EUnary(op, walk(v, root = false))
        if (!root && isHeavy(x2)) alias(x2) else x2
      // BOUND inspects its argument's AST (variable vs expression) — leave intact.
      // Constant args (REGEX patterns, SUBSTR bounds) are not heavy, so positional
      // constant-reading builtins still see their EConst nodes.
      case ECall(fn, args) if fn != "BOUND" =>
        val x2 = ECall(fn, args.map(walk(_, root = false)))
        if (!root) alias(x2) else x2
      case EIn(v, list, not) => EIn(walk(v, root = false), list.map(walk(_, root = false)), not)
      case other => other // EVar, EConst, EExists, EAgg (replaced upstream)
    }
    val e2 = walk(e, root = true)
    Staged(df, e2, env, temps.reverse)
  }

  /** Filter a staged predicate WITHOUT letting the optimizer re-inline the
    * staged temps into the condition. `PushPredicateThroughProject` substitutes
    * a Project alias into EVERY reference the pushed condition makes to it, and
    * a term predicate references each operand ~10–25× (cmp/arith promotion
    * branches) — so pushing a staged HAVING/FILTER through its own staging
    * Projects re-expands the tree multiplicatively, and the fused filter method
    * blows past the JVM's 64 KB bytecode ceiling (observed: a HashAggregate
    * output + staged HAVING compiled 191 decimal temps into one method and the
    * whole stage silently fell back to interpreted eval). A non-deterministic
    * guard column (a plain partition counter, no RNG) makes the staging Project
    * a pushdown fence; guard and temps are dropped right after the filter.
    * Fencing costs nothing here: the predicate already sits directly above the
    * projection that feeds it, and a multi-temp predicate is never sargable.
    */
  def filterStaged(st: Staged): org.apache.spark.sql.DataFrame =
    if (st.temps.isEmpty) st.df.filter(filterPred(st.expr, st.env))
    else {
      val g = s"__fence${stageIds.incrementAndGet()}"
      // the guard must be REFERENCED by the condition (ColumnPruning removes an
      // unused column and dissolves the fence) and joined with OR, never AND
      // (PushDownPredicates splits conjuncts and would push the real predicate
      // alone). mono_id is always >= 0, so the disjunct never fires.
      st.df.withColumn(g, monotonically_increasing_id())
        .filter(filterPred(st.expr, st.env) || col(g) < 0L)
        .drop(g)
    }

  // ---- function library (registry analog of rdf/sparql/ast/FunctionRegistry.java) ----
  private def str1(args: Seq[Column]): Column = fStr(args.head)

  def call(fn: String, argEs: Seq[Expr], env: Env): Column = {
    lazy val args = argEs.map(term(_, env))
    def a0 = args.head
    def a1 = args(1)
    def strFn(result: Column, guard: Column = lit(true)): Column =
      when(a0.isNotNull && isLiteral(a0) && guard, Term.strLit(result, fLang(a0)))
        .otherwise(Term.nullTerm)
    fn match {
      case "BOUND" => argEs.head match {
        case EVar(n) if env.columns(n) => boolTerm(col("`" + n + "`").isNotNull)
        case EVar(_) => boolTerm(lit(false)) // var never bound anywhere in scope
        case _ => boolTerm(args.head.isNotNull)
      }
      case "COALESCE" => coalesce(args: _*)
      case "IF" =>
        val c = bool(argEs.head, env)
        when(c.isNull, Term.nullTerm).when(c, term(argEs(1), env)).otherwise(term(argEs(2), env))
      case "SAMETERM" => boolTerm(when(a0.isNull || a1.isNull, nullB).otherwise(fId(a0) === fId(a1)))
      case "ISIRI" | "ISURI" => boolTerm(when(a0.isNull, nullB).otherwise(fKind(a0) === Term.KIND_IRI))
      case "ISBLANK" => boolTerm(when(a0.isNull, nullB).otherwise(fKind(a0) === Term.KIND_BNODE))
      case "ISLITERAL" => boolTerm(when(a0.isNull, nullB).otherwise(isLiteral(a0)))
      case "ISNUMERIC" => boolTerm(when(a0.isNull, nullB).otherwise(isNumericT(a0)))
      case "STR" => when(a0.isNull, Term.nullTerm)
        .when(fKind(a0) === Term.KIND_BNODE, Term.nullTerm)
        // dateTimes materialize through their UTC instant (DateTimeExtension
        // asValue — the reference's STR is the rematerialized form, regardless
        // of the authored zone, which stays in the lexical for sameTerm/TZ)
        .when(isDateTime(a0) && fTs(a0).isNotNull, Term.strLit(Term.tsLex(fTs(a0))))
        .otherwise(Term.strLit(fStr(a0)))
      case "LANG" => when(a0.isNotNull && isLiteral(a0), Term.strLit(coalesce(fLang(a0), lit(""))))
        .otherwise(Term.nullTerm)
      case "DATATYPE" =>
        when(a0.isNotNull && isLiteral(a0),
          Term.iri(when(fLang(a0).isNotNull, Term.RDF + "langString")
            .otherwise(coalesce(fDt(a0), lit(Term.XSD_STRING)))))
          .otherwise(Term.nullTerm)
      case "IRI" | "URI" => when(a0.isNotNull && (fKind(a0) === Term.KIND_IRI || isStringy(a0)),
        Term.iri(fStr(a0))).otherwise(Term.nullTerm)
      case "BNODE" => Term.bnode(expr("uuid()"))
      case "STRDT" => strdt(a0, argEs(1))
      case "STRLANG" => when(isPlainStr(a0) && isStringy(a1), Term.strLit(fStr(a0), lower(fStr(a1))))
        .otherwise(Term.nullTerm)
      case "STRLEN" => when(a0.isNotNull && isStringy(a0), Term.intLit(length(fStr(a0))))
        .otherwise(Term.nullTerm)
      case "SUBSTR" =>
        val start = fLng(a1).cast(IntegerType)
        val len = if (args.size > 2) fLng(args(2)).cast(IntegerType)
          else length(fStr(a0)) - start + 1
        strFn(fStr(a0).substr(start, len))
      case "UCASE" => strFn(upper(fStr(a0)))
      case "LCASE" => strFn(lower(fStr(a0)))
      // fn argument compatibility (§17.4.3.1.1): both stringy AND the second arg's
      // lang tag, if any, must equal the first's ("foo"@en vs "f"@cy → type error)
      case "STRSTARTS" => boolTerm(when(argCompat(a0, a1),
        fStr(a0).startsWith(fStr(a1))).otherwise(nullB))
      case "STRENDS" => boolTerm(when(argCompat(a0, a1),
        fStr(a0).endsWith(fStr(a1))).otherwise(nullB))
      case "CONTAINS" => boolTerm(when(argCompat(a0, a1),
        fStr(a0).contains(fStr(a1))).otherwise(nullB))
      case "STRBEFORE" =>
        // a matched (incl. empty-pattern) result carries arg1's lang; a non-match
        // yields the SIMPLE empty literal (spec examples, §17.4.3.4)
        val pos = locate_(fStr(a1), fStr(a0))
        when(argCompat(a0, a1),
          when(length(fStr(a1)) === 0, Term.strLit(lit(""), fLang(a0)))
            .when(pos > 0, Term.strLit(fStr(a0).substr(lit(1), pos - 1), fLang(a0)))
            .otherwise(Term.strLit(lit(""))))
          .otherwise(Term.nullTerm)
      case "STRAFTER" =>
        val pos = locate_(fStr(a1), fStr(a0))
        when(argCompat(a0, a1),
          when(length(fStr(a1)) === 0, Term.strLit(fStr(a0), fLang(a0)))
            .when(pos > 0, Term.strLit(
              fStr(a0).substr(pos + length(fStr(a1)), length(fStr(a0))), fLang(a0)))
            .otherwise(Term.strLit(lit(""))))
          .otherwise(Term.nullTerm)
      case "CONCAT" =>
        // fn:concat argument compatibility: all operands sharing one language tag
        // keep it; any mix (or any plain operand) yields a plain literal
        val sharedLang =
          if (args.isEmpty) lit(null).cast("string")
          else args.map(fLang).reduce((a, b) => when(a <=> b, a))
        when(args.map(a => a.isNotNull && isStringy(a)).reduce(_ && _),
          Term.strLit(concat(args.map(fStr): _*), sharedLang)).otherwise(Term.nullTerm)
      case "ENCODE_FOR_URI" => strFn(regexp_replace(url_encode(fStr(a0)), "\\+", "%20"))
      case "REGEX" =>
        val pat = withFlags(argEs, 1, 2)
        // hint:regexMatchNonString widens the operand guard to any literal
        // (REGEX over e.g. xsd:IPv4Address lexicals — TestTicket1200)
        val operandOk = if (regexMatchNonString.value) isLiteral(a0) else isStringy(a0)
        boolTerm(when(a0.isNotNull && operandOk, fStr(a0).rlike(pat)).otherwise(nullB))
      case "REPLACE" =>
        val pat = withFlags(argEs, 1, 3)
        strFn(regexp_replace(fStr(a0), lit(pat), fStr(args(2))))
      case "LANGMATCHES" =>
        val tag = lower(fStr(a0)); val range = lower(fStr(a1))
        boolTerm(when(a0.isNull || a1.isNull, nullB)
          .when(range === "*", tag =!= "")
          .otherwise(tag === range || tag.startsWith(concat(range, lit("-")))))
      case "ABS" if staticDouble(argEs.head, env) => numeric1d(a0, abs(fNum(a0)))
      case "ABS" => numeric1(a0, abs(fNum(a0)), abs(fLng(a0)), abs(fDec(a0)))
      // fn:round = round half toward +∞ (ROUND(-2.5) = -2), i.e. floor(x + 0.5) —
      // NOT Spark's HALF_UP round (which gives -3). The reference's ROUND on a
      // DOUBLE returns an INTEGRAL numeric (MathUtility.java:427 Math.round →
      // long), so ROUND(?dbl)/100 then divides int/int into an exact decimal —
      // search-2's expected "0.44"^^xsd:decimal depends on this typing
      case "ROUND" =>
        when(a0.isNotNull && isNumericT(a0),
          when(isInt(a0), Term.intLit(fLng(a0)))
            .when(isDec(a0), Term.decimalLit(floor(fDec(a0) + lit(0.5))))
            .otherwise(Term.intLit(floor(fNum(a0) + 0.5d).cast(LongType))))
          .otherwise(Term.nullTerm)
      case "CEIL" if staticDouble(argEs.head, env) => numeric1d(a0, ceil(fNum(a0)).cast(DoubleType))
      case "CEIL" => numeric1(a0, ceil(fNum(a0)).cast(DoubleType), fLng(a0), ceil(fDec(a0)))
      case "FLOOR" if staticDouble(argEs.head, env) => numeric1d(a0, floor(fNum(a0)).cast(DoubleType))
      case "FLOOR" => numeric1(a0, floor(fNum(a0)).cast(DoubleType), fLng(a0), floor(fDec(a0)))
      case "RAND" => Term.doubleLit(rand())
      case "NOW" => Term.tsLit(current_timestamp())
      case "YEAR" => dtPart(a0, year(fTs(a0)))
      case "MONTH" => dtPart(a0, month(fTs(a0)))
      case "DAY" => dtPart(a0, dayofmonth(fTs(a0)))
      case "HOURS" => dtPart(a0, hour(fTs(a0)))
      case "MINUTES" => dtPart(a0, minute(fTs(a0)))
      case "SECONDS" =>
        // fn:seconds-from-dateTime → xsd:decimal INCLUDING the fractional part
        val micros = unix_micros(fTs(a0))
        val secOfMin = ((micros % 60000000L) + 60000000L) % 60000000L
        when(isDateTime(a0),
          Term.decimalLit(secOfMin.cast(Term.DECIMAL_TYPE) / lit(1000000L)))
          .otherwise(Term.nullTerm)
      case "TZ" =>
        // timezone token from the LEXICAL form ("" when absent, per fn:TZ)
        when(isDateTime(a0),
          Term.strLit(regexp_extract(fStr(a0), "(Z|[+-]\\d{2}:\\d{2})$", 1)))
          .otherwise(Term.nullTerm)
      case "TIMEZONE" =>
        // xsd:dayTimeDuration of the timezone offset; error when no timezone
        val tz = regexp_extract(fStr(a0), "(Z|[+-]\\d{2}:\\d{2})$", 1)
        val hh = regexp_extract(tz, "^[+-](\\d{2}):", 1).cast(IntegerType)
        val mm = regexp_extract(tz, ":(\\d{2})$", 1).cast(IntegerType)
        val dur = when(tz === "Z" || (hh === 0 && mm === 0), lit("PT0S"))
          .otherwise(concat(
            when(tz.startsWith("-"), lit("-")).otherwise(lit("")), lit("PT"),
            when(hh > 0, concat(hh.cast(StringType), lit("H"))).otherwise(lit("")),
            when(mm > 0, concat(mm.cast(StringType), lit("M"))).otherwise(lit(""))))
        when(isDateTime(a0) && tz =!= "",
          Term.typedLit(dur, "http://www.w3.org/2001/XMLSchema#dayTimeDuration"))
          .otherwise(Term.nullTerm)
      case "MD5" => hashFn(a0, md5(fStr(a0)))
      case "SHA1" => hashFn(a0, sha1(fStr(a0)))
      case "SHA224" => hashFn(a0, sha2(fStr(a0), 224))
      case "SHA256" => hashFn(a0, sha2(fStr(a0), 256))
      case "SHA384" => hashFn(a0, sha2(fStr(a0), 384))
      case "SHA512" => hashFn(a0, sha2(fStr(a0), 512))
      case "UUID" => Term.iri(concat(lit("urn:uuid:"), expr("uuid()")))
      case "STRUUID" => Term.strLit(expr("uuid()"))
      case iriFn if iriFn.startsWith("CAST:") =>
        val uri = iriFn.substring(5)
        Functions.get(uri) match {
          case Some(f) => f(args)
          case None => castFn(uri, a0)
        }
      case other => throw new UnsupportedOperationException(s"function $other")
    }
  }

  /** 1-based position of `substr` in `in`, 0 when absent (both Columns). */
  private def locate_(substr: Column, in: Column): Column =
    call_function("instr", in, substr)

  /** REGEX/REPLACE patterns must be constants; XPath flags → Java inline flags. */
  private def withFlags(argEs: Seq[Expr], patIdx: Int, flagIdx: Int): String = {
    val pat = argEs(patIdx) match {
      case EConst(LitNode(p, _, _)) => p
      case _ => throw new UnsupportedOperationException("non-constant regex pattern")
    }
    val flags = if (argEs.size > flagIdx) argEs(flagIdx) match {
      case EConst(LitNode(f, _, _)) => f; case _ => ""
    } else ""
    val inline = Seq('i' -> "i", 's' -> "s", 'm' -> "m", 'x' -> "x")
      .collect { case (c, j) if flags.indexOf(c.toInt) >= 0 => j }.mkString
    if (inline.isEmpty) pat else s"(?$inline)$pat"
  }

  private def numeric1(t: Column, dbl: Column, lng: Column, dec: Column): Column =
    when(t.isNotNull && isNumericT(t),
      when(isInt(t), Term.intLit(lng))
        .when(isDec(t), Term.decimalLit(dec))
        .otherwise(Term.doubleLit(dbl)))
      .otherwise(Term.nullTerm)

  /** numeric1 for a statically-double argument: the int/decimal mint branches
    * are statically dead (see staticDouble), so only the double branch is
    * planned — the same result for every input the guard admits.
    */
  private def numeric1d(t: Column, dbl: Column): Column =
    when(t.isNotNull && isNumericT(t), Term.doubleLit(dbl))
      .otherwise(Term.nullTerm)

  private def dtPart(t: Column, part: Column): Column =
    when(isDateTime(t), Term.intLit(part)).otherwise(Term.nullTerm)

  private def hashFn(t: Column, h: Column): Column =
    when(t.isNotNull && isStringy(t), Term.strLit(h)).otherwise(Term.nullTerm)

  /** STRDT: a known xsd datatype goes through the typed constructor (inline value
    * fields populated); any other datatype IRI mints an opaque typed literal —
    * SPARQL 17.4.2.8 allows arbitrary IRIs (the reference's extension/geospatial
    * literals rely on this).
    */
  private def strdt(v: Column, dtE: Expr): Column = dtE match {
    // STRDT requires a SIMPLE literal first argument (§17.4.2.8) — lang-tagged or
    // already-typed input is a type error (castFn alone would happily re-cast it)
    case EConst(IriNode(dt)) if dt.startsWith(Term.XSD) =>
      when(v.isNotNull && isPlainStr(v), castFn(dt, v)).otherwise(Term.nullTerm)
    case EConst(IriNode(dt)) =>
      when(v.isNotNull && isPlainStr(v), Term.typedLit(fStr(v), dt)).otherwise(Term.nullTerm)
    case _ => Term.nullTerm
  }

  /** xsd constructor casts (FuncBOp.java, XsdLongBOp.java, …): parse-failure → error
    * (= null term, NOT an ANSI cast exception — hence try_cast for string parses).
    */
  def castFn(dt: String, t: Column): Column = {
    val local = if (dt.startsWith(Term.XSD)) dt.substring(Term.XSD.length) else dt
    local match {
      case "integer" =>
        val v = when(isNumericT(t), fNum(t).cast(LongType))
          .when(isBool(t), fLng(t))
          .otherwise(fStr(t).try_cast(LongType))
        when(t.isNotNull && v.isNotNull, Term.intLit(v)).otherwise(Term.nullTerm)
      case bounded if Term.INT_RANGES.contains(bounded) =>
        // bounded integer-family constructor (XsdLongBOp & friends): the minted
        // literal KEEPS the target datatype (datatype(xsd:long("0")) = xsd:long)
        // and an out-of-range value is a cast error → unbound
        val (lo, hi) = Term.INT_RANGES(bounded)
        val d36 = org.apache.spark.sql.types.DecimalType(38, 0)
        val d = when(isExact(t), fDec(t).cast(d36))
          // integral lexical parses exactly (covers beyond-long xsd:integer,
          // whose num double is only an approximation)
          .when(fStr(t).rlike("^[+-]?[0-9]+$"), fStr(t).try_cast(d36))
          .when(isNumericT(t), fNum(t).try_cast(LongType).cast(d36))
          .when(isBool(t), fLng(t).cast(d36))
        val ok = lo.map(b => d >= lit(b.underlying)).getOrElse(lit(true)) &&
          hi.map(b => d <= lit(b.underlying)).getOrElse(lit(true))
        when(t.isNotNull && d.isNotNull && ok, Term.intLitAs(Term.XSD + bounded, d))
          .otherwise(Term.nullTerm)
      case "double" | "float" =>
        val v = when(isNumericT(t) || isBool(t), fNum(t))
          .otherwise(fStr(t).try_cast(DoubleType))
        when(t.isNotNull && v.isNotNull, Term.doubleLit(v)).otherwise(Term.nullTerm)
      case "decimal" =>
        // double operands route through Spark's double→decimal cast (shortest-repr
        // BigDecimal — same value the lexical form denotes); strings parse exactly
        val v = when(isExact(t), fDec(t))
          .when(isNumericT(t) || isBool(t), fNum(t).cast(Term.DECIMAL_TYPE))
          .otherwise(fStr(t).try_cast(Term.DECIMAL_TYPE))
        when(t.isNotNull && v.isNotNull, Term.decimalLit(v)).otherwise(Term.nullTerm)
      case "boolean" =>
        val v = when(isBool(t), fNum(t) =!= 0.0)
          .when(isNumericT(t), fNum(t) =!= 0.0)
          .when(fStr(t) === "true" || fStr(t) === "1", lit(true))
          .when(fStr(t) === "false" || fStr(t) === "0", lit(false))
          .otherwise(nullB)
        boolTerm(when(t.isNull, nullB).otherwise(v))
      case "string" => when(t.isNotNull, Term.strLit(fStr(t))).otherwise(Term.nullTerm)
      case "dateTime" =>
        val v = when(isDateTime(t), fTs(t))
          .otherwise(to_timestamp(regexp_replace(fStr(t), "Z$", "")))
        when(t.isNotNull && v.isNotNull, Term.tsLit(v)).otherwise(Term.nullTerm)
      case other => throw new UnsupportedOperationException(s"cast to $other")
    }
  }
}
