package graft

import graft.engine.Engine
import org.apache.spark.sql.functions._

/** Solution-compatibility semantics: joins with maybe-unbound shared vars
  * (the ASTBottomUpOptimizer / bottom-up evaluation edge cases).
  */
class CompatJoinSpec extends GraftSuite {

  test("UNDEF in VALUES is compatible with every binding") {
    val df = Engine.query(store,
      """SELECT ?x ?tag ?z WHERE {
        |  VALUES (?x ?tag) { (1 "a") (UNDEF "b") }
        |  VALUES (?x ?z) { (1 10) (2 20) }
        |}""".stripMargin)
    val rows = df.collect().map { r =>
      (if (r.isNullAt(0)) -1L else r.getStruct(0).getAs[Long]("lng"),
        r.getStruct(1).getAs[String]("str"),
        r.getStruct(2).getAs[Long]("lng"))
    }.toSet
    // x=1/"a" matches only x=1; x=UNDEF/"b" is compatible with both rows,
    // and the merged ?x takes the bound side's value
    assert(rows == Set((1L, "a", 10L), (1L, "b", 10L), (2L, "b", 20L)))
  }

  test("union arm without the join var still joins (unbound-compatible)") {
    val df = Engine.query(store,
      """SELECT ?r ?name ?tag WHERE {
        |  { <urn:t:region:0> <urn:p:r_name> ?name . BIND("withname" AS ?tag) }
        |  UNION { BIND("bare" AS ?tag) }
        |  ?r <urn:p:r_name> ?name .
        |}""".stripMargin)
    // arm 1 binds ?name=AFRICA → joins region:0 only; arm 2 leaves ?name unbound →
    // compatible with all 5 regions
    assert(df.filter(col("tag")("str") === "withname").count() == 1)
    assert(df.filter(col("tag")("str") === "bare").count() == 5)
    // merged ?name is always bound in the output
    assert(df.filter(col("name").isNull).count() == 0)
  }

  test("MINUS with all-unbound shared vars removes nothing (disjoint domains)") {
    val df = Engine.query(store,
      """SELECT ?x WHERE {
        |  VALUES ?x { 1 2 }
        |  MINUS { VALUES (?x ?y) { (UNDEF 9) } }
        |}""".stripMargin)
    assert(df.count() == 2)
    // ...but a bound match still removes
    val df2 = Engine.query(store,
      """SELECT ?x WHERE {
        |  VALUES ?x { 1 2 }
        |  MINUS { VALUES ?x { 1 } }
        |}""".stripMargin)
    assert(df2.collect().map(_.getStruct(0).getAs[Long]("lng")).toSeq == Seq(2L))
  }

  test("definitely-bound joins still use the fast equi-join path") {
    val plan = Engine.explain(store,
      """SELECT ?c ?n WHERE { ?c <urn:fk:c_nationkey> ?n . ?n <urn:p:n_name> ?o }""")
    // no compat columns in the plan → equi path chosen
    assert(!plan.contains("__c_"))
  }

  test("single maybe-unbound var on inner join decomposes: no nested-loop on the bulk") {
    // ?x maybe-unbound (one UNION arm lacks it); inner join with VALUES on ?x
    val q = """SELECT ?x ?tag ?z WHERE {
              |  { VALUES ?x { 1 } BIND("bound" AS ?tag) } UNION { BIND("bare" AS ?tag) }
              |  VALUES (?x ?z) { (1 10) (2 20) }
              |}""".stripMargin
    val df = Engine.query(store, q)
    val rows = df.collect().map { r =>
      (if (r.isNullAt(0)) -1L else r.getStruct(0).getAs[Long]("lng"),
        r.getStruct(1).getAs[String]("str"),
        r.getStruct(2).getAs[Long]("lng"))
    }.toSet
    // bound arm joins x=1 only; bare arm compatible with both, merged x bound
    assert(rows == Set((1L, "bound", 10L), (1L, "bare", 10L), (2L, "bare", 20L)))
    // the null-pattern decomposition replaces the single OR-null theta join:
    // the bound×bound branch is an equi (hash/sort-merge) join
    val plan = Engine.explain(store, q)
    assert(plan.contains("Union"), "expected branch decomposition in plan")
  }

  test("TWO maybe-unbound vars decompose into null-class equi-joins (no nested loop)") {
    // left: ?x and ?y each bound only for some ?k; right: VALUES with an UNDEF.
    // Both shared vars are maybe-unbound on both sides → the old theta fallback.
    val q = """SELECT ?k ?x ?y ?z WHERE {
              |  { VALUES ?k { 1 2 3 }
              |    OPTIONAL { VALUES (?k ?x) { (1 10) (2 20) } }
              |    OPTIONAL { VALUES (?k ?y) { (1 100) (3 300) } } }
              |  { VALUES (?x ?y ?z) { (10 100 7) (20 999 8) (UNDEF 300 9) } }
              |}""".stripMargin
    val df = Engine.query(store, q)
    def lng(r: org.apache.spark.sql.Row, i: Int): Long =
      if (r.isNullAt(i)) -1L else r.getStruct(i).getAs[Long]("lng")
    val rows = df.collect().map(r => (lng(r, 0), lng(r, 1), lng(r, 2), lng(r, 3))).toSet
    // k=1 (x=10,y=100) matches row1 exactly; k=2 (x=20, y unbound) matches row2
    // (y merges to 999) and row3 (x UNDEF right, y unbound left → merges 20/300);
    // k=3 (x unbound, y=300) matches row3 only
    assert(rows == Set(
      (1L, 10L, 100L, 7L),
      (2L, 20L, 999L, 8L),
      (2L, 20L, 300L, 9L),
      (3L, -1L, 300L, 9L)), rows.toString)
    // decomposed: the bound×bound bulk runs as an equi join inside a branch
    // union (the remaining cross joins are the tiny null-classes, where SPARQL
    // compatibility genuinely imposes no key)
    val plan = Engine.explain(store, q)
    assert(plan.contains("Union") &&
      (plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin")),
      s"expected null-class decomposition with an equi bulk branch:\n$plan")
  }

  test("THREE maybe-unbound vars: decompose on the 2 most selective, residual-filter the rest") {
    // ?k is definitely bound on both sides (every branch pair equi-joins on it);
    // ?x ?y ?w are each maybe-unbound on both sides. The old path fell back to a
    // theta join — one BroadcastNestedLoopJoin over the whole input. Now the 2
    // least-often-unbound vars decompose into null classes and the third applies
    // as a residual compat filter inside each equi branch.
    val q = """SELECT ?k ?x ?y ?w ?z WHERE {
              |  { VALUES ?k { 1 2 3 }
              |    OPTIONAL { VALUES (?k ?x) { (1 10) (2 20) } }
              |    OPTIONAL { VALUES (?k ?y) { (1 100) (3 300) } }
              |    OPTIONAL { VALUES (?k ?w) { (1 1000) (2 2000) } } }
              |  { VALUES (?k ?x ?y ?w ?z) {
              |      (1 10 100 1000 7) (2 20 999 UNDEF 8)
              |      (3 UNDEF 300 3000 9) (2 UNDEF UNDEF 9999 11) } }
              |}""".stripMargin
    val df = Engine.query(store, q)
    def lng(r: org.apache.spark.sql.Row, i: Int): Long =
      if (r.isNullAt(i)) -1L else r.getStruct(i).getAs[Long]("lng")
    val rows = df.collect().map(r => (lng(r, 0), lng(r, 1), lng(r, 2), lng(r, 3), lng(r, 4))).toSet
    // k=1: exact match of row1. k=2: x=20 eq, y unbound-left, w UNDEF-right →
    // row2 (y→999, w stays 2000); row4 fails on w (2000≠9999). k=3: x unbound
    // both sides, y=300 eq, w unbound-left → row3 (w→3000, x stays unbound).
    assert(rows == Set(
      (1L, 10L, 100L, 1000L, 7L),
      (2L, 20L, 999L, 2000L, 8L),
      (3L, -1L, 300L, 3000L, 9L)), rows.toString)
    val plan = Engine.explain(store, q)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"3 risky vars must not fall back to a nested-loop/theta join:\n$plan")
    assert(plan.contains("Union") &&
      (plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin")),
      s"expected null-class decomposition with equi branches:\n$plan")
  }

  test("MINUS with maybe-unbound shared var decomposes (no nested loop), keeps MINUS overlap rule") {
    val q = """SELECT ?k ?x WHERE {
              |  { VALUES ?k { 1 2 3 } OPTIONAL { VALUES (?k ?x) { (1 10) (2 20) } } }
              |  MINUS { VALUES (?k ?x) { (1 10) (3 UNDEF) } }
              |}""".stripMargin
    val df = Engine.query(store, q)
    val rows = df.collect().map { r =>
      (r.getStruct(0).getAs[Long]("lng"),
        if (r.isNullAt(1)) -1L else r.getStruct(1).getAs[Long]("lng"))
    }.toSet
    // (1,10) removed by exact match; (3,unbound) removed by (3,UNDEF) — k
    // overlaps and x is compatible-unbound; (2,20) matches nothing
    assert(rows == Set((2L, 20L)), rows.toString)
    val plan = Engine.explain(store, q)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"risky MINUS must decompose, not fall back to a nested loop:\n$plan")
  }

  test("EXISTS with maybe-unbound outer var: unbound row matches freely (substitution), no nested loop") {
    val q = """SELECT ?x ?tag WHERE {
              |  { VALUES ?x { 1 } BIND("bound" AS ?tag) } UNION { BIND("bare" AS ?tag) }
              |  FILTER EXISTS { VALUES (?x ?z) { (1 10) } }
              |}""".stripMargin
    val df = Engine.query(store, q)
    val rows = df.collect().map { r =>
      (if (r.isNullAt(0)) -1L else r.getStruct(0).getAs[Long]("lng"),
        r.getStruct(1).getAs[String]("str"))
    }.toSet
    // bound row matches x=1; the bare row leaves ?x free, so the sub-pattern
    // evaluates unconstrained (non-empty) — substitution semantics keep it
    assert(rows == Set((1L, "bound"), (-1L, "bare")), rows.toString)
    val plan = Engine.explain(store, q)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"risky EXISTS semi must decompose, not fall back to a nested loop:\n$plan")
  }

  test("NOT EXISTS with maybe-unbound outer var removes on bare compatibility (no MINUS overlap rule)") {
    val df = Engine.query(store,
      """SELECT ?x ?tag WHERE {
        |  { VALUES ?x { 1 } BIND("bound" AS ?tag) } UNION { BIND("bare" AS ?tag) }
        |  FILTER NOT EXISTS { VALUES (?x ?z) { (7 70) } }
        |}""".stripMargin)
    val rows = df.collect().map { r =>
      (if (r.isNullAt(0)) -1L else r.getStruct(0).getAs[Long]("lng"),
        r.getStruct(1).getAs[String]("str"))
    }.toSet
    // bound row: substituted pattern (x=7 vs x=1) is empty → kept. Bare row:
    // ?x free → pattern non-empty → REMOVED (unlike MINUS, where a row with
    // no overlapping bound var survives)
    assert(rows == Set((1L, "bound")), rows.toString)
  }

  test("OPTIONAL after a union with maybe-unbound var: decomposed left join is exact") {
    val df = Engine.query(store,
      """SELECT ?x ?tag ?z WHERE {
        |  { VALUES ?x { 1 } BIND("bound" AS ?tag) } UNION { BIND("bare" AS ?tag) }
        |  OPTIONAL { VALUES (?x ?z) { (1 10) (7 70) } }
        |}""".stripMargin)
    val rows = df.collect().map { r =>
      (if (r.isNullAt(0)) -1L else r.getStruct(0).getAs[Long]("lng"),
        r.getStruct(1).getAs[String]("str"),
        if (r.isNullAt(2)) -1L else r.getStruct(2).getAs[Long]("lng"))
    }.toSet
    // bound arm (x=1): matches (1,10) only; bare arm (x unbound): compatible with
    // both VALUES rows, x merged from the right side
    assert(rows == Set((1L, "bound", 10L), (1L, "bare", 10L), (7L, "bare", 70L)))
  }
}
