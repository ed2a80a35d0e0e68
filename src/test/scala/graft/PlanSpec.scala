package graft

import graft.engine.{Engine, TermIds}
import org.apache.spark.sql.functions._

/** Physical-plan assertions for the at-scale levers SURVEY §8.1 claims: p_id
  * partition pruning (the POS-index analog), nested predicate pushdown, nested-schema
  * pruning, and broadcast joins for small relations. These are the properties that
  * survive a 100× scale-up — asserted, not eyeballed.
  */
class PlanSpec extends GraftSuite {

  private def planOf(sparql: String): String =
    Engine.query(store, sparql).queryExecution.executedPlan.toString

  test("constant-predicate scan prunes p_id partitions") {
    val plan = planOf("SELECT ?c WHERE { ?c <urn:p:c_mktsegment> \"BUILDING\" }")
    assert(plan.contains("PartitionFilters") && plan.contains("p_id"),
      s"expected p_id partition filter:\n$plan")
  }

  test("constant-object filter pushes down to the parquet scan (nested id)") {
    val df = Engine.query(store, "SELECT ?c WHERE { ?c <urn:p:c_mktsegment> \"BUILDING\" }")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [") && scan.contains("o.id"),
      s"expected nested o.id pushed filter:\n$scan")
  }

  test("id-only projections read a pruned nested schema, not full term structs") {
    // path pair scan projects only s.id/o.id — ReadSchema must not include str
    val c = new graft.engine.Compiler(store, graft.engine.DatasetSpec.all)
    val pairs = c.pathPairIds(graft.sparql.Ast.PLink("urn:fk:o_custkey"), None)
    val plan = pairs.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("id:bigint") && !readSchema.contains("str:string"),
      s"expected id-only nested read schema, got: $readSchema")
  }

  test("bounded-maxRank text search plans as TakeOrderedAndProject (no global window)") {
    // no rank var: the top-k limit is the only sort — pure TakeOrderedAndProject
    val plan = planOf(
      """PREFIX bds: <http://www.bigdata.com/rdf/search#>
        |SELECT ?lit ?score WHERE {
        |  ?lit bds:search "customer" ; bds:relevance ?score ;
        |       bds:maxRank 10 }""".stripMargin)
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected top-k TakeOrderedAndProject for bounded maxRank:\n$plan")
    assert(!plan.contains("Window"),
      s"expected no window when rank is not requested:\n$plan")
  }

  test("ranked search plans carry no unpartitioned window on unbounded inputs") {
    // rank requested WITHOUT maxRank: the old shape funneled every hit through a
    // single-partition window; now rank is partition-offset (range repartition +
    // per-partition row_number) — assert no WindowExec with an empty partitionSpec.
    // WITH maxRank the input is ≤ k rows by construction (orderBy+limit →
    // TakeOrderedAndProject), so a single-partition window over the limited set
    // is the cheap, scale-safe choice — assert that window sits above a limit.
    for (extra <- Seq("", "; bds:maxRank 10")) {
      val df = Engine.query(store,
        s"""PREFIX bds: <http://www.bigdata.com/rdf/search#>
           |SELECT ?lit ?r WHERE {
           |  ?lit bds:search "customer" ; bds:rank ?r $extra }""".stripMargin)
      // the AQE root (AdaptiveSparkPlanExec) is a leaf to TreeNode.collect, so
      // assert on the logical optimized plan, which exposes the full tree
      val global = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      if (extra.isEmpty)
        assert(global.isEmpty,
          s"unpartitioned window on unbounded ranked search input:\n" +
            df.queryExecution.optimizedPlan)
      else {
        assert(global.nonEmpty, "bounded rank should use the plain-window path")
        // the window's input must be provably bounded: a limit directly below it
        val boundedBelow = global.forall(_.child.collectFirst {
          case l: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => l
        }.nonEmpty)
        assert(boundedBelow,
          s"bounded-rank window not above a limit:\n${df.queryExecution.optimizedPlan}")
      }
      // ranks must still be the dense global sequence
      val ranks = df.collect().map(_.getStruct(1).getLong(6)).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq, s"ranks not dense: ${ranks.toSeq.take(20)}")
    }
  }

  test("rank-free text search skips the global sort entirely") {
    val plan = planOf(
      """PREFIX bds: <http://www.bigdata.com/rdf/search#>
        |SELECT ?lit ?score WHERE {
        |  ?lit bds:search "customer" ; bds:relevance ?score }""".stripMargin)
    assert(!plan.contains("Window") && !plan.contains("TakeOrderedAndProject"),
      s"expected no sort/window when no rank or maxRank requested:\n$plan")
  }

  test("dimension-sized join sides broadcast") {
    val plan = planOf(
      """SELECT ?cname ?nname WHERE {
        |  ?c <urn:p:c_name> ?cname ; <urn:fk:c_nationkey> ?n .
        |  ?n <urn:p:n_name> ?nname }""".stripMargin)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join for the nation side:\n$plan")
  }

  test("closure novelty anti-join prunes to derived predicate partitions") {
    // the inverse rule derives ONLY urn:rev:x (+schema/type predicates): the
    // anti-join's existing-statements scan must carry an isin p_id partition
    // filter, not read the whole store
    val s0 = graft.engine.Update(store,
      """INSERT DATA { <urn:fk:c_nationkey>
        |  <http://www.w3.org/2002/07/owl#inverseOf> <urn:rev:natCust> . }""".stripMargin)
    val closed = graft.inference.Rdfs.closure(s0)
    val plan = closed.statements.queryExecution.executedPlan.toString
    val antiScans = plan.linesIterator
      .filter(l => l.contains("PartitionFilters") && l.contains("p_id"))
      .filter(_.contains(" IN "))
    assert(antiScans.nonEmpty,
      s"expected an isin-pruned p_id scan in the novelty anti-join:\n${plan.take(4000)}")
  }

  test("change-log diff prunes to the template's predicate partitions") {
    val (_, cs) = graft.engine.Update.applyWithLog(store,
      """DELETE { ?n <urn:p:n_name> ?nm } INSERT { ?n <urn:p:n_name> "x" }
        |WHERE { ?n <urn:p:n_name> ?nm }""".stripMargin)
    val pid = TermIds.iriId("urn:p:n_name")
    for (df <- Seq(cs.added, cs.removed)) {
      val plan = df.queryExecution.executedPlan.toString
      val pruned = plan.linesIterator.filter(_.contains("PartitionFilters"))
        .forall(l => !l.contains("isnotnull(p_id") || l.contains(pid.toString) ||
          l.contains(" = "))
      assert(pruned && plan.contains("PartitionFilters"),
        s"expected p_id-pruned scans in change-log diff:\n${plan.take(4000)}")
    }
  }
}
