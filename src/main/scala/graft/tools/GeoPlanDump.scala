package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the geo INSERT's WHERE-clause plan (the BIND-chain projection
  * pipeline) as formatted explain + Catalyst tree-node counts — the
  * slim-arithmetic evidence surface (the entry's top-level plan is an opaque
  * post-checkpoint SELECT, so the BIND chain is invisible there).
  * Usage: runMain graft.tools.GeoPlanDump <outFile> [sfDir]
  */
object GeoPlanDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("plans/r17/geo_where_plan.txt")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-geoplandump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = graft.model.Tpch.store(spark, sfDir)
    store.statements.count()
    val df = graft.engine.Engine.query(store,
      """PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
        |SELECT ?e ?loc WHERE {
        |  ?e <urn:p:event_id> ?id .
        |  BIND(?id - FLOOR(?id/1.8e3)*1800 AS ?lm)
        |  BIND(?id*7 AS ?i7)
        |  BIND(?i7 - FLOOR(?i7/3.6e3)*3600 AS ?gm)
        |  BIND(?lm/1.0e1 - 9.0e1 AS ?la)
        |  BIND(?gm/1.0e1 - 1.8e2 AS ?lo)
        |  BIND(STRDT(CONCAT(STR(?la), "#", STR(?lo)), geo:geoSpatialLiteral) AS ?loc) }""".stripMargin)
    val qe = df.queryExecution
    val analyzedNodes = qe.analyzed.map(_ => 1).sum
    val optimizedNodes = qe.optimizedPlan.map(_ => 1).sum
    val exprNodes = qe.optimizedPlan.map(p =>
      p.expressions.map(e => e.collect { case x => x }.size).sum).sum
    val header =
      s"geo WHERE-clause plan — logical nodes: analyzed=$analyzedNodes optimized=$optimizedNodes " +
      s"expression-tree nodes (optimized)=$exprNodes\n\n"
    val txt = header + qe.explainString(org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), txt)
    println(s"GEOPLANDUMP wrote $out (${txt.length} chars) exprNodes=$exprNodes")
    spark.stop()
  }
}
