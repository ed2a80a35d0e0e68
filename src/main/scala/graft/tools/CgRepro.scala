package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduce/locate whole-stage-codegen 64 KB overflows: runs a fixture-style
  * load+query with codegen compile errors visible, phase by phase, so the
  * failing stage can be attributed (load vs query vs serialization).
  * Usage: runMain graft.tools.CgRepro [fixtureDir]
  */
object CgRepro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("src/test/resources/fixtures/having-agg-expr")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-cg-repro")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val data = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/data.ttl"))
    val query = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/query.rq"))
    println("=== PHASE: rio parse+load ===")
    val stmts = graft.sources.Rio.readTurtle(spark, data)
    stmts.count()
    println("=== PHASE: store wrap ===")
    val st = new graft.model.GraftStore(spark, stmts)
    st.statements.count()
    println("=== PHASE: query ===")
    val df = graft.engine.Engine.query(st, query)
    println(s"=== ANALYZED PLAN (sizes) ===")
    df.queryExecution.analyzed.foreach(n =>
      println(s"  ${n.nodeName} exprNodes=${n.expressions.map(_.collect { case x => x }.size).sum}"))
    val opt = df.queryExecution.optimizedPlan
    println(s"=== OPTIMIZED PLAN (sizes) ===")
    opt.foreach(n => println(s"  ${n.nodeName} exprNodes=${n.expressions.map(_.collect { case x => x }.size).sum}"))
    df.count()
    println("=== PHASE: tsv ===")
    graft.engine.SparqlResults.toTsv(df)
    println("=== DONE ===")
    spark.stop()
  }
}
