package graft
import org.apache.spark.sql.functions._

/** Scratch profiling main — repurposed per investigation; not part of the library. */
object Prof {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Dev.session(32)
    val dir = "/root/testdata/sf0.1"
    val store = t("store open")(model.Tpch.store(spark, dir))
    t("warm: statements count")(store.statements.count())
    import graft.sparql.{Parser, Algebra}
    import graft.engine.{Compiler, DatasetSpec}

    val whereText =
      """PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
        |SELECT ?e ?loc WHERE {
        |  ?e <urn:p:event_id> ?id .
        |  BIND(?id - FLOOR(?id/1.8e3)*1800 AS ?lm)
        |  BIND(?id*7 AS ?i7)
        |  BIND(?i7 - FLOOR(?i7/3.6e3)*3600 AS ?gm)
        |  BIND(?lm/1.0e1 - 9.0e1 AS ?la)
        |  BIND(?gm/1.0e1 - 1.8e2 AS ?lo)
        |  BIND(STRDT(CONCAT(STR(?la), "#", STR(?lo)), geo:geoSpatialLiteral) AS ?loc) }""".stripMargin

    for (r <- 1 to 2) {
      t(s"bare .rdd probe (run $r)") {
        store.statements.filter(col("p_id") === lit(123L)).rdd.getNumPartitions
      }
      t(s"stats probe (run $r)") {
        store.statements.filter(col("p_id") === lit(123L))
          .queryExecution.optimizedPlan.stats.sizeInBytes
      }
      val q = Parser.parseQuery(whereText).asInstanceOf[graft.sparql.Ast.SelectQuery]
      val cNoSpread = new Compiler(store, DatasetSpec.all, spreadScans = false)
      t(s"compile WHERE noSpread (run $r)")(cNoSpread.compile(Algebra.lower(q.where)))
      val c = new Compiler(store, DatasetSpec.all, spreadScans = true)
      val sol0 = t(s"compile WHERE (run $r)")(c.compile(Algebra.lower(q.where)))
      val proj = sol0.select(col("e"), col("loc"))
      t(s"count solutions (run $r)")(println("  n=" + proj.count()))
      if (r == 1) {
        val opt = proj.queryExecution.optimizedPlan
        println("  optimizedPlan string length: " + opt.toString.length)
        println("  max expr tree size: " + opt.expressions.map(_.collect{case e => e}.size).max)
      }
      t(s"checkpoint solutions (run $r)")(proj.localCheckpoint())
    }
    println("BYTES-stmts " + store.statements.queryExecution.optimizedPlan.stats.sizeInBytes)
    println("BYTES-docs " + spark.read.parquet("/root/testdata/sf0.1/documents.parquet").queryExecution.optimizedPlan.stats.sizeInBytes)
    println("PARTS-docs " + graft.engine.DfOps.spread(
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet")).rdd.getNumPartitions)
    println("PARTS-stmts " + graft.engine.DfOps.spread(store.statements).rdd.getNumPartitions)
    spark.stop()
  }
}
