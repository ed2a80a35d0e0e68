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

    val closed = t("closure() plan")(inference.Rdfs.closure(store))
    t("closure count")(closed.statements.count())

    val tm = t("withTruthMaintenance")(engine.Update.withTruthMaintenance(closed,
      """DELETE DATA { <urn:c:Customer>
        |  <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:c:Any> . }""".stripMargin))

    val res = t("final query")(
      engine.Engine.query(tm, "SELECT (COUNT(*) AS ?cnt) WHERE { ?x a <urn:c:Any> }").collect())
    println(res.mkString(","))

    // repeat end-to-end the way the bench sees it (cold plans, warm JVM)
    t("end-to-end (bench shape)") {
      val closed2 = inference.Rdfs.closure(model.Tpch.store(spark, dir))
      val tm2 = engine.Update.withTruthMaintenance(closed2,
        """DELETE DATA { <urn:c:Customer>
          |  <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:c:Any> . }""".stripMargin)
      engine.Engine.query(tm2, "SELECT (COUNT(*) AS ?cnt) WHERE { ?x a <urn:c:Any> }").collect()
    }
    spark.stop()
  }
}
