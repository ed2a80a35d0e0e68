package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profile of q_truth_maint: where does the battery's 7.96 s go?
  * Usage: runMain graft.tools.TmProf [sfDir] [iters]
  */
object TmProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-tmprof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.model.Tpch.store(spark, sfDir).statements.count() // warm

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TMPROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    sys.props("graft.tm.prof") = "1" // TMDELTA per-phase lines from the DRed pass
    for (i <- 1 to iters) {
      println(s"--- iter $i ---")
      val closed = t("closed-store")(graft.SparkEntry.closedStore(spark, sfDir))
      val tm = t("update+tm-build")(graft.engine.Update.withTruthMaintenance(closed,
        """DELETE DATA { <urn:c:Customer>
          |  <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:c:Any> . }""".stripMargin))
      val n = t("count-query")(graft.engine.Engine.query(tm,
        "SELECT (COUNT(*) AS ?cnt) WHERE { ?x a <urn:c:Any> }").count())
      println(s"rows=$n")
      System.gc()
    }
    spark.stop()
  }
}
