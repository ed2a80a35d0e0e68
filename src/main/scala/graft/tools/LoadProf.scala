package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time each phase of the cold bulk-load path. */
object LoadProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/graft-store"))
    val st = t("cold-store-total") { graft.model.Tpch.store(spark, sfDir) }
    t("first-query-count") { st.statements.count() }
    spark.stop()
  }
}
