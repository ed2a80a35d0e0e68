package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a comma-separated subset of
  * `SparkEntry.queries` to plans/<round>/<name>_<suffix>.txt — the judged
  * evidence files for optimization rounds (the judge cannot run Spark and
  * checks plan claims against these).
  * Usage: runMain graft.tools.PlanExplain <names> <suffix> [outDir] [sfDir]
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_scan_filter").split(",").toSeq
    val suffix = args.lift(1).getOrElse("after")
    val outDir = args.lift(2).getOrElse("plans/r16")
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-planexplain")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.model.Tpch.store(spark, sfDir).statements.count()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      // lookup inside the try: a mistyped name prints the FAILED line and the
      // remaining entries still dump (r16 advice)
      try {
        val fn = graft.SparkEntry.queries.getOrElse(n,
          sys.error(s"unknown entry (not in SparkEntry.queries)"))
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
        println(s"PLANEXPLAIN wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
      } catch { case e: Throwable =>
        println(s"PLANEXPLAIN $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
