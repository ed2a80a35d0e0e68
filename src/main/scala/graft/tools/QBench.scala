package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused A/B timing diagnostic: run a comma-separated subset of
  * `SparkEntry.queries` N times against a warm store and print per-iteration
  * seconds — for isolating a suspected regression from run-to-run noise.
  * Usage: runMain graft.tools.QBench <names> [iters] [sfDir]
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_scan_filter").split(",").toSeq
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-qbench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.model.Tpch.store(spark, sfDir).statements.count() // warm the store
    for (n <- names; i <- 1 to iters) {
      val fn = graft.SparkEntry.queries(n)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"""QBENCH {"name":"$n","iter":$i,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      // match Bench's cadence: GC outside the timed region so the
      // ContextCleaner frees dead localCheckpoint blocks between iterations
      System.gc()
    }
    spark.stop()
  }
}
