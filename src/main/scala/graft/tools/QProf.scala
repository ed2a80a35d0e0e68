package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-entry job/stage/task profiler: runs a comma-separated subset of
  * `SparkEntry.queries` against a warm store with a SparkListener attached and
  * prints, per entry, wall seconds, #jobs, #stages, #tasks and summed task
  * time — separating driver/scheduling overhead (many tiny jobs) from real
  * executor compute. Guide §1: measure first; decide whether the time is
  * scheduling, shuffle or compute before touching anything.
  * Usage: runMain graft.tools.QProf <names|all> [sfDir] [iters]
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val namesArg = args.headOption.getOrElse("q_scan_filter")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-qprof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    val shufRead = new AtomicLong; val shufWrite = new AtomicLong
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobWall = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobStart.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(j.jobId)
        if (t0 != 0L) jobWall.add((j.jobId, (System.nanoTime() - t0) / 1000000L))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          shufRead.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    graft.model.Tpch.store(spark, sfDir).statements.count() // warm the store
    graft.SparkEntry.warmup(spark, Some(sfDir))
    val names =
      if (namesArg == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else namesArg.split(",").toSeq
    for (n <- names; i <- 1 to iters) {
      // missing names and mid-run failures report per entry instead of
      // crashing the whole profiler (r16 advice)
      val fnOpt = graft.SparkEntry.queries.get(n)
      if (fnOpt.isEmpty) { println(s"QPROF $n SKIPPED: unknown entry") }
      else try {
      val fn = fnOpt.get
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      shufRead.set(0); shufWrite.set(0); jobWall.clear(); jobStart.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async: give it a beat to drain before reading counters
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(f"""QPROF {"name":"$n","iter":$i,"sec":$sec%.2f,"jobs":${jobs.get},"stages":${stages.get},"tasks":${tasks.get},"task_sec":${taskMs.get / 1e3}%.1f,"shuf_read_mb":${shufRead.get / 1048576.0}%.1f,"shuf_write_mb":${shufWrite.get / 1048576.0}%.1f,"rows":$rows}""")
      if (sys.env.contains("QPROF_JOBS")) {
        import scala.jdk.CollectionConverters._
        val jw = jobWall.asScala.toSeq.sortBy(-_._2)
        val total = jw.map(_._2).sum
        println(s"QPROF_JOBS $n total_job_wall_ms=$total top=" +
          jw.take(12).map { case (id, ms) => s"j$id:${ms}ms" }.mkString(","))
      }
      System.gc()
      } catch { case e: Throwable =>
        try spark.sparkContext.removeSparkListener(listener)
        catch { case _: Throwable => () }
        println(s"QPROF $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
