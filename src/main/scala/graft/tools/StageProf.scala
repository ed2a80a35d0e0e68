package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Per-STAGE task-time profile of a SparkEntry query: which stage carries the
  * task CPU that QProf reports only in total? Prints, per stage, its name
  * (callsite), task count, summed executorRunTime and CPU time, input rows.
  * Usage: runMain graft.tools.StageProf <name> [sfDir] [iters]
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_stream_window")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stageprof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    final case class Acc(run: AtomicLong = new AtomicLong, cpu: AtomicLong = new AtomicLong,
                         n: AtomicLong = new AtomicLong, rows: AtomicLong = new AtomicLong,
                         gc: AtomicLong = new AtomicLong, deser: AtomicLong = new AtomicLong)
    val stageNames = new ConcurrentHashMap[Int, String]()
    val acc = new ConcurrentHashMap[Int, Acc]()
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stageNames.put(s.stageInfo.stageId, s.stageInfo.name.take(120))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val a = acc.computeIfAbsent(t.stageId, _ => Acc())
        a.n.incrementAndGet()
        if (t.taskMetrics != null) {
          a.run.addAndGet(t.taskMetrics.executorRunTime)
          a.cpu.addAndGet(t.taskMetrics.executorCpuTime / 1000000L)
          a.gc.addAndGet(t.taskMetrics.jvmGCTime)
          a.deser.addAndGet(t.taskMetrics.executorDeserializeTime)
          a.rows.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        }
      }
    }
    graft.model.Tpch.store(spark, sfDir).statements.count()
    graft.SparkEntry.warmup(spark, Some(sfDir))
    for (i <- 1 to iters) {
      stageNames.clear(); acc.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      spark.sparkContext.removeSparkListener(listener)
      println(f"STAGEPROF $name iter=$i wall=$sec%.2f rows=$rows")
      import scala.jdk.CollectionConverters._
      acc.asScala.toSeq.sortBy(-_._2.run.get).take(12).foreach { case (sid, a) =>
        println(f"STAGEPROF   stage=$sid n=${a.n.get}%3d run=${a.run.get / 1e3}%7.2fs cpu=${a.cpu.get / 1e3}%7.2fs gc=${a.gc.get / 1e3}%5.2fs deser=${a.deser.get / 1e3}%5.2fs rows=${a.rows.get}%9d  ${stageNames.getOrDefault(sid, "?")}")
      }
      System.gc()
    }
    spark.stop()
  }
}
