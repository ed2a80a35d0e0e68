package graft.tools

import org.apache.spark.sql.functions._

object PruneDbg {
  def main(args: Array[String]): Unit = {
    val spark = graft.Dev.session(8)
    spark.sparkContext.setLogLevel("WARN")
    val ctr = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null) ctr.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
      })
    def meter(label: String)(f: => Long): Unit = {
      val r0 = ctr.get()
      val n = f
      Thread.sleep(500)
      println(s"PRUNE $label count=$n rows_read=${ctr.get() - r0}")
    }
    val st = graft.model.GraftStore.load(spark, "/tmp/graft_tmab_store")
    val subClassId = graft.engine.TermIds.iriId(graft.model.Term.RDFS_SUBCLASSOF)
    val typeId = graft.engine.TermIds.iriId(graft.model.Term.RDF_TYPE)
    val exp = st.statements.filter(col("stype") =!= graft.model.GraftStore.STYPE_INFERRED)
    val added = st.statements.limit(0).select("s", "p", "o", "g")
    def key3(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("__sk", col("s")("id")).withColumn("__pk", col("p")("id"))
      .withColumn("__ok", col("o")("id"))
    val oldExp = key3(exp)
      .join(broadcast(key3(added).select("__sk", "__pk", "__ok")),
        Seq("__sk", "__pk", "__ok"), "left_anti")
      .select(col("p_id"), col("s"), col("o"))
    meter("plain-pid")(st.statements.filter(col("p_id") === subClassId).count())
    meter("antijoin-pid")(oldExp.filter(col("p_id") === subClassId).count())
    meter("vocab-or-shape")(oldExp.filter(col("p_id").isin(Seq(subClassId): _*) ||
      (col("p_id") === typeId && col("o")("id").isin(Seq(1L, 2L): _*))).count())
    meter("newexp-vocab")(exp.select(col("p_id"), col("s"), col("o"))
      .filter(col("p_id") === subClassId).count())
  }
}
