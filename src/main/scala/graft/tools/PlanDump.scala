package graft.tools

import org.apache.spark.sql.functions._

object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Dev.session(8)
    val dir = args.headOption.getOrElse("/tmp/graft-scale/x10")
    val st = graft.model.Tpch.store(spark, dir)
    val pid = graft.engine.TermIds.iriId("urn:p:event_id")
    val f = st.statements.filter(col("p_id") === pid)
    println("statements stats:      " + st.statements.queryExecution.optimizedPlan.stats.sizeInBytes)
    println("p_id-filtered stats:   " + f.queryExecution.optimizedPlan.stats.sizeInBytes)
    println("p_id-filtered parts:   " + f.rdd.getNumPartitions)
    val sel = f.select(col("s").as("e"), col("o").as("id"))
    println("projected stats:       " + sel.queryExecution.optimizedPlan.stats.sizeInBytes)
    // raw read for comparison
    val raw = spark.read.parquet(st.atRestPath.getOrElse(dir)).filter(col("p_id") === pid)
    println("raw read stats:        " + raw.queryExecution.optimizedPlan.stats.sizeInBytes)
    println("raw parts:             " + raw.rdd.getNumPartitions)
  }
}

object PlanDump2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Dev.session(8)
    val dir = args.headOption.getOrElse("/tmp/graft-scale/x10")
    val st = graft.model.Tpch.store(spark, dir)
    val pid = graft.engine.TermIds.iriId("urn:p:event_id")
    val raw = spark.read.parquet(st.atRestPath.getOrElse(dir)).filter(org.apache.spark.sql.functions.col("p_id") === pid)
    println(raw.queryExecution.optimizedPlan.treeString)
    println("---")
    println("v1list=" + spark.conf.getOption("spark.sql.sources.useV1SourceList"))
    raw.queryExecution.optimizedPlan.foreach {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        println("V1 LogicalRelation, catalogTable=" + lr.catalogTable.isDefined)
      case other => println("node: " + other.getClass.getSimpleName)
    }
  }
}
