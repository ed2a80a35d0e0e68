package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, Test/fork=true). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  lazy val store: graft.model.GraftStore =
    graft.model.Tpch.store(spark, "/root/testdata/sf0.001")
}

abstract class GraftSuite extends AnyFunSuite {
  def spark: SparkSession = SharedSpark.spark
  def store: graft.model.GraftStore = SharedSpark.store
  def sql1(q: String): Any = spark.sql(q).first().get(0)
}
