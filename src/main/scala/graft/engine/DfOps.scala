package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

object DfOps {
  /** Re-alias every column (fresh expression ids). Self-unions in fixpoint loops can
    * otherwise hit Catalyst's Union constraint-rewrite with duplicate attribute ids
    * ("key not found: x#N") — one cheap projection decouples the lineages.
    */
  def reid(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(c)).toSeq: _*)

  /** Spread a narrow input across the session's cores. A small parquet table often
    * arrives as ONE split, so per-row pipelines (shingling, hashing, feature extraction)
    * run single-threaded; one cheap round-robin shuffle restores parallelism. No-op
    * when the input is already wide enough (the at-scale case).
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Decide from the optimizer's size estimate, not .rdd.getNumPartitions: the
    // .rdd probe forces a full physical-planning pass per call (~10× the cost of
    // stats, measured), and the planned RDD is then thrown away. ≥4 MB/core means
    // the scan already splits wide enough that a round-robin shuffle buys nothing.
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(target) * (4L << 20)) df else df.repartition(target)
  }

  /** Salted equi-join for skewed keys (SURVEY §7 "salting for skew"): the build side is
    * replicated `salt` times, the probe side gets a random salt in [0, salt), and the
    * exchange partitions on (key, salt) — spreading a hot key over `salt` reducers.
    * AQE's skew-join split handles moderate skew automatically; this is the explicit
    * lever for pathological keys (e.g. a celebrity node in a 100 TB graph).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salt: Int, how: String = "inner"): DataFrame = {
    import org.apache.spark.sql.functions._
    val p = probe.withColumn("__salt", (rand(42) * salt).cast("int"))
    val b = build.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, Seq(key, "__salt"), how).drop("__salt")
  }
}
