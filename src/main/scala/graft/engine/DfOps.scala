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

  /** Materialize AND cut attribute lineage. localCheckpoint keeps the plan's
    * expression ids, so two checkpointed frames sharing an upstream scan put
    * duplicate attribute ids into sibling Union children — Catalyst's Union
    * constraint rewriting then resolves a constraint against the wrong child
    * (NoSuchElementException "key not found: x#N" in AttributeMap), and reid's
    * aliases can be stripped again by RemoveRedundantAliases. A fresh
    * LogicalRDD leaf over the checkpointed rows has new ids and no inherited
    * constraints. Delta-sized frames only: each consumer re-reads the blocks
    * through a row-conversion pass.
    */
  def freshLeaf(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Run `f` with Catalyst constraint propagation OFF, restoring the previous
    * setting after. localCheckpoint captures the origin plan's constraint set
    * into the LogicalRDD leaf, keyed by the OPTIMIZED plan's attribute ids;
    * when DeduplicateRelations re-ids attributes inside self-joining fixpoint
    * plans (Spark WARNs "output columns are expected to the same"), the
    * captured constraints reference attributes absent from the leaf's output,
    * and ANY later Union over that leaf dies in rewriteConstraints
    * ("key not found: x#N"). With propagation off during the checkpoint the
    * captured set is empty — the leaf is permanently clean, whatever the
    * session setting is when it is later queried. Constraint propagation also
    * has known super-linear planning cost on wide union fixpoint plans, so the
    * inference/update paths lose nothing by running without it.
    */
  // refcounted: the flag lives on the SHARED session conf, and TM/update work
  // now runs concurrently (parallel test suites, future concurrent mutations).
  // A plain set/restore bracket would re-enable propagation while a sibling
  // invocation is mid-checkpoint, re-poisoning its leaf. Restore only when the
  // LAST concurrent invocation exits; `prev` is captured at first entry.
  private val ncLock = new Object
  private var ncDepth = 0
  private var ncPrev: Option[String] = None
  def noConstraints[A](spark: org.apache.spark.sql.SparkSession)(f: => A): A = {
    val k = "spark.sql.constraintPropagation.enabled"
    ncLock.synchronized {
      if (ncDepth == 0) { ncPrev = spark.conf.getOption(k); spark.conf.set(k, "false") }
      ncDepth += 1
    }
    try f
    finally ncLock.synchronized {
      ncDepth -= 1
      if (ncDepth == 0) ncPrev match {
        case Some(v) => spark.conf.set(k, v)
        case None => spark.conf.unset(k)
      }
    }
  }

  /** Spread a narrow input across the session's cores. A small parquet table often
    * arrives as ONE split, so per-row pipelines (shingling, hashing, feature extraction)
    * run single-threaded; one cheap round-robin shuffle restores parallelism. No-op
    * when the input is already wide enough (the at-scale case).
    */
  def spread(df: DataFrame, actualBytes: Option[Long] = None): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Decide from the optimizer's size estimate, not .rdd.getNumPartitions: the
    // .rdd probe forces a full physical-planning pass per call (~10× the cost of
    // stats, measured), and the planned RDD is then thrown away. ≥4 MB/core means
    // the scan already splits wide enough that a round-robin shuffle buys nothing.
    // `actualBytes` (the store's at-rest dir size for the pruned partition)
    // overrides the estimate: path-based reads keep FULL-store stats after
    // pruning, so without it a big store never spreads — a 39 MB/1M-row scan
    // feeding per-row-fat BIND compute ran 3-wide on 32 cores (measured 30 s
    // of q_geo_service's 33 s at ~sf1).
    actualBytes match {
      // accurate-bytes path (statement-store scans): unlike the stats path it
      // can SEE per-row-scale scans, so it also applies a floor — below ~1 MB
      // the round-robin exchange costs more than the parallelism buys (a
      // 20 KB mutation WHERE scan must keep its shuffle-free single-stage
      // shape; measured +1 s on q_update_insert without the floor). Above it
      // spread: even a 4 MB/100k-row scan feeding per-row-fat BIND compute
      // (~50 µs/row) halves on the exchange (q_geo_service sf0.1 measured).
      case Some(b) =>
        if (b >= (1L << 20) && BigInt(b) < BigInt(target) * (4L << 20))
          df.repartition(target)
        else df
      case None =>
        val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
        if (bytes >= BigInt(target) * (4L << 20)) df else df.repartition(target)
    }
  }

  /** Global row_number WITHOUT a single-partition window: range-repartition on the
    * sort key, count per partition (tiny collect — one row per partition), broadcast
    * the cumulative offsets back as a literal map, and add a partition-LOCAL
    * row_number. The classic distributed rank (what RDD.zipWithIndex does under the
    * hood), expressed in DataFrame-land so the result stays a DataFrame.
    *
    * The input is materialized (localCheckpoint) before the offset job: range
    * partitioner boundaries are sampled, so an unmaterialized plan could re-sample
    * different boundaries between the count job and the final pass, skewing ranks.
    */
  def globalRowNumber(df: DataFrame, ord: Seq[org.apache.spark.sql.Column],
                      out: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val sorted = df.repartitionByRange(ord: _*).sortWithinPartitions(ord: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) => val o = acc; acc += n; (pid, o) }.toMap
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else element_at(typedLit(offsets), col("__pid"))
    val local = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(ord: _*)
    sorted.withColumn(out, offCol + row_number().over(local)).drop("__pid")
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

  /** As-of join: for each left row, the single most recent right row with
    * `right.timeCol <= left.timeCol` on the same key (event attribution, feature
    * snapshots at training time, slowly-changing-dimension lookup).
    *
    * Catalyst has no asof operator; the naive formulation (theta join + per-row
    * max) is a nested-loop cliff. This is the scalable shape: tag both sides,
    * union, ONE exchange on the key, and a running `last(ignoreNulls)` window
    * carries each right row forward to the left rows it answers — no join at
    * all, cost = one shuffle + one sort, linear in rows. At equal timestamps the
    * right row sorts first (asof `<=` semantics, like DuckDB ASOF JOIN / pandas
    * merge_asof). Left rows with no prior right row are dropped (inner asof).
    *
    * `rightCols` are the right-side payload columns to carry; they arrive
    * prefixed with `matched_`.
    */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame, key: String, time: String,
               rightCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val leftCols = leftDf.columns.toSeq
    val l = leftDf.withColumn("__side", lit(1))
    val r = rightDf.select((Seq(col(key), col(time).as("__rt"), lit(0).as("__side")) ++
      rightCols.map(c => col(c).as(s"matched_$c"))): _*)
      .withColumn(time, col("__rt"))
    val all = l.unionByName(r.drop("__rt"), allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(all) { (df, c) =>
      df.withColumn(s"matched_$c", last(col(s"matched_$c"), ignoreNulls = true).over(w))
    }.withColumn("matched_" + time,
      last(when(col("__side") === 0, col(time)), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1 && col(s"matched_${rightCols.head}").isNotNull)
      .select((leftCols ++ rightCols.map("matched_" + _) :+ s"matched_$time").map(col): _*)
  }

  /** Banded range join: rows of `points` matched to rows of `ranges` with
    * `lo <= v < hi`. The naive theta join is BroadcastNestedLoopJoin — quadratic
    * work per partition pair. Banding makes it an equi-join: each range explodes
    * to the `band`-width buckets it covers, each point hashes to its bucket, and
    * the exact predicate filters within the (tiny) bucket-local candidate set —
    * linear in points + range coverage, shuffle keyed on the bucket. Pick `band`
    * near the typical range width: wider bands = fewer replicas, more post-filter.
    */
  def rangeJoin(points: DataFrame, vCol: String, ranges: DataFrame,
                loCol: String, hiCol: String, band: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    // empty intervals (lo >= hi) match nothing; dropping them up front also keeps
    // sequence() from running DESCENDING (its start>stop behavior) into junk bands
    val rb = ranges.filter(col(loCol) < col(hiCol)).withColumn("__b", explode(sequence(
      floor(col(loCol) / band).cast("long"),
      floor((col(hiCol) - lit(1e-9)) / band).cast("long"))))
    val pb = points.withColumn("__b", floor(col(vCol) / band).cast("long"))
    pb.join(rb, Seq("__b")).filter(col(vCol) >= col(loCol) && col(vCol) < col(hiCol))
      .drop("__b")
  }
}
