package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subject access path: an s-keyed at-rest copy of the statements.
  *
  * The statements layout is predicate-partitioned (`GraftStore.save`) — perfect
  * for predicate-bound scans, but a bound-subject / unbound-predicate probe
  * (`<entity> ?p ?v`: entity fetch, DESCRIBE expansion, BSBM Q11) has no
  * pruning dimension there and must scan every partition's s-column (measured
  * 8.2 s solo / 21.6 s under 4 clients at sf0.1 — CONCURRENCY.json r15). The
  * reference guarantees a covering B+Tree for every bound-position combination
  * (`rdf/spo/SPOKeyOrder.java:112-127` — SPO among them; probes served in
  * milliseconds via `rdf/spo/SPOAccessPath.java`). The Spark-native analog is a
  * second parquet copy keyed for the subject:
  *
  *   - partition dirs on `s_b = pmod(s.id, nb)` → a probe prunes to 1/nb of
  *     the corpus at the TASK level (no footer reads outside the bucket);
  *   - rows sorted by `s.id` within each bucket file → parquet row-group
  *     min/max stats reduce the in-bucket read to the probe's few row groups;
  *   - `nb` scales with corpus size (one bucket per ~2M statements, 32..4096),
  *     so bucket size — the per-probe IO bound — stays roughly constant as the
  *     store grows 100×.
  *
  * Durability contract mirrors the lexicon (`GraftStore.saveInPlace`): the
  * base copy matches one statements generation (recorded in `_sidxmeta`);
  * each durable commit appends its row-level diff (±1 `d` rows, same bucket
  * dirs) to the `-sidx-delta` side dir — O(touched partitions), the commit's
  * own budget — and a 2%-of-base valve folds the side dir back. In-session
  * mutation segments are layered on top by `GraftStore.subjectSlice`.
  */
object SubjectIndex {

  def dir(path: String): String = path + "-sidx"
  def deltaDir(path: String): String = path + "-sidx-delta"
  private def metaFile(path: String): java.io.File =
    new java.io.File(dir(path), "_sidxmeta")

  /** Per-bucket statement target: keeps probe IO (one bucket) ~constant. */
  private val ROWS_PER_BUCKET = 2000000L
  private val MIN_BUCKETS = 32L
  private val MAX_BUCKETS = 4096L

  final case class Handle(nb: Long, base: DataFrame, delta: Option[DataFrame])

  /** In-session handles keyed by every at-rest generation that feeds the view:
    * the statements base (validity), the sidecar base, and the delta side dir.
    * Writers additionally call `invalidate` — two commits inside one filesystem
    * mtime tick must never serve pre-commit frames (same rule as lexCache).
    */
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, Long, Long, Long), Handle]

  private[graft] def invalidate(path: String): Unit =
    cache.filterInPlace { case ((p, _, _, _), _) => p != path }

  private def readMeta(path: String): Option[(Long, Long)] = {
    val f = metaFile(path)
    if (!f.exists()) None
    else try {
      val m = java.nio.file.Files.readAllLines(f.toPath)
      val kv = m.toArray(Array.empty[String]).iterator
        .map(_.split("=", 2)).collect { case Array(k, v) => k -> v.toLong }.toMap
      for { nb <- kv.get("nb"); gen <- kv.get("gen") } yield (nb, gen)
    } catch { case _: Exception => None }
  }

  private def writeMeta(path: String, nb: Long, gen: Long): Unit =
    java.nio.file.Files.writeString(metaFile(path).toPath, s"nb=$nb\ngen=$gen\n")

  /** The sidecar handle for statements path `path`, when one exists AND its
    * recorded statements generation matches the current base — a base that was
    * rewritten outside the maintained commit path reads as stale (None) and the
    * caller falls back to the predicate-partitioned scan.
    */
  def forPath(spark: SparkSession, path: String): Option[Handle] = {
    val stGen = GraftStore.parquetGen(path)
    val sGen = GraftStore.parquetGen(dir(path))
    if (stGen < 0 || sGen < 0) return None
    val dGen = GraftStore.parquetGen(deltaDir(path))
    cache.get((path, stGen, sGen, dGen)).orElse {
      readMeta(path) match {
        case Some((nb, gen)) if gen == stGen =>
          // a probe's seed set rides an In filter down to the parquet scan;
          // the default pushdown threshold (10) would drop it for multi-seed
          // probes, leaving row-group stats unused
          spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "1030")
          val base = spark.read.parquet(dir(path))
          val delta =
            if (dGen < 0) None
            else Some(spark.read.parquet(deltaDir(path)))
          val h = Handle(nb, base, delta)
          cache.put((path, stGen, sGen, dGen), h)
          Some(h)
        case _ => None
      }
    }
  }

  private def bucketCount(rows: Long): Long =
    math.max(MIN_BUCKETS, math.min(MAX_BUCKETS, rows / ROWS_PER_BUCKET + 1))

  /** Write the s-keyed copy of `stmts` (which must be the exact content of the
    * statements at `path`, possibly still staged in memory during a bulk load).
    * Does NOT stamp the meta — `stamp` runs after the statements base itself is
    * at rest, so the recorded generation is the real `_SUCCESS` mtime.
    * Returns the bucket count.
    */
  def build(stmts: DataFrame, path: String): Long = {
    val nb = bucketCount(stmts.count())
    stmts.select(GraftStore.columns.map(col): _*)
      .withColumn("s_b", pmod(col("s")("id"), lit(nb)).cast("int"))
      .repartition(col("s_b"))
      .sortWithinPartitions(col("s_b"), col("s")("id"))
      .write.mode("overwrite").partitionBy("s_b").parquet(dir(path))
    nb
  }

  /** Record the statements generation the just-built sidecar matches. */
  def stamp(path: String, nb: Long): Unit = {
    writeMeta(path, nb, GraftStore.parquetGen(path))
    invalidate(path)
  }

  /** Build the sidecar for an already-at-rest store when missing or stale —
    * covers stores written before the subject path existed. No-op when valid.
    */
  def ensure(spark: SparkSession, path: String): Unit = {
    if (GraftStore.parquetGen(path) < 0) return
    if (forPath(spark, path).isDefined) return
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(dir(path), deltaDir(path))
      .foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d), true))
    val nb = build(spark.read.parquet(path).select(GraftStore.columns.map(col): _*), path)
    stamp(path, nb)
  }

  /** Durable-commit maintenance (called by `GraftStore.saveInPlace` AFTER the
    * statements overwrite): append the commit's row diff (`__d` = ±1) to the
    * bucket-partitioned delta dir and re-stamp the meta at the new statements
    * generation. O(touched partitions) — the commit's own budget.
    */
  def appendDelta(rowDiff: DataFrame, path: String, nb: Long): Unit = {
    if (!rowDiff.isEmpty)
      rowDiff.select((GraftStore.columns.map(col) :+ col("__d").as("d")): _*)
        .withColumn("s_b", pmod(col("s")("id"), lit(nb)).cast("int"))
        .repartition(col("s_b"))
        .sortWithinPartitions(col("s_b"), col("s")("id"))
        .write.mode("append").partitionBy("s_b").parquet(deltaDir(path))
    stamp(path, nb)
  }

  private def treeBytes(f: java.io.File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).map(_.iterator.map(treeBytes).sum).getOrElse(0L)
    else f.length()

  /** Fold the delta side dir into the base once it outgrows 2% of the base
    * (floor 16 MB) — bounds the per-probe fold union, amortized exactly like
    * the lexicon's valve (`GraftStore.maybeCompactLexicon`).
    */
  def maybeCompact(spark: SparkSession, path: String): Unit = {
    val dd = deltaDir(path)
    val db = treeBytes(new java.io.File(dd))
    if (db <= math.max(16L << 20, treeBytes(new java.io.File(dir(path))) / 50)) return
    val meta = readMeta(path).getOrElse(return)
    val nb = meta._1
    val folded = fold(spark.read.parquet(dir(path)).drop("s_b"),
        spark.read.parquet(dd).drop("s_b"))
      .withColumn("s_b", pmod(col("s")("id"), lit(nb)).cast("int"))
      .repartition(col("s_b"))
      .sortWithinPartitions(col("s_b"), col("s")("id"))
    val root = new org.apache.hadoop.fs.Path(dir(path))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir(path) + ".staging")
    fs.delete(tmp, true)
    folded.write.mode("overwrite").partitionBy("s_b").parquet(tmp.toString)
    fs.delete(root, true)
    if (!fs.rename(tmp, root))
      throw new IllegalStateException(s"sidx compaction swap failed: $tmp -> $root")
    fs.delete(new org.apache.hadoop.fs.Path(dd), true)
    writeMeta(path, nb, meta._2)
    invalidate(path)
  }

  /** Net-present rows of base (+1 each) folded with delta (`d` = ±1) — keyed
    * on the statement identity (s,p_id,o,g,stype by id).
    */
  private[model] def fold(base: DataFrame, delta: DataFrame): DataFrame =
    base.withColumn("__d", lit(1L))
      .unionByName(delta.withColumnRenamed("d", "__d")
        .select((GraftStore.columns :+ "__d").map(col): _*))
      .groupBy(col("s")("id").as("__sk"), col("p_id"),
        col("o")("id").as("__ok"),
        coalesce(col("g")("id"), lit(GraftStore.NULL_GRAPH_ID)).as("__gk"),
        col("stype"))
      .agg(first(col("s")).as("s"), first(col("p")).as("p"),
        first(col("o")).as("o"), first(col("g")).as("g"),
        sum(col("__d")).as("__n"))
      .filter(col("__n") > 0)
      .select(GraftStore.columns.map(col): _*)
}
