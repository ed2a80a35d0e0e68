package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — one columnar pass, `zip_with`+`aggregate`
  * (codegen'd, no UDF). Scale path: LSH (random-hyperplane signs) or IVF (coarse
  * quantizer buckets + probe nearest cells) so the candidate set is a small fraction of
  * the corpus; both are deterministic here (hash-derived hyperplanes, first-m-vectors
  * centroids) so results are reproducible.
  */
object Similarity {

  /** Cosine similarity between two double-array columns (sequential fold — bit-stable).
    * HOF reference implementation; the operators below use `cosineFast`, the native
    * codegen'd expression with the identical fold (higher-order functions are
    * CodegenFallback — interpreted per row — see functions.CosineSim).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0d), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Native fused-loop cosine, bit-identical to `cosine` (same sequential fold).
    * The session must be registered first — every operator here does.
    */
  def cosineFast(a: Column, b: Column): Column =
    call_function("graft_cos_sim", a, b)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force cosine top-k for one query id: scan + TakeOrderedAndProject. */
  def topKForId(emb0: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int): DataFrame = {
    graft.functions.VectorExprs.register(emb0.sparkSession)
    val emb = graft.engine.DfOps.spread(emb0)
    val q = emb.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("qv"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol).as("neighbor"),
        cosineFast(asDouble(col(vecCol)), col("qv")).as("score"))
      .orderBy(col("score").desc, col("neighbor").asc)
      .limit(k)
  }

  /** Per-label centroid outliers — embedding-space QA for a labeled corpus:
    * build each label's (unnormalized) centroid as a vector sum, score every
    * member by cosine to its own label's centroid, and return the bottom-`k`
    * per label — the mislabeled / off-distribution candidates a curation pass
    * reviews. Output: (id, label, score), score rounded to 6 decimals.
    *
    * Scale shape: the explode feeds a map-side-combined (label, pos) sum whose
    * result is |labels|×dims rows — reassembled into one centroid array per
    * label and BROADCAST back, so the corpus-side pass is a per-row codegen'd
    * cosine (native `graft_cos_sim`, sequential fold) plus a per-label window
    * on (score, id). The corpus is never self-joined and never re-exploded.
    */
  def centroidOutliers(emb0: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, k: Int = 5): DataFrame = {
    graft.functions.VectorExprs.register(emb0.sparkSession)
    val emb = graft.engine.DfOps.spread(emb0)
    val ex = emb.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .withColumn("v", col("v").cast("double"))
    val cent = ex.groupBy("label", "pos").agg(sum("v").as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s("c")).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy(col("score").asc, col("id").asc)
    emb.select(col(idCol).as("id"), col(labelCol).as("label"),
        asDouble(col(vecCol)).as("dv"))
      .join(broadcast(cent), "label")
      .withColumn("score", cosineFast(col("dv"), col("cv")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("id"), col("label"), round(col("score"), 6).as("score"))
  }

  /** Random-hyperplane LSH signature: `bits` sign bits from hash-derived pseudo-planes.
    * Plane i's component for dimension d = centered quadratic-residue mix of (d, i)
    * mod a prime — deterministic, no stored plane matrix, computable inside codegen,
    * and exact-integer-reproducible in any SQL engine (the correctness oracle
    * recomputes the identical buckets; an engine-specific hash would not be).
    */
  def lshBucket(vec: Column, bits: Int): Column = {
    val signs = (0 until bits).map { i =>
      val dot = aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, d) => {
          val m = pmod(d.cast("long") * 7919L + lit(i.toLong * 104729L), lit(100003L))
          val y = pmod(m * m + lit(13L) * m, lit(100003L))
          x.cast("double") * ((pmod(y, lit(1000L)).cast("double") / 500.0d) - 1.0d)
        }),
        lit(0.0d), (acc, v) => acc + v)
      when(dot > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    signs.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed near-neighbor pairs: join within bucket, verify cosine ≥ threshold. */
  def lshPairs(emb0: DataFrame, idCol: String, vecCol: String,
               bits: Int = 12, threshold: Double = 0.8): DataFrame = {
    graft.functions.VectorExprs.register(emb0.sparkSession)
    val emb = graft.engine.DfOps.spread(emb0)
    val b = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), bits)).localCheckpoint()
    val l = b.select(col("bucket"), col("id").as("a"), col("v").as("va"))
    val r = b.select(col("bucket"), col("id").as("b"), col("v").as("vb"))
    l.join(r, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("score", cosineFast(col("va"), col("vb")))
      .filter(col("score") >= threshold)
      .select("a", "b", "score")
  }

  /** Nearest-centroid assignment: each doc row gains the `cid` of its best centroid. */
  private def assign(docs: DataFrame, centroids: DataFrame): DataFrame =
    docs.crossJoin(broadcast(centroids))
      .withColumn("cs", cosineFast(col("v"), col("cv")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("cs").desc, col("cid").asc)))
      .filter(col("rn") === 1).select(col("id"), col("v"), col("cid"))

  /** Lloyd-iteration k-means over `docs` (id, v): seeds from the first m vectors by
    * id, then `iters` rounds of assign → per-dimension mean. `sampleMod` trains on the
    * deterministic id-modulo sample (at corpus scale one trains on ~1e5-1e6 sampled
    * vectors, never the full table — the mean shuffle is O(sample·dim), map-side
    * combined). Centroid count m stays broadcast-small.
    */
  def kmeansCentroids(docs: DataFrame, m: Int, iters: Int, sampleMod: Int = 1): DataFrame = {
    graft.functions.VectorExprs.register(docs.sparkSession)
    val train = if (sampleMod <= 1) docs
      else docs.filter(pmod(col("id"), lit(sampleMod)) === 0)
    var cent = docs.orderBy("id").limit(m)
      .select(col("id").as("cid"), col("v").as("cv")).localCheckpoint()
    for (_ <- 0 until iters) {
      val means = assign(train, cent)
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("mx"))
        .groupBy("cid").agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("ps"))
        .select(col("cid"), transform(col("ps"), p => p("mx")).as("cv"))
      cent = means.localCheckpoint()
    }
    cent
  }

  /** IVF-style top-k: coarse-quantize to the nearest of m centroids, search only the
    * query's cell plus `probes-1` nearest cells. `trainIters`=0 uses the first m
    * vectors by id as deterministic (oracle-reproducible) centroids; >0 runs that many
    * k-means Lloyd iterations first. At scale: centroids broadcast, per-cell
    * partitions pruned before the fine scan.
    */
  def ivfTopK(emb0: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, m: Int = 16, probes: Int = 4,
              trainIters: Int = 0): DataFrame = {
    graft.functions.VectorExprs.register(emb0.sparkSession)
    val emb = graft.engine.DfOps.spread(emb0)
    val docs = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val centroids =
      if (trainIters > 0) kmeansCentroids(docs, m, trainIters)
      else docs.orderBy("id").limit(m)
        .select(col("id").as("cid"), col("v").as("cv"))
    val assigned = assign(docs, centroids)
    val qRow = assigned.filter(col("id") === queryId)
      .select(col("v").as("qv")).localCheckpoint()
    val qCells = centroids.crossJoin(broadcast(qRow))
      .withColumn("cs", cosineFast(col("cv"), col("qv")))
      .orderBy(col("cs").desc, col("cid").asc).limit(probes)
      .select("cid")
    assigned.join(broadcast(qCells), "cid").filter(col("id") =!= queryId)
      .crossJoin(broadcast(qRow))
      .select(col("id").as("neighbor"), cosineFast(col("v"), col("qv")).as("score"))
      .orderBy(col("score").desc, col("neighbor").asc)
      .limit(k)
  }

  /** Product-quantization ANN (ADC): the memory-bound 100 TB scale path. The
    * vector space splits into `m` subspaces; each subspace gets a `codes`-entry
    * codebook (`trainIters`=0: the first `codes` vectors' subvectors, the same
    * oracle-reproducible seeding `ivfTopK` uses; >0: per-subspace
    * `kmeansCentroids`); every corpus vector encodes to `m` small codes. A
    * query computes one m×codes distance table, and every candidate's
    * approximate L2² is m table lookups — the corpus is scanned as codes
    * (m bytes/vector vs 4·dim), never as floats.
    *
    * Scale shape: the m×codes codebook driver-materializes ONCE (it is tiny by
    * construction) and ships into the encode pass as expression literals, so
    * encoding is a pure map over the corpus — per-row, per-subspace argmin, no
    * join, no window, zero exchanges between the vector scan and the code
    * output (the encode pass is the 100 TB-dominant stage of PQ). The
    * per-query distance table is broadcast; ADC is a broadcast join + one
    * keyed aggregate over the code table. Per-id sums fold in subspace order
    * (sort_array + sequential aggregate), so distances are bit-stable across
    * engines.
    *
    * `trainIters` = 0 (the oracle mode) seeds each subspace codebook from the
    * first `codes` vectors' slices — deterministic and reproducible by an
    * external SQL oracle; > 0 trains a per-subspace k-means codebook (Lloyd
    * iterations over the subvectors), the quality path for real corpora.
    */
  def pqTopK(emb0: DataFrame, idCol: String, vecCol: String,
             queryId: Long, k: Int, m: Int = 8, codes: Int = 16,
             trainIters: Int = 0): DataFrame = {
    val emb = graft.engine.DfOps.spread(emb0)
    val docs = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val dim = docs.select(size(col("v"))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val subLen = dim / m
    def subVecs(df: DataFrame): DataFrame = df
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("ms"), col("v"))
      .select(col("id"), col("ms"),
        slice(col("v"), col("ms") * subLen + 1, lit(subLen)).as("sv"))
    val cbDf =
      if (trainIters > 0) {
        // trained path: an independent k-means codebook per subspace
        val subs = subVecs(docs).localCheckpoint()
        (0 until m).map { i =>
          kmeansCentroids(subs.filter(col("ms") === i)
              .select(col("id"), col("sv").as("v")), codes, trainIters)
            .withColumn("ms", lit(i))
            .withColumn("code", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy("ms")
                .orderBy("cid")) - 1)
            .select(col("ms"), col("code"), col("cv"))
        }.reduce(_ unionAll _)
      } else
        // oracle mode: subspace slices of the first `codes` vectors by id
        subVecs(docs.orderBy("id").limit(codes))
          .withColumn("code", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("ms").orderBy("id")) - 1)
          .select(col("ms"), col("code"), col("sv").as("cv"))
    // driver-materialize the m×codes codebook (bounded by construction) so the
    // encode pass needs no join at all — the codebook rides along as literals
    val cbMap: Map[Int, IndexedSeq[Seq[Double]]] = cbDf.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .groupBy(_._1).map { case (ms, rows) =>
        ms -> rows.sortBy(_._2).map(_._3.toSeq).toIndexedSeq }
    def l2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)
    // encode: pure map — argmin over the literal codebook of this row's subspace
    // (array_min over (d2, code) structs: least d2, ties to the lowest code)
    val cbAll = array((0 until m).map(ms =>
      array(cbMap(ms).map(cv => array(cv.map(lit): _*)): _*)): _*)
    val enc = subVecs(docs)
      .withColumn("code", array_min(zip_with(
        element_at(cbAll, col("ms") + 1), sequence(lit(0), lit(codes - 1)),
        (cv, c) => struct(l2(col("sv"), cv).as("d2"), c.as("code"))))("code"))
      .select(col("id"), col("ms"), col("code"))
    // query distance table: m×codes entries, broadcast
    val qTab = subVecs(docs.filter(col("id") === queryId))
      .withColumn("qds", zip_with(
        element_at(cbAll, col("ms") + 1), sequence(lit(0), lit(codes - 1)),
        (cv, c) => struct(l2(col("sv"), cv).as("qd"), c.as("code"))))
      .select(col("ms"), explode(col("qds")).as("p"))
      .select(col("ms"), col("p")("code").as("code"), col("p")("qd").as("qd"))
    // ADC: sum the m looked-up entries per candidate in subspace order
    enc.filter(col("id") =!= queryId)
      .join(broadcast(qTab), Seq("ms", "code"))
      .groupBy("id")
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("ms"), col("qd")))), p => p("qd")),
        lit(0.0d), (acc, v) => acc + v).as("dist"))
      .select(col("id").as("neighbor"), col("dist"))
      .orderBy(col("dist").asc, col("neighbor").asc)
      .limit(k)
  }

  /** IVF-PQ (the classic memory-bound composition, L2 throughout): coarse-
    * quantize every vector to its nearest of `cells` centroids, PQ-encode the
    * RESIDUAL (v − centroid) per subspace, and answer a query by probing the
    * `probes` nearest cells with one per-cell ADC table over the residual
    * codebook. Candidates outside the probed cells are never touched, and the
    * corpus is scanned as m-byte codes — the two prunings that make ANN
    * tractable when 100 TB of embeddings cannot be rescanned as floats.
    *
    * Scale shape: centroids (cells×dim) and the residual codebook
    * (m×codes×subLen) driver-materialize once — both bounded by construction —
    * and ride into the single encode pass as expression literals: assignment,
    * residual, and code argmin are all per-row map work, ZERO exchanges
    * between the vector scan and the (id, cell, codes) table. The per-query
    * ADC tables (probes×m×codes rows) compute on the driver from the one
    * query row and broadcast; ADC itself is a broadcast join + one keyed
    * aggregate. Deterministic first-k seeding keeps it oracle-reproducible.
    */
  def ivfPqTopK(emb0: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int, cells: Int = 8, probes: Int = 3,
                m: Int = 8, codes: Int = 16): DataFrame = {
    val spark = emb0.sparkSession
    val emb = graft.engine.DfOps.spread(emb0)
    val docs = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val dim = docs.select(size(col("v"))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val subLen = dim / m
    def l2Fold(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)
    // coarse centroids: first `cells` vectors by id (bounded, deterministic)
    val cent: IndexedSeq[Seq[Double]] = docs.orderBy("id").limit(cells)
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1).toSeq).toIndexedSeq
    val centLit = array(cent.map(cv => array(cv.map(lit): _*)): _*)
    // assignment + residual: pure map against the centroid literals
    val assigned = docs
      .withColumn("cell", array_min(zip_with(centLit, sequence(lit(0), lit(cells - 1)),
        (cv, c) => struct(l2Fold(col("v"), cv).as("d2"), c.as("cell"))))("cell"))
      .withColumn("r", zip_with(col("v"), element_at(centLit, col("cell") + 1),
        (x, y) => x - y))
    // residual codebook: subspace slices of the first `codes` vectors' residuals
    val cbMap: Map[Int, IndexedSeq[Seq[Double]]] = {
      val rows = assigned.orderBy("id").limit(codes).select(col("id"), col("r"))
        .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1).toSeq)
      (0 until m).map(ms =>
        ms -> rows.map(_.slice(ms * subLen, (ms + 1) * subLen)).toIndexedSeq).toMap
    }
    val cbAll = array((0 until m).map(ms =>
      array(cbMap(ms).map(cv => array(cv.map(lit): _*)): _*)): _*)
    // encode: one explode to (id, cell, ms) — narrow — then literal argmin
    val enc = assigned
      .select(col("id"), col("cell"),
        explode(sequence(lit(0), lit(m - 1))).as("ms"), col("r"))
      .select(col("id"), col("cell"), col("ms"),
        slice(col("r"), col("ms") * subLen + 1, lit(subLen)).as("sv"))
      .withColumn("code", array_min(zip_with(
        element_at(cbAll, col("ms") + 1), sequence(lit(0), lit(codes - 1)),
        (cv, c) => struct(l2Fold(col("sv"), cv).as("d2"), c.as("code"))))("code"))
      .select(col("id"), col("cell"), col("ms"), col("code"))
    // per-query ADC tables: one query row → driver math (bounded by design)
    val qv = docs.filter(col("id") === queryId).first().getSeq[Double](1).toSeq
    def l2s(a: Seq[Double], b: Seq[Double]): Double =
      a.lazyZip(b).foldLeft(0.0d) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val probed = cent.indices.map(c => (l2s(qv, cent(c)), c)).sorted.take(probes).map(_._2)
    val qtabRows = for {
      c <- probed
      qr = qv.lazyZip(cent(c)).map(_ - _)
      ms <- 0 until m
      code <- 0 until codes
    } yield (c, ms, code, l2s(qr.slice(ms * subLen, (ms + 1) * subLen), cbMap(ms)(code)))
    import spark.implicits._
    val qTab = qtabRows.toDF("cell", "ms", "code", "qd")
    // ADC over probed cells only: broadcast join + keyed agg, ms-ordered fold
    enc.filter(col("id") =!= queryId)
      .join(broadcast(qTab), Seq("cell", "ms", "code"))
      .groupBy("id")
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("ms"), col("qd")))), p => p("qd")),
        lit(0.0d), (acc, v) => acc + v).as("dist"))
      .select(col("id").as("neighbor"), col("dist"))
      .orderBy(col("dist").asc, col("neighbor").asc)
      .limit(k)
  }
}
