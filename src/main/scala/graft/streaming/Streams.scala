package graft.streaming

import graft.model.GraftStore
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming surfaces.
  *
  * The reference has no streaming operators (SURVEY §2.18) — its nearest analog is the
  * change-log listener API (`rdf/changesets/IChangeLog.java`) feeding incremental
  * maintenance. Mirrored here as: (1) watermarked windowed aggregation over the events
  * stream, (2) custom per-key state via flatMapGroupsWithState (sessionization), and
  * (3) `foreachBatch` incremental triple ingest — each micro-batch parses N-Triples
  * lines and appends to the statement store (the IChangeLog "inserted statements" hook).
  */
object Streams {

  /** Tumbling-window event counts with a watermark (late data dropped after `watermark`). */
  def windowedEventStats(events: DataFrame, watermarkDur: String = "10 minutes",
                         windowDur: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDur)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  final case class Session(userId: Long, nEvents: Long, totalValue: Double)
  final case class Ev(user_id: Long, value: Double)

  /** Per-user running session state via flatMapGroupsWithState
    * (KeyValueGroupedDataset custom state — the mapGroupsWithState surface).
    */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Session]) =>
          val prev = state.getOption.getOrElse(Session(user, 0L, 0.0))
          val batch = evs.toSeq
          val next = Session(user, prev.nEvents + batch.size,
            prev.totalValue + batch.map(_.value).sum)
          state.update(next)
          Iterator(next)
      }
  }

  /** Streaming document-pipeline stage: token count, quality score, language id
    * over a document stream — pure columnar expressions (no UDF, no state), so the
    * stage is a stateless map that composes with any sink or further stage.
    */
  def docFeatures(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("tokens", graft.pipeline.TextStats.tokenCount(col(textCol)))
      .withColumn("quality", graft.pipeline.TextStats.qualityScoreCol(col(textCol)))
      .withColumn("lang_pred", graft.pipeline.TextStats.langIdCol(col(textCol)))

  /** Streaming decontamination stage: flag arriving documents whose word n-grams
    * overlap a STATIC benchmark set. The probe grams are a batch DataFrame
    * (broadcast under the stream-static join), and the flag is computed per row
    * via a grouped overlap count re-joined on the doc id — stateless beyond the
    * micro-batch, so it composes with the dedup/feature stages.
    */
  def streamingDecontamFlag(docs: DataFrame, probes: DataFrame,
                            idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val probeGrams = probes
      .select(explode(graft.pipeline.Dedup.shingles(col(textCol), n)).as("g"))
      .dropDuplicates("g")
    docs.withColumn("__toks", split(lower(trim(col(textCol))), "\\s+"))
      .withColumn("contaminated",
      size(org.apache.spark.sql.functions.array_intersect(
        graft.pipeline.Dedup.shinglesOfTokens(col("__toks"), n),
        // probe sets are benchmark-sized: collect once, inline as an array literal
        // so the stage stays a stateless per-row map (valid in any output mode)
        lit(probeGrams.collect().map(_.getString(0))))) > 0)
      .drop("__toks")
  }

  /** Streaming exact dedup: drop re-arrivals of the same content hash within the
    * watermark horizon. State is bounded by the watermark (Spark evicts fingerprints
    * older than the event-time horizon) — the streaming-ingest analog of
    * `Dedup.exactKeepers` for a 100 TB/day pipeline where the duplicate window is
    * time-bounded.
    */
  def streamingExactDedup(docs: DataFrame, tsCol: String, textCol: String,
                          watermarkDur: String = "1 hour"): DataFrame =
    docs
      .withColumn("__fp", xxhash64(col(textCol)))
      .withWatermark(tsCol, watermarkDur)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Mutable holder for an incrementally-maintained store. */
  final class StreamingStore(spark: SparkSession, initial: GraftStore,
                             maintainClosure: Boolean = false) {
    @volatile var store: GraftStore = initial

    /** Start incremental ingest from a streaming Dataset of N-Triples lines.
      * With `maintainClosure`, each micro-batch re-derives entailments over the
      * updated store (incremental closure maintenance — the IChangeLog consumer the
      * reference feeds its `TruthMaintenance` from; recompute-on-delta is the
      * columnar-store strategy, SURVEY §2.15).
      */
    def start(lines: Dataset[String], checkpointDir: String): StreamingQuery = {
      lines.writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: Dataset[String], _: Long) =>
          val stmts = graft.sources.Rio.statementsFromLines(batch)
          if (!stmts.isEmpty) {
            val appended = store.withStatements(
              store.statements.unionByName(stmts).localCheckpoint())
            store = if (maintainClosure)
              graft.inference.Rdfs.truthMaintain(appended) else appended
          }
        }
        .start()
    }
  }
}
