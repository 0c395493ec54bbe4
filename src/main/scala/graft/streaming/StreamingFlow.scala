package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.sources.{MaterializedViews, MergeWriter}

/** Structured Streaming skin over the batch operators — the reference's
  * SQS micro-batch + watermark semantics (SURVEY §2.5) re-expressed:
  *
  *  - EventBridge rate schedules → `Trigger.ProcessingTime`;
  *  - `nextRunStartFrom` high-watermark per datasource → source offsets +
  *    event-time watermark;
  *  - FIFO-per-key queues → state partitioned by key in
  *    `flatMapGroupsWithState`;
  *  - at-least-once SQS delivery + DB unique keys → idempotent
  *    `foreachBatch` MERGE on the natural key (L2).
  */
object StreamingFlow {

  /** Tumbling-window event counts with a watermark — the streaming analog
    * of the CFD date bucketing (A1). Late rows beyond the watermark are
    * dropped, matching the reference's daily re-extract tolerance.
    */
  def windowedCounts(events: DataFrame, ts: Column, key: Column,
                     windowDuration: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(ts.toString(), watermarkDelay)
      .groupBy(window(ts, windowDuration), key)
      .agg(count(lit(1)).as("n_events"))

  /** Gap-based session aggregation via `session_window` — the streaming
    * twin of the batch Sessionize operator.
    */
  def sessionAgg(events: DataFrame, ts: Column, key: Column,
                 gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(ts.toString(), watermarkDelay)
      .groupBy(session_window(ts, gap), key)
      .agg(count(lit(1)).as("n_events"))

  /** Custom per-key state: running per-user revision counter and latest
    * state — the `KeyValueGroupedDataset.flatMapGroupsWithState` shape the
    * reference's per-item Lambda state machine maps to.
    */
  case class EventIn(userId: Long, eventType: String, tsMicros: Long)
  case class UserState(nEvents: Long, lastType: String)
  case class UserUpdate(userId: Long, nEvents: Long, lastType: String)

  def runningUserState(events: org.apache.spark.sql.Dataset[EventIn])
    : org.apache.spark.sql.Dataset[UserUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventIn], state: GroupState[UserState]) =>
          // deterministic within-batch order: event time, then type (the
          // tie-break makes `lastType` well-defined even on equal stamps)
          val sorted = rows.toSeq.sortBy(e => (e.tsMicros, e.eventType))
          val prev = state.getOption.getOrElse(UserState(0L, ""))
          val next = sorted.foldLeft(prev) { (s, e) => UserState(s.nEvents + 1, e.eventType) }
          state.update(next)
          Iterator.single(UserUpdate(userId, next.nEvents, next.lastType))
      }
  }

  /** Watermarked stream-stream INNER interval join — the "conversion
    * within N minutes of an impression" correlation between two live
    * streams, the one streaming shape no stateless transform or single
    * stateful agg expresses: BOTH sides buffer in keyed state and each
    * arriving row probes the other side's buffer.
    *
    * Semantics and state bounds:
    *  - join condition = key equality AND `rightTs` in
    *    [`leftTs`, `leftTs` + `maxDelay`] — the time bound is REQUIRED:
    *    with it, each side's state is evicted once the watermark passes
    *    (left rows after watermark > leftTs + maxDelay, right rows after
    *    watermark > rightTs), so state is bounded by rate × horizon, never
    *    stream length;
    *  - inner join emits eagerly on match (no watermark wait), so under
    *    AvailableNow the result equals the batch join of the full inputs —
    *    which is exactly what the oracle runs;
    *  - the state store partitions on the join key: scale-safe for
    *    high-cardinality keys (user, session), the usual stream-correlation
    *    keys.
    *
    * Column names must already be disambiguated (no shared names across
    * the two sides). `watermarkDelay` is the lateness tolerance;
    * `maxDelay` the business horizon (e.g. "30 minutes").
    *
    * `joinType = "left_outer"` additionally emits unmatched left rows
    * with nulls — but only once the watermark passes `leftTs + maxDelay`
    * (before that a match could still arrive). A finite run therefore
    * needs a final watermark advance to flush the tail: under
    * AvailableNow, far-future sentinel rows arriving LAST on BOTH streams
    * (each side's watermark advances independently; the join uses the
    * minimum), with the no-data finalize micro-batch doing the emission —
    * the q66 session-flush mechanics.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   watermarkDelay: String, maxDelay: String,
                   joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTs, watermarkDelay)
      .join(right.withWatermark(rightTs, watermarkDelay),
        expr(s"$leftKey = $rightKey AND " +
          s"$rightTs >= $leftTs AND $rightTs <= $leftTs + interval $maxDelay"),
        joinType)

  /** Stream-side dedupe of at-least-once REDELIVERY (the SQS
    * visibility-timeout double-delivery the reference's loads tolerate
    * via DB unique indexes): watermark-bounded `dropDuplicatesWithinWatermark`
    * on the natural key drops every extra copy arriving inside the
    * redelivery horizon, and the per-key state is EVICTED once the
    * watermark passes — bounded by delay × arrival rate, never by stream
    * length (plain `dropDuplicates` on a non-event-time key would grow
    * state forever). Size `watermarkDelay` to the transport's redelivery
    * horizon, not the analytics lateness tolerance.
    */
  def dedupedStream(events: DataFrame, ts: Column, watermarkDelay: String,
                    keys: Seq[String]): DataFrame =
    events
      .withWatermark(ts.toString(), watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Idempotent streaming load: every micro-batch is MERGEd into the target
    * on its natural key, so replays (at-least-once) are harmless — the L2
    * semantics (`snapshot_load_processor_aurora.ts:25-70`).
    *
    * @param versionCol ingestion-order / version column used to pick the
    *   winner among intra-batch duplicate keys. It must NOT be part of the
    *   key (a key column is constant within its window partition, which
    *   would make the "last write wins" choice arbitrary).
    */
  /** @param mode Update (default) re-emits windows as they change — right
    *   for monotone aggregates whose latest value wins on the key; Append
    *   emits each key once when the watermark finalizes it — required for
    *   session windows, whose identity (window start) can change while open
    *   as late members merge sessions.
    */
  def mergeSink(stream: DataFrame, tablePath: String, keys: Seq[String],
                versionCol: Column, checkpointDir: String,
                trigger: Option[Trigger] = None,
                mode: OutputMode = OutputMode.Update()): StreamingQuery = {
    // a versionCol built ONLY from key columns is constant within its key
    // partition, making the last-write-wins pick arbitrary. Check the
    // expression's leaf attributes (catches aliases and arithmetic over a
    // key, which a string comparison would miss).
    val leafAttrs = org.apache.spark.sql.GraftColumnShim.catalystTree(versionCol)
      .collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a.name
      }
    // no leaf attributes (a literal) is just as partition-constant as a
    // key-only expression — both make the last-write-wins pick arbitrary
    require(leafAttrs.nonEmpty && !leafAttrs.forall(keys.contains),
      s"versionCol $versionCol is constant within a key partition " +
        s"(literal or built only from merge keys $keys) — " +
        "it cannot order duplicates within a key")
    val writer = stream.writeStream
      .outputMode(mode)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        MergeWriter.merge(spark, tablePath,
          MergeWriter.dedupeOnKey(batch, keys, Seq(versionCol)), keys)
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** Exactly-once streaming ROLLUP sink: each micro-batch is aggregated
    * per key and FOLDED into the target with
    * [[MergeWriter.mergeAdditive]], using Spark's epoch/batch id as the
    * transaction version — the composition Structured Streaming's
    * foreachBatch contract asks of a sink ("use batchId to deduplicate"):
    * after a crash between sink write and checkpoint commit, the replayed
    * batch carries the SAME id and the manifest txn ledger skips it, so
    * counts never double even though folding is not idempotent. The
    * aggregation is per-batch (map-side combinable) and each fold is
    * O(touched buckets).
    *
    * `stream` must be a RAW (non-aggregated) stream; `aggExprs` build the
    * per-batch delta per key. Sum-foldable aggregates only (counts,
    * sums) — the stored row is the running total.
    */
  def additiveRollupSink(stream: DataFrame, tablePath: String,
                         keys: Seq[String],
                         aggExprs: Seq[org.apache.spark.sql.Column],
                         checkpointDir: String, appId: String,
                         trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = batch.groupBy(keys.map(col): _*)
          .agg(aggExprs.head, aggExprs.tail: _*)
        val addCols = delta.columns.filterNot(keys.contains).toSeq
        MergeWriter.mergeAdditive(batch.sparkSession, tablePath, delta,
          keys, addCols, txn = (appId, batchId))
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** Streaming sink with MATERIALIZED-VIEW maintenance (round 14): each
    * micro-batch lands in the SOURCE table as one exactly-once keyed
    * merge (Spark's batch id as the txn version), then every attached
    * MV refreshes off the source's change feed — cost ∝ the batch,
    * never the corpus. This subsumes the hand-rolled additive rollup
    * (q129's shape): declare the rollup ONCE as `create_mv` and attach
    * it here; COUNT/SUM/MIN/MAX, WHERE predicates, group liveness and
    * dim joins all come with the MV's maintenance instead of being
    * re-implemented per sink.
    *
    * Crash-safe composition with NO cross-step transaction needed: a
    * replayed batch's merge is skipped by the source's txn ledger, and
    * `refresh` folds exactly the source-version window past the MV's
    * own anchor — whether the crash hit before the merge, between
    * merge and refresh, or between two MVs' refreshes, the replay
    * converges (each step is independently exactly-once).
    *
    * `refreshEvery` (round 15) DECOUPLES view freshness from trigger
    * latency: the refreshes run serially inside `foreachBatch`, so one
    * slow MV (an extremum re-scan burst, a moved dim) would otherwise
    * stall source ingestion — with `refreshEvery = N` only every Nth
    * batch (and always batch 0, so the views are never unanchored for
    * a whole cadence on a fresh stream) pays the refresh, and the MV
    * anchors make the skipped windows fold into the next refresh
    * exactly-once. The views lag at most N-1 triggers; the SOURCE
    * table is always current.
    */
  def mvMaintainedSink(stream: DataFrame, sourcePath: String,
                       keys: Seq[String], mvPaths: Seq[String],
                       checkpointDir: String, appId: String,
                       trigger: Option[Trigger] = None,
                       buckets: Int = 64,
                       refreshEvery: Int = 1): StreamingQuery = {
    require(refreshEvery >= 1, "mvMaintainedSink: refreshEvery >= 1")
    val writer = stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        MergeWriter.merge(spark, sourcePath, batch, keys, buckets,
          txn = Some((appId, batchId)))
        if (batchId % refreshEvery == 0)
          mvPaths.foreach(p => MaterializedViews.refresh(spark, p))
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** File-fed streaming source with a bounded micro-batch size — the shape
    * of the reference's SQS batches of 50 over the S3 raw-item drop
    * (`serverless.yml:238-251`): each trigger consumes up to
    * `maxFilesPerTrigger` newly arrived files.
    */
  def fileStream(spark: SparkSession, srcDir: String, schema: StructType,
                 maxFilesPerTrigger: Int): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
}
