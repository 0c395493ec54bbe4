/*
 * A deliberately tiny shim in the `org.apache.spark.sql` namespace — the
 * standard extension-point pattern for Spark connectors that implement the
 * V1 streaming `Source` contract (Spark's own FileStreamSource and every
 * external V1 source build streaming micro-batch frames the same way).
 * Everything here is mechanical bridging; all graft logic lives in
 * `graft.sources`.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset

/** Base class for a version-cursor streaming source: concrete sources
  * (graft's change-feed tail) implement two PUBLIC-typed methods —
  * `currentVersion` (the table's committed manifest version) and
  * `changeBatch` (the CDC rows between two pinned versions, as a plain
  * batch frame) — and this bridge handles the V1 engine contract:
  * version ↔ [[LongOffset]] mapping (including the serialized-offset
  * form the engine replays from a checkpoint), and re-wrapping the batch
  * plan as the streaming leaf `getBatch` must return (the engine asserts
  * `isStreaming`; the batch plan executes lazily inside the micro-batch,
  * exactly FileStreamSource's construction).
  */
abstract class GraftSourceBridge extends Source {

  /** Latest committed version, None while the table does not exist yet. */
  protected def currentVersion(): Option[Long]

  /** CDC rows from `fromVersion` (exclusive snapshot base; None = the
    * initial full snapshot) to `toVersion`, as a BATCH DataFrame whose
    * schema equals [[schema]].
    */
  protected def changeBatch(fromVersion: Option[Long],
                            toVersion: Long): DataFrame

  /** Per-trigger version budget (rate limiting, FileStreamSource's
    * `maxFilesPerTrigger` shape): a consumer catching up after a long
    * stall drains its backlog in bounded micro-batches instead of one
    * lag-sized diff. None = unbounded (diff straight to latest). The
    * cap only applies once a cursor exists — the initial snapshot is
    * one batch regardless. Capped intermediate versions must still be
    * RETAINED (versions are dense, so the cap picks real versions;
    * pair rate limiting with a retention window ≥ the expected lag).
    */
  protected def maxVersionsPerTrigger: Option[Long] = None

  /** Highest version this source has OFFERED (or replayed) so far —
    * the rate-limit cursor. Seeded by recovery's `getBatch` replay,
    * exactly how FileStreamSource re-seeds its internal log.
    */
  private var offered: Option[Long] = None

  override def getOffset: Option[Offset] = {
    val capped = (currentVersion(), offered, maxVersionsPerTrigger) match {
      case (Some(latest), Some(seen), Some(cap)) =>
        Some(math.min(latest, seen + cap))
      case (cur, _, _) => cur
    }
    capped.foreach(v =>
      offered = Some(math.max(v, offered.getOrElse(Long.MinValue))))
    capped.map(v => LongOffset(v))
  }

  private def versionOf(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    offered = Some(math.max(endV, offered.getOrElse(Long.MinValue)))
    val batch = changeBatch(start.map(versionOf), endV)
    val classic = batch.asInstanceOf[ClassicDataset[Row]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = true)
  }

  override def stop(): Unit = ()
}

object GraftSourceBridge {
  /** Re-wrap a V1 `Sink.addBatch` frame as a plain batch DataFrame a
    * multi-action writer can safely reuse: the streaming-planned frame
    * the engine hands to addBatch is not built for repeated actions, so
    * — exactly like Spark's own ForeachBatchSink — pin its physical RDD
    * and re-expose it as a batch leaf.
    */
  def materializedBatch(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataset[Row]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = false)
  }
}
