package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream.
  *
  * The reference's FIFO-per-key ordering (`serverless.yml:187-196`) and
  * watermark resume semantics (SURVEY §2.5) translate in Spark to per-key
  * event-time ordering; sessionization is the batch analog of a session
  * window (`session_window` in Structured Streaming uses the same gap rule).
  *
  * Implementation: a session starts where the gap to the previous event
  * exceeds `gapMinutes`; the session id is the running count of boundaries.
  * Single shuffle on the user key; scales by key cardinality.
  */
object Sessionize {

  /** Adds `session_id` (0-based per user) to an event frame. */
  def withSessionIds(events: DataFrame, key: Column, ts: Column,
                     orderTieBreak: Column, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, orderTieBreak)
    val boundary = when(
      lag(ts, 1).over(w).isNull ||
        ts > lag(ts, 1).over(w) + expr(s"INTERVAL $gapMinutes MINUTES"), 1
    ).otherwise(0)
    events.withColumn("__boundary", boundary)
      .withColumn("session_id",
        sum(col("__boundary")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__boundary")
  }

  /** One row per session: start, end, event count. */
  def sessions(events: DataFrame, key: Column, ts: Column,
               orderTieBreak: Column, gapMinutes: Int): DataFrame =
    withSessionIds(events, key, ts, orderTieBreak, gapMinutes)
      .groupBy(key, col("session_id"))
      .agg(min(ts).as("session_start"), max(ts).as("session_end"),
        count(lit(1)).as("n_events"))
}
