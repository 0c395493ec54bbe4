package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ADO revision keep-on-change dedupe, per field family — reference
  * `src/azureboards/data/revision_utils.ts`:
  *
  *  - state (`:73-107`): keep the first revision, then rows whose State
  *    differs from the previously kept row;
  *  - assignee (`:41-71`): same over AssignedTo.UserName, null-safe (an
  *    unassign IS a change);
  *  - blocked (`:3-39`): null and 'No' both mean unblocked; leading
  *    unblocked revisions are skipped entirely (the stream starts at the
  *    first blocking value), and each kept row carries
  *    `flagged = value is blocking`;
  *  - custom fields (`:112-145`): same keep-on-change per configured field.
  *
  * "Differs from previously kept" equals "differs from the previous raw
  * row" once the stream has started (all skipped rows repeat the kept
  * value), so the window `lag` formulation is exact.
  */
object AdoDedupe {

  /** Null-safe keep-on-change: first row kept, then rows where the value
    * differs from the previous row, treating null as a distinct value
    * (assignee semantics — unassignment is a change).
    */
  def keepOnChangeNullSafe(df: DataFrame, keyCols: Seq[Column],
                           orderCols: Seq[Column], valueCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(valueCol, 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> valueCol))
      .drop("__rn", "__prev")
  }

  def stateChanges(revisions: DataFrame): DataFrame =
    keepOnChangeNullSafe(revisions, Seq(col("WorkItemId")),
      Seq(col("Revision")), col("State"))

  def assigneeChanges(revisions: DataFrame): DataFrame =
    keepOnChangeNullSafe(revisions, Seq(col("WorkItemId")),
      Seq(col("Revision")), col("AssignedTo.UserName"))
      .withColumn("assignee", col("AssignedTo.UserName"))

  /** Blocked-field dedupe with the unblocked-prefix skip and flagged
    * stamping.
    */
  def blockedChanges(revisions: DataFrame, blockedField: String): DataFrame = {
    val v = col(blockedField)
    val blocking = v.isNotNull && v =!= "No"
    val w = Window.partitionBy(col("WorkItemId"))
    val firstBlocking = min(when(blocking, col("Revision"))).over(w)
    val started = revisions
      .withColumn("__start", firstBlocking)
      .filter(col("__start").isNotNull && col("Revision") >= col("__start"))
      .drop("__start")
    keepOnChangeNullSafe(started, Seq(col("WorkItemId")), Seq(col("Revision")), v)
      .withColumn("flagged", blocking)
  }

  /** Custom-field dedupe (`:112-145`): only revisions with a NON-NULL field
    * value are eligible (both the first kept row and every change) — the
    * reference skips null-valued rows without keeping them, so the stream
    * is null-filtered BEFORE the keep-on-change pass (on the filtered
    * stream, previous-raw equals previous-kept, making `lag` exact). Kept
    * rows carry `fieldValue` = the field's value.
    */
  def customFieldChanges(revisions: DataFrame, field: String): DataFrame =
    keepOnChangeNullSafe(revisions.filter(col(field).isNotNull),
      Seq(col("WorkItemId")), Seq(col("Revision")), col(field))
      .withColumn("fieldValue", col(field))
}
