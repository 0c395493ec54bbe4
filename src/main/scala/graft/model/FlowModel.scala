package graft.model

import java.time.LocalDateTime

/** Canonical flow-metrics data model, reproduced from the reference's
  * central types (`src/workitem/interfaces.ts:31-150`,
  * `src/data/work_item_type_aurora.ts:53-93`,
  * `src/configuration/event_date_extractor.ts:14-39`).
  */

/** A workflow step; identity is the (id, name) PAIR
  * (`work_item_type_aurora.ts:70-75` IsSameWorkflowStepKey).
  */
case class WorkflowStepDef(
    id: String,
    name: String,
    order: Int,
    stateType: String = "active",
    stateCategory: String = "",
    active: Boolean = true)

/** Configured event point orders (`workflowEvents` rows). */
case class WorkflowEventsDef(
    arrivalPointOrder: Int,
    commitmentPointOrder: Int,
    departurePointOrder: Int)

case class WorkflowDef(
    workflowId: String,
    steps: Seq[WorkflowStepDef],
    events: WorkflowEventsDef)

/** One revision of a work item's history — the engine-internal row consumed
  * by the event-date kernel (`HistoryItem`, `event_date_extractor.ts:14-26`).
  */
case class WorkItemRevision(
    workItemId: String,
    workflowId: String,
    revision: Int,
    statusId: String,
    statusName: String,
    changedDate: LocalDateTime,
    revisionType: String = "state_change")

/** All-primitive revision row for the distributed event-date kernel hot
  * path: epoch-micros `Long` instead of `LocalDateTime` (no object boxing
  * at the deserialization boundary).
  */
case class RevCompact(
    workItemId: String,
    workflowId: String,
    revision: Int,
    statusId: String,
    statusName: String,
    changedMicros: Long)

/** Result row of event-date extraction (`EventDates`,
  * `event_date_extractor.ts:28-39`). Point orders are None when the band has
  * no steps (the reference's `Math.min()` of an empty list = Infinity).
  */
case class EventDatesRow(
    workItemId: String,
    arrival: Option[LocalDateTime],
    commitment: Option[LocalDateTime],
    departure: Option[LocalDateTime],
    isDelayed: Boolean,
    delayedRevision: Option[Int],
    stepCategory: Option[String],
    arrivalPointOrder: Option[Int],
    commitmentPointOrder: Option[Int],
    departurePointOrder: Option[Int])

object StateCategories {
  val Preceding = "preceding"
  val Proposed = "proposed"
  val InProgress = "inprogress"
  val Completed = "completed"
}
