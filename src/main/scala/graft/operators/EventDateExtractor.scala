package graft.operators

import java.time.LocalDateTime

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model._

/** Event-date extraction — the semantic core of the reference
  * (`src/configuration/event_date_extractor.ts:117-368`, T4 in SURVEY §2.2;
  * band helpers `:49-115`; point orders / step category
  * `src/common/process_revision_utils.ts:60-114`).
  *
  * Order-sensitive per-item algorithm with nested lookahead — not cleanly
  * window-expressible, so it stays a pure per-key kernel driven by
  * `groupByKey(workItemId).flatMapGroups` (the idiomatic Spark shape for
  * order-dependent per-entity logic). The shuffle key is the work-item id
  * (high cardinality → even distribution); per-item history is bounded, so
  * the O(n²) lookahead is a non-issue at any scale.
  *
  * Semantics (mirrored exactly, see the reference's own comment block
  * `:126-141`):
  *  - workflow steps are banded by `order` vs the configured event point
  *    orders: before-arrival / arrival / commitment / departure;
  *  - arrival = first date in the arrival band, reset if the item regresses
  *    to a before-arrival step while only arrival is set (`:188-201`);
  *  - commitment = first date in the commitment band, unless a later
  *    same-day return to (before-)arrival suppresses it (`:225-285`);
  *    the item is delayed iff the last subsequent revision is a
  *    (before-)arrival step on a different day (`:241-253`);
  *  - departure = first date in the departure band unless ANY later
  *    revision is outside the departure band (`:288-322`);
  *  - fallbacks: missing arrival ← commitment∥departure (`:331-338`),
  *    missing commitment ← arrival when departed (`:339-347`), then clamp
  *    arrival ≤ commitment ≤ departure (`:348-365`).
  */
object EventDateExtractor {

  /** Step-key bands; keys are (id, name) pairs per IsSameWorkflowStepKey. */
  private[operators] case class Bands(
      before: Set[(String, String)],
      arrival: Set[(String, String)],
      commitment: Set[(String, String)],
      departure: Set[(String, String)],
      arrivalPointOrder: Option[Int],
      commitmentPointOrder: Option[Int],
      departurePointOrder: Option[Int])

  private[operators] def bands(wf: WorkflowDef): Bands = {
    val ev = wf.events
    def key(s: WorkflowStepDef) = (s.id, s.name)
    val before = wf.steps.filter(_.order < ev.arrivalPointOrder)
    val arrival = wf.steps.filter(s =>
      s.order >= ev.arrivalPointOrder && s.order < ev.commitmentPointOrder)
    val commitment = wf.steps.filter(s =>
      s.order >= ev.commitmentPointOrder && s.order < ev.departurePointOrder)
    val departure = wf.steps.filter(_.order >= ev.departurePointOrder)
    // point orders = min step order per band (process_revision_utils.ts:60-80);
    // an empty band yields None (the reference's Math.min() = Infinity).
    Bands(
      before.map(key).toSet, arrival.map(key).toSet,
      commitment.map(key).toSet, departure.map(key).toSet,
      arrival.map(_.order).minOption,
      commitment.map(_.order).minOption,
      departure.map(_.order).minOption)
  }

  /** Step-order classification (process_revision_utils.ts:82-114). */
  def stepCategory(order: Int, arrivalPO: Option[Int], commitmentPO: Option[Int],
                   departurePO: Option[Int]): String = {
    val a = arrivalPO.getOrElse(Int.MaxValue)
    val c = commitmentPO.getOrElse(Int.MaxValue)
    val d = departurePO.getOrElse(Int.MaxValue)
    if (order < a) StateCategories.Preceding
    else if (order >= a && order < c) StateCategories.Proposed
    else if (order >= c && order < d) StateCategories.InProgress
    else if (order >= d) StateCategories.Completed
    else "invalid"
  }

  /** Current category from date presence (date_utils.ts:38-64). */
  def stateCategoryByDate(arrival: Option[LocalDateTime],
                          commitment: Option[LocalDateTime],
                          departure: Option[LocalDateTime]): String =
    if (departure.isDefined) StateCategories.Completed
    else if (commitment.isDefined) StateCategories.InProgress
    else if (arrival.isDefined) StateCategories.Proposed
    else StateCategories.Preceding

  /** Point-in-time category relative to a comparison date
    * (date_utils.ts:66-96).
    */
  def stateCategoryRelativeToDate(cmp: LocalDateTime,
                                  arrival: Option[LocalDateTime],
                                  commitment: Option[LocalDateTime],
                                  departure: Option[LocalDateTime]): String = {
    if (arrival.isEmpty || cmp.isBefore(arrival.get)) StateCategories.Preceding
    else if (commitment.isEmpty || cmp.isBefore(commitment.get)) StateCategories.Proposed
    else if (departure.isEmpty || cmp.isBefore(departure.get)) StateCategories.InProgress
    else StateCategories.Completed
  }

  private def sameDay(a: LocalDateTime, b: LocalDateTime): Boolean =
    a.toLocalDate == b.toLocalDate

  /** The T4 kernel: pure, golden-testable.
    *
    * @param currentStepOrder order of the item's current workflow step, used
    *                         only for the reported `stepCategory`
    */
  def eventDates(revisions0: Seq[WorkItemRevision], wf: WorkflowDef,
                 currentStepOrder: Option[Int] = None): EventDatesRow = {
    val b = bands(wf)
    // stable ascending sort by changedDate (ties keep input order, matching
    // the reference's stable Array.sort on toMillis)
    val revs = revisions0.sortBy(_.changedDate)(
      Ordering.fromLessThan[LocalDateTime](_.isBefore(_))).toIndexedSeq

    var arrival: Option[LocalDateTime] = None
    var commitment: Option[LocalDateTime] = None
    var departure: Option[LocalDateTime] = None
    var isDelayed = false
    var delayedRevision: Option[Int] = None

    var i = 0
    while (i < revs.length) {
      val cur = revs(i)
      val key = (cur.statusId, cur.statusName)

      if (b.before(key) && arrival.isDefined && commitment.isEmpty && departure.isEmpty)
        arrival = None

      if (arrival.isEmpty && b.arrival(key))
        arrival = Some(cur.changedDate)

      if (commitment.isEmpty && b.commitment(key)) {
        var ignoreSameDayDelay = false
        var delayed = false
        var delayedRev: Option[Int] = None
        var j = i + 1
        while (j < revs.length) {
          val fut = revs(j)
          val fkey = (fut.statusId, fut.statusName)
          if (b.arrival(fkey) || b.before(fkey)) {
            if (!sameDay(fut.changedDate, cur.changedDate)) {
              delayed = true
              delayedRev = Some(fut.revision)
            } else delayed = false
            if (!ignoreSameDayDelay && sameDay(fut.changedDate, cur.changedDate))
              ignoreSameDayDelay = true
          } else delayed = false
          j += 1
        }
        // delayed-ness reflects the state at extract time, so it resets on
        // every candidate before the final decision (reference :273-277)
        isDelayed = false
        if (!ignoreSameDayDelay) {
          commitment = Some(cur.changedDate)
          if (delayed) {
            isDelayed = true
            delayedRevision = delayedRev
          }
        }
      }

      if (departure.isEmpty && b.departure(key)) {
        var ignore = false
        var j = i + 1
        while (j < revs.length) {
          val fkey = (revs(j).statusId, revs(j).statusName)
          if (b.arrival(fkey) || b.commitment(fkey) || b.before(fkey)) ignore = true
          j += 1
        }
        if (!ignore) departure = Some(cur.changedDate)
      }
      i += 1
    }

    if ((departure.isDefined || commitment.isDefined) && arrival.isEmpty)
      arrival = commitment.orElse(departure)
    if (arrival.isDefined && commitment.isEmpty && departure.isDefined)
      commitment = arrival
    if (commitment.isDefined && departure.isDefined && commitment.get.isAfter(departure.get))
      commitment = departure
    if (commitment.isDefined && arrival.isDefined && arrival.get.isAfter(commitment.get))
      arrival = commitment

    EventDatesRow(
      workItemId = revisions0.headOption.map(_.workItemId).getOrElse(""),
      arrival = arrival, commitment = commitment, departure = departure,
      isDelayed = isDelayed, delayedRevision = if (isDelayed) delayedRevision else None,
      stepCategory = currentStepOrder.map(o =>
        stepCategory(o, b.arrivalPointOrder, b.commitmentPointOrder, b.departurePointOrder)),
      arrivalPointOrder = b.arrivalPointOrder,
      commitmentPointOrder = b.commitmentPointOrder,
      departurePointOrder = b.departurePointOrder)
  }

  /** Whether a given snapshot revision is delayed
    * (process_revision_utils.ts:47-52): revision ≥ the delayed revision.
    */
  def isDelayedSnapshot(dates: EventDatesRow, revision: Int): Boolean =
    dates.delayedRevision.exists(revision >= _)

  /** Distributed driver: one [[EventDatesRow]] per work item.
    *
    * Workflows are a driver-side map (config dimension — small by nature)
    * captured in the closure, i.e. broadcast with the task binary. The
    * current step for `stepCategory` is the step of the latest revision.
    */
  def extract(revisions: Dataset[WorkItemRevision],
              workflows: Map[String, WorkflowDef]): Dataset[EventDatesRow] = {
    val spark: SparkSession = revisions.sparkSession
    import spark.implicits._
    revisions.groupByKey(_.workItemId).flatMapGroups { (id, it) =>
      val revs = it.toSeq
      workflows.get(revs.head.workflowId) match {
        case None => Iterator.empty
        case Some(wf) =>
          val sorted = revs.sortBy(_.changedDate)(
            Ordering.fromLessThan[LocalDateTime](_.isBefore(_)))
          val curOrder = wf.steps
            .find(s => s.id == sorted.last.statusId && s.name == sorted.last.statusName)
            .map(_.order)
          Iterator.single(eventDates(revs, wf, curOrder).copy(workItemId = id))
      }
    }
  }
}
