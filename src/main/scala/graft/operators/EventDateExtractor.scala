package graft.operators

import java.time.{LocalDateTime, ZoneOffset}

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
  * The distributed kernel runs on PRIMITIVE rows ([[RevCompact]]: strings +
  * epoch-micros long) and int band codes — the round-1 version's
  * LocalDateTime + Option object encoders cost ~100µs/row at the input
  * boundary; the semantics are identical and the rich-typed [[eventDates]]
  * wrapper (used by the golden/property tests) delegates to the same
  * primitive kernel, so the two paths cannot diverge.
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

  /** Sentinel for "no date" in the primitive kernel. */
  private final val NoDate = Long.MinValue
  private final val MicrosPerDay = 86400000000L

  // band codes
  private final val BandBefore = 0
  private final val BandArrival = 1
  private final val BandCommitment = 2
  private final val BandDeparture = 3
  private final val BandUnknown = -1

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

  /** Per-workflow compiled lookup: (statusId, statusName) → band code, plus
    * step order for the current-step category. Serializable; built once on
    * the driver and shipped with the task closure.
    */
  private[operators] final class CompiledWorkflow(wf: WorkflowDef) extends Serializable {
    private val bandByKey = new java.util.HashMap[String, Int]()
    private val orderByKey = new java.util.HashMap[String, Int]()
    val b: Bands = bands(wf)
    wf.steps.foreach { s =>
      val k = s.id + '\u0000' + s.name
      orderByKey.put(k, s.order)
      val band =
        if (b.before((s.id, s.name))) BandBefore
        else if (b.arrival((s.id, s.name))) BandArrival
        else if (b.commitment((s.id, s.name))) BandCommitment
        else BandDeparture
      bandByKey.put(k, band)
    }
    def bandOf(statusId: String, statusName: String): Int = {
      val v = bandByKey.get(statusId + '\u0000' + statusName)
      if (v == 0 && !bandByKey.containsKey(statusId + '\u0000' + statusName)) BandUnknown
      else v
    }
    def orderOf(statusId: String, statusName: String): Option[Int] = {
      val k = statusId + '\u0000' + statusName
      if (orderByKey.containsKey(k)) Some(orderByKey.get(k)) else None
    }
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

  private[operators] def toMicros(d: LocalDateTime): Long =
    d.toEpochSecond(ZoneOffset.UTC) * 1000000L + d.getNano / 1000L

  private[operators] def fromMicros(m: Long): LocalDateTime =
    LocalDateTime.ofEpochSecond(Math.floorDiv(m, 1000000L),
      (Math.floorMod(m, 1000000L) * 1000L).toInt, ZoneOffset.UTC)

  /** UTC calendar-day compare on epoch micros — same day iff the floored
    * day ordinal matches (mirrors luxon `hasSame('day')` on UTC values).
    */
  private def sameDay(a: Long, b: Long): Boolean =
    Math.floorDiv(a, MicrosPerDay) == Math.floorDiv(b, MicrosPerDay)

  /** The T4 kernel over primitive parallel arrays, sorted ascending by
    * micros (stable — ties keep input order, matching the reference's
    * stable Array.sort on toMillis). Returns
    * (arrival, commitment, departure, isDelayed, delayedRevision):
    * [[NoDate]] / -1 are the "none" sentinels.
    */
  private def kernel(bandOf: Array[Int], micros: Array[Long], revIds: Array[Int])
    : (Long, Long, Long, Boolean, Int) = {
    var arrival = NoDate
    var commitment = NoDate
    var departure = NoDate
    var isDelayed = false
    var delayedRevision = -1
    val n = micros.length

    var i = 0
    while (i < n) {
      val band = bandOf(i)

      if (band == BandBefore && arrival != NoDate && commitment == NoDate && departure == NoDate)
        arrival = NoDate

      if (arrival == NoDate && band == BandArrival)
        arrival = micros(i)

      if (commitment == NoDate && band == BandCommitment) {
        var ignoreSameDayDelay = false
        var delayed = false
        var delayedRev = -1
        val cur = micros(i)
        var j = i + 1
        while (j < n) {
          val fb = bandOf(j)
          if (fb == BandArrival || fb == BandBefore) {
            if (!sameDay(micros(j), cur)) {
              delayed = true
              delayedRev = revIds(j)
            } else delayed = false
            if (!ignoreSameDayDelay && sameDay(micros(j), cur))
              ignoreSameDayDelay = true
          } else delayed = false
          j += 1
        }
        // delayed-ness reflects the state at extract time, so it resets on
        // every candidate before the final decision (reference :273-277)
        isDelayed = false
        if (!ignoreSameDayDelay) {
          commitment = cur
          if (delayed) {
            isDelayed = true
            delayedRevision = delayedRev
          }
        }
      }

      if (departure == NoDate && band == BandDeparture) {
        var ignore = false
        var j = i + 1
        while (j < n) {
          val fb = bandOf(j)
          if (fb == BandArrival || fb == BandCommitment || fb == BandBefore) ignore = true
          j += 1
        }
        if (!ignore) departure = micros(i)
      }
      i += 1
    }

    if ((departure != NoDate || commitment != NoDate) && arrival == NoDate)
      arrival = if (commitment != NoDate) commitment else departure
    if (arrival != NoDate && commitment == NoDate && departure != NoDate)
      commitment = arrival
    if (commitment != NoDate && departure != NoDate && commitment > departure)
      commitment = departure
    if (commitment != NoDate && arrival != NoDate && arrival > commitment)
      arrival = commitment

    (arrival, commitment, departure, isDelayed, if (isDelayed) delayedRevision else -1)
  }

  /** Rich-typed T4 entry point: pure, golden-testable. Delegates to the
    * primitive kernel (single implementation of the semantics).
    *
    * @param currentStepOrder order of the item's current workflow step, used
    *                         only for the reported `stepCategory`
    */
  def eventDates(revisions0: Seq[WorkItemRevision], wf: WorkflowDef,
                 currentStepOrder: Option[Int] = None): EventDatesRow = {
    val cw = new CompiledWorkflow(wf)
    val sorted = revisions0.sortBy(_.changedDate)(
      Ordering.fromLessThan[LocalDateTime](_.isBefore(_))).toIndexedSeq
    val n = sorted.length
    val bandArr = new Array[Int](n)
    val micros = new Array[Long](n)
    val revIds = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = sorted(i)
      bandArr(i) = cw.bandOf(r.statusId, r.statusName)
      micros(i) = toMicros(r.changedDate)
      revIds(i) = r.revision
      i += 1
    }
    val (a, c, d, delayed, delayedRev) = kernel(bandArr, micros, revIds)
    val b = cw.b
    EventDatesRow(
      workItemId = revisions0.headOption.map(_.workItemId).getOrElse(""),
      arrival = if (a == NoDate) None else Some(fromMicros(a)),
      commitment = if (c == NoDate) None else Some(fromMicros(c)),
      departure = if (d == NoDate) None else Some(fromMicros(d)),
      isDelayed = delayed,
      delayedRevision = if (delayed) Some(delayedRev) else None,
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

  /** Distributed driver over primitive rows — the fast path. One
    * [[EventDatesRow]] per work item (output is item-cardinality, so its
    * richer encoding is off the hot path; the per-revision input rows are
    * all-primitive).
    *
    * Workflows are a driver-side map (config dimension — small by nature)
    * compiled to band-lookup tables and captured in the closure, i.e.
    * broadcast with the task binary. The current step for `stepCategory` is
    * the step of the latest revision.
    */
  def extractCompact(revisions: Dataset[RevCompact],
                     workflows: Map[String, WorkflowDef]): Dataset[EventDatesRow] = {
    val spark: SparkSession = revisions.sparkSession
    import spark.implicits._
    val compiled: Map[String, CompiledWorkflow] =
      workflows.map { case (k, wf) => k -> new CompiledWorkflow(wf) }
    revisions.groupByKey(_.workItemId).flatMapGroups { (id, it) =>
      val arr = it.toArray
      compiled.get(arr(0).workflowId) match {
        case None => Iterator.empty
        case Some(cw) =>
          java.util.Arrays.sort(arr, new java.util.Comparator[RevCompact] {
            override def compare(x: RevCompact, y: RevCompact): Int =
              java.lang.Long.compare(x.changedMicros, y.changedMicros)
          }) // TimSort: stable on ties, matching the reference's stable sort
          val n = arr.length
          val bandArr = new Array[Int](n)
          val micros = new Array[Long](n)
          val revIds = new Array[Int](n)
          var i = 0
          while (i < n) {
            val r = arr(i)
            bandArr(i) = cw.bandOf(r.statusId, r.statusName)
            micros(i) = r.changedMicros
            revIds(i) = r.revision
            i += 1
          }
          val (a, c, d, delayed, delayedRev) = kernel(bandArr, micros, revIds)
          val last = arr(n - 1)
          val b = cw.b
          Iterator.single(EventDatesRow(
            workItemId = id,
            arrival = if (a == NoDate) None else Some(fromMicros(a)),
            commitment = if (c == NoDate) None else Some(fromMicros(c)),
            departure = if (d == NoDate) None else Some(fromMicros(d)),
            isDelayed = delayed,
            delayedRevision = if (delayed) Some(delayedRev) else None,
            stepCategory = cw.orderOf(last.statusId, last.statusName).map(o =>
              stepCategory(o, b.arrivalPointOrder, b.commitmentPointOrder, b.departurePointOrder)),
            arrivalPointOrder = b.arrivalPointOrder,
            commitmentPointOrder = b.commitmentPointOrder,
            departurePointOrder = b.departurePointOrder))
      }
    }
  }

  /** Rich-typed distributed driver (compatibility shim over
    * [[extractCompact]] — prefer the compact path for large inputs).
    */
  def extract(revisions: Dataset[WorkItemRevision],
              workflows: Map[String, WorkflowDef]): Dataset[EventDatesRow] = {
    val spark: SparkSession = revisions.sparkSession
    import spark.implicits._
    extractCompact(revisions.map(r => RevCompact(
      r.workItemId, r.workflowId, r.revision, r.statusId, r.statusName,
      toMicros(r.changedDate))), workflows)
  }
}
