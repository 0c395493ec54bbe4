package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.operators.EventDateExtractor
import graft.operators.EventDateExtractor.eventDates

/** Golden tests for the T4 event-date kernel, ported scenario-by-scenario
  * from the reference's test matrix
  * (`src/configuration/event_date_extractor.test.ts`, 1255 lines). Citations
  * point at the original test.
  */
class EventDateExtractorSpec extends AnyFunSuite {

  private val wf = WorkflowDef(
    workflowId = "wf1",
    steps = Seq(
      WorkflowStepDef("preceding step", "preceding step", 0),
      WorkflowStepDef("arrival step", "arrival step", 1),
      WorkflowStepDef("commitment step", "commitment step", 2),
      WorkflowStepDef("departure step", "departure step", 3)),
    events = WorkflowEventsDef(1, 2, 3))

  private val t0 = LocalDateTime.of(2021, 6, 1, 0, 0, 0)

  private def rev(step: String, at: LocalDateTime, n: Int = 0) =
    WorkItemRevision("abcd", "wf1", n, s"$step step", s"$step step", at)

  // event_date_extractor.test.ts:49 — simple sequential A → C → D
  test("simple sequential arrival, commitment, departure") {
    val r = eventDates(Seq(
      rev("arrival", t0, 1),
      rev("commitment", t0.plusDays(1), 2),
      rev("departure", t0.plusDays(2), 3)), wf, currentStepOrder = Some(1))
    assert(r.arrival.contains(t0))
    assert(r.commitment.contains(t0.plusDays(1)))
    assert(r.departure.contains(t0.plusDays(2)))
    assert(!r.isDelayed)
    assert(r.stepCategory.contains("proposed"))
    assert(r.arrivalPointOrder.contains(1) && r.commitmentPointOrder.contains(2)
      && r.departurePointOrder.contains(3))
  }

  // :140 — same-day A > C > D > A collapses to just arrival
  test("same day arrival > commitment > departure > arrival is just arrival") {
    val r = eventDates(Seq(
      rev("arrival", t0, 1),
      rev("commitment", t0.plusHours(1), 2),
      rev("departure", t0.plusHours(2), 3),
      rev("arrival", t0.plusHours(3), 4)), wf, Some(1))
    assert(r.arrival.contains(t0))
    assert(r.commitment.isEmpty)
    assert(r.departure.isEmpty)
    assert(!r.isDelayed)
  }

  // :313 — preceding only: no dates
  test("moved into preceding with no other dates") {
    val r = eventDates(Seq(rev("preceding", t0, 1)), wf, Some(0))
    assert(r.arrival.isEmpty && r.commitment.isEmpty && r.departure.isEmpty)
    assert(!r.isDelayed)
    assert(r.stepCategory.contains("preceding"))
  }

  // :342 — arrival then preceding on a later day removes the arrival
  test("arrival then preceding removes arrival date") {
    val r = eventDates(Seq(
      rev("arrival", t0, 1),
      rev("preceding", t0.plusDays(2), 2)), wf, Some(0))
    assert(r.arrival.isEmpty && r.commitment.isEmpty && r.departure.isEmpty)
    assert(!r.isDelayed)
  }

  // :370 — arrival + commitment then preceding: dates stay, item is delayed
  test("arrival + commitment then preceding keeps dates and flags delayed") {
    val r = eventDates(Seq(
      rev("arrival", t0, 1),
      rev("commitment", t0.plusDays(1), 2),
      rev("preceding", t0.plusDays(2), 3)), wf, Some(0))
    assert(r.arrival.contains(t0))
    assert(r.commitment.contains(t0.plusDays(1)))
    assert(r.departure.isEmpty)
    assert(r.isDelayed)
    assert(r.delayedRevision.contains(3))
  }

  // :408 — A + C + D then preceding: departure cleared, delayed
  test("arrival + commitment + departure then preceding clears departure") {
    val r = eventDates(Seq(
      rev("arrival", t0, 1),
      rev("commitment", t0.plusDays(1), 2),
      rev("departure", t0.plusDays(2), 3),
      rev("preceding", t0.plusDays(4), 4)), wf, Some(0))
    assert(r.arrival.contains(t0))
    assert(r.commitment.contains(t0.plusDays(1)))
    assert(r.departure.isEmpty)
    assert(r.isDelayed)
    assert(r.delayedRevision.contains(4))
  }

  // :463 — arrival only
  test("arrival only") {
    val r = eventDates(Seq(rev("arrival", t0, 1)), wf, Some(1))
    assert(r.arrival.contains(t0))
    assert(r.commitment.isEmpty && r.departure.isEmpty && !r.isDelayed)
    assert(r.stepCategory.contains("proposed"))
  }

  // :482 — repeated arrivals keep the first arrival date
  test("repeated arrival keeps first arrival date") {
    val r = eventDates(Seq(
      rev("arrival", t0, 1),
      rev("arrival", t0.plusDays(3), 2)), wf, Some(1))
    assert(r.arrival.contains(t0))
  }

  // :600 — delayed but later re-enters commitment: not delayed anymore
  test("delayed then back to commitment is not delayed") {
    val r = eventDates(Seq(
      rev("arrival", t0, 1),
      rev("commitment", t0.plusHours(1), 2),
      rev("arrival", t0.plusDays(1), 3),
      rev("commitment", t0.plusDays(2), 4)), wf, Some(2))
    assert(r.commitment.contains(t0.plusHours(1)))
    assert(!r.isDelayed)
  }

  // :969 — back to arrival on a later date: delayed, departure skipped
  test("delayed if back to arrival on later date") {
    val r = eventDates(Seq(
      rev("arrival", t0, 1),
      rev("commitment", t0.plusHours(1), 2),
      rev("departure", t0.plusHours(2), 3),
      rev("arrival", t0.plusHours(2).plusDays(1), 4)), wf, Some(1))
    assert(r.arrival.contains(t0))
    assert(r.commitment.contains(t0.plusHours(1)))
    assert(r.departure.isEmpty)
    assert(r.isDelayed)
    assert(r.delayedRevision.contains(4))
  }

  // :1068 FLO-1430 — empty commitment band (orders skip the commitment range)
  test("FLO-1430: empty commitment band yields arrival only") {
    val wf2 = WorkflowDef("wf2", Seq(
      WorkflowStepDef("created step", "created step", 1),
      WorkflowStepDef("arrival step", "arrival step", 1),
      WorkflowStepDef("commitment step", "commitment step", 3),
      WorkflowStepDef("departure step", "departure step", 4)),
      WorkflowEventsDef(1, 2, 3))
    def r2(step: String, at: LocalDateTime, n: Int) =
      WorkItemRevision("abcd", "wf2", n, s"$step step", s"$step step", at)
    val base = LocalDateTime.of(2021, 9, 24, 2, 1, 48)
    val r = eventDates(Seq(
      r2("created", base, 0),
      r2("arrival", base.plusSeconds(53), 1),
      r2("commitment", base.plusSeconds(75), 2),
      r2("arrival", base.plusSeconds(132), 3)), wf2, Some(1))
    assert(r.arrival.contains(base))
    assert(r.commitment.isEmpty && r.departure.isEmpty && !r.isDelayed)
    assert(r.arrivalPointOrder.contains(1))
    assert(r.commitmentPointOrder.isEmpty) // reference: Infinity
    assert(r.departurePointOrder.contains(3))
    assert(r.stepCategory.contains("proposed"))
  }

  // :1171 BET-151 — before-arrival → commitment → before-arrival
  test("BET-151: moved back to before arrival") {
    val wf3 = WorkflowDef("wf3", Seq(
      WorkflowStepDef("10125", "Backlog", 0),
      WorkflowStepDef("11927", "Next", 1),
      WorkflowStepDef("10007", "Ready for Development", 3),
      WorkflowStepDef("10124", "Done", 4)),
      WorkflowEventsDef(1, 2, 4))
    val d1 = LocalDateTime.of(2021, 9, 22, 1, 28, 19)
    val d2 = LocalDateTime.of(2021, 10, 8, 1, 28, 19)
    val d3 = LocalDateTime.of(2021, 10, 10, 1, 28, 19)
    val r = eventDates(Seq(
      WorkItemRevision("x", "wf3", 1, "10125", "Backlog", d1),
      WorkItemRevision("x", "wf3", 2, "10007", "Ready for Development", d2),
      WorkItemRevision("x", "wf3", 3, "10125", "Backlog", d3)), wf3, Some(0))
    assert(r.arrival.contains(d2)) // fallback: arrival ← commitment
    assert(r.commitment.contains(d2))
    assert(r.departure.isEmpty)
    assert(r.isDelayed)
    assert(r.stepCategory.contains("preceding"))
  }

  // Unsorted input is sorted by changedDate before extraction (:149-154)
  test("revisions are sorted before extraction") {
    val r = eventDates(Seq(
      rev("departure", t0.plusDays(2), 3),
      rev("arrival", t0, 1),
      rev("commitment", t0.plusDays(1), 2)), wf, Some(1))
    assert(r.arrival.contains(t0))
    assert(r.commitment.contains(t0.plusDays(1)))
    assert(r.departure.contains(t0.plusDays(2)))
  }

  // date_utils.ts:42-64 / :66-96 category helpers
  test("state category helpers") {
    import EventDateExtractor._
    val a = Some(t0); val c = Some(t0.plusDays(1)); val d = Some(t0.plusDays(2))
    assert(stateCategoryByDate(None, None, None) == "preceding")
    assert(stateCategoryByDate(a, None, None) == "proposed")
    assert(stateCategoryByDate(a, c, None) == "inprogress")
    assert(stateCategoryByDate(a, c, d) == "completed")
    assert(stateCategoryRelativeToDate(t0.minusDays(1), a, c, d) == "preceding")
    assert(stateCategoryRelativeToDate(t0.plusHours(1), a, c, d) == "proposed")
    assert(stateCategoryRelativeToDate(t0.plusDays(1), a, c, d) == "inprogress")
    assert(stateCategoryRelativeToDate(t0.plusDays(2), a, c, d) == "completed")
    assert(stateCategoryRelativeToDate(t0, None, None, None) == "preceding")
  }

  // arrival ≤ commitment ≤ departure clamps (:348-365)
  test("clamps enforce arrival <= commitment <= departure") {
    // departure-only → arrival = commitment = departure via fallbacks
    val r = eventDates(Seq(rev("departure", t0, 1)), wf, Some(3))
    assert(r.arrival.contains(t0))
    assert(r.commitment.contains(t0))
    assert(r.departure.contains(t0))
    assert(r.stepCategory.contains("completed"))
  }
}
