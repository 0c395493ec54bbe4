package graft

import java.time.LocalDateTime

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.operators.EventDateExtractor.eventDates

/** Property tests for the T4 kernel (SURVEY §5: event-date invariants).
  * Scenario space: random revision sequences over a 4-step workflow with a
  * preceding band. Drives ScalaCheck directly (no scalatestplus bridge in
  * the offline cache).
  */
class EventDatePropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  private val wf = WorkflowDef("wf", Seq(
    WorkflowStepDef("p", "p", 0),
    WorkflowStepDef("a", "a", 1),
    WorkflowStepDef("c", "c", 2),
    WorkflowStepDef("d", "d", 3)),
    WorkflowEventsDef(1, 2, 3))

  private val t0 = LocalDateTime.of(2024, 1, 1, 0, 0)

  private val genRevs: Gen[List[WorkItemRevision]] = for {
    n <- Gen.choose(0, 12)
    steps <- Gen.listOfN(n, Gen.oneOf("p", "a", "c", "d"))
    hours <- Gen.listOfN(n, Gen.choose(0, 200))
  } yield steps.zip(hours).zipWithIndex.map { case ((s, h), i) =>
    WorkItemRevision("w", "wf", i + 1, s, s, t0.plusHours(h.toLong))
  }

  test("arrival <= commitment <= departure always holds") {
    check(Prop.forAll(genRevs) { revs =>
      val r = eventDates(revs, wf)
      val ac = (for (a <- r.arrival; c <- r.commitment) yield !a.isAfter(c)).getOrElse(true)
      val cd = (for (c <- r.commitment; d <- r.departure) yield !c.isAfter(d)).getOrElse(true)
      ac && cd
    })
  }

  test("departure implies commitment implies arrival (fallback chain)") {
    check(Prop.forAll(genRevs) { revs =>
      val r = eventDates(revs, wf)
      (r.departure.isEmpty || r.commitment.isDefined) &&
        (r.commitment.isEmpty || r.arrival.isDefined)
    })
  }

  test("input order does not matter (dates sort internally)") {
    check(Prop.forAll(genRevs) { revs =>
      // only compare when timestamps are unique: ties are broken by input
      // order (stable sort), which is part of the contract for equal dates
      val unique = revs.map(_.changedDate).distinct.size == revs.size
      !unique || eventDates(revs.reverse, wf) == eventDates(revs, wf)
    })
  }

  test("all dates come from the revision stream") {
    check(Prop.forAll(genRevs) { revs =>
      val ts = revs.map(_.changedDate).toSet
      Seq(eventDates(revs, wf)).forall { r =>
        r.arrival.forall(ts.contains) && r.commitment.forall(ts.contains) &&
          r.departure.forall(ts.contains)
      }
    })
  }
}
