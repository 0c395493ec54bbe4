package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def events = {
    import spark.implicits._
    Seq(
      // user 1: full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "click"),
      (1L, ts("2024-01-01 11:00:00"), "purchase"),
      // user 2: purchase BEFORE click — stops at click (order matters)
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:10:00"), "purchase"),
      (2L, ts("2024-01-01 10:30:00"), "click"),
      // user 3: view only
      (3L, ts("2024-01-01 09:00:00"), "view"),
      // user 4: click with no view — reaches nothing
      (4L, ts("2024-01-01 09:00:00"), "click"),
      // user 5: click exactly AT the view timestamp counts (inclusive)
      (5L, ts("2024-01-01 08:00:00"), "view"),
      (5L, ts("2024-01-01 08:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
  }

  private def run(maxGap: Option[String]) =
    Funnel.funnelStages(events, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"), maxGap)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("stages_reached")))
      .toMap

  test("stage order is enforced and ties are inclusive") {
    assert(run(None) == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L, 5L -> 2L))
  }

  test("conversion window cuts transitions that arrive too late") {
    // 15-minute window: user 1's click (+30 min) now misses
    assert(run(Some("15 minutes"))(1L) == 1L)
    // 45-minute window: click lands (+30) but purchase (+30 after click) ok
    assert(run(Some("45 minutes"))(1L) == 3L)
  }

  test("duplicate stage names fail loudly") {
    intercept[IllegalArgumentException] {
      Funnel.funnelStages(events, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "view"))
    }
  }
}
