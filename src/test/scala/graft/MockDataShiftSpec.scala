package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MockDataShift

/** T21 — the summary-widget relabel family the oracle queries
  * (q150/q151) don't cover: trailing months, quarter rollover, year
  * bump (ref `date_update_utils.ts:232-293`).
  */
class MockDataShiftSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val today = lit("2026-08-12").cast("date")

  test("shiftDays re-anchors the series end on today, preserving spacing " +
       "and never moving backward") {
    import spark.implicits._
    val df = Seq(("a", "2024-01-01", "2024-01-05"),
      ("b", "2024-01-03", "2024-01-10"))
      .toDF("id", "from", "until")
      .select(col("id"), col("from").cast("date"), col("until").cast("date"))
    val out = MockDataShift.shiftDays(df, "until", Seq("from", "until"), today)
      .collect().map(r => r.getString(0) ->
        (r.getDate(1).toString, r.getDate(2).toString)).toMap
    // max(until)=2024-01-10 lands on 2026-08-12; everything moves by the
    // same 945 days, so b's 7-day span and a's offsets are intact
    assert(out("b") == ("2026-08-05", "2026-08-12"))
    assert(out("a") == ("2026-08-03", "2026-08-07"))
    // a series already ending today (or later) does not move backward
    val fresh = Seq(("x", "2026-08-20")).toDF("id", "until")
      .select(col("id"), col("until").cast("date"))
    val kept = MockDataShift.shiftDays(fresh, "until", Seq("until"), today)
      .collect().head.getDate(1).toString
    assert(kept == "2026-08-20")
  }

  test("shiftWeeks moves whole ISO weeks so the last point is in " +
       "today's week") {
    import spark.implicits._
    // Mondays: 2024-01-01, 2024-01-08; today's week starts 2026-08-10
    val df = Seq(("2024-01-01", 5L), ("2024-01-08", 7L))
      .toDF("week_starting", "n")
      .select(col("week_starting").cast("date").as("week_starting"), col("n"))
    val out = MockDataShift.shiftWeeks(df, "week_starting",
        Seq("week_starting"), today)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(out == Map("2026-08-03" -> 5L, "2026-08-10" -> 7L))
  }

  test("relabelTrailingMonths labels n points ending at today's month") {
    import spark.implicits._
    val df = Seq((2024, 1, 10L), (2024, 2, 20L), (2024, 3, 30L))
      .toDF("year", "month", "n")
    val out = MockDataShift.relabelTrailingMonths(df,
        Seq(col("year"), col("month")), "year", "month", today)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    // 3 points end at 2026-08: June, July, August; values untouched
    assert(out == Set((2026, 6, 10L), (2026, 7, 20L), (2026, 8, 30L)))
  }

  test("shiftQuarters rolls overflow into years") {
    import spark.implicits._
    // last point 2024Q4 → today 2026Q3: diff = 7 quarters; 2024Q3 → 2026Q2
    val df = Seq((2024, 3, 1L), (2024, 4, 2L)).toDF("year", "quarter", "n")
    val out = MockDataShift.shiftQuarters(df, "year", "quarter", today)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set((2026, 2, 1L), (2026, 3, 2L)))
  }

  test("bumpLatestYear touches only the final year") {
    import spark.implicits._
    val df = Seq((2023, 1L), (2024, 2L)).toDF("year", "n")
    val out = MockDataShift.bumpLatestYear(df, "year", today)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(out == Set((2023, 1L), (2026, 2L)))
  }
}
