package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T21 — demo/mock data date refresh (ref
  * `src/update_mock_data_date/date_update_utils.ts:34-330`): dashboard
  * series captured from a demo workspace go stale the day after capture;
  * the reference re-anchors every series on each request so charts always
  * end "now" — day-anchored range shifts, ISO-week re-pins, trailing
  * month relabels, quarter shifts with year rollover, a year bump.
  *
  * Re-expressed as deterministic DataFrame transforms: the refresh
  * instant is a PARAMETER (`today`), so the shift is reproducible and
  * oracle-checkable — the reference's `DateTime.utc()` is just the
  * deployment-time binding of it. Every shift is one broadcast scalar
  * aggregate (the series' anchor) followed by codegen'd per-row column
  * arithmetic — no driver loop, the same plan at dashboard size or
  * corpus size. The relabel variants window over the WHOLE series by
  * contract (dashboard-sized input, like the reference's in-memory
  * arrays).
  */
object MockDataShift {

  /** Day-anchored shift (`updateWip`/`updateInventory`/`updateThroughput`
    * date ranges, `updateLeadTime`'s scatterplot; ts:67-190): move every
    * date column forward by `today - max(anchorCol)` days (never
    * backward, matching the reference's `dayDiff.days > 0` guard), so
    * the series ends today with row spacing intact. */
  def shiftDays(df: DataFrame, anchorCol: String, dateCols: Seq[String],
                today: Column): DataFrame = {
    require(!df.columns.contains("__shift"),
      "shiftDays: input must not contain reserved column '__shift'")
    val shift = df.agg(
      greatest(datediff(today, max(col(anchorCol).cast("date"))), lit(0))
        .as("__shift"))
    dateCols.foldLeft(df.crossJoin(broadcast(shift)))((acc, c) =>
      acc.withColumn(c, date_add(col(c).cast("date"), col("__shift"))))
      .drop("__shift")
  }

  /** ISO-week re-pin (`updateWip` run chart, `updateThroughput` weekly
    * series, `updateFlowEfficiency`, summary weeks; ts:34-65, 96-110,
    * 143-162, 192-230): if the series' latest week is not the current
    * week, every point moves forward by the whole-week difference so the
    * last point lands in today's ISO week (Monday starts, like Luxon's
    * `startOf('week')`). The shift is a multiple of 7 days by
    * construction. */
  def shiftWeeks(df: DataFrame, weekCol: String, dateCols: Seq[String],
                 today: Column): DataFrame = {
    require(!df.columns.contains("__shift"),
      "shiftWeeks: input must not contain reserved column '__shift'")
    val shift = df.agg(
      greatest(datediff(date_trunc("week", today).cast("date"),
        date_trunc("week", max(col(weekCol))).cast("date")), lit(0))
        .as("__shift"))
    dateCols.foldLeft(df.crossJoin(broadcast(shift)))((acc, c) =>
      acc.withColumn(c, date_add(col(c).cast("date"), col("__shift"))))
      .drop("__shift")
  }

  /** Trailing-month relabel (`updateSummaryWidgetMonths`, ts:232-246):
    * the i-th of n points (in `orderCols` order) is labeled with the
    * month `n-1-i` months before today's — labels only, values
    * untouched, exactly the reference's index arithmetic. */
  def relabelTrailingMonths(df: DataFrame, orderCols: Seq[Column],
                            yearCol: String, monthCol: String,
                            today: Column): DataFrame = {
    val w = Window.orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__off", row_number().over(w) - 1)
      .withColumn("__m",
        add_months(date_trunc("month", today).cast("date"), -col("__off")))
      .withColumn(yearCol, year(col("__m")))
      .withColumn(monthCol, month(col("__m")))
      .drop("__off", "__m")
  }

  /** Quarter shift with year rollover (`updateSummaryWidgetQuarters`,
    * ts:248-285): advance every (year, quarter) by the difference
    * between today's quarter index and the series' last, carrying
    * overflow into the year. */
  def shiftQuarters(df: DataFrame, yearCol: String, quarterCol: String,
                    today: Column): DataFrame = {
    require(!df.columns.contains("__qd"),
      "shiftQuarters: input must not contain reserved column '__qd'")
    val idx = col(yearCol) * 4 + (col(quarterCol) - 1)
    val shift = df.agg(
      (year(today) * 4 + (quarter(today) - 1) - max(idx)).as("__qd"))
    df.crossJoin(broadcast(shift))
      .withColumn("__idx", idx + col("__qd"))
      .withColumn(yearCol, floor(col("__idx") / 4).cast("int"))
      .withColumn(quarterCol, (pmod(col("__idx"), lit(4)) + 1).cast("int"))
      .drop("__qd", "__idx")
  }

  /** Year bump (`updateSummaryWidgetYear`, ts:287-293): only the LAST
    * point's year becomes today's — the reference bumps the final
    * element and leaves history alone. */
  def bumpLatestYear(df: DataFrame, yearCol: String,
                     today: Column): DataFrame = {
    require(!df.columns.contains("__maxy"),
      "bumpLatestYear: input must not contain reserved column '__maxy'")
    val mx = df.agg(max(col(yearCol)).as("__maxy"))
    df.crossJoin(broadcast(mx))
      .withColumn(yearCol,
        when(col(yearCol) === col("__maxy"), year(today))
          .otherwise(col(yearCol)))
      .drop("__maxy")
  }
}
