package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cumulative flow diagram — reference `aurora/ddl/calculate_cfd.sql:5-70`.
  *
  * Completed-category states report a running cumulative count per state over
  * snapshot dates; in-progress states report plain per-day counts; the two
  * branches are unioned. Output shape matches the reference:
  * `(state, flomatikasnapshotdate, numberofitems)`.
  *
  * Scale notes: the daily pre-aggregation shrinks the input to
  * |states| × |days| rows before the window, so the cumulative-sum window
  * (partitioned by state, a low-cardinality key) runs over a tiny frame no
  * matter the raw snapshot volume — the heavy lifting is the partial
  * (map-side) aggregation on the scan.
  */
object Cfd {

  def cfd(snapshots: DataFrame, state: Column, date: Column,
          completedStates: Seq[String]): DataFrame = {
    val daily = snapshots
      .groupBy(state.as("state"), date.as("flomatikasnapshotdate"))
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("state")).orderBy(col("flomatikasnapshotdate"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val completed = daily
      .filter(col("state").isin(completedStates: _*))
      .withColumn("numberofitems", sum(col("__n")).over(w))
    val inProgress = daily
      .filter(!col("state").isin(completedStates: _*))
      .withColumn("numberofitems", col("__n"))
    completed.unionByName(inProgress)
      .select(col("state"), col("flomatikasnapshotdate"), col("numberofitems"))
  }
}
