package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagged-interval fill — reference
  * `src/jiracloud/process/utils.ts:60-116` (`processFlaggedRevisions`):
  * a "flagged" marker revision opens an interval that stays open on every
  * subsequent revision until the matching unflag marker closes it.
  *
  * Spark-first shape: emit a 1/0 marker on flag/unflag rows and carry the
  * most recent non-null marker forward with `last(..., ignoreNulls)` over an
  * unbounded-preceding row window — no per-item loop, one shuffle on the
  * item key.
  */
object FlaggedIntervals {

  /** Adds a boolean `flagged` column. `setMarker` rows open the interval,
    * `clearMarker` rows close it (the clearing row itself reports unflagged,
    * matching the reference where the unflag revision carries flagged=false
    * after inheriting prior state fields).
    */
  def fill(df: DataFrame, key: Column, order: Seq[Column],
           setMarker: Column, clearMarker: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marker = when(setMarker, lit(1)).when(clearMarker, lit(0))
    df.withColumn("flagged",
      coalesce(last(marker, ignoreNulls = true).over(w), lit(0)) === 1)
  }
}
