package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Insights / flow-metrics aggregations — reference
  * `src/flomatika_app/process/extract_flomatika_insights_processor.ts` (A2-A6
  * in SURVEY §2.3). The reference fetched these from a metrics API; the
  * rebuild computes them natively from the fact frames.
  *
  * All percentile calls use Spark's exact `percentile` (type-7 linear
  * interpolation, index p·(n-1)) — the same rule as mathjs `quantileSeq`
  * used by the reference (`extract_flomatika_insights_processor.ts:38-61`)
  * and DuckDB's `quantile_cont`. At 100 TB switch call sites to
  * `percentile_approx` where a bounded-error sketch is acceptable; the exact
  * version is a single-pass sort-based agg per group here.
  */
object Insights {

  /** Lead-time percentiles + average per group — A6's
    * leadTime85/leadTimeAverage family: lead time = whole days between
    * commitment and departure (`date_utils.ts:109-116` diffInWholeDays).
    */
  def leadTimeStats(df: DataFrame, group: Column, commitment: Column,
                    departure: Column): DataFrame = {
    val lead = datediff(departure.cast("date"), commitment.cast("date"))
    df.groupBy(group)
      .agg(
        percentile(lead, lit(0.5)).as("lead_p50"),
        percentile(lead, lit(0.85)).as("lead_p85"),
        exactAvg(lead.cast("double"), 0).as("lead_avg"),
        count(lit(1)).as("n_items"))
  }

  /** Productivity run-chart quartiles — A2
    * (`extract_flomatika_insights_processor.ts:38-61`): weekly completed-item
    * counts, then min + the three quartiles over those counts.
    */
  def throughputQuartiles(df: DataFrame, completedDate: Column): DataFrame = {
    val weekly = df
      .groupBy(date_trunc("week", completedDate).as("week"))
      .agg(count(lit(1)).as("n"))
    weekly.agg(
      min(col("n")).as("min_weekly"),
      percentile(col("n"), lit(0.25)).as("q1"),
      percentile(col("n"), lit(0.5)).as("q2"),
      percentile(col("n"), lit(0.75)).as("q3"),
      count(lit(1)).as("n_weeks"))
  }

  /** Profile of work — A5 (`:148-166`): share of completed work per bucket,
    * as a percentage rounded to 2 dp.
    */
  def profileOfWork(df: DataFrame, bucket: Column): DataFrame = {
    val counts = df.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n"))
    // total via broadcast cross-join of a 1-row aggregate (not a global
    // window, which would single-partition the frame)
    val total = counts.agg(sum(col("n")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .withColumn("pct", round(col("n") * lit(100.0) / col("n_total"), 2))
      .select(col("bucket"), col("n"), col("pct"))
  }

  /** Expedite percentage — A3 (`:168-182`): expedite share of the
    * class-of-service distribution, one row.
    */
  def expeditePct(df: DataFrame, isExpedite: Column): DataFrame =
    df.agg(
      sum(when(isExpedite, 1).otherwise(0)).as("n_expedite"),
      count(lit(1)).as("n_total"))
      .withColumn("expedite_pct",
        round(col("n_expedite") * lit(100.0) / col("n_total"), 2))

  /** Threshold-subscription evaluation — A7
    * (`src/flomatika_notifications/process/utils.ts:9-80`): given a predicted
    * value and a target per subscription, notify iff the signed difference
    * matches the subscribed direction and its magnitude exceeds the
    * threshold. `diff = target - predicted` (days): direction `up` fires on
    * early prediction (diff > threshold), `down` on late (diff < -threshold),
    * `both` on |diff| > threshold.
    */
  def evaluateThresholds(subscriptions: DataFrame, predicted: DataFrame,
                         joinKey: String): DataFrame = {
    val j = subscriptions.join(broadcast(predicted), joinKey)
    val diff = col("target_value") - col("predicted_value")
    j.withColumn("diff", diff)
      .withColumn("notify",
        when(col("direction") === "up", diff > col("threshold"))
          .when(col("direction") === "down", -diff > col("threshold"))
          .otherwise(abs(diff) > col("threshold")))
  }
}
