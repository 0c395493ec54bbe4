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

  /** A6 + A8 — the full wide insights-snapshot row
    * (`extract_flomatika_insights_processor.ts:328-473`; DDL
    * `sql/full_ddl.sql:596-638`). The reference assembles this row from nine
    * metrics-API responses (S10); the rebuild computes every metric natively
    * from the canonical flow frame. One row out.
    *
    * Expected `items` columns:
    *  `class_of_service` (string), `level` ('Portfolio' else team),
    *  `status` ('open' | 'completed' | 'discarded'), `arrival_date`,
    *  `departure_date` (timestamp; completed only), `lead_days` (int,
    *  completed only), `active_days` (int, completed only), `is_blocked`,
    *  `is_late` (boolean), `sle_days` (int).
    *
    * `delayReasons`: one row per delay occurrence with a `reason` column —
    * the top-3 reasons become the `key_sources_of_delay` JSON blob.
    *
    * Metric definitions (documented here because the reference's formulas
    * live behind its metrics API; each is the standard flow-metrics
    * formulation):
    *  - lead_time_85/avg (team + portfolio by `level`): exact percentile /
    *    decimal-exact average of `lead_days` over completed;
    *  - wip_*: over open items, age = days(asOf − arrival);
    *  - flow_debt = 100·wip_age_avg / lead_time_85 (getFlowDebt `:195-201`);
    *  - flow_efficiency = 100·Σactive/Σlead over completed;
    *  - fitness_level = lead_time_target_met = % completed with
    *    lead ≤ sle_days (the reference reads the same API field for both);
    *  - average_throughput = mean weekly completed count; quantiles = the
    *    0.25/0.5/0.75/1.0 quantiles of weekly counts (A2);
    *  - predictability labels: leadtime 'High' iff p85 ≤ 2·p50; throughput
    *    'High' iff (q3 − q1) ≤ 0.5·median of weekly counts;
    *  - stale_work: open items older than `staleAgeDays`;
    *  - blockers / delayed_items_count: open ∧ is_blocked / open ∧ is_late;
    *  - discarded_after_start: `status = 'discarded'`;
    *  - demand/capacity: all arrivals vs all completions;
    *    inflow/outflow: arrivals/departures within [windowStart, windowEnd];
    *  - value_demand = % of demand in `valueClasses`;
    *  - expedite_pcnt = expedite/(expedite+fixedDate+intangible+standard)
    *    as a fraction (getExpeditePcnt `:168-182` — NOT ×100);
    *  - profile_of_work: JSON of completed-work share per class
    *    (getProfileOfWorkFromApi `:148-166`, 2-dp percentages).
    *
    * Everything is a conditional aggregate over one pass of `items` plus a
    * weekly-counts aggregate and the top-3 reasons — three tiny 1-row
    * frames cross-joined: no shuffle exceeds the weekly-count groupBy.
    */
  def wideSnapshot(items: DataFrame, delayReasons: DataFrame, asOf: Column,
                   staleAgeDays: Int, windowStart: Column, windowEnd: Column,
                   expediteClass: String, fixedDateClass: String,
                   intangibleClass: String, standardClass: String,
                   valueClasses: Seq[String]): DataFrame = {
    val completed = col("status") === "completed"
    val open = col("status") === "open"
    val lead = col("lead_days")
    val age = datediff(asOf.cast("date"), col("arrival_date").cast("date"))
    val team = col("level") =!= "Portfolio"
    val pf = col("level") === "Portfolio"
    def cnt(c: Column) = sum(when(c, 1).otherwise(0))
    def exactAvgIf(c: Column, v: Column) =
      (sum(when(c, v.cast("decimal(38,0)"))).cast("double") / cnt(c))

    val main = items.agg(
      percentile(when(completed && team, lead), lit(0.85)).as("lead_time_85"),
      percentile(when(completed && team, lead), lit(0.5)).as("__lead_p50"),
      exactAvgIf(completed && team, lead).as("lead_time_team_avg"),
      percentile(when(completed && pf, lead), lit(0.85)).as("lead_time_portfolio_85"),
      exactAvgIf(completed && pf, lead).as("lead_time_portfolio_avg"),
      cnt(open).as("wip_count"),
      percentile(when(open, age), lit(0.85)).as("wip_age_85"),
      exactAvgIf(open, age).as("wip_age_avg"),
      cnt(completed).as("total_throughput"),
      round(lit(100.0) * sum(when(completed, col("active_days").cast("decimal(38,0)")))
        .cast("double") /
        sum(when(completed, lead.cast("decimal(38,0)"))).cast("double"), 2)
        .as("flow_efficiency"),
      round(lit(100.0) * cnt(completed && lead <= col("sle_days")) / cnt(completed), 2)
        .as("fitness_level"),
      cnt(open && age > staleAgeDays).as("stale_work"),
      cnt(open && col("is_blocked")).as("blockers"),
      cnt(open && col("is_late")).as("delayed_items_count"),
      cnt(col("status") === "discarded").as("discarded_after_start"),
      count(lit(1)).as("demand"),
      round(lit(100.0) * cnt(col("class_of_service").isin(valueClasses: _*)) /
        count(lit(1)), 2).as("value_demand"),
      cnt(col("arrival_date").between(windowStart, windowEnd)).as("inflow"),
      cnt(completed && col("departure_date").between(windowStart, windowEnd)).as("outflow"),
      round(when(cnt(col("class_of_service") === expediteClass) > 0,
        cnt(col("class_of_service") === expediteClass).cast("double") /
          cnt(col("class_of_service").isin(
            expediteClass, fixedDateClass, intangibleClass, standardClass)))
        .otherwise(0.0), 6).as("expedite_pcnt"))
      .withColumn("flow_debt",
        round(lit(100.0) * col("wip_age_avg") / col("lead_time_85"), 2))
      .withColumn("lead_time_target_met", col("fitness_level"))
      .withColumn("demand_over_capacity_percent",
        round(lit(100.0) * col("demand") / col("total_throughput"), 2))
      .withColumn("inflow_outflow_percent",
        round(lit(100.0) * col("inflow") / col("outflow"), 2))
      .withColumn("lead_time_predictability",
        when(col("lead_time_85") <= lit(2.0) * col("__lead_p50"), "High")
          .otherwise("Low"))

    val weekly = items.filter(completed)
      .groupBy(date_trunc("week", col("departure_date")).as("week"))
      .agg(count(lit(1)).as("n"))
      .agg(
        exactAvg(col("n").cast("double"), 0).as("average_throughput"),
        percentile(col("n"), lit(0.25)).as("quantile_first"),
        percentile(col("n"), lit(0.5)).as("quantile_second"),
        percentile(col("n"), lit(0.75)).as("quantile_third"),
        percentile(col("n"), lit(1.0)).as("quantile_fourth"))
      .withColumn("throughput_predictability",
        when(col("quantile_third") - col("quantile_first") <=
          lit(0.5) * col("quantile_second"), "High").otherwise("Low"))

    // profile_of_work: '{"class":pct,...}' with 2-dp percentages, keys in
    // lexical order — string-identical between engines by construction.
    val powEntries = items.filter(completed)
      .groupBy(col("class_of_service")).agg(count(lit(1)).as("n"))
    val powTotal = powEntries.agg(sum(col("n")).as("__t"))
    val pow = powEntries.crossJoin(broadcast(powTotal))
      .select(col("class_of_service"),
        format_string("%.2f", round(col("n") * lit(100.0) / col("__t"), 2)).as("pct"))
      .agg(concat(lit("{"), concat_ws(",", transform(
        array_sort(collect_list(struct(col("class_of_service"), col("pct")))),
        e => concat(lit("\""), e.getField("class_of_service"), lit("\":"),
          e.getField("pct")))), lit("}")).as("profile_of_work"))

    // key_sources_of_delay: top-3 reasons by occurrence count (ties by
    // name), as the reference's jsonb blob shape.
    val ksod = delayReasons.groupBy(col("reason")).agg(count(lit(1)).as("n"))
      .agg(concat(lit("{\"keySourcesOfDelay\":[\""),
        concat_ws("\",\"", slice(transform(
          array_sort(collect_list(struct((-col("n")).as("neg"), col("reason")))),
          e => e.getField("reason")), 1, 3)),
        lit("\"]}")).as("key_sources_of_delay"))

    main.crossJoin(weekly).crossJoin(pow).crossJoin(ksod)
      .withColumn("capacity", col("total_throughput"))
      .drop("__lead_p50")
  }

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
