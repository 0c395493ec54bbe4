package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.MergeWriter

/** Incremental-scan checkpointing (§2.5): the per-datasource high-water
  * mark the reference keeps in `datasources.nextRunStartFrom` and advances
  * to max(`updated`) after every run (`src/data/datasource_aurora.ts:268-299`,
  * `src/jiracloud/process/extract_state_processor.ts:368-370,444-446`), plus
  * the due-date check gating each run (`src/utils/date_utils.ts:5-25`).
  *
  * The checkpoint is a tiny keyed table maintained through the bucketed
  * [[MergeWriter]]; [[advance]] is monotonic by construction (greatest of the
  * stored and observed marks), so replaying a stale batch — the at-least-once
  * delivery case — can never move a watermark backwards.
  */
object Watermarks {

  /** `nextRunStartFrom` per datasource for one processed batch:
    * max(updated). One map-side-combinable aggregation.
    */
  def nextRunStartFrom(batch: DataFrame, datasource: Column, updated: Column): DataFrame =
    batch.groupBy(datasource.as("datasource_id"))
      .agg(max(updated).as("next_run_start_from"))

  /** Merge a processed batch's high-water marks into the checkpoint table,
    * monotonically: a datasource's stored mark only ever increases
    * (greatest of stored and observed), new datasources are inserted.
    */
  def advance(spark: SparkSession, checkpointPath: String, batch: DataFrame,
              datasource: Column, updated: Column, buckets: Int = 8): Unit = {
    val observed = nextRunStartFrom(batch, datasource, updated)
    val fs = new org.apache.hadoop.fs.Path(checkpointPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(new org.apache.hadoop.fs.Path(checkpointPath)))
        MergeWriter.readTable(spark, checkpointPath).unionByName(observed)
          .groupBy(col("datasource_id"))
          .agg(max(col("next_run_start_from")).as("next_run_start_from"))
      else observed
    MergeWriter.merge(spark, checkpointPath, merged, Seq("datasource_id"), buckets)
  }

  /** Current marks as a local map — the checkpoint dim is metadata-sized
    * (one row per datasource), and pinning it locally keeps a later
    * incremental filter stable across subsequent [[advance]] writes (a lazy
    * re-read of the checkpoint path would see the post-advance marks).
    */
  /** Hard ceiling on the checkpoint dim pinned by [[currentMarks]]: the
    * table has one row per DATASOURCE — anything past this is a misuse on a
    * data-scale frame, which must fail loudly, not OOM the driver.
    */
  val MaxMarks = 1000000

  def currentMarks(spark: SparkSession, checkpointPath: String): DataFrame = {
    val t = MergeWriter.readTable(spark, checkpointPath)
      .select(col("datasource_id"), col("next_run_start_from"))
    // limit-then-collect: the guard trips on the (bounded) prefix instead
    // of pulling an unbounded frame into driver memory first
    val rows = t.limit(MaxMarks + 1).collect()
    require(rows.length <= MaxMarks,
      s"currentMarks pins the checkpoint dim locally (one row per datasource); " +
        s"$checkpointPath has > $MaxMarks rows — not a checkpoint table")
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), t.schema)
  }

  /** The incremental scan: rows strictly after each datasource's stored
    * mark — the reference's `updated > nextRunStartFrom` pushdown (S2).
    * Datasources with no stored mark (first run) pass everything.
    */
  def incremental(batch: DataFrame, datasource: Column, updated: Column,
                  marks: DataFrame): DataFrame =
    batch.withColumn("__ds", datasource)
      .join(marks.select(col("datasource_id").as("__ds"),
        col("next_run_start_from").as("__wm")), Seq("__ds"), "left")
      .filter(col("__wm").isNull || updated > col("__wm"))
      .drop("__ds", "__wm")

  /** Due-date gate (`checkIfNowPastDueDate`, `date_utils.ts:5-25`): a run is
    * due when there is no previous run, no delay configured, or the last run
    * is at least `delayMinutes` old.
    */
  def isDue(lastRun: Column, delayMinutes: Column, now: Column): Column =
    lastRun.isNull || delayMinutes.isNull ||
      lastRun.cast("long") <= now.cast("long") - delayMinutes.cast("long") * 60
}
