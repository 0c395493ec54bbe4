package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model._

/** The E1 pipeline: raw Jira-shaped work items → revision stream → event
  * dates → states + snapshots fact frames (SURVEY §3 E1).
  *
  * The reference runs this per item inside a Lambda consuming SQS
  * (`src/jiracloud/process/revision_processor.ts`); here the whole table is
  * one declarative job: an explode, a groupByKey kernel, two window passes —
  * the only shuffles are the per-item key (high cardinality) and the
  * revision window.
  */
object RevisionPipeline {

  /** T1 — changelog explode + normalize (`revision_processor.ts:335-500`).
    *
    * Emits one row per tracked change: `status` / `assignee` / `Flagged` /
    * blocked-reason / discarded-reason field changes with non-empty targets,
    * plus flag-removal markers (`Flagged` with empty to/toString), plus the
    * synthesized revision-0 pair (initial status from the first state
    * change's `from`, else the current status; initial assignee from the
    * first assignee change's `fromString`). Rows with empty statusId or
    * statusName are dropped (`:494-498`).
    *
    * Expected input schema (FIXTURES.md §1): `key`, `fields{created,
    * status{id,name}, assignee{displayName}, ...}`,
    * `changelog{histories[{id, created, items[{field, fieldId, from,
    * fromString, to, toString}]}]}`.
    */
  def explodeChangelog(raw: DataFrame,
                       blockedReasonFieldId: Option[String] = None,
                       discardedReasonFieldId: Option[String] = None): DataFrame = {
    val hist = raw.select(
      col("key").as("workItemId"),
      col("fields.created").as("createdDate"),
      col("fields.status.id").as("currentStatusId"),
      col("fields.status.name").as("currentStatusName"),
      explode_outer(col("changelog.histories")).as("h"))
    val items = hist.select(
      col("workItemId"), col("createdDate"),
      col("currentStatusId"), col("currentStatusName"),
      col("h.id").as("historyId"),
      to_timestamp(col("h.created")).cast("timestamp_ntz").as("changedDate"),
      explode_outer(col("h.items")).as("it"))

    val field = col("it.field")
    val fieldId = col("it.fieldId")
    val toId = col("it.to")
    val toStr = col("it").getField("toString")
    val nonEmpty = (c: org.apache.spark.sql.Column) => c.isNotNull && c =!= ""

    val isBlocked = blockedReasonFieldId.map(id => fieldId === id).getOrElse(lit(false))
    val isDiscarded = discardedReasonFieldId.map(id => fieldId === id).getOrElse(lit(false))

    // flag-removal marker (`:358-380`): Flagged with empty to/toString
    val flagRemoved = items
      .filter(field === "Flagged" &&
        (toId.isNull || toId === "") && (toStr.isNull || toStr === ""))
      .select(col("workItemId"), col("historyId"), col("changedDate"),
        lit("flagged").as("statusId"), lit("flagged").as("statusName"),
        lit("flagged").as("statusText"),
        col("it.from").as("from"), col("it.fromString").as("fromString"),
        col("historyId").as("revision"), lit("flagged").as("type"),
        lit(null).cast("string").as("assignee"),
        lit(null).cast("string").as("blockedReason"),
        lit(null).cast("string").as("discardedReason"),
        lit(false).as("flagged"))

    // tracked field changes with non-empty targets (`:381-438`)
    val tracked = items
      .filter(nonEmpty(toId) && nonEmpty(toStr) &&
        (field === "status" || field === "assignee" || field === "Flagged" ||
          isBlocked || isDiscarded))
      .select(col("workItemId"), col("historyId"), col("changedDate"),
        toId.as("statusId"), toStr.as("statusName"),
        when(field === "status", toStr).otherwise(lit("")).as("statusText"),
        col("it.from").as("from"), col("it.fromString").as("fromString"),
        col("historyId").as("revision"),
        when(field === "status", "state_change")
          .when(field === "Flagged", "flagged")
          .when(field === "assignee", "assignee_change")
          .when(isBlocked, "blocked_reason")
          .when(isDiscarded, "discarded_reason").as("type"),
        when(field === "assignee", toStr).as("assignee"),
        when(isBlocked, toStr).as("blockedReason"),
        when(isDiscarded, toStr).as("discardedReason"),
        (field === "Flagged").as("flagged"))

    val changes = tracked.unionByName(flagRemoved)

    // revision-0 synthesis (`:442-492`): initial status = first state
    // change's `from` (by changedDate), falling back to the current status;
    // initial assignee = first assignee change's `fromString`.
    val wState = Window.partitionBy(col("workItemId"))
      .orderBy(col("changedDate")).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val firsts = changes
      .withColumn("__initFrom", first(
        when(col("type") === "state_change", col("from")), ignoreNulls = true).over(wState))
      .withColumn("__initFromString", first(
        when(col("type") === "state_change", col("fromString")), ignoreNulls = true).over(wState))
      .withColumn("__firstAssignee", first(
        when(col("type") === "assignee_change", col("fromString")), ignoreNulls = true).over(wState))
      .groupBy(col("workItemId"))
      .agg(first(col("__initFrom")).as("initFrom"),
        first(col("__initFromString")).as("initFromString"),
        first(col("__firstAssignee")).as("firstAssignee"))

    val base = raw.select(
      col("key").as("workItemId"),
      to_timestamp(col("fields.created")).cast("timestamp_ntz").as("createdDate"),
      col("fields.status.id").as("curId"), col("fields.status.name").as("curName"))
      .join(firsts, Seq("workItemId"), "left")
      .select(col("workItemId"), col("createdDate"),
        coalesce(col("initFrom"), col("curId")).as("statusId"),
        coalesce(col("initFromString"), col("curName")).as("statusName"),
        col("firstAssignee"))

    val rev0State = base.select(col("workItemId"), lit("0").as("historyId"),
      col("createdDate").as("changedDate"), col("statusId"), col("statusName"),
      col("statusName").as("statusText"), col("statusId").as("from"),
      lit("").as("fromString"), lit("0").as("revision"),
      lit("state_change").as("type"), lit(null).cast("string").as("assignee"),
      lit(null).cast("string").as("blockedReason"),
      lit(null).cast("string").as("discardedReason"), lit(false).as("flagged"))
    val rev0Assignee = rev0State
      .withColumn("type", lit("assignee_change"))
      .drop("assignee")
      .join(base.select(col("workItemId"), col("firstAssignee").as("assignee")), "workItemId")

    rev0State.unionByName(rev0Assignee.select(rev0State.columns.map(col).toIndexedSeq: _*))
      .unionByName(changes)
      .filter(col("statusId").isNotNull && col("statusId") =!= "" &&
        col("statusName").isNotNull && col("statusName") =!= "")
  }

  /** Event dates per item from the state-change revisions only
    * (`processRevisions` `:243,286` — the kernel sees state changes; the
    * snapshot builder sees all revisions).
    */
  def eventDatesFor(revisions: DataFrame, workflows: Map[String, WorkflowDef],
                    workflowId: String): Dataset[EventDatesRow] = {
    val spark = revisions.sparkSession
    import spark.implicits._
    val revs = revisions
      .filter(col("type") === "state_change")
      .select(col("workItemId"), lit(workflowId).as("workflowId"),
        col("revision").cast("int").as("revision"),
        col("statusId"), col("statusName"),
        col("changedDate").cast("timestamp_ntz").as("changedDate"),
        col("type").as("revisionType"))
      .as[WorkItemRevision]
    EventDateExtractor.extract(revs, workflows)
  }

  /** T8 + T9 — snapshot rows from all revisions (`revision_processor.ts:
    * 671-830` createSnapshots/translateSnapshots + `utils.ts:60-116`
    * processFlaggedRevisions):
    *
    *  - one snapshot per revision, stamped with `flomatikaSnapshotDate` =
    *    changedDate, `isDelayed` = revision ≥ delayedRevision;
    *  - step lookup (stateOrder/stateType/stepCategory) only for
    *    state_change rows, else the reference's `-999 / 'not applicable'`;
    *  - `stateCategory` = point-in-time classification vs the event dates;
    *  - flag/unflag rows inherit the row-varying fields of the previous
    *    state_change revision; all rows between flag and unflag (exclusive)
    *    are `flagged = true`; a leading flag row gets stateType 'queue'.
    */
  def snapshots(allRevisions: DataFrame, eventDates: DataFrame,
                wf: WorkflowDef): DataFrame = {
    val spark = allRevisions.sparkSession
    val stepRows = wf.steps.map(s => (s.id, s.name, s.order, s.stateType))
    import spark.implicits._
    val steps = stepRows.toDF("__sid", "__sname", "stateOrder", "stateType")
    val b = EventDateExtractor.bands(wf)

    // eventDates has work-item cardinality — NOT a broadcastable dimension
    // at scale. Shuffle join on the item key (AQE will still broadcast it
    // when the actual size is small).
    val withDates = allRevisions.join(
      eventDates.select(col("workItemId"),
        col("arrival"), col("commitment"), col("departure"),
        col("delayedRevision")),
      Seq("workItemId"), "left")

    val joined = withDates
      .join(broadcast(steps),
        col("type") === "state_change" &&
          col("statusId") === col("__sid") && col("statusName") === col("__sname"),
        "left")
      .withColumn("stateOrder",
        when(col("type") === "state_change", col("stateOrder")).otherwise(lit(-999)))
      .withColumn("stateType",
        when(col("type") === "state_change", col("stateType")).otherwise(lit("not applicable")))
      .withColumn("stepCategory",
        when(col("type") =!= "state_change", lit("not applicable"))
          .otherwise(stepCategoryCol(col("stateOrder"),
            b.arrivalPointOrder, b.commitmentPointOrder, b.departurePointOrder)))
      .withColumn("stateCategory",
        when(col("arrival").isNull || col("changedDate") < col("arrival"), "preceding")
          .when(col("commitment").isNull || col("changedDate") < col("commitment"), "proposed")
          .when(col("departure").isNull || col("changedDate") < col("departure"), "inprogress")
          .otherwise("completed"))
      .withColumn("isDelayed",
        col("delayedRevision").isNotNull &&
          col("revision").cast("int") >= col("delayedRevision"))
      .withColumn("flomatikaSnapshotDate", col("changedDate"))
      .drop("__sid", "__sname")

    // ---- T9 flagged pass (utils.ts:60-116) ----
    val wOrd = Window.partitionBy(col("workItemId")).orderBy(col("revision").cast("int"))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val isFlagRow = col("type") === "flagged"
    val copied = Seq("changedDate", "statusId", "statusName", "statusText",
      "stateOrder", "stateType", "stepCategory", "stateCategory", "assignee",
      "blockedReason", "discardedReason", "isDelayed")

    val prevState = last(
      when(col("type") === "state_change",
        struct(copied.map(col).toIndexedSeq: _*)), ignoreNulls = true).over(wPrev)

    val marker = when(isFlagRow && col("flagged"), 1)
      .when(isFlagRow && !col("flagged"), 0)
    val interval = coalesce(last(marker, ignoreNulls = true).over(wRun), lit(0)) === 1

    val withPrev = joined.withColumn("__prev", prevState)
    val inherited = copied.foldLeft(withPrev) { (df, c) =>
      df.withColumn(c,
        when(isFlagRow && col("__prev").isNotNull, col("__prev").getField(c))
          .otherwise(col(c)))
    }
    inherited
      // leading flag row with no prior state change → stateType 'queue'
      .withColumn("stateType",
        when(isFlagRow && col("__prev").isNull, "queue").otherwise(col("stateType")))
      // interval fill; the unflag row itself reports false (marker 0 at row)
      .withColumn("flagged", interval)
      .drop("__prev")
  }

  private def stepCategoryCol(order: org.apache.spark.sql.Column,
                              a: Option[Int], c: Option[Int], d: Option[Int]) = {
    val aO = lit(a.getOrElse(Int.MaxValue))
    val cO = lit(c.getOrElse(Int.MaxValue))
    val dO = lit(d.getOrElse(Int.MaxValue))
    when(order < aO, "preceding")
      .when(order >= aO && order < cO, "proposed")
      .when(order >= cO && order < dO, "inprogress")
      .when(order >= dO, "completed")
      .otherwise("invalid")
  }

  /** T10 (subset) — current-state rows (`revision_processor.ts:831-941`):
    * one row per item with event dates, category by date presence, parent
    * resolution, and the synthesized partition/sort keys used for the MERGE
    * (`state_load_processor_aurora.ts:49-50`).
    */
  def states(raw: DataFrame, eventDates: DataFrame,
             orgId: String, datasourceId: String): DataFrame = {
    val fieldNames = raw.schema("fields").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    // parent resolution chain (`:884-898`): parent.key ∥ epic-link field
    val parent =
      if (fieldNames.contains("parent")) col("fields.parent.key")
      else lit(null).cast("string")
    raw.select(
      col("key").as("workItemId"),
      col("fields.summary").as("title"),
      col("fields.issuetype.name").as("workItemType"),
      col("fields.status.name").as("state"),
      col("fields.assignee.displayName").as("assignedTo"),
      col("fields.project.id").as("projectId"),
      parent.as("parentId"),
      to_timestamp(col("fields.updated")).cast("timestamp_ntz").as("changedDate"))
      .join(eventDates // item-cardinality side: shuffle join, AQE decides
        .withColumnRenamed("arrival", "arrivalDate")
        .withColumnRenamed("commitment", "commitmentDate")
        .withColumnRenamed("departure", "departureDate")
        .select("workItemId", "arrivalDate", "commitmentDate", "departureDate", "isDelayed"),
        Seq("workItemId"), "left")
      .withColumn("stateCategory",
        when(col("departureDate").isNotNull, "completed")
          .when(col("commitmentDate").isNotNull, "inprogress")
          .when(col("arrivalDate").isNotNull, "proposed")
          .otherwise("preceding"))
      .withColumn("partitionKey", concat(lit("state#"), lit(orgId)))
      .withColumn("sortKey", concat(lit(datasourceId), lit("#"), col("workItemId")))
  }
}
