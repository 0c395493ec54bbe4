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

  /** A (projectId, typeName) → normalized-type row of the workItemTypeMap
    * dimension (`work_item_type_aurora.ts:53-93`; SLE/level lookup
    * `revision_processor.ts:843-874`).
    */
  case class TypeMapEntry(
      projectId: String,
      typeName: String,
      workItemTypeId: String,
      displayName: String,
      level: String,
      serviceLevelExpectationInDays: Int)

  /** Field names whose presence marks an item flagged
    * (`revision_processor.ts:24-28` flaggedFieldNames: the Jira Flagged
    * custom-field option values, locale variants included).
    */
  val FlaggedValues: Set[String] = Set("Impediment", "Impedimento")

  /** `isItemFlagged` (`revision_processor.ts:1038-1053`): scan ALL fields;
    * flagged iff any field value is a non-empty array whose first element's
    * `value` is a flagged marker. The scan is genuinely dynamic (fields are
    * `[propName: string]: any`), so it runs as a UDF over the fields JSON.
    */
  private[graft] def isItemFlaggedJson(fieldsJson: String): Boolean = {
    if (fieldsJson == null) return false
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(fieldsJson)
    val it = root.fields()
    var flagged = false
    while (it.hasNext && !flagged) {
      val v = it.next().getValue
      if (v.isArray && v.size() > 0 && v.get(0).has("value") &&
        FlaggedValues.contains(v.get(0).get("value").asText()))
        flagged = true
    }
    flagged
  }

  /** T10 — current-state rows (`revision_processor.ts:831-941`
    * translateWorkItem): one row per item with
    *
    *  - the parent resolution chain (`:879-898`): `fields.parent.key` ∥
    *    Jira-server parent-link field ∥ epic-link custom field;
    *  - workItemTypeMap lookup (`:843-874`): normalized type id/name,
    *    level, SLE days — broadcast dimension join on (project, type);
    *  - current workflow step → state/stateType/stateOrder;
    *  - `isItemFlagged` all-fields scan (`:1038-1053`);
    *  - event dates, category by date presence, stepCategory;
    *  - the synthesized partition/sort keys used for the MERGE
    *    (`state_load_processor_aurora.ts:49-50`).
    */
  def states(raw: DataFrame, eventDates: DataFrame,
             orgId: String, datasourceId: String,
             typeMaps: Seq[TypeMapEntry] = Seq.empty,
             workflow: Option[WorkflowDef] = None,
             parentLinkFieldId: String = "customfield_15503",
             epicLinkFieldId: Option[String] = None): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val fieldNames = raw.schema("fields").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    def fieldOrNull(name: String) =
      if (fieldNames.contains(name)) col("fields").getField(name).cast("string")
      else lit(null).cast("string")
    // parent resolution chain (`:879-898`)
    val parentKey =
      if (fieldNames.contains("parent")) col("fields.parent.key")
      else lit(null).cast("string")
    val parent = coalesce(parentKey, fieldOrNull(parentLinkFieldId),
      epicLinkFieldId.map(fieldOrNull).getOrElse(lit(null).cast("string")))

    val flaggedUdf = udf(isItemFlaggedJson _)

    val base = raw.select(
      col("key").as("workItemId"),
      col("fields.summary").as("title"),
      col("fields.issuetype.name").as("rawItemType"),
      col("fields.status.id").as("__curSid"),
      col("fields.status.name").as("state"),
      col("fields.assignee.displayName").as("assignedTo"),
      col("fields.project.id").as("projectId"),
      parent.as("parentId"),
      flaggedUdf(to_json(col("fields"))).as("flagged"),
      to_timestamp(col("fields.updated")).cast("timestamp_ntz").as("changedDate"))

    // current workflow step → stateType/stateOrder (`workflowStep` input
    // of translateWorkItem; step identity is the (id, name) pair)
    val withStep = workflow match {
      case None =>
        base.withColumn("stateType", lit(null).cast("string"))
          .withColumn("stateOrder", lit(null).cast("string"))
      case Some(wf) =>
        val steps = wf.steps.map(s => (s.id, s.name, s.order, s.stateType))
          .toDF("__sid", "__sname", "__sorder", "__stype")
        base.join(broadcast(steps),
            col("__curSid") === col("__sid") && col("state") === col("__sname"), "left")
          .withColumn("stateType", col("__stype"))
          .withColumn("stateOrder", col("__sorder").cast("string"))
          .drop("__sid", "__sname", "__sorder", "__stype")
    }

    // workItemTypeMap dimension join (broadcast: config-sized by nature)
    val withType =
      if (typeMaps.isEmpty)
        withStep.withColumn("flomatikaWorkItemTypeId", lit(null).cast("string"))
          .withColumn("workItemType", col("rawItemType"))
          .withColumn("flomatikaWorkItemTypeLevel", lit(null).cast("string"))
          .withColumn("flomatikaWorkItemTypeServiceLevelExpectationInDays",
            lit(null).cast("int"))
      else {
        val tm = typeMaps
          .map(t => (t.projectId, t.typeName, t.workItemTypeId, t.displayName,
            t.level, t.serviceLevelExpectationInDays))
          .toDF("__tproj", "__ttype", "flomatikaWorkItemTypeId",
            "__tdisplay", "flomatikaWorkItemTypeLevel",
            "flomatikaWorkItemTypeServiceLevelExpectationInDays")
        withStep.join(broadcast(tm),
            col("projectId") === col("__tproj") &&
              col("rawItemType") === col("__ttype"), "left")
          .withColumn("workItemType", coalesce(col("__tdisplay"), col("rawItemType")))
          .drop("__tproj", "__ttype", "__tdisplay")
      }

    withType
      .join(eventDates // item-cardinality side: shuffle join, AQE decides
        .withColumnRenamed("arrival", "arrivalDate")
        .withColumnRenamed("commitment", "commitmentDate")
        .withColumnRenamed("departure", "departureDate")
        .select("workItemId", "arrivalDate", "commitmentDate", "departureDate",
          "isDelayed", "stepCategory"),
        Seq("workItemId"), "left")
      .withColumn("stateCategory",
        when(col("departureDate").isNotNull, "completed")
          .when(col("commitmentDate").isNotNull, "inprogress")
          .when(col("arrivalDate").isNotNull, "proposed")
          .otherwise("preceding"))
      .withColumn("partitionKey", concat(lit("state#"), lit(orgId)))
      .withColumn("sortKey", concat(lit(datasourceId), lit("#"), col("workItemId")))
      .drop("__curSid", "rawItemType")
  }
}
