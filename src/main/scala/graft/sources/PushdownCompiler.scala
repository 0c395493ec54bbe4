package graft.sources

import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** Predicate/projection pushdown compilers for live REST datasources — the
  * query strings a DataSourceV2 connector's `SupportsPushDownFilters` would
  * emit. Formats mirror the reference byte-for-byte:
  *
  *  - JQL (S2): `src/jiracloud/data/jc_issue.ts:734-776` `setupQueryFilter`,
  *    sort `:810-812`;
  *  - OData (S7): `src/azureboards/data/ab_query.ts:152-232`, surrogate
  *    date keys `src/utils/date_utils.ts:27-33`, field-name escaping
  *    `ab_query.ts:249-254`.
  *
  * Against the parquet testdata these predicates are unnecessary (Catalyst
  * pushes filters into the scan), but a live connector needs the manual
  * compile.
  */
object PushdownCompiler {

  /** JQL incremental filter: watermark + saved-filter membership +
    * per-project issue-type pairs + exclude-completed-before.
    */
  def jqlFilter(changedSinceMillis: Long,
                filterIds: Seq[String] = Seq.empty,
                projectIssueTypes: Seq[(String, Seq[String])] = Seq.empty,
                excludeCompletedBeforeMillis: Option[Long] = None): String = {
    val filters = scala.collection.mutable.ArrayBuffer(s"updated > $changedSinceMillis")
    if (filterIds.nonEmpty)
      filters += s"and filter in (${filterIds.mkString(",")})"
    val projectFilters = projectIssueTypes.collect {
      case (projectId, types) if types.nonEmpty =>
        s"(project in ($projectId) and issuetype in (${types.mkString(",")}))"
    }
    if (projectFilters.nonEmpty)
      filters += s"and (${projectFilters.mkString(" or ")})"
    excludeCompletedBeforeMillis.foreach { ts =>
      filters += s"and (resolved is EMPTY OR resolved >= $ts)"
    }
    filters.mkString(" ")
  }

  /** Sort pushdown so incremental resumption is correct (S4). */
  val jqlSort: String = "order by updated asc"

  /** Surrogate date key yyyyMMdd (`date_utils.ts:27-33`). */
  def surrogateDateKey(epochMillis: Long): String =
    DateTimeFormatter.ofPattern("yyyyMMdd").withZone(ZoneOffset.UTC)
      .format(Instant.ofEpochMilli(epochMillis))

  /** OData `$filter` for the WorkItems / WorkItemRevisions entity sets. */
  def odataFilter(changedSinceMillis: Long,
                  entity: String, // "WorkItems" | "WorkItemRevisions"
                  areaIds: Seq[String] = Seq.empty,
                  workItemTypes: Seq[String] = Seq.empty,
                  excludeCompletedBeforeMillis: Option[Long] = None): String = {
    val filters = scala.collection.mutable.ArrayBuffer(
      s"ChangedDateSK ge ${surrogateDateKey(changedSinceMillis)}")
    if (entity == "WorkItemRevisions")
      filters += s"and (RevisedDateSK eq null or RevisedDateSK gt ${surrogateDateKey(changedSinceMillis)})"
    if (workItemTypes.nonEmpty)
      filters += s"AND workitemtype in(${workItemTypes.map(t => "\"" + t + "\"").mkString(",")})"
    if (areaIds.nonEmpty)
      filters += s"AND Area/AreaId in (${areaIds.mkString(",")})"
    if (entity == "WorkItems")
      excludeCompletedBeforeMillis.foreach { ts =>
        filters += s"and (ClosedDateSK eq null or ClosedDateSK ge ${surrogateDateKey(ts)})"
      }
    filters.mkString(" ")
  }

  /** OData custom-field name escaping: `.`→`_`, `-`→`__002D`
    * (`ab_query.ts:249-254`).
    */
  def odataEscapeFieldName(name: String): String =
    name.replace(".", "_").replace("-", "__002D")

  /** OData sort pushdown (`ab_query.ts:236-238` `setupOrderBy`). */
  val odataOrderBy: String = "ChangedDate asc"

  /** OData `$select` compile (`ab_query.ts:256-300` `setupQuerySelect`):
    * fixed field list, then escaped custom-field configs, then field-map
    * sources, then privacy-gated Title.
    */
  def odataSelect(customFieldNames: Seq[String] = Seq.empty,
                  fieldMapFieldNames: Seq[String] = Seq.empty,
                  ingestTitle: Boolean = false): String = {
    val fixed = Seq("WorkItemId", "WorkItemType", "ChangedDate",
      "ChangedDateSK", "State", "StateCategory", "Area", "CreatedDate",
      "Revision", "ClosedDate", "ParentWorkItemId", "Reason")
    (fixed ++ customFieldNames.map(odataEscapeFieldName) ++
      fieldMapFieldNames ++ (if (ingestTitle) Seq("Title") else Nil))
      .mkString(",")
  }

  /** Inverse of [[surrogateDateKey]] for connectors that receive the
    * pushed predicate in surrogate-key space and need the millis form the
    * filter compiler takes.
    */
  def surrogateKeyToMillis(sk: Long): Long =
    java.time.LocalDate.parse(sk.toString,
        DateTimeFormatter.ofPattern("yyyyMMdd"))
      .atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli

  /** S9 — GitLab GraphQL merge-request scan compile
    * (`src/git_data_extractor/gitlab_extractor.ts:285-323`): the
    * incremental predicate rides the `updatedAfter` variable (the
    * per-entity `nextRunStartFrom` watermark), only `state: merged` MRs
    * are fetched, and `sort: UPDATED_ASC` makes cursor paging resumable —
    * the GraphQL form of the S2/S7 watermark pushdown.
    */
  def gitlabMergeRequestsQuery(fields: Seq[String] = Seq(
      "id", "iid", "mergeCommitSha", "title", "targetBranch", "sourceBranch",
      "createdAt", "updatedAt", "mergedAt")): String =
    s"""query GetMergeRequests($$projectPath: ID!, $$updatedAfter: Time, $$after: String) {
       |  project(fullPath: $$projectPath) {
       |    mergeRequests(state: merged, updatedAfter: $$updatedAfter, after: $$after, sort: UPDATED_ASC) {
       |      pageInfo { hasNextPage endCursor }
       |      nodes { ${fields.mkString(" ")} }
       |    }
       |  }
       |}""".stripMargin

  /** The variables payload for [[gitlabMergeRequestsQuery]]: watermark in
    * ISO form, cursor null on the first page
    * (`gitlab_extractor.ts:333-341`).
    */
  def gitlabVariables(projectPath: String, updatedAfterIso: String,
                      afterCursor: Option[String] = None): String = {
    // full JSON string escape — the cursor is an opaque server-provided
    // token, so control characters must not reach the payload raw
    def q(s: String) = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    s"""{"projectPath":${q(projectPath)},"updatedAfter":${q(updatedAfterIso)},""" +
      s""""after":${afterCursor.map(q).getOrElse("null")}}"""
  }

  /** OData `$expand` compile (`ab_query.ts:238-248` `setupQueryExpand`):
    * fixed expansions plus the privacy-gated assignee. The capital-S
    * `$Select` on Project mirrors the reference byte-for-byte (Analytics
    * accepts it; fidelity to the wire format the reference sends wins).
    */
  def odataExpand(ingestAssignee: Boolean = false): String = {
    val fixed = Seq("Area($select=AreaPath)", "Links",
      "Project($Select=ProjectId,ProjectName)")
    (fixed ++ (if (ingestAssignee) Seq("AssignedTo($select=UserName)") else Nil))
      .mkString(",")
  }

  /** The Kanbanize card-scan field list
    * (`src/kanbanize/extract_state_processor.ts:107-123`).
    */
  val kanbanizeCardFields: Seq[String] = Seq(
    "card_id", "title", "type_id", "created_at", "revision",
    "last_modified", "board_id", "workflow_id", "column_id", "owner_user_id")

  /** S8 — Kanbanize card-scan query params
    * (`extract_state_processor.ts:158-204,307-310`): the incremental
    * watermark rides `last_modified_from` (URL-encoded ISO), page/per_page
    * drive the REST paging, and the two modes mirror the reference — the
    * full card scan expands transitions+custom_fields over the field list,
    * the membership refresh projects only (card_id, workflow_id, type_id).
    */
  def kanbanizeCardParams(lastModifiedFromIso: String, page: Int,
                          perPage: Int = 1000,
                          workflowIds: Seq[String] = Seq.empty,
                          membershipOnly: Boolean = false): String = {
    val params = scala.collection.mutable.LinkedHashMap(
      "last_modified_from" -> java.net.URLEncoder.encode(
        lastModifiedFromIso, StandardCharsets.UTF_8),
      "per_page" -> perPage.toString,
      "page" -> page.toString)
    if (!membershipOnly) {
      params("expand") = "transitions,custom_fields"
      params("fields") = kanbanizeCardFields.mkString(",")
    } else {
      params("fields") = "card_id,workflow_id,type_id"
    }
    if (workflowIds.nonEmpty) params("workflow_ids") = workflowIds.mkString(",")
    params.map { case (k, v) => s"$k=$v" }.mkString("&")
  }

  /** S3 — column-projection compile (`jc_issue.ts:656-728`
    * `setupQuerySelect`): the field list a connector's
    * `SupportsPushDownRequiredColumns` would emit. Order is the
    * reference's: fixed fields (+ flagged field), then privacy-gated
    * fields, then custom-field configs, then field-map sources. Duplicates
    * are preserved (the reference joins the raw concatenation).
    */
  def jqlSelect(ingestAssignee: Boolean = false,
                ingestTitle: Boolean = false,
                flaggedFieldName: Option[String] = None,
                customFieldNames: Seq[String] = Seq.empty,
                fieldMapFieldNames: Seq[String] = Seq.empty): String = {
    val fixed = Seq(
      "id", "key", "updated", "status", "issuetype", "created",
      "statuscategorychangedate", "changelog", "parent",
      "customfield_15503", // parent link on Jira server
      "project", "issuelinks", "resolution")
    val privateFields =
      (if (ingestAssignee) Seq("assignee") else Seq.empty) ++
        (if (ingestTitle) Seq("summary") else Seq.empty)
    (fixed ++ flaggedFieldName.toSeq ++ privateFields ++
      customFieldNames ++ fieldMapFieldNames).mkString(",")
  }
}
