package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, In}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PushdownCompiler
import graft.sources.connector.JiraFixtureTable

class ConnectorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("jira-src").toString
    def item(key: String, project: String, tpe: String, status: String, updated: String) =
      s"""{"key":"$key","fields":{"project":{"id":"$project"},"issuetype":{"name":"$tpe"},""" +
        s""""status":{"name":"$status"},"updated":"$updated"}}"""
    Files.write(java.nio.file.Paths.get(dir, "part-00000.json"), java.util.Arrays.asList(
      item("A-1", "1000", "Story", "Done", "2024-01-10T00:00:00.000000"),
      item("A-2", "1000", "Bug", "To Do", "2024-01-20T00:00:00.000000")))
    Files.write(java.nio.file.Paths.get(dir, "part-00001.json"), java.util.Arrays.asList(
      item("B-1", "1001", "Story", "Doing", "2024-01-25T00:00:00.000000")))
    dir
  }

  test("filters and projection are pushed to the source and enforced") {
    val dir = writeFixture()
    val df = spark.read.format("graft-jira").option("path", dir).load()
      .filter(col("updated") > "2024-01-15T00:00:00.000000")
      .select("key", "status")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftJiraFixture"), plan)
    assert(plan.contains("jql=[updated > 1705276800000"), plan)
    assert(plan.contains("pruned=key,status,updated") ||
      plan.contains("pruned=key,status"), plan)
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set("A-2" -> "To Do", "B-1" -> "Doing"))
  }

  test("connector JQL matches the standalone S2 compile for the same predicate") {
    val jql = JiraFixtureTable.compileJql(Seq(
      GreaterThan("updated", "2024-01-15T00:00:00.000000"),
      EqualTo("project", "1000"),
      In("issue_type", Array("Story", "Bug"))))
    val expected = PushdownCompiler.jqlFilter(1705276800000L,
      projectIssueTypes = Seq("1000" -> Seq("Story", "Bug"))) +
      " " + PushdownCompiler.jqlSort
    assert(jql == expected)
    assert(jql.contains("(project in (1000) and issuetype in (Story,Bug))"))
    assert(jql.endsWith("order by updated asc"))
  }

  test("unsupported predicates stay residual and results remain correct") {
    val dir = writeFixture()
    // endsWith is not a supported pushdown: the engine must re-filter
    val df = spark.read.format("graft-jira").option("path", dir).load()
      .filter(col("key").endsWith("-1") && col("project") === "1000")
    val rows = df.select("key").collect().map(_.getString(0)).toSet
    assert(rows == Set("A-1"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(project,1000)"), plan)
  }

  test("S5 ids-only scan prunes the read to the single key column") {
    val dir = writeFixture()
    val df = spark.read.format("graft-jira").option("path", dir).load()
      .filter(col("status") === "Doing")
      .select("key")
    val plan = df.queryExecution.executedPlan.toString
    // the reader parses ONLY key+status (status for the pushed predicate
    // evaluation is source-side; the OUTPUT schema is key alone)
    assert(plan.contains("pruned=key"), plan)
    assert(plan.contains("EqualTo(status,Doing)"), plan)
    assert(df.collect().map(_.getString(0)).toSet == Set("B-1"))
  }

  private def writeAdoFixture(): String = {
    val dir = Files.createTempDirectory("ado-src").toString
    def item(id: String, tpe: String, area: Long, changed: Long,
             closed: Option[Long], state: String) =
      s"""{"WorkItemId":"$id","WorkItemType":"$tpe","AreaId":$area,""" +
        s""""ChangedDateSK":$changed,""" +
        closed.map(c => s""""ClosedDateSK":$c,""").getOrElse("") +
        s""""State":"$state"}"""
    Files.write(java.nio.file.Paths.get(dir, "part-00000.json"), java.util.Arrays.asList(
      item("WI-1", "Story", 1, 20240110L, None, "Active"),
      item("WI-2", "Bug", 2, 20240120L, Some(20240105L), "Closed")))
    Files.write(java.nio.file.Paths.get(dir, "part-00001.json"), java.util.Arrays.asList(
      item("WI-3", "Story", 1, 20240125L, Some(20240125L), "Closed"),
      item("WI-4", "Task", 1, 20240126L, None, "Active")))
    dir
  }

  test("ADO connector compiles pushed filters to the reference OData string") {
    val dir = writeAdoFixture()
    val df = spark.read.format("graft-ado").option("path", dir).load()
      .filter(col("changed_date_sk") >= 20240115L &&
        col("work_item_type").isin("Story", "Bug") &&
        (col("closed_date_sk").isNull || col("closed_date_sk") >= 20240110L))
      .select("work_item_id", "state")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftAdoFixture"), plan)
    assert(plan.contains("$filter=ChangedDateSK ge 20240115"), plan)
    assert(plan.contains("""workitemtype in("Story","Bug")"""), plan)
    assert(plan.contains("ClosedDateSK eq null or ClosedDateSK ge 20240110"), plan)
    assert(plan.contains("$orderby=ChangedDate asc"), plan)
    // WI-2 excluded (closed 20240105 < 20240110), WI-4 excluded (Task)
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set("WI-3" -> "Closed"))
  }

  test("S9 GitLab GraphQL compile carries the watermark, merged-state and resumable sort") {
    val doc = PushdownCompiler.gitlabMergeRequestsQuery()
    assert(doc.contains("state: merged"))
    assert(doc.contains("updatedAfter: $updatedAfter"))
    assert(doc.contains("sort: UPDATED_ASC"))
    assert(doc.contains("pageInfo { hasNextPage endCursor }"))
    assert(doc.contains("mergeCommitSha") && doc.contains("updatedAt"))
    val vars = PushdownCompiler.gitlabVariables(
      "group/repo", "2024-01-20T00:00:00.000Z", Some("cursor\"x"))
    assert(vars ==
      """{"projectPath":"group/repo","updatedAfter":"2024-01-20T00:00:00.000Z","after":"cursor\"x"}""")
    assert(PushdownCompiler.gitlabVariables("p", "t").endsWith(""""after":null}"""))
  }

  test("S7 $expand mirrors the reference expansion list byte-for-byte") {
    // the capital-S $Select on Project is the reference's own casing
    // (ab_query.ts:241) — wire-format fidelity is the contract here
    assert(PushdownCompiler.odataExpand() ==
      "Area($select=AreaPath),Links,Project($Select=ProjectId,ProjectName)")
    assert(PushdownCompiler.odataExpand(ingestAssignee = true)
      .endsWith(",AssignedTo($select=UserName)"))
  }

  test("S8 Kanbanize card-scan params carry the watermark, paging and both field modes") {
    val full = PushdownCompiler.kanbanizeCardParams(
      "2024-01-20T00:00:00.000+00:00", page = 2, perPage = 200,
      workflowIds = Seq("11", "12"))
    assert(full ==
      "last_modified_from=2024-01-20T00%3A00%3A00.000%2B00%3A00&per_page=200&page=2" +
        "&expand=transitions,custom_fields" +
        "&fields=card_id,title,type_id,created_at,revision,last_modified,board_id,workflow_id,column_id,owner_user_id" +
        "&workflow_ids=11,12")
    val membership = PushdownCompiler.kanbanizeCardParams(
      "2024-01-20T00:00:00.000+00:00", page = 1, membershipOnly = true)
    assert(membership.contains("fields=card_id,workflow_id,type_id"))
    assert(!membership.contains("expand="))
  }

  private def writeKbzFixture(): String = {
    val dir = Files.createTempDirectory("kbz-src").toString
    def card(id: Long, wf: Long, modified: String, owner: Option[Long]) =
      s"""{"card_id":$id,"title":"Card $id","type_id":${id % 5},""" +
        s""""created_at":"2024-01-01T00:00:00.000000","revision":3,""" +
        s""""last_modified":"$modified","board_id":${id % 3},""" +
        s""""workflow_id":$wf,"column_id":${id % 6}""" +
        owner.map(o => s""","owner_user_id":$o""").getOrElse("") + "}"
    Files.write(java.nio.file.Paths.get(dir, "part-00000.json"), java.util.Arrays.asList(
      card(1, 11, "2024-01-10T00:00:00.000000", Some(7)),
      card(2, 11, "2024-01-20T00:00:00.000000", Some(8))))
    Files.write(java.nio.file.Paths.get(dir, "part-00001.json"), java.util.Arrays.asList(
      card(3, 12, "2024-01-25T00:00:00.000000", None),
      card(4, 13, "2024-01-26T00:00:00.000000", Some(9))))
    dir
  }

  test("Kanbanize connector compiles pushed filters to the reference card-scan params") {
    val dir = writeKbzFixture()
    val df = spark.read.format("graft-kbz").option("path", dir).load()
      .filter(col("last_modified") > "2024-01-15T00:00:00.000000" &&
        col("workflow_id").isin(11L, 12L))
      .select("card_id", "title", "workflow_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftKbzFixture"), plan)
    // watermark URL-encoded into last_modified_from, membership into
    // workflow_ids, full-scan mode expands transitions+custom_fields
    assert(plan.contains(
      "last_modified_from=2024-01-15T00%3A00%3A00.000000"), plan)
    assert(plan.contains("workflow_ids=11,12"), plan)
    assert(plan.contains("expand=transitions,custom_fields"), plan)
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set((2L, "Card 2", 11L), (3L, "Card 3", 12L)))
  }

  test("Kanbanize membership-only projection compiles the reference refresh mode") {
    val dir = writeKbzFixture()
    // projecting nothing beyond (card_id, workflow_id, type_id) must flip
    // the compile to the membership refresh (extract_state_processor.ts:185-198)
    val df = spark.read.format("graft-kbz").option("path", dir).load()
      .select("card_id", "workflow_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("fields=card_id,workflow_id,type_id"), plan)
    assert(!plan.contains("expand="), plan)
    assert(plan.contains("pruned=card_id,workflow_id"), plan)
    assert(df.collect().length == 4)
    // a wider projection keeps the full-scan mode
    val full = spark.read.format("graft-kbz").option("path", dir).load()
      .select("card_id", "title")
      .queryExecution.executedPlan.toString
    assert(full.contains("expand=transitions,custom_fields"), full)
  }

  test("stored watermark round-trips into the compiled kbz scan (the q90 incremental round)") {
    val dir = writeKbzFixture()
    val wmPath = Files.createTempDirectory("kbz-wm").toString + "/ds"
    val round1 = spark.read.format("graft-kbz").option("path", dir).load()
      .filter(col("last_modified") <= "2024-01-20T00:00:00.000000")
      .select(col("card_id"), col("last_modified"))
    graft.operators.Watermarks.advance(spark, wmPath,
      round1.withColumn("ds", lit("kanbanize")), col("ds"), col("last_modified"))
    val mark = graft.operators.Watermarks.currentMarks(spark, wmPath)
      .collect().find(_.getString(0) == "kanbanize").get.getString(1)
    assert(mark == "2024-01-20T00:00:00.000000")
    // the incremental round: the STORED mark, not a literal, reaches the
    // compiled card-scan params — watermark round-trip is explain-visible
    val round2 = spark.read.format("graft-kbz").option("path", dir).load()
      .filter(col("last_modified") > mark)
    val plan = round2.queryExecution.executedPlan.toString
    assert(plan.contains("last_modified_from=2024-01-20T00%3A00%3A00.000000"), plan)
    assert(round2.select("card_id").collect().map(_.getLong(0)).toSet ==
      Set(3L, 4L))
  }

  test("Kanbanize null semantics: absent owner stays null and IsNotNull is enforced") {
    val dir = writeKbzFixture()
    val df = spark.read.format("graft-kbz").option("path", dir).load()
      .filter(col("owner_user_id").isNotNull)
      .select("card_id")
    assert(df.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
  }

  private def writeGitlabFixture(): String = {
    val dir = Files.createTempDirectory("gitlab-src").toString
    def mr(iid: Long, path: String, updated: String) =
      s"""{"id":"gid://gitlab/MergeRequest/$iid","iid":$iid,""" +
        s""""mergeCommitSha":"sha$iid","title":"MR $iid",""" +
        s""""targetBranch":"main","sourceBranch":"feature/$iid",""" +
        s""""createdAt":"2024-01-01T00:00:00.000000","updatedAt":"$updated",""" +
        s""""mergedAt":"$updated","projectPath":"$path"}"""
    Files.write(java.nio.file.Paths.get(dir, "part-00000.json"), java.util.Arrays.asList(
      mr(1, "org/a", "2024-01-10T00:00:00.000000"),
      mr(2, "org/a", "2024-01-20T00:00:00.000000")))
    Files.write(java.nio.file.Paths.get(dir, "part-00001.json"), java.util.Arrays.asList(
      mr(3, "org/b", "2024-01-25T00:00:00.000000")))
    dir
  }

  test("GitLab connector compiles pushed filters to the reference GraphQL request") {
    val dir = writeGitlabFixture()
    val df = spark.read.format("graft-gitlab").option("path", dir).load()
      .filter(col("updated_at") > "2024-01-15T00:00:00.000000" &&
        col("project_path") === "org/a")
      .select("iid", "title", "source_branch")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftGitlabFixture"), plan)
    // the watermark rides the updatedAfter variable, membership rides
    // projectPath; the document itself pins merged state + resumable sort
    assert(plan.contains(
      """variables=[{"projectPath":"org/a","updatedAfter":"2024-01-15T00:00:00.000000","after":null}]"""),
      plan)
    assert(plan.contains("state: merged"), plan)
    assert(plan.contains("sort: UPDATED_ASC"), plan)
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set((2L, "MR 2", "feature/2")))
  }

  test("ADO OData compile matches the standalone S7 compile for the same predicate") {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, IsNull, Or}
    import graft.sources.connector.AdoFixtureTable
    val odata = AdoFixtureTable.compileOData(Seq(
      GreaterThanOrEqual("changed_date_sk", 20240115L),
      In("work_item_type", Array("Story", "Bug")),
      In("area_id", Array(1L, 2L)),
      Or(IsNull("closed_date_sk"), GreaterThanOrEqual("closed_date_sk", 20240110L))))
    val expected = PushdownCompiler.odataFilter(
      PushdownCompiler.surrogateKeyToMillis(20240115L), "WorkItems",
      areaIds = Seq("1", "2"), workItemTypes = Seq("Story", "Bug"),
      excludeCompletedBeforeMillis =
        Some(PushdownCompiler.surrogateKeyToMillis(20240110L)))
    assert(odata == expected)
    assert(odata.startsWith("ChangedDateSK ge 20240115"))
    assert(odata.contains("Area/AreaId in (1,2)"))
  }
}
