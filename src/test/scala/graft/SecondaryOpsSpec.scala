package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AdoDedupe, SecondaryTransforms}
import graft.sources.PushdownCompiler

/** Ports the ADO dedupe scenarios (`revision_utils.test.ts`, 494 LoC) and
  * covers the pushdown compilers + secondary transforms.
  */
class SecondaryOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("T2: ADO state dedupe keeps first and changed revisions") {
    import spark.implicits._
    val revs = Seq(
      (463278L, 1, "New"), (463278L, 2, "New"), (463278L, 3, "Active"),
      (463278L, 4, "Active"), (463278L, 5, "Closed"),
      (999L, 1, "New"))
      .toDF("WorkItemId", "Revision", "State")
    val out = AdoDedupe.stateChanges(revs).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out == Set((463278L, 1), (463278L, 3), (463278L, 5), (999L, 1)))
  }

  test("T2: assignee dedupe is null-safe (unassign is a change)") {
    import spark.implicits._
    val revs = Seq(
      (1L, 1, Some("Alice")), (1L, 2, Some("Alice")), (1L, 3, None),
      (1L, 4, Some("Bob")))
      .toDF("WorkItemId", "Revision", "UserName")
      .withColumn("AssignedTo", struct(col("UserName")))
    val out = AdoDedupe.assigneeChanges(revs).collect()
      .map(_.getAs[Int]("Revision")).toSet
    assert(out == Set(1, 3, 4))
  }

  test("T2: blocked dedupe skips unblocked prefix; null and 'No' are unblocked") {
    import spark.implicits._
    val revs = Seq(
      (1L, 1, None), (1L, 2, Some("No")), (1L, 3, Some("Yes")),
      (1L, 4, Some("Yes")), (1L, 5, None),
      (2L, 1, Some("No")))
      .toDF("WorkItemId", "Revision", "Custom_Blocked")
    val out = AdoDedupe.blockedChanges(revs, "Custom_Blocked").collect()
      .map(r => (r.getAs[Int]("Revision"), r.getAs[Boolean]("flagged")))
    // item 1 starts at the first blocking revision (3); the null at 5 is a
    // change back to unblocked; item 2 never blocks → no rows
    assert(out.toSet == Set((3, true), (5, false)))
  }

  test("S2: JQL filter compile matches the reference format") {
    val jql = PushdownCompiler.jqlFilter(
      changedSinceMillis = 1700000000000L,
      filterIds = Seq("10100", "10200"),
      projectIssueTypes = Seq(("10000", Seq("10001", "10002")), ("20000", Seq.empty)),
      excludeCompletedBeforeMillis = Some(1600000000000L))
    assert(jql == "updated > 1700000000000 and filter in (10100,10200) " +
      "and ((project in (10000) and issuetype in (10001,10002))) " +
      "and (resolved is EMPTY OR resolved >= 1600000000000)")
    assert(PushdownCompiler.jqlSort == "order by updated asc")
  }

  test("S3: JQL projection compile assembles the reference field list") {
    // fixed ∪ flagged ∪ privateFields ∪ customFieldConfigs ∪ fieldMaps, in
    // the reference's concatenation order (jc_issue.ts:656-728)
    val sel = PushdownCompiler.jqlSelect(
      ingestAssignee = true, ingestTitle = true,
      flaggedFieldName = Some("customfield_10021"),
      customFieldNames = Seq("customfield_10014", "customfield_10029"),
      fieldMapFieldNames = Seq("customfield_777"))
    assert(sel == "id,key,updated,status,issuetype,created," +
      "statuscategorychangedate,changelog,parent,customfield_15503," +
      "project,issuelinks,resolution,customfield_10021,assignee,summary," +
      "customfield_10014,customfield_10029,customfield_777")
    // privacy flags off → no assignee/summary
    val minimal = PushdownCompiler.jqlSelect()
    assert(!minimal.contains("assignee") && !minimal.contains("summary"))
  }

  test("S7: OData filter compile with surrogate keys and escaping") {
    val f = PushdownCompiler.odataFilter(
      changedSinceMillis = 1700000000000L, // 2023-11-14 UTC
      entity = "WorkItemRevisions",
      areaIds = Seq("7", "8"), workItemTypes = Seq("Bug"))
    assert(f == "ChangedDateSK ge 20231114 " +
      "and (RevisedDateSK eq null or RevisedDateSK gt 20231114) " +
      "AND workitemtype in(\"Bug\") AND Area/AreaId in (7,8)")
    assert(PushdownCompiler.odataEscapeFieldName("Custom.Some-Field") ==
      "Custom_Some__002DField")
  }

  test("snapshotDiff emits insert/update/delete and drops unchanged keys") {
    import spark.implicits._
    val old = Seq(
      (1L, "open", 10L),     // unchanged -> no row
      (2L, "open", 10L),     // state changes -> update
      (3L, "done", 10L),     // only ts changes -> update
      (4L, "open", 10L),     // absent from new -> delete
      (6L, null.asInstanceOf[String], 10L) // null -> value: update (null-safe)
    ).toDF("k", "state", "v")
    val neu = Seq(
      (1L, "open", 10L),
      (2L, "done", 10L),
      (3L, "done", 11L),
      (5L, "open", 12L),     // absent from old -> insert
      (6L, "open", 10L)
    ).toDF("k", "state", "v")
    val got = graft.operators.Reconcile
      .snapshotDiff(old, neu, Seq("k"), Seq("state", "v"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("op"))).toMap
    assert(got == Map(2L -> "update", 3L -> "update", 4L -> "delete",
      5L -> "insert", 6L -> "update"))
  }

  test("T14: exclude-completed-before is a calendar-day filter") {
    import spark.implicits._
    val df = Seq(
      ("A", Some("2024-01-05 10:00:00")), ("B", Some("2024-01-10 00:00:00")),
      ("C", None))
      .toDF("id", "dep")
      .withColumn("dep", col("dep").cast("timestamp_ntz"))
    val out = SecondaryTransforms.excludeCompletedBefore(df, col("dep"),
        lit("2024-01-10").cast("timestamp_ntz"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("B", "C"))
  }

  test("T15: demo anonymization is deterministic") {
    import spark.implicits._
    val df = Seq(("PROJ-1", "Secret title", "Real Name", "org-1"))
      .toDF("id", "title", "assignee", "orgId")
    val a1 = SecondaryTransforms.anonymizeDemo(df, col("id"), "title", "assignee", "orgId", "demo")
      .collect().head
    val a2 = SecondaryTransforms.anonymizeDemo(df, col("id"), "title", "assignee", "orgId", "demo")
      .collect().head
    assert(a1.getAs[String]("title") == a2.getAs[String]("title"))
    assert(a1.getAs[String]("title") != "Secret title")
    assert(a1.getAs[String]("orgId") == "demo")
  }

  test("T20: VC transform shreds MRs into four tables") {
    val mrs = spark.read.json(spark.createDataset(Seq(
      """{"mrId":1,"projectId":"p1","title":"MR1","state":"merged",
        |"createdAt":"2024-01-01","mergedAt":"2024-01-02",
        |"commits":[{"sha":"abc","authoredDate":"2024-01-01","authorName":"A"},
        |           {"sha":"def","authoredDate":"2024-01-02","authorName":"B"}]}"""
        .stripMargin.replace("\n", "")))(org.apache.spark.sql.Encoders.STRING))
    val pipes = spark.read.json(spark.createDataset(Seq(
      """{"pipelineId":9,"projectId":"p1","status":"success","startedAt":"2024-01-01","finishedAt":"2024-01-01"}"""))(
      org.apache.spark.sql.Encoders.STRING))
    val (mr, commits, bridge, p) = SecondaryTransforms.vcTables(mrs, pipes)
    assert(mr.count() == 1 && commits.count() == 2 && bridge.count() == 2 && p.count() == 1)
  }

  test("T18: sprint transform flattens context x board x sprint") {
    import spark.implicits._
    val cb = Seq(("ctx1", "b1"), ("ctx1", "b2"), ("ctx2", "b1"))
      .toDF("contextId", "boardId")
    val bs = Seq(("b1", "s1", "Sprint 1", "2024-01-01", "2024-01-14"),
      ("b2", "s2", "Sprint 2", "2024-01-01", "2024-01-14"))
      .toDF("boardId", "sprintId", "sprintName", "startDate", "endDate")
    val out = SecondaryTransforms.sprints(cb, bs).collect()
      .map(r => (r.getAs[String]("contextId"), r.getAs[String]("sprintId"))).toSet
    assert(out == Set(("ctx1", "s1"), ("ctx1", "s2"), ("ctx2", "s1")))
  }

  test("A11/A12: scheduler fan-outs") {
    import spark.implicits._
    val ds = Seq(
      ("o1", "d1", "jira", Some("full"), true),
      ("o1", "d2", "jira", None, true),
      ("o2", "d3", "ado", Some("delta"), false))
      .toDF("orgId", "datasourceId", "datasourceType", "runType", "enabled")
    val wl = SecondaryTransforms.extractWorklist(ds).collect()
    assert(wl.map(_.getAs[String]("datasourceId")).toSeq == Seq("d1"))
    val subs = Seq(("o1", "r1", "s1"), ("o1", "r1", "s2"), ("o1", "r2", "s3"))
      .toDF("orgId", "obeyaRoomId", "subscriptionId")
    val groups = SecondaryTransforms.notificationGroups(subs).collect()
      .map(r => (r.getString(1), r.getSeq[String](2).toSet)).toMap
    assert(groups == Map("r1" -> Set("s1", "s2"), "r2" -> Set("s3")))
  }
}
