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
}
