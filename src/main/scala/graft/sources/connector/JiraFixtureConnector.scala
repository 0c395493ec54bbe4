package graft.sources.connector

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset
import java.util.{Map => JMap}

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.PushdownCompiler

/** DataSourceV2 connector over the raw-item JSON drop path (S11) that makes
  * the S2/S3 pushdown compilers REAL: Catalyst's pushed filters are
  * re-compiled into the reference's JQL filter string
  * (`src/jiracloud/data/jc_issue.ts:734-776` via
  * [[PushdownCompiler.jqlFilter]]) and the pruned column set into its field
  * list (`jc_issue.ts:656-728` via [[PushdownCompiler.jqlSelect]]); both
  * appear in the scan's explain output exactly where a live REST reader
  * would send them. Against JSON files the compiled strings are
  * descriptive, but the pushdown is also ENFORCED: the reader evaluates the
  * pushed predicates and parses only the required columns (scaffold shared
  * via [[FixtureFormat]]).
  *
  * Layout: one JSON document per line (the shape
  * [[graft.sources.RawItemsFixture]] serializes), one input partition per
  * file — a live deployment points `path` at the S3 raw-item prefix and
  * parallelism comes from the object listing.
  */
class JiraFixtureProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jira"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JiraFixtureTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new FixtureTable(JiraFixtureTable, properties.get("path"))
}

object JiraFixtureTable extends FixtureFormat {
  override val shortName: String = "graft-jira"

  /** The flat issue view a JQL search returns for the fixed field list. */
  override val schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("project", StringType),
    StructField("issue_type", StringType),
    StructField("status", StringType),
    StructField("updated", StringType)))

  /** Connector column → Jira field name (for the S3 select compile). */
  val jiraFieldNames: Map[String, String] = Map(
    "key" -> "key", "project" -> "project", "issue_type" -> "issuetype",
    "status" -> "status", "updated" -> "updated")

  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  private[graft] def isoToMillis(iso: String): Long =
    LocalDateTime.parse(iso, TsFmt).toInstant(ZoneOffset.UTC).toEpochMilli

  /** Compile the pushed filter set into the reference's JQL string. */
  private[graft] def compileJql(pushed: Seq[Filter]): String = {
    val changedSince = pushed.collectFirst {
      case GreaterThan("updated", v: String) => isoToMillis(v)
    }.getOrElse(0L)
    val projects = pushed.collect {
      case EqualTo("project", v: String) => Seq(v)
      case In("project", vs) => vs.toSeq.map(_.toString)
    }.flatten
    val types = pushed.collect {
      case EqualTo("issue_type", v: String) => Seq(v)
      case In("issue_type", vs) => vs.toSeq.map(_.toString)
    }.flatten
    val pairs =
      if (projects.nonEmpty && types.nonEmpty) projects.map(p => p -> types)
      else Seq.empty
    PushdownCompiler.jqlFilter(changedSince, projectIssueTypes = pairs) +
      " " + PushdownCompiler.jqlSort
  }

  override def supported(f: Filter): Boolean = f match {
    case GreaterThan("updated", _: String) => true
    case EqualTo(a, _: String) if schema.fieldNames.contains(a) => true
    case In(a, _) if schema.fieldNames.contains(a) => true
    case IsNotNull(a) if schema.fieldNames.contains(a) => true
    case _ => false
  }

  override def eval(f: Filter, get: String => Any): Boolean = f match {
    case GreaterThan("updated", v: String) =>
      val u = get("updated") // ISO-8601 sorts chronologically
      u != null && u.asInstanceOf[String] > v
    case EqualTo(a, v: String) => get(a) == v
    case In(a, vs) => vs.exists(v => get(a) == String.valueOf(v))
    case IsNotNull(a) => get(a) != null
    // accepted pushed filters are never re-checked by Spark — a
    // supported()/eval desync must fail loudly, not widen the result
    case f => throw new IllegalStateException(
      s"graft-jira: accepted but unevaluable pushed filter $f")
  }

  private def str(n: JsonNode): String =
    if (n == null || n.isNull) null else n.asText()

  override def fieldValue(root: JsonNode, name: String): Any = name match {
    case "key" => str(root.get("key"))
    case "project" =>
      val f = root.get("fields")
      if (f == null) null else str(f.path("project").get("id"))
    case "issue_type" =>
      val f = root.get("fields")
      if (f == null) null else str(f.path("issuetype").get("name"))
    case "status" =>
      val f = root.get("fields")
      if (f == null) null else str(f.path("status").get("name"))
    case "updated" =>
      val f = root.get("fields")
      if (f == null) null else str(f.get("updated"))
    case _ => null
  }

  /** What a live reader would send — shown by `.explain()` on the scan. */
  override def describe(pushed: Seq[Filter], required: StructType): String = {
    val select = PushdownCompiler.jqlSelect() + " | pruned=" +
      required.fieldNames.map(jiraFieldNames).mkString(",")
    s"GraftJiraFixture jql=[${compileJql(pushed)}] " +
      s"fields=[$select] PushedFilters: [${pushed.mkString(", ")}]"
  }
}
