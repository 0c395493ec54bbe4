package graft.sources.connector

import java.util.{Map => JMap}

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.PushdownCompiler

/** DataSourceV2 connector over a GitLab-GraphQL-shaped merge-request JSON
  * drop that makes the S9 query compile REAL: Catalyst's pushed filters are
  * re-compiled into the reference's GraphQL request — the incremental
  * watermark rides the `updatedAfter` variable and the project membership
  * rides `projectPath` (`src/git_data_extractor/gitlab_extractor.ts:285-341`
  * via [[PushdownCompiler.gitlabMergeRequestsQuery]] /
  * [[PushdownCompiler.gitlabVariables]]); only merged MRs exist in the feed
  * (`state: merged` is part of the query, not a pushable predicate). The
  * compiled query + JSON-escaped variables payload appear in the scan's
  * explain output exactly as the reference's axios POST body sends them,
  * and the pushdown is ENFORCED by the shared [[FixtureFormat]] scaffold:
  * the reader evaluates the pushed predicates and parses only the required
  * columns. Scanned rows feed the existing VC transforms (T20 `vcTables` /
  * L5 loads) downstream.
  *
  * Layout: one MR node JSON document per line (GraphQL camelCase field
  * names), one input partition per file — a live deployment walks the
  * cursor-paged `mergeRequests` connection instead (the fixture compiles
  * `after: null`: cursor state is a runtime loop, not plan state).
  */
class GitlabFixtureProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-gitlab"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GitlabFixtureTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new FixtureTable(GitlabFixtureTable, properties.get("path"))
}

object GitlabFixtureTable extends FixtureFormat {
  override val shortName: String = "graft-gitlab"

  /** The flat MR view the reference's node field list selects
    * (`gitlab_extractor.ts:299-310`), plus the project path the outer
    * query keys on.
    */
  override val schema: StructType = StructType(Seq(
    StructField("mr_id", StringType),
    StructField("iid", LongType),
    StructField("merge_commit_sha", StringType),
    StructField("title", StringType),
    StructField("target_branch", StringType),
    StructField("source_branch", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("merged_at", StringType),
    StructField("project_path", StringType)))

  /** Connector column → GraphQL node field (for the reader's parse). */
  val gqlFieldNames: Map[String, String] = Map(
    "mr_id" -> "id", "iid" -> "iid", "merge_commit_sha" -> "mergeCommitSha",
    "title" -> "title", "target_branch" -> "targetBranch",
    "source_branch" -> "sourceBranch", "created_at" -> "createdAt",
    "updated_at" -> "updatedAt", "merged_at" -> "mergedAt",
    "project_path" -> "projectPath")

  /** Compile the pushed filter set into the reference's variables payload. */
  private[graft] def compileVariables(pushed: Seq[Filter]): String = {
    val updatedAfter = pushed.collectFirst {
      case GreaterThan("updated_at", v: String) => v
    }.getOrElse("1970-01-01T00:00:00.000000")
    val projectPath = pushed.collectFirst {
      case EqualTo("project_path", v: String) => v
    }.getOrElse("*")
    PushdownCompiler.gitlabVariables(projectPath, updatedAfter)
  }

  override def supported(f: Filter): Boolean = f match {
    case GreaterThan("updated_at", _: String) => true
    case EqualTo(a, _: String) if schema.fieldNames.contains(a) => true
    case EqualTo(a, _: Long) if a == "iid" => true
    // a project_path MEMBERSHIP stays residual: the GraphQL request takes
    // ONE projectPath variable (the reference loops projects), so pushing
    // In here would enforce a predicate the explain-visible compile does
    // not carry — the engine re-filters instead
    case In(a, vs) if schema.fieldNames.contains(a) && a != "project_path" =>
      vs.forall(v => v.isInstanceOf[String] || v.isInstanceOf[Long])
    case IsNotNull(a) if schema.fieldNames.contains(a) => true
    case IsNull(a) if schema.fieldNames.contains(a) => true
    case _ => false
  }

  override def eval(f: Filter, get: String => Any): Boolean = f match {
    case GreaterThan("updated_at", v: String) =>
      val x = get("updated_at") // ISO-8601 sorts chronologically
      x != null && x.asInstanceOf[String] > v
    case EqualTo(a, v) => val x = get(a); x != null && x == v
    case In(a, vs) => val x = get(a); x != null && vs.contains(x)
    case IsNotNull(a) => get(a) != null
    case IsNull(a) => get(a) == null
    // accepted pushed filters are never re-checked by Spark — a
    // supported()/eval desync must fail loudly, not widen the result
    case f => throw new IllegalStateException(
      s"graft-gitlab: accepted but unevaluable pushed filter $f")
  }

  override def fieldValue(root: JsonNode, name: String): Any = {
    val n = root.get(gqlFieldNames(name))
    if (n == null || n.isNull) null
    else if (name == "iid") n.asLong()
    else n.asText()
  }

  /** The POST body a live GraphQL reader would send — shown by
    * `.explain()`. The query is compressed to one line so the whole
    * request fits the plan string.
    */
  override def describe(pushed: Seq[Filter], required: StructType): String = {
    val query = PushdownCompiler.gitlabMergeRequestsQuery()
      .replaceAll("\\s+", " ")
    s"GraftGitlabFixture graphql=[$query]" +
      s" variables=[${compileVariables(pushed)}]" +
      s" pruned=${required.fieldNames.map(gqlFieldNames).mkString(",")}" +
      s" PushedFilters: [${pushed.mkString(", ")}]"
  }
}
